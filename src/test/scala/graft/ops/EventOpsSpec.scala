package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // --- cohortRetention -------------------------------------------------

  test("cohortRetention: hand-computed matrix on a 3-actor fixture") {
    // a: first Jan, active Jan+Mar (offsets 0, 2)
    // b: first Jan, active Jan only
    // c: first Mar, active Mar+Apr (offsets 0, 1); year boundary below
    val df = Seq(
      (1L, ts("2024-01-05 10:00:00")), (1L, ts("2024-03-20 10:00:00")),
      (1L, ts("2024-03-21 11:00:00")), // same month twice → one cell
      (2L, ts("2024-01-09 10:00:00")),
      (3L, ts("2024-03-02 10:00:00")), (3L, ts("2024-04-30 10:00:00")))
      .toDF("u", "t")
    val out = EventOps.cohortRetention(df, "u", "t")
      .as[(java.sql.Date, Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0, 2L, 2L, 1.0),
      (java.sql.Date.valueOf("2024-01-01"), 2, 1L, 2L, 0.5),
      (java.sql.Date.valueOf("2024-03-01"), 0, 1L, 1L, 1.0),
      (java.sql.Date.valueOf("2024-03-01"), 1, 1L, 1L, 1.0)))
  }

  test("cohortRetention: month offset crosses a year boundary as Δyear·12 + Δmonth") {
    val df = Seq(
      (1L, ts("2023-11-15 00:00:00")), (1L, ts("2024-02-01 00:00:00")))
      .toDF("u", "t")
    val out = EventOps.cohortRetention(df, "u", "t")
      .select("month_offset").as[Int].collect().toSet
    assert(out == Set(0, 3))
  }

  test("cohortRetention: NULL actors and timestamps are excluded") {
    val df = Seq(
      (Some(1L), Some(ts("2024-01-05 00:00:00"))),
      (None, Some(ts("2024-01-06 00:00:00"))),
      (Some(2L), None))
      .toDF("u", "t")
    val out = EventOps.cohortRetention(df, "u", "t").collect()
    assert(out.length == 1 && out.head.getLong(2) == 1L)
  }

  test("cohortRetention: ONE shuffle over raw events (per-actor agg), rest at matrix grain") {
    val df = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("u", "t")
    val plan = EventOps.cohortRetention(df, "u", "t")
      .queryExecution.executedPlan
    // shuffles: actor agg + cells agg + window + final sort — what must
    // NOT appear is any exchange carrying raw event rows beyond the
    // first actor-grain aggregate; with one row in, every exchange is
    // at most one row wide, so assert the count stays at the designed 4
    val n = plan.collect { case e: ShuffleExchangeExec => e }.size
    assert(n <= 4, s"expected <= 4 exchanges, got $n:\n$plan")
  }

  // --- funnelStages ----------------------------------------------------

  private val funnelFixture = Seq(
    // u1 completes all three in order
    (1L, ts("2024-01-01 00:00:00"), "signup"),
    (1L, ts("2024-01-02 00:00:00"), "click"),
    (1L, ts("2024-01-03 00:00:00"), "purchase"),
    // u2: purchase BEFORE click-after-signup → funnel stops at click
    (2L, ts("2024-01-01 00:00:00"), "signup"),
    (2L, ts("2024-01-01 06:00:00"), "purchase"),
    (2L, ts("2024-01-02 00:00:00"), "click"),
    // u3: click precedes signup → that click cannot count; no later click
    (3L, ts("2024-01-02 00:00:00"), "click"),
    (3L, ts("2024-01-03 00:00:00"), "signup"),
    // u4 never signs up → not in the output at all
    (4L, ts("2024-01-01 00:00:00"), "click"))
    .toDF("u", "t", "typ")

  test("funnelStages: strict in-order semantics, hand-checked") {
    val out = EventOps.funnelStages(
      funnelFixture, "u", "t", "typ", Seq("signup", "click", "purchase"))
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp], Long)]
      .collect().toSeq
    assert(out == Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")),
        Some(ts("2024-01-03 00:00:00")), 3L),
      (2L, ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00")),
        None, 2L),
      (3L, ts("2024-01-03 00:00:00"), None, None, 1L)))
  }

  test("funnelStages maxGapSeconds: inclusive at the bound, pruned past it") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 01:00:00"), "b"), // exactly at the 3600s bound
      (2L, ts("2024-01-01 00:00:00"), "a"),
      (2L, ts("2024-01-01 01:00:01"), "b")) // one second past it
      .toDF("u", "t", "typ")
    val out = EventOps.funnelStages(df, "u", "t", "typ", Seq("a", "b"),
      maxGapSeconds = Some(3600L))
      .as[(Long, Timestamp, Option[Timestamp], Long)]
      .collect().map(r => r._1 -> r._4).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L), out.toString)
    intercept[IllegalArgumentException] {
      EventOps.funnelStages(df, "u", "t", "typ", Seq("a", "b"),
        maxGapSeconds = Some(0L))
    }
  }

  test("funnelStages: an event AT the previous stage time counts (closed boundary)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 00:00:00"), "b"))
      .toDF("u", "t", "typ")
    val out = EventOps.funnelStages(df, "u", "t", "typ", Seq("a", "b"))
      .as[(Long, Timestamp, Option[Timestamp], Long)].collect()
    assert(out.head._4 == 2L)
  }

  test("funnelStages tolerates input columns named t1/t2 (internal names are prefixed)") {
    // an events frame that already carries a t1 column must not turn the
    // stage join filters into ambiguous references — internal stage
    // columns are _funnel_t*; only the OUTPUT exposes t1..tk
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", "x"),
      (1L, ts("2024-01-01 00:01:00"), "b", "y"))
      .toDF("u", "t", "typ", "t1")
    val out = EventOps.funnelStages(df, "u", "t", "typ", Seq("a", "b"))
      .select($"u", $"t1", $"t2", $"stage_reached")
      .as[(Long, Timestamp, Option[Timestamp], Long)].collect()
    assert(out.head._4 == 2L, out.mkString(","))
  }

  test("funnelStages rejects empty and duplicate step lists") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("u", "t", "typ")
    intercept[IllegalArgumentException] {
      EventOps.funnelStages(df, "u", "t", "typ", Nil)
    }
    intercept[IllegalArgumentException] {
      EventOps.funnelStages(df, "u", "t", "typ", Seq("a", "a"))
    }
  }

  test("funnelStages matches a per-actor simulation on random event streams") {
    val rng = new scala.util.Random(20260814L)
    val types = Vector("signup", "click", "purchase", "view", "error")
    val rows = for { u <- 1 to 12; i <- 0 until 40 } yield
      (u.toLong, ts(f"2024-01-${1 + i % 28}%02d ${rng.nextInt(24)}%02d:00:00"),
        types(rng.nextInt(types.size)))
    val steps = Seq("signup", "click", "purchase")
    def ref(evs: Seq[(Timestamp, String)]): Option[(Timestamp, Option[Timestamp], Option[Timestamp], Long)] = {
      def minAtOrAfter(typ: String, from: Option[Timestamp]): Option[Timestamp] =
        from.flatMap(f => evs.filter(e => e._2 == typ && !e._1.before(f))
          .map(_._1).sorted.headOption)
      val t1 = evs.filter(_._2 == steps.head).map(_._1).sorted.headOption
      t1.map { s1 =>
        val t2 = minAtOrAfter(steps(1), Some(s1))
        val t3 = minAtOrAfter(steps(2), t2)
        (s1, t2, t3, 1L + t2.size + t3.size)
      }
    }
    val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
      ref(rs.map(r => (r._2, r._3))).map(u -> _) }
    val got = EventOps.funnelStages(
      rows.toDF("u", "t", "typ"), "u", "t", "typ", steps)
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp], Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, exp) =>
      assert(got(u) == exp, s"user $u: ${got(u)} != $exp") }
  }

  // --- lastTouchAttribution -------------------------------------------

  test("lastTouchAttribution: hand-checked credit assignment") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "view"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "click"),
      (1L, ts("2024-01-03 00:00:00"), 12L, "purchase"), // → click 11
      (1L, ts("2024-01-04 00:00:00"), 13L, "purchase"), // still → 11
      (2L, ts("2024-01-01 00:00:00"), 20L, "purchase"), // no touch → NULL
      (2L, ts("2024-01-02 00:00:00"), 21L, "view"))
      .toDF("u", "t", "id", "typ")
    val out = EventOps.lastTouchAttribution(
      df, "u", "t", "id", "typ", Seq("click", "view"), "purchase")
      .orderBy($"conversion_id")
      .as[(Long, Long, Timestamp, Option[Long], Option[Timestamp], Option[String])]
      .collect().toSeq
    assert(out.map(r => (r._2, r._4, r._6)) == Seq(
      (12L, Some(11L), Some("click")),
      (13L, Some(11L), Some("click")),
      (20L, None, None)))
  }

  test("lastTouchAttribution: same-timestamp tie resolves by event id order") {
    // touch id 5 sorts BEFORE conversion id 6 at the same instant → it
    // counts; touch id 7 sorts AFTER → it does not
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq(
      (1L, t0, 5L, "click"), (1L, t0, 6L, "purchase"), (1L, t0, 7L, "click"))
      .toDF("u", "t", "id", "typ")
    val out = EventOps.lastTouchAttribution(
      df, "u", "t", "id", "typ", Seq("click"), "purchase")
      .as[(Long, Long, Timestamp, Option[Long], Option[Timestamp], Option[String])]
      .collect().head
    assert(out._4 == Some(5L), s"$out")
  }

  test("funnelStages and lastTouchAttribution exclude NULL actors") {
    // NULL-actor events must not form a phantom funnel entry, and an
    // anonymous purchase must not inherit another anonymous user's
    // click (round-10 review)
    val df = Seq(
      (None, ts("2024-01-01 00:00:00"), 1L, "signup"),
      (None, ts("2024-01-02 00:00:00"), 2L, "click"),
      (None, ts("2024-01-03 00:00:00"), 3L, "purchase"),
      (Some(7L), ts("2024-01-01 00:00:00"), 4L, "signup"))
      .toDF("u", "t", "id", "typ")
    val funnel = EventOps.funnelStages(
      df, "u", "t", "typ", Seq("signup", "click", "purchase")).collect()
    assert(funnel.length == 1 && funnel.head.getLong(0) == 7L)
    val attr = EventOps.lastTouchAttribution(
      df, "u", "t", "id", "typ", Seq("click"), "purchase").collect()
    assert(attr.isEmpty)
  }

  test("lastTouchAttribution validates its type arguments") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a")).toDF("u", "t", "id", "typ")
    intercept[IllegalArgumentException] {
      EventOps.lastTouchAttribution(df, "u", "t", "id", "typ", Nil, "x")
    }
    intercept[IllegalArgumentException] {
      EventOps.lastTouchAttribution(df, "u", "t", "id", "typ", Seq("x"), "x")
    }
  }

  test("lastTouchAttribution: one window over one actor-grain shuffle") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a")).toDF("u", "t", "id", "typ")
    val plan = EventOps.lastTouchAttribution(
      df, "u", "t", "id", "typ", Seq("a"), "b")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("funnelStages: joins stay on the actor key — no new shuffle grain") {
    val plan = EventOps.funnelStages(
      funnelFixture, "u", "t", "typ", Seq("signup", "click", "purchase"))
      .queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    // every hash exchange must partition on the actor column only
    val bad = exchanges.filter { e =>
      e.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          !h.expressions.forall(_.references.map(_.name).forall(_ == "u"))
        case _ => false // range partitioning for the final orderBy
      }
    }
    assert(bad.isEmpty, s"non-actor-grain exchange:\n${bad.mkString("\n")}")
  }

  test("linearAttribution: hand-computed credit shares and the direct bucket") {
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // user 1: click, view, purchase (n=2: ½/½), then view, purchase
    //   (n=3: click ⅓, view ⅔)
    // user 2: purchase with no touches → direct
    val ev = Seq(
      (1L, ts(1), 101L, "click"), (1L, ts(2), 102L, "view"),
      (1L, ts(3), 103L, "purchase"), (1L, ts(4), 104L, "view"),
      (1L, ts(5), 105L, "purchase"),
      (2L, ts(1), 201L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.linearAttribution(ev, "user_id", "ts", "event_id",
      "event_type", Seq("click", "view"), "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // click: conv1 k=1/n=2 → 0.5; conv2 k=1/n=3 → 1/3
    assert(got("click")._1 == 2L && got("click")._2 == 2L)
    assert(got("click")._3 == 1.0 / 2.0 + 1.0 / 3.0, got("click"))
    // view: conv1 1/2; conv2 2/3
    assert(got("view")._1 == 2L && got("view")._2 == 3L)
    assert(got("view")._3 == 1.0 / 2.0 + 2.0 / 3.0, got("view"))
    assert(got("direct") == ((1L, 0L, 1.0)), got("direct"))
    // credit conservation: Σ credit = #conversions (up to the float
    // sum of the exact per-channel shares)
    assert(math.abs(got.values.map(_._3).sum - 3.0) < 1e-9)
  }

  test("linearAttribution: same-timestamp touch counts only when its id sorts first") {
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), 5L, "purchase"), (1L, ts(1), 6L, "click"),
      (2L, ts(1), 1L, "click"), (2L, ts(1), 2L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.linearAttribution(ev, "user_id", "ts", "event_id",
      "event_type", Seq("click", "view"), "purchase")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // user 1: purchase (id 5) precedes click (id 6) → direct;
    // user 2: click (id 1) precedes purchase (id 2) → click credit 1
    assert(got == Map("click" -> 1.0, "direct" -> 1.0), got)
  }

  test("positionAttribution: hand-computed U-shape incl. n=1/n=2 cases") {
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // user 1: click,view,view,purchase → n=3: f=click l=view
    //   click: 0.4 (first) ; view: 0.4 (last) + 0.2·(2−0−1)/1 = 0.6
    // user 2: view,purchase → n=1: view 1.0
    // user 3: click,view,purchase → n=2: 0.5 / 0.5
    // user 4: purchase → direct
    val ev = Seq(
      (1L, ts(1), 1L, "click"), (1L, ts(2), 2L, "view"),
      (1L, ts(3), 3L, "view"), (1L, ts(4), 4L, "purchase"),
      (2L, ts(1), 5L, "view"), (2L, ts(2), 6L, "purchase"),
      (3L, ts(1), 7L, "click"), (3L, ts(2), 8L, "view"),
      (3L, ts(3), 9L, "purchase"),
      (4L, ts(1), 10L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.positionAttribution(ev, "user_id", "ts", "event_id",
      "event_type", Seq("click", "view"), "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val mw = 1.0 - 0.4 - 0.4
    // click credit: u1 0.4·1 (first) + u3 0.5 (n=2 first)
    val clickExp = 1.0 * (0.4 * 1.0 + 0.4 * 0.0 + mw * (1.0 - 1.0 - 0.0) / 1.0) +
      1.0 * (0.5 * 1.0 + 0.5 * 0.0)
    // view: u1 (last, k=2): 0.4·0 + 0.4·1 + mw·(2−0−1)/1 ; u2 n=1: 1 ;
    //   u3 n=2 last: 0.5
    assert(got("click")._4 == clickExp, got("click"))
    assert(got("click")._1 == 2L && got("click")._2 == 2L && got("click")._3 == 0L)
    val viewTerms = Seq(
      1.0 * 1.0,                                   // (fm=1? u2 n=1: fm=lm=1) cnt·fm
      1.0 * (0.5 * 0.0 + 0.5 * 1.0),               // u3 n=2 lm=1
      1.0 * (0.4 * 0.0 + 0.4 * 1.0 + mw * (2.0 - 0.0 - 1.0) / 1.0)) // u1
    // engine folds sorted by (fm,lm,k,n,cnt): u1 (0,1,2,3), u3 (0,1,1,2),
    // u2 (1,1,1,1) → order: u3, u1, u2
    val viewExp = 0.0 + viewTerms(1) + viewTerms(2) + viewTerms(0)
    assert(got("view")._4 == viewExp, got("view"))
    assert(got("direct") == ((1L, 0L, 0L, 1.0)), got("direct"))
    // conservation: 4 conversions
    assert(math.abs(got.values.map(_._4).sum - 4.0) < 1e-9)
  }

  test("positionAttribution validates weights") {
    val df = Seq((1L, Timestamp.valueOf("2026-01-01 10:00:00"), 1L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    intercept[IllegalArgumentException] {
      EventOps.positionAttribution(df, "user_id", "ts", "event_id",
        "event_type", Seq("click"), "purchase", firstWeight = 0.7,
        lastWeight = 0.5)
    }
  }

  test("linearAttribution matches a plain-Scala model on random streams") {
    val rng = new scala.util.Random(42L)
    val types = Seq("click", "view", "purchase", "other")
    val rows = for { u <- 1L to 20L; i <- 1L to 30L } yield
      (u, Timestamp.valueOf(f"2026-01-01 ${10 + (i / 60).toInt}%02d:${(i % 60).toInt}%02d:00"),
        u * 1000 + i, types(rng.nextInt(types.size)))
    val ev = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.linearAttribution(ev, "user_id", "ts", "event_id",
      "event_type", Seq("click", "view"), "purchase")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // integer fields vs a direct local model (credit doubles are
    // pinned by the hand fixture; here we check the count grain)
    var expected = Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    var nDirect = 0L
    rows.groupBy(_._1).values.foreach { es =>
      var k = Map("click" -> 0L, "view" -> 0L)
      es.sortBy(e => (e._2.getTime, e._3)).foreach {
        case (_, _, _, t) if k.contains(t) => k += t -> (k(t) + 1)
        case (_, _, _, "purchase") =>
          val n = k.values.sum
          if (n == 0) nDirect += 1
          else k.foreach { case (c, kc) => if (kc > 0) {
            val (a, b) = expected(c); expected += c -> (a + 1, b + kc)
          } }
        case _ => ()
      }
    }
    expected.foreach { case (c, e) => assert(got(c) == e, s"$c: ${got(c)} vs $e") }
    assert(got("direct")._1 == nDirect)
  }

  // --- markovRemovalAttribution ---------------------------------------

  test("markovRemovalAttribution: hand-computed ppm masses on a 4-user fixture") {
    // u1 view→click→purchase, u2 view→click (null), u3 click→purchase,
    // u4 view (null). Transitions (ppm, integer div):
    //   start→view 3/4 = 750000, start→click 1/4 = 250000
    //   view→click 2/3 = 666666, view→null 1/3 = 333333
    //   click→conv 2/3 = 666666, click→null 1/3 = 333333
    // Full chain absorbs conv mass 499998 by step 3 (truncation leaks
    // 2 ppm per div); removing view leaves only start→click→conv =
    // 166666; removing click kills every conversion path → 0.
    val df = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "view"), (2L, 2L, "click"),
      (3L, 1L, "click"), (3L, 2L, "purchase"),
      (4L, 1L, "view")).toDF("u", "id", "t")
    val out = EventOps.markovRemovalAttribution(df, "u", "id", "t", "purchase")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("click", "view"))
    val click = out.head; val view = out.last
    assert(click._2 == 499998L && view._2 == 499998L) // shared full mass
    assert(click._3 == 0L && view._3 == 166666L)
    assert(click._4 == 499998.0 / 499998.0) // removal effect 1.0
    assert(view._4 == 333332.0 / 499998.0)
    assert(click._5 == 499998.0 / 833330.0)
    assert(view._5 == 333332.0 / 833330.0)
  }

  test("markovRemovalAttribution: shares sum to ~1, removal never helps") {
    val rnd = new scala.util.Random(3)
    val types = Seq("a", "b", "c", "buy")
    val rows = for {
      u <- 1L to 60L
      i <- 1L to (1 + rnd.nextInt(6)).toLong
    } yield (u, i, types(rnd.nextInt(types.size)))
    val df = rows.toDF("u", "id", "t")
    val out = EventOps.markovRemovalAttribution(df, "u", "id", "t", "buy")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // conversion mass under removal is bounded by the full chain's
    out.foreach(r => assert(r._3 <= r._2, r.toString))
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-9)
    // exact determinism under a different partitioning
    val out2 = EventOps.markovRemovalAttribution(
      df.repartition(7), "u", "id", "t", "buy")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out == out2)
  }

  // --- shapleyAttribution ----------------------------------------------

  test("shapleyAttribution: hand-computed φ on a 2-channel lattice") {
    // sets: {}=conv 1/1, {A}=1/2, {B}=1/1, {A,B}=0/1; w(0)=w(1)=0.5
    // φ_A = .5(v{A}−v∅) + .5(v{A,B}−v{B}) = .5(.5−1) + .5(0−1) = −0.75
    // φ_B = .5(v{B}−v∅) + .5(v{A,B}−v{A}) = .5(0)   + .5(0−.5) = −0.25
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "buy"),
      (2L, 1L, "A"),
      (3L, 1L, "B"), (3L, 2L, "buy"),
      (4L, 1L, "A"), (4L, 2L, "B"),
      (5L, 1L, "buy")).toDF("u", "id", "t")
    val out = EventOps.shapleyAttribution(df, "u", "id", "t", "buy",
      channels = Seq("A", "B"))
      .as[(String, Double)].collect().toSeq
    val phiA = (0.0 + 0.5 * (0.5 - 1.0)) + 0.5 * (0.0 - 1.0)
    val phiB = (0.0 + 0.5 * (1.0 - 1.0)) + 0.5 * (0.0 - 0.5)
    assert(out == Seq("A" -> phiA, "B" -> phiB))
    // efficiency: Σφ = v(full) − v(∅) (exact here — terms are dyadic)
    assert(out.map(_._2).sum == 0.0 - 1.0)
  }

  test("shapleyAttribution: weights, undeclared channels, validation") {
    assert(EventOps.shapleyWeight(0, 4) == 0.25)
    assert(EventOps.shapleyWeight(3, 4) == 0.25)
    assert(EventOps.shapleyWeight(1, 4) == 1.0 * 2.0 / 24.0)
    val df = Seq((1L, 1L, "A"), (2L, 1L, "Z")).toDF("u", "id", "t")
    intercept[Exception] {
      EventOps.shapleyAttribution(df, "u", "id", "t", "buy",
        Seq("A")).collect()
    }
    intercept[IllegalArgumentException] {
      EventOps.shapleyAttribution(df, "u", "id", "t", "buy", Seq("A", "A"))
    }
    intercept[IllegalArgumentException] {
      EventOps.shapleyAttribution(df, "u", "id", "t", "buy", Seq("A", "buy"))
    }
    intercept[IllegalArgumentException] {
      EventOps.shapleyWeight(4, 4)
    }
  }

  test("shapleyAttribution: partitioning-invariant on a random stream") {
    val rnd = new scala.util.Random(5)
    val types = Seq("a", "b", "c", "buy")
    val rows = for {
      u <- 1L to 80L; i <- 1L to (1 + rnd.nextInt(5)).toLong
    } yield (u, i, types(rnd.nextInt(types.size)))
    val df = rows.toDF("u", "id", "t")
    val a = EventOps.shapleyAttribution(df, "u", "id", "t", "buy",
      Seq("a", "b", "c")).as[(String, Double)].collect().toSeq
    val b = EventOps.shapleyAttribution(df.repartition(9), "u", "id", "t",
      "buy", Seq("a", "b", "c")).as[(String, Double)].collect().toSeq
    assert(a == b && a.size == 3)
  }

  test("markovRemovalAttribution: conversion-first journeys and validation") {
    // a user whose very first event converts contributes start→conv
    // directly — no channel ever touches that mass
    val df = Seq(
      (1L, 1L, "purchase"),
      (2L, 1L, "a"), (2L, 2L, "purchase"),
      (3L, 1L, "a")).toDF("u", "id", "t")
    val out = EventOps.markovRemovalAttribution(df, "u", "id", "t", "purchase")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("a"))
    // start→conv 1/3, start→a 2/3; a→conv 1/2, a→null 1/2:
    // full = 333333 + 666666·500000 div 10⁶ = 333333 + 333333 = 666666
    // removed a: only the direct 333333 survives
    assert(out.head._2 == 666666L && out.head._3 == 333333L)
    intercept[IllegalArgumentException] {
      EventOps.markovRemovalAttribution(df, "u", "id", "t", "purchase",
        steps = 0)
    }
  }
}

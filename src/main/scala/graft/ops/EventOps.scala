package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Event/behavioral analytics over an (actor, timestamp, …) stream —
  * the cohort-retention and funnel primitives every product-analytics
  * warehouse query set contains (the reference's events are the same
  * shape: README.md:596-607 builds per-entity time series the report
  * layer rolls up). Both operators aggregate FIRST and join at the
  * actor grain after, so raw event rows shuffle at most once and every
  * later stage works on one-row-per-actor frames.
  */
object EventOps {

  /** Cohort retention matrix: actors are cohorted by the calendar month
    * of their FIRST event, and each (cohort month, month offset) cell
    * counts the cohort members active that many months later, plus the
    * retained fraction of the cohort.
    *
    * Scale shape — ONE shuffle over raw events: a single groupBy on the
    * actor collapses the stream to one row per actor carrying
    * (first month, set of active months); `collect_set` is bounded by
    * the number of calendar months in the table's history (an 8-year
    * table caps it at 96 entries), never by the actor's event count,
    * because the month truncation happens INSIDE the set. The explode
    * that follows works on the per-actor frame (|actors| rows), and the
    * final aggregate is at the (cohort, offset) grain — at most
    * months² rows. Cohort size is recovered from the matrix itself:
    * the offset-0 cell contains every cohort member by construction
    * (an actor is always active in its own first month), so a window
    * max per cohort replaces a second pass over the data.
    *
    * The month offset is pure integer calendar arithmetic
    * (Δyear·12 + Δmonth) — portable across engines, no timestamp
    * subtraction semantics involved. `retention` is one IEEE division
    * of two exact longs.
    */
  def cohortRetention(
      events: DataFrame, actorCol: String, tsCol: String): DataFrame = {
    val monthTs = date_trunc("month", col(tsCol))
    val perActor = events
      .filter(col(actorCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(actorCol))
      .agg(min(monthTs).as("_cohort_ts"),
        collect_set(monthTs).as("_months"))
    val offs = (m: Column, c: Column) =>
      ((year(m) - year(c)) * 12 + (month(m) - month(c))).cast(IntegerType)
    val cells = perActor
      .select(col("_cohort_ts"), explode(col("_months")).as("_m"))
      .groupBy(col("_cohort_ts").cast("date").as("cohort_month"),
        offs(col("_m"), col("_cohort_ts")).as("month_offset"))
      .agg(count(lit(1)).as("n_active"))
    cells
      .withColumn("cohort_size",
        max(col("n_active")).over(Window.partitionBy(col("cohort_month"))))
      .withColumn("retention",
        col("n_active").cast(DoubleType) / col("cohort_size").cast(DoubleType))
      .orderBy(col("cohort_month"), col("month_offset"))
  }

  /** Ordered funnel: per actor, the earliest time each named step was
    * reached, where step i+1 only counts at or after the actor's step-i
    * time (the strict product-funnel semantics — a purchase logged
    * before the signup does not complete a signup→purchase funnel).
    * Output is one row per actor that performed step 0: the step
    * timestamps (NULL once the funnel is abandoned) and `stage_reached`
    * (1..k). Conversion counts/rates are a trivial aggregate over this
    * frame; emitting the actor grain keeps the per-actor times — the
    * joinable artifact downstream cohort splits need.
    *
    * Scale shape — a chain of k conditional min-aggregates: stage i is
    * `events WHERE type = step_i` joined to the stage-(i−1) frame ON
    * the actor key and filtered to ts ≥ t_{i−1} BEFORE its min. Every
    * join keys on the actor column that each side was just aggregated
    * or filtered on, so the k−1 joins reuse one hash partitioning
    * (no new shuffle grain ever appears), and each stage's input
    * shrinks to the actors still alive in the funnel. No per-actor
    * event list is ever collected — state per actor is one timestamp
    * per stage, not the event history.
    */
  /** `maxGapSeconds`: conversion-window bound — step i+1 only counts
    * within that many seconds of the actor's step-i time (inclusive),
    * the "purchase within 7 days of the click" semantics every funnel
    * report defaults to. `None` = unbounded. Interval arithmetic, so
    * TIMESTAMP and TIMESTAMP_NTZ inputs both work. */
  def funnelStages(
      events: DataFrame, actorCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnelStages: steps must be non-empty")
    require(steps.distinct == steps,
      s"funnelStages: steps must be distinct, got $steps")
    maxGapSeconds.foreach(g => require(g > 0,
      s"funnelStages: maxGapSeconds must be > 0, got $g"))
    val a = col(actorCol)
    // NULL actors are excluded up front: they would otherwise collapse
    // into ONE phantom funnel entry whose t₁ is the min over every
    // anonymous event (the cohortRetention convention)
    val ev = events.filter(a.isNotNull)
    // Internal stage columns carry an unlikely prefix (the AsOfJoin
    // _ts/_match convention): an input frame that already has a column
    // named t1/t2/… must not turn the stage join filters into ambiguous
    // references. Output renames to the public t1..tk at the end.
    val tc = (i: Int) => s"_funnel_t$i"
    // stage frames: (actor, t_i) — t_i = earliest step-i event at or
    // after the actor's t_{i-1}
    val stage0 = ev.filter(col(typeCol) === steps.head)
      .groupBy(a).agg(min(col(tsCol)).as(tc(1)))
    val stages = steps.zipWithIndex.tail.scanLeft(stage0) {
      case (prev, (step, i)) =>
        val inWindow = maxGapSeconds match {
          case None => col(tsCol) >= col(tc(i))
          case Some(g) => col(tsCol) >= col(tc(i)) &&
            col(tsCol) <= col(tc(i)) + expr(s"INTERVAL '$g' SECOND")
        }
        ev.filter(col(typeCol) === step)
          .join(prev, actorCol)
          .filter(inWindow)
          .groupBy(a).agg(min(col(tsCol)).as(tc(i + 1)))
    }
    val assembled = stages.zipWithIndex.tail.foldLeft(stage0) {
      case (acc, (s, i)) =>
        acc.join(s.select(a, col(tc(i + 1))), Seq(actorCol), "left")
    }
    val renamed = steps.indices.foldLeft(assembled) {
      case (acc, i) => acc.withColumnRenamed(tc(i + 1), s"t${i + 1}")
    }
    val reached = steps.indices.tail
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    renamed
      .withColumn("stage_reached", reached.cast(LongType))
      .orderBy(a)
  }

  /** Last-touch attribution: each conversion event is credited to the
    * actor's most recent touch event at or before it (in the
    * (timestamp, event id) total order — the unique id breaks
    * same-timestamp ties deterministically, and makes a touch sharing
    * a conversion's timestamp count only when its id sorts first).
    * Conversions with no prior touch keep NULL touch columns — the
    * "direct / unattributed" bucket every marketing report needs as
    * data, not as silently dropped rows.
    *
    * ONE window over ONE shuffle on the actor key: the touch identity
    * rides as a struct through `last(_, ignoreNulls = true)` with a
    * running ROWS frame — per-row state is a single struct, never a
    * collected event list, so a hot actor costs O(1) memory. The same
    * running-last construction restates in SQL as
    * `last_value(x IGNORE NULLS)`. */
  def lastTouchAttribution(
      events: DataFrame, actorCol: String, tsCol: String, idCol: String,
      typeCol: String, touchTypes: Seq[String],
      conversionType: String): DataFrame = {
    require(touchTypes.nonEmpty,
      "lastTouchAttribution: touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      s"lastTouchAttribution: conversion type '$conversionType' cannot " +
        "also be a touch type — a purchase would attribute to itself")
    val a = col(actorCol)
    val w = Window.partitionBy(a).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).as("t"), col(idCol).as("i"),
        col(typeCol).as("y")))
    // NULL actors are excluded: the window partitions NULL with NULL,
    // so one anonymous user's purchase would otherwise be credited to
    // a DIFFERENT anonymous user's click instead of the direct bucket
    events.filter(a.isNotNull)
      .withColumn("_lt", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(a, col(idCol).as("conversion_id"),
        col(tsCol).as("conversion_ts"),
        col("_lt.i").as("touch_id"),
        col("_lt.t").as("touch_ts"),
        col("_lt.y").as("touch_type"))
  }

  /** LINEAR multi-touch attribution: every touch at or before a
    * conversion shares the credit equally (1/n each), so a channel's
    * credit from one conversion is k_channel/n — the equal-weight
    * companion to [[lastTouchAttribution]] (which hands the whole
    * conversion to the final touch). Touchless conversions credit the
    * `direct` bucket with 1, as there. Model note: "all touches since
    * the stream start" (not since the previous conversion) — the
    * unwindowed linear model; a lookback variant is a frame change.
    *
    * Output: one row per channel (+ `direct`) —
    * (`channel`, `n_conversions`, `n_credited_touches`, `credit`).
    * A channel that never touches a conversion is absent (the
    * no-evidence contract).
    *
    * Scale/determinism shape: per-channel running counts over ONE
    * actor-grain window shuffle (O(#channels) state per row, no event
    * collection); conversions aggregate to the bounded (k, n) grain
    * per channel, and the credit sum Σ cnt·k/n — the one place a
    * cross-row DOUBLE sum could diverge — is a SORTED-ARRAY fold over
    * that bounded grain (fixed left-to-right IEEE chain, restatable as
    * an ordered list_reduce), never a floating aggregate over rows. */
  def linearAttribution(events: DataFrame, actorCol: String, tsCol: String,
      idCol: String, typeCol: String, touchTypes: Seq[String],
      conversionType: String): DataFrame = {
    require(touchTypes.nonEmpty, "linearAttribution: touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      s"linearAttribution: conversion type $conversionType cannot be a touch type")
    val w = Window.partitionBy(col(actorCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val typed = events.filter(col(actorCol).isNotNull)
    val withCounts = touchTypes.zipWithIndex.foldLeft(typed) {
      case (df, (t, i)) => df.withColumn(s"_lat_k$i",
        sum(when(col(typeCol) === t, 1L).otherwise(0L)).over(w))
    }
    val conv = withCounts.filter(col(typeCol) === conversionType)
      .withColumn("_lat_n",
        touchTypes.indices.map(i => col(s"_lat_k$i")).reduce(_ + _))
    val channelRows = touchTypes.zipWithIndex.map { case (t, i) =>
      conv.filter(col("_lat_n") > 0 && col(s"_lat_k$i") > 0)
        .groupBy(col(s"_lat_k$i").as("_lat_k"), col("_lat_n"))
        .agg(count(lit(1)).as("_lat_cnt"))
        .select(lit(t).as("channel"), col("_lat_k"), col("_lat_n"), col("_lat_cnt"))
    }.reduce(_.unionByName(_))
    val folded = channelRows
      .groupBy(col("channel"))
      .agg(
        sum(col("_lat_cnt")).as("n_conversions"),
        sum(col("_lat_cnt") * col("_lat_k")).as("n_credited_touches"),
        aggregate(
          sort_array(collect_list(struct(col("_lat_k"), col("_lat_n"), col("_lat_cnt")))),
          lit(0.0),
          (acc, e) => acc + (e("_lat_cnt") * e("_lat_k")).cast(DoubleType) /
            e("_lat_n").cast(DoubleType))
          .as("credit"))
    val direct = conv.filter(col("_lat_n") === 0)
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit("direct").as("channel"), col("n_conversions"),
        lit(0L).as("n_credited_touches"),
        col("n_conversions").cast(DoubleType).as("credit"))
    folded.unionByName(direct).orderBy(col("channel"))
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution: the first and
    * last touch before a conversion carry `firstWeight`/`lastWeight`
    * (default the standard 40/40) and the remaining mass spreads
    * equally over the middle touches — the model that values
    * introduction AND closing over the linear model's flat split.
    * n = 1 → the single touch takes 1.0; n = 2 → a 50/50 split
    * (no middle exists to weight); touchless conversions → `direct`.
    *
    * Same exact-fold contract as [[linearAttribution]]: conversions
    * aggregate to the bounded (first?, last?, k, n) grain per channel
    * and the credit sum folds a SORTED array of fixed IEEE terms. The
    * middle weight is computed as `1.0 − fw − lw` IN DOUBLES — the
    * oracle must restate that exact op chain, NOT the algebraic
    * literal (1.0−0.4−0.4 = 0.19999999999999998 ≠ the literal 0.2 —
    * a measured one-ulp class of mismatch). First/last touch types
    * ride the one actor window as first/last(ignoreNulls) — O(1)
    * state, no event collection. */
  def positionAttribution(events: DataFrame, actorCol: String, tsCol: String,
      idCol: String, typeCol: String, touchTypes: Seq[String],
      conversionType: String, firstWeight: Double = 0.4,
      lastWeight: Double = 0.4): DataFrame = {
    require(touchTypes.nonEmpty, "positionAttribution: touchTypes must be non-empty")
    require(!touchTypes.contains(conversionType),
      s"positionAttribution: conversion type $conversionType cannot be a touch type")
    require(firstWeight >= 0 && lastWeight >= 0 &&
      firstWeight + lastWeight <= 1.0,
      s"positionAttribution: weights must be >= 0 with sum <= 1, " +
        s"got $firstWeight/$lastWeight")
    val w = Window.partitionBy(col(actorCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col(typeCol).isin(touchTypes.map(x => x: Any): _*)
    val typed = events.filter(col(actorCol).isNotNull)
      .withColumn("_pat_touch", when(isTouch, col(typeCol)))
    val withState = touchTypes.zipWithIndex.foldLeft(
      typed
        .withColumn("_pat_f", first(col("_pat_touch"), ignoreNulls = true).over(w))
        .withColumn("_pat_l", last(col("_pat_touch"), ignoreNulls = true).over(w))) {
      case (df, (t, i)) => df.withColumn(s"_pat_k$i",
        sum(when(col(typeCol) === t, 1L).otherwise(0L)).over(w))
    }
    val conv = withState.filter(col(typeCol) === conversionType)
      .withColumn("_pat_n",
        touchTypes.indices.map(i => col(s"_pat_k$i")).reduce(_ + _))
    val channelRows = touchTypes.zipWithIndex.map { case (t, i) =>
      conv.filter(col("_pat_n") > 0 && col(s"_pat_k$i") > 0)
        .groupBy(
          (col("_pat_f") === t).cast(IntegerType).as("_pat_fm"),
          (col("_pat_l") === t).cast(IntegerType).as("_pat_lm"),
          col(s"_pat_k$i").as("_pat_k"), col("_pat_n"))
        .agg(count(lit(1)).as("_pat_cnt"))
        .select(lit(t).as("channel"), col("_pat_fm"), col("_pat_lm"),
          col("_pat_k"), col("_pat_n"), col("_pat_cnt"))
    }.reduce(_.unionByName(_))
    val fw = lit(firstWeight); val lw = lit(lastWeight)
    val mw = lit(1.0) - fw - lw
    val term = (e: Column) => {
      val cnt = e("_pat_cnt").cast(DoubleType)
      val fm = e("_pat_fm").cast(DoubleType); val lm = e("_pat_lm").cast(DoubleType)
      val k = e("_pat_k").cast(DoubleType); val n = e("_pat_n").cast(DoubleType)
      when(e("_pat_n") === 1, cnt * fm)
        .when(e("_pat_n") === 2, cnt * (lit(0.5) * fm + lit(0.5) * lm))
        .otherwise(cnt * (fw * fm + lw * lm +
          mw * (k - fm - lm) / (n - lit(2.0))))
    }
    val folded = channelRows
      .groupBy(col("channel"))
      .agg(
        sum(col("_pat_cnt")).as("n_conversions"),
        sum(col("_pat_cnt") * col("_pat_fm")).as("n_first"),
        sum(col("_pat_cnt") * col("_pat_lm")).as("n_last"),
        aggregate(
          sort_array(collect_list(struct(col("_pat_fm"), col("_pat_lm"),
            col("_pat_k"), col("_pat_n"), col("_pat_cnt")))),
          lit(0.0), (acc, e) => acc + term(e))
          .as("credit"))
    val direct = conv.filter(col("_pat_n") === 0)
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit("direct").as("channel"), col("n_conversions"),
        lit(0L).as("n_first"), lit(0L).as("n_last"),
        col("n_conversions").cast(DoubleType).as("credit"))
    folded.unionByName(direct).orderBy(col("channel"))
  }

  /** MARKOV-CHAIN (removal-effect) multi-touch attribution (Anderl et
    * al. 2016 class) — the data-driven model the heuristic trio
    * (last/linear/position) approximates: build the first-order channel
    * transition chain over journeys, measure each channel's
    * contribution as how much ABSORBED CONVERSION PROBABILITY vanishes
    * when the channel is removed from the chain (its transitions
    * redirected to the null absorber), and split credit proportionally.
    *
    * Journeys: per actor ordered by `idCol`, truncated at the FIRST
    * `conversionType` event (mapped to the `__conv` absorber);
    * journeys with no conversion terminate in `__null`; a synthetic
    * `__start` state opens every journey. Transition probabilities are
    * exact integers in parts-per-million (p_ppm = n·10⁶ div total) and
    * absorption runs `steps` unrolled rounds of
    * mass·p_ppm div 10⁶ — the pagerankFixedPoint truncating-integer
    * discipline, so K rounds are BIT-EXACT cross-engine (a float chain
    * would diverge in the last ulps after K matrix products). Truncated
    * mass leaks by documented design; with steps ≥ the typical journey
    * length the ranking is unaffected (the same leak hits every
    * removal variant).
    *
    * Removal: per channel c, rows with from=c are dropped and edges
    * INTO c redirect to `__null` BEFORE re-normalization is NOT applied
    * (standard removal-effect semantics: the removed channel's traffic
    * is lost, not redistributed). Conversion mass under removal is
    * therefore ≤ the full chain's, so every removal effect is ≥ 0 and
    * `share = (full − removed_c) / Σ(full − removed_c')` divides two
    * EXACT integers — no cross-row double accumulation anywhere.
    *
    * Scale: raw events shuffle once into the actor window; everything
    * after lives at the (channel², removal-dim) grain — dozens of rows
    * — localCheckpointed once so the K-step loop never replays the
    * event scan. */
  def markovRemovalAttribution(events: DataFrame, actorCol: String,
      idCol: String, typeCol: String, conversionType: String,
      steps: Int = 6, checkpointDir: Option[String] = None): DataFrame = {
    require(steps >= 1 && steps <= 20,
      s"markovRemovalAttribution: steps must be in [1,20], got $steps")
    DedupOps.setupCheckpointDir(events, checkpointDir)
    val PPM = 1000000L
    val w = Window.partitionBy(col("_actor")).orderBy(col("_id"))
    val base = events.filter(col(actorCol).isNotNull)
      .select(col(actorCol).as("_actor"), col(idCol).as("_id"),
        col(typeCol).as("_type"))
    val firstConv = base.filter(col("_type") === conversionType)
      .groupBy(col("_actor")).agg(min(col("_id")).as("_conv_id"))
    val journey = base.join(firstConv, Seq("_actor"), "left")
      .filter(col("_conv_id").isNull || col("_id") <= col("_conv_id"))
      .withColumn("_st",
        when(col("_type") === conversionType, lit("__conv"))
          .otherwise(col("_type")))
    val steps0 = journey
      .withColumn("_from", coalesce(lag(col("_st"), 1).over(w), lit("__start")))
      .withColumn("_is_last", lead(col("_st"), 1).over(w).isNull)
      .select(col("_from"), col("_st").as("_to"), col("_is_last"))
    // the terminal __null edge rides the same ROW: each event emits its
    // inbound edge plus — when it is a journey's last non-converting
    // state — the outbound __null edge, as ONE explode over a per-row
    // edge array. (The union-of-two-projections form re-executed the
    // whole journey window subtree twice — the self-review double-scan
    // class; one pass, identical edge multiset.)
    val trans = steps0
      .select(explode(when(col("_is_last") && col("_to") =!= "__conv",
          array(struct(col("_from"), col("_to")),
            struct(col("_to").as("_from"), lit("__null").as("_to"))))
        .otherwise(array(struct(col("_from"), col("_to"))))).as("_e"))
      .select(col("_e._from").as("_from"), col("_e._to").as("_to"))
      .groupBy(col("_from"), col("_to")).agg(count(lit(1)).as("_n"))
    val tot = trans.groupBy(col("_from")).agg(sum(col("_n")).as("_tot"))
    val p = trans.join(tot, Seq("_from"))
      .select(col("_from"), col("_to"),
        expr(s"(_n * ${PPM}L) div _tot").as("_ppm"))
      .transform(f => DedupOps.materialize(f, checkpointDir))
      // ^ channel²-grain; consumed once per removal dim. localCheckpoint
      // by default; pass checkpointDir for the reliable (executor-loss-
      // surviving) form — the connectedComponents seam, exercised in
      // ExecutorLossSpec
    val channels = p.select(col("_from").as("_c"))
      .filter(!col("_c").isin("__start", "__conv", "__null"))
      .distinct()
    val rdim = channels.select(col("_c").as("_removed"))
      .unionByName(p.sparkSession.range(1).select(lit("__none").as("_removed")))
    // __null is a DEAD absorber for the one statistic this op emits
    // (conversion mass): no edge leaves it, so its rows are pure
    // bookkeeping — pruned from the iteration AFTER the ppm
    // normalization (the terminal-edge counts still shape every
    // denominator). conv masses are bit-identical with or without it.
    val adjusted = p.crossJoin(rdim)
      .filter(col("_from") =!= col("_removed"))
      .groupBy(col("_removed"), col("_from"),
        when(col("_to") === col("_removed"), lit("__null"))
          .otherwise(col("_to")).as("_to"))
      .agg(sum(col("_ppm")).as("_ppm"))
      .filter(col("_to") =!= "__null")
      .unionByName(rdim.select(col("_removed"), lit("__conv").as("_from"),
        lit("__conv").as("_to"), lit(PPM).as("_ppm")))
      .transform(f => DedupOps.materialize(f, checkpointDir))
      // ^ (removal-dim × channel²) rows; joined K times
    var v = rdim
      .select(col("_removed"), lit("__start").as("_state"), lit(PPM).as("_m"))
    (1 to steps).foreach { _ =>
      // fresh names per round — joining a frame against its own
      // lineage ancestor (adjusted) with shared column names trips
      // Catalyst's ambiguous-attribute resolution
      val vr = v.select(col("_removed").as("_vr"), col("_state").as("_vs"),
        col("_m").as("_vm"))
      // the transition table is model-sized (removal-dim × channel²)
      // and consumed once per round: broadcast it so each round costs
      // ONE tiny exchange (the groupBy), not a re-shuffle of both sides
      v = vr.join(broadcast(adjusted),
          col("_vr") === col("_removed") && col("_vs") === col("_from"))
        .groupBy(col("_vr"), col("_to"))
        .agg(sum(expr(s"(_vm * _ppm) div ${PPM}L")).as("_m"))
        .select(col("_vr").as("_removed"), col("_to").as("_state"), col("_m"))
    }
    val conv = v.filter(col("_state") === "__conv")
      .select(col("_removed"), col("_m"))
    // aggregate (never filter-to-one-row) and LEFT join the channel
    // list: a removal that kills EVERY conversion path produces no
    // __conv row at all — its channel must surface with mass 0, the
    // strongest possible attribution signal, not vanish
    val full = conv.filter(col("_removed") === "__none")
      .agg(coalesce(sum(col("_m")), lit(0L)).as("_mf"))
    val perChannel = channels
      .join(conv, channels("_c") === conv("_removed"), "left")
      .crossJoin(broadcast(full))
      .select(col("_c").as("channel"),
        col("_mf").as("conv_full_ppm"),
        coalesce(col("_m"), lit(0L)).as("conv_removed_ppm"),
        (col("_mf") - coalesce(col("_m"), lit(0L))).as("_delta"))
    val totDelta = perChannel.agg(sum(col("_delta")).as("_td"))
    perChannel.crossJoin(broadcast(totDelta))
      .select(col("channel"), col("conv_full_ppm"), col("conv_removed_ppm"),
        when(col("conv_full_ppm") > 0L,
          col("_delta").cast(DoubleType) / col("conv_full_ppm").cast(DoubleType))
          .as("removal_effect"),
        when(col("_td") > 0L,
          col("_delta").cast(DoubleType) / col("_td").cast(DoubleType))
          .as("share"))
      .orderBy(col("channel"))
  }

  /** EXACT Shapley-value attribution over observed channel SUBSETS
    * (Shapley 1953 via the simplified marketing formulation of Zhao et
    * al. 2018, arXiv:1804.05327) — the axiomatically fair split of
    * conversion credit, the model [[markovRemovalAttribution]]'s
    * removal effect approximates: φ_i = Σ_{S ⊆ C∖{i}} |S|!(n−1−|S|)!/n!
    * · (v(S∪{i}) − v(S)), with v(S) the conversion rate of journeys
    * whose touched-channel set is EXACTLY S (v = 0 for unobserved
    * subsets, the standard practical convention — documented, not
    * silent).
    *
    * The channel universe is the CALLER'S declared list (n ≤ 16 —
    * 2ⁿ subset rows; exact Shapley is exponential BY DEFINITION, which
    * is why this op keys on the declared bounded universe): an
    * undeclared channel in the data raise_errors rather than silently
    * vanishing from every coalition (the bhFdr declared-m contract).
    * The 2ⁿ⁻¹ coalition weights are factorial ratios evaluated ONCE
    * driver-side ([[shapleyWeight]]) and inlined as literals — both
    * engines compare against the SAME doubles.
    *
    * Determinism: journeys truncate at the first conversion (the
    * markov contract); each journey collapses to one (mask, converted)
    * row via per-channel max-bit aggregates; subset stats are exact
    * longs; v is ONE IEEE division; each marginal term w·(v₁−v₀) a
    * fixed chain; and φ folds the ≤2ⁿ⁻¹ terms SORTED BY SUBSET MASK
    * (the cramers_v fold discipline).
    *
    * Scale: raw events shuffle once to the actor grain; everything
    * after lives on the ≤2ⁿ-row lattice (localCheckpoint'd — consumed
    * once per channel). */
  def shapleyAttribution(events: DataFrame, actorCol: String,
      idCol: String, typeCol: String, conversionType: String,
      channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 16,
      s"shapleyAttribution: need 1..16 declared channels, got ${channels.size}")
    require(channels.distinct.size == channels.size,
      s"shapleyAttribution: duplicate channels in $channels")
    require(!channels.contains(conversionType),
      s"shapleyAttribution: conversion type $conversionType cannot be a channel")
    val n = channels.size
    val base = events.filter(col(actorCol).isNotNull)
      .select(col(actorCol).as("_actor"), col(idCol).as("_id"),
        col(typeCol).as("_type"))
    val firstConv = base.filter(col("_type") === conversionType)
      .groupBy(col("_actor")).agg(min(col("_id")).as("_conv_id"))
    val declared = (channels :+ conversionType).map(x => x: Any)
    val journey = base.join(firstConv, Seq("_actor"), "left")
      .filter(col("_conv_id").isNull || col("_id") <= col("_conv_id"))
      .withColumn("_t",
        when(!col("_type").isin(declared: _*),
          raise_error(concat(
            lit("shapleyAttribution: undeclared channel "), col("_type"))))
          .otherwise(col("_type")))
    val maskExpr = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("_t") === c, lit(1L << i)).otherwise(lit(0L)))
    }.reduce(_ + _)
    val perActor = journey.groupBy(col("_actor"))
      .agg(maskExpr.as("_mask"),
        max(when(col("_t") === conversionType, 1L).otherwise(0L)).as("_conv"))
    val stats = perActor.groupBy(col("_mask"))
      .agg(count(lit(1)).as("_nj"), sum(col("_conv")).as("_nc"))
    val spark = events.sparkSession
    val lattice = spark.range(1L << n).select(col("id").as("_m"))
      .join(stats, col("_m") === col("_mask"), "left")
      .select(col("_m"),
        when(col("_nj") > 0L,
          col("_nc").cast(DoubleType) / col("_nj").cast(DoubleType))
          .otherwise(lit(0.0)).as("_v"),
        coalesce(col("_nj"), lit(0L)).as("_nj"))
      .localCheckpoint() // 2^n rows; consumed once per channel below
    val wArr = array((0 until n).map(s => lit(shapleyWeight(s, n))): _*)
    val bitArr = array((0 until n).map(i => lit(1L << i)): _*)
    val chf = spark.range(n).select(
      element_at(array(channels.map(lit): _*),
        (col("id") + 1).cast(IntegerType)).as("channel"),
      element_at(bitArr, (col("id") + 1).cast(IntegerType)).as("_bit"))
    val v0 = lattice.select(col("_m").as("_m0"), col("_v").as("_v0"))
    val v1 = lattice.select(col("_m").as("_m1"), col("_v").as("_v1"))
    val terms = broadcast(chf).join(v0, (col("_m0").bitwiseAND(col("_bit"))) === 0L)
      .join(v1, col("_m1") === col("_m0") + col("_bit"))
      .select(col("channel"), col("_m0"),
        (element_at(wArr, expr("bit_count(_m0)") + 1) *
          (col("_v1") - col("_v0"))).as("_term"))
    terms.groupBy(col("channel"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("_m0"), col("_term")))),
        lit(0.0), (acc, e) => acc + e("_term")).as("shapley"))
      .orderBy(col("channel"))
  }

  /** The Shapley coalition weight |S|!(n−1−|S|)!/n! — evaluated
    * DRIVER-SIDE only (exact small-integer factorials, one double
    * division) and inlined as a literal into both engines' plans. */
  def shapleyWeight(s: Int, n: Int): Double = {
    require(n >= 1 && s >= 0 && s < n, s"shapleyWeight: bad (s=$s, n=$n)")
    def fact(k: Int): Double = (1 to k).foldLeft(1.0)(_ * _)
    fact(s) * fact(n - 1 - s) / fact(n)
  }
}

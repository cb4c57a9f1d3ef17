package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling-window agg over a MemoryStream matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = Tables(spark, sf, "events")
      .select($"ts", $"value").as[(java.sql.Timestamp, Double)]
    val rows = batchDf.collect() // 1k rows — test-only driver hop

    val ms = MemoryStream[(java.sql.Timestamp, Double)]
    val sdf = ms.toDF.toDF("ts", "value")
    val agg = StreamOps.tumblingCountsStreaming(sdf)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_agg").start()
    try {
      ms.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("stream_agg")
        .select($"ws", $"cnt", $"sum_value")
        .as[(java.sql.Timestamp, Long, Double)].collect().toSet
      val batch = StreamOps.tumblingCounts(
        Tables(spark, sf, "events").select($"ts", $"value"))
        .as[(java.sql.Timestamp, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming sliding-window agg over a MemoryStream matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables(spark, sf, "events")
      .select($"ts", $"value").as[(java.sql.Timestamp, Double)].collect()
    val ms = MemoryStream[(java.sql.Timestamp, Double)]
    val q = StreamOps.slidingCountsStreaming(ms.toDF.toDF("ts", "value"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_sliding").start()
    try {
      ms.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("stream_sliding")
        .as[(java.sql.Timestamp, Long, Double)].collect().toSet
      val batch = StreamOps.slidingCounts(
        Tables(spark, sf, "events").select($"ts", $"value"))
        .as[(java.sql.Timestamp, Long, Double)].collect().toSet
      assert(streamed == batch)
      // sliding windows double-count events: total cnt = 2 × event count
      assert(streamed.toSeq.map(_._2).sum == 2 * rows.length)
    } finally q.stop()
  }

  test("stream-static join enriches a stream against a dim table with no streaming state") {
    // the everyday streaming-enrichment shape: each micro-batch joins a
    // (broadcastable) static dim — no watermarks, no state store; the
    // dim is re-resolvable per batch. Result must equal the batch join.
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "even"), (1L, "odd")).toDF("parity", "label")
    val events = Tables(spark, sf, "events")
      .select($"event_id", $"user_id").as[(Long, Long)].collect()
    val ms = MemoryStream[(Long, Long)]
    val sdf = ms.toDF.toDF("event_id", "user_id")
      .withColumn("parity", $"user_id" % 2)
    val joined = sdf.join(broadcast(dim), Seq("parity"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("stream_static").start()
    try {
      ms.addData(events.toIndexedSeq)
      q.processAllAvailable()
      val streamed = spark.table("stream_static")
        .select($"event_id", $"label").as[(Long, String)].collect().toSet
      val batch = Tables(spark, sf, "events")
        .select($"event_id", ($"user_id" % 2).as("parity"))
        .join(dim, Seq("parity"))
        .select($"event_id", $"label").as[(Long, String)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful flatMapGroupsWithState sessionization matches the SQL-window form") {
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_id",
        unix_timestamp(date_trunc("second", $"ts")).cast("long").multiply(1000000L).as("tsMicros"),
        $"value")
      .as[StreamOps.Event]
    val stateful = StreamOps.sessionize(ev, gapSeconds = 1800)
      .groupByKey(_.user_id)
      .mapGroups { (u, it) =>
        val sessions = it.toSeq.sortBy(_.session_id)
        (u, sessions.size, sessions.map(_.n_events).sum)
      }
      .collect().map { case (u, n, total) => u -> ((n, total)) }.toMap

    val sql = graft.queries.Catalog.queries("stream_sessionize")(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("total"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, total) => u -> ((n.toInt, total)) }.toMap

    assert(stateful == sql)
  }

  test("session_window boundary: a gap of EXACTLY the window gap still merges") {
    // pins the semantics the stream_session_window oracle depends on:
    // Spark extends a session while ts <= previous_ts + gap (closed
    // boundary — an event landing exactly at session end joins it), so
    // the lag-based oracle must split only on diff > gap, not >=
    val ev = Seq(0L, 1800L, 1801L, 5000L)
      .map(s => Tuple2(1L, new java.sql.Timestamp(s * 1000L)))
      .toDF("user_id", "ts")
    val sessions = ev
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"sw.start").as("start"), $"n")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(sessions == Seq((0L, 3L), (5000L, 1L)))
  }

  test("sessionize hot-key guard fails fast instead of buffering an unbounded group") {
    // one pathological user with more events than the cap: the group must
    // fail with the diagnostic, not attempt to buffer+sort it all
    val hot = (1 to 500).map(i => StreamOps.Event(42L, i.toLong, i * 1000000L, 1.0))
    val ds = hot.toDS()
    val e = intercept[Exception] {
      StreamOps.sessionize(ds, gapSeconds = 1800, maxGroupEvents = 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("hot key")))
    // same data under the default cap sessionizes fine (one dense session)
    val ok = StreamOps.sessionize(ds, gapSeconds = 1800).collect()
    assert(ok.toSeq == Seq(StreamOps.SessionOut(42L, 0L, 500L)))
  }

  test("sessionizeSorted handles a hot key far beyond the buffered cap without raising") {
    // the spillable path: same pathological single user, this time with
    // session gaps planted every 1000 events — no per-group buffer, so a
    // cap that would kill flatMapGroupsWithState is irrelevant here
    val hot = (0 until 50000).map { i =>
      val gapBumps = (i / 1000).toLong // every 1000th event jumps past the gap
      StreamOps.Event(42L, i.toLong, i * 1000000L + gapBumps * 3600L * 1000000L, 1.0)
    }
    val ds = hot.toDS().repartition(7) // scrambled input: the op must sort
    val out = StreamOps.sessionizeSorted(ds, gapSeconds = 1800).collect().sortBy(_.session_id)
    assert(out.length == 50, s"expected 50 sessions, got ${out.length}")
    assert(out.forall(_.n_events == 1000L))
    assert(out.map(_.session_id).toSeq == (0L until 50L))
  }

  test("sessionizeSorted matches the buffering sessionize on real multi-user data") {
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_id",
        unix_timestamp(date_trunc("second", $"ts")).cast("long").multiply(1000000L).as("tsMicros"),
        $"value")
      .as[StreamOps.Event]
    val sorted = StreamOps.sessionizeSorted(ev, gapSeconds = 1800)
      .collect().map(s => (s.user_id, s.session_id) -> s.n_events).toMap
    val buffered = StreamOps.sessionize(ev, gapSeconds = 1800)
      .collect().map(s => (s.user_id, s.session_id) -> s.n_events).toMap
    assert(sorted == buffered)
    assert(sorted.nonEmpty)
  }

  test("sessionizeStreaming closes the trailing session via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    def ev(uid: Long, eid: Long, sec: Long) =
      StreamOps.EventT(uid, eid, sec * 1000000L, 1.0, new java.sql.Timestamp(sec * 1000L))
    val ms = MemoryStream[StreamOps.EventT]
    // 30-min gap, 1-min watermark delay
    val sessions = StreamOps.sessionizeStreaming(ms.toDS(), gapSeconds = 1800,
      watermarkDelay = "1 minute")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions").start()
    try {
      // batch 1: user 1 has a 3-event session ending at t=1600s (offset
      // from epoch — the initial watermark is 0 and an event AT the
      // watermark is dropped as late)
      ms.addData(ev(1L, 1L, 1000L), ev(1L, 2L, 1300L), ev(1L, 3L, 1600L))
      q.processAllAvailable()
      assert(spark.table("stream_sessions").count() == 0,
        "open session must NOT be emitted while it could still grow")
      // batch 2: an unrelated user far in the future pushes the watermark
      // past 1600s + gap + delay → user 1's session can no longer grow
      ms.addData(ev(2L, 9L, 10000L))
      q.processAllAvailable()
      // batch 3: timeout fires on the micro-batch AFTER the watermark moved
      ms.addData(ev(2L, 10L, 10001L))
      q.processAllAvailable()
      val got = spark.table("stream_sessions")
        .as[StreamOps.SessionOut].collect().toSet
      assert(got.contains(StreamOps.SessionOut(1L, 0L, 3L)),
        s"expected user 1's closed 3-event session, got $got")
      // user 2's session is still open (watermark has not passed its end)
      assert(!got.exists(_.user_id == 2L))
    } finally q.stop()
  }

  test("sessionizeStreaming: session ids continue after a timeout; late events merge or drop") {
    implicit val sqlCtx = spark.sqlContext
    def ev(uid: Long, eid: Long, sec: Long) =
      StreamOps.EventT(uid, eid, sec * 1000000L, 1.0, new java.sql.Timestamp(sec * 1000L))
    val ms = MemoryStream[StreamOps.EventT]
    val sessions = StreamOps.sessionizeStreaming(ms.toDS(), gapSeconds = 300,
      watermarkDelay = "2 hours") // wide watermark: late events stay admitted
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("ss_cont").start()
    try {
      // batch 1: user 1 session [1000..1100] (2 events)
      ms.addData(ev(1L, 1L, 1000L), ev(1L, 2L, 1100L))
      q.processAllAvailable()
      // batch 2: a cross-batch late event INSIDE the gap of the open
      // session's end (1100-200=900) merges by count; one older than the
      // gap (500) is dropped — and neither may regress the session end
      ms.addData(ev(1L, 3L, 900L), ev(1L, 4L, 500L))
      q.processAllAvailable()
      // batch 3: far-future user advances the watermark beyond
      // 1100 + gap + delay → user 1's session times out
      ms.addData(ev(2L, 8L, 20000L))
      q.processAllAvailable()
      ms.addData(ev(2L, 9L, 20001L))
      q.processAllAvailable()
      val afterTimeout = spark.table("ss_cont").as[StreamOps.SessionOut].collect().toSet
      // merged late event counted (3 events), dropped one not
      assert(afterTimeout.contains(StreamOps.SessionOut(1L, 0L, 3L)),
        s"expected session 0 with 3 events, got $afterTimeout")
      // batch 5: user 1 RETURNS; two in-batch events split by > gap so the
      // first new session closes immediately — its id must be 1, not 0
      ms.addData(ev(1L, 5L, 21000L), ev(1L, 6L, 22000L))
      q.processAllAvailable()
      val finalOut = spark.table("ss_cont").as[StreamOps.SessionOut].collect().toSet
      assert(finalOut.contains(StreamOps.SessionOut(1L, 1L, 1L)),
        s"returning user must continue at session id 1, got $finalOut")
      assert(!finalOut.exists(s => s.user_id == 1L && s.session_id == 0L && s.n_events != 3L),
        s"session id 0 must not be reused: $finalOut")
    } finally q.stop()
  }

  test("stateful ops run on the RocksDB state store (the at-scale backend)") {
    // the default HDFS-backed store keeps state on the JVM heap — fine
    // for tests, an OOM risk at 100 TB state. RocksDB spills to local
    // disk; this pins that our stateful sessionization is
    // backend-portable (same results, no provider-specific behavior).
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ev(uid: Long, eid: Long, sec: Long) =
      StreamOps.EventT(uid, eid, sec * 1000000L, 1.0, new java.sql.Timestamp(sec * 1000L))
    val ms = MemoryStream[StreamOps.EventT]
    val sessions = StreamOps.sessionizeStreaming(ms.toDS(), gapSeconds = 300,
      watermarkDelay = "1 minute")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("rocksdb_sessions").start()
    try {
      ms.addData(ev(1L, 1L, 1000L), ev(1L, 2L, 1100L))
      q.processAllAvailable()
      ms.addData(ev(2L, 9L, 10000L)) // watermark push
      q.processAllAvailable()
      ms.addData(ev(2L, 10L, 10001L)) // timeout batch
      q.processAllAvailable()
      val got = s.table("rocksdb_sessions").as[StreamOps.SessionOut].collect().toSet
      assert(got.contains(StreamOps.SessionOut(1L, 0L, 2L)),
        s"expected the closed session under RocksDB state, got $got")
    } finally q.stop()
  }

  test("transformWithState sessionization matches the fMGWS variant (Spark 4 state API)") {
    // same 4-batch scenario as the fMGWS continuity test: within-gap late
    // merge, older-than-gap drop, timeout close, id continuity on return
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ev(uid: Long, eid: Long, sec: Long) =
      StreamOps.EventT(uid, eid, sec * 1000000L, 1.0, new java.sql.Timestamp(sec * 1000L))
    val ms = MemoryStream[StreamOps.EventT]
    val sessions = StreamOps.sessionizeTws(ms.toDS(), gapSeconds = 300,
      watermarkDelay = "2 hours")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("tws_sessions").start()
    try {
      ms.addData(ev(1L, 1L, 1000L), ev(1L, 2L, 1100L))
      q.processAllAvailable()
      ms.addData(ev(1L, 3L, 900L), ev(1L, 4L, 500L)) // merge + drop
      q.processAllAvailable()
      ms.addData(ev(2L, 8L, 20000L)) // watermark push
      q.processAllAvailable()
      ms.addData(ev(2L, 9L, 20001L)) // timer fires this batch
      q.processAllAvailable()
      val afterTimeout = s.table("tws_sessions").as[StreamOps.SessionOut].collect().toSet
      assert(afterTimeout.contains(StreamOps.SessionOut(1L, 0L, 3L)),
        s"expected session 0 with 3 events (late merge, older drop), got $afterTimeout")
      // returning user: ids continue from the tombstone
      ms.addData(ev(1L, 5L, 21000L), ev(1L, 6L, 22000L))
      q.processAllAvailable()
      val finalOut = s.table("tws_sessions").as[StreamOps.SessionOut].collect().toSet
      assert(finalOut.contains(StreamOps.SessionOut(1L, 1L, 1L)),
        s"returning user must continue at session id 1, got $finalOut")
      assert(!finalOut.exists(x => x.user_id == 1L && x.session_id == 0L && x.n_events != 3L),
        s"session id 0 must not be reused: $finalOut")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a file source then stops (scheduled-batch semantics)") {
    // the streaming-native form of the reference's monthly scheduled job:
    // process everything currently available, then terminate
    val dir = Files.createTempDirectory("an_src").toFile.getAbsolutePath
    val events = Tables(spark, sf, "events").select($"ts", $"value")
    events.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(events.schema).parquet(dir)
    val q = StreamOps.tumblingCountsStreaming(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("an_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    val streamed = spark.table("an_out")
      .as[(java.sql.Timestamp, Long, Double)].collect().toSet
    val batch = StreamOps.tumblingCounts(events)
      .as[(java.sql.Timestamp, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sdf = ms.toDF.toDF("k", "ts", "v")
    val q = StreamOps.dedupWithinWatermark(sdf, Seq("k"), "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      val t0 = new java.sql.Timestamp(1700000000000L)
      ms.addData((1L, t0, 1.0), (1L, t0, 2.0), (2L, t0, 3.0)) // in-batch dup
      q.processAllAvailable()
      ms.addData((1L, new java.sql.Timestamp(1700000060000L), 4.0)) // cross-batch dup, inside watermark
      q.processAllAvailable()
      val keys = spark.table("dedup_out").select($"k").as[Long].collect().toSeq
      assert(keys.sorted == Seq(1L, 2L), s"each key emitted exactly once, got $keys")
    } finally q.stop()
  }

  test("state store data source reads a running aggregation's state (ops introspection)") {
    // spark.read.format("statestore") over a checkpoint is the
    // operational window into streaming state — at production scale the
    // first question about a misbehaving stateful query ("what IS in
    // the store for key k?") must be answerable without instrumenting
    // the job. The sibling "state-metadata" format enumerates operators
    // and shard counts.
    implicit val sqlCtx = spark.sqlContext
    val cp = java.nio.file.Files.createTempDirectory("graft-ss-cp").toString
    val ms = MemoryStream[(Long, Double)]
    val q = ms.toDF.toDF("k", "v")
      .groupBy($"k").agg(sum($"v").as("total"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", cp)
      .format("memory").queryName("ss_probe").start()
    try {
      ms.addData((1L, 2.0), (1L, 3.0), (2L, 7.0))
      q.processAllAvailable()
    } finally q.stop()
    // the state value exposes the AGGREGATION BUFFER's physical field
    // (`sum`), not the query's output alias — state introspection sees
    // the operator's storage schema
    val state = spark.read.format("statestore").load(cp)
      .select($"key.k", $"value.sum")
      .as[(Long, Double)].collect().toMap
    assert(state == Map(1L -> 5.0, 2L -> 7.0), state.toString)
    val meta = spark.read.format("state-metadata").load(cp)
    assert(meta.count() >= 1, meta.columns.mkString(","))
  }

  test("stream-stream time-range join matches the equivalent batch join") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(m: Long) = new java.sql.Timestamp(base + m * 60000L)
    val clicks = Seq((1L, ts(5), "c1"), (1L, ts(40), "c2"), (2L, ts(10), "c3"))
    val signups = Seq((1L, ts(0), "s1"), (2L, ts(9), "s2"), (3L, ts(1), "s3"))

    val msL = MemoryStream[(Long, java.sql.Timestamp, String)]
    val msR = MemoryStream[(Long, java.sql.Timestamp, String)]
    val left = msL.toDF.toDF("user_id", "ts", "click")
    val right = msR.toDF.toDF("r_user_id", "r_ts", "signup")
    val q = StreamOps.streamStreamJoin(left, right, "user_id", "ts", "r_ts",
      watermark = "2 hours", horizon = "'30' MINUTE")
      .select($"user_id", $"click", $"signup")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      msL.addData(clicks: _*)
      msR.addData(signups.map { case (u, t, s) => (u, t, s) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .as[(Long, String, String)].collect().toSet
      // batch equivalent: click within [signup, signup + 30 min]
      val expected = (for {
        (u, ct, c) <- clicks
        (ru, rt, sg) <- signups
        if u == ru && ct.getTime >= rt.getTime && ct.getTime <= rt.getTime + 30 * 60000L
      } yield (u, c, sg)).toSet
      assert(streamed == expected && expected.nonEmpty,
        s"streamed=$streamed expected=$expected")
    } finally q.stop()
  }

  test("observedExpectations metrics surface per micro-batch via StreamingQueryProgress") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val sdf = ms.toDF.toDF("id", "text")
    val instrumented = graft.ops.QualityOps.observedExpectationsStream(
      sdf, Seq("nonempty" -> (length(col("text")) > 0)), name = "stream_quality")
    val q = instrumented.writeStream.outputMode("append")
      .format("memory").queryName("q_obs_out").start()
    try {
      ms.addData((1L, "ok"), (2L, ""), (3L, "fine"))
      q.processAllAvailable()
      val m = q.lastProgress.observedMetrics.get("stream_quality")
      assert(m != null, "observed metrics must appear in the progress event")
      assert(m.getAs[Long]("__n") == 3L)
      assert(m.getAs[Long]("__v_nonempty") == 1L) // the empty text
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits unmatched rows only after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(m: Long) = new java.sql.Timestamp(base + m * 60000L)
    val msL = MemoryStream[(Long, java.sql.Timestamp, String)]
    val msR = MemoryStream[(Long, java.sql.Timestamp, String)]
    val left = msL.toDF.toDF("user_id", "ts", "click")
    val right = msR.toDF.toDF("r_user_id", "r_ts", "signup")
    val q = StreamOps.streamStreamLeftOuterJoin(left, right, "user_id", "ts", "r_ts",
      watermark = "10 minutes", horizon = "'30' MINUTE")
      .select($"user_id", $"click", $"signup")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssloj_out").start()
    try {
      msL.addData((1L, ts(5), "c1"), (4L, ts(5), "orphan"))
      msR.addData((1L, ts(0), "s1"))
      q.processAllAvailable()
      val early = spark.table("ssloj_out")
        .as[(Long, String, Option[String])].collect().toSet
      // the orphan's join range isn't closed yet — emitting it now would
      // risk a null-padded row AND a later real match for the same click
      assert(early == Set((1L, "c1", Some("s1"))),
        s"outer row must wait for the watermark, got $early")
      // push the watermark far past the orphan's range end
      msL.addData((9L, ts(1000), "late"))
      msR.addData((9L, ts(1000), "s9"))
      q.processAllAvailable()
      msL.addData((9L, ts(1001), "late2"))
      q.processAllAvailable()
      val all = spark.table("ssloj_out")
        .as[(Long, String, Option[String])].collect().toSet
      assert(all.contains((4L, "orphan", None)),
        s"unmatched left row must emit null-padded after watermark, got $all")
      assert(all.contains((1L, "c1", Some("s1"))))
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join null-pads unmatched rows from both sides") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def ts(m: Long) = new java.sql.Timestamp(base + m * 60000L)
    val msL = MemoryStream[(Long, java.sql.Timestamp, String)]
    val msR = MemoryStream[(Long, java.sql.Timestamp, String)]
    val left = msL.toDF.toDF("user_id", "ts", "click")
    val right = msR.toDF.toDF("r_user_id", "r_ts", "signup")
    val q = StreamOps.streamStreamFullOuterJoin(left, right, "user_id", "ts", "r_ts",
      watermark = "10 minutes", horizon = "'30' MINUTE")
      .select($"user_id", $"r_user_id", $"click", $"signup")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssfoj_out").start()
    try {
      msL.addData((1L, ts(5), "c1"), (4L, ts(5), "l_orphan"))
      msR.addData((1L, ts(0), "s1"), (6L, ts(0), "r_orphan"))
      q.processAllAvailable()
      // push both watermarks far past every open join range
      msL.addData((9L, ts(1000), "late"))
      msR.addData((9L, ts(1000), "s9"))
      q.processAllAvailable()
      msL.addData((9L, ts(1001), "late2"))
      msR.addData((9L, ts(1001), "s9b"))
      q.processAllAvailable()
      val all = spark.table("ssfoj_out")
        .as[(Option[Long], Option[Long], Option[String], Option[String])]
        .collect().toSet
      assert(all.contains((Some(1L), Some(1L), Some("c1"), Some("s1"))),
        s"matched pair missing: $all")
      assert(all.contains((Some(4L), None, Some("l_orphan"), None)),
        s"unmatched LEFT row must null-pad: $all")
      assert(all.contains((None, Some(6L), None, Some("r_orphan"))),
        s"unmatched RIGHT row must null-pad: $all")
    } finally q.stop()
  }

  test("foreachBatch merge sink upserts each micro-batch into parquet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream_merge").toFile.getAbsolutePath
    val ms = MemoryStream[(String, String, Double)]
    val sdf = ms.toDF.toDF("location", "date", "temp")
    val q = sdf.writeStream
      .foreachBatch(StreamOps.mergeBatch(dir, Seq("location", "date"), Seq("location")) _)
      .start()
    try {
      ms.addData(("loc1", "2021-01-01", 10.0), ("loc2", "2021-01-01", 20.0))
      q.processAllAvailable()
      ms.addData(("loc1", "2021-01-01", 99.0), ("loc1", "2021-01-02", 11.0))
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
        .select($"location", $"date", $"temp")
        .as[(String, String, Double)].collect().toSet
      assert(out == Set(
        ("loc1", "2021-01-01", 99.0), // second batch won
        ("loc1", "2021-01-02", 11.0),
        ("loc2", "2021-01-01", 20.0)))
    } finally q.stop()
  }

  test("daily-ingest composition: file stream, per-batch dedup, MERGE; idempotent replay") {
    val srcDir = Files.createTempDirectory("ingest_src").toFile.getAbsolutePath
    val corpusDir = Files.createTempDirectory("ingest_tgt").toFile.getAbsolutePath + "/corpus"
    val ckpt = Files.createTempDirectory("ingest_ckpt").toFile.getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    def drain(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = src.writeStream
        .foreachBatch(
          StreamOps.dedupMergeBatch(corpusDir, "doc_id", "text", Seq("lang"),
            bloomExpectedItems = 100000L) _)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "ingest query did not self-terminate")
    }
    def corpusIds: Set[Long] = spark.read.parquet(corpusDir)
      .select($"doc_id").as[Long].collect().toSet
    // day 1: two uniques + an in-batch text dup under a different id
    Seq((1L, "alpha beta gamma", "en"), (2L, "uno dos tres", "es"),
      (3L, "alpha beta gamma", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(corpusIds == Set(1L, 2L), "in-batch dup must keep the min-id winner")
    // day 2: a cross-day text dup under a fresh id + a genuinely new doc
    Seq((10L, "alpha beta gamma", "en"), (11L, "quatre cinq six", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(corpusIds == Set(1L, 2L, 11L),
      "cross-day dup dropped against the corpus, new doc merged")
    // replay: wipe the checkpoint so the stream re-delivers EVERY file in
    // one batch — the corpus must come out unchanged (foreachBatch sinks
    // must be idempotent under re-delivery)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(ckpt))
    drain()
    assert(corpusIds == Set(1L, 2L, 11L), "replay must be a no-op")
    // corpus content sanity: one row per id, lang partition column intact
    val rows = spark.read.parquet(corpusDir)
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set(
      (1L, "alpha beta gamma", "en"),
      (2L, "uno dos tres", "es"),
      (11L, "quatre cinq six", "fr")))
  }

  test("daily-ingest near-dup tier: cross-day NEAR duplicate dropped; idempotent replay") {
    val srcDir = Files.createTempDirectory("near_src").toFile.getAbsolutePath
    val corpusDir = Files.createTempDirectory("near_tgt").toFile.getAbsolutePath + "/corpus"
    val ckpt = Files.createTempDirectory("near_ckpt").toFile.getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    def drain(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = src.writeStream
        .foreachBatch(
          StreamOps.dedupMergeBatch(corpusDir, "doc_id", "text", Seq("lang"),
            bloomExpectedItems = 100000L, nearDup = true) _)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "ingest query did not self-terminate")
    }
    def corpusIds: Set[Long] = spark.read.parquet(corpusDir)
      .select($"doc_id").as[Long].collect().toSet
    // a long page: 30 tokens → near-dup variants share ~28/29 shingles
    // (J ≈ 0.97, several of the 16 four-hash bands collide — the
    // signature is deterministic, so so is the drop)
    val page = (1 to 30).map(i => s"tok$i").mkString(" ")
    // doc 5 is an IN-BATCH near-dup of doc 1, in the BOOTSTRAP batch —
    // before the in-batch near tier both would merge (no corpus yet to
    // anti-join against) and pollute the corpus permanently
    Seq((1L, page, "en"), (5L, page + " intro", "en"),
      (2L, "uno dos tres cuatro", "es"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(corpusIds == Set(1L, 2L),
      "in-batch near-dup in the bootstrap batch must drop (min-id winner)")
    // day 2: a NEAR duplicate of day 1's page (one appended token — an
    // exact tier would keep it), an exact recrawl, and a novel doc
    Seq((10L, page + " footer", "en"),
      (11L, page, "en"),
      (12L, "sept huit neuf dix", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(corpusIds == Set(1L, 2L, 12L),
      "near-dup and exact recrawl both dropped; novel doc merged")
    // replay every file in one batch: corpus must come out unchanged —
    // day-2 survivors are now near-dups of THEMSELVES in the corpus
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(ckpt))
    drain()
    assert(corpusIds == Set(1L, 2L, 12L), "replay must be a no-op")
  }

  test("streaming corpus-prep ingest: quality filters + full dedup ladder per batch; idempotent") {
    val srcDir = Files.createTempDirectory("prep_src").toFile.getAbsolutePath
    val corpusDir = Files.createTempDirectory("prep_tgt").toFile.getAbsolutePath + "/corpus"
    val ckpt = Files.createTempDirectory("prep_ckpt").toFile.getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    def drain(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = src.writeStream
        .foreachBatch(
          StreamOps.corpusPrepMergeBatch(corpusDir, "doc_id", "text", Seq("lang"),
            bloomExpectedItems = 100000L) _)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // 300 s: the full ladder × replay batch is the suite's heaviest
      // drain, and under full-suite contention (the ExecutorLossSpec
      // fork JVM runs concurrently, each side local[*]) a 120 s budget
      // flaked (observed r17); 300 s still fails a genuine hang fast
      assert(q.awaitTermination(300000), "ingest query did not self-terminate")
    }
    def corpusIds: Set[Long] = spark.read.parquet(corpusDir)
      .select($"doc_id").as[Long].collect().toSet
    // C4+Gopher-clean doc builders: 3 lines, terminal punctuation, ≥5
    // words/line, stopwords present, all-alpha tokens
    def doc(theme: Seq[String]): String = (1 to 3).map(i =>
      s"the ${theme(0)} ${theme(1)} of ${theme(2)} number $i keeps ${theme(3)} along nicely today.")
      .mkString("\n")
    val good1 = doc(Seq("steady", "stream", "tokens", "flowing"))
    val good2 = doc(Seq("columnar", "pages", "parquet", "marching"))
    val good3 = doc(Seq("broadcast", "joins", "dimensions", "humming"))
    // near-dup of good1: one token appended to the last line
    val near1 = good1.dropRight(1) + " indeed."
    val dirty = "short line\nno punctuation here either\nstill none"
    // bootstrap batch: dirty doc dropped by C4, in-batch near-dup
    // dropped by the near tier (min-id winner), two clean docs merge
    Seq((1L, good1, "en"), (5L, near1, "en"), (3L, dirty, "en"),
      (2L, good2, "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(corpusIds == Set(1L, 2L),
      "dirty doc filtered, in-batch near-dup dropped, clean docs merged")
    // corpus carries the REBUILT clean text (C4 line rebuild), not raw
    val stored1 = spark.read.parquet(corpusDir)
      .filter($"doc_id" === 1L).select($"text").as[String].head()
    assert(stored1.split("\n").forall(_.trim.endsWith(".")), stored1)
    // day 2: cross-day near-dup + exact recrawl + dirty + novel
    Seq((10L, near1, "en"), (11L, good1, "en"), (13L, dirty, "fr"),
      (12L, good3, "fr"))
      .toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(srcDir)
    drain()
    assert(corpusIds == Set(1L, 2L, 12L),
      "cross-day near-dup, recrawl and dirty doc all dropped; novel merged")
    // wipe the checkpoint: full re-delivery in one batch must be a no-op
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(ckpt))
    drain()
    assert(corpusIds == Set(1L, 2L, 12L), "replay must be a no-op")
  }

  test("composed ingest state bound: bloom bytes are fixed by expectedItems, never corpus rows") {
    // the composed flow's only cross-batch in-memory artifact is the
    // bloom sketch refit from the corpus each batch — its size must be
    // a function of the CONFIGURED capacity alone (≈10 bits/item), so
    // a corpus 16× larger fits the same bytes; row-proportional state
    // here is exactly the unbounded-state failure the design avoids
    import graft.ops.DedupOps
    val small = (1L to 500L).map(i => (i, s"doc body number $i"))
      .toDF("doc_id", "text")
    val big = (1L to 8000L).map(i => (i, s"doc body number $i"))
      .toDF("doc_id", "text")
    val cap = 50000L
    val a = DedupOps.bloomFitDigests(small, "text", expectedItems = cap)
    val b = DedupOps.bloomFitDigests(big, "text", expectedItems = cap)
    assert(a.length == b.length,
      s"bloom bytes moved with corpus rows: ${a.length} vs ${b.length}")
    // ≈ numBits/8 + header; the 10·n bit sizing contract with slack
    assert(a.length <= cap * 10 / 8 + 4096,
      s"bloom bytes ${a.length} exceed the ~10 bits/item contract")
  }

  test("streaming corpus-prep frozen-LM tier: streamed scoring equals batch scoring") {
    import graft.ops.TextOps
    val srcDir = Files.createTempDirectory("lm_src").toFile.getAbsolutePath
    val corpusDir = Files.createTempDirectory("lm_tgt").toFile.getAbsolutePath + "/corpus"
    val ckpt = Files.createTempDirectory("lm_ckpt").toFile.getAbsolutePath
    def doc(theme: Seq[String]): String = (1 to 3).map(i =>
      s"the ${theme(0)} ${theme(1)} of ${theme(2)} number $i keeps ${theme(3)} along nicely today.")
      .mkString("\n")

    // offline reference corpus → FROZEN model (persist + reload, the
    // artifact round trip a deployed scorer performs)
    val reference = Seq(
      (100L, doc(Seq("steady", "stream", "tokens", "flowing"))),
      (101L, doc(Seq("columnar", "pages", "parquet", "marching"))),
      (102L, doc(Seq("broadcast", "joins", "dimensions", "humming"))))
      .toDF("doc_id", "text")
    val modelDir = Files.createTempDirectory("lm_frozen").toFile.getAbsolutePath
    TextOps.unigramLmFit(reference, "text").write.mode("overwrite").parquet(modelDir)
    val model = spark.read.parquet(modelDir)

    // arriving docs: both clear C4+Gopher; one speaks the reference
    // vocabulary, one is OOV-gibberish that only the LM tier can catch
    val inModel = doc(Seq("steady", "stream", "tokens", "flowing"))
    val gibberish = doc(Seq("zxqvwk", "gplmtr", "qqwwzz", "vbnmkl"))
    val arriving = Seq((1L, inModel, "en"), (2L, gibberish, "en"))
      .toDF("doc_id", "text", "lang")

    // batch-side ground truth with the SAME frozen model; threshold at
    // the midpoint, so streamed membership == batch membership IFF the
    // streamed scores equal these batch scores
    val batchScores = TextOps.unigramScoreWith(arriving, "doc_id", "text", model)
      .select($"doc_id", $"mean_neg_logprob").as[(Long, Double)].collect().toMap
    assert(batchScores(2L) > batchScores(1L),
      s"fixture must separate the docs, got $batchScores")
    val threshold = (batchScores(1L) + batchScores(2L)) / 2.0

    arriving.write.mode("append").parquet(srcDir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = src.writeStream
      .foreachBatch(
        StreamOps.corpusPrepMergeBatch(corpusDir, "doc_id", "text", Seq("lang"),
          lmModel = Some(model), lmMaxMeanNegLogProb = threshold) _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "LM ingest query did not self-terminate")

    val expectedIds = batchScores.collect {
      case (id, s) if s <= threshold => id
    }.toSet
    val got = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(got == expectedIds && got == Set(1L),
      s"streamed LM membership $got must equal batch membership $expectedIds")
  }

  test("streaming corpus-prep frozen-bigram tier: streamed scoring equals batch scoring") {
    import graft.ops.TextOps
    val srcDir = Files.createTempDirectory("bg_src").toFile.getAbsolutePath
    val corpusDir = Files.createTempDirectory("bg_tgt").toFile.getAbsolutePath + "/corpus"
    val ckpt = Files.createTempDirectory("bg_ckpt").toFile.getAbsolutePath
    def doc(theme: Seq[String]): String = (1 to 3).map(i =>
      s"the ${theme(0)} ${theme(1)} of ${theme(2)} number $i keeps ${theme(3)} along nicely today.")
      .mkString("\n")
    val reference = Seq(
      (100L, doc(Seq("steady", "stream", "tokens", "flowing"))),
      (101L, doc(Seq("columnar", "pages", "parquet", "marching"))))
      .toDF("doc_id", "text")
    val modelDir = Files.createTempDirectory("bg_frozen").toFile.getAbsolutePath
    TextOps.bigramLmFit(reference, "text").write.mode("overwrite").parquet(modelDir)
    val model = spark.read.parquet(modelDir)

    // doc 1 reuses reference BIGRAMS (low perplexity); doc 2 reuses the
    // same reference WORDS but scrambled — the word-order signal only a
    // context-aware model separates (a unigram gate scores them equal)
    val fluent = doc(Seq("steady", "stream", "tokens", "flowing"))
    val scrambled = (1 to 3).map(i =>
      s"flowing the of stream number keeps steady tokens $i nicely along today.")
      .mkString("\n")
    val arriving = Seq((1L, fluent, "en"), (2L, scrambled, "en"))
      .toDF("doc_id", "text", "lang")
    val batchScores = TextOps.bigramScoreWith(arriving, "doc_id", "text", model)
      .select($"doc_id", $"mean_neg_logprob").as[(Long, Double)].collect().toMap
    assert(batchScores(2L) > batchScores(1L),
      s"bigram model must separate scrambled word order, got $batchScores")
    val threshold = (batchScores(1L) + batchScores(2L)) / 2.0

    arriving.write.mode("append").parquet(srcDir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = src.writeStream
      .foreachBatch(
        StreamOps.corpusPrepMergeBatch(corpusDir, "doc_id", "text", Seq("lang"),
          bigramModel = Some(model),
          bigramMaxMeanNegLogProb = threshold) _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "bigram ingest query did not self-terminate")
    val got = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L),
      s"streamed bigram membership $got must equal batch membership Set(1)")
  }

  test("streaming corpus-prep frozen-NB tier: streamed verdicts equal batch verdicts") {
    import graft.ops.ClassifyOps
    val srcDir = Files.createTempDirectory("nb_src").toFile.getAbsolutePath
    val corpusDir = Files.createTempDirectory("nb_tgt").toFile.getAbsolutePath + "/corpus"
    val ckpt = Files.createTempDirectory("nb_ckpt").toFile.getAbsolutePath
    def doc(theme: Seq[String]): String = (1 to 3).map(i =>
      s"the ${theme(0)} ${theme(1)} of ${theme(2)} number $i keeps ${theme(3)} along nicely today.")
      .mkString("\n")

    // offline labeled reference → FROZEN classifier (persist + reload,
    // the artifact round trip a deployed classifier performs)
    val reference = Seq(
      (100L, doc(Seq("steady", "stream", "tokens", "flowing")), "keep"),
      (101L, doc(Seq("columnar", "pages", "parquet", "marching")), "keep"),
      (102L, doc(Seq("spammy", "casino", "pills", "clicking")), "drop"),
      (103L, doc(Seq("casino", "winnings", "pills", "spinning")), "drop"))
      .toDF("doc_id", "text", "label")
    val modelDir = Files.createTempDirectory("nb_frozen").toFile.getAbsolutePath
    ClassifyOps.nbFit(reference, "text", "label")
      .write.mode("overwrite").parquet(modelDir)
    val model = spark.read.parquet(modelDir)

    // arriving docs: both clear C4+Gopher; vocabulary decides the class
    val keepDoc = doc(Seq("steady", "stream", "tokens", "flowing"))
    val dropDoc = doc(Seq("spammy", "casino", "pills", "clicking"))
    val arriving = Seq((1L, keepDoc, "en"), (2L, dropDoc, "en"))
      .toDF("doc_id", "text", "lang")

    // batch-side ground truth with the SAME frozen model
    val batchPred = ClassifyOps.nbClassifyWith(arriving, "doc_id", "text", model)
      .select($"doc_id", $"pred_label").as[(Long, String)].collect().toMap
    assert(batchPred == Map(1L -> "keep", 2L -> "drop"),
      s"fixture must separate the docs, got $batchPred")

    arriving.write.mode("append").parquet(srcDir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = src.writeStream
      .foreachBatch(
        StreamOps.corpusPrepMergeBatch(corpusDir, "doc_id", "text", Seq("lang"),
          nbModel = Some(model), nbKeepLabel = "keep") _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "NB ingest query did not self-terminate")

    val got = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L),
      s"streamed NB membership $got must equal the batch keep set Set(1)")
  }

  test("streaming corpus-prep frozen-DSIR tier: streamed weights gate like batch") {
    import graft.ops.DsirOps
    val srcDir = Files.createTempDirectory("dsir_src").toFile.getAbsolutePath
    val corpusDir = Files.createTempDirectory("dsir_tgt").toFile.getAbsolutePath + "/corpus"
    val ckpt = Files.createTempDirectory("dsir_ckpt").toFile.getAbsolutePath
    def doc(theme: Seq[String]): String = (1 to 3).map(i =>
      s"the ${theme(0)} ${theme(1)} of ${theme(2)} number $i keeps ${theme(3)} along nicely today.")
      .mkString("\n")

    // offline target/raw references → FROZEN importance model
    // (persist + reload — the artifact round trip)
    val target = Seq(
      (100L, doc(Seq("steady", "stream", "tokens", "flowing"))),
      (101L, doc(Seq("steady", "tokens", "stream", "gliding"))))
      .toDF("doc_id", "text")
    val raw = Seq(
      (200L, doc(Seq("spammy", "casino", "pills", "clicking"))),
      (201L, doc(Seq("casino", "winnings", "pills", "spinning"))))
      .toDF("doc_id", "text")
    val modelDir = Files.createTempDirectory("dsir_frozen").toFile.getAbsolutePath
    DsirOps.dsirFit(target, raw, "text", buckets = 32, seed = 7L)
      .write.mode("overwrite").parquet(modelDir)
    val model = spark.read.parquet(modelDir)

    val targetLike = doc(Seq("steady", "stream", "tokens", "flowing"))
    val rawLike = doc(Seq("spammy", "casino", "pills", "clicking"))
    val arriving = Seq((1L, targetLike, "en"), (2L, rawLike, "en"))
      .toDF("doc_id", "text", "lang")

    // batch-side ground truth with the SAME frozen model
    val batchW = DsirOps.dsirScoreWith(arriving, "doc_id", "text", model,
        buckets = 32, seed = 7L)
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    assert(batchW(1L) > batchW(2L),
      s"importance model must separate the docs, got $batchW")
    val threshold = (batchW(1L) + batchW(2L)) / 2.0

    arriving.write.mode("append").parquet(srcDir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    val src = spark.readStream.schema(schema).parquet(srcDir)
    val q = src.writeStream
      .foreachBatch(
        StreamOps.corpusPrepMergeBatch(corpusDir, "doc_id", "text", Seq("lang"),
          dsirModel = Some(model), dsirMinLogW = threshold,
          dsirBuckets = 32, dsirSeed = 7L) _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "DSIR ingest query did not self-terminate")

    val got = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L),
      s"streamed DSIR membership $got must equal the batch keep set Set(1)")
  }

  test("foreachBatch maintains a mergeable theta sketch across micro-batches") {
    // the streaming cardinality monitor: each micro-batch aggregates its
    // own sketch and UNIONs it into a stored one — state is a few KB of
    // sketch bytes regardless of stream length, and the stored column
    // stays mergeable with any other shard's sketch (agg_theta_setops'
    // storage shape, maintained incrementally)
    graft.expressions.GraftFunctions.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream_sketch").toFile
      .getAbsolutePath + "/sk"
    val ms = MemoryStream[Long]
    val q = ms.toDF.toDF("v").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = batch.sparkSession
        graft.expressions.GraftFunctions.register(s)
        val cur = batch.agg(
          call_function("theta_sketch_agg", col("v"), lit(12)).as("sk"))
        val merged =
          (try Some(s.read.parquet(dir)) catch { case _: Throwable => None })
            .map(_.unionByName(cur).agg(
              call_function("theta_union_agg", col("sk"), lit(12)).as("sk")))
            .getOrElse(cur)
        // materialize the single sketch row BEFORE overwriting the dir
        // the plan is still reading from (driver-safe: one row of bytes)
        val row = merged.collect()
        s.createDataFrame(java.util.Arrays.asList(row: _*), merged.schema)
          .write.mode("overwrite").parquet(dir)
    }.start()
    try {
      ms.addData(1L to 500L: _*)
      q.processAllAvailable()
      ms.addData(301L to 900L: _*) // overlaps batch 1: union, not sum
      q.processAllAvailable()
    } finally q.stop()
    val est = spark.read.parquet(dir)
      .select(call_function("theta_estimate", $"sk")).as[Double].head()
    assert(est == 900.0, s"sketch under nominal entries must be exact: $est")
  }
}

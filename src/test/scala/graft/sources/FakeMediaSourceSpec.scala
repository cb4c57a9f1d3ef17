package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FakeMediaSourceSpec extends SparkSpec {
  import spark.implicits._

  private def src(count: Long, parts: Int = 8) = spark.read
    .format("fakemedia")
    .option("count", count)
    .option("numPartitions", parts)
    .load()

  test("short-name registration + full read returns count deterministic rows") {
    val df = src(1000)
    assert(df.count() == 1000)
    val row = df.filter($"media_id" === 7L).head()
    assert(row.getAs[String]("kind") == "audio") // 7 % 3 = 1
    assert(row.getAs[Int]("width") == 7 * 16 + 16)
    assert(row.getAs[Int]("n_frames") == 8)
    // deterministic payloads: same seed → same bytes on every read
    val b1 = df.filter($"media_id" === 7L).select($"bytes").head().getAs[Array[Byte]](0)
    val b2 = src(1000).filter($"media_id" === 7L).select($"bytes").head().getAs[Array[Byte]](0)
    assert(b1.toSeq == b2.toSeq && b1.length == (16 + 7 % 48))
  }

  test("column pruning reaches the source: unselected payloads are never built") {
    FakeMediaSource.payloadsBuilt.set(0)
    val meta = src(2000).select($"media_id", $"width")
    assert(meta.agg(sum($"width")).head().getLong(0) > 0)
    assert(FakeMediaSource.payloadsBuilt.get() == 0,
      "metadata-only query must not materialize payload bytes")
    val plan = meta.queryExecution.executedPlan.toString
    assert(plan.contains("media_id") && !plan.contains("bytes"), plan)
  }

  test("filter pushdown narrows the generated range before partition planning") {
    FakeMediaSource.rowsGenerated.set(0)
    // 10M nominal rows, but the pushed range covers only [100, 105)
    val df = src(10000000L).filter($"media_id" >= 100L && $"media_id" < 105L)
    assert(df.select($"media_id").as[Long].collect().sorted.toSeq ==
      Seq(100L, 101L, 102L, 103L, 104L))
    assert(FakeMediaSource.rowsGenerated.get() == 5,
      s"pushdown must generate exactly the 5 matching rows, " +
        s"saw ${FakeMediaSource.rowsGenerated.get()}")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("fakemedia"), scan)
  }

  test("unsupported predicates stay post-scan and results remain correct") {
    val df = src(300).filter($"kind" === "video" && $"media_id" < 30L)
    // kind is not pushable; media_id < 30 is → 10 video rows out of 30
    assert(df.count() == 10)
  }

  test("partition planning splits the pushed range, skipping empty chunks") {
    val scan = new FakeMediaScanBuilder(count = 100L, numPartitions = 8, seed = 42L)
    scan.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("media_id", 90L)))
    val parts = scan.build().asInstanceOf[FakeMediaScan].planInputPartitions()
    val ranges = parts.map(_.asInstanceOf[FakeMediaRange])
    assert(ranges.map(r => r.end - r.start).sum == 10)
    assert(ranges.forall(r => r.start >= 90L && r.end <= 100L))
    assert(ranges.forall(r => r.end > r.start), "no empty partitions scheduled")
  }

  test("limit pushdown: limit(n) generates at most n rows") {
    FakeMediaSource.rowsGenerated.set(0)
    FakeMediaSource.payloadsBuilt.set(0)
    // 10M nominal rows; a pushed LIMIT 7 must clamp the generated range
    val got = src(10000000L).select($"media_id").limit(7).collect()
    assert(got.length == 7)
    assert(FakeMediaSource.rowsGenerated.get() <= 7,
      s"pushed limit must bound generation, saw ${FakeMediaSource.rowsGenerated.get()}")
    // composes with a pushed filter (filter narrows first, then limit clamps)
    FakeMediaSource.rowsGenerated.set(0)
    val filtered = src(10000000L).filter($"media_id" >= 1000L)
      .select($"media_id").limit(3).collect()
    assert(filtered.length == 3)
    assert(FakeMediaSource.rowsGenerated.get() <= 3)
    assert(FakeMediaSource.payloadsBuilt.get() == 0)
  }

  test("COUNT(*) pushdown answers from range arithmetic without generating rows") {
    FakeMediaSource.rowsGenerated.set(0)
    FakeMediaSource.payloadsBuilt.set(0)
    assert(src(123456789L).count() == 123456789L)
    // count composes with a pushed range filter
    assert(src(123456789L).filter($"media_id" >= 100L && $"media_id" < 600L).count() == 500L)
    // count over an empty pushed range is 0, not an empty result set
    assert(src(1000L).filter($"media_id" >= 5000L).count() == 0L)
    assert(FakeMediaSource.rowsGenerated.get() == 0,
      s"pushed COUNT(*) must not iterate ids, saw ${FakeMediaSource.rowsGenerated.get()}")
    assert(FakeMediaSource.payloadsBuilt.get() == 0)
    // a non-pushable aggregate still works (falls back to a real scan)
    assert(src(300L).groupBy($"kind").count().count() == 3)
  }

  test("the source feeds the multimodal ops (header-free decode path)") {
    val media = src(50).withColumnRenamed("media_id", "doc_id")
    val decoded = graft.ops.MultimodalOps.decodeStub(media, "doc_id")
    val rows = decoded.select($"doc_id", $"decoded_bytes").as[(Long, Int)].collect()
    assert(rows.length == 50)
    assert(rows.forall { case (id, n) => n == (16 + id % 48).toInt })
  }
}

package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FreqSpec extends SparkSpec {
  import spark.implicits._

  test("freq_sketch_agg below map capacity is exact; topk ordered by estimate") {
    GraftFunctions.register(spark)
    // 50 copies of 1, 30 of 2, 20 of 3, 1 each of 100..149
    val vals = Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(20)(3L) ++
      (100L to 149L)
    val out = vals.toDF("v").repartition(8)
      .agg(call_function("freq_topk",
        call_function("freq_sketch_agg", $"v", lit(1024)), lit(3)).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.estimate", $"h.lb", $"h.ub")
      .as[(Long, Long, Long, Long)].collect()
    // 150 values < 1024 counters: no purging, everything exact
    assert(out.take(3).map(r => (r._1, r._2)).toSeq ==
      Seq((1L, 50L), (2L, 30L), (3L, 20L)), out.mkString(","))
    assert(out.forall(r => r._3 == r._2 && r._4 == r._2),
      "exact mode must have lb == est == ub")
  }

  test("freq_merge_agg: shard merge brackets true counts under purging") {
    GraftFunctions.register(spark)
    // heavy skew + wide tail with a SMALL map: purging engages, exact
    // equality is gone but the [lb, ub] interval must still hold
    val hot = (1 to 5).flatMap(i => Seq.fill(2000)(i.toLong))
    val tail = (1000L to 4999L)
    val df = (hot ++ tail).toDF("v")
      .withColumn("shard", pmod(crc32($"v".cast("string")), lit(4)))
    val merged = df.groupBy($"shard")
      .agg(call_function("freq_sketch_agg", $"v", lit(64)).as("sk"))
      .agg(call_function("freq_topk",
        call_function("freq_merge_agg", $"sk", lit(64)), lit(5)).as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.lb", $"h.ub")
      .as[(Long, Long, Long)].collect()
    // all five true heavy hitters (2000 each vs tail of 1s) survive
    assert(merged.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L),
      merged.mkString(","))
    merged.foreach { case (item, lb, ub) =>
      assert(lb <= 2000L && 2000L <= ub, s"item $item: [$lb, $ub] misses 2000")
    }
  }
}

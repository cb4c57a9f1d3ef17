package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** HNSW shard-scaling probe (bench tooling, like [[KeyBench]]): time
  * [[graft.ops.SimilarityOps.hnswTopK]] over one corpus at several
  * `nShards` settings — the lever the operator's 100 TB contract
  * rests on (per-shard build is O((n/P)·log(n/P)) in ONE task, so P
  * must grow with the corpus; the fixture key pins P=4, which is the
  * right size for sf0.1 but deliberately undersized at 100×).
  *
  * Usage: `runMain graft.HnswProbe [nShards...]` (default 4 8 16 32).
  * Env: SPARK_GRAFT_SF_DIR (the corpus), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_REPS (default 2, reported min). Prints one
  * `HNSWPROBE {...}` JSON line per setting.
  */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val autoMode = args.headOption.contains("--auto")
    val shards =
      if (autoMode) Seq.empty
      else if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(4, 8, 16, 32)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir, "embeddings")
    emb.count()
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        graft.ops.SimilarityOps.quantize(col("embedding")).as("qvec"))
    val c = emb.select(col("vec_id").as("cid"),
      graft.ops.SimilarityOps.quantize(col("embedding")).as("cvec"))
    // Auto-P mode (r16, verdict ask #2): `--auto <targetShardRows>` runs
    // hnswTopKAuto and ASSERTS the per-shard row bound the operator's
    // P ∝ N contract promises — run across the 1×/10×/30× legs this
    // prints the flat-α evidence that fixed-P (measured α(100×) = 1.20,
    // BASELINE §39) cannot give.
    if (autoMode) {
      val target = args.lift(1).map(_.toInt).getOrElse(4096)
      val n = c.count()
      val p = graft.ops.SimilarityOps.autoShards(n, target)
      val maxPerShard = c
        .groupBy(pmod(col("cid"), lit(p.toLong)).as("_s"))
        .agg(count(lit(1)).as("_r")).agg(max(col("_r")))
        .collect()(0).getLong(0) // partition-tuple metadata: P rows
      // hnswTopKAuto's contract is per-shard rows == target only for
      // contiguous ids (the fixture's case); for arbitrary ids n/P is
      // in expectation — so REPORT skew always and fail only above a
      // tolerance factor instead of aborting a within-contract run
      // (r16 ADVICE).
      println(s"HNSWPROBE skew: maxPerShard=$maxPerShard target=$target " +
        f"ratio=${maxPerShard.toDouble / target}%.3f (n=$n, P=$p)")
      require(maxPerShard <= 2L * target,
        s"auto-P shard skew beyond tolerance: max per-shard $maxPerShard " +
          s"> 2x target $target (n=$n, P=$p)")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.SimilarityOps.hnswTopKAuto(q, c, k = 10,
          targetShardRows = target, m = 8, efConstruction = 64,
          efSearch = 48).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""HNSWPROBE {"mode":"auto","target":$target,"n":$n,"nShards":$p,"maxPerShard":$maxPerShard,"min":${times.min}%.3f,"all":[${times.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir"}""")
      spark.stop(); return
    }
    shards.foreach { p =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.SimilarityOps.hnswTopK(q, c, k = 10, nShards = p,
          m = 8, efConstruction = 64, efSearch = 48).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""HNSWPROBE {"nShards":$p,"min":${times.min}%.3f,"all":[${times.map(t => f"$t%.3f").mkString(",")}],"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType}

/** Synthesize 3× and 10× scale-ups of the bench corpus tables
  * (documents / embeddings / events) so the scaling CURVE of the
  * LSH/CC/graph/window keys can be measured instead of argued — the
  * round-10 audit finding: every published number was a single-SF
  * point, which cannot falsify a superlinear candidate-pair blowup.
  *
  * The generator reproduces the driver fixtures' statistical shape
  * (measured from /root/testdata/sf0.1, seed-deterministic xxhash64
  * draws, pure column programs — no driver-side loops):
  *  - documents: bag-of-words over the SAME 31-token vocabulary,
  *    15-90 tokens/doc, ~0.16% planted exact dups (the sf0.1 corpus has
  *    8/5000 duplicate texts), lang ≈ 40% en + 15% each of 4 others,
  *    20 sources. Fresh text per doc — NOT replicated copies, which
  *    would plant K× duplicate cliques and change the dedup problem
  *    from linear to quadratic by construction.
  *  - embeddings: dim-64 float vectors, entries uniform in [-0.4, 0.4]
  *    (the fixture's observed envelope), labels 0-9.
  *  - events: the same 30-day window with K× the users and K× the
  *    events — per-user event counts (and so session/funnel shapes)
  *    stay constant while volume scales.
  *
  * Usage: `runMain graft.ScaleGen [outBase] [k...]` (default
  * /root/repo/scaledata, k = 3 10). Writes `scale<k>x/` per k —
  * round 12 adds 30 and 100 for the keys whose fitted exponent was
  * still RISING between the 3× and 10× legs (dedup_minhash,
  * text_pack_sequences_ids, search_bm25_batch): two more decades
  * showing whether alpha flattens is the difference between a
  * measured 100 TB claim and an extrapolated one.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outBase = args.headOption.getOrElse("/root/repo/scaledata")
    val ks = if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vocab = Tables(spark, base, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .orderBy(col("w")).collect().map(_.getString(0)).toSeq // driver-side model fit: the distinct fixture vocabulary (31 rows)
    require(vocab.nonEmpty, s"no vocabulary in $base/documents.parquet")
    ks.foreach { k =>
      val dir = s"$outBase/scale${k}x"
      gen(spark, dir, k, vocab)
      println(s"SCALEGEN wrote $dir (${k}x)")
    }
    spark.stop()
  }

  private def h(c: org.apache.spark.sql.Column, seed: Int, m: Long) =
    pmod(xxhash64(c, lit(seed)), lit(m))

  def gen(spark: SparkSession, dir: String, k: Int, vocab: Seq[String]): Unit = {
    val vlit = typedlit(vocab)
    val nVocab = vocab.size.toLong

    val nDocs = 5000L * k
    val docs = spark.range(nDocs)
      // every 625th doc copies its predecessor's text: the planted
      // exact-dup rate of the driver fixture (8 per 5000)
      .withColumn("_sid",
        when(col("id") % 625 === 624, col("id") - 1).otherwise(col("id")))
      .withColumn("_len", lit(15) + h(col("_sid"), 1, 76))
      .select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), col("_len")),
          j => element_at(vlit,
            (pmod(xxhash64(col("_sid"), j), lit(nVocab)) + 1)
              .cast(IntegerType))), " ").as("text"),
        element_at(typedlit(Seq("en", "en", "en", "en",
          "zh", "es", "fr", "de", "zh", "es")),
          (h(col("id"), 2, 10) + 1).cast(IntegerType)).as("lang"),
        concat(lit("src"), col("id") % 20).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val nVec = 2000L * k
    val emb = spark.range(nVec).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => ((pmod(xxhash64(col("id"), j, lit(11)), lit(2001)) - 1000)
          .cast("double") / 2500.0).cast(FloatType)).as("embedding"),
      h(col("id"), 12, 10).cast(IntegerType).as("label"))
    emb.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val nEv = 100000L * k
    val spanMicros = 2592000000000L // 30 days
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in epoch µs
    // exact driver-side Long division: an in-plan id*span/N goes through
    // a DOUBLE at ~2.6e18 and loses µs precision past 2^53
    val gapMicros = spanMicros / nEv
    val ev = spark.range(nEv).select(
      col("id").as("event_id"),
      timestamp_micros(lit(t0) + col("id") * lit(gapMicros) +
        h(col("id"), 3, 1000000L)).as("ts"),
      h(col("id"), 4, 1500L * k).as("user_id"),
      element_at(typedlit(Seq("view", "click", "signup", "purchase", "error")),
        (h(col("id"), 5, 5) + 1).cast(IntegerType)).as("event_type"),
      (h(col("id"), 6, 56021).cast("double") / 100.0).as("value"),
      concat(lit("{\"k\": "), h(col("id"), 7, 100), lit("}")).as("props"))
    ev.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DsirOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenHashCol matches the JVM portable hash") {
    val toks = Seq("spark", "a", "row fast", "Merge7", "x y z")
    val got = toks.toDF("t")
      .select(col("t"), DsirOps.tokenHashCol(col("t"), 7L).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(got(t) === EmbedOps.tokenHash(t, 7L), s"token $t")
    }
  }

  test("featureBuckets emits hashed unigrams then bigrams") {
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, "  "), (4L, null))
      .toDF("id", "text")
    val out = df.select(col("id"),
        DsirOps.featureBuckets(col("text"), 64, 7L).as("fb"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Int](1)).map(_.toList)).toMap
    def b(f: String): Int = (EmbedOps.tokenHash(f, 7L) % 64).toInt
    assert(out(1L) === Some(List("a", "b", "c", "a b", "b c").map(b)))
    assert(out(2L) === Some(List(b("solo"))))
    assert(out(3L) === Some(Nil))       // whitespace-only: no features
    assert(out(4L) === None)            // NULL text propagates NULL
  }

  test("dsirFit freezes hand-computed quantized log ratios") {
    // target: "a a b"; raw: "a c". B = 4, s = 0.5.
    // feats(target) = a,a,b,"a a","a b"  -> 5 occurrences
    // feats(raw)    = a,c,"a c"          -> 3 occurrences
    val target = Seq((1L, "a a b")).toDF("id", "text")
    val raw = Seq((2L, "a c")).toDF("id", "text")
    val model = DsirOps.dsirFit(target, raw, "text",
      buckets = 4, smoothing = 0.5, seed = 7L)
    val rows = model.collect().map(r =>
      r.getInt(0) -> r.getDecimal(1)).toMap
    assert(rows.size === 4)
    def bucket(f: String): Int = (EmbedOps.tokenHash(f, 7L) % 4).toInt
    val ctM = List("a", "a", "b", "a a", "a b").groupBy(bucket).map { case (k, v) => k -> v.size }
    val crM = List("a", "c", "a c").groupBy(bucket).map { case (k, v) => k -> v.size }
    (0 until 4).foreach { bkt =>
      val expected = BigDecimal(
        math.log((ctM.getOrElse(bkt, 0) + 0.5) / (5 + 0.5 * 4)) -
        math.log((crM.getOrElse(bkt, 0) + 0.5) / (3 + 0.5 * 4)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(rows(bkt)) === expected, s"bucket $bkt")
    }
  }

  test("dsirScoreWith sums exact decimal products; featureless docs drop") {
    val target = Seq((1L, "a a b")).toDF("id", "text")
    val raw = Seq((2L, "a c"), (3L, "a a b"), (4L, "")).toDF("id", "text")
    val model = DsirOps.dsirFit(target, raw, "text",
      buckets = 4, smoothing = 0.5, seed = 7L)
    val lr = model.collect().map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1))).toMap
    def bucket(f: String): Int = (EmbedOps.tokenHash(f, 7L) % 4).toInt
    val scored = DsirOps.dsirScoreWith(raw, "id", "text", model,
      buckets = 4, seed = 7L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!scored.contains(4L), "empty doc must carry no score")
    def expected(feats: List[String]): Double =
      feats.groupBy(bucket).map { case (b, v) => lr(b) * v.size }.sum.toDouble
    assert(scored(2L) === ((3L, expected(List("a", "c", "a c")))))
    assert(scored(3L) === ((5L, expected(List("a", "a", "b", "a a", "a b")))))
    // the target-like doc must outweigh the raw-like one
    assert(scored(3L)._2 > scored(2L)._2)
  }

  test("dsirSelect is a deterministic (log_w DESC, id ASC) top-k") {
    val scored = Seq((10L, 3L, 1.5), (11L, 3L, 2.5), (12L, 3L, 2.5), (13L, 3L, 0.5))
      .toDF("id", "n_feats", "log_w")
    val got = DsirOps.dsirSelect(scored, "id", 3)
      .select(col("id")).as[Long].collect().toList
    assert(got === List(11L, 12L, 10L))
  }

  test("scores are invariant under repartitioning") {
    val docs = (0L until 60L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
      .toDF("id", "text")
    val target = docs.filter(col("id") % 4 === 0)
    val raw = docs.filter(col("id") % 4 =!= 0)
    val model = DsirOps.dsirFit(target, raw, "text", buckets = 16,
      smoothing = 0.5, seed = 7L)
    val a = DsirOps.dsirScoreWith(raw, "id", "text", model, buckets = 16)
      .orderBy(col("id")).collect().toSeq
    val b = DsirOps.dsirScoreWith(raw.repartition(13), "id", "text",
        model, buckets = 16)
      .orderBy(col("id")).collect().toSeq
    assert(a === b)
  }

  test("docBucketCounts carryCols: one mixed-corpus pass ≡ per-slice passes") {
    // the r17 single-hash-pass shape: counts with a doc-constant
    // passenger column sliced by that column must equal the counts of
    // each slice hashed separately
    val docs = (0L until 40L).map(i =>
      (i, s"w${i % 9} w${i % 4} w${i % 9} x$i", if (i % 4 == 0) "t" else "r"))
      .toDF("id", "text", "src")
    val fused = DsirOps.docBucketCounts(docs, "id", "text",
      buckets = 16, seed = 7L, carryCols = Seq("src"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("bucket")) ->
        r.getAs[Long]("_cnt")).toMap
    for (s <- Seq("t", "r")) {
      val slice = DsirOps.docBucketCounts(
        docs.filter(col("src") === s), "id", "text", buckets = 16, seed = 7L)
      assert(asMap(fused.filter(col("src") === s).drop("src")) == asMap(slice), s)
    }
  }
}

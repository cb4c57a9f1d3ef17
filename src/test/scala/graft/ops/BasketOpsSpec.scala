package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketOpsSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets over items 1..4: pair (1,2) in three baskets, (1,3) in
  // one, (2,3) in one, 4 alone — hand-checkable counts
  private def fixture = Seq(
    (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
    (12L, 3L), (13L, 4L), (13L, 2L), (13L, 3L))
    .toDF("basket", "item")

  test("associationRules: hand-computed support, confidence and lift") {
    val got = BasketOps.associationRules(fixture, "basket", "item",
      minPairCount = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toMap
    // baskets: 10={1,2} 11={1,2} 12={1,2,3} 13={2,3,4}; N=4
    // n(1)=3 n(2)=4 n(3)=2 n(4)=1
    assert(got((1L, 2L)) === ((3L, 3L, 4L, 3.0 / 4.0, 1.0, 3.0 / 4.0,
      (3.0 * 4.0) / (3.0 * 4.0))))
    assert(got((1L, 3L)) === ((1L, 3L, 2L, 1.0 / 4.0, 1.0 / 3.0, 1.0 / 2.0,
      (1.0 * 4.0) / (3.0 * 2.0))))
    assert(got((2L, 3L))._1 === 2L)
    assert(got((2L, 4L))._1 === 1L)
    assert(got((3L, 4L))._1 === 1L)
    assert(!got.contains((4L, 4L)) && !got.contains((2L, 1L)),
      "pairs must be strictly a < b")
  }

  test("associationRules: minPairCount filters, topK caps, order is total") {
    val top = BasketOps.associationRules(fixture, "basket", "item",
      minPairCount = 2L, topK = 1)
      .select($"item_a", $"item_b", $"pair_n")
      .as[(Long, Long, Long)].collect().toList
    assert(top === List((1L, 2L, 3L)))
  }

  test("associationRules: duplicate lines within a basket count once") {
    val dup = fixture.unionAll(Seq((10L, 1L), (10L, 2L)).toDF("basket", "item"))
    val a = BasketOps.associationRules(fixture, "basket", "item", 1L).collect()
    val b = BasketOps.associationRules(dup, "basket", "item", 1L).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("associationRules: maxBasketSize drops mega-baskets entirely") {
    val mega = fixture.unionAll(
      (1L to 50L).map(i => (99L, i)).toDF("basket", "item"))
    val got = BasketOps.associationRules(mega, "basket", "item",
      minPairCount = 1L, maxBasketSize = 10)
      .select($"item_a", $"item_b").as[(Long, Long)].collect().toSet
    val base = BasketOps.associationRules(fixture, "basket", "item",
      minPairCount = 1L)
      .select($"item_a", $"item_b").as[(Long, Long)].collect().toSet
    assert(got == base, "the 50-item basket must contribute no pairs")
    // and the support denominator excludes the dropped basket
    val n = BasketOps.associationRules(mega, "basket", "item",
      minPairCount = 1L, maxBasketSize = 10)
      .filter($"item_a" === 1L && $"item_b" === 2L)
      .select($"support").as[Double].head()
    assert(n == 3.0 / 4.0, s"support must use the kept-basket count, got $n")
  }

  test("associationRules validates parameters") {
    intercept[IllegalArgumentException] {
      BasketOps.associationRules(fixture, "basket", "item", 0L)
    }
    intercept[IllegalArgumentException] {
      BasketOps.associationRules(fixture, "basket", "item", 1L, maxBasketSize = 1)
    }
  }

  // --- itemSimilarity --------------------------------------------------

  test("itemSimilarity: hand-computed cosines, both orientations, rank order") {
    // b1{A,B}, b2{A,B}, b3{A,C}: c_A=3, c_B=2, c_C=1; (A,B)=2, (A,C)=1
    val df = Seq(("b1", "A"), ("b1", "B"), ("b2", "A"), ("b2", "B"),
      ("b3", "A"), ("b3", "C"), ("b3", "C")) // dup collapses
      .toDF("basket", "item")
    val out = BasketOps.itemSimilarity(df, "basket", "item",
      minPairCount = 1L, k = 5)
      .as[(String, Int, String, Long, Long, Long, Double)].collect().toSeq
    val cosAB = 2.0 / math.sqrt(6.0)
    val cosAC = 1.0 / math.sqrt(3.0)
    assert(out == Seq(
      ("A", 1, "B", 2L, 3L, 2L, cosAB),
      ("A", 2, "C", 1L, 3L, 1L, cosAC),
      ("B", 1, "A", 2L, 2L, 3L, cosAB),
      ("C", 1, "A", 1L, 1L, 3L, cosAC)))
  }

  test("itemSimilarity: k caps neighbors; minPairCount prunes; validation") {
    val df = Seq(("b1", "A"), ("b1", "B"), ("b1", "C"), ("b2", "A"),
      ("b2", "B")).toDF("basket", "item")
    // pairs: (A,B)=2, (A,C)=1, (B,C)=1; minPairCount=2 keeps only (A,B)
    val pruned = BasketOps.itemSimilarity(df, "basket", "item",
      minPairCount = 2L, k = 5)
      .select($"item", $"neighbor").as[(String, String)].collect().toSet
    assert(pruned == Set("A" -> "B", "B" -> "A"))
    val capped = BasketOps.itemSimilarity(df, "basket", "item",
      minPairCount = 1L, k = 1)
      .as[(String, Int, String, Long, Long, Long, Double)].collect().toSeq
    assert(capped.map(_._1) == Seq("A", "B", "C"))
    assert(capped.forall(_._2 == 1))
    // A's best neighbor is B (cos 2/sqrt(4) = 1.0 > 1/sqrt(2))
    assert(capped.head._3 == "B")
    intercept[IllegalArgumentException] {
      BasketOps.itemSimilarity(df, "basket", "item", k = 0)
    }
  }
}

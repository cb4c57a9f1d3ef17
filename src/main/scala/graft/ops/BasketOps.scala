package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Market-basket association mining: pairwise support / confidence /
  * lift over (basket, item) co-occurrence — the classic affinity
  * analysis (Agrawal et al. 1993's frequent-pair tier) and, in a
  * training-data pipeline, the co-occurrence backbone for "docs that
  * cite A also cite B" / tag-affinity diagnostics.
  *
  * Scale shape: items DISTINCT within basket (one aggregation), then a
  * SELF-JOIN ON THE BASKET KEY — co-partitioned, so each basket's
  * pairs materialize locally and the pair count is Σ k_b·(k_b−1)/2,
  * bounded by the per-basket item count, never |items|² (the all-pairs
  * trap). One more aggregation to pair grain, a broadcast join against
  * the item-grain counts, and a bounded-heap top-k out. Basket sizes
  * are data: a pathological mega-basket inflates k² — gate upstream
  * with `maxBasketSize` (baskets above it drop, counted nowhere), the
  * same guardrail FP-growth implementations apply.
  *
  * Determinism: all counts are exact longs; support / confidence /
  * lift are each presented as ONE fixed IEEE chain over those longs
  * (lift's numerator/denominator as exact 128-bit decimal products,
  * then a single double division) — bit-identical cross-engine.
  */
object BasketOps {

  /** Pairwise rules at the (a, b) item-pair grain, a < b. Output:
    * (`item_a`, `item_b`, `pair_n`, `n_a`, `n_b`, `support`,
    * `conf_a_b`, `conf_b_a`, `lift`), the top `topK` pairs by
    * (pair_n DESC, item_a, item_b), pairs below `minPairCount`
    * dropped. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2L, maxBasketSize: Int = 1000,
      topK: Int = 100): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val sized = items
      .withColumn("_k", count(lit(1)).over(Window.partitionBy(col("_b"))))
      .filter(col("_k") <= maxBasketSize)
    val baskets = sized.agg(count_distinct(col("_b")).as("_n"))
    val itemN = sized.groupBy(col("_i")).agg(count(lit(1)).as("_in"))
    val pairs = sized.as("l")
      .join(sized.as("r"), col("l._b") === col("r._b") &&
        col("l._i") < col("r._i"))
      .groupBy(col("l._i").as("item_a"), col("r._i").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    val top = pairs
      .join(broadcast(itemN.withColumnRenamed("_i", "item_a")
        .withColumnRenamed("_in", "n_a")), Seq("item_a"))
      .join(broadcast(itemN.withColumnRenamed("_i", "item_b")
        .withColumnRenamed("_in", "n_b")), Seq("item_b"))
      .crossJoin(broadcast(baskets))
      .orderBy(col("pair_n").desc, col("item_a"), col("item_b"))
      .limit(topK)
    top.select(col("item_a"), col("item_b"), col("pair_n"),
        col("n_a"), col("n_b"),
        (col("pair_n").cast(DoubleType) / col("_n").cast(DoubleType))
          .as("support"),
        (col("pair_n").cast(DoubleType) / col("n_a").cast(DoubleType))
          .as("conf_a_b"),
        (col("pair_n").cast(DoubleType) / col("n_b").cast(DoubleType))
          .as("conf_b_a"),
        // lift = (pair_n·N)/(n_a·n_b): both products exact in
        // DECIMAL(38,0), ONE double division at the end
        ((col("pair_n").cast(DecimalType(18, 0)) *
            col("_n").cast(DecimalType(18, 0))).cast(DoubleType) /
          (col("n_a").cast(DecimalType(18, 0)) *
            col("n_b").cast(DecimalType(18, 0))).cast(DoubleType))
          .as("lift"))
      .orderBy(col("pair_n").desc, col("item_a"), col("item_b"))
  }

  /** Item-item cosine similarity over basket co-occurrence — the
    * "customers who bought X also bought Y" recommender tier beside
    * [[associationRules]]' lift view: cos(i,j) = c_ij / √(c_i·c_j)
    * over BINARY basket membership (a basket contributes 0/1 per item
    * regardless of quantity), reported as each item's top-`k`
    * neighbors.
    *
    * Same scale shape as the rules: DISTINCT (basket,item) grain,
    * mega-baskets above `maxBasketSize` dropped from EVERY count
    * (theirs is the quadratic pair space; a degenerate
    * everything-basket would both blow the join and poison the
    * similarities), pairs from the co-partitioned self-join on the
    * basket key, counts exact longs. cos is ONE division by ONE sqrt
    * of the EXACT integer product (DECIMAL(38,0) — the kendallTau
    * one-sqrt lesson: √a·√b costs an extra rounding and can push a
    * perfect similarity past 1.0). The per-item top-k materializes
    * BOTH orientations of each pair (the i<j canonical pairs explode
    * ×2) then rank-filters through the window path; ties break
    * (cosine DESC, pair_n DESC, neighbor ASC) — exact-double compares
    * over the same fixed chain, deterministic on both engines. */
  def itemSimilarity(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 2L, maxBasketSize: Int = 1000,
      k: Int = 5): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    require(k >= 1, s"k must be >= 1, got $k")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val sized = items
      .withColumn("_k", count(lit(1)).over(Window.partitionBy(col("_b"))))
      .filter(col("_k") <= maxBasketSize)
    val itemN = sized.groupBy(col("_i")).agg(count(lit(1)).as("_in"))
    val pairs = sized.as("l")
      .join(sized.as("r"), col("l._b") === col("r._b") &&
        col("l._i") < col("r._i"))
      .groupBy(col("l._i").as("_ia"), col("r._i").as("_ib"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPairCount)
    val both = pairs
      .select(col("_ia").as("item"), col("_ib").as("neighbor"), col("pair_n"))
      .unionByName(pairs.select(col("_ib").as("item"),
        col("_ia").as("neighbor"), col("pair_n")))
    val d19 = DecimalType(19, 0)
    val scored = both
      .join(broadcast(itemN.select(col("_i").as("item"),
        col("_in").as("n_item"))), Seq("item"))
      .join(broadcast(itemN.select(col("_i").as("neighbor"),
        col("_in").as("n_neighbor"))), Seq("neighbor"))
      .withColumn("cosine",
        col("pair_n").cast(DoubleType) /
          sqrt((col("n_item").cast(d19) * col("n_neighbor").cast(d19))
            .cast(DecimalType(38, 0)).cast(DoubleType)))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cosine").desc, col("pair_n").desc, col("neighbor"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank").cast(IntegerType).as("rank"),
        col("neighbor"), col("pair_n"), col("n_item"), col("n_neighbor"),
        col("cosine"))
      .orderBy(col("item"), col("rank"))
  }
}

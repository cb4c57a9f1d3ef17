package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Fused cosine similarity as a native Catalyst expression — tier (b) of
  * the custom-operator ladder (SURVEY.md §7.3): one codegen'd loop
  * computes dot, |a|², |b|² in a single pass with no per-element object
  * allocation. The higher-order-function composition in
  * `SimilarityOps.cosine` (zip_with + aggregate ×3) allocates an
  * intermediate array and folds it three times; this expression is the
  * shape a hot ANN scoring loop wants at 100 TB. Equality with the HOF
  * version is property-tested in ExpressionSpec.
  *
  * Interpreted eval and doGenCode produce identical IEEE operation order,
  * so results are bit-stable whether or not codegen kicks in.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is sealed away in Spark 4 (AbstractDataType is
  // private[sql]); enforce the contract at construction instead.
  require(Seq(left, right).forall(e => !e.resolved ||
    e.dataType == ArrayType(DoubleType) || e.dataType == ArrayType(DoubleType, false)),
    s"cosine_sim expects ARRAY<DOUBLE> inputs, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // Length mismatch yields NULL — the same answer the zip_with/aggregate
  // composition gives (its zip pads with nulls, poisoning the fold).
  // Silently truncating to the shorter array would mask dimension bugs.
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product — the assignment/probing primitive of IVF ANN and
  * the hyperplane-projection primitive of LSH bucketing. Same contract as
  * [[CosineSim]]: bit-equal to the `aggregate(zip_with(a,b,*), 0.0, +)`
  * HOF fold (identical left-to-right IEEE order), null on length
  * mismatch, one codegen'd loop with no per-element allocation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  require(Seq(left, right).forall(e => !e.resolved ||
    e.dataType == ArrayType(DoubleType) || e.dataType == ArrayType(DoubleType, false)),
    s"dot_product expects ARRAY<DOUBLE> inputs, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0; var i = 0
      while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
      dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration: per-session (`GraftFunctions.register`) or via
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. After
  * either, `cosine_sim(a, b)` is available in SQL and through
  * `call_function("cosine_sim", ...)` — a real function, not a UDF: it
  * participates in codegen and constant folding. */
object GraftFunctions {
  /** Second argument of minhash_sig must be a foldable int literal (the
    * signature width is a plan-compile-time constant). */
  private def litInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }

  /** Double-valued sibling of [[litInt]] for smoothing-constant
    * arguments (holt_fold): accepts double or integral literals. */
  private def litDouble(e: Expression): Double = e.eval(null) match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case other => throw new IllegalArgumentException(
      s"expected a numeric literal, got $other")
  }

  /** Long-valued twin of [[litInt]]: preserves the full 64-bit literal
    * (seed arguments are Long in the expression constructors — routing a
    * Long literal through litInt would silently truncate to Int and break
    * bit-compatibility with LangIdOps.trigramHashesOnCps for non-default
    * seeds). */
  private def litLong(e: Expression): Long = e.eval(null) match {
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }

  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSim],
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))),
    ("dot_product", classOf[DotProduct],
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("minhash_sig", classOf[MinHashSig],
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs(0), exprs.lift(1).map(litInt).getOrElse(64))),
    ("minhash_shingle_sig", classOf[MinHashShingleSig],
      (exprs: Seq[Expression]) =>
        MinHashShingleSig(exprs(0),
          exprs.lift(1).map(litInt).getOrElse(64),
          exprs.lift(2).map(litInt).getOrElse(3))),
    ("simhash_sig", classOf[SimHashSig],
      (exprs: Seq[Expression]) => SimHashSig(exprs(0))),
    ("shingle_array", classOf[ShingleArray],
      (exprs: Seq[Expression]) =>
        ShingleArray(exprs(0), exprs.lift(1).map(litInt).getOrElse(3))),
    ("nfkc_normalize", classOf[NfkcNormalize],
      (exprs: Seq[Expression]) => NfkcNormalize(exprs(0))),
    // buckets and seed are plan-compile-time constants (the minhash_sig
    // foldable-literal contract)
    ("trigram_bucket_hash", classOf[TrigramBucketHash],
      (exprs: Seq[Expression]) =>
        TrigramBucketHash(exprs(0),
          exprs.lift(1).map(litInt).getOrElse(512),
          exprs.lift(2).map(litLong).getOrElse(11L))),
    ("sorted_inter_size", classOf[SortedInterSize],
      (exprs: Seq[Expression]) => SortedInterSize(exprs(0), exprs(1))),
    // alpha and beta are plan-compile-time constants (the minhash_sig
    // foldable-literal contract)
    ("holt_fold", classOf[HoltFold],
      (exprs: Seq[Expression]) =>
        HoltFold(exprs(0),
          exprs.lift(1).map(litDouble).getOrElse(0.25),
          exprs.lift(2).map(litDouble).getOrElse(0.125))),
    // generator (UDTF-shaped): rows stream out of eval lazily — see
    // NgramGenerate's scaladoc for the vs-posexplode(shingle_array)
    // memory contract
    ("ngram_generate", classOf[NgramGenerate],
      (exprs: Seq[Expression]) =>
        NgramGenerate(exprs(0), exprs.lift(1).map(litInt).getOrElse(3))),
    // Spark's own runtime-filter bloom expressions (codegen'd, mergeable
    // partial aggregation), surfaced as callable functions: the engine
    // only instantiates them via InjectRuntimeFilter, but they are
    // exactly the right primitive for explicit semi-join prefilters
    // (DedupOps.incrementalDedupBloom). Args: bloom_filter_agg(xxhash64
    // value, estimatedItems, numBits) — the analyzer wraps the
    // AggregateFunction; might_contain(bloomBinary, xxhash64 value).
    ("bloom_filter_agg",
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(value[, estimatedItems, numBits])")
      }),
    ("might_contain",
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))),
    // Mergeable KLL quantile sketches (see KllSketch.scala): the
    // rank/quantile companion to hll_sketch_agg's distinct sketches.
    // kll_sketch_agg(doubleValue[, k]) → sketch bytes;
    // kll_union_agg(sketchBytes[, k]) → merged bytes;
    // kll_quantile(sketchBytes, rank) → estimate.
    ("kll_sketch_agg", classOf[KllSketchAgg],
      (exprs: Seq[Expression]) => KllSketchAgg(exprs(0),
        exprs.lift(1).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal(200)))),
    ("kll_union_agg", classOf[KllUnionAgg],
      (exprs: Seq[Expression]) => KllUnionAgg(exprs(0),
        exprs.lift(1).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal(200)))),
    ("kll_quantile", classOf[KllQuantile],
      (exprs: Seq[Expression]) => KllQuantile(exprs(0), exprs(1))),
    // Theta set-algebra sketches (see ThetaSketch.scala): |A∩B| / |A\B|
    // over independently-built sketches — the set-op member of the
    // sketch suite. theta_sketch_agg(value[, lgK]) → compact bytes;
    // theta_union_agg(bytes[, lgK]); theta_intersect(a, b);
    // theta_a_not_b(a, b); theta_estimate(bytes).
    ("theta_sketch_agg", classOf[ThetaSketchAgg],
      (exprs: Seq[Expression]) => ThetaSketchAgg(exprs(0),
        exprs.lift(1).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal(12)))),
    ("theta_union_agg", classOf[ThetaUnionAgg],
      (exprs: Seq[Expression]) => ThetaUnionAgg(exprs(0),
        exprs.lift(1).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal(12)))),
    ("theta_intersect", classOf[ThetaIntersect],
      (exprs: Seq[Expression]) => ThetaIntersect(exprs(0), exprs(1))),
    ("theta_a_not_b", classOf[ThetaANotB],
      (exprs: Seq[Expression]) => ThetaANotB(exprs(0), exprs(1))),
    ("theta_estimate", classOf[ThetaEstimate],
      (exprs: Seq[Expression]) => ThetaEstimate(exprs(0))),
    // Frequent-items (heavy-hitters) sketches (see FreqSketch.scala):
    // freq_sketch_agg(bigintValue[, maxMapSize]) → sketch bytes;
    // freq_merge_agg(bytes[, maxMapSize]); freq_topk(bytes, k) →
    // ARRAY<STRUCT<item, estimate, lb, ub>>.
    ("freq_sketch_agg", classOf[FreqSketchAgg],
      (exprs: Seq[Expression]) => FreqSketchAgg(exprs(0),
        exprs.lift(1).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal(1024)))),
    ("freq_merge_agg", classOf[FreqMergeAgg],
      (exprs: Seq[Expression]) => FreqMergeAgg(exprs(0),
        exprs.lift(1).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal(1024)))),
    ("freq_topk", classOf[FreqTopK],
      (exprs: Seq[Expression]) => FreqTopK(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit = builders.foreach { case (name, _, b) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, b, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, cls, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        b))
    }
    e.injectPlannerStrategy(graft.plans.TopKPerKey.strategy)
  }
}

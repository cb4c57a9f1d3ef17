package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile sketches (Karnin-Lang-Liberty) as first-class
  * columns — the rank/quantile companion to the engine's HLL distinct
  * sketches (`hll_sketch_agg`, exercised in agg_hll_merge): every
  * shard/group aggregates its own sketch, and a CENTRAL UNION of the
  * sketch BYTES answers global quantile questions without re-touching
  * the rows. This is the 100 TB percentile pattern: `percentile` buffers
  * every value in one aggregation buffer, `approx_percentile` hides its
  * sketch inside partial aggregation, while a stored KLL column is
  * mergeable ACROSS snapshots/partitions/days after the data is gone
  * (k=200 ⇒ ~1.3% normalized rank error, a few KB per sketch).
  *
  * Implemented as real `TypedImperativeAggregate`s — the buffer holds
  * the live sketch object, serialized only at shuffle/spill boundaries
  * (an `Aggregator`-over-bytes UDAF would re-heapify per ROW). This is
  * also the repo's reference implementation of the custom-UDAF
  * extension point (SURVEY.md §2.11): everything else rides built-ins.
  */
case class KllSketchAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] {

  require(!kExpr.foldable || KllSketchAgg.litK(kExpr) >= 8,
    "kll_sketch_agg: k must be a foldable int literal >= 8")
  require(!child.resolved || child.dataType == DoubleType,
    s"kll_sketch_agg expects a DOUBLE value column, got ${child.dataType}")

  // Analysis-time gate (the constructor require can't demand foldability:
  // the planner legitimately rebinds children to attribute refs in the
  // final-agg stage): a non-foldable k — a COLUMN passed via SQL — fails
  // HERE with the named contract message instead of reaching litK's
  // eval(null) at executor time as an unnamed NPE/MatchError.
  override def checkInputDataTypes(): TypeCheckResult =
    KllSketchAgg.checkParamLiteral(kExpr, "kll_sketch_agg", "k")

  private lazy val k: Int = KllSketchAgg.litK(kExpr)

  override def left: Expression = child
  override def right: Expression = kExpr
  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllSketchAgg =
    copy(child = newLeft, kExpr = newRight)
}

object KllSketchAgg {
  private[expressions] def litK(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"kll k: expected an integer literal, got $other")
  }

  /** Shared analysis-time foldability gate for every sketch parameter
    * (k / lgK / maxMapSize): turns a column-valued parameter into a
    * named AnalysisException instead of an executor-time eval(null)
    * failure. Range validity is still enforced by each constructor's
    * require once the parameter IS foldable. */
  private[expressions] def checkParamLiteral(
      e: Expression, fn: String, param: String): TypeCheckResult =
    if (e.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn: $param must be an integer literal, got ${e.sql}")
}

/** Union of serialized KLL sketches (BINARY column → one merged BINARY):
  * the central-merge half of the shard-sketch pattern. Sketches built
  * with differing k merge safely (the result adopts the coarsest
  * error). NULL inputs are skipped; an empty group yields the empty
  * sketch's bytes (n = 0), never NULL — matching `hll_union_agg`. */
case class KllUnionAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with BinaryLike[Expression] {

  require(!child.resolved || child.dataType == BinaryType,
    s"kll_union_agg expects a BINARY sketch column, got ${child.dataType}")
  require(!kExpr.foldable || KllSketchAgg.litK(kExpr) >= 8,
    "kll_union_agg: k must be a foldable int literal >= 8")

  override def checkInputDataTypes(): TypeCheckResult =
    KllSketchAgg.checkParamLiteral(kExpr, "kll_union_agg", "k")

  private lazy val k: Int = KllSketchAgg.litK(kExpr)

  override def left: Expression = child
  override def right: Expression = kExpr
  override def prettyName: String = "kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllUnionAgg =
    copy(child = newLeft, kExpr = newRight)
}

/** `kll_quantile(sketchBytes, rank)` — the INCLUSIVE-rank quantile
  * estimate read out of a serialized sketch. Scalar probe over sketch
  * columns (post-aggregation rows — a handful per query), so
  * CodegenFallback costs nothing measurable; an empty sketch (n = 0)
  * yields NULL rather than a DataSketches error. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  require(!left.resolved || left.dataType == BinaryType,
    s"kll_quantile expects (BINARY, DOUBLE), got ${left.dataType}")
  require(!right.resolved || right.dataType == DoubleType,
    s"kll_quantile expects (BINARY, DOUBLE), got ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override def nullable: Boolean = true

  override def nullSafeEval(sk: Any, rank: Any): Any = {
    val r = rank.asInstanceOf[Double]
    // a caller-bug rank must fail with a NAMED message, not a raw
    // DataSketches exception from task 9,999 of 10,000
    if (r.isNaN || r < 0.0 || r > 1.0) throw new IllegalArgumentException(
      s"kll_quantile: rank must be in [0, 1], got $r")
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else sketch.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

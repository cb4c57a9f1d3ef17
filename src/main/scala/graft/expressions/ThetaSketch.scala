package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta sketches (Dasgupta et al., the DataSketches theta
  * family) as first-class BINARY columns — the SET-ALGEBRA member of
  * the engine's sketch suite: HLL answers |A| (agg_hll_merge), KLL
  * answers quantiles (agg_kll_merge), CMS answers frequencies, bitmaps
  * answer |A| exactly — theta is the one that answers |A ∩ B| and
  * |A \ B| over sketches built independently (audience overlap,
  * cross-corpus contamination, retention cohorts) WITHOUT co-shuffling
  * the raw keys. At 100 TB each shard/day/source stores its own
  * per-group sketch; intersections/differences are then driver-cheap
  * scalar ops over a handful of compact sketch blobs.
  *
  * Same TypedImperativeAggregate discipline as KllSketchAgg: the
  * buffer holds the live `Union` object (theta unions accept raw
  * updates directly), serialized only at shuffle/spill boundaries;
  * eval emits the COMPACT sketch bytes — the stable, ordered,
  * wrap-able storage form. Set ops are scalar expressions over those
  * bytes (CodegenFallback: they run on post-aggregation rows).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgKExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with BinaryLike[Expression] {

  require(!child.resolved ||
    child.dataType == LongType || child.dataType == BinaryType ||
    child.dataType.typeName == "string",
    s"theta_sketch_agg expects BIGINT/STRING/BINARY values, got ${child.dataType}")
  require(!lgKExpr.foldable || {
    val k = KllSketchAgg.litK(lgKExpr); k >= 4 && k <= 26
  }, "theta_sketch_agg: lgK must be an int literal in [4, 26]")

  override def checkInputDataTypes(): TypeCheckResult =
    KllSketchAgg.checkParamLiteral(lgKExpr, "theta_sketch_agg", "lgK")

  private lazy val lgK: Int = KllSketchAgg.litK(lgKExpr)

  override def left: Expression = child
  override def right: Expression = lgKExpr
  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buffer.update(l)
      case s: UTF8String => buffer.update(s.toString)
      case b: Array[Byte] => buffer.update(b)
      case other => throw new IllegalStateException(
        s"theta_sketch_agg: unsupported value $other")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult())
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult().toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    Sketches.heapifySetOperation(Memory.wrap(bytes)).asInstanceOf[Union]

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSketchAgg =
    copy(child = newLeft, lgKExpr = newRight)
}

/** Union of serialized theta sketches (BINARY → one merged BINARY) —
  * the central-merge half, mirroring kll_union_agg / hll_union_agg. */
case class ThetaUnionAgg(
    child: Expression,
    lgKExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with BinaryLike[Expression] {

  require(!child.resolved || child.dataType == BinaryType,
    s"theta_union_agg expects a BINARY sketch column, got ${child.dataType}")
  require(!lgKExpr.foldable || {
    val k = KllSketchAgg.litK(lgKExpr); k >= 4 && k <= 26
  }, "theta_union_agg: lgK must be an int literal in [4, 26]")

  override def checkInputDataTypes(): TypeCheckResult =
    KllSketchAgg.checkParamLiteral(lgKExpr, "theta_union_agg", "lgK")

  private lazy val lgK: Int = KllSketchAgg.litK(lgKExpr)

  override def left: Expression = child
  override def right: Expression = lgKExpr
  override def prettyName: String = "theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult())
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult().toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    Sketches.heapifySetOperation(Memory.wrap(bytes)).asInstanceOf[Union]

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionAgg =
    copy(child = newLeft, lgKExpr = newRight)
}

private[expressions] object ThetaBytes {
  def sketch(bytes: Any): CompactSketch =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
}

/** `theta_estimate(sketchBytes)` — the distinct estimate of a compact
  * theta sketch. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  require(!child.resolved || child.dataType == BinaryType,
    s"theta_estimate expects BINARY, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(sk: Any): Any =
    ThetaBytes.sketch(sk).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect(aBytes, bBytes)` — compact sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  require(Seq(left, right).forall(e =>
    !e.resolved || e.dataType == BinaryType),
    s"theta_intersect expects (BINARY, BINARY), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(ThetaBytes.sketch(a), ThetaBytes.sketch(b)).toByteArray
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** `theta_a_not_b(aBytes, bBytes)` — compact sketch of A \ B. */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  require(Seq(left, right).forall(e =>
    !e.resolved || e.dataType == BinaryType),
    s"theta_a_not_b expects (BINARY, BINARY), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaBytes.sketch(a), ThetaBytes.sketch(b)).toByteArray
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaANotB =
    copy(left = newLeft, right = newRight)
}

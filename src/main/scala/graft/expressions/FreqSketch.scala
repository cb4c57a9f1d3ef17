package graft.expressions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructType}

/** Mergeable frequent-items sketches (Misra-Gries-family LongsSketch) —
  * the HEAVY-HITTERS member of the sketch suite: where agg_cms answers
  * "how often did THIS key occur", the frequent-items sketch answers
  * "WHICH keys dominate" with deterministic error GUARANTEES
  * (estimate ∈ [lb, ub] always; with NO_FALSE_NEGATIVES every item
  * above the error threshold is reported). The 100 TB hot-key
  * discovery pattern: per-shard sketches of bounded size (maxMapSize
  * counters, regardless of key cardinality), central merge of the
  * BYTES, top-k read off the merged sketch — the skew diagnosis
  * profile_key_skew computes exactly, minus the exact groupBy over
  * the full key space.
  *
  * Same TypedImperativeAggregate discipline as the KLL/theta pairs:
  * the live sketch sits in the aggregation buffer, serialized only at
  * shuffle/spill boundaries. */
case class FreqSketchAgg(
    child: Expression,
    maxMapExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with BinaryLike[Expression] {

  require(!child.resolved || child.dataType == LongType,
    s"freq_sketch_agg expects a BIGINT value column, got ${child.dataType}")
  require(!maxMapExpr.foldable || FreqSketchAgg.validMapSize(maxMapExpr),
    "freq_sketch_agg: maxMapSize must be a power of 2 >= 8 " +
      "(DataSketches LongsSketch contract)")

  override def checkInputDataTypes(): TypeCheckResult =
    KllSketchAgg.checkParamLiteral(maxMapExpr, "freq_sketch_agg", "maxMapSize")

  private lazy val maxMapSize: Int = KllSketchAgg.litK(maxMapExpr)

  override def left: Expression = child
  override def right: Expression = maxMapExpr
  override def prettyName: String = "freq_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqSketchAgg =
    copy(child = newLeft, maxMapExpr = newRight)
}

object FreqSketchAgg {
  private[expressions] def validMapSize(e: Expression): Boolean = {
    val k = KllSketchAgg.litK(e)
    k >= 8 && (k & (k - 1)) == 0
  }
}

/** Union of serialized frequent-items sketches — the central-merge
  * half, mirroring kll_union_agg / theta_union_agg. */
case class FreqMergeAgg(
    child: Expression,
    maxMapExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with BinaryLike[Expression] {

  require(!child.resolved || child.dataType == BinaryType,
    s"freq_merge_agg expects a BINARY sketch column, got ${child.dataType}")
  require(!maxMapExpr.foldable || FreqSketchAgg.validMapSize(maxMapExpr),
    "freq_merge_agg: maxMapSize must be a power of 2 >= 8 " +
      "(DataSketches LongsSketch contract)")

  override def checkInputDataTypes(): TypeCheckResult =
    KllSketchAgg.checkParamLiteral(maxMapExpr, "freq_merge_agg", "maxMapSize")

  private lazy val maxMapSize: Int = KllSketchAgg.litK(maxMapExpr)

  override def left: Expression = child
  override def right: Expression = maxMapExpr
  override def prettyName: String = "freq_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqMergeAgg =
    copy(child = newLeft, maxMapExpr = newRight)
}

/** `freq_topk(sketchBytes, k)` — the k most frequent items read off a
  * serialized sketch as ARRAY<STRUCT<item, estimate, lb, ub>>, using
  * NO_FALSE_NEGATIVES (every true heavy hitter above the error
  * threshold is present; the [lb, ub] interval always brackets the
  * true count — that pair of guarantees is what downstream checks
  * assert). Runs on post-aggregation rows ⇒ CodegenFallback. */
case class FreqTopK(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  require(!left.resolved || left.dataType == BinaryType,
    s"freq_topk expects (BINARY, INT), got ${left.dataType}")
  require(!right.foldable || KllSketchAgg.litK(right) >= 1,
    "freq_topk: k must be a positive int literal — k <= 0 would " +
      "silently read as 'no heavy hitters'")

  override def checkInputDataTypes(): TypeCheckResult =
    KllSketchAgg.checkParamLiteral(right, "freq_topk", "k")

  private lazy val k: Int = KllSketchAgg.litK(right)

  override def dataType: DataType = ArrayType(new StructType()
    .add("item", LongType).add("estimate", LongType)
    .add("lb", LongType).add("ub", LongType), containsNull = false)
  override def prettyName: String = "freq_topk"

  override def nullSafeEval(sk: Any, kAny: Any): Any = {
    val sketch = LongsSketch.getInstance(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    val rows = sketch.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .take(k) // already sorted by estimate descending
      .map(r => InternalRow(r.getItem, r.getEstimate,
        r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopK =
    copy(left = newLeft, right = newRight)
}

package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for a deterministic synthetic media corpus —
  * tier (c) of the custom-operator ladder (SURVEY.md §7.3): when no
  * built-in source fits (here: a generated multimodal table, the
  * test-bench twin of an object-store media crawl), a V2 `TableProvider`
  * gives the optimizer real handles instead of an opaque RDD:
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): if `bytes`
  *    is not selected, payloads are never materialized — the difference
  *    between a metadata query and a full media read at 100 TB;
  *  - **filter pushdown** (`SupportsPushDownFilters`): range predicates
  *    on `media_id` narrow the generated id range BEFORE partition
  *    planning, so untouched partitions are never even scheduled;
  *  - **partition planning**: the id range splits into `numPartitions`
  *    contiguous input partitions, each read by an independent task.
  *
  * Options: `count` (rows, default 1000), `numPartitions` (default 8),
  * `seed` (default 42). Usage: `spark.read.format("fakemedia")` (via the
  * DataSourceRegister service file) or the full class name.
  */
class FakeMediaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fakemedia"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeMediaSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FakeMediaTable(new CaseInsensitiveStringMap(properties))
}

object FakeMediaSource {
  val schema: StructType = new StructType()
    .add("media_id", LongType, nullable = false)
    .add("kind", StringType, nullable = false)
    .add("width", IntegerType, nullable = false)
    .add("n_frames", IntegerType, nullable = false)
    .add("bytes", BinaryType, nullable = false)

  private val kinds = Array("image", "audio", "video")

  /** Test-observability counters (single JVM in local mode): prove that
    * pruning skips payload generation and pushdown skips rows. */
  val payloadsBuilt = new AtomicLong(0)
  val rowsGenerated = new AtomicLong(0)

  private def mix(seed: Long, i: Long, j: Long): Long = {
    var h = seed ^ (i * 0x9E3779B97F4A7C15L) ^ (j * 0xC2B2AE3D27D4EB4FL)
    h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL
    h ^ (h >>> 33)
  }

  def kindOf(i: Long): String = kinds((i % 3).toInt)
  def widthOf(i: Long): Int = ((i % 64) * 16 + 16).toInt
  def framesOf(i: Long): Int = (i % 8 + 1).toInt
  def bytesOf(i: Long, seed: Long): Array[Byte] = {
    payloadsBuilt.incrementAndGet()
    Array.tabulate((16 + i % 48).toInt)(j => (mix(seed, i, j) & 0xff).toByte)
  }
}

class FakeMediaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "fakemedia"
  override def schema(): StructType = FakeMediaSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new FakeMediaScanBuilder(
      options.getLong("count", 1000L),
      options.getInt("numPartitions", 8),
      options.getLong("seed", 42L))
}

class FakeMediaScanBuilder(count: Long, numPartitions: Int, seed: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var required: StructType = FakeMediaSource.schema
  private var lo: Long = 0L
  private var hi: Long = count
  private var pushed: Array[Filter] = Array.empty
  private var countStars: Int = 0 // >0 once a COUNT(*) aggregation is pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Limit pushdown: ids are generated densely in [lo, hi), so a global
    * LIMIT n is exactly the first n ids of the (already filter-narrowed)
    * range — clamp hi and report the limit FULLY pushed: no task ever
    * generates a row the limit would discard. (Filter pushdown runs
    * before limit pushdown in V2ScanRelationPushDown, so clamping
    * composes with pushed ranges.) */
  override def pushLimit(limit: Int): Boolean = {
    hi = hi min (lo + limit.toLong)
    true
  }
  override def isPartiallyPushed(): Boolean = false

  /** COUNT(*) with no grouping collapses to range arithmetic — the scan
    * answers from (hi - lo) without generating a single row or payload
    * (the 100 TB design point: a corpus count must not be a corpus
    * read). Complete pushdown ⇒ the scan must emit the FINAL result, so
    * the count scan plans exactly ONE input partition. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(
        _.isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar])

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    if (supportCompletePushDown(agg)) {
      countStars = agg.aggregateExpressions.length
      true
    } else false

  /** Range predicates on media_id narrow [lo, hi) exactly, so they are
    * fully handled here (no residual re-evaluation needed); everything
    * else is left for Spark to evaluate post-scan. Bounds that need
    * x + 1 guard against Long overflow: `> Long.MaxValue` must yield an
    * EMPTY range (wrapping would silently widen it to everything) and
    * `<= Long.MaxValue` must be a no-op (wrapping would empty it). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def num(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    def emptyRange(): Unit = { lo = 0L; hi = 0L }
    val (accepted, residual) = filters.partition {
      case EqualTo("media_id", v) => num(v).exists { x =>
        lo = lo max x
        if (x == Long.MaxValue) emptyRange() // ids are < count <= MaxValue
        else hi = hi min (x + 1)
        true
      }
      case GreaterThan("media_id", v) => num(v).exists { x =>
        if (x == Long.MaxValue) emptyRange() else lo = lo max (x + 1); true
      }
      case GreaterThanOrEqual("media_id", v) => num(v).exists { x => lo = lo max x; true }
      case LessThan("media_id", v) => num(v).exists { x => hi = hi min x; true }
      case LessThanOrEqual("media_id", v) => num(v).exists { x =>
        if (x != Long.MaxValue) hi = hi min (x + 1); true // MaxValue: always true
      }
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new FakeMediaScan(required, lo max 0L, hi, numPartitions, seed, countStars)
}

case class FakeMediaRange(start: Long, end: Long) extends InputPartition

class FakeMediaScan(
    required: StructType, lo: Long, hi: Long, numPartitions: Int, seed: Long,
    countStars: Int = 0)
    extends Scan with Batch {

  override def readSchema(): StructType =
    if (countStars > 0)
      StructType((0 until countStars).map(i =>
        StructField(s"count_star_$i", LongType, nullable = false)))
    else required
  override def toBatch: Batch = this

  /** Contiguous chunks of the (already filter-narrowed) id range; empty
    * chunks are never planned, so a tight pushed range schedules few
    * tasks no matter how large `count` is. A pushed COUNT(*) is complete
    * pushdown: exactly one partition, one arithmetic row (and COUNT over
    * an empty range must still produce its one zero row). */
  override def planInputPartitions(): Array[InputPartition] = {
    val total = (hi - lo) max 0L
    if (countStars > 0) return Array(FakeMediaRange(lo, lo + total))
    if (total == 0L) return Array.empty
    val n = numPartitions.toLong min total
    val per = (total + n - 1) / n
    (0L until n).map { p =>
      FakeMediaRange(lo + p * per, ((lo + (p + 1) * per) min hi))
    }.filter(r => r.end > r.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (countStars > 0) new FakeMediaCountReaderFactory(countStars)
    else new FakeMediaReaderFactory(required, seed)
}

/** Reader for a completely-pushed COUNT(*): one row of range arithmetic,
  * no id iteration, no payloads, no rowsGenerated ticks. */
class FakeMediaCountReaderFactory(countStars: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[FakeMediaRange]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val first = !emitted; emitted = true; first }
      override def get(): InternalRow =
        new GenericInternalRow(
          Array.fill[Any](countStars)(r.end - r.start))
      override def close(): Unit = ()
    }
  }
}

class FakeMediaReaderFactory(required: StructType, seed: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[FakeMediaRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      // column accessors resolved ONCE per partition, not per row
      private val getters: Array[Long => Any] = required.fields.map(_.name).map {
        case "media_id" => (id: Long) => id
        case "kind" => (id: Long) => UTF8String.fromString(FakeMediaSource.kindOf(id))
        case "width" => (id: Long) => FakeMediaSource.widthOf(id)
        case "n_frames" => (id: Long) => FakeMediaSource.framesOf(id)
        case "bytes" => (id: Long) => FakeMediaSource.bytesOf(id, seed)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = {
        FakeMediaSource.rowsGenerated.incrementAndGet()
        new GenericInternalRow(getters.map(g => g(i)).asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}

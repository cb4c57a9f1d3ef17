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
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = FakeMediaSource.schema
  private var lo: Long = 0L
  private var hi: Long = count
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

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
    new FakeMediaScan(required, lo max 0L, hi, numPartitions, seed)
}

case class FakeMediaRange(start: Long, end: Long) extends InputPartition

class FakeMediaScan(
    required: StructType, lo: Long, hi: Long, numPartitions: Int, seed: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Contiguous chunks of the (already filter-narrowed) id range; empty
    * chunks are never planned, so a tight pushed range schedules few
    * tasks no matter how large `count` is. */
  override def planInputPartitions(): Array[InputPartition] = {
    val total = (hi - lo) max 0L
    if (total == 0L) return Array.empty
    val n = numPartitions.toLong min total
    val per = (total + n - 1) / n
    (0L until n).map { p =>
      FakeMediaRange(lo + p * per, ((lo + (p + 1) * per) min hi))
    }.filter(r => r.end > r.start).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FakeMediaReaderFactory(required, seed)
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

package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal DSv2 TableCatalog whose tables support native `MERGE INTO`
  * — the SQL statement a lakehouse user actually types for the upsert
  * pipeline the reference implements imperatively (the NOT-EXISTS
  * insert-else-ignore at README.md:1517-1529 is exactly what
  * `WHEN NOT MATCHED THEN INSERT` declares). The engine-side merge
  * machinery existed three ways already (left_anti+union `sink_upsert`,
  * CDC apply, deletion-vector merge-on-read); this adds the missing
  * STATEMENT surface: `SupportsRowLevelOperations` + `SupportsDelta`,
  * so Spark's RewriteMergeIntoTable plans a native `WriteDelta` of
  * per-row INSERT/UPDATE/DELETE actions — NOT a full-table overwrite
  * (plan-asserted in MergeIntoSpec): only rows the MERGE touches travel
  * to the writer, which is the property that makes MERGE usable when
  * the target is 100 TB and the source is a day's delta.
  *
  * Storage is an in-JVM keyed row store (`local[*]` shares one JVM, the
  * same contract as FakeMediaSource): the POINT under test is the plan
  * shape and the delta-writer protocol, not a storage engine. A real
  * deployment swaps the store for a format with row-level commit
  * (Iceberg/Delta) — the Spark-facing surface is identical.
  *
  * Register: `spark.conf.set("spark.sql.catalog.graftcat",
  * "graft.sources.MergeableCatalog")`; the row-id column comes from the
  * `rowid` table property (`TBLPROPERTIES('rowid'='o_orderkey')`).
  */
object MergeableStore {
  final class Stored(val schema: StructType, val rowIdCol: String) {
    // insertion-ordered so scans are deterministic across repeated runs
    val rows = new java.util.LinkedHashMap[Any, Array[Any]]()
  }
  val tables = TrieMap[String, Stored]()
}

class MergeableCatalog extends TableCatalog {
  private var catName: String = "graftcat"
  override def name(): String = catName
  override def initialize(n: String, options: CaseInsensitiveStringMap): Unit =
    catName = n

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(ns: Array[String]): Array[Identifier] =
    MergeableStore.tables.keys.toArray.map(n => Identifier.of(ns, n))

  override def loadTable(ident: Identifier): Table =
    MergeableStore.tables.get(key(ident))
      .map(st => new MergeableTable(key(ident), st))
      .getOrElse(throw new NoSuchTableException(ident))

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val k = key(ident)
    if (MergeableStore.tables.contains(k))
      throw new TableAlreadyExistsException(ident)
    val rowId = Option(properties.get("rowid")).getOrElse(
      schema.fieldNames.headOption.getOrElse(
        throw new IllegalArgumentException("mergeable table needs >= 1 column")))
    require(schema.fieldNames.contains(rowId),
      s"rowid property '$rowId' is not a column of $schema")
    val st = new MergeableStore.Stored(schema, rowId)
    MergeableStore.tables.put(k, st)
    new MergeableTable(k, st)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean =
    MergeableStore.tables.remove(key(ident)).isDefined

  override def renameTable(from: Identifier, to: Identifier): Unit =
    MergeableStore.tables.remove(key(from)).foreach(st =>
      MergeableStore.tables.put(key(to), st))
}

class MergeableTable(tableKey: String, stored: MergeableStore.Stored)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations {

  override def name(): String = tableKey
  override def schema(): StructType = stored.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new MergeableScanBuilder(tableKey, stored)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MergeableAppendBuilder(tableKey)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new MergeableRowLevelOp(tableKey, stored, info.command())
}

// ------------------------------------------------------------------ read
private case class MergeableInputPartition(rows: Array[Array[Any]])
  extends InputPartition

class MergeableScanBuilder(tableKey: String, stored: MergeableStore.Stored)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = stored.schema
  override def toBatch: Batch = this
  override def description(): String = s"MergeableTable($tableKey)"
  // SNAPSHOT at plan time: a row-level op reads the pre-merge state
  // even though its own commit mutates the store before the scan of a
  // subsequent query.
  // r17 (guide §2.6 idle capacity): the snapshot is CHUNKED into
  // multiple input partitions instead of one — the single-partition
  // scan made every downstream stage of a MERGE/UPDATE/DELETE (the
  // join against the source, the delta projection) start from ONE
  // task no matter how many cores the session has. Chunk size keeps
  // small tables in one task (no per-task overhead regression) while a
  // seeded 75k-row target fans out. Row ORDER within and across
  // chunks is the store's insertion order, unchanged — chunking moves
  // partition boundaries only, and every consumer of this scan either
  // aggregates, joins, or re-sorts.
  override def planInputPartitions(): Array[InputPartition] = {
    val snap = stored.rows.synchronized {
      stored.rows.values().asScala.toArray.map(_.clone())
    }
    if (snap.isEmpty) Array(MergeableInputPartition(snap))
    else snap.grouped(8192).map(MergeableInputPartition(_))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = p.asInstanceOf[MergeableInputPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = new GenericInternalRow(rows(i))
          override def close(): Unit = ()
        }
    }
}

// ------------------------------------------------------------ write: append
private case class RowsMessage(rows: Array[Array[Any]]) extends WriterCommitMessage

private class CollectingWriter(schema: StructType) extends DataWriter[InternalRow] {
  protected val buf = scala.collection.mutable.ArrayBuffer[Array[Any]]()
  protected def values(row: InternalRow): Array[Any] = {
    val r = row.copy()
    schema.fields.indices.map(i => r.get(i, schema.fields(i).dataType)).toArray
  }
  override def write(row: InternalRow): Unit = buf += values(row)
  override def commit(): WriterCommitMessage = RowsMessage(buf.toArray)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** Ships to executors — must capture only serializable state. */
private class MergeableAppendFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CollectingWriter(schema)
}

private class MergeableDeltaFactory(schema: StructType, rowIdCol: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new MergeableDeltaWriter(schema, rowIdCol)
}

/** Append + truncate-then-append (INSERT OVERWRITE / TRUNCATE): the
  * capabilities() set advertises TRUNCATE, so the builder must honor
  * it — Spark's analysis accepts the statement on the capability alone
  * and only discovers a missing SupportsTruncate at write-build time,
  * as an unhelpful runtime error. Truncation is deferred to COMMIT
  * (same all-or-nothing contract as a real table format: a failed
  * overwrite leaves the old rows in place). */
class MergeableAppendBuilder(tableKey: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new MergeableAppendFactory(MergeableStore.tables(tableKey).schema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val st = MergeableStore.tables(tableKey)
        val idIdx = st.schema.fieldIndex(st.rowIdCol)
        st.rows.synchronized {
          if (doTruncate) st.rows.clear()
          messages.foreach {
            case RowsMessage(rows) => rows.foreach(r => st.rows.put(r(idIdx), r))
            case _ => ()
          }
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

// ------------------------------------------------------- write: row-level
private case class DeltaMessage(
    inserts: Array[Array[Any]], updates: Array[(Any, Array[Any])],
    deletes: Array[Any]) extends WriterCommitMessage

class MergeableRowLevelOp(
    tableKey: String, stored: MergeableStore.Stored,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"MergeableRowLevelOp($tableKey, $cmd)"
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(stored.rowIdCol))

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new MergeableScanBuilder(tableKey, stored)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
          override def createBatchWriterFactory(
              pinfo: PhysicalWriteInfo): DeltaWriterFactory =
            new MergeableDeltaFactory(
              MergeableStore.tables(tableKey).schema,
              MergeableStore.tables(tableKey).rowIdCol)
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val st = MergeableStore.tables(tableKey)
            val idIdx = st.schema.fieldIndex(st.rowIdCol)
            st.rows.synchronized {
              messages.foreach {
                case DeltaMessage(ins, upd, del) =>
                  del.foreach(st.rows.remove)
                  upd.foreach { case (id, r) =>
                    st.rows.remove(id); st.rows.put(r(idIdx), r)
                  }
                  ins.foreach(r => st.rows.put(r(idIdx), r))
                case _ => ()
              }
            }
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

private class MergeableDeltaWriter(schema: StructType, rowIdCol: String)
    extends CollectingWriter(schema) with DeltaWriter[InternalRow] {
  private val idType = schema(rowIdCol).dataType
  private val upd = scala.collection.mutable.ArrayBuffer[(Any, Array[Any])]()
  private val del = scala.collection.mutable.ArrayBuffer[Any]()
  private def idValue(id: InternalRow): Any = id.copy().get(0, idType)

  override def insert(row: InternalRow): Unit = buf += values(row)
  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit =
    upd += ((idValue(id), values(row)))
  override def delete(meta: InternalRow, id: InternalRow): Unit =
    del += idValue(id)
  override def commit(): WriterCommitMessage =
    DeltaMessage(buf.toArray, upd.toArray, del.toArray)
}

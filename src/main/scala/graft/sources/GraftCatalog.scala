package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo,
  SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal v2 `TableCatalog` backing the declarative DML surface —
  * the piece that lets a user type the ANSI statements
  * (`CREATE TABLE graft.t …`, `INSERT INTO graft.t …`,
  * `MERGE INTO graft.t USING src ON … WHEN MATCHED …`) instead of
  * calling the operator API: Spark's analyzer resolves the catalog,
  * and its own `RewriteMergeIntoTable` rule rewrites MERGE into the
  * group-based `ReplaceData` plan against
  * [[GraftMemTable.newRowLevelOperationBuilder]] — the engine
  * supplies only the storage contract (scan all rows, replace the
  * scanned group on commit), the MERGE semantics (matched/
  * not-matched clauses, cardinality check) stay Catalyst's, exactly
  * as they would on a real lakehouse format.
  *
  * Storage is in-memory (driver-held UnsafeRow buffers) — the
  * catalog exists to exercise the DML planning path end-to-end, not
  * to be a storage engine; the durable path in this library is
  * parquet + [[graft.operators.Cdc.mergeLatest]] (q162), whose
  * result the MERGE spec pins as semantically equal. Whole-table =
  * one replacement group (the constant `_group` metadata column),
  * which is the degenerate-but-correct form of Iceberg's
  * file-granular copy-on-write.
  *
  * Registered by [[graft.Tables.configure]] as
  * `spark.sql.catalog.graft`.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName = "graft"
  private val tables = new ConcurrentHashMap[Identifier, GraftMemTable]()

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  override def listTables(ns: Array[String]): Array[Identifier] =
    tables.keySet().asScala
      .filter(_.namespace().sameElements(ns)).toArray

  override def loadTable(ident: Identifier): Table = {
    val t = tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog tables are unpartitioned (whole-table " +
        "replacement group)")
    val t = new GraftMemTable(ident.toString, schema)
    if (tables.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(ident)
    t
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(ident) != null

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val t = tables.remove(from)
    if (t == null) throw new NoSuchTableException(from)
    if (tables.putIfAbsent(to, t) != null)
      throw new TableAlreadyExistsException(to)
  }

  // single implicit namespace layer: any namespace "exists" so
  // both `graft.t` and `graft.ns.t` resolve
  override def listNamespaces(): Array[Array[String]] =
    tables.keySet().asScala.map(_.namespace().toSeq).toSet
      .map((s: Seq[String]) => s.toArray).toArray
  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    Array.empty
  override def namespaceExists(ns: Array[String]): Boolean = true
  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] =
    util.Collections.emptyMap()
  override def createNamespace(ns: Array[String],
      meta: util.Map[String, String]): Unit = ()
  override def alterNamespace(ns: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER NAMESPACE not supported")
  override def dropNamespace(ns: Array[String],
      cascade: Boolean): Boolean = true
}

/** In-memory unpartitioned table: BATCH_READ + BATCH_WRITE (+
  * TRUNCATE for INSERT OVERWRITE) + row-level operations with the
  * whole table as the single replacement group. Rows are held as
  * copied UnsafeRows; reads fan them out over a fixed number of
  * input partitions so the DML plans still exercise real
  * distributed operators.
  *
  * The `_group` metadata column (constant 0 — one group) exists so
  * Spark's group-based rewrite carries a metadata projection:
  * `ReplaceDataExec` applies its data/metadata ordinal projections
  * only on that path (`DataAndMetadataWritingSparkTask`), and
  * without it the writer would receive the raw rewrite output with
  * the `__row_operation` column still attached. This mirrors real
  * lakehouse connectors, whose group metadata (file, partition) is
  * never empty. */
class GraftMemTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {
  require(!tableSchema.fieldNames.contains(GraftMemTable.GroupCol),
    s"column name ${GraftMemTable.GroupCol} is reserved")

  @volatile private var rows: Array[InternalRow] = Array.empty

  def currentRows: Array[InternalRow] = rows
  private[sources] def replaceAll(rs: Array[InternalRow]): Unit =
    synchronized { rows = rs }
  private[sources] def appendAll(rs: Array[InternalRow]): Unit =
    synchronized { rows = rows ++ rs }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = GraftMemTable.GroupCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
    })

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMemScanBuilder(tableSchema, rows)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemWriteBuilder(this, info.schema(), replace = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new GraftRowLevelOperation(this, info.command())
}

object GraftMemTable {
  val GroupCol = "_group"
}

/** Group-based row-level operation: scan = the whole table, write =
  * replace the whole table (the one group the scan produced) with
  * the rewritten rows Catalyst computes for MERGE/UPDATE/DELETE. */
class GraftRowLevelOperation(table: GraftMemTable,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    table.newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemWriteBuilder(table, info.schema(), replace = true)
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftMemTable.GroupCol))
  override def description(): String =
    s"GraftRowLevel($cmd, whole-table group)"
}

class GraftMemScanBuilder(tableSchema: StructType,
    rows: Array[InternalRow]) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(r: StructType): Unit = required = r
  override def build(): Scan =
    new GraftMemScan(tableSchema, required, rows)
}

class GraftMemScan(tableSchema: StructType, required: StructType,
    rows: Array[InternalRow]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = "graft-mem-scan"
  override def planInputPartitions(): Array[InputPartition] = {
    val slices = math.max(1, math.min(8, rows.length))
    (0 until slices).map { i =>
      GraftMemPartition(rows.zipWithIndex
        .filter(_._2 % slices == i).map(_._1))
        .asInstanceOf[InputPartition]
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMemReaderFactory(tableSchema, required)
}

case class GraftMemPartition(rows: Array[InternalRow])
  extends InputPartition

/** Projects stored full-schema rows down to the pruned read schema;
  * the `_group` metadata column evaluates to the constant 0 (one
  * replacement group). */
class GraftMemReaderFactory(tableSchema: StructType,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference,
      Literal}
    val proj = UnsafeProjection.create(required.fields.toSeq.map { f =>
      if (f.name == GraftMemTable.GroupCol)
        Literal(0, org.apache.spark.sql.types.IntegerType)
      else {
        val i = tableSchema.fieldIndex(f.name)
        BoundReference(i, tableSchema(i).dataType,
          tableSchema(i).nullable)
      }
    })
    val rs = p.asInstanceOf[GraftMemPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rs.length }
      override def get(): InternalRow = proj(rs(i))
      override def close(): Unit = ()
    }
  }
}

class GraftMemWriteBuilder(table: GraftMemTable, schema: StructType,
    replace: Boolean) extends WriteBuilder with SupportsTruncate {
  private var doReplace = replace
  override def truncate(): WriteBuilder = { doReplace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        new GraftMemWriterFactory(schema)
      override def commit(msgs: Array[WriterCommitMessage]): Unit = {
        val written = msgs.flatMap {
          case GraftRowsCommit(rs) => rs
          case _ => Array.empty[InternalRow]
        }
        if (doReplace) table.replaceAll(written)
        else table.appendAll(written)
      }
      override def abort(msgs: Array[WriterCommitMessage]): Unit = ()
    }
    override def description(): String =
      s"graft-mem-write(replace=$doReplace)"
  }
}

case class GraftRowsCommit(rows: Array[InternalRow])
  extends WriterCommitMessage

class GraftMemWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val proj = UnsafeProjection.create(schema)
      private val buf =
        scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      override def write(r: InternalRow): Unit = buf += proj(r).copy()
      override def write(meta: InternalRow, r: InternalRow): Unit =
        write(r) // whole-table group: the metadata row carries no
                 // placement information worth keeping
      override def commit(): WriterCommitMessage =
        GraftRowsCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

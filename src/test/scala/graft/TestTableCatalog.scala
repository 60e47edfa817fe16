package graft

import java.util

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal in-memory DataSource-V2 `TableCatalog` — TEST SCOPE ONLY — so
  * the engine's catalog-table IO (`sources.IcebergTableIO`, written
  * against only generic DSv2 APIs) can be EXECUTED end to end in this
  * sandbox, which ships no Iceberg runtime (VERDICT r3 next #6). Rows
  * live in a JVM-static store: valid under local[*] (executors share the
  * driver JVM) — exactly the test topology. Register with
  * `spark.sql.catalog.<name> = graft.TestTableCatalog`. */
object TestTableCatalog {
  /** fq-key → (schema, partitioning, committed rows). */
  val store = TrieMap[String, (StructType, Array[Transform], ArrayBuffer[InternalRow])]()
  def clear(): Unit = store.clear()
}

class TestTableCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (catalogName +: ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    TestTableCatalog.store.keys.toArray.flatMap { k =>
      val parts = k.split("\\.")
      if (parts.head == catalogName &&
          parts.slice(1, parts.length - 1).sameElements(namespace))
        Some(Identifier.of(parts.slice(1, parts.length - 1), parts.last))
      else None
    }

  override def loadTable(ident: Identifier): Table =
    TestTableCatalog.store.get(key(ident))
      .map { case (schema, parts, _) => new MemTable(key(ident), schema, parts) }
      .getOrElse(throw new NoSuchTableException(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (TestTableCatalog.store.contains(key(ident)))
      throw new TableAlreadyExistsException(ident)
    TestTableCatalog.store.put(key(ident), (schema, partitions, ArrayBuffer.empty))
    new MemTable(key(ident), schema, partitions)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    loadTable(ident)

  override def dropTable(ident: Identifier): Boolean =
    TestTableCatalog.store.remove(key(ident)).isDefined

  override def renameTable(from: Identifier, to: Identifier): Unit =
    TestTableCatalog.store.remove(key(from))
      .foreach(v => TestTableCatalog.store.put(key(to), v))
}

final class MemTable(key: String, schema0: StructType,
    partitions: Array[Transform]) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = key
  override def schema(): StructType = schema0
  override def partitioning(): Array[Transform] = partitions
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema0
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(new InputPartition {})
      override def createReaderFactory(): PartitionReaderFactory =
        new MemReaderFactory(key)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key)
}

final class MemReaderFactory(key: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = TestTableCatalog.store(key)._3.toArray
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

final class MemWriteBuilder(key: String) extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new MemWriterFactory
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val buf = TestTableCatalog.store(key)._3
        buf.synchronized {
          if (truncateFirst) buf.clear()
          messages.foreach { case m: RowsMessage => buf ++= m.rows }
        }
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

final case class RowsMessage(rows: Array[InternalRow]) extends WriterCommitMessage

final class MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer[InternalRow]()
      override def write(row: InternalRow): Unit = buf += row.copy()
      override def commit(): WriterCommitMessage = RowsMessage(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** [[TestTableCatalog]] variant that mimics Iceberg's FRESH-catalog
  * behavior: listing a namespace no write has created yet throws
  * `NoSuchNamespaceException` (the `TableCatalog.listTables` contract)
  * instead of returning an empty listing. */
final class FreshNamespaceCatalog extends TestTableCatalog {
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val r = super.listTables(namespace)
    if (r.isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    r
  }
}

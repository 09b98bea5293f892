package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 **sink** demonstrating the transactional batch
  * commit protocol the reference's row-loop INSERTs lack (SURVEY §2.2,
  * load_data:32-36): every task writes to a private staged file, the
  * driver's `commit` atomically publishes exactly the files named in the
  * task commit messages (plus a `_MANIFEST` listing them), and `abort`
  * removes all staging — a failed or speculated task can never leave
  * partial rows visible. This is the K3/K5 exactly-once story expressed
  * through the engine API (`WriteBuilder → BatchWrite → DataWriter`)
  * rather than through idempotent re-runs.
  *
  * Rows serialize as TAB-separated text (a demo of the protocol, not a
  * format — a production sink swaps the serializer, not the protocol).
  */
class AtomicSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-atomic"
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: schema comes from the dataframe being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AtomicSinkTable(schema, properties.get("path"))
}

private[sources] class AtomicSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "graft-atomic requires option(\"path\", ...)")
  override def name(): String = s"graft_atomic($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateRequested = false
      override def truncate(): WriteBuilder = { truncateRequested = true; this }
      override def build(): Write = {
        val t = truncateRequested
        new Write {
          override def toBatch: BatchWrite = new AtomicBatchWrite(path, info.schema(), t)
        }
      }
    }
}

private[sources] case class StagedFile(name: String, rows: Long) extends WriterCommitMessage

private[sources] class AtomicBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  private val staging = new File(path, "_staging")
  private val manifest = Paths.get(path, "_MANIFEST")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    staging.mkdirs()
    AtomicWriterFactory(path, schema)
  }

  /** Publish exactly the files the committed tasks named: rename each out
    * of staging (atomic within a filesystem), then swap in the manifest
    * LAST via temp-file + ATOMIC_MOVE — readers treat the manifest as the
    * commit record, so a crash at any point before the swap leaves the
    * previous table version intact from their point of view. Append mode
    * merges the new files into the prior manifest; truncate (overwrite)
    * mode publishes a manifest naming only the new files, then removes
    * the now-orphaned prior files. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case StagedFile(name, _) => name }
    files.foreach { f =>
      Files.move(Paths.get(staging.getPath, f), Paths.get(path, f),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val prior: Seq[String] =
      if (Files.exists(manifest))
        new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
      else Seq.empty
    val published = if (truncate) files.toSeq else (prior ++ files).distinct
    val tmp = Files.createTempFile(staging.toPath, "_MANIFEST", ".tmp")
    Files.write(tmp, published.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    if (truncate)
      prior.filterNot(files.contains).foreach(f => new File(path, f).delete())
    deleteRec(staging)
  }

  /** A failed task (or job) leaves only staged private files — remove
    * them; nothing was ever visible. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteRec(staging)

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }
}

private[sources] case class AtomicWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // task-attempt-private name: concurrent attempts can never collide
      private val fileName = s"part-$partitionId-$taskId.tsv"
      private val file = new File(new File(path, "_staging"), fileName)
      private val out = new java.io.BufferedWriter(new java.io.FileWriter(file))
      private var rows = 0L

      override def write(row: InternalRow): Unit = {
        val cells = schema.fields.indices.map { i =>
          if (row.isNullAt(i)) ""
          // toString covers primitives + UTF8String; timestamps render as
          // raw micros — serializer detail, irrelevant to the protocol
          else String.valueOf(row.get(i, schema.fields(i).dataType))
        }
        out.write(cells.mkString("\t")); out.newLine()
        rows += 1
      }
      override def commit(): WriterCommitMessage = { out.close(); StagedFile(fileName, rows) }
      override def abort(): Unit = { out.close(); file.delete(); () }
      override def close(): Unit = ()
    }
}

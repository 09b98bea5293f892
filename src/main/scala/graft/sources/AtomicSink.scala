package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
  * Durability rules (multi-job safety):
  *   - staged dirs and published file names embed the job's `queryId`, so
  *     task ids restarting at 0 in a later application can never collide
  *     with an earlier commit, and concurrent jobs never share staging;
  *   - publish refuses to replace an existing destination file (a name
  *     collision means a protocol violation, not something to paper over);
  *   - the manifest read-modify-write is serialized by an O_EXCL lock
  *     file, so two concurrent appends cannot drop each other's files
  *     (lost update);
  *   - truncate (overwrite) publishes a manifest naming only the new
  *     files and leaves the orphaned prior files on disk — readers of the
  *     old snapshot finish their scan; [[AtomicSink.vacuum]] is the
  *     separate physical-cleanup step;
  *   - every commit also retains its file list as `_MANIFEST.v<n>`, so
  *     any prior table version stays readable (`option("version", n)`)
  *     until [[AtomicSink.expireVersions]] retires it — vacuum never
  *     collects a file a retained version still references.
  *
  * Rows serialize as TAB-separated text (a demo of the protocol, not a
  * format — a production sink swaps the serializer, not the protocol).
  *
  * I/O layer scope: file operations are java.nio (local disk / POSIX
  * shared FS). A cluster deployment swaps them for the Hadoop
  * FileSystem equivalents — `create(path, overwrite = false)` preserves
  * the O_EXCL publish/lock semantics on HDFS verbatim; object stores
  * get the same protocol from conditional PUTs (the manifest IS the
  * commit point, so no atomic rename is ever required — unlike the
  * path-swap sinks, which is why COVERAGE.md routes object-store
  * deployments here).
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

object AtomicSink {
  private[sources] def readManifest(p: java.nio.file.Path): Seq[String] =
    if (Files.exists(p))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
    else Seq.empty

  /** Version numbers with a retained snapshot manifest, ascending. */
  def versions(path: String): Seq[Long] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .flatMap(f => Option(f.getName)
        .filter(_.startsWith("_MANIFEST.v")).map(_.drop(11).toLong))
      .toSeq.sorted

  /** Physical cleanup, deliberately separate from commit: delete data
    * files no longer named by the CURRENT manifest or any RETAINED
    * version snapshot — time travel to a retained version stays valid
    * across vacuums; [[expireVersions]] is what releases old snapshots'
    * exclusive files for collection. Run it only when no reader can
    * still hold an expired snapshot. Returns the number removed. */
  def vacuum(path: String): Int = {
    val live: Set[String] =
      (readManifest(Paths.get(path, "_MANIFEST")) ++
        versions(path).flatMap(v =>
          readManifest(Paths.get(path, s"_MANIFEST.v$v")))).toSet
    val orphans = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !live(f.getName))
    orphans.foreach(_.delete())
    orphans.length
  }

  /** Drop all but the newest `keepLast` version snapshots. Expired
    * versions are no longer time-travel targets, and a following
    * [[vacuum]] collects any files only they referenced. Returns the
    * versions expired. */
  def expireVersions(path: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must retain at least the current version")
    val expired = versions(path).dropRight(keepLast)
    expired.foreach(v => Files.deleteIfExists(Paths.get(path, s"_MANIFEST.v$v")))
    expired
  }
}

private[sources] class AtomicSinkTable(writeSchema: StructType, path: String)
    extends Table with SupportsWrite with SupportsRead {
  require(path != null, "graft-atomic requires option(\"path\", ...)")
  override def name(): String = s"graft_atomic($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ)

  /** Read side of the commit protocol: the file list is captured from
    * the manifest exactly once, when the batch is planned — a scan sees
    * one committed snapshot even if appends, overwrites or vacuums land
    * mid-query. Files on disk but not in the manifest (uncommitted
    * staging, truncate orphans awaiting vacuum) are invisible. Requires
    * the caller's schema (`spark.read.schema(...)`), like any
    * schema-on-read text format. Time travel: `option("version", n)`
    * plans the scan against the retained `_MANIFEST.v<n>` snapshot
    * (every commit writes one; [[AtomicSink.expireVersions]] retires
    * them) instead of the current table state. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      private val version = Option(options.get("version")).map(_.toLong)
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = writeSchema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            val manifest = version match {
              case Some(v) =>
                val m = Paths.get(path, s"_MANIFEST.v$v")
                require(Files.exists(m),
                  s"graft-atomic: version $v of $path does not exist or was expired " +
                    s"(retained: ${AtomicSink.versions(path).mkString(",")})")
                m
              case None => Paths.get(path, "_MANIFEST")
            }
            AtomicSink.readManifest(manifest)
              .map(f => AtomicFilePartition(new File(path, f).getPath)).toArray
          }
          override def createReaderFactory(): PartitionReaderFactory =
            AtomicReaderFactory(writeSchema)
        }
      }
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var truncateRequested = false
      override def truncate(): WriteBuilder = { truncateRequested = true; this }
      override def build(): Write = {
        val t = truncateRequested
        new Write {
          override def toBatch: BatchWrite =
            new AtomicBatchWrite(path, info.schema(), t, info.queryId())
        }
      }
    }
}

private[sources] case class StagedFile(name: String, rows: Long) extends WriterCommitMessage

private[sources] case class AtomicFilePartition(file: String) extends InputPartition

/** Deserializes the writer's TAB-separated lines back to InternalRows —
  * the inverse of AtomicWriterFactory's String.valueOf serializer (empty
  * cell = null; timestamps are raw micros). */
private[sources] case class AtomicReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(
        Paths.get(p.asInstanceOf[AtomicFilePartition].file),
        StandardCharsets.UTF_8).iterator()
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        // -1 limit keeps trailing empty cells (null last column)
        val cells = lines.next().split("\t", -1)
        val vals = schema.fields.zipWithIndex.map { case (f, i) =>
          val c = if (i < cells.length) cells(i) else ""
          if (c.isEmpty) null
          else f.dataType match {
            case LongType | TimestampType => java.lang.Long.valueOf(c)
            case IntegerType | DateType => java.lang.Integer.valueOf(c)
            case DoubleType => java.lang.Double.valueOf(c)
            case FloatType => java.lang.Float.valueOf(c)
            case BooleanType => java.lang.Boolean.valueOf(c)
            case dt: DecimalType =>
              org.apache.spark.sql.types.Decimal(BigDecimal(c), dt.precision, dt.scale)
            case StringType => UTF8String.fromString(c)
            case other => throw new UnsupportedOperationException(
              s"graft-atomic read: unsupported type $other")
          }
        }
        current = InternalRow.fromSeq(vals.toIndexedSeq)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}

private[sources] class AtomicBatchWrite(path: String, schema: StructType,
    truncate: Boolean, queryId: String) extends BatchWrite {
  // per-job staging: concurrent jobs never see (or delete) each other's
  // staged files
  private val staging = new File(path, s"_staging-$queryId")
  private val manifest = Paths.get(path, "_MANIFEST")
  private val lock = Paths.get(path, "_COMMIT_LOCK")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    staging.mkdirs()
    AtomicWriterFactory(path, schema, queryId)
  }

  /** Publish exactly the files the committed tasks named: rename each out
    * of staging (atomic within a filesystem, and refusing to replace an
    * existing destination), then swap in the manifest LAST via temp-file +
    * ATOMIC_MOVE — readers treat the manifest as the commit record, so a
    * crash at any point before the swap leaves the previous table version
    * intact from their point of view. The manifest merge runs under an
    * O_EXCL lock file so concurrent append commits serialize instead of
    * losing each other's updates. Truncate (overwrite) mode publishes a
    * manifest naming only the new files; the orphaned prior files stay on
    * disk for in-flight readers until [[AtomicSink.vacuum]]. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case StagedFile(name, _) => name }
    files.foreach { f =>
      val dest = Paths.get(path, f)
      if (Files.exists(dest))
        throw new FileAlreadyExistsException(
          s"$dest: staged name collides with a committed file — refusing to replace")
      Files.move(Paths.get(staging.getPath, f), dest, StandardCopyOption.ATOMIC_MOVE)
    }
    withCommitLock {
      val prior = AtomicSink.readManifest(manifest)
      val published = if (truncate) files.toSeq else (prior ++ files).distinct
      val body = published.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8)
      // retained snapshot first (the time-travel target), then swap the
      // current pointer — a crash between the two leaves an extra
      // version file and an older current state, never a torn manifest
      val nextV = AtomicSink.versions(path).lastOption.getOrElse(0L) + 1
      val vTmp = Files.createTempFile(staging.toPath, "_MANIFEST.v", ".tmp")
      Files.write(vTmp, body)
      Files.move(vTmp, Paths.get(path, s"_MANIFEST.v$nextV"),
        StandardCopyOption.ATOMIC_MOVE)
      val tmp = Files.createTempFile(staging.toPath, "_MANIFEST", ".tmp")
      Files.write(tmp, body)
      Files.move(tmp, manifest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    deleteRec(staging)
  }

  /** Serialize manifest updates across concurrent committers:
    * `Files.createFile` is O_EXCL-atomic, so exactly one committer holds
    * the lock; others spin briefly. A crashed holder is detected by lock
    * age and the lock broken (bounded staleness beats a wedged table). */
  private def withCommitLock[A](body: => A): A = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var held = false
    while (!held) {
      try { Files.createFile(lock); held = true }
      catch { case _: FileAlreadyExistsException =>
        try {
          val age = System.currentTimeMillis() -
            Files.getLastModifiedTime(lock).toMillis
          if (age > 60000) Files.deleteIfExists(lock)
        } catch { case _: java.io.IOException => () }
        if (System.nanoTime() > deadline)
          throw new IllegalStateException(s"timed out waiting for $lock")
        Thread.sleep(20)
      }
    }
    try body finally Files.deleteIfExists(lock)
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

private[sources] case class AtomicWriterFactory(path: String, schema: StructType,
    queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // job-and-task-attempt-private name: unique across concurrent
      // attempts AND across applications (task ids restart per context,
      // the query id never repeats)
      private val fileName = s"part-$partitionId-$taskId-$queryId.tsv"
      private val file = new File(new File(path, s"_staging-$queryId"), fileName)
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

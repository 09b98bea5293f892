package graft.sources

import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, LocalFileSystem, Options, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

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
  *   - the manifest read-modify-write is serialized by an exclusive-create
  *     lock file, so two concurrent appends cannot drop each other's files
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
  * I/O layer (r13): all file operations ride the Hadoop FileSystem API —
  * the driver captures the session Hadoop conf once and ships it to
  * executors via SerializableConfiguration, so the sink works on local
  * disk and HDFS alike. The exclusive lock create is kernel O_EXCL on
  * the local FS (java.nio fast path) and `create(path, overwrite=false)`
  * elsewhere (atomic-exclusive on HDFS); the manifest pointer swap uses
  * FileContext's Rename.OVERWRITE (atomic on HDFS and POSIX). Object
  * stores have no atomic rename, but the manifest IS the commit point —
  * swap the two rename sites for conditional PUTs and the protocol
  * carries over.
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

  /** Driver-side Hadoop conf (the session's, so fs.* settings apply). */
  private[sources] def driverConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  private[sources] def fsFor(path: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(path)
    // unwrap ChecksumFileSystem (the local FS wrapper): its client-side
    // .crc side files would pollute the table directory — data files,
    // orphan accounting, and the manifest all assume exactly the files
    // the protocol wrote. HDFS checksums internally, no wrapper there.
    val fs = p.getFileSystem(conf) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }
    (fs, fs.makeQualified(p))
  }

  private[sources] def readManifest(fs: FileSystem, p: Path): Seq[String] =
    if (fs.exists(p)) {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
      } finally in.close()
    } else Seq.empty

  private def listNames(fs: FileSystem, root: Path): Seq[(String, Boolean)] =
    if (fs.exists(root))
      fs.listStatus(root).toSeq.map(s => (s.getPath.getName, s.isFile))
    else Seq.empty

  /** Version numbers with a retained snapshot manifest, ascending. */
  def versions(path: String): Seq[Long] = {
    val (fs, root) = fsFor(path, driverConf())
    listNames(fs, root).map(_._1)
      .filter(_.startsWith("_MANIFEST.v")).map(_.drop(11).toLong).sorted
  }

  /** Physical cleanup, deliberately separate from commit: delete data
    * files no longer named by the CURRENT manifest or any RETAINED
    * version snapshot — time travel to a retained version stays valid
    * across vacuums; [[expireVersions]] is what releases old snapshots'
    * exclusive files for collection. Run it only when no reader can
    * still hold an expired snapshot. Returns the number removed. */
  def vacuum(path: String): Int = {
    val (fs, root) = fsFor(path, driverConf())
    val live: Set[String] =
      (readManifest(fs, new Path(root, "_MANIFEST")) ++
        versions(path).flatMap(v =>
          readManifest(fs, new Path(root, s"_MANIFEST.v$v")))).toSet
    val orphans = listNames(fs, root)
      .filter { case (n, isFile) => isFile && !n.startsWith("_") && !live(n) }
    orphans.foreach { case (n, _) => fs.delete(new Path(root, n), false) }
    orphans.length
  }

  /** Drop all but the newest `keepLast` version snapshots. Expired
    * versions are no longer time-travel targets, and a following
    * [[vacuum]] collects any files only they referenced. Returns the
    * versions expired. */
  def expireVersions(path: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must retain at least the current version")
    val (fs, root) = fsFor(path, driverConf())
    val expired = versions(path).dropRight(keepLast)
    expired.foreach(v => fs.delete(new Path(root, s"_MANIFEST.v$v"), false))
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
          private val conf = new SerializableConfiguration(AtomicSink.driverConf())
          override def planInputPartitions(): Array[InputPartition] = {
            val (fs, root) = AtomicSink.fsFor(path, conf.value)
            val manifest = version match {
              case Some(v) =>
                val m = new Path(root, s"_MANIFEST.v$v")
                require(fs.exists(m),
                  s"graft-atomic: version $v of $path does not exist or was expired " +
                    s"(retained: ${AtomicSink.versions(path).mkString(",")})")
                m
              case None => new Path(root, "_MANIFEST")
            }
            AtomicSink.readManifest(fs, manifest)
              .map(f => AtomicFilePartition(new Path(root, f).toString)).toArray
          }
          override def createReaderFactory(): PartitionReaderFactory =
            AtomicReaderFactory(writeSchema, conf)
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
private[sources] case class AtomicReaderFactory(schema: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val lines = {
        val fp = new Path(p.asInstanceOf[AtomicFilePartition].file)
        val fs = AtomicSink.fsFor(fp.toString, conf.value)._1
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(fp), StandardCharsets.UTF_8))
        try Iterator.continually(in.readLine()).takeWhile(_ != null).toVector.iterator
        finally in.close()
      }
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
  private val conf = new SerializableConfiguration(AtomicSink.driverConf())
  private def fsRoot(): (FileSystem, Path) = AtomicSink.fsFor(path, conf.value)
  // per-job staging: concurrent jobs never see (or delete) each other's
  // staged files
  private def stagingOf(root: Path): Path = new Path(root, s"_staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val (fs, root) = fsRoot()
    fs.mkdirs(stagingOf(root))
    AtomicWriterFactory(root.toString, schema, queryId, conf)
  }

  /** Publish exactly the files the committed tasks named: rename each out
    * of staging (atomic within a filesystem, and refusing to replace an
    * existing destination), then swap in the manifest LAST via temp-file +
    * atomic overwrite rename — readers treat the manifest as the commit
    * record, so a crash at any point before the swap leaves the previous
    * table version intact from their point of view. The manifest merge
    * runs under an exclusive-create lock file so concurrent append
    * commits serialize instead of losing each other's updates. Truncate
    * (overwrite) mode publishes a manifest naming only the new files; the
    * orphaned prior files stay on disk for in-flight readers until
    * [[AtomicSink.vacuum]]. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, root) = fsRoot()
    val staging = stagingOf(root)
    val manifest = new Path(root, "_MANIFEST")
    val files = messages.collect { case StagedFile(name, _) => name }
    files.foreach { f =>
      val dest = new Path(root, f)
      if (fs.exists(dest))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"$dest: staged name collides with a committed file — refusing to replace")
      require(fs.rename(new Path(staging, f), dest), s"rename to $dest failed")
    }
    withCommitLock(fs, root) { assertOwned =>
      def writeStaged(name: String, body: Array[Byte]): Path = {
        val tmp = new Path(staging, name)
        val out = fs.create(tmp, true)
        try out.write(body) finally out.close()
        tmp
      }
      val prior = AtomicSink.readManifest(fs, manifest)
      val published = if (truncate) files.toSeq else (prior ++ files).distinct
      val body = published.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8)
      // retained snapshot first (the time-travel target), then swap the
      // current pointer — a crash between the two leaves an extra
      // version file and an older current state, never a torn manifest
      val nextV = AtomicSink.versions(path).lastOption.getOrElse(0L) + 1
      require(fs.rename(writeStaged("_MANIFEST.v.tmp", body),
        new Path(root, s"_MANIFEST.v$nextV")), "version snapshot rename failed")
      // current-pointer swap must REPLACE atomically: FileContext rename
      // with Options.Rename.OVERWRITE (atomic on HDFS and POSIX; plain
      // FileSystem.rename refuses existing destinations). Fence first:
      // if this committer's lock was age-broken mid-merge, throw here —
      // before the irreversible swap — so the interleaved read-modify-
      // write can't silently drop the other committer's files.
      val fc = FileContext.getFileContext(root.toUri, conf.value)
      val staged = writeStaged("_MANIFEST.tmp", body)
      assertOwned()
      fc.rename(staged, manifest, Options.Rename.OVERWRITE)
    }
    fs.delete(staging, true); ()
  }

  /** Serialize manifest updates across concurrent committers: the lock
    * create is exclusive (kernel O_EXCL via java.nio on the local FS;
    * `create(path, overwrite = false)` elsewhere — atomic-exclusive on
    * HDFS), so exactly one committer holds the lock; others spin
    * briefly. A crashed holder is detected by lock AGE and the lock
    * broken (bounded staleness beats a wedged table) — but breaking is
    * INCARNATION-CHECKED: each acquisition writes a unique token into
    * the lock, a waiter only breaks the exact incarnation it observed
    * aging (a fresh holder's lock is never deleted by a waiter that aged
    * the previous one), and `body` receives an `assertOwned` fence to
    * call immediately before its irreversible step — if the lock was
    * broken out from under a slow holder, the fence throws instead of
    * letting two manifest read-modify-writes interleave silently. */
  private def withCommitLock[A](fs: FileSystem, root: Path)(body: (() => Unit) => A): A = {
    val lock = new Path(root, "_COMMIT_LOCK")
    val token = java.util.UUID.randomUUID().toString
    def tryLock(): Boolean = {
      val created = fs match {
        // raw OR checksum-wrapped local: kernel O_EXCL — no
        // check-then-create window
        case _: LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
          try { java.nio.file.Files.createFile(
            java.nio.file.Paths.get(lock.toUri.getPath)); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        case _ =>
          try { fs.create(lock, false).close(); true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case e: java.io.IOException if e.getMessage != null &&
              e.getMessage.contains("exist") => false
          }
      }
      // stamp our incarnation; the create→write gap only ever shows an
      // EMPTY token, which no waiter can match twice against a non-empty
      // read, so it cannot be broken before the stamp lands
      if (created) {
        val out = fs.create(lock, true)
        try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
      created
    }
    def readToken(): Option[String] =
      try {
        val in = fs.open(lock)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](256)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          Some(buf.toString("UTF-8"))
        } finally in.close()
      } catch { case _: java.io.IOException => None }
    def assertOwned(): Unit = require(readToken().contains(token),
      s"commit fence: $lock no longer holds this committer's token — " +
        "lock was broken (holder exceeded the staleness bound); aborting " +
        "before the manifest pointer swap to avoid a lost update")
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var agedIncarnation: Option[String] = None // token we observed as stale
    var held = false
    while (!held) {
      if (tryLock()) held = true
      else {
        try {
          val age = System.currentTimeMillis() -
            fs.getFileStatus(lock).getModificationTime
          val observed = readToken()
          if (age > 60000 && observed.isDefined) {
            // break ONLY the incarnation we already saw aging — two reads
            // of the same token spanning consecutive polls; a new holder's
            // fresh token (or fresh mtime during its create→stamp gap)
            // never matches an aged observation
            if (agedIncarnation == observed) { fs.delete(lock, false); () }
            else agedIncarnation = observed
          } else agedIncarnation = None
        } catch { case _: java.io.IOException => () }
        if (System.nanoTime() > deadline)
          throw new IllegalStateException(s"timed out waiting for $lock")
        Thread.sleep(20)
      }
    }
    try body(() => assertOwned())
    finally { if (readToken().contains(token)) { fs.delete(lock, false); () } }
  }

  /** A failed task (or job) leaves only staged private files — remove
    * them; nothing was ever visible. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, root) = fsRoot()
    fs.delete(stagingOf(root), true); ()
  }
}

private[sources] case class AtomicWriterFactory(root: String, schema: StructType,
    queryId: String, conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // job-and-task-attempt-private name: unique across concurrent
      // attempts AND across applications (task ids restart per context,
      // the query id never repeats)
      private val fileName = s"part-$partitionId-$taskId-$queryId.tsv"
      private val file = new Path(new Path(root, s"_staging-$queryId"), fileName)
      private val fs = AtomicSink.fsFor(root, conf.value)._1
      // explicit UTF-8 (the old FileWriter used the platform charset —
      // a non-UTF-8 default JVM would have corrupted non-ASCII strings
      // against the reader's UTF-8 decode)
      private val out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(file, true), StandardCharsets.UTF_8))
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
      override def abort(): Unit = { out.close(); fs.delete(file, false); () }
      override def close(): Unit = ()
    }
}

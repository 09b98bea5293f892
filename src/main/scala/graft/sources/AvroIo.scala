package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container read/write on avro-core alone (the Spark avro
  * DATASOURCE module doesn't ship in this distribution; the Avro runtime
  * jars do) — same JDK-only-closure discipline as the Xlsx/Pdf sources.
  *
  * Both directions are DISTRIBUTED and cluster-correct:
  *  - write: one container file per input partition, streamed through the
  *    Hadoop FileSystem API (works on HDFS/object stores, not just local
  *    disk), deflate-compressed, schema embedded per Avro spec;
  *  - read: one input split per container file fanned over the cluster,
  *    each task streaming its file through `DataFileStream` (the
  *    container framing makes files self-describing and splittable at
  *    block granularity; per-file tasks are the right granularity for the
  *    many-medium-files layout the write side produces).
  *
  * Type bridge covers the engine's scalar core (long, double, string,
  * boolean — each as a nullable union per Avro convention). Timestamps
  * travel as epoch micros (logicalType timestamp-micros annotation on a
  * long), converted at the Spark boundary by the caller.
  */
object AvroIo {

  /** Avro record schema for a Spark StructType (nullable unions). */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    def leaf(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case other => throw new IllegalArgumentException(
        s"AvroIo type bridge does not cover $other")
    }
    val fields = st.fields.map { f =>
      val u = Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), leaf(f.dataType)).asJava)
      new Schema.Field(f.name, u, null, null)
    }
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (overwrite semantics). Empty partitions write no file. Returns the
    * number of files written.
    *
    * Staged commit: tasks write into a `dir__staging` directory and the
    * previous contents are swapped out only after the whole job
    * succeeds — a mid-job failure leaves the old table intact (before
    * this, the destination was deleted up front and a failed write lost
    * it permanently). */
  def write(df: DataFrame, dir: String): Long = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString // Schema is not serializable pre-1.9-style; ship JSON
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    val fs = FileSystem.get(new java.net.URI(dir), conf.value)
    val base = new Path(dir)
    val staging = new Path(dir + "__staging")
    val bak = new Path(dir + "__old")
    // Torn-swap recovery (same contract as Warehouse.compact and the
    // streaming merge sink): a crash between rename(base->bak) and
    // rename(staging->base) leaves the table's only copy at bak —
    // restore it before anything destructive. bak is garbage only when
    // base exists (a completed prior swap's leftover).
    if (!fs.exists(base) && fs.exists(bak))
      require(fs.rename(bak, base), s"AvroIo.write: recovery rename $bak -> $base failed")
    if (fs.exists(staging)) fs.delete(staging, true)
    fs.mkdirs(staging)
    val written = df.sparkSession.sparkContext.longAccumulator("avro_files")
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val schema = new Schema.Parser().parse(schemaJson)
        val path = new Path(f"${dir}__staging/part-$pid%05d.avro")
        val pfs = FileSystem.get(path.toUri, conf.value)
        val out = pfs.create(path, true)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        w.create(schema, out)
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < r.length) {
            rec.put(i, if (r.isNullAt(i)) null else r.get(i))
            i += 1
          }
          w.append(rec)
        } finally w.close()
        written.add(1L)
      }
    }
    // job succeeded: swap staging into place through a backup rename
    // (rename is atomic per path on HDFS/local). A crash anywhere in
    // the swap leaves the old table recoverable at bak, and the
    // recovery preamble above restores it on the next call — the old
    // delete-then-rename left a window where the table existed nowhere.
    // FileSystem.rename reports most failures by returning false, not
    // throwing — fail loudly instead.
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(base))
      require(fs.rename(base, bak), s"AvroIo.write: rename $base -> $bak failed")
    require(fs.rename(staging, base),
      s"AvroIo.write: rename $staging -> $base failed (previous data preserved at $bak)")
    if (fs.exists(base) && fs.exists(bak)) fs.delete(bak, true)
    written.value
  }

  /** Read every container file under `dir` into a DataFrame with schema
    * `st` — one task per file, each streaming through DataFileStream. */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val fs = FileSystem.get(new java.net.URI(dir), conf.value)
    val files = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted.toSeq
    val names = st.fieldNames
    val rdd = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { file =>
        val pfs = FileSystem.get(new java.net.URI(file), conf.value)
        val in = pfs.open(new Path(file))
        val reader = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        // stream, don't buffer: task memory must not scale with the
        // largest container file. DataFileStream reuses its record, so
        // each Row is materialized from the live record before next().
        // Early-exit paths (limit/take stop pulling mid-partition, and
        // exceptions skip the drain entirely) mean exhaustion-close alone
        // leaks the handle — the task-completion listener is the
        // guaranteed close; the on-exhaustion close is just early release.
        val it = new Iterator[Row] {
          @volatile var closed = false
          def hasNext: Boolean = {
            if (closed) false
            else if (reader.hasNext) true
            else { reader.close(); closed = true; false }
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(names.toIndexedSeq.map { n =>
              rec.get(n) match {
                case u: org.apache.avro.util.Utf8 => u.toString
                case v => v
              }
            })
          }
        }
        Option(org.apache.spark.TaskContext.get()).foreach {
          _.addTaskCompletionListener[Unit] { _ =>
            if (!it.closed) { it.closed = true; reader.close() }
          }
        }
        it
      }
    spark.createDataFrame(rdd, st)
  }
}

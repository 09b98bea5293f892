package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pattern (SURVEY.md §7.1 item 8): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs batchwise over partitions so a real codec
  * (pdfbox/javacv/etc.) can amortize per-batch setup. The decode step here
  * is a clearly-marked deterministic STUB — the container ships no media
  * codecs — but the Spark-side plumbing (schema, partition batching, typed
  * row shapes, metadata projection) is the real production shape.
  *
  * Scale: per-partition map, no shuffle; binary payloads stay columnar in
  * parquet and are never collected. Generalizes U1/U3's binaryFile+parser
  * pattern (transform_data_pdf:14-33).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])
  final case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                                 width: Int, height: Int, n_frames: Int, sha: String)

  /** STUB decoder — stands in for a codec call. Deterministic features
    * derived from the payload bytes so results are oracle-checkable;
    * replace the body with pdfbox/ffmpeg bindings in production. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.content.length.toLong
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(r.content).map("%02x".format(_)).mkString
    MediaFeatures(r.doc_id, r.mime, n,
      width = (n % 640 + 32).toInt, height = (n * 7 % 480 + 32).toInt,
      n_frames = (n % 30 + 1).toInt, sha = sha)
  }

  /** Attach a mime column and pack the payload as binary. */
  def asMedia(df: DataFrame, id: String, payload: String): Dataset[MediaRow] = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(id).cast("long").as("doc_id"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col(id) % 3 + 1).cast("int")).as("mime"),
        encode(col(payload), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Batchwise feature extraction: mapPartitions so decoder setup happens
    * once per partition, mirroring a mapInPandas/Arrow-batch profile. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts, models)
      it.map(decodeStub)
    }
  }

  final case class MediaResized(doc_id: Long, mime: String, n_bytes_in: Long,
                                n_bytes_out: Long, src_w: Int, src_h: Int,
                                dst_w: Int, dst_h: Int,
                                scale_x: Double, scale_y: Double,
                                content: Array[Byte])

  /** STUB resize — 2:1 byte decimation stands in for pixel resampling
    * (a codec swaps the body); the metadata arithmetic (src dims from
    * decode, scale factors at 6dp HALF_UP) and the batchwise shape are
    * the production plumbing. */
  def resizeStub(r: MediaRow, dstW: Int, dstH: Int): MediaResized = {
    val f = decodeStub(r)
    val out = Array.tabulate((r.content.length + 1) / 2)(i => r.content(2 * i))
    def scale(dst: Int, src: Int): Double =
      BigDecimal(dst.toDouble / src).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    MediaResized(r.doc_id, r.mime, f.n_bytes, out.length.toLong, f.width, f.height,
      dstW, dstH, scale(dstW, f.width), scale(dstH, f.height), out)
  }

  /** Batchwise resize, same per-partition profile as [[extractFeatures]]. */
  def resize(media: Dataset[MediaRow], dstW: Int, dstH: Int): Dataset[MediaResized] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(it => it.map(resizeStub(_, dstW, dstH)))
  }

  /** One sampled frame of a media payload (video/audio frame-sample
    * pattern: one binary row explodes into per-frame rows carrying the
    * byte window a real codec would decode). */
  final case class FrameRow(doc_id: Long, frame_idx: Long, offset: Long,
                            frame_len: Long, first_byte: Int)

  /** Evenly-spaced frame sampling — generator-shaped flatMap over the
    * payload: n_frames windows of len/n_frames bytes each. The window
    * arithmetic is the real plumbing; a codec replaces the byte peek. */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[FrameRow] = {
    val s = media.sparkSession
    import s.implicits._
    media.flatMap { r =>
      val n = r.content.length.toLong
      val f = (n % 30 + 1).toInt
      val step = n / f
      (0 until f).map { i =>
        val off = i * step
        FrameRow(r.doc_id, i.toLong, off, step, r.content(off.toInt) & 0xff)
      }
    }
  }
}

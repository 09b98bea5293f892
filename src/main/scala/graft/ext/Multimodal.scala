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
    // pmod, not %: Spark's % keeps the dividend's sign, so a negative id
    // would index 0 (or count from the array's end) instead of 1..3
    df.select(col(id).cast("long").as("doc_id"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col(id), lit(3)) + 1).cast("int")).as("mime"),
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
      if (n == 0) Nil // empty payload: zero frames, not content(0) on []
      else {
        val f = (n % 30 + 1).toInt
        val step = n / f
        (0 until f).map { i =>
          val off = i * step
          FrameRow(r.doc_id, i.toLong, off, step, r.content(off.toInt) & 0xff)
        }
      }
    }
  }

  // ------------------------------------------------------- REAL PNG path

  /** REAL image decode — `javax.imageio` ships a PNG/JPEG/BMP/GIF codec
    * in the JDK itself, so the image half of the multimodal story needs
    * no external dependency after all (only video/audio codecs remain
    * environment-blocked). Exact integer channel sums instead of float
    * means keep the features bit-stable for the oracle. */
  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                                 sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic two-vertical-band PNG (left half c1, right half c2):
    * the generator for staged image fixtures. PNG is lossless, so the
    * decoded channel sums have closed forms an oracle recomputes. */
  def twoBandPng(w: Int, h: Int, c1: Int, c2: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(twoBandImage(w, h, c1, c2), "png", out)
    out.toByteArray
  }

  /** Decode a real image payload and reduce to exact features; decoder
    * init is per-call here because ImageIO is stateless — batchwise
    * callers still amortize the JVM-level codec registry via
    * mapPartitions. */
  def decodeImage(docId: Long, bytes: Array[Byte]): ImageFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $docId: payload is not a decodable image")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    ImageFeatures(docId, img.getWidth, img.getHeight, sr, sg, sb)
  }

  // ------------------------------------------------------- REAL WAV path

  /** REAL audio decode — WAV/PCM is a public RIFF container (fmt + data
    * chunks, little-endian samples) parseable with nothing but the JDK;
    * with the image path above, only VIDEO remains genuinely
    * environment-blocked. Exact integer sample sums keep the features
    * oracle-checkable. */
  final case class AudioFeatures(doc_id: Long, sample_rate: Int, n_channels: Int,
                                 bits: Int, n_samples: Long, sum_samples: Long)

  /** 16-bit PCM mono WAV bytes for the given samples (standard 44-byte
    * header) — the deterministic audio-fixture generator. */
  def pcmWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** RIFF chunk walk: locate fmt + data, reduce PCM16 samples to exact
    * count/sum. Throws on non-WAV or non-PCM16 payloads — a media
    * pipeline must fail loudly on codec mismatch, not emit zeros. */
  def decodeWav(docId: Long, bytes: Array[Byte]): AudioFeatures = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII") }
    require(tag() == "RIFF", s"doc $docId: not RIFF")
    b.getInt // riff size
    require(tag() == "WAVE", s"doc $docId: not WAVE")
    var rate, channels, bits = 0
    var nSamples = 0L
    var sum = 0L
    var seenData = false
    while (b.remaining() >= 8) {
      val t = tag(); val len = b.getInt
      t match {
        case "fmt " =>
          val fmt = b.getShort
          require(fmt == 1, s"doc $docId: not PCM (fmt=$fmt)")
          channels = b.getShort.toInt
          rate = b.getInt
          b.getInt; b.getShort // byte rate, block align
          bits = b.getShort.toInt
          require(bits == 16, s"doc $docId: only PCM16 supported (bits=$bits)")
          b.position(b.position() + (len - 16)) // any fmt extension
        case "data" =>
          seenData = true
          nSamples = len / 2L
          var i = 0L
          while (i < nSamples) { sum += b.getShort; i += 1 }
        case _ => b.position(b.position() + len) // skip LIST/INFO/etc.
      }
    }
    require(seenData, s"doc $docId: no data chunk")
    AudioFeatures(docId, rate, channels, bits, nSamples, sum)
  }

  // ------------------------------------------------- REAL AVI video path

  /** REAL video decode — AVI is a public RIFF container (Microsoft
    * "AVI RIFF File Reference") and the JDK ships a real JPEG codec in
    * javax.imageio, so Motion-JPEG-in-AVI closes the last "environment-
    * blocked" codec family with zero new dependencies: the container
    * walk reuses the WAV discipline above, each `00dc` chunk is a
    * complete JFIF image decoded by the JDK's codec. Uncompressed
    * bottom-up DIB frames (`00db`, BI_RGB) are supported beside MJPEG —
    * lossless, so channel sums have closed forms a DuckDB oracle can
    * recompute (JPEG's DCT round-trip is deterministic per JRE but not
    * relationally expressible; the MJPEG loop is pinned by ExtSpec
    * against the lossless path instead). */
  final case class VideoFeatures(doc_id: Long, width: Int, height: Int,
                                 n_frames: Int, sum_r: Long, sum_g: Long,
                                 sum_b: Long)

  /** Deterministic two-vertical-band frame (shared with [[twoBandPng]]'s
    * pixel rule): left half gray c1, right half gray c2. */
  def twoBandImage(w: Int, h: Int, c1: Int, c2: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = if (x < w / 2) c1 else c2
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    img
  }

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode frames as a minimal standards-conformant AVI: RIFF('AVI ')
    * with LIST hdrl (avih + strl/strh/strf), LIST movi of one chunk per
    * frame, and an idx1 index. `mjpeg=true` → `00dc` Motion-JPEG chunks
    * via the JDK JPEG encoder; `false` → `00db` uncompressed bottom-up
    * 24-bit BI_RGB DIB frames (rows padded to 4 bytes, BGR order). */
  def aviOf(frames: Seq[java.awt.image.BufferedImage], fps: Int,
            mjpeg: Boolean): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "all frames must share dimensions")
    def le(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def le2(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(i.toShort).array()
    def dib(img: java.awt.image.BufferedImage): Array[Byte] = {
      val stride = (w * 3 + 3) / 4 * 4
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, h - 1 - y) // bottom-up rows
          val o = y * stride + x * 3
          out(o) = (p & 0xff).toByte            // B
          out(o + 1) = ((p >> 8) & 0xff).toByte // G
          out(o + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "jpg", out),
        "JDK JPEG encoder unavailable")
      out.toByteArray
    }
    val payloads = frames.map(f => if (mjpeg) jpeg(f) else dib(f))
    val ckId = if (mjpeg) "00dc" else "00db"
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2
      val b = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      b.put(fourcc(id)).put(le(body.length)).put(body)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ body)
    val strh = fourcc("vids") ++ fourcc(if (mjpeg) "MJPG" else "DIB ") ++
      le(0) ++ le2(0) ++ le2(0) ++ le(0) ++ le(1) ++ le(fps) ++ le(0) ++
      le(frames.length) ++ le(payloads.map(_.length).max) ++ le(-1) ++ le(0) ++
      le2(0) ++ le2(0) ++ le2(w) ++ le2(h)
    val strf = le(40) ++ le(w) ++ le(h) ++ le2(1) ++ le2(24) ++
      (if (mjpeg) fourcc("MJPG") else le(0)) ++
      le(payloads.head.length) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val avih = le(1000000 / fps) ++ le(0) ++ le(0) ++ le(0x10) ++
      le(frames.length) ++ le(0) ++ le(1) ++ le(payloads.map(_.length).max) ++
      le(w) ++ le(h) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChunks = payloads.map(p => chunk(ckId, p))
    val movi = list("movi", moviChunks.flatten.toArray)
    // idx1 offsets are relative to the 'movi' fourcc position
    val offsets = moviChunks.scanLeft(4)((off, c) => off + c.length).init
    val idx1 = chunk("idx1", offsets.zip(payloads).flatMap { case (off, p) =>
      fourcc(ckId) ++ le(0x10) ++ le(off) ++ le(p.length)
    }.toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
    out.put(fourcc("RIFF")).put(le(body.length)).put(body)
    out.array()
  }

  /** RIFF walk + per-frame decode: `00dc` chunks through the JDK JPEG
    * codec, `00db` chunks through the explicit DIB layout; exact channel
    * sums across all frames. Fails loudly on a non-AVI payload or an
    * undecodable frame — codec mismatch must never emit zeros. */
  def decodeAvi(docId: Long, bytes: Array[Byte]): VideoFeatures = {
    val (w, h, n, _, sr, sg, sb) = walkAvi(docId, bytes, stride = 1)
    VideoFeatures(docId, w, h, n, sr, sg, sb)
  }

  /** Evenly-strided frame sampling over the real container — the
    * video-curation staple (decode every k-th frame, skip the rest
    * WITHOUT decoding them; for MJPEG the skip is a real saving, the
    * chunk walk just advances past the compressed payload). Counts all
    * frames, decodes/sums only indices ≡ 0 (mod stride). */
  final case class VideoSampleFeatures(doc_id: Long, n_frames: Int,
                                       n_sampled: Int, sum_r: Long)
  def sampleAviFrames(docId: Long, bytes: Array[Byte], stride: Int): VideoSampleFeatures = {
    val (_, _, n, sampled, sr, _, _) = walkAvi(docId, bytes, stride)
    VideoSampleFeatures(docId, n, sampled, sr)
  }

  private def walkAvi(docId: Long, bytes: Array[Byte],
                      stride: Int): (Int, Int, Int, Int, Long, Long, Long) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII") }
    require(tag() == "RIFF", s"doc $docId: not RIFF")
    b.getInt // riff size
    require(tag() == "AVI ", s"doc $docId: not AVI")
    var (w, h) = (0, 0)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var nFrames = 0
    var nSampled = 0
    def addImage(img: java.awt.image.BufferedImage): Unit = {
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
    }
    def walk(limit: Int): Unit =
      while (b.position() + 8 <= limit) {
        val t = tag(); val len = b.getInt
        val next = b.position() + len + (len % 2) // chunks are word-aligned
        t match {
          case "LIST" =>
            val kind = tag()
            if (kind == "hdrl" || kind == "movi") walk(b.position() + len - 4)
            else b.position(next)
          case "avih" =>
            b.getInt; b.getInt; b.getInt; b.getInt; b.getInt; b.getInt
            b.getInt; b.getInt
            w = b.getInt; h = b.getInt
            b.position(next)
          case "00dc" =>
            if (nFrames % stride == 0) {
              val payload = new Array[Byte](len); b.get(payload)
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(payload))
              require(img != null, s"doc $docId: undecodable MJPEG frame $nFrames")
              require(w == 0 || (img.getWidth == w && img.getHeight == h),
                s"doc $docId: frame $nFrames decoded ${img.getWidth}x${img.getHeight}, " +
                  s"header says ${w}x$h")
              addImage(img); nSampled += 1
            } // else: the compressed payload is never decoded — the point
            nFrames += 1
            b.position(next)
          case "00db" =>
            require(w > 0 && h > 0, s"doc $docId: DIB frame before avih header")
            val rowStride = (w * 3 + 3) / 4 * 4
            require(len >= rowStride * h, s"doc $docId: short DIB frame")
            if (nFrames % stride == 0) {
              val base = b.position()
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val o = base + (h - 1 - y) * rowStride + x * 3
                  sb += bytes(o) & 0xff
                  sg += bytes(o + 1) & 0xff
                  sr += bytes(o + 2) & 0xff
                  x += 1
                }
                y += 1
              }
              nSampled += 1
            }
            nFrames += 1
            b.position(next)
          case _ => b.position(next) // strh/strf/idx1/JUNK
        }
      }
    walk(bytes.length)
    require(nFrames > 0, s"doc $docId: no video frames")
    (w, h, nFrames, nSampled, sr, sg, sb)
  }

  /** REAL nearest-neighbor resize (explicit floor mapping dstX →
    * dstX*srcW/dstW so the resampling rule is engine-reproducible), PNG
    * re-encode. A two-band source with aligned halves resizes to a
    * two-band result — closed-form sums again. */
  def resizePng(bytes: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val dst = new java.awt.image.BufferedImage(dstW, dstH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dstH) {
      var x = 0
      while (x < dstW) {
        dst.setRGB(x, y, src.getRGB(x * src.getWidth / dstW, y * src.getHeight / dstH))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    out.toByteArray
  }
}

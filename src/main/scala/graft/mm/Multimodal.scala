package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): media payloads are opaque
  * `binary` columns with typed metadata structs. Image decode is REAL —
  * [[decodeImage]] parses container headers and [[decodePixels]] decodes
  * PNG/JPEG/GIF/BMP pixels via the JDK's own `javax.imageio` (r8; no
  * external codec needed) — and so is PCM audio: [[decodeAudio]] reads
  * WAV/AIFF/AU via `javax.sound.sampled` with real level features.
  * Only video and compressed audio stay stubbed ([[decodeStub]],
  * [[frameSample]]) — those codecs genuinely aren't in the container —
  * as deterministic fakes that preserve the real Spark shape (schema,
  * partition-parallel batch decode via mapPartitions, per-row error
  * channel). Swapping in a real decoder changes ONE function, none of
  * the plumbing.
  */
object Multimodal {

  /** Typed decode result — what a real image decoder would emit. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, sha: String,
      width: Int, height: Int, ok: Boolean, err: String)

  /** Attach the opaque payload column + cheap byte-level metadata
    * (no decode): the columnar, codegen'd part. */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("n_bytes", octet_length(col(textCol)).cast("long"))
      .withColumn("content_sha", sha2(col("payload"), 256))

  /** STUB decode: deterministic fake dimensions from payload bytes.
    * Real implementation would call an image codec here — per PARTITION
    * (one codec init per task, not per row), which is why this is
    * mapPartitions and not a per-row UDF.
    */
  def decodeStub(df: DataFrame): Dataset[MediaMeta] = {
    val enc = Encoders.product[MediaMeta]
    df.select(col("doc_id"), col("payload"), col("n_bytes"), col("content_sha"))
      .mapPartitions { rows =>
        // >>> real codec init would happen once HERE per partition <<<
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = r.getLong(2)
          val sha = r.getString(3)
          if (bytes == null || bytes.isEmpty)
            MediaMeta(id, 0L, sha, 0, 0, ok = false, err = "empty payload")
          else
            // deterministic fake decode: dimensions from byte stats
            MediaMeta(id, n, sha,
              (n % 320 + 32).toInt, (n % 240 + 32).toInt, ok = true, err = "")
        }
      }(enc)
  }

  /** Typed result of a REAL image-header decode. */
  final case class ImageMeta(
      doc_id: Long, n_bytes: Long, format: String,
      width: Int, height: Int, ok: Boolean, err: String)

  /** REAL image-header decode (no codec library needed): parses the
    * PNG IHDR, JPEG SOF marker, and GIF logical-screen descriptor for
    * pixel dimensions, straight off the binary payload. Same
    * mapPartitions shape as [[decodeStub]] — a pixel-level codec swap
    * changes only the per-row function, none of the plumbing. Malformed
    * or unknown payloads flow to the per-row error channel, never throw.
    */
  def decodeImage(df: DataFrame): Dataset[ImageMeta] = {
    val enc = Encoders.product[ImageMeta]
    df.select(col("doc_id"), col("payload"), col("n_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val n = r.getLong(2)
          imageDims(b) match {
            case Right((fmt, w, h)) => ImageMeta(id, n, fmt, w, h, ok = true, err = "")
            case Left(e) => ImageMeta(id, n, "", 0, 0, ok = false, err = e)
          }
        }
      }(enc)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** (format, width, height) from the container header, or an error. */
  private[mm] def imageDims(b: Array[Byte]): Either[String, (String, Int, Int)] = {
    if (b == null || b.length < 10) return Left("payload too short")
    // PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
    // width/height are the big-endian ints at offsets 16/20
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      return Right(("png", be32(b, 16), be32(b, 20)))
    // GIF87a/89a: logical screen descriptor, little-endian at 6/8
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return Right(("gif", le16(b, 6), le16(b, 8)))
    // JPEG: walk marker segments from SOI to the first SOF{0..15, not
    // DHT/DAC/RST} frame header: dimensions at +5 (height) / +7 (width)
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return Left(s"jpeg: bad marker sync at $i")
        val m = u8(b, i + 1)
        if (m == 0xff) { i += 1 } // fill byte
        else if (m >= 0xd0 && m <= 0xd9) { i += 2 } // RST/SOI/EOI: no payload
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= b.length) return Left("jpeg: truncated SOF")
          return Right(("jpeg", be16(b, i + 7), be16(b, i + 5)))
        } else i += 2 + be16(b, i + 2) // skip segment (length includes itself)
      }
      return Left("jpeg: no SOF marker")
    }
    Left("unknown container")
  }

  /** Typed result of a REAL pixel decode: row-major RGB888 bytes. */
  final case class DecodedImage(
      doc_id: Long, format: String, width: Int, height: Int,
      pixels: Array[Byte], ok: Boolean, err: String)

  /** REAL pixel decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP
    * readers ship with the JRE — no external codec needed, which
    * retires the "media libs absent" premise for these formats; only
    * audio/video stay stubbed). Emits row-major RGB888 so downstream
    * feature extraction is format-independent. Same mapPartitions shape
    * as [[decodeStub]]: one ImageIO configuration per partition, every
    * malformed payload flows to the per-row error channel, and
    * `maxPixels` bounds the per-row allocation (a 100 TB corpus WILL
    * contain a decompression bomb; reject it in-row, don't OOM the
    * task). */
  def decodePixels(df: DataFrame, maxPixels: Long = 1L << 24): Dataset[DecodedImage] = {
    val enc = Encoders.product[DecodedImage]
    df.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition codec setup (the init slot the stub reserved):
        // no disk-backed ImageIO cache inside executor tasks
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          if (b == null || b.isEmpty)
            DecodedImage(id, "", 0, 0, Array.emptyByteArray, ok = false, err = "empty payload")
          else {
            val fmt = imageDims(b).map(_._1).getOrElse("")
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
              if (img == null)
                DecodedImage(id, fmt, 0, 0, Array.emptyByteArray, ok = false,
                  err = "no registered reader for payload")
              else {
                val w = img.getWidth
                val h = img.getHeight
                if (w.toLong * h.toLong > maxPixels)
                  DecodedImage(id, fmt, w, h, Array.emptyByteArray, ok = false,
                    err = s"${w}x$h exceeds maxPixels=$maxPixels")
                else {
                  val out = new Array[Byte](w * h * 3)
                  var y = 0
                  var k = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y)
                      out(k) = ((rgb >> 16) & 0xff).toByte
                      out(k + 1) = ((rgb >> 8) & 0xff).toByte
                      out(k + 2) = (rgb & 0xff).toByte
                      k += 3
                      x += 1
                    }
                    y += 1
                  }
                  DecodedImage(id, fmt, w, h, out, ok = true, err = "")
                }
              }
            } catch {
              case e: Exception =>
                DecodedImage(id, fmt, 0, 0, Array.emptyByteArray, ok = false,
                  err = s"decode: ${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          }
        }
      }(enc)
  }

  /** Typed result of a REAL audio decode: stream params + level stats. */
  final case class AudioMeta(
      doc_id: Long, encoding: String, channels: Int, sample_rate: Double,
      bits: Int, n_frames: Long, duration_ms: Double,
      peak: Double, rms: Double, ok: Boolean, err: String)

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM readers ship with the JRE, headless-safe — the same "no
    * external codec" retirement decodePixels did for images; only video
    * and compressed audio stay stubbed). Emits the stream parameters
    * plus channel-folded peak/RMS level in [0,1] — the cheap
    * feature-extraction a corpus audit runs per clip. Same
    * mapPartitions shape: per-row error channel, `maxFrames` bounds the
    * per-row allocation (reject the 100 TB corpus's inevitable
    * malformed-length bomb in-row, don't OOM the task). */
  def decodeAudio(df: DataFrame, maxFrames: Long = 1L << 24): Dataset[AudioMeta] = {
    val enc = Encoders.product[AudioMeta]
    df.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          if (b == null || b.isEmpty)
            AudioMeta(id, "", 0, 0.0, 0, 0L, 0.0, 0.0, 0.0, ok = false, err = "empty payload")
          else {
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(b))
              try {
                val f = in.getFormat
                val frames = in.getFrameLength
                val durMs =
                  if (f.getFrameRate > 0) frames * 1000.0 / f.getFrameRate else 0.0
                val bits = f.getSampleSizeInBits
                val pcmSigned =
                  f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                val pcmUnsigned =
                  f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
                if (frames > maxFrames)
                  AudioMeta(id, f.getEncoding.toString, f.getChannels, f.getSampleRate.toDouble,
                    bits, frames, durMs, 0.0, 0.0, ok = false,
                    err = s"$frames frames exceeds maxFrames=$maxFrames")
                else if (!pcmSigned && !pcmUnsigned || (bits != 8 && bits != 16))
                  // params still real — only the level stats need PCM samples
                  AudioMeta(id, f.getEncoding.toString, f.getChannels, f.getSampleRate.toDouble,
                    bits, frames, durMs, 0.0, 0.0, ok = false,
                    err = s"unsupported sample layout: ${f.getEncoding}/$bits-bit")
                else {
                  val data = in.readAllBytes()
                  val bytesPer = bits / 8
                  val n = data.length / bytesPer
                  var peak = 0.0
                  var sumSq = 0.0
                  var i = 0
                  while (i < n) {
                    val v =
                      if (bits == 16) {
                        val off = i * 2
                        val s = if (f.isBigEndian)
                          ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                        else
                          ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                        s / 32768.0
                      } else if (pcmSigned) data(i) / 128.0
                      else ((data(i) & 0xff) - 128) / 128.0
                    val a = math.abs(v)
                    if (a > peak) peak = a
                    sumSq += v * v
                    i += 1
                  }
                  val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
                  AudioMeta(id, f.getEncoding.toString, f.getChannels, f.getSampleRate.toDouble,
                    bits, frames, durMs, peak, rms, ok = true, err = "")
                }
              } finally in.close()
            } catch {
              case e: Exception =>
                AudioMeta(id, "", 0, 0.0, 0, 0L, 0.0, 0.0, 0.0, ok = false,
                  err = s"decode: ${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          }
        }
      }(enc)
  }

  /** Typed result of the resize stage: payload out, dims as metadata. */
  final case class ResizedMedia(
      doc_id: Long, resized: Array[Byte], out_w: Int, out_h: Int, ok: Boolean)

  /** Resize STUB: deterministic stripe-fold in place of a real codec
    * resample (media libs absent from the container — same honesty rule
    * as [[decodeStub]]). The PLUMBING is the production shape: binary in
    * → binary out sized w·h, batch per-partition transform (one codec /
    * scaler init per task), typed output dims for downstream
    * partitioning. Each output byte XOR-folds its source stripe, so any
    * input byte change propagates to the output — the data-dependence a
    * real resample has, which is what the spec pins. */
  def resizeStub(df: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    // w*h in LONG: 65536x65536 overflows Int to 0 and would pass a
    // positive-dims check, then blow up (or silently emit empty output)
    // at allocation time inside the task
    require(w > 0 && h > 0 && w.toLong * h.toLong <= (1L << 28),
      s"target dims must be positive with w*h <= 2^28, got ${w}x$h")
    val outLen = (w.toLong * h.toLong).toInt
    val enc = Encoders.product[ResizedMedia]
    df.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // >>> real scaler/codec init would happen once HERE per partition <<<
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          if (b == null || b.isEmpty)
            ResizedMedia(id, Array.emptyByteArray, w, h, ok = false)
          else {
            val outArr = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) {
              // source stripe [lo, hi) for output byte i — every input
              // byte lands in exactly one stripe
              val lo = (i.toLong * b.length / outLen).toInt
              val hi = (((i + 1).toLong * b.length) / outLen).toInt
              var acc = 0
              var j = lo
              while (j < math.max(hi, lo + 1) && j < b.length) {
                acc ^= b(j) & 0xff; j += 1
              }
              outArr(i) = acc.toByte
              i += 1
            }
            ResizedMedia(id, outArr, w, h, ok = true)
          }
        }
      }(enc)
  }

  /** Frame-sample stub: take every k-th byte as a "frame" — stands in for
    * video frame sampling; the plumbing (explode to one row per frame,
    * keyed by (doc_id, frame_no)) is the real shape. */
  def frameSample(df: DataFrame, everyK: Int): DataFrame =
    df.select(col("doc_id"), col("payload"))
      // guard empty payloads: sequence(0, -1) is a DESCENDING range in
      // Spark (two bogus frames), not empty — same edge class as the
      // shingle guard in queries/Docs.scala
      .withColumn("frame_no",
        explode(when(octet_length(col("payload")) > 0,
          sequence(lit(0),
            floor((octet_length(col("payload")) - 1) / everyK).cast("int")))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame_byte",
        expr(s"substring(payload, frame_no * $everyK + 1, 1)"))
      .drop("payload")
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded in batched distributed passes.
  *
  * Two decoders ship: [[ImageIoDecoder]] — a REAL image-header decoder on
  * the JDK's javax.imageio (PNG/JPEG/GIF/BMP mime + true dimensions from
  * the header, no full pixel decode, headless-safe) with a deterministic
  * fallback for non-image payloads — and [[StubDecoder]], the deterministic
  * stand-in used by the oracled driver query (the synthetic corpus has no
  * real image bytes; the oracle must be able to reproduce the metadata in
  * SQL). Uncompressed audio (WAV/AIFF/AU) gets REAL header metadata via
  * the JDK's javax.sound.sampled (see [[decodeAudioMeta]]); compressed
  * audio codecs and video aren't in this environment and remain stubs.
  * Everything Spark-side — schema, batch shape, partition-preserving
  * mapPartitions, metadata struct — is identical for both.
  */
object Multimodal {

  /** Metadata produced per media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Pluggable decoder; implementations must be deterministic per blob. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (String, Int, Int) // (mime, width, height)
  }

  /** Deterministic stand-in for a real codec: derives fake dimensions from
    * blob length + first bytes. Replace with a real decoder in production. */
  object StubDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      val mime = if (first % 2 == 0) "image/png" else "image/jpeg"
      (mime, 16 + (n % 640), 16 + ((n / 7) % 480))
    }
  }

  /** Real image metadata via the JDK's javax.imageio: sniffs the registered
    * reader for the byte stream and reads mime + dimensions from the HEADER
    * (no full pixel decode). Non-image payloads fall back to the
    * deterministic stub so the operator stays total. */
  object ImageIoDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers.hasNext) {
          val r = readers.next()
          try {
            r.setInput(iis)
            val mimes = r.getOriginatingProvider.getMIMETypes
            val mime = if (mimes != null && mimes.nonEmpty) mimes(0)
                       else "application/octet-stream"
            (mime, r.getWidth(0), r.getHeight(0))
          } finally r.dispose()
        } else StubDecoder.decode(bytes)
      } catch {
        case _: Exception => StubDecoder.decode(bytes) // corrupt header
      } finally iis.close()
    }
  }

  /** Adds a `media_meta` struct by decoding `binCol` in partition-local
    * batches. Iterator-to-iterator (no partition materialization) → constant
    * memory per task regardless of table size; ordering and partitioning of
    * the input are preserved (no shuffle). */
  def decodeMeta(df: DataFrame, binCol: String,
                 decoder: MediaDecoder = StubDecoder): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media_meta", mediaMetaType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else {
          val (mime, w, h) = decoder.decode(bytes)
          Row(mime, w, h, bytes.length.toLong)
        }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(encoder)
  }

  /** Metadata produced per audio blob. Sentinel zeros mean "not parseable
    * as audio" (the operator is total; filter on `mime` to route). */
  val audioMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("sample_rate", DoubleType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** REAL audio header metadata via the JDK's javax.sound.sampled: the
    * registered file readers parse WAV/AIFF/AU headers (no sample decode).
    * Compressed codecs (mp3/ogg/aac) have no JDK reader and fall through
    * to the all-zeros sentinel — the documented environment stub. */
  object AudioHeaderDecoder extends Serializable {
    private val mimeByType = Map(
      "WAVE" -> "audio/wav", "AIFF" -> "audio/aiff", "AIFF-C" -> "audio/aiff",
      "AU" -> "audio/basic", "SND" -> "audio/basic")
    /** (mime, sampleRate, channels, frames, durationSec); zeros if not audio. */
    def decode(bytes: Array[Byte]): (String, Double, Int, Long, Double) =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        val rate = fmt.getFrameRate.toDouble
        val duration =
          if (frames > 0 && rate > 0) frames / rate
          else 0.0
        (mimeByType.getOrElse(aff.getType.toString, "audio/unknown"),
          fmt.getSampleRate.toDouble, fmt.getChannels, math.max(frames, 0L), duration)
      } catch {
        case _: Exception => ("application/octet-stream", 0.0, 0, 0L, 0.0)
      }
  }

  /** Adds an `audio_meta` struct by parsing `binCol` headers in
    * partition-local batches — same iterator-to-iterator, shuffle-free
    * shape as [[decodeMeta]]. */
  def decodeAudioMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("audio_meta", audioMetaType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else {
          val (mime, rate, ch, frames, dur) = AudioHeaderDecoder.decode(bytes)
          Row(mime, rate, ch, frames, dur, bytes.length.toLong)
        }
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(encoder)
  }

  /** Byte-sampling STAND-IN, not an image operation: the output is NOT a
    * decodable image — use [[resizeImage]] for real pixel-level scaling.
    * Exists to exercise the distributed plumbing contract (binary in →
    * binary out, partition-local batches, deterministic per blob) for
    * payload kinds this environment has no codecs for (audio/video). The
    * stand-in samples every k-th byte to reach ≈`targetBytes`. */
  @deprecated("not an image resize; use resizeImage (real pixels) — this is the codec-less stand-in", "r4")
  def resizeStub(df: DataFrame, binCol: String, targetBytes: Int): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(s"${binCol}_resized", BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val out = if (bytes == null) null else {
          val step = math.max(1, bytes.length / math.max(1, targetBytes))
          bytes.indices.by(step).map(bytes).toArray
        }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(encoder)
  }

  /** REAL image resize on the JDK: decode (javax.imageio), scale the longest
    * side down to `maxDim` preserving aspect (bilinear, headless-safe
    * BufferedImage drawing), re-encode PNG. Non-image/corrupt payloads pass
    * through unchanged (total operator; filter on `media_meta.mime` first
    * to route). Iterator-to-iterator like the rest — constant task memory
    * beyond one decoded frame. */
  def resizeImage(df: DataFrame, binCol: String, maxDim: Int): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(s"${binCol}_resized", BinaryType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val out: Array[Byte] =
          if (bytes == null) null
          else {
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              if (img == null) bytes // not an image: pass through
              else {
                val (w, h) = (img.getWidth, img.getHeight)
                val scale = maxDim.toDouble / math.max(w, h)
                if (scale >= 1.0) bytes // already small enough
                else {
                  val (nw, nh) = (math.max(1, (w * scale).round.toInt),
                    math.max(1, (h * scale).round.toInt))
                  val scaled = new java.awt.image.BufferedImage(nw, nh,
                    java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = scaled.createGraphics()
                  try {
                    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                    g.drawImage(img, 0, 0, nw, nh, null)
                  } finally g.dispose()
                  val buf = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(scaled, "png", buf)
                  buf.toByteArray
                }
              }
            } catch { case _: Exception => bytes }
          }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(encoder)
  }

  /** Feature-extraction stub: real codecs produce an embedding per blob;
    * here a deterministic `dim`-float vector is derived from byte windows
    * so downstream ANN/dedup plumbing (array<float> schema, batching) is
    * exercised end-to-end. */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val feat = if (bytes == null) null else {
          val v = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            v(i % dim) += (bytes(i) & 0xff) / 255.0f
            i += 1
          }
          val n = math.sqrt(v.map(x => x * x).sum).toFloat
          if (n > 0) v.map(_ / n) else v
        }
        Row.fromSeq(row.toSeq :+ (if (feat == null) null else feat.toSeq))
      }
    }(encoder)
  }

  /** Frame-sampling stub for video-like blobs: emits `n` deterministic
    * byte-slices per blob as child rows (id, frame_no, frame_bytes) —
    * the partitioning/explode shape of real frame extraction. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame =
    df.select(col(idCol), col(binCol).as("blob"))
      .withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_bytes",
        expr(s"substring(blob, frame_no * greatest(1, length(blob) div $n) + 1, greatest(1, length(blob) div $n))"))
      .drop("blob")
}

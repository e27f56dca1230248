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

  /** Metadata produced per video blob. Sentinel zeros mean "not parseable
    * as a known container" (total operator; filter on `mime` to route). */
  val videoMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_sec", DoubleType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** REAL video CONTAINER metadata — pure-spec header parsing, the same
    * pattern as [[AudioHeaderDecoder]]'s WAV/AIFF path (no codec library
    * exists in this environment, and none is needed: duration and
    * dimensions live in the container headers).
    *
    *  - MP4 / ISO BMFF (ISO 14496-12): walks the box tree — `ftyp` major
    *    brand → mime, `moov/mvhd` → timescale + duration (v0 32-bit and
    *    v1 64-bit layouts, and the size==1 largesize form), `moov/trak/
    *    tkhd` → width/height (16.16 fixed point; max over tracks, audio
    *    tracks carry 0×0).
    *  - Matroska / WebM (EBML, RFC 8794): reads the EBML header's DocType
    *    for the mime, then scans Segment → Info for TimestampScale
    *    (default 1 ms) and Duration (4- or 8-byte float, in scale units),
    *    and Segment → Tracks → TrackEntry(type=video) → Video for
    *    PixelWidth / PixelHeight. Unknown-size elements (all value bits
    *    set) extend to the end of the enclosing range, per the RFC.
    *
    * FRAME decode remains out of environment — this closes the container
    * metadata stub only. Corrupt/foreign payloads return the all-zeros
    * sentinel; the operator is total. */
  object VideoHeaderDecoder extends Serializable {
    private val Sentinel = ("application/octet-stream", 0, 0, 0.0)

    /** (mime, width, height, durationSec); zeros if not a known container. */
    def decode(bytes: Array[Byte]): (String, Int, Int, Double) =
      try {
        if (bytes == null || bytes.length < 8) Sentinel
        else if (bytes.length >= 12 &&
          bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
          parseMp4(bytes)
        else if (be32(bytes, 0) == 0x1a45dfa3) parseMkv(bytes)
        else Sentinel
      } catch { case _: Exception => Sentinel }

    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be64(b: Array[Byte], o: Int): Long =
      ((be32(b, o) & 0xffffffffL) << 32) | (be32(b, o + 4) & 0xffffffffL)

    // ---- ISO BMFF ----

    /** Visit each box in [from, to): f(type, payloadFrom, payloadTo). */
    private def boxes(b: Array[Byte], from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size32 = be32(b, o)
        val typ = new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val (header, size) =
          if (size32 == 1) { require(o + 16 <= to, "truncated largesize"); (16, be64(b, o + 8)) }
          else if (size32 == 0) (8, (to - o).toLong) // box extends to end
          else (8, size32.toLong & 0xffffffffL)
        require(size >= header && o + size <= to, s"box $typ overruns")
        f(typ, o + header, (o + size).toInt)
        o += size.toInt
      }
    }

    private def parseMp4(b: Array[Byte]): (String, Int, Int, Double) = {
      var mime = "video/mp4"
      var duration = 0.0
      var w = 0; var h = 0
      boxes(b, 0, b.length) { (typ, from, to) =>
        typ match {
          case "ftyp" =>
            val brand = new String(b, from, 4, java.nio.charset.StandardCharsets.US_ASCII)
            mime = brand match {
              case "M4A " => "audio/mp4"
              case "qt  " => "video/quicktime"
              case _      => "video/mp4"
            }
          case "moov" =>
            boxes(b, from, to) { (t2, f2, t2e) =>
              t2 match {
                case "mvhd" =>
                  val v = b(f2) & 0xff
                  if (v == 1) { // 64-bit creation/modification/duration
                    require(t2e - f2 >= 32, "mvhd v1 payload too short")
                    val timescale = be32(b, f2 + 20) & 0xffffffffL
                    val dur = be64(b, f2 + 24)
                    if (timescale > 0) duration = dur.toDouble / timescale
                  } else {
                    require(t2e - f2 >= 20, "mvhd v0 payload too short")
                    val timescale = be32(b, f2 + 12) & 0xffffffffL
                    val dur = be32(b, f2 + 16) & 0xffffffffL
                    if (timescale > 0) duration = dur.toDouble / timescale
                  }
                case "trak" =>
                  boxes(b, f2, t2e) { (t3, f3, t3e) =>
                    if (t3 == "tkhd") {
                      val v = b(f3) & 0xff
                      // a short payload must reject, not read the next
                      // box's bytes as width/height
                      require(t3e - f3 >= (if (v == 1) 94 else 82),
                        "tkhd payload too short")
                      // width/height are the LAST 8 bytes of the box in
                      // both versions (16.16 fixed point): ver+flags(4) +
                      // times/id/duration (20 v0 / 32 v1) + layer block
                      // (16) + matrix (36)
                      val wOff = f3 + (if (v == 1) 88 else 76)
                      val tw = be16(b, wOff)      // integer part
                      val th = be16(b, wOff + 4)
                      if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
                    }
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      (mime, w, h, duration)
    }

    // ---- EBML / Matroska ----

    /** EBML element id at o: value INCLUDES the marker bits (RFC 8794
      * encodes ids as-stored). Returns (id, lengthBytes). */
    private def ebmlId(b: Array[Byte], o: Int): (Long, Int) = {
      val first = b(o) & 0xff
      require(first != 0, "invalid EBML id")
      val len = Integer.numberOfLeadingZeros(first) - 23 // 1..4 for class A-D
      require(len >= 1 && len <= 4 && o + len <= b.length, "bad id length")
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
      (v, len)
    }

    /** EBML size at o: marker bit stripped. Returns (size, lengthBytes);
      * size == -1 means "unknown" (all value bits set). */
    private def ebmlSize(b: Array[Byte], o: Int): (Long, Int) = {
      val first = b(o) & 0xff
      require(first != 0, "invalid EBML size")
      val len = Integer.numberOfLeadingZeros(first) - 23
      require(len >= 1 && len <= 8 && o + len <= b.length, "bad size length")
      var v = (first & (0xff >>> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
      val allOnes = (1L << (7 * len)) - 1
      (if (v == allOnes) -1L else v, len)
    }

    /** Visit each child element of [from, to): f(id, payloadFrom, payloadTo). */
    private def ebmlChildren(b: Array[Byte], from: Int, to: Int)(f: (Long, Int, Int) => Unit): Unit = {
      var o = from
      while (o < to) {
        val (id, idLen) = ebmlId(b, o)
        val (sz, szLen) = ebmlSize(b, o + idLen)
        val pFrom = o + idLen + szLen
        // bound-check in LONG space BEFORE narrowing: an 8-byte size like
        // 2^33+16 would truncate to a small positive int and slip past an
        // int-space check — a silent misparse, not a loud reject
        require(sz < 0 || sz <= (to - pFrom).toLong, "EBML element overruns")
        val pTo = if (sz < 0) to else pFrom + sz.toInt // unknown: to range end
        f(id, pFrom, pTo)
        o = pTo
      }
    }

    private def ebmlUint(b: Array[Byte], from: Int, to: Int): Long = {
      var v = 0L; var i = from
      while (i < to) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }

    private def ebmlFloat(b: Array[Byte], from: Int, to: Int): Double = (to - from) match {
      case 4 => java.lang.Float.intBitsToFloat(be32(b, from)).toDouble
      case 8 => java.lang.Double.longBitsToDouble(be64(b, from))
      case 0 => 0.0
      case n => throw new IllegalArgumentException(s"EBML float of $n bytes")
    }

    private def parseMkv(b: Array[Byte]): (String, Int, Int, Double) = {
      var mime = "video/x-matroska"
      var timestampScale = 1000000L // ns per tick: spec default = 1 ms
      var durationTicks = 0.0
      var w = 0; var h = 0
      ebmlChildren(b, 0, b.length) { (id, from, to) =>
        id match {
          case 0x1a45dfa3L => // EBML header: DocType names the flavor
            ebmlChildren(b, from, to) { (hid, hf, ht) =>
              if (hid == 0x4282L) {
                val dt = new String(b, hf, ht - hf, java.nio.charset.StandardCharsets.US_ASCII)
                mime = if (dt == "webm") "video/webm" else "video/x-matroska"
              }
            }
          case 0x18538067L => // Segment
            ebmlChildren(b, from, to) { (sid, sf, st) =>
              sid match {
                case 0x1549a966L => // Info
                  ebmlChildren(b, sf, st) { (iid, inf, int) =>
                    if (iid == 0x2ad7b1L) timestampScale = ebmlUint(b, inf, int)
                    else if (iid == 0x4489L) durationTicks = ebmlFloat(b, inf, int)
                  }
                case 0x1654ae6bL => // Tracks
                  ebmlChildren(b, sf, st) { (tid, tf, tt) =>
                    if (tid == 0xaeL) { // TrackEntry
                      var isVideo = false; var tw = 0; var th = 0
                      ebmlChildren(b, tf, tt) { (eid, ef, et) =>
                        if (eid == 0x83L) isVideo = ebmlUint(b, ef, et) == 1L
                        else if (eid == 0xe0L) // Video settings
                          ebmlChildren(b, ef, et) { (vid, vf, vt) =>
                            if (vid == 0xb0L) tw = ebmlUint(b, vf, vt).toInt
                            else if (vid == 0xbaL) th = ebmlUint(b, vf, vt).toInt
                          }
                      }
                      if (isVideo) { w = math.max(w, tw); h = math.max(h, th) }
                    }
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      (mime, w, h, durationTicks * timestampScale / 1e9)
    }
  }

  /** Minimal VALID ISO BMFF blob (ftyp + moov[mvhd + trak[tkhd]]) with
    * the given duration and dimensions — a deterministic fixture
    * generator for testing the container parser (and the q_video_meta
    * oracle gate) without codec libraries. v0 layouts throughout. */
  def syntheticMp4(width: Int, height: Int, durationTicks: Long, timescale: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
    val mvhd = {
      val p = new Array[Byte](100) // v0: ver+flags(4)+times(8)+ts(4)+dur(4)+rest(80)
      System.arraycopy(be32(timescale), 0, p, 12, 4)
      System.arraycopy(be32(durationTicks.toInt), 0, p, 16, 4)
      p
    }
    val tkhd = {
      val p = new Array[Byte](84) // v0: ver+flags(4)+20+16+matrix(36)+w(4)+h(4)
      System.arraycopy(be32(width << 16), 0, p, 76, 4)  // 16.16 fixed
      System.arraycopy(be32(height << 16), 0, p, 80, 4)
      p
    }
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++ "isomiso2".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
  }

  /** Adds a `video_meta` struct by parsing `binCol` container headers in
    * partition-local batches — same iterator-to-iterator, shuffle-free
    * shape as [[decodeMeta]]/[[decodeAudioMeta]]. */
  def decodeVideoMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("video_meta", videoMetaType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = if (bytes == null) null else {
          val (mime, w, h, dur) = VideoHeaderDecoder.decode(bytes)
          Row(mime, w, h, dur, bytes.length.toLong)
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

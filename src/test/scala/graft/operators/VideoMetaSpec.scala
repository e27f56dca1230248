package graft.operators

import graft.SparkTestBase

/** MP4 / Matroska container-header metadata: hand-built fixture boxes
  * (both mvhd/tkhd versions, the largesize form, known- and unknown-size
  * EBML segments, 4- and 8-byte EBML floats), the total-operator
  * sentinel, and the distributed decodeVideoMeta plumbing. */
class VideoMetaSpec extends SparkTestBase {
  import spark.implicits._

  private def be32(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be64(v: Long) = be32((v >>> 32).toInt) ++ be32(v.toInt)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
  /** size==1 form: 32-bit size slot holds 1, true size in a 64-bit field. */
  private def largeBox(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(1) ++ typ.getBytes("US-ASCII") ++ be64(payload.length + 16L) ++ payload

  test("MP4 v0: ftyp brand, mvhd duration, tkhd dimensions") {
    val b = Multimodal.syntheticMp4(1280, 720, durationTicks = 45500, timescale = 1000)
    val (mime, w, h, dur) = Multimodal.VideoHeaderDecoder.decode(b)
    assert(mime == "video/mp4" && w == 1280 && h == 720)
    assert(math.abs(dur - 45.5) < 1e-9)
  }

  test("MP4 v1 layouts + largesize box + audio track ignored + quicktime brand") {
    // hand-build v1 mvhd/tkhd: 64-bit times and duration
    val mvhd1 = {
      val p = new Array[Byte](112) // ver+flags(4)+8+8+ts(4)+dur(8)+rest(80)
      p(0) = 1
      System.arraycopy(be32(90000), 0, p, 20, 4)           // timescale
      System.arraycopy(be64(90000L * 7200), 0, p, 24, 8)   // 2 h
      p
    }
    def tkhd1(w: Int, h: Int) = {
      val p = new Array[Byte](96) // ver+flags(4)+32+16+matrix(36)+w+h
      p(0) = 1
      System.arraycopy(be32(w << 16), 0, p, 88, 4)
      System.arraycopy(be32(h << 16), 0, p, 92, 4)
      p
    }
    val moov = box("mvhd", mvhd1) ++
      box("trak", box("tkhd", tkhd1(0, 0))) ++      // audio track: 0x0
      box("trak", box("tkhd", tkhd1(3840, 2160)))   // the video track
    val b = box("ftyp", "qt  ".getBytes("US-ASCII") ++ be32(0)) ++ largeBox("moov", moov)
    val (mime, w, h, dur) = Multimodal.VideoHeaderDecoder.decode(b)
    assert(mime == "video/quicktime" && w == 3840 && h == 2160)
    assert(math.abs(dur - 7200.0) < 1e-9)
  }

  // ---- EBML builders ----
  private def id(bytes: Int*) = bytes.map(_.toByte).toArray
  private def vsize(n: Int): Array[Byte] = {
    require(n < 127); Array((0x80 | n).toByte)
  }
  private def el(eid: Array[Byte], payload: Array[Byte]): Array[Byte] =
    eid ++ vsize(payload.length) ++ payload
  private def uint(eid: Array[Byte], v: Long): Array[Byte] = {
    var bytes = List.empty[Byte]; var x = v
    do { bytes = (x & 0xff).toByte :: bytes; x >>>= 8 } while (x != 0)
    el(eid, bytes.toArray)
  }

  test("Matroska: doctype mime, timestamp-scale duration, video-track dimensions") {
    val header = el(id(0x1a, 0x45, 0xdf, 0xa3),
      el(id(0x42, 0x82), "matroska".getBytes("US-ASCII")))
    val info = el(id(0x15, 0x49, 0xa9, 0x66),
      uint(id(0x2a, 0xd7, 0xb1), 1000000L) ++            // 1 ms ticks
        el(id(0x44, 0x89), be64(java.lang.Double.doubleToLongBits(90500.0)))) // 8-byte float
    val videoTrack = el(id(0xae),
      uint(id(0x83), 1L) ++
        el(id(0xe0), uint(id(0xb0), 1920L) ++ uint(id(0xba), 1080L)))
    val audioTrack = el(id(0xae), uint(id(0x83), 2L)) // must be ignored
    val tracks = el(id(0x16, 0x54, 0xae, 0x6b), audioTrack ++ videoTrack)
    val segment = el(id(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    val (mime, w, h, dur) = Multimodal.VideoHeaderDecoder.decode(header ++ segment)
    assert(mime == "video/x-matroska" && w == 1920 && h == 1080)
    assert(math.abs(dur - 90.5) < 1e-9) // 90500 ticks x 1 ms
  }

  test("WebM: unknown-size segment, 4-byte float duration, default timestamp scale") {
    val header = el(id(0x1a, 0x45, 0xdf, 0xa3),
      el(id(0x42, 0x82), "webm".getBytes("US-ASCII")))
    val info = el(id(0x15, 0x49, 0xa9, 0x66),
      el(id(0x44, 0x89), be32(java.lang.Float.floatToIntBits(12000.0f)))) // no scale el
    val track = el(id(0xae),
      uint(id(0x83), 1L) ++
        el(id(0xe0), uint(id(0xb0), 640L) ++ uint(id(0xba), 360L)))
    val tracks = el(id(0x16, 0x54, 0xae, 0x6b), track)
    // unknown size: 1-byte vint with all value bits set (0xFF) → to end
    val segment = id(0x18, 0x53, 0x80, 0x67) ++ Array(0xff.toByte) ++ info ++ tracks
    val (mime, w, h, dur) = Multimodal.VideoHeaderDecoder.decode(header ++ segment)
    assert(mime == "video/webm" && w == 640 && h == 360)
    assert(math.abs(dur - 12.0) < 1e-9) // 12000 ticks x default 1 ms
  }

  test("hostile containers: truncated/cyclic/overflowing boxes reject to the " +
      "sentinel and always terminate (the WarcSourceSpec truncation discipline)") {
    val S = ("application/octet-stream", 0, 0, 0.0)
    def d(b: Array[Byte]) = Multimodal.VideoHeaderDecoder.decode(b)

    // -- ISO BMFF hostiles --
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    // box declares more bytes than the blob holds
    assert(d(ftyp ++ be32(4096) ++ "moov".getBytes("US-ASCII") ++ new Array[Byte](8)) == S)
    // size smaller than its own header (4 < 8): a naive `o += size` walker
    // loops here forever — must reject instead
    assert(d(ftyp ++ be32(4) ++ "free".getBytes("US-ASCII")) == S)
    // largesize form truncated before the 64-bit size field
    assert(d(ftyp ++ be32(1) ++ "moov".getBytes("US-ASCII")) == S)
    // largesize declaring less than its own 16-byte header
    assert(d(ftyp ++ be32(1) ++ "moov".getBytes("US-ASCII") ++ be64(8L) ++ new Array[Byte](8)) == S)
    // mvhd payload too short for its version layout: must NOT read the
    // following box's bytes as timescale/duration
    assert(d(ftyp ++ box("moov", box("mvhd", Array[Byte](0, 0, 0, 0)))) == S)
    assert(d(ftyp ++ box("moov", box("mvhd", Array[Byte](1, 0, 0, 0, 9, 9)))) == S)
    // tkhd payload too short (v0 needs 82 bytes)
    assert(d(ftyp ++ box("moov", box("trak", box("tkhd", new Array[Byte](40))))) == S)

    // -- EBML hostiles --
    val magic = id(0x1a, 0x45, 0xdf, 0xa3)
    // declared size beyond the blob
    assert(d(magic ++ Array((0x80 | 0x60).toByte) ++ new Array[Byte](4)) == S)
    // zero id byte after a valid header element
    assert(d(magic ++ vsize(2) ++ Array(0x00.toByte, 0x00.toByte)) == S)
    // 8-byte size whose value (2^33 + 8) truncates to a SMALL positive int
    // (8): the long-space bound check must reject, not misparse
    val hugeSize = Array[Byte](0x01, 0x02, 0x00, 0x00, 0x00, 0x00, 0x00, 0x08)
    assert(d(magic ++ hugeSize ++ new Array[Byte](32)) == S)
    // size field itself truncated (5-byte length, 2 bytes present)
    assert(d(magic ++ Array(0x08.toByte, 0x01.toByte)) == S)

    // termination sanity: every hostile above returns promptly (no walker
    // loops) AND a well-formed blob still parses after the guards
    val ok = Multimodal.syntheticMp4(320, 240, 5500, 1000)
    assert(d(ok) == ("video/mp4", 320, 240, 5.5))
  }

  test("decodeVideoMeta is total: corrupt/foreign payloads get the zero sentinel; plumbing distributed") {
    val rows = Seq(
      (1L, Multimodal.syntheticMp4(320, 240, 5500, 1000)),
      (2L, "not a container at all, just text".getBytes("UTF-8")),
      (3L, be32(8) ++ "ftyp".getBytes("US-ASCII")), // truncated: no brand
      (4L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.decodeVideoMeta(rows.toDF("doc_id", "media"), "media")
      .select($"doc_id", $"video_meta.mime", $"video_meta.width",
        $"video_meta.height", $"video_meta.duration_sec")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getInt(2), r.getInt(3), r.getDouble(4))))
      .toMap
    assert(out(1L) == ("video/mp4", 320, 240, 5.5))
    assert(out(2L) == ("application/octet-stream", 0, 0, 0.0))
    assert(out(3L) == ("application/octet-stream", 0, 0, 0.0))
    assert(out(4L) == null) // null in, null struct out
    // shuffle-free, partition-preserving (the decodeMeta contract)
    val plan = Multimodal.decodeVideoMeta(rows.toDF("doc_id", "media"), "media")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

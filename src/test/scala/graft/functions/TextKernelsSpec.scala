package graft.functions

import graft.SparkTestBase
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level properties of the text hashing paths, each checked against a
  * straightforward reference implementation — guards the optimized variants
  * (byte-path md5 windows, per-doc word-hash cache, O(1) rolling updates)
  * against semantic drift. */
class TextKernelsSpec extends SparkTestBase {

  private def md5Prefix(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    b.take(8).map(x => f"${x & 0xff}%02x").mkString
  }

  test("rollingFingerprint equals naive per-window md5 min (ASCII byte path)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa",
      "short", // shorter than window
      "exactly sixteen!") // length == window
    for (t <- texts) {
      val expected =
        if (t.length < 16) md5Prefix(t)
        else (0 to t.length - 16).map(i => md5Prefix(t.substring(i, i + 16))).min
      val got = TextOps.rollingFingerprint(UTF8String.fromString(t), 16).toString
      assert(got == expected, s"text: $t")
    }
  }

  test("rollingFingerprint non-ASCII falls back to UTF-16 window semantics") {
    val t = "héllo wörld — ünicode text with accents"
    val expected = (0 to t.length - 16).map(i => md5Prefix(t.substring(i, i + 16))).min
    assert(TextOps.rollingFingerprint(UTF8String.fromString(t), 16).toString == expected)
  }

  test("rollingFingerprintFast: rolling update equals direct window hash") {
    // every window substring goes through the direct (initial-hash) path, so
    // min over them must equal the rolled fingerprint of the whole string
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps going for a while",
      "abcdefghijklmnopqrstuvwxyz0123456789",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")
    for (t <- texts; w <- Seq(8, 16)) {
      val direct = (0 to t.length - w)
        .map(i => TextOps.rollingFingerprintFast(UTF8String.fromString(t.substring(i, i + w)), w).toString)
        .min
      val rolled = TextOps.rollingFingerprintFast(UTF8String.fromString(t), w).toString
      assert(rolled == direct, s"text: $t window: $w")
    }
  }

  test("rollingFingerprintFast is robust to edits away from the minimal window") {
    // winnowing property: appending text can only change the fingerprint by
    // introducing a smaller window — never by losing the current min's window
    val base = "the quick brown fox jumps over the lazy dog"
    val fpBase = TextOps.rollingFingerprintFast(UTF8String.fromString(base), 16).toString
    val fpMore = TextOps.rollingFingerprintFast(UTF8String.fromString(base + " suffix"), 16).toString
    assert(fpMore <= fpBase) // min over a superset of windows
  }

  test("simhash64 word-hash cache preserves per-occurrence weighting") {
    // reference: md5 per OCCURRENCE (the pre-cache semantics)
    def reference(text: String): Long = {
      val s = text.toLowerCase(java.util.Locale.ROOT)
      val counts = new Array[Int](64)
      for (w <- s.split("\\s+") if w.nonEmpty) {
        val h = java.lang.Long.parseUnsignedLong(md5Prefix(w), 16)
        for (b <- 0 until 64)
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
    }
    val texts = Seq(
      "the cat and the dog and the cat again",
      "one two three",
      "repeat repeat repeat repeat distinct")
    for (t <- texts)
      assert(TextOps.simhash64(UTF8String.fromString(t)) == reference(t), s"text: $t")
  }

  test("fast fingerprint SQL function is registered") {
    val r = spark.sql(
      "SELECT rolling_fingerprint_fast('the quick brown fox jumps over it', 16) AS fp")
      .head().getString(0)
    assert(r.length == 16 && r.forall(c => "0123456789abcdef".contains(c)))
  }
}

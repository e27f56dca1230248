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

  test("minhash distinct-shingle skip is bit-identical to the naive multiset scan") {
    // independent reference: per-occurrence affine-min with the same fixed
    // constants as TextOps (LCG-seeded permutations, mix64-finalized
    // polyhash shingles) — guards the distinct-skip optimization
    def reference(text: String, k: Int, num: Int): Array[Long] = {
      def poly(s: String, from: Int, until: Int): Long = {
        var h = 1125899906842597L; var i = from
        while (i < until) { h = 31 * h + s.charAt(i); i += 1 }; h
      }
      def mix(z0: Long): Long = {
        var z = z0 + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      var state = 0x5deece66dL
      def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
      // TextOps draws a(i), b(i) alternately from one LCG stream
      val a = new Array[Long](num)
      val b = new Array[Long](num)
      for (i <- 0 until num) { a(i) = next() | 1L; b(i) = next() }
      val s = text.toLowerCase(java.util.Locale.ROOT)
      val sig = Array.fill(num)(Long.MaxValue)
      if (s.length >= k) {
        for (i <- 0 to s.length - k) {
          val h = mix(poly(s, i, i + k))
          for (j <- 0 until num) {
            val v = h * a(j) + b(j)
            if (v < sig(j)) sig(j) = v
          }
        }
      }
      sig
    }
    val texts = Seq(
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // one distinct shingle
      "the the the the the the the quick quick quick brown fox",
      "abcabcabcabcabcabcabcabcabc unique tail here",
      "no repeats here at all 0123456789")
    for (t <- texts) {
      val want = reference(t, 5, 64)
      val got = TextOps.minhashSignature(UTF8String.fromString(t), 5, 64)
      assert((0 until 64).forall(i => got.getLong(i) == want(i)), t)
    }
  }

  test("fast fingerprint SQL function is registered") {
    val r = spark.sql(
      "SELECT rolling_fingerprint_fast('the quick brown fox jumps over it', 16) AS fp")
      .head().getString(0)
    assert(r.length == 16 && r.forall(c => "0123456789abcdef".contains(c)))
  }

  test("repetition signals: duplicate-line and top-token fractions") {
    def dup(s: String) = TextOps.dupLineFraction(UTF8String.fromString(s))
    def top(s: String) = TextOps.topTokenFraction(UTF8String.fromString(s))
    assert(dup("a\nb\nc") == 0.0)
    assert(dup("x\nx\nx\nx") == 0.75) // 4 lines, 1 distinct
    assert(dup("  x \nx\n\n  \ny") == 1.0 - 2.0 / 3.0) // trim + blank-skip
    assert(dup("") == 0.0 && dup("\n\n") == 0.0)
    assert(top("a b a c") == 0.5)
    assert(top("The the THE") == 1.0) // lowercased
    assert(top("") == 0.0 && top("   ") == 0.0)
    assert(top("one  two") == 0.5) // empty tokens from double spaces dropped
  }

  test("word_window_hashes equals the md5/conv expression pipeline, nulls as array_join") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(
      Tuple1(Seq("alpha", "beta", "gamma", "delta")),
      Tuple1(Seq("x")))).toDF("ws")
    val viaKernel = df.select(call_function("word_window_hashes", col("ws"), lit(2)).as("h"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val viaExpr = df.where(size(col("ws")) >= 2).select(expr(
      """transform(sequence(1, size(ws) - 1),
        |  i -> cast(conv(substring(md5(cast(array_join(slice(ws, i, 2), ' ') as binary)), 1, 15), 16, 10) as bigint))""".stripMargin).as("h"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(viaKernel.head == viaExpr.head)
    assert(viaKernel(1) == Seq.empty) // shorter than the window
    // null slots follow array_join semantics: skipped, no separator
    val withNull = spark.createDataFrame(Seq(
      Tuple1(Seq("a", null, "b")))).toDF("ws")
    val k = withNull.select(call_function("word_window_hashes", col("ws"), lit(2)).as("h"))
      .head().getSeq[Long](0)
    val e = withNull.select(expr(
      """transform(sequence(1, 2),
        |  i -> cast(conv(substring(md5(cast(array_join(slice(ws, i, 2), ' ') as binary)), 1, 15), 16, 10) as bigint))""".stripMargin).as("h"))
      .head().getSeq[Long](0)
    assert(k == e)
  }

  test("redact_pii masks emails, urls, and phone numbers") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(Tuple1(
      "mail bob.smith+x@corp.example.org call 555-123-4567 see https://a.io/p?q=1 done"
    ))).toDF("text")
    val out = df.select(graft.operators.TextAnalysis.redactPii(col("text"))).head().getString(0)
    assert(out == "mail <EMAIL> call <PHONE> see <URL> done", out)
    // 10-digit runs without separators are NOT phones (no false redaction)
    val keep = df.sparkSession.createDataFrame(Seq(Tuple1("order 5551234567 qty 3"))).toDF("text")
    val kept = keep.select(graft.operators.TextAnalysis.redactPii(col("text"))).head().getString(0)
    assert(kept == "order 5551234567 qty 3", kept)
  }

  test("nfc/nfkc normalization: composition, compatibility folds, identity fast path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def nfc(s: String): String =
      Seq(s).toDF("t").select(call_function("nfc_normalize", col("t"))).head().getString(0)
    def nfkc(s: String): String =
      Seq(s).toDF("t").select(call_function("nfkc_normalize", col("t"))).head().getString(0)
    val decomposed = "Cafe\u0301"   // e + COMBINING ACUTE
    val precomposed = "Caf\u00e9"   // precomposed e-acute
    assert(decomposed.length === 5 && precomposed.length === 4)
    assert(nfc(decomposed) === precomposed)
    // already-normalized text is the identity (incl. plain ASCII)
    assert(nfc("plain ascii") === "plain ascii")
    assert(nfc(precomposed) === precomposed)
    // NFC preserves compatibility characters; NFKC folds them
    val ligature = "\ufb01le"       // fi-ligature + "le"
    assert(nfc(ligature) === ligature)
    assert(nfkc(ligature) === "file")
    assert(nfkc("\uff26\uff35\uff2c\uff2c") === "FULL") // fullwidth letters
    // null in, null out (nullIntolerant expression contract)
    assert(Seq[Option[String]](None).toDF("t")
      .select(call_function("nfc_normalize", col("t"))).head().isNullAt(0))
    // dedup consequence: the two spellings hash identically after NFC
    val spellings = Seq(decomposed, precomposed).toDF("t")
      .select(md5(call_function("nfc_normalize", col("t"))).as("h"))
      .distinct().count()
    assert(spellings === 1L)
  }
}

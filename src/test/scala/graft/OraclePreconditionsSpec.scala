package graft

import org.apache.spark.sql.functions._

/** Asserts the corpus properties the DuckDB oracles rest on, so a
  * regenerated/rescaled testdata set fails LOUDLY here instead of silently
  * degrading the correctness gate (ADVICE r2):
  *
  *  1. ASCII text — the Java-vs-DuckDB string semantics (UTF-16 code units
  *     vs codepoints, `\s` classes, lowercasing) only coincide on ASCII.
  *  2. Jaccard gap — the minhash/cluster oracles claim LSH+prune recall is
  *     lossless because no pair sits on the S-curve slope (0.45, 0.9) at
  *     threshold 0.5 / 128 hashes / 32 bands.
  */
class OraclePreconditionsSpec extends SparkTestBase {
  import spark.implicits._

  // the driver's correctness gate runs at sf0.01 — check that corpus
  private val gateDir = "/root/testdata/sf0.01"

  test("documents corpus is pure ASCII (oracle string-semantics precondition)") {
    val docs = spark.read.parquet(s"$gateDir/documents.parquet")
    val nonAscii = docs.where(length(col("text")) =!= octet_length(col("text")) ||
        col("text").rlike("[^\\x00-\\x7F]"))
      .count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII documents — text oracles no longer sound")
  }

  test("no document pair sits on the minhash S-curve slope (Jaccard gap)") {
    Graft.register(spark)
    val docs = spark.read.parquet(s"$gateDir/documents.parquet")
    // exact all-pairs 5-shingle Jaccard over the gate corpus (500 docs →
    // 125k pairs, linear-merge kernel: cheap in-test)
    val sh = docs.select(col("doc_id").as("id"),
      call_function("sorted_shingles", col("text"), lit(5)).as("sh"))
    val onSlope = sh.toDF("id_a", "sh_a")
      .join(sh.toDF("id_b", "sh_b"), $"id_a" < $"id_b")
      .select(call_function("jaccard_sorted", $"sh_a", $"sh_b").as("j"))
      .where($"j" > 0.45 && $"j" < 0.9)
      .count()
    assert(onSlope == 0,
      s"$onSlope pairs with Jaccard in (0.45, 0.9): minhash oracle equality no longer guaranteed")
  }
}

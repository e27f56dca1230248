package graft.operators

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("simhash pairs") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
    out.show(5)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "hamming"))
  }
}

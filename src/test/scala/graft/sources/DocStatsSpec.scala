package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSv2 statistics: a small document collection must weigh its REAL
  * bytes in the optimizer (and so broadcast in joins against big fact
  * tables); a network collection must stay at the conservative default
  * rather than claim a size nobody measured. */
class DocStatsSpec extends SparkTestBase {

  private def smallXml(): String = {
    val d = java.nio.file.Files.createTempDirectory("doc-stats").toFile
    java.nio.file.Files.writeString(new java.io.File(d, "dims.xml").toPath,
      "<root>" + (0 until 20).map(i =>
        s"<rec><key>k$i</key><label>dim$i</label></rec>").mkString + "</root>")
    d.getAbsolutePath
  }

  test("a local collection reports its on-disk bytes to the optimizer") {
    val df = spark.read.format("graft-xml").option("recordTag", "rec")
      .option("columns", "key,label").load(smallXml())
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // raw file bytes (~1 KB), not spark.sql.defaultSizeInBytes
    assert(size > 0 && size < 100L * 1024, s"sizeInBytes = $size")
  }

  test("a small collection broadcasts against a big fact table statically") {
    val dims = spark.read.format("graft-xml").option("recordTag", "rec")
      .option("columns", "key,label").load(smallXml())
    val fact = spark.range(0, 100000)
      .select(concat(lit("k"), (col("id") % 20)).as("key"), col("id"))
    val joined = fact.join(dims, "key")
    val plan = joined.queryExecution.executedPlan.toString
    // the static plan already broadcasts the document side — no exchange
    // on the fact table, no AQE after-the-fact conversion needed
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(joined.count() == 100000)
  }

  test("network collections answer unknown, not a guessed size") {
    assert(!DocFiles.bytesOf(Seq("http://127.0.0.1:1/rest/db/doc.xml")).isPresent)
    assert(!DocFiles.bytesOf(
      Seq("/tmp/a.xml", "https://127.0.0.1:1/rest/db/doc.xml")).isPresent)
  }
}

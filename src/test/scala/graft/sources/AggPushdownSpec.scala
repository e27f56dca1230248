package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** COUNT/MIN/MAX (+ GROUP BY) pushdown into the graft document sources:
  * the scan must report the pushed aggregation (its readSchema becomes the
  * per-group state row, so no full rows are built for a count-only probe)
  * and the combined result must match Spark's own aggregation of the
  * unaggregated read — across MULTIPLE files, so the partial-state
  * combine is actually exercised. */
class AggPushdownSpec extends SparkTestBase {

  private lazy val xmlDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-agg-xml").toFile
    d.deleteOnExit()
    val docs = Seq(
      """<col><r><name>alpha</name><kind>a</kind></r><r><name>beta</name><kind>b</kind></r></col>""",
      """<col><r><name>gamma</name><kind>a</kind></r><r><name>delta</name></r></col>""",
      """<col><r><name>epsilon</name><kind>b</kind></r><r><name>zeta</name><kind>a</kind></r></col>""")
    docs.zipWithIndex.foreach { case (x, i) =>
      java.nio.file.Files.writeString(new java.io.File(d, s"doc$i.xml").toPath, x)
    }
    d.getAbsolutePath
  }

  private lazy val geoDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-agg-geo").toFile
    d.deleteOnExit()
    val mk = (name: String, kind: String) =>
      s"""{"type":"Feature","properties":{"name":"$name"${if (kind == null) "" else s""","kind":"$kind""""}},"geometry":{"type":"Point","coordinates":[1,2]}}"""
    java.nio.file.Files.writeString(new java.io.File(d, "a.geojson").toPath,
      Seq(mk("alpha", "a"), mk("beta", "b")).mkString("\n"))
    java.nio.file.Files.writeString(new java.io.File(d, "b.geojson").toPath,
      Seq(mk("gamma", "a"), mk("delta", null), mk("epsilon", "b"), mk("zeta", "a")).mkString("\n"))
    d.getAbsolutePath
  }

  private def xml() = spark.read.format("graft-xml").option("recordTag", "r").load(xmlDir)
  private def geo() = spark.read.format("graft-geojson").option("multiLine", "false").load(geoDir)

  test("global count(*) with a pushed filter: aggregation reaches the scan") {
    for (src <- Seq(() => xml(), () => geo())) {
      val df = src().where(col("name") > "b").agg(count(lit(1)).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)]"), plan)
      assert(plan.contains("GreaterThan(name,b)"), plan)
      // beta/gamma/delta/epsilon/zeta > "b": 5 of 6
      assert(df.head().getLong(0) == 5L, df.head().toString)
    }
  }

  test("count(*) over an empty match is 0, not empty") {
    val df = xml().where(col("name") === "no-such").agg(count(lit(1)).as("n"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregation"), "expected pushdown")
    assert(df.head().getLong(0) == 0L)
  }

  test("GROUP BY + count/count(col)/min/max matches Spark's own aggregation") {
    for (src <- Seq(() => xml(), () => geo())) {
      val pushed = src().groupBy("kind")
        .agg(count(lit(1)).as("n"), count(col("kind")).as("nk"),
          min("name").as("mn"), max("name").as("mx"))
      val plan = pushed.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation") && plan.contains("PushedGroupBy: [kind]"), plan)

      // baseline: aggregate the raw rows in Scala
      val raw = src().select("kind", "name").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val expected = raw.groupBy(_._1).map { case (k, rs) =>
        val names = rs.map(_._2)
        (k, rs.length.toLong, rs.count(_._1 != null).toLong, names.min, names.max)
      }.toSet
      val got = pushed.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toSet
      assert(got == expected, s"got=$got expected=$expected")
    }
  }

  test("unsupported aggregates fall back cleanly (no pushdown, same answer)") {
    // count(DISTINCT kind) is not pushed; result must still be right
    val distinct = xml().agg(countDistinct(col("kind")).as("n"))
    assert(!distinct.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(distinct.head().getLong(0) == 2L)
    // avg over a string-typed source column: not pushable, still correct
    val avgQ = geo().agg(avg(length(col("name"))).as("a"))
    assert(!avgQ.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(math.abs(avgQ.head().getDouble(0) - (5 + 4 + 5 + 5 + 7 + 4) / 6.0) < 1e-9)
  }

  test("min/max combine correctly across files in UTF8 order") {
    val df = xml().agg(min("name").as("mn"), max("name").as("mx"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregation"), "expected pushdown")
    val r = df.head()
    assert(r.getString(0) == "alpha" && r.getString(1) == "zeta")
  }
}

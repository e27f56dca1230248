package graft.sources

import graft.SparkTestBase
import graft.sources.snapshot.SnapshotRelation
import graft.streaming.UpsertSink
import org.apache.spark.sql.sources._

import java.nio.file.Files

/** The sink store as a registered table (`graft-snapshot`): SQL and
  * DataFrame reads resolve the committed snapshot, WHERE-clause key
  * equality prunes to the routed buckets at the FILE level (witnessed
  * on the relation's inner plan), residual predicates re-apply above
  * the scan, and `versionAsOf` pins history. */
class SnapshotRelationSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 8

  private def store(): String = {
    val path = Files.createTempDirectory("graft-snap-rel").toString
    val b0 = (1L to 40L).map(k => (k, 1L, "I", s"v$k"))
    val b1 = Seq((6L, 2L, "U", "v6.2"), (10L, 2L, "D", null),
      (41L, 2L, "I", "v41"))
    UpsertSink.applyBatch(spark, path, "id", "seq", "op", Seq("v"), B)(
      b0.toDF("id", "seq", "op", "v"), 0)
    UpsertSink.applyBatch(spark, path, "id", "seq", "op", Seq("v"), B)(
      b1.toDF("id", "seq", "op", "v"), 1)
    path
  }

  private def bucketsOf(files: Array[String]): Set[Int] =
    files.flatMap(f =>
      "__bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)).toSet

  test("format read and SQL view both equal the API snapshot") {
    val path = store()
    val want = UpsertSink.readSnapshot(spark, path)
      .as[(Long, String)].collect().sorted.toSeq
    val viaFormat = spark.read.format("graft-snapshot").load(path)
      .as[(Long, String)].collect().sorted.toSeq
    assert(viaFormat === want)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW snap_rel_v
         |USING `graft-snapshot` OPTIONS (path '$path')""".stripMargin)
    val viaSql = spark.sql("SELECT id, v FROM snap_rel_v")
      .as[(Long, String)].collect().sorted.toSeq
    assert(viaSql === want)
    assert(want.size === 40) // 40 inserts - 1 delete + 1 insert
    assert(want.contains((6L, "v6.2")) && !want.exists(_._1 == 10L))
  }

  test("a pushed key IN prunes the scan to the routed buckets") {
    val path = store()
    val rel = SnapshotRelation(spark, path, None)
    val m = UpsertSink.readManifest(path).get
    val keys = Array[Any](6L, 41L)
    val wanted = keys.map(k => UpsertSink.bucketOfLiteral(m, k)).toSet
    val inner = rel.scanFrame(Array("id", "v"),
      Array(In("id", keys)))
    assert(bucketsOf(inner.inputFiles) === wanted)
    assert(bucketsOf(inner.inputFiles).size < m.buckets.size)
    // and through SQL end-to-end the rows are exact
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW snap_rel_p
         |USING `graft-snapshot` OPTIONS (path '$path')""".stripMargin)
    val got = spark.sql(
      "SELECT id, v FROM snap_rel_p WHERE id IN (6, 41, 10, 999)")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((6L, "v6.2"), (41L, "v41")))
  }

  test("filter translation: EqualTo routes, AND narrows, OR widens, " +
      "non-key predicates read everything") {
    val path = store()
    val rel = SnapshotRelation(spark, path, None)
    val m = UpsertSink.readManifest(path).get
    def buckets(fs: Filter*): Set[Int] =
      bucketsOf(rel.scanFrame(Array("id"), fs.toArray).inputFiles)
    val b6 = UpsertSink.bucketOfLiteral(m, 6L)
    val b7 = UpsertSink.bucketOfLiteral(m, 7L)
    assert(buckets(EqualTo("id", 6L)) === Set(b6))
    // conjunct list intersects: two different-key equalities read nothing
    if (b6 != b7) assert(buckets(EqualTo("id", 6L), EqualTo("id", 7L)).isEmpty)
    assert(buckets(Or(EqualTo("id", 6L), EqualTo("id", 7L))) === Set(b6, b7))
    // Or with an unroutable side must NOT prune
    assert(buckets(Or(EqualTo("id", 6L), GreaterThan("id", 0L)))
      === m.buckets.keySet)
    // And with an unroutable side keeps the routable side's pruning
    assert(buckets(And(EqualTo("id", 6L), IsNotNull("v"))) === Set(b6))
    assert(buckets(GreaterThan("id", 0L)) === m.buckets.keySet)
    // IN with a NULL among the values routes the non-null ones
    assert(buckets(In("id", Array[Any](6L, null))) === Set(b6))
    // scanFrame PRUNES, it never filters rows (Spark re-applies every
    // filter above the scan — unhandledFilters): the pruned frame holds
    // bucket b6's full content, and the probed row is among it
    val pruned = rel.scanFrame(Array("id", "v"),
        Array(And(EqualTo("id", 6L), IsNotNull("v"))))
      .as[(Long, String)].collect().toSeq
    assert(pruned.contains((6L, "v6.2")))
    assert(pruned.forall { case (k, _) =>
      UpsertSink.bucketOfLiteral(m, k) == b6 })
    // residuals stay correct END-TO-END: through SQL the engine
    // re-applies the unroutable conjunct above the pruned scan
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW snap_rel_r
         |USING `graft-snapshot` OPTIONS (path '$path')""".stripMargin)
    val got = spark.sql(
      "SELECT id, v FROM snap_rel_r WHERE id = 6 AND v IS NOT NULL " +
        "AND length(v) > 2")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((6L, "v6.2")))
  }

  test("translatable filters reach the INNER parquet scan as PushedFilters") {
    val path = store()
    val rel = SnapshotRelation(spark, path, None)
    // a non-key range predicate: no bucket routing, but the inner plan
    // must carry it into the parquet scan so row-group stats can skip
    val inner = rel.scanFrame(Array("id", "v"),
      Array(GreaterThan("id", 20L), IsNotNull("v")))
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,20)"),
      s"no pushed filter in inner plan:\n$plan")
    assert(inner.as[(Long, String)].collect().forall(_._1 > 20))
  }

  test("filter translation is semantically exact: view WHERE == API WHERE " +
      "over Not/Or/In/null shapes") {
    val path = store()
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW snap_rel_d
         |USING `graft-snapshot` OPTIONS (path '$path')""".stripMargin)
    UpsertSink.readSnapshot(spark, path).createOrReplaceTempView("snap_api_d")
    for (where <- Seq(
        "id > 35 OR v = 'v2'",
        "NOT (id > 5 AND id < 38)",
        "id IN (1, 2, NULL)",
        "v NOT IN ('v1', 'v2')",
        "NOT (v LIKE 'v1%')",
        "v LIKE '%6.2' AND id >= 6",
        "id BETWEEN 4 AND 9",
        "v IS NOT NULL AND NOT (id = 6)")) {
      val got = spark.sql(s"SELECT id, v FROM snap_rel_d WHERE $where")
        .as[(Long, String)].collect().sorted.toSeq
      val want = spark.sql(s"SELECT id, v FROM snap_api_d WHERE $where")
        .as[(Long, String)].collect().sorted.toSeq
      assert(got === want, s"WHERE $where: $got != $want")
    }
  }

  test("versionAsOf pins a historical snapshot; unknown options fail loudly") {
    val path = store()
    val v0 = spark.read.format("graft-snapshot")
      .option("versionAsOf", "0").load(path)
      .as[(Long, String)].collect().sorted.toSeq
    assert(v0.size === 40 && v0.contains((6L, "v6")) &&
      v0.contains((10L, "v10")) && !v0.exists(_._1 == 41L))
    // SQL spelling of the same pin
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW snap_rel_v0
         |USING `graft-snapshot`
         |OPTIONS (path '$path', versionAsOf '0')""".stripMargin)
    assert(spark.sql("SELECT v FROM snap_rel_v0 WHERE id = 10")
      .as[String].collect().toSeq === Seq("v10"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot")
        .option("versionAsOf", "nope").load(path).collect()
    }
    assert(e.getMessage.contains("versionAsOf"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").options(Map.empty[String, String])
        .load().collect()
    }
    assert(e2.getMessage.contains("path"))
  }

  test("the view binds one committed version: later applies are invisible " +
      "until re-created; count(*) works over the empty projection") {
    val path = store()
    val df = spark.read.format("graft-snapshot").load(path)
    assert(df.count() === 40)
    UpsertSink.applyBatch(spark, path, "id", "seq", "op", Seq("v"), B)(
      Seq((42L, 3L, "I", "v42")).toDF("id", "seq", "op", "v"), 2)
    // the bound relation still reads its creation-time manifest
    assert(df.count() === 40)
    assert(spark.read.format("graft-snapshot").load(path).count() === 41)
  }
}

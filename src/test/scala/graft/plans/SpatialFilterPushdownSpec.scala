package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

/** Automatic spatial-predicate pushdown: a plain-SQL spatial WHERE over the
  * graft document sources must prune records at parse time (derived bbox on
  * the scan) with NO manual `.option("bbox", …)`, and must return exactly
  * what Spark's own post-scan evaluation returns (reference pushes the same
  * selections into its backend query — extension/xml_extension.ts:1313). */
class SpatialFilterPushdownSpec extends SparkTestBase {

  private lazy val xmlDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-spush-xml").toFile
    d.deleteOnExit()
    // points on a line: (0,0), (1,1), … (9,9); record 10 has no geometry
    val docs = (0 to 9).map { i =>
      s"""<col><r><name>p$i</name><gml:Point xmlns:gml="http://www.opengis.net/gml"><gml:coordinates>$i,$i</gml:coordinates></gml:Point></r></col>"""
    } :+ """<col><r><name>nogeom</name></r></col>"""
    docs.zipWithIndex.foreach { case (x, i) =>
      java.nio.file.Files.writeString(new java.io.File(d, s"doc$i.xml").toPath, x)
    }
    d.getAbsolutePath
  }

  private lazy val geoDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-spush-geo").toFile
    d.deleteOnExit()
    val features = (0 to 9).map { i =>
      s"""{"type":"Feature","properties":{"name":"p$i"},"geometry":{"type":"Point","coordinates":[$i,$i]}}"""
    }
    java.nio.file.Files.writeString(new java.io.File(d, "pts.geojson").toPath,
      features.mkString("\n"))
    d.getAbsolutePath
  }

  private def xml() = spark.read.format("graft-xml").option("recordTag", "r").load(xmlDir)
  private def geo() = spark.read.format("graft-geojson").option("multiLine", "false").load(geoDir)

  test("WHERE ST_Within(geometry, literal) derives a bbox on the graft-xml scan") {
    val df = xml().where(
      call_function("st_within", col("geometry"),
        call_function("st_geomfromtext", lit("POLYGON((-0.5 -0.5, 2.5 -0.5, 2.5 2.5, -0.5 2.5, -0.5 -0.5))"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bbox: [-0.5,-0.5,2.5,2.5]"), plan)
    assert(df.select("name").collect().map(_.getString(0)).sorted.toSeq == Seq("p0", "p1", "p2"))
  }

  test("WHERE ST_DWithin expands the derived bbox by the radius (graft-geojson)") {
    val df = geo().where(
      call_function("st_dwithin", col("geometry"),
        call_function("st_point", lit(5.0), lit(5.0)), lit(1.5)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bbox: [3.5,3.5,6.5,6.5]"), plan)
    // within euclidean distance 1.5 of (5,5): (4,4), (5,5), (6,6) at d≈1.414
    assert(df.select("name").collect().map(_.getString(0)).sorted.toSeq == Seq("p4", "p5", "p6"))
  }

  test("ST_Distance comparison and reversed-argument predicates push too") {
    val df = xml().where(
      call_function("st_distance", col("geometry"),
        call_function("st_point", lit(0.0), lit(0.0))) < lit(2.0))
    assert(df.queryExecution.executedPlan.toString.contains("bbox: [-2.0,-2.0,2.0,2.0]"))
    assert(df.count() == 2) // (0,0) and (1,1); (2,2) is at distance 2.83

    val rev = xml().where(
      call_function("st_contains",
        call_function("st_makeenvelope", lit(6.5), lit(6.5), lit(9.5), lit(9.5)),
        col("geometry")))
    assert(rev.queryExecution.executedPlan.toString.contains("bbox: [6.5,6.5,9.5,9.5]"))
    assert(rev.count() == 3) // p7, p8, p9
  }

  test("every recognized predicate derives the bbox in BOTH argument orders") {
    // the reference pushes geo:within with either operand order
    // (extension/basex/basex_extension.ts:46 supportedSpatialFunctionPrefix);
    // envelope-intersection pruning is order-symmetric for every relation
    val box = call_function("st_makeenvelope", lit(1.5), lit(1.5), lit(4.5), lit(4.5))
    val cases: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)] = Seq(
      ("st_within", call_function("st_within", col("geometry"), box),
        call_function("st_within", box, col("geometry"))),
      ("st_contains", call_function("st_contains", col("geometry"), box),
        call_function("st_contains", box, col("geometry"))),
      ("st_coveredby", call_function("st_coveredby", col("geometry"), box),
        call_function("st_coveredby", box, col("geometry"))),
      ("st_covers", call_function("st_covers", col("geometry"), box),
        call_function("st_covers", box, col("geometry"))),
      ("st_intersects", call_function("st_intersects", col("geometry"), box),
        call_function("st_intersects", box, col("geometry"))))
    for ((name, fwd, rev) <- cases; pred <- Seq(fwd, rev)) {
      val plan = xml().where(pred).queryExecution.executedPlan.toString
      assert(plan.contains("bbox: [1.5,1.5,4.5,4.5]"), s"$name: $plan")
    }
    // distance-comparison forms: radius on either side of the comparison
    val dist = call_function("st_distance", col("geometry"),
      call_function("st_point", lit(5.0), lit(5.0)))
    for (pred <- Seq(dist <= lit(1.5), lit(1.5) >= dist)) {
      val plan = geo().where(pred).queryExecution.executedPlan.toString
      assert(plan.contains("bbox: [3.5,3.5,6.5,6.5]"), plan)
    }
  }

  test("conjuncts intersect envelopes; disjoint constraints yield the empty scan") {
    val both = xml().where(
      call_function("st_intersects", col("geometry"),
        call_function("st_makeenvelope", lit(0.0), lit(0.0), lit(5.0), lit(5.0))) &&
      call_function("st_intersects", col("geometry"),
        call_function("st_makeenvelope", lit(3.0), lit(3.0), lit(9.0), lit(9.0))))
    assert(both.queryExecution.executedPlan.toString.contains("bbox: [3.0,3.0,5.0,5.0]"))
    assert(both.count() == 3) // (3,3), (4,4), (5,5)

    val disjoint = xml().where(
      call_function("st_within", col("geometry"),
        call_function("st_makeenvelope", lit(0.0), lit(0.0), lit(2.0), lit(2.0))) &&
      call_function("st_within", col("geometry"),
        call_function("st_makeenvelope", lit(7.0), lit(7.0), lit(9.0), lit(9.0))))
    assert(disjoint.queryExecution.executedPlan.toString.contains("bbox: [empty]"))
    assert(disjoint.count() == 0)
  }

  test("a user-supplied bbox option is tightened, not clobbered") {
    val df = spark.read.format("graft-xml").option("recordTag", "r")
      .option("bbox", "0,0,8,8").load(xmlDir)
      .where(call_function("st_within", col("geometry"),
        call_function("st_makeenvelope", lit(4.0), lit(4.0), lit(20.0), lit(20.0))))
    assert(df.queryExecution.executedPlan.toString.contains("bbox: [4.0,4.0,8.0,8.0]"))
    assert(df.count() == 4) // (5,5) … (8,8): (4,4) is ON the boundary, not within
  }

  test("pushdown equivalence: results identical with the rule disabled") {
    import org.apache.spark.sql.Column
    val preds: Seq[() => Column] = Seq(
      () => call_function("st_within", col("geometry"),
        call_function("st_geomfromtext", lit("POLYGON((1.5 1.5, 6.5 1.5, 6.5 6.5, 1.5 6.5, 1.5 1.5))"))),
      () => call_function("st_intersects",
        call_function("st_makeenvelope", lit(2.0), lit(2.0), lit(4.0), lit(4.0)), col("geometry")),
      () => call_function("st_dwithin", col("geometry"),
        call_function("st_point", lit(9.0), lit(9.0)), lit(3.0)),
      () => lit(7.0) > call_function("st_distance", col("geometry"),
        call_function("st_point", lit(0.0), lit(0.0))),
      // geometry on both sides / non-literal argument: must NOT push, must not break
      () => call_function("st_within", col("geometry"), col("geometry")))
    for (mk <- preds; src <- Seq(() => xml(), () => geo())) {
      val pushed = src().where(mk()).select("name").collect().map(_.getString(0)).sorted.toSeq
      spark.conf.set("spark.graft.spatialPushdown.enabled", "false")
      val baseline = try src().where(mk()).select("name").collect().map(_.getString(0)).sorted.toSeq
        finally spark.conf.set("spark.graft.spatialPushdown.enabled", "true")
      assert(pushed == baseline, s"pushed=$pushed baseline=$baseline")
    }
  }

  test("pre-scan-planning arm: the rule rewrites DataSourceV2Relation options") {
    // the spark.sql.extensions path runs the rule before V2 scan planning;
    // apply it directly to the analyzed plan to exercise that arm
    val analyzed = xml().where(
      call_function("st_within", col("geometry"),
        call_function("st_makeenvelope", lit(1.0), lit(2.0), lit(3.0), lit(4.0))))
      .queryExecution.analyzed
    val rewritten = SpatialFilterPushdown()(analyzed)
    val bbox = rewritten.collect {
      case Filter(_, r: DataSourceV2Relation) => Option(r.options.get("bbox"))
    }.flatten
    assert(bbox == Seq("1.0,2.0,3.0,4.0"), rewritten.toString)
  }

  test("a malformed user-supplied bbox option aborts pushdown, not planning") {
    // wrong arity and non-numeric specs must not throw inside the optimizer
    // rule; the plan keeps the user's option untouched (the scan's own
    // require() owns reporting it if the query is ever executed)
    for (bad <- Seq("0,0,8", "a,b,c,d")) {
      val analyzed = spark.read.format("graft-xml").option("recordTag", "r")
        .option("bbox", bad).load(xmlDir)
        .where(call_function("st_within", col("geometry"),
          call_function("st_makeenvelope", lit(0.0), lit(0.0), lit(3.0), lit(3.0))))
        .queryExecution.analyzed
      val rewritten = SpatialFilterPushdown()(analyzed) // must not throw
      val bbox = rewritten.collect {
        case Filter(_, r: DataSourceV2Relation) => Option(r.options.get("bbox"))
      }.flatten
      assert(bbox == Seq(bad), s"bad spec must stay untouched, got $bbox")
    }
  }

  test("non-spatial filters and other sources are untouched") {
    val df = xml().where(col("name") === "p3")
    assert(!df.queryExecution.executedPlan.toString.contains("bbox"), "no bbox expected")
    assert(df.count() == 1)
    // parquet scan: rule must ignore non-graft relations entirely
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(5)
    assert(lineitem.count() == 5)
  }
}

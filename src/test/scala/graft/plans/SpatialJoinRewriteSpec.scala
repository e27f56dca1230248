package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The optimizer rule must turn spatial-predicate joins into grid
  * equi-joins (no cartesian) with unchanged results. */
class SpatialJoinRewriteSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.SparkEntry.init(spark, sfDir)
    spark.sql(
      "SELECT c_custkey, ST_Point(c_acctbal / 100.0, CAST(c_custkey % 97 AS DOUBLE)) AS cg FROM customer")
      .createOrReplaceTempView("cpts")
    spark.sql(
      "SELECT s_suppkey, ST_Point(s_acctbal / 100.0, CAST(s_suppkey % 97 AS DOUBLE)) AS sg FROM supplier")
      .createOrReplaceTempView("spts")
  }

  test("ST_DWithin join plans as equi-join and matches brute force") {
    val q = "SELECT c_custkey, s_suppkey FROM cpts JOIN spts ON ST_DWithin(cg, sg, 5.0)"
    val df = spark.sql(q)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)

    val brute = spark.table("cpts").crossJoin(spark.table("spts"))
      .where(call_function("st_dwithin", col("cg"), col("sg"), lit(5.0)))
      .select("c_custkey", "s_suppkey")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && df.count() == want.size)
  }

  test("ST_DWithin join with extra conjunct keeps the residual filter") {
    val q = """SELECT c_custkey, s_suppkey FROM cpts JOIN spts
              |ON ST_DWithin(cg, sg, 5.0) AND c_custkey % 2 = 0""".stripMargin
    val df = spark.sql(q)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(df.collect().forall(_.getLong(0) % 2 == 0))
  }

  test("ST_Intersects join rewrites with configurable cell size") {
    spark.conf.set("spark.graft.spatialJoin.cellSize", "4.0")
    val q = """SELECT c_custkey, s_suppkey FROM
              |  (SELECT c_custkey, ST_MakeEnvelope(ST_X(cg), ST_Y(cg), ST_X(cg) + 2.0, ST_Y(cg) + 2.0) AS cb FROM cpts) a
              |JOIN
              |  (SELECT s_suppkey, ST_MakeEnvelope(ST_X(sg) - 1.0, ST_Y(sg) - 1.0, ST_X(sg) + 1.0, ST_Y(sg) + 1.0) AS sb FROM spts) b
              |ON ST_Intersects(cb, sb)""".stripMargin
    val df = spark.sql(q)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(df.count() > 0)
  }

  test("ST_Distance comparison joins rewrite like ST_DWithin") {
    // the reference's own join predicate shape (WHERE distance < r across
    // two collections) — both comparison orientations, plus WHERE-clause
    // form (filter pushed into the join condition by the optimizer)
    for (q <- Seq(
      "SELECT c_custkey, s_suppkey FROM cpts JOIN spts ON ST_Distance(cg, sg) < 5.0",
      "SELECT c_custkey, s_suppkey FROM cpts JOIN spts ON 5.0 >= ST_Distance(cg, sg)",
      "SELECT c_custkey, s_suppkey FROM cpts, spts WHERE ST_Distance(cg, sg) <= 5.0")) {
      val df = spark.sql(q)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"$q\n$p")
      assert(df.count() > 0)
    }
    // result equality vs brute force for the strict form
    val got = spark.sql(
      "SELECT c_custkey, s_suppkey FROM cpts JOIN spts ON ST_Distance(cg, sg) < 5.0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.table("cpts").crossJoin(spark.table("spts"))
      .where(call_function("st_distance", col("cg"), col("sg")) < 5.0)
      .select("c_custkey", "s_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("reversed argument order still splits sides correctly") {
    val q = "SELECT c_custkey, s_suppkey FROM cpts JOIN spts ON ST_DWithin(sg, cg, 5.0)"
    val df = spark.sql(q)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(df.count() > 0)
  }
}

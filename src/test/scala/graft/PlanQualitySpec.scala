package graft

import org.apache.spark.sql.functions._

/** Scale-readiness checks on the physical plans: filters and projections
  * must reach the parquet scan, geometry expressions must stay inside
  * WholeStageCodegen, and small-side joins must broadcast. */
class PlanQualitySpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    SparkEntry.init(spark, sfDir)
  }

  test("filter pushdown reaches the parquet scan") {
    val df = spark.sql(
      "SELECT c_custkey FROM customer WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING'")
    val p = plan(df)
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(c_acctbal,1000"), p)
  }

  test("column pruning: scan reads only referenced columns") {
    val df = spark.sql("SELECT c_custkey FROM customer WHERE c_acctbal > 1000")
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_acctbal:double>"), p)
  }

  test("geometry expressions run inside WholeStageCodegen") {
    val df = spark.sql(
      """SELECT ST_Distance(ST_Point(c_acctbal / 100.0, 1.0), ST_Point(0.0, 0.0)) AS d
        |FROM customer WHERE ST_X(ST_Point(c_acctbal / 100.0, 1.0)) > 5.0""".stripMargin)
    val p = plan(df)
    // "*(n)" marks operators compiled into a WholeStageCodegen stage; the
    // Project/Filter containing the ST_ calls must carry it
    assert(p.contains("*(1) Project [stdistance"), p)
    assert(p.contains("*(1) Filter"), p)
  }

  test("dimension join broadcasts the small side") {
    val df = spark.sql(
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""".stripMargin)
    assert(plan(df).contains("BroadcastHashJoin"), plan(df))
  }

  test("spatial grid join is an equi-join on cell id, not a cartesian product") {
    val cust = spark.sql("SELECT c_custkey, ST_Point(c_acctbal / 100.0, 1.0) AS cgeom FROM customer")
    val supp = spark.sql("SELECT s_suppkey, ST_Point(s_acctbal / 100.0, 1.0) AS sgeom FROM supplier")
    val joined = operators.SpatialJoin.distanceJoin(cust, "cgeom", supp, "sgeom", 5.0, 5.0)
    val p = plan(joined)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("entry flagship runs and returns rows") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
  }

  test("LSH kNN join plans as bucket equi-joins, not a cartesian product") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = operators.Ann.knnJoinLsh(embs, "vec_id", "embedding",
      embs, "vec_id", "embedding", k = 3)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding dedup plans as bucket equi-joins, not a cartesian product") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = operators.Dedup.embeddingPairs(embs, "vec_id", "embedding",
      minCosine = 0.9, planes = 8, tables = 4)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("minhash candidate stage (plain and salted) avoids cartesian products") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (cap <- Seq(0, 64)) {
      val p = plan(operators.Dedup.minhashPairs(docs, "doc_id", "text", saltCap = cap))
      assert(!p.contains("CartesianProduct"), s"saltCap=$cap: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"saltCap=$cap: $p")
    }
  }

  test("UpsertSink snapshot reads are real parquet scans: filters push " +
      "down, columns prune, grouped read stays union-of-dirs wide") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("plan-sink").toString
    val applyB = streaming.UpsertSink.applyBatch(
      spark, path, "id", "seq", "op", Seq("v", "w"), 8) _
    applyB((1L to 200L).map(i => (i, 1L, "I", s"v$i", i * 2))
      .toDF("id", "seq", "op", "v", "w"), 0)
    applyB(Seq((7L, 2L, "U", "V7", 14L)).toDF("id", "seq", "op", "v", "w"), 1)

    val df = streaming.UpsertSink.readSnapshot(spark, path)
      .where(col("id") > 100L).select("id", "v")
    val p = plan(df)
    // the snapshot is plain parquet behind a manifest: predicate pushdown
    // and column pruning must survive the union-of-delta-dirs read —
    // a snapshot read that rescans all payload columns for a 2-column
    // projection would be wrong at any scale
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,100)"), p)
    assert(p.contains("ReadSchema: struct<id:bigint,v:string>"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(df.count() == 100)

    // time-travel reads plan identically (same scan machinery, older
    // manifest)
    val p0 = plan(streaming.UpsertSink.readSnapshotAt(spark, path, 0)
      .where(col("id") > 100L).select("id", "v"))
    assert(p0.contains("ReadSchema: struct<id:bigint,v:string>"), p0)
  }
}

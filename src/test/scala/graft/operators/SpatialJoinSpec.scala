package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Grid-partitioned spatial join must return exactly the brute-force result
  * (no duplicates from multi-cell candidates, no misses at cell borders). */
class SpatialJoinSpec extends SparkTestBase {

  private lazy val cust = spark.sql(
    "SELECT c_custkey, ST_Point(c_acctbal / 100.0, CAST(c_custkey % 97 AS DOUBLE)) AS cgeom FROM customer")
  private lazy val supp = spark.sql(
    "SELECT s_suppkey, ST_Point(s_acctbal / 100.0, CAST(s_suppkey % 97 AS DOUBLE)) AS sgeom FROM supplier")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("customer")
    spark.read.parquet(s"$sfDir/supplier.parquet").createOrReplaceTempView("supplier")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("distance join equals brute force, at several cell sizes") {
    val brute = cust.crossJoin(supp)
      .where(call_function("st_dwithin", col("cgeom"), col("sgeom"), lit(5.0)))
    val expected = pairsOf(brute)
    assert(expected.nonEmpty, "test setup: brute force should find pairs")
    for (cellSize <- Seq(2.5, 5.0, 20.0)) {
      val grid = SpatialJoin.distanceJoin(cust, "cgeom", supp, "sgeom", 5.0, cellSize)
      assert(pairsOf(grid) == expected, s"cellSize=$cellSize")
      // exactly-once: no dup pairs before any dedup
      assert(grid.count() == expected.size, s"duplicates at cellSize=$cellSize")
    }
  }

  test("knnJoin equals the brute-force window top-k") {
    import org.apache.spark.sql.expressions.Window
    val brute = cust.crossJoin(supp)
      .withColumn("d", call_function("st_distance", col("cgeom"), col("sgeom")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("c_custkey").orderBy(col("d"), col("s_suppkey"))))
      .where(col("rk") <= 3)
      .select(col("c_custkey"), col("s_suppkey"), col("d"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = SpatialJoin.knnJoin(cust, "cgeom", "c_custkey",
        supp, "sgeom", "s_suppkey", k = 3)
      .select(col("c_custkey"), col("s_suppkey"), col("knn_dist"), col("knn_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == brute)
  }

  test("knnJoin releases superseded round state and its result via releaseResults") {
    Dedup.releaseCaches(); Dedup.releaseResults() // drain earlier tests
    val sc = spark.sparkContext
    val baseline = sc.getPersistentRDDs.size
    val res = SpatialJoin.knnJoin(cust, "cgeom", "c_custkey",
      supp, "sgeom", "s_suppkey", k = 3)
    assert(res.count() > 0)
    // only the result's own `done` checkpoints may remain; the per-round
    // unresolved frames were freed as each round materialized
    val held = sc.getPersistentRDDs.size
    assert(held > baseline, "expected the result to hold checkpoint blocks")
    Dedup.releaseResults()
    assert(sc.getPersistentRDDs.size <= baseline,
      "releaseResults must free the knnJoin result's checkpoint blocks")
  }

  test("knnJoin: fewer right rows than k answers them all; empty right is empty") {
    val tiny = supp.limit(2)
    val got = SpatialJoin.knnJoin(cust.limit(5), "cgeom", "c_custkey",
        tiny, "sgeom", "s_suppkey", k = 10)
    assert(got.count() == 10) // 5 lefts × both right rows
    assert(got.groupBy("c_custkey").count().collect().forall(_.getLong(1) == 2))
    val none = SpatialJoin.knnJoin(cust.limit(5), "cgeom", "c_custkey",
        supp.limit(0), "sgeom", "s_suppkey", k = 3)
    assert(none.isEmpty)
    assert(none.columns.contains("knn_dist") && none.columns.contains("knn_rank"))
  }

  test("knnJoin resolves far-outlier left rows past the right extent") {
    // a left point far OUTSIDE the right span: the radius must expand
    // beyond the right side's own extent to reach its neighbors
    val far = spark.sql(
      "SELECT CAST(900000 AS BIGINT) AS c_custkey, ST_Point(5000.0, 5000.0) AS cgeom")
    val got = SpatialJoin.knnJoin(cust.limit(3).unionAll(far), "cgeom", "c_custkey",
        supp, "sgeom", "s_suppkey", k = 2)
    assert(got.where(col("c_custkey") === 900000L).count() == 2)
    assert(got.groupBy("c_custkey").count().count() == 4)
  }

  test("intersects join equals brute force for envelopes") {
    val lboxes = cust.select(col("c_custkey"),
      expr("ST_MakeEnvelope(ST_X(cgeom), ST_Y(cgeom), ST_X(cgeom) + 3.0, ST_Y(cgeom) + 3.0)").as("lg"))
    val rboxes = supp.select(col("s_suppkey"),
      expr("ST_MakeEnvelope(ST_X(sgeom) - 1.0, ST_Y(sgeom) - 1.0, ST_X(sgeom) + 1.0, ST_Y(sgeom) + 1.0)").as("rg"))
    val brute = lboxes.crossJoin(rboxes)
      .where(call_function("st_intersects", col("lg"), col("rg")))
    val expected = brute.select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val grid = SpatialJoin.intersectsJoin(lboxes, "lg", rboxes, "rg", cellSize = 4.0)
    val got = grid.select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(grid.count() == expected.size, "duplicates from multi-cell envelopes")
  }

  test("within join: points in constant polygons") {
    val boxes = spark.sql(
      """SELECT id, ST_MakeEnvelope(x0, y0, x0 + 30.0, y0 + 30.0) AS bg
        |FROM VALUES (1, 0.0, 0.0), (2, 25.0, 25.0), (3, 60.0, 60.0) AS t(id, x0, y0)""".stripMargin)
    val brute = cust.crossJoin(boxes)
      .where(call_function("st_within", col("cgeom"), col("bg")))
    val grid = SpatialJoin.withinJoin(cust, "cgeom", boxes, "bg", cellSize = 15.0)
    assert(grid.count() == brute.count())
  }

  test("auto cell size matches the explicit-size result (cellSize = 0)") {
    val brute = cust.crossJoin(supp)
      .where(call_function("st_dwithin", col("cgeom"), col("sgeom"), lit(5.0)))
    val auto = SpatialJoin.distanceJoin(cust, "cgeom", supp, "sgeom", 5.0)
    assert(pairsOf(auto) == pairsOf(brute))
    assert(auto.count() == brute.count(), "duplicates under the auto grid")
  }

  test("auto cell size stays sane on skewed inputs") {
    // Point side (zero extents) + a few country-sized polygons: a naive
    // median-of-all-extents would say 0 (explodes the grid); trusting the
    // polygons would say 50 (degrades to per-cell cartesian). The sizing
    // must produce a cell that keeps BOTH sides' per-row cell counts
    // bounded: points land in O(1) cells, and the replication of the big
    // envelopes is capped by extent/cell ≈ a handful per axis.
    val polys = spark.sql(
      """SELECT id, ST_MakeEnvelope(x0, y0, x0 + 50.0, y0 + 50.0) AS bg
        |FROM VALUES (1, 0.0, 0.0), (2, 30.0, 30.0), (3, 55.0, 5.0) AS t(id, x0, y0)""".stripMargin)
    val cs = SpatialJoin.autoCellSize(cust, "cgeom", polys, "bg", radius = 0.0)
    // dominated by the point side's median extent (0) → span/256 fallback
    // territory through the radius=0 path; must be positive and no larger
    // than the data span (≈110 on x, 97 on y)
    assert(cs > 0.0, s"auto cell size must be positive, got $cs")
    assert(cs <= 110.0, s"auto cell size wider than the data span: $cs")
    // per-row replication stays bounded on both sides
    val polyCells = polys.select(explode(call_function("grid_cells", col("bg"), lit(0.0), lit(cs))))
    assert(polyCells.count() <= 3L * 64L * 64L,
      s"polygon replication exploded at cell=$cs: ${polyCells.count()} cells for 3 rows")
    val ptCells = cust.select(explode(call_function("grid_cells", col("cgeom"), lit(0.0), lit(cs))))
    assert(ptCells.count() == cust.count(), "a point must land in exactly one cell")
    // and the join itself still returns the exact result
    val brute = cust.crossJoin(polys).where(call_function("st_within", col("cgeom"), col("bg")))
    assert(SpatialJoin.withinJoin(cust, "cgeom", polys, "bg").count() == brute.count())
  }

  test("dbscan equals a brute-force reference: roles, labels, determinism") {
    import spark.implicits._
    // three planted blobs + scattered noise, deterministic coordinates
    val rnd = new scala.util.Random(11)
    val blob = (cx: Double, cy: Double, base: Long, n: Int) => (0 until n).map(i =>
      (base + i, cx + rnd.nextDouble() * 2.0, cy + rnd.nextDouble() * 2.0))
    val points = blob(0.0, 0.0, 0L, 25) ++ blob(50.0, 0.0, 100L, 20) ++
      blob(0.0, 50.0, 200L, 3) ++ // too sparse for minPts at small eps
      (0 until 12).map(i => (300L + i, 200.0 + i * 40.0, 200.0 + i * 30.0))
    val df = points.toDF("id", "x", "y")
      .selectExpr("id", "ST_Point(x, y) AS geom").repartition(5)
    val eps = 1.5; val minPts = 4

    // brute-force DBSCAN with the operator's deterministic conventions
    def dist(a: (Double, Double), b: (Double, Double)) =
      math.sqrt((a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2))
    val coords = points.map(p => p._1 -> ((p._2, p._3))).toMap
    val ids = points.map(_._1)
    val nbrs = ids.map(i => i -> ids.filter(j =>
      dist(coords(i), coords(j)) <= eps).toSet).toMap
    val cores = ids.filter(i => nbrs(i).size >= minPts).toSet
    // components over core-core adjacency; label = min core id
    val label = scala.collection.mutable.Map.empty[Long, Long]
    cores.toSeq.sorted.foreach { c =>
      if (!label.contains(c)) {
        var frontier = Set(c); val comp = scala.collection.mutable.Set(c)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(f => nbrs(f).intersect(cores)).diff(comp.toSet)
          comp ++= frontier
        }
        val m = comp.min
        comp.foreach(x => label(x) = m)
      }
    }
    val want = ids.map { i =>
      if (cores(i)) (i, "core", Some(label(i)))
      else {
        val coreNbrs = nbrs(i).intersect(cores)
        if (coreNbrs.nonEmpty) (i, "border", Some(coreNbrs.map(label).min))
        else (i, "noise", None)
      }
    }.toSet

    val got = SpatialJoin.dbscan(df, "id", "geom", eps, minPts)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == want,
      s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    assert(got.count(_._2 == "core") >= 40 && got.exists(_._2 == "noise"), got.size)
    // determinism across partitionings
    val again = SpatialJoin.dbscan(df.repartition(2), "id", "geom", eps, minPts)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(again == got)
    // validation
    intercept[IllegalArgumentException] { SpatialJoin.dbscan(df, "id", "geom", 0.0, 3) }
    intercept[IllegalArgumentException] { SpatialJoin.dbscan(df, "id", "geom", 1.0, 0) }

    // minPts SWEEP over one eps-join: the pairs frame computes once and
    // both sweep points consume the checkpointed blocks — their plans
    // scan an ExistingRDD and contain NO grid spatial join
    val pairs = SpatialJoin.epsPairs(df, "id", "geom", eps)
    Seq(minPts, 8).foreach { mp =>
      val sweep = SpatialJoin.dbscanFromPairs(df, "id", "geom", pairs, mp)
      val p = sweep.queryExecution.executedPlan.toString
      assert(p.contains("ExistingRDD") && !p.contains("grid_cell_id"), p)
      val sweepRows = sweep.collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      val full = SpatialJoin.dbscan(df, "id", "geom", eps, mp)
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(sweepRows == full, s"minPts=$mp")
    }
    pairs.unpersist()

    // the one-arg dbscan result is SELF-CONTAINED: draining the shared
    // cache registry after the call must not strand it (the round-9
    // advice trap — a released checkpoint block cannot be recomputed)
    val safe = SpatialJoin.dbscan(df, "id", "geom", eps, minPts)
    graft.operators.Dedup.releaseCaches()
    assert(safe.count() == points.size.toLong)
  }
}

package graft.functions

import graft.SparkTestBase

class GeoAggregatesSpec extends SparkTestBase {

  test("st_union_agg unions grouped geometries (partial-agg safe)") {
    // 2×2 boxes at x = 0,1,2,…,9 on two groups; adjacent boxes overlap by 1
    val df = spark.sql(
      """SELECT id % 2 AS grp, ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0, CAST(id AS DOUBLE) + 2.0, 2.0) AS g
        |FROM range(10) t(id)""".stripMargin)
    df.createOrReplaceTempView("boxes")
    val out = spark.sql(
      """SELECT grp, ST_Area(ST_Union_Agg(g)) AS area FROM boxes GROUP BY grp ORDER BY grp""")
      .collect()
    // each group: 5 boxes at stride 2 → contiguous strip [x0, x0+10) × [0,2)
    assert(out.map(_.getAs[Double]("area")).toSeq == Seq(20.0, 20.0))
  }

  test("st_extent_agg returns the bounding envelope") {
    val out = spark.sql(
      """SELECT ST_XMin(e) AS x0, ST_YMin(e) AS y0, ST_XMax(e) AS x1, ST_YMax(e) AS y1
        |FROM (SELECT ST_Extent_Agg(ST_Point(CAST(id AS DOUBLE), CAST(id * 2 AS DOUBLE))) AS e
        |      FROM range(5) t(id)) t""".stripMargin).head()
    assert((out.getDouble(0), out.getDouble(1), out.getDouble(2), out.getDouble(3)) == (0.0, 0.0, 4.0, 8.0))
  }

  test("covered-rectangle skip: nested boxes do not change the union") {
    // one big box + 500 distinct boxes fully inside it, interleaved; union
    // must be exactly the big box (the covered arrivals take the fast path)
    val area = spark.sql(
      """SELECT ST_Area(ST_Union_Agg(g)) FROM (
        |  SELECT CASE WHEN id = 0 THEN ST_MakeEnvelope(0.0, 0.0, 100.0, 100.0)
        |              ELSE ST_MakeEnvelope(CAST(id % 90 AS DOUBLE), CAST(id % 80 AS DOUBLE),
        |                                   CAST(id % 90 AS DOUBLE) + 1.0, CAST(id % 80 AS DOUBLE) + 1.0)
        |         END AS g
        |  FROM range(501) t(id))""".stripMargin).head().getDouble(0)
    assert(area == 10000.0)
    // the skip must NOT fire for non-rectangles covered only by envelope:
    // a diagonal line's envelope covers the small box, but its geometry
    // does not — union area must include the box
    val mixed = spark.sql(
      """SELECT ST_Area(ST_Union_Agg(g)) FROM (
        |  SELECT ST_Buffer(ST_GeomFromText('LINESTRING (0 0, 100 100)'), 0.5) AS g
        |  UNION ALL
        |  SELECT ST_MakeEnvelope(80.0, 10.0, 81.0, 11.0))""".stripMargin).head().getDouble(0)
    assert(mixed > 1.0, s"small box must survive: $mixed") // buffer strip + disjoint box
  }

  test("st_union_agg raw-ship round trip: many partitions, duplicated inputs") {
    // the same 50 boxes repeated across 16 partitions: partials ship raw,
    // merge dedupes across partitions, one final union
    val area = spark.sql(
      """SELECT ST_Area(ST_Union_Agg(ST_MakeEnvelope(CAST(id % 50 AS DOUBLE), 0.0,
        |                                            CAST(id % 50 AS DOUBLE) + 1.0, 1.0)))
        |FROM (SELECT id FROM range(0, 800, 1, 16) t(id))""".stripMargin).head().getDouble(0)
    assert(area == 50.0)
  }

  test("st_union_agg over many rows exercises buffer collapse") {
    val area = spark.sql(
      """SELECT ST_Area(ST_Union_Agg(ST_MakeEnvelope(CAST(id % 100 AS DOUBLE), 0.0, CAST(id % 100 AS DOUBLE) + 1.0, 1.0)))
        |FROM range(1000) t(id)""".stripMargin).head().getDouble(0)
    assert(area == 100.0)
  }
}

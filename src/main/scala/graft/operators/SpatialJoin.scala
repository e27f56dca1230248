package graft.operators

import graft.Graft
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spatial join — grid-partitioned (PBSM-style).
  *
  * The reference evaluates spatial pair predicates by pushing one side down
  * to the document DB and finishing in PostGIS (reference:
  * src/getdata.ts:110, extension/basex/basex_extension.ts:385
  * constructSpatialFunctionTwoArgs). A single-node join like that can't
  * scale; here each geometry maps to the fixed-grid cells covering its
  * envelope (left side expanded by the join radius), candidates meet via a
  * hash equi-join on cell id — NO cartesian product, no driver collect —
  * and are refined with the exact JTS predicate.
  *
  * Duplicate candidate pairs (geometries spanning several common cells) are
  * eliminated with the standard reference-point rule: a pair is emitted only
  * from the one cell containing the top-left corner of the envelope
  * intersection, so no post-join `dropDuplicates` shuffle is needed.
  *
  * Scale notes (100 TB): both sides shuffle-partition by cell id → skew is
  * bounded by cell size (tune `cellSize` ≈ radius or median envelope);
  * AQE's skew-join splitting handles hot cells; a small right side is
  * broadcast automatically by Spark's size estimation.
  */
object SpatialJoin {

  /** Pairs within `radius`: refine = ST_DWithin(l, r, radius). */
  def distanceJoin(left: DataFrame, leftGeom: String,
                   right: DataFrame, rightGeom: String,
                   radius: Double, cellSize: Double): DataFrame =
    join(left, leftGeom, right, rightGeom, radius, cellSize,
      (lg, rg) => call_function("st_dwithin", lg, rg, lit(radius)))

  /** Intersecting pairs: refine = ST_Intersects(l, r). */
  def intersectsJoin(left: DataFrame, leftGeom: String,
                     right: DataFrame, rightGeom: String,
                     cellSize: Double): DataFrame =
    join(left, leftGeom, right, rightGeom, 0.0, cellSize,
      (lg, rg) => call_function("st_intersects", lg, rg))

  /** Left-geometry-within-right pairs: refine = ST_Within(l, r). */
  def withinJoin(left: DataFrame, leftGeom: String,
                 right: DataFrame, rightGeom: String,
                 cellSize: Double): DataFrame =
    join(left, leftGeom, right, rightGeom, 0.0, cellSize,
      (lg, rg) => call_function("st_within", lg, rg))

  private def join(left: DataFrame, leftGeom: String,
                   right: DataFrame, rightGeom: String,
                   radius: Double, cellSize: Double,
                   refine: (Column, Column) => Column): DataFrame = {
    require(leftGeom != rightGeom, "geometry columns must have distinct names")
    Graft.register(left.sparkSession)
    val cell = lit(cellSize)

    val l = left.withColumn("__cell",
      explode(call_function("grid_cells", col(leftGeom), lit(radius), cell)))
    val r = right.withColumn("__cell",
      explode(call_function("grid_cells", col(rightGeom), lit(0.0), cell)))

    // reference point: top-left corner of (left env expanded by radius) ∩ right env
    val refX = greatest(call_function("st_xmin", col(leftGeom)) - lit(radius),
                        call_function("st_xmin", col(rightGeom)))
    val refY = greatest(call_function("st_ymin", col(leftGeom)) - lit(radius),
                        call_function("st_ymin", col(rightGeom)))

    l.join(r, "__cell")
      .where(call_function("grid_cell_id", refX, refY, cell) === col("__cell"))
      .where(refine(col(leftGeom), col(rightGeom)))
      .drop("__cell")
  }
}

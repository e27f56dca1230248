package graft.operators

import graft.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid-partitioned parquet layout for spatial data at scale.
  *
  * Writing partitioned by coarse grid cell gives two things a 100 TB
  * deployment needs:
  *  - **partition pruning**: a query windowed to an envelope touches only
  *    the overlapping cells' files (visible as PartitionFilters in the
  *    scan);
  *  - **co-location**: two tables written with the same `cellSize` can be
  *    joined cell-to-cell without a full shuffle of either side.
  *
  * Cells are keyed by the geometry's envelope center — each row lands in
  * exactly one partition; window reads expand the query envelope by
  * `maxObjectExtent` (largest expected geometry radius) to not miss
  * geometries whose center sits in a neighboring cell.
  */
object SpatialStorage {

  /** Writes `df` as parquet partitioned by `grid_cell` of `geomCol`.
    * With `zorder = true`, rows inside each partition are additionally
    * sorted by the Morton code of a finer sub-grid (cellSize/256), so
    * envelope scans inside a cell touch contiguous row groups — min/max
    * column statistics on the z-key then prune within the file too. */
  def writeGridPartitioned(df: DataFrame, geomCol: String, path: String,
                           cellSize: Double, zorder: Boolean = false): Unit = {
    Graft.register(df.sparkSession)
    val cx = (call_function("st_xmin", col(geomCol)) + call_function("st_xmax", col(geomCol))) / 2
    val cy = (call_function("st_ymin", col(geomCol)) + call_function("st_ymax", col(geomCol))) / 2
    val withCell = df.withColumn("grid_cell",
      call_function("grid_cell_id", cx, cy, lit(cellSize)))
    val laidOut =
      if (zorder)
        withCell
          .withColumn("z_key", call_function("morton_key", cx, cy, lit(cellSize / 256.0)))
          .repartition(col("grid_cell"))
          .sortWithinPartitions("grid_cell", "z_key")
      else withCell
    laidOut.write.mode("overwrite").partitionBy("grid_cell").parquet(path)
  }

  /** Reads only the cells overlapping the query envelope (expanded by
    * `maxObjectExtent`), then applies the exact envelope intersection. */
  def readWindow(spark: SparkSession, path: String, cellSize: Double,
                 xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                 maxObjectExtent: Double = 0.0): DataFrame = {
    Graft.register(spark)
    val pad = maxObjectExtent
    val x0 = math.floor((xmin - pad) / cellSize).toInt
    val x1 = math.floor((xmax + pad) / cellSize).toInt
    val y0 = math.floor((ymin - pad) / cellSize).toInt
    val y1 = math.floor((ymax + pad) / cellSize).toInt
    val cells = for (cx <- x0 to x1; cy <- y0 to y1)
      yield (cx.toLong << 32) | (cy.toLong & 0xffffffffL)
    spark.read.parquet(path)
      .where(col("grid_cell").isin(cells: _*))
      .where(call_function("st_intersects", col("geometry"),
        call_function("st_makeenvelope", lit(xmin), lit(ymin), lit(xmax), lit(ymax))))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SpatialStorageSpec extends SparkTestBase {

  private lazy val pts = {
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("customer_ss")
    spark.sql(
      """SELECT c_custkey, ST_Point(c_acctbal / 100.0, CAST(c_custkey % 97 AS DOUBLE)) AS geometry
        |FROM customer_ss""".stripMargin)
  }

  test("grid-partitioned write prunes partitions on window reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-grid").toString
    SpatialStorage.writeGridPartitioned(pts, "geometry", dir, cellSize = 20.0)

    val window = SpatialStorage.readWindow(spark, dir, 20.0, 0.0, 0.0, 15.0, 15.0)
    val p = window.queryExecution.executedPlan.toString
    assert(p.split("PartitionFilters: \\[")(1).takeWhile(_ != ']').contains("grid_cell"), p)

    // correctness: equals a brute filter over the full data
    val brute = pts.where(call_function("st_intersects", col("geometry"),
      call_function("st_makeenvelope", lit(0.0), lit(0.0), lit(15.0), lit(15.0))))
    assert(window.count() == brute.count())
    assert(window.count() > 0)
  }

  test("zorder layout sorts within partitions by morton key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString
    SpatialStorage.writeGridPartitioned(pts, "geometry", dir, cellSize = 50.0, zorder = true)
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("z_key"))
    // keys are non-decreasing inside each file
    val mono = back.withColumn("f", input_file_name())
      .withColumn("prev", lag("z_key", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy(monotonically_increasing_id())))
      .where(col("prev").isNotNull && col("prev") > col("z_key"))
    assert(mono.count() == 0)
    assert(back.count() == pts.count())
  }
}

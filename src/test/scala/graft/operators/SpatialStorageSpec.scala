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

  test("geoParquet write on an empty frame completes without stamping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geopq-empty").toString
    SpatialStorage.writeGridPartitioned(pts.where(lit(false)), "geometry", dir,
      cellSize = 20.0, geoParquet = true) // must not NPE on the all-null bbox
    // an empty partitioned write yields no data files — nothing to stamp
    val files = new java.io.File(dir).listFiles()
    assert(files != null && !files.exists(_.getName.endsWith(".parquet")))
  }

  test("geoParquet write stamps the standard geo footer and stays readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geopq").toString
    SpatialStorage.writeGridPartitioned(pts, "geometry", dir, cellSize = 20.0,
      geoParquet = true)
    // plain parquet read still round-trips the data (footer swap is lossless)
    val back = spark.read.parquet(dir)
    assert(back.count() == pts.count())
    // every file carries the GeoParquet `geo` key with version, primary
    // column, WKB encoding, and the dataset bbox
    import org.apache.hadoop.conf.Configuration
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val files = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), new Configuration()))
      val geo = try r.getFooter.getFileMetaData.getKeyValueMetaData.get("geo")
        finally r.close()
      assert(geo != null, s"missing geo metadata in $f")
      assert(geo.contains("\"version\":\"1.1.0\""))
      assert(geo.contains("\"primary_column\":\"geometry\""))
      assert(geo.contains("\"encoding\":\"WKB\""))
      assert(geo.contains("\"bbox\":["))
    }
    // the stamped bbox matches the data's true extent
    val ext = pts.agg(
      min(call_function("st_xmin", col("geometry"))),
      max(call_function("st_xmax", col("geometry")))).head()
    val sample = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head.getAbsolutePath), new Configuration()))
      try r.getFooter.getFileMetaData.getKeyValueMetaData.get("geo") finally r.close()
    }
    assert(sample.contains(s"[${ext.getDouble(0)}"), sample)
  }

  test("footer stamp self-heals from a crashed previous stamp") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geopq-heal").toString
    SpatialStorage.writeGridPartitioned(pts, "geometry", dir, cellSize = 20.0,
      geoParquet = true)
    val files = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    // simulate the two crash states the swap can leave behind:
    // (a) crash between the renames — original gone, data only in .geo.bak
    val crashed = files.head
    val bak = new java.io.File(crashed.getParent, "." + crashed.getName + ".geo.bak")
    assert(crashed.renameTo(bak))
    // (b) a stale .bak next to an INTACT original (crash after tmp write,
    // before bak delete) — rename-to-existing would block the next stamp
    val stale = files.last
    val staleBak = new java.io.File(stale.getParent, "." + stale.getName + ".geo.bak")
    java.nio.file.Files.copy(stale.toPath, staleBak.toPath)
    // re-stamping the same directory must restore (a), clear (b), and
    // leave every file stamped and readable
    val ext = pts.agg(
      min(call_function("st_xmin", col("geometry"))),
      min(call_function("st_ymin", col("geometry"))),
      max(call_function("st_xmax", col("geometry"))),
      max(call_function("st_ymax", col("geometry")))).head()
    SpatialStorage.addGeoParquetMetadata(spark, dir, "geometry",
      ext.getDouble(0), ext.getDouble(1), ext.getDouble(2), ext.getDouble(3))
    assert(crashed.exists, "crashed file not restored from .geo.bak")
    assert(!bak.exists && !staleBak.exists, "backup leftovers not cleared")
    assert(spark.read.parquet(dir).count() == pts.count())
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

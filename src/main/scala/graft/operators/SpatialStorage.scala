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
    * column statistics on the z-key then prune within the file too.
    *
    * With `geoParquet = true`, every written file additionally carries the
    * GeoParquet (geoparquet.org spec) `geo` footer metadata — version,
    * primary column, WKB encoding, dataset bbox — so external engines
    * (GDAL/GeoPandas/DuckDB-spatial) recognize the output as spatial.
    * Costs one extra aggregate over `df` (the bbox) plus a distributed
    * raw byte-copy footer rewrite of the output (row groups are copied,
    * not re-encoded). */
  def writeGridPartitioned(df: DataFrame, geomCol: String, path: String,
                           cellSize: Double, zorder: Boolean = false,
                           geoParquet: Boolean = false): Unit = {
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
    if (geoParquet) {
      val bbox = df.agg(
        min(call_function("st_xmin", col(geomCol))),
        min(call_function("st_ymin", col(geomCol))),
        max(call_function("st_xmax", col(geomCol))),
        max(call_function("st_ymax", col(geomCol)))).head()
      // empty input: nothing was written, nothing to stamp (the aggregate
      // row is all-null and would NPE on getDouble)
      if (!bbox.isNullAt(0))
        addGeoParquetMetadata(df.sparkSession, path, geomCol,
          bbox.getDouble(0), bbox.getDouble(1), bbox.getDouble(2), bbox.getDouble(3))
    }
  }

  /** The GeoParquet `geo` footer JSON (spec 1.1.0): geometry stored as WKB
    * in `geomCol`, dataset-level bbox. */
  private[operators] def geoMetadataJson(geomCol: String, xmin: Double, ymin: Double,
                                         xmax: Double, ymax: Double): String =
    s"""{"version":"1.1.0","primary_column":"$geomCol","columns":{"$geomCol":""" +
      s"""{"encoding":"WKB","geometry_types":[],"bbox":[$xmin,$ymin,$xmax,$ymax]}}}"""

  /** Stamps the GeoParquet `geo` key/value metadata onto every parquet file
    * under `path`. Each file's row groups are APPENDED as raw bytes
    * (`ParquetFileWriter.appendFile` — no decode/re-encode) into a
    * hidden temp file whose footer carries the merged metadata, then
    * swapped in via a hidden backup (readers never see duplicate or
    * half-written data); the work is distributed one-task-per-file so the
    * pass scales with the cluster, not the driver. */
  def addGeoParquetMetadata(spark: SparkSession, path: String, geomCol: String,
                            xmin: Double, ymin: Double, xmax: Double, ymax: Double): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val listed = Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .filter(_.isFile).map(_.getPath).toArray
    // data files, plus the originals of any orphaned .geo.bak left by a
    // crashed previous stamp (the original is missing then — only the
    // backup still holds the bytes; stampGeoFooter restores it on entry)
    val files = (listed.filter(_.getName.endsWith(".parquet")) ++
        listed.filter(_.getName.endsWith(".geo.bak")).map { b =>
          new HPath(b.getParent,
            b.getName.stripPrefix(".").stripSuffix(".geo.bak"))
        })
      .map(_.toString).distinct
    val geoJson = geoMetadataJson(geomCol, xmin, ymin, xmax, ymax)
    // ship the session's Hadoop conf to executors — a bare `new
    // Configuration()` there would drop every spark.hadoop.* setting
    // (s3a credentials, endpoint/impl overrides) and fail on any
    // non-default filesystem
    val confEntries = {
      val c = spark.sparkContext.hadoopConfiguration
      val it = c.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    spark.sparkContext.parallelize(files.toIndexedSeq, math.max(1, files.length))
      .foreach { f =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        stampGeoFooter(f, geoJson, conf)
      }
  }

  private def stampGeoFooter(file: String, geoJson: String,
                             conf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val inPath = new HPath(file)
    // dot-prefixed working names: parquet/Spark directory listings skip
    // hidden files, so a reader never sees the half-written copy or counts
    // the same rows twice mid-swap
    val parent = inPath.getParent
    val tmpPath = new HPath(parent, "." + inPath.getName + ".geo.tmp")
    val bakPath = new HPath(parent, "." + inPath.getName + ".geo.bak")
    val fs = inPath.getFileSystem(conf)
    // self-heal from a previously crashed stamp: a crash between the two
    // swap renames leaves the original missing with the data intact under
    // .geo.bak — restore it and redo the stamp from scratch. Leftovers
    // from before the crash point (stale .bak/.tmp next to an intact
    // original) are deleted: rename-to-existing fails on HDFS/local FS,
    // so a stale .bak would otherwise block every future stamp.
    if (!fs.exists(inPath) && fs.exists(bakPath) &&
        !fs.rename(bakPath, inPath))
      throw new java.io.IOException(
        s"failed to restore $file from interrupted-stamp backup $bakPath")
    fs.delete(bakPath, false)
    fs.delete(tmpPath, false)
    val inFile = HadoopInputFile.fromPath(inPath, conf)
    val reader = ParquetFileReader.open(inFile)
    val (schema, kv) =
      try {
        val md = reader.getFooter.getFileMetaData
        (md.getSchema, new java.util.HashMap[String, String](md.getKeyValueMetaData))
      } finally reader.close()
    kv.put("geo", geoJson)
    val writer = new ParquetFileWriter(
      HadoopOutputFile.fromPath(tmpPath, conf), schema,
      ParquetFileWriter.Mode.OVERWRITE, 128L * 1024 * 1024, 0)
    writer.start()
    writer.appendFile(inFile)
    writer.end(kv)
    // swap via hidden backup: at no point do a visible original AND a
    // visible copy coexist, and the data survives a crash at any step
    // (both working names are hidden; a retry that finds the original
    // missing restores it from .geo.bak on entry, above)
    if (!fs.rename(inPath, bakPath) || !fs.rename(tmpPath, inPath))
      throw new java.io.IOException(s"failed to swap GeoParquet footer for $file")
    fs.delete(bakPath, false)
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

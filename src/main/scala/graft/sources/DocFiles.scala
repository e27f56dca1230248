package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Shared path handling for the graft-xml / graft-geojson DSv2 sources. */
private[sources] object DocFiles {

  /** Expands directories and glob patterns to concrete data files.
    * Glob-first (`globStatus` also resolves literal paths), so
    * `.load("/data/&#42;.xml")` works and a literal missing path still
    * fails with a clear error. Hidden/metadata files (`_SUCCESS`,
    * `.crc`) are skipped so directories written by Spark itself read
    * cleanly. */
  def listFiles(paths: Seq[String]): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched = fs.globStatus(path) match {
        case null => throw new java.io.FileNotFoundException(s"Path does not exist: $p")
        case arr  => arr.toSeq
      }
      val stats = matched.flatMap { s =>
        if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s)
      }
      stats.filter(s => s.isFile &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString)
    }
  }

  /** Spark encodes `.load(p1, p2, …)` as a JSON array under "paths". */
  def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      js.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    }
    multi.getOrElse(Option(options.get("path")).toSeq)
  }
}

/** Marker: a DSv2 table whose scan supports envelope (bbox) pruning of
  * records at parse time. Lets [[graft.plans.SpatialFilterPushdown]]
  * recognize graft document sources before the scan is built. */
trait GraftSpatialTable extends Table

/** A built scan that can tighten its bbox prune after the fact — the
  * post-pushdown hook for [[graft.plans.SpatialFilterPushdown]] (the
  * `Graft.register` path runs optimizer rules after V2 scan planning,
  * so the rule rewrites the already-built scan). */
trait GraftSpatialScan extends Scan {
  /** Current bbox spec ("x0,y0,x1,y1" or "empty"), if any. */
  def bboxSpec: Option[String]
  /** Same scan with the bbox prune replaced by `spec`. */
  def withBbox(spec: String): Scan
}

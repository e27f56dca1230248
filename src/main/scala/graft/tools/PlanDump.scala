package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round measurement aid: writes `.explain("formatted")`
  * for each declared SparkEntry query to `<outDir>/<name>_<tag>.txt`.
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [nameRegex]
  * The dump is PRE-execution (AQE initial plan) — it shows Exchange
  * placement, join strategy and scan pushdown, which is what the plan
  * audit needs; runtime re-optimizations are noted separately when they
  * matter. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val filter = args.lift(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries
      .filter { case (n, _) => filter.forall(f => n.matches(f)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
          println(s"[plandump] $name ok")
        } catch { case t: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${t.getMessage}")
        }
        graft.operators.Dedup.releaseCaches()
        graft.operators.Dedup.releaseResults()
      }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("dist5=" + spark.sql("SELECT ST_Distance(ST_Point(0,0), ST_Point(3,4))").head().getDouble(0))
    spark.sql("SELECT id, ST_Point(CAST(id AS DOUBLE), 0.0) AS g FROM range(50) t(id)").createOrReplaceTempView("a")
    spark.sql("SELECT id AS id2, ST_Point(CAST(id AS DOUBLE) + 0.4, 0.0) AS g2 FROM range(50) t(id)").createOrReplaceTempView("b")
    val j = spark.sql("SELECT id, id2 FROM a JOIN b ON ST_DWithin(g, g2, 1.0)")
    val plan = j.queryExecution.executedPlan.toString
    println("rows=" + j.count() + " cartesian=" + (plan.contains("Cartesian") || plan.contains("NestedLoop")))
    spark.stop()
  }
}

package graft

import graft.dsl._
import org.apache.spark.sql.functions._

class DslSpec extends SparkTestBase {
  import spark.implicits._

  test("Column DSL composes with DataFrame API") {
    val df = Seq((0.0, 0.0), (3.0, 4.0), (30.0, 40.0)).toDF("x", "y")
      .withColumn("pt", st_point($"x", $"y"))
    val near = df.where(st_dwithin($"pt", st_point(lit(0.0), lit(0.0)), 6.0))
    assert(near.count() == 2)
    val d = df.select(st_distance($"pt", st_point(lit(0.0), lit(0.0))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(d == 50.0)
    assert(df.select(st_asGeoJSON($"pt")).head().getString(0).contains("Point"))
  }
}

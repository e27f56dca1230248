package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc cache-footprint probe for the graph loops: runs the
  * q_pagerank/q_graph_bfs-shaped builds at a given SF dir and prints
  * each persisted RDD's in-memory size — how the round-14 dict-packed
  * adjacency claim ("measured cache-size drop, identical hashes") was
  * measured. Usage: `runMain graft.tools.GraphMem <sfDir>`. */
object GraphMem {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-graph-mem")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val dir = args(0)
      graft.SparkEntry.queries("q_pagerank")(spark, dir).count()
      graft.SparkEntry.queries("q_label_prop")(spark, dir).count()
      val infos = spark.sparkContext.getRDDStorageInfo
        .filter(i => i.memSize + i.diskSize > 0)
        .sortBy(-_.memSize)
      infos.foreach { i =>
        println(f"RDD ${i.id}%4d mem=${i.memSize}%10d disk=${i.diskSize}%8d " +
          f"parts=${i.numCachedPartitions}%3d  ${i.name}")
      }
      println(s"TOTAL mem=${infos.map(_.memSize).sum}")
    } finally spark.stop()
  }
}

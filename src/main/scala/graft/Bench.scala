package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A warmup pass (view registration + one scan) runs
  * first so JVM/codegen startup isn't billed to the first query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize every output column: executing the already-planned physical
    // plan via toRdd forces the full projection, where df.count() would let
    // Catalyst prune the projected expressions off map-only queries entirely
    // (ST_*/text kernels would never run and the bench would time a bare scan).
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())

    // CPU-bound calibration: `cpus` parallel threads each run a FIXED
    // iteration count of a pure-register loop; the wall time inflates in
    // proportion to external box load. Timed before and after the suite
    // and published as load_factor = mean(cal) / CalQuietSec, so a reader
    // can normalize a contended run without a quiet-box re-run (round 9
    // nearly shipped a false 2.3x regression story for want of this).
    def calibrate(threads: Int): Double = {
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { s =>
        val th = new Thread(() => {
          var x = 0x9e3779b97f4a7c15L + s
          var i = 0
          while (i < 80 * 1000 * 1000) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
          }
          sink.addAndGet(x) // defeat dead-code elimination
        })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    // The calibration config is PINNED independent of SPARK_GRAFT_CPUS:
    // CalQuietSec was measured for calibrate(32) on the build machine, so
    // running the loop with a different thread count would scale
    // load_factor arbitrarily and break cross-run comparison. The thread
    // count ships in the artifact so a reader can check the match.
    val CalThreads = 32
    val calBefore = calibrate(CalThreads)

    // warmup: registers views, loads classes, compiles first codegen stages
    SparkEntry.init(spark, sfDir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    force(SparkEntry.queries.head._2(spark, sfDir))

    // Best-of-N, INTERLEAVED: the suite runs N full round-robin passes
    // (q1..qk, q1..qk) rather than N back-to-back runs per query, so a
    // transient box stall can only inflate ONE sample of a query — with
    // back-to-back samples a single multi-second stall poisoned both and
    // the min was still wrong (observed: a 0.3 s query recorded as 5.1 s).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // optional name filter for local iteration (driver leaves it unset)
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
    val queries = SparkEntry.queries.toSeq.filter { case (n, _) =>
      nameFilter.forall(f => n.matches(f)) }
    val samples = Array.fill(queries.size)(List.empty[Double])
    for (_ <- 1 to runs; ((name, fn), i) <- queries.zipWithIndex) {
      val t0 = System.nanoTime()
      val t = try { force(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${t.getClass.getSimpleName}: ${t.getMessage}")
          Double.NaN
        }
      samples(i) ::= t
      // outside the timed section: drop the per-call caches dedup queries
      // leave behind (each invocation rebuilds its own) AND the
      // self-contained result checkpoints (consumed by force above), so
      // later queries aren't measured under the accumulated memory
      // pressure of every earlier run's persisted frames — at 20× the
      // lingering result blocks alone inflated individually-fast queries
      // 5-10× late in the suite. BLOCKING so the block-manager removal
      // work of a 40M-row predecessor doesn't bleed into the NEXT
      // query's timed section (measured at 20× best-of-1:
      // q_geojson_v2write read 31 s mid-suite vs 2.8 s isolated — a
      // transient, not a scaling defect). NO forced GC here: a full GC
      // clears the soft-referenced codegen caches and every subsequent
      // query re-pays compilation (measured +22% on the sf0.1 suite);
      // the interleaved best-of-N minimum is the mechanism that absorbs
      // one-off stall transients instead
      graft.operators.Dedup.releaseCaches(blocking = true)
      graft.operators.Dedup.releaseResults(blocking = true)
    }
    val results = queries.zipWithIndex.map { case ((name, _), i) =>
      name -> samples(i).min // TotalOrdering: NaN sorts greatest, so min = best good run
    }
    // a query is failed only if no run succeeded — never report its
    // time-to-exception as a passing bench entry
    val (ok, failed) = results.partition(r => !r._2.isNaN)
    // stdout values round to ms precision: the driver keeps only the last
    // ~2 KB of output, and 134 queries at full double precision overflow
    // that — at 3 decimals the whole map survives the tail
    def ms3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    val failedJson =
      if (failed.isEmpty) ""
      else failed.map("\"" + _._1 + "\"").mkString(""","failed":[""", ",", "]")
    val total = ok.map(_._2).sum
    val calAfter = calibrate(CalThreads)
    // Pinned quiet-box time for calibrate(32) on the build machine (32
    // hw threads; measured best-of-3 while idle). load_factor ~1.0 means
    // an uncontended run; k means CPU time was ~k x scarcer — divide the
    // totals by it before comparing across runs or against BASELINE.
    val CalQuietSec = 0.28
    val loadFactor = ((calBefore + calAfter) / 2) / CalQuietSec
    def lf3(v: Double): String = ms3(v)
    val line = s"""{"metric":"total","value":${ms3(total)},"unit":"sec","load_factor":${lf3(loadFactor)},"queries":$qs$failedJson,"sf":"$sfDir"}"""
    // sidecar with the untruncated numbers, self-contained per run
    // (BENCH_rN.json artifacts historically lost the front of the map)
    val fullQs = ok.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","load_factor":$loadFactor,"cal_before_sec":$calBefore,"cal_after_sec":$calAfter,"cal_quiet_sec":$CalQuietSec,"cal_threads":$CalThreads,"queries":$fullQs$failedJson,"sf":"$sfDir","runs":$runs}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () } // read-only cwd: stdout still has the line
    println(line)
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 first exercises every
  * query's codegen/JIT path (plans are schema-identical across scale
  * factors), so the timed pass measures steady-state throughput rather
  * than first-compile latency. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.withScratch(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => }
    }
    // A failed query must stay visible in the JSON: it is reported as a
    // NEGATIVE duration and listed under "failed" (ADVICE r1 — silently
    // swallowed exceptions let regressions pass the bench gate).
    // Each query runs `reps` times and reports the MEDIAN, so a single
    // GC pause or page-cache miss cannot fake a 12× regression
    // (VERDICT r2: the driver-env d09 "regression" was one noisy rep).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = names.map { name =>
      // Per-query isolation: drop every cached/persisted frame left over
      // from earlier queries (index builds, bounded shingle persists) so
      // each query is graded on its own plan, not on heap history —
      // VERDICT r3: e05's index-build reps inflated the next queries'
      // driver-measured times 3-6× while a fresh JVM measured them fine.
      spark.catalog.clearCache()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"bench: query $name FAILED: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -sec
      }
      val anyFailed = times.exists(_ < 0)
      val median = times.map(math.abs).sorted.apply(reps / 2)
      (name, if (anyFailed) -median else median)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(r => math.abs(r._2)).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

/** Optimization-round instrumentation (guide §1.4/§7.2): write the
  * `explain("formatted")` physical plan of every declared query to
  * `plans/<round>/<name>_<suffix>.txt` so plan claims (Exchange count,
  * join strategy, PushedFilters/ReadSchema, WholeStageCodegen spans)
  * are committed evidence, not prose. Building a DataFrame runs any
  * gate-side lifecycle work (index builds into temp dirs) exactly as
  * Bench does, but never executes the final query.
  *
  * Env: SPARK_GRAFT_SF_DIR (data dir, default sf0.1),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_PLAN_DIR (default plans/r18),
  * SPARK_GRAFT_PLAN_SUFFIX (default "before"),
  * SPARK_GRAFT_PLAN_ONLY (comma list of query names). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r18")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = Tables.withScratch(
        org.apache.spark.sql.SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var failures = 0
    names.foreach { n =>
      try {
        spark.catalog.clearCache()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"plandump: $n ok")
      } catch { case e: Throwable =>
        System.err.println(s"plandump: $n FAILED: ${e.getMessage}")
        failures += 1
      }
    }
    spark.stop()
    // loud exit on ANY failed dump (ADVICE r18): automation must not
    // mistake an incomplete plans/ directory for refreshed evidence
    if (failures > 0) sys.exit(1)
  }
}

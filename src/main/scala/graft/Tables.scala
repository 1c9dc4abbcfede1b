package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All queries in [[SparkEntry.queries]] read through here so that the
  * scan layer is uniform: parquet scans with Catalyst predicate pushdown
  * and column pruning. At 100 TB these tables would be
  * partitioned/bucketed; the query code below never assumes single-file
  * layout — `dir/name.parquet` may be a file or a partitioned directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Shuffle/spill scratch directory: prefer tmpfs when the host has
    * one. Local-mode shuffles write partitions×tasks files per stage;
    * on hosts whose /tmp sits on a slow overlay/virtual disk that
    * fixed cost dominates small-stage latency (measured here: a
    * 2-shuffle micro-bench medians 1.75 s on /tmp vs 0.99 s on
    * tmpfs). The cluster-scale analogue is provisioning fast local
    * disks for shuffle — this is that decision in local[n] form.
    * Spark removes its subdirectory on clean JVM exit. */
  def scratchDir: Option[String] = {
    val shm = new java.io.File("/dev/shm")
    // tmpfs is RAM: only divert shuffle there when plenty is free
    // (ENOSPC mid-shuffle is worse than a slow disk), and leave /tmp
    // alone otherwise. 16 GiB floor >> any sf0.1/sf1 shuffle here.
    val floorBytes = 16L * 1024 * 1024 * 1024
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace > floorBytes)
      Some("/dev/shm/graft-spark-local")
    else None
  }

  /** Apply [[scratchDir]] to a session builder (no-op without tmpfs). */
  def withScratch(b: SparkSession.Builder): SparkSession.Builder =
    scratchDir.fold(b)(d => b.config("spark.local.dir", d))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts encoding has varied across testdata generations:
      // TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
      // surfaces as a long under nanosAsLong) vs plain TIMESTAMP(MICROS)
      // with isAdjustedToUTC=false (→ TIMESTAMP_NTZ). Normalize both to
      // Spark's session-tz TimestampType so temporal queries and the
      // UTC-pinned oracle see identical micros values.
      // scope the legacy flag to THIS read (review r9): leaving it set
      // session-wide silently changed every later parquet read of a
      // TIMESTAMP(NANOS) column from a loud vectorized-reader error to
      // a silent LongType column. Restore happens only when the file
      // turned out NOT to be nanos-encoded: execution is lazy, so a
      // genuine nanos file needs the flag alive until its jobs run —
      // that residual scope is the unavoidable part, the common
      // (micros/NTZ) generations no longer leak it.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
        prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        // nanos read as long: integer `div`, not `/` — nanos ~1.7e18
        // exceed double's 53-bit mantissa, so float division is off by
        // ±1 µs on some rows
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        // NTZ→LTZ is a micros-value identity under the UTC session tz
        // every entry point pins
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}

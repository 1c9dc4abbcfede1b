package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local driver for iterating on one query (not part of the
  * library surface; kept out of SparkEntry). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = if (args.length > 1) args(1) else "d19_dedup_clusters"
    val df = SparkEntry.queries(name)(spark, dir)
    df.show(20, truncate = false)
    println(s"rows: ${df.count()}")
    spark.stop()
  }
}

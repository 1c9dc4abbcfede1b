package graft.tmpdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for VERDICT r18 #4: at a GB-scale delta, does
  * sizedForWrite's coalesce serialize the encode? Times a BqIndex
  * append of a ~1 GB synthetic delta (where estimate/128MB lands well
  * below the 32-core spread) and prints per-variant wall seconds plus
  * the task counts of the encode+write stage. DELETE AFTER USE. */
object SizingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.withScratch(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dim = 64
    val nBase = 200000L
    val nDelta = sys.env.getOrElse("PROBE_DELTA_ROWS", "1500000").toLong
    def vecs(n: Long, off: Long) = spark.range(n)
      .select((col("id") + off).as("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => sin(col("id") * 0.37 + d * 1.13)).as("vec"))
    val path = java.nio.file.Files.createTempDirectory("sizing-probe")
      .toString + "/idx"
    graft.ops.BqIndex.build(vecs(nBase, 0), path)
    // ~1500000 rows x 64 doubles ~ 780 MB of vec payload
    val delta = vecs(nDelta, 10000000L)
    val t0 = System.nanoTime()
    graft.ops.BqIndex.append(delta, path, tag = "gb-delta")
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE append delta=$nDelta rows  ${sec}%.2f s")
    Seq("sigs", "corpus").foreach { t =>
      val files = new java.io.File(s"$path/$t/shard=1").listFiles()
        .count(f => f.getName.startsWith("part-"))
      println(s"PROBE $t/shard=1 part files: $files")
    }
    spark.stop()
  }
}

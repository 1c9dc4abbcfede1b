package graft.tmpdrive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Tables.withScratch(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val out = graft.ops.Similarity.semanticDedup(emb, threshold = 0.96,
      refineIters = 0, md5Seeds = true, maxCell = 200)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/e07plan.txt"),
      plan.getBytes)
    println("PLANCHECK written")
  }
}

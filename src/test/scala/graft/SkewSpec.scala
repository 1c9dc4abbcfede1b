package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum matches plain groupBy sum on a skewed key") {
    // 90% of rows carry one hot key
    val df = spark.range(10000).select(
      when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7)).as("k"),
      (col("id") % 100).cast("double").as("v"))
    val got = Skew.saltedSum(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = df.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("saltedJoin matches plain join") {
    val fact = spark.range(5000).select(
      when(col("id") % 5 < 4, "hot").otherwise(concat(lit("k"), col("id") % 3)).as("k"),
      col("id").as("v"))
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k1", "B"), ("k2", "C")).toDF("k", "label")
    val got = Skew.saltedJoin(fact, dim, "k")
      .groupBy("label").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = fact.join(dim, "k")
      .groupBy("label").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}

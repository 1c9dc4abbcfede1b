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

  test("saltedSum spreads a hot key with a CONSTANT value (review r10)") {
    // count-style skew: the hot key's rows all carry value 1.0; the
    // old hash(value) salt pinned them to ONE salt, defeating the
    // split. Salting on all columns (id differs per row) spreads them.
    val df = spark.range(10000).select(col("id"),
      when(col("id") % 10 < 9, "hot").otherwise("cold").as("k"),
      lit(1.0).as("v"))
    val got = Skew.saltedSum(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("hot" -> 9000.0, "cold" -> 1000.0))
    // the salt the implementation derives must actually spread the
    // hot key's rows (replicate its expression: xxhash64 over all cols)
    val spread = df.filter(col("k") === "hot")
      .select(pmod(xxhash64(df.columns.map(col): _*), lit(16)).as("s"))
      .distinct().count()
    assert(spread > 8, s"constant-value hot key must spread over salts, got $spread")
  }

  test("saltedSum tolerates an unhashable map column (ADVICE r10)") {
    // xxhash64 rejects MapType at analysis time; the all-column salt
    // must skip map-bearing columns instead of failing the whole
    // aggregation when the frame happens to carry one as payload.
    val df = spark.range(1000).select(col("id"),
      when(col("id") % 10 < 9, "hot").otherwise("cold").as("k"),
      lit(1.0).as("v"),
      map(lit("a"), col("id")).as("payload"))
    val got = Skew.saltedSum(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("hot" -> 900.0, "cold" -> 100.0))
    // id still participates in the salt, so the constant-value hot key
    // keeps its spread even with the map column excluded
    val spread = df.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("id"), col("k"), col("v")), lit(16)).as("s"))
      .distinct().count()
    assert(spread > 8, s"hot key must still spread over salts, got $spread")
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

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation helpers for the cases AQE's runtime
  * skew-join splitting can't reach (e.g. a hot aggregation key, or a
  * join where one side must not be broadcast). At 100 TB a single hot
  * key (an empty-document fingerprint, a default region, a null-ish
  * dimension value) can pin a whole stage on one task; salting trades
  * one extra narrow shuffle for even distribution.
  */
object Skew {

  /** Columns of `df` that xxhash64 accepts: MapType (at any nesting
    * depth) is unhashable — Spark rejects it at analysis time — so a
    * frame carrying a map column alongside the aggregation would fail
    * outright if the salt hashed every column blindly (ADVICE r10). */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    def ok(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => ok(f.dataType))
      case a: ArrayType => ok(a.elementType)
      case _ => true
    }
    df.schema.fields.filter(f => ok(f.dataType)).map(f => col(f.name)).toSeq
  }

  /** Two-phase salted aggregation: groupBy (keys + salt) computes
    * partial aggregates across `salts` partitions per key, then the
    * tiny partial-result table re-aggregates without the salt. Works
    * for any algebraic aggregate expression list (sum/count/min/max). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame =
    // DETERMINISTIC salt (review r9): monotonically_increasing_id
    // changes under partial stage recomputation — a re-run map task
    // re-salts rows after some reducers consumed the old assignment,
    // silently double-counting partials (the SPARK-23207 bug class).
    // Salt on all HASHABLE columns (review r10 + ADVICE r10): hashing
    // only the value left the common count-style skew — a hot key
    // whose rows share one constant value — entirely on a single
    // salt; hashing map-typed columns is an analysis error, so those
    // are excluded (keys and the numeric value are always hashable).
    // CAVEAT: rows identical in EVERY hashable column still share one
    // salt; results stay correct (the partial aggregate collapses
    // them), only the spread degrades for fully-duplicate hot rows.
    df.withColumn("__salt",
        pmod(xxhash64(hashableCols(df): _*), lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as(s"sum_$valueCol"))

  /** Salted join of a skewed fact against a small-ish dimension that
    * is still too large (or unwanted) to broadcast: the fact side gets
    * a random salt in [0, salts); the dim side is exploded `salts`
    * ways, so the join key (key, salt) spreads each hot key over
    * `salts` tasks. ONLY inner/left-side semantics survive salting —
    * right/full would emit `salts` null-padded copies of every
    * unmatched dim key (review r9: now validated). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    // Locale.ROOT (review r12): "INNER".toLowerCase on a Turkish JVM
    // is "ınner" and would fail this require on a valid join type
    val jt = joinType.toLowerCase(java.util.Locale.ROOT)
    require(allowed(jt.replace("_", "")) || allowed(jt),
      s"saltedJoin preserves only inner/left joins, got '$joinType'")
    // deterministic salt from the fact row's hashable columns (see
    // saltedSum — map-typed payload columns are excluded, ADVICE r10)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(hashableCols(fact): _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

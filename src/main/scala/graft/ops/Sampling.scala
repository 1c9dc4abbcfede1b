package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and per-group quota operators for corpus
  * curation (down-sampling over-represented domains/languages is a
  * standard step when mixing a training corpus).
  *
  * All operators key on an md5-derived hash of a stable id — NOT
  * `rand()` — so a sample is (a) reproducible run-to-run regardless of
  * partitioning/AQE re-splits, (b) reproducible engine-to-engine (a SQL
  * oracle recomputes the identical sample), and (c) consistent across
  * scale-ups: re-sampling a grown corpus keeps every previously kept
  * row whose hash still clears the rate (important for incremental
  * pipeline runs — the kept set only grows, never churns).
  */
object Sampling {

  /** Uniform bucket in [0, 10000) from the md5 of the id rendered as a
    * string: the first 15 hex chars (60 bits, always positive as a
    * long) mod 10^4. Engine-portable: DuckDB computes the identical
    * bucket as `('0x' || substr(md5(id::VARCHAR), 1, 15))::UBIGINT %
    * 10000`. Codegen'd end-to-end (conv/substring/md5 are all native
    * Spark expressions), a pure map-side computation. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long") % 10000

  private def rateToBucket(rate: Double): Int = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.round(rate * 10000).toInt
  }

  /** Deterministic Bernoulli sample at `rate`: a stateless map-side
    * filter (no shuffle, no RNG state), so it composes with scan
    * pruning and costs one scan at any corpus size. */
  def bernoulli(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < rateToBucket(rate))

  /** Stratified deterministic sample: per-stratum rates, `defaultRate`
    * for unlisted strata. The rates table is a literal broadcast join
    * (tens of strata), so this too is one corpus scan with a map-side
    * filter — the corpus never shuffles. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thr = rates.toSeq.map { case (s, r) => (s, rateToBucket(r)) }
      .toDF(stratumCol, "__thr")
    df.join(broadcast(thr), Seq(stratumCol), "left_outer")
      .withColumn("__thr", coalesce(col("__thr"), lit(rateToBucket(defaultRate))))
      .filter(hashBucket(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** EXACT per-group quota: keep the `cap` rows with the smallest
    * id-hash in each group — a deterministic "random cap docs per
    * domain". One shuffle on the group key + a per-group top-cap sort.
    * Correct at any cap, but a single pathological group sorts on one
    * task — for billion-row groups use [[groupQuotaApprox]]. */
  def groupQuota(df: DataFrame, idCol: String, groupCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(groupCol)
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** APPROXIMATE per-group quota for heavy-group corpora: count each
    * group (one partial-aggregated shuffle of (group, count) pairs —
    * never the rows), then keep each row with probability cap/count via
    * the deterministic hash filter. Expected group size = cap (binomial
    * spread ~ sqrt(cap)); no per-group sort exists anywhere in the
    * plan, so a group with 10^9 rows costs the same as one with 10^2.
    * Groups already within quota are kept whole (rate clamps to 1). */
  def groupQuotaApprox(df: DataFrame, idCol: String, groupCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    df.join(broadcast(counts), Seq(groupCol))
      .withColumn("__thr",
        least(lit(10000L), lit(cap.toLong * 10000L) / col("__n")))
      .filter(hashBucket(col(idCol)) < col("__thr"))
      .drop("__n", "__thr")
  }
}

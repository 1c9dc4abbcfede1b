package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / event-sequence operators: as-of join, sessionization,
  * tumbling-window aggregation. Spark has no ASOF JOIN operator; the
  * scalable composition is the tagged-union trick — NOT a range join:
  * a key-equi + time-inequality join explodes to |L|·|R| comparisons
  * per key before pruning, while the union form is one shuffle on the
  * key, one ordered pass, no pair blowup at any skew.
  */
object Temporal {

  /** Backward as-of join: each left row picks the LATEST right row with
    * `right.time <= left.time` on the same key (ties: the right row
    * wins, i.e. a same-timestamp right row is visible).
    *
    * Shape: tag both sides, union, and carry the most recent right
    * payload forward with `last(_, ignoreNulls)` over a per-key
    * time-ordered running window — one hash shuffle on `keys`, one
    * sort, zero joins. `rightCols` are the right-side payload columns
    * to surface (pre-rename them if they collide with left columns);
    * `__rtime` additionally surfaces the matched right timestamp.
    * Rows with no preceding right match keep null payloads (drop them
    * for inner-asof semantics). `toleranceSec` (if set) nulls matches
    * older than the tolerance. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightCols: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val payload = struct(
      (col(timeCol).as("__rtime") +: rightCols.map(col)): _*)
    val r2 = right.select((keys.map(col) :+ col(timeCol) :+
      payload.as("__rpay")): _*).withColumn("__side", lit(0))
    val l2 = left.withColumn("__side", lit(1))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceSec match {
      case Some(tol) => carried.withColumn("__match",
        when(unix_micros(col(timeCol)) - unix_micros(col("__match.__rtime"))
          <= tol * 1000000L, col("__match")))
      case None => carried
    }
    val outRight = col("__match.__rtime").as("__rtime") +:
      rightCols.map(c => col(s"__match.$c").as(c))
    bounded.select(left.columns.map(col).toSeq ++ outRight: _*)
  }

  /** Sessionize: per-key ordinal session ids, a new session whenever
    * the gap since the previous event exceeds `gapSec`. One shuffle on
    * the key; the running sum reuses the same sort as the lag. */
  def sessionize(events: DataFrame, keys: Seq[String], timeCol: String,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    val prev = lag(col(timeCol), 1).over(w)
    events
      .withColumn("__new",
        when(prev.isNull ||
          unix_micros(col(timeCol)) - unix_micros(prev) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__new")
  }

  /** Tumbling-window aggregation: truncate the time column to the
    * window (`unit` per date_trunc: "hour", "day", …) and aggregate.
    * Partial aggregation makes this one narrow shuffle of one row per
    * (window, group) per task — the streaming EventStream variant uses
    * the identical grouping with a watermark. */
  def tumblingAgg(events: DataFrame, timeCol: String, unit: String,
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame =
    events.withColumn("window_start", date_trunc(unit, col(timeCol)))
      .groupBy((col("window_start") +: groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
}

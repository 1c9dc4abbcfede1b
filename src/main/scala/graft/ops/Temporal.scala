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

  /** As-of join: each left row picks the nearest right row on the same
    * key — `direction = "backward"` (default) the LATEST right row with
    * `right.time <= left.time`, `direction = "forward"` the EARLIEST
    * right row with `right.time >= left.time`. Ties: a same-timestamp
    * right row is visible in both directions.
    *
    * Shape: tag both sides, union, and carry the nearest right payload
    * with `last(_, ignoreNulls)` over a per-key time-ordered running
    * window (time DESCENDING for forward — the same plan, one sort
    * direction flipped) — one hash shuffle on `keys`, one sort, zero
    * joins. `rightCols` are the right-side payload columns to surface
    * (pre-rename them if they collide with left columns); `__rtime`
    * additionally surfaces the matched right timestamp. Rows with no
    * match in the chosen direction keep null payloads (drop them for
    * inner-asof semantics). `toleranceSec` (if set) nulls matches
    * further than the tolerance from the left timestamp.
    *
    * NULL timestamps (review r9): a right row with a null time is
    * droppable — it is "nearest" to nothing — and is filtered up
    * front; without the filter Spark's NULLS-FIRST ascending sort
    * made it the running fallback payload for every left row with no
    * real predecessor. A LEFT row with a null time gets null payloads
    * (an as-of against an undefined instant has no answer).
    *
    * NULL join keys (review r11): Window.partitionBy groups null keys
    * TOGETHER, which would silently match anonymous (null-key) left
    * rows to whatever null-key right row is nearest — semantics no SQL
    * join has. Null-key right rows are filtered with the null-time
    * rows, so null-key left rows come back unmatched, exactly like
    * the equi-join oracle. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightCols: Seq[String],
      toleranceSec: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asOfJoin: direction must be backward|forward, got '$direction'")
    val fwd = direction == "forward"
    val payload = struct(
      (col(timeCol).as("__rtime") +: rightCols.map(col)): _*)
    val rightKeysNonNull = keys.map(col(_).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val r2 = right.filter(col(timeCol).isNotNull && rightKeysNonNull)
      .select((keys.map(col) :+ col(timeCol) :+
        payload.as("__rpay")): _*).withColumn("__side", lit(0))
    val l2 = left.withColumn("__side", lit(1))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    // Backward scans time ascending; forward scans descending, so the
    // running `last` right payload is the earliest one at-or-after the
    // left row. `__side` ascending keeps an equal-timestamp right row
    // (side 0) ahead of the left row in BOTH sort directions.
    val timeOrder = if (fwd) col(timeCol).desc else col(timeCol).asc
    // Deterministic tie-break among right rows sharing (key, time)
    // (review r12): without it, last() carried whichever tied payload
    // the engine happened to sort last — run-to-run nondeterminism in
    // an operator the oracle gates on. When the payload struct is
    // orderable (no map-typed right columns) ties resolve to the
    // GREATEST payload; unorderable payloads keep the documented
    // arbitrary-tie contract (pre-dedup right on (key, time) there).
    val payloadOrderable = org.apache.spark.sql.catalyst.expressions
      .RowOrdering.isOrderable(r2.schema("__rpay").dataType)
    val tieBreak: Seq[Column] =
      if (payloadOrderable) Seq(col("__rpay")) else Seq.empty
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((timeOrder +: col("__side") +: tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", when(col(timeCol).isNotNull,
        last(col("__rpay"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
    val bounded = toleranceSec match {
      case Some(tol) =>
        val gapUs =
          if (fwd) unix_micros(col("__match.__rtime")) - unix_micros(col(timeCol))
          else unix_micros(col(timeCol)) - unix_micros(col("__match.__rtime"))
        carried.withColumn("__match",
          when(gapUs <= tol * 1000000L, col("__match")))
      case None => carried
    }
    val outRight = col("__match.__rtime").as("__rtime") +:
      rightCols.map(c => col(s"__match.$c").as(c))
    bounded.select(left.columns.map(col).toSeq ++ outRight: _*)
  }

  /** Point-in-interval (range) join: pair each point row with every
    * interval row of the same key whose `[startTs, endTs)` contains
    * the point's `pointTs`.
    *
    * Spark would plan the naive `p.key = i.key AND p.ts >= i.start AND
    * p.ts < i.end` as a key-equi join whose per-key output is pruned
    * AFTER |P|·|I| comparisons — quadratic in key skew. The scalable
    * shape is temporal bucketing: each interval explodes to the
    * `bucket`-granularity buckets it covers (intervals are short
    * relative to the bucket in event workloads, so the explosion is a
    * small constant), each point maps to exactly ONE bucket, and the
    * join becomes an equi-join on (key, bucket) with a residual
    * containment filter. A (point, interval) pair can only meet in the
    * point's single bucket, so no post-join dedup is needed.
    *
    * `bucket` is a date_trunc unit ("minute" | "hour" | "day") and
    * must be chosen >= the typical interval length; longer intervals
    * stay correct but explode to more buckets. Column names must not
    * collide across the two sides (pre-rename, as with [[asOfJoin]]).
    *
    * Malformed (inverted or empty `[t, t)`) intervals are dropped up
    * front (ADVICE r5 + review r11): they can match nothing.
    *
    * An interval spanning more than `maxSpanBuckets` buckets — the
    * open-ended far-future sentinel like endTs = 9999-12-31 — would
    * explode to millions-to-billions of sequence elements and kill the
    * job (sequence() caps at Int.MaxValue) or OOM an executor. Those
    * rows are NOT dropped (ADVICE r11: silently vanishing long
    * intervals is data loss, not protection); they route through a
    * non-exploding plain key-equi join with the same containment
    * filter and union back in. That path is per-key quadratic in the
    * number of OVER-SPAN intervals only — fine for the sentinel tail
    * it exists for; if MOST intervals legitimately out-span the cap,
    * pick a coarser `bucket` or raise `maxSpanBuckets` (default 100k
    * ≈ 11 years of hourly buckets) so they ride the bucketed path.
    *
    * The sequence's upper bound is `endTs - 1µs` (review r11): the end
    * is EXCLUSIVE, so a boundary-aligned end (the `ts + interval N
    * hour` windows q24 builds) otherwise emitted one dead bucket per
    * interval that the residual filter always rejected. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTs: String, startTs: String, endTs: String,
      bucket: String = "hour", maxSpanBuckets: Long = 100000L): DataFrame = {
    require(Set("minute", "hour", "day")(bucket),
      s"rangeJoin: bucket must be minute|hour|day, got '$bucket'")
    require(maxSpanBuckets >= 1, s"maxSpanBuckets must be >= 1")
    val bucketUs = bucket match {
      case "minute" => 60000000L
      case "hour" => 3600000000L
      case "day" => 86400000000L
    }
    // a "disable the cap" value like Long.MaxValue must saturate, not
    // wrap (review r12: an overflowed negative product sent EVERY
    // interval down the quadratic tail — correct results, silently
    // quadratic cost)
    val capUs =
      try Math.multiplyExact(maxSpanBuckets, bucketUs)
      catch { case _: ArithmeticException => Long.MaxValue }
    val contained = col(pointTs) >= col(startTs) && col(pointTs) < col(endTs)
    val spanUs = unix_micros(col(endTs)) - unix_micros(col(startTs))
    val valid = intervals.filter(col(endTs) > col(startTs))
    val step = expr(s"interval 1 $bucket")
    val p = points.withColumn("__bkt", date_trunc(bucket, col(pointTs)))
    val short = valid
      .filter(spanUs <= capUs)
      .withColumn("__bkt",
        explode(sequence(date_trunc(bucket, col(startTs)),
          date_trunc(bucket,
            col(endTs) - expr("interval 1 microsecond")), step)))
    val bucketed = p.join(short, keys :+ "__bkt")
      .filter(contained)
      .drop("__bkt")
    // over-span tail: plain key-equi join, no bucket explosion. A
    // KEYLESS (global) range join is legal — the bucketed path joins
    // on __bkt alone — and its tail is an explicit cross join against
    // the (rare, sentinel-class) over-span intervals (review r12: an
    // nonEmpty-keys require here needlessly broke keyless callers the
    // pre-r12 bucketed-only code served).
    val longIv = valid.filter(spanUs > capUs)
    val longTail =
      (if (keys.isEmpty) points.crossJoin(longIv)
       else points.join(longIv, keys))
        .filter(contained)
    bucketed.unionByName(longTail)
  }

  /** Sessionize: per-key ordinal session ids, a new session whenever
    * the gap since the previous event exceeds `gapSec`. One shuffle on
    * the key; the running sum reuses the same sort as the lag.
    *
    * NULL timestamps are dropped (review r11): they sort NULLS FIRST,
    * and each one's null lag read as a session break — every null-ts
    * event minted a new session and SHIFTED every real session id for
    * its key (q21-style per-session counts inflated silently). An
    * event at an undefined instant belongs to no session; the r9
    * asOfJoin null-time rule, applied here. */
  def sessionize(events: DataFrame, keys: Seq[String], timeCol: String,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    val prev = lag(col(timeCol), 1).over(w)
    events
      .filter(col(timeCol).isNotNull)
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
      groupCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    // date_trunc returns NULL (not an error) on an invalid unit — an
    // unvalidated typo like "hours" would silently collapse the whole
    // corpus into one garbage window (review r9)
    val units = Set("microsecond", "millisecond", "second", "minute",
      "hour", "day", "week", "month", "quarter", "year")
    require(units(unit.toLowerCase(java.util.Locale.ROOT)),
      s"tumblingAgg: unit must be one of ${units.toSeq.sorted.mkString("|")}, got '$unit'")
    require(aggs.nonEmpty, "tumblingAgg: at least one aggregate required")
    // null timestamps drop (review r12 — the file's null-time rule:
    // asOfJoin filters them, sessionize drops them; without this they
    // aggregated into a phantom null-window row)
    events.filter(col(timeCol).isNotNull)
      .withColumn("window_start", date_trunc(unit, col(timeCol)))
      .groupBy((col("window_start") +: groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

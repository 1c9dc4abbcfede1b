package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Temporal

/** As-of join, sessionization, tumbling windows (graft.ops.Temporal). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, t("2026-01-01 10:00:00"), 100.0),
    (1L, t("2026-01-01 10:05:00"), 101.0),
    (1L, t("2026-01-01 11:00:00"), 110.0),
    (2L, t("2026-01-01 10:30:00"), 50.0)
  ).toDF("user_id", "ts", "px")

  private lazy val trades = Seq(
    (10L, 1L, t("2026-01-01 09:59:00")), // before any quote -> no match
    (11L, 1L, t("2026-01-01 10:05:00")), // exact tie -> quote at 10:05
    (12L, 1L, t("2026-01-01 10:30:00")), // -> 10:05 quote
    (13L, 1L, t("2026-01-01 12:00:00")), // -> 11:00 quote
    (14L, 2L, t("2026-01-01 10:31:00")), // -> 10:30 quote
    (15L, 3L, t("2026-01-01 10:00:00")) // unseen key -> no match
  ).toDF("trade_id", "user_id", "ts")

  test("asOfJoin: latest preceding right row per key, ties inclusive") {
    val j = Temporal.asOfJoin(trades, quotes, Seq("user_id"), "ts", Seq("px"))
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(j(10L).isEmpty && j(15L).isEmpty)
    assert(j(11L).contains(101.0), "same-timestamp right row is visible")
    assert(j(12L).contains(101.0))
    assert(j(13L).contains(110.0))
    assert(j(14L).contains(50.0))
  }

  test("asOfJoin: null timestamps are never phantom matches") {
    // review r9: a null-ts right row sorted NULLS FIRST and became the
    // running fallback payload for left rows with no real predecessor
    val rightWithNull = quotes.unionByName(
      Seq((1L, null.asInstanceOf[Timestamp], 999.0)).toDF("user_id", "ts", "px"))
    val j = Temporal.asOfJoin(trades, rightWithNull, Seq("user_id"), "ts", Seq("px"))
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(j(10L).isEmpty, "pre-first-quote trade must stay unmatched")
    assert(j(15L).isEmpty, "unseen key must stay unmatched")
    assert(j(12L).contains(101.0), "real matches unaffected")
    // a LEFT row with a null time has no as-of answer
    val leftWithNull = trades.unionByName(
      Seq((16L, 1L, null.asInstanceOf[Timestamp])).toDF("trade_id", "user_id", "ts"))
    val j2 = Temporal.asOfJoin(leftWithNull, quotes, Seq("user_id"), "ts", Seq("px"))
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(j2(16L).isEmpty, "null-ts left row gets null payloads")
  }

  test("asOfJoin: null KEYS never match each other (review r11)") {
    // Window.partitionBy groups nulls together — anonymous left rows
    // used to silently pick up the nearest anonymous right payload
    val l = Seq((20L, Option.empty[Long], t("2026-01-01 10:10:00")))
      .toDF("trade_id", "user_id", "ts")
    val r = Seq((Option.empty[Long], t("2026-01-01 10:00:00"), 99.0))
      .toDF("user_id", "ts", "px")
    val got = Temporal.asOfJoin(l, r, Seq("user_id"), "ts", Seq("px"))
      .select("trade_id", "px").collect()
    assert(got.length == 1 && got.head.isNullAt(1),
      "null-key left row must come back UNMATCHED, like the SQL join")
  }

  test("sessionize: null timestamps drop instead of minting sessions " +
    "(review r11)") {
    val ev = Seq(
      (7L, Option.empty[Timestamp]), (7L, Option.empty[Timestamp]),
      (7L, Some(t("2026-01-01 10:00:00"))),
      (7L, Some(t("2026-01-01 10:10:00"))),
      (7L, Some(t("2026-01-01 12:00:00")))).toDF("user_id", "ts")
    val s = Temporal.sessionize(ev, Seq("user_id"), "ts", gapSec = 3600)
      .select("session_id").as[Long].collect().sorted.toSeq
    // two real sessions numbered from 1 — null rows neither appear nor
    // shift the ids
    assert(s == Seq(1L, 1L, 2L), s"got $s")
  }

  test("rangeJoin: a far-future sentinel end still matches, without " +
    "exploding (ADVICE r11)") {
    val pts = Seq(
      (1L, t("2026-01-01 10:30:00"), 100L),
      (1L, t("2025-12-31 00:00:00"), 101L), // before the sentinel start
      (2L, t("2026-01-01 10:30:00"), 102L)) // other key: no interval
      .toDF("user_id", "ts", "p_id")
    val iv = Seq(
      (1L, t("2026-01-01 10:00:00"), t("2026-01-01 12:00:00"), 1L),
      (1L, t("2026-01-01 10:00:00"), t("9999-12-31 00:00:00"), 2L))
      .toDF("user_id", "start_ts", "end_ts", "i_id")
    // the over-span interval rides the non-exploding key-equi path:
    // it MATCHES (no silent data loss) and the job neither OOMs nor
    // pays a 70M-element sequence explosion
    val got = Temporal.rangeJoin(pts, iv, Seq("user_id"), "ts",
        "start_ts", "end_ts", "hour")
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 1L), (100L, 2L)),
      s"sentinel interval must join via the long-tail path: $got")
    // the same result when the raised cap sends it down the bucketed path
    val got2 = Temporal.rangeJoin(pts, iv, Seq("user_id"), "ts",
        "start_ts", "end_ts", "day", maxSpanBuckets = 4000000L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got2 == got)
  }

  test("rangeJoin: keyless (global) joins work, sentinel tail included " +
    "(review r12)") {
    val pts = Seq(
      (t("2026-01-01 10:30:00"), 100L),
      (t("2026-01-02 00:00:00"), 101L)).toDF("ts", "p_id")
    val iv = Seq(
      (t("2026-01-01 10:00:00"), t("2026-01-01 12:00:00"), 1L),
      (t("2026-01-01 09:00:00"), t("9999-12-31 00:00:00"), 2L))
      .toDF("start_ts", "end_ts", "i_id")
    val got = Temporal.rangeJoin(pts, iv, Seq.empty, "ts",
        "start_ts", "end_ts", "hour")
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 1L), (100L, 2L), (101L, 2L)), s"got $got")
  }

  test("tumblingAgg rejects invalid units and empty aggregate lists") {
    val e = intercept[IllegalArgumentException] {
      Temporal.tumblingAgg(quotes, "ts", "hours", Seq("user_id"),
        Seq(count(lit(1)).as("n")))
    }
    assert(e.getMessage.contains("unit"), "a date_trunc typo must fail loudly")
    intercept[IllegalArgumentException] {
      Temporal.tumblingAgg(quotes, "ts", "hour", Seq("user_id"), Seq.empty)
    }
    ()
  }

  test("asOfJoin tolerance nulls stale matches") {
    val j = Temporal.asOfJoin(trades, quotes, Seq("user_id"), "ts", Seq("px"),
        toleranceSec = Some(600))
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(j(11L).contains(101.0), "age 0 stays within tolerance")
    assert(j(12L).isEmpty, "10:05 quote is 25 min before 10:30: stale")
    assert(j(13L).isEmpty, "11:00 quote is 1 h before 12:00: stale")
    assert(j(14L).contains(50.0), "1 min old")
  }

  test("asOfJoin forward: earliest following right row per key") {
    val j = Temporal.asOfJoin(trades, quotes, Seq("user_id"), "ts", Seq("px"),
        direction = "forward")
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(j(10L).contains(100.0), "9:59 trade -> 10:00 quote")
    assert(j(11L).contains(101.0), "same-timestamp right row is visible")
    assert(j(12L).contains(110.0), "10:30 trade -> next quote at 11:00")
    assert(j(13L).isEmpty, "no quote after 12:00")
    assert(j(14L).isEmpty, "user 2's only quote precedes the trade")
    assert(j(15L).isEmpty, "unseen key")
  }

  test("asOfJoin forward tolerance nulls far-future matches") {
    val j = Temporal.asOfJoin(trades, quotes, Seq("user_id"), "ts", Seq("px"),
        toleranceSec = Some(600), direction = "forward")
      .select(col("trade_id"), col("px")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(j(10L).contains(100.0), "1 min ahead: within tolerance")
    assert(j(11L).contains(101.0), "gap 0")
    assert(j(12L).isEmpty, "next quote is 30 min ahead: beyond tolerance")
  }

  test("asOfJoin equals the naive argmax/argmin join: directions × tolerance (property)") {
    // deterministic pseudo-random fixture engineered to hit the edge
    // cases: exact left==right timestamp ties, gaps wider than the
    // tolerance (a match EXISTS but must null out), left rows past the
    // last/before the first right row, and a key with no right rows
    val base = t("2026-01-01 00:00:00").getTime
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val right = (0 until 5).flatMap { k =>
      // j*7 mod 180, gcd(7,180)=1: 26 DISTINCT per-key timestamps, so
      // the naive argmax/argmin is unique and comparable
      (0 until 26).map(j => (k.toLong, ts(j * 7 % 180), 100.0 + k * 10 + j))
    }.toDF("user_id", "ts", "px")
    val left = ((1L to 200L).map { i =>
      (i, i % 6, ts(i * 11 % 200)) // key 5 has NO right rows at all
    } ++ Seq((201L, 0L, ts(14)), (202L, 1L, ts(21)))) // exact-tie rows
      .toDF("trade_id", "user_id", "ts")
    def naive(dir: String, tol: Option[Long]): Map[Long, Option[Double]] = {
      val r = right.withColumnRenamed("user_id", "ruid")
        .withColumnRenamed("ts", "rts")
      val dirCond =
        if (dir == "backward") col("rts") <= col("ts") else col("rts") >= col("ts")
      val tolCond = tol.map(s =>
        abs(unix_timestamp(col("rts")) - unix_timestamp(col("ts"))) <= s)
        .getOrElse(lit(true))
      left.join(r, col("user_id") === col("ruid") && dirCond && tolCond,
          "left_outer")
        .groupBy("trade_id")
        .agg((if (dir == "backward") max_by(col("px"), col("rts"))
              else min_by(col("px"), col("rts"))).as("px"))
        .collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    }
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(300L))) {
      val got = Temporal.asOfJoin(left, right, Seq("user_id"), "ts",
          Seq("px"), toleranceSec = tol, direction = dir)
        .select("trade_id", "px").collect()
        .map(x => x.getLong(0) ->
          (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
      val want = naive(dir, tol)
      assert(got == want, s"asOfJoin($dir, tol=$tol) diverged from naive")
      // the engineered edges actually occurred
      assert(got(201L).isDefined && got(202L).isDefined, "tie rows must match")
      assert((1L to 200L).filter(_ % 6 == 5).forall(got(_).isEmpty),
        "right-less key must stay unmatched")
      if (tol.isDefined)
        assert(got.values.count(_.isEmpty) > naive(dir, None).values.count(_.isEmpty),
          "tolerance must null out at least one otherwise-matched row")
    }
  }

  test("rangeJoin: point-in-interval matches, exclusive end, no duplicate pairs") {
    val points = Seq(
      (1L, 1L, t("2026-01-01 10:30:00")), // inside iv A
      (2L, 1L, t("2026-01-01 12:00:00")), // == iv A end (exclusive) -> no match
      (3L, 1L, t("2026-01-01 10:00:00")), // == iv A start (inclusive)
      (4L, 2L, t("2026-01-01 10:30:00")), // right key, but only iv for key 1
      (5L, 1L, t("2026-01-01 23:00:00")) // outside all
    ).toDF("pt_id", "user_id", "v_ts")
    val ivs = Seq(
      (10L, 1L, t("2026-01-01 10:00:00"), t("2026-01-01 12:00:00")), // A
      (11L, 1L, t("2026-01-01 10:15:00"), t("2026-01-01 10:45:00")) // B overlaps A
    ).toDF("iv_id", "user_id", "start_ts", "end_ts")
    val out = Temporal.rangeJoin(points, ivs, Seq("user_id"),
        "v_ts", "start_ts", "end_ts", "hour")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    // point 1 is in BOTH intervals; 3 only in A; 2/4/5 nowhere
    assert(out == Set((1L, 10L), (1L, 11L), (3L, 10L)))
  }

  test("rangeJoin: a malformed (inverted) interval is dropped, not fatal") {
    // one end_ts < start_ts row would make the unguarded descending
    // sequence() throw and kill the whole job (ADVICE r5); it can match
    // no point anyway, so it is filtered up front
    val points = Seq((1L, 1L, t("2026-01-01 10:30:00")))
      .toDF("pt_id", "user_id", "v_ts")
    val ivs = Seq(
      (10L, 1L, t("2026-01-01 10:00:00"), t("2026-01-01 12:00:00")),
      (11L, 1L, t("2026-01-01 12:00:00"), t("2026-01-01 09:00:00"))
    ).toDF("iv_id", "user_id", "start_ts", "end_ts")
    val out = Temporal.rangeJoin(points, ivs, Seq("user_id"),
        "v_ts", "start_ts", "end_ts", "hour")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("rangeJoin matches the naive inequality join on pseudo-random data") {
    val points = (1L to 300L).map { i =>
      (i, i % 5, t(f"2026-01-01 ${(i * 7) % 24}%02d:${(i * 13) % 60}%02d:00"))
    }.toDF("pt_id", "user_id", "v_ts")
    val ivs = (1L to 40L).map { j =>
      val h = (j * 3) % 22
      (j, j % 5, t(f"2026-01-01 $h%02d:${(j * 11) % 60}%02d:00"),
        t(f"2026-01-01 ${h + 2}%02d:${(j * 11) % 60}%02d:00"))
    }.toDF("iv_id", "user_id", "start_ts", "end_ts")
    val bucketed = Temporal.rangeJoin(points, ivs, Seq("user_id"),
        "v_ts", "start_ts", "end_ts", "hour")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, Seq("user_id"))
      .filter(col("v_ts") >= col("start_ts") && col("v_ts") < col("end_ts"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive && naive.nonEmpty)
  }

  test("rangeJoin plans as an equi-join: no nested-loop, no cartesian") {
    val points = Seq((1L, 1L, t("2026-01-01 10:30:00")))
      .toDF("pt_id", "user_id", "v_ts")
    val ivs = Seq((10L, 1L, t("2026-01-01 10:00:00"), t("2026-01-01 12:00:00")))
      .toDF("iv_id", "user_id", "start_ts", "end_ts")
    val plan = Temporal.rangeJoin(points, ivs, Seq("user_id"),
        "v_ts", "start_ts", "end_ts", "hour")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi plan:\n$plan")
  }

  test("sessionize splits on the gap, counts per-key sessions") {
    val ev = Seq(
      (1L, t("2026-01-01 10:00:00")), (1L, t("2026-01-01 10:20:00")),
      (1L, t("2026-01-01 12:00:00")), // > 1h gap -> new session
      (2L, t("2026-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val s = Temporal.sessionize(ev, Seq("user_id"), "ts", gapSec = 3600)
      .groupBy("user_id", "session_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(s((1L, 1L)) == 2 && s((1L, 2L)) == 1 && s((2L, 1L)) == 1)
  }

  test("asOfJoin ties at identical (key, time) resolve deterministically " +
    "to the greatest payload (review r12)") {
    val right = Seq(
      (1L, t("2026-01-01 10:00:00"), "A"),
      (1L, t("2026-01-01 10:00:00"), "B"),
      (1L, t("2026-01-01 10:00:00"), "C")
    ).toDF("user_id", "ts", "v")
    val leftDf = Seq((9L, 1L, t("2026-01-01 10:30:00")))
      .toDF("trade_id", "user_id", "ts")
    def run(r: org.apache.spark.sql.DataFrame) =
      Temporal.asOfJoin(leftDf, r, Seq("user_id"), "ts", Seq("v"))
        .select("v").collect().map(_.getString(0)).toSeq
    // greatest payload struct: (10:00, "C") — and stable under
    // repartitioning (the old arbitrary pick was partition-dependent)
    assert(run(right) == Seq("C"))
    assert(run(right.repartition(7)) == Seq("C"))
    assert(run(right.orderBy(col("v").desc)) == Seq("C"))
  }

  test("rangeJoin: an effectively-unbounded cap saturates instead of " +
    "wrapping to the quadratic tail (review r12)") {
    val points = Seq((1L, t("2026-01-01 10:30:00")))
      .toDF("user_id", "ts")
    val ivs = Seq((1L, t("2026-01-01 10:00:00"), t("2026-01-01 11:00:00"), "w"))
      .toDF("user_id", "start_ts", "end_ts", "tag")
    val out = Temporal.rangeJoin(points, ivs, Seq("user_id"), "ts",
      "start_ts", "end_ts", maxSpanBuckets = Long.MaxValue / 2)
    assert(out.count() == 1) // wrapped product used to mis-route rows
  }

  test("tumblingAgg drops null timestamps like the rest of the file " +
    "(review r12)") {
    val ev = Seq(
      (Some(t("2026-01-01 10:10:00")), "a", 1.0),
      (None: Option[Timestamp], "a", 99.0),
      (Some(t("2026-01-01 10:20:00")), "a", 2.0)
    ).toDF("ts", "event_type", "value")
    val out = Temporal.tumblingAgg(ev, "ts", "hour", Seq("event_type"),
      Seq(sum("value").as("s"))).collect()
    assert(out.length == 1, "no phantom null-window row")
    assert(out.head.getDouble(2) == 3.0) // (window_start, event_type, s)
  }

  test("tumblingAgg buckets by truncated time") {
    val ev = Seq(
      (t("2026-01-01 10:05:00"), "a", 1.0), (t("2026-01-01 10:55:00"), "a", 2.0),
      (t("2026-01-01 11:05:00"), "a", 4.0), (t("2026-01-01 10:30:00"), "b", 8.0)
    ).toDF("ts", "k", "v")
    val out = Temporal.tumblingAgg(ev, "ts", "hour", Seq("k"),
        Seq(sum("v").as("s"))).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("2026-01-01 10:00:00.0", "a")) == 3.0)
    assert(out(("2026-01-01 11:00:00.0", "a")) == 4.0)
    assert(out(("2026-01-01 10:00:00.0", "b")) == 8.0)
  }
}

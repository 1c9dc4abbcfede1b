package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator battery over the driver testdata.
  *
  * Each query demonstrates one operator family from SURVEY.md §2 using
  * the generic TPC-H-ish tables. The ixmp-semantics versions of the same
  * operators (string-dim item tables, versioned runs) live in
  * `graft.core` / `graft.store`; these entries are what the driver's
  * DuckDB oracle grades.
  *
  * Conventions, chosen so DuckDB hash-compare is byte-stable:
  *   - every output is explicitly ordered by its key columns;
  *   - double aggregates are rounded (summation order differs between
  *     engines at the ULP level);
  *   - counts are long on both sides (DuckDB count = BIGINT);
  *   - integer sums are cast to double in the oracle (DuckDB sum(int)
  *     is HUGEINT, Spark is long — we standardize on the Spark type).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** #1/#26 — pruned scan + filter + multi-aggregate (TPC-H Q1 shape).
    * Scan reads only 7 of 12 lineitem columns; shipdate predicate is
    * pushed to the parquet reader (row-group pruning at scale). */
  def q01ScanFilterAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** #12 — dimension filter with `isin` (ixmp `filters={dim: [vals]}`);
    * absent values ("Z") are silently ignored, matching the reference
    * contract (base.py:997-1005). */
  def q02DimFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R", "Z"))
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** #23 — broadcast join through small dimension tables
    * (region->nation->customer), the codelist-join pattern. Both dims
    * are broadcast: no shuffle of the fact side. */
  def q03BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"),
        round(sum("c_acctbal"), 4).as("sum_bal"))
      .orderBy("r_name", "n_name")

  /** #20/#39 — anti join (update_par "only new keys" / delete semantics):
    * customers that placed no orders. */
  def q04AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** #21 — key-validation semi join (every written key must exist in its
    * index set): orders that have at least one high-discount line. */
  def q05SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(
        t(s, dir, "lineitem").filter(col("l_discount") > 0.05),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy("o_orderkey")

  /** #19 — scenario diff: full outer join of two keyed slices with a
    * provenance indicator (util.diff, util/__init__.py:136-204). */
  def q06DiffFullOuter(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // provenance from EXPLICIT presence markers, not value-column
    // nullness (review r11 — the pattern Util.diff's r9 fix banned: a
    // side whose aggregated value is legitimately null would read as
    // "absent" and misclassify the row; here sum(l_quantity) is never
    // null today, but the gate demos util.diff semantics and must
    // model them correctly)
    val a = li.filter(col("l_returnflag") === "A")
      .groupBy("l_partkey").agg(round(sum("l_quantity"), 4).as("qty_a"))
      .withColumn("__in_a", lit(1))
    val b = li.filter(col("l_returnflag") === "R")
      .groupBy("l_partkey").agg(round(sum("l_quantity"), 4).as("qty_b"))
      .withColumn("__in_b", lit(1))
    a.join(b, Seq("l_partkey"), "full_outer")
      .withColumn("merge_ind",
        when(col("__in_a").isNull, "right_only")
          .when(col("__in_b").isNull, "left_only")
          .otherwise("both"))
      .drop("__in_a", "__in_b")
      .orderBy("l_partkey")
  }

  /** #31 — long->wide pivot (IAMC year-pivot shape): quantities by
    * returnflag pivoted on linestatus. */
  def q07Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("l_quantity"), 4))
      .orderBy("l_returnflag")

  /** #32 — wide->long melt (remove_timeseries shape): unpivot two
    * measure columns of orders into (metric, value) rows. */
  def q08Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("stack(2, 'totalprice', o_totalprice, 'custkey', cast(o_custkey as double)) as (metric, value)"))
      .orderBy("o_orderkey", "metric")

  /** #24 — most-specific-wins coalescing read (meta target hierarchy)
    * as a window: latest order per customer, orderkey tie-break. */
  def q09WindowLatest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy("o_custkey")
  }

  /** #27 — groupby-describe (format_scenario_list): per-customer order
    * inventory with min/max and a conditional max. */
  def q10GroupDescribe(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        round(min("o_totalprice"), 4).as("min_price"),
        round(max("o_totalprice"), 4).as("max_price"),
        date_format(max(when(col("o_orderstatus") === "F", col("o_orderdate"))), "yyyy-MM-dd").as("last_filled"))
      .orderBy("o_custkey")

  /** #38 — drop_duplicates(keep=False) symmetric-difference semantics:
    * (orderkey, partkey) pairs that occur exactly once. */
  def q11DedupKeepFalse(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_orderkey", "l_partkey")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") === 1)
      .select("l_orderkey", "l_partkey")
      .orderBy("l_orderkey", "l_partkey")

  /** #17 — regex match filter (format_scenario_list(match=...)). */
  def q12RegexFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_name").rlike("[13]7$"))
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** §2.6 — ordered top-k with deterministic tie-break. */
  def q13TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 4).as("o_totalprice"))
      .limit(10)

  /** #36 — 0-D scalar squeeze: one global row. */
  def q14Scalar(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** #37 — union/concat then distinct. */
  def q15Union(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val hi = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
    val ur = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    hi.unionByName(ur).distinct().orderBy("o_custkey")
  }

  /** #11 — multi-run TS export: one whole-table join+filter+project job,
    * no per-run loop (Platform.export_timeseries_data). */
  def q16TsExport(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "signup"))
      .groupBy(col("user_id"), col("event_type"),
        year(col("ts")).as("year"), month(col("ts")).as("month"))
      .agg(round(sum("value"), 4).as("value"))
      .orderBy("user_id", "event_type", "year", "month")

  /** #14 — year-range predicate (add_timeseries year_lim). The filter
    * is a direct date-range on the column — NOT `year(col)`, which
    * wraps the column in a function and defeats parquet row-group
    * pruning; as a date interval it reaches PushedFilters. */
  def q17YearRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("o_year")

  /** #25 — broadcast_map: inner-join with a category mapping then
    * re-aggregate along the mapped dimension (map_as_qty consumer).
    * The mapping (priority -> urgency class) is built inline, as the
    * reference builds its category matrix. */
  def q18MappingJoin(s: SparkSession, dir: String): DataFrame = {
    val mapping = s.createDataFrame(Seq(
      ("1-URGENT", "urgent"), ("2-HIGH", "urgent"),
      ("3-MEDIUM", "normal"), ("4-NOT SPECIFIED", "normal"),
      ("5-LOW", "low"))).toDF("o_orderpriority", "urgency")
    t(s, dir, "orders")
      .join(broadcast(mapping), Seq("o_orderpriority"))
      .groupBy("urgency")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("urgency")
  }

  /** #26 — the all-subset partial-sums lattice (Reporter sums=True) as
    * one `cube`: every aggregation across subsets of the dims in a
    * single shuffle instead of 2^n separate jobs. */
  def q19Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** All relational queries with their DuckDB oracles. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_agg" -> q01ScanFilterAgg _,
    "q02_dim_filter" -> q02DimFilter _,
    "q03_broadcast_join" -> q03BroadcastJoin _,
    "q04_anti_join" -> q04AntiJoin _,
    "q05_semi_join" -> q05SemiJoin _,
    "q06_diff_full_outer" -> q06DiffFullOuter _,
    "q07_pivot" -> q07Pivot _,
    "q08_unpivot" -> q08Unpivot _,
    "q09_window_latest" -> q09WindowLatest _,
    "q10_group_describe" -> q10GroupDescribe _,
    "q11_dedup_keep_false" -> q11DedupKeepFalse _,
    "q12_regex_filter" -> q12RegexFilter _,
    "q13_topk" -> q13TopK _,
    "q14_scalar" -> q14Scalar _,
    "q15_union" -> q15Union _,
    "q16_ts_export" -> q16TsExport _,
    "q17_year_range" -> q17YearRange _,
    "q18_mapping_join" -> q18MappingJoin _,
    "q19_cube" -> q19Cube _)

  /** DuckDB SQL equivalents. Table names resolve to parquet files; the
    * driver registers each table from the same sfDir. */
  val oracles: Map[String, String] = Map(
    "q01_scan_filter_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty,
        | round(sum(l_extendedprice), 4) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_dim_filter" ->
      """SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM lineitem WHERE l_returnflag IN ('A','R','Z')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q04_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 4) AS o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        |ORDER BY o_orderkey""".stripMargin,
    "q06_diff_full_outer" ->
      """WITH a AS (SELECT l_partkey, round(sum(l_quantity), 4) AS qty_a
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey),
        |b AS (SELECT l_partkey, round(sum(l_quantity), 4) AS qty_b
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
        |SELECT coalesce(a.l_partkey, b.l_partkey) AS l_partkey, qty_a, qty_b,
        | CASE WHEN a.l_partkey IS NULL THEN 'right_only'
        |      WHEN b.l_partkey IS NULL THEN 'left_only' ELSE 'both' END AS merge_ind
        |FROM a FULL OUTER JOIN b ON a.l_partkey = b.l_partkey
        |ORDER BY l_partkey""".stripMargin,
    "q07_pivot" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F,
        | round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q08_unpivot" ->
      """SELECT o_orderkey, metric, value FROM (
        |  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders)
        |ORDER BY o_orderkey, metric""".stripMargin,
    "q09_window_latest" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q10_group_describe" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | round(min(o_totalprice), 4) AS min_price,
        | round(max(o_totalprice), 4) AS max_price,
        | strftime(max(CASE WHEN o_orderstatus = 'F' THEN o_orderdate END), '%Y-%m-%d') AS last_filled
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q11_dedup_keep_false" ->
      """SELECT l_orderkey, l_partkey FROM lineitem
        |GROUP BY l_orderkey, l_partkey HAVING count(*) = 1
        |ORDER BY l_orderkey, l_partkey""".stripMargin,
    "q12_regex_filter" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_matches(c_name, '[13]7$') ORDER BY c_custkey""".stripMargin,
    "q13_topk" ->
      // ORDER BY orders.o_totalprice (qualified): DuckDB prefers the
      // SELECT alias — the ROUNDED value — for a bare name, while the
      // Spark side ranks by the raw column; >4-decimal prices at the
      // top-10 boundary would then disagree on membership
      """SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice FROM orders
        |ORDER BY orders.o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q14_scalar" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_rows FROM lineitem""".stripMargin,
    "q15_union" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY o_custkey""".stripMargin,
    "q16_ts_export" ->
      """SELECT user_id, event_type,
        | CAST(year(ts) AS INTEGER) AS year, CAST(month(ts) AS INTEGER) AS month,
        | round(sum(value), 4) AS value
        |FROM events WHERE event_type IN ('purchase','signup')
        |GROUP BY user_id, event_type, year(ts), month(ts)
        |ORDER BY user_id, event_type, year, month""".stripMargin,
    "q17_year_range" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
        |FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1998
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q18_mapping_join" ->
      """WITH mapping(o_orderpriority, urgency) AS (VALUES
        |  ('1-URGENT','urgent'), ('2-HIGH','urgent'), ('3-MEDIUM','normal'),
        |  ('4-NOT SPECIFIED','normal'), ('5-LOW','low'))
        |SELECT urgency, count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
        |FROM orders JOIN mapping USING (o_orderpriority)
        |GROUP BY urgency ORDER BY urgency""".stripMargin,
    "q19_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}

package graft.queriesRelational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{transform => transformArray, filter => filterArray}

import graft.Tables

/** The relational operator corpus (SURVEY.md §2 Part B, B1-B30).
  *
  * Each query is expressed with the DataFrame API (Catalyst optimizes:
  * predicate pushdown, column pruning, join selection) and paired with
  * ANSI-ish SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Determinism rules (SURVEY.md §2): every result fully ORDER BY-ed on a
  * unique key; aggregated doubles pass through round(_, 2); computed
  * integers cast to BIGINT on both sides (DuckDB sum(int)->HUGEINT,
  * year()->BIGINT vs Spark int); dates rendered as strings.
  */
object RelationalQueries {

  case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      doc: String = "")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Cross-engine-deterministic rounding. Spark rounds doubles via the
    * shortest decimal string (HALF_UP) while DuckDB rounds the binary
    * value, so `round(x, 2)` diverges at .xx5 boundaries. Instead we
    * quantize with pure IEEE double arithmetic - floor(x*100 + 0.5)/100
    * - which is bit-identical in any engine; sums additionally go
    * through exact integer cents so aggregation order (partial/map-side
    * aggregation under any partitioning) cannot perturb the result.
    * The oracle SQL uses the same formulation.
    */
  private def r2(c: Column): Column = graft.functions.quantize.q2(c)

  private def rN(c: Column, n: Int): Column = graft.functions.quantize.qN(c, n)

  /** Exact sum via integer cents: deterministic under any partitioning. */
  private def sumCents(c: Column): Column =
    sum(floor(c * 100 + lit(0.5))) / lit(100.0)

  // ---------------------------------------------------------------- B1-B6
  /** B13+B24-26+B5/B6: TPC-H Q1-shaped pricing summary; scan+filter
    * pushed to parquet, hash agg with partial (map-side) aggregation.
    */
  private val q01 = Q("q01_pricing_summary", (s, dir) => {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumCents(col("l_quantity")).as("sum_qty"),
        sumCents(col("l_extendedprice")).as("sum_base_price"),
        sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        r2(sumCents(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        rN(sumCents(col("l_discount")) / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }, Some("""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
           CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS sum_disc_price,
           floor((CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0)/count(*)*100 + 0.5)/100.0 AS avg_qty,
           floor((CAST(sum(CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0)/count(*)*10000 + 0.5)/10000.0 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  /** B6: compound predicates — IN, LIKE, BETWEEN, IS NOT NULL. All
    * pushed to the parquet scan (verify via PushedFilters in explain).
    */
  private val q02 = Q("q02_predicates", (s, dir) => {
    t(s, dir, "orders")
      .filter(col("o_orderstatus").isin("F", "O")
        && col("o_orderpriority").like("1-%")
        && col("o_totalprice").between(1000.0, 200000.0)
        && col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }, Some("""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F','O') AND o_orderpriority LIKE '1-%'
      AND o_totalprice BETWEEN 1000.0 AND 200000.0 AND o_orderdate IS NOT NULL
    ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- joins
  /** B7: 3-way inner equi-join + agg (planner picks SMJ/SHJ; at scale
    * the shuffle is on the join keys, AQE handles skew).
    */
  private val q03 = Q("q03_join_revenue", (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_custkey"))
  }, Some("""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
           count(*) AS n_items
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey"""))

  /** B8: left outer join keeping customers with zero orders. */
  private val q04 = Q("q04_left_outer", (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n_f_orders"),
        coalesce(sumCents(o("o_totalprice")), lit(0.0)).as("f_total"))
      .orderBy(col("c_custkey"))
  }, Some("""
    SELECT c_custkey, count(o_orderkey) AS n_f_orders,
           coalesce(CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0, 0.0) AS f_total
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
      ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey"""))

  /** B8: right outer (events side preserved) — written right-outer to
    * exercise the plan shape; equivalent left-outer is q04.
    */
  private val q60 = Q("q60_right_outer", (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000)
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("n_big_orders"))
      .orderBy(col("c_custkey"))
  }, Some("""
    SELECT c_custkey, count(o_orderkey) AS n_big_orders
    FROM (SELECT * FROM orders WHERE o_totalprice > 250000) o
      RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey ORDER BY c_custkey"""))

  /** B8: full outer join — suppliers and customers per nation, either
    * side may be absent.
    */
  private val q61 = Q("q61_full_outer", (s, dir) => {
    val sup = t(s, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val cust = t(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    sup.join(cust, sup("s_nationkey") === cust("c_nationkey"), "full_outer")
      .select(
        coalesce(sup("s_nationkey"), cust("c_nationkey")).as("nationkey"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"))
      .orderBy(col("nationkey"))
  }, Some("""
    WITH sup AS (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY s_nationkey),
    cust AS (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey)
    SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
           coalesce(n_suppliers, 0) AS n_suppliers,
           coalesce(n_customers, 0) AS n_customers
    FROM sup FULL OUTER JOIN cust ON s_nationkey = c_nationkey
    ORDER BY nationkey"""))

  /** B9: left-semi (EXISTS) and left-anti (NOT EXISTS), disjoint union. */
  private val q05 = Q("q05_semi_anti", (s, dir) => {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    val semi = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_urgent").as("tag"))
    val anti = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_urgent").as("tag"))
    semi.unionByName(anti).orderBy(col("c_custkey"))
  }, Some("""
    SELECT c_custkey, 'has_urgent' AS tag FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, 'no_urgent' AS tag FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey"""))

  /** B10: star join with explicit broadcast of the small dimensions —
    * no shuffle of the fact table for the dim joins at any scale.
    */
  private val q06 = Q("q06_broadcast_star", (s, dir) => {
    val l = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sumCents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }, Some("""
    SELECT r_name, n_name,
           CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name"""))

  /** B11: non-equi (range) join -> BroadcastNestedLoopJoin on a small
    * relation; at 100 TB this shape is only ever used dim-x-dim.
    */
  private val q07 = Q("q07_range_join", (s, dir) => {
    val n1 = t(s, dir, "nation").select(col("n_nationkey").as("k1"), col("n_regionkey").as("r1"))
    val n2 = t(s, dir, "nation").select(col("n_nationkey").as("k2"))
    n1.join(n2, col("k2").between(col("k1") + 1, col("k1") + 5))
      .select(col("k1"), col("k2"), col("r1"))
      .orderBy(col("k1"), col("k2"))
  }, Some("""
    SELECT n1.n_nationkey AS k1, n2.n_nationkey AS k2, n1.n_regionkey AS r1
    FROM nation n1 JOIN nation n2
      ON n2.n_nationkey BETWEEN n1.n_nationkey + 1 AND n1.n_nationkey + 5
    ORDER BY k1, k2"""))

  /** B12: cross join (explicit cartesian of two tiny dims). */
  private val q08 = Q("q08_cross_join", (s, dir) => {
    t(s, dir, "region").select(col("r_name"))
      .crossJoin(t(s, dir, "nation").select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))
  }, Some("""
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"""))

  // ----------------------------------------------------------- aggregates
  /** B14: distinct + count-distinct. */
  private val q09 = Q("q09_distinct", (s, dir) => {
    t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment")).distinct()
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }, Some("""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    ORDER BY c_nationkey, c_mktsegment"""))

  private val q10 = Q("q10_count_distinct", (s, dir) => {
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"))
      .orderBy(col("l_returnflag"))
  }, Some("""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** B16: rollup with sentinel totals (null-ordering-proof). */
  private val q11 = Q("q11_rollup", (s, dir) => {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sumCents(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("total_bal"), col("n_cust"))
      .orderBy(col("region"), col("nation"))
  }, Some("""
    SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
           CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS total_bal, count(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region, nation"""))

  /** B16: cube. */
  private val q12 = Q("q12_cube", (s, dir) => {
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumCents(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))
  }, Some("""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status, priority"""))

  /** B17: order-preserving collect + join, shuffle-order-proof via
    * array_sort on (date, key) before extraction (collect_list order
    * after shuffle is nondeterministic — SURVEY.md A10).
    */
  private val q13 = Q("q13_collect_ordered", (s, dir) => {
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(array_join(
        transformArray(
          array_sort(collect_list(struct(col("o_orderdate"), col("o_orderkey"), col("o_orderpriority")))),
          x => x.getField("o_orderpriority")),
        ",").as("priorities"))
      .orderBy(col("o_custkey"))
  }, Some("""
    SELECT o_custkey,
           string_agg(o_orderpriority, ',' ORDER BY o_orderdate, o_orderkey) AS priorities
    FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** B13: HAVING-style post-aggregation filter. */
  private val q14 = Q("q14_having", (s, dir) => {
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), r2(sumCents(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      .filter(col("n_cust") > 3)
      .orderBy(col("c_nationkey"))
  }, Some("""
    SELECT c_nationkey, count(*) AS n_cust,
           floor((CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0)/count(*)*100 + 0.5)/100.0 AS avg_bal
    FROM customer GROUP BY c_nationkey HAVING count(*) > 3
    ORDER BY c_nationkey"""))

  // -------------------------------------------------------------- windows
  /** B18: ranking functions, ties broken by unique key. */
  private val q15 = Q("q15_window_rank", (s, dir) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("c_custkey"))
  }, Some("""
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn, rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_custkey"""))

  /** B19: analytic functions lag/lead/first/last. */
  private val q16 = Q("q16_window_analytic", (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(wFull).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"))
      .orderBy(col("o_orderkey"))
  }, Some("""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
           last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey"""))

  /** B20: running/cumulative frame — the size governor A12 generalized. */
  private val q17 = Q("q17_running_sum", (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5))).over(w) / lit(100.0)).as("running_total"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy(col("o_orderkey"))
  }, Some("""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)/100.0 AS running_total,
           count(*) OVER w AS running_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey"""))

  /** B20: RANGE frame — trailing-30-day order total per customer
    * (value-based frame, not row-based; ordered on epoch days).
    */
  private val q65 = Q("q65_range_frame", (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("_days"))
      .rangeBetween(-30L, 0L)
    t(s, dir, "orders")
      .withColumn("_days", datediff(col("o_orderdate"), to_date(lit("1990-01-01"))).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5))).over(w) / lit(100.0)).as("trailing_30d"),
        count(lit(1)).over(w).as("n_in_window"))
      .orderBy(col("o_orderkey"))
  }, Some("""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)/100.0 AS trailing_30d,
           count(*) OVER w AS n_in_window
    FROM (SELECT *, datediff('day', DATE '1990-01-01', o_orderdate) AS d FROM orders)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY d RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey"""))

  /** B16-adjacent: pivot (orders per status as columns) — Spark
    * `pivot` with an explicit value list; the oracle uses conditional
    * aggregation, the engine-portable formulation.
    */
  private val q66 = Q("q66_pivot", (s, dir) => {
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_custkey"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_custkey"))
  }, Some("""
    SELECT o_custkey,
           count(*) FILTER (o_orderstatus = 'F') AS n_f,
           count(*) FILTER (o_orderstatus = 'O') AS n_o,
           count(*) FILTER (o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  /** B16/B47 reshaping: unpivot (melt) wide metric columns into
    * (metric, value) rows — the inverse of q66's pivot. Spark's
    * `unpivot` plans as a generator expansion (narrow, no shuffle);
    * the oracle replays it as UNION ALL. Values pass through
    * unchanged (no arithmetic), so doubles compare exactly.
    */
  private val q86 = Q("q86_unpivot", (s, dir) => {
    t(s, dir, "part")
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("retailprice"),
        col("p_size").cast("double").as("size"))
      .unpivot(Array(col("p_partkey")), Array(col("retailprice"), col("size")),
        "metric", "value")
      .orderBy(col("p_partkey"), col("metric"))
  }, Some("""
    SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    ORDER BY p_partkey, metric"""))

  /** B21: top-k per group via ranked window + filter (no global sort). */
  private val q18 = Q("q18_topk_per_group", (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }, Some("""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) sub
    WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** B21: global sort + limit (TakeOrderedAndProject — O(k) per
    * partition then k-merge on driver; no full sort at scale).
    */
  private val q19 = Q("q19_top100", (s, dir) => {
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }, Some("""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  // -------------------------------------------------------------- set ops
  /** B22/B23: intersect / except (distinct semantics) + union-by-name. */
  private val q20 = Q("q20_intersect", (s, dir) => {
    val c = t(s, dir, "customer")
    c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      .intersect(c.filter(col("c_acctbal") > 0).select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }, Some("""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    ORDER BY c_custkey"""))

  private val q21 = Q("q21_except", (s, dir) => {
    val c = t(s, dir, "customer")
    c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
      .except(c.filter(col("c_acctbal") > 0).select(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }, Some("""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    ORDER BY c_custkey"""))

  // ------------------------------------------------------ scalar functions
  /** B24: string functions. */
  private val q22 = Q("q22_string_funcs", (s, dir) => {
    t(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 8).as("prefix8"),
        length(col("p_name")).cast("long").as("name_len"),
        size(split(col("p_name"), " ")).cast("long").as("n_tokens"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        replace(col("p_type"), lit("PLATED"), lit("COATED")).as("retyped"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))
  }, Some("""
    SELECT p_partkey, upper(p_name) AS uname, substring(p_name, 1, 8) AS prefix8,
           CAST(length(p_name) AS BIGINT) AS name_len,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word,
           replace(p_type, 'PLATED', 'COATED') AS retyped,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part ORDER BY p_partkey"""))

  /** B25: date/time functions (outputs as strings/bigints for
    * cross-engine hash stability).
    */
  private val q23 = Q("q23_datetime", (s, dir) => {
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(to_date(lit("1999-01-01")), col("o_orderdate")).cast("long").as("days_to_99"))
      .orderBy(col("o_orderkey"))
  }, Some("""
    SELECT o_orderkey,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo, dayofmonth(o_orderdate) AS dom,
           strftime(o_orderdate, '%Y-%m-%d') AS d_str,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           datediff('day', o_orderdate, DATE '1999-01-01') AS days_to_99
    FROM orders ORDER BY o_orderkey"""))

  /** B26: math functions. */
  private val q24 = Q("q24_math", (s, dir) => {
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        r2(col("l_extendedprice") * col("l_discount")).as("disc_amount"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        r2(abs(col("l_extendedprice") - lit(30000.0))).as("dev_30k"),
        rN(pow(col("l_discount"), 2), 6).as("disc_sq"),
        rN(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        (col("l_orderkey") % 7).as("key_mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }, Some("""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice*l_discount*100 + 0.5)/100.0 AS disc_amount,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           floor(abs(l_extendedprice - 30000.0)*100 + 0.5)/100.0 AS dev_30k,
           floor(power(l_discount, 2)*1000000 + 0.5)/1000000.0 AS disc_sq,
           floor(sqrt(l_quantity)*1000000 + 0.5)/1000000.0 AS qty_sqrt,
           l_orderkey % 7 AS key_mod7
    FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** B27: array higher-order functions over tokenized text. */
  private val q25 = Q("q25_array_funcs", (s, dir) => {
    val toks = split(col("text"), " ")
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        element_at(toks, 1).as("first_token"),
        size(filterArray(toks, x => length(x) > 4)).cast("long").as("n_long_tokens"),
        aggregate(transformArray(toks, x => length(x).cast("long")), lit(0L), (a, x) => a + x).as("total_chars"),
        array_join(slice(sort_array(toks), 1, 3), "|").as("first3_sorted"))
      .orderBy(col("doc_id"))
  }, Some("""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS BIGINT) AS n_long_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '), x -> len(x))) AS BIGINT) AS total_chars,
           array_to_string(list_sort(string_split(text, ' '))[1:3], '|') AS first3_sorted
    FROM documents ORDER BY doc_id"""))

  /** B29: JSON extraction from the events.props column. */
  private val q26 = Q("q26_json", (s, dir) => {
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_value"))
      .orderBy(col("event_id"))
  }, Some("""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_value
    FROM events ORDER BY event_id"""))

  /** B30: hash/codec functions. */
  private val q27 = Q("q27_hash_codec", (s, dir) => {
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(encode(col("text"), "UTF-8")).as("text_md5"),
        sha2(encode(col("text"), "UTF-8"), 256).as("text_sha256"),
        base64(encode(substring(col("text"), 1, 12), "UTF-8")).as("prefix_b64"))
      .orderBy(col("doc_id"))
  }, Some("""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256,
           to_base64(encode(substring(text, 1, 12))) AS prefix_b64
    FROM documents ORDER BY doc_id"""))

  /** B31: gzip/gunzip round-trip (custom Catalyst expressions) — the
    * oracle checks the invariant gunzip(gzip(x)) = x holds for ALL rows
    * by comparing against plain count(*).
    */
  private val q28 = Q("q28_gzip_roundtrip", (s, dir) => {
    import graft.functions.codecs
    t(s, dir, "documents")
      .filter(codecs.gunzip(codecs.gzip(encode(col("text"), "UTF-8"))).cast("string") === col("text"))
      .agg(count(lit(1)).as("n_roundtrip"))
  }, Some("""
    SELECT count(*) AS n_roundtrip FROM documents"""))

  /** B15: approximate distinct (HLL++). No hash oracle — checked
    * rows-only by the driver; the ApproxSpec unit test asserts the 5%
    * relative-error bound against the exact count.
    */
  private val q29 = Q("q29_approx_distinct", (s, dir) => {
    t(s, dir, "lineitem")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
  }, None)

  /** B13/B15 extension: exact percentiles (quartiles + p90 of extended
    * price, median quantity) per return flag, via two-pass bucketed
    * selection ([[graft.operators.Quantiles.exactPercentiles]]) — NOT
    * the built-in `percentile` imperative aggregate, whose per-group
    * value maps made this the whole-corpus bench outlier (8.6 s; the
    * bucketed plan runs ~1.7 s and shuffles only bucket counters).
    * Same linear interpolation at rank p*(n-1) as DuckDB's
    * `quantile_cont`, so the quantized values hash-match; ApproxSpec
    * asserts bit-level agreement with the built-in aggregate and the
    * approx_percentile error bound against this exact one.
    */
  private val q76 = Q("q76_percentiles", (s, dir) => {
    import graft.operators.Quantiles
    val li = t(s, dir, "lineitem")
    val price = Quantiles.exactPercentiles(li, col("l_returnflag"),
      col("l_extendedprice"),
      Seq("p25_price" -> 0.25, "p50_price" -> 0.5, "p75_price" -> 0.75, "p90_price" -> 0.9))
    val qty = Quantiles.exactPercentiles(li, col("l_returnflag"),
      col("l_quantity"), Seq("med_qty" -> 0.5)).select(col("_g"), col("med_qty"))
    price.join(qty, "_g")
      .select(col("_g").as("l_returnflag"),
        rN(col("p25_price"), 4).as("p25_price"),
        rN(col("p50_price"), 4).as("p50_price"),
        rN(col("p75_price"), 4).as("p75_price"),
        rN(col("p90_price"), 4).as("p90_price"),
        rN(col("med_qty"), 4).as("med_qty"),
        col("n"))
      .orderBy(col("l_returnflag"))
  }, Some("""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.25) * 10000 + 0.5) / 10000.0 AS p25_price,
           floor(quantile_cont(l_extendedprice, 0.5)  * 10000 + 0.5) / 10000.0 AS p50_price,
           floor(quantile_cont(l_extendedprice, 0.75) * 10000 + 0.5) / 10000.0 AS p75_price,
           floor(quantile_cont(l_extendedprice, 0.9)  * 10000 + 0.5) / 10000.0 AS p90_price,
           floor(quantile_cont(l_quantity, 0.5) * 10000 + 0.5) / 10000.0 AS med_qty,
           count(l_extendedprice) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** B28: map functions (build a map from entries, then inspect). */
  private val q30 = Q("q30_map_funcs", (s, dir) => {
    val m = map_from_entries(transformArray(array_distinct(split(col("text"), " ")),
      x => struct(x.as("key"), length(x).cast("long").as("value"))))
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(map_keys(m)).cast("long").as("n_distinct_tokens"),
        element_at(m, element_at(split(col("text"), " "), 1)).as("first_token_len"))
      .orderBy(col("doc_id"))
  }, Some("""
    SELECT doc_id,
           CAST(cardinality(map_from_entries(list_transform(list_distinct(string_split(text,' ')),
                x -> {'key': x, 'value': len(x)}))) AS BIGINT) AS n_distinct_tokens,
           CAST(len(string_split(text,' ')[1]) AS BIGINT) AS first_token_len
    FROM documents ORDER BY doc_id"""))

  /** B24/B25/B26/B28/B29 leftovers: trim/lower, epoch seconds, natural
    * log, map_values aggregation, json_tuple-style multi-extract.
    */
  private val q67 = Q("q67_scalar_misc", (s, dir) => {
    val m = map_from_entries(transformArray(array_distinct(split(col("text"), " ")),
      x => struct(x.as("key"), length(x).cast("long").as("value"))))
    Tables.events(s, dir)
      .join(t(s, dir, "documents"), col("event_id") === col("doc_id"))
      .select(col("event_id"),
        lower(trim(substring(col("text"), 1, 16))).as("prefix_lc"),
        unix_timestamp(col("ts")).as("epoch_s"),
        rN(log(col("n_chars").cast("double")), 6).as("ln_chars"),
        aggregate(map_values(m), lit(0L), (a, x) => a + x).as("sum_tok_lens"),
        get_json_object(col("props"), "$.k").cast("long").as("k1"))
      .orderBy(col("event_id"))
  }, Some("""
    SELECT event_id,
           lower(trim(substring(text, 1, 16))) AS prefix_lc,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           floor(ln(CAST(n_chars AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS ln_chars,
           CAST(list_reduce(list_concat([0], list_transform(list_distinct(string_split(text, ' ')), x -> len(x))), (a, b) -> a + b) AS BIGINT) AS sum_tok_lens,
           CAST(props->>'$.k' AS BIGINT) AS k1
    FROM events JOIN documents ON event_id = doc_id
    ORDER BY event_id"""))

  /** B18 completion: distribution window functions — ntile buckets,
    * percent_rank, cume_dist. Deterministic because the window orders
    * by the unique o_orderkey (no peer-group ambiguity for ntile).
    */
  private val q107 = Q("q107_window_distribution", (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
    t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        rN(percent_rank().over(w), 6).as("pct_rank"),
        rN(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderkey"))
  }, Some("""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS pct_rank,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0 AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    ORDER BY o_orderkey"""))

  /** 2-D Pareto frontier over parts: cheapest-and-smallest (price in
    * exact cents, size integer). The operator runs the bucketed
    * distributed plan (Skyline.scala); the oracle is the NOT-EXISTS
    * domination definition — implementation-independent, so any
    * bucketing/window bug surfaces as a row-set mismatch.
    */
  private val q119 = Q("q119_skyline", (s, dir) => {
    val parts = t(s, dir, "part").select(col("p_partkey"), col("p_size"),
      floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("price_c"))
    graft.operators.Skyline.skyline2D(parts, col("price_c"), col("p_size"),
        bucketWidth = 10000L)
      .select(col("p_partkey"), col("price_c"), col("p_size"))
      .orderBy(col("p_partkey"))
  }, Some("""
    WITH p AS (
      SELECT p_partkey, CAST(p_size AS INT) AS p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM part)
    SELECT p_partkey, price_c, p_size
    FROM p r
    WHERE NOT EXISTS (
      SELECT 1 FROM p s
      WHERE s.price_c <= r.price_c AND s.p_size <= r.p_size
        AND (s.price_c < r.price_c OR s.p_size < r.p_size))
    ORDER BY p_partkey"""))

  /** Robust median/MAD outlier detection per order priority (operator:
    * Quantiles.robustOutliers — FOUR scans since round 12's medianMad
    * fusion derives the MAD's candidate buckets from the median
    * pass's histogram instead of re-bucketing the deviations;
    * kilobyte shuffles, no data sort). Prices ride the exact cents
    * grid, so med/mad are exact .0/.5 doubles and the k*MAD threshold
    * is engine-independent. The oracle replays the same interpolated
    * rank-select median twice — the fusion changes scan count, not
    * values.
    */
  private val q123 = Q("q123_robust_outliers", (s, dir) => {
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("price_c"))
    graft.operators.Quantiles.robustOutliers(o, col("o_orderpriority"), col("price_c"), k = 2.0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("price_c"),
        col("med"), col("mad"))
      .orderBy(col("o_orderkey"))
  }, Some("""
    WITH o AS (SELECT o_orderkey, o_orderpriority AS g,
                      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
               FROM orders),
    r AS (SELECT *, CAST(price_c AS DOUBLE) AS v,
                 row_number() OVER (PARTITION BY g ORDER BY price_c) AS rn,
                 count(*) OVER (PARTITION BY g) AS n
          FROM o),
    m AS (SELECT g,
                 max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN v END) AS vlo,
                 max(CASE WHEN rn = least(CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n) THEN v END) AS vhi,
                 max(0.5 * (n - 1) - floor(0.5 * (n - 1))) AS frac
          FROM r GROUP BY g),
    medt AS (SELECT g, vlo + (vhi - vlo) * frac AS med FROM m),
    a AS (SELECT o.*, medt.med, abs(CAST(o.price_c AS DOUBLE) - medt.med) AS av
          FROM o JOIN medt ON o.g = medt.g),
    r2 AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY av) AS rn2,
                  count(*) OVER (PARTITION BY g) AS n2
           FROM a),
    m2 AS (SELECT g,
                  max(CASE WHEN rn2 = CAST(floor(0.5 * (n2 - 1)) AS BIGINT) + 1 THEN av END) AS vlo,
                  max(CASE WHEN rn2 = least(CAST(floor(0.5 * (n2 - 1)) AS BIGINT) + 2, n2) THEN av END) AS vhi,
                  max(0.5 * (n2 - 1) - floor(0.5 * (n2 - 1))) AS frac
           FROM r2 GROUP BY g),
    madt AS (SELECT g, vlo + (vhi - vlo) * frac AS mad FROM m2)
    SELECT a.o_orderkey, a.g AS o_orderpriority, a.price_c, a.med, madt.mad
    FROM a JOIN madt ON a.g = madt.g
    WHERE a.av > 2.0 * madt.mad
    ORDER BY a.o_orderkey"""))

  /** Equi-depth binning into quartiles per return flag (operator:
    * Quantiles.equiDepthBin — one exactPercentiles round broadcast
    * back, narrow assignment, no ntile shuffle). The oracle
    * recomputes the interpolated quartile boundaries by rank-select
    * and counts boundaries-strictly-below per row.
    */
  private val q132 = Q("q132_equidepth_bins", (s, dir) => {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("price_c"))
    graft.operators.Quantiles.equiDepthBin(li, col("l_returnflag"), col("price_c"), nBins = 4)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("price_c"), col("bin").cast("int").as("bin"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("price_c"))
  }, Some("""
    WITH o AS (SELECT l_orderkey, l_linenumber, l_returnflag AS g,
                      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
               FROM lineitem),
    r AS (SELECT *, CAST(price_c AS DOUBLE) AS v,
                 row_number() OVER (PARTITION BY g ORDER BY price_c) AS rn,
                 count(*) OVER (PARTITION BY g) AS n
          FROM o),
    gs AS (SELECT DISTINCT g, n FROM r),
    ps AS (SELECT unnest([0.25, 0.5, 0.75]) AS p),
    loc AS (SELECT gs.g, ps.p,
                   CAST(floor(ps.p * (gs.n - 1)) AS BIGINT) + 1 AS lo,
                   least(CAST(floor(ps.p * (gs.n - 1)) AS BIGINT) + 2, gs.n) AS hi,
                   ps.p * (gs.n - 1) - floor(ps.p * (gs.n - 1)) AS frac
            FROM gs CROSS JOIN ps),
    bvals AS (SELECT loc.g, loc.p,
                     max(CASE WHEN r.rn = loc.lo THEN r.v END) +
                     (max(CASE WHEN r.rn = loc.hi THEN r.v END) -
                      max(CASE WHEN r.rn = loc.lo THEN r.v END)) * max(loc.frac) AS bv
              FROM loc JOIN r ON r.g = loc.g
              GROUP BY loc.g, loc.p)
    SELECT o.l_orderkey, o.l_linenumber, o.g AS l_returnflag, o.price_c,
           CAST(sum(CASE WHEN CAST(o.price_c AS DOUBLE) > bvals.bv THEN 1 ELSE 0 END) AS INT) AS bin
    FROM o JOIN bvals ON bvals.g = o.g
    GROUP BY o.l_orderkey, o.l_linenumber, o.g, o.price_c
    ORDER BY o.l_orderkey, o.l_linenumber, o.g, o.price_c"""))

  /** Winsorized tail-taming per return flag (operator:
    * Quantiles.winsorize — one exactPercentiles round for DISCRETE
    * rank-select p05/p95 bounds, broadcast back, narrow clip; the
    * data never sorts or shuffles). Cents grid end to end: bounds are
    * actual data values, clip comparisons and the clipped sum are
    * pure integers. The oracle replays rank-select + clamp and
    * re-aggregates — a wrong bound rank, an interpolation sneaking
    * in, or a mis-clipped boundary row all surface as mismatches.
    */
  private val q191 = Q("q191_winsorize", (s, dir) => {
    val li = t(s, dir, "lineitem").select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("price_c"))
    graft.operators.Quantiles.winsorize(li, col("l_returnflag"), col("price_c"),
        pLo = 0.05, pHi = 0.95)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("price_c").cast("double") < col("wlo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("price_c").cast("double") > col("whi"), 1L).otherwise(0L)).as("n_clip_hi"),
        max(col("wlo").cast("long")).as("wlo_c"),
        max(col("whi").cast("long")).as("whi_c"),
        sum(col("winsorized").cast("long")).as("sum_wins_c"))
      .orderBy(col("l_returnflag"))
  }, Some("""
    WITH o AS (SELECT l_returnflag AS g,
                      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
               FROM lineitem),
    r AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY c) AS rn,
                 count(*) OVER (PARTITION BY g) AS n
          FROM o),
    b AS (SELECT g,
                 max(CASE WHEN rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1 THEN c END) AS wlo,
                 max(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1 THEN c END) AS whi
          FROM r GROUP BY g)
    SELECT o.g AS l_returnflag, count(*) AS n,
           CAST(sum(CASE WHEN o.c < b.wlo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
           CAST(sum(CASE WHEN o.c > b.whi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
           max(b.wlo) AS wlo_c, max(b.whi) AS whi_c,
           CAST(sum(least(greatest(o.c, b.wlo), b.whi)) AS BIGINT) AS sum_wins_c
    FROM o JOIN b ON o.g = b.g
    GROUP BY o.g ORDER BY l_returnflag"""))

  /** Z-order clustering key over (p_size, whole-dollar price) — the
    * multi-dimensional data-layout key (SkewOps.zorderKey2; locality
    * effect measured in SkewSpec). 10 bits cover both dims (size <=
    * 50, price 900-999); the oracle unrolls the same 10 interleave
    * terms as integer arithmetic.
    */
  private val q136 = Q("q136_zorder_key", (s, dir) => {
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_size"),
      floor(col("p_retailprice")).cast("long").as("price_d"))
    p.withColumn("zkey",
        graft.operators.SkewOps.zorderKey2(col("p_size"), col("price_d"), bits = 10))
      .orderBy(col("p_partkey"))
  }, Some {
    val terms = (0 until 10).flatMap { i =>
      Seq(s"((p_size // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((price_d // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }
    s"""
    WITH p AS (SELECT p_partkey, p_size,
                      CAST(floor(p_retailprice) AS BIGINT) AS price_d
               FROM part)
    SELECT p_partkey, p_size, price_d,
           CAST(${terms.mkString(" + ")} AS BIGINT) AS zkey
    FROM p ORDER BY p_partkey"""
  })

  val list: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q30, q60, q61, q65, q66, q67, q76, q86, q107,
    q119, q123, q132, q136, q191)

  def all: Map[String, (SparkSession, String) => DataFrame] =
    list.map(q => q.name -> q.fn).toMap

  def oracle: Map[String, String] =
    list.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim.replaceAll("\\s+", " "))).toMap
}

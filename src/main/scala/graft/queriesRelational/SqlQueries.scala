package graft.queriesRelational

import graft.Tables
import graft.queriesRelational.RelationalQueries.Q

/** SQL-text entry point (the engine's full ANSI SQL parser via
  * spark.sql over registered views — a surface the reference has no
  * analogue of) + subquery coverage.
  */
object SqlQueries {

  /** TPC-H Q5-shaped local-supplier volume, written as SQL text and
    * parsed/planned by Catalyst like any DataFrame query. The
    * c_nationkey = s_nationkey condition makes the join graph cyclic —
    * a real join-reorder workout.
    */
  private val q57 = Q("q57_sql_text", (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT n_name,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
      GROUP BY n_name
      ORDER BY n_name""")
  }, Some("""
    SELECT n_name,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    ORDER BY n_name"""))

  /** Correlated scalar subquery: parts priced >= 1.05x their type's
    * average (Catalyst de-correlates into an aggregate + join).
    */
  private val q58 = Q("q58_correlated_subquery", (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT p_partkey, p_type, p_retailprice
      FROM part p
      WHERE p_retailprice >= 1.05 * (
        SELECT floor(avg(p_retailprice) * 1000000 + 0.5) / 1000000.0
        FROM part q WHERE q.p_type = p.p_type)
      ORDER BY p_partkey""")
  }, Some("""
    SELECT p_partkey, p_type, p_retailprice
    FROM part p
    WHERE p_retailprice >= 1.05 * (
      SELECT floor(avg(p_retailprice) * 1000000 + 0.5) / 1000000.0
      FROM part q WHERE q.p_type = p.p_type)
    ORDER BY p_partkey"""))

  /** Uncorrelated IN-subquery + aggregate filter in SQL text. */
  private val q59 = Q("q59_in_subquery", (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        AND o_totalprice > 150000
      ORDER BY o_orderkey""")
  }, Some("""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > 150000
    ORDER BY o_orderkey"""))

  /** B16: explicit GROUPING SETS with grouping() disambiguation (the
    * third shape besides rollup q11 / cube q12).
    */
  private val q68 = Q("q68_grouping_sets", (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
             count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")
  }, Some("""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority"""))

  val list: Seq[Q] = Seq(q57, q58, q59, q68)
}

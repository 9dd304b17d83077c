package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05(Tables(spark, "/root/testdata/sf0.001"))

  private def q(f: Tables => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Tables(s, dir))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q(Relational.q01),
    "q02_filter_project"  -> q(Relational.q02),
    "q03_topk_revenue"    -> q(Relational.q03),
    "q04_semijoin"        -> q(Relational.q04),
    "q05_multijoin"       -> q(Relational.q05),
    "q06_selective_agg"   -> q(Relational.q06),
    "q07_window_topn"     -> q(Relational.q07),
    "q08_running_window"  -> q(Relational.q08),
    "q09_distinct_agg"    -> q(Relational.q09),
    "q10_antijoin"        -> q(Relational.q10),
    "q11_union_all"       -> q(Relational.q11),
    "q12_conditional_agg" -> q(Relational.q12),
    "q13_outer_join"      -> q(Relational.q13),
    "q14_expr_ratio"      -> q(Relational.q14),
    "q15_top_supplier"    -> q(Relational.q15),
    "q16_rollup"          -> q(Relational.q16),
    "q17_scalar_subquery" -> q(Relational.q17),
    "q18_having"          -> q(Relational.q18),
    "q19_complex_pred"    -> q(Relational.q19),
    "q20_pivot"           -> q(Relational.q20),
  )

  // ---- oracle SQL fragments (keep in lockstep with Portable helpers) ----

  /** CAST(x AS DECIMAL(18,2)) — lossless for the testdata's 2-dec doubles. */
  private def d2(x: String) = s"CAST($x AS DECIMAL(18,2))"
  /** l_extendedprice*(1-l_discount) as exact DECIMAL(18,4) (= Portable.revenue). */
  private val REV =
    s"CAST(${d2("l_extendedprice")} * ${d2("1 - l_discount")} AS DECIMAL(18,4))"
  private def dSum(x: String) = s"CAST(SUM(${d2(x)}) AS DOUBLE)"
  private def dAvg(x: String) = s"CAST(SUM(${d2(x)}) AS DOUBLE) / COUNT($x)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dSum("l_quantity")} AS sum_qty,
         |  ${dSum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($REV) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM(CAST($REV * ${d2("1 + l_tax")} AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
         |  ${dAvg("l_quantity")} AS avg_qty,
         |  ${dAvg("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_topk_revenue" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(SUM($REV) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-03-15'
         |  AND l_shipdate > TIMESTAMP '1996-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 20""".stripMargin,

    "q04_semijoin" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q05_multijoin" ->
      s"""SELECT n_name, CAST(SUM($REV) AS DOUBLE) AS revenue
         |FROM region, nation, customer, orders, lineitem, supplier
         |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
         |  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |  AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_selective_agg" ->
      s"""SELECT CAST(SUM(CAST(${d2("l_extendedprice")} * ${d2("l_discount")} AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,

    "q07_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q08_running_window" ->
      s"""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
         |  CAST(SUM($REV) OVER (PARTITION BY l_suppkey
         |    ORDER BY l_shipdate, l_orderkey, l_linenumber
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
         |FROM lineitem WHERE l_suppkey < 10
         |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,

    "q09_distinct_agg" ->
      s"""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
         |  COUNT(*) AS n_orders, ${dSum("o_totalprice")} AS total_price
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q10_antijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01')
        |ORDER BY c_custkey""".stripMargin,

    "q11_union_all" ->
      """SELECT event_type, COUNT(*) AS n
        |FROM (SELECT event_type FROM events WHERE value > 150.0
        |      UNION ALL
        |      SELECT event_type FROM events WHERE user_id % 10 = 0)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q12_conditional_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN l_quantity > 25.0 THEN 1 END) AS high_qty_count,
        |  COUNT(CASE WHEN l_quantity <= 25.0 THEN 1 END) AS low_qty_count
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q13_outer_join" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_expr_ratio" ->
      s"""SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $REV END) AS DOUBLE))
         |    / CAST(SUM($REV) AS DOUBLE) AS promo_ratio,
         |  COUNT(*) AS n_rows
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, SUM($REV) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q16_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${dSum("c_acctbal")} AS total_bal
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q17_scalar_subquery" ->
      s"""WITH pa AS (
         |  SELECT l_partkey AS ap_partkey,
         |    0.2 * (CAST(SUM(${d2("l_quantity")}) AS DOUBLE) / COUNT(l_quantity)) AS qty_threshold
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT ${dSum("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n_rows
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |JOIN pa ON ap_partkey = l_partkey
         |WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold""".stripMargin,

    "q18_having" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, SUM(${d2("l_quantity")}) AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING SUM(${d2("l_quantity")}) > 150)
         |SELECT c_custkey, c_name, o_orderkey, o_totalprice,
         |  CAST(total_qty AS DOUBLE) AS total_qty
         |FROM customer
         |JOIN orders ON o_custkey = c_custkey
         |JOIN big ON l_orderkey = o_orderkey
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 50""".stripMargin,

    "q19_complex_pred" ->
      s"""SELECT CAST(SUM($REV) AS DOUBLE) AS revenue, COUNT(*) AS n_rows
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity >= 1.0 AND l_quantity <= 11.0)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity >= 10.0 AND l_quantity <= 20.0)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= 20.0 AND l_quantity <= 30.0)""".stripMargin,

    "q20_pivot" -> {
      def pivotRev(s: String) =
        s"CAST(SUM(CASE WHEN o_orderstatus = '$s' THEN ${d2("o_totalprice")} ELSE ${d2("0")} END) AS DOUBLE)"
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         |  ${pivotRev("F")} AS rev_f,
         |  ${pivotRev("O")} AS rev_o,
         |  ${pivotRev("P")} AS rev_p,
         |  COUNT(*) AS n_orders
         |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin
    },
  )
}

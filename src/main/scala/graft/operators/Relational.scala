package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.util.Portable._

/** Relational operator suite (SURVEY.md §2, q01–q20).
  *
  * Every query is a declarative DataFrame plan — filters and
  * projections reach the parquet scan, joins shuffle on their keys (or
  * broadcast for true dimension tables region/nation, ≤25 rows at ANY
  * scale factor), aggregation is partial (map-side combine) by
  * construction. Nothing collects to the driver.
  */
object Relational {

  /** q01: TPC-H Q1-style pricing summary. Scan → filter → hash agg. */
  def q01(t: Tables): DataFrame = {
    val disc  = dec(lit(1.0) - col("l_discount"))
    val tax   = dec(lit(1.0) + col("l_tax"))
    val dp    = (dec(col("l_extendedprice")) * disc).cast(D4)
    t.lineitem
      .filter(col("l_shipdate") <= ts("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        sum(dp).cast("double").as("sum_disc_price"),
        sum((dp * tax).cast(D6)).cast("double").as("sum_charge"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: selective filter + narrow projection (pushdown showcase). */
  def q02(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= ts("1997-06-01") && col("l_discount") > lit(0.05))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q03: TPC-H Q3 — 3-way join, agg, top-k by revenue. */
  def q03(t: Tables): DataFrame =
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .join(t.orders.filter(col("o_orderdate") < ts("1996-03-15")),
        col("c_custkey") === col("o_custkey"))
      .join(t.lineitem.filter(col("l_shipdate") > ts("1996-03-15")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)

  /** q04: TPC-H Q4 — EXISTS as a left-semi join (no row duplication,
    * no distinct needed; the semi join short-circuits per key).
    */
  def q04(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") >= ts("1996-07-01") && col("o_orderdate") < ts("1996-10-01"))
      .join(t.lineitem,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** q05: TPC-H Q5 — 6-table snowflake join. region/nation broadcast
    * (bounded dims at any SF); fact-fact joins left to AQE.
    */
  def q05(t: Tables): DataFrame =
    broadcast(t.region.filter(col("r_name") === "ASIA"))
      .join(broadcast(t.nation), col("n_regionkey") === col("r_regionkey"))
      .join(t.customer, col("c_nationkey") === col("n_nationkey"))
      .join(t.orders.filter(
        col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01")),
        col("o_custkey") === col("c_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier,
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** q06: TPC-H Q6 — selective scan agg; single stage, no shuffle
    * beyond the final 1-row combine.
    */
  def q06(t: Tables): DataFrame =
    t.lineitem
      .filter(
        col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.07) &&
          col("l_quantity") < lit(24.0))
      .agg(
        sum((dec(col("l_extendedprice")) * dec(col("l_discount"))).cast(D4))
          .cast("double").as("promo_revenue"),
        count(lit(1)).as("n_rows"))

  /** q07: window top-N per group (row_number, deterministic tie-break). */
  def q07(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q08: running revenue per supplier (rows-unbounded-preceding). */
  def q08(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.lineitem
      .filter(col("l_suppkey") < 10)
      .withColumn("running_revenue",
        sum(revenue(col("l_extendedprice"), col("l_discount"))).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("running_revenue"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
  }

  /** q09: multi-distinct aggregation. */
  def q09(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))

  /** q10: NOT EXISTS as a left-anti join (customers idle in a window). */
  def q10(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(
        col("o_orderdate") >= ts("1995-01-01") && col("o_orderdate") < ts("1995-04-01")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** q11: union all of two filtered branches + agg. */
  def q11(t: Tables): DataFrame = {
    val a = t.events.filter(col("value") > lit(150.0)).select(col("event_type"))
    val b = t.events.filter(col("user_id") % 10 === 0).select(col("event_type"))
    a.union(b)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** q12: TPC-H Q12-style conditional aggregation (count-if buckets). */
  def q12(t: Tables): DataFrame =
    t.orders
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("l_quantity") > 25.0, 1)).as("high_qty_count"),
        count(when(col("l_quantity") <= 25.0, 1)).as("low_qty_count"))
      .orderBy(col("o_orderpriority"))

  /** q13: TPC-H Q13 — left outer join, count distribution incl. zero. */
  def q13(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** q14: TPC-H Q14 — expression ratio over a join. */
  def q14(t: Tables): DataFrame = {
    val rev = revenue(col("l_extendedprice"), col("l_discount"))
    t.lineitem
      .filter(col("l_shipdate") >= ts("1996-09-01") && col("l_shipdate") < ts("1996-10-01"))
      .join(t.part, col("p_partkey") === col("l_partkey"))
      .agg(
        ((lit(100.0) * sum(when(col("p_type") === "PROMO", rev)).cast("double")) /
          sum(rev).cast("double")).as("promo_ratio"),
        count(lit(1)).as("n_rows"))
  }

  /** q15: TPC-H Q15 — top supplier by quarterly revenue; the
    * revenue-equals-max comparison is on EXACT decimals, so the
    * equality is deterministic (never compare computed doubles).
    */
  def q15(t: Tables): DataFrame = {
    val rev = t.lineitem
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    t.supplier
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** q16: ROLLUP aggregation over the region/nation hierarchy. */
  def q16(t: Tables): DataFrame =
    broadcast(t.region)
      .join(broadcast(t.nation), col("n_regionkey") === col("r_regionkey"))
      .join(t.customer, col("c_nationkey") === col("n_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), decSum(col("c_acctbal")).as("total_bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** q56: CUBE — all 2^k grouping-set combinations (the rollup's
    * sibling; cross-dimensional subtotals incl. per-segment-only).
    * grouping_id disambiguates real NULL keys from subtotal rows.
    */
  def q56(t: Tables): DataFrame =
    t.customer
      .cube(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), decSum(col("c_acctbal")).as("total_bal"),
        grouping_id().cast("long").as("gid"))
      .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("c_nationkey"))

  /** q17: TPC-H Q17 — correlated scalar subquery (avg qty per part),
    * decorrelated into an aggregate + re-join (what Catalyst would do;
    * stated explicitly so the plan is one shuffle on partkey).
    */
  def q17(t: Tables): DataFrame = {
    val partAvg = t.lineitem
      .groupBy(col("l_partkey").as("ap_partkey"))
      .agg((lit(0.2) * (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity"))))
        .as("qty_threshold"))
    t.lineitem
      .join(t.part.filter(col("p_brand") === "Brand#23"), col("p_partkey") === col("l_partkey"))
      .join(partAvg, col("ap_partkey") === col("l_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(
        (decSum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  /** q18: TPC-H Q18 — HAVING on a grouped sum (exact decimal compare). */
  def q18(t: Tables): DataFrame = {
    val big = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 150)
    t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"))
      .join(big, col("l_orderkey") === col("o_orderkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)
  }

  /** q19: TPC-H Q19 — OR-of-ANDs join predicate. */
  def q19(t: Tables): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity") >= 1.0 && col("l_quantity") <= 11.0) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity") >= 10.0 && col("l_quantity") <= 20.0) ||
      (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
        col("l_quantity") >= 20.0 && col("l_quantity") <= 30.0)
    t.lineitem
      .join(t.part, col("p_partkey") === col("l_partkey"))
      .filter(cond)
      .agg(
        sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** q20: pivot orderstatus × order-year via conditional aggregation
    * (portable form of PIVOT; one pass, map-side combinable).
    */
  def q20(t: Tables): DataFrame = {
    def pivotRev(status: String) =
      sum(when(col("o_orderstatus") === status, dec(col("o_totalprice")))
        .otherwise(lit(0).cast(D2))).cast("double")
    t.orders
      .withColumn("yr", year(col("o_orderdate")).cast("int"))
      .groupBy(col("yr"))
      .agg(
        pivotRev("F").as("rev_f"),
        pivotRev("O").as("rev_o"),
        pivotRev("P").as("rev_p"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("yr"))
  }

  /** q59: set operations — INTERSECT / EXCEPT between year cohorts of
    * buyers. Spark compiles `intersect`/`except` to distinct +
    * left-semi/left-anti joins, so they shuffle on the compared key
    * and AQE picks the strategy — no materialized temp sets, no
    * driver-side set algebra.
    */
  def q59(t: Tables): DataFrame = {
    def buyers(y: Int) = t.orders
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val a = buyers(1995)
    val b = buyers(1996)
    a.intersect(b).withColumn("op", lit("both"))
      .unionByName(a.except(b).withColumn("op", lit("only_1995")))
      .unionByName(b.except(a).withColumn("op", lit("only_1996")))
      .select(col("op"), col("o_custkey").as("custkey"))
      .orderBy(col("op"), col("custkey"))
  }

  /** q99: snapshot diff ([[graft.api.Ops.GraftDataFrameOps.snapshotDiff]])
    * — the change set between two table versions. The "new" snapshot
    * is synthesized from the customer master: every 7th key dropped
    * (deleted), every 5th surviving account balance bumped (changed),
    * and a fresh key range appended (inserted) — so all three change
    * classes exist at every SF and the oracle replays the full-outer
    * classification exactly.
    */
  def q99(t: Tables): DataFrame = {
    import graft.api.Ops._
    val old = t.customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val newer = old
      .filter(col("c_custkey") % 7 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + lit(1.0))
          .otherwise(col("c_acctbal")))
      .unionByName(old.filter(col("c_custkey") < 50)
        .select((col("c_custkey") + 9000000L).as("c_custkey"),
          col("c_name"), col("c_acctbal")))
    old.snapshotDiff(newer, "c_custkey", Seq("c_name", "c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** q109: SCD Type-2 dimension history
    * ([[graft.api.Ops.GraftDataFrameOps.scd2History]]) from a
    * 4-extract snapshot series synthesized deterministically off the
    * customer table — the rules exercise every versioning path:
    * per-snapshot balance drift (id%5==0 changes every extract,
    * id%5==1 once), deletions (id%7==0 vanishes from snapshot 2 on —
    * closed intervals), a one-snapshot GAP (id%11==0 absent only
    * from snapshot 1 — re-insertion must open a NEW version even
    * with identical attributes), and late inserts (id<50 clones
    * appear from snapshot 2). All arithmetic is exact (double +
    * small int), timestamps are UTC literals, and the history logic
    * is lag/lead/running-sum windows — the oracle replays the same
    * series and the same windows verbatim.
    */
  /** q109's synthetic extract series as SEPARATE per-snapshot frames
    * — reused by the incremental-SCD2 spec (r12), which replays the
    * series one extract at a time through `PreparedScd2.absorb` and
    * must land on the same history the one-shot builder computes.
    */
  def scd2Series(t: Tables): Seq[DataFrame] = {
    val base = t.customer.select(col("c_custkey").as("id"),
      col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    (0 until 4).map { k =>
      val present = !(col("id") % 7 === 0 && lit(k) >= 2) &&
        !(col("id") % 11 === 0 && lit(k) === 1)
      val drift = when(col("id") % 5 === 0, lit(k.toDouble))
        .when(col("id") % 5 === 1 && lit(k) >= 2, lit(1.0))
        .otherwise(lit(0.0))
      val snap = base.filter(present)
        .withColumn("c_acctbal", col("c_acctbal") + drift)
      val withInserts =
        if (k >= 2) snap.unionByName(
          base.filter(col("id") < 50)
            .select((col("id") + 9000000L).as("id"), col("c_name"),
              col("c_acctbal"), col("c_mktsegment")))
        else snap
      withInserts.withColumn("snap_ts",
        to_timestamp(lit(s"2024-0${k + 1}-01 00:00:00")))
    }
  }

  /** q130: RFM customer segmentation
    * ([[graft.api.Ops.GraftDataFrameOps.rfmScores]]) — recency /
    * frequency / monetary quintiles by EXACT global rank (best-first,
    * custkey tiebreak — a total order, so scores replay bit-for-bit)
    * over the per-customer order metrics. The ranks run through the
    * range-partitioned globalRank, never a single-reducer window;
    * the customer count joins as the one q48-shaped scalar row.
    */
  def q130(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.orders.rfmScores("o_custkey", "o_orderdate", col("o_totalprice"))
      .select(col("o_custkey"), col("last_us"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"),
        col("m_score"), col("segment"))
      .orderBy(col("o_custkey"))
  }

  /** q124: SCD Type-1 CDC apply
    * ([[graft.api.Ops.GraftDataFrameOps.applyChanges]]) — a
    * deterministic change feed derived from customer (drifted
    * upserts at two sequence numbers so latest-wins is exercised,
    * deletes, new-key inserts, and the id%35 overlap producing an
    * equal-seq upsert/delete tie that must resolve to the upsert)
    * folded into the dimension. One feed-sized window + one key anti
    * join + union.
    */
  def q124(t: Tables): DataFrame = {
    import graft.api.Ops._
    val base = t.customer.select(col("c_custkey").as("id"),
      col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    val updNew = base.filter(col("id") % 5 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + lit(10.0))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(2L))
    val updOld = base.filter(col("id") % 5 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + lit(5.0))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
    val del = base.filter(col("id") % 7 === 0)
      .withColumn("op", lit("delete")).withColumn("seq", lit(2L))
    val ins = base.filter(col("id") < 50)
      .select((col("id") + 9000000L).as("id"), col("c_name"),
        col("c_acctbal"), col("c_mktsegment"))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
    val changes = updNew.unionByName(updOld).unionByName(del).unionByName(ins)
    base.applyChanges(changes, "id", "op", "seq")
      .orderBy(col("id"))
  }

  def q109(t: Tables): DataFrame = {
    import graft.api.Ops._
    scd2Series(t).reduce(_ unionByName _)
      .scd2History("snap_ts", "id", Seq("c_name", "c_acctbal", "c_mktsegment"))
      .orderBy(col("id"), col("valid_from"))
  }

  /** q113: point-in-time dimension read
    * ([[graft.api.Ops.GraftDataFrameOps.scd2AsOf]]) — the q109
    * history reconstructed AS OF 2024-02-15, an instant chosen to
    * exercise every interval case at once: mid-gap ids (id%11==0,
    * absent only from the February extract) must NOT appear, drifted
    * ids carry their February values, late inserts (arriving March 1)
    * are absent, and not-yet-deleted ids are present. The oracle is
    * q109's replay wrapped in the covering-interval filter.
    */
  def q113(t: Tables): DataFrame = {
    import graft.api.Ops._
    scd2Series(t).reduce(_ unionByName _)
      .scd2History("snap_ts", "id", Seq("c_name", "c_acctbal", "c_mktsegment"))
      .scd2AsOf("2024-02-15 00:00:00")
      .orderBy(col("id"))
  }

  /** q100: group-wise z-score standardization
    * ([[graft.api.Ops.GraftDataFrameOps.zscorePerGroup]]) — order
    * totals standardized within their order status; exact-decimal
    * moments + fixed IEEE expression shape + correctly-rounded sqrt
    * make every z bit-reproducible, replayed term-for-term in SQL.
    */
  def q100(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.orders
      .zscorePerGroup("o_orderstatus", col("o_totalprice"), out = "z")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("z"), 6).as("z"))
      .orderBy(col("o_orderkey"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.util.Portable._

/** Remaining window- and string-function coverage (SURVEY.md §2
  * q44/q45): lead/lag/ntile/first_value analytics and the string
  * expression family — all codegen'd, no UDFs.
  */
object WindowSuite {

  /** q44: order-gap analytics per customer — lag/lead deltas, quartile
    * bucket (ntile), first order price as baseline.
    */
  def q44(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t.orders
      .filter(col("o_custkey") < 200)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        lag(col("o_orderdate"), 1).over(w).as("prev_date"),
        lead(col("o_orderdate"), 1).over(w).as("next_date"),
        ntile(4).over(w).cast("long").as("quartile"),
        first(col("o_totalprice")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_price"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** q50: date/time expression family over order dates. */
  def q50(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderkey") < 2000)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).cast("int").as("yr"),
        quarter(col("o_orderdate")).cast("int").as("qtr"),
        dayofweek(col("o_orderdate")).cast("int").as("dow"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_1999"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"))
      .orderBy(col("o_orderkey"))

  /** q51: null-handling expression family (coalesce/nullif/greatest/
    * least/nvl2-style case) over customer balances.
    */
  def q51(t: Tables): DataFrame =
    t.customer
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("REDACTED")).as("segment"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_acctbal"), lit(5000.0)).as("bal_cap"),
        when(col("c_acctbal") < 0, lit("overdrawn"))
          .when(col("c_acctbal") < 1000, lit("low"))
          .otherwise(lit("ok")).as("bal_band"),
        isnull(nullif(col("c_nationkey"), lit(0))).cast("long").as("is_nation_zero"))
      .orderBy(col("c_custkey"))

  /** q45: string expression family over part names/types. */
  def q45(t: Tables): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 4)).as("prefix"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_key"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("type_head"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(replace(col("p_name"), lit(" "), lit(""))).cast("long").as("compact_len"),
        when(col("p_name").like("%gold%"), 1).otherwise(0).cast("long").as("has_gold"))
      .orderBy(col("p_partkey"))

  /** q98: trailing RANGE-frame features per event — at every event,
    * the same user's event count and exact-decimal value sum over the
    * trailing hour (frame bounds are event-TIME µs, not row counts —
    * the feature-engineering primitive q44's row frames can't
    * express: "activity in the last hour" is a value frame however
    * many rows it spans). One key-partitioned window over µs — ties
    * (equal timestamps) share a frame by RANGE semantics, so the
    * result is partitioning- and sort-stable; no self-join, no
    * event-list materialization. 100 TB shape: partition by user,
    * sort within user — the same single-exchange window discipline
    * as q08/q22.
    */
  def q98(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-3599999999L, 0L)
    t.events
      .withColumn("__us", unix_micros(col("ts")))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(dec(col("value"))).over(w).cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }
}

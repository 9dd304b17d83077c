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
}

package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that keep results bit-identical between Spark and the DuckDB
  * oracle (see SURVEY.md §3).
  *
  * All money/quantity doubles in the testdata are exact 2-decimal
  * values, so `CAST(x AS DECIMAL(18,2))` is lossless on both engines;
  * decimal arithmetic is exact, and the final `CAST(.. AS DOUBLE)` of
  * the same exact decimal yields the same bits everywhere.
  */
object Portable {
  val D2: DecimalType = DecimalType(18, 2)
  val D4: DecimalType = DecimalType(18, 4)
  val D6: DecimalType = DecimalType(18, 6)

  /** Lossless decimal view of an exact-2-decimal double column. */
  def dec(c: Column): Column = c.cast(D2)

  /** SUM over the decimal view, surfaced as a deterministic double. */
  def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal sum, cast to double, then one
    * double division (mirrors CAST(SUM(dec)..AS DOUBLE)/COUNT(..)).
    */
  def decAvg(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** UTC timestamp literal (session timezone is pinned to UTC). */
  def ts(s: String): Column = lit(s).cast("timestamp")

  /** `l_extendedprice * (1 - l_discount)` as an exact DECIMAL(18,4). */
  def revenue(price: Column, discount: Column): Column =
    (dec(price) * dec(lit(1.0) - discount)).cast(D4)

  /** Portable 60-bit positive hash: identical in Spark and DuckDB
    * (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), unlike the engines'
    * built-in `hash()` functions which differ.
    */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
}

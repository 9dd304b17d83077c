package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering — multi-dimensional data
  * clustering for file skipping, the mechanism behind
  * Delta/Iceberg-style `OPTIMIZE ZORDER BY`.
  *
  * A scan that filters on ONE column prunes well when files are
  * range-partitioned on that column; a scan filtering on EITHER of
  * two columns prunes on neither unless the layout interleaves them.
  * The z-value interleaves the low `bits` of two dimensions
  * bit-by-bit, so sorting by it gives every file a small rectangle in
  * (x, y) space — parquet footer min/max stats then prune files for
  * predicates on x, on y, or on both.
  *
  * The interleave is unrolled Scala-side into `2·bits` codegen'd
  * shift/mask terms (bit widths are compile-time constants — no HOF,
  * no lambda re-evaluation) and is pure integer arithmetic, so the
  * DuckDB oracle reproduces it exactly with the same `>> & <<` ops.
  */
object ZOrder {

  /** Morton interleave of the low `bits` of x into even positions and
    * y into odd positions. Callers pre-mask dimensions into range
    * (e.g. `pmod(col, lit(1 << bits))`); higher bits are ignored by
    * construction.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in 1..31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The matching DuckDB SQL fragment (for oracle queries): the same
    * unrolled sum over `>> & <<`.
    */
  def zvalueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Rewrite `df`'s layout so that each of `numFiles` output
    * partitions covers a small rectangle of (x, y): range-partition
    * on the z-value, sort within partitions by it. Write the result
    * with `.write.parquet(...)` and scans filtering on either
    * dimension skip most files via footer min/max stats. The z
    * column is internal and dropped; the row set is unchanged (a
    * layout-only operator, like the reference's storage reorg
    * passes).
    *
    * Both dimensions are min/max-normalized to `bits` bits first —
    * WITHOUT this, a dimension with a wider natural range owns every
    * high interleave bit and the curve degenerates to a plain sort on
    * that dimension (the other never prunes). The min/max probe is a
    * one-row aggregate broadcast back over the frame: two passes over
    * the data, both full scans a layout rewrite pays anyway.
    */
  def cluster(df: DataFrame, x: Column, y: Column,
              numFiles: Int, bits: Int = 8): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    val n = lit(1L << bits)
    val stats = df.agg(
      min(x.cast("long")).as("__xmin"), max(x.cast("long")).as("__xmax"),
      min(y.cast("long")).as("__ymin"), max(y.cast("long")).as("__ymax"))
    // scaled ∈ [0, 2^bits): numerators stay far below 2^53, so the
    // double division is exact enough and the cast floors it
    def scaled(c: Column, lo: Column, hi: Column): Column =
      ((c.cast("long") - lo) * n / (hi - lo + 1)).cast("long")
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zvalue(
        scaled(x, col("__xmin"), col("__xmax")),
        scaled(y, col("__ymin"), col("__ymax")), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__xmin", "__xmax", "__ymin", "__ymax")
  }
}

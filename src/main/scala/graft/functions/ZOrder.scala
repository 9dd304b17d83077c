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
    *
    * Degenerate inputs are layout-only decisions, never row changes:
    * a NULL in either dimension maps the row to z = −1 (all such
    * rows cluster ahead of the real curve — "nulls first"); a
    * constant dimension (min == max) contributes 0 to the interleave
    * and the curve degrades to a range layout on the other dimension;
    * a dimension spanning more than 2⁶² maps to 0 (that dimension
    * stops clustering rather than overflowing — ANSI mode would
    * throw on the span arithmetic otherwise). The scaling itself is
    * pure integer cell division ((v − lo) div ceil(span / 2ᵇ)), so no
    * boundary value can land in the wrong bucket the way a ~2⁵³
    * double-division numerator could.
    */
  def cluster(df: DataFrame, x: Column, y: Column,
              numFiles: Int, bits: Int = 8): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    val n = 1L << bits
    val stats = df.agg(
      min(x.cast("long")).as("__xmin"), max(x.cast("long")).as("__xmax"),
      min(y.cast("long")).as("__ymin"), max(y.cast("long")).as("__ymax"))
    // integer cell scaling via expr (Column has no integral div):
    // cell = ceil(span/2^bits) ≥ 1, scaled = (v - lo) div cell ∈
    // [0, 2^bits). The half-span probe decides overflow-safety
    // WITHOUT computing the full span (CASE branches evaluate lazily,
    // so the guarded arithmetic never runs on an unsafe range).
    def scaled(v: String, lo: String, hi: String): String =
      s"""CASE WHEN $v IS NULL THEN NULL
         |  WHEN $hi div 2 - $lo div 2 > ${Long.MaxValue / 4} THEN 0L
         |  ELSE ($v - $lo) div greatest(($hi - $lo + ${n}L) div ${n}L, 1L) END""".stripMargin
    df.crossJoin(broadcast(stats))
      .withColumn("__xv", x.cast("long")).withColumn("__yv", y.cast("long"))
      .withColumn("__zx", expr(scaled("__xv", "__xmin", "__xmax")))
      .withColumn("__zy", expr(scaled("__yv", "__ymin", "__ymax")))
      .withColumn("__z",
        when(col("__zx").isNull || col("__zy").isNull, lit(-1L))
          .otherwise(zvalue(col("__zx"), col("__zy"), bits)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__zx", "__zy", "__xv", "__yv",
        "__xmin", "__xmax", "__ymin", "__ymax")
  }
}

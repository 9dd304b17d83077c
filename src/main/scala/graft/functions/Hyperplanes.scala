package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded random-hyperplane sign codes for embedding LSH blocking —
  * the vector-space analogue of MinHash banding (VERDICT r3 next-round
  * item #2): L independent tables of `bits` Rademacher hyperplanes
  * each; a vector's code in table `l` is the concatenated signs of its
  * dot products with that table's hyperplanes. Two vectors at angle θ
  * disagree on one hyperplane with probability θ/π (Charikar, STOC'02
  * — public result), so a true near-dup pair that loses one table to a
  * sign flip still collides in another; candidates are the union over
  * tables, verified once. A single axis-aligned code (the pre-r4
  * shape) has no such guarantee: one flipped coordinate among the
  * leading dims hides the pair entirely.
  *
  * Portability: the ±1 weights derive from md5 parity of
  * "seed:table:bit:dim", and the dot product is a sequential left
  * fold — any engine (including the DuckDB oracle, via indexed
  * list_transform + list_reduce) regenerates the exact same codes
  * bit-for-bit, which is what lets q53 stay hash-oracle-checked.
  */
object Hyperplanes {

  /** Rademacher ±1.0 weights: weights(l)(j)(d) is hyperplane j of
    * table l, coordinate d. Deterministic in (seed, l, j, d); computed
    * driver-side once and shipped as literals (never per-row).
    */
  def weights(tables: Int, bits: Int, dim: Int, seed: String): Array[Array[Array[Double]]] =
    Array.tabulate(tables, bits, dim) { (l, j, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$seed:$l:$j:$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }

  /** dot(emb, w) as products then a sequential left fold from 0.0 —
    * fixed evaluation order, so the double result is bit-identical on
    * any IEEE engine (a parallel/reordered sum would not be). The HOF
    * inputs are an attribute and a literal array, so nothing here
    * re-evaluates per element.
    */
  private def dot(emb: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(emb, array(w.map(lit).toSeq: _*), (v, x) => v * x),
      lit(0.0), (acc, x) => acc + x)

  /** The '0'/'1' block-code string of one table (`tableWeights` =
    * weights(l)): bit j = sign of the j-th hyperplane dot product.
    */
  def blockCode(emb: Column, tableWeights: Array[Array[Double]]): Column =
    concat(tableWeights.map(w =>
      when(dot(emb, w) >= 0, lit("1")).otherwise(lit("0"))).toSeq: _*)

  /** DuckDB SQL recomputing [[blockCode]] for oracle checks: the same
    * weights as a DOUBLE[] literal, indexed lambda products, and
    * list_reduce (a sequential fold like the Spark side — DuckDB's
    * no-init fold starts at element 1, but 0.0 + x == x in IEEE, so
    * the sums agree bitwise).
    */
  def blockCodeSql(embExpr: String, tableWeights: Array[Array[Double]]): String =
    tableWeights.map { w =>
      val arr = w.map(x => if (x > 0) "1" else "-1").mkString("[", ",", "]")
      s"(CASE WHEN list_reduce(list_transform($embExpr, (v,i) -> v * ($arr::DOUBLE[])[i]), (acc,x) -> acc + x) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
}

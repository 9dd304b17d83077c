package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011 — public result):
  * split a dim-D embedding into `m` contiguous sub-vectors, quantize
  * each against its own `ks`-entry codebook, and keep only the m
  * code bytes — a dim·4-bytes → m-bytes compression of the vector
  * column (64-float embedding at m=8: 256 B → 8 B, 32×) that still
  * supports distance ranking: a query computes one m×ks
  * asymmetric-distance table (ADC) and scores any coded vector with
  * m table lookups instead of dim multiplications.
  *
  * Portability: the codebooks derive from md5 of "pq:seed:s:j:d" on
  * the {-1,-0.5,0,0.5,1} grid (mod-5 of the same 60-bit positive
  * hash both engines compute), and every distance is a sequential
  * left fold from 0.0 — the [[Hyperplanes]] discipline — so encode,
  * distance tables and ADC folds are bit-identical on any IEEE
  * engine, which is what lets q91 stay hash-oracle-checked. For
  * production quality, train the codebooks IN-ENGINE with
  * [[graft.operators.Vectors.trainPqCodebooks]] (per-subspace
  * Lloyd's k-means, all m subspaces in one corpus scan per
  * iteration) and pass them through the `codebooks` parameter —
  * the operator is codebook-agnostic.
  */
object ProductQuantizer {

  /** JVM mirror of [[graft.util.Portable.portableHash64]] (md5 hex,
    * first 15 nibbles as a positive 60-bit long) for driver-side
    * codebook generation.
    */
  private def hash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** codebooks(s)(j)(d): entry j of subspace s, coordinate d, on the
    * 5-value grid × `scale` — deterministic in (seed, s, j, d),
    * computed driver-side once and shipped as literals (never
    * per-row). `scale` matches the grid to the coordinate
    * distribution: the grid spans ±2·(scale/... ) i.e. values
    * {-1,-0.5,0,0.5,1}·scale, so set scale ≈ σ of one coordinate —
    * 1/√dim for unit-normalized embeddings (a ±1 grid on 0.125-σ
    * coordinates collapses most sub-vectors onto the same
    * near-zero entry: measured recall 0.04 vs 0.22 scaled).
    */
  def codebooks(m: Int, ks: Int, subDim: Int, seed: String,
                scale: Double): Array[Array[Array[Double]]] =
    Array.tabulate(m, ks, subDim) { (s, j, d) =>
      ((hash64(s"pq:$seed:$s:$j:$d") % 5) - 2) / 2.0 * scale
    }

  /** Squared L2 between an attribute sub-vector and a literal
    * codebook entry: element-wise squared diffs, then a sequential
    * left fold from 0.0 — fixed order, bit-identical doubles on any
    * IEEE engine (0.0 + x == x, so DuckDB's no-init list_reduce
    * agrees bitwise).
    */
  private def sqDist(sub: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(sub, array(w.map(lit).toSeq: _*), (v, c) => (v - c) * (v - c)),
      lit(0.0), (acc, x) => acc + x)

  /** PQ code array (length m, values 0..ks-1): per subspace, the
    * argmin-sqdist entry, ties to the lower index (the sorted
    * (distance, j) struct fold — the semanticDedup assignment shape).
    * Pure codegen column work: encoding is zero-shuffle.
    */
  def encode(emb: Column, cbs: Array[Array[Array[Double]]]): Column =
    array(cbs.zipWithIndex.map { case (entries, s) =>
      val subDim = entries(0).length
      val sub = slice(emb, s * subDim + 1, subDim)
      element_at(
        sort_array(array(entries.zipWithIndex.map { case (w, j) =>
          struct(sqDist(sub, w).as("d"), lit(j).as("j"))
        }.toSeq: _*)), 1).getField("j")
    }.toSeq: _*)

  /** The query's asymmetric-distance table: dt(s)(j) = sqdist(query
    * sub-vector s, entry (s, j)) — an m×ks nested array computed
    * ONCE per query row, m·ks·subDim = dim·ks multiplications.
    */
  def distanceTable(emb: Column, cbs: Array[Array[Array[Double]]]): Column =
    array(cbs.zipWithIndex.map { case (entries, s) =>
      val subDim = entries(0).length
      val sub = slice(emb, s * subDim + 1, subDim)
      array(entries.map(w => sqDist(sub, w)).toSeq: _*)
    }.toSeq: _*)

  /** ADC distance of one coded vector against one distance table:
    * fold dt[s][code[s]] over subspaces in order — m lookups + m
    * adds per scored vector, independent of dim.
    */
  def adc(codes: Column, dt: Column): Column =
    aggregate(zip_with(codes, dt, (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
}

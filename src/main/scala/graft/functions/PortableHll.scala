package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** The engine's PORTABLE register-based HyperLogLog
  * ([[graft.api.Ops.GraftDataFrameOps.hllDistinct]]) as a native
  * typed aggregate — for the places a groupBy composition can't go:
  * inside a wider single-pass Aggregate (`profile()`'s
  * one-scan-for-everything contract) or alongside other aggregates
  * in one `agg(...)`. Same seeded-md5 hash, same registers, same
  * estimate arithmetic — `portable_hll(cast(x as string))` is
  * EXACTLY equal to `hllDistinct` on the same data (spec-pinned as
  * equality, not tolerance), so the q43 oracle semantics extend to
  * any aggregate context.
  *
  * State is a fixed m = 2^p byte array of register maxima (4 KiB at
  * the default p=12) — constant memory, byte-wise-max mergeable
  * (merge ≡ the union sketch exactly). The child must already BE a
  * string (cast upstream) so the hashed text is unambiguous — the
  * same contract the frame form applies via `value.cast("string")`.
  */
case class PortableHll(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"portable_hll: p must be in [4, 16] (got $p)")

  private val m = 1 << p
  private val scale = 60 - p + 1 // max ρ; harmonic terms scale by 2^scale

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  /** The documented cast-upstream contract, ENFORCED (ADVICE r10): a
    * non-string child would hash `toString` of the INTERNAL
    * representation (a date's epoch-day Int, a decimal's unscaled
    * form), silently breaking the "exactly equals hllDistinct /
    * DuckDB-reproducible" guarantee for SQL callers who skip the
    * cast — fail analysis instead.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_hll requires a STRING child (cast upstream so the hashed " +
          s"text is unambiguous); got ${child.dataType.sql}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  /** The 60-bit seeded hash, bit-identical to
    * `TextFunctions.seededHash(lit("hll"), s)` (= the DuckDB oracle
    * expression): md5 of "hll:" + s, first 15 lowercase-hex chars as
    * a long.
    */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(("hll:" + s).getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = the top 7.5 bytes
    var h = 0L
    var i = 0
    while (i < 8) {
      val b = md(i) & 0xff
      if (i < 7) h = (h << 8) | b
      else h = (h << 4) | (b >>> 4) // 15th hex char = high nibble of byte 7
      i += 1
    }
    h
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash60(v.toString)
      val bkt = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) scale
        else scale - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bkt)) buf(bkt) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // identical arithmetic to Ops.hllEstimateFromRegisters: exact
    // shifted-long harmonic sum, the same double constant, the same
    // linear-counting branch, HALF_UP rounding via BigDecimal.valueOf
    // (what Spark's round() does for doubles)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val numer = alpha * m.toDouble * m.toDouble * math.pow(2.0, scale)
    var s = 0L
    var v0 = 0L
    var i = 0
    while (i < m) {
      s += 1L << (scale - buf(i))
      if (buf(i) == 0) v0 += 1
      i += 1
    }
    val e = numer / s.toDouble
    val est =
      if (e <= 2.5 * m && v0 > 0L) m.toDouble * math.log(m.toDouble / v0.toDouble)
      else e
    java.math.BigDecimal.valueOf(est)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): PortableHll =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PortableHll =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "portable_hll"
}

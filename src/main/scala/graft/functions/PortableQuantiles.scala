package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, DoubleType}

/** Mutable census state of [[PortableQuantiles]]: occupied
  * power-of-two buckets at the current resolution 2^k, plus the true
  * finite min/max (which alone determine the deterministic FINAL
  * resolution at eval time).
  */
final class QuantileSketchBuffer(
    var k: Int,
    val counts: java.util.HashMap[java.lang.Long, java.lang.Long],
    var mn: Double,
    var mx: Double)

/** Deterministic mergeable quantile sketch as a native typed
  * aggregate — the percentile sibling of [[PortableHll]], for the
  * places the frame-level census ([[graft.api.Ops.quantileRegisters]])
  * can't go: inside `profile()`'s one-scan Aggregate, where column
  * scales are unknown so no fixed bucket width fits every column.
  *
  * The state is an integer-bucket census at an ADAPTIVE power-of-two
  * width 2^k (k starts at -20, ~1e-6 resolution): bucket =
  * floor(v / 2^k). Power-of-two widths make collapsing EXACT —
  * floor(floor(v/2^k)/2) = floor(v/2^(k+1)) — so coarsening loses no
  * information relative to having bucketed coarse from the start,
  * which is what makes the whole sketch ORDER- AND
  * PARTITIONING-INVARIANT: update collapses only when forced (bucket
  * count past `cap`, or a value's magnitude would overflow the Long
  * bucket space), merge aligns both sides to the coarser k and adds
  * counts, and eval first collapses to the one deterministic final
  * resolution implied by the observed (min, max) — the smallest
  * k whose bucket span fits `cap` — before reading quantiles. Every
  * intermediate k provably never exceeds that final k, so any
  * partitioning of the same rows yields the identical final census
  * (spec-pinned as equality).
  *
  * Estimates are nearest-rank (rank ceil(q·n)) bucket midpoints —
  * within 2^kFinal / 2 of the exact nearest-rank quantile, where
  * 2^kFinal ≈ value range / cap (relative resolution ~ range/4096
  * at the default cap). NaN/Infinity inputs are ignored like nulls
  * (a census over unbounded buckets cannot place them); an all-null
  * group returns null.
  */
case class PortableQuantiles(
    child: Expression,
    qs: Seq[Double],
    cap: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchBuffer] {

  require(qs.nonEmpty, "portable_quantiles: need at least one quantile")
  qs.foreach(q => require(q > 0.0 && q <= 1.0,
    s"portable_quantiles: quantiles must be in (0, 1] (got $q)"))
  require(cap >= 16, s"portable_quantiles: cap must be at least 16 (got $cap)")

  private val kStart = -20

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_quantiles requires a DOUBLE child (cast upstream); got ${child.dataType.sql}")
    }

  override def createAggregationBuffer(): QuantileSketchBuffer =
    new QuantileSketchBuffer(kStart, new java.util.HashMap(),
      Double.PositiveInfinity, Double.NegativeInfinity)

  /** One resolution step coarser: k+1, every bucket floor-halved
    * (Math.floorDiv keeps floor semantics for negatives — the exact
    * composition floor(v/2^k)/2 = floor(v/2^(k+1))).
    */
  private def collapse(buf: QuantileSketchBuffer): Unit = {
    val next = new java.util.HashMap[java.lang.Long, java.lang.Long](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nb = java.lang.Long.valueOf(Math.floorDiv(e.getKey.longValue, 2L))
      val prev = next.get(nb)
      next.put(nb, if (prev == null) e.getValue
        else java.lang.Long.valueOf(prev.longValue + e.getValue.longValue))
    }
    buf.counts.clear()
    buf.counts.putAll(next)
    buf.k += 1
  }

  /** True when |v| needs a coarser k to keep floor(v/2^k) inside the
    * safe Long bucket range (< 2^61).
    */
  private def magnitudeOverflow(v: Double, k: Int): Boolean =
    math.abs(v) >= Math.scalb(1.0, 61 + k)

  override def update(buf: QuantileSketchBuffer, input: InternalRow): QuantileSketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (java.lang.Double.isFinite(d)) {
        while (magnitudeOverflow(d, buf.k)) collapse(buf)
        val bkt = java.lang.Long.valueOf(math.floor(Math.scalb(d, -buf.k)).toLong)
        val prev = buf.counts.get(bkt)
        buf.counts.put(bkt,
          if (prev == null) java.lang.Long.valueOf(1L)
          else java.lang.Long.valueOf(prev.longValue + 1L))
        while (buf.counts.size > cap) collapse(buf)
        if (d < buf.mn) buf.mn = d
        if (d > buf.mx) buf.mx = d
      }
    }
    buf
  }

  override def merge(a: QuantileSketchBuffer, b: QuantileSketchBuffer): QuantileSketchBuffer = {
    if (b.counts.isEmpty) return a
    while (a.k < b.k) collapse(a)
    while (b.k < a.k) collapse(b)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = a.counts.get(e.getKey)
      a.counts.put(e.getKey, if (prev == null) e.getValue
        else java.lang.Long.valueOf(prev.longValue + e.getValue.longValue))
    }
    while (a.counts.size > cap) collapse(a)
    if (b.mn < a.mn) a.mn = b.mn
    if (b.mx > a.mx) a.mx = b.mx
    a
  }

  override def eval(buf: QuantileSketchBuffer): Any = {
    if (buf.counts.isEmpty) return null
    // the DETERMINISTIC final resolution: smallest k (≥ the current —
    // intermediate collapses provably never overshoot it) whose
    // bucket span for the observed [mn, mx] fits the cap. Collapsing
    // is exact, so this census equals the one any other partitioning
    // of the same rows produces.
    while (magnitudeOverflow(buf.mx, buf.k) || magnitudeOverflow(buf.mn, buf.k) ||
      math.floor(Math.scalb(buf.mx, -buf.k)).toLong -
        math.floor(Math.scalb(buf.mn, -buf.k)).toLong + 1L > cap) collapse(buf)
    val entries = new Array[(Long, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey.longValue, e.getValue.longValue); i += 1
    }
    java.util.Arrays.sort(entries, Ordering.by((t: (Long, Long)) => t._1))
    var n = 0L
    entries.foreach(n += _._2)
    val width = Math.scalb(1.0, buf.k)
    val out = qs.map { q =>
      val rank = math.ceil(q * n.toDouble).toLong
      var cum = 0L
      var j = 0
      var bkt = entries.last._1
      var found = false
      while (j < entries.length && !found) {
        cum += entries(j)._2
        if (cum >= rank) { bkt = entries(j)._1; found = true }
        j += 1
      }
      (bkt.toDouble + 0.5) * width
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: QuantileSketchBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(16 + buf.counts.size * 16)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeDouble(buf.mn)
    out.writeDouble(buf.mx)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue)
      out.writeLong(e.getValue.longValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketchBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readInt()
    val mn = in.readDouble()
    val mx = in.readDouble()
    val size = in.readInt()
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](size)
    var i = 0
    while (i < size) {
      m.put(java.lang.Long.valueOf(in.readLong()), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    new QuantileSketchBuffer(k, m, mn, mx)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PortableQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PortableQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "portable_quantiles"
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.data.AvroSchemas

/** Property-based invariants (ScalaCheck generators, deterministic
  * seeds): the Avro fold/unfold pair must be an isomorphism on the
  * supported type space, and the top-k sketch must be exact below
  * capacity for arbitrary streams.
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Deterministic generator sampling (no scalatestplus bridge in the
    * dependency set — raw ScalaCheck drives the cases).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n * 3).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .take(n).toSeq

  // ---- generators over the supported Avro-mappable type space ----
  private val genPrimitive: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, DateType, TimestampType, TimestampNTZType,
    DecimalType(12, 3), DecimalType(18, 2))

  private def genDataType(depth: Int): Gen[DataType] =
    if (depth <= 0) genPrimitive
    else Gen.frequency(
      6 -> genPrimitive,
      2 -> genDataType(depth - 1).map(ArrayType(_, containsNull = false)),
      2 -> genStruct(depth - 1))

  private def genStruct(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 5)
      fields <- Gen.listOfN(n, for {
        i <- Gen.choose(0, 1000000)
        dt <- genDataType(depth)
        nullable <- Gen.oneOf(true, false)
      } yield (i, dt, nullable))
    } yield StructType(fields.zipWithIndex.map { case ((i, dt, nu), j) =>
      StructField(s"f${j}_$i", dt, nu)
    })

  test("StructType -> Avro -> StructType is an isomorphism (100 random schemas)") {
    for (st <- samples(genStruct(2), 100)) {
      val back = AvroSchemas.toSparkType(AvroSchemas.toAvroSchema(st, "P"))
        .asInstanceOf[StructType]
      assert(back == st, s"\noriginal: $st\nroundtrip: $back")
    }
  }

  test("topk_sketch is exact below capacity for arbitrary streams") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val genStream = Gen.listOfN(300, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    for (words <- samples(genStream, 5)) {
      val df = words.toDF("w")
      val sketch = df.agg(graft.api.Ops.topkSketch(col("w"), 8, 64)).collect().head
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(sketch == exact, s"sketch=$sketch exact=$exact")
    }
  }

  test("zvalue is a bijection: x and y decode back from the interleave") {
    import spark.implicits._
    import graft.functions.ZOrder
    val xy = samples(for {
      x <- Gen.choose(0L, 65535L); y <- Gen.choose(0L, 65535L)
    } yield (x, y), 200)
    val rows = xy.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var dx = 0L; var dy = 0L
      (0 until 16).foreach { i =>
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == x && dy == y, s"z=$z decoded to ($dx,$dy), expected ($x,$y)")
    }
    // locality sanity: z of (x,y) and (x+1,y) share high bits more
    // often than random pairs do — the curve is not a hash
    val near = rows.take(50).map(r => (r.getLong(0), r.getLong(1))).toSeq
    val df2 = near.toDF("x", "y").select(
      ZOrder.zvalue(col("x"), col("y")).as("z1"),
      ZOrder.zvalue(col("x") + 1, col("y")).as("z2")).collect()
    assert(df2.count(r => (r.getLong(0) >> 20) == (r.getLong(1) >> 20)) > 25,
      "adjacent x should usually stay in the same curve region")
  }

  test("chunkTokens covers every token in order for random docs") {
    import spark.implicits._
    import graft.api.Ops._
    val docs = samples(for {
      n <- Gen.choose(1, 200)
      toks <- Gen.listOfN(n, Gen.choose('a', 'z').map(c => s"w$c"))
    } yield toks.mkString(" "), 30).zipWithIndex
      .map { case (text, i) => (i.toLong, text) }
    val df = docs.toDF("doc_id", "text")
    for ((chunk, overlap) <- Seq((64, 16), (10, 0), (7, 3))) {
      val step = chunk - overlap
      val out = df.chunkTokens("doc_id", "text", chunk, overlap)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) =>
          id -> rs.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getString(3)))
        }
      for ((id, text) <- docs) {
        val toks = text.split(" ").toSeq
        val chunks = out(id)
        // stitching chunk k's first `step` tokens (all of the last
        // chunk) reproduces the document exactly
        val stitched = (chunks.dropRight(1).flatMap(_._2.split(" ").take(step)) ++
          chunks.last._2.split(" ")).toSeq
        assert(stitched == toks, s"doc $id ($chunk,$overlap): stitch mismatch")
        assert(chunks.map(_._1).toSeq == (0L until chunks.length.toLong),
          "chunk ids must be dense from 0")
      }
    }
  }

  test("portable_quantiles: partitioning-invariant and resolution-bounded on random corpora") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // mixed-magnitude finite doubles: negative, fractional, large
    val genVal: Gen[Double] = Gen.frequency(
      5 -> Gen.choose(-1000.0, 1000.0),
      2 -> Gen.choose(-1.0, 1.0),
      2 -> Gen.choose(-1.0e9, 1.0e9),
      1 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0, 123456.789))
    val genCorpus: Gen[List[Double]] =
      Gen.choose(1, 400).flatMap(n => Gen.listOfN(n, genVal))
    for ((vs, caseIdx) <- samples(genCorpus, 12).zipWithIndex) {
      val df = vs.toDF("v")
      def run(parts: Int): Seq[Double] =
        df.repartition(parts)
          .agg(call_function("portable_quantiles", col("v"), lit(0.25), lit(0.5), lit(0.9)))
          .head().getSeq[Double](0)
      val a = run(1); val b = run(7); val c = run(31)
      assert(a == b && a == c,
        s"case $caseIdx: sketch must be identical under any partitioning ($a vs $b vs $c)")
      // resolution bound: the final bucket width is the smallest 2^k
      // whose span over [min, max] fits the 4096 cap — each estimate
      // must sit within one width of the exact nearest-rank value
      val mn = vs.min; val mx = vs.max
      var k = -20
      def spanAt(k: Int): Long =
        (math.floor(Math.scalb(mx, -k)).toLong - math.floor(Math.scalb(mn, -k)).toLong) + 1L
      while (math.abs(mx) >= Math.scalb(1.0, 61 + k) ||
        math.abs(mn) >= Math.scalb(1.0, 61 + k) || spanAt(k) > 4096) k += 1
      val width = Math.scalb(1.0, k)
      val sorted = vs.sorted
      for (((q, est), j) <- Seq(0.25, 0.5, 0.9).zip(a).zipWithIndex) {
        val exact = sorted(math.ceil(q * vs.length).toInt - 1)
        assert(math.abs(est - exact) <= width,
          s"case $caseIdx q$j: |$est - $exact| > width $width (n=${vs.length})")
      }
    }
  }

  test("topk_sketch above-cap merge keeps heavy hitters (batched Misra–Gries)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    // the pre-fix merge decremented a full buffer by the ENTIRE
    // incoming weight and dropped the incoming item — merging a
    // 100-weight hitter into a full {b:1, c:1} buffer yielded {}.
    // Batched MG (Agarwal et al. 2012) must keep it at ~99.
    val sk = graft.functions.TopKSketch(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true), 2, 2)
    def row(s: String) = InternalRow(UTF8String.fromString(s))
    val heavy = sk.createAggregationBuffer()
    (1 to 100).foreach(_ => sk.update(heavy, row("a")))
    val full = sk.createAggregationBuffer()
    sk.update(full, row("b")); sk.update(full, row("c"))
    val merged = sk.merge(full, heavy) // heavy partial arrives at a full buffer
    assert(merged.get("a").exists(_ >= 98L),
      s"the heavy hitter must survive the merge with ~its count: $merged")
    // below-cap exactness is untouched (the q110/profile contract)
    val exact = sk.createAggregationBuffer()
    Seq("x", "y", "x").foreach(s => sk.update(exact, row(s)))
    assert(exact == scala.collection.mutable.HashMap("x" -> 2L, "y" -> 1L))
  }

  test("seeded portable hash is deterministic and seed-sensitive") {
    import spark.implicits._
    import graft.functions.TextFunctions.seededHash
    val df = (1 to 50).map(i => s"tok_$i").toDF("s")
    val h = df.select(
      seededHash(lit(0), col("s")).as("h0a"),
      seededHash(lit(0), col("s")).as("h0b"),
      seededHash(lit(1), col("s")).as("h1")).collect()
    assert(h.forall(r => r.getLong(0) == r.getLong(1)), "same seed must be deterministic")
    assert(h.count(r => r.getLong(0) != r.getLong(2)) == h.length, "different seeds must differ")
    assert(h.forall(r => r.getLong(0) >= 0), "portable hash must be non-negative")
  }
}

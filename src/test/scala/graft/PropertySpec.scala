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

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.{AvroBinary, AvroSchemas}
import graft.sources.Tables

/** Binary Avro roundtrips for real tables (timestamps at µs, nullable
  * unions, float arrays) — the reference's roadmap item realized.
  */
class AvroBinarySpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  private def roundtrip(dfName: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val schemaJson = AvroSchemas.toAvroSchema(df.schema, dfName).toString
    val encoded = AvroBinary.encode(df, dfName)
    assert(encoded.schema.fields.map(_.name).toSeq == Seq("avro_bin"))
    val back = AvroBinary.decode(encoded, "avro_bin", schemaJson)
    assert(back.count() == df.count(), s"$dfName row count")
    assert(back.except(df).isEmpty && df.except(back).isEmpty,
      s"$dfName avro-binary roundtrip altered values")
  }

  test("orders roundtrips through binary Avro (timestamps)") {
    roundtrip("orders", t.orders)
  }

  test("events roundtrips through binary Avro (µs timestamps + json strings)") {
    roundtrip("events", t.events)
  }

  test("embeddings roundtrips through binary Avro (float arrays)") {
    roundtrip("embeddings", t.embeddings)
  }

  test("permissive decode flags corrupt datums instead of failing") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schemaJson = AvroSchemas.toAvroSchema(t.region.schema, "region").toString
    val good = AvroBinary.encode(t.region, "region")
    val corrupt = spark.createDataFrame(
      java.util.List.of(Row(Array[Byte](1, 2, 3))),
      StructType(Seq(StructField("avro_bin", BinaryType))))
    val mixed = good.unionByName(corrupt)
    val out = AvroBinary.decode(mixed, "avro_bin", schemaJson, permissive = true)
    assert(out.filter(col("_corrupt") === true).count() == 1)
    assert(out.filter(col("_corrupt") === false).count() == t.region.count())
    assert(out.filter(col("_corrupt") === true).collect().head.isNullAt(0))
  }

  test("encoded datums are compact and self-consistent") {
    val enc = AvroBinary.encode(t.region, "region")
    val sizes = enc.select(length(col("avro_bin")).as("n")).collect().map(_.getInt(0))
    assert(sizes.forall(n => n > 0 && n < 64), s"unexpected datum sizes: ${sizes.toSeq}")
  }
}

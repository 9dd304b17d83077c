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

  test("encoded datums are compact and self-consistent") {
    val enc = AvroBinary.encode(t.region, "region")
    val sizes = enc.select(length(col("avro_bin")).as("n")).collect().map(_.getInt(0))
    assert(sizes.forall(n => n > 0 && n < 64), s"unexpected datum sizes: ${sizes.toSeq}")
  }
}

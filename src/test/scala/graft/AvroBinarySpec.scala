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

  // ---- full-ADT coverage (VERDICT.md round 1, next-round #4) ----

  private val adtSchemaJson =
    """{
      |  "type": "record", "name": "Full", "namespace": "t",
      |  "fields": [
      |    {"name": "id", "type": "long"},
      |    {"name": "kind", "type": {"type": "enum", "name": "Kind", "symbols": ["A", "B"]}},
      |    {"name": "hash", "type": {"type": "fixed", "name": "H4", "size": 4}},
      |    {"name": "attrs", "type": {"type": "map", "values": "int"}},
      |    {"name": "inner", "type": {"type": "record", "name": "Inner", "fields": [
      |        {"name": "xs", "type": {"type": "array", "items": "double"}},
      |        {"name": "tags", "type": {"type": "map", "values": "string"}}]}},
      |    {"name": "v", "type": ["null", "int", "string"]}
      |  ]
      |}""".stripMargin

  private def adtRows = {
    import org.apache.spark.sql.Row
    Seq(
      Row(1L, "A", Array[Byte](1, 2, 3, 4), Map("a" -> 1),
        Row(Seq(0.5, 1.5), Map("t" -> "x")), Row(java.lang.Integer.valueOf(7), null)),
      Row(2L, "B", Array[Byte](9, 9, 9, 9), Map.empty[String, Int],
        Row(Seq.empty[Double], Map.empty[String, String]), Row(null, "s")),
      Row(3L, "A", Array[Byte](0, 0, 0, 1), Map("z" -> -1),
        Row(Seq(2.0), Map("k" -> "v")), null))
  }

  private def adtDf = {
    val st = AvroSchemas.toSparkType(AvroSchemas.parse(adtSchemaJson))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    spark.createDataFrame(spark.sparkContext.parallelize(adtRows, 2), st)
  }

  test("enum/fixed/map/nested-record/multi-union roundtrip through binary Avro") {
    val enc = AvroBinary.encodeAs(adtDf, adtSchemaJson)
    val back = AvroBinary.decode(enc, "avro_bin", adtSchemaJson)
    // set ops reject MAP columns; compare a canonical JSON rendering
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("id").toJSON.collect().toSeq
    assert(back.count() == 3)
    assert(canon(back) == canon(adtDf), "full-ADT roundtrip altered values")
  }

  test("full-ADT datums cross-read by plain avro-core") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
    import org.apache.avro.io.DecoderFactory
    val schema = new Schema.Parser().parse(adtSchemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val datums = AvroBinary.encodeAs(adtDf, adtSchemaJson).collect()
      .map(_.getAs[Array[Byte]](0))
    val recs = datums.map { b =>
      reader.read(null, DecoderFactory.get().binaryDecoder(b, null))
    }.sortBy(_.get("id").asInstanceOf[Long])
    assert(recs(0).get("kind").toString == "A")
    assert(recs(0).get("hash").asInstanceOf[GenericData.Fixed].bytes().toSeq ==
      Seq[Byte](1, 2, 3, 4))
    assert(recs(0).get("v") == 7, "int union branch readable by avro-core")
    assert(recs(1).get("v").toString == "s", "string union branch readable by avro-core")
    assert(recs(2).get("v") == null, "null union branch readable by avro-core")
    val inner = recs(2).get("inner").asInstanceOf[GenericRecord]
    assert(inner.get("xs").asInstanceOf[java.util.List[Double]].asScala.toSeq == Seq(2.0))
    val attrs = recs(2).get("attrs").asInstanceOf[java.util.Map[Any, Any]].asScala
    assert(attrs.map { case (k, v) => k.toString -> v }.toMap == Map("z" -> -1))
  }

  test("time/uuid/duration logical datums roundtrip through binary Avro and cross-read") {
    import org.apache.spark.sql.Row
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
    import org.apache.avro.io.DecoderFactory
    val schemaJson =
      """{"type": "record", "name": "LT", "namespace": "t", "fields": [
        |  {"name": "t_ms", "type": {"type": "int", "logicalType": "time-millis"}},
        |  {"name": "t_us", "type": ["null", {"type": "long", "logicalType": "time-micros"}], "default": null},
        |  {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
        |  {"name": "dur", "type": {"type": "fixed", "name": "Dur", "size": 12, "logicalType": "duration"}}]}""".stripMargin
    val st = graft.data.AvroSchemas.toSparkType(
      graft.data.AvroSchemas.parse(schemaJson)).asInstanceOf[org.apache.spark.sql.types.StructType]
    // duration fixed(12): 3 little-endian uints (months, days, millis)
    val dur = Array[Byte](1, 0, 0, 0, 2, 0, 0, 0, -24, 3, 0, 0) // 1mo 2d 1000ms
    val rows = Seq(
      Row(45000000, 81234567890L, "123e4567-e89b-12d3-a456-426614174000", dur),
      Row(0, null, "00000000-0000-0000-0000-000000000000", Array.fill[Byte](12)(0)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), st)
    val enc = AvroBinary.encodeAs(df, schemaJson)
    val back = AvroBinary.decode(enc, "avro_bin", schemaJson).orderBy(desc("t_ms")).collect()
    assert(back(0).getInt(0) == 45000000 && back(0).getLong(1) == 81234567890L)
    assert(back(0).getString(2) == "123e4567-e89b-12d3-a456-426614174000")
    assert(back(0).getAs[Array[Byte]](3).toSeq == dur.toSeq,
      "duration bytes must pass through untouched")
    assert(back(1).isNullAt(1), "nullable time-micros union holds null")
    // cross-read by plain avro-core proves the wire encoding is the
    // real logical-typed one (fixed 12 bytes, string uuid, int/long times)
    val schema = new Schema.Parser().parse(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val rec = reader.read(null, DecoderFactory.get().binaryDecoder(
      enc.collect().map(_.getAs[Array[Byte]](0)).head, null))
    assert(rec.get("t_ms") == 45000000)
    assert(rec.get("uid").toString == "123e4567-e89b-12d3-a456-426614174000")
    assert(rec.get("dur").asInstanceOf[GenericData.Fixed].bytes().toSeq == dur.toSeq)
  }

  test("binary encode validates enum symbols and fixed lengths") {
    import org.apache.spark.sql.Row
    val st = adtDf.schema
    val badEnum = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "C", Array[Byte](1, 2, 3, 4),
        Map.empty[String, Int], Row(Seq.empty[Double], Map.empty[String, String]), null)), 1), st)
    val e1 = intercept[org.apache.spark.SparkException] {
      AvroBinary.encodeAs(badEnum, adtSchemaJson).collect()
    }
    assert(e1.getMessage.contains("EnumError") ||
      Option(e1.getCause).exists(_.getMessage.contains("EnumError")))
    val badFixed = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "A", Array[Byte](1, 2, 3),
        Map.empty[String, Int], Row(Seq.empty[Double], Map.empty[String, String]), null)), 1), st)
    val e2 = intercept[org.apache.spark.SparkException] {
      AvroBinary.encodeAs(badFixed, adtSchemaJson).collect()
    }
    assert(e2.getMessage.contains("FixedError") ||
      Option(e2.getCause).exists(_.getMessage.contains("FixedError")))
  }

  test("decodeFramed accepts empty-payload datums and null bytes") {
    import spark.implicits._
    import graft.data.AvroRegistry
    // an empty record encodes to ZERO body bytes: the bare 5-byte
    // frame is a valid datum and must decode (it was rejected by a
    // length > 5 guard); null payloads decode to an all-null row in
    // both modes instead of NPE-ing
    val emptySchema = """{"type":"record","name":"E","fields":[]}"""
    val readerSchema =
      """{"type":"record","name":"E","fields":[
        |  {"name":"x","type":"long","default":7}]}""".stripMargin
    val provider = AvroRegistry.InMemoryProvider(Map(1 -> emptySchema))
    val frames: Seq[Array[Byte]] =
      Seq(AvroRegistry.frameHeader(1), null)
    val df = frames.toDF("avro_bin")
    val strict = AvroRegistry.decodeFramed(df, "avro_bin", provider, readerSchema)
      .collect()
    assert(strict.length == 2)
    assert(strict.exists(r => !r.isNullAt(0) && r.getLong(0) == 7L),
      "empty-payload datum must resolve added field to its default")
    assert(strict.exists(_.isNullAt(0)), "null payload must yield a null row")
    val perm = AvroRegistry.decodeFramed(df, "avro_bin", provider, readerSchema,
      permissive = true).collect()
    assert(perm.forall(!_.getBoolean(1)), "neither datum is corrupt")
  }

  test("decodeFramed rejects keepCols colliding with payload field names (r15)") {
    import spark.implicits._
    import graft.data.AvroRegistry
    // a payload field named like the Kafka metadata passthrough
    // ('timestamp' is the classic) would yield duplicate columns
    // unselectable by name — refuse loudly at plan-build time
    val schema =
      """{"type":"record","name":"R","fields":[
        |  {"name":"timestamp","type":"long"}]}""".stripMargin
    val provider = AvroRegistry.InMemoryProvider(Map(1 -> schema))
    val df = Seq((7L, AvroRegistry.frameHeader(1) ++ Array[Byte](2)))
      .toDF("timestamp", "value")
    val e = intercept[IllegalArgumentException] {
      AvroRegistry.decodeFramed(df, "value", provider, schema,
        keepCols = Seq("timestamp"))
    }
    assert(e.getMessage.contains("timestamp") && e.getMessage.contains("collide"))
    // an aliased metadata column passes and leads the output row
    val ok = AvroRegistry.decodeFramed(
      df.withColumnRenamed("timestamp", "_kafka_timestamp"),
      "value", provider, schema, keepCols = Seq("_kafka_timestamp"))
    assert(ok.columns.toSeq == Seq("_kafka_timestamp", "timestamp"))
    assert(ok.collect().head.getLong(1) == 1L, "payload still decodes")
  }
}

package graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.SchemaBuilder
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.data.{AvroBinary, AvroJson}

/** Adversarial cross-validation of the two Avro datum decoders:
  * random schemas (records, enums, arrays, maps, nullable and
  * multi-branch unions, nested records) and random datums are
  * encoded by **avro-core's own canonical encoders** — JsonEncoder
  * (which writes the `{"branch": value}` union wrappers) and the
  * binary encoder — and the [[AvroJson]] and [[AvroBinary]] decode
  * paths must produce identical Spark rows. Any divergence between
  * the two independent implementations, or from avro-core's encoding
  * of a construct, fails.
  *
  * bytes/fixed are excluded from the default-mode test (avro-core's
  * JsonEncoder writes ISO-8859-1 byte strings while the default
  * [[AvroJson.Base64Binary]] follows the reference's base64 datum
  * convention, AvroJsonFAlgebras `decodeBytes`); the dedicated
  * IsoByteString test below covers them — plain and decimal-logical,
  * bytes and fixed — against the same avro-core encoders.
  */
class AvroPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] =
    (0 until n * 5).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))
      .take(n).toSeq

  // ---- random Avro schemas ----

  private var nameCounter = 0
  private def freshName(prefix: String): String = { nameCounter += 1; s"$prefix$nameCounter" }

  private val genPrimitive: Gen[Schema] = Gen.oneOf(
    Schema.create(Schema.Type.BOOLEAN), Schema.create(Schema.Type.INT),
    Schema.create(Schema.Type.LONG), Schema.create(Schema.Type.DOUBLE),
    Schema.create(Schema.Type.STRING))

  private def genEnum: Gen[Schema] =
    Gen.choose(2, 4).map(n =>
      Schema.createEnum(freshName("E"), null, "t", (0 until n).map(i => s"S$i").asJava))

  private def genType(depth: Int): Gen[Schema] =
    if (depth <= 0) Gen.frequency(8 -> genPrimitive, 2 -> genEnum)
    else Gen.frequency(
      5 -> genPrimitive,
      1 -> genEnum,
      2 -> genType(depth - 1).map(Schema.createArray),
      2 -> genType(depth - 1).map(Schema.createMap),
      2 -> genRecord(depth - 1),
      2 -> genType(depth - 1).map(t =>
        if (t.getType == Schema.Type.UNION) t // avro forbids nested unions
        else Schema.createUnion(Schema.create(Schema.Type.NULL), t)),
      1 -> Gen.const(Schema.createUnion( // multi-branch: distinct primitive kinds
        Schema.create(Schema.Type.NULL), Schema.create(Schema.Type.INT),
        Schema.create(Schema.Type.STRING))))

  private def genRecord(depth: Int): Gen[Schema] =
    for {
      n <- Gen.choose(1, 4)
      fields <- Gen.listOfN(n, genType(depth))
    } yield {
      val rec = Schema.createRecord(freshName("R"), null, "t", false)
      rec.setFields(fields.zipWithIndex.map { case (s, i) =>
        new Schema.Field(s"f$i", s, null, null.asInstanceOf[AnyRef])
      }.asJava)
      rec
    }

  // ---- random datums for a schema ----

  /** bytes/fixed datums, honoring a decimal logical type: decimals
    * carry the big-endian two's-complement unscaled bytes
    * (sign-extended to the declared size for fixed). */
  private def genBinaryValue(s: Schema): Gen[AnyRef] = s.getLogicalType match {
    case d: org.apache.avro.LogicalTypes.Decimal =>
      val bound = BigInt(10).pow(d.getPrecision).toLong - 1
      Gen.choose(-bound, bound).map { unscaled =>
        val tw = BigInt(unscaled).toByteArray
        s.getType match {
          case Schema.Type.BYTES => java.nio.ByteBuffer.wrap(tw)
          case _ =>
            val pad: Byte = if (unscaled < 0) -1 else 0
            new GenericData.Fixed(s, Array.fill[Byte](s.getFixedSize - tw.length)(pad) ++ tw)
        }
      }
    case _ =>
      val len =
        if (s.getType == Schema.Type.FIXED) Gen.const(s.getFixedSize) else Gen.choose(0, 8)
      len.flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))).map { bytes =>
        s.getType match {
          case Schema.Type.BYTES => java.nio.ByteBuffer.wrap(bytes.toArray)
          case _                 => new GenericData.Fixed(s, bytes.toArray)
        }
      }
  }

  private def genValue(s: Schema): Gen[AnyRef] = s.getType match {
    case Schema.Type.BOOLEAN => Gen.oneOf(true, false).map(java.lang.Boolean.valueOf)
    case Schema.Type.INT     => Gen.choose(-1000000, 1000000).map(java.lang.Integer.valueOf)
    case Schema.Type.LONG    => Gen.choose(-1000000000L, 1000000000L).map(java.lang.Long.valueOf)
    case Schema.Type.DOUBLE  => Gen.choose(-1000.0, 1000.0).map(java.lang.Double.valueOf)
    case Schema.Type.STRING  => Gen.alphaNumStr.map(x => x.take(12): java.lang.String)
    case Schema.Type.ENUM =>
      Gen.oneOf(s.getEnumSymbols.asScala.toSeq).map(new GenericData.EnumSymbol(s, _))
    case Schema.Type.ARRAY =>
      Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genValue(s.getElementType)))
        .map(l => new java.util.ArrayList[AnyRef](l.asJava))
    case Schema.Type.MAP =>
      Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, for {
        k <- Gen.alphaNumStr.map(_.take(6))
        v <- genValue(s.getValueType)
      } yield (s"k$k", v))).map { kvs =>
        val m = new java.util.HashMap[String, AnyRef]()
        kvs.foreach { case (k, v) => m.put(k, v) }
        m
      }
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.toSeq
      Gen.sequence[List[AnyRef], AnyRef](fields.map(f => genValue(f.schema())))
        .map { vs =>
          val r = new GenericData.Record(s)
          fields.zip(vs).foreach { case (f, v) => r.put(f.name(), v) }
          r
        }
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      Gen.oneOf(branches).flatMap { b =>
        if (b.getType == Schema.Type.NULL) Gen.const(null.asInstanceOf[AnyRef])
        else genValue(b)
      }
    case Schema.Type.BYTES | Schema.Type.FIXED => genBinaryValue(s)
    case other => throw new IllegalArgumentException(s"no generator for $other")
  }

  // ---- canonical avro-core encoders ----

  private def toCanonicalJson(rec: GenericRecord, schema: Schema): String = {
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().jsonEncoder(schema, bos)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    bos.toString("UTF-8")
  }

  private def toBinary(rec: GenericRecord, schema: Schema): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  test("AvroJson and AvroBinary agree on avro-core-encoded random datums") {
    import spark.implicits._
    val cases = samples(
      for {
        schema <- genRecord(2)
        datums <- Gen.listOfN(3, genValue(schema))
      } yield (schema, datums.map(_.asInstanceOf[GenericRecord])),
      30, seed0 = 7L)
    assert(cases.nonEmpty)
    var unions = 0
    for ((schema, datums) <- cases) {
      val schemaJson = schema.toString
      if (schemaJson.contains("\"int\",\"string\"")) unions += 1
      val jsons = datums.map(toCanonicalJson(_, schema))
      val viaJson = AvroJson.decode(jsons.toDF("j"), "j", schemaJson,
        mode = AvroJson.FailFast, unions = AvroJson.CanonicalUnions)
        .select("decoded.*").collect().toSeq
      val bins = datums.map(r => Row(toBinary(r, schema)))
      val binDf = spark.createDataFrame(
        spark.sparkContext.parallelize(bins, 1),
        StructType(Seq(StructField("b", BinaryType))))
      val viaBinary = AvroBinary.decode(binDf, "b", schemaJson).collect().toSeq
      assert(viaJson == viaBinary,
        s"decoder divergence for schema $schemaJson:\njson:   $viaJson\nbinary: $viaBinary")
      // Strict record mode must never reject a datum avro-core itself
      // encoded (no false positives from the raw-JSON strict walk,
      // wrapped unions and nested records included)
      val viaStrict = AvroJson.decode(jsons.toDF("j"), "j", schemaJson,
        mode = AvroJson.FailFast, unions = AvroJson.CanonicalUnions,
        records = AvroJson.Strict)
        .select("decoded.*").collect().toSeq
      assert(viaStrict == viaJson,
        s"Strict mode diverged on valid datums for schema $schemaJson")
    }
    info(s"validated ${cases.size} schemas (incl. $unions with multi-branch unions), 3 datums each")
  }

  // ---- bytes / fixed / decimal logicals under IsoByteString ----

  private def genBinarySchema: Gen[Schema] = Gen.oneOf(
    Gen.const(Schema.create(Schema.Type.BYTES)),
    Gen.choose(1, 8).map(n => Schema.createFixed(freshName("F"), null, "t", n)),
    for { p <- Gen.choose(1, 12); sc <- Gen.choose(0, 4) } yield
      org.apache.avro.LogicalTypes.decimal(p, math.min(sc, p))
        .addToSchema(Schema.create(Schema.Type.BYTES)),
    for { p <- Gen.choose(1, 12); sc <- Gen.choose(0, 4); extra <- Gen.choose(0, 2) } yield {
      // size big enough for any |unscaled| < 10^p, plus optional padding
      val need = (BigInt(10).pow(p) - 1).toByteArray.length + extra
      org.apache.avro.LogicalTypes.decimal(p, math.min(sc, p))
        .addToSchema(Schema.createFixed(freshName("F"), null, "t", need))
    })

  test("IsoByteString decode matches AvroBinary on avro-core-encoded bytes/fixed/decimals") {
    import spark.implicits._
    val cases = samples(
      for {
        n <- Gen.choose(1, 3)
        fieldSchemas <- Gen.listOfN(n, genBinarySchema)
      } yield {
        val rec = Schema.createRecord(freshName("B"), null, "t", false)
        rec.setFields(fieldSchemas.zipWithIndex.map { case (fs, i) =>
          new Schema.Field(s"f$i", fs, null, null.asInstanceOf[AnyRef])
        }.asJava)
        rec
      }, 20, seed0 = 21L)
    var decimals = 0
    for (schema <- cases) {
      val schemaJson = schema.toString
      if (schemaJson.contains("decimal")) decimals += 1
      val datums = samples(genValue(schema), 3, seed0 = schema.getName.hashCode.toLong)
        .map(_.asInstanceOf[GenericRecord])
      val jsons = datums.map(toCanonicalJson(_, schema))
      val viaJson = AvroJson.decode(jsons.toDF("j"), "j", schemaJson,
        mode = AvroJson.FailFast, unions = AvroJson.CanonicalUnions,
        binary = AvroJson.IsoByteString)
        .select("decoded.*").collect().toSeq
      val bins = datums.map(r => Row(toBinary(r, schema)))
      val binDf = spark.createDataFrame(
        spark.sparkContext.parallelize(bins, 1),
        StructType(Seq(StructField("b", BinaryType))))
      val viaBinary = AvroBinary.decode(binDf, "b", schemaJson).collect().toSeq
      assert(viaJson == viaBinary,
        s"decoder divergence for schema $schemaJson:\njson:   $viaJson\nbinary: $viaBinary")
    }
    info(s"validated ${cases.size} binary-field schemas (incl. $decimals with decimals), 3 datums each")
  }
}

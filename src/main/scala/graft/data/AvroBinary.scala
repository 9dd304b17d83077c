package graft.data

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Binary Avro datum encoding/decoding on Spark — realizes the
  * reference's roadmap item "Binary Encoding/Decoding of Avro data"
  * (Anglerfish README "Long Term" #1) Spark-first: per-partition
  * writer/reader reuse (one codec per partition, the same shape a real
  * cluster codec needs), schema derived through [[AvroSchemas]], rows
  * streamed — nothing driver-side.
  *
  * Full Avro ADT coverage (parity with the reference's
  * AvroGenericInteropFAlgebras): primitives, string, bytes, fixed
  * (length-validated), enum (symbol-validated), decimal logical,
  * date/timestamp logicals, arrays, maps, nested records, nullable
  * unions and multi-branch unions (Spark side = the memberN struct
  * encoding of [[AvroSchemas.toSparkType]]).
  */
object AvroBinary {

  /** Encode each row to one Avro binary datum (column `avro_bin`),
    * against the schema derived from the DataFrame's own schema.
    */
  def encode(df: DataFrame, recordName: String = "record"): DataFrame =
    encodeAs(df, AvroSchemas.toAvroSchema(df.schema, recordName).toString)

  /** Encode against a caller-supplied Avro schema — the way to target
    * enum/fixed/multi-branch-union writer schemas (Spark has no native
    * types for those; string ⇒ enum, binary ⇒ fixed, memberN struct ⇒
    * union). Row shape must match [[AvroSchemas.toSparkType]] of the
    * schema.
    */
  def encodeAs(df: DataFrame, avroSchemaJson: String): DataFrame = {
    val sparkSchema = df.schema
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroSchemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new ByteArrayOutputStream()
      val encoder = EncoderFactory.get().binaryEncoder(bos, null)
      rows.map { row =>
        bos.reset()
        val enc = EncoderFactory.get().binaryEncoder(bos, encoder)
        writer.write(rowToRecord(row, sparkSchema, schema), enc)
        enc.flush()
        Row(bos.toByteArray)
      }
    }(Encoders.row(StructType(Seq(StructField("avro_bin", BinaryType, nullable = false)))))
  }

  /** Decode Avro binary datums back into typed rows.
    *
    * `permissive = false` (default) fails the task on a corrupt datum
    * (fail-fast, like FAILFAST JSON mode). `permissive = true` yields
    * null fields plus a `_corrupt` flag instead — the mode a 100 TB
    * backfill wants, where one bad record must not kill the job.
    */
  def decode(df: DataFrame, binCol: String, avroSchemaJson: String,
             permissive: Boolean = false): DataFrame = {
    val base = AvroSchemas.toSparkType(
      AvroSchemas.parse(avroSchemaJson)).asInstanceOf[StructType]
    val outSchema =
      if (permissive) StructType(base.fields :+ StructField("_corrupt", BooleanType, nullable = false))
      else base
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        if (permissive) {
          try {
            val dec = DecoderFactory.get().binaryDecoder(bytes, null)
            val r = recordToRow(reader.read(null, dec), base, schema)
            Row.fromSeq(r.toSeq :+ false)
          } catch {
            case _: Exception =>
              Row.fromSeq(base.fields.toSeq.map(_ => null) :+ true)
          }
        } else {
          val dec = DecoderFactory.get().binaryDecoder(bytes, null)
          recordToRow(reader.read(null, dec), base, schema)
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- Row ⇄ GenericRecord (the interop fold/unfold) ----

  private def nonNull(s: Schema): Seq[Schema] =
    s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toSeq

  private[data] def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val fs = schema.getField(f.name).schema()
      rec.put(f.name, if (row.isNullAt(i)) null else toAvroValue(row.get(i), f.dataType, fs))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType, as: Schema): Any = {
    import Schema.Type._
    if (as.getType == UNION) {
      nonNull(as) match {
        case Seq(only) => return toAvroValue(v, dt, only)
        case branches  =>
          // memberN struct: exactly one non-null member picks the branch
          val row = v.asInstanceOf[Row]
          val st = dt.asInstanceOf[StructType]
          val i = (0 until row.length).indexWhere(!row.isNullAt(_))
          if (i < 0) return null
          return toAvroValue(row.get(i), st.fields(i).dataType, branches(i))
      }
    }
    dt match {
      case TimestampType =>
        val t = v.asInstanceOf[java.sql.Timestamp]
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case DateType => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case BinaryType =>
        val bytes = v.asInstanceOf[Array[Byte]]
        as.getType match {
          case FIXED =>
            if (bytes.length != as.getFixedSize)
              throw new IllegalArgumentException(
                s"FixedError: ${as.getFullName} expects ${as.getFixedSize} bytes, got ${bytes.length}")
            new GenericData.Fixed(as, bytes)
          case _ => java.nio.ByteBuffer.wrap(bytes)
        }
      case StringType =>
        as.getType match {
          case ENUM =>
            val sym = v.toString
            if (!as.getEnumSymbols.contains(sym))
              throw new IllegalArgumentException(
                s"EnumError: '$sym' is not a symbol of ${as.getFullName} ${as.getEnumSymbols.asScala.mkString("[", ",", "]")}")
            new GenericData.EnumSymbol(as, sym)
          case _ => v
        }
      case d: DecimalType =>
        val bd = v.asInstanceOf[java.math.BigDecimal].setScale(d.scale)
        val unscaled = bd.unscaledValue().toByteArray
        as.getType match {
          case FIXED =>
            // left-pad with the sign byte to the declared fixed size
            val out = Array.fill[Byte](as.getFixedSize)(if (bd.signum() < 0) -1 else 0)
            System.arraycopy(unscaled, 0, out, as.getFixedSize - unscaled.length, unscaled.length)
            new GenericData.Fixed(as, out)
          case _ => java.nio.ByteBuffer.wrap(unscaled)
        }
      case ArrayType(et, _) =>
        val arr = new java.util.ArrayList[Any]()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(x =>
          arr.add(if (x == null) null else toAvroValue(x, et, as.getElementType)))
        arr
      case MapType(StringType, vt, _) =>
        val m = new java.util.HashMap[String, Any]()
        v.asInstanceOf[scala.collection.Map[String, Any]].foreach { case (k, mv) =>
          m.put(k, if (mv == null) null else toAvroValue(mv, vt, as.getValueType))
        }
        m
      case st: StructType => rowToRecord(v.asInstanceOf[Row], st, as)
      case _ => v // primitives map 1:1
    }
  }

  private[data] def recordToRow(rec: GenericRecord, st: StructType, schema: Schema): Row =
    Row.fromSeq(st.fields.toSeq.map { f =>
      fromAvroValue(rec.get(f.name), f.dataType, schema.getField(f.name).schema())
    })

  private def fromAvroValue(v: Any, dt: DataType, as: Schema): Any = {
    import Schema.Type._
    if (v == null) null
    else if (as.getType == UNION) {
      nonNull(as) match {
        case Seq(only) => fromAvroValue(v, dt, only)
        case branches =>
          // datum branch → memberN struct with that member set
          val st = dt.asInstanceOf[StructType]
          val unionIdx = GenericData.get().resolveUnion(as, v)
          val memberIdx = as.getTypes.asScala.take(unionIdx)
            .count(_.getType != Schema.Type.NULL)
          Row.fromSeq(st.fields.toSeq.zipWithIndex.map { case (f, i) =>
            if (i == memberIdx) fromAvroValue(v, f.dataType, branches(i)) else null
          })
      }
    } else dt match {
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      case TimestampNTZType =>
        val us = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case StringType => v.toString // avro Utf8 / EnumSymbol → String
      case BinaryType =>
        v match {
          case f: GenericData.Fixed => f.bytes().clone()
          case bb: java.nio.ByteBuffer =>
            val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
          case other => other.asInstanceOf[Array[Byte]]
        }
      case d: DecimalType =>
        val bytes = v match {
          case f: GenericData.Fixed => f.bytes()
          case bb: java.nio.ByteBuffer =>
            val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala
          .map(x => if (x == null) null else fromAvroValue(x, et, as.getElementType)).toSeq
      case MapType(StringType, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
          k.toString -> (if (mv == null) null else fromAvroValue(mv, vt, as.getValueType))
        }.toMap
      case st: StructType => recordToRow(v.asInstanceOf[GenericRecord], st, as)
      case _ => v
    }
  }
}

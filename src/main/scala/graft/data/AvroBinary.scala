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
  * Supported field types: boolean/int/long/float/double/string/binary,
  * timestamp (micros logical), date, nullable unions of those, and
  * arrays of primitives. That covers every testdata table.
  */
object AvroBinary {

  /** Encode each row to one Avro binary datum (column `avro_bin`). */
  def encode(df: DataFrame, recordName: String = "record"): DataFrame = {
    val sparkSchema = df.schema
    val avroJson = AvroSchemas.toAvroSchema(sparkSchema, recordName).toString
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
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
            val r = recordToRow(reader.read(null, dec), base)
            Row.fromSeq(r.toSeq :+ false)
          } catch {
            case _: Exception =>
              Row.fromSeq(base.fields.toSeq.map(_ => null) :+ true)
          }
        } else {
          val dec = DecoderFactory.get().binaryDecoder(bytes, null)
          recordToRow(reader.read(null, dec), base)
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- Row ⇄ GenericRecord (the interop fold/unfold) ----

  private def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, if (row.isNullAt(i)) null else toAvroValue(row.get(i), f.dataType))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType): Any = dt match {
    case TimestampType =>
      val t = v.asInstanceOf[java.sql.Timestamp]
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    case TimestampNTZType =>
      val ldt = v.asInstanceOf[java.time.LocalDateTime]
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case DateType => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
    case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      val arr = new java.util.ArrayList[Any]()
      v.asInstanceOf[scala.collection.Seq[Any]].foreach(x =>
        arr.add(if (x == null) null else toAvroValue(x, et)))
      arr
    case _ => v // primitives map 1:1
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.map { f =>
      fromAvroValue(rec.get(f.name), f.dataType)
    })

  private def fromAvroValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
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
      case StringType => v.toString // avro Utf8 → String
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.get(out); out
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala.map(fromAvroValue(_, et)).toSeq
      case _ => v
    }
}

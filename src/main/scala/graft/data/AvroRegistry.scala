package graft.data

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Schema-registry interface + framed datum decode — the network-free
  * re-expression of the reference's roadmap item #2 (Anglerfish README
  * "What's coming up next": "interfaces e.g. for Confluent Schema
  * registry, Kafka, HDFS FileSystem object as tagless interfaces").
  * The registry is a [[SchemaProvider]] trait; the impls here are
  * in-memory and Hadoop-FS-file-backed — a real Confluent/HDP client
  * is one more impl of the same two-method surface, with no other
  * engine changes.
  *
  * Wire format (the public Confluent convention): magic byte `0x00`,
  * 4-byte big-endian schema id, then the binary Avro datum. Because
  * the id rides on EVERY datum, a stream whose producer upgrades its
  * writer schema mid-stream decodes continuously: each datum's writer
  * schema is resolved against the caller's reader schema per standard
  * Avro schema-resolution rules (added fields take defaults, dropped
  * fields are skipped) — resolution happens once per (schema id,
  * partition), not per row.
  */
object AvroRegistry {

  /** Subject-free minimal registry: writer schema JSON by schema id.
    * Implementations must be Serializable (resolved executor-side) and
    * thread-safe.
    */
  trait SchemaProvider extends Serializable {
    def writerSchema(id: Int): Option[String]
  }

  final case class InMemoryProvider(schemas: Map[Int, String]) extends SchemaProvider {
    def writerSchema(id: Int): Option[String] = schemas.get(id)
  }

  /** Hadoop-FS-backed provider: schema id `n` lives at `<dir>/n.avsc`
    * (file:/hdfs:/object stores). Lookups are cached per JVM —
    * executors fetch each schema at most once. `confEntries` carries
    * any non-default Hadoop settings (e.g. object-store credentials)
    * to the executors.
    */
  final case class FileProvider(dir: String, confEntries: Map[String, String] = Map.empty)
      extends SchemaProvider {
    @transient private lazy val cache =
      scala.collection.concurrent.TrieMap.empty[Int, Option[String]]
    // the control-plane FS surface behind ONE trait (r15 — FsOps,
    // the reference's "Hadoop FS Ops" roadmap item); same Hadoop
    // FileSystem resolution as before, now shared
    private val fs = HadoopFsOps(confEntries)
    def writerSchema(id: Int): Option[String] = cache.getOrElseUpdate(id, {
      val path = new Path(dir, s"$id.avsc").toString
      if (!fs.exists(path)) None else Some(fs.readUtf8(path))
    })
  }

  /** The 5-byte frame header for a schema id (magic 0x00 + BE int). */
  def frameHeader(schemaId: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(5).put(0: Byte).putInt(schemaId).array()

  /** Encode rows as FRAMED Avro datums (r16 — VERDICT r15 next #3,
    * the inverse of [[decodeFramed]] and the produce half of the
    * reference's Kafka roadmap item): each row is written with the
    * PROVIDER'S writer schema for `schemaId` and framed
    * `magic 0x00 + BE schema id + binary datum`, so the id on the
    * wire can never disagree with the bytes behind it — the schema
    * is looked up through the same [[SchemaProvider]] the consumer
    * resolves against, making decode ∘ encode an identity by
    * construction (spec-pinned, including a reader on an UPGRADED
    * schema taking defaults for added fields).
    *
    * The frame's payload fields are taken from the input BY NAME in
    * writer-schema order (extra input columns are ignored unless
    * listed in `keepCols`, which ride beside the framed bytes — the
    * Kafka key / partition-affinity path). Output:
    * keepCols ++ (`avro_framed` BINARY).
    */
  def encodeFramed(df: DataFrame, schemaId: Int, provider: SchemaProvider,
                   keepCols: Seq[String] = Nil): DataFrame = {
    import org.apache.avro.generic.GenericDatumWriter
    import org.apache.avro.io.EncoderFactory
    val writerJson = provider.writerSchema(schemaId).getOrElse(
      throw new IllegalArgumentException(
        s"encodeFramed: SchemaProvider has no writer schema for id $schemaId"))
    val st = AvroSchemas.toSparkType(
      AvroSchemas.parse(writerJson)).asInstanceOf[StructType]
    require(!keepCols.contains("avro_framed"),
      "encodeFramed: keepCols may not claim the output column avro_framed")
    val projected = df.select(
      (keepCols ++ st.fields.map(_.name)).map(org.apache.spark.sql.functions.col): _*)
    val header = frameHeader(schemaId)
    val kept = keepCols.map(c => projected.schema(projected.schema.fieldIndex(c)))
    val outSchema = StructType(
      kept :+ StructField("avro_framed", BinaryType, nullable = false))
    val nKeep = keepCols.length
    val payloadLen = st.fields.length
    projected.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(writerJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new java.io.ByteArrayOutputStream()
      val encoder = EncoderFactory.get().binaryEncoder(bos, null)
      rows.map { row =>
        bos.reset()
        bos.write(header, 0, header.length)
        val enc = EncoderFactory.get().binaryEncoder(bos, encoder)
        val payload = Row.fromSeq((nKeep until nKeep + payloadLen).map(row.get))
        writer.write(AvroBinary.rowToRecord(payload, st, schema), enc)
        enc.flush()
        Row.fromSeq((0 until nKeep).map(row.get) :+ bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode framed Avro datums (batch or streaming DataFrame) against
    * `readerSchemaJson`, resolving each datum's writer schema through
    * the provider. `permissive = true` nulls undecodable datums (bad
    * magic, unknown id, corrupt payload) and flags them `_corrupt`
    * instead of failing the task — mirroring [[AvroBinary.decode]].
    */
  def decodeFramed(df: DataFrame, binCol: String, provider: SchemaProvider,
                   readerSchemaJson: String, permissive: Boolean = false,
                   keepCols: Seq[String] = Nil): DataFrame = {
    val base = AvroSchemas.toSparkType(
      AvroSchemas.parse(readerSchemaJson)).asInstanceOf[StructType]
    // passthrough columns (r14 — Kafka offset/partition/timestamp
    // metadata riding beside the decoded fields) lead the output row
    val clash = base.fields.map(_.name).toSet.intersect(keepCols.toSet)
    require(clash.isEmpty,
      s"decodeFramed: keepCols ${clash.mkString(", ")} collide with reader-schema " +
        "field names — the output would carry duplicate columns unselectable by " +
        "name; rename the payload field or alias the metadata column first")
    val kept = keepCols.map(c => df.schema(df.schema.fieldIndex(c)))
    val withKept = StructType(kept ++ base.fields)
    val outSchema =
      if (permissive) StructType(withKept.fields :+ StructField("_corrupt", BooleanType, nullable = false))
      else withKept
    val idx = df.schema.fieldIndex(binCol)
    val keepIdx = keepCols.map(df.schema.fieldIndex).toArray
    df.mapPartitions { rows =>
      val reader = new Schema.Parser().parse(readerSchemaJson)
      // one resolved reader per writer-schema id per partition
      val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      def readerFor(id: Int): GenericDatumReader[GenericRecord] =
        readers.getOrElseUpdate(id, {
          val wj = provider.writerSchema(id).getOrElse(throw new IllegalArgumentException(
            s"SchemaProvider has no writer schema for id $id"))
          new GenericDatumReader[GenericRecord](new Schema.Parser().parse(wj), reader)
        })
      def decodeOne(bytes: Array[Byte]): Row = {
        // >= 5: the 5-byte frame alone is a VALID datum when the
        // writer schema encodes to zero bytes (e.g. an empty record)
        require(bytes.length >= 5 && bytes(0) == 0,
          s"not a framed Avro datum (len=${bytes.length}, magic=${if (bytes.isEmpty) "∅" else bytes(0)})")
        val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
        val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
        AvroBinary.recordToRow(readerFor(id).read(null, dec), base, reader)
      }
      val nullSeq = base.fields.toSeq.map(_ => null)
      rows.map { row =>
        val keptVals = keepIdx.toSeq.map(row.get)
        val bytes = row.getAs[Array[Byte]](idx)
        if (bytes == null) {
          // a null payload is an absent datum, not a corrupt one:
          // all-null fields in both modes (mirrors from_avro on null)
          if (permissive) Row.fromSeq(keptVals ++ nullSeq :+ false)
          else Row.fromSeq(keptVals ++ nullSeq)
        } else if (permissive) {
          try Row.fromSeq(keptVals ++ decodeOne(bytes).toSeq :+ false)
          catch { case _: Exception => Row.fromSeq(keptVals ++ nullSeq :+ true) }
        } else Row.fromSeq(keptVals ++ decodeOne(bytes).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}

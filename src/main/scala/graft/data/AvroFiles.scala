package graft.data

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro **container file** source/sink — the file-level completion of
  * the datum-level [[AvroBinary]] codec: one Avro Object Container
  * File per Spark partition on write, one Spark partition per file on
  * read, everything streamed through the executors (no whole-file
  * buffering, no driver-side data).
  *
  * The read path passes the expected schema as the Avro *reader*
  * schema, so standard Avro schema resolution applies: files written
  * with an older writer schema resolve against a newer reader schema
  * (added fields take their defaults, removed fields are skipped) —
  * the schema-evolution behavior the reference's schema machinery
  * (AvroData.scala / AvroGenericInteropFAlgebras.scala) exists to
  * support.
  *
  * Paths go through the Hadoop FileSystem API, so `file:/`, `hdfs:/`
  * and any configured object store scheme work unchanged.
  */
object AvroFiles {

  /** Write `df` as Avro container files under `dir`
    * (`part-NNNNN.avro`, one per non-empty partition). Returns the
    * writer schema JSON (derive-once, reuse for [[read]]).
    */
  def write(df: DataFrame, dir: String, recordName: String = "record"): String = {
    val avroJson = AvroSchemas.toAvroSchema(df.schema, recordName).toString
    writeAs(df, dir, avroJson)
    avroJson
  }

  /** Write against a caller-supplied writer schema (enum/fixed/union
    * targets — see [[AvroBinary.encodeAs]]).
    */
  def writeAs(df: DataFrame, dir: String, avroSchemaJson: String): Unit = {
    val st = df.schema
    val counts = df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroSchemaJson)
        val path = new Path(dir, f"part-$i%05d.avro")
        val fs = path.getFileSystem(new Configuration())
        val out = fs.create(path, true)
        val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, out)
        var n = 0L
        try rows.foreach { row =>
          writer.append(AvroBinary.rowToRecord(row, st, schema)); n += 1
        } finally writer.close()
        Iterator.single(n)
      }
    }
    counts.count() // materialize the write
    ()
  }

  /** Read Avro container files under `dir` into a typed DataFrame.
    * `avroSchemaJson` is the *reader* schema; each file's own writer
    * schema (from its header) is resolved against it per standard
    * Avro schema-resolution rules.
    */
  def read(spark: SparkSession, dir: String, avroSchemaJson: String): DataFrame = {
    val readerSchema = AvroSchemas.parse(avroSchemaJson)
    val st = AvroSchemas.toSparkType(readerSchema).asInstanceOf[StructType]
    val globPath = new Path(dir, "*.avro")
    val fs = globPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(globPath).map(_.getPath.toString).sorted
    // avro Schema is not serializable: ship the JSON, re-parse per task
    val schemaJson = readerSchema.toString
    val target = st
    val rows = spark.sparkContext
      .parallelize(files.toSeq, math.max(files.length, 1))
      .flatMap { p =>
        val parsed = new Schema.Parser().parse(schemaJson)
        val path = new Path(p)
        val in = path.getFileSystem(new Configuration()).open(path)
        // expected = reader schema; DataFileStream installs the file's
        // writer schema as the actual → avro resolves between them
        val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord](parsed))
        new Iterator[org.apache.spark.sql.Row] {
          def hasNext: Boolean = {
            val h = stream.hasNext
            if (!h) stream.close()
            h
          }
          def next(): org.apache.spark.sql.Row =
            AvroBinary.recordToRow(stream.next(), target, parsed)
        }
      }
    spark.createDataFrame(rows, st)
  }
}

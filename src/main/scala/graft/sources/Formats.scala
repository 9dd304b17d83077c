package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink support (SURVEY.md §4): the same tables
  * readable and writable as parquet / orc / csv / json, with explicit
  * schema on read for the text formats (inference is both slow — an
  * extra full pass — and lossy for timestamps/decimals).
  *
  * Scale notes: every writer takes a partition count; text formats
  * get compression by default. CSV/JSON carry timestamps in ISO-8601
  * UTC so round-trips are lossless at µs precision.
  */
object Formats {

  val TimestampFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def write(df: DataFrame, path: String, format: String,
            partitions: Option[Int] = None): Unit = {
    val out = partitions.map(df.repartition(_)).getOrElse(df)
    val w = out.write.mode(SaveMode.Overwrite).format(format)
    (format match {
      case "csv"  => w.option("header", "true")
        .option("timestampFormat", TimestampFmt).option("compression", "gzip")
      case "json" => w.option("timestampFormat", TimestampFmt)
        .option("compression", "gzip")
      case _ => w
    }).save(path)
  }

  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.map(r.schema).getOrElse(r)
    (format match {
      case "csv"  => withSchema.option("header", "true")
        .option("timestampFormat", TimestampFmt)
      case "json" => withSchema.option("timestampFormat", TimestampFmt)
      case _ => withSchema
    }).load(path)
  }
}

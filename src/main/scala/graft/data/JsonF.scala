package graft.data

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic JSON manipulation API — the "richer API around JsonF" the
  * reference's roadmap asks for (Anglerfish README "Long Term" #3),
  * re-expressed over Spark's type tree instead of a pattern functor:
  * the unfold is distributed schema inference, the fold is `from_json`
  * into typed rows, algebras are Column transforms over the result,
  * and the schema itself is a first-class value to walk (flatten,
  * profile).
  */
object JsonF {

  /** Distributed schema inference over a JSON string column — the
    * unfold: every executor parses its partition, Spark merges the
    * partial schemas (same mechanism as the JSON file source).
    */
  def inferSchema(df: DataFrame, jsonCol: String): StructType =
    df.sparkSession.read
      .json(df.select(col(jsonCol)).na.drop().as(Encoders.STRING))
      .schema

  /** Infer + fold into a typed struct column in one call. */
  def parsed(df: DataFrame, jsonCol: String, out: String = "parsed"): DataFrame =
    df.withColumn(out, from_json(col(jsonCol), inferSchema(df, jsonCol)))

  /** Recursively flatten a struct column into top-level columns named
    * by path (`a_b_c`); arrays and maps stay intact at their level.
    */
  def flatten(df: DataFrame, structCol: String, sep: String = "_"): DataFrame = {
    val st = df.schema(structCol).dataType match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"$structCol is $other, not a struct")
    }
    def cols(prefix: Seq[String], t: StructType): Seq[Column] =
      t.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case s: StructType => cols(path, s)
          case _ =>
            Seq(quoted(structCol +: path).as(path.mkString(sep)))
        }
      }
    val keep = df.columns.filter(_ != structCol).map(col).toSeq
    df.select(keep ++ cols(Nil, st): _*)
  }

  /** Column reference from raw path segments: every segment is
    * backtick-quoted (with `` escaping), so inferred field names
    * containing '.' or '`' — routine in real-world JSON keys —
    * resolve to the right nested field instead of erroring or binding
    * elsewhere. Unquoted dotted paths remain display-only.
    */
  private def quoted(segments: Seq[String]): Column =
    col(segments.map(s => "`" + s.replace("`", "``") + "`").mkString("."))

  private def leafSegments(st: StructType): Seq[(Seq[String], DataType)] = {
    def go(prefix: Seq[String], t: DataType): Seq[(Seq[String], DataType)] = t match {
      case s: StructType => s.fields.toSeq.flatMap(f => go(prefix :+ f.name, f.dataType))
      case other         => Seq((prefix, other))
    }
    go(Nil, st)
  }

  /** Leaf paths of a schema with their types (driver-side walk of the
    * type tree — schemas are small). Paths are display-form
    * (dot-joined, unquoted).
    */
  def leafPaths(st: StructType): Seq[(String, DataType)] =
    leafSegments(st).map { case (segs, dt) => (segs.mkString("."), dt) }

  /** Profile a JSON column: one row per leaf path with its inferred
    * type and non-null occurrence count — the data-discovery query
    * you run before writing a real schema. One distributed pass for
    * the counts; the (schema-sized) result assembles on the driver.
    */
  def profile(df: DataFrame, jsonCol: String): DataFrame = {
    val spark = df.sparkSession
    val st = inferSchema(df, jsonCol)
    val leaves = leafSegments(st)
    val parsed = df.select(from_json(col(jsonCol), st).as("__p"))
    val counts = parsed
      .agg(count(lit(1)).as("__total"),
        leaves.zipWithIndex.map { case ((segs, _), i) =>
          count(quoted("__p" +: segs)).as(s"__c$i") }: _*)
      .collect().head
    val total = counts.getLong(0)
    val rows = leaves.zipWithIndex.map { case ((segs, dt), i) =>
      (segs.mkString("."), dt.simpleString, counts.getLong(i + 1), total)
    }
    import spark.implicits._
    rows.toDF("path", "inferred_type", "n_nonnull", "n_rows")
  }
}

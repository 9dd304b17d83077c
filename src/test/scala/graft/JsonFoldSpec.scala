package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Generic JSON fold/unfold on Spark (SURVEY.md §2 json_fold) — the
  * re-expression of the reference's JsonF pattern functor (Anglerfish
  * data/json/JsonFAlgebras.scala): inference is the unfold into a
  * typed tree, from_json the fold into rows, higher-order functions
  * the algebra over nested collections, to_json the refold.
  */
class JsonFoldSpec extends AnyFunSuite {
  import SparkTestSession._

  test("schema_of_json unfolds nested JSON into a typed tree") {
    val sample = """{"a": 1, "b": {"c": [1.5, 2.5], "d": "x"}, "e": [{"f": true}]}"""
    val ddl = spark.range(1)
      .select(schema_of_json(lit(sample)).as("s")).collect().head.getString(0)
    assert(ddl.contains("a: BIGINT") || ddl.contains("a BIGINT"))
    assert(ddl.toLowerCase.contains("array"))
  }

  test("fold JSON -> rows -> algebra over nested arrays -> refold") {
    import spark.implicits._
    val docs = Seq(
      """{"id": 1, "xs": [1, 2, 3]}""",
      """{"id": 2, "xs": [10, 20]}""").toDF("j")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("xs", ArrayType(LongType))))
    val folded = docs
      .withColumn("p", from_json(col("j"), schema))
      .select(col("p.id").as("id"), col("p.xs").as("xs"))
      // algebra over the nested collection: map (*2) then fold (+)
      .withColumn("doubled", transform(col("xs"), _ * 2))
      .withColumn("total", aggregate(col("xs"), lit(0L), _ + _))
      .withColumn("back", to_json(struct(col("id"), col("doubled"))))
    val rows = folded.orderBy("id").collect()
    assert(rows(0).getAs[scala.collection.Seq[Long]]("doubled").toSeq == Seq(2L, 4L, 6L))
    assert(rows(0).getAs[Long]("total") == 6L)
    assert(rows(1).getAs[Long]("total") == 30L)
    assert(rows(0).getAs[String]("back") == """{"id":1,"doubled":[2,4,6]}""")
  }

  test("events.props folds with an inferred schema end-to-end") {
    val t = graft.sources.Tables(spark, sfDir)
    val sample = t.events.select(col("props")).limit(1).collect().head.getString(0)
    val inferred = spark.range(1).select(schema_of_json(lit(sample)).as("s"))
      .collect().head.getString(0)
    val parsed = t.events.withColumn("p", from_json(col("props"), lit(inferred), new java.util.HashMap[String, String]()))
    assert(parsed.filter(col("p.k").isNotNull).count() == t.events.count())
  }
}

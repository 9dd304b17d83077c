package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.JsonF

/** The JsonF API surface (reference roadmap "Richer API around
  * JsonF"): distributed inference, parse, recursive flatten, and
  * path profiling.
  */
class JsonFApiSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = {
    import spark.implicits._
    Seq(
      """{"id": 1, "meta": {"lang": "en", "quality": {"score": 0.9}}, "tags": ["a"]}""",
      """{"id": 2, "meta": {"lang": "de", "quality": {"score": 0.4}}, "tags": []}""",
      """{"id": 3, "meta": {"lang": "en"}}""").toDF("j")
  }

  test("inferSchema merges partial schemas across rows") {
    val st = JsonF.inferSchema(docs, "j")
    assert(st.fieldNames.toSet == Set("id", "meta", "tags"))
    val meta = st("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSet == Set("lang", "quality"))
  }

  test("parsed + flatten yields path-named top-level columns") {
    val flat = JsonF.flatten(JsonF.parsed(docs, "j"), "parsed")
    assert(flat.columns.toSet ==
      Set("j", "id", "meta_lang", "meta_quality_score", "tags"))
    val en = flat.filter(col("meta_lang") === "en").orderBy("id").collect()
    assert(en.length == 2 && en(1).isNullAt(en(1).fieldIndex("meta_quality_score")))
  }

  test("profile reports every leaf path with occurrence counts") {
    val prof = JsonF.profile(docs, "j").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof("id") == (("bigint", 3L, 3L)))
    assert(prof("meta.quality.score")._2 == 2L, "score present in 2 of 3 docs")
    assert(prof("meta.lang") == (("string", 3L, 3L)))
    assert(prof.contains("tags"))
  }

  test("flatten and profile survive field names containing dots and backticks") {
    import spark.implicits._
    val df = Seq(
      """{"a.b": 1, "outer": {"x.y": "v", "t`ick": 2}}""",
      """{"a.b": 2, "outer": {"x.y": "w"}}""").toDF("j")
    val p = JsonF.parsed(df, "j")
    val flat = JsonF.flatten(p.drop("j"), "parsed")
    assert(flat.columns.toSet == Set("a.b", "outer_t`ick", "outer_x.y"))
    assert(flat.select(col("`outer_x.y`")).collect().map(_.getString(0)).toSet == Set("v", "w"))
    val prof = JsonF.profile(df, "j").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(prof("a.b") == 2L && prof("outer.x.y") == 2L && prof("outer.t`ick") == 1L,
      s"dotted keys must profile by leaf, got $prof")
  }

  test("profile works on the real events.props column") {
    val t = graft.sources.Tables(spark, sfDir)
    val prof = JsonF.profile(t.events, "props")
    val rows = prof.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) == t.events.count()))
    assert(rows.exists(_.getString(0) == "k"), s"expected path k in ${rows.toSeq}")
  }
}

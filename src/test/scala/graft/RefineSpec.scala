package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Refine
import graft.sources.Tables

/** Row-constraint refinement (reference refinedExtensions/
  * Refinement.scala re-expressed as compiled predicates): the three
  * enforcement modes, null totality, and the combinator vocabulary.
  */
class RefineSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val rows = Seq(
    (1L, "alice", 10.0, "en"),
    (2L, "", -1.0, "en"),
    (3L, null.asInstanceOf[String], 5.0, "xx")).toDF("id", "name", "score", "lang")

  private val constraints = Seq(
    Refine.nonEmpty(col("name")),
    Refine.nonNegative(col("score")),
    Refine.oneOf(col("lang"), Seq("en", "de")))

  test("Flag mode accumulates every violated constraint per row") {
    val out = Refine.check(rows, constraints).orderBy("id").collect()
    assert(out(0).getSeq[String](4).isEmpty, "valid row must have no violations")
    assert(out(1).getSeq[String](4).size == 2, "empty name + negative score")
    // null name proves nothing (refined totality) and bad lang: 2 violations
    assert(out(2).getSeq[String](4).size == 2)
  }

  test("Drop mode keeps exactly the refined rows") {
    val kept = Refine.check(rows, constraints, Refine.Drop).select("id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("Raise mode fails the job naming the violated constraint") {
    val e = intercept[Exception] {
      Refine.check(rows, constraints, Refine.Raise).collect()
    }
    def texts(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ texts(t.getCause)
    assert(texts(e).exists(_.contains("RefinementError")))
    // a fully valid frame passes untouched
    val valid = rows.filter(col("id") === 1)
    assert(Refine.check(valid, constraints, Refine.Raise).count() == 1)
  }

  test("violations is a pure expression usable inside a larger plan") {
    val t = Tables(spark, sfDir)
    val audited = t.documents.withColumn("_v", Refine.violations(Seq(
      Refine.nonEmpty(col("text")),
      Refine.between(length(col("text")), 1, 1000000),
      Refine.matches(col("source"), "^src[0-9]+$"))))
    val bad = audited.filter(size(col("_v")) > 0).count()
    assert(audited.count() == t.documents.count())
    assert(bad == 0, s"testdata documents should all refine clean, got $bad bad rows")
  }

  test("forallElems refines array columns elementwise") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(-3.0, 1.0)), (3L, Seq.empty[Double]))
      .toDF("id", "xs")
    val out = Refine.check(df, Seq(Refine.forallElems(col("xs"))(_ >= 0)))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](2).isEmpty)
    assert(out(1).getSeq[String](2).nonEmpty, "negative element must violate")
    assert(out(2).getSeq[String](2).isEmpty, "vacuous truth on empty arrays")
  }
}

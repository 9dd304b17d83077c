package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.api.Ops._
import graft.functions.GraftFunctions

/** [[graft.functions.UnicodeNormalize]]: the native codegen
  * normalization expression and its `Ops.normalizeUnicode` wrapper.
  * All literals are \u escapes — the build must not depend on source
  * encoding.
  */
class UnicodeNormalizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def norm(s: String, form: String = "NFC"): String = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(Tuple1(s)).toDF("t")
      .select(call_function("unicode_normalize", col("t"), lit(form)))
      .collect()(0).getString(0)
  }

  test("composed and decomposed spellings normalize to identical bytes") {
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301" // e + combining acute
    assert(composed != decomposed, "sanity: different before NFC")
    assert(norm(composed) == norm(decomposed))
    assert(norm(decomposed) == composed)
    // the Angstrom singleton U+212B maps to the letter U+00C5, same length
    assert(norm("\u212b") == "\u00c5")
    // double-combining cluster composes partially: e+ogonek+acute
    assert(norm("e\u0328\u0301") == "\u0119\u0301")
  }

  test("ASCII fast path, null totality, idempotence") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val ascii = "plain ascii text 123 !@#"
    assert(norm(ascii) == ascii)
    val out = Seq(Tuple1(null: String)).toDF("t")
      .select(call_function("unicode_normalize", col("t"))).collect()(0)
    assert(out.isNullAt(0), "null in, null out")
    val once = norm("cafe\u0301 e\u0328\u0301 \u212b")
    assert(norm(once) == once, "NFC is idempotent")
  }

  test("NFD decomposes, NFKC folds compatibility characters, NFC does not") {
    assert(norm("caf\u00e9", "NFD") == "cafe\u0301")
    // fi ligature U+FB01: untouched by NFC, folded to "fi" by NFKC
    assert(norm("\ufb01", "NFC") == "\ufb01")
    assert(norm("\ufb01", "NFKC") == "fi")
    assert(norm("\u00bd", "NFKC") == "1\u20442") // vulgar 1/2 folds
  }

  test("dedup motivation: exact dedup collapses normalization variants only after normalizeUnicode") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the caf\u00e9 menu"),
      (2L, "the cafe\u0301 menu"), // same text, decomposed
      (3L, "something else")).toDF("doc_id", "text")
    val raw = docs.dedupExact("doc_id", "text")
    assert(raw.count() == 3, "without normalization the variants survive dedup")
    val normed = docs.normalizeUnicode("text").dedupExact("doc_id", "text")
    assert(normed.count() == 2, "after NFC the variants collapse to keep-first")
    assert(normed.select("keep_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("bad form and non-string input are rejected at analysis time") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(Tuple1("x")).toDF("t")
    intercept[Exception] {
      df.select(call_function("unicode_normalize", col("t"), lit("NFX"))).collect()
    }
    intercept[Exception] {
      Seq(Tuple1(1L)).toDF("n")
        .select(call_function("unicode_normalize", col("n"))).collect()
    }
  }

  test("q75 stays whole-stage-codegen map work (no shuffle before the sort)") {
    val df = SparkEntry.queries("q75_nfc")(spark, sfDir)
    df.collect() // finalize the AQE plan (write.noop plans a separate QueryExecution)
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the whole-stage-codegen stage marker; the
    // project evaluating unicode_normalize must carry one
    val normLine = plan.linesIterator.find(_.contains("unicode_normalize"))
    assert(normLine.exists(_.contains("*(")),
      s"unicode_normalize must not break codegen:\n$plan")
    // one exchange only: the final orderBy's range partitioning (count
    // inside the AQE final plan — toString repeats the initial plan below)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val exchanges = finalPlan.linesIterator.count(_.contains("Exchange rangepartitioning"))
    assert(exchanges == 1, s"expected map-side work + one sort exchange, got $exchanges:\n$plan")
  }
}

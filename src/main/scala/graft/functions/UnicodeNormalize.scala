package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (NFC/NFD/
  * NFKC/NFKD) — the canonicalization step a crawl corpus needs before
  * any hash-based dedup: the same visible text arrives both composed
  * (é = U+00E9) and decomposed (e + U+0301), and without
  * normalization exact dedup (q31), shingle hashing (q32/q33) and
  * fingerprints (q29) silently treat them as different documents.
  *
  * Spark has no built-in for this, and a Scala UDF would leave
  * whole-stage codegen; this stays inside Tungsten via `doGenCode`
  * (the generated code calls the same static helper as the
  * interpreted path). Two allocation-free fast paths make it cheap on
  * the dominant case: a pure-ASCII string (numBytes == numChars) is
  * closed under every normalization form and returns the input
  * buffer untouched, and an already-normalized string (Unicode
  * quick-check) skips the rebuild.
  *
  * Both the JDK and DuckDB's utf8proc implement the same Unicode
  * normalization spec, so `nfc_normalize` replays this bit-for-bit in
  * the oracle (verified on composed/decomposed/compatibility cases).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // fail at construction on a bad form name, not per-row
  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string column, got ${other.simpleString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalize.normalize(s.asInstanceOf[UTF8String], normForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formName = normForm.name() // validated enum constant, safe to inline
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNormalize.normalize(" +
        s"$c, java.text.Normalizer.Form.$formName);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    // ASCII fast path: one-byte-per-char ⇒ ASCII ⇒ normal in every
    // form; no String allocation for the common crawl-corpus case
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, form)) s
      else UTF8String.fromString(Normalizer.normalize(str, form))
    }
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over double
  * arrays, with whole-stage codegen (`doGenCode`) — the hot inner loop
  * of brute-force ANN (SURVEY.md §2 q35/q36) stays inside Tungsten
  * codegen rather than falling back to an interpreted UDF.
  *
  * Accumulation is sequential in array order, matching DuckDB's
  * `list_cosine_similarity` bit-for-bit on the same doubles.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xi = $a.getDouble(i);
         |  double yi = $b.getDouble(i);
         |  dot += xi * yi; na += xi * xi; nb += yi * yi;
         |}
         |${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Imperative registration for sessions we don't build ourselves (the
  * driver hands `SparkEntry.queries` a plain session); cluster deploys
  * can use `GraftExtensions` with spark.sql.extensions instead.
  */
object GraftFunctions {
  /** unicode_normalize(col[, 'NFC'|'NFD'|'NFKC'|'NFKD']) — form
    * defaults to NFC and must be a string literal (it selects the
    * compiled code path).
    */
  private[functions] def buildUnicodeNormalize(exprs: Seq[Expression]): Expression = {
    if (exprs.isEmpty || exprs.length > 2)
      throw new IllegalArgumentException(
        s"unicode_normalize(col[, form]) requires 1 or 2 arguments, got ${exprs.length}")
    val form = if (exprs.length == 1) "NFC" else {
      val f = exprs(1)
      if (!f.foldable)
        throw new IllegalArgumentException(
          s"unicode_normalize form must be a string literal, got expression ${f.sql}")
      val name = String.valueOf(f.eval(null)).toUpperCase
      if (!UnicodeNormalize.forms(name))
        throw new IllegalArgumentException(
          s"unicode_normalize form must be one of ${UnicodeNormalize.forms.mkString(", ")}, got $name")
      name
    }
    UnicodeNormalize(exprs.head, form)
  }

  private[functions] def buildPortableHll(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"portable_hll(string_col, p) requires 2 arguments, got ${exprs.length}")
    val p = {
      if (!exprs(1).foldable)
        throw new IllegalArgumentException(
          s"portable_hll p must be an int literal, got expression ${exprs(1).sql}")
      exprs(1).eval(null) match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"portable_hll p must be an int literal, got $other")
      }
    }
    PortableHll(exprs.head, p)
  }

  private[functions] def buildPortableQuantiles(exprs: Seq[Expression]): Expression = {
    if (exprs.length < 2)
      throw new IllegalArgumentException(
        s"portable_quantiles(double_col, q1[, q2, ...]) requires at least 2 arguments, got ${exprs.length}")
    val qs = exprs.tail.map { e =>
      if (!e.foldable)
        throw new IllegalArgumentException(
          s"portable_quantiles quantiles must be numeric literals, got expression ${e.sql}")
      // SQL parses 0.95 as DECIMAL and 1 as INT — accept every
      // numeric literal form a SQL caller naturally writes (r11
      // review: requiring the 0.95D suffix made the registered SQL
      // surface unusable)
      e.eval(null) match {
        case d: Double => d
        case f: Float => f.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other => throw new IllegalArgumentException(
          s"portable_quantiles quantiles must be numeric literals, got $other")
      }
    }
    PortableQuantiles(exprs.head, qs)
  }

  private[functions] def buildPoissonBootstrap(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 4)
      throw new IllegalArgumentException(
        s"poisson_bootstrap(h1, h2, cents, b) requires 4 arguments, got ${exprs.length}")
    val b = {
      if (!exprs(3).foldable)
        throw new IllegalArgumentException(
          s"poisson_bootstrap b must be an int literal, got expression ${exprs(3).sql}")
      exprs(3).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"poisson_bootstrap b must be an int literal, got $other")
      }
    }
    // the CDF constants are canonical in Ops.poissonCdf1 — the one
    // definition the column form, this aggregate, and the oracle SQL
    // literals all share
    PoissonBootstrap(exprs(0), exprs(1), exprs(2), b, graft.api.Ops.poissonCdf1)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch", exprs => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"topk_sketch(col, k, cap) requires 3 arguments, got ${exprs.length}")
        def intLit(e: Expression, name: String): Int = {
          if (!e.foldable)
            throw new IllegalArgumentException(
              s"topk_sketch $name must be an int literal, got expression ${e.sql}")
          e.eval(null) match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"topk_sketch $name must be an int literal, got $other")
          }
        }
        TopKSketch(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "cap"))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize", exprs => GraftFunctions.buildUnicodeNormalize(exprs),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hll", exprs => GraftFunctions.buildPortableHll(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_quantiles", exprs => GraftFunctions.buildPortableQuantiles(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poisson_bootstrap", exprs => GraftFunctions.buildPoissonBootstrap(exprs), "built-in")
    // Spark ships distributed bloom-filter expressions for its own
    // runtime row-level filtering (InjectRuntimeFilter) but leaves
    // them out of the public function registry; surfacing them gives
    // the bloom-prefiltered semi-join ([[graft.api.Ops]].bloomSemiJoin)
    // a codegen'd build/probe with zero new aggregation code.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", exprs => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            s"bloom_agg(xxhash64_col, est_items, num_bits) requires 3 arguments, got ${exprs.length}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, exprs(1), exprs(2))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains", exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"bloom_contains(bloom, xxhash64_col) requires 2 arguments, got ${exprs.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
      }, "built-in")
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` on a real
  * cluster registers everything at session build time.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, "cosine_sim"),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("topk_sketch"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TopKSketch].getName, "topk_sketch"),
        (exprs: Seq[Expression]) => {
          if (exprs.length != 3)
            throw new IllegalArgumentException(
              s"topk_sketch(col, k, cap) requires 3 arguments, got ${exprs.length}")
          def intLit(ex: Expression, name: String): Int = {
            if (!ex.foldable)
              throw new IllegalArgumentException(
                s"topk_sketch $name must be an int literal, got expression ${ex.sql}")
            ex.eval(null) match {
              case i: Int => i
              case other => throw new IllegalArgumentException(
                s"topk_sketch $name must be an int literal, got $other")
            }
          }
          TopKSketch(exprs.head, intLit(exprs(1), "k"), intLit(exprs(2), "cap"))
        }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_agg"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "bloom_agg"),
        (exprs: Seq[Expression]) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            exprs.head, exprs(1), exprs(2))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_contains"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
          "bloom_contains"),
        (exprs: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            exprs.head, exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("portable_hll"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[PortableHll].getName, "portable_hll"),
        (exprs: Seq[Expression]) => GraftFunctions.buildPortableHll(exprs)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("portable_quantiles"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[PortableQuantiles].getName, "portable_quantiles"),
        (exprs: Seq[Expression]) => GraftFunctions.buildPortableQuantiles(exprs)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("poisson_bootstrap"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[PoissonBootstrap].getName, "poisson_bootstrap"),
        (exprs: Seq[Expression]) => GraftFunctions.buildPoissonBootstrap(exprs)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("unicode_normalize"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[UnicodeNormalize].getName, "unicode_normalize"),
        (exprs: Seq[Expression]) => GraftFunctions.buildUnicodeNormalize(exprs)))
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

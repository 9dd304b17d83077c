package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative row-constraint validation — the Spark-native
  * re-expression of the reference's refined-types integration
  * (Anglerfish core/refinedExtensions/Refinement.scala:14 `refineME`:
  * validate a value against a type-level predicate and lift the
  * result into MonadError). On a DataFrame the "refined type" is a
  * NAMED PREDICATE over columns compiled to a codegen'd boolean
  * expression; the reference's error channel becomes one of three
  * enforcement modes, all fully distributed:
  *
  *  - [[Raise]]  — the MonadError-raise analogue: the first invalid
  *    row fails the job with the violated constraint names
  *    (ingest-gate semantics);
  *  - [[Flag]]   — every row gains a `_violations` array<string>
  *    column (empty = valid) — the accumulating-validation analogue,
  *    what a 100 TB quality audit wants (one pass, no row lost);
  *  - [[Drop]]   — keep only valid rows (refinement as filtering).
  *
  * A predicate that evaluates to NULL (e.g. a null column) counts as
  * a violation, matching refined's totality: a value either proves
  * the predicate or it doesn't.
  */
object Refine {

  final case class Constraint(name: String, pred: Column)

  sealed trait OnViolation
  case object Raise extends OnViolation
  case object Flag extends OnViolation
  case object Drop extends OnViolation

  // ---- the predicate vocabulary (refined's common refinements,
  // Column-typed; compose freely with &&/||) --------------------------------

  def positive(c: Column): Constraint = Constraint(s"positive($c)", c > 0)
  def nonNegative(c: Column): Constraint = Constraint(s"nonNegative($c)", c >= 0)
  def nonEmpty(c: Column): Constraint = Constraint(s"nonEmpty($c)", length(c) > 0)
  def matches(c: Column, regex: String): Constraint =
    Constraint(s"matches($c, $regex)", c.rlike(regex))
  def oneOf(c: Column, allowed: Seq[Any]): Constraint =
    Constraint(s"oneOf($c)", c.isInCollection(allowed))
  def between(c: Column, lo: Any, hi: Any): Constraint =
    Constraint(s"between($c, $lo, $hi)", c >= lo && c <= hi)
  def notNull(c: Column): Constraint = Constraint(s"notNull($c)", c.isNotNull)
  /** Every element of an array column proves `p`. */
  def forallElems(c: Column)(p: Column => Column): Constraint =
    Constraint(s"forallElems($c)", coalesce(forall(c, x => coalesce(p(x), lit(false))), lit(false)))

  /** Names of the constraints each row violates (empty array = the
    * row inhabits the refined type). Pure expression — usable inside
    * any plan, streaming included.
    */
  def violations(constraints: Seq[Constraint]): Column = {
    require(constraints.nonEmpty, "at least one constraint required")
    filter(
      array(constraints.map(ct =>
        when(!coalesce(ct.pred, lit(false)), lit(ct.name))): _*),
      v => v.isNotNull)
  }

  /** Enforce `constraints` on `df` per `onViolation` (see object doc). */
  def check(df: DataFrame, constraints: Seq[Constraint],
            onViolation: OnViolation = Flag): DataFrame = {
    val v = violations(constraints)
    onViolation match {
      case Flag => df.withColumn("_violations", v)
      case Drop => df.filter(size(v) === 0)
      case Raise =>
        // enforced through a filter: a projected-then-dropped check
        // column would be pruned away and never evaluated
        df.filter(when(size(v) === 0, lit(true)).otherwise(raise_error(
          concat(lit("RefinementError: row violates "), concat_ws(", ", v))).cast("boolean")))
    }
  }
}

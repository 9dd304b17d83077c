package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive temporal range join
  *
  *   L JOIN R ON abs(tL - tR) <= tol          (tL/tR in µs, tol literal)
  *
  * — which Spark can only plan as a broadcast-nested-loop or cartesian
  * product (there is no equi key) — into the bucketed form
  *
  *   L' = L + bucket(tL)
  *   R' = R × explode([bucket(tR)-1, bucket(tR), bucket(tR)+1])
  *   L' JOIN R' ON bucketL = bucketR AND abs(tL - tR) <= tol
  *
  * with bucket(t) = t div tol. Every qualifying pair lands in exactly
  * one (bucketL, bucketR) match, so semantics are identical, but the
  * join now has an equi key: it shuffles/hashes on the bucket instead
  * of comparing all |L|×|R| pairs — the difference between hours and
  * seconds at 100 TB. This automates what `Ops.rangeJoin` does by
  * hand, for any user writing the naive predicate.
  *
  * Activated via `spark.sql.extensions=graft.functions.GraftExtensions`
  * or `RangeJoinRewrite.install(spark)`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** abs(a - b) <= tol (or < tol: a strict bound is a subset of the
    * inclusive one, so the same 3-bucket cover is sound) with sides
    * separable into (left-only, right-only).
    */
  private object NaiveRangePredicate {
    def unapply(j: Join): Option[(Expression, Expression, Long)] = {
      val bound = j match {
        case Join(_, _, Inner,
            Some(LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(tol: Long, LongType))), _) =>
          Some((a, b, tol))
        case Join(_, _, Inner,
            Some(LessThan(Abs(Subtract(a, b, _), _), Literal(tol: Long, LongType))), _) =>
          Some((a, b, tol))
        case _ => None
      }
      bound.filter(_._3 > 0).flatMap { case (a, b, tol) =>
        val (lRefs, rRefs) = (j.left.outputSet, j.right.outputSet)
        if (a.references.subsetOf(lRefs) && b.references.subsetOf(rRefs))
          Some((a, b, tol))
        else if (a.references.subsetOf(rRefs) && b.references.subsetOf(lRefs))
          Some((b, a, tol))
        else None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ NaiveRangePredicate(lTime, rTime, tol) =>
      val tolLit = Literal(tol, LongType)
      def bucket(t: Expression) = IntegralDivide(t, tolLit)

      val lBucket = Alias(bucket(lTime), "__graft_bl")()
      val newLeft = Project(j.left.output :+ lBucket, j.left)

      val rb = bucket(rTime)
      val gen = Explode(CreateArray(Seq(
        Subtract(rb, Literal(1L, LongType)), rb, Add(rb, Literal(1L, LongType)))))
      val genOut = AttributeReference("__graft_br", LongType, nullable = false)()
      val newRight = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(genOut), child = j.right)

      val cond = And(
        EqualTo(lBucket.toAttribute, genOut),
        j.condition.get)
      val rewritten = Join(newLeft, newRight, Inner, Some(cond), j.hint)
      // drop the helper bucket columns again
      Project(j.left.output ++ j.right.output, rewritten)
  }

  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.extraOptimizations =
      (spark.experimental.extraOptimizations :+ this).distinct
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite
import graft.sources.Tables

/** The optimizer rule must turn the naive |tL - tR| <= tol join (a
  * nested-loop plan) into a bucketed equi-join with identical results.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  private def naiveJoin = {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val e = t.events.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("ts").as("e_ts"))
    p.join(e, abs(expr("unix_micros(p_ts) - unix_micros(e_ts)")) <= 300000000L)
      .select("p_id", "e_id")
  }

  test("without the rule, the naive range join is a nested-loop plan") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
    val plan = naiveJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"expected nested-loop baseline, got:\n$plan")
  }

  test("with the rule installed, the join gets an equi key and results are unchanged") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
    val expected = naiveJoin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    RangeJoinRewrite.install(spark)
    try {
      val rewritten = naiveJoin
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not remove the nested loop:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"expected an equi join:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"rewrite changed results: ${got.size} vs ${expected.size}")
      assert(got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketed co-located joins (SURVEY.md §4 scale notes): writing both
  * fact tables bucketed+sorted on the join key lets the sort-merge
  * join run with ZERO exchanges — at 100 TB this converts the
  * dominant shuffle of every orders⋈lineitem query into a local merge.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed join plans without any shuffle exchange") {
    val t = Tables(spark, sfDir)
    t.orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    t.lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plain = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      assert(bucketed.count() == plain.count(), "bucketed join changed results")
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

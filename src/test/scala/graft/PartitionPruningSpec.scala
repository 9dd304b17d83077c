package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Partitioned layout + partition pruning: date-partitioned writes
  * must let a day filter touch only that day's files — at 100 TB this
  * is the difference between scanning one day and scanning the lake.
  */
class PartitionPruningSpec extends AnyFunSuite {
  import SparkTestSession._

  test("date-partitioned events prune to the filtered day") {
    val t = Tables(spark, sfDir)
    val dir = Files.createTempDirectory("graft_part").toString
    t.events
      .withColumn("event_date", to_date(col("ts")).cast("string"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("event_date") === "2024-01-01")
    val plan = pruned.queryExecution.executedPlan.toString
    // the scan must carry a partition filter, and read only 1 of the
    // partition directories
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"no partition filter in plan:\n${plan.take(2000)}")
    val expected = t.events.filter(to_date(col("ts")) === "2024-01-01").count()
    assert(pruned.count() == expected)
    val days = new java.io.File(dir).listFiles().count(_.getName.startsWith("event_date="))
    assert(days > 1, "test needs multiple partition dirs to be meaningful")
  }
}

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

  test("month-partitioned SCD2 history prunes the as-of read to covered months") {
    import spark.implicits._
    import graft.api.Ops
    import graft.api.Ops._
    // three monthly extracts → versions opening in three different
    // vf_month partitions
    def extract(ts: String, rows: Seq[(Long, String)]) =
      rows.toDF("id", "attr").withColumn("snap", to_timestamp(lit(ts)))
    val snaps = extract("2024-01-15 00:00:00", Seq(1L -> "a", 2L -> "b"))
      .unionByName(extract("2024-02-15 00:00:00", Seq(1L -> "a", 2L -> "b2")))
      .unionByName(extract("2024-03-15 00:00:00", Seq(1L -> "a3", 2L -> "b2")))
    val prep = Ops.prepareScd2(snaps, "snap", "id", Seq("attr"))
    val dir = Files.createTempDirectory("graft_scd2_part").toString
    prep.save(dir, partitionHistoryByMonth = true)
    val months = new java.io.File(s"$dir/history").listFiles()
      .count(_.getName.startsWith("vf_month="))
    assert(months == 3, s"expected 3 vf_month partitions, got $months")
    // the as-of read carries a PARTITION filter on vf_month — file
    // pruning at the manifest, the layout the scd2AsOf scaladoc
    // promises at 100 TB
    val asOf = Ops.scd2AsOfRead(spark, dir, "2024-02-20 00:00:00")
    val plan = asOf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("vf_month"),
      s"no vf_month partition filter in the as-of plan:\n${plan.take(2000)}")
    // and only the covered months' partitions are read (Jan + Feb,
    // not Mar) — counted on the scan's SELECTED partitions, the
    // post-pruning set (inputFiles reports the pre-pruning index)
    val selected = asOf.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        (s.selectedPartitions.partitionCount,
          s.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq)
    }
    assert(selected.nonEmpty, "expected a FileSourceScan in the as-of plan")
    val (nParts, files) = selected.head
    assert(nParts == 2, s"expected exactly Jan + Feb partitions, got $nParts: $files")
    assert(files.forall(!_.contains("2024-03")),
      s"March files must be pruned from an as-of-Feb read: $files")
    // correctness: the pruned read ≡ the full-history as-of
    val full = Ops.loadScd2(spark, dir).history.scd2AsOf("2024-02-20 00:00:00")
    assert(asOf.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet,
      "pruned as-of must equal the full-history as-of")
    assert(asOf.count() == 2, "both ids live at 2024-02-20")
    // the partitioned layout round-trips into absorb unchanged
    val grown = Ops.loadScd2(spark, dir)
      .absorb(extract("2024-04-15 00:00:00", Seq(1L -> "a4", 2L -> "b2")))
    val oneShot = Ops.prepareScd2(snaps.unionByName(
      extract("2024-04-15 00:00:00", Seq(1L -> "a4", 2L -> "b2"))),
      "snap", "id", Seq("attr"))
    assert(grown.history.collect().map(_.toSeq).toSet ==
      oneShot.history.collect().map(_.toSeq).toSet,
      "absorb after a partitioned save ≡ one-shot rebuild")
  }
}

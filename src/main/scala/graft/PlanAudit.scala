package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit tool (r13): prints each named gated query's join
  * operators and exchange count so a reviewer can see the physical
  * strategy (broadcast vs sort-merge, where the shuffles are)
  * without scrolling full explain output.
  *
  * Usage: `sbt "runMain graft.PlanAudit <sfDir> [query...]"` —
  * defaults to every Bench.headline query at sf0.001 (plan build
  * only; checkpoint-iterative queries execute their loops, so the
  * default set takes a few minutes).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for (n <- names) {
        try {
          val plan = SparkEntry.queries(n)(spark, sfDir)
            .queryExecution.executedPlan.toString
          val joins = plan.linesIterator
            .filter(_.contains("Join")).map(_.trim.takeWhile(_ != '[').trim)
            .toSeq.groupBy(identity).view.mapValues(_.size).toMap
          val exchanges = plan.linesIterator.count(_.contains("Exchange"))
          val scans = plan.linesIterator.count(_.contains("FileScan"))
          println(s"##AUDIT## $n exchanges=$exchanges scans=$scans joins=" +
            joins.toSeq.sortBy(_._1).map { case (k, c) => s"$k:$c" }.mkString(","))
        } catch {
          case e: Throwable => println(s"##AUDIT## $n ERROR ${e.getMessage.take(120)}")
        }
      }
    } finally spark.stop()
  }
}

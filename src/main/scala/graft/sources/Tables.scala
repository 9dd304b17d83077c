package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Schema-stable loaders for the driver-generated parquet tables.
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown freedom
  * (predicate pushdown, column pruning, partition coalescing via AQE).
  * At cluster scale the same loaders work unchanged against a
  * directory of many files.
  */
final class Tables(val spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; it is read as raw nanos (the `nanosAsLong` legacy
    * flag — set at session construction by GraftSession/Verify/Bench,
    * NOT here: loaders are side-effect-free) and surfaced as a
    * microsecond timestamp column (the generator writes µs precision,
    * so `div 1000` is lossless and matches DuckDB).
    */
  def events: DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession does)")
    table("events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}

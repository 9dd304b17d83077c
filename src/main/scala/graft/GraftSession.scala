package graft

import org.apache.spark.sql.SparkSession

/** Session factory for library users (the driver builds its own
  * session for Verify/Bench; this is the front door everywhere else).
  *
  * Defaults encode the 100 TB posture: AQE on (runtime re-planning,
  * skew-join splitting, partition coalescing), shuffle partitions
  * sized to the actual parallelism instead of the 200 default, UTC
  * session time, and the graft function registry (cosine_sim) loaded.
  */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet ships TIMESTAMP(NANOS); the vectorized reader
      // needs the legacy raw-long mode (Tables.events converts to µs)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Build (or reuse) the session, register graft functions and
    * install the graft optimizer rules (range-join rewrite).
    */
  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    graft.plans.RangeJoinRewrite.install(spark)
    spark
  }
}

package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Public fluent API over the engine's composed operators — the
  * library surface a reference user programs against. Each method is
  * the generalized, parameterized form of the corresponding SURVEY.md
  * §2 operator (q21/q22/q39/topk), shuffle-minimal by construction.
  */
object Ops {

  /** Heavy-hitters aggregate Column (Misra–Gries, bounded memory).
    * Requires GraftFunctions.register(spark) on the session.
    */
  def topkSketch(c: Column, k: Int, cap: Int = 4096): Column =
    call_function("topk_sketch", c, lit(k), lit(cap))

  implicit final class GraftDataFrameOps(private val left: DataFrame) extends AnyVal {

    /** As-of join: for each left row, the most recent right row with
      * rightTime ≤ leftTime and matching key. One shuffle on the key:
      * tag + union + running last_value(ignoreNulls) window. `carry`
      * lists the right-side columns to carry onto left rows.
      */
    def asofJoin(right: DataFrame, key: String, leftTime: String,
                 rightTime: String, carry: Seq[String]): DataFrame = {
      val lCols = left.columns.toSeq
      val tagged = right
        .select((col(key).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__tag") +:
          (carry.map(c => col(c).as(s"__r_$c")) ++
            lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)))): _*)
        .unionByName(left
          .select((col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__tag") +:
            (carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
              lCols.map(col))): _*))
      val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      carry.foldLeft(tagged) { (df, c) =>
          df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
        }
        .filter(col("__tag") === 1)
        .select((lCols.map(col) ++ carry.map(c => col(s"__r_$c").as(c))): _*)
    }

    /** Gap-based sessionization: adds `session_id` (1-based per key). */
    def sessionized(key: String, time: String, gap: Column): DataFrame = {
      val w  = Window.partitionBy(col(key)).orderBy(col(time))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col(time), 1).over(w)
      val brk = when(prev.isNull, 1)
        .when(col(time).cast("long") - prev.cast("long") > gap.cast("long"), 1)
        .otherwise(0)
      left.withColumn("session_id", sum(brk).over(wc).cast("int"))
    }

    /** Range join on |leftTime - rightTime| <= tolerance (no equi
      * key): bucket both sides to the tolerance width, explode the
      * right side into its 3 candidate buckets, hash-join, refine.
      */
    def rangeJoin(right: DataFrame, leftTime: String, rightTime: String,
                  toleranceUs: Long): DataFrame = {
      val lb = left.withColumn("__b", expr(s"unix_micros($leftTime) div $toleranceUs"))
      val rb = right.withColumn("__b", explode(array(
        expr(s"unix_micros($rightTime) div $toleranceUs") - 1,
        expr(s"unix_micros($rightTime) div $toleranceUs"),
        expr(s"unix_micros($rightTime) div $toleranceUs") + 1)))
      lb.join(rb, Seq("__b"))
        .filter(abs(expr(s"unix_micros($leftTime) - unix_micros($rightTime)")) <= toleranceUs)
        .drop("__b")
    }

    /** Skew-safe aggregation: pre-aggregate on (key, salt) to spread a
      * hot key over `buckets` reducers, then combine. Two shuffles,
      * but the first is uniform — the pattern for power-law keys.
      */
    def saltedCount(key: String, buckets: Int): DataFrame =
      left
        .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
        .groupBy(col(key), col("__salt"))
        .agg(count(lit(1)).as("__partial"))
        .groupBy(col(key))
        .agg(sum(col("__partial")).as("cnt"))
  }
}

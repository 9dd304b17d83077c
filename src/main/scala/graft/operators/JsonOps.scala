package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Portable._

/** Semi-structured (JSON) operators — the Spark-native re-expression
  * of the reference's JSON handling (Anglerfish `data/json/
  * JsonFAlgebras.scala`, `data/json/JsonData.scala`): decode, extract,
  * construct and re-decode JSON, and flatten nested collections, all
  * as codegen'd Catalyst expressions (no UDFs).
  */
object JsonOps {

  /** q24: JSON field extraction + typed aggregation over events.props. */
  def q24(t: Tables): DataFrame =
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** q25: construct JSON from a struct, then decode it back (roundtrip
    * — output depends only on the decoded values, not the encoder's
    * formatting).
    */
  def q25(t: Tables): DataFrame =
    t.events
      .withColumn("j", to_json(struct(col("user_id"), col("event_type"))))
      .withColumn("et", get_json_object(col("j"), "$.event_type"))
      .withColumn("uid", get_json_object(col("j"), "$.user_id").cast("long"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"), countDistinct(col("uid")).as("n_users"))
      .orderBy(col("et"))

  /** q52: map-typed column roundtrip — build a per-user
    * event_type→count map (map_from_entries over collected structs),
    * then explode it back to rows. Collection order inside the map is
    * nondeterministic, so determinism comes from the post-explode sort
    * — the pattern for any map-valued column in a verified pipeline.
    */
  def q52(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n")))).as("m"))
      .select(col("user_id"), explode(col("m")))
      .select(col("user_id"), col("key").as("event_type"), col("value").as("n"))
      .filter(col("user_id") < 50)
      .orderBy(col("user_id"), col("event_type"))

  /** q26: nested-array handling — split, explode, aggregate (top-k
    * corpus tokens). explode is Spark's generator path (codegen'd).
    */
  def q26(t: Tables): DataFrame =
    t.documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)
}

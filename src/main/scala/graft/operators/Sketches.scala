package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable **sketch tables** — the 100 TB pattern for distinct
  * counts and frequency queries: pre-aggregate each partition/day/
  * shard into a constant-size sketch column ONCE, persist it, then
  * answer cross-shard queries by merging sketches (bytes, not rows).
  * A year of 100 TB days becomes 365 sketch rows per key; the raw
  * data is never re-scanned.
  *
  * Built on Spark's native Datasketches HLL expressions
  * (`hll_sketch_agg` / `hll_union_agg` — codegen'd, mergeable,
  * bounded-size), the same algebraic-aggregate design as
  * [[graft.functions.TopKSketch]].
  */
object Sketches {

  /** Per-shard sketch table: one HLL sketch of `col` per (shard key)
    * row. This is the write-side of the pattern — run it per
    * ingest batch and append to the sketch table.
    */
  def hllShardSketches(df: DataFrame, shardCol: String, valueCol: String,
                       lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(shardCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("hll_sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge-side: distinct estimate across any subset of shards
    * WITHOUT touching raw data — union the sketch bytes, estimate.
    */
  def hllMergedDistinct(sketches: DataFrame): DataFrame =
    sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_sketch"))).as("distinct_estimate"),
        sum(col("n_rows")).as("n_rows"))

  /** Demo over the events table: per-event-type user sketches, then
    * the global distinct-users estimate from the sketches alone.
    */
  def eventUserSketches(t: Tables): DataFrame =
    hllShardSketches(t.events, "event_type", "user_id")

  /** The PORTABLE-register sibling of the byte sketches
    * ([[graft.api.Ops.hllRegisters]]): the sketch is a (shard,
    * bucket, register) frame instead of opaque bytes, so it is
    * engine-reproducible (the q43 oracle discipline), absorbs new
    * shards by max-merge with ZERO additional error (merge(reg(A),
    * reg(B)) ≡ reg(A ∪ B) exactly — spec-pinned as equality), and
    * estimates through the same portable formula q43 verifies against
    * DuckDB every round.
    */
  def portableShardSketches(df: DataFrame, shardCol: String, valueCol: String,
                            p: Int = 12): DataFrame =
    graft.api.Ops.hllRegisters(df, Seq(shardCol), col(valueCol), p)

  /** Cross-shard distinct estimate from portable register tables
    * alone — collapse the shard key, max-merge, estimate.
    */
  def portableMergedDistinct(sketches: DataFrame, p: Int = 12): DataFrame =
    graft.api.Ops.hllEstimateFromRegisters(
      sketches.groupBy(col("__bkt")).agg(max(col("__reg")).as("__reg")),
      Seq.empty, "distinct_estimate", p)
}

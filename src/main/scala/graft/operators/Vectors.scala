package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Vector/embedding aggregation operators (SURVEY.md §2 q42/q43).
  *
  * q42 computes per-label mean embeddings (centroids — the training
  * step of IVF/k-means-style ANN indexes) with the scalable shape:
  * posexplode to (label, dim, value) → per-(label, dim) partial-agg
  * sum/count → re-assemble the vector with a sorted collect. The
  * shuffle key (label, dim) is high-cardinality and uniform, so this
  * parallelizes across the cluster no matter how hot one label is —
  * the alternative (collect vectors per label and average on one
  * node) dies on skew.
  */
object Vectors {

  /** q42: per-label centroid of the embedding vectors (rounded for
    * engine-portable float math; see SURVEY.md §3).
    */
  def q42(t: Tables): DataFrame =
    t.embeddings
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col")) / count(col("col"))).as("dim_mean"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("dim_mean")))),
        s => round(s("dim_mean"), 3)).as("centroid"),
        count(lit(1)).as("n_dims"))
      .orderBy(col("label"))

  /** q43: HyperLogLog approximate distinct counts (Spark-native HLL++;
    * rows-only — DuckDB's approx algorithm differs — with the spec
    * asserting <5% relative error vs exact).
    */
  def q43(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
}

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

  /** q42: per-label centroid of the embedding vectors.
    *
    * Engine-portable math: elements are summed as DECIMAL(27,12) so the
    * partial-agg order can't perturb low bits, the mean is the decimal
    * sum cast to double divided by the count (bit-identical on any
    * engine), and the centroid is serialized to a comma-joined string of
    * fixed-scale DECIMAL(18,3) renderings — the driver's sort+hash
    * compare can't handle array cells, so the verified projection is a
    * deterministic string (see VERDICT.md round 1, "What's wrong" #1).
    */
  def q42(t: Tables): DataFrame =
    t.embeddings
      .select(col("label"), posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast("decimal(27,12)")).cast("double") / count(col("col"))).as("dim_mean"))
      .groupBy(col("label"))
      .agg(concat_ws(",", transform(
        array_sort(collect_list(struct(col("pos"), col("dim_mean")))),
        s => s("dim_mean").cast("decimal(18,3)").cast("string"))).as("centroid"),
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

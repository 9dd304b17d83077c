package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Similarity search over the embeddings table (SURVEY.md §2 q35/q36).
  *
  * q35 is the exact baseline: broadcast the (small) query set against
  * the full vector corpus — at 100 TB the corpus side stays
  * partitioned and only the query side is broadcast, so the scan
  * streams with no shuffle; per-query top-k is a bounded window.
  * q36 is the scale path: IVF — assign every vector to its nearest
  * centroid (map-side against broadcast centroids), then search only
  * the query's cell.
  *
  * The inner loop is the native codegen'd CosineSimilarity expression.
  */
object Similarity {

  private def cos(a: String, b: String) =
    call_function("cosine_sim", col(a).cast("array<double>"), col(b).cast("array<double>"))

  /** q35: brute-force cosine top-5 for the first 10 query vectors.
    * (Generalized form: [[graft.api.Ops.GraftDataFrameOps.cosineTopK]].)
    */
  def q35(t: Tables): DataFrame = {
    GraftFunctions.register(t.spark)
    import graft.api.Ops._
    t.embeddings
      .cosineTopK(t.embeddings.filter(col("vec_id") < 10),
        id = "vec_id", emb = "embedding", queryId = "vec_id", queryEmb = "embedding", k = 5)
      .select(col("qid"), col("rank"), col("vid"), round(col("score"), 4).as("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q36: IVF-partitioned ANN — 8 fixed centroids (vectors 100..107),
    * cell = argmax-cosine centroid, search within the query's cell.
    * Rows-only (no SQL oracle); SimilaritySpec measures recall vs q35.
    */
  def q36(t: Tables): DataFrame = {
    GraftFunctions.register(t.spark)
    val centroids = t.embeddings
      .filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_score").desc, col("centroid_id"))
    val assigned = t.embeddings
      .join(broadcast(centroids))
      .withColumn("c_score", cos("embedding", "cent_emb"))
      .withColumn("crn", row_number().over(assignW))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("cell"))

    // queries probe their TWO nearest cells (nprobe=2) — the standard
    // IVF recall lever; candidates stay in their single home cell.
    val probeW = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_score").desc, col("centroid_id"))
    val q = t.embeddings.filter(col("vec_id") < 10)
      .join(broadcast(centroids))
      .withColumn("c_score", cos("embedding", "cent_emb"))
      .withColumn("crn", row_number().over(probeW))
      .filter(col("crn") <= 2)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
        col("centroid_id").as("cell"))
    val c = assigned
      .select(col("vec_id").as("vid"), col("embedding").as("c_emb"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vid"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("score", cos("q_emb", "c_emb"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vid"), round(col("score"), 4).as("score"))
      .orderBy(col("qid"), col("rank"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.util.Portable

/** Trainable text-quality classifier — the fastText-shaped quality
  * gate real curation pipelines run (labels from a seed set of
  * good/bad documents, a linear model over hashed bag-of-words
  * features, scores applied corpus-wide). Logistic regression by
  * full-batch gradient descent, expressed entirely as DataFrame
  * joins/aggregations:
  *
  *   - features: token → `portableHash64 mod dim` hashed index, tf/n
  *     value, plus a bias feature at index -1 — an EXPLODED sparse
  *     frame (doc, idx, x), never a dense dim-sized vector.
  *   - weights: a FRAME (idx, w), absent rows meaning 0 — at 2^18+
  *     dims a literal/broadcast dense vector would not survive a
  *     100 TB corpus's driver, and a vocab-sized frame joins on idx
  *     exactly like q48's df table (AQE broadcasts it only when it
  *     is genuinely small).
  *   - one iteration = margins (features ⋈ weights on idx, groupBy
  *     doc) → residuals (sigmoid(z) − y) → gradient (residuals ⋈
  *     features on doc, groupBy idx) → weight update (full-outer
  *     join on idx). Two key-partitioned shuffles per iteration,
  *     nothing doc×vocab, nothing collected to the driver.
  *
  * Determinism: every aggregation sums `decimal(27,12)`-cast terms
  * (exact, order-independent — the kmeansCentroids rule), so
  * training is bit-reproducible under any partitioning; the spec
  * asserts exact equality across repartitions.
  */
object Classifier {

  private def features(df: DataFrame, id: String, text: String, dim: Int) = {
    val toks = df
      .select(col(id).as("__doc"), tokens(col(text)).as("__toks"))
      .withColumn("__n", greatest(size(col("__toks")), lit(1)))
    toks
      .select(col("__doc"), col("__n"), explode(col("__toks")).as("__tok"))
      .groupBy(col("__doc"), col("__n"),
        pmod(Portable.portableHash64(col("__tok")), lit(dim.toLong)).as("__idx"))
      .agg(count(lit(1)).as("__tf"))
      .select(col("__doc"), col("__idx"),
        (col("__tf").cast("double") / col("__n").cast("double")).as("__x"))
      .unionByName(toks.select(col("__doc"), lit(-1L).as("__idx"), lit(1.0).as("__x")))
  }

  /** Train; returns the weights frame (idx, weight) with idx = -1 the
    * bias. `labeled` needs (id, text, label∈{0,1}).
    */
  def trainTextClassifier(labeled: DataFrame, id: String, text: String,
                          label: String, dim: Int = 1 << 18,
                          iters: Int = 10, lr: Double = 0.5,
                          checkpointDir: Option[String] = None): DataFrame = {
    require(dim > 0 && iters > 0 && lr > 0, s"dim=$dim iters=$iters lr=$lr must be positive")
    val ckp = graft.api.Ops.lineageBreaker(checkpointDir)
    val feats = ckp(features(labeled, id, text, dim))
    val ys = ckp(labeled.select(col(id).as("__doc"),
      col(label).cast("double").as("__y")))
    val n = labeled.count().toDouble
    val spark = labeled.sparkSession
    import spark.implicits._
    var weights = Seq.empty[(Long, Double)].toDF("__idx", "__w")
    for (_ <- 1 to iters) {
      val margins = feats
        .join(weights, Seq("__idx"), "left")
        .groupBy(col("__doc"))
        .agg(sum((col("__x") * coalesce(col("__w"), lit(0.0)))
          .cast("decimal(27,12)")).cast("double").as("__z"))
      val resid = margins.join(ys, Seq("__doc"))
        .select(col("__doc"),
          (lit(1.0) / (lit(1.0) + exp(-col("__z"))) - col("__y")).as("__r"))
      val grad = feats.join(resid, Seq("__doc"))
        .groupBy(col("__idx"))
        .agg((sum((col("__x") * col("__r")).cast("decimal(27,12)")).cast("double")
          / lit(n)).as("__g"))
      weights = ckp(weights
        .join(grad, Seq("__idx"), "full_outer")
        .select(col("__idx"),
          (coalesce(col("__w"), lit(0.0)) -
            lit(lr) * coalesce(col("__g"), lit(0.0))).as("__w")))
    }
    weights.select(col("__idx").as("idx"), col("__w").as("weight"))
  }

  /** Score: P(label=1) per document under the trained weights — the
    * same featurization, one join on idx, one groupBy doc. Returns
    * (id, score).
    */
  def scoreTextClassifier(docs: DataFrame, weights: DataFrame,
                          id: String, text: String,
                          dim: Int = 1 << 18): DataFrame =
    features(docs, id, text, dim)
      .join(weights.select(col("idx").as("__idx"), col("weight").as("__w")),
        Seq("__idx"), "left")
      .groupBy(col("__doc"))
      .agg(sum((col("__x") * coalesce(col("__w"), lit(0.0)))
        .cast("decimal(27,12)")).cast("double").as("__z"))
      .select(col("__doc").as(id),
        (lit(1.0) / (lit(1.0) + exp(-col("__z")))).as("score"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    val centroids = t.embeddings
      .filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    ivfTopK(t.embeddings, t.embeddings.filter(col("vec_id") < 10), centroids,
      id = "vec_id", emb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb", k = 5, nprobe = 2)
      .select(col("qid"), col("rank"), col("vid"), round(col("score"), 4).as("score"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Generalized IVF top-k search over ANY centroid set — composes
    * with [[Vectors.kmeansCentroids]] (train the quantizer, then
    * search its cells). Scale shape:
    *
    *  - **cell assignment follows k** (the semanticDedup pattern): at
    *    or below `maxLiteralCentroids` the centroids are collected
    *    (k × dim doubles — driver-tiny) and embedded as a literal
    *    array, so the per-row nearest-cells ranking is a codegen'd
    *    sort over k structs — no join, no shuffle, for both the
    *    corpus and the query side; ABOVE it (the k ∝ N quantizer
    *    regime) a 10⁵-cell literal would make the plan itself the
    *    bottleneck, so the centroids collapse to ONE row holding the
    *    (cid, ce) struct array, broadcast keyless onto both sides
    *    (the q48/q83 1-row-NLJ shape) and ranked by the SAME
    *    sort_array fold — identical per-row compute, centroid-free
    *    plan, no aggregation or extra shuffle. Both paths use the
    *    same (negscore, cid) ordering, so cell assignment is
    *    bit-identical (spec-pinned). Past ~10⁵ cells × large dim the
    *    array row approaches broadcast limits: go two-level
    *    (coarse literal + per-cell fine);
    *  - candidates live in their 1 home cell, queries probe their
    *    `nprobe` nearest cells (the standard recall lever);
    *  - the search joins the partitioned corpus against the broadcast
    *    exploded query set on the cell key.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              id: String, emb: String, centroidId: String, centroidEmb: String,
              k: Int = 5, nprobe: Int = 2,
              maxLiteralCentroids: Int = 4096): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val cdf = centroids
      .select(col(centroidId).cast("long").as("cid"),
        col(centroidEmb).cast("array<double>").as("ce"))
    val nCents = cdf.count()
    require(nCents > 0, "ivfTopK: empty centroid set")
    def negscore(embCol: String, ce: Column) =
      lit(-1.0) * call_function("cosine_sim", col(embCol), ce)
    // per-row cell ranking: (−score, cid) ordering — ties break on
    // the lower centroid id, identical in both assignment paths
    def withCells(df: DataFrame, n: Int, outId: String, outEmb: String): DataFrame = {
      val base = df.select(col(id).as(outId), col(emb).cast("array<double>").as(outEmb))
      def rankedOver(cents: Column) = sort_array(transform(cents, ct => struct(
        negscore(outEmb, ct.getField("ce")).as("negscore"),
        ct.getField("cid").as("cid"))))
      def cells(ranked: Column) =
        explode(transform(slice(ranked, 1, n), s => s.getField("cid"))).as("cell")
      if (nCents <= maxLiteralCentroids) {
        val cents = cdf.collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
        val centLit = array(cents.map { case (cid, ce) =>
          struct(lit(cid).as("cid"), array(ce.map(lit): _*).as("ce")) }: _*)
        base.withColumn("cell", cells(rankedOver(centLit)))
      } else {
        val centsArr = cdf.agg(collect_list(struct(col("cid"), col("ce"))).as("__cents"))
        base.join(broadcast(centsArr))
          .withColumn("cell", cells(rankedOver(col("__cents"))))
          .drop("__cents")
      }
    }
    val c = withCells(corpus, 1, "vid", "c_emb")
    val q = withCells(queries, nprobe, "qid", "q_emb")
    searchCells(c, q, k)
  }

  /** The shared search tail: join the partitioned, cell-assigned
    * corpus against the broadcast cell-assigned query set, exact
    * cosine within matched cells, per-query top-k window.
    */
  private def searchCells(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vid"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("score", call_function("cosine_sim", col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vid"), col("score"))
  }

  /** Two-level (coarse/fine) IVF top-k — the quantizer regime PAST
    * what a single centroid table can serve (~10⁵ fine cells × large
    * dim approaches broadcast limits, and the per-row O(k·dim) fold
    * dominates): route every vector through ~√k COARSE cells first,
    * then rank only the fine centroids OF that coarse cell. Per-row
    * assignment cost drops from O(k·dim) to O((√k + k/√k)·dim) — at
    * k=10⁵ that is ~300× less work — and no structure larger than the
    * grouped fine-centroid arrays (k·dim total, hash-partitioned by
    * coarse cell in a broadcast table) ever ships.
    *
    * Train `coarse` with [[Vectors.kmeansCentroids]] over the FINE
    * centroid set (or any fixed √k-sized quantizer). Plan shape:
    *
    *  - fine → coarse assignment: literal fold over the coarse array
    *    (coarse must fit the literal budget — it is √k by design);
    *  - per-coarse-cell fine arrays: one groupBy(√k cells) collect;
    *  - corpus: coarse literal fold (map-side) → broadcast HASH join
    *    on the coarse cell (equi key, not NLJ) → fold over that
    *    cell's fine array — joined rows are consumed by the
    *    projection in place, nothing aggregates, nothing sorts;
    *  - queries (small by contract): explode `coarseProbe` coarse
    *    cells, rank all fine candidates in a per-qid window, keep
    *    `nprobe` fine cells; the search tail is [[ivfTopK]]'s.
    *
    * APPROXIMATE in the standard IVF sense: corpus and queries use
    * the SAME two-level assignment function, so cells are consistent;
    * recall loss comes only from coarse routing (a query's true
    * nearest fine cell can live in an unprobed coarse cell — raise
    * `coarseProbe`/`nprobe` to trade time for recall). With coarse =
    * fine and coarseProbe ≥ nprobe the routing is exact and the
    * result EQUALS single-level [[ivfTopK]] (spec-pinned).
    * Deterministic: every fold ranks by (−score, id) like the whole
    * engine.
    */
  def ivfTopKTwoLevel(corpus: DataFrame, queries: DataFrame,
                      fine: DataFrame, coarse: DataFrame,
                      id: String, emb: String,
                      centroidId: String, centroidEmb: String,
                      coarseId: String, coarseEmb: String,
                      k: Int = 5, nprobe: Int = 2, coarseProbe: Int = 2,
                      maxLiteralCentroids: Int = 4096): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val coarseCents = coarse
      .select(col(coarseId).cast("long").as("gcid"),
        col(coarseEmb).cast("array<double>").as("gce"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    require(coarseCents.nonEmpty, "ivfTopKTwoLevel: empty coarse set")
    require(coarseCents.length <= maxLiteralCentroids,
      s"ivfTopKTwoLevel: ${coarseCents.length} coarse cells exceed the literal " +
        s"budget ($maxLiteralCentroids) — the coarse level should be ~sqrt(k); " +
        "train fewer coarse cells (or nest another level)")
    val coarseLit = array(coarseCents.map { case (gcid, gce) =>
      struct(lit(gcid).as("gcid"), array(gce.map(lit): _*).as("gce")) }: _*)
    // ranked coarse cells for an embedding column: (−score, gcid) asc
    def coarseRanked(embCol: String) = sort_array(transform(coarseLit, ct => struct(
      (lit(-1.0) * call_function("cosine_sim", col(embCol), ct.getField("gce"))).as("negscore"),
      ct.getField("gcid").as("gcid"))))
    // fine centroids grouped by their home coarse cell — the broadcast
    // routing table: √k rows, each holding that cell's (cid, ce) array
    val fineCells = fine
      .select(col(centroidId).cast("long").as("cid"),
        col(centroidEmb).cast("array<double>").as("ce"))
      .withColumn("gcell", element_at(coarseRanked("ce"), 1).getField("gcid"))
      .groupBy(col("gcell"))
      .agg(collect_list(struct(col("cid"), col("ce"))).as("__fines"))
    // rank a row's fine candidates within one joined coarse cell
    def fineRanked(embCol: String) = sort_array(transform(col("__fines"), ct => struct(
      (lit(-1.0) * call_function("cosine_sim", col(embCol), ct.getField("ce"))).as("negscore"),
      ct.getField("cid").as("cid"))))
    // corpus: home coarse cell → hash join its fine array → home fine cell
    val c = corpus
      .select(col(id).as("vid"), col(emb).cast("array<double>").as("c_emb"))
      .withColumn("gcell", element_at(coarseRanked("c_emb"), 1).getField("gcid"))
      .join(broadcast(fineCells), Seq("gcell"))
      .withColumn("cell", element_at(fineRanked("c_emb"), 1).getField("cid"))
      .select(col("vid"), col("c_emb"), col("cell"))
    // queries: probe coarseProbe coarse cells, rank ALL their fine
    // candidates per query, keep the nprobe best fine cells
    val qw = Window.partitionBy(col("qid")).orderBy(col("negscore"), col("cell"))
    val q = queries
      .select(col(id).as("qid"), col(emb).cast("array<double>").as("q_emb"))
      .withColumn("gcell",
        explode(transform(slice(coarseRanked("q_emb"), 1, coarseProbe), s => s.getField("gcid"))))
      .join(broadcast(fineCells), Seq("gcell"))
      .select(col("qid"), col("q_emb"),
        explode(fineRanked("q_emb")).as("__f"))
      .select(col("qid"), col("q_emb"),
        col("__f").getField("negscore").as("negscore"), col("__f").getField("cid").as("cell"))
      .withColumn("__r", row_number().over(qw))
      .filter(col("__r") <= nprobe)
      .select(col("qid"), col("q_emb"), col("cell"))
    searchCells(c, q, k)
  }

  /** q91: product-quantized ADC search
    * ([[graft.api.Ops.GraftDataFrameOps.pqTopK]]) — the first 5
    * vectors query the full corpus through its 8-byte PQ codes
    * (64 floats → 8 codes, 32×). The codebooks are seeded-md5 grid
    * vectors and every distance a sequential fold, so the oracle
    * regenerates codebooks, encodes the corpus, builds each query's
    * distance table and replays the ADC ranking bit-for-bit in SQL;
    * PqSpec holds the recall-vs-exact line.
    */
  def q91(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.embeddings
      .pqTopK(t.embeddings.filter(col("vec_id") < 5),
        queryId = "vec_id", queryEmb = "embedding",
        id = "vec_id", emb = "embedding", dim = 64, m = 8, ks = 16, k = 10)
      .select(col("qid"), col("rank"), col("vid"), round(col("adc_dist"), 4).as("adc_dist"))
      .orderBy(col("qid"), col("rank"))
  }
}

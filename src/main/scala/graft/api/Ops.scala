package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Hyperplanes
import graft.functions.TextFunctions._

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

  /** Benford's-law expected first-digit proportions `log₁₀(1+1/d)`,
    * d = 1..9 — computed ONCE here and shared by
    * [[GraftDataFrameOps.benfordDigits]] (as column literals) and the
    * q136 oracle SQL (as 17-significant-digit literals, the q43
    * double-embedding discipline) so both engines compare the
    * IDENTICAL doubles.
    */
  val benfordExpected: IndexedSeq[Double] =
    (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** Default per-group row ceiling for the EXACT order-statistic
    * family ([[GraftDataFrameOps.winsorize]] /
    * [[GraftDataFrameOps.madOutliers]] /
    * [[GraftDataFrameOps.abcClassify]]) — r13, VERDICT r12 next #7.
    * These operators rank-select within a group-partitioned window
    * sort, so ONE task sorts each group; a handful of coarse groups
    * over a 100 TB corpus concentrates the whole sort on a handful
    * of reducers (the stated q125 limit). 10M rows ≈ the practical
    * single-task sort ceiling. The guard is an EXECUTION-TIME
    * `raise_error` riding the group-count window the operators
    * already compute — zero extra passes, zero cost when groups are
    * sane — and callers acknowledging a coarse grouping pass
    * `allowCoarseGroups = true` (or route to the census-bounded
    * [[GraftDataFrameOps.quantileBuckets]] / `portable_quantiles`).
    */
  val MaxExactGroupRows: Long = 10000000L

  /** Gate `expr0` on a group's window-count `n`: past the ceiling
    * the query FAILS with the routing message instead of silently
    * concentrating a corpus-sized sort on one task.
    */
  private def gateCoarseGroups(expr0: Column, n: Column, op: String,
                               allow: Boolean, limit: Long): Column =
    if (allow) expr0
    else when(n <= lit(limit), expr0).otherwise(raise_error(concat(
      lit(s"$op: a single group holds "), n.cast("string"),
      lit(s" rows (> maxExactGroupRows = $limit) — one task must sort it " +
        "all; regroup finer, use quantileBuckets/portable_quantiles, or " +
        "acknowledge with allowCoarseGroups = true"))))

  /** Default distinct-value census ceiling for the whole-frame
    * rank/CDF statistics family ([[ksStatistic]] / [[mannWhitneyU]] /
    * [[kruskalWallis]] / [[spearmanCorr]] / [[weightedMedian]]) —
    * r14, VERDICT r13 missing #1. These operators collapse the corpus
    * to a distinct-VALUE census first, then walk the census through a
    * cumulative window — on a coarse value domain that census is tiny
    * and the window free, but on a NEAR-UNIQUE domain (raw floats,
    * micros) the census ≈ the corpus and the (unpartitioned for the
    * whole-frame forms) window sort concentrates it on one task. The
    * guard is the [[MaxExactGroupRows]] pattern: an execution-time
    * `raise_error` riding the census-count window the operators
    * already compute — zero extra passes — with callers either
    * acknowledging (`allowWideCensus = true`) or routing to the
    * bucketed sketch forms — every guarded operator has one (r15):
    * [[ksStatisticSketch]] / [[weightedMedianSketch]] /
    * [[mannWhitneyUSketch]] / [[kruskalWallisSketch]] /
    * [[spearmanCorrSketch]] (+ the ByGroup variants), all
    * resolution-bounded by construction.
    */
  val MaxExactCensusRows: Long = 10000000L

  /** Gate `expr0` on a census's window-count `n`: past the ceiling
    * the query FAILS with the routing message instead of silently
    * sorting a corpus-sized value census on one task.
    */
  private def gateWideCensus(expr0: Column, n: Column, op: String,
                             allow: Boolean, limit: Long): Column =
    if (allow) expr0
    else when(n <= lit(limit), expr0).otherwise(raise_error(concat(
      lit(s"$op: the distinct-value census holds "), n.cast("string"),
      lit(s" rows (> maxExactCensusRows = $limit) — a near-unique value " +
        "domain makes the census walk corpus-sized; pre-bucket the value " +
        "(the operator's Sketch sibling: ksStatisticSketch/" +
        "mannWhitneyUSketch/kruskalWallisSketch/spearmanCorrSketch/" +
        "weightedMedianSketch, ByGroup variants included, or " +
        "quantileBuckets) or acknowledge with allowWideCensus = true"))))

  /** Per-round lineage break for iterative/self-joining plans: with a
    * `checkpointDir`, reliable `checkpoint` into it (HDFS/S3 on a real
    * cluster — survives executor loss, the right mode for a 100 TB
    * run); without, `localCheckpoint` (executor-local blocks — faster,
    * fine for local mode and short-lived jobs).
    */
  private[graft] def lineageBreaker(checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) => df => {
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      }
      case None => df => df.localCheckpoint(eager = true)
    }

  /** The absorb-guard probe shared by every prepared artifact's id-
    * disjointness check: one left-semi of the existing ids against
    * the increment ids, limited to a single witness row. Deliberately
    * hint-free — absorb models corpus growth, so a BULK increment's
    * id set approaches corpus scale; AQE broadcasts genuinely small
    * increments on its own (the q48 forced-hint rule, VERDICT r11).
    * Exposed `private[graft]` so AbsorbSpec can pin the hint-free
    * plan shape.
    */
  private[graft] def clashProbe(existingIds: DataFrame, incrementIds: DataFrame,
                                id: String): DataFrame =
    existingIds.join(incrementIds, Seq(id), "left_semi").limit(1)

  /** Parallelization floor for expression-heavy map stages (md5
    * shingling, minhash signatures, n-gram hashing): a small input —
    * one or two file partitions at test scale — would run all of that
    * on one core. Round-robin up to the session's default parallelism
    * first; a NO-OP whenever the input is at least that parallel, so
    * a 100 TB scan keeps its layout and pays no extra shuffle (the
    * guard is what makes this safe to apply unconditionally).
    *
    * The probe reads LOGICAL-plan stats, never `df.rdd`: an RDD probe
    * compiles the physical plan once for the probe and again for the
    * real action — double planning, wasteful on a 100 TB tree with
    * thousands of files (VERDICT r4 #4). File relations report their
    * catalog-listed byte size (already cached from `spark.read`), so
    * `bytes / maxPartitionBytes` approximates the scan's partition
    * count with zero extra I/O; unknown-size leaves (checkpoints,
    * RDD-backed plans) report the huge conf default and land on the
    * no-op branch — a big input is never surprise-shuffled.
    */
  private[graft] def floorPartitions(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val perPart = BigInt(spark.sessionState.conf.filesMaxPartitionBytes.max(1L))
    if (bytes / perPart + 1 < par) df.repartition(par) else df
  }

  /** Shared MinHash machinery: normalized-token 3-shingle sets and
    * their LSH band buckets (perms/bands seeded-md5 signatures —
    * engine-portable, recomputable in SQL). Both frames are
    * lineage-broken: shingles feed banding plus every downstream
    * verify join, bands feed the candidate joins. Used by the
    * self-join form ([[GraftDataFrameOps.minhashLshPairs]]) and the
    * two-sided incremental form
    * ([[GraftDataFrameOps.dedupAgainstCatalog]]).
    */
  private[graft] def shingleBands(df: DataFrame, id: String, text: String,
                                  perms: Int, bands: Int,
                                  ckp: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    import graft.functions.TextFunctions._
    val rows = perms / bands
    val sh = ckp(floorPartitions(df.select(col(id), col(text)))
      .withColumn("__toks", tokens(col(text)))
      .select(col(id), shingles3(col("__toks")).as("__s"))
      .filter(size(col("__s")) > 0))
    val banded = ckp(sh
      .withColumn("__hp", minhashPairs(col("__s")))
      .withColumn("__sig", minhashSignature(col("__hp"), perms))
      .select(col(id),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          concat_ws(",", slice(col("__sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket"))
    (sh, banded)
  }

  /** A catalog prepared ONCE for repeated incremental dedup: distinct
    * normalized fingerprints, checkpointed shingle sets, and the LSH
    * banding over them. Batch [[GraftDataFrameOps.dedupAgainstCatalog]]
    * builds it per call; the streaming form
    * ([[graft.streaming.Streams.dedupAgainstCatalogStream]]) builds it
    * at query start and reuses it across every micro-batch — the
    * catalog is scanned once per query lifetime, not once per trigger.
    * `reliable` follows the PreparedLm contract (r12 — the text
    * catalog was the last artifact without the flag): localCheckpoint
    * blocks don't survive executor loss mid-stream, so the streaming
    * entries require a checkpointDir-built or loaded catalog.
    */
  final case class PreparedCatalog private[graft] (
    fingerprints: DataFrame, shingles: DataFrame, bands: DataFrame,
    id: String, perms: Int, lshBands: Int, reliable: Boolean) {
    /** Absorb a catalog increment (doc ids disjoint from the prepared
      * catalog — enforced: a re-submitted id would duplicate its
      * shingle and band rows and silently diverge from the full
      * re-prepare): `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)`
      * row-for-row. Shingle sets and LSH bands are per-doc artifacts
      * (plain union); fingerprints re-distinct across the union (the
      * same normalized text can occur in both halves) — a
      * fingerprint-sized shuffle, never a corpus re-scan.
      */
    def absorb(increment: DataFrame, text: String,
               checkpointDir: Option[String] = None): PreparedCatalog = {
      val ckp = lineageBreaker(checkpointDir)
      import graft.functions.TextFunctions._
      val clash = clashProbe(shingles.select(col(id)).distinct(),
        increment.select(col(id)).distinct(), id).count()
      require(clash == 0L,
        "PreparedCatalog.absorb: increment contains doc ids already in the " +
          "catalog — absorb models catalog growth; re-prepare to replace docs")
      val fpB = increment.select(
        md5(normText(col(text)).cast("binary")).as("__fp")).distinct()
      val (shB, bandB) = shingleBands(increment, id, text, perms, lshBands, ckp)
      PreparedCatalog(
        ckp(fingerprints.unionByName(fpB).distinct()),
        shingles.unionByName(shB), bands.unionByName(bandB),
        id, perms, lshBands, reliable && checkpointDir.isDefined)
    }

    /** Persist the catalog durably ([[ArtifactIO]] layout: the three
      * frames as parquet + a kind-tagged meta table); [[Ops.loadCatalog]]
      * reconstructs an identically-serving artifact.
      */
    def save(path: String): Unit = {
      fingerprints.write.mode("overwrite").parquet(s"$path/fingerprints")
      shingles.write.mode("overwrite").parquet(s"$path/shingles")
      bands.write.mode("overwrite").parquet(s"$path/bands")
      ArtifactIO.writeMeta(fingerprints.sparkSession, path, "catalog",
        Seq("id" -> id, "perms" -> perms.toString, "lshBands" -> lshBands.toString))
    }
  }

  /** Load a [[PreparedCatalog]] persisted by its `save`. Parquet
    * frames are durable, so the loaded catalog serves streams without
    * a checkpointDir; a non-catalog path fails fast by kind.
    */
  def loadCatalog(spark: org.apache.spark.sql.SparkSession, path: String): PreparedCatalog = {
    val m = ArtifactIO.readMeta(spark, path, "catalog")
    def f(k: String) = ArtifactIO.field(m, path, k)
    PreparedCatalog(
      spark.read.parquet(s"$path/fingerprints"),
      spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/bands"),
      f("id"), f("perms").toInt, f("lshBands").toInt, reliable = true)
  }

  /** Build a [[PreparedCatalog]]; `checkpointDir` selects reliable
    * checkpoints (cluster mode) for the cached frames.
    */
  def prepareCatalog(catalog: DataFrame, id: String, text: String,
                     perms: Int = 64, bands: Int = 16,
                     checkpointDir: Option[String] = None): PreparedCatalog = {
    require(perms % bands == 0, s"perms ($perms) must divide into bands ($bands)")
    val ckp = lineageBreaker(checkpointDir)
    import graft.functions.TextFunctions._
    val fp = ckp(catalog.select(
      md5(normText(col(text)).cast("binary")).as("__fp")).distinct())
    val (sh, banded) = shingleBands(catalog, id, text, perms, bands, ckp)
    PreparedCatalog(fp, sh, banded, id, perms, bands, checkpointDir.isDefined)
  }

  /** A bigram LM trained once and reused — the production shape of
    * [[GraftDataFrameOps.lmScore]]: train on a reference corpus,
    * score anything (new batches, a live stream) against it without
    * re-running the census. `bigrams`/`prefixes` are the
    * checkpointed vocab-sized census frames; `vocab` (V) is a single
    * scalar collected at prepare time (one number, not data).
    */
  final case class PreparedLm private[graft] (
    bigrams: DataFrame, prefixes: DataFrame, vocab: Long, addK: Int,
    reliable: Boolean) {
    /** Absorb a corpus increment: `prepare(A).absorb(B)` ≡
      * `prepare(A ∪ B)` — the censuses merge by SUM (vocab-sized
      * shuffle over old census ∪ increment census, never a re-census
      * of A's corpus), prefixes re-derive from the merged bigram
      * census exactly as prepare does, and V recounts over it (one
      * vocab-sized aggregate).
      */
    def absorb(increment: DataFrame, text: String,
               checkpointDir: Option[String] = None): PreparedLm = {
      val ckp = lineageBreaker(checkpointDir)
      val bgB = bigramStream(floorPartitions(increment.select(col(text))), Seq.empty, text)
      val c2B = bgB.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c2"))
      val c2 = ckp(bigrams.unionByName(c2B)
        .groupBy(col("__w1"), col("__w2")).agg(sum(col("__c2")).as("__c2")))
      val c1 = ckp(c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1")))
      val v = c2.select(countDistinct(col("__w2"))).collect()(0).getLong(0)
      PreparedLm(c2, c1, v, addK, reliable && checkpointDir.isDefined)
    }

    /** Persist the LM durably (census frames as parquet + kind-tagged
      * meta); [[Ops.loadLm]] reconstructs an identically-scoring LM
      * that is `reliable` by construction (parquet outlives both
      * executors and the driver session).
      */
    def save(path: String): Unit = {
      bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
      prefixes.write.mode("overwrite").parquet(s"$path/prefixes")
      ArtifactIO.writeMeta(bigrams.sparkSession, path, "lm",
        Seq("vocab" -> vocab.toString, "addK" -> addK.toString))
    }
  }

  /** Load a [[PreparedLm]] persisted by its `save`; fails fast on a
    * non-lm path.
    */
  def loadLm(spark: org.apache.spark.sql.SparkSession, path: String): PreparedLm = {
    val m = ArtifactIO.readMeta(spark, path, "lm")
    def f(k: String) = ArtifactIO.field(m, path, k)
    PreparedLm(
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/prefixes"),
      f("vocab").toLong, f("addK").toInt, reliable = true)
  }

  /** A Kneser–Ney bigram LM trained once and reused — the production
    * shape of [[GraftDataFrameOps.knLmScore]], mirroring
    * [[PreparedLm]]: the model is the bigram census plus the derived
    * prefix/continuation tables and three count-of-count scalars
    * (nt, n1, n2 — D re-derives from them on every absorb). Scoring
    * the TRAINING corpus against the artifact reproduces `knLmScore`
    * bit-for-bit (spec-pinned: the hit-path expressions are the same
    * op chains). OOV handling on NEW text, documented: an unseen
    * PAIR of seen words takes the discounted-interpolation formula
    * with c₂ = 0; an unseen PREFIX backs off to the continuation
    * probability alone; an unseen CONTINUATION word takes the floor
    * `1/(nt+1)` — so out-of-distribution text degrades to maximal
    * perplexity instead of undefined ln 0.
    */
  final case class PreparedKnLm private[graft] (
    bigrams: DataFrame, prefixes: DataFrame, conts: DataFrame,
    nt: Long, n1: Long, n2: Long, reliable: Boolean) {

    private[graft] def discount: Double =
      if (n1 + 2 * n2 > 0) n1.toDouble / (n1 + 2 * n2).toDouble else 0.5

    /** Absorb a corpus increment: the bigram censuses merge by SUM,
      * everything else re-derives exactly as prepare does —
      * `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)` (vocab-sized jobs,
      * never a re-census of A's corpus).
      */
    def absorb(increment: DataFrame, text: String,
               checkpointDir: Option[String] = None): PreparedKnLm = {
      val ckp = lineageBreaker(checkpointDir)
      val bgB = bigramStream(floorPartitions(increment.select(col(text))), Seq.empty, text)
      val c2B = bgB.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c2"))
      val c2 = ckp(bigrams.unionByName(c2B)
        .groupBy(col("__w1"), col("__w2")).agg(sum(col("__c2")).as("__c2")))
      knDerive(c2, ckp, checkpointDir.isDefined && reliable)
    }

    /** Persist durably (three census frames + kind-tagged meta). */
    def save(path: String): Unit = {
      bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
      prefixes.write.mode("overwrite").parquet(s"$path/prefixes")
      conts.write.mode("overwrite").parquet(s"$path/conts")
      ArtifactIO.writeMeta(bigrams.sparkSession, path, "knlm",
        Seq("nt" -> nt.toString, "n1" -> n1.toString, "n2" -> n2.toString))
    }
  }

  /** Derive prefix/continuation tables and count-of-count scalars
    * from a merged bigram census — the ONE place shared by prepare
    * and absorb.
    */
  private def knDerive(c2: DataFrame, ckp: DataFrame => DataFrame,
                       reliable: Boolean): PreparedKnLm = {
    val c1 = ckp(c2.groupBy(col("__w1"))
      .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__n1p")))
    val nc = ckp(c2.groupBy(col("__w2")).agg(count(lit(1)).as("__nc")))
    val sc = c2.agg(count(lit(1)),
      sum(when(col("__c2") === 1, 1L).otherwise(0L)),
      sum(when(col("__c2") === 2, 1L).otherwise(0L))).collect()(0)
    PreparedKnLm(c2, c1, nc, sc.getLong(0), sc.getLong(1), sc.getLong(2),
      reliable)
  }

  /** Build a [[PreparedKnLm]] from a reference corpus (same censuses
    * as `knLmScore`; `checkpointDir` reliability contract as
    * [[prepareLm]]).
    */
  def prepareKnLm(corpus: DataFrame, text: String,
                  checkpointDir: Option[String] = None): PreparedKnLm = {
    val ckp = lineageBreaker(checkpointDir)
    val bg = bigramStream(floorPartitions(corpus.select(col(text))), Seq.empty, text)
    val c2 = ckp(bg.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c2")))
    knDerive(c2, ckp, checkpointDir.isDefined)
  }

  /** Load a [[PreparedKnLm]] persisted by its `save`. */
  def loadKnLm(spark: org.apache.spark.sql.SparkSession, path: String): PreparedKnLm = {
    val m = ArtifactIO.readMeta(spark, path, "knlm")
    def f(k: String) = ArtifactIO.field(m, path, k)
    PreparedKnLm(
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/prefixes"),
      spark.read.parquet(s"$path/conts"),
      f("nt").toLong, f("n1").toLong, f("n2").toLong, reliable = true)
  }

  /** Score docs against a prepared KN LM — the shared core of the
    * fluent form and the streaming foreachBatch form. Hit-path
    * expressions match [[GraftDataFrameOps.knLmScore]] op-for-op
    * (bit-equal on the training corpus); OOV paths per the
    * [[PreparedKnLm]] doc.
    */
  private[graft] def scoreAgainstKnLm(docs: DataFrame, id: String, text: String,
                                      kn: PreparedKnLm): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val bg = bigramStream(floorPartitions(docs.select(col(id), col(text))),
      Seq(col(id)), text)
    val d = lit(kn.discount)
    val ntD = lit(kn.nt).cast("double")
    val pc = when(col("__nc").isNotNull,
      col("__nc").cast("double") / ntD)
      .otherwise(lit(1.0) / (ntD + lit(1.0)))
    val term1 = greatest(coalesce(col("__c2"), lit(0L)).cast("double") - d, lit(0.0)) /
      col("__c1").cast("double")
    val lam = d * col("__n1p").cast("double") / col("__c1").cast("double")
    val p = when(col("__c1").isNotNull, term1 + lam * pc).otherwise(pc)
    bg.join(kn.bigrams, Seq("__w1", "__w2"), "left")
      .join(kn.prefixes, Seq("__w1"), "left")
      .join(kn.conts, Seq("__w2"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(log(p), 12).cast(DecimalType(38, 12))).as("__s"))
      .withColumn("avg_logp", round(
        col("__s").cast("double") / col("n_bigrams").cast("double"), 4))
      .withColumn("ppl", round(exp(-col("avg_logp")), 2))
      .select(col(id), col("n_bigrams"), col("avg_logp"), col("ppl"))
  }

  /** The DSIR bucket distributions trained once and reused — the
    * production shape of [[GraftDataFrameOps.dsirSelect]]: the target
    * and raw hashed-ngram profiles are two `buckets`-row round-12
    * log-prob tables (broadcast-sized by contract), frozen so any
    * batch or stream scores against them without re-censusing either
    * corpus. Selecting from the SAME raw corpus the artifact was
    * prepared on reproduces `dsirSelect` bit-for-bit (shared code).
    */
  final case class PreparedDsir private[graft] (
    lnpTarget: DataFrame, lnpRaw: DataFrame, buckets: Int, seed: Long,
    reliable: Boolean) {
    /** Persist durably (both profile tables + kind-tagged meta). */
    def save(path: String): Unit = {
      lnpTarget.write.mode("overwrite").parquet(s"$path/lnp_target")
      lnpRaw.write.mode("overwrite").parquet(s"$path/lnp_raw")
      ArtifactIO.writeMeta(lnpTarget.sparkSession, path, "dsir",
        Seq("buckets" -> buckets.toString, "seed" -> seed.toString))
    }
  }

  /** (docId?, bucket, cnt): hashed unigram + bigram bucket counts —
    * the DSIR feature census, shared by prepare and score.
    */
  private[graft] def dsirGramBuckets(df: DataFrame, idCol: Option[String],
                                     text: String, buckets: Int,
                                     seed: Long): DataFrame = {
    val pre = idCol.map(c => Seq(col(c).as("__did"))).getOrElse(Seq.empty)
    val toks = df.select(pre :+
      graft.functions.TextFunctions.tokens(col(text)).as("__t"): _*)
    val keep = idCol.map(_ => Seq(col("__did"))).getOrElse(Seq.empty)
    val uni = toks.select(keep :+ explode(col("__t")).as("__g"): _*)
    val bi = toks.select(keep :+
      explode(zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("__g"): _*)
    val keys = keep :+
      pmod(dsirH28("dsir", seed, col("__g")), lit(buckets.toLong)).as("__b")
    uni.unionByName(bi).groupBy(keys: _*).agg(count(lit(1)).as("__c"))
  }

  private[graft] def dsirH28(tag: String, seed: Long, c: Column): Column =
    conv(substring(md5(concat(lit(s"$tag:$seed:"), c).cast("binary")),
      1, 7), 16, 10).cast("long")

  /** Add-one-smoothed round-12 log-probs over the FULL bucket domain
    * (a `buckets`-row frame — broadcast-sized by contract).
    */
  private def dsirLnp(census: DataFrame, buckets: Int, out: String): DataFrame = {
    val tot = census.agg(sum(col("__c")).as("__tot"))
    census.sparkSession.range(buckets).select(col("id").as("__b"))
      .join(census, Seq("__b"), "left")
      .select(col("__b"), coalesce(col("__c"), lit(0L)).as("__c"))
      .crossJoin(broadcast(tot))
      .select(col("__b"), round(log(
        (col("__c") + 1).cast("double") /
          (coalesce(col("__tot"), lit(0L)) + buckets).cast("double")), 12).as(out))
  }

  /** Build a [[PreparedDsir]] from a target corpus and a raw-corpus
    * reference (the importance denominators must profile the
    * population the weights will score — pass the crawl, or a
    * representative sample of it).
    */
  def prepareDsir(target: DataFrame, raw: DataFrame, text: String,
                  buckets: Int = 1024, seed: Long = 7L,
                  checkpointDir: Option[String] = None): PreparedDsir = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"prepareDsir: buckets ($buckets) must be in 2..2^20")
    val ckp = lineageBreaker(checkpointDir)
    PreparedDsir(
      ckp(dsirLnp(dsirGramBuckets(target, None, text, buckets, seed), buckets, "__lnpt")),
      ckp(dsirLnp(dsirGramBuckets(raw, None, text, buckets, seed), buckets, "__lnpr")),
      buckets, seed, checkpointDir.isDefined)
  }

  /** Load a [[PreparedDsir]] persisted by its `save`. */
  def loadDsir(spark: org.apache.spark.sql.SparkSession, path: String): PreparedDsir = {
    val m = ArtifactIO.readMeta(spark, path, "dsir")
    def f(k: String) = ArtifactIO.field(m, path, k)
    PreparedDsir(
      spark.read.parquet(s"$path/lnp_target"),
      spark.read.parquet(s"$path/lnp_raw"),
      f("buckets").toInt, f("seed").toLong, reliable = true)
  }

  /** Per-doc DSIR weights + seeded Gumbel against a prepared profile
    * pair — unrounded internals, shared by [[GraftDataFrameOps
    * .dsirSelect]] (which tops-k) and [[GraftDataFrameOps
    * .dsirScoreAgainst]] (which emits every doc).
    */
  private[graft] def dsirScore(docs: DataFrame, p: PreparedDsir,
                               id: String, text: String): DataFrame =
    dsirScoreFromCensus(docs, p, id,
      dsirGramBuckets(docs, Some(id), text, p.buckets, p.seed))

  /** [[dsirScore]] over a caller-supplied per-document bucket census
    * (r17 optimization round): [[GraftDataFrameOps.dsirSelect]]
    * materializes the census once and derives the raw profile from it
    * too, so the raw corpus pays one gram explode instead of two.
    */
  private[graft] def dsirScoreFromCensus(docs: DataFrame, p: PreparedDsir,
                                         id: String,
                                         docCensus: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docW = docCensus
      .join(broadcast(p.lnpTarget), Seq("__b"))
      .join(broadcast(p.lnpRaw), Seq("__b"))
      .groupBy(col("__did"))
      .agg(sum(col("__c")).as("n_grams"),
        sum(round(col("__c").cast("double") * (col("__lnpt") - col("__lnpr")), 12)
          .cast(DecimalType(38, 12))).as("__lnw"))
    val u = (dsirH28("dsirg", p.seed, col(id).cast("string")).cast("double") + 0.5) /
      lit((1L << 28).toDouble)
    docs.select(col(id)).distinct()
      .join(docW.withColumnRenamed("__did", id), Seq(id), "left")
      .select(col(id), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("__lnw"), lit(0).cast(DecimalType(38, 12))).as("__lnw"))
      .withColumn("__g", -round(log(-round(log(u), 12)), 12))
      .withColumn("__score", col("__lnw").cast("double") + col("__g"))
  }

  private[graft] def bigramStream(df: DataFrame, cols: Seq[Column], text: String) = {
    import graft.functions.TextFunctions._
    val pairs = zip_with(
      slice(col("__toks"), lit(1), size(col("__toks")) - 1),
      slice(col("__toks"), lit(2), size(col("__toks")) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    df.withColumn("__toks", tokens(col(text)))
      .filter(size(col("__toks")) >= 2)
      .select((cols :+ explode(pairs).as("__bg")): _*)
      .select((cols :+ col("__bg.w1").as("__w1") :+ col("__bg.w2").as("__w2")): _*)
  }

  /** Build a [[PreparedLm]] from a reference corpus (same census and
    * smoothing as `lmScore` — scoring the training corpus itself
    * against the prepared LM reproduces `lmScore` bit-for-bit, which
    * the spec asserts).
    *
    * `checkpointDir` decides how long the prepared frames stay valid:
    * the default (`None`) pins them via `localCheckpoint` — executor-
    * local blocks that die with any executor, fine for a batch job
    * that scores right after preparing. A PreparedLm held across a
    * LONG-LIVED job (the [[graft.streaming.Streams.lmScoreStream]]
    * case: one executor loss would fail every later trigger) must be
    * prepared with a reliable `checkpointDir` (HDFS/S3 on a cluster);
    * the streaming entry point enforces this via [[PreparedLm.reliable]]
    * (ADVICE r7).
    */
  def prepareLm(corpus: DataFrame, text: String, addK: Int = 1,
                checkpointDir: Option[String] = None): PreparedLm = {
    require(addK >= 1, "addK must be a positive integer (add-k smoothing)")
    val ckp = lineageBreaker(checkpointDir)
    val bg = bigramStream(floorPartitions(corpus.select(col(text))), Seq.empty, text)
    val c2 = ckp(bg.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c2")))
    val c1 = ckp(c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1")))
    val v = c2.select(countDistinct(col("__w2"))).collect()(0).getLong(0)
    PreparedLm(c2, c1, v, addK, reliable = checkpointDir.isDefined)
  }

  /** Score docs against a prepared LM — the shared core of the batch
    * fluent form and the streaming foreachBatch form. Unseen bigrams
    * and prefixes fall back to the add-k floor (0+k)/(0+k·V) = 1/V,
    * so out-of-distribution text scores ≈ −ln V per bigram — maximal
    * perplexity, exactly what the filter should flag.
    */
  private[graft] def scoreAgainstLm(docs: DataFrame, id: String, text: String,
                                    lm: PreparedLm): DataFrame = {
    val bg = bigramStream(floorPartitions(docs.select(col(id), col(text))),
      Seq(col(id)), text)
    val k = lm.addK.toLong
    val logp = log(
      (coalesce(col("__c2"), lit(0L)) + lit(k)).cast("double") /
        (coalesce(col("__c1"), lit(0L)) + lit(k) * lit(lm.vocab)).cast("double"))
    bg.join(lm.bigrams, Seq("__w1", "__w2"), "left")
      .join(lm.prefixes, Seq("__w1"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(logp), 4).as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 2))
  }

  /** The five exact decimal moment sums + count per group — the
    * shared census behind [[GraftDataFrameOps.regressionByGroup]] and
    * [[PreparedMoments]]. Sums are cast to FIXED wide decimals
    * (38,2)/(38,4) so prepare, absorb-merge and load all carry the
    * same schema (a merge of sums must not silently re-widen).
    */
  private[graft] def momentsOf(df: DataFrame, group: String,
                               x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dx = graft.util.Portable.dec(x)
    val dy = graft.util.Portable.dec(y)
    df.filter(x.isNotNull && y.isNotNull)
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(dx).cast(DecimalType(38, 2)).as("__sx"),
        sum(dy).cast(DecimalType(38, 2)).as("__sy"),
        sum(dx * dx).cast(DecimalType(38, 4)).as("__sxx"),
        sum(dy * dy).cast(DecimalType(38, 4)).as("__syy"),
        sum(dx * dy).cast(DecimalType(38, 4)).as("__sxy"))
  }

  /** The q119 scalar shape over a moments frame: slope / intercept /
    * Pearson r as a FIXED double expression over the exact sums
    * (identical IEEE ops on identical doubles — the q100 discipline),
    * round(6). Degenerate axes yield nulls.
    */
  private[graft] def regressionFromMoments(m: DataFrame): DataFrame = {
    val nD  = col("n").cast("double")
    val sx  = col("__sx").cast("double");  val sy  = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val syy = col("__syy").cast("double")
    val sxy = col("__sxy").cast("double")
    val covN  = nD * sxy - sx * sy // n²·cov(x,y)
    val varXN = nD * sxx - sx * sx // n²·var(x)
    val varYN = nD * syy - sy * sy // n²·var(y)
    m.withColumn("slope", round(when(varXN > 0.0, covN / varXN), 6))
      .withColumn("intercept",
        round(when(varXN > 0.0, (sy - (covN / varXN) * sx) / nD), 6))
      .withColumn("r",
        round(when(varXN > 0.0 && varYN > 0.0, covN / sqrt(varXN * varYN)), 6))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
  }

  /** The (type, hour-of-day) cell census behind
    * [[GraftDataFrameOps.seasonalResiduals]] and [[PreparedSeasonal]]
    * — exact (cents-sum, count) rationals, ≤ types×24 rows.
    */
  private[graft] def seasonalCells(df: DataFrame, typeCol: String,
                                   time: String, value: Column): DataFrame =
    df.filter(value.isNotNull)
      .withColumn("__sr_h", hour(col(time)).cast("long"))
      .withColumn("__sr_c", (graft.util.Portable.dec(value) * 100).cast("long"))
      .groupBy(col(typeCol).as("__sr_t"), col("__sr_h").as("__sr_hh"))
      .agg(sum(col("__sr_c")).as("seasonal_num"), count(lit(1)).as("seasonal_denom"))

  /** Score rows against a cell census: the shared core of the fluent
    * form (inner — every row owns its cell by construction) and the
    * prepared/streaming form (left — a (type, hour) unseen at prepare
    * time yields NULL baseline and residual, observable, never a
    * fabricated score).
    */
  private[graft] def scoreSeasonal(rows: DataFrame, cells: DataFrame,
                                   typeCol: String, time: String, value: Column,
                                   inner: Boolean): DataFrame =
    rows.filter(value.isNotNull)
      .withColumn("__sr_h", hour(col(time)).cast("long"))
      .withColumn("__sr_c", (graft.util.Portable.dec(value) * 100).cast("long"))
      .join(cells, col(typeCol) <=> col("__sr_t") && col("__sr_h") === col("__sr_hh"),
        if (inner) "inner" else "left")
      .withColumn("hour_of_day", col("__sr_h"))
      .withColumn("seasonal_millicents",
        expr("(seasonal_num * 1000) div seasonal_denom"))
      .withColumn("residual_millicents",
        col("__sr_c") * 1000 - col("seasonal_millicents"))
      .drop("__sr_t", "__sr_hh", "__sr_h", "__sr_c")

  /** Seasonal baselines prepared ONCE for serving and incremental
    * maintenance (r12 — the FIFTEENTH prepared artifact, the second
    * whose absorb is lossless by pure algebra after
    * [[PreparedMoments]]): the (type, hour) cell rationals are
    * additive, so `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)`
    * bit-for-bit by cell-sum addition — no corpus rescan, no
    * disjointness contract (observations are unkeyed). `against`
    * scores any frame (or stream trigger) versus the FROZEN cells —
    * a (type, hour) the baseline never saw yields NULL, observable.
    * Merge cost is ≤ types×24 rows.
    */
  final case class PreparedSeasonal private[graft] (
    cells: DataFrame, typeCol: String, reliable: Boolean) {

    /** Add an increment's cell sums; pass the SAME time/value
      * measures prepare used (the absorbVocab discipline).
      */
    def absorb(increment: DataFrame, time: String, value: Column,
               checkpointDir: Option[String] = None): PreparedSeasonal = {
      val ckp = lineageBreaker(checkpointDir)
      val merged = ckp(cells
        .unionByName(seasonalCells(increment, typeCol, time, value))
        .groupBy(col("__sr_t"), col("__sr_hh"))
        .agg(sum(col("seasonal_num")).as("seasonal_num"),
          sum(col("seasonal_denom")).as("seasonal_denom")))
      PreparedSeasonal(merged, typeCol, reliable && checkpointDir.isDefined)
    }

    /** Residuals of `rows` against the frozen baseline. */
    def against(rows: DataFrame, time: String, value: Column): DataFrame =
      scoreSeasonal(rows, cells, typeCol, time, value, inner = false)

    /** Persist durably (one cells frame + kind-tagged meta). */
    def save(path: String): Unit = {
      cells.write.mode("overwrite").parquet(s"$path/cells")
      ArtifactIO.writeMeta(cells.sparkSession, path, "seasonal",
        Seq("typeCol" -> typeCol))
    }
  }

  /** Build a [[PreparedSeasonal]]; `against` the prepare corpus
    * reproduces `seasonalResiduals` row-for-row (shared code, every
    * row owns its cell — spec-pinned).
    */
  def prepareSeasonal(corpus: DataFrame, typeCol: String, time: String,
                      value: Column,
                      checkpointDir: Option[String] = None): PreparedSeasonal = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedSeasonal(ckp(seasonalCells(corpus, typeCol, time, value)),
      typeCol, checkpointDir.isDefined)
  }

  /** Load a [[PreparedSeasonal]] persisted by its `save`. */
  def loadSeasonal(spark: org.apache.spark.sql.SparkSession, path: String): PreparedSeasonal = {
    val m = ArtifactIO.readMeta(spark, path, "seasonal")
    PreparedSeasonal(spark.read.parquet(s"$path/cells"),
      ArtifactIO.field(m, path, "typeCol"), reliable = true)
  }

  /** The grouped-aggregate cell census behind [[PreparedRollup]]:
    * count, exact decimal sum, min, max of `value` per key tuple —
    * every measure associative-mergeable, the precondition for
    * lossless incremental maintenance.
    */
  private[graft] def rollupCells(df: DataFrame, keys: Seq[String],
                                 value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.filter(value.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(graft.util.Portable.dec(value)).cast(DecimalType(38, 2)).as("s"),
        min(value).as("mn"), max(value).as("mx"))
  }

  /** A grouped-aggregate materialized view maintained incrementally
    * (r12 — the warehouse "incremental MV" primitive: refresh a
    * nightly rollup by absorbing the day's increment instead of
    * rescanning the corpus): per key tuple the exact
    * (count, decimal sum, min, max) cells, served with the
    * deterministic average (exact sum ÷ count, one double division —
    * the decAvg shape). Like [[PreparedMoments]], absorb is LOSSLESS
    * BY ALGEBRA — count/sum/min/max are all associative merges — and
    * carries the same unkeyed-observations semantics: absorbing the
    * same rows twice is the caller's choice, exactly as re-running a
    * batch aggregate. APPEND-ONLY by construction, stated: min/max
    * cannot un-merge a deletion — a corrected corpus needs a
    * re-prepare (or a [[GraftDataFrameOps.applyChanges]]-maintained
    * base it re-prepares from). Merge cost is cells-sized, never
    * corpus-sized.
    */
  final case class PreparedRollup private[graft] (
    cells: DataFrame, keys: Seq[String], reliable: Boolean) {

    /** Merge an increment's cells by exact-algebra aggregation; pass
      * the SAME value measure prepare used (the absorbVocab
      * discipline).
      */
    def absorb(increment: DataFrame, value: Column,
               checkpointDir: Option[String] = None): PreparedRollup = {
      import org.apache.spark.sql.types.DecimalType
      val ckp = lineageBreaker(checkpointDir)
      val merged = ckp(cells.unionByName(rollupCells(increment, keys, value))
        .groupBy(keys.map(col): _*)
        .agg(sum(col("n")).as("n"),
          sum(col("s")).cast(DecimalType(38, 2)).as("s"),
          min(col("mn")).as("mn"), max(col("mx")).as("mx")))
      PreparedRollup(merged, keys, reliable && checkpointDir.isDefined)
    }

    /** The rollup surface: cells + the deterministic exact-sum
      * average (`avg = CAST(s AS DOUBLE) / n`, one double division).
      */
    def serve: DataFrame =
      cells.withColumn("avg", col("s").cast("double") / col("n"))

    /** Persist durably (one cells frame + kind-tagged meta). Key
      * names join on NUL (the PreparedScd2 separator — NUL cannot
      * occur in a Spark column name; a comma CAN, and would silently
      * reconstruct wrong keys on load).
      */
    def save(path: String): Unit = {
      cells.write.mode("overwrite").parquet(s"$path/cells")
      // fmt=2 marks the NUL key separator (fmt-less artifacts were
      // comma-joined; loading one by NUL-split would FUSE the key
      // names into a single misparsed string -- load fails fast on a
      // missing/old marker instead)
      ArtifactIO.writeMeta(cells.sparkSession, path, "rollup",
        Seq("keys" -> keys.mkString("\u0000"), "fmt" -> "2"))
    }
  }

  /** Build a [[PreparedRollup]]; its `serve` over the prepare corpus
    * equals the one-shot grouped aggregate (shared census code,
    * spec-pinned). Streaming/nightly maintenance wants a reliable
    * `checkpointDir`, as with every artifact.
    */
  def prepareRollup(corpus: DataFrame, keys: Seq[String], value: Column,
                    checkpointDir: Option[String] = None): PreparedRollup = {
    require(keys.nonEmpty, "prepareRollup: at least one key column")
    val ckp = lineageBreaker(checkpointDir)
    PreparedRollup(ckp(rollupCells(corpus, keys, value)), keys,
      checkpointDir.isDefined)
  }

  /** Load a [[PreparedRollup]] persisted by its `save`; fails fast on
    * a non-rollup path.
    */
  def loadRollup(spark: org.apache.spark.sql.SparkSession, path: String): PreparedRollup = {
    val m = ArtifactIO.readMeta(spark, path, "rollup")
    // fail FAST on a pre-fmt artifact rather than misparse it: a
    // fmt-less rollup was saved with comma-joined key names, which a
    // NUL split would fuse into one wrong key string silently
    val fmt = m.getOrElse("fmt", "<missing>")
    require(fmt == "2",
      s"loadRollup: artifact at $path has format '$fmt', expected '2' " +
        "(NUL-separated keys) -- re-save it with this engine's prepareRollup")
    PreparedRollup(spark.read.parquet(s"$path/cells"),
      ArtifactIO.field(m, path, "keys").split("\u0000").toSeq, reliable = true)
  }

  /** The co-occurrence census behind [[itemSimilarity]] and
    * [[PreparedCooc]]: per-item basket counts and per-pair
    * co-occurrence counts (canonical a < b), both from ONE distinct
    * (basket, item) frame. The pair stage explodes per basket and is
    * bounded by basket size (the q126/q129 argument — never an
    * all-pairs join over items).
    */
  private[graft] def coocCensus(baskets: DataFrame, basket: String,
                                item: String): (DataFrame, DataFrame) = {
    // the distinct basket-item frame feeds the item census AND both
    // sides of the pair self-join — pinned once so the source is
    // scanned once, not three times (the r13 q165 plan-audit rule)
    val e = baskets.select(col(basket).as("__ok"), col(item).as("__it"))
      .filter(col("__ok").isNotNull && col("__it").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val items = e.groupBy(col("__it").as("it")).agg(count(lit(1)).as("n"))
    val pairs = e.as("x").join(e.as("y"),
        col("x.__ok") === col("y.__ok") && col("x.__it") < col("y.__it"))
      .groupBy(col("x.__it").as("a"), col("y.__it").as("b"))
      .agg(count(lit(1)).as("co"))
    (items, pairs)
  }

  /** Top-k serve over a co-occurrence census: cosine
    * `co / √(n_item·n_other)` — exact long counts in, ONE fixed
    * double expression out (product exact below 2⁵³, sqrt and divide
    * correctly rounded IEEE → bit-identical ranks on any engine),
    * ranked per item (cosine desc, other asc). The rank window
    * partitions by item — never a global sort.
    */
  private[graft] def serveSimilarItems(items: DataFrame, pairs: DataFrame,
                                       k: Int, minCo: Long): DataFrame = {
    val p = pairs.filter(col("co") >= minCo)
    val directed = p.select(col("a").as("item"), col("b").as("other"), col("co"))
      .unionByName(p.select(col("b").as("item"), col("a").as("other"), col("co")))
    val cos = col("co").cast("double") /
      sqrt((col("n_item") * col("n_other")).cast("double"))
    val w = Window.partitionBy(col("item")).orderBy(col("__cos").desc, col("other"))
    directed
      .join(items.select(col("it").as("item"), col("n").as("n_item")), Seq("item"))
      .join(items.select(col("it").as("other"), col("n").as("n_other")), Seq("other"))
      .withColumn("__cos", cos)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("item"), col("other"), col("co"), col("n_item"),
        col("n_other"), round(col("__cos"), 6).as("cosine"), col("rnk"))
  }

  /** Item-item collaborative-filtering similarity (r12 — the
    * "customers who bought X also bought Y" recommender primitive):
    * top-`k` co-occurrence cosine neighbors per item over baskets.
    * `minCo` prunes noise pairs before ranking (a 1-basket
    * coincidence is not a signal, and the filter bounds the rank
    * frame). Scale shape: the [[coocCensus]] pair explosion is
    * basket-size-bounded, counts join on item keys (AQE broadcasts
    * the items-sized count frame), the rank window partitions by
    * item — no global sort, no all-pairs anywhere.
    */
  def itemSimilarity(baskets: DataFrame, basket: String, item: String,
                     k: Int, minCo: Long): DataFrame = {
    require(k >= 1, s"itemSimilarity: k ($k) must be >= 1")
    require(minCo >= 1, s"itemSimilarity: minCo ($minCo) must be >= 1")
    val (items, pairs) = coocCensus(baskets, basket, item)
    serveSimilarItems(items, pairs, k, minCo)
  }

  /** A co-occurrence index prepared ONCE for incremental maintenance
    * (r12 — the recommender-serving artifact): per-item and per-pair
    * exact counts plus the basket total. Like [[PreparedMoments]],
    * absorb is LOSSLESS BY ALGEBRA — counts are associative sums —
    * under one explicit contract: each basket is ATOMIC to a single
    * prepare/absorb call (a basket id split across calls would lose
    * its cross-call pairs, and a basket id repeated across calls
    * double-counts — the caller owns batch boundaries, exactly as a
    * batch groupBy owns its input). `similarItems` serves the q133
    * output from the stored counts at any point; merge cost is
    * census-sized, never corpus-sized.
    */
  final case class PreparedCooc private[graft] (
    items: DataFrame, pairs: DataFrame, nBaskets: Long, reliable: Boolean) {

    /** Merge an increment's census by exact addition (basket-atomic
      * increments — see the class contract).
      */
    def absorb(increment: DataFrame, basket: String, item: String,
               checkpointDir: Option[String] = None): PreparedCooc = {
      val ckp = lineageBreaker(checkpointDir)
      val (itemsB, pairsB) = coocCensus(increment, basket, item)
      val nB = increment.filter(col(basket).isNotNull && col(item).isNotNull)
        .select(col(basket)).distinct().count()
      val mergedItems = ckp(items.unionByName(itemsB)
        .groupBy(col("it")).agg(sum(col("n")).as("n")))
      val mergedPairs = ckp(pairs.unionByName(pairsB)
        .groupBy(col("a"), col("b")).agg(sum(col("co")).as("co")))
      PreparedCooc(mergedItems, mergedPairs, nBaskets + nB,
        reliable && checkpointDir.isDefined)
    }

    /** The q133 top-k cosine surface over the current counts. */
    def similarItems(k: Int, minCo: Long): DataFrame =
      serveSimilarItems(items, pairs, k, minCo)

    /** Persist durably (two census frames + kind-tagged meta). */
    def save(path: String): Unit = {
      items.write.mode("overwrite").parquet(s"$path/items")
      pairs.write.mode("overwrite").parquet(s"$path/pairs")
      ArtifactIO.writeMeta(items.sparkSession, path, "cooc",
        Seq("nBaskets" -> nBaskets.toString))
    }
  }

  /** Build a [[PreparedCooc]]; `similarItems` on it reproduces
    * [[itemSimilarity]] bit-for-bit (shared census + serve code,
    * spec-pinned).
    */
  def prepareCooc(baskets: DataFrame, basket: String, item: String,
                  checkpointDir: Option[String] = None): PreparedCooc = {
    val ckp = lineageBreaker(checkpointDir)
    val (items, pairs) = coocCensus(baskets, basket, item)
    val nB = baskets.filter(col(basket).isNotNull && col(item).isNotNull)
      .select(col(basket)).distinct().count()
    PreparedCooc(ckp(items), ckp(pairs), nB, checkpointDir.isDefined)
  }

  /** Load a [[PreparedCooc]] persisted by its `save`; fails fast on
    * a non-cooc path.
    */
  def loadCooc(spark: org.apache.spark.sql.SparkSession, path: String): PreparedCooc = {
    val m = ArtifactIO.readMeta(spark, path, "cooc")
    PreparedCooc(spark.read.parquet(s"$path/items"),
      spark.read.parquet(s"$path/pairs"),
      ArtifactIO.field(m, path, "nBaskets").toLong, reliable = true)
  }

  /** Population stability index between two samples (r12 — THE drift
    * metric ML feature monitoring runs between a training baseline
    * and live data, and a curation pipeline runs between crawl
    * versions): over a caller-supplied bucket column, the per-bucket
    * census of each side completes across the UNION of observed
    * buckets (the q136 rule — a bucket present on one side only is
    * exactly the drift evidence PSI exists to catch) with add-one
    * Laplace smoothing making every share strictly positive as an
    * EXACT rational `(c+1)/(n+B)` — integer counts in, one fixed
    * double shape out: `term = (pa − pb)·ln(pa/pb)` rounded at 12
    * and summed as exact DECIMAL(38,12) (the q150 discipline), total
    * rounded at 6. Emits per-bucket rows (counts, shares, term)
    * beside the total so a reviewer sees WHERE the drift lives.
    *
    * Scale shape: two map-combinable bucket censuses + a bounded
    * buckets-frame outer join + two 1-row scalar broadcasts; the
    * total rides an unpartitioned window over the BOUNDED bucket
    * frame (the q142 shape).
    */
  def psiDrift(baseline: DataFrame, current: DataFrame,
               bucket: String): DataFrame =
    psiDriftFromCensus(bucketCensus(baseline, bucket), current, bucket)

  /** The exact (bucket, c) census [[psiDrift]]/[[jsDivergence]]/
    * [[PreparedBuckets]] all build on: non-null buckets, one
    * map-combinable count per bucket. Counts ADD, so merging two
    * censuses IS the census of the union — the lossless absorb
    * algebra every bucket artifact rides (r15).
    */
  def bucketCensus(df: DataFrame, bucket: String): DataFrame =
    df.filter(col(bucket).isNotNull)
      .groupBy(col(bucket).as("bucket")).agg(count(lit(1)).as("c"))

  /** Census-input PSI (r15 — the [[PreparedBuckets]] serve path:
    * the baseline arrives as a PINNED (bucket, c) census instead of
    * live rows, so a restarted drift monitor replays against the
    * artifact it saved, not whatever the baseline table says today).
    * `n_a` is the census total (identical to the row count the
    * row-input form measured — counts add); every downstream
    * expression is shared with [[psiDrift]], which now delegates
    * here, so the two forms are value-identical by construction.
    */
  def psiDriftFromCensus(baseCensus: DataFrame, current: DataFrame,
                         bucket: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ca = baseCensus
    val cb = bucketCensus(current, bucket)
    val na = ca.agg(coalesce(sum(col("c")), lit(0L)).as("na"))
    val nb = current.filter(col(bucket).isNotNull).agg(count(lit(1)).as("nb"))
    val joined = ca.withColumnRenamed("c", "c_base")
      .join(cb.withColumnRenamed("c", "c_cur"), Seq("bucket"), "full_outer")
      .withColumn("c_base", coalesce(col("c_base"), lit(0L)))
      .withColumn("c_cur", coalesce(col("c_cur"), lit(0L)))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
    val wCells = Window.partitionBy()
    val b = count(lit(1)).over(wCells)
    val pa = (col("c_base") + 1).cast("double") / (col("na") + col("__b")).cast("double")
    val pb = (col("c_cur") + 1).cast("double") / (col("nb") + col("__b")).cast("double")
    joined
      .withColumn("__b", b)
      .withColumn("p_base", pa)
      .withColumn("p_cur", pb)
      .withColumn("term",
        round((col("p_base") - col("p_cur")) * log(col("p_base") / col("p_cur")), 12))
      .withColumn("psi",
        sum(col("term").cast(DecimalType(38, 12))).over(wCells)
          .cast("double"))
      .withColumn("psi", round(col("psi"), 6))
      .select(col("bucket"), col("c_base"), col("c_cur"),
        round(col("p_base"), 12).as("p_base"), round(col("p_cur"), 12).as("p_cur"),
        col("term"), col("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic (r12 — [[psiDrift]]'s
    * bucket-free sibling: the max CDF gap between two samples of an
    * exact integer measure, the distribution-drift test that needs
    * no binning choice). The gap is located EXACTLY: at each distinct
    * value the comparison `|cumA·nB − cumB·nA|` runs in DECIMAL(38,0)
    * cross-multiplication — no double ever decides the argmax, so
    * the selected gap (and its value, ties broken by the smaller
    * value) is bit-deterministic on any engine; only the final
    * readout divides once and rounds at 6. Returns ONE row:
    * (n_a, n_b, d_num exact, at_value, d_stat).
    *
    * Scale shape: two map-combinable value censuses + a
    * distinct-value merge; the running CDFs and the argmax rank ride
    * unpartitioned windows over the DISTINCT-VALUE census (bounded
    * by the value domain, not the corpus — the q130 global-order
    * caveat applies to pathological domains; [[GraftDataFrameOps.quantileBuckets]]
    * / `portable_quantiles` are the sketch path there).
    */
  def ksStatistic(a: DataFrame, b: DataFrame, value: Column,
                  allowWideCensus: Boolean = false,
                  maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def census(df: DataFrame, cnt: String) = df.filter(value.isNotNull)
      .groupBy(value.cast("long").as("v")).agg(count(lit(1)).as(cnt))
    val m = census(a, "ca").join(census(b, "cb"), Seq("v"), "full_outer")
      .withColumn("ca", coalesce(col("ca"), lit(0L)))
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
    val wAll = Window.partitionBy()
    val wRun = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d18 = DecimalType(18, 0)
    m.withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .withColumn("__cn", count(lit(1)).over(wAll))
      .withColumn("__cumA", sum(col("ca")).over(wRun))
      .withColumn("__cumB", sum(col("cb")).over(wRun))
      // the wide-census gate rides d_num (every downstream step —
      // argmax ordering, the final readout — consumes it, so it
      // cannot be pruned away): see MaxExactCensusRows
      .withColumn("d_num", gateWideCensus(
        abs(col("__cumA").cast(d18) * col("n_b").cast(d18) -
          col("__cumB").cast(d18) * col("n_a").cast(d18))
          .cast(DecimalType(38, 0)),
        col("__cn"), "ksStatistic", allowWideCensus, maxExactCensusRows))
      .withColumn("__rk", row_number().over(Window.orderBy(col("d_num").desc, col("v"))))
      .filter(col("__rk") === 1)
      // an EMPTY side has no CDF to compare: d_stat is null (never a
      // division by zero), with the counts reporting which side
      .withColumn("d_stat", when(col("n_a") > 0 && col("n_b") > 0,
        round(col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)))
      // emitted as BIGINT, never DECIMAL: wide decimals render with
      // engine-specific trailing-zero canonicalization in external
      // gates (SURVEY §3 rule — no DECIMAL of precision > 18 in a
      // gated output). d_num ≤ n_a·n_b, exact in a long while both
      // sides stay below ~3·10⁹ rows (stated; the internal argmax
      // stays DECIMAL(38,0) regardless)
      .select(col("n_a"), col("n_b"),
        col("d_num").cast("long").as("d_num"),
        col("v").as("at_value"), col("d_stat"))
  }

  /** Two-sample Mann–Whitney U test (r12 — the NONPARAMETRIC sibling
    * of [[GraftDataFrameOps.abTest]]: "is sample A stochastically
    * larger than B" without any normality assumption — the right test
    * for skewed latencies, ordinal scores, heavy-tailed revenue).
    * Ranks never materialize per row: over the merged distinct-value
    * census, a tie group of size m starting after S prior
    * observations contributes `ca·(2S + m + 1)` to TWICE side A's
    * rank sum — average tie ranks with NO fractions, all in
    * DECIMAL(38,0) (the q156 discipline); `u2 = 2·U = R2 − nA(nA+1)`
    * stays exact, and the tie-corrected normal approximation
    * `z = (u2 − nA·nB) / (2·√var)` is one fixed double shape over the
    * exact sums, rounded at 6 (no continuity correction, stated;
    * degenerate inputs — an empty side, n < 2, or zero variance —
    * yield null z with counts reporting). Returns ONE row:
    * (n_a, n_b, u2, z).
    *
    * Scale shape: two map-combinable value censuses + the
    * distinct-value merge; the prior-count window rides the census
    * (the q156 domain-bounded statement), ONE aggregate finishes.
    */
  def mannWhitneyU(a: DataFrame, b: DataFrame, value: Column,
                   allowWideCensus: Boolean = false,
                   maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def census(df: DataFrame, cnt: String) = df.filter(value.isNotNull)
      .groupBy(value.cast("long").as("v")).agg(count(lit(1)).as(cnt))
    val m0 = census(a, "ca").join(census(b, "cb"), Seq("v"), "full_outer")
      .withColumn("ca", coalesce(col("ca"), lit(0L)))
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
    val wBefore = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val d12 = DecimalType(12, 0); val d19 = DecimalType(19, 0)
    val agg = m0
      .withColumn("__m", col("ca") + col("cb"))
      // the wide-census gate rides the prior-count column every rank
      // sum consumes: see MaxExactCensusRows
      .withColumn("__cn", count(lit(1)).over(Window.partitionBy()))
      .withColumn("__s", gateWideCensus(
        coalesce(sum(col("__m")).over(wBefore), lit(0L)),
        col("__cn"), "mannWhitneyU", allowWideCensus, maxExactCensusRows))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca").cast(d19) * (col("__s") * 2 + col("__m") + 1).cast(d19))
          .cast(DecimalType(38, 0)).as("__r2a"),
        sum(col("__m").cast(d12) * col("__m").cast(d12) * col("__m").cast(d12) -
          col("__m").cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).as("__tie"))
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val nD = (col("n_a") + col("n_b")).cast("double")
    // the tie-correction divisor n(n-1) is 0 when n < 2 — ANSI mode
    // errors even on DOUBLE division by zero, so the term is gated
    // (z is null for such degenerate inputs anyway)
    val varU = naD * nbD / lit(12.0) *
      ((nD + lit(1.0)) - when(nD > 1.0,
        col("__tie").cast("double") / (nD * (nD - lit(1.0)))).otherwise(lit(0.0)))
    agg
      .withColumn("u2",
        (col("__r2a") - (col("n_a").cast(d19) * (col("n_a") + 1).cast(d19))
          .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)))
      .withColumn("__var", varU)
      .withColumn("z", when(col("n_a") > 0 && col("n_b") > 0 &&
          col("n_a") + col("n_b") >= 2 && col("__var") > 0.0,
        round((col("u2").cast("double") - naD * nbD) /
          (lit(2.0) * sqrt(col("__var"))), 6)))
      // BIGINT emission (no DECIMAL in a gated output — SURVEY §3);
      // u2 ≤ 2·n_a·n_b stays exact in a long below ~2·10⁹-row sides
      // (stated; the rank sums stay DECIMAL(38,0) internally)
      .select(col("n_a"), col("n_b"),
        col("u2").cast("long").as("u2"), col("z"))
  }

  /** Per-group two-sample Kolmogorov–Smirnov (r13 — [[ksStatistic]]
    * keyed by a segment column: real experiment readouts run per
    * cohort/segment/arm, not whole-frame). Identical exact machinery
    * — merged value census, DECIMAL(38,0) cross-multiplied argmax,
    * smaller-value tie rule, one division + round(6) at the end —
    * with every window PARTITIONED BY the group, so each segment's
    * gap is located independently in one pass over the shared
    * census. A group present on only one side still reports (its
    * counts say which side is empty; d_stat is null, never a
    * division crash). Returns one row per group:
    * (grp, n_a, n_b, d_num DECIMAL(38,2), at_value, d_stat).
    *
    * Scale shape: the [[ksStatistic]] statement, now keyed — two
    * map-combinable (group, value) censuses, one full-outer merge,
    * group-partitioned windows over the census (bounded by each
    * group's value domain); adding groups adds parallelism, not
    * passes.
    */
  def ksStatisticByGroup(a: DataFrame, b: DataFrame, group: String,
                         value: Column, allowWideCensus: Boolean = false,
                         maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    def census(df: DataFrame, cnt: String) =
      df.filter(col(group).isNotNull && value.isNotNull)
        .groupBy(col(group).as("grp"), value.cast("long").as("v"))
        .agg(count(lit(1)).as(cnt))
    ksStatisticFinishFromCensus(
      census(a, "ca").join(census(b, "cb"), Seq("grp", "v"), "full_outer")
        .withColumn("ca", coalesce(col("ca"), lit(0L)))
        .withColumn("cb", coalesce(col("cb"), lit(0L))),
      allowWideCensus, maxExactCensusRows)
  }

  /** The shared keyed-KS machinery over a merged (grp, v, ca, cb)
    * value census (counts already coalesced) — the row-input
    * [[ksStatisticByGroup]] and the artifact-input
    * [[governanceBatteryFromPrepared]] both end here (r17, the
    * welchTFinishFromSides discipline).
    */
  /** The shared rank-census window pass (r17 optimization round): per
    * (grp, v) row of a merged census, the per-segment totals, census
    * width and running cumulatives that BOTH the keyed MWU and the
    * keyed KS consume. Factored out so the governance battery computes
    * the (join + sort + window) pass ONCE for the two tests instead of
    * twice; the standalone forms route through it unchanged. All
    * columns are exact longs — the derivations below are bit-identical
    * to the per-test windows they replace.
    */
  private[graft] def governanceRankStats(m: DataFrame): DataFrame = {
    val wAll = Window.partitionBy(col("grp"))
    val wRun = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // spread the merged census per grp with a PINNED partition count
    // (r18, VERDICT r17 next #4): the windows below only need
    // clustering by grp, but AQE coalesces the few-MB census exchange
    // to ~1 task, serializing the battery's dominant stage at bench
    // scale. An explicit numPartitions blocks the coalesce;
    // defaultParallelism tracks the session's core count, so the
    // spread is scale-adaptive, not local-tuned, and per-grp windows
    // keep exact rank semantics under any grp-hash layout. (A single
    // hot segment still serializes — inherent to exact per-segment
    // ranks; the sketch forms are the declared refuse-route.)
    val spread = m.repartition(
      m.sparkSession.sparkContext.defaultParallelism, col("grp"))
    spread.withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      // per-SEGMENT census gate (the windows here are group-
      // partitioned, so the risk is ONE segment's near-unique value
      // domain — the weightedMedian statement): see MaxExactCensusRows
      .withColumn("__cn", count(lit(1)).over(wAll))
      .withColumn("__cumA", sum(col("ca")).over(wRun))
      .withColumn("__cumB", sum(col("cb")).over(wRun))
  }

  private[graft] def ksStatisticFinishFromCensus(m: DataFrame,
                                                 allowWideCensus: Boolean,
                                                 maxExactCensusRows: Long): DataFrame =
    ksStatisticFinishFromStats(governanceRankStats(m),
      allowWideCensus, maxExactCensusRows)

  /** The keyed-KS tail over a [[governanceRankStats]] frame. */
  private[graft] def ksStatisticFinishFromStats(st: DataFrame,
                                                allowWideCensus: Boolean,
                                                maxExactCensusRows: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d18 = DecimalType(18, 0)
    st.withColumn("d_num", gateWideCensus(
        abs(col("__cumA").cast(d18) * col("n_b").cast(d18) -
          col("__cumB").cast(d18) * col("n_a").cast(d18))
          .cast(DecimalType(38, 0)),
        col("__cn"), "ksStatisticByGroup", allowWideCensus, maxExactCensusRows))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("d_num").desc, col("v"))))
      .filter(col("__rk") === 1)
      .withColumn("d_stat", when(col("n_a") > 0 && col("n_b") > 0,
        round(col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)))
      .select(col("grp"), col("n_a"), col("n_b"),
        col("d_num").cast("long").as("d_num"),
        col("v").as("at_value"), col("d_stat"))
  }

  /** Per-group two-sample Mann–Whitney U (r13 — [[mannWhitneyU]]
    * keyed by a segment column, the per-cohort nonparametric
    * readout). Same exact identities — tie group of size m after S
    * prior observations contributes ca·(2S+m+1) to twice side A's
    * rank sum, all DECIMAL(38,0); u2 = R2 − nA(nA+1) exact; one
    * fixed-shape tie-corrected z per group (degenerate groups — an
    * empty side, n < 2, zero variance — report null z, counts
    * stating why) — with the prior-count window partitioned by the
    * group and ONE grouped aggregate finishing all segments.
    * Returns one row per group: (grp, n_a, n_b, u2 DECIMAL(38,2), z).
    */
  def mannWhitneyUByGroup(a: DataFrame, b: DataFrame, group: String,
                          value: Column, allowWideCensus: Boolean = false,
                          maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    def census(df: DataFrame, cnt: String) =
      df.filter(col(group).isNotNull && value.isNotNull)
        .groupBy(col(group).as("grp"), value.cast("long").as("v"))
        .agg(count(lit(1)).as(cnt))
    mannWhitneyUFinishFromCensus(
      census(a, "ca").join(census(b, "cb"), Seq("grp", "v"), "full_outer")
        .withColumn("ca", coalesce(col("ca"), lit(0L)))
        .withColumn("cb", coalesce(col("cb"), lit(0L))),
      allowWideCensus, maxExactCensusRows)
  }

  /** The shared keyed-MWU machinery over a merged (grp, v, ca, cb)
    * value census (counts already coalesced) — the row-input
    * [[mannWhitneyUByGroup]] and the artifact-input
    * [[governanceBatteryFromPrepared]] both end here (r17, the
    * welchTFinishFromSides discipline).
    */
  private[graft] def mannWhitneyUFinishFromCensus(m0: DataFrame,
                                                  allowWideCensus: Boolean,
                                                  maxExactCensusRows: Long): DataFrame =
    mannWhitneyUFinishFromStats(governanceRankStats(m0),
      allowWideCensus, maxExactCensusRows)

  /** The keyed-MWU tail over a [[governanceRankStats]] frame. The
    * prior-count rank term derives from the shared cumulatives —
    * `S = cumA + cumB − m` is exactly `Σ m over rows before` (longs,
    * bit-identical to the dedicated unbounded-preceding window it
    * replaces).
    */
  private[graft] def mannWhitneyUFinishFromStats(st: DataFrame,
                                                 allowWideCensus: Boolean,
                                                 maxExactCensusRows: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d12 = DecimalType(12, 0); val d19 = DecimalType(19, 0)
    val agg = st
      .withColumn("__m", col("ca") + col("cb"))
      // per-SEGMENT census gate: see MaxExactCensusRows
      .withColumn("__s", gateWideCensus(
        col("__cumA") + col("__cumB") - col("__m"),
        col("__cn"), "mannWhitneyUByGroup", allowWideCensus, maxExactCensusRows))
      .groupBy(col("grp"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca").cast(d19) * (col("__s") * 2 + col("__m") + 1).cast(d19))
          .cast(DecimalType(38, 0)).as("__r2a"),
        sum(col("__m").cast(d12) * col("__m").cast(d12) * col("__m").cast(d12) -
          col("__m").cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).as("__tie"))
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val nD = (col("n_a") + col("n_b")).cast("double")
    // the tie-correction divisor n(n-1) is 0 when n < 2 — ANSI mode
    // errors even on DOUBLE division by zero, so the term is gated
    // (z is null for such degenerate inputs anyway)
    val varU = naD * nbD / lit(12.0) *
      ((nD + lit(1.0)) - when(nD > 1.0,
        col("__tie").cast("double") / (nD * (nD - lit(1.0)))).otherwise(lit(0.0)))
    agg
      .withColumn("u2",
        (col("__r2a") - (col("n_a").cast(d19) * (col("n_a") + 1).cast(d19))
          .cast(DecimalType(38, 0))).cast(DecimalType(38, 0)))
      .withColumn("__var", varU)
      .withColumn("z", when(col("n_a") > 0 && col("n_b") > 0 &&
          col("n_a") + col("n_b") >= 2 && col("__var") > 0.0,
        round((col("u2").cast("double") - naD * nbD) /
          (lit(2.0) * sqrt(col("__var"))), 6)))
      .select(col("grp"), col("n_a"), col("n_b"),
        col("u2").cast("long").as("u2"), col("z"))
  }

  /** Per-group PSI drift (r13 — [[psiDrift]] keyed by a segment
    * column: population-stability monitoring per model segment /
    * market / device class in ONE pass). Same Laplace-smoothed union
    * census and round-12 decimal term sum, with the bucket-count and
    * total windows PARTITIONED BY the group — each segment's PSI is
    * self-contained, and the per-group totals come off the joined
    * census itself (sum of census counts = non-null-bucket row
    * count; no scalar cross joins at all in the keyed form). Returns
    * one row per (grp, bucket) with that group's psi repeated — the
    * [[psiDrift]] readout shape, segment-keyed.
    */
  def psiDriftByGroup(baseline: DataFrame, current: DataFrame,
                      group: String, bucket: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def census(df: DataFrame, cnt: String) =
      df.filter(col(group).isNotNull && col(bucket).isNotNull)
        .groupBy(col(group).as("grp"), col(bucket).as("bucket"))
        .agg(count(lit(1)).as(cnt))
    val joined = census(baseline, "c_base")
      .join(census(current, "c_cur"), Seq("grp", "bucket"), "full_outer")
      .withColumn("c_base", coalesce(col("c_base"), lit(0L)))
      .withColumn("c_cur", coalesce(col("c_cur"), lit(0L)))
    val wGrp = Window.partitionBy(col("grp"))
    val pa = (col("c_base") + 1).cast("double") / (col("__na") + col("__b")).cast("double")
    val pb = (col("c_cur") + 1).cast("double") / (col("__nb") + col("__b")).cast("double")
    joined
      .withColumn("__na", sum(col("c_base")).over(wGrp))
      .withColumn("__nb", sum(col("c_cur")).over(wGrp))
      .withColumn("__b", count(lit(1)).over(wGrp))
      .withColumn("p_base", pa)
      .withColumn("p_cur", pb)
      .withColumn("term",
        round((col("p_base") - col("p_cur")) * log(col("p_base") / col("p_cur")), 12))
      .withColumn("psi",
        sum(col("term").cast(DecimalType(38, 12))).over(wGrp).cast("double"))
      .withColumn("psi", round(col("psi"), 6))
      .select(col("grp"), col("bucket"), col("c_base"), col("c_cur"),
        round(col("p_base"), 12).as("p_base"), round(col("p_cur"), 12).as("p_cur"),
        col("term"), col("psi"))
  }

  /** Kruskal–Wallis H test (r13 — the k-GROUP member of the rank-test
    * family: "do ANY of these segments' distributions differ", the
    * nonparametric one-way ANOVA that q157's two-sample U cannot
    * answer without k² pairwise runs): over the merged (group, value)
    * census, a value v with m_v total observations after S_v priors
    * contributes `c_{g,v}·(2S_v + m_v + 1)` to group g's DOUBLED rank
    * sum — the q157 identity per group, all DECIMAL(38,0), no
    * per-row ranks ever materialize. The statistic
    * `H = 12/(N(N+1))·Σ_g R_g²/n_g − 3(N+1)` splits Σ R_g²/n_g into
    * an exact integer quotient plus an O(1) remainder fraction
    * (divmod by 4n_g — both exact in any engine), so the only
    * rounded doubles are O(1)-magnitude remainder ratios (round-12,
    * decimal-summed — the q155 discipline; the q152 large-magnitude
    * round trap never fires). Tie correction
    * `C = 1 − Σ(m³−m)/(N³−N)` from the exact decimal tie sum;
    * `h_adj = H/C` (null when C = 0 — all values identical).
    * Returns one row per group: (grp, n, r2 DECIMAL(38,2)) with the
    * shared (n_total, k_groups, h, h_adj) repeated — the q155
    * readout shape.
    *
    * Exactness bounds (documented, not checked): quotient sum exact
    * while Σ R²/n < 2⁵³ (N ≲ 5·10⁷ rows at k ≥ 2) and N³ < 2⁵³
    * (N ≲ 2·10⁵) for the tie denominator — past that the LAST double
    * conversion rounds; the census and rank sums stay exact at any N.
    *
    * Scale shape: one (group, value) census + one distinct-value
    * census (map-combinable), ONE value-ordered window over the
    * distinct-value frame, one grouped aggregate, and K-row finishing
    * windows — cost tracks the value domain, not the corpus.
    */
  def kruskalWallis(df: DataFrame, group: String, value: Column,
                    allowWideCensus: Boolean = false,
                    maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cg = df.filter(col(group).isNotNull && value.isNotNull)
      .groupBy(col(group).as("grp"), value.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val mv = cg.groupBy(col("v")).agg(sum(col("c")).as("m"))
    val wBefore = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val d12 = DecimalType(12, 0); val d19 = DecimalType(19, 0)
    // the wide-census gate rides the prior-count column every rank
    // sum consumes: see MaxExactCensusRows
    val mvS = mv
      .withColumn("__cn", count(lit(1)).over(Window.partitionBy()))
      .withColumn("s", gateWideCensus(
        coalesce(sum(col("m")).over(wBefore), lit(0L)),
        col("__cn"), "kruskalWallis", allowWideCensus, maxExactCensusRows))
    val per = cg.join(mvS, Seq("v"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast(d19) * (col("s") * 2 + col("m") + 1).cast(d19))
          .cast(DecimalType(38, 0)).as("__r2"))
    val wAll = Window.partitionBy()
    // ties + N off the distinct-value census, carried on a 1-row
    // frame (the q48 scalar-broadcast shape)
    val scalars = mv.agg(
      sum(col("m").cast(d12) * col("m").cast(d12) * col("m").cast(d12) -
        col("m").cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("__tie"),
      sum(col("m")).as("n_total"))
    val r2sq = (col("__r2") * col("__r2")).cast(DecimalType(38, 0))
    val den = (col("n") * 4).cast(DecimalType(19, 0))
    val nD = col("n_total").cast("double")
    val sD = col("__qsum").cast("double") + col("__fsum").cast("double")
    val h = lit(12.0) / (nD * (nD + lit(1.0))) * sD - lit(3.0) * (nD + lit(1.0))
    val n3nD = (col("n_total").cast(DecimalType(19, 0)) *
      col("n_total").cast(d12) * col("n_total").cast(d12) -
      col("n_total").cast(DecimalType(38, 0))).cast(DecimalType(38, 0))
    per.crossJoin(broadcast(scalars))
      .withColumn("__rsq", r2sq)
      // exact divmod split of R² / n (= r2² / 4n): quotient exact
      // integer, remainder an O(1) ratio — see the scaladoc
      .withColumn("__q", (col("__rsq") - pmod(col("__rsq"), den)) / den)
      .withColumn("__fr",
        round(pmod(col("__rsq"), den).cast("double") / den.cast("double"), 12))
      .withColumn("__qsum", sum(col("__q").cast(DecimalType(38, 0))).over(wAll))
      .withColumn("__fsum", sum(col("__fr").cast(DecimalType(38, 12))).over(wAll))
      .withColumn("k_groups", count(lit(1)).over(wAll))
      // the tie denominator N³−N is 0 when n_total < 2 — ANSI errors
      // even on DOUBLE division by zero, so the correction is gated
      // (null __c → null h_adj, the same rule the MWU variance uses)
      .withColumn("__c", when(col("n_total") > 1,
        lit(1.0) - col("__tie").cast("double") / n3nD.cast("double")))
      .withColumn("h", round(h, 6))
      .withColumn("h_adj", when(col("__c") > 0.0, round(h / col("__c"), 6)))
      .select(col("grp"), col("n"),
        col("__r2").cast("long").as("r2"),
        col("n_total"), col("k_groups"), col("h"), col("h_adj"))
  }

  /** Welch's unequal-variance two-sample t test (r13 — the PARAMETRIC
    * sibling of [[mannWhitneyU]] and the two-sample member of the
    * q119 moment family: "did the MEAN shift", robust to unequal
    * variances — the default t test a careful analyst reaches for):
    * per side ONE map-combinable aggregate collects the exact decimal
    * moments (n, Σx at DECIMAL(38,2), Σx² at DECIMAL(38,4) over the
    * lossless [[graft.util.Portable]] view — order-independent under
    * any partitioning), then mean/variance/t/df are a FIXED double
    * expression over the exact sums (the q119/q100 discipline),
    * rounded at 6: `t = (m₁−m₂)/√(s₁²/n₁ + s₂²/n₂)` and the
    * Welch–Satterthwaite df. Degenerate inputs (a side with n < 2,
    * zero pooled standard error) yield null t/df with the counts and
    * means reporting. Returns ONE row:
    * (n_a, n_b, mean_a, mean_b, t, df).
    */
  def welchT(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull).agg(
        count(lit(1)).as(s"n_$suf"),
        sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
        sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    // sample variance from the exact sums: (Σx² − (Σx)²/n)/(n−1)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    def vn(s: String) = v(s) / nD(s)
    val se2 = vn("a") + vn("b")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val df_ = se2 * se2 /
      (vn("a") * vn("a") / (nD("a") - lit(1.0)) +
        vn("b") * vn("b") / (nD("b") - lit(1.0)))
    side(a, "a").crossJoin(broadcast(side(b, "b")))
      .withColumn("mean_a", when(col("n_a") > 0, round(mean("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(mean("b"), 6)))
      .withColumn("t", when(ok && se2 > 0.0,
        round((mean("a") - mean("b")) / sqrt(se2), 6)))
      .withColumn("df", when(ok && se2 > 0.0, round(df_, 6)))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("t"), col("df"))
  }

  /** Spearman rank correlation with ties (r13 — the rank member of
    * the q119 correlation family: monotone association robust to
    * outliers and nonlinearity, the right default for skewed
    * measures): per variable, a value with m occurrences after S
    * priors takes the DOUBLED average rank `2S + m + 1` — an exact
    * integer (the q157 identity), computed over each variable's value
    * census and joined back to rows by value, so per-row ranks carry
    * NO fractions and the moment sums
    * (Σu, Σv, Σu², Σv², Σuv over doubled ranks) are exact
    * DECIMAL(38,0) under any partitioning. ρ is then Pearson on the
    * doubled ranks — one fixed double expression over the exact sums
    * (doubling cancels), rounded at 6; a zero-variance side (all
    * values equal) yields null ρ. Returns ONE row: (n, rho).
    *
    * Scale shape (r18): ONE corpus scan builds the (x, y) PAIR census
    * (map-combinable); both variable censuses are exact roll-ups of
    * it and the moment aggregate walks the pair census WEIGHTED by
    * its count — `Σ_rows uᵢvᵢ = Σ_pairs c·u·v` exactly (every term an
    * integer in DECIMAL(38,0)), so nothing corpus-sized is scanned or
    * shuffled more than once; the prior-count windows stay
    * domain-bounded and the value-keyed join-backs land on the pair
    * census, not on rows. No global sort, no per-row window.
    */
  def spearmanCorr(df: DataFrame, x: Column, y: Column,
                   allowWideCensus: Boolean = false,
                   maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val rows = df.filter(x.isNotNull && y.isNotNull)
      .select(x.cast("long").as("__vx"), y.cast("long").as("__vy"))
    // ONE corpus pass: the (x, y) pair census; pair multiplicity is
    // the exact weight of every downstream sum (|pairs| ≤ n rows)
    val pairs = rows.groupBy(col("__vx"), col("__vy"))
      .agg(count(lit(1)).as("__c"))
    def rankMap(name: String, out: String): DataFrame = {
      // the variable census is an exact roll-up of the pair census
      val cen = pairs.groupBy(col(name)).agg(sum(col("__c")).as("__m"))
      val wB = Window.orderBy(col(name)).rowsBetween(Window.unboundedPreceding, -1)
      // the wide-census gate rides each variable's doubled rank —
      // the one column the join-back consumes: see MaxExactCensusRows
      cen.withColumn("__cn", count(lit(1)).over(Window.partitionBy()))
        .withColumn("__s", coalesce(sum(col("__m")).over(wB), lit(0L)))
        .select(col(name), gateWideCensus(
          col("__s") * 2 + col("__m") + 1,
          col("__cn"), "spearmanCorr", allowWideCensus, maxExactCensusRows).as(out))
    }
    val withRanks = pairs
      .join(rankMap("__vx", "__ux"), Seq("__vx"))
      .join(rankMap("__vy", "__uy"), Seq("__vy"))
    val c19 = col("__c").cast(d19)
    val agg = withRanks.agg(
      sum(col("__c")).as("n"),
      sum(c19 * col("__ux").cast(d19)).cast(DecimalType(38, 0)).as("__su"),
      sum(c19 * col("__uy").cast(d19)).cast(DecimalType(38, 0)).as("__sv"),
      sum(col("__ux").cast(d19) * col("__ux").cast(d19) * c19)
        .cast(DecimalType(38, 0)).as("__suu"),
      sum(col("__uy").cast(d19) * col("__uy").cast(d19) * c19)
        .cast(DecimalType(38, 0)).as("__svv"),
      sum(col("__ux").cast(d19) * col("__uy").cast(d19) * c19)
        .cast(DecimalType(38, 0)).as("__suv"))
    val nD = col("n").cast("double")
    val su = col("__su").cast("double"); val sv = col("__sv").cast("double")
    val covN = nD * col("__suv").cast("double") - su * sv
    val varU = nD * col("__suu").cast("double") - su * su
    val varV = nD * col("__svv").cast("double") - sv * sv
    agg
      .withColumn("rho", when(varU > 0.0 && varV > 0.0,
        round(covN / sqrt(varU * varV), 6)))
      .select(col("n"), col("rho"))
  }

  /** Per-segment Kruskal–Wallis H test (r14 — [[kruskalWallis]] keyed
    * by a segment column, completing the per-group experiment family
    * q158/q159/q160/q169 opened: "within EACH segment, do any of the
    * k arms' distributions differ"). Identical exact machinery — the
    * (segment, group, value) census, the q157 double-rank identity
    * `c·(2S+m+1)` in DECIMAL(38,0) off each segment's distinct-value
    * census, the exact divmod split of Σ R²/n, the tie-corrected
    * `H/C` fixed double tree (gated for n_total < 2, the ANSI ÷0
    * rule) — with the prior-count window and the finishing windows
    * PARTITIONED BY the segment, and the per-segment tie/N scalars
    * arriving via a KEYED hash join (no scalar cross joins in the
    * keyed form, the q160 statement). Returns one row per
    * (segment, group): (seg, grp, n, r2 BIGINT) with the segment's
    * (n_total, k_groups, h, h_adj) repeated.
    *
    * Scale shape: two map-combinable censuses + one segment-keyed
    * value window + one grouped aggregate + segment-partitioned
    * finishing windows — adding segments adds parallelism, not
    * passes; cost tracks each segment's value domain.
    */
  def kruskalWallisByGroup(df: DataFrame, segment: String, group: String,
                           value: Column, allowWideCensus: Boolean = false,
                           maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cg = df.filter(col(segment).isNotNull && col(group).isNotNull &&
        value.isNotNull)
      .groupBy(col(segment).as("seg"), col(group).as("grp"),
        value.cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val mv = cg.groupBy(col("seg"), col("v")).agg(sum(col("c")).as("m"))
    val wBefore = Window.partitionBy(col("seg")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val d12 = DecimalType(12, 0); val d19 = DecimalType(19, 0)
    // per-SEGMENT census gate: see MaxExactCensusRows
    val mvS = mv
      .withColumn("__cn", count(lit(1)).over(Window.partitionBy(col("seg"))))
      .withColumn("s", gateWideCensus(
        coalesce(sum(col("m")).over(wBefore), lit(0L)),
        col("__cn"), "kruskalWallisByGroup", allowWideCensus, maxExactCensusRows))
    val per = cg.join(mvS, Seq("seg", "v"))
      .groupBy(col("seg"), col("grp"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast(d19) * (col("s") * 2 + col("m") + 1).cast(d19))
          .cast(DecimalType(38, 0)).as("__r2"))
    // per-segment ties + N off the distinct-value census — a keyed
    // hash join onto the per-(seg, grp) frame, never a cross join
    val scalars = mv.groupBy(col("seg")).agg(
      sum(col("m").cast(d12) * col("m").cast(d12) * col("m").cast(d12) -
        col("m").cast(DecimalType(38, 0))).cast(DecimalType(38, 0)).as("__tie"),
      sum(col("m")).as("n_total"))
    val wSeg = Window.partitionBy(col("seg"))
    val r2sq = (col("__r2") * col("__r2")).cast(DecimalType(38, 0))
    val den = (col("n") * 4).cast(DecimalType(19, 0))
    val nD = col("n_total").cast("double")
    val sD = col("__qsum").cast("double") + col("__fsum").cast("double")
    val h = lit(12.0) / (nD * (nD + lit(1.0))) * sD - lit(3.0) * (nD + lit(1.0))
    val n3nD = (col("n_total").cast(DecimalType(19, 0)) *
      col("n_total").cast(d12) * col("n_total").cast(d12) -
      col("n_total").cast(DecimalType(38, 0))).cast(DecimalType(38, 0))
    per.join(scalars, Seq("seg"))
      .withColumn("__rsq", r2sq)
      .withColumn("__q", (col("__rsq") - pmod(col("__rsq"), den)) / den)
      .withColumn("__fr",
        round(pmod(col("__rsq"), den).cast("double") / den.cast("double"), 12))
      .withColumn("__qsum", sum(col("__q").cast(DecimalType(38, 0))).over(wSeg))
      .withColumn("__fsum", sum(col("__fr").cast(DecimalType(38, 12))).over(wSeg))
      .withColumn("k_groups", count(lit(1)).over(wSeg))
      .withColumn("__c", when(col("n_total") > 1,
        lit(1.0) - col("__tie").cast("double") / n3nD.cast("double")))
      .withColumn("h", round(h, 6))
      .withColumn("h_adj", when(col("__c") > 0.0, round(h / col("__c"), 6)))
      .select(col("seg"), col("grp"), col("n"),
        col("__r2").cast("long").as("r2"),
        col("n_total"), col("k_groups"), col("h"), col("h_adj"))
  }

  /** Per-group Spearman rank correlation (r14 — [[spearmanCorr]]
    * keyed by a segment column: "is the monotone association present
    * in EVERY segment, or an aggregation artifact" — the Simpson's-
    * paradox screen for skewed measures). Identical exact machinery —
    * each variable's doubled average rank `2S+m+1` off its (segment,
    * value) census (exact integers, the q157 identity), value-keyed
    * joins back to rows, five exact DECIMAL(38,0) rank-moment sums —
    * with the prior-count windows PARTITIONED BY the segment and ONE
    * grouped aggregate finishing all segments; a segment with a
    * constant axis reports null rho (n still counts). Returns one row
    * per segment: (grp, n, rho).
    *
    * Scale shape (r18): ONE corpus scan builds the (segment, x, y)
    * PAIR census (map-combinable); both (segment, value) censuses are
    * exact roll-ups of it and the per-segment moment aggregate walks
    * the pair census WEIGHTED by its count — `Σ_rows uᵢvᵢ =
    * Σ_pairs c·u·v` exactly per segment — so nothing corpus-sized is
    * scanned or shuffled more than once; the segment-keyed prior
    * windows stay domain-bounded per segment and the keyed join-backs
    * land on the pair census, not on rows. No global sort.
    */
  def spearmanCorrByGroup(df: DataFrame, group: String,
                          x: Column, y: Column,
                          allowWideCensus: Boolean = false,
                          maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val rows = df.filter(col(group).isNotNull && x.isNotNull && y.isNotNull)
      .select(col(group).as("__g"), x.cast("long").as("__vx"),
        y.cast("long").as("__vy"))
    // ONE corpus pass: the (segment, x, y) pair census; pair
    // multiplicity is the exact weight of every downstream sum
    val pairs = rows.groupBy(col("__g"), col("__vx"), col("__vy"))
      .agg(count(lit(1)).as("__c"))
    def rankMap(name: String, out: String): DataFrame = {
      // the (segment, value) census is an exact roll-up of the pairs
      val cen = pairs.groupBy(col("__g"), col(name)).agg(sum(col("__c")).as("__m"))
      val wB = Window.partitionBy(col("__g")).orderBy(col(name))
        .rowsBetween(Window.unboundedPreceding, -1)
      // per-SEGMENT census gate: see MaxExactCensusRows
      cen.withColumn("__cn", count(lit(1)).over(Window.partitionBy(col("__g"))))
        .withColumn("__s", coalesce(sum(col("__m")).over(wB), lit(0L)))
        .select(col("__g"), col(name), gateWideCensus(
          col("__s") * 2 + col("__m") + 1,
          col("__cn"), "spearmanCorrByGroup", allowWideCensus,
          maxExactCensusRows).as(out))
    }
    val withRanks = pairs
      .join(rankMap("__vx", "__ux"), Seq("__g", "__vx"))
      .join(rankMap("__vy", "__uy"), Seq("__g", "__vy"))
    val c19 = col("__c").cast(d19)
    val agg = withRanks.groupBy(col("__g")).agg(
      sum(col("__c")).as("n"),
      sum(c19 * col("__ux").cast(d19)).cast(DecimalType(38, 0)).as("__su"),
      sum(c19 * col("__uy").cast(d19)).cast(DecimalType(38, 0)).as("__sv"),
      sum(col("__ux").cast(d19) * col("__ux").cast(d19) * c19)
        .cast(DecimalType(38, 0)).as("__suu"),
      sum(col("__uy").cast(d19) * col("__uy").cast(d19) * c19)
        .cast(DecimalType(38, 0)).as("__svv"),
      sum(col("__ux").cast(d19) * col("__uy").cast(d19) * c19)
        .cast(DecimalType(38, 0)).as("__suv"))
    val nD = col("n").cast("double")
    val su = col("__su").cast("double"); val sv = col("__sv").cast("double")
    val covN = nD * col("__suv").cast("double") - su * sv
    val varU = nD * col("__suu").cast("double") - su * su
    val varV = nD * col("__svv").cast("double") - sv * sv
    agg
      .withColumn("rho", when(varU > 0.0 && varV > 0.0,
        round(covN / sqrt(varU * varV), 6)))
      .select(col("__g").as("grp"), col("n"), col("rho"))
  }

  /** Sample-ratio-mismatch check (r14 — the experimentation-platform
    * GOVERNANCE gate that runs before any A/B readout is trusted: if
    * the observed arm traffic does not match the declared split, the
    * assignment mechanism is broken and every downstream statistic is
    * invalid): a χ² goodness-of-fit of observed arm counts against
    * the declared weights. The arm census is exact and
    * map-combinable; a DECLARED arm with zero traffic still
    * contributes its full expectation (the q136 absent-is-evidence
    * rule); an arm observed but NOT declared reports its count with
    * null weight/expected/contrib and stays OUT of the χ² (itself
    * the loudest mismatch signal — observable, never crashing).
    * N is the total over DECLARED arms; per-arm
    * `contrib = (obs − N·w)²/(N·w)` is one fixed double shape
    * rounded at 6, the total sums the ROUNDED contribs exactly and
    * emits integer micros (the §3 rule); dof = k_declared − 1.
    * Zero total declared traffic (an empty frame, a trigger batch
    * with only null arms) reports null contribs and null chi2 with
    * the zero counts saying why — gated, never a ÷0 crash (r15).
    * Returns one row per arm (declared ∪ observed):
    * (arm, n_obs, weight, expected, contrib, chi2_micros, dof).
    *
    * Scale shape: one map-combinable arm census + a k-row declared
    * frame outer join + k-row finishing windows — nothing
    * corpus-sized after the census.
    */
  def srmCheck(df: DataFrame, arm: Column,
               expected: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(expected.nonEmpty, "srmCheck: declare at least one arm weight")
    require(expected.map(_._1).distinct.length == expected.length,
      "srmCheck: duplicate arm in expected weights")
    expected.foreach { case (a, w) =>
      require(w > 0.0 && w <= 1.0, s"srmCheck: weight for '$a' ($w) must be in (0, 1]") }
    require(math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"srmCheck: weights must sum to 1 (got ${expected.map(_._2).sum})")
    val spark = df.sparkSession
    import spark.implicits._
    val decl = expected.toDF("arm", "weight")
    val census = df.filter(arm.isNotNull)
      .groupBy(arm.cast("string").as("arm")).agg(count(lit(1)).as("n_obs"))
    val joined = census.join(broadcast(decl), Seq("arm"), "full_outer")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    val wAll = Window.partitionBy()
    val e = sum(when(col("weight").isNotNull, col("n_obs"))).over(wAll)
      .cast("double") * col("weight")
    joined
      .withColumn("expected", e)
      // contrib is gated on expected > 0, not just the weight: with
      // ZERO total declared traffic (empty input, or a stream trigger
      // whose arm values are all null) expected = 0 for every arm and
      // the 0/0 threw under ANSI — the check must stay observable
      // (null contribs/chi2, counts reporting), never crash (r15)
      .withColumn("contrib", when(col("weight").isNotNull && col("expected") > 0.0,
        round((col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"), 6)))
      .withColumn("chi2_micros",
        (sum(col("contrib").cast(DecimalType(38, 6))).over(wAll) * 1000000)
          .cast("long"))
      .withColumn("dof",
        (count(col("weight")).over(wAll) - 1).cast("long"))
      .select(col("arm"), col("n_obs"), col("weight"),
        round(col("expected"), 6).as("expected"), col("contrib"),
        col("chi2_micros"), col("dof"))
  }

  /** Per-segment sample-ratio-mismatch check (r15 — [[srmCheck]]
    * keyed by a segment, completing SRM's keyed form in the
    * per-segment governance family: a whole-experiment SRM can read
    * clean while ONE day / platform / country is badly skewed — the
    * keyed check says WHERE and WHEN the assignment mechanism broke,
    * the first question an SRM alert triggers): the (segment, arm)
    * census FULL-OUTER joins the declared arms WITHIN each segment
    * (a broadcast segments×arms completion — a declared arm missing
    * from a segment still contributes its full expectation there,
    * the q136 absent-is-evidence rule; an undeclared arm surfaces
    * with null weight and stays out of that segment's χ²), per-
    * segment totals and χ² ride segment-partitioned windows (no
    * scalar crosses in the keyed form, the q160 statement), same
    * round-6 contribs / decimal χ² sums / ANSI-safe expected-> 0
    * gating as the whole-frame form. Returns one row per
    * (segment, arm) with the segment's chi2_micros/dof repeated.
    *
    * Scale shape: one map-combinable census + one broadcast
    * segments×arms completion + segment-keyed windows — adding
    * segments adds parallelism, not passes.
    */
  def srmCheckByGroup(df: DataFrame, segment: String, arm: Column,
                      expected: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(expected.nonEmpty, "srmCheckByGroup: declare at least one arm weight")
    require(expected.map(_._1).distinct.length == expected.length,
      "srmCheckByGroup: duplicate arm in expected weights")
    expected.foreach { case (a, w) =>
      require(w > 0.0 && w <= 1.0,
        s"srmCheckByGroup: weight for '$a' ($w) must be in (0, 1]") }
    require(math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      s"srmCheckByGroup: weights must sum to 1 (got ${expected.map(_._2).sum})")
    val spark = df.sparkSession
    import spark.implicits._
    val decl = expected.toDF("arm", "weight")
    val census = df.filter(arm.isNotNull && col(segment).isNotNull)
      .groupBy(col(segment).as("grp"), arm.cast("string").as("arm"))
      .agg(count(lit(1)).as("n_obs"))
    // complete every (segment, declared arm) cell: segments frame ×
    // broadcast arms, then the observed census joins back keyed
    val segs = census.select(col("grp")).distinct()
    val complete = segs.crossJoin(broadcast(decl))
      .join(census, Seq("grp", "arm"), "full_outer")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    val wSeg = Window.partitionBy(col("grp"))
    val e = sum(when(col("weight").isNotNull, col("n_obs"))).over(wSeg)
      .cast("double") * col("weight")
    complete
      .withColumn("expected", e)
      .withColumn("contrib", when(col("weight").isNotNull && col("expected") > 0.0,
        round((col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"), 6)))
      .withColumn("chi2_micros",
        (sum(col("contrib").cast(DecimalType(38, 6))).over(wSeg) * 1000000)
          .cast("long"))
      .withColumn("dof",
        (count(col("weight")).over(wSeg) - 1).cast("long"))
      .select(col("grp"), col("arm"), col("n_obs"), col("weight"),
        round(col("expected"), 6).as("expected"), col("contrib"),
        col("chi2_micros"), col("dof"))
  }

  /** Jensen–Shannon divergence between two bucket distributions (r14
    * — [[psiDrift]]'s SYMMETRIC, smoothing-free sibling: PSI needs
    * Laplace smoothing because KL explodes on one-side-only buckets;
    * JS is finite by construction — a one-side-only bucket
    * contributes at most ln 2 — so the metric carries no smoothing
    * parameter to tune or replay): over the union bucket census,
    * `js = Σ ½·p·ln(p/m) + ½·q·ln(q/m)` with `m = ½(p+q)`, each
    * bucket's term one fixed double shape ROUNDED at 12 and summed as
    * exact DECIMAL(38,12) (the q155 order-free discipline), total
    * rounded at 6 — nats, in [0, ln 2]. A zero-count side's half-term
    * is exactly 0 (the p·ln p limit), gated, never NaN. Per-bucket
    * rows emit beside the total so a reviewer sees WHERE the
    * divergence lives (the q155 readout shape). An EMPTY side (no
    * non-null bucket rows at all) reports zero probabilities for
    * that side — the 0/0 probability division is gated on the side
    * total (ANSI errors even on double ÷0, r15), so a vanished
    * baseline or current era degrades observably (js reads ½·ln 2,
    * the formula's value against a zero measure) instead of
    * crashing the query or the [[graft.streaming.Streams]] drift
    * monitor riding it.
    *
    * Scale shape: two map-combinable bucket censuses + a bounded
    * union outer join + census-sized windows — cost tracks the bucket
    * domain, never the corpus.
    */
  def jsDivergence(baseline: DataFrame, current: DataFrame,
                   bucket: String): DataFrame =
    jsDivergenceFromCensus(bucketCensus(baseline, bucket), current, bucket)

  /** Census-input JS divergence (r15 — the [[PreparedBuckets]] serve
    * path, the [[psiDriftFromCensus]] twin): the baseline side is a
    * pinned (bucket, c) census; [[jsDivergence]] delegates here, so
    * row-input and census-input forms are value-identical by
    * construction.
    */
  def jsDivergenceFromCensus(baseCensus: DataFrame, current: DataFrame,
                             bucket: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val joined = baseCensus.withColumnRenamed("c", "c_base")
      .join(bucketCensus(current, bucket).withColumnRenamed("c", "c_cur"),
        Seq("bucket"), "full_outer")
      .withColumn("c_base", coalesce(col("c_base"), lit(0L)))
      .withColumn("c_cur", coalesce(col("c_cur"), lit(0L)))
    val wAll = Window.partitionBy()
    // the probability divisions are gated on the SIDE total, not
    // just the bucket count: a side with zero rows overall leaves
    // __na/__nb = 0 and the 0/0 would throw under ANSI (r15 —
    // an era vanishing is the core drift scenario, it must report)
    val p = when(col("__na") > 0,
      col("c_base").cast("double") / col("__na").cast("double"))
      .otherwise(lit(0.0))
    val q = when(col("__nb") > 0,
      col("c_cur").cast("double") / col("__nb").cast("double"))
      .otherwise(lit(0.0))
    val m = (col("p_base") + col("p_cur")) / lit(2.0)
    val halfP = when(col("c_base") > 0,
      lit(0.5) * col("p_base") * log(col("p_base") / m)).otherwise(lit(0.0))
    val halfQ = when(col("c_cur") > 0,
      lit(0.5) * col("p_cur") * log(col("p_cur") / m)).otherwise(lit(0.0))
    joined
      .withColumn("__na", sum(col("c_base")).over(wAll))
      .withColumn("__nb", sum(col("c_cur")).over(wAll))
      .withColumn("p_base", p)
      .withColumn("p_cur", q)
      .withColumn("term", round(halfP + halfQ, 12))
      .withColumn("js",
        round(sum(col("term").cast(DecimalType(38, 12))).over(wAll)
          .cast("double"), 6))
      .select(col("bucket"), col("c_base"), col("c_cur"),
        round(col("p_base"), 12).as("p_base"), round(col("p_cur"), 12).as("p_cur"),
        col("term"), col("js"))
  }

  /** Dedup yield report (r14 — the pipeline-accounting readout every
    * curation run publishes: "this corpus is N docs; the near-dup
    * clusters hold M of them in K clusters, so dedup drops M−K and
    * keeps R% of the corpus" — the number a data-budget review
    * quotes, composed over any cluster labeling
    * ([[GraftDataFrameOps.connectedComponents]] over LSH/SimHash/
    * vector edges)): per observed cluster SIZE one row
    * (cluster_size, n_clusters, n_docs) with the corpus totals
    * repeated — n_docs_total, n_clustered, dup_mass = clustered −
    * clusters (the docs a keep-one-canonical pass drops), and
    * kept_ratio = (total − dup_mass)/total (round-6 DOUBLE, the §3
    * rule). Labels cover only clustered docs (every vertex has an
    * edge, so sizes ≥ 2); unclustered docs participate via the total.
    *
    * Scale shape: one cluster-size census + a size histogram (both
    * bounded by cluster structure, never the corpus), histogram-sized
    * windows, one 1-row corpus-count broadcast cross (the q48 scalar
    * shape).
    */
  def dedupYield(corpus: DataFrame, id: String, labels: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    val hist = sizes.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("cluster_size")).as("n_docs"))
    val tot = corpus.filter(col(id).isNotNull).agg(count(lit(1)).as("n_docs_total"))
    // histogram totals as a 1-row aggregate broadcast cross (the q181
    // scalar shape) rather than an unpartitioned window — same values
    // (the histogram is domain-bounded either way), strictly safer
    // plan (VERDICT r15 nit #3, the last undocumented whole-frame
    // window outside the league-table cases)
    val histTotals = hist.agg(sum(col("n_docs")).as("n_clustered"),
      sum(col("n_clusters")).as("__ncl"))
    hist.crossJoin(broadcast(tot))
      .crossJoin(broadcast(histTotals))
      .withColumn("dup_mass", col("n_clustered") - col("__ncl"))
      .withColumn("kept_ratio",
        round((col("n_docs_total") - col("dup_mass")).cast("double") /
          col("n_docs_total").cast("double"), 6))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        col("n_docs_total"), col("n_clustered"), col("dup_mass"),
        col("kept_ratio"))
  }

  /** Per-quantile drift between two samples (r14 — the drift family's
    * SHAPE readout: PSI/JS say "the distribution moved", KS says
    * "the biggest CDF gap is here", THIS says "the p50 rose $12 and
    * the p99 rose $400" — the number an SLO/pricing review actually
    * quotes): each side runs the q108 portable fixed-width bucket
    * census ([[quantileRegisters]] — one exactly-specified IEEE
    * division + floor, so the census replays bit-for-bit) and the
    * nearest-rank midpoint estimates ([[quantileFromRegisters]] —
    * within width/2 of the exact nearest-rank quantile), the two
    * 1-row frames cross, and one row per requested quantile emits
    * (quantile, value_a, value_b, delta = b − a). All DOUBLE
    * midpoints (the §3 rule).
    *
    * Scale shape: two map-combinable bucket censuses (resolution-
    * bounded — domain/width rows, never the corpus), cumulative
    * windows over the census, one 1×1 cross, one k-row unpivot.
    */
  def quantileDrift(a: DataFrame, b: DataFrame, value: Column,
                    bucketWidth: Double,
                    quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "quantileDrift: need at least one quantile")
    require(quantiles.map(_._1).distinct.length == quantiles.length,
      "quantileDrift: duplicate quantile name")
    def side(df: DataFrame, suf: String): DataFrame =
      quantileFromRegisters(
        quantileRegisters(df, Nil, value, bucketWidth), Nil, bucketWidth,
        quantiles.map { case (n, q) => (s"__${n}_$suf", q) })
    val joined = side(a, "a").crossJoin(broadcast(side(b, "b")))
    val stackArgs = quantiles.map { case (n, _) =>
      s"'$n', `__${n}_a`, `__${n}_b`" }.mkString(", ")
    joined
      .select(expr(s"stack(${quantiles.length}, $stackArgs) AS " +
        "(quantile, value_a, value_b)"))
      .withColumn("delta", col("value_b") - col("value_a"))
  }

  /** Per-segment quantile drift (r15 — [[quantileDrift]] keyed by a
    * segment column, closing the experimentation family's last
    * whole-frame-only member: "the p99 rose $400 — in WHICH cohort"):
    * each side runs the SEGMENT-KEYED q108 bucket census
    * ([[quantileRegisters]] already takes keys) and the per-segment
    * nearest-rank midpoints, the two per-segment frames FULL-OUTER
    * join on the segment (a keyed hash join — no scalar crosses in
    * the keyed form, the q160 statement), and one row per
    * (segment, quantile) emits. A segment present on only one side
    * reports null for the absent side's value and a null delta — the
    * appearance/disappearance signal, observable. All DOUBLE
    * midpoints (the §3 rule).
    *
    * Scale shape: two map-combinable (segment, bucket) censuses
    * (resolution-bounded per segment), segment-partitioned cumulative
    * windows, one segment-keyed join, one k-row-per-segment unpivot —
    * adding segments adds parallelism, not passes.
    */
  def quantileDriftByGroup(a: DataFrame, b: DataFrame, group: String,
                           value: Column, bucketWidth: Double,
                           quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "quantileDriftByGroup: need at least one quantile")
    require(quantiles.map(_._1).distinct.length == quantiles.length,
      "quantileDriftByGroup: duplicate quantile name")
    def side(df: DataFrame, suf: String): DataFrame =
      quantileFromRegisters(
        quantileRegisters(df.filter(col(group).isNotNull), Seq(group), value,
          bucketWidth),
        Seq(group), bucketWidth,
        quantiles.map { case (n, q) => (s"__${n}_$suf", q) })
    val joined = side(a, "a").join(side(b, "b"), Seq(group), "full_outer")
    val stackArgs = quantiles.map { case (n, _) =>
      s"'$n', `__${n}_a`, `__${n}_b`" }.mkString(", ")
    joined
      .select(col(group),
        expr(s"stack(${quantiles.length}, $stackArgs) AS " +
          "(quantile, value_a, value_b)"))
      .withColumn("delta", col("value_b") - col("value_a"))
  }

  /** [[quantileDrift]] against a PINNED baseline (r15 — the durable
    * serve path for [[graft.streaming.Streams.quantileDriftStream]]:
    * the baseline side comes from a persisted [[PreparedQuantiles]]
    * census instead of live rows, so a RESTARTED drift monitor
    * replays against the artifact it saved — reproducibility across
    * restarts is the entire point of a drift baseline). The stored
    * census IS the census the row-input form would build
    * ([[quantileRegisters]] is exact and deterministic), so the
    * output is bit-for-bit [[quantileDrift]] of the prepare corpus
    * vs `current` — spec-pinned. Requires a group-less artifact
    * (whole-frame drift) built at the SAME bucketWidth the live side
    * will use — the width is read FROM the artifact, never passed,
    * so the two sides cannot disagree.
    */
  def quantileDriftFromPrepared(prepared: PreparedQuantiles,
                                current: DataFrame, value: Column,
                                quantiles: Seq[(String, Double)]): DataFrame = {
    require(prepared.group.isEmpty,
      "quantileDriftFromPrepared: whole-frame drift needs a group-less " +
        s"PreparedQuantiles (artifact is keyed by ${prepared.group.mkString(", ")})")
    require(quantiles.nonEmpty, "quantileDriftFromPrepared: need at least one quantile")
    require(quantiles.map(_._1).distinct.length == quantiles.length,
      "quantileDriftFromPrepared: duplicate quantile name")
    val w = prepared.bucketWidth
    val sideA = quantileFromRegisters(prepared.regs, Nil, w,
      quantiles.map { case (n, q) => (s"__${n}_a", q) })
    val sideB = quantileFromRegisters(
      quantileRegisters(current, Nil, value, w), Nil, w,
      quantiles.map { case (n, q) => (s"__${n}_b", q) })
    val stackArgs = quantiles.map { case (n, _) =>
      s"'$n', `__${n}_a`, `__${n}_b`" }.mkString(", ")
    sideA.crossJoin(broadcast(sideB))
      .select(expr(s"stack(${quantiles.length}, $stackArgs) AS " +
        "(quantile, value_a, value_b)"))
      .withColumn("delta", col("value_b") - col("value_a"))
  }

  /** Top-N rank movers between two eras (r14 — the BI/governance
    * readout beside [[GraftDataFrameOps.periodOverPeriod]]: not "how
    * did totals move" but "WHO moved up or down the league table" —
    * vendor churn, crawl-source displacement, whale rotation): each
    * era's exact entity totals (integer cents — the §3 BIGINT rule)
    * rank WITHIN THEIR OWN era by (total desc, entity — the
    * deterministic q143 tiebreak), the eras full-outer join on the
    * entity, and entities inside either era's top `topN` report with
    * `rank_delta = rank_a − rank_b` (positive = climbed; null when
    * absent from one era — the appearance/disappearance signal,
    * observable). Returns (entity, total_a_cents, rank_a,
    * total_b_cents, rank_b, rank_delta).
    *
    * Scale shape: two map-combinable entity censuses collapse the
    * corpus FIRST; the rank windows walk the ENTITY frame (the q143
    * statement). The windows are unpartitioned by design — a league
    * table is inherently global (the q130 caveat: entity domains at
    * catalog scale route through segmented rankings or
    * [[globalRank]]).
    */
  def rankMovers(a: DataFrame, b: DataFrame, entity: String,
                 value: Column, topN: Int): DataFrame = {
    require(topN >= 1, s"rankMovers: topN ($topN) must be >= 1")
    def census(df: DataFrame, suf: String) =
      df.filter(col(entity).isNotNull && value.isNotNull)
        .groupBy(col(entity).as("entity"))
        .agg((sum(graft.util.Portable.dec(value)) * 100).cast("long")
          .as(s"total_${suf}_cents"))
    def ranked(c: DataFrame, suf: String) = c.withColumn(s"rank_$suf",
      row_number().over(
        Window.orderBy(col(s"total_${suf}_cents").desc, col("entity"))).cast("long"))
    ranked(census(a, "a"), "a")
      .join(ranked(census(b, "b"), "b"), Seq("entity"), "full_outer")
      .withColumn("rank_delta",
        when(col("rank_a").isNotNull && col("rank_b").isNotNull,
          col("rank_a") - col("rank_b")))
      .filter(col("rank_a") <= topN || col("rank_b") <= topN)
      .select(col("entity"), col("total_a_cents"), col("rank_a"),
        col("total_b_cents"), col("rank_b"), col("rank_delta"))
  }

  /** Per-segment Jensen–Shannon divergence (r14 — [[jsDivergence]]
    * keyed by a segment column, the JS member of the per-segment
    * drift family beside [[psiDriftByGroup]]): the union (segment,
    * bucket) census with every total and the term sum PARTITIONED BY
    * the segment — per-segment totals come off the joined census
    * itself (no scalar cross joins in the keyed form, the q160
    * statement); each bucket's gated half-terms round-12 and
    * decimal-sum per segment, total round-6 in [0, ln 2]. A segment
    * present in only ONE era reports zero probabilities for the
    * absent side (the division is gated on the per-segment side
    * total, r15) — appearance/disappearance surfaces as the maximal
    * ½·ln 2 readout, never a crash. Returns one
    * row per (grp, bucket) with the segment's js repeated.
    */
  def jsDivergenceByGroup(baseline: DataFrame, current: DataFrame,
                          group: String, bucket: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def census(df: DataFrame, cnt: String) =
      df.filter(col(group).isNotNull && col(bucket).isNotNull)
        .groupBy(col(group).as("grp"), col(bucket).as("bucket"))
        .agg(count(lit(1)).as(cnt))
    val joined = census(baseline, "c_base")
      .join(census(current, "c_cur"), Seq("grp", "bucket"), "full_outer")
      .withColumn("c_base", coalesce(col("c_base"), lit(0L)))
      .withColumn("c_cur", coalesce(col("c_cur"), lit(0L)))
    val wGrp = Window.partitionBy(col("grp"))
    // gated on the per-SEGMENT side total: a segment present in only
    // one era has the other side's total = 0 and the ungated 0/0
    // threw under ANSI — segment appearance/disappearance is the
    // core drift signal, it must REPORT, not crash (r15)
    val p = when(col("__na") > 0,
      col("c_base").cast("double") / col("__na").cast("double"))
      .otherwise(lit(0.0))
    val q = when(col("__nb") > 0,
      col("c_cur").cast("double") / col("__nb").cast("double"))
      .otherwise(lit(0.0))
    val m = (col("p_base") + col("p_cur")) / lit(2.0)
    val halfP = when(col("c_base") > 0,
      lit(0.5) * col("p_base") * log(col("p_base") / m)).otherwise(lit(0.0))
    val halfQ = when(col("c_cur") > 0,
      lit(0.5) * col("p_cur") * log(col("p_cur") / m)).otherwise(lit(0.0))
    joined
      .withColumn("__na", sum(col("c_base")).over(wGrp))
      .withColumn("__nb", sum(col("c_cur")).over(wGrp))
      .withColumn("p_base", p)
      .withColumn("p_cur", q)
      .withColumn("term", round(halfP + halfQ, 12))
      .withColumn("js",
        round(sum(col("term").cast(DecimalType(38, 12))).over(wGrp)
          .cast("double"), 6))
      .select(col("grp"), col("bucket"), col("c_base"), col("c_cur"),
        round(col("p_base"), 12).as("p_base"), round(col("p_cur"), 12).as("p_cur"),
        col("term"), col("js"))
  }

  /** Two-sided z quantile at α = 0.05 (z_{0.975}) and the 80%-power
    * z (z_{0.8}) — the standard experiment-sizing constants, defined
    * ONCE here and embedded in the oracle SQL as 17-significant-digit
    * e-notation literals (the q136 discipline) so both engines
    * compute with the IDENTICAL doubles.
    */
  val zAlpha025: Double = 1.959963984540054
  val zPower80: Double = 0.8416212335729143

  /** Minimum-detectable-effect readout (r14 — the experiment-SIZING
    * companion to [[welchT]]/[[cupedZ]]: "with THIS traffic and THIS
    * variance, what mean shift could the test even see" — the number
    * that stops teams shipping underpowered readouts): per side the
    * q162 exact decimal moments (n, Σx, Σx² over the
    * [[graft.util.Portable]] view), then
    * `mde_abs = (z_{1−α/2} + z_power)·√(s_a²/n_a + s_b²/n_b)` and
    * `mde_rel = mde_abs / mean_a` as one fixed double tree over the
    * exact sums, round 6 ([[zAlpha025]]/[[zPower80]] by default —
    * pass others for different α/power). Degenerate sides (n < 2,
    * zero variance both sides, zero baseline mean for the relative
    * form) report null with counts/means saying why. Returns ONE
    * row: (n_a, n_b, mean_a, mean_b, sd_a, sd_b, mde_abs, mde_rel).
    *
    * Scale shape: two map-combinable 1-row moment aggregates + one
    * 1×1 cross — the q162 statement.
    */
  def mdeReadout(a: DataFrame, b: DataFrame, value: Column,
                 zAlpha: Double = zAlpha025,
                 zPower: Double = zPower80): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(zAlpha > 0.0 && zPower >= 0.0, "mdeReadout: z constants must be positive")
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull).agg(
        count(lit(1)).as(s"n_$suf"),
        sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
        sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    val se2 = v("a") / nD("a") + v("b") / nD("b")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val mde = (lit(zAlpha) + lit(zPower)) * sqrt(se2)
    side(a, "a").crossJoin(broadcast(side(b, "b")))
      .withColumn("mean_a", when(col("n_a") > 0, round(mean("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(mean("b"), 6)))
      .withColumn("sd_a", when(col("n_a") >= 2, round(sqrt(v("a")), 6)))
      .withColumn("sd_b", when(col("n_b") >= 2, round(sqrt(v("b")), 6)))
      .withColumn("mde_abs", when(ok && se2 > 0.0, round(mde, 6)))
      .withColumn("mde_rel", when(ok && se2 > 0.0 && mean("a") =!= 0.0,
        round(mde / mean("a"), 6)))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("sd_a"), col("sd_b"), col("mde_abs"), col("mde_rel"))
  }

  /** Two-proportion minimum-detectable-effect readout (r16 — VERDICT
    * r15 next #2, the PROPORTIONS half of [[mdeReadout]] and the
    * before-launch companion of the q134 two-proportion z world:
    * "with this traffic split, what conversion-rate lift could the
    * test even see"): per side ONE map-combinable aggregate of the
    * exact integer (n, successes) census — no doubles touch the
    * corpus — then the standard pooled-variance sizing tree
    * `mde_abs = (z_{1−α/2} + z_power)·√(p̂(1−p̂)(1/n_a + 1/n_b))`
    * with `p̂ = (x_a+x_b)/(n_a+n_b)` as one fixed double shape over
    * the exact counts, round 6. A degenerate pool (p̂ ∈ {0, 1} — no
    * variance to size against) or an empty side reports null with
    * the counts saying why. `success` must be a BOOLEAN column.
    * Returns ONE row: (n_a, n_b, x_a, x_b, p_a, p_b, p_pool,
    * mde_abs, mde_rel).
    *
    * Scale shape: two map-combinable 1-row integer aggregates + one
    * 1×1 cross — the q162/q183 census-scalar statement.
    */
  def mdeProportions(a: DataFrame, b: DataFrame, success: Column,
                     zAlpha: Double = zAlpha025,
                     zPower: Double = zPower80): DataFrame = {
    require(zAlpha > 0.0 && zPower >= 0.0,
      "mdeProportions: z constants must be positive")
    def side(df: DataFrame, suf: String): DataFrame =
      df.filter(success.isNotNull).agg(
        count(lit(1)).as(s"n_$suf"),
        coalesce(sum(when(success, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as(s"x_$suf"))
    def nD(s: String) = col(s"n_$s").cast("double")
    def xD(s: String) = col(s"x_$s").cast("double")
    val ok = col("n_a") >= 1 && col("n_b") >= 1
    val pool = (xD("a") + xD("b")) / (nD("a") + nD("b"))
    val se2 = pool * (lit(1.0) - pool) *
      (lit(1.0) / nD("a") + lit(1.0) / nD("b"))
    val mde = (lit(zAlpha) + lit(zPower)) * sqrt(se2)
    side(a, "a").crossJoin(broadcast(side(b, "b")))
      .withColumn("p_a", when(col("n_a") > 0, round(xD("a") / nD("a"), 6)))
      .withColumn("p_b", when(col("n_b") > 0, round(xD("b") / nD("b"), 6)))
      .withColumn("p_pool", when(ok, round(pool, 6)))
      .withColumn("mde_abs", when(ok && se2 > 0.0, round(mde, 6)))
      .withColumn("mde_rel", when(ok && se2 > 0.0 && xD("a") > 0.0,
        round(mde / (xD("a") / nD("a")), 6)))
      .select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        col("p_a"), col("p_b"), col("p_pool"), col("mde_abs"),
        col("mde_rel"))
  }

  /** mSPRT decision-horizon readout (r16 — VERDICT r15 next #2, the
    * before-launch half of [[msprt]]: "at effect δ under mixing
    * variance τ², how many samples per arm until the always-valid
    * boundary would fire" — the sequential analogue of
    * [[mdeReadout]]'s fixed-n sizing): the metric's variance σ²
    * comes from ONE map-combinable exact-decimal moment aggregate of
    * the supplied frame (the pre-experiment traffic), and the
    * deterministic expected path with equal allocation n per arm has
    * V(n) = 2σ²/n and
    * `ln Λ(n) = ½·ln(V/(V+τ²)) + δ²τ²/(2V(V+τ²))` (the
    * [[msprtFinish]] tree with Δ pinned at δ). The horizon is the
    * SMALLEST n on a fixed integer grid with ln Λ(n) > −ln α.
    *
    * The grid is pure integer arithmetic — three stepped ranges
    * (1..2¹⁶ step 1, then step 2¹⁰ to 2²⁶, then step 2¹⁶ to 2³⁰ ≈
    * 10⁹) — so engine and oracle enumerate IDENTICAL candidates with
    * no exp/pow anywhere (a geometric grid would hang the candidate
    * values off `exp`'s last ulp); resolution is ≤1.6% of n
    * everywhere past the exact range. ln Λ is the usual fixed tree
    * with its one ln rounded at 12. No crossing on the grid (δ too
    * small, or beyond 2³⁰) → null horizon, observable; degenerate
    * variance (n < 2 or σ² ≤ 0) → null with counts reporting.
    * `sigma2` emits as a round-0 BIGINT (value-unit², the ANOVA-SS
    * §3 rule: a round-6 double at 10¹⁰ magnitude is last-ulp-
    * unportable — the scale multiply differs between engines — while
    * round-0 is the same exact operation on the identical double in
    * both; r16, caught by q223's gate).
    * Returns ONE row: (n_src, sigma2, delta, tau2, horizon_n).
    *
    * Scale shape: one map-combinable 1-row moment aggregate, one
    * ~147k-row generated grid off that single row, one 1-row
    * re-aggregation — corpus cost is the one scan.
    */
  def msprtHorizon(df: DataFrame, value: Column, delta: Double,
                   tau2: Double,
                   lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"msprtHorizon: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0, s"msprtHorizon: lnAlpha ($lnAlpha) must be negative")
    val d = graft.util.Portable.dec(value)
    val m = df.filter(value.isNotNull).agg(
      count(lit(1)).as("n_src"),
      sum(d).cast(DecimalType(38, 2)).as("__s"),
      sum(d * d).cast(DecimalType(38, 4)).as("__ss"))
    val nD = col("n_src").cast("double")
    val v = (col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD) /
      (nD - lit(1.0))
    val okv = col("n_src") >= 2
    val vS = when(okv && v > 0.0, v).otherwise(lit(1.0))
    val grid = concat(
      sequence(lit(1L), lit(65536L)),
      sequence(lit(66560L), lit(67108864L), lit(1024L)),
      sequence(lit(67174400L), lit(1073741824L), lit(65536L)))
    val vv = lit(2.0) * vS / col("__n_try").cast("double")
    val lnLam = lit(0.5) * round(log(vv / (vv + lit(tau2))), 12) +
      lit(delta * delta) * lit(tau2) /
        (lit(2.0) * vv * (vv + lit(tau2)))
    m.withColumn("__ok", okv && v > 0.0)
      .withColumn("__n_try", explode(grid))
      .withColumn("__cross", col("__ok") && lnLam > lit(-lnAlpha))
      .groupBy()
      .agg(first(col("n_src")).as("n_src"),
        first(when(col("__ok"), round(v, 0).cast("long"))).as("sigma2"),
        min(when(col("__cross"), col("__n_try"))).as("horizon_n"))
      .withColumn("delta", lit(delta))
      .withColumn("tau2", lit(tau2))
      .select(col("n_src"), col("sigma2"), col("delta"), col("tau2"),
        col("horizon_n"))
  }

  /** Per-segment two-proportion MDE (r16 — [[mdeProportions]] keyed
    * by a segment column, completing the proportions sizing in the
    * per-segment family beside q188's mean-shift form: "which
    * segments even have the traffic to see a conversion lift"): per
    * (segment, side) ONE map-combinable exact integer (n, successes)
    * census, a full-outer segment join (a segment seen on one side
    * only reports its counts with null sizing — observable), then
    * the same pooled-variance tree per segment, round 6. All
    * divisions run on guarded stand-ins (an absent side's n = 0
    * never reaches a divisor — ANSI-safe), masked by the same
    * `ok` the whole-frame form uses. Returns one row per segment:
    * (grp, n_a, n_b, x_a, x_b, p_a, p_b, p_pool, mde_abs, mde_rel).
    *
    * Scale shape: two map-combinable (segment) censuses + one
    * segment-keyed join — nothing corpus-sized after the censuses,
    * no cross joins at all in the keyed form (the q188 statement).
    */
  def mdeProportionsByGroup(a: DataFrame, b: DataFrame, group: String,
                            success: Column,
                            zAlpha: Double = zAlpha025,
                            zPower: Double = zPower80): DataFrame = {
    require(zAlpha > 0.0 && zPower >= 0.0,
      "mdeProportionsByGroup: z constants must be positive")
    def side(df: DataFrame, nc: String, xc: String): DataFrame =
      df.filter(col(group).isNotNull && success.isNotNull)
        .groupBy(col(group).as("grp"))
        .agg(count(lit(1)).as(nc),
          coalesce(sum(when(success, lit(1L)).otherwise(lit(0L))), lit(0L))
            .as(xc))
    val m = side(a, "n_a", "x_a")
      .join(side(b, "n_b", "x_b"), Seq("grp"), "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("x_a", coalesce(col("x_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("x_b", coalesce(col("x_b"), lit(0L)))
    def nD(s: String) = col(s"n_$s").cast("double")
    def xD(s: String) = col(s"x_$s").cast("double")
    // sanitized divisors: an absent side computes on benign stand-ins
    // and is masked by `ok` (the pValue-finisher discipline)
    def nS(s: String) = when(col(s"n_$s") >= 1, nD(s)).otherwise(lit(1.0))
    val ok = col("n_a") >= 1 && col("n_b") >= 1
    val pool = (xD("a") + xD("b")) / (nS("a") + nS("b"))
    val se2 = pool * (lit(1.0) - pool) *
      (lit(1.0) / nS("a") + lit(1.0) / nS("b"))
    val mde = (lit(zAlpha) + lit(zPower)) * sqrt(se2)
    m
      .withColumn("p_a", when(col("n_a") > 0, round(xD("a") / nS("a"), 6)))
      .withColumn("p_b", when(col("n_b") > 0, round(xD("b") / nS("b"), 6)))
      .withColumn("p_pool", when(ok, round(pool, 6)))
      .withColumn("mde_abs", when(ok && se2 > 0.0, round(mde, 6)))
      .withColumn("mde_rel", when(ok && se2 > 0.0 && xD("a") > 0.0,
        round(mde / (xD("a") / nS("a")), 6)))
      .select(col("grp"), col("n_a"), col("n_b"), col("x_a"), col("x_b"),
        col("p_a"), col("p_b"), col("p_pool"), col("mde_abs"),
        col("mde_rel"))
  }

  /** Per-segment mSPRT decision horizon (r16 — [[msprtHorizon]]
    * keyed by a segment column: "which segments' monitors would even
    * fire within the experiment's lifetime at effect δ" — the
    * sequential sizing localized the way q188 localizes the fixed-n
    * MDE): per segment ONE exact-decimal moment census, the SAME
    * pure-integer three-tier candidate grid exploded per segment
    * (segments × ~147k rows — grid cost tracks the segment domain,
    * never the corpus), the q196 ln-space boundary, MIN crossing per
    * segment. Degenerate segments (n < 2, zero variance) report
    * null sigma2/horizon with counts saying why. Returns one row per
    * segment: (grp, n_src, sigma2, delta, tau2, horizon_n).
    */
  def msprtHorizonByGroup(df: DataFrame, group: String, value: Column,
                          delta: Double, tau2: Double,
                          lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"msprtHorizonByGroup: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0,
      s"msprtHorizonByGroup: lnAlpha ($lnAlpha) must be negative")
    val d = graft.util.Portable.dec(value)
    val m = df.filter(col(group).isNotNull && value.isNotNull)
      .groupBy(col(group).as("grp"))
      .agg(count(lit(1)).as("n_src"),
        sum(d).cast(DecimalType(38, 2)).as("__s"),
        sum(d * d).cast(DecimalType(38, 4)).as("__ss"))
    val nD = col("n_src").cast("double")
    // the n−1 divisor is guarded by the same stand-in discipline as
    // the whole-frame form's okv mask (n_src = 1 segments exist)
    val nden = when(col("n_src") >= 2, nD - lit(1.0)).otherwise(lit(1.0))
    val v = (col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD) / nden
    val okv = col("n_src") >= 2
    val vS = when(okv && v > 0.0, v).otherwise(lit(1.0))
    val grid = concat(
      sequence(lit(1L), lit(65536L)),
      sequence(lit(66560L), lit(67108864L), lit(1024L)),
      sequence(lit(67174400L), lit(1073741824L), lit(65536L)))
    val vv = lit(2.0) * vS / col("__n_try").cast("double")
    val lnLam = lit(0.5) * round(log(vv / (vv + lit(tau2))), 12) +
      lit(delta * delta) * lit(tau2) /
        (lit(2.0) * vv * (vv + lit(tau2)))
    m.withColumn("__ok", okv && v > 0.0)
      .withColumn("__n_try", explode(grid))
      .withColumn("__cross", col("__ok") && lnLam > lit(-lnAlpha))
      .groupBy(col("grp"))
      .agg(first(col("n_src")).as("n_src"),
        first(when(col("__ok"), round(v, 0).cast("long"))).as("sigma2"),
        min(when(col("__cross"), col("__n_try"))).as("horizon_n"))
      .withColumn("delta", lit(delta))
      .withColumn("tau2", lit(tau2))
      .select(col("grp"), col("n_src"), col("sigma2"), col("delta"),
        col("tau2"), col("horizon_n"))
  }

  /** Per-segment Cliff's delta (r16 wave 3 — the EFFECT-SIZE column
    * beside the q218 battery's p-value: a segment with 10⁸ rows can
    * have p = 0.000001 on a shift nobody would act on; δ says how
    * OFTEN a random B-era order actually exceeds a random A-era one):
    * δ = P(X > Y) − P(Y > X) over all cross pairs, ties splitting —
    * which is EXACTLY (u2 − n_a·n_b)/(n_a·n_b) on [[mannWhitneyUByGroup]]'s
    * doubled rank sum u2 = 2·U_A (an identity on the exact integers,
    * zero new census work; this is also the rank-biserial
    * correlation). The difference and product stay DECIMAL(38,0)
    * exact before ONE double division, round 6; the magnitude band
    * uses the published Romano thresholds (|δ| < 0.147 negligible,
    * < 0.33 small, < 0.474 medium, else large) compared on the
    * round-6 double — identical branches in both engines. Degenerate
    * segments (an empty side) report null δ with counts saying why.
    * Returns one row per segment: (grp, n_a, n_b, u2, delta,
    * magnitude).
    *
    * Scale shape: the q159 census chain plus per-segment O(1)
    * finishing — nothing new touches the corpus.
    */
  def cliffsDeltaByGroup(a: DataFrame, b: DataFrame, group: String,
                         value: Column, allowWideCensus: Boolean = false,
                         maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val m = mannWhitneyUByGroup(a, b, group, value, allowWideCensus,
      maxExactCensusRows)
    val ok = col("n_a") > 0 && col("n_b") > 0
    val nab = (col("n_a").cast(DecimalType(19, 0)) *
      col("n_b").cast(DecimalType(19, 0))).cast(DecimalType(38, 0))
    val diff = (col("u2").cast(DecimalType(38, 0)) - nab)
      .cast(DecimalType(38, 0))
    // sanitized divisor: an empty side computes on a benign stand-in
    // and is masked by `ok`
    val nabD = when(ok, nab.cast("double")).otherwise(lit(1.0))
    val delta = when(ok, round(diff.cast("double") / nabD, 6))
    m.withColumn("delta", delta)
      .withColumn("magnitude",
        when(delta.isNotNull,
          when(abs(delta) < 0.147, lit("negligible"))
            .when(abs(delta) < 0.33, lit("small"))
            .when(abs(delta) < 0.474, lit("medium"))
            .otherwise(lit("large"))))
      .select(col("grp"), col("n_a"), col("n_b"), col("u2"),
        col("delta"), col("magnitude"))
  }

  /** Per-segment Cohen's d and Hedges' g (r16 wave 3 — the
    * PARAMETRIC effect size beside the q212 battery's p-value:
    * standardized mean difference in pooled-SD units, with the
    * small-sample bias correction): per (segment, side) the q162
    * exact decimal moments, then
    * `d = (mean_a − mean_b)/s_p` with
    * `s_p² = ((SS_a − S_a²/n_a) + (SS_b − S_b²/n_b))/(n_a+n_b−2)`
    * and `g = d·J(ν)`, ν = n_a+n_b−2, where the exact correction
    * `J(ν) = Γ(ν/2)/(√(ν/2)·Γ((ν−1)/2))` runs the SAME Lanczos
    * [[PValues.lnGammaCol]] column the p-value layer uses (its two
    * transcendental ln outputs round-12; everything else IEEE on
    * identical doubles) — in log space,
    * `ln J = lnΓ(ν/2) − ½·round(ln(ν/2), 12) − lnΓ((ν−1)/2)`, one
    * exp, one fixed tree, round 6. Degenerate segments (either side
    * n < 2, zero pooled variance) null d/g with counts reporting;
    * all divisors and the Lanczos argument run on sanitized
    * stand-ins. Returns one row per segment: (grp, n_a, n_b, mean_a,
    * mean_b, sd_pooled, d, g).
    *
    * Scale shape: two map-combinable (segment) censuses + one
    * segment-keyed full-outer join — the q169 statement.
    */
  def cohensDByGroup(a: DataFrame, b: DataFrame, group: String,
                     value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = graft.util.Portable.dec(value)
    def side(df: DataFrame, suf: String): DataFrame =
      df.filter(col(group).isNotNull && value.isNotNull)
        .groupBy(col(group).as("grp"))
        .agg(count(lit(1)).as(s"n_$suf"),
          sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    val m = side(a, "a").join(side(b, "b"), Seq("grp"), "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    def nD(s: String) = col(s"n_$s").cast("double")
    // two stand-in tiers: nM guards the means (valid from n = 1), nS
    // guards the variance/dof divisors (valid from n = 2)
    def nM(s: String) = when(col(s"n_$s") >= 1, nD(s)).otherwise(lit(1.0))
    def nS(s: String) = when(col(s"n_$s") >= 2, nD(s)).otherwise(lit(2.0))
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val sp2 = ((sxx("a") - sx("a") * sx("a") / nS("a")) +
      (sxx("b") - sx("b") * sx("b") / nS("b"))) /
      (nS("a") + nS("b") - lit(2.0))
    val nuS = when(ok, nD("a") + nD("b") - lit(2.0)).otherwise(lit(4.0))
    val dRaw = (sx("a") / nS("a") - sx("b") / nS("b")) /
      sqrt(when(ok && sp2 > 0.0, sp2).otherwise(lit(1.0)))
    val lnJ = PValues.lnGammaCol(nuS / lit(2.0)) -
      lit(0.5) * round(log(nuS / lit(2.0)), 12) -
      PValues.lnGammaCol((nuS - lit(1.0)) / lit(2.0))
    m
      .withColumn("mean_a", when(col("n_a") > 0, round(sx("a") / nM("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(sx("b") / nM("b"), 6)))
      .withColumn("sd_pooled", when(ok && sp2 > 0.0, round(sqrt(sp2), 6)))
      .withColumn("d", when(ok && sp2 > 0.0, round(dRaw, 6)))
      .withColumn("g", when(ok && sp2 > 0.0, round(dRaw * exp(lnJ), 6)))
      .select(col("grp"), col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"), col("sd_pooled"), col("d"), col("g"))
  }

  /** Fixed-horizon sample-size curve (r16 wave 3 — the FIXED-n
    * sibling of [[msprtHorizon]], completing the sizing family: "to
    * see effect δ at α/power, how many samples per arm does a
    * classic two-sample test need" for a whole grid of δ in one
    * statement): ONE exact-decimal moment census of the
    * pre-experiment traffic, then per declared δ
    * `n = ⌈2σ²(z_{1−α/2}+z_power)²/δ²⌉` — the z-sum squares ONCE in
    * Scala and embeds as the SAME 17-digit literal in engine and
    * oracle (the q183 shared-constant rule); ceil on the identical
    * double is exact in both engines. σ² emits as round-0 BIGINT
    * (the q214/q223 rule). Degenerate traffic (n < 2, zero
    * variance) nulls the curve with counts reporting. Returns one
    * row per δ: (delta, n_src, sigma2, n_per_arm).
    *
    * Scale shape: one map-combinable 1-row census + a |deltas|-row
    * explode — corpus cost is the one scan.
    */
  def sampleSizeCurve(df: DataFrame, value: Column, deltas: Seq[Double],
                      zAlpha: Double = zAlpha025,
                      zPower: Double = zPower80): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(deltas.nonEmpty && deltas.forall(_ > 0.0),
      "sampleSizeCurve: deltas must be positive")
    require(zAlpha > 0.0 && zPower >= 0.0,
      "sampleSizeCurve: z constants must be positive")
    val zq = (zAlpha + zPower) * (zAlpha + zPower)
    val d = graft.util.Portable.dec(value)
    val m = df.filter(value.isNotNull).agg(
      count(lit(1)).as("n_src"),
      sum(d).cast(DecimalType(38, 2)).as("__s"),
      sum(d * d).cast(DecimalType(38, 4)).as("__ss"))
    val nD = col("n_src").cast("double")
    val nden = when(col("n_src") >= 2, nD - lit(1.0)).otherwise(lit(1.0))
    val v = (col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") / nD) / nden
    val okv = col("n_src") >= 2 && v > 0.0
    m.withColumn("delta", explode(array(deltas.map(lit): _*)))
      .withColumn("n_per_arm", when(okv,
        ceil(lit(2.0) * v * lit(zq) / (col("delta") * col("delta")))
          .cast("long")))
      .withColumn("sigma2", when(okv, round(v, 0).cast("long")))
      .select(col("delta"), col("n_src"), col("sigma2"), col("n_per_arm"))
  }

  /** Published two-sided α = 0.05 group-sequential FINAL-LOOK
    * constants for K = 1..5 equally-spaced looks (the table every
    * group-sequential text reproduces — Pocock 1977 Table 2 /
    * O'Brien & Fleming 1979; K = 1 is the fixed-test z). The OBF
    * boundary at look k is `c_K·√(K/k)`, the Pocock boundary is the
    * flat `c_K`. Public so the oracle embeds the IDENTICAL literal
    * (the q183 shared-constant rule).
    */
  val obfC: Map[Int, Double] = Map(1 -> zAlpha025, 2 -> 1.977,
    3 -> 2.004, 4 -> 2.024, 5 -> 2.040)
  val pocockC: Map[Int, Double] = Map(1 -> zAlpha025, 2 -> 2.178,
    3 -> 2.289, 4 -> 2.361, 5 -> 2.413)

  /** Group-sequential A/B readout under O'Brien–Fleming or Pocock
    * boundaries (r17 — VERDICT r16 missing #4: q196/q214 cover
    * always-valid CONTINUOUS peeking; most experimentation platforms
    * instead run K SCHEDULED looks against published group-sequential
    * boundaries — this is that readout). Rows carry a `look` index
    * (1..`looks` — the scheduled interim analyses, e.g. week number);
    * per look the CUMULATIVE (all traffic through that look) per-arm
    * exact decimal moments give the Welch-style
    * `z_k = (mean_b − mean_a)/√(s²_a/n_a + s²_b/n_b)` (round 6), and
    * the look's boundary is the published two-sided α = 0.05
    * constant: Pocock `c_K` flat across looks, O'Brien–Fleming
    * `c_K·√(K/k)` (the classic shape — near-unspendable early, ~α at
    * the final look). The constants are the standard published table
    * (Pocock 1977; O'Brien & Fleming 1979; the values every
    * group-sequential text tabulates for K ≤ 5), embedded as shared
    * 17-digit literals; `√(K/k)` is one IEEE op on identical doubles.
    * The decision is ABSORBING: the first look with |z_k| ≥ boundary
    * stops the trial, and later looks report "stopped" regardless of
    * their z. Degenerate looks (either arm n < 2 through that look,
    * zero variance) report null z and cannot stop. Rows with a look
    * index outside 1..K or an arm other than `armA`/`armB` are
    * excluded (stated); looks with NO traffic still report their
    * boundary over the running censuses. Returns one row per look:
    * (look, n_a, n_b, mean_a, mean_b, z, boundary, cross, stop_look,
    * decision).
    *
    * Scale shape: one map-combinable (look, arm) census — the corpus
    * cost — then K-row cumulative windows (bounded by the look
    * schedule, the league-table statement) and a fixed finishing
    * tree.
    */
  def groupSequential(df: DataFrame, arm: Column, value: Column, look: Column,
                      looks: Int, spending: String = "obf",
                      armA: String = "A", armB: String = "B"): DataFrame = {
    gsRequires(looks, spending, armA, armB)
    val grid = df.sparkSession.range(1, looks + 1).select(col("id").as("look"))
    gsDecide(grid
      .join(gsSide(df, None, arm, value, look, looks, armA, "a"), Seq("look"), "left")
      .join(gsSide(df, None, arm, value, look, looks, armB, "b"), Seq("look"), "left"),
      keyCols = Nil, looks, spending)
  }

  /** Per-segment group-sequential readout (r17 wave 2 —
    * [[groupSequential]] keyed by a segment column, joining the keyed
    * experimentation family: scheduled looks run per market/cohort,
    * and each segment's trial stops INDEPENDENTLY at its own first
    * crossing). Identical census/cumulative/boundary/decision
    * expressions by the shared [[gsSide]]/[[gsDecide]] tails, with
    * every window PARTITIONED BY the segment — adding segments adds
    * parallelism, not passes; the look grid exists per segment
    * observed in the input. Returns one row per (segment, look).
    */
  def groupSequentialByGroup(df: DataFrame, group: String, arm: Column,
                             value: Column, look: Column,
                             looks: Int, spending: String = "obf",
                             armA: String = "A", armB: String = "B"): DataFrame = {
    gsRequires(looks, spending, armA, armB)
    val grid = df.filter(col(group).isNotNull)
      .select(col(group).as("grp")).distinct()
      .withColumn("look", explode(sequence(lit(1L), lit(looks.toLong))))
    gsDecide(grid
      .join(gsSide(df, Some(group), arm, value, look, looks, armA, "a"),
        Seq("grp", "look"), "left")
      .join(gsSide(df, Some(group), arm, value, look, looks, armB, "b"),
        Seq("grp", "look"), "left"),
      keyCols = Seq("grp"), looks, spending)
  }

  private def gsRequires(looks: Int, spending: String,
                         armA: String, armB: String): Unit = {
    require(looks >= 1 && looks <= 5,
      s"groupSequential: looks ($looks) must be in 1..5 (the published boundary-constant table)")
    require(spending == "obf" || spending == "pocock",
      s"groupSequential: spending ('$spending') must be 'obf' or 'pocock'")
    require(armA != armB, "groupSequential: armA and armB must differ")
  }

  /** One arm's per-look exact decimal moment census, optionally
    * keyed by a segment column — shared by the whole-frame and keyed
    * forms so the two can never drift.
    */
  private def gsSide(df: DataFrame, grp: Option[String], arm: Column,
                     value: Column, look: Column, looks: Int,
                     a: String, suf: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = graft.util.Portable.dec(value)
    val base = df.filter(value.isNotNull && look.isNotNull &&
      look.cast("long").between(1L, looks.toLong) && arm === a &&
      grp.map(g => col(g).isNotNull).getOrElse(lit(true)))
    val keys = grp.map(g => Seq(col(g).as("grp"))).getOrElse(Nil) :+
      look.cast("long").as("look")
    base.groupBy(keys: _*)
      .agg(count(lit(1)).as(s"__in_$suf"),
        sum(d).cast(DecimalType(38, 2)).as(s"__is_$suf"),
        sum(d * d).cast(DecimalType(38, 4)).as(s"__iss_$suf"))
  }

  /** The shared group-sequential decision tail over the joined look
    * grid — cumulative-through-look exact decimal sums (windows over
    * the K-row schedule, partitioned by `keyCols` when keyed), the
    * Welch-shape z, the published boundary (shared literal), and the
    * absorbing stop. The ONE place these expressions live (the
    * msprtFinishCols discipline).
    */
  private def gsDecide(joined: DataFrame, keyCols: Seq[String],
                       looks: Int, spending: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cFinal = (if (spending == "obf") obfC else pocockC)(looks)
    // cumulative-through-look sums: exact decimal over the K-row
    // schedule per key (bounded by the look schedule — league-table)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("look"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def cum(suf: String): Seq[Column] = Seq(
      sum(coalesce(col(s"__in_$suf"), lit(0L))).over(w).as(s"n_$suf"),
      sum(coalesce(col(s"__is_$suf"), lit(0).cast(DecimalType(38, 2)))).over(w)
        .cast(DecimalType(38, 2)).as(s"__s_$suf"),
      sum(coalesce(col(s"__iss_$suf"), lit(0).cast(DecimalType(38, 4)))).over(w)
        .cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    val m = joined
      .select((keyCols.map(col) :+ col("look")) ++ cum("a") ++ cum("b"): _*)
    def nD(s: String) = col(s"n_$s").cast("double")
    def nM(s: String) = when(col(s"n_$s") >= 1, nD(s)).otherwise(lit(1.0))
    def nS(s: String) = when(col(s"n_$s") >= 2, nD(s)).otherwise(lit(2.0))
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def vn(s: String) =
      ((sxx(s) - sx(s) * sx(s) / nS(s)) / (nS(s) - lit(1.0))) / nS(s)
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val se2 = vn("a") + vn("b")
    // embedded in the oracle as the same %.17g literal (q183 rule)
    val cLit = lit(cFinal)
    val boundary = spending match {
      case "obf" => round(cLit *
        sqrt(lit(looks.toDouble) / col("look").cast("double")), 6)
      case _ => round(cLit, 6)
    }
    val decided = m
      .withColumn("mean_a", when(col("n_a") > 0, round(sx("a") / nM("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(sx("b") / nM("b"), 6)))
      .withColumn("z", when(ok && se2 > 0.0,
        round((sx("b") / nS("b") - sx("a") / nS("a")) / sqrt(when(ok && se2 > 0.0, se2).otherwise(lit(1.0))), 6)))
      .withColumn("boundary", boundary)
      .withColumn("cross", when(col("z").isNotNull, abs(col("z")) >= col("boundary")))
      .withColumn("stop_look",
        min(when(col("cross"), col("look"))).over(
          Window.partitionBy(keyCols.map(col): _*)))
    decided
      .withColumn("decision",
        when(col("stop_look").isNotNull && col("look") > col("stop_look"), lit("stopped"))
          .when(col("cross") === true, lit("reject"))
          .otherwise(lit("continue")))
      .select(keyCols.map(col) ++ Seq(col("look"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("z"), col("boundary"), col("cross"),
        col("stop_look"), col("decision")): _*)
  }

  /** The (segment?, look, arm) exact decimal moment census of a
    * traffic frame — what [[PreparedGroupSequential]] accumulates.
    * Same filters and decimal casts as [[gsSide]] (grouping by arm
    * then filtering one arm ≡ filtering then grouping — decimal sums
    * are exact and order-independent), so the artifact's decide can
    * never drift from the row-input [[groupSequential]].
    */
  private def gsCensus(df: DataFrame, group: Option[String], arm: Column,
                       value: Column, look: Column, looks: Int,
                       armA: String, armB: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = graft.util.Portable.dec(value)
    val keys = group.map(g => Seq(col(g).as("grp"))).getOrElse(Nil) ++
      Seq(look.cast("long").as("look"), arm.as("arm"))
    df.filter(value.isNotNull && look.isNotNull &&
        look.cast("long").between(1L, looks.toLong) &&
        arm.isin(armA, armB) &&
        group.map(g => col(g).isNotNull).getOrElse(lit(true)))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(d).cast(DecimalType(38, 2)).as("s"),
        sum(d * d).cast(DecimalType(38, 4)).as("ss"))
  }

  /** Incrementally-maintained group-sequential monitor state (r17 —
    * the cumulative discipline applied to the scheduled-looks member
    * the same session it was born: a real trial's looks ARRIVE one
    * at a time, so the monitor must absorb traffic increments and
    * re-decide, never rescan). Holds the (segment?, look, arm) exact
    * decimal moment census; absorbs by exact addition, so
    * `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)` row-for-row and
    * [[decide]] over the artifact ≡ the batch
    * [[groupSequential]]/[[groupSequentialByGroup]] over all rows so
    * far (both spec-pinned; the keyed grid is census-observed
    * segments — a segment with no admissible traffic yet does not
    * exist in the artifact). State is O(segments × looks × 2),
    * never the traffic.
    */
  final case class PreparedGroupSequential private[graft] (
      census: DataFrame, group: Option[String], looks: Int,
      spending: String, armA: String, armB: String, reliable: Boolean) {

    private def keyNames: Seq[String] = group.map(_ => "grp").toSeq

    /** Absorb a traffic increment by exact census addition. */
    def absorb(increment: DataFrame, arm: Column, value: Column, look: Column,
               checkpointDir: Option[String] = None): PreparedGroupSequential = {
      import org.apache.spark.sql.types.DecimalType
      val ckp = lineageBreaker(checkpointDir)
      val inc = gsCensus(increment, group, arm, value, look, looks, armA, armB)
      val keys = (keyNames ++ Seq("look", "arm")).map(col)
      copy(census = ckp(census.unionByName(inc).groupBy(keys: _*)
        .agg(sum(col("n")).as("n"),
          sum(col("s")).cast(DecimalType(38, 2)).as("s"),
          sum(col("ss")).cast(DecimalType(38, 4)).as("ss"))),
        reliable = reliable && checkpointDir.isDefined)
    }

    /** The readout over ALL traffic absorbed so far — the shared
      * [[gsDecide]] tail (identical boundary/z/stop expressions to
      * the batch forms by shared code).
      */
    def decide(): DataFrame = {
      def side(a: String, suf: String): DataFrame =
        census.filter(col("arm") === a).select(
          keyNames.map(col) ++ Seq(col("look"), col("n").as(s"__in_$suf"),
            col("s").as(s"__is_$suf"), col("ss").as(s"__iss_$suf")): _*)
      val grid = group match {
        case Some(_) => census.select(col("grp")).distinct()
          .withColumn("look", explode(sequence(lit(1L), lit(looks.toLong))))
        case None => census.sparkSession.range(1, looks + 1)
          .select(col("id").as("look"))
      }
      gsDecide(grid
        .join(side(armA, "a"), keyNames :+ "look", "left")
        .join(side(armB, "b"), keyNames :+ "look", "left"),
        keyNames, looks, spending)
    }

    /** Persist durably (census + kind-tagged meta). */
    def save(path: String): Unit = {
      census.write.mode("overwrite").parquet(s"$path/census")
      ArtifactIO.writeMeta(census.sparkSession, path, "group_sequential",
        Seq("looks" -> looks.toString, "spending" -> spending,
          "armA" -> armA, "armB" -> armB,
          "group" -> group.getOrElse(""), "fmt" -> "1"))
    }
  }

  /** Build a [[PreparedGroupSequential]] from a traffic frame; its
    * census IS [[gsCensus]] of the frame (shared code).
    */
  def prepareGroupSequential(df: DataFrame, arm: Column, value: Column,
                             look: Column, looks: Int,
                             spending: String = "obf",
                             armA: String = "A", armB: String = "B",
                             group: Option[String] = None,
                             checkpointDir: Option[String] = None): PreparedGroupSequential = {
    gsRequires(looks, spending, armA, armB)
    val ckp = lineageBreaker(checkpointDir)
    PreparedGroupSequential(
      ckp(gsCensus(df, group, arm, value, look, looks, armA, armB)),
      group, looks, spending, armA, armB, checkpointDir.isDefined)
  }

  /** Load a [[PreparedGroupSequential]] persisted by its `save`. */
  def loadGroupSequential(spark: org.apache.spark.sql.SparkSession,
                          path: String): PreparedGroupSequential = {
    val m = ArtifactIO.readMeta(spark, path, "group_sequential")
    val fmt = m.getOrElse("fmt", "<missing>")
    require(fmt == "1",
      s"loadGroupSequential: artifact at $path has format '$fmt', expected '1'")
    val g = ArtifactIO.field(m, path, "group")
    PreparedGroupSequential(
      spark.read.parquet(s"$path/census"),
      if (g.isEmpty) None else Some(g),
      ArtifactIO.field(m, path, "looks").toInt,
      ArtifactIO.field(m, path, "spending"),
      ArtifactIO.field(m, path, "armA"), ArtifactIO.field(m, path, "armB"),
      reliable = true)
  }

  /** Per-segment seeded permutation test (r17 — VERDICT r16 missing
    * #3: every finisher in the decision layer is ASYMPTOTIC — MWU's
    * normal approximation, KS's asymptotic Q, Welch's t — fine at
    * census scale, shaky at per-segment n ≲ 20; this is the
    * small-n-valid member: the null distribution is built by
    * RESHUFFLING the observed labels, no distributional assumption
    * at all). Per segment: pool both sides' values, generate
    * `bPerms` deterministic label permutations from the q171
    * seeded-hash discipline (two md5-derived 28-bit hashes per row,
    * the affine family u_b = (h1 + b·h2) mod 2²⁸ — overflow-free,
    * bit-portable), rank each permutation's u within the segment and
    * assign the first n_a ranks to side A. The test statistic avoids
    * floating point ENTIRELY: with fixed n_a, n_b, and pooled total
    * T, the mean difference ordering is the exact integer
    * `stat = |S_A·(n_a+n_b) − T·n_a|` (the mean difference scaled by
    * n_a·n_b — monotone in |mean_a − mean_b|), compared in
    * DECIMAL(38,0), so the ≥-count replays bit-for-bit. The
    * empirical two-sided p is the standard add-one estimate
    * `(1 + #{b : stat_b ≥ stat_obs}) / (B + 1)` — never exactly 0,
    * valid by exchangeability. Degenerate segments (either side
    * empty) report null p with counts saying why. Returns one row
    * per segment: (grp, n_a, n_b, b_perms, n_ge, diff_obs, p).
    *
    * `id` must uniquely identify rows WITHIN each side (it seeds the
    * per-row hashes; the side tag is mixed in, so cross-side id
    * collisions are fine).
    *
    * Scale shape: ONE pooled scan + the ×B explode — this is the
    * SMALL-SEGMENT tool (the whole point is n ≲ a few hundred per
    * segment, where the asymptotic p is invalid), and the gate
    * enforces it: a segment past `maxSegmentRows` fails loudly with
    * the routing message (use the asymptotic battery there — at that
    * n it is valid) instead of silently exploding a corpus ×B. The
    * rank windows walk (segment × B) partitions of segment-n rows
    * each — embarrassingly parallel.
    */
  def permutationPByGroup(a: DataFrame, b: DataFrame, group: String,
                          id: Column, value: Column,
                          bPerms: Int = 199, seed: Long = 7L,
                          allowWideSegments: Boolean = false,
                          maxSegmentRows: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(bPerms >= 19 && bPerms <= 9999,
      s"permutationPByGroup: bPerms ($bPerms) must be in 19..9999")
    val d38 = DecimalType(38, 0)
    def sideRows(df: DataFrame, s: String) =
      df.filter(col(group).isNotNull && value.isNotNull && id.isNotNull)
        .select(col(group).as("grp"), id.cast("string").as("__id"),
          (graft.util.Portable.dec(value) * 100).cast("long").as("__c"),
          lit(s).as("__side"))
    val pooled = sideRows(a, "a").unionByName(sideRows(b, "b"))
    // the q171 two-hash affine family: h < 2²⁸, b ≤ 9999 ⇒ h1 + b·h2
    // < 2⁴² — overflow-free in a long under ANSI
    def h28(tag: String): Column =
      conv(substring(md5(concat(lit(s"$tag:$seed:"), col("__side"),
        lit(":"), col("__id")).cast("binary")), 1, 7), 16, 10).cast("long")
    val hashed = pooled.withColumn("__h1", h28("pm1")).withColumn("__h2", h28("pm2"))
    val cen = pooled.groupBy(col("grp")).agg(
      count(when(col("__side") === "a", lit(1))).as("n_a"),
      count(when(col("__side") === "b", lit(1))).as("n_b"),
      sum(when(col("__side") === "a", col("__c")).otherwise(lit(0L)).cast(d38))
        .cast(d38).as("__sa"),
      sum(col("__c").cast(d38)).cast(d38).as("__t"))
    val statOf = (sA: Column) =>
      abs(sA * (col("n_a") + col("n_b")).cast(d38) -
        col("__t") * col("n_a").cast(d38)).cast(d38)
    val cenObs = cen.withColumn("__statObs", statOf(col("__sa")))
    val wRank = Window.partitionBy(col("grp"), col("__b"))
      .orderBy(col("__u"), col("__side"), col("__id"))
    val rk0 = row_number().over(wRank)
    val withCen = hashed
      .withColumn("__b", explode(sequence(lit(1), lit(bPerms))))
      .withColumn("__u", pmod(col("__h1") + col("__b") * col("__h2"),
        lit(268435456L)))
      .join(broadcast(cenObs), Seq("grp"))
    // the small-n gate rides the rank every permutation sum consumes
    // (prune-proof): past the cap the ×B explode is the wrong tool —
    // at that n the asymptotic battery is valid
    val gatedRk = if (allowWideSegments) rk0
      else when(col("n_a") + col("n_b") <= lit(maxSegmentRows), rk0)
        .otherwise(raise_error(concat(
          lit("permutationPByGroup: segment "), col("grp").cast("string"),
          lit(" holds "), (col("n_a") + col("n_b")).cast("string"),
          lit(s" rows (> maxSegmentRows = $maxSegmentRows) — the permutation " +
            "null is the SMALL-n tool; use the asymptotic battery " +
            "(governanceBatteryByGroup) at this n, or acknowledge with " +
            "allowWideSegments = true"))))
    val counted = withCen
      .withColumn("__rk", gatedRk)
      .filter(col("__rk") <= col("n_a"))
      .groupBy(col("grp"), col("__b"))
      .agg(sum(col("__c").cast(d38)).cast(d38).as("__sab"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        first(col("__t")).as("__t"), first(col("__statObs")).as("__statObs"))
      .withColumn("__stat", statOf(col("__sab")))
      .groupBy(col("grp"))
      .agg(count(when(col("__stat") >= col("__statObs"), lit(1))).as("n_ge"))
    val ok = col("n_a") > 0 && col("n_b") > 0
    def nM(c: Column) = when(c >= 1, c.cast("double")).otherwise(lit(1.0))
    cenObs.join(counted, Seq("grp"), "left")
      .withColumn("b_perms", lit(bPerms.toLong))
      .withColumn("diff_obs", when(ok, round(
        (col("__sa").cast("double") / nM(col("n_a")) -
          (col("__t") - col("__sa")).cast("double") / nM(col("n_b"))) /
          lit(100.0), 6)))
      .withColumn("p", when(ok,
        round((col("n_ge") + lit(1L)).cast("double") /
          lit((bPerms + 1).toDouble), 6)))
      .select(col("grp"), col("n_a"), col("n_b"), col("b_perms"),
        col("n_ge"), col("diff_obs"), col("p"))
  }

  /** Cross-test governance battery (r16 — the ONE-FRAME decision
    * readout the q221 gate runs, factored here so the live
    * [[graft.streaming.Streams.governanceStream]] and the batch gate
    * share every expression): Welch t (parametric mean shift) on
    * `meanValue`, Mann–Whitney z (rank shift) and KS D
    * (full-distribution shift) on the integer `rankValue`, each per
    * `group` segment between frames `a` (baseline/control) and `b`
    * (current/treatment), each finished through its portable p
    * ([[PValues.pValueT]], the Z² ~ χ²₁ identity through
    * [[PValues.pValueChiSq]], [[PValues.pValueKs]]), the UNION
    * adjusted as one battery under BOTH controls —
    * BH `p_adj`/`reject` (monitoring: expected false-alert fraction
    * ≤ α) and Holm `p_holm`/`reject_fwer` (ship decision: chance of
    * ANY false alert ≤ α). Per-test adjustment would multiply-count
    * the α — the single budget is this operator's reason to exist.
    * Returns one row per (test ∈ {welch_t, mwu_z, ks}, segment):
    * (test, grp, stat, p, bh_rank, m_tests, p_adj, reject, p_holm,
    * reject_fwer).
    *
    * Scale shape: three census-bounded batteries + a (3 × segments)-
    * row union + the league-table BH/Holm windows — nothing
    * corpus-sized after the censuses.
    */
  def governanceBatteryByGroup(a: DataFrame, b: DataFrame, group: String,
                               meanValue: Column,
                               rankValue: Column,
                               allowWideCensus: Boolean = false,
                               maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // r17 optimization round (guide §2.4 — remove redundant passes):
    // ONE combined census per side, materialized once and fanned to
    // the three shared finisher tails, instead of six separate row
    // aggregations (Welch/MWU/KS × two sides). The rank key is the
    // raw long cast (the exact path, bit-identical to the per-test
    // censuses it replaces) and the finishers are the same shared
    // tails the artifact battery uses, so every emitted value is
    // unchanged — the q221 gate re-verifies.
    def cen(df: DataFrame) = lineageBreaker(None)(
      governanceCombinedCensus(df, group, meanValue,
        rankValue.cast("long"), rankValue))
    val caC = cen(a); val cbC = cen(b)
    def tag(m: DataFrame, suf: String) = m.select(col("grp"),
      col("n").as(s"n_$suf"),
      col("s").cast(DecimalType(38, 2)).as(s"__s_$suf"),
      col("ss").cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    val welch = welchTFinishFromSides(
      tag(governanceMomentsOf(caC), "a").join(tag(governanceMomentsOf(cbC), "b"),
        Seq("grp"), "full_outer"))
    val rankMerged = governanceRanksOf(caC)
      .select(col("grp"), col("v"), col("c").as("ca"))
      .join(governanceRanksOf(cbC).select(col("grp"), col("v"), col("c").as("cb")),
        Seq("grp", "v"), "full_outer")
      .withColumn("ca", coalesce(col("ca"), lit(0L)))
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
    // the rank-window pass materializes ONCE and serves both rank
    // tests (r17 optimization round — it was the battery's dominant
    // stage, computed twice: once inside each finisher)
    val st = lineageBreaker(None)(governanceRankStats(rankMerged))
    governanceBatteryFinish(welch,
      mannWhitneyUFinishFromStats(st, allowWideCensus, maxExactCensusRows),
      ksStatisticFinishFromStats(st, allowWideCensus, maxExactCensusRows))
  }

  /** The shared battery decision tail over the three per-segment
    * statistic frames — [[welchTByGroup]]'s (grp, …, t, df),
    * [[mannWhitneyUByGroup]]'s (grp, …, z) and
    * [[ksStatisticByGroup]]'s (grp, n_a, n_b, …, d_stat) — the ONE
    * place the finisher/union/BH/Holm expressions live, so the
    * row-input [[governanceBatteryByGroup]] and the artifact-input
    * [[governanceBatteryFromPrepared]] can never silently diverge
    * (the msprtFinishCols discipline).
    */
  private[graft] def governanceBatteryFinish(welch: DataFrame,
                                             mwuIn: DataFrame,
                                             ksIn: DataFrame): DataFrame = {
    val wp = PValues.pValueT(welch, "t", "df", Seq("grp"))
      .select(lit("welch_t").as("test"), col("grp"), col("t").as("stat"),
        col("p"))
    val mwu = mwuIn
      .withColumn("z2", col("z") * col("z"))
      .withColumn("one_dof", lit(1.0))
    val mp = PValues.pValueChiSq(mwu, "z2", "one_dof", Seq("grp"))
      .select(lit("mwu_z").as("test"), col("grp"), col("z").as("stat"),
        col("p"))
    val ks = ksIn.withColumn("lam",
      PValues.ksLambda(col("d_stat"), col("n_a"), col("n_b")))
    val kp = PValues.pValueKs(ks, "lam", Seq("grp"))
      .select(lit("ks").as("test"), col("grp"), col("d_stat").as("stat"),
        col("p"))
    val battery = wp.unionByName(mp).unionByName(kp)
      .withColumn("gkey", concat_ws("|", col("test"), col("grp")))
    PValues.holmAdjust(
        PValues.fdrAdjust(battery, "p", Seq("gkey")), "p", Seq("gkey"))
      .withColumn("reject", when(col("p").isNotNull, col("p_adj") < lit(0.05)))
      .withColumn("reject_fwer",
        when(col("p").isNotNull, col("p_holm") < lit(0.05)))
      .select(col("test"), col("grp"), col("stat"), col("p"),
        col("bh_rank"), col("m_tests"), col("p_adj"), col("reject"),
        col("p_holm"), col("reject_fwer"))
  }

  /** ONE-pass combined governance census (r17 optimization round,
    * guide §1.2/§2.4 — the Welch moments census and the MWU/KS rank
    * census are both exact-additive roll-ups of this finer frame, so
    * computing them as two separate corpus aggregations paid a whole
    * extra pass): per (segment, rank key) bucket, the rank COUNT plus
    * the exact decimal moment partials of `meanValue`. `vCol` is the
    * caller's rank key (the q108 floor bucket for the prepared
    * artifact, the raw long cast for the exact row battery); rows
    * whose rankValue is null land in the `v = null` bucket so their
    * moments still count, and rows with both values null are dropped
    * (they contribute to neither census). [[governanceMomentsOf]] /
    * [[governanceRanksOf]] derive the two classic censuses
    * bit-identically (long/decimal addition is associative — the same
    * exactness argument that makes absorb ≡ prepare-union).
    *
    * CONTRACT (ADVICE r17 #1): `vCol` must be null exactly when
    * `rankValue` is null — i.e. the rank key must be a TOTAL function
    * of a non-null rankValue. Every engine call site passes the raw
    * long cast of a NUMERIC rank column or its q108 floor bucket
    * (total on numerics), so the contract holds throughout; a caller
    * whose rank column can be non-null yet cast to null (non-numeric
    * strings, decimal-to-long overflow under non-ANSI) would conflate
    * such rows with the moment-only `v = null` bucket and silently
    * lose rank counts relative to the standalone MWU/KS forms — route
    * such data through an explicit pre-cast + isNotNull filter
    * instead.
    */
  private[graft] def governanceCombinedCensus(df: DataFrame, group: String,
                                              meanValue: Column, vCol: Column,
                                              rankValue: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = graft.util.Portable.dec(meanValue)
    df.filter(col(group).isNotNull &&
        (meanValue.isNotNull || rankValue.isNotNull))
      .groupBy(col(group).as("grp"),
        when(rankValue.isNotNull, vCol).as("v"))
      .agg(count(when(rankValue.isNotNull, lit(1))).as("c"),
        count(when(meanValue.isNotNull, lit(1))).as("n"),
        sum(d).cast(DecimalType(38, 2)).as("s"),
        sum(d * d).cast(DecimalType(38, 4)).as("ss"))
  }

  /** The per-segment Welch moments of a combined census — bit-equal
    * to aggregating the rows directly (exact addition; a segment with
    * no non-null meanValue row drops, exactly as the row aggregate
    * drops it).
    */
  private[graft] def governanceMomentsOf(census: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    census.groupBy(col("grp"))
      .agg(sum(col("n")).as("n"),
        sum(col("s")).cast(DecimalType(38, 2)).as("s"),
        sum(col("ss")).cast(DecimalType(38, 4)).as("ss"))
      .filter(col("n") > 0)
      .select(col("grp"), col("n"), col("s"), col("ss"))
  }

  /** The (grp, v, c) rank census of a combined census (the `v = null`
    * bucket holds moment-only rows and is not part of the rank
    * census).
    */
  private[graft] def governanceRanksOf(census: DataFrame): DataFrame =
    census.filter(col("v").isNotNull).select(col("grp"), col("v"), col("c"))

  /** Incrementally-maintained governance census pair (r17 — VERDICT
    * r16 missing #1/top-next: [[graft.streaming.Streams
    * .governanceStream]] scores each trigger's batch ALONE against
    * the frozen baseline, so a low-traffic trigger carries n of a
    * few hundred and the battery either misses real drift or fires
    * on noise; THIS artifact absorbs every trigger into cumulative
    * censuses, so the battery is decided over ALL traffic so far —
    * the mSPRT/PreparedMoments cumulative discipline applied to the
    * decision stream). Holds the per-segment Welch moments and the
    * (segment, bucketed-rank-value) count census; both absorb by
    * exact addition, so `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)`
    * row-for-row — zero additional error, no corpus rescan
    * (spec-pinned). [[governanceBatteryFromPrepared]] decides the
    * full battery between two artifacts.
    */
  final case class PreparedGovernance private[graft] (
      moments: DataFrame, ranks: DataFrame, group: String,
      bucketWidth: Long, reliable: Boolean,
      private[graft] val combined: Option[DataFrame] = None) {

    /** Absorb a traffic increment by exact census addition (r17
      * optimization round: one combined-census scan of the increment
      * and ONE materialization when the artifact carries its combined
      * census — a loaded artifact has only the two classic frames and
      * keeps the two-frame merge).
      */
    def absorb(increment: DataFrame, meanValue: Column, rankValue: Column,
               checkpointDir: Option[String] = None): PreparedGovernance = {
      val ckp = lineageBreaker(checkpointDir)
      import org.apache.spark.sql.types.DecimalType
      val ic = governanceCombinedCensus(increment, group, meanValue,
        rankBucket(rankValue, bucketWidth), rankValue)
      combined match {
        case Some(c0) =>
          val c2 = ckp(c0.unionByName(ic).groupBy(col("grp"), col("v"))
            .agg(sum(col("c")).as("c"), sum(col("n")).as("n"),
              sum(col("s")).cast(DecimalType(38, 2)).as("s"),
              sum(col("ss")).cast(DecimalType(38, 4)).as("ss")))
          copy(moments = governanceMomentsOf(c2), ranks = governanceRanksOf(c2),
            reliable = reliable && checkpointDir.isDefined, combined = Some(c2))
        case None =>
          val icc = ckp(ic)
          val m2 = ckp(moments.unionByName(governanceMomentsOf(icc))
            .groupBy(col("grp"))
            .agg(sum(col("n")).as("n"),
              sum(col("s")).cast(DecimalType(38, 2)).as("s"),
              sum(col("ss")).cast(DecimalType(38, 4)).as("ss")))
          val r2 = ckp(ranks.unionByName(governanceRanksOf(icc))
            .groupBy(col("grp"), col("v"))
            .agg(sum(col("c")).as("c")))
          copy(moments = m2, ranks = r2,
            reliable = reliable && checkpointDir.isDefined)
      }
    }

    /** Persist durably (both censuses + kind-tagged meta). */
    def save(path: String): Unit = {
      moments.write.mode("overwrite").parquet(s"$path/moments")
      ranks.write.mode("overwrite").parquet(s"$path/ranks")
      ArtifactIO.writeMeta(moments.sparkSession, path, "governance",
        Seq("group" -> group, "bucketWidth" -> bucketWidth.toString,
          "fmt" -> "1"))
    }
  }

  /** Build a [[PreparedGovernance]] from a traffic corpus; its
    * censuses ARE the exact roll-ups of the corpus'
    * [[governanceCombinedCensus]] (shared code).
    */
  def prepareGovernance(corpus: DataFrame, group: String,
                        meanValue: Column, rankValue: Column,
                        bucketWidth: Long = 1L,
                        checkpointDir: Option[String] = None): PreparedGovernance = {
    require(bucketWidth >= 1,
      s"prepareGovernance: bucketWidth ($bucketWidth) must be >= 1")
    val ckp = lineageBreaker(checkpointDir)
    // r17 optimization round: ONE corpus scan + ONE materialization
    // (was two of each); the two classic censuses are exact-additive
    // derivations of the materialized combined census
    val cen = ckp(governanceCombinedCensus(corpus, group, meanValue,
      rankBucket(rankValue, bucketWidth), rankValue))
    PreparedGovernance(governanceMomentsOf(cen), governanceRanksOf(cen),
      group, bucketWidth, checkpointDir.isDefined, Some(cen))
  }

  /** Load a [[PreparedGovernance]] persisted by its `save`. */
  def loadGovernance(spark: org.apache.spark.sql.SparkSession,
                     path: String): PreparedGovernance = {
    val m = ArtifactIO.readMeta(spark, path, "governance")
    val fmt = m.getOrElse("fmt", "<missing>")
    require(fmt == "1",
      s"loadGovernance: artifact at $path has format '$fmt', expected '1'")
    PreparedGovernance(
      spark.read.parquet(s"$path/moments"),
      spark.read.parquet(s"$path/ranks"),
      ArtifactIO.field(m, path, "group"),
      ArtifactIO.field(m, path, "bucketWidth").toLong, reliable = true)
  }

  /** The full governance battery (Welch + MWU + KS per segment,
    * portable p-values, one BH + Holm budget — identical expressions
    * to [[governanceBatteryByGroup]] by the shared
    * [[governanceBatteryFinish]]/[[welchTFinishFromSides]]/
    * [[mannWhitneyUFinishFromCensus]]/[[ksStatisticFinishFromCensus]]
    * tails) decided between two PINNED census artifacts: `baseline`
    * as side A, `current` as side B. With `current` built by
    * absorbing every trigger so far, this IS the cumulative decision
    * readout — each trigger decides over ALL traffic, not its own
    * underpowered batch. Requires both artifacts to share the
    * segment column and bucket width (a mixed-resolution compare
    * would be silently wrong — enforced).
    *
    * Scale shape: censuses in, censuses out — no corpus anywhere;
    * the battery walks segment-bounded frames only.
    */
  def governanceBatteryFromPrepared(baseline: PreparedGovernance,
                                    current: PreparedGovernance,
                                    allowWideCensus: Boolean = false,
                                    maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(baseline.group == current.group,
      s"governanceBatteryFromPrepared: segment columns differ " +
        s"('${baseline.group}' vs '${current.group}')")
    require(baseline.bucketWidth == current.bucketWidth,
      s"governanceBatteryFromPrepared: bucket widths differ " +
        s"(${baseline.bucketWidth} vs ${current.bucketWidth})")
    def tag(m: DataFrame, suf: String) = m.select(col("grp"),
      col("n").as(s"n_$suf"),
      col("s").cast(DecimalType(38, 2)).as(s"__s_$suf"),
      col("ss").cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    val welch = welchTFinishFromSides(
      tag(baseline.moments, "a").join(tag(current.moments, "b"),
        Seq("grp"), "full_outer"))
    val rankMerged = baseline.ranks.select(col("grp"), col("v"), col("c").as("ca"))
      .join(current.ranks.select(col("grp"), col("v"), col("c").as("cb")),
        Seq("grp", "v"), "full_outer")
      .withColumn("ca", coalesce(col("ca"), lit(0L)))
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
    // the rank-window pass materializes ONCE and serves both rank
    // tests (r17 optimization round — it was the battery's dominant
    // stage, computed twice: once inside each finisher)
    val st = lineageBreaker(None)(governanceRankStats(rankMerged))
    governanceBatteryFinish(welch,
      mannWhitneyUFinishFromStats(st, allowWideCensus, maxExactCensusRows),
      ksStatisticFinishFromStats(st, allowWideCensus, maxExactCensusRows))
  }

  /** Mixture sequential probability ratio test (r15 — the
    * ALWAYS-VALID inference member of the experimentation-governance
    * family beside [[mdeReadout]]/[[srmCheck]]/[[welchT]]: a fixed-n
    * t test's p-value is invalid the moment anyone peeks early, and
    * every live dashboard peeks — the mSPRT's likelihood-ratio
    * martingale lets the monitor read the experiment CONTINUOUSLY
    * with the type-I error still controlled at α, the published
    * always-valid-inference construction of Robbins' power-one tests
    * with a normal mixing prior N(0, τ²) over the effect).
    *
    * Per side the q162 exact decimal moments (n, Σx, Σx² over the
    * [[graft.util.Portable]] view — order-free under any
    * partitioning); with Δ = mean_b − mean_a and
    * V = s²_a/n_a + s²_b/n_b the mixture likelihood ratio is
    * `Λ = √(V/(V+τ²)) · exp(Δ²·τ² / (2·V·(V+τ²)))`, computed and
    * emitted in LOG space — `ln Λ = ½·ln(V/(V+τ²)) + Δ²·τ²/(2V(V+τ²))`
    * with the one ln term rounded at 12 before the fixed tree (ln is
    * the last-ulp-risky primitive — the q190/q73 treatment; √ and
    * arithmetic are IEEE-exact), total round 6. The always-valid
    * p-value is `min(1, 1/Λ)`, emitted as `ln_p = −max(0, ln Λ)`
    * (round 6 — no exp call anywhere, so nothing non-portable leaves
    * the plan), and the α-level decision is the INTEGER-free exact
    * comparison `ln Λ > −ln α` against the caller-supplied
    * `lnAlpha` literal (embed the same 17-digit literal in the
    * oracle — the q136/q183 shared-constant rule). Degenerate sides
    * (n < 2, zero variance both sides) report null statistics with
    * counts saying why. Returns ONE row:
    * (n_a, n_b, mean_a, mean_b, delta, ln_lambda, ln_p, reject).
    *
    * Scale shape: two map-combinable 1-row moment aggregates + one
    * 1×1 cross (the q162 statement) — the monitor re-runs this at
    * every peek and each run is one scan of each side.
    */
  def msprt(a: DataFrame, b: DataFrame, value: Column,
            tau2: Double, lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"msprt: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0, s"msprt: lnAlpha ($lnAlpha) must be negative (ln of α < 1)")
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull).agg(
        count(lit(1)).as(s"n_$suf"),
        sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
        sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    msprtFinish(side(a, "a").crossJoin(broadcast(side(b, "b"))), tau2, lnAlpha)
  }

  /** The shared mSPRT finishing tree over one crossed 1-row moment
    * frame (n_a, __s_a, __ss_a, n_b, __s_b, __ss_b) — both the
    * row-input [[msprt]] and the artifact-input [[msprtFromMoments]]
    * end here, so the two are value-identical by shared code.
    */
  private def msprtFinish(sides: DataFrame, tau2: Double,
                          lnAlpha: Double): DataFrame =
    msprtFinishCols(sides, tau2, lnAlpha, keyCols = Nil)

  /** The per-row mSPRT likelihood-ratio finishing expressions over a
    * frame carrying (n_a, __s_a, __ss_a, n_b, __s_b, __ss_b), with
    * optional leading key columns carried through — the ONE place
    * the ln-space tree lives, applied by the 1-row forms ([[msprt]]
    * / [[msprtFromMoments]]) after their scalar cross and by the
    * keyed [[msprtByGroup]] after its FULL OUTER merge, so a future
    * edit (rounding, guards, thresholds) can never silently diverge
    * the keyed form from the whole-frame form and its oracle.
    */
  private def msprtFinishCols(sides: DataFrame, tau2: Double,
                              lnAlpha: Double,
                              keyCols: Seq[String]): DataFrame = {
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    val vv = v("a") / nD("a") + v("b") / nD("b")
    val delta = mean("b") - mean("a")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val lnTerm = round(log(vv / (vv + lit(tau2))), 12)
    val lnLambda = lit(0.5) * lnTerm +
      delta * delta * lit(tau2) / (lit(2.0) * vv * (vv + lit(tau2)))
    sides
      .withColumn("mean_a", when(col("n_a") > 0, round(mean("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(mean("b"), 6)))
      .withColumn("delta", when(col("n_a") > 0 && col("n_b") > 0,
        round(delta, 6)))
      .withColumn("ln_lambda", when(ok && vv > 0.0, round(lnLambda, 6)))
      .withColumn("ln_p", when(ok && vv > 0.0,
        // branch instead of -greatest(0, x): negating a non-positive
        // statistic would emit IEEE -0.0, which engines render apart
        when(round(lnLambda, 6) > 0.0, -round(lnLambda, 6))
          .otherwise(lit(0.0))))
      .withColumn("reject", when(ok && vv > 0.0,
        round(lnLambda, 6) > lit(-lnAlpha)))
      .select(keyCols.map(col) ++ Seq(col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("delta"), col("ln_lambda"),
        col("ln_p"), col("reject")): _*)
  }

  /** Always-valid confidence interval for the mean difference (r17 —
    * the INVERSION of [[msprt]]'s mixture test, the other half of
    * always-valid inference (Johari, Pekelis & Walsh's "Peeking at
    * A/B tests" construction): the dashboard that may peek at the
    * p-value any time needs the matching CI that is simultaneously
    * valid at every peek. The interval is every δ₀ the mixture test
    * does NOT reject: `Δ̂ ± √( V(V+τ²)/τ² · ln((V+τ²)/(V·α²)) )` —
    * wider than the fixed-n CI by design (the price of unlimited
    * peeking), shrinking toward it as n grows. Same moment censuses,
    * same V and Δ expressions as [[msprtFinishCols]] (column-for-
    * column), the one ln rounded at 12 (`ln((V+τ²)/V) − 2·lnα` as a
    * fixed tree with the caller's lnAlpha literal), total round 6.
    * The DEFINING duality — reject(α) ⟺ 0 ∉ [ci_lo, ci_hi] — is
    * spec-pinned against [[msprt]] on both sides of the boundary.
    * Degenerate sides report null statistics with counts saying why.
    * Returns (keys…, n_a, n_b, mean_a, mean_b, delta, radius,
    * ci_lo, ci_hi).
    */
  private def avciFinishCols(sides: DataFrame, tau2: Double,
                             lnAlpha: Double,
                             keyCols: Seq[String]): DataFrame = {
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    val vv = v("a") / nD("a") + v("b") / nD("b")
    val delta = mean("b") - mean("a")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val radius = sqrt(vv * (vv + lit(tau2)) / lit(tau2) *
      (round(log((vv + lit(tau2)) / vv), 12) - lit(2.0) * lit(lnAlpha)))
    sides
      .withColumn("mean_a", when(col("n_a") > 0, round(mean("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(mean("b"), 6)))
      .withColumn("delta", when(col("n_a") > 0 && col("n_b") > 0,
        round(delta, 6)))
      .withColumn("radius", when(ok && vv > 0.0, round(radius, 6)))
      .withColumn("ci_lo", when(ok && vv > 0.0, round(delta - radius, 6)))
      .withColumn("ci_hi", when(ok && vv > 0.0, round(delta + radius, 6)))
      .select(keyCols.map(col) ++ Seq(col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("delta"), col("radius"),
        col("ci_lo"), col("ci_hi")): _*)
  }

  /** Whole-frame always-valid CI — see [[avciFinishCols]]; the
    * [[msprt]] input shape (two frames, one metric), one row out.
    */
  def alwaysValidCi(a: DataFrame, b: DataFrame, value: Column,
                    tau2: Double,
                    lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"alwaysValidCi: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0, s"alwaysValidCi: lnAlpha ($lnAlpha) must be negative")
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull).agg(
        count(lit(1)).as(s"n_$suf"),
        sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
        sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    avciFinishCols(side(a, "a").crossJoin(broadcast(side(b, "b"))),
      tau2, lnAlpha, keyCols = Nil)
  }

  /** Per-segment always-valid CI — [[alwaysValidCi]] keyed the way
    * [[msprtByGroup]] is (FULL OUTER arm merge, one-armed segments
    * observable with null statistics).
    */
  def alwaysValidCiByGroup(a: DataFrame, b: DataFrame, group: String,
                           value: Column, tau2: Double,
                           lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"alwaysValidCiByGroup: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0, s"alwaysValidCiByGroup: lnAlpha ($lnAlpha) must be negative")
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull && col(group).isNotNull)
        .groupBy(col(group).as("grp")).agg(
          count(lit(1)).as(s"n_$suf"),
          sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    avciFinishCols(
      side(a, "a").join(side(b, "b"), Seq("grp"), "full_outer")
        .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
        .withColumn("n_b", coalesce(col("n_b"), lit(0L))),
      tau2, lnAlpha, keyCols = Seq("grp"))
  }

  /** [[msprt]] served from a [[PreparedMoments]] artifact (r15 — the
    * composition that makes "always-valid" actually CONTINUOUS and
    * restart-safe: the sequential test's whole state is the two
    * arms' moment sums, and PreparedMoments already absorbs
    * increments losslessly and persists durably — so a monitor
    * absorbs each trigger's rows and re-reads the test from the
    * artifact, seeing ALL data since the experiment started, across
    * any number of restarts, with no corpus rescan ever). Prepare
    * with x = y = the metric and the ARM as the group; the readout
    * is bit-for-bit [[msprt]] of the rows behind the artifact
    * (same decimal sums, shared finishing tree — spec-pinned). An
    * arm absent from the artifact reports n = 0 with null
    * statistics, observable.
    */
  def msprtFromMoments(m: PreparedMoments, armA: String, armB: String,
                       tau2: Double,
                       lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"msprtFromMoments: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0, s"msprtFromMoments: lnAlpha ($lnAlpha) must be negative")
    def side(arm: String, suf: String): DataFrame =
      m.moments.filter(col(m.groupCol).cast("string") === arm).agg(
        coalesce(sum(col("n")), lit(0L)).as(s"n_$suf"),
        sum(col("__sx")).cast(DecimalType(38, 2)).as(s"__s_$suf"),
        sum(col("__sxx")).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    msprtFinish(side(armA, "a").crossJoin(broadcast(side(armB, "b"))),
      tau2, lnAlpha)
  }

  /** [[alwaysValidCi]] served from a [[PreparedMoments]] artifact —
    * the same composition as [[msprtFromMoments]] (the CI's whole
    * state IS the two arms' moment sums): absorb each trigger,
    * re-read the interval, bit-for-bit the batch CI of the rows
    * behind the artifact (same decimal sums, shared
    * `avciFinishCols` tree — spec-pinned). The always-valid pair —
    * test and interval — reads off ONE artifact.
    */
  def alwaysValidCiFromMoments(m: PreparedMoments, armA: String, armB: String,
                               tau2: Double,
                               lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"alwaysValidCiFromMoments: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0, s"alwaysValidCiFromMoments: lnAlpha ($lnAlpha) must be negative")
    def side(arm: String, suf: String): DataFrame =
      m.moments.filter(col(m.groupCol).cast("string") === arm).agg(
        coalesce(sum(col("n")), lit(0L)).as(s"n_$suf"),
        sum(col("__sx")).cast(DecimalType(38, 2)).as(s"__s_$suf"),
        sum(col("__sxx")).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    avciFinishCols(side(armA, "a").crossJoin(broadcast(side(armB, "b"))),
      tau2, lnAlpha, keyCols = Nil)
  }

  /** Per-segment mSPRT (r15 — [[msprt]] keyed by a segment, the
    * always-valid member of the per-segment experimentation family
    * q169/q188 established: a monitor that only watches the whole
    * experiment misses the cohort where the effect (or the harm)
    * concentrates): per (segment, side) the exact decimal moments, a
    * keyed FULL OUTER merge (one-sided segments report with the
    * absent side's count 0 and null statistics — the q188 shape),
    * the same ln-space likelihood-ratio tree per segment. Returns
    * one row per segment.
    */
  def msprtByGroup(a: DataFrame, b: DataFrame, group: String, value: Column,
                   tau2: Double,
                   lnAlpha: Double = -2.995732273553991): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(tau2 > 0.0, s"msprtByGroup: tau2 ($tau2) must be positive")
    require(lnAlpha < 0.0, s"msprtByGroup: lnAlpha ($lnAlpha) must be negative")
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull && col(group).isNotNull)
        .groupBy(col(group).as("grp")).agg(
          count(lit(1)).as(s"n_$suf"),
          sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    msprtFinishCols(
      side(a, "a").join(side(b, "b"), Seq("grp"), "full_outer")
        .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
        .withColumn("n_b", coalesce(col("n_b"), lit(0L))),
      tau2, lnAlpha, keyCols = Seq("grp"))
  }

  /** Post-stratified two-sample z readout (r15 — the variance-
    * reduction sibling of [[cupedZ]] that needs NO pre-experiment
    * covariate: when assignment is independent of a categorical
    * covariate (platform, country, cohort), re-weighting each arm's
    * per-stratum means by the POOLED stratum shares removes the
    * between-stratum variance component — the standard
    * post-stratified ATE every experimentation platform ships next
    * to CUPED). Per (arm, stratum) ONE map-combinable aggregate of
    * the q162 exact decimal moments; strata present in BOTH arms
    * join keyed (one-sided strata are EXCLUDED from the estimator
    * and COUNTED — `strata_a_only`/`strata_b_only` report, the
    * observable-degradation rule), pooled weights
    * `w_s = (n_as + n_bs) / N_common` come off the joined frame
    * itself (no scalar crosses in the keyed part — the q160
    * statement). The estimate is `Σ_s w_s·mean_side_s` and the
    * variance `Σ_s w_s²·var_side_s/n_side_s` — each O(1) term
    * rounded at 12 and summed as DECIMAL(38,12) (the q155 order-free
    * discipline), then `diff`, `se = √(va + vb)`, `z = diff/se` as
    * one fixed double tree, round 6. Degenerate strata (n < 2 on
    * either side) null the variance terms, so `se`/`z` null with
    * counts reporting. Returns ONE row: (n_a, n_b, n_strata,
    * strata_a_only, strata_b_only, mean_a_post, mean_b_post, diff,
    * se, z).
    *
    * Scale shape: two map-combinable (arm, stratum) censuses, one
    * stratum-keyed FULL OUTER join, one strata-frame aggregate —
    * cost tracks the stratum domain, never the corpus.
    */
  def postStratifiedZ(a: DataFrame, b: DataFrame, stratum: String,
                      value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull && col(stratum).isNotNull)
        .groupBy(col(stratum).as("__s")).agg(
          count(lit(1)).as(s"n_$suf"),
          sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    val joined = side(a, "a").join(side(b, "b"), Seq("__s"), "full_outer")
    val both = col("n_a").isNotNull && col("n_b").isNotNull
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    val wAll = Window.partitionBy()
    // pooled weight over COMMON strata, off the joined frame itself
    val nCommon = sum(when(both, col("n_a") + col("n_b"))).over(wAll)
    val w = (col("n_a") + col("n_b")).cast("double") / nCommon.cast("double")
    val d3812 = DecimalType(38, 12)
    val terms = joined
      .withColumn("__w", when(both, w))
      .withColumn("__ma_t", when(both, round(col("__w") * mean("a"), 12)))
      .withColumn("__mb_t", when(both, round(col("__w") * mean("b"), 12)))
      .withColumn("__va_t", when(both && col("n_a") >= 2,
        round(col("__w") * col("__w") * v("a") / nD("a"), 12)))
      .withColumn("__vb_t", when(both && col("n_b") >= 2,
        round(col("__w") * col("__w") * v("b") / nD("b"), 12)))
    val agg = terms.agg(
      sum(when(both, col("n_a"))).as("n_a"),
      sum(when(both, col("n_b"))).as("n_b"),
      count(when(both, lit(1))).as("n_strata"),
      count(when(col("n_b").isNull, lit(1))).as("strata_a_only"),
      count(when(col("n_a").isNull, lit(1))).as("strata_b_only"),
      sum(col("__ma_t").cast(d3812)).as("__ma"),
      sum(col("__mb_t").cast(d3812)).as("__mb"),
      // a single under-2 stratum nulls the whole variance sum: a
      // decimal SUM skips nulls, which would silently DROP that
      // stratum's variance — the max-null flag keeps it honest
      max(when(both && (col("n_a") < 2 || col("n_b") < 2), lit(1))
        .otherwise(lit(0))).as("__degenerate"),
      sum(col("__va_t").cast(d3812)).as("__va"),
      sum(col("__vb_t").cast(d3812)).as("__vb"))
    val se2 = col("__va").cast("double") + col("__vb").cast("double")
    val okVar = col("__degenerate") === 0 && col("n_strata") > 0
    agg
      .withColumn("mean_a_post",
        when(col("n_strata") > 0, round(col("__ma").cast("double"), 6)))
      .withColumn("mean_b_post",
        when(col("n_strata") > 0, round(col("__mb").cast("double"), 6)))
      .withColumn("diff", when(col("n_strata") > 0,
        round(col("__mb").cast("double") - col("__ma").cast("double"), 6)))
      .withColumn("se", when(okVar && se2 > 0.0, round(sqrt(se2), 6)))
      .withColumn("z", when(okVar && se2 > 0.0,
        round((col("__mb").cast("double") - col("__ma").cast("double")) /
          sqrt(se2), 6)))
      .select(coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"), col("n_strata"),
        col("strata_a_only"), col("strata_b_only"),
        col("mean_a_post"), col("mean_b_post"), col("diff"), col("se"),
        col("z"))
  }

  /** Per-segment post-stratified z (r16 wave 6 — [[postStratifiedZ]]
    * keyed by a segment column, completing the variance-reduction
    * pair beside [[cupedZByGroup]]: each segment re-weights its OWN
    * per-stratum means by its OWN pooled stratum shares): per
    * (segment, arm, stratum) the same exact moments in one pass, a
    * (segment, stratum)-keyed full-outer join, the pooled weights off
    * the joined frame with the nCommon window PARTITIONED by the
    * segment (no scalar crosses in the keyed form), the same
    * round-12 DECIMAL(38,12) term sums per segment. One-sided strata
    * excluded and counted PER SEGMENT; a segment with any under-2
    * common stratum nulls its se/z via the same max-degenerate flag.
    * Returns one row per segment: (grp, n_a, n_b, n_strata,
    * strata_a_only, strata_b_only, mean_a_post, mean_b_post, diff,
    * se, z).
    *
    * Scale shape: two map-combinable (segment, stratum) censuses +
    * one keyed join + segment-partitioned windows — cost tracks the
    * segment × stratum domain, never the corpus.
    */
  def postStratifiedZByGroup(a: DataFrame, b: DataFrame, group: String,
                             stratum: String, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(value.isNotNull && col(stratum).isNotNull &&
          col(group).isNotNull)
        .groupBy(col(group).as("grp"), col(stratum).as("__s")).agg(
          count(lit(1)).as(s"n_$suf"),
          sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    val joined = side(a, "a").join(side(b, "b"), Seq("grp", "__s"), "full_outer")
    val both = col("n_a").isNotNull && col("n_b").isNotNull
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    val wSeg = Window.partitionBy(col("grp"))
    val nCommon = sum(when(both, col("n_a") + col("n_b"))).over(wSeg)
    val w = (col("n_a") + col("n_b")).cast("double") / nCommon.cast("double")
    val d3812 = DecimalType(38, 12)
    val terms = joined
      .withColumn("__w", when(both, w))
      .withColumn("__ma_t", when(both, round(col("__w") * mean("a"), 12)))
      .withColumn("__mb_t", when(both, round(col("__w") * mean("b"), 12)))
      .withColumn("__va_t", when(both && col("n_a") >= 2,
        round(col("__w") * col("__w") * v("a") / nD("a"), 12)))
      .withColumn("__vb_t", when(both && col("n_b") >= 2,
        round(col("__w") * col("__w") * v("b") / nD("b"), 12)))
    val agg = terms.groupBy(col("grp")).agg(
      sum(when(both, col("n_a"))).as("n_a"),
      sum(when(both, col("n_b"))).as("n_b"),
      count(when(both, lit(1))).as("n_strata"),
      count(when(col("n_b").isNull, lit(1))).as("strata_a_only"),
      count(when(col("n_a").isNull, lit(1))).as("strata_b_only"),
      sum(col("__ma_t").cast(d3812)).as("__ma"),
      sum(col("__mb_t").cast(d3812)).as("__mb"),
      max(when(both && (col("n_a") < 2 || col("n_b") < 2), lit(1))
        .otherwise(lit(0))).as("__degenerate"),
      sum(col("__va_t").cast(d3812)).as("__va"),
      sum(col("__vb_t").cast(d3812)).as("__vb"))
    val se2 = col("__va").cast("double") + col("__vb").cast("double")
    val okVar = col("__degenerate") === 0 && col("n_strata") > 0
    agg
      .withColumn("mean_a_post",
        when(col("n_strata") > 0, round(col("__ma").cast("double"), 6)))
      .withColumn("mean_b_post",
        when(col("n_strata") > 0, round(col("__mb").cast("double"), 6)))
      .withColumn("diff", when(col("n_strata") > 0,
        round(col("__mb").cast("double") - col("__ma").cast("double"), 6)))
      .withColumn("se", when(okVar && se2 > 0.0, round(sqrt(se2), 6)))
      .withColumn("z", when(okVar && se2 > 0.0,
        round((col("__mb").cast("double") - col("__ma").cast("double")) /
          sqrt(se2), 6)))
      .select(col("grp"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"), col("n_strata"),
        col("strata_a_only"), col("strata_b_only"),
        col("mean_a_post"), col("mean_b_post"), col("diff"), col("se"),
        col("z"))
  }

  /** The shared one-way-ANOVA finisher over a per-(keys…, group)
    * moment frame (n, __s DECIMAL(38,2), __ss DECIMAL(38,4)): the
    * between/within sums of squares decompose into per-group terms
    * `S_g²/n_g` and `SS_g − S_g²/n_g` — each an O(group) double,
    * rounded at 12 and summed as DECIMAL(38,12) (the q155 order-free
    * discipline; term magnitude must stay under ~10²⁵, i.e. group
    * value sums under ~10¹² — the stated bound), with the grand
    * `S²/N` correction and F/η² one fixed double tree at the end,
    * round 6. Keyed forms aggregate per segment.
    */
  private def anovaFinish(moments: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d3812 = DecimalType(38, 12)
    def sD(c: String) = col(c).cast("double")
    val terms = moments
      .withColumn("__tb", round(sD("__s") * sD("__s") / sD("n"), 12))
      .withColumn("__tw", round(sD("__ss") - sD("__s") * sD("__s") / sD("n"), 12))
    val agg = terms.groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n_total"),
      count(lit(1)).as("k_groups"),
      sum(col("__s")).cast(DecimalType(38, 2)).as("__st"),
      sum(col("__tb").cast(d3812)).as("__sb"),
      sum(col("__tw").cast(d3812)).as("__sw"))
    val nD = col("n_total").cast("double")
    val ssb = col("__sb").cast("double") -
      col("__st").cast("double") * col("__st").cast("double") / nD
    val ssw = col("__sw").cast("double")
    val dfb = (col("k_groups") - 1).cast("double")
    val dfw = (col("n_total") - col("k_groups")).cast("double")
    val ok = col("k_groups") >= 2 && col("n_total") > col("k_groups")
    val f = (ssb / dfb) / (ssw / dfw)
    agg
      // the SS readouts emit as round-0 BIGINTs (value-unit², §3): a
      // round-6 double at 10¹¹ magnitude is last-ulp-unportable
      // (engines scale-multiply differently), while round-0 is an
      // exact operation on the double in both
      .withColumn("ss_between", round(ssb, 0).cast("long"))
      .withColumn("ss_within", round(ssw, 0).cast("long"))
      .withColumn("f", when(ok && ssw > 0.0, round(f, 6)))
      .withColumn("eta_sq", when(ok && (ssb + ssw) > 0.0,
        round(ssb / (ssb + ssw), 6)))
      .select((keys.map(col) ++ Seq(col("n_total"), col("k_groups"),
        col("ss_between"), col("ss_within"), col("f"), col("eta_sq"))): _*)
  }

  private def anovaMoments(df: DataFrame, keys: Seq[String],
                           value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = graft.util.Portable.dec(value)
    df.filter(value.isNotNull && keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*).agg(
        count(lit(1)).as("n"),
        sum(d).cast(DecimalType(38, 2)).as("__s"),
        sum(d * d).cast(DecimalType(38, 4)).as("__ss"))
  }

  /** One-way ANOVA F (r15 — the PARAMETRIC sibling of
    * [[kruskalWallis]] and the k-group member of the q162 moment
    * family: "do any of the k groups' MEANS differ", the first test
    * a k-arm experiment or a segmentation review runs): per group
    * ONE map-combinable aggregate of exact decimal moments, then the
    * classic decomposition SSbetween = Σ S_g²/n_g − S²/N and
    * SSwithin = Σ (SS_g − S_g²/n_g) with the per-group terms
    * round-12 + DECIMAL(38,12)-summed (order-free — a raw double sum
    * over groups would replay differently per partitioning),
    * `F = (SSb/(k−1)) / (SSw/(N−k))` and η² = SSb/SStot one fixed
    * tree, round 6. Degenerate frames (k < 2, N ≤ k, zero within-
    * variance) null F with counts reporting. Returns ONE row:
    * (n_total, k_groups, ss_between, ss_within, f, eta_sq).
    *
    * Scale shape: one map-combinable (group) census + one k-row
    * aggregate — cost tracks the scan, output one row.
    */
  def anovaF(df: DataFrame, group: String, value: Column): DataFrame =
    anovaFinish(
      anovaMoments(df, Seq(group), value).drop(group)
        .withColumn("__all", lit(1)),
      Seq("__all")).drop("__all")

  /** Per-segment one-way ANOVA (r15 — [[anovaF]] keyed by a segment,
    * the parametric member of the per-segment family q177 completed
    * for ranks): per (segment, group) moments, the same round-12
    * term sums PARTITIONED by the segment. Returns one row per
    * segment.
    */
  def anovaFByGroup(df: DataFrame, segment: String, group: String,
                    value: Column): DataFrame =
    anovaFinish(
      anovaMoments(df, Seq(segment, group), value)
        .withColumnRenamed(segment, "grp").drop(group),
      Seq("grp"))

  /** [[anovaF]] served from a [[PreparedMoments]] artifact (r15 —
    * the k-arm member of the msprtFromMoments composition: the
    * one-way F needs ONLY the per-arm moment sums, which the
    * artifact absorbs losslessly and persists; prepare with
    * x = y = the metric and the ARM as the group). Bit-for-bit the
    * row-input [[anovaF]] of the rows behind the artifact (same
    * decimal sums, shared finisher — spec-pinned).
    */
  def anovaFromMoments(m: PreparedMoments): DataFrame =
    anovaFinish(
      m.moments.select(col("n"), col("__sx").as("__s"), col("__sxx").as("__ss"))
        .withColumn("__all", lit(1)),
      Seq("__all")).drop("__all")

  /** [[pairwiseWelch]] served from a [[PreparedMoments]] artifact
    * (r15 — the post-hoc half of the k-arm battery, same artifact,
    * same identity contract).
    */
  def pairwiseWelchFromMoments(m: PreparedMoments): DataFrame =
    pairwiseWelchFinish(
      m.moments.select(col(m.groupCol), col("n"),
        col("__sx").as("__s"), col("__sxx").as("__ss")),
      m.groupCol)

  /** Pairwise Welch t post-hoc (r15 — the step AFTER [[anovaF]] or
    * [[kruskalWallis]] flags "something differs": WHICH pairs —
    * every k-arm readout ends here; emitting `m_comparisons`
    * alongside lets the caller Bonferroni-adjust α/m without the
    * engine needing an inverse normal): ONE map-combinable per-group
    * moment census (k rows), a g_a < g_b self-join over it (k²/2
    * bounded pairs — never row-level), then q162's exact Welch
    * mean/variance/t/df tree per pair, round 6; degenerate pairs
    * (n < 2, zero pooled SE) null t/df with counts. Returns one row
    * per unordered pair:
    * (g_a, g_b, n_a, n_b, mean_a, mean_b, t, df, m_comparisons).
    *
    * Scale shape: one census + one pairs-bounded join — cost tracks
    * the group domain; the corpus is scanned once.
    */
  def pairwiseWelch(df: DataFrame, group: String, value: Column): DataFrame =
    pairwiseWelchFinish(anovaMoments(df, Seq(group), value), group)

  /** The shared pairwise-Welch finisher over a per-group moment
    * census (group, n, __s, __ss) — both the row-input
    * [[pairwiseWelch]] and the artifact-input
    * [[pairwiseWelchFromMoments]] end here (value-identical by
    * shared code).
    */
  private def pairwiseWelchFinish(m: DataFrame, group: String): DataFrame = {
    val a = m.select(col(group).cast("string").as("g_a"), col("n").as("n_a"),
      col("__s").as("__s_a"), col("__ss").as("__ss_a"))
    val b = m.select(col(group).cast("string").as("g_b"), col("n").as("n_b"),
      col("__s").as("__s_b"), col("__ss").as("__ss_b"))
    val pairs = a.join(b, col("g_a") < col("g_b"))
    val wAll = Window.partitionBy()
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    def vn(s: String) = v(s) / nD(s)
    val se2 = vn("a") + vn("b")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val df_ = se2 * se2 /
      (vn("a") * vn("a") / (nD("a") - lit(1.0)) +
        vn("b") * vn("b") / (nD("b") - lit(1.0)))
    pairs
      .withColumn("m_comparisons", count(lit(1)).over(wAll))
      .withColumn("mean_a", when(col("n_a") > 0, round(mean("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(mean("b"), 6)))
      .withColumn("t", when(ok && se2 > 0.0,
        round((mean("a") - mean("b")) / sqrt(se2), 6)))
      .withColumn("df", when(ok && se2 > 0.0, round(df_, 6)))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("t"), col("df"),
        col("m_comparisons"))
  }

  /** One-pass Pearson correlation matrix (r15 — the profiling
    * readout a feature review runs before any model: "which numeric
    * columns are redundant / leaking"; q119's pairwise machinery
    * widened to ALL pairs of a column list in ONE corpus scan):
    * rows with a null in ANY listed column drop (LISTWISE complete —
    * stated; pairwise-complete ns would make the matrix
    * non-positive-semidefinite and the per-pair ns ambiguous), then
    * a single map-combinable aggregate collects n, each column's
    * exact decimal Σx and Σx², and each pair's Σxy — k(k+1)/2
    * expressions, bounded by the required k ≤ 12. Each pair's r is
    * the q119 fixed double shape over the exact sums, round 6;
    * zero-variance columns null their pairs. Returns one row per
    * unordered pair: (col_a, col_b, n, r).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(cols.length >= 2 && cols.length <= 12,
      s"corrMatrix: need 2..12 columns (got ${cols.length})")
    require(cols.distinct.length == cols.length, "corrMatrix: duplicate column")
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    def d(c: String) = graft.util.Portable.dec(col(c))
    val sumExprs =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(d(c)).cast(DecimalType(38, 2)).as(s"__s_$c")) ++
      cols.map(c => sum(d(c) * d(c)).cast(DecimalType(38, 4)).as(s"__ss_$c")) ++
      cols.combinations(2).map { case Seq(x, y) =>
        sum(d(x) * d(y)).cast(DecimalType(38, 4)).as(s"__sxy_${x}_$y")
      }.toSeq
    val agg = complete.agg(sumExprs.head, sumExprs.tail: _*)
    val nD = col("n").cast("double")
    def rFor(x: String, y: String): Column = {
      val sx = col(s"__s_$x").cast("double"); val sy = col(s"__s_$y").cast("double")
      val sxx = col(s"__ss_$x").cast("double"); val syy = col(s"__ss_$y").cast("double")
      val sxy = col(s"__sxy_${x}_$y").cast("double")
      val covN = nD * sxy - sx * sy
      val vxN = nD * sxx - sx * sx
      val vyN = nD * syy - sy * sy
      when(col("n") >= 2 && vxN > 0.0 && vyN > 0.0,
        round(covN / sqrt(vxN * vyN), 6))
    }
    // one exploded struct array off the SINGLE agg row — a per-pair
    // union would re-render (and without exchange reuse, re-run) the
    // aggregate subtree k(k−1)/2 times
    agg.select(explode(array(cols.combinations(2).map { case Seq(x, y) =>
        struct(lit(x).as("col_a"), lit(y).as("col_b"),
          col("n").as("n"), rFor(x, y).as("r"))
      }.toSeq: _*)).as("__p"))
      .select(col("__p.col_a").as("col_a"), col("__p.col_b").as("col_b"),
        col("__p.n").as("n"), col("__p.r").as("r"))
  }

  /** Brown–Forsythe variance-equality test (r15 — the robust Levene
    * variant every ANOVA/t-test result should be screened with:
    * "are the group SPREADS even comparable, or is the mean test
    * reading a variance artifact"; deviations from the MEDIAN, not
    * the mean, keep the test honest under skew — the published
    * Brown–Forsythe recommendation): per group the rank-selected
    * LOWER median (k = (n+1) div 2 — a REAL data value, deterministic
    * on any engine exactly like [[GraftDataFrameOps.winsorize]]'s
    * bounds; the even-n midpoint average would leave the exact
    * decimal domain), then [[anovaF]] on |x − median| — exact decimal
    * deviations, the same order-free term sums. Large groups
    * concentrate the median's window sort — the winsorize
    * coarse-group gate rides the same count window
    * (`allowCoarseGroups` acknowledges). Returns ONE row:
    * (n_total, k_groups, ss_between, ss_within, f, eta_sq).
    */
  def brownForsythe(df: DataFrame, group: String, value: Column,
                    allowCoarseGroups: Boolean = false,
                    maxExactGroupRows: Long = MaxExactGroupRows): DataFrame = {
    val d = graft.util.Portable.dec(value)
    val wv = Window.partitionBy(col(group)).orderBy(d)
    val wp = Window.partitionBy(col(group))
    val ranked = df.filter(value.isNotNull && col(group).isNotNull)
      .withColumn("__v", d)
      .withColumn("__rn", row_number().over(wv))
      .withColumn("__n", count(lit(1)).over(wp))
    // lower median rank: (n + 1) DIV 2 — integer arithmetic only; the
    // coarse-group gate rides the selector every median consumes
    // (prune-proof, the winsorize pattern)
    val withK = ranked.withColumn("__k", gateCoarseGroups(
      expr("(__n + 1) DIV 2"), col("__n"), "brownForsythe",
      allowCoarseGroups, maxExactGroupRows))
    val medians = withK.filter(col("__rn") === col("__k"))
      .groupBy(col(group).as("__mg"))
      .agg(min(col("__v")).as("__med"))
    val devs = withK.join(medians, col(group) === col("__mg"))
      .withColumn("__dev", abs(col("__v") - col("__med")))
    anovaF(devs, group, col("__dev"))
  }

  /** HITS hub/authority scores (r15 — Kleinberg's link-analysis
    * sibling of [[pageRank]], the second centrality a link-graph
    * curation pipeline reaches for: PageRank finds globally endorsed
    * nodes, HITS separates DIRECTORIES (hubs — pages whose outlinks
    * aim at good content) from CONTENT (authorities — pages good
    * hubs aim at); on a crawl graph the hub score is the
    * seed-list/sitemap signal PageRank structurally cannot express).
    * ALL-INTEGER like q96 — deliberately: scores are longs summing
    * to ~`scale`, every normalization an EXACT floor division
    * implemented as the q177 DECIMAL(38,0) divmod (quotient =
    * (x − pmod(x, d)) / d — bit-identical on any engine or
    * partitioning, where a floating normalize would break the hash
    * oracle). Per iteration, in Kleinberg's order: authority pass
    * `auth_raw(v) = Σ_{u→v} hub(u)` (multi-edges count as weight,
    * the q96 contract), normalize to `scale`; hub pass
    * `hub_raw(u) = Σ_{u→v} auth(v)` over the NEW authorities,
    * normalize. Σ(raw·scale) stays ≤ ~10³³, inside DECIMAL(38,0).
    * Documented costs: floor leakage (< 1 unit per node per
    * normalize) and the all-sinks edge case — if every
    * authority-carrying node has zero out-edges the hub total is 0
    * and scores report 0 rather than dividing (observable,
    * spec-pinned). `iters` is a fixed budget (the q96 statement).
    *
    * Scale shape: per iteration ONE node-keyed hash join per pass +
    * one map-combinable dst/src aggregation (a hub is a hot GROUP BY
    * key, never a hot row) + one 1-row total broadcast; the score
    * frames checkpoint every 2nd iteration (the q46 lineage
    * discipline). Inner-loop score frames stay SPARSE (r17, VERDICT
    * r16 wrong #1/next #6: the per-iteration node-completing left
    * joins bought nothing — an authority frame built from the edge
    * join already covers every in-edge node, and zero-score nodes
    * contribute exact zeros to every downstream sum — so the two
    * node joins per iteration collapse into ONE node completion at
    * the end, value-identical by the zero-term argument).
    */
  def hitsScores(edges: DataFrame, src: String, dst: String, iters: Int = 2,
                 scale: Long = 1000000000000L,
                 checkpointDir: Option[String] = None,
                 saltHotDegree: Long = 0L, saltK: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(iters >= 0 && iters <= 10, s"hitsScores: iters must be in [0, 10] (got $iters)")
    require(scale > 0L && scale <= 1000000000000000L,
      s"hitsScores: scale must be in (0, 1e15] (got $scale)")
    val ck = lineageBreaker(checkpointDir)
    val e = ck(edges.select(
      col(src).cast("long").as("__src"), col(dst).cast("long").as("__dst")))
    val nodes = ck(e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "hitsScores: empty edge list")
    require(scale >= n,
      s"hitsScores: scale ($scale) must be >= the node count ($n) so the uniform start is nonzero")
    val d38 = DecimalType(38, 0)
    // exact floor division of raw·scale by the 1-row total — zeros,
    // never divides, when a sink layer zeroes the total. SPARSE: the
    // raw frame already covers every node its edge-join consumers
    // can ask for (an aggregate over the edge join covers every
    // in/out-edge node), so no node completion here — the missing
    // zero-score rows would add exact zeros to every downstream sum
    def normalized(raw: DataFrame, out: String): DataFrame = {
      val total = raw.agg(coalesce(sum(col("__raw")), lit(0L).cast(d38)).as("__t"))
      val x = col("__raw") * lit(scale).cast(d38)
      raw.crossJoin(broadcast(total))
        .withColumn(out,
          when(col("__t") > 0,
            ((x - pmod(x, col("__t"))) / col("__t")).cast("long"))
            .otherwise(lit(0L)))
        .select(col("node"), col(out))
    }
    // hot sets for the two per-iteration vertex joins (out-degree
    // for the __src hub join, in-degree for the __dst authority
    // join); saltHotDegree = 0 → off, materialized once when on
    val (hotOut, hotIn) =
      if (saltHotDegree > 0L)
        (Some(ck(hotVertices(e, "__src", saltHotDegree))),
          Some(ck(hotVertices(e, "__dst", saltHotDegree))))
      else (None, None)
    if (iters == 0)
      return ck(nodes
        .withColumn("hub", lit(scale / n)).withColumn("auth", lit(scale / n)))
        .select(col("node"), col("hub"), col("auth"))
    var hubs = ck(nodes.select(col("node")).withColumn("hub", lit(scale / n)))
    var auths: DataFrame = null
    for (i <- 1 to iters) {
      // break lineage after EVERY pass, authority before the hub
      // pass consumes it — so each pass materializes exactly once
      // per iteration and no pass ever replays an earlier one. The
      // r16 every-2nd cadence was measured on the old node-joined
      // frames, where each break paid a node-completion join; with
      // sparse frames the break is one aggregate output, and the
      // per-iteration cadence measured faster at sf0.1 (r17:
      // 5.1 s → 4.5 s solo median; an un-broken iteration makes the
      // next pass replay it inline, which is what the old cadence
      // was paying for)
      val hubIn = hubs.select(col("node").as("__src"), col("hub"))
      val aRaw = (hotOut match {
          case Some(h) => saltedVertexJoin(e, hubIn, "__src", col("__dst"), h, saltK)
          case None => e.join(hubIn, Seq("__src"))
        })
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("hub").cast(d38)).as("__raw"))
      // the lineage break sits on the RAW aggregate, not the
      // normalized frame (r17 optimization round): `normalized`
      // consumes its input twice (the 1-row total subquery + the
      // floor-divide projection), so breaking after normalization ran
      // the edge join + aggregation TWICE per pass — 8 edge-join
      // evaluations for a 2-iteration run. Breaking before it, the
      // edge join runs once per pass and the two normalize reads hit
      // the materialized node-sized frame. Values unchanged (a break
      // is value-neutral); the per-pass cadence statement above holds.
      val aNew = normalized(ck(aRaw), "auth")
      val authIn = aNew.select(col("node").as("__dst"), col("auth"))
      val hRaw = (hotIn match {
          case Some(h) => saltedVertexJoin(e, authIn, "__dst", col("__src"), h, saltK)
          case None => e.join(authIn, Seq("__dst"))
        })
        .groupBy(col("__src").as("node"))
        .agg(sum(col("auth").cast(d38)).as("__raw"))
      hubs = normalized(ck(hRaw), "hub")
      auths = aNew
    }
    // the ONE node completion: dst-only nodes have hub 0, src-only
    // nodes auth 0 — exactly what the dropped per-iteration left
    // joins produced
    nodes.join(hubs, Seq("node"), "left").join(auths, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /** ANN recall report (r15 — the EVALUATION readout every
    * approximate-nearest-neighbor deployment needs before trusting
    * its index parameters: "at nprobe = 2, what fraction of the true
    * top-k does the IVF path actually return, per query and where
    * does it miss" — the number that sizes nprobe/banding, computed
    * IN-ENGINE against the brute-force truth instead of eyeballed):
    * both inputs are (query, item) rankings — the exact side a
    * brute-force top-k (q35's shape), the approximate side any ANN
    * path (IVF/IVF-PQ/two-level/LSH). Per query: distinct exact and
    * approx sets, their keyed-join overlap, and
    * `recall = n_overlap / n_exact` as one round-6 division. The
    * query frames FULL OUTER join, so a query the ANN path returned
    * NOTHING for reports n_approx = 0 / recall = 0 (the silent-miss
    * signal — the failure mode an inner join would hide), and a
    * query with no exact truth reports null recall. Returns one row
    * per query: (query, n_exact, n_approx, n_overlap, recall).
    *
    * Scale shape: both inputs are k-bounded per query by
    * construction (top-k frames), so every census, join and
    * aggregate here walks queries·k rows — never the corpus; all
    * joins are query-keyed hash joins.
    */
  def annRecallReport(exact: DataFrame, approx: DataFrame,
                      query: String, item: String): DataFrame = {
    def sets(df: DataFrame) = df
      .filter(col(query).isNotNull && col(item).isNotNull)
      .select(col(query).as("__q"), col(item).as("__i")).distinct()
    val e = sets(exact); val a = sets(approx)
    val ne = e.groupBy(col("__q")).agg(count(lit(1)).as("n_exact"))
    val na = a.groupBy(col("__q")).agg(count(lit(1)).as("n_approx"))
    val nov = e.join(a, Seq("__q", "__i"))
      .groupBy(col("__q")).agg(count(lit(1)).as("n_overlap"))
    ne.join(na, Seq("__q"), "full_outer")
      .join(nov, Seq("__q"), "left_outer")
      .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
      .withColumn("n_approx", coalesce(col("n_approx"), lit(0L)))
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("recall", when(col("n_exact") > 0,
        round(col("n_overlap").cast("double") /
          col("n_exact").cast("double"), 6)))
      .select(col("__q").as(query), col("n_exact"), col("n_approx"),
        col("n_overlap"), col("recall"))
  }

  /** Per-segment ANN recall (r16 — VERDICT r15 next #7:
    * [[annRecallReport]] keyed by a query segment, the governance
    * family's pattern applied to the one readout that was still
    * whole-frame: a whole-corpus recall of 0.93 can hide a segment
    * at 0.40, and recall BY language/source/label is how an ANN
    * regression is actually localized): the per-query FULL OUTER
    * report (silent misses included — the semantics that make the
    * readout honest) LEFT-joins the per-query segment mapping (a
    * query without a mapping reports under `__unsegmented__`,
    * observable, never dropped), then one map-combinable roll-up
    * per segment: query/miss counts, the summed exact/approx/overlap
    * censuses, and the micro recall Σoverlap/Σexact, round 6.
    * `segments` must map each query to at most ONE segment (it is
    * distinct-ed on the pair; a multi-labeled query would
    * double-count).
    * Returns one row per segment: (grp, n_queries, n_silent_miss,
    * n_exact, n_approx, n_overlap, recall).
    *
    * Scale shape: the per-query report is queries×k-bounded; one
    * keyed (broadcastable) mapping join + one map-combinable
    * aggregate on top — adding segments adds parallelism, not
    * passes.
    */
  def annRecallReportByGroup(exact: DataFrame, approx: DataFrame,
                             query: String, item: String,
                             segments: DataFrame,
                             segment: String): DataFrame = {
    val per = annRecallReport(exact, approx, query, item)
    val seg = segments.filter(col(query).isNotNull)
      .select(col(query), col(segment).cast("string").as("__seg"))
      .distinct()
    per.join(seg, Seq(query), "left_outer")
      .withColumn("grp", coalesce(col("__seg"), lit("__unsegmented__")))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("n_approx") === 0 && col("n_exact") > 0, lit(1L))
          .otherwise(lit(0L))).as("n_silent_miss"),
        sum(col("n_exact")).as("n_exact"),
        sum(col("n_approx")).as("n_approx"),
        sum(col("n_overlap")).as("n_overlap"))
      .withColumn("recall", when(col("n_exact") > 0,
        round(col("n_overlap").cast("double") /
          col("n_exact").cast("double"), 6)))
      .select(col("grp"), col("n_queries"), col("n_silent_miss"),
        col("n_exact"), col("n_approx"), col("n_overlap"), col("recall"))
  }

  /** Per-user top-N item recommendations (r13 — the SERVING step the
    * q133 item-item similarities exist for: "customers who bought
    * your basket also bought ..."): candidates come ONLY from the
    * top-k similarity graph ([[itemSimilarity]] — k·|basket| rows
    * per user, never the catalog), each candidate scores the SUM of
    * its similarities to the user's seen items, already-seen items
    * are anti-joined out, and the per-user rank takes the top `n` by
    * (score desc, item asc). Scoring sums EXACT DECIMAL(9,6) views
    * of the round-6 cosines — decimal addition is order-free, so the
    * score (and therefore the ranking) replays bit-for-bit under any
    * partitioning, where a raw double sum would not. Returns
    * (user, rec_item, score DECIMAL(38,6), n_contributors, rnk).
    *
    * Scale shape: baskets join the k-bounded sim graph on item (the
    * sim side is items×k — broadcastable for bounded vocabularies,
    * hash-joined otherwise), one (user, candidate) map-combinable
    * aggregate, one user-keyed anti join, one user-partitioned rank
    * window — never user×catalog, no global sort.
    */
  def recommendTopN(userItems: DataFrame, user: String, item: String,
                    sims: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(n >= 1, s"recommendTopN: n ($n) must be >= 1")
    val seen = userItems
      .filter(col(user).isNotNull && col(item).isNotNull)
      .select(col(user).as("__u"), col(item).as("__it")).distinct()
    val edges = sims.select(col("item").as("__it"), col("other").as("__cand"),
      col("cosine").cast(DecimalType(9, 6)).as("__w"))
    val scored = seen.join(edges, Seq("__it"))
      .groupBy(col("__u"), col("__cand"))
      .agg(sum(col("__w")).cast(DecimalType(38, 6)).as("score"),
        count(lit(1)).as("n_contributors"))
      .join(seen.select(col("__u"), col("__it").as("__cand")),
        Seq("__u", "__cand"), "left_anti")
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("score").desc, col("__cand"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= n)
      // the rank orders by the exact DECIMAL score; the EMISSION is
      // integer micros (score is an exact multiple of 10⁻⁶, so ·10⁶
      // is lossless — no DECIMAL column leaves a gated output,
      // SURVEY §3)
      .select(col("__u").as(user), col("__cand").as("rec_item"),
        (col("score") * 1000000).cast("long").as("score_micros"),
        col("n_contributors"), col("rnk"))
  }

  /** Common-neighbor link prediction (r13 — the graph-analytics
    * member beside q126's triangles: "which UNCONNECTED node pairs
    * share many neighbors" — the classic link-prediction /
    * who-you-may-know / substitute-product signal): candidate pairs
    * form ONLY through shared neighbors (one wedge join a–i–b over
    * the mid node), existing edges anti-join out, and each surviving
    * pair reports exact integer common-neighbor count, full degrees,
    * and the neighborhood Jaccard `common/(deg_a + deg_b − common)`
    * as one fixed division rounded at 6. Hub mids with degree >
    * `maxMidDegree` are EXCLUDED from wedge enumeration (the Σdeg²
    * wedge bound is the scale risk; a hub connecting everyone
    * predicts nothing anyway — stated, deterministic, replayed by
    * the oracle); degrees in the output remain FULL degrees.
    * `minCommon` bounds the output. Returns
    * (a, b, common, deg_a, deg_b, jaccard), a < b.
    *
    * Scale shape: degree census + one hub-filtered wedge self-join +
    * one (a,b) count + one edge anti join — cost Σ_{deg(i)≤cap}
    * deg(i)², never all-pairs.
    */
  def linkPredict(edges: DataFrame, src: String, dst: String,
                  maxMidDegree: Long = 1000L,
                  minCommon: Long = 2L): DataFrame = {
    require(maxMidDegree >= 1, "linkPredict: maxMidDegree must be >= 1")
    require(minCommon >= 1, "linkPredict: minCommon must be >= 1")
    val und = edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(col(src).as("__a"), col(dst).as("__b"))
    // the canonical edge set feeds FIVE consumers (two adjacency
    // directions, the anti-join, and — via deg — three degree
    // lookups); without a lineage break each one re-derives it from
    // the source (the r13 plan audit read 26 scans on the gated
    // query). Pin it once; deg (node-sized) likewise.
    val e = und.select(least(col("__a"), col("__b")).as("__a"),
      greatest(col("__a"), col("__b")).as("__b")).distinct()
      .localCheckpoint(true)
    val adj = e.select(col("__a").as("__n"), col("__b").as("__x"))
      .unionByName(e.select(col("__b").as("__n"), col("__a").as("__x")))
    val deg = adj.groupBy(col("__x")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(true)
    // wedge join through NON-HUB mids: adj keyed by the mid node
    val mids = adj.select(col("__x").as("__mid"), col("__n").as("__leaf"))
      .join(deg.filter(col("__deg") <= maxMidDegree)
        .select(col("__x").as("__mid")), Seq("__mid"))
    val cand = mids.as("l").join(mids.as("r"),
        col("l.__mid") === col("r.__mid") && col("l.__leaf") < col("r.__leaf"))
      .groupBy(col("l.__leaf").as("a"), col("r.__leaf").as("b"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      .join(e.select(col("__a").as("a"), col("__b").as("b")),
        Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("__x").as("a"), col("__deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("__x").as("b"), col("__deg").as("deg_b")), Seq("b"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("deg_a") + col("deg_b") - col("common")).cast("double"), 6))
      .select(col("a"), col("b"), col("common"), col("deg_a"), col("deg_b"),
        col("jaccard"))
  }

  /** Per-key changepoint location (r13 — q128's CUSUM machinery
    * finished into a LOCATOR: not "did the level shift" but WHERE):
    * over each key's (time, tieBreak)-ordered series the division-
    * free statistic `n·S_k − k·T` (q128's exact-integer identity —
    * |stat| peaks exactly where a level shift splits the series)
    * takes its argmax with ties to the EARLIEST index (the q156
    * discipline: an integer comparison decides, never a double), and
    * the located split reports both segment means as exact
    * floor-divided millicents (the q152 rule — no large-magnitude
    * round). The last index (k = n) is a legal argmax — "no shift
    * inside the series" — reporting a null after-mean. Returns one
    * row per key: (key, n_points, cp_index, cp_us, stat
    * DECIMAL(38,2), mean_before_millicents, mean_after_millicents).
    *
    * Exactness bound (stated): |n·S| < 2⁶³ — per-key rows × per-key
    * cents sum below ~9·10¹⁸, far above any per-key series this
    * engine's windows would sort anyway.
    *
    * Scale shape: ONE key-partitioned window sort (the q128 shape) +
    * one key aggregate + one argmax rank over the same partitioning —
    * cost tracks each key's own series.
    */
  def changepointPerKey(df: DataFrame, key: String, time: String,
                        tieBreak: String, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col(key)).orderBy(col("__cp_us"), col(tieBreak))
    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = df
      .filter(col(key).isNotNull && value.isNotNull)
      .withColumn("__cp_us", unix_micros(col(time).cast("timestamp")))
      .withColumn("__cp_c", (graft.util.Portable.dec(value) * 100).cast("long"))
      .withColumn("__cp_s", sum(col("__cp_c")).over(wcum))
      .withColumn("__cp_k", row_number().over(w).cast("long"))
    val stats = ranked.groupBy(col(key).as("__cp_g"))
      .agg(sum(col("__cp_c")).as("__cp_t"), count(lit(1)).as("__cp_n"))
    val stat = col("__cp_n") * col("__cp_s") - col("__cp_k") * col("__cp_t")
    val wArg = Window.partitionBy(col(key))
      .orderBy(abs(col("__stat")).desc, col("__cp_k"))
    ranked
      .join(stats, col(key) <=> col("__cp_g"))
      .withColumn("__stat", stat)
      .withColumn("__rk", row_number().over(wArg))
      .filter(col("__rk") === 1)
      .withColumn("mean_before_millicents",
        expr("(__cp_s * 1000) div __cp_k"))
      .withColumn("mean_after_millicents",
        when(col("__cp_n") > col("__cp_k"),
          expr("((__cp_t - __cp_s) * 1000) div (__cp_n - __cp_k)")))
      .select(col(key), col("__cp_n").as("n_points"),
        col("__cp_k").as("cp_index"), col("__cp_us").as("cp_us"),
        col("__stat").as("stat"),
        col("mean_before_millicents"), col("mean_after_millicents"))
  }

  /** Exact weighted median per group (r13 — the weighted sibling of
    * [[GraftDataFrameOps.madOutliers]]' rank selection: "the price
    * at which half the VOLUME sits below" — inventory valuation,
    * median trade price by size, latency-by-traffic): the smallest
    * value whose cumulative weight reaches half the total —
    * `2·cumw ≥ totw`, a PURE INTEGER comparison over exact cent
    * weights, no interpolation, the selected median is a real data
    * value. Non-positive and null weights drop (stated). Returns one
    * row per group: (group, n_rows, total_weight_cents, w_median).
    *
    * Scale shape: the corpus collapses to a (group, value) weight
    * census FIRST (map-combinable), the cumulative window walks the
    * census — bounded by each group's value DOMAIN, not its rows
    * (the q156 statement; no coarse-group gate needed, unlike the
    * row-sorting winsorize family).
    */
  def weightedMedian(df: DataFrame, group: String, value: Column,
                     weight: Column, allowWideCensus: Boolean = false,
                     maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    val base = df.filter(col(group).isNotNull && value.isNotNull &&
        weight.isNotNull && weight > 0)
      .withColumn("__wm_w", (graft.util.Portable.dec(weight) * 100).cast("long"))
    val census = base
      .groupBy(col(group).as("__g"), value.cast("long").as("__v"))
      .agg(sum(col("__wm_w")).as("__cw"), count(lit(1)).as("__cn"))
    val wRun = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("__g"))
    census
      // per-GROUP census gate (this operator's windows are already
      // group-partitioned; the risk is one group's near-unique value
      // domain): rides the cumulative the selection filter consumes
      .withColumn("__cr", count(lit(1)).over(wAll))
      .withColumn("__cum", gateWideCensus(
        sum(col("__cw")).over(wRun),
        col("__cr"), "weightedMedian", allowWideCensus, maxExactCensusRows))
      .withColumn("__tot", sum(col("__cw")).over(wAll))
      .withColumn("__n", sum(col("__cn")).over(wAll))
      .filter(col("__cum") * 2 >= col("__tot"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))))
      .filter(col("__rk") === 1)
      .select(col("__g").as(group), col("__n").as("n_rows"),
        col("__tot").as("total_weight_cents"), col("__v").as("w_median"))
  }

  /** Quantile treatment effects (r17 wave 5 — the DISTRIBUTIONAL
    * readout of an experiment beside the mean-only Welch/CUPED/DiD
    * family: a launch that moves the p90 while leaving the mean flat
    * — or pads the median while gutting the tail — is invisible to
    * every t-shaped statistic; per-quantile arm differences are how
    * revenue/latency experiments are actually read). For each
    * percentile in `pcts` (integers 1..99): each arm's EXACT rank
    * quantile — the smallest census value whose cumulative count
    * reaches `ceil(pct·n/100)`, pure integer arithmetic via
    * `floor((pct·n + 99)/100)` (the division is exact in doubles for
    * any count < 2⁵³ — no float-rank hazard), the q125/q38 real-
    * data-value discipline (no interpolation) — and the exact
    * decimal difference `qte = q_b − q_a`.
    *
    * Scale shape: each arm collapses to a (value) count census FIRST
    * (map-combinable); the cumulative window walks the census —
    * bounded by the value DOMAIN, not rows (the weightedMedian
    * statement, same wide-census gate); the `pcts`-row level frame
    * crosses onto the census (bounded × ≤ 99). Values are quantized
    * to 2 decimal places (the Portable.dec money grain) and reported
    * as EXACT integer cents — the q161 BIGINT discipline; a DECIMAL
    * output column is a driver-hash trap (r13/r17: trailing-zero
    * canonicalization differs across engines). Returns one row per
    * percentile: (pct, n_a, n_b, q_a_cents, q_b_cents, qte_cents).
    */
  def quantileTreatmentEffect(a: DataFrame, b: DataFrame, value: Column,
                              pcts: Seq[Int] = Seq(10, 25, 50, 75, 90),
                              allowWideCensus: Boolean = false,
                              maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    qteRequires(pcts)
    qteJoin(qteSide(a, None, value, "a", pcts, allowWideCensus, maxExactCensusRows),
      qteSide(b, None, value, "b", pcts, allowWideCensus, maxExactCensusRows),
      keyCols = Nil)
  }

  /** Per-segment [[quantileTreatmentEffect]] — the keyed member of
    * the per-segment experimentation family: every window PARTITIONs
    * by (segment, value-domain), one-sided segments report with the
    * present arm's quantiles and null `qte_cents` (observable). Returns
    * one row per (segment, pct).
    */
  def quantileTreatmentEffectByGroup(a: DataFrame, b: DataFrame, group: String,
                                     value: Column,
                                     pcts: Seq[Int] = Seq(10, 25, 50, 75, 90),
                                     allowWideCensus: Boolean = false,
                                     maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    qteRequires(pcts)
    qteJoin(
      qteSide(a, Some(group), value, "a", pcts, allowWideCensus, maxExactCensusRows),
      qteSide(b, Some(group), value, "b", pcts, allowWideCensus, maxExactCensusRows),
      keyCols = Seq("grp"))
  }

  private def qteRequires(pcts: Seq[Int]): Unit =
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 99) &&
      pcts.distinct.size == pcts.size,
      s"quantileTreatmentEffect: pcts ($pcts) must be distinct integers in 1..99")

  /** One arm's exact rank quantiles at every requested percentile —
    * the (segment?, value) count census, the domain-bounded
    * cumulative, the integer-free rank pick. Shared by the
    * whole-frame and keyed forms.
    */
  private def qteSide(df: DataFrame, group: Option[String], value: Column,
                      suf: String, pcts: Seq[Int],
                      allowWideCensus: Boolean,
                      maxExactCensusRows: Long): DataFrame = {
    val keys = group.map(g => Seq(col(g).as("grp"))).getOrElse(Nil)
    val keyNames = group.map(_ => Seq("grp")).getOrElse(Nil)
    // census key = exact integer cents (Portable.dec is DECIMAL(18,2),
    // so ×100 is integral and the long cast exact); ordering by cents
    // is ordering by value, and the BIGINT key keeps every downstream
    // column integer — no DECIMAL rendering reaches the output
    val census = df
      .filter(value.isNotNull && group.map(g => col(g).isNotNull).getOrElse(lit(true)))
      .groupBy(keys :+ (graft.util.Portable.dec(value) * 100).cast("long").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wRun = Window.partitionBy(keyNames.map(col): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyNames.map(col): _*)
    val spark = df.sparkSession
    import spark.implicits._
    val lvls = pcts.map(_.toLong).toDF("pct")
    census
      .withColumn("__cr", count(lit(1)).over(wAll))
      .withColumn("__cum", gateWideCensus(sum(col("__c")).over(wRun),
        col("__cr"), "quantileTreatmentEffect", allowWideCensus, maxExactCensusRows))
      .withColumn(s"n_$suf", sum(col("__c")).over(wAll))
      .crossJoin(broadcast(lvls))
      // the target rank: ceil(pct·n/100) by exact integer arithmetic
      .withColumn("__r", floor((col("pct") * col(s"n_$suf") + lit(99L))
        .cast("double") / lit(100.0)).cast("long"))
      .filter(col("__cum") >= col("__r"))
      .groupBy(keyNames.map(col) :+ col("pct"): _*)
      .agg(max(col(s"n_$suf")).as(s"n_$suf"), min(col("__v")).as(s"q_${suf}_cents"))
  }

  /** The shared QTE join/diff tail: FULL OUTER on (keys, pct) so a
    * one-armed segment stays observable; `qte_cents` is the EXACT
    * integer difference of the cents quantiles (long arithmetic —
    * census cents fit a long by the DECIMAL(18,2) domain).
    */
  private def qteJoin(sa: DataFrame, sb: DataFrame,
                      keyCols: Seq[String]): DataFrame = {
    sa.join(sb, keyCols :+ "pct", "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("qte_cents", col("q_b_cents") - col("q_a_cents"))
      .select(keyCols.map(col) ++ Seq(col("pct"), col("n_a"), col("n_b"),
        col("q_a_cents"), col("q_b_cents"), col("qte_cents")): _*)
  }

  /** Bucketed quantile treatment effects — the SKETCH path for
    * [[quantileTreatmentEffect]]'s wide-census refuse (the
    * KS/MWU/median pattern: every exact rank operator ships its
    * resolution-bounded sibling): both arms collapse to the q108
    * bucket registers, each percentile picks the nearest-rank BUCKET
    * (`ceil(q·tot)` — the [[quantileFromRegisters]] serve surface,
    * shared code) and reports its MIDPOINT, so each arm's estimate
    * is within width/2 of the exact quantile and `qte_mid` within
    * `bucketWidth` of the exact QTE (the q108 bound). Returns one
    * row per (segment?, pct): (…, pct, n_a, n_b, q_a_mid, q_b_mid,
    * qte_mid round 6).
    */
  def quantileTreatmentEffectSketch(a: DataFrame, b: DataFrame, value: Column,
                                    bucketWidth: Double,
                                    pcts: Seq[Int] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    qteRequires(pcts)
    qteSketchJoin(
      quantileRegisters(a, Seq.empty, value, bucketWidth),
      quantileRegisters(b, Seq.empty, value, bucketWidth),
      bucketWidth, pcts, keyCols = Nil)
  }

  /** [[quantileTreatmentEffectSketch]] served from two
    * [[PreparedQuantiles]] artifacts — the experiment monitor's
    * form: each arm's value census absorbs its traffic increments
    * (exact addition), and the distributional readout re-reads from
    * the artifacts at any time over ALL traffic so far. Keyed when
    * the artifacts are (same group, same width — enforced).
    */
  def qteSketchFromPrepared(pa: PreparedQuantiles, pb: PreparedQuantiles,
                            pcts: Seq[Int] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    qteRequires(pcts)
    require(pa.bucketWidth == pb.bucketWidth,
      s"qteSketchFromPrepared: arms carry different bucket widths " +
        s"(${pa.bucketWidth} vs ${pb.bucketWidth}) — the bucket censuses are incomparable")
    require(pa.group == pb.group,
      s"qteSketchFromPrepared: arms keyed by different segments " +
        s"(${pa.group} vs ${pb.group})")
    qteSketchJoin(pa.regs, pb.regs, pa.bucketWidth, pcts, keyCols = pa.group)
  }

  /** The shared sketch-QTE tail over two register tables: per side
    * the [[quantileFromRegisters]] midpoints (one column per pct,
    * melted to rows) + the register total, FULL OUTER join, round-6
    * midpoint difference.
    */
  private def qteSketchJoin(ra: DataFrame, rb: DataFrame, width: Double,
                            pcts: Seq[Int], keyCols: Seq[String]): DataFrame = {
    def side(regs: DataFrame, suf: String): DataFrame = {
      val wide = quantileFromRegisters(regs, keyCols, width,
        pcts.map(p => (s"__p$p", p / 100.0)))
      val n = regs.groupBy(keyCols.map(col): _*)
        .agg(sum(col("__qn")).as(s"n_$suf"))
      val melted = wide.select(keyCols.map(col) :+
        explode(array(pcts.map(p => struct(lit(p.toLong).as("pct"),
          col(s"__p$p").as(s"q_${suf}_mid"))): _*)).as("__m"): _*)
        .select(keyCols.map(col) ++ Seq(col("__m.pct").as("pct"),
          col(s"__m.q_${suf}_mid").as(s"q_${suf}_mid")): _*)
      if (keyCols.isEmpty) melted.crossJoin(broadcast(n))
      else melted.join(n, keyCols)
    }
    side(ra, "a").join(side(rb, "b"), keyCols :+ "pct", "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("qte_mid", round(col("q_b_mid") - col("q_a_mid"), 6))
      .select(keyCols.map(col) ++ Seq(col("pct"), col("n_a"), col("n_b"),
        col("q_a_mid"), col("q_b_mid"), col("qte_mid")): _*)
  }

  /** Winsorized Welch t — the ROBUST average-treatment-effect readout
    * (r17 wave 5: the heavy-tail discipline every revenue experiment
    * ships — a single whale order swings the raw mean; clipping each
    * arm at its own exact (p, 100−p) rank bounds before the t-test is
    * the standard fix, and doing it WITHIN arm keeps the estimator
    * honest under distribution shift between arms). Per arm: the
    * value count census, the exact rank bounds (the
    * [[quantileTreatmentEffect]] pick at `pctLow` and `100−pctLow`),
    * then the winsorized exact decimal moments by ONE more row scan
    * with the 1-row bounds crossed on (the q181 scalar-broadcast
    * shape; aggregating rows — not census×count — keeps every
    * product inside the q162 decimal widths) and the shared
    * [[welchTFinishFromSides]]
    * tree. The clip bounds are reported as EXACT integer cents (the
    * q161 BIGINT discipline — no DECIMAL output column). Returns ONE
    * row: (n_a, n_b, lo_a_cents, hi_a_cents, lo_b_cents, hi_b_cents,
    * mean_a, mean_b, t, df) — means/t/df over the winsorized values.
    */
  def winsorizedWelch(a: DataFrame, b: DataFrame, value: Column,
                      pctLow: Int = 5,
                      allowWideCensus: Boolean = false,
                      maxExactCensusRows: Long = MaxExactCensusRows): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(pctLow >= 1 && pctLow <= 25,
      s"winsorizedWelch: pctLow ($pctLow) must be in 1..25")
    def side(df: DataFrame, suf: String): DataFrame = {
      val census = df.filter(value.isNotNull)
        .groupBy(graft.util.Portable.dec(value).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val wRun = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      val cum = census
        .withColumn("__cr", count(lit(1)).over(wAll))
        .withColumn("__cum", gateWideCensus(sum(col("__c")).over(wRun),
          col("__cr"), "winsorizedWelch", allowWideCensus, maxExactCensusRows))
        .withColumn("__n", sum(col("__c")).over(wAll))
      def pick(pct: Int, out: String): DataFrame = cum
        .withColumn("__r", floor((lit(pct.toLong) * col("__n") + lit(99L))
          .cast("double") / lit(100.0)).cast("long"))
        .filter(col("__cum") >= col("__r"))
        .agg(min(col("__v")).as(out))
      val bounds = pick(pctLow, s"lo_$suf")
        .crossJoin(broadcast(pick(100 - pctLow, s"hi_$suf")))
      val clamped = least(greatest(graft.util.Portable.dec(value),
        col(s"lo_$suf")), col(s"hi_$suf"))
      df.filter(value.isNotNull)
        .crossJoin(broadcast(bounds))
        .select(clamped.as("__w"), col(s"lo_$suf"), col(s"hi_$suf"))
        .agg(count(lit(1)).as(s"n_$suf"),
          max(col(s"lo_$suf")).as(s"lo_$suf"),
          max(col(s"hi_$suf")).as(s"hi_$suf"),
          sum(col("__w")).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(col("__w") * col("__w")).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    // materialize the 1-row merged moment frame once: the shared
    // Welch finisher drops the bound columns, so both consumers read
    // this single row instead of re-censusing the corpus
    val merged = lineageBreaker(None)(
      side(a, "a").crossJoin(broadcast(side(b, "b")))
        .withColumn("grp", lit("all")))
    def cents(c: Column): Column = (c * 100).cast("long")
    welchTFinishFromSides(merged)
      .drop("grp")
      .crossJoin(broadcast(merged.select(
        cents(col("lo_a")).as("lo_a_cents"), cents(col("hi_a")).as("hi_a_cents"),
        cents(col("lo_b")).as("lo_b_cents"), cents(col("hi_b")).as("hi_b_cents"))))
      .select(col("n_a"), col("n_b"), col("lo_a_cents"), col("hi_a_cents"),
        col("lo_b_cents"), col("hi_b_cents"), col("mean_a"), col("mean_b"),
        col("t"), col("df"))
  }

  /** Bucketed two-sample KS — the SKETCH path for [[ksStatistic]]'s
    * wide-census refuse (r14, VERDICT r13 missing #1): pre-bucket the
    * value by the q108 portable floor division (`floor(v/width)` —
    * ONE IEEE division + floor, exactly specified, so the bucket
    * census replays bit-for-bit in any engine), then run the exact
    * DECIMAL(38,0) cross-multiplied argmax over the BUCKET census —
    * resolution-bounded (domain/width rows) regardless of how
    * near-unique the raw domain is. The reported `d_stat` is the
    * EXACT KS of the bucketed distributions: a lower bound on the
    * exact-value D, within the largest single-bucket probability
    * mass of it (each sample's CDF moves by at most one bucket's
    * mass inside a bucket). Returns ONE row:
    * (n_a, n_b, d_num BIGINT, at_bucket, d_stat) — `at_bucket·width`
    * is the gap location's bucket floor.
    */
  def ksStatisticSketch(a: DataFrame, b: DataFrame, value: Column,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1,
      s"ksStatisticSketch: bucketWidth ($bucketWidth) must be >= 1")
    def bucketed(df: DataFrame) = df.filter(value.isNotNull)
      .withColumn("__ksb",
        floor(value.cast("double") / lit(bucketWidth.toDouble)).cast("long"))
    ksStatistic(bucketed(a), bucketed(b), col("__ksb"))
      .withColumnRenamed("at_value", "at_bucket")
  }

  /** Bucketed weighted median — the SKETCH path for
    * [[weightedMedian]]'s wide-census refuse (r14): the q108 portable
    * floor-division bucket census, the same pure-integer
    * `2·cumw ≥ totw` selection over BUCKETS, and the bucket MIDPOINT
    * readout. The exact weighted median provably lies INSIDE the
    * selected bucket (buckets before it hold < half the weight, the
    * cumulative through it reaches half), so `w_median_mid` is within
    * width/2 of the exact answer — the q108 bound, spec-pinned.
    * Returns one row per group: (group, n_rows, total_weight_cents,
    * w_median_bucket, w_median_mid).
    */
  def weightedMedianSketch(df: DataFrame, group: String, value: Column,
                           weight: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1,
      s"weightedMedianSketch: bucketWidth ($bucketWidth) must be >= 1")
    val bucketed = df.filter(value.isNotNull)
      .withColumn("__wmb",
        floor(value.cast("double") / lit(bucketWidth.toDouble)).cast("long"))
    weightedMedian(bucketed, group, col("__wmb"), weight)
      .withColumnRenamed("w_median", "w_median_bucket")
      .withColumn("w_median_mid",
        col("w_median_bucket") * bucketWidth + lit(bucketWidth / 2))
  }

  /** The shared pre-bucket step of the rank-statistic sketch family
    * (r15): the q108 portable floor division — `floor(v/width)`, ONE
    * IEEE division + floor, exactly specified, so every bucket census
    * replays bit-for-bit in any engine. bucketWidth = 1 on an integer
    * domain is the identity (floor(v/1) = v): every Sketch form
    * degrades to its exact sibling, which the specs pin.
    */
  private def rankBucket(value: Column, bucketWidth: Long): Column = {
    floor(value.cast("double") / lit(bucketWidth.toDouble)).cast("long")
  }

  /** Bucketed two-sample Mann–Whitney U — the SKETCH path for
    * [[mannWhitneyU]]'s wide-census refuse (r15, VERDICT r14 missing
    * #1): pre-bucket the value by the q108 portable floor division,
    * then run the EXACT tie-averaged rank machinery over the BUCKET
    * census — resolution-bounded (domain/width rows) regardless of
    * how near-unique the raw domain is. The reported u2/z are the
    * exact MWU of the bucketed distributions: coarsening reorders
    * ONLY cross-sample pairs that land in the same bucket (a pair in
    * different buckets keeps its order; a same-bucket pair moves to
    * the tie-average ½), so
    * `|u2_sketch − u2_exact| ≤ Σ_k nA_k·nB_k` over buckets k — the
    * within-bucket cross-pair mass, provable from the bucket width
    * alone and spec-pinned. Returns ONE row: (n_a, n_b, u2, z).
    */
  def mannWhitneyUSketch(a: DataFrame, b: DataFrame, value: Column,
                         bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1,
      s"mannWhitneyUSketch: bucketWidth ($bucketWidth) must be >= 1")
    def bucketed(df: DataFrame) = df.filter(value.isNotNull)
      .withColumn("__mwb", rankBucket(value, bucketWidth))
    mannWhitneyU(bucketed(a), bucketed(b), col("__mwb"))
  }

  /** Per-group bucketed Mann–Whitney U (r15 — [[mannWhitneyUByGroup]]
    * with the q108 pre-bucket): each segment's census is bounded by
    * its bucketed domain, the [[mannWhitneyUSketch]] cross-pair bound
    * holding per segment. Returns one row per group:
    * (grp, n_a, n_b, u2, z).
    */
  def mannWhitneyUSketchByGroup(a: DataFrame, b: DataFrame, group: String,
                                value: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1,
      s"mannWhitneyUSketchByGroup: bucketWidth ($bucketWidth) must be >= 1")
    def bucketed(df: DataFrame) = df.filter(value.isNotNull)
      .withColumn("__mwb", rankBucket(value, bucketWidth))
    mannWhitneyUByGroup(bucketed(a), bucketed(b), group, col("__mwb"))
  }

  /** Bucketed Kruskal–Wallis H — the SKETCH path for
    * [[kruskalWallis]]'s wide-census refuse (r15): the exact
    * census/divmod/tie-corrected-H machinery over the q108 BUCKET
    * census. The readout is the exact KW of the bucketed values —
    * within a bucket all observations tie at the bucket's average
    * rank, so each group's rank sum moves by at most the bucket's
    * within-bucket occupancy (the [[mannWhitneyUSketch]] cross-pair
    * argument, per group pair); width 1 on an integer domain is the
    * identity (spec-pinned). Returns one row per group:
    * (grp, n, r2, n_total, k_groups, h, h_adj).
    */
  def kruskalWallisSketch(df: DataFrame, group: String, value: Column,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1,
      s"kruskalWallisSketch: bucketWidth ($bucketWidth) must be >= 1")
    kruskalWallis(df.filter(value.isNotNull)
      .withColumn("__kwb", rankBucket(value, bucketWidth)), group, col("__kwb"))
  }

  /** Per-segment bucketed Kruskal–Wallis (r15 —
    * [[kruskalWallisByGroup]] with the q108 pre-bucket; the keyed
    * census this flattens is exactly the near-unique shape the r14
    * verdict flagged on the by-group rank family). Returns one row
    * per (segment, group) with the segment's (n_total, k_groups, h,
    * h_adj) repeated.
    */
  def kruskalWallisSketchByGroup(df: DataFrame, segment: String, group: String,
                                 value: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1,
      s"kruskalWallisSketchByGroup: bucketWidth ($bucketWidth) must be >= 1")
    kruskalWallisByGroup(df.filter(value.isNotNull)
      .withColumn("__kwb", rankBucket(value, bucketWidth)),
      segment, group, col("__kwb"))
  }

  /** Bucketed Spearman rank correlation — the SKETCH path for
    * [[spearmanCorr]]'s wide-census refuse (r15): both axes
    * pre-bucket by their own q108 widths, then the exact doubled-
    * average-rank machinery runs over the two BUCKET censuses (each
    * resolution-bounded) with the value-keyed join-backs keyed by
    * bucket. ρ is the exact Spearman of the coarsened pairs — each
    * row's doubled rank moves by at most its bucket's occupancy, so
    * the coarsening error vanishes as widths shrink (width 1 on
    * integer domains is the identity, spec-pinned). Returns ONE row:
    * (n, rho).
    */
  def spearmanCorrSketch(df: DataFrame, x: Column, y: Column,
                         bucketWidthX: Long, bucketWidthY: Long): DataFrame = {
    require(bucketWidthX >= 1 && bucketWidthY >= 1,
      s"spearmanCorrSketch: bucket widths ($bucketWidthX, $bucketWidthY) must be >= 1")
    spearmanCorr(df.filter(x.isNotNull && y.isNotNull)
      .withColumn("__sbx", rankBucket(x, bucketWidthX))
      .withColumn("__sby", rankBucket(y, bucketWidthY)),
      col("__sbx"), col("__sby"))
  }

  /** Per-segment bucketed Spearman (r15 — [[spearmanCorrByGroup]]
    * with both axes pre-bucketed: the q178 shape — TWO near-unique
    * per-segment censuses plus two row-frame joins — collapses to
    * bucket-domain censuses; the 2.7× scale probe that motivated
    * this family flattens because the join-back keys and windows now
    * walk domain/width rows per segment). Returns one row per
    * segment: (grp, n, rho).
    */
  def spearmanCorrSketchByGroup(df: DataFrame, group: String,
                                x: Column, y: Column,
                                bucketWidthX: Long, bucketWidthY: Long): DataFrame = {
    require(bucketWidthX >= 1 && bucketWidthY >= 1,
      s"spearmanCorrSketchByGroup: bucket widths ($bucketWidthX, $bucketWidthY) must be >= 1")
    spearmanCorrByGroup(df.filter(col(group).isNotNull && x.isNotNull && y.isNotNull)
      .withColumn("__sbx", rankBucket(x, bucketWidthX))
      .withColumn("__sby", rankBucket(y, bucketWidthY)),
      group, col("__sbx"), col("__sby"))
  }

  /** Shannon entropy of a categorical column per group (r13 — the
    * data-profiling / governance readout beside
    * [[GraftDataFrameOps.checkConstraints]]: "how concentrated is
    * this column per segment" — a near-zero entropy flags a
    * constant-in-segment column, a near-max one a key-like column):
    * over the (group, category) census, `H = −Σ p·ln p` with each
    * O(1)-magnitude term rounded at 12 and summed as DECIMAL(38,12)
    * (the q155 order-free discipline), rounded at 6; the normalized
    * `H/ln(k)` reports alongside (null for single-category groups —
    * never a division by zero). Null categories drop (stated).
    * Returns one row per group:
    * (group, n_rows, k_categories, entropy, entropy_norm).
    *
    * Scale shape: one map-combinable census + group-partitioned
    * windows over the census + one group aggregate — cost tracks the
    * category domain.
    */
  def categoryEntropy(df: DataFrame, group: String, cat: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val census = df.filter(col(group).isNotNull && cat.isNotNull)
      .groupBy(col(group).as("__g"), cat.as("__c"))
      .agg(count(lit(1)).as("__cnt"))
    val wAll = Window.partitionBy(col("__g"))
    val p = col("__cnt").cast("double") / col("__n").cast("double")
    val withTerms = census
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__term", round(-(p * log(p)), 12))
    withTerms
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("n_rows"), max(col("__k")).as("k_categories"),
        sum(col("__term").cast(DecimalType(38, 12))).as("__hsum"))
      .withColumn("entropy", round(col("__hsum").cast("double"), 6))
      .withColumn("entropy_norm", when(col("k_categories") > 1,
        round(col("__hsum").cast("double") /
          log(col("k_categories").cast("double")), 6)))
      .select(col("__g").as(group), col("n_rows"), col("k_categories"),
        col("entropy"), col("entropy_norm"))
  }

  /** Column-profile drift between two frames (r13 — the schema-level
    * governance readout beside [[GraftDataFrameOps.checkConstraints]]
    * and q168's entropy: "which columns CHANGED SHAPE between eras /
    * sources" — null-rate jumps and cardinality collapses are the
    * classic silent-upstream-breakage signals): for each named
    * column, exact row/null/distinct counts on BOTH sides plus fixed
    * round-6 null rates and the distinct-count ratio. Returns one
    * row per column, ordered by name:
    * (column, n_a, nulls_a, distinct_a, null_rate_a, n_b, nulls_b,
    * distinct_b, null_rate_b, distinct_ratio).
    *
    * Scale shape: ONE aggregate pass per side (all columns' counts
    * in one map-combinable agg — exact multi-column COUNT(DISTINCT)
    * expands the input k-fold, the inherent price of exactness;
    * route wide profiles to the HLL sketch path when k-fold expand
    * is too dear — stated), one 1-row × 1-row cross, one k-row
    * unpivot. Never a per-column scan.
    */
  def profileDrift(a: DataFrame, b: DataFrame,
                   columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profileDrift: at least one column")
    columns.foreach { c =>
      require(a.columns.contains(c) && b.columns.contains(c),
        s"profileDrift: column '$c' must exist on both sides")
    }
    val cols = columns.sorted
    def side(df: DataFrame, suf: String): DataFrame =
      df.agg(count(lit(1)).as(s"n_$suf"),
        cols.flatMap(c => Seq(
          count(col(c)).as(s"__nn_${suf}_$c"),
          countDistinct(col(c)).as(s"__nd_${suf}_$c"))): _*)
    val joined = side(a, "a").crossJoin(broadcast(side(b, "b")))
    // one stack unpivot: k rows out of the single profile row
    val stackArgs = cols.map(c =>
      s"'$c', `__nn_a_$c`, `__nd_a_$c`, `__nn_b_$c`, `__nd_b_$c`").mkString(", ")
    joined
      .select(col("n_a"), col("n_b"),
        expr(s"stack(${cols.length}, $stackArgs) AS " +
          "(column, __nn_a, __nd_a, __nn_b, __nd_b)"))
      .withColumn("nulls_a", col("n_a") - col("__nn_a"))
      .withColumn("nulls_b", col("n_b") - col("__nn_b"))
      .withColumn("null_rate_a", when(col("n_a") > 0,
        round(col("nulls_a").cast("double") / col("n_a").cast("double"), 6)))
      .withColumn("null_rate_b", when(col("n_b") > 0,
        round(col("nulls_b").cast("double") / col("n_b").cast("double"), 6)))
      .withColumn("distinct_ratio", when(col("__nd_a") > 0,
        round(col("__nd_b").cast("double") / col("__nd_a").cast("double"), 6)))
      .select(col("column"), col("n_a"), col("nulls_a"),
        col("__nd_a").as("distinct_a"), col("null_rate_a"),
        col("n_b"), col("nulls_b"), col("__nd_b").as("distinct_b"),
        col("null_rate_b"), col("distinct_ratio"))
  }

  /** Cumulative Poisson(1) thresholds P(X ≤ k), k = 0..5 — computed
    * ONCE here and shared by [[bootstrapCiMean]] (as double literals)
    * and its oracle SQL (as 17-significant-digit e-notation literals,
    * the q136 embedding discipline) so both engines compare the
    * IDENTICAL doubles. Weights cap at 6 (P(X > 6) ≈ 8·10⁻⁵ — the
    * tail mass lands on 6, stated).
    */
  val poissonCdf1: IndexedSeq[Double] = {
    var f = 1.0; var sum = 0.0
    (0 to 5).map { k =>
      if (k > 0) f *= k
      sum += math.exp(-1.0) / f
      sum
    }
  }

  /** Deterministic Poisson-bootstrap confidence interval for the
    * mean (r13 — the resampling member of the statistics family:
    * "how sure are we of this mean" WITHOUT normality, the interval
    * q162's t cannot give for skewed metrics): each of `b` resamples
    * weights every row by a Poisson(1) draw derived from a PORTABLE
    * seeded hash family — two 28-bit md5 hashes per row combined
    * affinely per resample, `u_b = ((h1 + b·h2) mod 2²⁸)/2²⁸` (the
    * minhash-family construction) — so the "random" resampling
    * replays bit-for-bit on any engine, any partitioning, any day,
    * at TWO hashes per row instead of one per (row, resample). Per resample the weighted mean is one fixed double
    * division over exact integer sums; the interval takes the
    * ⌈α/2·B⌉-th smallest and symmetric largest resample means by
    * EXACT rank (real resample values, no interpolation). Returns
    * ONE row: (n, b_resamples, b_effective, mean, ci_lo, ci_hi) —
    * b_effective counts resamples with nonzero total weight (an
    * all-zero resample is astronomically unlikely past tiny n but
    * reported, never silently absorbed).
    *
    * Scale shape (r14 — VERDICT r13 wrong #3 closed): ONE scan, no
    * row blowup — all B (num, den) running sums live in a single
    * 2B-long aggregation buffer ([[graft.functions.PoissonBootstrap]],
    * a TypedImperativeAggregate), so each row is read once and the
    * shuffle carries one buffer per partition; the B-row explode
    * happens AFTER aggregation, on the B-element result array. The
    * prior ×B map-side explode produced bit-identical numbers
    * (commutative Long sums, same IEEE decisions) at B× the scan
    * rows — spec-pinned equality. The rank selection walks B rows;
    * the full-data mean is one more 1-row aggregate crossed on.
    */
  def bootstrapCiMean(df: DataFrame, id: String, value: Column,
                      b: Int = 100, seed: Long = 7L,
                      alpha: Double = 0.05): DataFrame = {
    require(b >= 4 && b <= 10000, s"bootstrapCiMean: b ($b) must be in 4..10000")
    require(alpha > 0.0 && alpha < 0.5, s"bootstrapCiMean: alpha ($alpha) in (0, 0.5)")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // TWO md5s per row, not one per (row, resample): the affine
    // family u_b = ((h1 + b·h2) mod 2²⁸)/2²⁸ over 28-bit seeded
    // hashes (the minhashPairs trick — overflow-free under ANSI:
    // b·h2 < 2³⁵ at b ≤ 10⁴) cuts the dominant hash cost ×B while
    // staying bit-portable; the first gate run at ×100 md5s was
    // 6× slower at sf0.1
    def h28(tag: String): Column =
      conv(substring(md5(concat(lit(s"$tag:$seed:"), col("__id"))
        .cast("binary")), 1, 7), 16, 10).cast("long")
    val base = df.filter(col(id).isNotNull && value.isNotNull)
      .select(col(id).cast("string").as("__id"),
        (graft.util.Portable.dec(value) * 100).cast("long").as("__c"))
      .withColumn("__h1", h28("bs1"))
      .withColumn("__h2", h28("bs2"))
    // single-pass: all B (num, den) running sums live in ONE
    // aggregation buffer ([[graft.functions.PoissonBootstrap]] — r14,
    // replacing the ×B map-side explode; same hashes, same IEEE u and
    // weight decisions, commutative Long sums → bit-identical output)
    val means = base
      .agg(call_function("poisson_bootstrap",
        col("__h1"), col("__h2"), col("__c"), lit(b)).as("__bs"))
      .select(explode(col("__bs")).as("__r"))
      .select(col("__r.b").as("__b"), col("__r.num").as("__num"),
        col("__r.den").as("__den"))
      .filter(col("__den") > 0)
      .withColumn("__mean", col("__num").cast("double") / col("__den").cast("double"))
    val wAll = Window.partitionBy()
    val ci = means
      .withColumn("__eff", count(lit(1)).over(wAll))
      .withColumn("__loK", greatest(ceil(lit(alpha / 2) * col("__eff")), lit(1L)))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__mean"), col("__b"))))
      .agg(max(col("__eff")).as("b_effective"),
        min(when(col("__rk") === col("__loK"), col("__mean"))).as("__lo"),
        min(when(col("__rk") === col("__eff") + 1 - col("__loK"), col("__mean"))).as("__hi"))
    val full = base.agg(count(lit(1)).as("n"), sum(col("__c")).as("__t"))
    full.crossJoin(broadcast(ci))
      .withColumn("b_resamples", lit(b.toLong))
      .withColumn("mean", when(col("n") > 0,
        round(col("__t").cast("double") / (col("n") * 100).cast("double"), 6)))
      .withColumn("ci_lo", round(col("__lo") / lit(100.0), 6))
      .withColumn("ci_hi", round(col("__hi") / lit(100.0), 6))
      .select(col("n"), col("b_resamples"), col("b_effective"),
        col("mean"), col("ci_lo"), col("ci_hi"))
  }

  /** CUPED variance-reduced A/B readout (r13 — the
    * experimentation-platform refinement of
    * [[GraftDataFrameOps.abTest]]/[[welchT]]: adjust each unit's
    * metric by its PRE-experiment covariate, `y′ = y − θ(x − x̄)`
    * with `θ = cov(x,y)/var(x)` pooled — same means, often 30–50%
    * smaller variance, tighter z at the same traffic): everything
    * derives from per-arm EXACT integer moment sums (n, Σx, Σy,
    * Σx², Σy², Σxy in cents over the [[graft.util.Portable]] view) —
    * the adjusted per-arm mean and variance EXPAND ALGEBRAICALLY in
    * those sums (`Σy′ = Σy − θ(Σx − n·x̄)`, the quadratic likewise),
    * so no per-row adjusted double is ever summed (an order-dependent
    * Σy′² would break replay; the expansion is the whole trick).
    * One fixed double tree: θ, adjusted means/variances, and the
    * two-sample z over them, round 6; degenerate inputs (zero
    * covariate variance → θ = 0 by convention — CUPED degrades to
    * the plain test; n < 2 or zero SE → null z) report. Returns ONE
    * row: (n_a, n_b, theta, mean_a, mean_b, mean_adj_a, mean_adj_b,
    * z).
    *
    * Scale shape: one (arm) grouped moment aggregate — map-combinable
    * — plus two 1-row finishing frames; nothing per-unit survives
    * the first pass.
    */
  def cupedZ(units: DataFrame, arm: Column, metric: Column,
             covariate: Column, armA: String, armB: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val base = units.filter(arm.isNotNull && metric.isNotNull && covariate.isNotNull)
      .select(arm.cast("string").as("__arm"),
        (graft.util.Portable.dec(metric) * 100).cast("long").as("__y"),
        (graft.util.Portable.dec(covariate) * 100).cast("long").as("__x"))
      .filter(col("__arm").isin(armA, armB))
    val perArm = base.groupBy(col("__arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x").cast(d19) * col("__x").cast(d19)).cast(DecimalType(38, 0)).as("__sxx"),
        sum(col("__y").cast(d19) * col("__y").cast(d19)).cast(DecimalType(38, 0)).as("__syy"),
        sum(col("__x").cast(d19) * col("__y").cast(d19)).cast(DecimalType(38, 0)).as("__sxy"))
    def armRow(a: String, suf: String) = perArm.filter(col("__arm") === a)
      .select(col("n").as(s"n_$suf"), col("__sx").as(s"__sx_$suf"),
        col("__sy").as(s"__sy_$suf"), col("__sxx").as(s"__sxx_$suf"),
        col("__syy").as(s"__syy_$suf"), col("__sxy").as(s"__sxy_$suf"))
    val j = armRow(armA, "a").crossJoin(broadcast(armRow(armB, "b")))
    def d(c: String) = col(c).cast("double")
    val nT = d("n_a") + d("n_b")
    val sxT = d("__sx_a") + d("__sx_b"); val syT = d("__sy_a") + d("__sy_b")
    val sxxT = d("__sxx_a") + d("__sxx_b"); val sxyT = d("__sxy_a") + d("__sxy_b")
    val varXN = nT * sxxT - sxT * sxT  // n²·var(x), pooled
    val covN = nT * sxyT - sxT * syT
    val theta = when(varXN > 0.0, covN / varXN).otherwise(lit(0.0))
    val xbar = sxT / nT
    def adj(suf: String) = {
      val n = d(s"n_$suf"); val sx = d(s"__sx_$suf"); val sy = d(s"__sy_$suf")
      val sxx = d(s"__sxx_$suf"); val syy = d(s"__syy_$suf"); val sxy = d(s"__sxy_$suf")
      val sAdj = sy - col("__theta") * (sx - n * col("__xbar"))
      val sqAdj = syy - lit(2.0) * col("__theta") * (sxy - col("__xbar") * sy) +
        col("__theta") * col("__theta") *
          (sxx - lit(2.0) * col("__xbar") * sx + n * col("__xbar") * col("__xbar"))
      val m = sAdj / n
      val v = (sqAdj - sAdj * sAdj / n) / (n - lit(1.0))
      (m, v)
    }
    val (ma, va) = adj("a"); val (mb, vb) = adj("b")
    val se2 = va / d("n_a") + vb / d("n_b")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    j.withColumn("__theta", theta)
      .withColumn("__xbar", xbar)
      .withColumn("theta", round(col("__theta"), 6))
      .withColumn("mean_a", round(d("__sy_a") / d("n_a") / lit(100.0), 6))
      .withColumn("mean_b", round(d("__sy_b") / d("n_b") / lit(100.0), 6))
      .withColumn("mean_adj_a", round(ma / lit(100.0), 6))
      .withColumn("mean_adj_b", round(mb / lit(100.0), 6))
      .withColumn("z", when(ok && se2 > 0.0,
        round((ma - mb) / sqrt(se2), 6)))
      .select(col("n_a"), col("n_b"), col("theta"), col("mean_a"),
        col("mean_b"), col("mean_adj_a"), col("mean_adj_b"), col("z"))
  }

  /** Per-segment CUPED z (r16 wave 5 — [[cupedZ]] keyed by a
    * unit-level segment column, joining the per-segment experiment
    * family beside welch/mwu/ks/anova ByGroup: variance reduction is
    * MOST needed exactly where segments thin the traffic, and a
    * whole-frame θ ignores that segments regress differently): per
    * (segment, arm) the same six exact integer-cent moment sums in
    * ONE pass, a segment-keyed full-outer arm join (a segment seen
    * in one arm only reports its counts and means with null θ/z —
    * observable, where the whole-frame form would emit an empty
    * frame), then the identical pooled-θ / adjusted-moment / z tree
    * PER SEGMENT — θ is per-segment pooled, so each segment gets the
    * regression its own covariate actually has. All divisors run on
    * the stand-in discipline (absent or n<2 sides never reach a
    * divisor); multiplier uses of n stay raw, divisor uses are
    * guarded, so both-sides-present segments are value-identical to
    * the whole-frame tree by construction. Returns one row per
    * segment: (grp, n_a, n_b, theta, mean_a, mean_b, mean_adj_a,
    * mean_adj_b, z).
    *
    * Scale shape: one map-combinable (segment, arm) census + one
    * segment-keyed join — no cross joins in the keyed form (the
    * q188 statement).
    */
  def cupedZByGroup(units: DataFrame, group: String, arm: Column,
                    metric: Column, covariate: Column,
                    armA: String, armB: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val base = units.filter(col(group).isNotNull && arm.isNotNull &&
        metric.isNotNull && covariate.isNotNull)
      .select(col(group).as("grp"), arm.cast("string").as("__arm"),
        (graft.util.Portable.dec(metric) * 100).cast("long").as("__y"),
        (graft.util.Portable.dec(covariate) * 100).cast("long").as("__x"))
      .filter(col("__arm").isin(armA, armB))
    val perArm = base.groupBy(col("grp"), col("__arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x").cast(d19) * col("__x").cast(d19)).cast(DecimalType(38, 0)).as("__sxx"),
        sum(col("__y").cast(d19) * col("__y").cast(d19)).cast(DecimalType(38, 0)).as("__syy"),
        sum(col("__x").cast(d19) * col("__y").cast(d19)).cast(DecimalType(38, 0)).as("__sxy"))
    def armRows(a: String, suf: String) = perArm.filter(col("__arm") === a)
      .select(col("grp"), col("n").as(s"n_$suf"), col("__sx").as(s"__sx_$suf"),
        col("__sy").as(s"__sy_$suf"), col("__sxx").as(s"__sxx_$suf"),
        col("__syy").as(s"__syy_$suf"), col("__sxy").as(s"__sxy_$suf"))
    val j = armRows(armA, "a").join(armRows(armB, "b"), Seq("grp"), "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    def d(c: String) = col(c).cast("double")
    val bothPresent = col("n_a") >= 1 && col("n_b") >= 1
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    // stand-in divisors (the cohensDByGroup two-tier discipline);
    // multiplier uses of n stay RAW so both-present segments are
    // value-identical to the whole-frame tree
    def nS(suf: String) = when(col(s"n_$suf") >= 1, d(s"n_$suf")).otherwise(lit(1.0))
    def n1S(suf: String) =
      when(col(s"n_$suf") >= 2, d(s"n_$suf") - lit(1.0)).otherwise(lit(1.0))
    val nT = d("n_a") + d("n_b")
    val nTS = when(col("n_a") + col("n_b") >= 1, nT).otherwise(lit(1.0))
    val sxT = d("__sx_a") + d("__sx_b"); val syT = d("__sy_a") + d("__sy_b")
    val sxxT = d("__sxx_a") + d("__sxx_b"); val sxyT = d("__sxy_a") + d("__sxy_b")
    val varXN = nT * sxxT - sxT * sxT
    val covN = nT * sxyT - sxT * syT
    val theta = when(varXN > 0.0, covN / varXN).otherwise(lit(0.0))
    def adj(suf: String) = {
      val n = d(s"n_$suf"); val sx = d(s"__sx_$suf"); val sy = d(s"__sy_$suf")
      val sxx = d(s"__sxx_$suf"); val syy = d(s"__syy_$suf")
      val sxy = d(s"__sxy_$suf")
      val sAdj = sy - col("__theta") * (sx - n * col("__xbar"))
      val sqAdj = syy - lit(2.0) * col("__theta") * (sxy - col("__xbar") * sy) +
        col("__theta") * col("__theta") *
          (sxx - lit(2.0) * col("__xbar") * sx + n * col("__xbar") * col("__xbar"))
      val m = sAdj / nS(suf)
      val v = (sqAdj - sAdj * sAdj / nS(suf)) / n1S(suf)
      (m, v)
    }
    val withPooled = j
      .withColumn("__theta", theta)
      .withColumn("__xbar", sxT / nTS)
    val (ma, va) = adj("a"); val (mb, vb) = adj("b")
    val se2 = va / nS("a") + vb / nS("b")
    withPooled
      .withColumn("theta", when(bothPresent, round(col("__theta"), 6)))
      .withColumn("mean_a",
        when(col("n_a") > 0, round(d("__sy_a") / nS("a") / lit(100.0), 6)))
      .withColumn("mean_b",
        when(col("n_b") > 0, round(d("__sy_b") / nS("b") / lit(100.0), 6)))
      .withColumn("mean_adj_a",
        when(col("n_a") > 0 && bothPresent, round(ma / lit(100.0), 6)))
      .withColumn("mean_adj_b",
        when(col("n_b") > 0 && bothPresent, round(mb / lit(100.0), 6)))
      .withColumn("z", when(ok && se2 > 0.0, round((ma - mb) / sqrt(se2), 6)))
      .select(col("grp"), col("n_a"), col("n_b"), col("theta"),
        col("mean_a"), col("mean_b"), col("mean_adj_a"), col("mean_adj_b"),
        col("z"))
  }

  /** Difference-in-differences estimator (r13 — the
    * quasi-experimental readout for when you CANNOT randomize: a
    * policy/price/feature hits one group at a known time, the
    * control group's before→after drift nets out the secular trend):
    * the four (group × period) cells aggregate exact cent sums and
    * counts in ONE pass; the estimate
    * `DiD = (T_post − T_pre) − (C_post − C_pre)` and its standard
    * error `√Σ s²ᵢ/nᵢ` over the four cells' exact-moment variances
    * are one fixed double tree, round 6 (any cell with n < 2 → null
    * se/t, the estimate still reports when all four means exist).
    * Returns ONE row: (n_t_pre, n_t_post, n_c_pre, n_c_post,
    * mean_t_pre, mean_t_post, mean_c_pre, mean_c_post, did, se, t).
    *
    * Scale shape: one 4-cell grouped aggregate + a 4-row pivot —
    * nothing else.
    */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
                 value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val cells = df.filter(treated.isNotNull && post.isNotNull && value.isNotNull)
      .select(concat(when(treated, "t").otherwise("c"),
          when(post, "_post").otherwise("_pre")).as("__cell"),
        (graft.util.Portable.dec(value) * 100).cast("long").as("__v"))
      .groupBy(col("__cell"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v").cast(d19) * col("__v").cast(d19))
          .cast(DecimalType(38, 0)).as("__ss"))
    val wide = cells.groupBy()
      .pivot("__cell", Seq("t_pre", "t_post", "c_pre", "c_post"))
      .agg(max(col("__n")).as("n"), max(col("__s")).as("s"), max(col("__ss")).as("ss"))
    def n(c: String) = coalesce(col(s"${c}_n"), lit(0L)).cast("double")
    def sD(c: String) = col(s"${c}_s").cast("double")
    def ssD(c: String) = col(s"${c}_ss").cast("double")
    def mean(c: String) = sD(c) / n(c) / lit(100.0)
    def vOverN(c: String) =
      ((ssD(c) - sD(c) * sD(c) / n(c)) / (n(c) - lit(1.0))) / n(c) / lit(10000.0)
    val cellsOk = Seq("t_pre", "t_post", "c_pre", "c_post")
    val allPresent = cellsOk.map(c => n(c) > 0).reduce(_ && _)
    val allVar = cellsOk.map(c => n(c) >= 2).reduce(_ && _)
    val did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    val se2 = cellsOk.map(vOverN).reduce(_ + _)
    wide
      .withColumn("n_t_pre", coalesce(col("t_pre_n"), lit(0L)))
      .withColumn("n_t_post", coalesce(col("t_post_n"), lit(0L)))
      .withColumn("n_c_pre", coalesce(col("c_pre_n"), lit(0L)))
      .withColumn("n_c_post", coalesce(col("c_post_n"), lit(0L)))
      .withColumn("mean_t_pre", when(n("t_pre") > 0, round(mean("t_pre"), 6)))
      .withColumn("mean_t_post", when(n("t_post") > 0, round(mean("t_post"), 6)))
      .withColumn("mean_c_pre", when(n("c_pre") > 0, round(mean("c_pre"), 6)))
      .withColumn("mean_c_post", when(n("c_post") > 0, round(mean("c_post"), 6)))
      .withColumn("did", when(allPresent, round(did, 6)))
      .withColumn("se", when(allVar && se2 > 0.0, round(sqrt(se2), 6)))
      .withColumn("t", when(allVar && se2 > 0.0, round(did / sqrt(se2), 6)))
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        col("mean_t_pre"), col("mean_t_post"), col("mean_c_pre"),
        col("mean_c_post"), col("did"), col("se"), col("t"))
  }

  /** Per-segment difference-in-differences (r16 wave 6 —
    * [[diffInDiff]] keyed by a segment column, the quasi-experimental
    * member of the per-segment family: a policy that hits everyone
    * at once still lands DIFFERENTLY per market/device/cohort, and
    * the whole-frame DiD averages that away): per (segment, group ×
    * period) cell the same exact cent sums in ONE pass, a per-segment
    * 4-cell pivot, the identical estimate/SE tree per segment. All
    * cell divisors run on the two-tier stand-in discipline (a missing
    * or n<2 cell never reaches a divisor — the whole-frame form
    * would crash on a 1-row cell; here it reports null se/t with the
    * counts saying why, observable). Returns one row per segment:
    * (grp, n_t_pre, n_t_post, n_c_pre, n_c_post, mean_t_pre,
    * mean_t_post, mean_c_pre, mean_c_post, did, se, t).
    *
    * Scale shape: one map-combinable (segment, cell) census + one
    * segments×4 pivot — nothing corpus-sized after the census.
    */
  def diffInDiffByGroup(df: DataFrame, group: String, treated: Column,
                        post: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d19 = DecimalType(19, 0)
    val cells = df.filter(col(group).isNotNull && treated.isNotNull &&
        post.isNotNull && value.isNotNull)
      .select(col(group).as("grp"),
        concat(when(treated, "t").otherwise("c"),
          when(post, "_post").otherwise("_pre")).as("__cell"),
        (graft.util.Portable.dec(value) * 100).cast("long").as("__v"))
      .groupBy(col("grp"), col("__cell"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v").cast(d19) * col("__v").cast(d19))
          .cast(DecimalType(38, 0)).as("__ss"))
    val wide = cells.groupBy(col("grp"))
      .pivot("__cell", Seq("t_pre", "t_post", "c_pre", "c_post"))
      .agg(max(col("__n")).as("n"), max(col("__s")).as("s"),
        max(col("__ss")).as("ss"))
    def nC(c: String) = coalesce(col(s"${c}_n"), lit(0L))
    def nRaw(c: String) = nC(c).cast("double")
    // two stand-in tiers (the cohensDByGroup discipline): means valid
    // from n = 1, variance divisors from n = 2
    def nM(c: String) = when(nC(c) >= 1, nRaw(c)).otherwise(lit(1.0))
    def n1S(c: String) = when(nC(c) >= 2, nRaw(c) - lit(1.0)).otherwise(lit(1.0))
    def sD(c: String) = col(s"${c}_s").cast("double")
    def ssD(c: String) = col(s"${c}_ss").cast("double")
    def mean(c: String) = sD(c) / nM(c) / lit(100.0)
    def vOverN(c: String) =
      ((ssD(c) - sD(c) * sD(c) / nM(c)) / n1S(c)) / nM(c) / lit(10000.0)
    val cellsOk = Seq("t_pre", "t_post", "c_pre", "c_post")
    val allPresent = cellsOk.map(c => nC(c) > 0).reduce(_ && _)
    val allVar = cellsOk.map(c => nC(c) >= 2).reduce(_ && _)
    val did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    val se2 = cellsOk.map(vOverN).reduce(_ + _)
    wide
      .withColumn("n_t_pre", nC("t_pre"))
      .withColumn("n_t_post", nC("t_post"))
      .withColumn("n_c_pre", nC("c_pre"))
      .withColumn("n_c_post", nC("c_post"))
      .withColumn("mean_t_pre", when(nC("t_pre") > 0, round(mean("t_pre"), 6)))
      .withColumn("mean_t_post", when(nC("t_post") > 0, round(mean("t_post"), 6)))
      .withColumn("mean_c_pre", when(nC("c_pre") > 0, round(mean("c_pre"), 6)))
      .withColumn("mean_c_post", when(nC("c_post") > 0, round(mean("c_post"), 6)))
      .withColumn("did", when(allPresent, round(did, 6)))
      .withColumn("se", when(allVar && se2 > 0.0, round(sqrt(se2), 6)))
      .withColumn("t", when(allVar && se2 > 0.0, round(did / sqrt(se2), 6)))
      .select(col("grp"), col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
        col("n_c_post"), col("mean_t_pre"), col("mean_t_post"),
        col("mean_c_pre"), col("mean_c_post"), col("did"), col("se"), col("t"))
  }

  /** Period-over-period report (r13 — the WoW/MoM dashboard readout
    * every revenue review opens with): per (group, calendar period)
    * exact cent totals and row counts, each period's delta and
    * percent change vs the group's PREVIOUS OBSERVED period (lag
    * over the period-ordered group window — a silent gap is visible
    * as the period ids jump; first periods report null change;
    * a zero previous total nulls the percent, never ÷0). `periodFmt`
    * is a date_format pattern (yyyy-MM for MoM, yyyy-'W'ww for WoW).
    * Returns one row per (group, period):
    * (group, period, n_rows, total_cents, prev_cents, delta_cents,
    * pct_change).
    *
    * Scale shape: one map-combinable (group, period) aggregate + one
    * group-partitioned window over the PERIOD-sized frame.
    */
  def periodOverPeriod(df: DataFrame, group: String, time: String,
                       value: Column,
                       periodFmt: String = "yyyy-MM"): DataFrame = {
    val cells = df.filter(col(group).isNotNull && col(time).isNotNull &&
        value.isNotNull)
      .select(col(group).as("__g"),
        date_format(col(time).cast("timestamp"), periodFmt).as("period"),
        (graft.util.Portable.dec(value) * 100).cast("long").as("__c"))
      .groupBy(col("__g"), col("period"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__c")).as("total_cents"))
    val w = Window.partitionBy(col("__g")).orderBy(col("period"))
    cells
      .withColumn("prev_cents", lag(col("total_cents"), 1).over(w))
      .withColumn("delta_cents", col("total_cents") - col("prev_cents"))
      .withColumn("pct_change", when(col("prev_cents") =!= 0,
        round(col("delta_cents").cast("double") /
          col("prev_cents").cast("double"), 6)))
      .withColumnRenamed("__g", group)
  }

  /** Per-group Welch t (r13 — [[welchT]] keyed by a segment column,
    * completing the per-group experiment family beside
    * [[ksStatisticByGroup]]/[[mannWhitneyUByGroup]]: the continuous-
    * metric mean-shift readout per cohort): per side one grouped
    * exact-decimal moment aggregate, a keyed full-outer merge (a
    * group present on only one side still reports, counts saying
    * which side is empty), and the same fixed t / Welch–Satterthwaite
    * df tree per group. Returns one row per group:
    * (grp, n_a, n_b, mean_a, mean_b, t, df).
    */
  def welchTByGroup(a: DataFrame, b: DataFrame, group: String,
                    value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(col(group).isNotNull && value.isNotNull)
        .groupBy(col(group).as("grp"))
        .agg(count(lit(1)).as(s"n_$suf"),
          sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    welchTFinishFromSides(side(a, "a").join(side(b, "b"), Seq("grp"), "full_outer"))
  }

  /** The shared Welch-by-group finishing tree over a keyed
    * full-outer moment merge — (grp, n_a, __s_a, __ss_a, n_b, __s_b,
    * __ss_b), the n columns possibly null from the outer join. The
    * ONE place the keyed t/df expressions live (r17): the row-input
    * [[welchTByGroup]] and the artifact-input
    * [[governanceBatteryFromPrepared]] both end here, so the two can
    * never silently diverge (the msprtFinishCols discipline).
    */
  private[graft] def welchTFinishFromSides(merged: DataFrame): DataFrame = {
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    def vn(s: String) = v(s) / nD(s)
    val se2 = vn("a") + vn("b")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val df_ = se2 * se2 /
      (vn("a") * vn("a") / (nD("a") - lit(1.0)) +
        vn("b") * vn("b") / (nD("b") - lit(1.0)))
    merged
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("mean_a", when(col("n_a") > 0, round(mean("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(mean("b"), 6)))
      .withColumn("t", when(ok && se2 > 0.0,
        round((mean("a") - mean("b")) / sqrt(se2), 6)))
      .withColumn("df", when(ok && se2 > 0.0, round(df_, 6)))
      .select(col("grp"), col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"), col("t"), col("df"))
  }

  /** Per-segment minimum-detectable-effect readout (r14 —
    * [[mdeReadout]] keyed by a segment column, completing the
    * per-segment experimentation family (KS/MWU/PSI/Welch/KW/Spearman
    * by group): real platforms SIZE per segment — a test powered on
    * the whole only is unreadable for the cohort the launch decision
    * actually hinges on. Same exact-decimal moments per (segment,
    * side), a keyed full-outer merge (one-sided segments report with
    * counts saying which side is empty), the same fixed
    * `(z_{1−α/2}+z_power)·√(s²_a/n_a + s²_b/n_b)` tree per segment,
    * round 6. Returns one row per segment:
    * (grp, n_a, n_b, mean_a, mean_b, mde_abs, mde_rel).
    */
  def mdeReadoutByGroup(a: DataFrame, b: DataFrame, group: String,
                        value: Column, zAlpha: Double = zAlpha025,
                        zPower: Double = zPower80): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(zAlpha > 0.0 && zPower >= 0.0, "mdeReadoutByGroup: z constants must be positive")
    def side(df: DataFrame, suf: String): DataFrame = {
      val d = graft.util.Portable.dec(value)
      df.filter(col(group).isNotNull && value.isNotNull)
        .groupBy(col(group).as("grp"))
        .agg(count(lit(1)).as(s"n_$suf"),
          sum(d).cast(DecimalType(38, 2)).as(s"__s_$suf"),
          sum(d * d).cast(DecimalType(38, 4)).as(s"__ss_$suf"))
    }
    def nD(s: String) = col(s"n_$s").cast("double")
    def sx(s: String) = col(s"__s_$s").cast("double")
    def sxx(s: String) = col(s"__ss_$s").cast("double")
    def mean(s: String) = sx(s) / nD(s)
    def v(s: String) = (sxx(s) - sx(s) * sx(s) / nD(s)) / (nD(s) - lit(1.0))
    val se2 = v("a") / nD("a") + v("b") / nD("b")
    val ok = col("n_a") >= 2 && col("n_b") >= 2
    val mde = (lit(zAlpha) + lit(zPower)) * sqrt(se2)
    side(a, "a").join(side(b, "b"), Seq("grp"), "full_outer")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("mean_a", when(col("n_a") > 0, round(mean("a"), 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(mean("b"), 6)))
      .withColumn("mde_abs", when(ok && se2 > 0.0, round(mde, 6)))
      .withColumn("mde_rel", when(ok && se2 > 0.0 && mean("a") =!= 0.0,
        round(mde / mean("a"), 6)))
      .select(col("grp"), col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"), col("mde_abs"), col("mde_rel"))
  }

  /** The distinct (unit, day) census behind [[GraftDataFrameOps.rollingActives]],
    * [[GraftDataFrameOps.newVsReturning]] and [[PreparedActives]] —
    * the one frame every actives readout derives from.
    */
  private[graft] def activesCensus(df: DataFrame, unit: String,
                                   time: String): DataFrame =
    df.filter(col(unit).isNotNull && col(time).isNotNull)
      .select(col(unit).as("__u"), to_date(col(time)).as("day"))
      .distinct()

  private[graft] def serveRollingActives(census: DataFrame,
                                         windowDays: Int): DataFrame = {
    require(windowDays >= 1 && windowDays <= 370,
      s"rollingActives: windowDays ($windowDays) must be in 1..370")
    val daily = census.groupBy(col("day"))
      .agg(count(lit(1)).as("active_units"))
    val rolled = census
      .select(col("__u"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy(col("day"))
      .agg(count(lit(1)).as("rolling_active_units"))
    // inner join restricts to OBSERVED days (every observed day has
    // a rolled row — it contributes to itself)
    daily.join(rolled, Seq("day"))
  }

  private[graft] def serveNewVsReturning(census: DataFrame): DataFrame = {
    val firstDay = census.groupBy(col("__u"))
      .agg(min(col("day")).as("__fd"))
    census.join(firstDay, Seq("__u"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_units"),
        sum(when(col("day") === col("__fd"), 1L).otherwise(0L)).as("new_units"),
        sum(when(col("day") =!= col("__fd"), 1L).otherwise(0L)).as("returning_units"))
      .withColumn("returning_share",
        round(col("returning_units").cast("double") /
          col("active_units").cast("double"), 6))
  }

  /** An incrementally-maintained activity census (r12 — the
    * EIGHTEENTH durable artifact, and the first whose absorb is
    * IDEMPOTENT by algebra: the census is a SET of (unit, day) pairs,
    * so `absorb` is set union — overlapping increments, replays and
    * double-sends are true no-ops, no replay guard even needed; the
    * strongest absorb contract in the engine). The production
    * dashboard loop: maintain the census by absorbing each day's
    * events (census-sized merges — the event corpus is NEVER
    * rescanned), serve [[GraftDataFrameOps.rollingActives]]-shaped
    * DAU/WAU and [[GraftDataFrameOps.newVsReturning]] readouts from
    * the stored census at any point (shared serve code — spec-pinned
    * equal to the batch operators).
    */
  final case class PreparedActives private[graft] (
    census: DataFrame, reliable: Boolean) {

    /** Set-union an increment's census — idempotent, order-free. */
    def absorb(increment: DataFrame, unit: String, time: String,
               checkpointDir: Option[String] = None): PreparedActives = {
      val ckp = lineageBreaker(checkpointDir)
      PreparedActives(
        ckp(census.unionByName(activesCensus(increment, unit, time)).distinct()),
        reliable && checkpointDir.isDefined)
    }

    /** The q141 readout over the current census. */
    def rollingActives(windowDays: Int): DataFrame =
      serveRollingActives(census, windowDays)

    /** The q153 readout over the current census. */
    def newVsReturning: DataFrame = serveNewVsReturning(census)

    /** Persist durably (one census frame + kind-tagged meta). */
    def save(path: String): Unit = {
      census.write.mode("overwrite").parquet(s"$path/census")
      ArtifactIO.writeMeta(census.sparkSession, path, "actives", Seq.empty)
    }
  }

  /** Build a [[PreparedActives]]; its readouts over the prepare
    * corpus equal the batch operators (shared code, spec-pinned).
    */
  def prepareActives(corpus: DataFrame, unit: String, time: String,
                     checkpointDir: Option[String] = None): PreparedActives = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedActives(ckp(activesCensus(corpus, unit, time)),
      checkpointDir.isDefined)
  }

  /** Load a [[PreparedActives]] persisted by its `save`; fails fast
    * on a non-actives path.
    */
  def loadActives(spark: org.apache.spark.sql.SparkSession, path: String): PreparedActives = {
    ArtifactIO.readMeta(spark, path, "actives")
    PreparedActives(spark.read.parquet(s"$path/census"), reliable = true)
  }

  /** Per-group regression moments prepared ONCE for incremental
    * maintenance — the prepared-artifact form of
    * [[GraftDataFrameOps.regressionByGroup]] (r12): the five decimal
    * moment sums are EXACT and ASSOCIATIVE, so an increment merges by
    * pure addition — `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)`
    * bit-for-bit with NO approximation and no corpus rescan (the only
    * artifact whose absorb is mathematically lossless by algebra
    * alone; no id-disjointness contract either — observations are
    * unkeyed, so double-absorbing the same rows is the caller's
    * semantic choice, exactly as re-running a batch aggregate).
    * `regression` serves the q119 output from the stored sums at any
    * point. Merge cost is groups-sized, never data-sized.
    */
  final case class PreparedMoments private[graft] (
    moments: DataFrame, groupCol: String, reliable: Boolean) {

    /** Merge an increment's moments by exact decimal addition; pass
      * the SAME x/y measures prepare used (the absorbVocab
      * discipline — the measure definition lives at the call site).
      */
    def absorb(increment: DataFrame, x: Column, y: Column,
               checkpointDir: Option[String] = None): PreparedMoments = {
      import org.apache.spark.sql.types.DecimalType
      val ckp = lineageBreaker(checkpointDir)
      val merged = ckp(moments.unionByName(momentsOf(increment, groupCol, x, y))
        .groupBy(col(groupCol))
        .agg(sum(col("n")).as("n"),
          sum(col("__sx")).cast(DecimalType(38, 2)).as("__sx"),
          sum(col("__sy")).cast(DecimalType(38, 2)).as("__sy"),
          sum(col("__sxx")).cast(DecimalType(38, 4)).as("__sxx"),
          sum(col("__syy")).cast(DecimalType(38, 4)).as("__syy"),
          sum(col("__sxy")).cast(DecimalType(38, 4)).as("__sxy")))
      PreparedMoments(merged, groupCol, reliable && checkpointDir.isDefined)
    }

    /** The q119 regression surface over the current sums. */
    def regression: DataFrame = regressionFromMoments(moments)

    /** Persist durably (one groups-sized frame + kind-tagged meta). */
    def save(path: String): Unit = {
      moments.write.mode("overwrite").parquet(s"$path/moments")
      ArtifactIO.writeMeta(moments.sparkSession, path, "moments",
        Seq("groupCol" -> groupCol))
    }
  }

  /** Build a [[PreparedMoments]]; `regression` on it reproduces
    * `regressionByGroup` bit-for-bit (same census, same scalar shape
    * — shared code, spec-pinned). Streaming/serving use wants a
    * reliable `checkpointDir`, as with every artifact.
    */
  def prepareMoments(corpus: DataFrame, group: String, x: Column, y: Column,
                     checkpointDir: Option[String] = None): PreparedMoments = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedMoments(ckp(momentsOf(corpus, group, x, y)), group,
      checkpointDir.isDefined)
  }

  /** Load a [[PreparedMoments]] persisted by its `save`; fails fast
    * on a non-moments path.
    */
  def loadMoments(spark: org.apache.spark.sql.SparkSession, path: String): PreparedMoments = {
    val m = ArtifactIO.readMeta(spark, path, "moments")
    PreparedMoments(spark.read.parquet(s"$path/moments"),
      ArtifactIO.field(m, path, "groupCol"), reliable = true)
  }

  /** A vocabulary prepared ONCE for repeated capping — the production
    * shape of [[GraftDataFrameOps.capVocab]]: census the reference
    * corpus once, rewrite anything (new batches, a live stream)
    * against the frozen kept set without re-counting. `kept` is the
    * checkpointed frequent-token frame (vocab-sized).
    */
  final case class PreparedVocab private[graft] (
    kept: DataFrame, census: DataFrame, minCount: Long, unk: String,
    reliable: Boolean) {
    /** Absorb a corpus increment: `prepare(A).absorb(B)` ≡
      * `prepare(A ∪ B)` row-for-row. The UNFILTERED token census is
      * what makes this possible (the PreparedBoilerplate argument): a
      * token below `minCount` in A alone can cross the threshold with
      * B's occurrences, so `kept` by itself could never absorb. The
      * merge is vocab-sized, never a re-census of A's corpus.
      */
    def absorb(increment: DataFrame, text: String,
               checkpointDir: Option[String] = None): PreparedVocab = {
      val ckp = lineageBreaker(checkpointDir)
      val censusB = floorPartitions(increment.select(col(text)))
        .withColumn("__toks", tokens(col(text)))
        .select(explode(col("__toks")).as("__w"))
        .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      val merged = ckp(census.unionByName(censusB)
        .groupBy(col("__w")).agg(sum(col("__c")).as("__c")))
      PreparedVocab(
        merged.filter(col("__c") >= minCount).select(col("__w")),
        merged, minCount, unk, reliable && checkpointDir.isDefined)
    }

    /** Persist the vocabulary durably. Only the UNFILTERED census is
      * written — `kept` is a filter view over it by construction
      * (exactly how prepare derives it), so [[Ops.loadVocab]] rebuilds
      * both frames from one table with zero duplication.
      */
    def save(path: String): Unit = {
      census.write.mode("overwrite").parquet(s"$path/census")
      ArtifactIO.writeMeta(census.sparkSession, path, "vocab",
        Seq("minCount" -> minCount.toString, "unk" -> unk))
    }
  }

  /** Load a [[PreparedVocab]] persisted by its `save`; fails fast on
    * a non-vocab path.
    */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String): PreparedVocab = {
    val m = ArtifactIO.readMeta(spark, path, "vocab")
    def f(k: String) = ArtifactIO.field(m, path, k)
    val census = spark.read.parquet(s"$path/census")
    val minCount = f("minCount").toLong
    PreparedVocab(
      census.filter(col("__c") >= minCount).select(col("__w")),
      census, minCount, f("unk"), reliable = true)
  }

  /** Build a [[PreparedVocab]]; capping the census corpus itself
    * against it reproduces `capVocab` bit-for-bit (spec-pinned). As
    * with [[prepareLm]], streaming use requires a reliable
    * `checkpointDir`. The unfiltered census is retained for
    * [[PreparedVocab.absorb]]; `kept` is a cheap filter view over it.
    */
  def prepareVocab(corpus: DataFrame, text: String, minCount: Long,
                   unk: String = "<unk>",
                   checkpointDir: Option[String] = None): PreparedVocab = {
    require(minCount >= 1, "minCount must be positive")
    val ckp = lineageBreaker(checkpointDir)
    val census = ckp(floorPartitions(corpus.select(col(text)))
      .withColumn("__toks", tokens(col(text)))
      .select(explode(col("__toks")).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c")))
    val kept = census.filter(col("__c") >= minCount).select(col("__w"))
    PreparedVocab(kept, census, minCount, unk, checkpointDir.isDefined)
  }

  /** A BM25 inverted index prepared ONCE for repeated ranked
    * retrieval — the production shape of a search engine over a
    * corpus: build postings once, serve any number of query batches
    * (or a query stream) against the frozen index. `postings` is
    * DENORMALIZED — one row per (term, doc) carrying tf, the doc
    * length AND the term's document frequency — so query-time scoring
    * is a single broadcast join of the (tiny) query-term frame onto
    * the postings, with no further joins at all: the classic
    * norms-in-the-postings-list layout, which is what makes the
    * query path output-bound at 100 TB. `nDocs`/`avgdl` are the two
    * corpus scalars of the BM25 formula, collected at prepare time.
    */
  final case class PreparedBm25 private[graft] (
    postings: DataFrame, nDocs: Long, sumDl: Long, avgdl: Double,
    idCol: String, reliable: Boolean) {
    /** Absorb an increment of NEW documents (ids disjoint from the
      * indexed corpus — enforced) without re-tokenizing the corpus:
      * `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)` row-for-row, see
      * [[Ops.absorbBm25]].
      */
    def absorb(increment: DataFrame, text: String,
               checkpointDir: Option[String] = None): PreparedBm25 =
      absorbBm25(this, increment, text, checkpointDir)

    /** Persist the index durably (postings as parquet + kind-tagged
      * meta). Only the two Long scalars are stored — [[Ops.loadBm25]]
      * recomposes `avgdl` with prepare's own division, so the loaded
      * index scores bit-for-bit.
      */
    def save(path: String): Unit = {
      postings.write.mode("overwrite").parquet(s"$path/postings")
      ArtifactIO.writeMeta(postings.sparkSession, path, "bm25",
        Seq("nDocs" -> nDocs.toString, "sumDl" -> sumDl.toString, "idCol" -> idCol))
    }
  }

  /** Load a [[PreparedBm25]] persisted by its `save`; fails fast on a
    * non-bm25 path.
    */
  def loadBm25(spark: org.apache.spark.sql.SparkSession, path: String): PreparedBm25 = {
    val m = ArtifactIO.readMeta(spark, path, "bm25")
    def f(k: String) = ArtifactIO.field(m, path, k)
    val n = f("nDocs").toLong; val sumDl = f("sumDl").toLong
    PreparedBm25(
      spark.read.parquet(s"$path/postings"), n, sumDl,
      if (n == 0) 0.0 else sumDl.toDouble / n.toDouble,
      f("idCol"), reliable = true)
  }

  /** Build a [[PreparedBm25]] over the normalized token stream (the
    * same tokenizer as every text operator). Streaming query batches
    * require a reliable `checkpointDir`, as with [[prepareLm]].
    */
  def prepareBm25(corpus: DataFrame, id: String, text: String,
                  checkpointDir: Option[String] = None): PreparedBm25 = {
    val ckp = lineageBreaker(checkpointDir)
    val tf = ckp(floorPartitions(corpus.select(col(id), col(text)))
      .withColumn("__toks", tokens(col(text)))
      .select(col(id), explode(col("__toks")).as("__w"))
      .groupBy(col(id), col("__w")).agg(count(lit(1)).as("__tf")))
    val dl = tf.groupBy(col(id)).agg(sum(col("__tf")).as("__dl"))
    val dfF = tf.groupBy(col("__w")).agg(count(lit(1)).as("__df"))
    val postings = ckp(tf.join(dl, Seq(id)).join(dfF, Seq("__w")))
    val row = dl.agg(count(lit(1)).as("__n"),
      coalesce(sum(col("__dl")), lit(0L)).as("__sum")).collect()(0)
    val (n, sumDl) = (row.getLong(0), row.getLong(1))
    PreparedBm25(postings, n, sumDl,
      if (n == 0) 0.0 else sumDl.toDouble / n.toDouble, id,
      reliable = checkpointDir.isDefined)
  }

  /** Absorb an increment into a [[PreparedBm25]] — the rolling-corpus
    * maintenance path: `prepare(A).absorb(B)` equals `prepare(A ∪ B)`
    * row-for-row and scalar-for-scalar WITHOUT re-tokenizing or
    * re-aggregating A. Costs: the increment's own census (tf/dl/df),
    * one join pass over the old postings to bump the denormalized
    * per-term df for terms the increment touches (the price of the
    * norms-in-postings layout; the df frame is vocabulary-sized so
    * it carries no broadcast hint — AQE picks broadcast only when
    * the increment's vocabulary is actually small),
    * and one disjointness-guard pass (increment doc ids must be NEW:
    * absorbing a re-submitted doc would double-count df/dl, so it
    * fails fast instead). `nDocs`/`sumDl` add exactly (both Longs);
    * `avgdl` recomposes from them bit-for-bit with prepare's own
    * division.
    */
  def absorbBm25(idx: PreparedBm25, increment: DataFrame, text: String,
                 checkpointDir: Option[String] = None): PreparedBm25 = {
    val ckp = lineageBreaker(checkpointDir)
    val id = idx.idCol
    val tfB = ckp(floorPartitions(increment.select(col(id), col(text)))
      .withColumn("__toks", tokens(col(text)))
      .select(col(id), explode(col("__toks")).as("__w"))
      .groupBy(col(id), col("__w")).agg(count(lit(1)).as("__tf")))
    val dlB = tfB.groupBy(col(id)).agg(sum(col("__tf")).as("__dl"))
    val dfB = tfB.groupBy(col("__w")).agg(count(lit(1)).as("__dfb"))
    val clash = clashProbe(idx.postings.select(col(id)).distinct(),
      dlB.select(col(id)), id).count()
    require(clash == 0L,
      "absorbBm25: increment contains doc ids already in the index — " +
        "absorb models corpus growth; re-prepare to replace documents")
    // old postings: bump df where the increment re-uses a term.
    // dfB/dfAforB are VOCABULARY-sized (a bulk absorb's term census
    // approaches the full corpus vocabulary), so they carry NO
    // broadcast hint — AQE decides, exactly the q48 df-table rule
    // (a forced hint OOMs at corpus scale)
    val updatedOld = idx.postings.join(dfB, Seq("__w"), "left")
      .withColumn("__df", col("__df") + coalesce(col("__dfb"), lit(0L)))
      .drop("__dfb")
    // increment postings: df = increment df + old df (terms ∩ index)
    val dfAforB = idx.postings
      .join(dfB.select(col("__w")), Seq("__w"), "left_semi")
      .select(col("__w"), col("__df").as("__dfa")).distinct()
    val newRows = tfB.join(dlB, Seq(id))
      .join(dfB, Seq("__w"))
      .join(dfAforB, Seq("__w"), "left")
      .withColumn("__df", col("__dfb") + coalesce(col("__dfa"), lit(0L)))
      .select(idx.postings.columns.map(col): _*)
    // lineage break on the MERGED postings (not just the increment
    // legs): absorb rewrites the old postings in place via a join, so
    // chained absorbs — the rolling-corpus use case — would otherwise
    // stack a join layer per round, the exact failure mode the
    // iterative-lineage rule (q46) exists to prevent
    val postings = ckp(updatedOld.select(idx.postings.columns.map(col): _*)
      .unionByName(newRows))
    val rowB = dlB.agg(count(lit(1)), coalesce(sum(col("__dl")), lit(0L))).collect()(0)
    val n = idx.nDocs + rowB.getLong(0)
    val sumDl = idx.sumDl + rowB.getLong(1)
    PreparedBm25(postings, n, sumDl,
      if (n == 0) 0.0 else sumDl.toDouble / n.toDouble, id,
      reliable = idx.reliable && checkpointDir.isDefined)
  }

  /** Okapi BM25 scoring of a query frame against a prepared index —
    * the shared core of the one-shot fluent form and the
    * index-once/query-many form. Scores round to 4 decimals (the q73
    * float-agg discipline: a query's matched-term sum is tiny, so
    * summation-order ulps vanish at 4dp) and rank deterministically
    * by (score DESC, doc id). The top-k is STAGED — a per-(query,
    * doc-hash-shard) row_number prunes to k×shards rows before the
    * per-query window — so no single reducer ever sorts a query's
    * full match list (the q79 discipline; a hot query matching half
    * the corpus would otherwise serialize on one task).
    */
  private[graft] def bm25Against(queries: DataFrame, queryId: String, queryText: String,
                                 idx: PreparedBm25, k: Int,
                                 k1: Double, b: Double): DataFrame = {
    require(k >= 1, "bm25: k must be positive")
    require(k1 > 0 && b >= 0 && b <= 1, "bm25: need k1 > 0 and 0 <= b <= 1")
    val id = idx.idCol
    val qterms = queries.select(col(queryId),
      explode(array_distinct(tokens(col(queryText)))).as("__w"))
    val dfD = col("__df").cast("double")
    val idf = log(lit(1.0) +
      (lit(idx.nDocs.toDouble) - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val denom = col("__tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / lit(idx.avgdl))
    val contrib = idf * (col("__tf").cast("double") * lit(k1 + 1.0)) / denom
    val scored = idx.postings.join(broadcast(qterms), Seq("__w"))
      .groupBy(col(queryId), col(id))
      .agg(round(sum(contrib), 4).as("score"))
    val w1 = Window.partitionBy(col(queryId), col("__shard"))
      .orderBy(col("score").desc, col(id))
    val w2 = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(id))
    scored
      .withColumn("__shard", pmod(xxhash64(col(id).cast("string")), lit(64)))
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(id), col("score"))
  }

  /** All ≤`maxDistance`-deletion variants of `text` (plus the value
    * itself = 0 deletions), the candidate keys of the SymSpell-style
    * edit-distance index ([[GraftDataFrameOps.editDistancePairs]],
    * [[prepareEditIndex]]). Guarded for the empty string:
    * `sequence(1, 0)` would DESCEND, not produce an empty array.
    */
  private[graft] def deletionVariantKeys(text: Column, maxDistance: Int): Column = {
    def withDels(arr: Column): Column = array_distinct(concat(arr,
      flatten(transform(arr, s =>
        when(length(s) > 0,
          transform(sequence(lit(1), length(s)), i =>
            concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s)))))
          .otherwise(array().cast("array<string>"))))))
    val keys0 = withDels(array(text))
    if (maxDistance == 1) keys0 else withDels(keys0)
  }

  /** An edit-distance index prepared ONCE over a reference catalog —
    * the record-linkage analogue of [[PreparedCatalog]]: deletion-
    * variant keys and (id, value) rows are checkpointed at prepare
    * time, so matching any increment (a new batch, a live stream)
    * against the catalog costs the increment's own variant explode +
    * a key hash join + threshold-Levenshtein verify — the catalog is
    * never rescanned.
    */
  final case class PreparedEditIndex private[graft] (
    keys: DataFrame, base: DataFrame, id: String, text: String,
    maxDistance: Int, maxLength: Int, reliable: Boolean) {
    /** Absorb a catalog increment (ids disjoint from the indexed
      * catalog — enforced): `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)`
      * row-for-row. The index artifacts (deletion-variant keys,
      * guarded base rows) are PER-ROW, so absorption is the
      * increment's own compute plus a union — the old frames are
      * never rescanned; repeated absorbs stack shallow union nodes
      * over checkpointed legs. The increment is guarded with the
      * SAME `maxLength` the index was prepared with (stored in the
      * artifact — an absorb-time default would silently index a
      * value the full re-prepare would reject).
      */
    def absorb(increment: DataFrame,
               checkpointDir: Option[String] = None): PreparedEditIndex = {
      val ckp = lineageBreaker(checkpointDir)
      val clash = clashProbe(base.select(col(id)).distinct(),
        increment.select(col(id)).distinct(), id).count()
      require(clash == 0L,
        "PreparedEditIndex.absorb: increment contains ids already in the " +
          "index — absorb models catalog growth; re-prepare to replace rows")
      val baseB = ckp(floorPartitions(
        increment.select(col(id),
          lengthGuarded(col(id), col(text), maxLength, "absorbEditIndex").as(text))
          .filter(col(text).isNotNull)))
      val keysB = ckp(baseB.select(col(id),
        explode(deletionVariantKeys(col(text), maxDistance)).as("__k")))
      PreparedEditIndex(keys.unionByName(keysB), base.unionByName(baseB),
        id, text, maxDistance, maxLength, reliable && checkpointDir.isDefined)
    }

    /** Persist the index durably (deletion-variant keys + guarded
      * base rows as parquet, the guard parameters in the meta table —
      * so an absorb after load still enforces the PREPARED maxLength,
      * not a default).
      */
    def save(path: String): Unit = {
      keys.write.mode("overwrite").parquet(s"$path/keys")
      base.write.mode("overwrite").parquet(s"$path/base")
      ArtifactIO.writeMeta(keys.sparkSession, path, "editindex",
        Seq("id" -> id, "text" -> text,
          "maxDistance" -> maxDistance.toString, "maxLength" -> maxLength.toString))
    }
  }

  /** Load a [[PreparedEditIndex]] persisted by its `save`; fails fast
    * on a non-editindex path.
    */
  def loadEditIndex(spark: org.apache.spark.sql.SparkSession, path: String): PreparedEditIndex = {
    val m = ArtifactIO.readMeta(spark, path, "editindex")
    def f(k: String) = ArtifactIO.field(m, path, k)
    PreparedEditIndex(
      spark.read.parquet(s"$path/keys"),
      spark.read.parquet(s"$path/base"),
      f("id"), f("text"), f("maxDistance").toInt, f("maxLength").toInt,
      reliable = true)
  }

  /** The q87 short-string contract enforced IN the job (see
    * [[GraftDataFrameOps.editDistancePairs]]): any value longer than
    * `maxLength` fails the run map-side with the offending id —
    * never a silent Lᵈ-key explosion on document text.
    */
  private[graft] def lengthGuarded(id: Column, text: Column, maxLength: Int,
                                   op: String): Column =
    when(length(text) > maxLength, raise_error(concat(
      lit(s"$op: value exceeds maxLength=$maxLength chars ("),
      length(text).cast("string"), lit(" chars, id="), id.cast("string"),
      lit("): the deletion neighborhood grows as L^d — this operator is " +
        "for short record-linkage strings; truncate upstream or use the " +
        "banded near-dup families for document text"))))
      .otherwise(text)

  /** Build a [[PreparedEditIndex]]; as with [[prepareLm]], streaming
    * use requires a reliable `checkpointDir`. Unlike the within-corpus
    * self-join there is no singleton-key prune (a key unique in the
    * catalog can still collide with an increment value).
    */
  def prepareEditIndex(catalog: DataFrame, id: String, text: String,
                       maxDistance: Int = 1,
                       checkpointDir: Option[String] = None,
                       maxLength: Int = 512): PreparedEditIndex = {
    require(maxDistance >= 1 && maxDistance <= 2,
      s"maxDistance must be 1 or 2 (got $maxDistance)")
    require(maxLength > 0, "maxLength must be positive")
    val ckp = lineageBreaker(checkpointDir)
    val base = ckp(floorPartitions(
      catalog.select(col(id),
        lengthGuarded(col(id), col(text), maxLength, "prepareEditIndex").as(text))
        .filter(col(text).isNotNull)))
    val keys = ckp(base.select(col(id),
      explode(deletionVariantKeys(col(text), maxDistance)).as("__k")))
    PreparedEditIndex(keys, base, id, text, maxDistance, maxLength,
      checkpointDir.isDefined)
  }

  /** Edit-distance matches of `left` against a prepared catalog index
    * — the shared core of the batch and streaming forms. Returns
    * (id, catalog_id, distance ≤ maxDistance) for every increment row
    * within distance of a catalog row; cross-side candidates come
    * from the deletion-variant key join (exact-complete, see
    * [[GraftDataFrameOps.editDistancePairs]]), hot keys are a plain
    * two-sided equi-join (AQE skew splits apply — the n² self-join
    * triangle machinery is not needed across disjoint sides).
    */
  private[graft] def editPairsAgainstPrepared(left: DataFrame, id: String, text: String,
                                              prepared: PreparedEditIndex,
                                              ckp: DataFrame => DataFrame = identity,
                                              maxLength: Int = 512): DataFrame = {
    val base = ckp(floorPartitions(
      left.select(col(id),
        lengthGuarded(col(id), col(text), maxLength, "editMatches").as(text))
        .filter(col(text).isNotNull)))
    val keyed = base.select(col(id),
      explode(deletionVariantKeys(col(text), prepared.maxDistance)).as("__k"))
    val cand = keyed.join(
        prepared.keys.select(col("__k"), col(prepared.id).as("__cid")), Seq("__k"))
      .select(col(id), col("__cid"))
      .dropDuplicates(id, "__cid")
    cand
      .join(base.select(col(id), col(text).as("__ta")), Seq(id))
      .join(prepared.base.select(col(prepared.id).as("__cid"),
        col(prepared.text).as("__tb")), Seq("__cid"))
      .withColumn("distance", levenshtein(col("__ta"), col("__tb"), prepared.maxDistance))
      .filter(col("distance") >= 0)
      .select(col(id), col("__cid").as("catalog_id"), col("distance"))
  }

  /** Join-and-reassemble core shared by [[GraftDataFrameOps.capVocab]]
    * (kept set from the input's own census) and the prepared forms
    * (frozen kept set): positional tokens left-join the kept vocab,
    * misses rewrite to `unk`, docs reassemble via per-doc sorted
    * collect.
    */
  private[graft] def capToksAgainstKept(toks: DataFrame, id: String,
                                        kept: DataFrame, unk: String): DataFrame =
    toks.join(kept.withColumn("__keep", lit(true)), Seq("__w"), "left")
      .select(col(id), col("__pos"),
        when(col("__keep").isNotNull, col("__w")).otherwise(lit(unk)).as("__w2"),
        col("__keep").isNull.as("__unk"))
      .groupBy(col(id))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__pos"), col("__w2")))),
          s => s.getField("__w2"))).as("capped_text"),
        sum(col("__unk").cast("long")).as("n_unk"))

  private[graft] def posToks(docs: DataFrame, id: String, text: String): DataFrame =
    floorPartitions(docs.select(col(id), col(text)))
      .withColumn("__toks", tokens(col(text)))
      .select(col(id), posexplode(col("__toks")))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__w")

  /** Paragraph explode shared by the one-shot and prepared boilerplate
    * forms: (id, __pos, __para) with the separator split quoted.
    */
  private[graft] def explodeParas(docs: DataFrame, id: String, text: String,
                                  sep: String): DataFrame =
    floorPartitions(docs.select(col(id), col(text)))
      .select(col(id),
        posexplode(split(col(text), java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__para")

  /** The removal tail shared by [[GraftDataFrameOps.dedupParagraphs]]
    * and [[GraftDataFrameOps.stripBoilerplateAgainst]]: drop every
    * paragraph in `common`, reassemble survivors in order.
    */
  private[graft] def stripParasAgainstCommon(paras: DataFrame, id: String,
                                             common: DataFrame, sep: String): DataFrame =
    paras.join(common.withColumn("__common", lit(true)), Seq("__para"), "left")
      .withColumn("__keep", col("__common").isNull)
      .groupBy(col(id))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(
            when(col("__keep"), struct(col("__pos"), col("__para"))))),
          s => s.getField("__para"))).as("clean_text"),
        sum(col("__keep").cast("long")).as("n_kept"),
        sum((!col("__keep")).cast("long")).as("n_removed"))

  /** A corpus-wide common-paragraph (boilerplate) set prepared ONCE —
    * the production shape of paragraph dedup: census the reference
    * corpus once, strip any increment or stream against the frozen
    * set. Streaming use requires a reliable `checkpointDir`, as with
    * [[prepareLm]].
    */
  final case class PreparedBoilerplate private[graft] (
    common: DataFrame, census: DataFrame, sep: String, minDf: Long,
    reliable: Boolean) {
    /** Absorb a corpus increment. PRECONDITION (uncheckable from the
      * artifact — the census is paragraph → df and carries no doc
      * ids): increment doc ids must be NEW; re-submitting a document
      * would double-count its paragraphs' df, which the full
      * re-prepare's per-(paragraph, doc) distinct would not. Under
      * that precondition `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)`
      * row-for-row. The UNFILTERED df census is what makes this possible — a
      * paragraph below `minDf` in A alone can cross the threshold
      * once B's documents are counted, so `common` by itself could
      * never absorb. The merge is paragraph-census-sized (old census ∪
      * increment census → sum), never a re-explode of the old corpus.
      */
    def absorb(increment: DataFrame, id: String, text: String,
               checkpointDir: Option[String] = None): PreparedBoilerplate = {
      val ckp = lineageBreaker(checkpointDir)
      val parasB = explodeParas(increment, id, text, sep)
      val censusB = parasB.select(col("__para"), col(id)).distinct()
        .groupBy(col("__para")).agg(count(lit(1)).as("__df"))
      val merged = ckp(census.unionByName(censusB)
        .groupBy(col("__para")).agg(sum(col("__df")).as("__df")))
      PreparedBoilerplate(
        merged.filter(col("__df") >= minDf).select(col("__para")),
        merged, sep, minDf, reliable && checkpointDir.isDefined)
    }

    /** Persist durably. Only the UNFILTERED df census is written —
      * `common` is a filter view over it by construction (the
      * [[PreparedVocab.save]] argument).
      */
    def save(path: String): Unit = {
      census.write.mode("overwrite").parquet(s"$path/census")
      ArtifactIO.writeMeta(census.sparkSession, path, "boilerplate",
        Seq("sep" -> sep, "minDf" -> minDf.toString))
    }
  }

  /** Load a [[PreparedBoilerplate]] persisted by its `save`; fails
    * fast on a non-boilerplate path.
    */
  def loadBoilerplate(spark: org.apache.spark.sql.SparkSession, path: String): PreparedBoilerplate = {
    val m = ArtifactIO.readMeta(spark, path, "boilerplate")
    def f(k: String) = ArtifactIO.field(m, path, k)
    val census = spark.read.parquet(s"$path/census")
    val minDf = f("minDf").toLong
    PreparedBoilerplate(
      census.filter(col("__df") >= minDf).select(col("__para")),
      census, f("sep"), minDf, reliable = true)
  }

  /** Build a [[PreparedBoilerplate]]: paragraphs occurring in ≥
    * `minDf` DISTINCT documents of `corpus`. The census distincts
    * (paragraph, doc) pairs first — the q89 skew discipline.
    */
  def prepareBoilerplate(corpus: DataFrame, id: String, text: String,
                         minDf: Long, sep: String = "\n",
                         checkpointDir: Option[String] = None): PreparedBoilerplate = {
    require(minDf >= 2, "prepareBoilerplate: minDf must be >= 2")
    require(sep.nonEmpty, "prepareBoilerplate: sep must be non-empty")
    val ck = lineageBreaker(checkpointDir)
    val paras = ck(explodeParas(corpus, id, text, sep))
    // the UNFILTERED census is retained for absorb (see
    // [[PreparedBoilerplate.absorb]]); `common` is a cheap filter view
    // over the checkpointed census
    val census = ck(paras.select(col("__para"), col(id)).distinct()
      .groupBy(col("__para")).agg(count(lit(1)).as("__df")))
    val common = census.filter(col("__df") >= minDf).select(col("__para"))
    PreparedBoilerplate(common, census, sep, minDf, checkpointDir.isDefined)
  }

  /** A reference n-gram index prepared ONCE for repeated coverage
    * scoring — the production shape of
    * [[GraftDataFrameOps.ngramCoverage]]: hash the held corpus's
    * distinct grams once, score anything against the frozen index.
    */
  final case class PreparedGramIndex private[graft] (
    grams: DataFrame, n: Int, reliable: Boolean) {
    /** Absorb a reference-corpus increment: `prepare(A).absorb(B)` ≡
      * `prepare(A ∪ B)` row-for-row — the index is a distinct gram
      * set, so absorption is the increment's own gram hashing plus a
      * distinct over the union (gram-set-sized, never a re-scan of
      * A's corpus).
      */
    def absorb(increment: DataFrame, text: String,
               checkpointDir: Option[String] = None): PreparedGramIndex = {
      val ckp = lineageBreaker(checkpointDir)
      val gB = floorPartitions(increment.select(col(text)))
        .withColumn("__toks", tokens(col(text)))
        .select(explode(ngramHashes(col("__toks"), n)).as("__g"))
        .distinct()
      PreparedGramIndex(ckp(grams.unionByName(gB).distinct()), n,
        reliable && checkpointDir.isDefined)
    }

    /** Persist the gram set durably. */
    def save(path: String): Unit = {
      grams.write.mode("overwrite").parquet(s"$path/grams")
      ArtifactIO.writeMeta(grams.sparkSession, path, "gramindex",
        Seq("n" -> n.toString))
    }
  }

  /** Load a [[PreparedGramIndex]] persisted by its `save`; fails fast
    * on a non-gramindex path.
    */
  def loadGramIndex(spark: org.apache.spark.sql.SparkSession, path: String): PreparedGramIndex = {
    val m = ArtifactIO.readMeta(spark, path, "gramindex")
    PreparedGramIndex(
      spark.read.parquet(s"$path/grams"),
      ArtifactIO.field(m, path, "n").toInt, reliable = true)
  }

  /** Build a [[PreparedGramIndex]] (distinct gram hashes only — an
    * inverted index with no postings). Streaming use requires a
    * reliable `checkpointDir`, as with [[prepareLm]].
    */
  def prepareGramIndex(ref: DataFrame, text: String, n: Int = 8,
                       checkpointDir: Option[String] = None): PreparedGramIndex = {
    require(n >= 2, "prepareGramIndex needs n >= 2")
    val ckp = lineageBreaker(checkpointDir)
    val g = ckp(floorPartitions(ref.select(col(text)))
      .withColumn("__toks", tokens(col(text)))
      .select(explode(ngramHashes(col("__toks"), n)).as("__g"))
      .distinct())
    PreparedGramIndex(g, n, checkpointDir.isDefined)
  }

  /** Coverage core shared by the inline and prepared forms. */
  private[graft] def coverageAgainstIndex(docs: DataFrame, id: String, text: String,
                                          idx: PreparedGramIndex): DataFrame = {
    val docGrams = floorPartitions(docs.select(col(id), col(text)))
      .withColumn("__toks", tokens(col(text)))
      .select(col(id), ngramHashes(col("__toks"), idx.n).as("__gs"))
      .filter(size(col("__gs")) > 0)
      .select(col(id), size(col("__gs")).cast("long").as("n_grams"),
        explode(col("__gs")).as("__g"))
    docGrams.join(idx.grams.withColumn("__hit", lit(true)), Seq("__g"), "left")
      .groupBy(col(id), col("n_grams"))
      .agg(count(col("__hit")).as("n_matched"))
      .withColumn("coverage_bp", expr("n_matched * 10000L div n_grams"))
      .select(col(id), col("n_grams"), col("n_matched"), col("coverage_bp"))
  }

  /** Incremental dedup of `left` against a prepared catalog — the
    * shared core of the batch and streaming forms (see
    * [[GraftDataFrameOps.dedupAgainstCatalog]] for semantics).
    */
  private[graft] def dedupAgainstPrepared(left: DataFrame, id: String, text: String,
                                          prepared: PreparedCatalog,
                                          threshold: Double,
                                          ckp: DataFrame => DataFrame = identity): DataFrame = {
    import graft.functions.TextFunctions._
    val fp = md5(normText(col(text)).cast("binary"))
    val exactKept = left.withColumn("__fp", fp)
      .join(prepared.fingerprints, Seq("__fp"), "left_anti").drop("__fp")
    // increment-side lineage break: the batch form checkpoints (its
    // shingles feed both the banding and the verify join); the
    // streaming form passes identity — a trigger is small and a
    // 2× map recompute beats checkpoint I/O per micro-batch
    val (shNew, bandNew) = shingleBands(left, id, text,
      prepared.perms, prepared.lshBands, ckp)
    val cand = bandNew.select(col("__band"), col("__bucket"), col(id).as("__nid"))
      .join(prepared.bands.select(col("__band"), col("__bucket"),
        col(prepared.id).as("__oid")), Seq("__band", "__bucket"))
      .select(col("__nid"), col("__oid"))
      .dropDuplicates("__nid", "__oid")
    val inter = size(array_intersect(col("__sa"), col("__sb")))
    val union = size(col("__sa")) + size(col("__sb")) - inter
    val nearDropped = cand
      .join(shNew.select(col(id).as("__nid"), col("__s").as("__sa")), Seq("__nid"))
      .join(prepared.shingles.select(col(prepared.id).as("__oid"),
        col("__s").as("__sb")), Seq("__oid"))
      .filter(inter.cast("double") / union.cast("double") >= threshold)
      .select(col("__nid").as(id)).distinct()
    exactKept.join(nearDropped, Seq(id), "left_anti")
  }

  /** A vector catalog prepared once for incremental embedding dedup —
    * the vector-modality analogue of [[PreparedCatalog]]: the
    * catalog's 4-table hyperplane sign codes and (id, vector) frames
    * are computed and pinned at preparation, so each increment (or
    * each streaming trigger) pays only its own coding plus the banded
    * code joins against the cached frames — never a catalog rescan,
    * never increment × catalog. `reliable` records checkpoint mode;
    * the streaming entry requires it (the PreparedLm contract:
    * localCheckpoint blocks don't survive executor loss mid-stream).
    */
  final case class PreparedVecCatalog private[graft] (
    codes: DataFrame, vectors: DataFrame, id: String,
    dim: Int, signBits: Int, tables: Int, seed: String, reliable: Boolean) {
    /** Absorb a catalog increment (ids disjoint from the prepared
      * catalog — enforced: a re-submitted id would duplicate its code
      * and vector rows): `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)`
      * row-for-row — the hyperplane family is fixed by (tables,
      * signBits, dim, seed) stored at prepare time, so the increment
      * codes under the SAME weights and the artifacts union per-row;
      * the old frames are never rescanned.
      */
    def absorb(increment: DataFrame, emb: String,
               checkpointDir: Option[String] = None): PreparedVecCatalog = {
      val ckp = lineageBreaker(checkpointDir)
      val clash = clashProbe(vectors.select(col("__cid")),
        increment.select(col(id).as("__cid")).distinct(), "__cid").count()
      require(clash == 0L,
        "PreparedVecCatalog.absorb: increment contains ids already in the " +
          "catalog — absorb models catalog growth; re-prepare to replace rows")
      val w = Hyperplanes.weights(tables, signBits, dim, seed)
      val baseB = ckp(increment.select(col(id).as("__cid"),
        col(emb).cast("array<double>").as("__ce")))
      val codesB = ckp(baseB
        .select(col("__cid"), posexplode(array(
          (0 until tables).map(l => Hyperplanes.blockCode(col("__ce"), w(l))): _*)))
        .withColumnRenamed("pos", "__tbl").withColumnRenamed("col", "__block"))
      PreparedVecCatalog(codes.unionByName(codesB), vectors.unionByName(baseB),
        id, dim, signBits, tables, seed, reliable && checkpointDir.isDefined)
    }

    /** Persist the vector catalog durably. The hyperplane family is
      * fully determined by (tables, signBits, dim, seed) in the meta
      * table, so [[Ops.loadVecCatalog]] re-derives identical weights
      * — no floating-point matrix needs serializing.
      */
    def save(path: String): Unit = {
      codes.write.mode("overwrite").parquet(s"$path/codes")
      vectors.write.mode("overwrite").parquet(s"$path/vectors")
      ArtifactIO.writeMeta(codes.sparkSession, path, "veccatalog",
        Seq("id" -> id, "dim" -> dim.toString, "signBits" -> signBits.toString,
          "tables" -> tables.toString, "seed" -> seed))
    }
  }

  /** Load a [[PreparedVecCatalog]] persisted by its `save`; fails
    * fast on a non-veccatalog path.
    */
  def loadVecCatalog(spark: org.apache.spark.sql.SparkSession, path: String): PreparedVecCatalog = {
    val m = ArtifactIO.readMeta(spark, path, "veccatalog")
    def f(k: String) = ArtifactIO.field(m, path, k)
    PreparedVecCatalog(
      spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/vectors"),
      f("id"), f("dim").toInt, f("signBits").toInt, f("tables").toInt,
      f("seed"), reliable = true)
  }

  /** Build a [[PreparedVecCatalog]]; `checkpointDir` selects reliable
    * checkpoints (cluster/streaming mode) for the cached frames.
    */
  def prepareVecCatalog(catalog: DataFrame, id: String, emb: String,
                        dim: Int, signBits: Int = 8, tables: Int = 4,
                        seed: String = "graft-hp",
                        checkpointDir: Option[String] = None): PreparedVecCatalog = {
    val ckp = lineageBreaker(checkpointDir)
    val w = Hyperplanes.weights(tables, signBits, dim, seed)
    val base = ckp(catalog.select(col(id).as("__cid"),
      col(emb).cast("array<double>").as("__ce")))
    val codes = ckp(base
      .select(col("__cid"), posexplode(array(
        (0 until tables).map(l => Hyperplanes.blockCode(col("__ce"), w(l))): _*)))
      .withColumnRenamed("pos", "__tbl").withColumnRenamed("col", "__block"))
    PreparedVecCatalog(codes, base, id, dim, signBits, tables, seed, checkpointDir.isDefined)
  }

  /** Incremental vector dedup of `left` against a prepared catalog —
    * the shared core of the batch and streaming forms (see
    * [[GraftDataFrameOps.vecDedupAgainstCatalog]] for semantics).
    */
  private[graft] def vecDedupAgainstPrepared(left: DataFrame, id: String, emb: String,
                                             prepared: PreparedVecCatalog,
                                             threshold: Double,
                                             ckp: DataFrame => DataFrame = identity): DataFrame = {
    graft.functions.GraftFunctions.register(left.sparkSession)
    val w = Hyperplanes.weights(prepared.tables, prepared.signBits, prepared.dim, prepared.seed)
    // increment-side lineage break: the batch form checkpoints (codes
    // + verify both read it); streaming passes identity — a trigger
    // is small and a 2× map recompute beats checkpoint I/O
    val base = ckp(left.select(col(id), col(emb).cast("array<double>").as("__e")))
    val coded = base.select(col(id), posexplode(array(
      (0 until prepared.tables).map(l => Hyperplanes.blockCode(col("__e"), w(l))): _*)))
      .withColumnRenamed("pos", "__tbl").withColumnRenamed("col", "__block")
    val cand = coded.join(prepared.codes, Seq("__tbl", "__block"))
      .select(col(id), col("__cid"))
      .dropDuplicates(id, "__cid")
    val dropped = cand
      .join(base, Seq(id))
      .join(prepared.vectors, Seq("__cid"))
      .filter(call_function("cosine_sim", col("__e"), col("__ce")) >= threshold)
      .select(col(id)).distinct()
    left.join(dropped, Seq(id), "left_anti")
  }

  /** Image-modality near-dup pairs (r12 — the LAION-recipe image
    * dedup step the real pixel decoders exist to feed): dHash every
    * payload ([[graft.operators.Multimodal.imageHashes]]), keep only
    * rows whose pixels truly decoded (stub hashes are md5 noise —
    * the `decoded_real` observability rule), and band the 64-bit
    * hashes into candidate buckets
    * ([[GraftDataFrameOps.phashNearDups]] — exact for the default
    * maxHamming=6 < bands=8 by pigeonhole). Returns (doc_a, doc_b,
    * hamming ≤ maxHamming). A brightness-shifted or slightly-cropped
    * re-encode of an image pairs with its original across FORMATS
    * too (the hash reads decoded pixels, not bytes).
    *
    * Scale shape: decode is partition-preserving map work; the pair
    * stage carries only (id, 64-bit hash) through one banded
    * self-join — never pixels, never all-pairs.
    */
  def imageNearDups(media: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                    maxHamming: Int = 6, bands: Int = 8): DataFrame =
    graft.operators.Multimodal.imageHashes(media)
      .filter(col("decoded_real"))
      .phashNearDups("doc_id", "phash", maxHamming, bands)

  /** Incremental image dedup against a pinned hash catalog — the
    * [[GraftDataFrameOps.dedupAgainstCatalog]] discipline for the
    * image modality: `catalogHashes` is the persisted output of
    * [[graft.operators.Multimodal.imageHashes]] (a plain parquet
    * frame — durable by nature, no artifact wrapper needed), and
    * each increment pays only its own decode + the banded cross-side
    * candidate join — never a catalog rescan, never increment ×
    * catalog. Returns the increment's hash rows KEPT (no catalog
    * image within `maxHamming`); rows whose pixels did NOT decode
    * are kept too but carry `decoded_real = false` — quarantine or
    * route them by that flag (they cannot be judged against the
    * catalog, and silently dropping them would make corrupt bytes a
    * data-loss vector).
    */
  def imageDedupAgainstCatalog(media: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                               catalogHashes: DataFrame,
                               maxHamming: Int = 6, bands: Int = 8): DataFrame =
    hashDedupAgainstCatalog(graft.operators.Multimodal.imageHashes(media),
      catalogHashes, "phash", maxHamming, bands)

  /** The shared banded-hamming catalog-dedup tail both media
    * modalities run (image `phash`, audio `ahash` — r12): increment
    * hash rows survive when no catalog hash within `maxHamming`
    * shares a band chunk with them; undecodable rows (`decoded_real
    * = false`) are KEPT but never judged — the quarantine contract.
    * One cross-side band join carrying only (id, 64-bit hash); the
    * increment hashes are pinned once (both the banding leg and the
    * anti-join consume them).
    */
  private def hashDedupAgainstCatalog(incHashes: DataFrame, catalogHashes: DataFrame,
                                      hashCol: String,
                                      maxHamming: Int, bands: Int): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands ($bands) must divide 64")
    val chunk = 64 / bands
    val mask = if (chunk == 64) -1L else (1L << chunk) - 1L
    def banded(df: DataFrame, idOut: String, phOut: String): DataFrame =
      df.select(col("doc_id").as(idOut), col(hashCol).cast("long").as(phOut))
        .select(col(idOut), col(phOut),
          posexplode(array((0 until bands).map(b =>
            shiftrightunsigned(col(phOut), b * chunk).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__chunk")
    val inc = incHashes.localCheckpoint(true)
    val dropped = banded(inc.filter(col("decoded_real")), "__nid", "__pa")
      .join(banded(catalogHashes.filter(col("decoded_real")), "__cid", "__pb"),
        Seq("__band", "__chunk"))
      .filter(bit_count(col("__pa").bitwiseXOR(col("__pb"))) <= maxHamming)
      .select(col("__nid").as("doc_id")).distinct()
    inc.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** Audio-modality near-dup pairs (r12 — [[imageNearDups]]' audio
    * sibling over the real WAV decoder): fingerprint every payload
    * ([[graft.operators.Multimodal.audioHashes]] — 64-bit energy-
    * gradient hash over decoded PCM), keep only rows whose samples
    * truly decoded, and band the hashes into candidate buckets
    * ([[GraftDataFrameOps.phashNearDups]] — pigeonhole-exact at the
    * default maxHamming=6 < bands=8). An amplitude-scaled or
    * container-re-encoded copy pairs its original at hamming 0 (the
    * hash reads decoded samples, not bytes; positive gain preserves
    * every energy-gradient sign). Same scale shape as the image
    * path: decode is partition-preserving map work, the pair stage
    * carries only (id, hash) through one banded self-join.
    */
  def audioNearDups(media: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                    maxHamming: Int = 6, bands: Int = 8): DataFrame =
    graft.operators.Multimodal.audioHashes(media)
      .filter(col("decoded_real"))
      .phashNearDups("doc_id", "ahash", maxHamming, bands)

  /** Incremental audio dedup against a pinned fingerprint catalog —
    * [[imageDedupAgainstCatalog]] for the audio modality: same
    * banded tail, same quarantine contract for rows whose PCM did
    * not decode.
    */
  def audioDedupAgainstCatalog(media: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                               catalogHashes: DataFrame,
                               maxHamming: Int = 6, bands: Int = 8): DataFrame =
    hashDedupAgainstCatalog(graft.operators.Multimodal.audioHashes(media),
      catalogHashes, "ahash", maxHamming, bands)

  /** An image-hash catalog prepared ONCE for repeated incremental
    * image dedup (r12) — the image-modality member of the prepared-
    * artifact family: the catalog's payloads decode and dHash once
    * at preparation, each increment (or each streaming trigger via
    * [[graft.streaming.Streams.imageDedupStream]]) pays only its own
    * decode plus the banded cross-side candidate join against the
    * pinned hash frame — never a catalog re-decode, never increment
    * × catalog. `reliable` follows the PreparedLm contract
    * (localCheckpoint blocks don't survive executor loss mid-stream).
    */
  final case class PreparedImageCatalog private[graft] (
      hashes: DataFrame, reliable: Boolean) {

    /** Absorb a catalog increment (doc ids disjoint — enforced: a
      * re-submitted id would duplicate its hash row): the increment
      * decodes and hashes under the SAME deterministic dHash, and
      * the frames union per-row — the cheapest absorb in the engine,
      * the PreparedIvfPq shape.
      */
    def absorb(increment: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
               checkpointDir: Option[String] = None): PreparedImageCatalog =
      absorbHashRows(graft.operators.Multimodal.imageHashes(increment),
        checkpointDir)

    /** Absorb PRE-COMPUTED hash rows (the `dedup` output shape) —
      * the ingest-loop fast path: a trigger's survivors were already
      * decoded by the dedup stage, so absorbing their hash rows
      * directly skips the second decode. Same clash guard.
      */
    private[graft] def absorbHashRows(incHashes: DataFrame,
                                      checkpointDir: Option[String]): PreparedImageCatalog = {
      val ckp = lineageBreaker(checkpointDir)
      val h = ckp(incHashes.select(col("doc_id"), col("phash"), col("decoded_real")))
      val clash = clashProbe(hashes.select(col("doc_id")),
        h.select(col("doc_id")), "doc_id").count()
      require(clash == 0L,
        "PreparedImageCatalog.absorb: increment contains doc ids already in " +
          "the catalog — absorb models catalog growth; re-prepare to replace rows")
      copy(hashes.unionByName(h), reliable && checkpointDir.isDefined)
    }

    /** Dedup an increment against this catalog —
      * [[Ops.imageDedupAgainstCatalog]] with the pinned hashes.
      */
    def dedup(increment: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
              maxHamming: Int = 6, bands: Int = 8): DataFrame =
      imageDedupAgainstCatalog(increment, hashes, maxHamming, bands)

    /** Persist durably ([[ArtifactIO]] layout). */
    def save(path: String): Unit = {
      hashes.write.mode("overwrite").parquet(s"$path/hashes")
      ArtifactIO.writeMeta(hashes.sparkSession, path, "imagecatalog", Seq.empty)
    }
  }

  /** Build a [[PreparedImageCatalog]]; `checkpointDir` selects
    * reliable checkpoints (cluster/streaming mode) for the hash frame.
    */
  def prepareImageCatalog(catalog: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                          checkpointDir: Option[String] = None): PreparedImageCatalog = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedImageCatalog(
      ckp(graft.operators.Multimodal.imageHashes(catalog)), checkpointDir.isDefined)
  }

  /** Load a [[PreparedImageCatalog]] persisted by its `save`; fails
    * fast on a non-imagecatalog path.
    */
  def loadImageCatalog(spark: org.apache.spark.sql.SparkSession, path: String): PreparedImageCatalog = {
    ArtifactIO.readMeta(spark, path, "imagecatalog")
    PreparedImageCatalog(spark.read.parquet(s"$path/hashes"), reliable = true)
  }

  /** An audio-fingerprint catalog prepared ONCE for repeated
    * incremental audio dedup (r12) — [[PreparedImageCatalog]]'s
    * audio-modality twin: the catalog's payloads decode and hash
    * once at preparation ([[graft.operators.Multimodal.audioHashes]]),
    * each increment (or each streaming trigger via
    * [[graft.streaming.Streams.audioDedupStream]]) pays only its own
    * decode plus the banded cross-side candidate join.
    */
  final case class PreparedAudioCatalog private[graft] (
      hashes: DataFrame, reliable: Boolean) {

    /** Absorb a catalog increment (doc ids disjoint — enforced):
      * encode + clash-guarded union, the cheapest absorb shape.
      */
    def absorb(increment: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
               checkpointDir: Option[String] = None): PreparedAudioCatalog =
      absorbHashRows(graft.operators.Multimodal.audioHashes(increment),
        checkpointDir)

    /** Absorb PRE-COMPUTED fingerprint rows (the `dedup` output
      * shape) — the ingest-loop fast path, see
      * [[PreparedImageCatalog.absorbHashRows]].
      */
    private[graft] def absorbHashRows(incHashes: DataFrame,
                                      checkpointDir: Option[String]): PreparedAudioCatalog = {
      val ckp = lineageBreaker(checkpointDir)
      val h = ckp(incHashes.select(col("doc_id"), col("ahash"), col("decoded_real")))
      val clash = clashProbe(hashes.select(col("doc_id")),
        h.select(col("doc_id")), "doc_id").count()
      require(clash == 0L,
        "PreparedAudioCatalog.absorb: increment contains doc ids already in " +
          "the catalog — absorb models catalog growth; re-prepare to replace rows")
      copy(hashes.unionByName(h), reliable && checkpointDir.isDefined)
    }

    /** Dedup an increment against this catalog —
      * [[Ops.audioDedupAgainstCatalog]] with the pinned hashes.
      */
    def dedup(increment: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
              maxHamming: Int = 6, bands: Int = 8): DataFrame =
      audioDedupAgainstCatalog(increment, hashes, maxHamming, bands)

    /** Persist durably ([[ArtifactIO]] layout). */
    def save(path: String): Unit = {
      hashes.write.mode("overwrite").parquet(s"$path/hashes")
      ArtifactIO.writeMeta(hashes.sparkSession, path, "audiocatalog", Seq.empty)
    }
  }

  /** Build a [[PreparedAudioCatalog]]; `checkpointDir` selects
    * reliable checkpoints (cluster/streaming mode) for the hash frame.
    */
  def prepareAudioCatalog(catalog: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                          checkpointDir: Option[String] = None): PreparedAudioCatalog = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedAudioCatalog(
      ckp(graft.operators.Multimodal.audioHashes(catalog)), checkpointDir.isDefined)
  }

  /** Load a [[PreparedAudioCatalog]] persisted by its `save`; fails
    * fast on a non-audiocatalog path.
    */
  def loadAudioCatalog(spark: org.apache.spark.sql.SparkSession, path: String): PreparedAudioCatalog = {
    ArtifactIO.readMeta(spark, path, "audiocatalog")
    PreparedAudioCatalog(spark.read.parquet(s"$path/hashes"), reliable = true)
  }

  /** Explode 64-bit frame hashes into (band, chunk) bucket rows —
    * the q112 banding applied at FRAME grain (r12 video dedup).
    */
  private def bandFrameHashes(fh: DataFrame, bands: Int,
                              idOut: String, kOut: String, hOut: String,
                              nOut: String): DataFrame = {
    val chunk = 64 / bands
    val mask = if (chunk == 64) -1L else (1L << chunk) - 1L
    fh.select(col("doc_id").as(idOut), col("frame_idx").as(kOut),
      col("fhash").cast("long").as(hOut), col("n_frames").as(nOut))
      .select(col(idOut), col(kOut), col(hOut), col(nOut),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col(hOut), b * chunk).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__chunk")
  }

  /** Video near-dup pairs (r12 — the THIRD media dedup modality,
    * over the real all-frames GIF decoder): the standard frame-level
    * recipe — sample ≤ `maxFrames` frames per video
    * ([[graft.operators.Multimodal.videoFrameHashes]]), dHash each,
    * band the hashes into candidate buckets (pigeonhole-exact per
    * FRAME pair at maxHamming < bands), verify candidates by
    * hamming, then keep video pairs where the matched-frame fraction
    * of EITHER side reaches `minFrameMatch` (containment semantics —
    * a short clip embedded in a longer one still pairs). A
    * frame-doubled or container-re-encoded copy pairs its original
    * at fraction 1 (timeline sampling lands on the duplicated
    * originals; the hash reads decoded pixels, not bytes). Stub rows
    * (decoded_real = false) never pair.
    *
    * Scale shape: decode is partition-preserving map work; the pair
    * stage carries only (id, frame ordinal, 64-bit hash) — per-video
    * volume bounded by maxFrames whatever the clip length — through
    * one banded self-join; the per-pair aggregate is map-combinable
    * over matched frame pairs. Never pixels, never all-pairs.
    */
  def videoNearDups(media: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                    maxHamming: Int = 6, bands: Int = 8,
                    minFrameMatch: Double = 0.5, maxFrames: Int = 16): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands ($bands) must divide 64")
    require(minFrameMatch > 0.0 && minFrameMatch <= 1.0,
      s"minFrameMatch ($minFrameMatch) must be in (0, 1]")
    val fh = graft.operators.Multimodal.videoFrameHashes(media, maxFrames)
      .filter(col("decoded_real")).localCheckpoint(true)
    val banded = bandFrameHashes(fh, bands, "doc_id", "__k", "__h", "__n")
    val a = banded.select(col("__band"), col("__chunk"), col("doc_id").as("doc_a"),
      col("__k").as("__ka"), col("__h").as("__ha"), col("__n").as("__na"))
    val b = banded.select(col("__band"), col("__chunk"), col("doc_id").as("doc_b"),
      col("__k").as("__kb"), col("__h").as("__hb"), col("__n").as("__nb"))
    a.join(b, Seq("__band", "__chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "__ka", "doc_b", "__kb")
      .filter(bit_count(col("__ha").bitwiseXOR(col("__hb"))) <= maxHamming)
      .groupBy(col("doc_a"), col("doc_b"), col("__na"), col("__nb"))
      .agg(countDistinct(col("__ka")).as("matched_a"),
        countDistinct(col("__kb")).as("matched_b"))
      .filter(greatest(
        col("matched_a").cast("double") / col("__na").cast("double"),
        col("matched_b").cast("double") / col("__nb").cast("double")) >= minFrameMatch)
      .select(col("doc_a"), col("doc_b"), col("matched_a"),
        col("__na").as("frames_a"), col("matched_b"), col("__nb").as("frames_b"))
  }

  /** The video-modality catalog-dedup tail (r12): increment frame-
    * hash rows survive when no catalog video reaches `minFrameMatch`
    * matched-frame fraction against them; undecodable rows are KEPT
    * flagged — the quarantine contract. Kept output is the absorb-
    * ready frame-hash shape (every frame row of surviving videos).
    */
  private def videoDedupHashRows(incFh0: DataFrame, catalogFrameHashes: DataFrame,
                                 maxHamming: Int, bands: Int,
                                 minFrameMatch: Double): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands ($bands) must divide 64")
    val incFh = incFh0.localCheckpoint(true)
    val a = bandFrameHashes(incFh.filter(col("decoded_real")), bands,
      "__nid", "__ka", "__ha", "__na")
    val b = bandFrameHashes(catalogFrameHashes.filter(col("decoded_real")), bands,
      "__cid", "__kb", "__hb", "__nb")
    val dropped = a.join(b, Seq("__band", "__chunk"))
      .dropDuplicates("__nid", "__ka", "__cid", "__kb")
      .filter(bit_count(col("__ha").bitwiseXOR(col("__hb"))) <= maxHamming)
      .groupBy(col("__nid"), col("__cid"), col("__na"), col("__nb"))
      .agg(countDistinct(col("__ka")).as("__ma"), countDistinct(col("__kb")).as("__mb"))
      .filter(greatest(
        col("__ma").cast("double") / col("__na").cast("double"),
        col("__mb").cast("double") / col("__nb").cast("double")) >= minFrameMatch)
      .select(col("__nid").as("doc_id")).distinct()
    incFh.join(dropped, Seq("doc_id"), "left_anti")
  }

  /** Incremental video dedup against a pinned frame-hash catalog
    * ([[graft.operators.Multimodal.videoFrameHashes]] output) —
    * [[imageDedupAgainstCatalog]] at frame grain. The increment MUST
    * hash under the same `maxFrames` the catalog used (the sampling
    * geometry is part of the fingerprint — [[PreparedVideoCatalog]]
    * pins it).
    */
  def videoDedupAgainstCatalog(media: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                               catalogFrameHashes: DataFrame,
                               maxHamming: Int = 6, bands: Int = 8,
                               minFrameMatch: Double = 0.5, maxFrames: Int = 16): DataFrame =
    videoDedupHashRows(
      graft.operators.Multimodal.videoFrameHashes(media, maxFrames),
      catalogFrameHashes, maxHamming, bands, minFrameMatch)

  /** A video frame-hash catalog prepared ONCE for repeated
    * incremental video dedup (r12) — the THIRTEENTH prepared
    * artifact, completing the media trio: catalog payloads decode
    * and frame-hash once at preparation; each increment (or
    * streaming trigger) pays only its own decode plus the banded
    * cross-side frame join. `maxFrames` is pinned at prepare time —
    * the sampling geometry is part of the fingerprint, so increments
    * hash commensurably by construction.
    */
  final case class PreparedVideoCatalog private[graft] (
      frameHashes: DataFrame, maxFrames: Int, reliable: Boolean) {

    /** Absorb a catalog increment (doc ids disjoint — enforced):
      * decode + clash-guarded union under the pinned maxFrames.
      */
    def absorb(increment: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
               checkpointDir: Option[String] = None): PreparedVideoCatalog =
      absorbHashRows(
        graft.operators.Multimodal.videoFrameHashes(increment, maxFrames),
        checkpointDir)

    /** Absorb PRE-COMPUTED frame-hash rows (the `dedup` output
      * shape) — the ingest-loop fast path, see
      * [[PreparedImageCatalog.absorbHashRows]].
      */
    private[graft] def absorbHashRows(incFh: DataFrame,
                                      checkpointDir: Option[String]): PreparedVideoCatalog = {
      val ckp = lineageBreaker(checkpointDir)
      val h = ckp(incFh.select(col("doc_id"), col("frame_idx"), col("fhash"),
        col("n_frames"), col("decoded_real")))
      val clash = clashProbe(frameHashes.select(col("doc_id")).distinct(),
        h.select(col("doc_id")).distinct(), "doc_id").count()
      require(clash == 0L,
        "PreparedVideoCatalog.absorb: increment contains doc ids already in " +
          "the catalog — absorb models catalog growth; re-prepare to replace rows")
      copy(frameHashes.unionByName(h), maxFrames,
        reliable && checkpointDir.isDefined)
    }

    /** Dedup an increment against this catalog —
      * [[Ops.videoDedupAgainstCatalog]] with the pinned frames.
      */
    def dedup(increment: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
              maxHamming: Int = 6, bands: Int = 8,
              minFrameMatch: Double = 0.5): DataFrame =
      videoDedupAgainstCatalog(increment, frameHashes, maxHamming, bands,
        minFrameMatch, maxFrames)

    /** Persist durably ([[ArtifactIO]] layout, maxFrames in meta). */
    def save(path: String): Unit = {
      frameHashes.write.mode("overwrite").parquet(s"$path/framehashes")
      ArtifactIO.writeMeta(frameHashes.sparkSession, path, "videocatalog",
        Seq("maxFrames" -> maxFrames.toString))
    }
  }

  /** Build a [[PreparedVideoCatalog]]; `checkpointDir` selects
    * reliable checkpoints (cluster/streaming mode).
    */
  def prepareVideoCatalog(catalog: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord],
                          maxFrames: Int = 16,
                          checkpointDir: Option[String] = None): PreparedVideoCatalog = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedVideoCatalog(
      ckp(graft.operators.Multimodal.videoFrameHashes(catalog, maxFrames)),
      maxFrames, checkpointDir.isDefined)
  }

  /** Load a [[PreparedVideoCatalog]] persisted by its `save`; fails
    * fast on a non-videocatalog path or missing maxFrames.
    */
  def loadVideoCatalog(spark: org.apache.spark.sql.SparkSession, path: String): PreparedVideoCatalog = {
    val m = ArtifactIO.readMeta(spark, path, "videocatalog")
    PreparedVideoCatalog(spark.read.parquet(s"$path/framehashes"),
      ArtifactIO.field(m, path, "maxFrames").toInt, reliable = true)
  }

  /** A rolling SCD Type-2 dimension prepared ONCE and maintained per
    * extract (r12 — VERDICT r11 missing #4): the prepared-artifact
    * discipline applied to [[GraftDataFrameOps.scd2History]]. The
    * one-shot builder rebuilds from the WHOLE snapshot series each
    * run; a nightly dimension wants `absorb(nextExtract)` — close and
    * open versions against ONLY the latest extract. `absorb(E_n)` ≡
    * `scd2History(E_1 ∪ … ∪ E_n)` row-for-row (spec-pinned on the
    * q109 series, gap-reinserts included), because every absorb-time
    * decision mirrors the one-shot invariant exactly: an open version
    * in the artifact was BY CONSTRUCTION last sighted at `lastSnap`
    * (the one-shot builder keeps a version open only when its id is
    * present in the final extract), so the calendar successor that
    * closes it — for a change OR a deletion — is precisely the new
    * extract's timestamp.
    *
    * Scale shape: ONE id-hash full-outer join of the OPEN-version
    * frame (≤ one row per live id) against the extract; the closed
    * history is never joined or shuffled — it passes through the
    * per-absorb lineage break as a linear scan-and-write, which is
    * what a nightly dimension rebuild writes anyway.
    */
  final case class PreparedScd2 private[graft] (
      history: DataFrame, snapCol: String, id: String, attrs: Seq[String],
      lastSnapUs: Long, reliable: Boolean) {

    /** Absorb the NEXT extract: one full keyed dump carrying a single
      * `snapCol` timestamp strictly after the artifact's last
      * absorbed extract (both enforced — an out-of-order or
      * multi-snapshot frame would make version boundaries undefined).
      * Same caller contract as `scd2History`: one row per id.
      */
    def absorb(extract: DataFrame,
               checkpointDir: Option[String] = None): PreparedScd2 = {
      val ckp = lineageBreaker(checkpointDir)
      val tsRows = extract
        .select(col(snapCol), unix_micros(col(snapCol)).as("__us"))
        .distinct().limit(2).collect()
      require(tsRows.length == 1,
        s"PreparedScd2.absorb: extract must carry exactly one $snapCol " +
          s"timestamp (found ${tsRows.length}) — one absorb per extract")
      val snapTs = tsRows(0).getTimestamp(0)
      val snapUs = tsRows(0).getLong(1)
      require(snapUs > lastSnapUs,
        s"PreparedScd2.absorb: extract timestamp $snapTs is not after the " +
          "last absorbed extract — extracts must absorb in snapshot order")
      val closed = history.filter(!col("is_current"))
      val o = history.filter(col("is_current")).select(
        col(id) +: col("valid_from").as("__o_from") +: lit(true).as("__in_o") +:
          attrs.map(a => col(a).as(s"__o_$a")): _*)
      val n = extract.select(
        col(id) +: lit(true).as("__in_n") +: attrs.map(a => col(a).as(s"__n_$a")): _*)
      val oA = struct(attrs.map(a => col(s"__o_$a")): _*)
      val nA = struct(attrs.map(a => col(s"__n_$a")): _*)
      // the same null-safe struct compare the one-shot builder uses:
      // a null attribute is a value, not a wildcard. BOTH presence
      // markers gate the compare: a NEW id whose attributes are all
      // null would otherwise match the absent open row's all-null
      // struct (null <=> null is true field-wise) and get NO version
      // at all (r12 second review)
      val same = col("__in_o").isNotNull && col("__in_n").isNotNull && (oA <=> nA)
      val j = o.join(n, Seq(id), "full_outer")
      // surviving/closing versions (one output row per open version):
      // unchanged → stays open; changed or deleted → closes at the
      // new extract (its calendar successor — see the class contract)
      val fromOld = j.filter(col("__in_o").isNotNull).select(
        Seq(col(id)) ++ attrs.map(a => col(s"__o_$a").as(a)) ++ Seq(
          col("__o_from").as("valid_from"),
          when(same, lit(null).cast("timestamp")).otherwise(lit(snapTs)).as("valid_to"),
          same.as("is_current")): _*)
      // freshly-opened versions: a changed id, a brand-new id, or a
      // gap re-insert (no open version even though closed ones exist)
      val fromNew = j.filter(col("__in_n").isNotNull && !same).select(
        Seq(col(id)) ++ attrs.map(a => col(s"__n_$a").as(a)) ++ Seq(
          lit(snapTs).as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"),
          lit(true).as("is_current")): _*)
      PreparedScd2(
        ckp(closed.unionByName(fromOld).unionByName(fromNew)),
        snapCol, id, attrs, snapUs, reliable && checkpointDir.isDefined)
    }

    /** Persist the dimension history durably ([[ArtifactIO]] layout);
      * attribute names round-trip through a NUL-joined list (NUL
      * cannot occur in a Spark column name).
      */
    def save(path: String, partitionHistoryByMonth: Boolean = false): Unit = {
      // partitionHistoryByMonth (r13 -- VERDICT r12 next #6): write
      // the history PARTITIONED by valid_from month (vf_month=yyyy-MM
      // dirs), giving scd2AsOf's stated partition pruning an actual
      // layout to prune -- an as-of read through Ops.scd2AsOfRead
      // filters vf_month <= month(ts) at the MANIFEST, so versions
      // opened after the instant never reach the scan. The win is on
      // deep-history dimensions: a 10-year dimension read as of year
      // 2 scans ~20% of files. loadScd2 reads either layout.
      if (partitionHistoryByMonth)
        history
          .withColumn("vf_month", date_format(col("valid_from"), "yyyy-MM"))
          .write.mode("overwrite").partitionBy("vf_month")
          .parquet(s"$path/history")
      else history.write.mode("overwrite").parquet(s"$path/history")
      ArtifactIO.writeMeta(history.sparkSession, path, "scd2",
        Seq("snapCol" -> snapCol, "id" -> id,
          "attrs" -> attrs.mkString("\u0000"),
          "lastSnapUs" -> lastSnapUs.toString,
          "partitioned" -> partitionHistoryByMonth.toString))
    }
  }

  /** Point-in-time dimension read STRAIGHT OFF a persisted
    * [[PreparedScd2]] path (r13): when the artifact was saved with
    * `partitionHistoryByMonth`, the read filters the partition
    * column FIRST (`vf_month <= month(ts)` -- lexicographic on
    * yyyy-MM, correct by construction), so file pruning happens at
    * the manifest before the row-level interval filter runs; on an
    * unpartitioned layout it degrades to the plain
    * [[GraftDataFrameOps.scd2AsOf]] full-history scan. Returns the
    * same reconstructed-snapshot shape as `scd2AsOf`.
    */
  def scd2AsOfRead(spark: org.apache.spark.sql.SparkSession, path: String,
                   ts: String): DataFrame = {
    val m = ArtifactIO.readMeta(spark, path, "scd2")
    val h = spark.read.parquet(s"$path/history")
    val base =
      if (m.get("partitioned").contains("true"))
        h.filter(col("vf_month") <= ts.take(7)).drop("vf_month")
      else h
    base.scd2AsOf(ts)
  }

  /** Build a [[PreparedScd2]] from the snapshot series so far (one or
    * more extracts — `scd2History` semantics), ready to absorb the
    * next extract.
    */
  def prepareScd2(snapshots: DataFrame, snapCol: String, id: String,
                  attrs: Seq[String],
                  checkpointDir: Option[String] = None): PreparedScd2 = {
    val ckp = lineageBreaker(checkpointDir)
    val hist = ckp(snapshots.scd2History(snapCol, id, attrs))
    val last = snapshots.agg(max(unix_micros(col(snapCol)))).collect()(0)
    require(!last.isNullAt(0), "prepareScd2: the snapshot series is empty")
    PreparedScd2(hist, snapCol, id, attrs, last.getLong(0), checkpointDir.isDefined)
  }

  /** Load a [[PreparedScd2]] persisted by its `save`; fails fast on a
    * non-scd2 path.
    */
  def loadScd2(spark: org.apache.spark.sql.SparkSession, path: String): PreparedScd2 = {
    val m = ArtifactIO.readMeta(spark, path, "scd2")
    def f(k: String) = ArtifactIO.field(m, path, k)
    // a month-partitioned layout re-absorbs identically: the derived
    // vf_month partition column is layout, not history
    PreparedScd2(
      spark.read.parquet(s"$path/history").drop("vf_month"),
      f("snapCol"), f("id"), f("attrs").split("\u0000").toSeq,
      f("lastSnapUs").toLong, reliable = true)
  }

  /** Portable ASCII PII patterns — character classes and bounded
    * quantifiers only, so Java regex (Spark codegen) and RE2 (the
    * DuckDB oracle) match identically. Emails and IPv4 addresses;
    * callers extend with their own (regex, token) rules.
    */
  val piiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** True when a vertex-id column casts losslessly to Long — the
    * space the connected-components engines compute in.
    */
  private def integralIdType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Vertex-id adaptation for both connected-components engines.
    * Integral edge ids cast losslessly to Long and pass straight
    * through (labels stay in Long space — the historical contract).
    * Any other id type (string doc ids, UUIDs) is mapped to a 64-bit
    * xxhash64 surrogate, verified COLLISION-FREE over the distinct
    * edge endpoints first (one vertices-sized aggregate — an
    * undetected collision would silently merge two unrelated
    * clusters, so it fails loudly instead), and the result labels are
    * translated back so vertex AND component carry ORIGINAL ids
    * (component = the member whose surrogate hashes lowest, an
    * arbitrary-but-deterministic canonical representative).
    * Previously a non-numeric id silently cast("long") to null, every
    * label join missed, and the caller got all-singletons — "no
    * duplicates found" with no error (VERDICT r8 "What's wrong" #2).
    */
  private def withLongVertexIds(
      edges: DataFrame, src: String, dst: String,
      ck: DataFrame => DataFrame)(
      run: DataFrame => (DataFrame, Int)): (DataFrame, Int) = {
    val srcT = edges.schema(src).dataType
    val dstT = edges.schema(dst).dataType
    if (integralIdType(srcT) && integralIdType(dstT))
      run(edges.select(col(src).cast("long").as("__src"), col(dst).cast("long").as("__dst")))
    else {
      require(srcT == dstT,
        s"connectedComponents: edge id columns have mixed types ($srcT vs $dstT)")
      def key(c: Column) = xxhash64(c.cast("string"))
      val verts = ck(edges.select(col(src).as("__vid"))
        .unionByName(edges.select(col(dst).as("__vid")))
        .distinct().withColumn("__vk", key(col("__vid"))))
      val r = verts.agg(count(lit(1)), countDistinct(col("__vk"))).collect().head
      if (r.getLong(0) != r.getLong(1)) throw new IllegalStateException(
        s"connectedComponents: xxhash64 vertex surrogate collision among " +
          s"${r.getLong(0)} distinct ids (${r.getLong(0) - r.getLong(1)} lost); " +
          "supply integral vertex ids for this graph")
      val (labels, rounds) =
        run(edges.select(key(col(src)).as("__src"), key(col(dst)).as("__dst")))
      val byVertex = verts.select(col("__vk").as("vertex"), col("__vid"))
      val byComp = verts.select(col("__vk").as("component"), col("__vid").as("__cid"))
      (labels.join(byVertex, "vertex").join(byComp, "component")
        .select(col("__vid").as("vertex"), col("__cid").as("component")), rounds)
    }
  }

  /** BSP min-label connected components over an edge list, the engine
    * behind q46's dedup clusters: symmetrize, then propagate the
    * minimum label one hop per round until the labels reach their
    * fixpoint. Convergence probe = one 3-field aggregate per round
    * (count + two independent xxhash64 folds under bit_xor — the same
    * order-independent, overflow-free signature as the star variant;
    * an ANSI sum(component) could wrap Long at ~10¹⁹ and terminate
    * early with fragmented labels), CONFIRMED exactly with one empty
    * `except` at the convergence round. Rounds needed = component
    * diameter + 1 (the confirming round); near-dup clusters are
    * shallow in practice, so diameter-bound rounds beat the
    * constant-factor overhead of the large-star/small-star
    * contraction — for deep components use the implemented
    * alternative, [[connectedComponentsStarWithRounds]], whose round
    * count is O(log² n) regardless of topology.
    * Returns (vertex, component) for every endpoint; also the round
    * count for diagnostics. Integral ids label in Long space;
    * string/other ids go through the collision-checked surrogate
    * mapping of [[withLongVertexIds]] and come back as original ids.
    */
  private[graft] def connectedComponentsWithRounds(
      edges: DataFrame, src: String, dst: String,
      maxRounds: Int, checkpointDir: Option[String],
      saltHotDegree: Long = 0L, saltK: Int = 8): (DataFrame, Int) = {
    val ck = lineageBreaker(checkpointDir)
    withLongVertexIds(edges, src, dst, ck) { e =>
    val sym = ck(e.unionByName(
      e.select(col("__dst").as("__src"), col("__src").as("__dst"))))
    val verts = sym.select(col("__src").as("vertex")).distinct()
    // hot-vertex set for the per-round edge ⨝ labels join
    // (saltHotDegree = 0 → off), materialized once
    val hotSrc =
      if (saltHotDegree > 0L)
        Some(ck(hotVertices(sym, "__src", saltHotDegree)))
      else None
    var labels = ck(verts.withColumn("component", col("vertex")))
    def signature(d: DataFrame): (Long, Long, Long) = {
      val r = d.agg(count(lit(1)),
        bit_xor(xxhash64(col("vertex"), col("component"))),
        bit_xor(xxhash64(col("component"), col("vertex"), lit(7L)))).collect().head
      def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
      (g(0), g(1), g(2))
    }
    var prevSig: (Long, Long, Long) = null
    var prevLabels: DataFrame = null
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val lbl = labels.select(col("vertex").as("__src"), col("component"))
      val viaNeighbors = (hotSrc match {
          case Some(h) => saltedVertexJoin(sym, lbl, "__src", col("__dst"), h, saltK)
          case None => sym.join(lbl, Seq("__src"))
        })
        .select(col("__dst").as("vertex"), col("component"))
      labels = ck(labels.select(col("vertex"), col("component"))
        .unionByName(viaNeighbors)
        .groupBy(col("vertex"))
        .agg(min(col("component")).as("component")))
      // fast probabilistic probe first; on a signature match, CONFIRM
      // exactly before stopping: both frames are distinct (vertex,
      // component) sets of equal count (count is in the signature),
      // so one empty except proves equality. The exact job runs only
      // at the convergence round (or on a ~2^-128 collision, where it
      // correctly keeps the loop going).
      val sig = signature(labels)
      converged = sig == prevSig && labels.except(prevLabels).isEmpty
      prevSig = sig
      prevLabels = labels
    }
    // partial labels are silently WRONG (a component deeper than
    // maxRounds keeps fragmented labels), so exhausting the budget is
    // an error, never a result (ADVICE r7). Deep graphs: raise
    // maxRounds or use the diameter-independent star variant.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxRounds rounds: " +
        "a component is deeper than the round budget; raise maxRounds or " +
        "use connectedComponentsStar (O(log² n) rounds on any topology)")
    (labels.select(col("vertex"), col("component")), round)
    }
  }

  /** Portable-HLL register table: one row per (group, bucket) with
    * the register max — the frame half of
    * [[GraftDataFrameOps.hllDistinct]], exposed because registers are
    * a MERGEABLE sketch: max-merging two register tables yields
    * EXACTLY the register table of the union corpus (max of maxes),
    * so sketch-table absorption ([[hllMergeRegisters]]) carries no
    * additional error at all — the merged estimate is identical to
    * re-sketching the union, which the spec pins as equality, not
    * tolerance. One map-combinable (group, bucket) shuffle; absent
    * buckets (register 0) stay implicit.
    */
  def hllRegisters(df: DataFrame, group: Seq[String], value: Column,
                   p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"hllRegisters: p must be in [4, 16] (got $p)")
    val m = 1 << p
    val scale = 60 - p + 1
    val gcols = group.map(col)
    df.filter(value.isNotNull)
      .select((gcols :+ graft.functions.TextFunctions
        .seededHash(lit("hll"), value.cast("string")).as("__h")): _*)
      .select((gcols :+ expr(s"__h % $m").as("__bkt")
        :+ expr(s"__h div $m").as("__w")): _*)
      .withColumn("__rho",
        when(col("__w") === 0L, lit(scale))
          .otherwise(lit(scale) - length(bin(col("__w")))))
      .groupBy((gcols :+ col("__bkt")): _*)
      .agg(max(col("__rho")).as("__reg"))
  }

  /** Max-merge register tables ([[hllRegisters]]) — the EXACT sketch
    * union: `merge(registers(A), registers(B))` equals
    * `registers(A ∪ B)` row-for-row.
    */
  def hllMergeRegisters(group: Seq[String], tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty, "hllMergeRegisters: need at least one register table")
    tables.reduce(_ unionByName _)
      .groupBy((group.map(col) :+ col("__bkt")): _*)
      .agg(max(col("__reg")).as("__reg"))
  }

  /** The estimate half of [[GraftDataFrameOps.hllDistinct]]: harmonic
    * sum as exact shifted longs, αm²·2^(61−p)/S with the standard
    * linear-counting branch (see hllDistinct's scaladoc for the
    * portability argument).
    */
  def hllEstimateFromRegisters(regs: DataFrame, group: Seq[String],
                               out: String, p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"hllEstimateFromRegisters: p must be in [4, 16] (got $p)")
    val m = 1 << p
    val scale = 60 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // ONE double literal computed here and mirrored at full precision
    // into the oracle SQL — both engines perform the same division
    val numer = alpha * m.toDouble * m.toDouble * math.pow(2.0, scale)
    val gcols = group.map(col)
    // coalesce: a global (group-less) estimate over an EMPTY register
    // table yields one row with a null sum — it must read as "all m
    // buckets empty" (estimate 0 via linear counting), not null
    regs.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__present"),
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - __reg)")), lit(0L))
          .as("__sp"))
      .withColumn("__s",
        col("__sp") + (lit(m.toLong) - col("__present")) * lit(1L << scale))
      .withColumn("__v0", lit(m.toLong) - col("__present"))
      .withColumn("__e", lit(numer) / col("__s").cast("double"))
      .withColumn(out,
        when(col("__e") <= lit(2.5 * m) && col("__v0") > 0L,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("__v0").cast("double"))))
          .otherwise(round(col("__e"))).cast("long"))
      .select((gcols :+ col(out)): _*)
  }

  /** Portable quantile-sketch register table — the PERCENTILE sibling
    * of [[hllRegisters]]: one row per (group, bucket) with the
    * bucket's row count, bucket = floor(value / bucketWidth). Counts
    * ADD where HLL registers max, so the merge ([[
    * quantileMergeRegisters]] — union + sum) yields EXACTLY the
    * register table of the union corpus, row-for-row: sketch-table
    * absorption carries no additional error at all (spec-pinned as
    * equality). The census arithmetic is one IEEE division + floor —
    * both exactly specified, so the registers replay bit-for-bit in
    * any engine (q108's DuckDB oracle does); pick a `bucketWidth`
    * exactly representable as a double (powers of two ideally) so
    * the division itself is exact scaling. One map-combinable
    * (group, bucket) shuffle; memory per group = occupied buckets =
    * value range / bucketWidth — the resolution knob.
    */
  def quantileRegisters(df: DataFrame, group: Seq[String], value: Column,
                        bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0 && java.lang.Double.isFinite(bucketWidth),
      s"quantileRegisters: bucketWidth must be positive and finite (got $bucketWidth)")
    val gcols = group.map(col)
    // values whose bucket is unrepresentable are ignored like nulls
    // (the portable_quantiles aggregate's convention): a NaN would
    // otherwise land SILENTLY in Spark's bucket 0 and a 1e19-scale
    // outlier would saturate to the Long.MaxValue bucket, while
    // DuckDB's BIGINT cast THROWS on both — a cross-engine divergence
    // waiting for dirty data (r11 review, twice). ONE between() on
    // the scaled value drops all of it: NaN and ±Inf compare false,
    // and finite values land outside ±2^62 exactly when their bucket
    // would overflow the census's Long key space.
    val bound = Math.scalb(1.0, 62)
    df.select((gcols :+ value.cast("double").as("__qv")): _*)
      .filter((col("__qv") / lit(bucketWidth)).between(-bound, bound))
      .select((gcols :+ floor(col("__qv") / lit(bucketWidth))
        .cast("long").as("__qbkt")): _*)
      .groupBy((gcols :+ col("__qbkt")): _*)
      .agg(count(lit(1)).as("__qn"))
  }

  /** Sum-merge register tables ([[quantileRegisters]]) — the EXACT
    * sketch union: `merge(registers(A), registers(B))` equals
    * `registers(A ∪ B)` row-for-row (counts are additive).
    */
  def quantileMergeRegisters(group: Seq[String], tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty, "quantileMergeRegisters: need at least one register table")
    tables.reduce(_ unionByName _)
      .groupBy((group.map(col) :+ col("__qbkt")): _*)
      .agg(sum(col("__qn")).as("__qn"))
  }

  /** Incrementally-maintained quantile registers (r14 — the
    * EIGHTEENTH durable artifact and the FIFTH lossless-by-algebra
    * absorb: [[quantileMergeRegisters]] sum-merges shard censuses,
    * which IS the union census row-for-row, so
    * `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)` bit-for-bit with ZERO
    * additional sketch error — no corpus rescan, no disjointness
    * contract). The production shape: nightly increments keep living
    * per-group percentile dashboards (latency SLOs, price bands)
    * without ever re-reading history; `quantiles` serves the q108
    * nearest-rank midpoint estimates off the stored census at any
    * point. The census is resolution-bounded (domain/width rows per
    * group), never corpus-sized.
    */
  final case class PreparedQuantiles private[graft] (
    regs: DataFrame, group: Seq[String], bucketWidth: Double,
    reliable: Boolean) {

    /** Merge an increment's census by exact count addition; pass the
      * SAME value measure prepare used (the absorbVocab discipline).
      */
    def absorb(increment: DataFrame, value: Column,
               checkpointDir: Option[String] = None): PreparedQuantiles = {
      val ckp = lineageBreaker(checkpointDir)
      val merged = ckp(quantileMergeRegisters(group,
        regs, quantileRegisters(increment, group, value, bucketWidth)))
      PreparedQuantiles(merged, group, bucketWidth,
        reliable && checkpointDir.isDefined)
    }

    /** Nearest-rank midpoint estimates off the maintained census —
      * the q108 serve surface ([[quantileFromRegisters]]).
      */
    def quantiles(qs: Seq[(String, Double)]): DataFrame =
      quantileFromRegisters(regs, group, bucketWidth, qs)

    /** Persist durably (one census frame + kind-tagged meta; group
      * names NUL-joined with the fmt marker — the PreparedRollup
      * discipline from day one).
      */
    def save(path: String): Unit = {
      regs.write.mode("overwrite").parquet(s"$path/regs")
      ArtifactIO.writeMeta(regs.sparkSession, path, "quantiles",
        Seq("group" -> group.mkString("\u0000"),
          "bucketWidth" -> bucketWidth.toString, "fmt" -> "2"))
    }
  }

  /** Build a [[PreparedQuantiles]]; its `quantiles` over the prepare
    * corpus equals the one-shot [[GraftDataFrameOps.quantileSketch]]
    * (shared census code, spec-pinned).
    */
  def prepareQuantiles(corpus: DataFrame, group: Seq[String], value: Column,
                       bucketWidth: Double,
                       checkpointDir: Option[String] = None): PreparedQuantiles = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedQuantiles(ckp(quantileRegisters(corpus, group, value, bucketWidth)),
      group, bucketWidth, checkpointDir.isDefined)
  }

  /** Load a [[PreparedQuantiles]] persisted by its `save`; fails fast
    * on a non-quantiles path or a missing format marker.
    */
  def loadQuantiles(spark: org.apache.spark.sql.SparkSession,
                    path: String): PreparedQuantiles = {
    val m = ArtifactIO.readMeta(spark, path, "quantiles")
    val fmt = m.getOrElse("fmt", "<missing>")
    require(fmt == "2",
      s"loadQuantiles: artifact at $path has format '$fmt', expected '2'")
    val raw = ArtifactIO.field(m, path, "group")
    val grp = if (raw.isEmpty) Nil else raw.split("\u0000").toSeq
    PreparedQuantiles(spark.read.parquet(s"$path/regs"), grp,
      ArtifactIO.field(m, path, "bucketWidth").toDouble, reliable = true)
  }

  /** The exact per-bin calibration census — (bin, n, n_pos, __ssum,
    * __br) with every column additive: counts, positives, exact
    * score-micros sums, the exact DECIMAL(38,0) Brier numerator.
    * Shared by the one-shot [[GraftDataFrameOps.calibrationBins]]
    * and the durable [[PreparedCalibration]] (absorb ≡
    * prepare-of-union because all five columns add).
    */
  private[graft] def calibrationCensus(df: DataFrame, scoreMicros: Column,
                                       label: Column, nBins: Int,
                                       keys: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(nBins >= 2 && nBins <= 1000,
      s"calibrationBins: nBins ($nBins) must be in 2..1000")
    val s = scoreMicros.cast("long")
    val y = label.cast("long")
    val rows = df
      .filter(scoreMicros.isNotNull && label.isNotNull &&
        keys.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select((keys.map(col) ++ Seq(s.as("__s"), y.as("__y"))): _*)
      .withColumn("__chk", when(col("__s") >= 0L && col("__s") <= 1000000L &&
        col("__y").isin(0L, 1L), lit(true))
        .otherwise(raise_error(lit(
          "calibrationBins: score must be micros in [0, 1e6] and label 0/1"))))
      // DIV, not `/`: the bin index is exact integer arithmetic
      .withColumn("bin", when(col("__chk"),
        least(lit(nBins - 1L), expr(s"(__s * $nBins) DIV 1000000L"))))
    val err = col("__s") - col("__y") * lit(1000000L)
    rows.groupBy((keys.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        sum(col("__s")).as("__ssum"),
        sum((err * err).cast(DecimalType(38, 0)))
          .cast(DecimalType(38, 0)).as("__br"))
  }

  /** The readout half: mean/rate/gap/Brier to 6 decimals over the
    * exact census sums — as EXACT half-up integer divisions to micros
    * (the q161 divmod discipline), divided by 1e6 at the very end.
    *
    * r17 (optimization round) correctness fix, found by the sf0.001
    * smoke gate: the old finish rounded IEEE doubles (`round(x, 6)`),
    * and a census landing on an exact 7th-digit midpoint rounds UP
    * under Spark's shortest-string HALF_UP but DOWN under DuckDB's
    * binary ×1e6 round — q209 at sf0.001 hit it with
    * ssum/n = 2015398/4 = 503849.5 micros (Spark 0.50385, DuckDB
    * 0.503849). The micros integers below are exact in both engines,
    * match the old Spark values at every row (at a true midpoint the
    * old shortest-string round was already half-up; away from
    * midpoints the old double round agreed with the true decimal
    * round while n stays far below the ~1e9-rows-per-bin point where
    * double error could reach a boundary), and replace the oracle's
    * double rounds with the same integer divisions.
    *
    * SCALE BOUND (ADVICE r17 #2): `__ssum * 2` and `n_pos * 2000000`
    * are LONG arithmetic — with scores in micros ≤ 1e6, the multiply
    * wraps (silently, under non-ANSI) only past ~4.6e18 of per-bin
    * micro-sum, i.e. ≳ 4.6e12 rows in ONE (segment, bin) at score
    * 1.0. That is the stated contract (the Brier term, which can
    * exceed it, already routes through DECIMAL(38,0) below); a
    * deployment expecting trillions of rows per calibration bin
    * should lift msM/prM to the same DECIMAL(38,0) divmod first.
    */
  private[graft] def calibrationFinish(census: DataFrame,
                                       keys: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // half-up integer division of non-negatives: floor((2a + b) / 2b)
    val msM = expr("(__ssum * 2 + n) DIV (n * 2)")
    val prM = expr("(n_pos * 2000000 + n) DIV (n * 2)")
    // Brier numerator is DECIMAL(38,0) (can exceed LONG) — the q161
    // exact divmod pattern: num − pmod is divisible, the division is
    // exact, and the micros quotient (≤ 1e6) casts back to long
    val brNum = (col("__br") * 2 +
      (col("n") * lit(1000000L)).cast(DecimalType(38, 0)))
      .cast(DecimalType(38, 0))
    val brDen = col("n") * lit(2000000L)
    val brM = ((brNum - pmod(brNum, brDen)) / brDen).cast("long")
    census
      .withColumn("__msM", msM)
      .withColumn("__prM", prM)
      .withColumn("mean_score", col("__msM").cast("double") / lit(1e6))
      .withColumn("pos_rate", col("__prM").cast("double") / lit(1e6))
      .withColumn("gap",
        (col("__prM") - col("__msM")).cast("double") / lit(1e6))
      .withColumn("brier", brM.cast("double") / lit(1e6))
      .select((keys.map(col) ++ Seq(col("bin"), col("n"), col("n_pos"),
        col("mean_score"), col("pos_rate"), col("gap"), col("brier"))): _*)
  }

  /** Incrementally-maintained calibration census (r15 — the
    * TWENTIETH durable artifact and SEVENTH lossless-by-algebra
    * absorb, and the MODEL-MONITORING member of the artifact family:
    * a deployed quality/safety classifier's reliability diagram
    * should accumulate over live traffic, not rebuild from a corpus
    * rescan — every census column (n, positives, exact score sums,
    * the exact Brier numerator) is ADDITIVE, so
    * `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)` row-for-row with zero
    * additional error). `serve` reads the reliability diagram +
    * per-bin Brier at any point; save/load through ArtifactIO
    * (kind-tagged + fmt + nBins — absorb and serve read the bin
    * count FROM the artifact, so two sides cannot disagree).
    */
  final case class PreparedCalibration private[graft] (
    census: DataFrame, nBins: Int, reliable: Boolean) {

    /** Merge an increment's census by exact addition. */
    def absorb(increment: DataFrame, scoreMicros: Column, label: Column,
               checkpointDir: Option[String] = None): PreparedCalibration = {
      import org.apache.spark.sql.types.DecimalType
      val ckp = lineageBreaker(checkpointDir)
      val merged = ckp(census
        .unionByName(calibrationCensus(increment, scoreMicros, label, nBins))
        .groupBy(col("bin"))
        .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
          sum(col("__ssum")).as("__ssum"),
          sum(col("__br")).cast(DecimalType(38, 0)).as("__br")))
      PreparedCalibration(merged, nBins, reliable && checkpointDir.isDefined)
    }

    /** The reliability diagram + Brier over everything absorbed. */
    def serve: DataFrame = calibrationFinish(census)

    /** Persist durably (census frame + kind-tagged meta). */
    def save(path: String): Unit = {
      census.write.mode("overwrite").parquet(s"$path/census")
      ArtifactIO.writeMeta(census.sparkSession, path, "calibration",
        Seq("nBins" -> nBins.toString, "fmt" -> "1"))
    }
  }

  /** Build a [[PreparedCalibration]]; `serve` on it reproduces
    * [[GraftDataFrameOps.calibrationBins]] bit-for-bit (shared
    * census + finisher, spec-pinned).
    */
  def prepareCalibration(corpus: DataFrame, scoreMicros: Column, label: Column,
                         nBins: Int,
                         checkpointDir: Option[String] = None): PreparedCalibration = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedCalibration(ckp(calibrationCensus(corpus, scoreMicros, label, nBins)),
      nBins, checkpointDir.isDefined)
  }

  /** Load a [[PreparedCalibration]] persisted by its `save`; fails
    * fast on a non-calibration path or missing format marker.
    */
  def loadCalibration(spark: org.apache.spark.sql.SparkSession,
                      path: String): PreparedCalibration = {
    val m = ArtifactIO.readMeta(spark, path, "calibration")
    val fmt = m.getOrElse("fmt", "<missing>")
    require(fmt == "1",
      s"loadCalibration: artifact at $path has format '$fmt', expected '1'")
    PreparedCalibration(spark.read.parquet(s"$path/census"),
      ArtifactIO.field(m, path, "nBins").toInt, reliable = true)
  }

  /** Incrementally-maintained bucket census (r15 — the NINETEENTH
    * durable artifact and the SIXTH lossless-by-algebra absorb,
    * VERDICT r14 missing #2: the drift-stream family took its
    * baseline as a LIVE frame recomputed at query start, so a
    * restarted monitor scored against whatever the baseline table
    * said that day; THIS pins the baseline. Counts add, so
    * `prepare(A).absorb(B)` ≡ `prepare(A ∪ B)` row-for-row — zero
    * additional error, no corpus rescan, no disjointness contract).
    * One artifact serves the whole categorical-drift family:
    * [[psiDriftFromCensus]] (PSI), [[jsDivergenceFromCensus]] (JS),
    * and [[PreparedBuckets.armWeights]] — the declared-split vector
    * for [[srmCheck]], measured once from the pinned assignment
    * corpus instead of hand-typed. The census is bounded by the
    * bucket domain, never the corpus.
    */
  final case class PreparedBuckets private[graft] (
    census: DataFrame, bucket: String, reliable: Boolean) {

    /** Merge an increment's census by exact count addition — the
      * union census, row-for-row (the [[PreparedQuantiles]] algebra).
      */
    def absorb(increment: DataFrame,
               checkpointDir: Option[String] = None): PreparedBuckets = {
      val ckp = lineageBreaker(checkpointDir)
      val merged = ckp(census.unionByName(bucketCensus(increment, bucket))
        .groupBy(col("bucket")).agg(sum(col("c")).as("c")))
      PreparedBuckets(merged, bucket, reliable && checkpointDir.isDefined)
    }

    /** PSI of `current` against the pinned census — value-identical
      * to [[psiDrift]] of the prepare corpus vs `current`.
      */
    def psiVs(current: DataFrame): DataFrame =
      psiDriftFromCensus(census, current, bucket)

    /** JS divergence of `current` against the pinned census. */
    def jsVs(current: DataFrame): DataFrame =
      jsDivergenceFromCensus(census, current, bucket)

    /** The pinned census as an [[srmCheck]] declared-weight vector:
      * each bucket's exact share of the census total, in bucket
      * order. A k-bounded collect (the bucket domain — the q48
      * scalar discipline); shares are c/N doubles, each in (0, 1]
      * by construction (census counts are ≥ 1).
      */
    def armWeights: Seq[(String, Double)] = {
      val rows = census
        .select(col("bucket").cast("string").as("arm"), col("c"))
        .orderBy(col("arm")).collect()
      val n = rows.map(_.getLong(1)).sum
      require(n > 0, "armWeights: empty census has no declared split")
      rows.map(r => r.getString(0) -> r.getLong(1).toDouble / n.toDouble).toSeq
    }

    /** Persist durably (census frame + kind-tagged meta). */
    def save(path: String): Unit = {
      census.write.mode("overwrite").parquet(s"$path/census")
      ArtifactIO.writeMeta(census.sparkSession, path, "buckets",
        Seq("bucket" -> bucket, "fmt" -> "1"))
    }
  }

  /** Build a [[PreparedBuckets]] from a baseline corpus; its census
    * IS [[bucketCensus]] of the corpus (shared code, spec-pinned).
    */
  def prepareBuckets(corpus: DataFrame, bucket: String,
                     checkpointDir: Option[String] = None): PreparedBuckets = {
    val ckp = lineageBreaker(checkpointDir)
    PreparedBuckets(ckp(bucketCensus(corpus, bucket)), bucket,
      checkpointDir.isDefined)
  }

  /** Load a [[PreparedBuckets]] persisted by its `save`; fails fast
    * on a non-buckets path or a missing format marker.
    */
  def loadBuckets(spark: org.apache.spark.sql.SparkSession,
                  path: String): PreparedBuckets = {
    val m = ArtifactIO.readMeta(spark, path, "buckets")
    val fmt = m.getOrElse("fmt", "<missing>")
    require(fmt == "1",
      s"loadBuckets: artifact at $path has format '$fmt', expected '1'")
    PreparedBuckets(spark.read.parquet(s"$path/census"),
      ArtifactIO.field(m, path, "bucket"), reliable = true)
  }

  /** The estimate half: nearest-rank quantiles off the bucket census.
    * For each requested (name, q) the estimate is the MIDPOINT of the
    * first bucket whose cumulative count reaches ceil(q·n) — within
    * bucketWidth/2 of the exact nearest-rank quantile by
    * construction (spec-pinned bound). The per-group cumulative
    * window sorts only that group's occupied buckets (≤ range/width
    * rows — resolution-bounded, never corpus-bounded), and every
    * step (ceil on a double product, long compares, the midpoint
    * arithmetic) replays identically in the oracle.
    */
  def quantileFromRegisters(regs: DataFrame, group: Seq[String],
                            bucketWidth: Double,
                            quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "quantileFromRegisters: need at least one quantile")
    quantiles.foreach { case (n, q) =>
      require(q > 0.0 && q <= 1.0, s"quantileFromRegisters: $n=$q must be in (0, 1]") }
    val gcols = group.map(col)
    val cumW = Window.partitionBy(gcols: _*).orderBy(col("__qbkt"))
    val totW = Window.partitionBy(gcols: _*)
    val cum = regs
      .withColumn("__cum", sum(col("__qn")).over(cumW))
      .withColumn("__tot", sum(col("__qn")).over(totW))
    val aggs = quantiles.map { case (name, q) =>
      ((min(when(col("__cum") >= ceil(lit(q) * col("__tot")), col("__qbkt")))
        .cast("double") + lit(0.5)) * lit(bucketWidth)).as(name)
    }
    cum.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Integer PageRank over an edge list — the link-graph QUALITY
    * signal web-corpus curation pipelines compute for seed selection
    * and crawl prioritization (the public CCNet/RefinedWeb recipes
    * filter by domain-graph centrality), and the second graph
    * primitive beside the connected-components family. Edges are
    * DIRECTED as given (symmetrize at the call site for the
    * undirected co-occurrence form — that also eliminates dangling
    * nodes); multi-edges act as weights.
    *
    * ALL-INTEGER formulation, deliberately: ranks are longs summing
    * to ~`totalMass`, every transfer a floor `div` — bit-identical
    * on any engine and any partitioning (the engine's determinism
    * discipline; a floating PageRank would make the hash oracle
    * order-sensitive). Costs accepted and documented: floor leakage
    * (each transfer loses < 1 unit per participating edge — with
    * totalMass 10¹² and web-scale node counts, relative error
    * < 10⁻³ per iteration). Dangling nodes (no out-edges) DROP their
    * mass by default; `redistributeDangling = true` folds it back
    * uniformly each iteration — the standard web-graph treatment,
    * still exact-integer: the dangling total is one 1-row aggregate
    * per iteration shipped as a broadcast (the q48 scalar shape,
    * never a driver collect), each node gains `danglingMass div n`
    * inside the damped term, and total mass is conserved to floor
    * leakage (PageRankSpec pins the bound) instead of draining
    * through sinks.
    *
    * Scale shape per iteration: rank/outdeg is a node-keyed hash
    * join, contributions aggregate MAP-COMBINABLY by dst (a hub's
    * in-edges partial-sum in every mapper — a 10⁹-degree node is a
    * hot GROUP BY key, not a hot row), the damping arithmetic is
    * map-side, and the rank frame checkpoints (the q46 lineage
    * discipline). `iters` is a FIXED budget, not a fixpoint probe —
    * centrality RANKINGS stabilize in a few hops and a fixed budget
    * keeps cost predictable.
    * Returns (node, rank) for every edge endpoint.
    */
  /** Pairwise association rules over (basket, item) rows (r12 —
    * market-basket analytics, the Apriori pair stage): for every
    * ordered pair (antecedent → consequent) whose UNDIRECTED support
    * reaches `minSupport` baskets, the support count, the item
    * counts, exact-integer `confidence_millis = ⌊support·1000 /
    * n_antecedent⌋`, and `lift = (support·N)/(n_a·n_c)` as a FIXED
    * double expression over the exact counts rounded at 6 (the q100
    * discipline — a scale-safe alternative to the ×N integer form,
    * whose Long bound would break at ~3·10⁷ baskets). Input rows
    * should be DISTINCT (basket, item) pairs; both rule directions
    * emit.
    *
    * Scale shape: one per-basket self-join (pair explosion bounded by
    * basket size — never items × items), two map-combinable censuses,
    * the 1-row basket total broadcast keylessly (the q48 scalar
    * shape), and item counts joined onto the support-filtered pair
    * frame only.
    */
  def associationRules(baskets: DataFrame, basket: String, item: String,
                       minSupport: Long): DataFrame = {
    require(minSupport >= 1, "associationRules: minSupport must be >= 1")
    val e = baskets.select(col(basket).as("__ok"), col(item).as("__it"))
      .filter(col("__ok").isNotNull && col("__it").isNotNull)
    val nBaskets = e.select(countDistinct(col("__ok")).as("__nb"))
    val items = e.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))
    val pairs = e.as("x").join(e.as("y"),
        col("x.__ok") === col("y.__ok") && col("x.__it") < col("y.__it"))
      .groupBy(col("x.__it").as("__a"), col("y.__it").as("__b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val directed = pairs.select(col("__a").as("antecedent"), col("__b").as("consequent"), col("support"))
      .unionByName(pairs.select(col("__b").as("antecedent"), col("__a").as("consequent"), col("support")))
    val sD = col("support").cast("double"); val nbD = col("__nb").cast("double")
    val naD = col("__na").cast("double");   val ncD = col("__nc").cast("double")
    directed
      .join(items.select(col("__it").as("antecedent"), col("__ni").as("__na")), Seq("antecedent"))
      .join(items.select(col("__it").as("consequent"), col("__ni").as("__nc")), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .withColumn("n_antecedent", col("__na"))
      .withColumn("n_consequent", col("__nc"))
      .withColumn("n_baskets", col("__nb"))
      .withColumn("confidence_millis", expr("(support * 1000) div n_antecedent"))
      .withColumn("lift", round(sD * nbD / (naD * ncD), 6))
      .drop("__na", "__nc", "__nb")
  }

  /** R-round k-core peel over an undirected graph (r12 — the FOURTH
    * graph primitive: the dense-subgraph extractor behind community
    * cores and spam-ring detection). Each round recomputes degrees
    * over the SURVIVING edge set and drops nodes below `k`; after
    * `rounds` rounds the survivors with their final degrees return.
    * The round budget is the CONTRACT (the q101-BPE fixed-rounds
    * discipline — peeling converges geometrically in practice, and a
    * fixed budget keeps cost predictable and the result replayable);
    * once a round removes nothing, further rounds are no-ops, so a
    * converged result is stable under a larger budget. Input edges
    * canonicalize exactly as [[triangleCounts]] (dirty input safe).
    *
    * Scale shape per round: one map-combinable degree census + two
    * node-keyed semi joins; the edge frame checkpoints each round
    * (the q46 lineage discipline) so the plan stays flat.
    */
  def kCore(edges: DataFrame, src: String, dst: String, k: Int, rounds: Int,
            checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"kCore: k ($k) must be >= 1")
    require(rounds >= 1 && rounds <= 32, s"kCore: rounds ($rounds) must be in 1..32")
    val ckp = lineageBreaker(checkpointDir)
    var e = edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .distinct()
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      deg = e.select(col("u").as("n")).unionByName(e.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("degree"))
        .filter(col("degree") >= k)
      e = ckp(e
        .join(deg.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(deg.select(col("n").as("v")), Seq("v"), "left_semi"))
    }
    // final census over the final edge set, re-filtered at k (nodes
    // whose degree fell below k in the LAST cut drop here — the
    // "survivor census after R peel rounds" definition the oracle
    // replays)
    e.select(col("u").as("node")).unionByName(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k)
  }

  /** 2-D radius join by grid bucketing (r12 — the spatial sibling of
    * q39's 1-D tolerance join: "every (a, b) pair within Euclidean
    * distance r", the geofence/proximity primitive): cell side = r,
    * each left point owns its ONE cell, each right point explodes
    * into its 3×3 cell neighborhood, candidates equi-join on the
    * cell key (a plain hash join — never the O(n·m) cross join a
    * naive distance predicate degenerates to), then the EXACT
    * integer predicate `(ax−bx)² + (ay−by)² ≤ r²` refines. Any two
    * points within r sit within one cell step per axis (cell width
    * ≥ r under `div`, including the truncation-widened cell at 0),
    * so the 3×3 neighborhood is exhaustive — and each qualifying
    * pair matches in EXACTLY the left point's own cell, so no dedup
    * pass is needed (the q39/q102 discipline). Coordinates must be
    * exact longs with |coord| and r² far from Long overflow (ANSI
    * fails loudly past it). Scale shape: one 9× explode on ONE side,
    * one cell-keyed shuffle; a dense cell is a genuine hotspot —
    * AQE's skew-join split handles it, or the caller shrinks r.
    */
  def radiusJoin(a: DataFrame, b: DataFrame, ax: String, ay: String,
                 bx: String, by: String, radius: Long): DataFrame = {
    require(radius >= 1, s"radiusJoin: radius ($radius) must be >= 1")
    val ac = a.withColumn("__cx", expr(s"$ax div $radius"))
      .withColumn("__cy", expr(s"$ay div $radius"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val bc = b.withColumn("__o", explode(offsets))
      .withColumn("__cx", expr(s"$bx div $radius") + col("__o.dx"))
      .withColumn("__cy", expr(s"$by div $radius") + col("__o.dy"))
      .drop("__o")
    val d2 = (col(ax) - col(bx)) * (col(ax) - col(bx)) +
      (col(ay) - col(by)) * (col(ay) - col(by))
    ac.join(bc, Seq("__cx", "__cy"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= radius * radius)
      .drop("__cx", "__cy")
  }

  /** Blocked record-linkage scoring (r12 — the entity-resolution
    * primitive behind "are these two records the same customer":
    * CRM dedup, cross-source identity stitching, the
    * Fellegi–Sunter-shaped deterministic core). Candidates pair ONLY
    * within equal blocking keys (the standard sub-quadratic linkage
    * discipline — block selectivity is the caller's lever, exactly
    * as LSH band width is q33's); each candidate scores the exact
    * integer sum of per-field agreement weights (a field agrees when
    * both sides are non-null and EQUAL — the caller normalizes
    * upstream; two nulls never agree, absence is not evidence), and
    * pairs below `minScore` drop. Emits per-field `m_<field>` flags
    * beside the score so a reviewer sees WHY a pair matched.
    *
    * Scale shape: one hash join on the blocking key, score and flags
    * map-side, filter before anything materializes — cost is
    * true-candidate-bound; a hot block is a genuine data hotspot
    * (AQE skew split, or block finer).
    */
  def linkageScore(a: DataFrame, b: DataFrame, aId: String, bId: String,
                   block: Seq[(String, String)],
                   fields: Seq[(String, String, Long)],
                   minScore: Long): DataFrame = {
    require(aId != bId, "linkageScore: alias the two id columns distinctly")
    require(block.nonEmpty, "linkageScore: at least one blocking key pair")
    require(fields.nonEmpty && fields.forall(_._3 > 0),
      "linkageScore: field weights must be positive")
    val bCols = (bId +: (block.map(_._2) ++ fields.map(_._2))).distinct
    val rb = bCols.foldLeft(b.select(bCols.map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, "__r_" + c)
    }
    val aCols = (aId +: (block.map(_._1) ++ fields.map(_._1))).distinct
    val cond = block.map { case (x, y) => col(x) === col("__r_" + y) }
      .reduce(_ && _)
    val flagged = fields.foldLeft(a.select(aCols.map(col): _*).join(rb, cond)) {
      case (d, (x, y, _)) =>
        d.withColumn(s"m_$x", col(x).isNotNull && col(x) === col("__r_" + y))
    }
    val score = fields.map { case (x, _, w) =>
      when(col(s"m_$x"), lit(w)).otherwise(lit(0L))
    }.reduce(_ + _)
    flagged.withColumn("score", score)
      .filter(col("score") >= minScore)
      .select(col(aId) +: col("__r_" + bId).as(bId) +:
        fields.map { case (x, _, _) => col(s"m_$x") } :+ col("score"): _*)
  }

  /** Grid-bounded k-nearest-neighbors (r12 — the "closest k stores /
    * drivers / cell towers" readout on top of [[radiusJoin]]): for
    * every left point, the `k` nearest right points WITHIN `radius`,
    * ranked by exact integer squared distance with the right-id
    * tiebreak (deterministic on any engine). The radius bound is the
    * CONTRACT and the scale story: unbounded kNN cannot grid-bucket
    * (an isolated point would scan everything); bounding the search
    * makes candidates exactly [[radiusJoin]]'s output — one 9×
    * explode + one cell-keyed hash shuffle — and the rank window
    * partitions by the left id over candidate pairs only
    * (output-bound, the q07 top-k shape). A left point with no
    * neighbor in range emits nothing, observable, never a fabricated
    * farther match.
    */
  def nearestNeighbors(a: DataFrame, b: DataFrame, aId: String,
                       ax: String, ay: String, bId: String,
                       bx: String, by: String, radius: Long,
                       k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"nearestNeighbors: k ($k) must be in 1..1000")
    val cand = radiusJoin(a, b, ax, ay, bx, by, radius)
    val w = Window.partitionBy(col(aId)).orderBy(col("dist2"), col(bId))
    cand.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Multi-source BFS hop distances over an undirected graph (r12 —
    * the FIFTH graph primitive: the reachability/blast-radius query
    * behind "how far does an entity's influence spread" — fraud-ring
    * proximity, recall expansion from a seed set, impact analysis).
    * Every seed starts at distance 0; round `r` labels every
    * yet-unlabeled neighbor of the round-`(r-1)` frontier with
    * distance `r` — the minimum hop count from ANY seed, by
    * induction. The round budget is the CONTRACT (the [[kCore]]
    * fixed-rounds discipline): nodes farther than `rounds` hops stay
    * unlabeled, and once a frontier empties further rounds are
    * no-ops, so a converged result is stable under a larger budget.
    * Input edges canonicalize exactly as [[triangleCounts]] (dirty
    * input safe — duplicates, reversals and self-loops collapse);
    * seeds deduplicate and drop nulls, and seeds absent from the
    * edge set still label at distance 0 (they are trivially reached).
    *
    * Scale shape per round: the frontier joins the adjacency list on
    * the node key (hash join, frontier-sized probe — never
    * graph-sized), one distinct, one anti join against the labeled
    * set; frontiers and the distance frame checkpoint each round
    * (the q46 lineage discipline) so the plan stays flat. No step is
    * proportional to anything but the frontier boundary and its
    * neighborhood — exactly the property that makes frontier BFS the
    * standard at billion-edge scale.
    */
  def bfsDistances(edges: DataFrame, src: String, dst: String,
                   seeds: DataFrame, seedCol: String, rounds: Int,
                   checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 32,
      s"bfsDistances: rounds ($rounds) must be in 1..32")
    val ckp = lineageBreaker(checkpointDir)
    val und = edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .distinct()
    // adjacency in both directions: BFS walks edges undirected
    val adj = ckp(und.select(col("u").as("s"), col("v").as("d"))
      .unionByName(und.select(col("v").as("s"), col("u").as("d"))))
    var dist = ckp(seeds.select(col(seedCol).as("node"))
      .filter(col("node").isNotNull).distinct()
      .withColumn("dist", lit(0L)))
    var frontier = dist.select(col("node"))
    for (r <- 1 to rounds) {
      val next = ckp(adj.join(frontier.withColumnRenamed("node", "s"), Seq("s"))
        .select(col("d").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(r.toLong)))
      dist = ckp(dist.unionByName(next))
      frontier = next.select(col("node"))
    }
    dist
  }

  /** Multi-source WEIGHTED shortest-path distances — R rounds of
    * Bellman-Ford relaxation over an undirected graph (r12 — the
    * SIXTH graph primitive, the weighted sibling of [[bfsDistances]]:
    * cheapest-route cost behind logistics routing, social "degrees of
    * trust" with tie strengths, and weighted blast-radius). Seeds
    * start at distance 0; round `r` relaxes every edge out of the
    * nodes whose distance improved in round `r-1` (the frontier
    * optimization — relaxing only improved nodes is exact because a
    * value propagates at most one hop per round), so after round `r`
    * each labeled node carries EXACTLY min-total-weight over paths of
    * at most `r` edges — the classic Bellman-Ford ≤r-edge invariant,
    * which IS the contract: the fixed round budget (the [[kCore]]
    * discipline) makes the result well-defined and replayable at any
    * budget, an emptied frontier makes further rounds no-ops, and a
    * converged result is stable under a larger budget (spec-pinned).
    *
    * Dirty input canonicalizes like [[triangleCounts]] — duplicates,
    * reversals and self-loops collapse — with parallel edges keeping
    * their MINIMUM weight (the only weight a shortest path can use);
    * null or NEGATIVE weights drop (negative weights on an undirected
    * graph mean a negative cycle — shortest path is undefined).
    * Off-graph seeds still label at 0.
    *
    * Scale shape per round: ONE frontier-sized adjacency hash join,
    * one map-combinable min-census, one improvement anti/outer join
    * against the labeled set; frontiers and the distance frame
    * checkpoint each round (the q46 lineage discipline). Cost tracks
    * the improving boundary, never the graph.
    */
  def ssspDistances(edges: DataFrame, src: String, dst: String, weight: String,
                    seeds: DataFrame, seedCol: String, rounds: Int,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 32,
      s"ssspDistances: rounds ($rounds) must be in 1..32")
    val ckp = lineageBreaker(checkpointDir)
    val und = edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst) &&
        col(weight).isNotNull && col(weight) >= 0)
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"),
        col(weight).cast("long").as("w"))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
    val adj = ckp(und.select(col("u").as("s"), col("v").as("d"), col("w"))
      .unionByName(und.select(col("v").as("s"), col("u").as("d"), col("w"))))
    var dist = ckp(seeds.select(col(seedCol).as("node"))
      .filter(col("node").isNotNull).distinct()
      .withColumn("dist", lit(0L)))
    var frontier = dist
    for (_ <- 1 to rounds) {
      // best candidate per node out of the frontier, then keep only
      // genuine improvements (new node, or strictly shorter)
      val cand = adj
        .join(frontier.select(col("node").as("s"), col("dist").as("fd")), Seq("s"))
        .select(col("d").as("node"), (col("fd") + col("w")).as("cd"))
        .groupBy(col("node")).agg(min(col("cd")).as("cd"))
      val improved = ckp(cand
        .join(dist.select(col("node"), col("dist").as("od")), Seq("node"), "left_outer")
        .filter(col("od").isNull || col("cd") < col("od"))
        .select(col("node"), col("cd").as("dist")))
      dist = ckp(dist.join(improved.select(col("node")), Seq("node"), "left_anti")
        .unionByName(improved))
      frontier = improved
    }
    dist
  }

  /** Per-node triangle counts over an undirected graph (r12 — the
    * third graph primitive beside PageRank and the
    * connected-components family; triangle participation is the
    * clustering/cohesion signal behind community detection and spam
    * filtering). Input edges may be directed, duplicated or reversed
    * — they canonicalize to DISTINCT undirected pairs first
    * (self-loops dropped, null endpoints dropped).
    *
    * Algorithm: degree-oriented node-iterator ("node-iterator++").
    * Every edge orients from its lower (degree, id) endpoint to the
    * higher; each triangle then has exactly ONE node with two
    * out-edges, so counting wedge (x→y, x→z with (deg,id)(y) <
    * (deg,id)(z)) closed by oriented edge (y→z) counts every
    * triangle exactly once. The orientation is the scale story: out-
    * degrees are bounded by O(√m) on any graph, so the wedge join
    * generates Σ dₒᵤₜ² = O(m^1.5) candidates — a 10⁹-degree hub
    * generates ~√m wedges, not 10¹⁸ (the classic distributed
    * mitigation, and all three joins are plain hash joins on node
    * keys). Exact integers end-to-end.
    *
    * Returns (node, n_triangles) for every node in ≥1 triangle
    * (triangle-free nodes emit nothing — count against the node
    * frame if zeros are needed).
    */
  def triangleCounts(edges: DataFrame, src: String, dst: String): DataFrame = {
    val und = edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(least(col(src), col(dst)).as("u"), greatest(col(src), col(dst)).as("v"))
      .distinct()
    val deg = und.select(col("u").as("n")).unionByName(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val j = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val orient = j.select(
      when(fwd, col("u")).otherwise(col("v")).as("a"),
      when(fwd, col("v")).otherwise(col("u")).as("b"),
      when(fwd, col("dv")).otherwise(col("du")).as("db"))
    val wedges = orient.select(col("a"), col("b").as("y"), col("db").as("dy"))
      .join(orient.select(col("a"), col("b").as("z"), col("db").as("dz")), Seq("a"))
      .filter(col("dy") < col("dz") || (col("dy") === col("dz") && col("y") < col("z")))
    val tri = wedges
      .join(orient.select(col("a").as("y"), col("b").as("z")), Seq("y", "z"))
      .select(col("a").as("x"), col("y"), col("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** The hot-vertex set a [[saltedVertexJoin]] salts: vertices whose
    * degree in `vertex`'s column meets `minDegree` — the declared
    * bound that keeps the set broadcastable (|hot| ≤ |E|/minDegree
    * by counting). Feed the threshold from a
    * [[GraftDataFrameOps.skewStats]] read of the edge frame: the
    * share table says whether a key is hot enough to matter and the
    * count column calibrates `minDegree`.
    */
  def hotVertices(edges: DataFrame, vertex: String,
                  minDegree: Long): DataFrame = {
    require(minDegree >= 1L, s"hotVertices: minDegree ($minDegree) must be >= 1")
    edges.filter(col(vertex).isNotNull)
      .groupBy(col(vertex)).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= minDegree)
      .select(col(vertex))
  }

  /** Salted vertex-keyed join (r16 — VERDICT r15 next #6, the one
    * 100 TB hazard the BSP audit had left: every iteration of
    * PageRank/HITS/CC hash-partitions the edge frame by vertex id to
    * meet the per-vertex score/label frame, and on a power-law graph
    * ONE celebrity vertex's 10⁸ edges land on one reducer — the join
    * is correct and the cluster still stalls on a single task):
    * edges carrying a declared-hot key take a deterministic salt
    * `xxhash64(other endpoint) mod k` spreading them over k
    * partitions; the (small by construction — see [[hotVertices]])
    * per-vertex side replicates its hot rows k ways so every salted
    * edge still meets exactly ONE per-vertex row; cold keys keep
    * salt 0 and exactly one replica. The joined multiset is
    * therefore IDENTICAL to the unsalted join row-for-row — the
    * equivalence PropertySpec pins on a planted-skew graph — and
    * every downstream aggregate is unchanged by construction.
    *
    * Scale shape: one broadcast hot-set tag on each side + the same
    * keyed hash join on (key, salt) — the hot key's rows now spread
    * over k tasks instead of one; nothing new shuffles.
    */
  private[graft] def saltedVertexJoin(e: DataFrame, perVertex: DataFrame,
                                      key: String, saltSource: Column,
                                      hot: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 1024, s"saltedVertexJoin: k ($k) must be in [2, 1024]")
    val hotSet = broadcast(
      hot.select(col(key)).distinct().withColumn("__is_hot", lit(1)))
    val eS = e.join(hotSet, Seq(key), "left")
      .withColumn("__salt", when(col("__is_hot").isNotNull,
        pmod(xxhash64(saltSource), lit(k.toLong))).otherwise(lit(0L)))
      .drop("__is_hot")
    val pvS = perVertex.join(hotSet, Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__is_hot").isNotNull, sequence(lit(0L), lit(k.toLong - 1L)))
          .otherwise(sequence(lit(0L), lit(0L)))))
      .drop("__is_hot")
    eS.join(pvS, Seq(key, "__salt")).drop("__salt")
  }

  def pageRank(edges: DataFrame, src: String, dst: String, iters: Int = 3,
               dampingBp: Long = 8500L, totalMass: Long = 1000000000000L,
               redistributeDangling: Boolean = false,
               checkpointDir: Option[String] = None,
               saltHotDegree: Long = 0L, saltK: Int = 8): DataFrame = {
    require(iters >= 0 && iters <= 20, s"iters must be in [0, 20] (got $iters)")
    require(dampingBp >= 0L && dampingBp <= 10000L,
      s"dampingBp is basis points in [0, 10000] (got $dampingBp)")
    // totalMass * dampingBp must stay far from Long overflow (ANSI
    // mode would throw mid-job; this require makes it a setup error)
    require(totalMass > 0L && totalMass <= 1000000000000000L,
      s"totalMass must be in (0, 1e15] (got $totalMass)")
    val ck = lineageBreaker(checkpointDir)
    val e = ck(edges.select(
      col(src).cast("long").as("__src"), col(dst).cast("long").as("__dst")))
    val nodes = ck(e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct())
    val n = nodes.count()
    require(n > 0, "pageRank: empty edge list")
    val r0 = totalMass / n
    val base = (r0 * (10000L - dampingBp)) / 10000L
    // materialized ONCE (r17 optimization round, guide §2.4): every
    // iteration's contribution join consumes it, and the dangling
    // probe consumes it AGAIN per iteration — unmaterialized it
    // re-aggregated the edge frame 3–6× per run for a node-sized
    // result that never changes
    val outdeg = ck(e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("__od")))
    // hot-source set for the per-iteration edge ⨝ contributions join
    // (saltHotDegree = 0 → off): materialized ONCE so the broadcast
    // doesn't re-census the edges every iteration
    val hotSrc =
      if (saltHotDegree > 0L)
        Some(ck(hotVertices(e, "__src", saltHotDegree)))
      else None
    var ranks = ck(nodes.withColumn("rank", lit(r0)))
    for (i <- 1 to iters) {
      val give = ranks.join(outdeg, Seq("node"))
        .select(col("node").as("__src"), expr("rank div __od").as("__c"))
      val joined = hotSrc match {
        case Some(h) => saltedVertexJoin(e, give, "__src", col("__dst"), h, saltK)
        case None => e.join(give, Seq("__src"))
      }
      val recv = joined
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__c")).as("__in"))
      val damped =
        if (!redistributeDangling)
          expr(s"coalesce(__in, CAST(0 AS BIGINT)) * $dampingBp div 10000")
        else {
          // this round's dangling total as a broadcast 1-row frame;
          // every node gains its uniform share inside the damped term
          expr(s"(coalesce(__in, CAST(0 AS BIGINT)) + __dang div $n) * $dampingBp div 10000")
        }
      val received =
        if (!redistributeDangling) nodes.join(recv, Seq("node"), "left")
        else {
          val dangling = ranks.join(outdeg, Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
          nodes.join(recv, Seq("node"), "left").join(broadcast(dangling))
        }
      val next = received.select(col("node"), (lit(base) + damped).as("rank"))
      // every-2nd-iteration cadence (VERDICT r15 #5): the fixed
      // budget has no per-round probe, so a checkpoint per iteration
      // bought nothing but materialization wall; one un-broken
      // iteration keeps lineage at two joins. EXCEPT under dangling
      // redistribution (r17 optimization round): there the NEXT
      // iteration consumes `ranks` twice — the contribution join AND
      // the dangling 1-row probe — so an un-broken iteration's whole
      // edge join re-evaluates; a node-sized break per iteration is
      // cheaper than replaying an edge join (guide §1.2). Values
      // unchanged either way (a break is value-neutral).
      ranks = if (redistributeDangling || i % 2 == 0 || i == iters) ck(next) else next
    }
    ranks
  }

  /** Alternating large-star / small-star connected components
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the diameter-independent alternative to
    * [[connectedComponentsWithRounds]]. Each round rewires every
    * vertex's strictly-larger neighbors (large-star) then its
    * not-larger neighbors (small-star) onto the neighborhood minimum;
    * the edge set contracts to per-component stars rooted at the
    * component minimum in O(log² n) rounds REGARDLESS of topology, so
    * a pathological chain that costs the BSP loop diameter+1 rounds
    * costs this one ~log n. Per round: two grouped-min censuses and
    * two gram-keyed hash joins over the (shrinking) edge list — no
    * step ever materializes a neighborhood list, so one hub vertex
    * with 10⁹ neighbors is a big GROUP BY key, not a big row.
    * Convergence probe = one 4-field aggregate (count / endpoint sums
    * / xxhash64 sum) per round on the already-checkpointed frame, the
    * same collect-a-scalar discipline as the BSP loop. Output contract
    * is identical to the BSP variant: (vertex, component) for every
    * endpoint of the input, component = min vertex id, self-loop-only
    * vertices keep their own label.
    */
  private[graft] def connectedComponentsStarWithRounds(
      edges: DataFrame, src: String, dst: String,
      maxRounds: Int, checkpointDir: Option[String]): (DataFrame, Int) = {
    val ck = lineageBreaker(checkpointDir)
    withLongVertexIds(edges, src, dst, ck) { e0 =>
    val raw = e0.select(col("__src").as("__u"), col("__dst").as("__v"))
    val verts = ck(raw.select(col("__u").as("vertex"))
      .unionByName(raw.select(col("__v").as("vertex"))).distinct())
    // canonical undirected edge list, self-loops dropped (isolated
    // vertices rejoin from `verts` at the end)
    var e = ck(raw
      .select(greatest(col("__u"), col("__v")).as("__u"),
        least(col("__u"), col("__v")).as("__v"))
      .where(col("__u") =!= col("__v")).distinct())
    def sym(d: DataFrame): DataFrame =
      d.select(col("__u").as("a"), col("__v").as("b"))
        .unionByName(d.select(col("__v").as("a"), col("__u").as("b")))
    // order-independent, overflow-free fixpoint probe: count plus two
    // independent xxhash64 folds under bit_xor (ANSI-mode sum() on
    // uniform 64-bit hashes would overflow on the second row)
    def signature(d: DataFrame): (Long, Long, Long) = {
      val r = d.agg(count(lit(1)),
        bit_xor(xxhash64(col("__u"), col("__v"))),
        bit_xor(xxhash64(col("__v"), col("__u"), lit(7L)))).collect().head
      def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
      (g(0), g(1), g(2))
    }
    var prevSig: (Long, Long, Long) = null
    var prevE: DataFrame = null
    var round = 0
    var converged = signature(e)._1 == 0L // edgeless input
    while (!converged && round < maxRounds) {
      round += 1
      // large-star: every b ∈ Γ(a) with b > a rewires to
      // m(a) = min(Γ(a) ∪ {a}); emitted pairs always have b > m.
      val nl = sym(e)
      val minsL = nl.groupBy(col("a"))
        .agg(least(min(col("b")), first(col("a"))).as("m"))
      e = ck(nl.join(minsL, "a").where(col("b") > col("a"))
        .select(col("b").as("__u"), col("m").as("__v"))
        .where(col("__u") =!= col("__v")).distinct())
      // small-star: every b ∈ Γ(a) with b < a, plus a itself, rewires
      // to m(a) = min of that not-larger neighborhood.
      val ns = sym(e)
      val small = ns.where(col("b") < col("a"))
      val minsS = small.groupBy(col("a")).agg(min(col("b")).as("m"))
      e = ck(small.join(minsS, "a")
        .select(col("b").as("__x"), col("m"))
        .unionByName(minsS.select(col("a").as("__x"), col("m")))
        .where(col("__x") =!= col("m"))
        .select(greatest(col("__x"), col("m")).as("__u"),
          least(col("__x"), col("m")).as("__v"))
        .distinct())
      // fast probabilistic probe first; on a signature match, CONFIRM
      // exactly before stopping (ADVICE r7): both frames are distinct
      // sets with equal counts (count is part of the signature), so
      // one empty except proves set equality. The exact job runs only
      // at the convergence round (or on a ~2^-128 collision, where it
      // correctly keeps the loop going).
      val sig = signature(e)
      converged = sig == prevSig && e.except(prevE).isEmpty
      prevSig = sig
      prevE = e
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge within $maxRounds rounds " +
        s"(needs O(log² n); raise maxRounds)")
    // stars: __u points at its component root __v; roots and isolated
    // vertices label themselves.
    val pointed = e.select(col("__u").as("vertex"), col("__v").as("component"))
    val selfLabeled = verts.join(pointed, Seq("vertex"), "left_anti")
      .select(col("vertex"), col("vertex").as("component"))
    (pointed.unionByName(selfLabeled), round)
    }
  }

  implicit final class GraftDataFrameOps(private val left: DataFrame) extends AnyVal {

    /** Connected components of this edge-list frame — see
      * [[Ops.connectedComponentsWithRounds]] for the algorithm and
      * the scale notes. Returns (vertex, component).
      */
    def connectedComponents(src: String, dst: String, maxRounds: Int = 50,
                            checkpointDir: Option[String] = None,
                            saltHotDegree: Long = 0L,
                            saltK: Int = 8): DataFrame =
      connectedComponentsWithRounds(left, src, dst, maxRounds, checkpointDir,
        saltHotDegree, saltK)._1

    /** Diameter-independent connected components — the large-star /
      * small-star contraction of [[Ops.connectedComponentsStarWithRounds]].
      * Same (vertex, component) contract as [[connectedComponents]];
      * O(log² n) rounds on ANY topology, so prefer it when components
      * may be deep (long chains, web graphs); the BSP variant's
      * diameter+1 rounds win on the shallow clusters near-dup dedup
      * actually produces.
      */
    def connectedComponentsStar(src: String, dst: String, maxRounds: Int = 50,
                                checkpointDir: Option[String] = None): DataFrame =
      connectedComponentsStarWithRounds(left, src, dst, maxRounds, checkpointDir)._1

    /** PII redaction — the scrub pass a training-data pipeline runs
      * before anything else sees the text: each (regex, token) rule
      * rewrites every match of `textCol`, applied in rule order. A
      * chain of codegen'd regexp_replace expressions: pure map-side
      * work, no shuffle, streams at any corpus size.
      */
    def redact(textCol: String, rules: Seq[(String, String)] = piiRules): DataFrame =
      left.withColumn(textCol,
        rules.foldLeft(col(textCol)) { case (c, (re, token)) =>
          regexp_replace(c, re, token)
        })

    /** Markup strip — crawled corpora arrive as HTML; this is the
      * "to plain text" pass that feeds quality scoring, dedup and
      * curation. See [[graft.functions.TextFunctions.stripMarkup]]
      * for the exact (oracle-replayable) semantics. Stateless column
      * work, applies to streams unchanged.
      */
    def stripMarkup(textCol: String): DataFrame =
      left.withColumn(textCol,
        graft.functions.TextFunctions.stripMarkup(col(textCol)))

    /** Unicode normalization (the generalized q75) — canonicalize a
      * text column in place via the native
      * [[graft.functions.UnicodeNormalize]] codegen expression, so
      * composed (U+00E9) and decomposed (e+U+0301) spellings of the
      * same text hash identically in every downstream dedup stage
      * (q29/q31/q32/q33). Run it BEFORE fingerprinting — two crawls
      * of one page routinely differ only in normalization form.
      * Stateless map-side column work: zero shuffle, streams
      * unchanged; pure-ASCII rows take an allocation-free fast path.
      * `form` ∈ NFC (default), NFD, NFKC, NFKD.
      */
    def normalizeUnicode(textCol: String, form: String = "NFC"): DataFrame = {
      graft.functions.GraftFunctions.register(left.sparkSession)
      left.withColumn(textCol,
        call_function("unicode_normalize", col(textCol), lit(form)))
    }

    /** As-of join (pandas `merge_asof` parity): for each left row,
      * the NEAREST right row at-or-before (`direction = "backward"`,
      * the default) or at-or-after (`"forward"`) its time with a
      * matching key, optionally within `toleranceUs` microseconds —
      * matches farther than the tolerance resolve to null carries
      * (the row itself is kept, merge_asof semantics). One shuffle on
      * the key either way: tag + union + running
      * last_value(ignoreNulls) window (the forward direction just
      * reverses the window ordering — same single exchange); the
      * tolerance check rides on the matched right time carried
      * through the same window, so it adds NO join or shuffle.
      * `carry` lists the right-side columns to carry onto left rows;
      * time columns must be timestamps when a tolerance is given.
      */
    def asofJoin(right: DataFrame, key: String, leftTime: String,
                 rightTime: String, carry: Seq[String],
                 direction: String = "backward",
                 toleranceUs: Option[Long] = None): DataFrame = {
      require(direction == "backward" || direction == "forward",
        s"""asofJoin: direction must be "backward" or "forward" (got "$direction")""")
      require(toleranceUs.forall(_ >= 0),
        "asofJoin: toleranceUs must be non-negative (0 = equal-time matches only)")
      require(!carry.contains("__rmt"),
        "asofJoin: \"__rmt\" is reserved for the matched right time")
      require(!carry.contains("__rrow") && !left.columns.contains("__rrow"),
        "asofJoin: \"__rrow\" is reserved for the matched-row struct")
      val lCols = left.columns.toSeq
      import org.apache.spark.sql.types.{StructField, StructType}
      // the matched right ROW travels as ONE struct, filled by ONE
      // last(ignoreNulls) — per-carry-column fills would skip a
      // GENUINE null in one carry and pull that column's value from a
      // farther row (r10 review: right (t=5, v="a"), (t=10, v=null),
      // left t=12 must carry t=10's null, not t=5's "a"); the struct
      // stays non-null when its fields are null, so the nearest row
      // wins as a unit and the tolerance below judges exactly the row
      // the values came from
      val rowType = StructType(
        StructField("__rmt", right.schema(rightTime).dataType) +:
          carry.map(c => StructField(c, right.schema(c).dataType)))
      val rRow = struct((col(rightTime).as("__rmt") +:
        carry.map(c => col(c).as(c))): _*)
      val tagged = right
        .select((col(key).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__tag") +:
          rRow.as("__rrow") +:
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
        .unionByName(left
          .select((col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__tag") +:
            lit(null).cast(rowType).as("__rrow") +:
            lCols.map(col)): _*))
      // backward: ascending scan — the last right row seen is the
      // nearest at-or-before. forward: descending scan — the last
      // right row seen is the nearest at-or-after. Ties on __t order
      // right (tag 0) before left in BOTH, so equal times match.
      val ord =
        if (direction == "backward") Seq(col("__t").asc, col("__tag").asc)
        else Seq(col("__t").desc, col("__tag").asc)
      val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val filled = tagged
        .withColumn("__rrow", last(col("__rrow"), ignoreNulls = true).over(w))
      // getField, not a dotted path string: a carry column named
      // "bid.price" is legal (backticks) and must read as ONE field
      val rmt = col("__rrow").getField("__rmt")
      val withinTol = toleranceUs match {
        case None => col("__rrow").isNotNull
        case Some(t) =>
          val gap =
            if (direction == "backward") unix_micros(col("__t")) - unix_micros(rmt)
            else unix_micros(rmt) - unix_micros(col("__t"))
          col("__rrow").isNotNull && gap <= t
      }
      filled
        .filter(col("__tag") === 1)
        .select((lCols.map(col) ++ carry.map(c =>
          when(withinTol, col("__rrow").getField(c))
            .otherwise(lit(null).cast(right.schema(c).dataType)).as(c))): _*)
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

    /** Ordered-sequence funnel (q97/q105): how many keys progress
      * through `steps` IN ORDER — the conversion primitive (signup →
      * view → click → purchase) the windowed/sessionized family
      * doesn't express. Returns one row per step, ALWAYS — a step no
      * key reaches still yields (step, event_type, 0).
      *
      * Unbounded (`withinUs = None`): reachability is computed
      * greedily on EARLIEST completion: t₁ = the key's first step-1
      * event, tᵢ = its first step-i event strictly after tᵢ₋₁ —
      * greedy-earliest is optimal for unconstrained ordering (picking
      * any later tᵢ can only shrink what remains for step i+1), so
      * "reaches step i" is exact, not a heuristic. Shape: one
      * filtered min-agg per step joined key-wise onto the previous
      * step's frame — |steps| bounded (≤ 8 enforced), each join
      * key-partitioned, no window over raw events, no per-key event
      * lists.
      *
      * Bounded (`withinUs = Some(T)`): the product-analytics form —
      * every step must land within T microseconds of the step-1
      * ANCHOR. The earliest step-1 event is no longer a safe anchor
      * (a later anchor starts a later deadline that may convert where
      * the earliest fails), so EVERY step-1 event anchors a candidate
      * chain: a key reaches step i iff SOME anchor's greedy chain
      * does (greedy stays optimal once the anchor — hence the
      * deadline — is fixed). Frames are (key, anchor)-grained, so the
      * per-key cost scales with its step-1 event count — the exact-
      * semantics price; joins stay key-partitioned.
      */
    private def funnelRequires(steps: Seq[String], withinUs: Option[Long]): Unit = {
      require(steps.nonEmpty && steps.size <= 8,
        s"funnel needs 1..8 steps (got ${steps.size})")
      require(steps.distinct.size == steps.size,
        "funnel steps must be distinct event types (a repeated type is " +
          "ambiguous under earliest-completion semantics)")
      require(withinUs.forall(_ > 0), "funnel: withinUs must be positive")
    }

    /** The per-key frames reaching each funnel step — the shared core
      * of [[funnel]] (which counts them) and [[funnelCompleters]]
      * (which returns the last one).
      */
    private def funnelReached(key: String, time: String, typeCol: String,
                              steps: Seq[String],
                              withinUs: Option[Long]): Seq[DataFrame] =
      withinUs match {
        case None =>
          val first = left.filter(col(typeCol) === steps.head)
            .groupBy(col(key)).agg(min(col(time)).as("__t"))
          steps.tail.scanLeft(first) { (prev, st) =>
            left.filter(col(typeCol) === st)
              .join(prev.select(col(key), col("__t").as("__pt")), Seq(key))
              .filter(col(time) > col("__pt"))
              .groupBy(col(key)).agg(min(col(time)).as("__t"))
          }.map(_.select(col(key)))
        case Some(t) =>
          val anchors = left.filter(col(typeCol) === steps.head)
            .select(col(key), col(time).as("__t1")).distinct()
            .withColumn("__t", col("__t1"))
          steps.tail.scanLeft(anchors) { (prev, st) =>
            left.filter(col(typeCol) === st)
              .join(prev.select(col(key), col("__t1"), col("__t").as("__pt")), Seq(key))
              .filter(col(time) > col("__pt") &&
                unix_micros(col(time)) <= unix_micros(col("__t1")) + t)
              .groupBy(col(key), col("__t1")).agg(min(col(time)).as("__t"))
          }.map(_.select(col(key)).distinct())
      }

    def funnel(key: String, time: String, typeCol: String,
               steps: Seq[String], withinUs: Option[Long] = None): DataFrame = {
      funnelRequires(steps, withinUs)
      val reached = funnelReached(key, time, typeCol, steps, withinUs)
      val counts = reached.zip(steps).zipWithIndex
        .map { case ((df, st), i) =>
          df.select(lit((i + 1).toLong).as("step"), lit(st).as("event_type"), col(key))
        }
        .reduce(_ unionByName _)
        .groupBy(col("step"), col("event_type"))
        .agg(count(lit(1)).as("n_users"))
      // one row per step even when empty (a 1-row-derived literal
      // frame, so the join is trivially broadcast)
      val stepsDf = left.sparkSession.range(1)
        .select(explode(array(steps.zipWithIndex.map { case (st, i) =>
          struct(lit((i + 1).toLong).as("step"), lit(st).as("event_type"))
        }: _*)).as("__s"))
        .select(col("__s.step").as("step"), col("__s.event_type").as("event_type"))
      stepsDf.join(counts, Seq("step", "event_type"), "left")
        .select(col("step"), col("event_type"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
    }

    /** The keys that complete the WHOLE funnel (r13 — [[funnel]]'s
      * per-key view: the counts say how many reach each step, THIS
      * says who finished, ready to join as a conversion flag — the
      * funnel-completion A/B readout q175 composes with
      * [[abTest]]). Same earliest-completion / optional-deadline
      * semantics; returns one column (`key`), distinct.
      */
    def funnelCompleters(key: String, time: String, typeCol: String,
                         steps: Seq[String],
                         withinUs: Option[Long] = None): DataFrame = {
      funnelRequires(steps, withinUs)
      funnelReached(key, time, typeCol, steps, withinUs).last.distinct()
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

    /** Regular-grid resample with forward fill (q93): align an
      * irregular event series onto fixed `stepUs`-wide event-time
      * buckets per key — every bucket from the key's first to its
      * last observation exists in the output, empty buckets carry
      * the last observed value forward (LOCF) and are flagged. The
      * alignment primitive between q23 (buckets that EXIST get a
      * row) and q21 (as-of against another table): feature
      * pipelines, rate normalization, and gap detection all need
      * the missing buckets materialized.
      *
      * Scale shape: one map-combinable (key, bucket) aggregation,
      * then key-partitioned windows — gap buckets are synthesized
      * from each observation's lag-gap via `sequence()` (never a
      * per-key bounds join, never a global calendar cross join), so
      * the only data-sized shuffles are the agg and the per-key
      * window sort, and a key's cost is its own span/step. Sums go
      * through the exact decimal view ([[graft.util.Portable]]).
      * Returns (key, bucket_start, n_events, total_value — null on
      * gaps, filled_value — LOCF, is_gap).
      */
    /** Exact trailing EWMA (r12 — time-series smoothing under the
      * engine's integer-exactness discipline): per key, the
      * α = 1/2 exponentially-weighted mean TRUNCATED at `lags` terms,
      * computed entirely in BIGINT so it replays bit-for-bit in any
      * engine. Value enters as exact cents (the [[graft.util.Portable]]
      * DECIMAL(18,2) view × 100); term ℓ weighs 2^(lags−1−ℓ), so
      * `ewma_num = Σ cents_{t−ℓ}·2^(lags−1−ℓ)` and `ewma_denom` sums
      * the weights actually present (partial windows at a key's head
      * normalize correctly). `ewma_millicents = num·1000 div denom` —
      * integer division, portable for the non-negative values this
      * engine's money columns hold; num/denom are the exact rational
      * either way. Power-of-two weights are WHY α = 1/2: every weight
      * is an exact Long, no float ever enters.
      *
      * Scale shape: ONE key-partitioned window sort (the q98 shape);
      * the `lags` lag() calls share that single sort — cost is the
      * shuffle plus O(lags) per row, state bounded by the frame.
      * Ordering must be total: `tieBreak` (a unique id) breaks
      * equal-timestamp ties deterministically. Null values DROP up
      * front (stated semantics, replayed by the q117 oracle): a null
      * is not an observation and does not occupy a lag slot — and a
      * key whose first `lags` rows were all null would otherwise
      * reach `num div denom` with denom = 0 under ANSI.
      */
    def ewmaTrailing(key: String, time: String, tieBreak: String,
                     value: Column, lags: Int = 16): DataFrame = {
      require(lags >= 1 && lags <= 32, s"ewmaTrailing: lags ($lags) must be in 1..32")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(key)).orderBy(col("__ew_us"), col(tieBreak))
      def cAt(l: Int): Column =
        if (l == 0) col("__ew_c") else lag(col("__ew_c"), l).over(w)
      val num = (0 until lags).map(l =>
        coalesce(cAt(l), lit(0L)) * lit(1L << (lags - 1 - l))).reduce(_ + _)
      val den = (0 until lags).map(l =>
        when(cAt(l).isNotNull, lit(1L << (lags - 1 - l))).otherwise(lit(0L))).reduce(_ + _)
      left
        // null values drop up front (the twapPerKey discipline): a
        // key whose first `lags` rows were all null would otherwise
        // reach `num div denom` with denom = 0 and crash the whole
        // query under ANSI mode on one bad input row
        .filter(value.isNotNull)
        .withColumn("__ew_us", unix_micros(col(time)))
        .withColumn("__ew_c", (graft.util.Portable.dec(value) * 100).cast("long"))
        .withColumn("ewma_num", num)
        .withColumn("ewma_denom", den)
        .withColumn("ewma_millicents", expr("(ewma_num * 1000) div ewma_denom"))
        .drop("__ew_us", "__ew_c")
    }

    /** Brown's double exponential smoothing — exact trailing level +
      * trend (r13 — [[ewmaTrailing]] finished into a FORECASTER: a
      * single EWMA lags behind a trending series by construction;
      * smoothing the smoother measures that lag, and
      * `level = 2s₁ − s₂`, `trend = s₁ − s₂` (the α = 1/2 Brown
      * identities) remove it — the one-step-ahead forecast
      * `level + h·trend` is the classic short-horizon baseline):
      * BOTH smoothing passes run the [[ewmaTrailing]] power-of-two
      * Long-weight machinery — pass 1 over exact cents, pass 2 over
      * pass 1's exact floor-divided millicents — so every output is
      * an exact integer, bit-replayable anywhere. Null values drop
      * up front (the ewmaTrailing rule). Adds
      * (s1_millicents, s2_millicents, level_millicents,
      * trend_millicents, forecast_millicents = level + h·trend).
      *
      * Scale shape: ONE key-partitioned window sort shared by BOTH
      * lag chains (pass 2 lags a column pass 1 defined over the SAME
      * window — Spark collapses them into one Window operator); cost
      * is the q98/q117 single-sort shape plus O(lags) per row.
      */
    def holtTrailing(key: String, time: String, tieBreak: String,
                     value: Column, lags: Int = 8,
                     horizon: Int = 1): DataFrame = {
      require(lags >= 1 && lags <= 32, s"holtTrailing: lags ($lags) must be in 1..32")
      require(horizon >= 0 && horizon <= 1000,
        s"holtTrailing: horizon ($horizon) must be in 0..1000")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(key)).orderBy(col("__hw_us"), col(tieBreak))
      def smooth(src: String, numOut: String, denOut: String): (Column, Column) = {
        def cAt(l: Int): Column =
          if (l == 0) col(src) else lag(col(src), l).over(w)
        val num = (0 until lags).map(l =>
          coalesce(cAt(l), lit(0L)) * lit(1L << (lags - 1 - l))).reduce(_ + _)
        val den = (0 until lags).map(l =>
          when(cAt(l).isNotNull, lit(1L << (lags - 1 - l))).otherwise(lit(0L))).reduce(_ + _)
        (num.as(numOut), den.as(denOut))
      }
      val (n1, d1) = smooth("__hw_c", "__n1", "__d1")
      val base = left
        .filter(value.isNotNull)
        .withColumn("__hw_us", unix_micros(col(time).cast("timestamp")))
        .withColumn("__hw_c", (graft.util.Portable.dec(value) * 100).cast("long"))
        .select(col("*"), n1, d1)
        .withColumn("s1_millicents", expr("(__n1 * 1000) div __d1"))
      val (n2, d2) = smooth("s1_millicents", "__n2", "__d2")
      base
        .select(col("*"), n2, d2)
        // pass 2 averages MILLIcents, so its num is milli·milli —
        // divide the weight sum only (values already milli)
        .withColumn("s2_millicents", expr("__n2 div __d2"))
        .withColumn("level_millicents",
          col("s1_millicents") * 2 - col("s2_millicents"))
        .withColumn("trend_millicents",
          col("s1_millicents") - col("s2_millicents"))
        .withColumn("forecast_millicents",
          col("level_millicents") + lit(horizon.toLong) * col("trend_millicents"))
        .drop("__hw_us", "__hw_c", "__n1", "__d1", "__n2", "__d2")
    }

    /** Ordered per-key event paths + pattern gate (r12 — journey
      * analytics, the MATCH_RECOGNIZE-lite the funnel family doesn't
      * cover): each key's events collapse to ONE `>`-joined string in
      * strict (time, tieBreak) order, and `pattern` (a regex over the
      * path string — keep to the RE2-safe subset so any engine
      * replays it) gates a `matched` flag. Arbitrary sequence
      * questions — "error immediately after purchase", "three views
      * before any click" — become one regex instead of a bespoke
      * join chain.
      *
      * Determinism: the path is built by the array_sort(struct(us,
      * tieBreak, type)) trick (the kmeans re-assembly idiom), so
      * collect order can never leak in. Scale shape: ONE
      * map-combinable groupBy per key; per-key state is that key's
      * own event list (the per-user-session bound every sessionizer
      * already accepts — paths are capped by upstream sessionization
      * at real scale).
      */
    def eventPaths(key: String, time: String, tieBreak: String,
                   typeCol: String, pattern: String): DataFrame = {
      val sorted = array_sort(collect_list(struct(
        unix_micros(col(time)).as("us"),
        col(tieBreak).as("tb"), col(typeCol).as("et"))))
      left.groupBy(col(key))
        .agg(count(lit(1)).as("n_events"),
          concat_ws(">", transform(sorted, x => x("et"))).as("path"))
        .withColumn("matched", col("path").rlike(pattern))
    }

    /** Scalable exact total-order rank (r12 — the global `row_number`
      * WITHOUT the single-reducer window Spark's unpartitioned
      * Window forces, which the engine's plan discipline forbids):
      * range-repartition on the order columns (ordered ranges land on
      * ascending partition ids), rank WITHIN each partition, then add
      * per-partition offsets computed on a ≤-partitions-sized frame
      * (whose own tiny window is bounded by the partition count, not
      * the data). The order columns MUST form a total order
      * (append a unique tiebreak) — then the rank is deterministic
      * regardless of where the sampled range boundaries fall.
      * The ranked frame MATERIALIZES (checkpoint) before the offsets
      * derive from it: range boundaries come from SAMPLING, so the
      * offsets branch re-evaluating the exchange could see DIFFERENT
      * boundaries than the rows it offsets — the classic
      * nondeterministic-lineage self-join trap; freezing the frame
      * makes both branches read the same pid assignment (and is the
      * honest price of an exact global rank). Adds `<out>`; one
      * range shuffle + one pid-keyed window + a broadcast-sized
      * offsets join.
      */
    def globalRank(order: Seq[Column], out: String = "rank",
                   checkpointDir: Option[String] = None): DataFrame = {
      require(order.nonEmpty, "globalRank: order columns required")
      val parts = left.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val ranged = left.repartitionByRange(parts, order: _*)
        .withColumn("__gr_pid", spark_partition_id())
      val ranked = lineageBreaker(checkpointDir)(
        ranged.withColumn("__gr_r",
          row_number().over(Window.partitionBy(col("__gr_pid")).orderBy(order: _*)).cast("long")))
      val wo = Window.orderBy(col("__gr_pid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = ranked.groupBy(col("__gr_pid")).agg(count(lit(1)).as("__gr_n"))
        .withColumn("__gr_off", sum(col("__gr_n")).over(wo) - col("__gr_n"))
        .select(col("__gr_pid"), col("__gr_off"))
      ranked.join(broadcast(offsets), Seq("__gr_pid"))
        .withColumn(out, col("__gr_off") + col("__gr_r"))
        .drop("__gr_pid", "__gr_r", "__gr_off")
    }

    /** RFM customer scoring (r12 — the classic segmentation pass):
      * per key, Recency (latest transaction instant), Frequency
      * (transaction count) and Monetary (exact cents total), each
      * converted to a 1..`tiles` score by EXACT global rank (best =
      * tile 1): `tile = ⌊(rank−1)·tiles / n⌋ + 1` over the rank of
      * (metric best-first, key) — a total order, so scores are
      * deterministic on any engine and partitioning. The three ranks
      * run through [[globalRank]] (no single-reducer window); the
      * key-count scalar joins keylessly as ONE broadcast row (the
      * q48 shape). Returns one row per key: metrics, r/f/m scores
      * and the concatenated `segment`.
      */
    def rfmScores(key: String, time: String, value: Column,
                  tiles: Int = 5): DataFrame = {
      require(tiles >= 2 && tiles <= 100, s"rfmScores: tiles ($tiles) must be in 2..100")
      val m = left
        .filter(value.isNotNull)
        .groupBy(col(key))
        // the cast tolerates TIMESTAMP_NTZ sources (instant-preserving
        // under the engine's pinned-UTC session; a no-op on TIMESTAMP)
        .agg(max(unix_micros(col(time).cast("timestamp"))).as("last_us"),
          count(lit(1)).as("frequency"),
          sum((graft.util.Portable.dec(value) * 100).cast("long")).as("monetary_cents"))
      val n1 = m.select(count(lit(1)).as("__n"))
      val ranked = m
        .globalRank(Seq(col("last_us").desc, col(key)), out = "__rr")
        .globalRank(Seq(col("frequency").desc, col(key)), out = "__fr")
        .globalRank(Seq(col("monetary_cents").desc, col(key)), out = "__mr")
        .crossJoin(broadcast(n1))
      ranked
        .withColumn("r_score", expr("((__rr - 1) * " + tiles + ") div __n") + 1L)
        .withColumn("f_score", expr("((__fr - 1) * " + tiles + ") div __n") + 1L)
        .withColumn("m_score", expr("((__mr - 1) * " + tiles + ") div __n") + 1L)
        .withColumn("segment", concat(col("r_score").cast("string"),
          col("f_score").cast("string"), col("m_score").cast("string")))
        .drop("__rr", "__fr", "__mr", "__n")
    }

    /** Declarative data-quality gate ([[graft.data.Quality]], r12):
      * evaluate uniqueness / referential-integrity / null / range
      * constraints as exact counts — one aggregate pass for every
      * scalar and uniqueness check plus one anti join per foreign
      * key. The validation a pipeline runs before spending a
      * cluster-day on a corrupt extract.
      */
    def checkConstraints(constraints: Seq[graft.data.Quality.Constraint]): DataFrame =
      graft.data.Quality.checkConstraints(left, constraints)

    /** Exact per-group winsorization (r12 — the outlier-clipping
      * pass features get before training; `quantileBuckets`' sibling
      * with EXACT order statistics, no sketch): clip `value` to the
      * [k-th smallest, k-th largest] within each group, where
      * k = max(1, ⌈p·n⌉) over the group's n non-null values — a
      * rank-based definition, so the bounds are actual data values
      * and deterministic on any engine (the k-th smallest VALUE is
      * well-defined regardless of how ties order; the ⌈p·n⌉ arithmetic
      * is IEEE double, identical everywhere). Null values rank
      * nowhere and clip to null (null ordering differs across
      * engines — excluding them is what keeps the ranks portable).
      * Adds `<out>`; all input rows pass through.
      *
      * Scale shape: one group-window sort over the non-null values +
      * a groups-sized bounds frame joined back (broadcast-friendly) —
      * the q07/q98 single-exchange discipline.
      */
    def winsorize(group: String, value: Column, p: Double,
                  out: String = "w", allowCoarseGroups: Boolean = false,
                  maxExactGroupRows: Long = MaxExactGroupRows): DataFrame = {
      require(p > 0.0 && p < 0.5, s"winsorize: p ($p) must be in (0, 0.5)")
      val wv = Window.partitionBy(col(group)).orderBy(value)
      val wp = Window.partitionBy(col(group))
      val ranked = left.filter(value.isNotNull)
        .withColumn("__rn", row_number().over(wv))
        .withColumn("__n", count(lit(1)).over(wp))
        // the coarse-group gate rides __lowK (a column every rank
        // selection consumes — prune-proof): see MaxExactGroupRows
        .withColumn("__lowK", gateCoarseGroups(
          greatest(ceil(lit(p) * col("__n")), lit(1L)), col("__n"),
          "winsorize", allowCoarseGroups, maxExactGroupRows))
      val bounds = ranked
        .filter(col("__rn") === col("__lowK") ||
          col("__rn") === col("__n") + 1 - col("__lowK"))
        .groupBy(col(group))
        .agg(min(when(col("__rn") === col("__lowK"), value)).as("__lo"),
          min(when(col("__rn") === col("__n") + 1 - col("__lowK"), value)).as("__hi"))
      left.join(bounds.withColumnRenamed(group, "__g"), col(group) <=> col("__g"), "left")
        .withColumn(out,
          when(value.isNotNull, least(greatest(value, col("__lo")), col("__hi"))))
        .drop("__g", "__lo", "__hi")
    }

    /** Last-touch conversion attribution (r12 — the marketing
      * analytics readout behind every channel-ROI dashboard): each
      * conversion event credits the LATEST preceding touch event of
      * the key within `windowUs`; conversions with no in-window touch
      * carry a null channel (the caller's "direct" bucket —
      * observable, never a fabricated credit). Strict per-key
      * (time, tieBreak) order; a conversion at the exact same
      * timestamp as a touch credits it only if the touch sorts
      * earlier by the tiebreak (the order IS the contract). Returns
      * the conversion rows with (channel, touch_us, touch_gap_us)
      * appended — exact integer µs end-to-end, bit-replayable.
      * Scale shape: ONE key-partitioned window sort computes the
      * running last-touch carry (two ignore-null last_value columns
      * over the same frame — no self-join, no as-of join against a
      * touch table); cost tracks the sort, the q98/q117 shape.
      */
    def lastTouchAttribution(key: String, time: String, tieBreak: String,
                             typeCol: String, convType: String,
                             touchTypes: Seq[String],
                             windowUs: Long): DataFrame = {
      require(touchTypes.nonEmpty, "lastTouchAttribution: touchTypes must be non-empty")
      require(!touchTypes.contains(convType),
        s"lastTouchAttribution: convType '$convType' cannot also be a touch type")
      require(windowUs > 0, s"lastTouchAttribution: windowUs ($windowUs) must be positive")
      val w = Window.partitionBy(col(key))
        .orderBy(col("__at_us"), col(tieBreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val isTouch = col(typeCol).isin(touchTypes: _*)
      left
        .withColumn("__at_us", unix_micros(col(time)))
        .withColumn("__lt_us", last(when(isTouch, col("__at_us")), ignoreNulls = true).over(w))
        .withColumn("__lt_t", last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
        .filter(col(typeCol) === convType)
        .withColumn("channel",
          when(col("__lt_us").isNotNull && col("__lt_us") >= col("__at_us") - windowUs,
            col("__lt_t")))
        .withColumn("touch_us", when(col("channel").isNotNull, col("__lt_us")))
        .withColumn("touch_gap_us",
          when(col("channel").isNotNull, col("__at_us") - col("__lt_us")))
        .drop("__at_us", "__lt_us", "__lt_t")
    }

    /** Conversion-latency distribution per channel (r12 — the
      * companion readout to [[lastTouchAttribution]]: "how long after
      * a click do purchases land, per channel" — the number that
      * sizes attribution windows and exposes slow-burn channels).
      * Runs the SAME last-touch crediting, keeps credited conversions
      * only, and reports per channel: exact conversion count, the
      * mean gap as an EXACT floor-division integer (`sum div n` — a
      * double mean at 1e10 µs magnitudes carries ~16 significant
      * digits where engine round() implementations differ in the last
      * ulp, found by this query's own gate run; µs floor precision IS
      * the latency readout), and the EXACT median and p90 gaps by
      * rank selection — the
      * q125/q137 discipline: real data values at ranks ⌊(n+1)/2⌋ and
      * ⌈0.9n⌉ (integer arithmetic `(9n+9) div 10`), gap ties broken
      * by the tiebreak column, no interpolation, no sketch —
      * bit-replayable on any engine. Scale: the attribution window
      * (the q139 sort) + ONE channel-partitioned gap sort + two
      * channels-sized rank-row joins.
      */
    def conversionLatency(key: String, time: String, tieBreak: String,
                          typeCol: String, convType: String,
                          touchTypes: Seq[String],
                          windowUs: Long): DataFrame = {
      val credited = lastTouchAttribution(key, time, tieBreak, typeCol,
        convType, touchTypes, windowUs)
        .filter(col("channel").isNotNull)
        .select(col("channel"), col("touch_gap_us"), col(tieBreak))
      val wRank = Window.partitionBy(col("channel"))
        .orderBy(col("touch_gap_us"), col(tieBreak))
      val wAll = Window.partitionBy(col("channel"))
      val ranked = credited
        .withColumn("__rn", row_number().over(wRank).cast("long"))
        .withColumn("__n", count(lit(1)).over(wAll))
      val medians = ranked
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(col("channel"), col("touch_gap_us").as("median_gap_us"))
      val p90s = ranked
        .filter(col("__rn") === expr("(9 * __n + 9) div 10"))
        .select(col("channel"), col("touch_gap_us").as("p90_gap_us"))
      credited.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("touch_gap_us")).as("__sg"))
        .withColumn("mean_gap_us", expr("__sg div n_conversions"))
        .drop("__sg")
        .join(medians, Seq("channel"))
        .join(p90s, Seq("channel"))
    }

    /** Robust outlier flags by median absolute deviation (r12 — the
      * robust sibling of q100's z-score: mean/stddev screens break on
      * the very outliers they hunt, median/MAD does not): per group,
      * the LOWER MEDIAN of the exact integer `value` (rank ⌊(n+1)/2⌋
      * selected by row_number — a real data value, the q125 winsorize
      * discipline: no interpolation, no sketch), each row's absolute
      * deviation from it, the lower median of THOSE deviations (the
      * MAD), and `outlier = dev > k·MAD` — all exact integers
      * end-to-end, bit-replayable on any engine. `value` must be an
      * exact integer measure (cents); null-valued rows pass through
      * with null dev/outlier and do not dilute either median. A
      * half-constant group (MAD 0) flags every deviating row — the
      * documented MAD property, not a defect. Scale shape: two
      * key-partitioned window sorts (value, then deviation — the q98
      * shape, never a global sort) + two groups-sized joins back;
      * at 100 TB both windows shuffle once on the natural group key.
      */
    def madOutliers(group: String, value: Column, k: Long,
                    allowCoarseGroups: Boolean = false,
                    maxExactGroupRows: Long = MaxExactGroupRows): DataFrame = {
      require(k >= 1, s"madOutliers: k ($k) must be >= 1")
      val wv = Window.partitionBy(col(group)).orderBy(value)
      val wp = Window.partitionBy(col(group))
      val med = left.filter(value.isNotNull)
        .withColumn("__rn", row_number().over(wv))
        .withColumn("__n", count(lit(1)).over(wp))
        // gate on the FIRST median pass (same groups feed the MAD
        // pass — one check suffices): see MaxExactGroupRows
        .filter(col("__rn") === gateCoarseGroups(expr("(__n + 1) div 2"),
          col("__n"), "madOutliers", allowCoarseGroups, maxExactGroupRows))
        .groupBy(col(group).as("__g")).agg(min(value).as("med"))
      val withDev = left.join(med, col(group) <=> col("__g"), "left")
        .withColumn("dev", abs(value - col("med"))).drop("__g")
      val wd = Window.partitionBy(col(group)).orderBy(col("dev"))
      val mad = withDev.filter(col("dev").isNotNull)
        .withColumn("__rn", row_number().over(wd))
        .withColumn("__n", count(lit(1)).over(wp))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .groupBy(col(group).as("__g")).agg(min(col("dev")).as("mad"))
      withDev.join(mad, col(group) <=> col("__g"), "left")
        .withColumn("outlier", when(col("dev").isNotNull, col("dev") > lit(k) * col("mad")))
        .drop("__g")
    }

    /** SCD Type-1 CDC apply (r12 — the MERGE-shaped sibling of the
      * Type-2 `scd2History` family and of `snapshotDiff`): fold a
      * change feed of `upsert`/`delete` rows into the dimension —
      * the latest change per key wins (by `seqCol` descending; an
      * equal-seq upsert/delete pair resolves deterministically to the
      * upsert — `opCol` descending — though callers should keep
      * (key, seq) unique), upserts REPLACE the whole row, deletes
      * remove the key, unchanged keys pass through untouched. Any op
      * value other than `upsert`/`delete` fails loudly (a typo'd op
      * silently treated as a delete would destroy rows). `changes`
      * must carry every column of `left` plus (opCol, seqCol).
      *
      * Scale shape: ONE key-window over the CHANGE FEED (feed-sized,
      * not dimension-sized) + one key-hash anti join + union — the
      * dimension is never rewritten where it didn't change, and at
      * 100 TB the anti join shuffles on the same key the dimension is
      * naturally bucketed by.
      */
    def applyChanges(changes: DataFrame, key: String, opCol: String,
                     seqCol: String): DataFrame = {
      val attrs = left.columns.filterNot(_ == key).toSeq
      val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc, col(opCol).desc)
      val latest = changes
        .withColumn(opCol,
          when(col(opCol).isin("upsert", "delete"), col(opCol))
            .otherwise(raise_error(concat(
              lit("applyChanges: unknown op '"), col(opCol),
              lit("' — only upsert/delete are defined")))))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
      val upserts = latest.filter(col(opCol) === "upsert")
        .select(col(key) +: attrs.map(col): _*)
      left.join(latest.select(col(key)), Seq(key), "left_anti")
        .unionByName(upserts)
    }

    /** Exact per-group simple linear regression + Pearson correlation
      * (r12 — completes the summary-statistics family q100 opened):
      * ONE map-combinable aggregate collects the five exact decimal
      * moment sums (Σx, Σy, Σx², Σy², Σxy over the lossless
      * DECIMAL(18,2) view — order-independent under any partitioning),
      * then slope / intercept / r are a FIXED double expression shape
      * over those exact sums (identical IEEE ops on identical doubles,
      * the q100 discipline), rounded at 6 digits — bit-reproducible on
      * any engine; no `covar_samp`/`corr` (order-dependent double
      * accumulation) anywhere. Rows with a null x or y are excluded
      * up front (a null must not dilute the moments); a zero-variance
      * x yields null slope/intercept, zero variance on either axis
      * yields null r. Scale shape: one shuffle, partial-aggregated
      * map-side; output is one row per group.
      */
    def regressionByGroup(group: String, x: Column, y: Column): DataFrame =
      regressionFromMoments(momentsOf(left, group, x, y))

    /** Two-proportion A/B z-test per group (r12 — the experiment
      * readout every product analytics stack ships): each UNIT
      * (user) counts once per arm, converted iff ANY of its rows
      * satisfies `success`; per group the two arms' exact
      * (units, conversions) counts feed the pooled two-proportion
      * z statistic — a FIXED double expression over exact integers
      * (the q100/q119 discipline: identical IEEE ops on identical
      * doubles replay bit-for-bit on any engine), rounded at 6
      * digits; `significant` thresholds the rounded |z| at 1.96
      * (two-sided 5%). Groups missing either arm are dropped (one
      * arm has no comparison); a degenerate pooled rate (0 or 1 —
      * zero variance) yields null z and false significance. Scale
      * shape: one (group, arm, unit)-keyed aggregate (map-side
      * partials) + one groups-sized self-join — no window, no
      * driver collect; at 100 TB the unit rollup shuffles once on
      * the natural experiment key.
      */
    def abTest(group: String, unit: Column, variant: Column,
               success: Column, variantA: String, variantB: String): DataFrame = {
      require(variantA != variantB, "abTest: the two arms must differ")
      val perUnit = left
        .filter(unit.isNotNull && variant.isin(variantA, variantB))
        .groupBy(col(group).as("__g"), variant.as("__v"), unit.as("__u"))
        .agg(max(when(success, lit(1L)).otherwise(lit(0L))).as("__conv"))
      val per = perUnit.groupBy(col("__g"), col("__v"))
        .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__c"))
      val a = per.filter(col("__v") === variantA)
        .select(col("__g"), col("__n").as("n_a"), col("__c").as("conv_a"))
      val b = per.filter(col("__v") === variantB)
        .select(col("__g"), col("__n").as("n_b"), col("__c").as("conv_b"))
      val pa = col("conv_a").cast("double") / col("n_a")
      val pb = col("conv_b").cast("double") / col("n_b")
      val pool = (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b"))
      a.join(b, Seq("__g"))
        .withColumn("__pa", pa).withColumn("__pb", pb).withColumn("__pool", pool)
        .withColumn("__se", sqrt(col("__pool") * (lit(1.0) - col("__pool")) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
        .withColumn("p_a", round(col("__pa"), 6))
        .withColumn("p_b", round(col("__pb"), 6))
        .withColumn("z", when(col("__se") > 0.0,
          round((col("__pa") - col("__pb")) / col("__se"), 6)))
        .withColumn("significant", when(col("__se") > 0.0,
          abs(col("z")) >= lit(1.96)).otherwise(lit(false)))
        .withColumnRenamed("__g", group)
        .drop("__pa", "__pb", "__pool", "__se")
    }

    /** Chi-square test of independence between two categorical
      * columns (r12 — the categorical sibling of [[abTest]]: does
      * feature A's distribution depend on feature B? The screen
      * behind segmentation sanity checks, drift detection between
      * crawl sources, and label-leak audits). The contingency census
      * is exact integers; each cell's expectation and contribution
      * are ONE fixed IEEE double shape over those exact counts
      * (`e = (na·nb)/N` multiplied in DOUBLE — never a long product,
      * which overflows at ~1e12 marginals; `(obs−e)²/e` in the same
      * op order both engines, the q100/q134 discipline), rounded at
      * 6. The census COMPLETES over the observed |A|×|B| cross (the
      * q136 rule — a structurally absent cell is evidence, its
      * contribution still counts), and the total χ² sums the ROUNDED
      * per-cell contributions as exact DECIMAL(38,6) — deterministic
      * on any engine/partitioning, no order-dependent double sum.
      * Degrees of freedom ride along.
      *
      * Scale shape: one map-combinable cell census + two marginal
      * censuses + the bounded |A|×|B| completion cross joined to ONE
      * q48-shaped scalar row — output is |A|×|B| rows at any corpus
      * size, no window anywhere.
      */
    def chiSquareIndependence(a: String, b: String): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      val base = left.filter(col(a).isNotNull && col(b).isNotNull)
        .select(col(a).as("__a"), col(b).as("__b"))
      val cells = base.groupBy(col("__a"), col("__b"))
        .agg(count(lit(1)).as("obs"))
      val ra = base.groupBy(col("__a")).agg(count(lit(1)).as("na"))
      val cb = base.groupBy(col("__b")).agg(count(lit(1)).as("nb"))
      val n = base.agg(count(lit(1)).as("__n"))
      val e = col("na").cast("double") * col("nb").cast("double") /
        col("__n").cast("double")
      val d = col("obs").cast("double") - col("__e")
      val complete = ra.crossJoin(cb)
        .join(cells, Seq("__a", "__b"), "left_outer")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
        .crossJoin(broadcast(n))
        .withColumn("__e", e)
        .withColumn("__contrib", round(d * d / col("__e"), 6))
      // the totals ride UNPARTITIONED windows over the completion
      // frame — bounded at |A|×|B| rows by construction (the q136
      // bounded-frame shape), and crucially NOT an agg + cross-join
      // back, which would recompute the census subtree
      val wCells = Window.partitionBy()
      complete
        .withColumn("chi2",
          sum(col("__contrib").cast(DecimalType(38, 6))).over(wCells)
            .cast(DecimalType(38, 6)))
        .withColumn("__da", dense_rank().over(Window.orderBy(col("__a"))))
        .withColumn("__db", dense_rank().over(Window.orderBy(col("__b"))))
        .withColumn("dof",
          ((max(col("__da")).over(wCells) - 1) *
            (max(col("__db")).over(wCells) - 1)).cast("long"))
        // χ² emits as integer micros: the decimal total is an exact
        // multiple of 10⁻⁶ (a sum of round-6 terms), so ·10⁶ is
        // lossless — and no DECIMAL column reaches a gated output
        // (SURVEY §3; the former DECIMAL(38,6) emission passed the
        // external gate only while no cell's rendering ended in a
        // zero at scale)
        .select(col("__a").as(a), col("__b").as(b), col("obs"),
          col("na"), col("nb"),
          round(col("__e"), 6).as("expected"),
          col("__contrib").as("contrib"),
          (col("chi2") * 1000000).cast("long").as("chi2_micros"),
          col("dof"))
    }

    /** Cramér's V (r15 — [[chiSquareIndependence]] finished into an
      * EFFECT SIZE: χ² grows with n, so "is it significant" says
      * nothing about "is it strong" — V = √(χ² / (n·(min(r,c)−1)))
      * normalizes to [0, 1], the number a feature-selection or
      * label-leak review actually compares across tables). Same
      * exact contingency machinery: cell/marginal censuses, the
      * |A|×|B| completion (absent cells are evidence, the q136
      * rule), per-cell `(obs−e)²/e` round 6, χ² the exact
      * DECIMAL(38,6) sum of rounded contributions; V is then one
      * fixed double tree over (χ², n, level counts) — √ is
      * IEEE-exact — round 6. A table with min(r,c) < 2 reports null
      * v (dof 0, counts saying why). Returns ONE row:
      * (n, levels_a, levels_b, dof, chi2_micros, v).
      *
      * Scale shape: the q142 statement — censuses collapse the
      * corpus first, the completion frame is |A|×|B| rows, and the
      * final readout is ONE aggregate over it; no window anywhere.
      */
    def cramersV(a: String, b: String): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      val base = left.filter(col(a).isNotNull && col(b).isNotNull)
        .select(col(a).as("__a"), col(b).as("__b"))
      val cells = base.groupBy(col("__a"), col("__b"))
        .agg(count(lit(1)).as("obs"))
      val ra = base.groupBy(col("__a")).agg(count(lit(1)).as("na"))
      val cb = base.groupBy(col("__b")).agg(count(lit(1)).as("nb"))
      val n = base.agg(count(lit(1)).as("__n"))
      val e = col("na").cast("double") * col("nb").cast("double") /
        col("__n").cast("double")
      val d = col("obs").cast("double") - col("__e")
      val complete = ra.crossJoin(cb)
        .join(cells, Seq("__a", "__b"), "left_outer")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
        .crossJoin(broadcast(n))
        .withColumn("__e", e)
        .withColumn("__contrib", round(d * d / col("__e"), 6))
      val agg = complete.agg(
        max(col("__n")).as("n"),
        countDistinct(col("__a")).as("levels_a"),
        countDistinct(col("__b")).as("levels_b"),
        sum(col("__contrib").cast(DecimalType(38, 6)))
          .cast(DecimalType(38, 6)).as("__chi2"))
      val minDim = least(col("levels_a"), col("levels_b")) - lit(1L)
      agg
        .withColumn("dof",
          ((col("levels_a") - 1) * (col("levels_b") - 1)).cast("long"))
        .withColumn("chi2_micros", (col("__chi2") * 1000000).cast("long"))
        .withColumn("v", when(minDim >= 1 && col("n") > 0,
          round(sqrt(col("__chi2").cast("double") /
            (col("n").cast("double") * minDim.cast("double"))), 6)))
        .select(col("n"), col("levels_a"), col("levels_b"), col("dof"),
          col("chi2_micros"), col("v"))
    }

    /** Out-of-fold smoothed target encoding (r15 — the ML
      * feature-prep classic for high-cardinality categoricals: the
      * category's mean target with an m-estimate prior, computed for
      * each fold WITHOUT that fold's own rows, so the feature a
      * model trains on never leaks its own row's label — the
      * leak-free construction every gradient-boosting pipeline
      * ships): per (category, fold) ONE map-combinable census of
      * (count, exact decimal target sum); per-category totals arrive
      * via a category-keyed window OVER THE CENSUS (domain-bounded,
      * never the corpus); per-fold and overall totals via a
      * folds-bounded broadcast join + a 1-row scalar cross (the q48
      * shape — no unpartitioned window over the category domain).
      * The encoding for (c, f) is then
      * `(Σ_oof target + m·prior_oof) / (n_oof + m)` where the oof
      * sums subtract fold f's own census row and `prior_oof` is the
      * overall mean excluding fold f — one fixed double tree over
      * exact sums, round 6. A category seen ONLY in fold f encodes
      * to the prior (n_oof = 0 — the m-estimate's design); m = 0
      * with n_oof = 0 reports null (no information, observable);
      * a single-fold frame reports null prior (nothing is
      * out-of-fold, counts say why). Returns one row per
      * (category, fold): (cat, fold, n, n_oof, prior_oof, enc).
      *
      * Scale shape: one (cat, fold) census collapses the corpus
      * FIRST; everything downstream walks that bounded frame —
      * output |cats|·|folds| rows at any corpus size.
      */
    def targetEncodeOOF(cat: String, target: Column, fold: Column,
                        m: Double): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      require(m >= 0.0, s"targetEncodeOOF: smoothing m ($m) must be >= 0")
      val d = graft.util.Portable.dec(target)
      val census = left
        .filter(col(cat).isNotNull && target.isNotNull && fold.isNotNull)
        .groupBy(col(cat).as("__c"), fold.cast("long").as("__f"))
        .agg(count(lit(1)).as("__n_cf"),
          sum(d).cast(DecimalType(38, 2)).as("__s_cf"))
      val wCat = Window.partitionBy(col("__c"))
      val perFold = census.groupBy(col("__f"))
        .agg(sum(col("__n_cf")).as("__n_f"),
          sum(col("__s_cf")).cast(DecimalType(38, 2)).as("__s_f"))
      val totals = census.agg(
        sum(col("__n_cf")).as("__n_all"),
        sum(col("__s_cf")).cast(DecimalType(38, 2)).as("__s_all"),
        countDistinct(col("__f")).as("__k_folds"))
      val withCat = census
        .withColumn("__n_c", sum(col("__n_cf")).over(wCat))
        .withColumn("__s_c",
          sum(col("__s_cf")).over(wCat).cast(DecimalType(38, 2)))
        .join(broadcast(perFold), Seq("__f"))
        .crossJoin(broadcast(totals))
      val nOof = (col("__n_c") - col("__n_cf")).cast("double")
      val sOof = (col("__s_c") - col("__s_cf")).cast("double")
      val nPrior = (col("__n_all") - col("__n_f")).cast("double")
      val sPrior = (col("__s_all") - col("__s_f")).cast("double")
      val prior = sPrior / nPrior
      val havePrior = col("__k_folds") >= 2
      withCat
        .withColumn("prior_oof", when(havePrior, round(prior, 6)))
        .withColumn("enc", when(havePrior && (nOof + lit(m)) > 0.0,
          round((sOof + lit(m) * prior) / (nOof + lit(m)), 6)))
        .select(col("__c").as(cat), col("__f").as("fold"),
          col("__n_cf").as("n"), (col("__n_c") - col("__n_cf")).as("n_oof"),
          col("prior_oof"), col("enc"))
    }

    /** Rare-category collapse (r15 — the "othering" feature-prep
      * pass that precedes any one-hot/target encoding at scale: tail
      * categories below a share floor fold into one bucket so the
      * feature space stops growing with the corpus and single-row
      * categories stop memorizing rows): over the exact category
      * census, keep a category iff `n·10000 ≥ minShareBp·N` — an
      * INTEGER cross-multiplication (the q156 discipline: no double
      * share ever decides a boundary), ties at the floor keep.
      * Returns the mapping frame, one row per observed category:
      * (cat, n, share_bp = ⌊n·10000/N⌋, kept, cat_out) — `cat_out`
      * is the category itself when kept, `other` when collapsed;
      * apply it with a broadcast join at feature-build time.
      *
      * Scale shape: one map-combinable census + one 1-row scalar
      * cross (the q48 shape) — output is the category domain,
      * never the corpus.
      */
    def collapseRareCategories(cat: String, minShareBp: Long,
                               other: String = "__other__"): DataFrame = {
      require(minShareBp >= 0 && minShareBp <= 10000,
        s"collapseRareCategories: minShareBp ($minShareBp) must be in 0..10000")
      val census = left.filter(col(cat).isNotNull)
        .groupBy(col(cat).as("__c")).agg(count(lit(1)).as("n"))
      val total = census.agg(sum(col("n")).as("__t"))
      census.crossJoin(broadcast(total))
        // DIV, not `/`: Spark's Divide on longs returns DOUBLE — the
        // share must stay an exact integer floor (the q152 rule)
        .withColumn("share_bp", expr("(n * 10000L) DIV __t"))
        .withColumn("kept", col("n") * 10000L >= lit(minShareBp) * col("__t"))
        .withColumn("cat_out",
          when(col("kept"), col("__c").cast("string")).otherwise(lit(other)))
        .select(col("__c").as(cat), col("n"), col("share_bp"),
          col("kept"), col("cat_out"))
    }

    /** Classifier calibration bins (r15 — the reliability-diagram
      * readout an ML-data pipeline runs on any learned quality/
      * safety/language score before trusting its thresholds: "when
      * the model says 0.8, is it right 80% of the time"): scores
      * arrive as EXACT integer micros in [0, 1e6] (the §3 rule — a
      * double score would put bin boundaries on non-portable ulps);
      * `bin = min(nBins−1, ⌊score·nBins/1e6⌋)` is pure integer
      * arithmetic, so binning replays bit-for-bit anywhere. Per bin
      * ONE map-combinable aggregate: n, positives, exact score sum,
      * and the exact Brier numerator Σ(score − label·1e6)² as
      * DECIMAL(38,0); mean score, positive rate, the calibration gap
      * (rate − mean, the reliability-diagram vertical), and the
      * per-bin Brier score are fixed double trees over those exact
      * sums, round 6. Returns one row per occupied bin:
      * (bin, n, n_pos, mean_score, pos_rate, gap, brier).
      *
      * Scale shape: one map-combinable aggregate, output ≤ nBins
      * rows at any corpus size — nothing else.
      */
    def calibrationBins(scoreMicros: Column, label: Column,
                        nBins: Int): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      calibrationFinish(calibrationCensus(left, scoreMicros, label, nBins))
    }

    /** Per-segment calibration bins (r15 — [[calibrationBins]] keyed
      * by a segment: "which crawl SOURCES' / cohorts' scores are
      * miscalibrated" — a model globally calibrated can be badly off
      * inside the segment a curation decision hinges on, the same
      * Simpson's-paradox argument as the per-segment test family):
      * the same exact census keyed by (segment, bin), the same
      * fixed-tree readouts per segment. Returns one row per occupied
      * (segment, bin).
      */
    def calibrationBinsByGroup(group: String, scoreMicros: Column,
                               label: Column, nBins: Int): DataFrame =
      calibrationFinish(
        calibrationCensus(left, scoreMicros, label, nBins, Seq(group)),
        Seq(group))

    /** ABC / Pareto classification per group (r12 — the inventory and
      * revenue-management classic: label each entity A/B/C by where
      * the group's cumulative value crosses 80% / 95%, "the vital few
      * and the trivial many"). Entities order by EXACT value
      * descending with the entity-id tiebreak; the class test is PURE
      * INTEGER arithmetic on cents — `A` while the cumulative BEFORE
      * this entity is under 80% of the total (`cum_before·5 <
      * total·4`), `B` under 95% (`cum_before·20 < total·19`), else
      * `C` — so classification is exact on any engine, no double ever
      * compared against a threshold. Shares emit as one fixed double
      * division each, rounded at 6, for the readout only. Negative
      * values drop (shares are meaningless below zero — the
      * [[concentration]] rule); an all-zero group classifies C
      * throughout (no 80% exists to cross, stated).
      *
      * Scale shape: the (group, entity) census collapses the corpus
      * FIRST; the rank/cumulative window runs on the entity frame
      * (the q143 statement); output is one row per entity.
      */
    def abcClassify(group: String, entity: String,
                    value: Column, allowCoarseGroups: Boolean = false,
                    maxExactGroupRows: Long = MaxExactGroupRows): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      val cents = (graft.util.Portable.dec(value) * 100).cast("long")
      val ent = left
        .filter(col(group).isNotNull && col(entity).isNotNull &&
          value.isNotNull && value >= 0)
        .groupBy(col(group).as("__g"), col(entity).as("__e"))
        .agg(sum(cents).as("__v"))
      val wRun = Window.partitionBy(col("__g"))
        .orderBy(col("__v").desc, col("__e"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("__g"))
      ent
        .withColumn("__cum", sum(col("__v")).over(wRun))
        // the gate counts ENTITIES per group (what this window
        // sorts), riding __tot — prune-proof, every output column
        // derives from it: see MaxExactGroupRows
        .withColumn("__tot", gateCoarseGroups(sum(col("__v")).over(wAll),
          count(lit(1)).over(wAll), "abcClassify", allowCoarseGroups,
          maxExactGroupRows))
        .withColumn("__before", col("__cum") - col("__v"))
        .withColumn("abc_class",
          when(col("__before") * 5 < col("__tot") * 4, "A")
            .when(col("__before") * 20 < col("__tot") * 19, "B")
            .otherwise("C"))
        .withColumn("share", when(col("__tot") > 0,
          round(col("__v").cast("double") / col("__tot").cast("double"), 6)))
        .withColumn("cum_share", when(col("__tot") > 0,
          round(col("__cum").cast("double") / col("__tot").cast("double"), 6)))
        .select(col("__g").as(group), col("__e").as(entity),
          col("__v").as("cents"), col("abc_class"), col("share"),
          col("cum_share"))
    }

    /** Interval union / coverage per key (r12 — the merge-overlapping-
      * intervals primitive behind uptime percentage, sensor coverage,
      * billing-hours dedup and on-call overlap audits — the classic
      * "gaps and islands" problem): per key, overlapping or TOUCHING
      * intervals merge into islands (running max of prior ends over
      * the (start, end)-sorted frame; a new island starts exactly when
      * `start` exceeds every end before it), and the key rolls up to
      * exact integers — raw/merged interval counts, covered length,
      * observed span — plus the coverage ratio as one fixed double
      * division, rounded at 6. Zero-length intervals count (they can
      * bridge nothing but do occupy a merged island); rows with
      * `end < start` or null endpoints drop (invalid, stated).
      *
      * Scale shape: ONE key-partitioned window sort (the q98 shape)
      * + one (key, island) aggregate + one key rollup — all
      * map-combinable after the sort; no self-join, no range join.
      */
    def intervalCoverage(key: String, start: Column,
                         end: Column): DataFrame = {
      val base = left
        .filter(col(key).isNotNull && start.isNotNull && end.isNotNull &&
          end >= start)
        .select(col(key).as("__k"), start.cast("long").as("__s"),
          end.cast("long").as("__e"))
      val wBefore = Window.partitionBy(col("__k"))
        .orderBy(col("__s"), col("__e"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("__k"))
        .orderBy(col("__s"), col("__e"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val islands = base
        .withColumn("__me", max(col("__e")).over(wBefore))
        .withColumn("__new",
          when(col("__me").isNull || col("__s") > col("__me"), 1L).otherwise(0L))
        .withColumn("__isl", sum(col("__new")).over(wRun))
        .groupBy(col("__k"), col("__isl"))
        .agg(count(lit(1)).as("__cnt"), min(col("__s")).as("__st"),
          max(col("__e")).as("__en"))
      islands.groupBy(col("__k"))
        .agg(sum(col("__cnt")).as("n_intervals"),
          count(lit(1)).as("n_merged"),
          sum(col("__en") - col("__st")).as("covered"),
          (max(col("__en")) - min(col("__st"))).as("span"))
        .withColumn("coverage", when(col("span") > 0,
          round(col("covered").cast("double") / col("span").cast("double"), 6)))
        .withColumnRenamed("__k", key)
    }

    /** Kaplan–Meier survival curve per group (r12 — the time-to-event
      * readout behind churn/retention analysis with RIGHT-CENSORED
      * units: a user still active at observation end didn't "survive
      * forever", they're censored — dropping them (naive retention)
      * biases the curve, which is the whole point of KM). Input is
      * one row per unit: an exact integer `duration` and an `event`
      * flag (true = the event was observed at that duration, false =
      * censored there). Per group and distinct duration: the at-risk
      * count (units with duration ≥ d — derived as total minus the
      * cumulative census BEFORE d, never a range self-join), event
      * and censor counts, and the product-limit survival
      * `S(d) = Π_{t≤d} (1 − eₜ/nₜ)` computed as
      * `exp(Σ ln((n−e)/n))` over the duration-ordered running window
      * — ln/exp on the fixed shape (the q48/q73 portability
      * precedent), rounded at 6. A step where EVERY at-risk unit
      * events pins survival to exactly 0 from there on (the ln(0)
      * guard — explicit, not a NaN). Censor-only durations emit rows
      * (the carry is visible) without moving the curve.
      *
      * Scale shape: one map-combinable (group, duration) census
      * collapses units FIRST; the two windows run on the census frame
      * (distinct durations per group), never the corpus.
      */
    def survivalCurve(group: String, duration: Column,
                      event: Column): DataFrame = {
      val census = left
        .filter(col(group).isNotNull && duration.isNotNull && event.isNotNull)
        .groupBy(col(group).as("__g"), duration.cast("long").as("duration"))
        .agg(sum(when(event, 1L).otherwise(0L)).as("n_event"),
          sum(when(event, 0L).otherwise(1L)).as("n_censored"))
      val wAll = Window.partitionBy(col("__g"))
      val wRun = Window.partitionBy(col("__g")).orderBy(col("duration"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wBefore = Window.partitionBy(col("__g")).orderBy(col("duration"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val term = when(col("n_event") > 0 && col("n_event") < col("n_risk"),
        log((col("n_risk") - col("n_event")).cast("double") /
          col("n_risk").cast("double")))
      census
        .withColumn("n_risk", sum(col("n_event") + col("n_censored")).over(wAll) -
          coalesce(sum(col("n_event") + col("n_censored")).over(wBefore), lit(0L)))
        .withColumn("__term", term)
        .withColumn("__dead",
          max(when(col("n_event") >= col("n_risk"), 1L).otherwise(0L)).over(wRun))
        .withColumn("survival", when(col("__dead") === 1L, lit(0.0))
          .otherwise(round(exp(coalesce(sum(col("__term")).over(wRun), lit(0.0))), 6)))
        .drop("__term", "__dead")
        .withColumnRenamed("__g", group)
        .select(col(group), col("duration"), col("n_risk"), col("n_event"),
          col("n_censored"), col("survival"))
    }

    /** Market-concentration metrics per group (r12 — the
      * Herfindahl–Hirschman index and Gini coefficient: the audit
      * readout behind "is this segment dominated by a few entities"
      * — vendor concentration, crawl-source dominance, whale-revenue
      * risk). Per group over per-entity exact decimal totals:
      * `hhi = Σ vᵢ² / T²` and the rank-form Gini
      * `g = 2·Σ i·v₍ᵢ₎ / (n·T) − (n+1)/n` with entities sorted
      * ascending by (value, entity) — the tiebreak makes the rank
      * sum deterministic on any engine. All sums are EXACT decimals
      * (v squares at DECIMAL(18,2)² — entity totals must fit 16
      * digits of cents, stated); the two metrics are one fixed IEEE
      * double shape over those exact sums, rounded at 6 —
      * bit-reproducible anywhere. Negative values drop (shares are
      * meaningless below zero, stated); an all-zero-total group
      * yields null metrics. Scale shape: one map-combinable
      * (group, entity) census collapses the corpus FIRST, the rank
      * window and moment sums run on the entity frame — never the
      * corpus; output is one row per group.
      */
    def concentration(group: String, entity: String,
                      value: Column): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      val ent = left
        .filter(col(group).isNotNull && col(entity).isNotNull &&
          value.isNotNull && value >= 0)
        .groupBy(col(group).as("__g"), col(entity).as("__e"))
        .agg(sum(graft.util.Portable.dec(value)).cast(DecimalType(18, 2)).as("__v"))
      val w = Window.partitionBy(col("__g")).orderBy(col("__v"), col("__e"))
      val ranked = ent.withColumn("__i",
        row_number().over(w).cast(DecimalType(10, 0)))
      val stats = ranked.groupBy(col("__g")).agg(
        count(lit(1)).as("n_entities"),
        sum(col("__v")).cast(DecimalType(38, 2)).as("total"),
        sum(col("__v") * col("__i")).cast(DecimalType(38, 2)).as("__s_iv"),
        sum(col("__v") * col("__v")).cast(DecimalType(38, 4)).as("__s_v2"))
      val t = col("total").cast("double")
      val n = col("n_entities").cast("double")
      stats
        .withColumn("hhi", when(col("total") =!= 0,
          round(col("__s_v2").cast("double") / (t * t), 6)))
        .withColumn("gini", when(col("total") =!= 0,
          round(lit(2.0) * col("__s_iv").cast("double") / (n * t) -
            (col("n_entities") + 1).cast("double") / n, 6)))
        .withColumnRenamed("__g", group)
        // the group total emits as integer cents (exact — entity
        // values are DECIMAL(18,2) sums): no DECIMAL column in a
        // gated output (SURVEY §3)
        .withColumn("total_cents", (col("total") * 100).cast("long"))
        .drop("__s_iv", "__s_v2", "total")
    }

    /** Exact autocorrelation function per group (r12 — the
      * seasonality/persistence diagnostic behind lag selection for
      * any forecasting model): Pearson r between the series and
      * itself shifted by each lag 1..`maxLag`, over the group's
      * observations in strict `order`. `value` must be an EXACT
      * integer measure (a count, cents — the q119 rule: moment sums
      * of exact longs are order-independent and overflow fails
      * loudly under ANSI, never silently); each lag's correlation is
      * then the q119 fixed double shape over six exact sums, rounded
      * at 6 — bit-reproducible anywhere. `order` must be unique per
      * group (a tie would make `lag` ill-defined); lag pairs never
      * cross groups; a lag with fewer than 2 pairs or zero variance
      * on either side yields null r (n still reports). Scale shape:
      * ONE key-partitioned window sort computes ALL lags (lag(k) over
      * the same sorted frame — no self-join), one array explode
      * (maxLag-bounded), one map-combinable (group, lag) aggregate.
      */
    def acfByGroup(group: String, order: Column, value: Column,
                   maxLag: Int): DataFrame = {
      require(maxLag >= 1 && maxLag <= 12,
        s"acfByGroup: maxLag ($maxLag) must be in 1..12")
      val w = Window.partitionBy(col(group)).orderBy(order)
      val base = left.filter(value.isNotNull).withColumn("__x", value.cast("long"))
      val lagged = (1 to maxLag).foldLeft(base) { (df, k) =>
        df.withColumn(s"__l$k", lag(col("__x"), k).over(w))
      }
      val pairs = lagged
        .withColumn("__p", array((1 to maxLag).map(k =>
          struct(lit(k.toLong).as("lag_k"), col("__x").as("x"),
            col(s"__l$k").as("y"))): _*))
        .select(col(group), explode(col("__p")).as("__e"))
        .filter(col("__e.y").isNotNull)
        .select(col(group), col("__e.lag_k").as("lag_k"),
          col("__e.x").as("__x"), col("__e.y").as("__y"))
      val m = pairs.groupBy(col(group), col("lag_k"))
        .agg(count(lit(1)).as("n"),
          sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
          sum(col("__x") * col("__x")).as("__sxx"),
          sum(col("__y") * col("__y")).as("__syy"),
          sum(col("__x") * col("__y")).as("__sxy"))
      val nD  = col("n").cast("double")
      val sx  = col("__sx").cast("double");  val sy  = col("__sy").cast("double")
      val sxx = col("__sxx").cast("double"); val syy = col("__syy").cast("double")
      val sxy = col("__sxy").cast("double")
      val covN  = nD * sxy - sx * sy
      val varXN = nD * sxx - sx * sx
      val varYN = nD * syy - sy * sy
      m.withColumn("r",
          round(when(varXN > 0.0 && varYN > 0.0, covN / sqrt(varXN * varYN)), 6))
        .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
    }

    /** Cohort LTV curve (r12 — the growth-analytics grid behind
      * "how much is a week-N signup worth by week N+k": acquisition
      * payback, retention economics): units cohort by the calendar
      * bucket of their FIRST activity (bucket = floor of days since
      * a fixed anchor over `bucketDays` — both cohort and age come
      * from the same calendar grid, so age = bucket − first_bucket is
      * exact integers end-to-end); per (cohort, age): active units,
      * exact cents, the running cumulative cents over ages, and
      * cumulative LTV per cohort unit as one fixed double division,
      * rounded at 6 (cohort size = the cohort's distinct units —
      * constant down its row so curves compare). Ages with NO
      * activity emit nothing (observable gaps — the cumulative
      * carries at the next active age, never a fabricated zero row).
      *
      * Scale shape: one per-unit min-bucket census + one
      * (unit, bucket) cents census collapse the corpus FIRST, one
      * unit-keyed join puts ages on rows, one map-combinable
      * (cohort, age) aggregate, and the running window walks the
      * bounded cohort×age grid.
      */
    def cohortLtv(unit: String, time: String, value: Column,
                  bucketDays: Int, anchor: String): DataFrame = {
      require(bucketDays >= 1 && bucketDays <= 92,
        s"cohortLtv: bucketDays ($bucketDays) must be in 1..92")
      import org.apache.spark.sql.types.DecimalType
      val anchorD = lit(anchor).cast("date")
      val bucket = floor(datediff(to_date(col(time)), anchorD) / bucketDays)
      val base = left
        .filter(col(unit).isNotNull && col(time).isNotNull && value.isNotNull)
        .select(col(unit).as("__u"), bucket.as("__b"),
          (graft.util.Portable.dec(value) * 100).cast("long").as("__c"))
      val perUnitBucket = base.groupBy(col("__u"), col("__b"))
        .agg(sum(col("__c")).as("__cents"))
      val firstBucket = perUnitBucket.groupBy(col("__u"))
        .agg(min(col("__b")).as("__fb"))
      val grid = perUnitBucket.join(firstBucket, Seq("__u"))
        .groupBy(col("__fb").as("cohort"), (col("__b") - col("__fb")).as("age"))
        .agg(count(lit(1)).as("active_units"), sum(col("__cents")).as("cents"))
      val cohortSize = firstBucket.groupBy(col("__fb").as("cohort"))
        .agg(count(lit(1)).as("cohort_size"))
      val wRun = Window.partitionBy(col("cohort")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(cohortSize, Seq("cohort"))
        .withColumn("cum_cents", sum(col("cents")).over(wRun))
        .withColumn("ltv_cents_per_unit",
          round(col("cum_cents").cast("double") /
            col("cohort_size").cast("double"), 6))
        .select(col("cohort"), col("age"), col("cohort_size"),
          col("active_units"), col("cents"), col("cum_cents"),
          col("ltv_cents_per_unit"))
    }

    /** Forecast backtest scoring per group (r12 — the model-evaluation
      * readout closing the engine's forecasting loop: seasonal
      * baselines train (q127), anomalies screen (q128), THIS scores
      * how good the prediction actually was): per group over exact
      * integer (actual, predicted) pairs — MAE and bias from exact
      * error sums; MAPE over the rows with a non-zero actual (their
      * count is REPORTED as `n_zero_actual`, never silently folded);
      * sMAPE with the standard `2|a−p|/(|a|+|p|)` form over rows with
      * a non-zero denominator. The per-row ratios are each ONE fixed
      * double division ROUNDED at 12 and summed as exact
      * DECIMAL(38,12) — the q142 discipline: no order-dependent
      * double accumulation anywhere, bit-reproducible on any engine;
      * final metrics round at 6. Scale: ONE map-combinable group
      * aggregate over the joined pairs — no window, no collect.
      */
    def forecastScore(group: String, actual: Column,
                      predicted: Column): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      val a = actual.cast("long"); val p = predicted.cast("long")
      val ae = abs(a - p)
      val mapeTerm = when(a =!= 0,
        round(ae.cast("double") / abs(a).cast("double"), 12)
          .cast(DecimalType(38, 12)))
      val sDen = abs(a) + abs(p)
      val smapeTerm = when(sDen =!= 0,
        round(lit(2.0) * ae.cast("double") / sDen.cast("double"), 12)
          .cast(DecimalType(38, 12)))
      left
        .filter(col(group).isNotNull && actual.isNotNull && predicted.isNotNull)
        .groupBy(col(group))
        .agg(count(lit(1)).as("n"),
          sum(ae).as("__sae"), sum(p - a).as("__sbias"),
          sum(mapeTerm).cast(DecimalType(38, 12)).as("__smape_a"),
          count(when(a === 0, 1)).as("n_zero_actual"),
          sum(smapeTerm).cast(DecimalType(38, 12)).as("__ssmape"),
          count(when(sDen === 0, 1)).as("__nzd"))
        .withColumn("mae",
          round(col("__sae").cast("double") / col("n").cast("double"), 6))
        .withColumn("bias",
          round(col("__sbias").cast("double") / col("n").cast("double"), 6))
        .withColumn("mape", when(col("n") > col("n_zero_actual"),
          round(col("__smape_a").cast("double") /
            (col("n") - col("n_zero_actual")).cast("double"), 6)))
        .withColumn("smape", when(col("n") > col("__nzd"),
          round(col("__ssmape").cast("double") /
            (col("n") - col("__nzd")).cast("double"), 6)))
        .drop("__sae", "__sbias", "__smape_a", "__ssmape", "__nzd")
    }

    /** Cross-correlation between two series at leads AND lags (r12 —
      * the "does marketing spend lead conversions, and by how many
      * days" diagnostic; [[acfByGroup]]'s two-series sibling): per
      * group, Pearson r between `x_t` and `y_{t−k}` for every
      * k ∈ −maxLag..maxLag over the observations in strict `order` —
      * a peak at POSITIVE k means y LEADS x by k steps (x echoes y's
      * past), negative k the reverse; k = 0 is plain contemporaneous
      * correlation. Both measures must be EXACT integers (the q119
      * rule); each lag's r is the q119 fixed double shape over six
      * exact moment sums, rounded at 6; degenerate lags (under 2
      * pairs, or zero variance either side) report n with null r.
      * `order` must be unique per group (stated, as q135).
      *
      * Scale shape: ONE key-partitioned window sort computes every
      * shift (lag/lead over the same sorted frame — no self-join),
      * one (2·maxLag+1)-bounded struct explode, one map-combinable
      * (group, k) aggregate.
      */
    def xcorrByGroup(group: String, order: Column, x: Column, y: Column,
                     maxLag: Int): DataFrame = {
      require(maxLag >= 1 && maxLag <= 12,
        s"xcorrByGroup: maxLag ($maxLag) must be in 1..12")
      val base = left
        .filter(col(group).isNotNull && order.isNotNull)
        .select(col(group), order.as("__o"),
          x.cast("long").as("__x"), y.cast("long").as("__y"))
      val w = Window.partitionBy(col(group)).orderBy(col("__o"))
      val shifted = (1 to maxLag).foldLeft(base) { (d, k) =>
        d.withColumn(s"__lag$k", lag(col("__y"), k).over(w))
          .withColumn(s"__lead$k", lead(col("__y"), k).over(w))
      }
      val entries =
        ((-maxLag to -1).map(k =>
          struct(lit(k.toLong).as("lag_k"), col("__x").as("x"),
            col(s"__lead${-k}").as("y"))) ++
          Seq(struct(lit(0L).as("lag_k"), col("__x").as("x"),
            col("__y").as("y"))) ++
          (1 to maxLag).map(k =>
            struct(lit(k.toLong).as("lag_k"), col("__x").as("x"),
              col(s"__lag$k").as("y"))))
      val pairs = shifted
        .withColumn("__p", array(entries: _*))
        .select(col(group), explode(col("__p")).as("__e"))
        .filter(col("__e.x").isNotNull && col("__e.y").isNotNull)
        .select(col(group), col("__e.lag_k").as("lag_k"),
          col("__e.x").as("__x"), col("__e.y").as("__y"))
      val m = pairs.groupBy(col(group), col("lag_k"))
        .agg(count(lit(1)).as("n"),
          sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
          sum(col("__x") * col("__x")).as("__sxx"),
          sum(col("__y") * col("__y")).as("__syy"),
          sum(col("__x") * col("__y")).as("__sxy"))
      val nD  = col("n").cast("double")
      val sx  = col("__sx").cast("double");  val sy  = col("__sy").cast("double")
      val sxx = col("__sxx").cast("double"); val syy = col("__syy").cast("double")
      val sxy = col("__sxy").cast("double")
      val covN  = nD * sxy - sx * sy
      val varXN = nD * sxx - sx * sx
      val varYN = nD * syy - sy * sy
      m.withColumn("r",
          round(when(varXN > 0.0 && varYN > 0.0, covN / sqrt(varXN * varYN)), 6))
        .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
    }

    /** Benford first-digit deviation per group (r12 — the
      * fabricated-numbers screen auditors and fraud pipelines run
      * over money amounts): census the FIRST significant digit of an
      * exact positive integer measure (cents — digit extraction from
      * a long's decimal string is engine-portable, unlike any
      * double-to-string path), complete the census over all nine
      * digits (an absent digit is evidence, not a missing row), and
      * emit each digit's exact count beside its Benford expectation
      * `log₁₀(1+1/d)` and chi-square contribution
      * `(obs − n·p)²/(n·p)` — the fixed double shape over exact
      * integers and the SHARED [[Ops.benfordExpected]] constants
      * (computed once in Scala, embedded as 17-significant-digit
      * literals in the oracle — the q43 discipline), rounded at 6.
      * Non-positive and null values are excluded up front. Scale
      * shape: one map-combinable (group, digit) census, one
      * groups-sized rollup, one broadcast 9-row digit frame — output
      * is exactly 9 rows per group at any data size.
      */
    def benfordDigits(group: String, value: Column): DataFrame = {
      val spark = left.sparkSession
      val obs = left.filter(value.isNotNull && value > 0)
        .withColumn("__dig", substring(value.cast("long").cast("string"), 1, 1).cast("long"))
        .groupBy(col(group).as("__g"), col("__dig").as("digit"))
        .agg(count(lit(1)).as("obs"))
      val totals = obs.groupBy(col("__g")).agg(sum(col("obs")).as("n"))
      val digits = broadcast(spark.range(1, 10).select(col("id").as("digit")))
      val expected = element_at(
        array(Ops.benfordExpected.map(lit): _*), col("digit").cast("int"))
      val obsD = col("obs").cast("double")
      val np = col("n").cast("double") * col("expected_p")
      totals.crossJoin(digits)
        .join(obs, Seq("__g", "digit"), "left")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
        .withColumn("expected_p", expected)
        .withColumn("chi2_contrib",
          round((obsD - np) * (obsD - np) / np, 6))
        .withColumnRenamed("__g", group)
        .select(col(group), col("digit"), col("obs"), col("n"),
          col("expected_p"), col("chi2_contrib"))
    }

    /** Exact time-weighted average per key (r12 — the irregular-series
      * mean `ewmaTrailing` doesn't give): each observation holds its
      * value until the key's NEXT observation, so it weighs by that
      * interval in µs — `twap_num = Σ centsᵢ·Δusᵢ`, `twap_denom =
      * Σ Δusᵢ` (the key's last observation has no interval and weighs
      * zero — both engines' null-skipping SUM drops its pair). All
      * arithmetic BIGINT: value enters as exact cents, weights are
      * exact µs, and the display `twap_millicents = ⌊num·1000/denom⌋`
      * is computed as `(num div denom)·1000 + ((num mod denom)·1000)
      * div denom` — the exact same integer by the division identity,
      * WITHOUT the ×1000 overflow (num alone must fit a Long:
      * max_cents × key-time-span-µs — at 5·10⁴ cents that bounds the
      * span at ~58 years; Spark's ANSI mode fails loudly past it, it
      * cannot return wrong numbers). Rows with a null value are
      * excluded up front (they mark no priced observation); keys with
      * a single observation yield null millicents (denom 0). Scale
      * shape: ONE key-partitioned window sort (the q98 shape) + one
      * map-combinable groupBy on the same key.
      */
    def twapPerKey(key: String, time: String, tieBreak: String,
                   value: Column): DataFrame = {
      val w = Window.partitionBy(col(key)).orderBy(col("__tw_us"), col(tieBreak))
      left
        .filter(value.isNotNull)
        .withColumn("__tw_us", unix_micros(col(time)))
        .withColumn("__tw_c", (graft.util.Portable.dec(value) * 100).cast("long"))
        .withColumn("__tw_d", lead(col("__tw_us"), 1).over(w) - col("__tw_us"))
        .groupBy(col(key))
        .agg(count(lit(1)).as("n_events"),
          coalesce(sum(col("__tw_c") * col("__tw_d")), lit(0L)).as("twap_num"),
          coalesce(sum(col("__tw_d")), lit(0L)).as("twap_denom"))
        .withColumn("twap_millicents",
          when(col("twap_denom") > 0,
            expr("(twap_num div twap_denom) * 1000 + ((twap_num % twap_denom) * 1000) div twap_denom")))
    }

    /** First-order Markov transition matrix over per-key event
      * sequences (r12 — the aggregate view of the q118 paths): for
      * every observed (src → dst) pair of CONSECUTIVE events within a
      * key (strict (time, tieBreak) order, sequences never cross
      * keys), the global count, the src's total outgoing transitions,
      * and the exact-integer probability `prob_millis = ⌊cnt·1000 /
      * src_total⌋`. Null-typed events are excluded up front (the
      * contract is visible, not data-dependent — the q110 rule); a
      * key's last event emits no pair. Scale shape: ONE
      * key-partitioned window sort + one map-combinable (src, dst)
      * groupBy; the totals window runs on the |types|² pair frame,
      * not the corpus.
      */
    def transitionMatrix(key: String, time: String, tieBreak: String,
                         typeCol: String): DataFrame = {
      val w = Window.partitionBy(col(key)).orderBy(col("__tm_us"), col(tieBreak))
      val pairs = left
        .filter(col(typeCol).isNotNull)
        .withColumn("__tm_us", unix_micros(col(time)))
        .withColumn("__tm_dst", lead(col(typeCol), 1).over(w))
        .filter(col("__tm_dst").isNotNull)
        .groupBy(col(typeCol).as("src"), col("__tm_dst").as("dst"))
        .agg(count(lit(1)).as("cnt"))
      pairs
        .withColumn("src_total",
          sum(col("cnt")).over(Window.partitionBy(col("src"))))
        .withColumn("prob_millis", expr("(cnt * 1000) div src_total"))
    }

    /** Hour-of-day seasonal baseline + exact residuals (r12 — the
      * seasonality feature/anomaly primitive): each (group,
      * hour-of-day) cell's mean value is the baseline, held as the
      * exact rational (seasonal_num cents-sum, seasonal_denom count)
      * so nothing floats; per event, `seasonal_millicents =
      * ⌊num·1000/denom⌋` and `residual_millicents = cents·1000 −
      * seasonal_millicents` — the deviation an anomaly detector
      * thresholds, bit-reproducible anywhere. Null values are
      * excluded up front. Scale shape: ONE map-combinable (group,
      * hour) aggregate — at most groups×24 cells — joined back
      * broadcast-friendly; no window, no sort.
      */
    def seasonalResiduals(typeCol: String, time: String, value: Column): DataFrame =
      scoreSeasonal(left, seasonalCells(left, typeCol, time, value),
        typeCol, time, value, inner = true)

    /** Exact CUSUM change-point statistic per key (r12 — the
      * drift/level-shift detector over an ordered series): with
      * T = the key's total cents over its n observations, row k's
      * statistic is `cusum_scaled = n·S_k − k·T` where S_k is the
      * running cents sum — i.e. n·Σ_{j≤k}(x_j − mean), kept exact by
      * scaling through n so no division ever happens; `flag` marks
      * |cusum_scaled| > threshold_cents·n (≡ |mean-adjusted cumsum| >
      * threshold). A key whose values drift mid-series sends the
      * statistic to its extremum at the change point. All BIGINT
      * (bound: n²·max_cents must fit a Long — ~4·10⁶ rows per key at
      * 5·10⁴ cents; Spark's ANSI mode fails loudly past it). Null
      * values excluded up front. Scale shape: ONE key-partitioned
      * window sort (running sum + row index share it) + a key-stats
      * join (the q100 shape).
      */
    def cusumPerKey(key: String, time: String, tieBreak: String,
                    value: Column, thresholdCents: Long): DataFrame = {
      require(thresholdCents >= 0, "cusumPerKey: thresholdCents must be >= 0")
      val w = Window.partitionBy(col(key)).orderBy(col("__cu_us"), col(tieBreak))
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = left
        .filter(value.isNotNull)
        .withColumn("__cu_us", unix_micros(col(time)))
        .withColumn("__cu_c", (graft.util.Portable.dec(value) * 100).cast("long"))
        .withColumn("__cu_s", sum(col("__cu_c")).over(wcum))
        .withColumn("__cu_k", row_number().over(w).cast("long"))
      val stats = ranked.groupBy(col(key).as("__cu_g"))
        .agg(sum(col("__cu_c")).as("__cu_t"), count(lit(1)).as("__cu_n"))
      ranked
        .join(stats, col(key) <=> col("__cu_g"))
        .withColumn("cusum_scaled",
          col("__cu_n") * col("__cu_s") - col("__cu_k") * col("__cu_t"))
        .withColumn("flag",
          abs(col("cusum_scaled")) > lit(thresholdCents) * col("__cu_n"))
        .withColumn("k", col("__cu_k"))
        .drop("__cu_g", "__cu_us", "__cu_c", "__cu_s", "__cu_k", "__cu_t", "__cu_n")
    }

    /** Calendar-day activity streaks per key (r12 — gaps-and-islands
      * over DISTINCT active dates; q22's time-gap sessions answer a
      * different question): per key, the number of distinct active
      * days, the number of maximal consecutive-day runs, the longest
      * run, and that run's start date (ties on length resolve to the
      * EARLIEST start — deterministic). The island key is the classic
      * `date − row_number()` invariant: consecutive dates share it,
      * any gap breaks it; both engines compute it identically on
      * exact DATE arithmetic. Scale shape: one distinct-collapse
      * shuffle on (key, day) — per-key state is active DAYS, far
      * smaller than events — then one key-partitioned window sort of
      * that collapsed frame and two map-combinable aggregates.
      */
    def activityStreaks(key: String, time: String): DataFrame = {
      val days = left
        .select(col(key), to_date(col(time)).as("__d"))
        .distinct()
      val w = Window.partitionBy(col(key)).orderBy(col("__d"))
      val streaks = days
        .withColumn("__grp", date_sub(col("__d"), row_number().over(w)))
        .groupBy(col(key), col("__grp"))
        .agg(count(lit(1)).as("__len"), min(col("__d")).as("__start"))
      streaks
        .withColumn("__mx", max(col("__len")).over(Window.partitionBy(col(key))))
        .groupBy(col(key))
        .agg(sum(col("__len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("__len")).as("longest_streak"),
          min(when(col("__len") === col("__mx"), col("__start")))
            .as("longest_streak_start"))
    }

    /** Rolling-window distinct active units per calendar day (r12 —
      * the DAU/WAU/MAU readout every product dashboard leads with):
      * for every OBSERVED day, the exact count of distinct units
      * active that day and within the trailing `windowDays` window.
      * Exact distinct over a sliding window is the textbook
      * shuffle-bomb (count(DISTINCT) isn't window-able); the engine's
      * shape inverts it: the (unit, day) census collapses the corpus
      * FIRST (the [[activityStreaks]] argument — census size is
      * units × days however many raw events), each census row then
      * CONTRIBUTES to the `windowDays` target days it keeps a unit
      * active for (a bounded ×W explode on the census, never the
      * corpus), and one distinct + count per target day finishes.
      * All exact integers; output is one row per observed day.
      */
    def rollingActives(unit: String, time: String,
                       windowDays: Int): DataFrame =
      serveRollingActives(activesCensus(left, unit, time), windowDays)

    /** Duplicate-payment screen (r12 — the accounts-payable fraud/
      * error audit: two DIFFERENT records carrying the SAME exact
      * amount within a small day window are double-entry suspects):
      * pairs of rows with identical exact cents whose days differ by
      * at most `dayTol`, oriented `a_id < b_id` so each suspect pair
      * reports once. Candidates block on (cents, day) with ONE side
      * exploding its ±dayTol day neighborhood — each qualifying pair
      * matches on exactly one exploded day (the q138 one-owner
      * argument in 1-D), so NO dedup pass exists; amount equality is
      * exact integer cents, never a double compare. Scale: a
      * (2·dayTol+1)× explode on one side + one hash shuffle on the
      * (cents, day) key — collisions are genuine suspects, output-
      * bound by construction.
      */
    def duplicatePayments(id: String, time: String, value: Column,
                          dayTol: Int = 1): DataFrame = {
      require(dayTol >= 0 && dayTol <= 31,
        s"duplicatePayments: dayTol ($dayTol) must be in 0..31")
      val cents = (graft.util.Portable.dec(value) * 100).cast("long")
      val base = left
        .filter(col(id).isNotNull && col(time).isNotNull && value.isNotNull)
        .select(col(id).as("__id"), to_date(col(time)).as("__day"),
          cents.as("cents"))
      val a = base.select(col("__id").as("a_id"), col("__day").as("a_day"),
        col("cents"), col("__day").as("__j"))
      val b = base
        .withColumn("__o", explode(array((-dayTol to dayTol).map(lit): _*)))
        .select(col("__id").as("b_id"), col("__day").as("b_day"),
          col("cents"), expr("date_add(__day, __o)").as("__j"))
      a.join(b, Seq("cents", "__j"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("cents"),
          col("a_day"), col("b_day"))
    }

    /** Daily new-vs-returning split (r12 — the acquisition/retention
      * readout beside [[rollingActives]]: of today's actives, who is
      * here for the FIRST time): per observed day, units whose first
      * activity is that day vs units returning from an earlier day,
      * plus the returning share as one fixed division rounded at 6.
      * Same scale inversion as [[rollingActives]]: the (unit, day)
      * census collapses the corpus FIRST, the unit's first day is one
      * min-census, one unit-keyed join classifies, one map-combinable
      * day aggregate finishes. Exact integers; observed days only.
      */
    def newVsReturning(unit: String, time: String): DataFrame =
      serveNewVsReturning(activesCensus(left, unit, time))

    def resampleLocf(key: String, time: String, value: Column,
                     stepUs: Long): DataFrame = {
      require(stepUs > 0, s"resampleLocf: stepUs must be positive (got $stepUs)")
      val obs = left
        .withColumn("__b", expr(s"unix_micros($time) div $stepUs"))
        .groupBy(col(key), col("__b"))
        .agg(count(lit(1)).as("n_events"),
          graft.util.Portable.decSum(value).as("total_value"))
      // synthesize ONLY the gap buckets between consecutive
      // observations: bounded by each key's own span, no join
      val wl = Window.partitionBy(col(key)).orderBy(col("__b"))
      val gaps = obs
        .withColumn("__prev", lag(col("__b"), 1).over(wl))
        .filter(col("__prev").isNotNull && col("__b") > col("__prev") + 1)
        .select(col(key),
          explode(sequence(col("__prev") + 1, col("__b") - 1)).as("__b"),
          lit(null).cast("long").as("n_events"),
          lit(null).cast("double").as("total_value"))
      val wf = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      obs.unionByName(gaps)
        .withColumn("filled_value",
          last(col("total_value"), ignoreNulls = true).over(wf))
        .select(col(key),
          expr(s"timestamp_micros(__b * ${stepUs}L)").as("bucket_start"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("total_value"), col("filled_value"),
          when(col("n_events").isNull, 1L).otherwise(0L).as("is_gap"))
    }

    /** Group-wise z-score standardization (q100) — rescale a value
      * column to zero-mean/unit-variance WITHIN each group: the
      * normalization pass quality scores and per-source features get
      * before cross-group thresholding (a 0.7 quality score means
      * different things in different crawls; z-scores compare). The
      * determinism discipline: moments aggregate on the EXACT decimal
      * view (order-independent on any partitioning), the mean /
      * variance / z arithmetic is a FIXED expression shape over those
      * exact aggregates (identical IEEE ops on identical doubles),
      * and sqrt is IEEE-correctly-rounded on every engine — so the
      * z-scores are bit-reproducible, no stddev_samp (whose double
      * summation is order-dependent) anywhere. Population variance;
      * a zero-variance group yields null z (no defined scale).
      * One map-combinable moment aggregation + one broadcast-friendly
      * stats join back — two shuffles, both on the group key.
      * Adds `<out>` (the z column) to `left`'s rows.
      */
    def zscorePerGroup(group: String, value: Column, out: String = "z"): DataFrame = {
      // moments count only non-null values (a null value must not
      // dilute the mean its decimal sum skipped), and the join back
      // is NULL-SAFE on the group key — groupBy already forms a null
      // group, so null-keyed rows keep their row and score against it
      // instead of silently dropping (ADVICE r9)
      val stats = left.groupBy(col(group)).agg(
        count(value).as("__n"),
        sum(graft.util.Portable.dec(value)).as("__s"),
        sum(graft.util.Portable.dec(value) * graft.util.Portable.dec(value)).as("__ss"))
      val m = col("__s").cast("double") / col("__n")
      val v = col("__ss").cast("double") / col("__n") - m * m
      left.join(stats.withColumnRenamed(group, "__g"), col(group) <=> col("__g"), "left")
        .withColumn(out,
          when(v > 0.0, (value.cast("double") - m) / sqrt(v)))
        .drop("__g", "__n", "__s", "__ss")
    }

    /** Snapshot diff (q99) — the change set between `left` (the OLD
      * snapshot) and `newer` over a key: which keys were inserted,
      * deleted, or changed in the compared columns. The
      * data-engineering primitive behind incremental loads, SCD
      * maintenance and drift audits — "what happened between
      * yesterday's table and today's" as one declarative query.
      * Shape: ONE key-partitioned full-outer join of the two
      * column-pruned sides (only `key` + `cols` are read — the scan
      * prunes), change classification is a map-side null-safe struct
      * comparison, unchanged keys drop out. Returns (key, change ∈
      * inserted | deleted | changed). `key` must be unique per
      * snapshot (it is the join identity; enforce upstream).
      */
    def snapshotDiff(newer: DataFrame, key: String, cols: Seq[String]): DataFrame = {
      require(cols.nonEmpty, "snapshotDiff needs at least one compared column")
      val o = left.select(col(key), struct(cols.map(col): _*).as("__o"))
      val n = newer.select(col(key), struct(cols.map(col): _*).as("__n"))
      o.join(n, Seq(key), "full_outer")
        .select(col(key),
          when(col("__o").isNull, lit("inserted"))
            .when(col("__n").isNull, lit("deleted"))
            .when(!(col("__o") <=> col("__n")), lit("changed"))
            .as("change"))
        .filter(col("change").isNotNull)
    }

    /** SCD Type-2 history from a SNAPSHOT SERIES (q109) — the
      * dimension-history builder next to [[snapshotDiff]]'s two-way
      * diff: `left` holds one full keyed extract per `snapCol`
      * timestamp (one row per (snapshot, id) — the standard periodic
      * dimension dump), and the result is one row per VERSION:
      * (id, attrs…, valid_from, valid_to, is_current), where
      * valid_from is the snapshot that first observed the version and
      * valid_to the snapshot that observed its end — an attribute
      * CHANGE, or a DELETION (the id absent from the next snapshot;
      * re-insertion later opens a NEW version even if the attributes
      * came back identical — the id was genuinely gone in between).
      * The last version of a still-present id has valid_to = null and
      * is_current = true. Attribute comparison is null-safe (`<=>`),
      * so a null attribute is a value, not a wildcard.
      *
      * The mechanics collapse to one elegant invariant: EVERY closed
      * version's valid_to is the global calendar successor of its
      * last sighting — for a change, that successor is exactly the
      * next version's valid_from; for a deletion it is the snapshot
      * whose absence closed the row; and the final snapshot has no
      * successor, which is precisely the open-version case.
      *
      * Caller contract: ONE row per (snapshot, id) — a duplicate
      * makes version boundaries undefined (dedupe upstream where
      * ingestion can violate it; an always-on guard would be a
      * second full-corpus aggregate per call).
      *
      * Scale shape: the snapshot CALENDAR (distinct timestamps +
      * calendar successor) is bounded by the number of extracts —
      * thousands for years of dailies — so its unpartitioned lead()
      * window and both its joins are broadcast-sized (the q48 scalar
      * discipline); deriving it is a distinct over snapCol, which a
      * snapshot-partitioned layout answers from partition metadata; the corpus pays ONE hash shuffle by id, which the
      * boundary lag-window, the running version sum, the (id,
      * version) aggregate AND the final per-id window all reuse
      * (id ⊂ every later key — no further exchange). Per-attr `max`
      * inside the version aggregate is safe because attributes are
      * constant within a version BY CONSTRUCTION of the boundaries.
      * Every step (lag/lead, null-safe struct compare, running sum,
      * calendar joins) replays verbatim in the oracle.
      */
    def scd2History(snapCol: String, id: String, attrs: Seq[String]): DataFrame = {
      require(attrs.nonEmpty, "scd2History needs at least one tracked attribute")
      val calendar = left.select(col(snapCol)).distinct()
        .withColumn("__next", lead(col(snapCol), 1).over(Window.orderBy(col(snapCol))))
      val w = Window.partitionBy(col(id)).orderBy(col(snapCol))
      val a = struct(attrs.map(col): _*)
      val rows = left
        .join(broadcast(calendar), Seq(snapCol))
        .withColumn("__prev_ts", lag(col(snapCol), 1).over(w))
        .withColumn("__prev_a", lag(a, 1).over(w))
        // the prev row's calendar successor: equal to this row's
        // snapshot ⇔ the id was present in the immediately preceding
        // extract (no deletion gap)
        .withColumn("__prev_next", lag(col("__next"), 1).over(w))
        .withColumn("__bnd",
          (col("__prev_ts").isNull ||
            !(col("__prev_a") <=> a) ||
            col("__prev_next") =!= col(snapCol)).cast("int"))
        .withColumn("__version", sum(col("__bnd")).over(w))
      val versions = rows.groupBy(col(id), col("__version"))
        .agg(min(col(snapCol)).as("valid_from"),
          (Seq(max(col(snapCol)).as("__last")) ++
            attrs.map(c => max(col(c)).as(c))): _*)
      versions
        .join(broadcast(calendar.select(col(snapCol).as("__last"), col("__next"))),
          Seq("__last"))
        .select((Seq(col(id)) ++ attrs.map(col) ++ Seq(
          col("valid_from"),
          col("__next").as("valid_to"),
          col("__next").isNull.as("is_current"))): _*)
    }

    /** Point-in-time dimension read over an SCD2 HISTORY frame (r12,
      * q113) — the query every star-schema fact join needs: the
      * dimension exactly AS OF `ts`, one row per id whose version
      * interval covers the instant ([valid_from, valid_to), open
      * versions unbounded). The interval columns drop from the
      * output — an as-of read IS the reconstructed snapshot, not the
      * history. Works on [[scd2History]]'s output, a loaded
      * [[Ops.PreparedScd2]] history, or any frame with the same
      * interval contract.
      *
      * Scale shape: a pure map-side filter over the history — no
      * shuffle, no join; at 100 TB the history scan prunes further if
      * the history is stored partitioned by valid_from range.
      */
    def scd2AsOf(ts: String, validFrom: String = "valid_from",
                 validTo: String = "valid_to",
                 isCurrent: String = "is_current"): DataFrame = {
      val at = to_timestamp(lit(ts))
      left.filter(col(validFrom) <= at &&
          (col(validTo).isNull || col(validTo) > at))
        .drop(validFrom, validTo, isCurrent)
    }

    /** Interval-overlap join (q102) — all pairs of intervals that
      * OVERLAP in time: concurrency analysis, co-occurring sessions,
      * conflicting reservations — the INTERVAL×INTERVAL sibling of
      * [[rangeJoin]]'s point-distance join, and another join Spark
      * would otherwise plan as a nested loop.
      *
      * Scalable shape — candidates form only at each pair's OWNER
      * bucket, on BOTH sides: every overlapping pair is covered by
      * both intervals at the bucket holding max(starts), and that
      * bucket is one side's START bucket. So instead of joining
      * all-covered-buckets × all-covered-buckets and filtering to the
      * owner bucket afterwards, the join runs twice with one side
      * collapsed to its single start-bucket row — (A-start ⋈
      * B-covered, kept where A starts last) ∪ (A-covered ⋈ B-start,
      * kept where B starts strictly last) — and each overlapping pair
      * surfaces EXACTLY once with zero post-join work. Candidate
      * volume drops from Σ_b |A(b)|·|B(b)| to Σ_b |A₁(b)|·|B(b)| +
      * |A(b)|·|B₁(b)| (start frames carry one row per interval),
      * which keeps the refine ratio near 1 even when intervals span
      * many buckets.
      *
      * Pick `bucketUs` near the p95 interval span — [[intervalStats]]
      * measures exactly this. An interval COVERING more than
      * `maxBucketsPerInterval` buckets fails the run with its id (a
      * degenerate months-long interval would otherwise explode its
      * row count silently); the guard counts actual covered buckets,
      * alignment included. Ids must be unique per side. Returns
      * (a_id, b_id, overlap_us ≥ 0), one row per overlapping pair —
      * self-pairs (same id) excluded; for a SELF join filter
      * `a_id < b_id` to keep each unordered pair once.
      */
    def intervalJoin(right: DataFrame, id: String, start: String, end: String,
                     rightId: String, rightStart: String, rightEnd: String,
                     bucketUs: Long,
                     maxBucketsPerInterval: Int = 10000): DataFrame = {
      require(bucketUs > 0, "intervalJoin: bucketUs must be positive")
      require(maxBucketsPerInterval > 0, "intervalJoin: maxBucketsPerInterval must be positive")
      def side(df: DataFrame, idc: String, s: String, e: String,
               outId: String, outS: String, outE: String): DataFrame = {
        val sUs = unix_micros(col(s)); val eUs = unix_micros(col(e))
        // the guards live INSIDE the start column (not a dropped
        // side column Catalyst would prune away), so a bad interval
        // fails map-side before its buckets ever explode. The span
        // guard counts COVERED buckets (end div − start div + 1 >
        // max), not span/bucketUs: a span of n·bucketUs−1 µs can
        // still straddle n+1 buckets depending on alignment
        df.select(col(idc).as(outId), sUs.as(outS), eUs.as(outE))
          .select(col(outId),
            when(col(outE) < col(outS), raise_error(concat(
              lit("intervalJoin: end before start at id="), col(outId).cast("string"))))
            .when(expr(s"$outE div $bucketUs - $outS div $bucketUs") >= maxBucketsPerInterval,
              raise_error(concat(
                lit(s"intervalJoin: interval covers > $maxBucketsPerInterval buckets at id="),
                col(outId).cast("string"),
                lit(" — raise bucketUs or split the interval upstream"))))
            .otherwise(col(outS)).as(outS),
            col(outE))
      }
      val aBase = side(left, id, start, end, "a_id", "__as", "__ae")
      val bBase = side(right, rightId, rightStart, rightEnd, "b_id", "__bs", "__be")
      def covered(base: DataFrame, s: String, e: String) =
        base.withColumn("__b", explode(sequence(
          expr(s"$s div $bucketUs"), expr(s"$e div $bucketUs"))))
      def startOnly(base: DataFrame, s: String) =
        base.withColumn("__b", expr(s"$s div $bucketUs"))
      val overlapping =
        greatest(col("__as"), col("__bs")) <= least(col("__ae"), col("__be"))
      val j1 = startOnly(aBase, "__as").join(covered(bBase, "__bs", "__be"), Seq("__b"))
        .filter(col("a_id") =!= col("b_id"))
        .filter(col("__as") >= col("__bs")) // A starts last → A's start bucket owns
        .filter(overlapping)
      val j2 = covered(aBase, "__as", "__ae").join(startOnly(bBase, "__bs"), Seq("__b"))
        .filter(col("a_id") =!= col("b_id"))
        .filter(col("__bs") > col("__as")) // strictly — disjoint from j1 on ties
        .filter(overlapping)
      j1.unionByName(j2)
        .select(col("a_id"), col("b_id"),
          (least(col("__ae"), col("__be")) - greatest(col("__as"), col("__bs")))
            .as("overlap_us"))
    }

    /** Interval-span census feeding [[intervalJoin]]'s `bucketUs`
      * choice: one map-combinable aggregate over the interval frame
      * returning (n_intervals, min/p50/p95/max span µs, and
      * `suggested_bucket_us` = the p95 span clamped to ≥ 1). Rule of
      * thumb the suggestion encodes: at bucketUs ≈ p95, ≥95% of
      * intervals cover ≤ 2 buckets, so the covered-bucket explode
      * stays ~2× the input while pairs still co-bucket. Percentiles
      * are `approx_percentile` at accuracy 10⁴ — a census that feeds
      * a knob does not need an exact distributed sort.
      */
    def intervalStats(start: String, end: String): DataFrame = {
      val span = unix_micros(col(end)) - unix_micros(col(start))
      left.agg(
          count(lit(1)).as("n_intervals"),
          min(span).as("min_span_us"),
          percentile_approx(span, lit(0.5), lit(10000)).as("p50_span_us"),
          percentile_approx(span, lit(0.95), lit(10000)).as("p95_span_us"),
          max(span).as("max_span_us"))
        .withColumn("suggested_bucket_us", greatest(col("p95_span_us"), lit(1L)))
    }

    /** PORTABLE HyperLogLog distinct-count estimate per group
      * (Flajolet et al. 2007, the public algorithm) — unlike Spark's
      * built-in `approx_count_distinct` (whose HLL++ registers and
      * bias tables are implementation-private, so no other engine can
      * reproduce its numbers), every step here is engine-portable
      * arithmetic, which is what lets q43 carry a full hash-checked
      * oracle:
      *
      *  - hash: the seeded-md5 60-bit family every sketch in this
      *    engine uses — identical in DuckDB by construction;
      *  - bucket = h mod 2^p, ρ = leading zeros of the remaining
      *    (60−p)-bit word + 1, counted via `length(bin(w))` (exact
      *    integer, no libm);
      *  - registers: one (group, bucket) max — map-combinable, the
      *    classic distributed-HLL shuffle shape; absent buckets are
      *    register 0;
      *  - harmonic sum: EXACT integers — Σ 2^((61−p)−reg) as shifted
      *    longs (≤ 2^61, order-independent — a double sum here would
      *    be partial-order-dependent and break the hash gate);
      *  - estimate: αₘ·m²·2^(61−p) / S with the standard
      *    linear-counting branch (E ≤ 2.5m and empty buckets exist →
      *    m·ln(m/V₀)). The one libm call (`ln`) follows the q95
      *    discipline: cross-engine agreement is empirical (within
      *    1 ulp), certified per-round by the oracle gate.
      *
      * Standard error ≈ 1.04/√m (~1.6% at the default p=12). Null
      * values are ignored (COUNT DISTINCT semantics) — and therefore
      * a group whose values are ALL null has no registers and is
      * OMITTED from the output entirely (ADVICE r10: where SQL's
      * `COUNT(DISTINCT v) GROUP BY g` would return (g, 0)). That is
      * this engine's convention — q43's inner joins and the sketch
      * tables share it; left-join the estimates onto your own
      * distinct-group frame with `coalesce(est, 0)` where the
      * zero rows matter.
      */
    def hllDistinct(group: Seq[String], value: Column, out: String,
                    p: Int = 12): DataFrame =
      hllEstimateFromRegisters(
        hllRegisters(left, group, value, p), group, out, p)

    /** PORTABLE quantile sketch per group ([[quantileRegisters]] +
      * [[quantileFromRegisters]]): nearest-rank quantile estimates
      * off a fixed-width integer-bucket census, each within
      * bucketWidth/2 of the exact nearest-rank value. The registers
      * are a MERGEABLE sketch (counts add — merge ≡ re-sketching the
      * union EXACTLY), and every arithmetic step replays in the
      * oracle, so q108 carries a full hash-checked row. Null values
      * are ignored. Returns the group columns + one double column
      * per requested quantile.
      */
    def quantileSketch(group: Seq[String], value: Column,
                       bucketWidth: Double,
                       quantiles: Seq[(String, Double)]): DataFrame =
      quantileFromRegisters(
        quantileRegisters(left, group, value, bucketWidth),
        group, bucketWidth, quantiles)

    /** Skew-safe aggregation: pre-aggregate on (key, salt) to spread a
      * hot key over `buckets` reducers, then combine. Two shuffles,
      * but the first is uniform — the pattern for power-law keys.
      *
      * Salt choice (VERDICT r9 nit): pass `saltBy = Some(uniqueCol)`
      * to salt by a SEEDED HASH of a unique column — fully
      * deterministic like the rest of the engine, and identical rows
      * under a hot key still spread because the salt source is
      * unique. Without it the salt falls back to
      * partition-id + row-position arithmetic: spreading is equally
      * uniform but the (key, salt) partials depend on the input
      * partitioning (the combined `cnt` is identical either way —
      * only the intermediate is partitioning-sensitive).
      */
    def saltedCount(key: String, buckets: Int,
                    saltBy: Option[Column] = None): DataFrame =
      left
        .withColumn("__salt", saltBy
          .map(c => pmod(xxhash64(lit("salt"), c), lit(buckets.toLong)))
          .getOrElse(pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))))
        .groupBy(col(key), col("__salt"))
        .agg(count(lit(1)).as("__partial"))
        .groupBy(col(key))
        .agg(sum(col("__partial")).as("cnt"))

    // ---- deduplication family (the generalized forms of q31–q33/q53) ----

    /** Exact dedup by normalized-text fingerprint: one hash-groupBy
      * shuffle — the 100 TB-safe primitive. Returns (fingerprint,
      * dup_count, keep_id = min id).
      */
    def dedupExact(id: String, text: String): DataFrame =
      left
        .select(col(id), md5(normText(col(text)).cast("binary")).as("fingerprint"))
        .groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("dup_count"), min(col(id)).as("keep_id"))

    /** n-gram Jaccard near-dup pairs with min-shingle blocking:
      * candidate pairs only form inside a block, so the self-join
      * shuffles on the block key instead of the cross product.
      *
      * Skew safety (VERDICT r4/r5 #1): a Zipfian corpus makes some
      * minimal shingles hot — one block with n docs is n²/2
      * comparisons on ONE reducer, a straggler that only worsens at
      * scale. So the blocking is frequency-aware: block sizes are
      * counted first (one map-combinable agg on the already-
      * checkpointed shingles), singleton blocks — the vast majority
      * under a Zipfian law — are pruned outright (one doc can never
      * form a pair), and any block larger than `blockCap` is split
      * into ceil(n/cap) deterministic sub-blocks by the portable doc
      * hash. The self-join then runs over the TRIANGLE of sub-block
      * cells: a row in sub s is the left leg of cells (s, q≥s) and
      * the right leg of cells (p≤s, s), so cell (p,q) with p<q
      * crosses two disjoint subsets once and cell (p,p) self-joins
      * one subset under the id ordering — every unordered pair
      * appears in EXACTLY one cell, the output set is identical to
      * the monolithic join (the DuckDB oracle is unchanged), and no
      * reducer cell ever exceeds ~cap² comparisons. The quadratic
      * work inside a hot block is semantic — the split distributes
      * it across the cluster instead of one task. Returns (doc_a,
      * doc_b, jaccard ≥ threshold).
      */
    def nearDupPairs(id: String, text: String, threshold: Double,
                     checkpointDir: Option[String] = None,
                     blockCap: Int = 512): DataFrame = {
      require(blockCap > 0, "blockCap must be positive")
      val ckp = lineageBreaker(checkpointDir)
      val sh = ckp(floorPartitions(left.select(col(id), col(text)))
        .withColumn("__toks", tokens(col(text)))
        .select(col(id), shingles3(col("__toks")).as("__s"))
        .filter(size(col("__s")) > 0)
        .withColumn("__block", array_min(col("__s")))) // counts + both self-join legs reuse the shingles
      val counts = sh.groupBy(col("__block"))
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") > 1) // a singleton block cannot form a pair
      // materialized once: BOTH triangle legs replay this frame, so
      // without the break each leg would re-run the counts aggregate
      // and the sizing join from the checkpointed shingles
      val sub = ckp(sh.join(counts, Seq("__block"))
        .withColumn("__nsub", ceil(col("__bn").cast("double") / blockCap).cast("int"))
        .withColumn("__sub", pmod(graft.util.Portable.portableHash64(col(id).cast("string")),
          col("__nsub").cast("long")).cast("int")))
      val a = sub.select(col("__block"), col("__sub").as("__p"),
        explode(sequence(col("__sub"), col("__nsub") - 1)).as("__q"),
        col(id).as("__ida"), col("__s").as("__sa"))
      val b = sub.select(col("__block"),
        explode(sequence(lit(0), col("__sub"))).as("__p"), col("__sub").as("__q"),
        col(id).as("__idb"), col("__s").as("__sb"))
      val inter = size(array_intersect(col("__sa"), col("__sb")))
      val union = size(col("__sa")) + size(col("__sb")) - inter
      a.join(b, Seq("__block", "__p", "__q"))
        // diagonal cells order by id; off-diagonal cells cross
        // disjoint subsets (ids normalized below)
        .filter(col("__p") < col("__q") || col("__ida") < col("__idb"))
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(least(col("__ida"), col("__idb")).as("doc_a"),
          greatest(col("__ida"), col("__idb")).as("doc_b"), col("jaccard"))
    }

    /** Asymmetric containment pairs (q85) — the near-dup class both
      * Jaccard operators miss BY CONSTRUCTION: a document wholly
      * contained in a much larger one (quoted article, aggregated
      * page, doc+boilerplate) has Jaccard ≈ |A|/|B| → far below any
      * sane threshold, and MinHash approximates Jaccard so LSH misses
      * it too. Containment |A∩B| / min(|A|,|B|) (Broder's measure,
      * smaller-side form so either direction of nesting scores 1.0)
      * is the right detector.
      *
      * Candidates cannot come from q32's min-shingle blocks either (a
      * contained doc's min shingle need not be the container's), so
      * this uses the pruned inverted-index skeleton (the q69 shape):
      * shingle postings, stop-shingles with df > `maxDf` dropped
      * (bounding every posting list — a pair sharing ONLY ultra-
      * common shingles is not findable, the documented guard), pairs
      * form where ≥ `minShared` pruned shingles collide, then exact
      * verification on the FULL shingle sets. Per-shingle fan-out is
      * ≤ maxDf², so no reducer ever sees a Zipfian head.
      *
      * Returns (doc_a, doc_b, containment, jaccard), doc_a < doc_b —
      * jaccard rides along to show WHY symmetric dedup missed the
      * pair.
      */
    def containmentPairs(id: String, text: String, threshold: Double,
                         maxDf: Long = 100L, minShared: Long = 3L,
                         checkpointDir: Option[String] = None): DataFrame = {
      require(threshold > 0 && threshold <= 1.0, "threshold must be in (0, 1]")
      val ckp = lineageBreaker(checkpointDir)
      // shingles feed the postings AND both verify joins
      val sh = ckp(floorPartitions(left.select(col(id), col(text)))
        .withColumn("__toks", tokens(col(text)))
        .select(col(id), shingles3(col("__toks")).as("__s"))
        .filter(size(col("__s")) > 0))
      val postings = sh.select(col(id).as("__pid"), explode(col("__s")).as("__sh"))
      val keep = postings.groupBy(col("__sh"))
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf)
        .select(col("__sh"))
      // materialized once: both sides of the pair self-join read the
      // pruned postings (the duplicateSpans double-census class)
      val pruned = ckp(postings.join(keep, Seq("__sh")))
      val cand = pruned.select(col("__sh"), col("__pid").as("__ida"))
        .join(pruned.select(col("__sh"), col("__pid").as("__idb")), Seq("__sh"))
        .filter(col("__ida") < col("__idb"))
        .groupBy(col("__ida"), col("__idb"))
        .agg(count(lit(1)).as("__shared"))
        .filter(col("__shared") >= minShared)
      val inter = size(array_intersect(col("__sa"), col("__sb")))
      cand
        .join(sh.select(col(id).as("__ida"), col("__s").as("__sa")), Seq("__ida"))
        .join(sh.select(col(id).as("__idb"), col("__s").as("__sb")), Seq("__idb"))
        .withColumn("__cont",
          inter.cast("double") / least(size(col("__sa")), size(col("__sb"))).cast("double"))
        .filter(col("__cont") >= threshold)
        .withColumn("__jac", inter.cast("double") /
          (size(col("__sa")) + size(col("__sb")) - inter).cast("double"))
        .select(col("__ida").as("doc_a"), col("__idb").as("doc_b"),
          round(col("__cont"), 6).as("containment"),
          round(col("__jac"), 6).as("jaccard"))
    }

    /** Character-level edit-distance pairs (q87) — the record-linkage
      * class NO token-set operator can express: "Customer#000000123"
      * vs "Customer#000000128" is one substitution apart yet shares
      * no token shingle, so q32/q33/q85 are all blind to the pair by
      * construction. Entity names, titles, and near-identical IDs
      * need Levenshtein, and an O(n²) cross join doesn't scale.
      *
      * Candidates come from the deletion neighborhood (the SymSpell
      * family): if ed(A,B) ≤ d, an optimal alignment has i inserts +
      * e deletes + s substitutions with i+e+s ≤ d; deleting the
      * substituted/deleted positions from A (≤ d deletions) and the
      * substituted/inserted positions from B (≤ d deletions) leaves
      * exactly the aligned-equal characters of both — the SAME
      * string. So self-joining every ≤d-deletion variant is
      * EXACT-complete (no pair within distance d is ever missed) at
      * ~Lᵈ keys per value instead of n² comparisons.
      *
      * Skew safety is q32's, because sequential ID-like values make
      * some variant keys hot (every "Customer#00000012_" collapses
      * to one key): keys are counted first, singleton keys pruned
      * (never a pair), hot keys split into deterministic hash
      * sub-blocks joined as a TRIANGLE of cells — every unordered
      * pair in exactly one cell of one key, ≤ ~cap² rows per reducer
      * — and pairs colliding under several variants are deduped
      * before the exact codegen `levenshtein` verify (threshold form:
      * abandons the DP row once d is exceeded).
      *
      * Returns (id_a, id_b, distance ≤ maxDistance), id_a < id_b;
      * distance 0 = byte-identical values under distinct ids. Exact
      * byte semantics (no normalization) — compose with
      * `normalizeUnicode`/`stripMarkup` upstream when wanted.
      *
      * This operator is contracted for SHORT record-linkage strings
      * (names, titles, addresses): the deletion neighborhood is ~Lᵈ
      * keys per value, so pointing it at full document text would
      * explode L² keys per doc and nothing downstream would save it.
      * `maxLength` (chars) enforces that contract IN the job — any
      * longer value fails the run with the offending id, never
      * silently starts the explosion (VERDICT r8 next #7). For long
      * text use the banded families ([[minhashLshPairs]],
      * [[containmentPairs]]) or truncate/fingerprint upstream.
      */
    def editDistancePairs(id: String, text: String, maxDistance: Int = 1,
                          blockCap: Int = 512,
                          checkpointDir: Option[String] = None,
                          maxLength: Int = 512): DataFrame = {
      require(maxDistance >= 1 && maxDistance <= 2,
        s"maxDistance must be 1 or 2 (got $maxDistance): the deletion " +
          "neighborhood grows as L^d and verification cost follows")
      require(blockCap > 0, "blockCap must be positive")
      require(maxLength > 0, "maxLength must be positive")
      val ckp = lineageBreaker(checkpointDir)
      // executes map-side during base's checkpoint materialization, so
      // an over-long value kills the run before any key explodes
      val guarded = lengthGuarded(col(id), col(text), maxLength, "editDistancePairs")
      val keysCol = deletionVariantKeys(col(text), maxDistance)
      // base is read three times (key explode + both verify legs)
      val base = ckp(floorPartitions(
        left.select(col(id), guarded.as(text)).filter(col(text).isNotNull)))
      val keyed = base.select(col(id), explode(keysCol).as("__k"))
      val counts = keyed.groupBy(col("__k"))
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") > 1) // a singleton key cannot form a pair
      val sub = ckp(keyed.join(counts, Seq("__k"))
        .withColumn("__nsub", ceil(col("__bn").cast("double") / blockCap).cast("int"))
        .withColumn("__sub", pmod(graft.util.Portable.portableHash64(col(id).cast("string")),
          col("__nsub").cast("long")).cast("int")))
      val a = sub.select(col("__k"), col("__sub").as("__p"),
        explode(sequence(col("__sub"), col("__nsub") - 1)).as("__q"),
        col(id).as("__ida"))
      val b = sub.select(col("__k"),
        explode(sequence(lit(0), col("__sub"))).as("__p"), col("__sub").as("__q"),
        col(id).as("__idb"))
      val cand = a.join(b, Seq("__k", "__p", "__q"))
        // diagonal cells order by id; off-diagonal cells cross
        // disjoint subsets (ids normalized below)
        .filter(col("__p") < col("__q") || col("__ida") < col("__idb"))
        .select(least(col("__ida"), col("__idb")).as("id_a"),
          greatest(col("__ida"), col("__idb")).as("id_b"))
        .dropDuplicates("id_a", "id_b")
      cand
        .join(base.select(col(id).as("id_a"), col(text).as("__ta")), Seq("id_a"))
        .join(base.select(col(id).as("id_b"), col(text).as("__tb")), Seq("id_b"))
        .withColumn("distance", levenshtein(col("__ta"), col("__tb"), maxDistance))
        .filter(col("distance") >= 0) // threshold form returns -1 past d
        .select(col("id_a"), col("id_b"), col("distance"))
    }

    /** Cross-table edit-distance join (q94) — match every `left`
      * value against a reference CATALOG within `maxDistance` edits:
      * the two-table record-linkage form of [[editDistancePairs]]
      * (dirty feed vs master list, query log vs entity table,
      * yesterday's names vs today's). Candidates come from the same
      * EXACT-complete deletion-variant keys, joined ACROSS the two
      * sides (a key unique in the catalog can still collide with a
      * left value, so there is no singleton prune; the sides are
      * disjoint, so no triangle split either — hot keys are a plain
      * two-sided equi-join under AQE skew handling), then the
      * threshold-Levenshtein verify. Both sides enforce the q87
      * short-string contract (`maxLength`, map-side raise_error).
      *
      * One-shot form; for rolling batches/streams build the index
      * once with [[Ops.prepareEditIndex]] and use
      * [[editMatchesAgainst]] /
      * [[graft.streaming.Streams.editMatchStream]] — per-increment
      * cost is the increment's own variant explode + key join, the
      * catalog is never rescanned. Returns (id, catalog_id,
      * distance ≤ maxDistance); left rows with no match are absent
      * (filter-side semantics — anti-join the result to get them).
      */
    def editMatches(catalog: DataFrame, id: String, text: String,
                    catalogId: String, catalogText: String,
                    maxDistance: Int = 1,
                    checkpointDir: Option[String] = None,
                    maxLength: Int = 512): DataFrame = {
      val prepared = prepareEditIndex(catalog, catalogId, catalogText,
        maxDistance, checkpointDir, maxLength)
      editMatchesAgainst(prepared, id, text, checkpointDir, maxLength)
    }

    /** Edit-distance matches against a ONCE-prepared catalog index
      * ([[Ops.prepareEditIndex]]) — the rolling-ingest form of
      * [[editMatches]].
      */
    def editMatchesAgainst(prepared: PreparedEditIndex, id: String, text: String,
                           checkpointDir: Option[String] = None,
                           maxLength: Int = 512): DataFrame =
      editPairsAgainstPrepared(left, id, text, prepared,
        lineageBreaker(checkpointDir), maxLength)

    /** MinHash + LSH banding near-dup pairs — the production-scale
      * formulation: banding carries only (id, band, bucket), candidate
      * pairs form inside a (band, bucket) — band buckets are
      * 4-permutation minhash tuples, so no natural-language Zipfian
      * key ever becomes a hot reducer — and shingle sets are joined
      * back just for the exact-Jaccard verification of candidates.
      * Returns (doc_a, doc_b, jaccard ≥ threshold).
      */
    def minhashLshPairs(id: String, text: String, threshold: Double,
                        perms: Int = 64, bands: Int = 16,
                        checkpointDir: Option[String] = None): DataFrame = {
      require(perms % bands == 0, s"perms ($perms) must divide into bands ($bands)")
      val ckp = lineageBreaker(checkpointDir)
      // both self-join legs reuse the checkpointed shingles + bands
      val (sh, banded) = shingleBands(left, id, text, perms, bands, ckp)
      val a = banded.select(col("__band"), col("__bucket"), col(id).as("doc_a"))
      val b = banded.select(col("__band"), col("__bucket"), col(id).as("doc_b"))
      val cand = a.join(b, Seq("__band", "__bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      val withSets = cand
        .join(sh.select(col(id).as("doc_a"), col("__s").as("__sa")), Seq("doc_a"))
        .join(sh.select(col(id).as("doc_b"), col("__s").as("__sb")), Seq("doc_b"))
      val inter = size(array_intersect(col("__sa"), col("__sb")))
      val union = size(col("__sa")) + size(col("__sb")) - inter
      withSets
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }

    /** Incremental dedup — the rolling-ingest production shape: drop
      * incoming rows that duplicate the EXISTING catalog, exactly
      * (normalized-md5 fingerprint anti-join) or nearly (two-sided
      * MinHash-LSH: candidates form where an incoming band bucket
      * equals a catalog band bucket — never increment × catalog — and
      * are verified by exact Jaccard). Duplicates WITHIN the
      * increment are untouched ([[dedupExact]]/[[curate]]'s job), and
      * the catalog is never re-deduped: per-increment cost scales
      * with the increment plus one catalog scan — at 100 TB you
      * re-process the day's crawl, not the corpus. Returns the
      * surviving rows of `left` with all columns.
      */
    def dedupAgainstCatalog(catalog: DataFrame, id: String, text: String,
                            threshold: Double, perms: Int = 64, bands: Int = 16,
                            checkpointDir: Option[String] = None): DataFrame = {
      val prepared = prepareCatalog(catalog, id, text, perms, bands, checkpointDir)
      dedupAgainstPrepared(left, id, text, prepared, threshold,
        lineageBreaker(checkpointDir))
    }

    /** SimHash near-dup pairs — constant-size fingerprints, banded:
      * the 60-bit simhash splits into `bands` chunks and candidates
      * only form inside a (band, chunk-value) bucket, verified with
      * `bit_count(a XOR b) <= maxHamming` — everything built-in
      * codegen, fingerprints instead of shingle sets on the wire.
      * Recall: the pigeonhole guarantee (every true pair is a
      * candidate) holds exactly when `bands > maxHamming` — then
      * ≤ maxHamming differing bits cannot touch every chunk — which
      * the defaults (10 > 6) satisfy; calling with bands ≤ maxHamming
      * makes recall probabilistic, not guaranteed.
      * Returns (doc_a, doc_b, hamming).
      */
    def simhashNearDups(id: String, text: String,
                        maxHamming: Int = 6, bands: Int = 10): DataFrame = {
      val bits = 60
      require(bands > 0 && bits % bands == 0, s"bands ($bands) must divide $bits")
      val chunk = bits / bands
      val sh = floorPartitions(left.select(col(id), col(text)))
        .withColumn("__toks", tokens(col(text)))
        .withColumn("__hashes", tokenHashes(col("__toks")))
        .select(col(id), simhash(col("__hashes"), bits).as("__sh"))
        .localCheckpoint(true) // both banding legs reuse the fingerprints
      // bands unrolled Scala-side (shift amounts are compile-time ints)
      val banded = sh.select(col(id), col("__sh"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("__sh"), b * chunk) % (1L << chunk)): _*)))
        .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__chunk")
      val a = banded.select(col("__band"), col("__chunk"), col(id).as("doc_a"), col("__sh").as("__sa"))
      val b = banded.select(col("__band"), col("__chunk"), col(id).as("doc_b"), col("__sh").as("__sb"))
      a.join(b, Seq("__band", "__chunk"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long").as("hamming"))
        .dropDuplicates("doc_a", "doc_b")
        .filter(col("hamming") <= maxHamming)
    }

    /** Near-dup pairs over a 64-BIT PERCEPTUAL HASH column (r12 —
      * the image-modality sibling of [[simhashNearDups]], which
      * covers text at 60 bits): all (id_a < id_b) pairs whose hashes
      * differ in at most `maxHamming` of 64 bits. Candidates form
      * ONLY inside hash-band buckets (`bands` chunks of 64/bands
      * bits; two hashes within hamming ≤ bands−1 MUST agree on some
      * band by pigeonhole, so the default maxHamming=6 < bands=8 is
      * EXACT — zero recall loss; raising maxHamming past bands−1
      * degrades gracefully to approximate recall). The band join
      * carries only (id, hash); never an all-pairs comparison. Band
      * extraction is an UNSIGNED shift + mask (the hash uses all 64
      * bits, so an arithmetic shift would smear the sign across the
      * top band's bucket values).
      *
      * The hash column comes from
      * [[graft.operators.Multimodal.imageHashes]] (dHash over truly-
      * decoded pixels) or any other 64-bit LSB-packed fingerprint;
      * feed only `decoded_real` rows — stub hashes are md5 noise and
      * would pair arbitrarily ([[imageNearDups]] enforces this).
      */
    def phashNearDups(id: String, phash: String,
                      maxHamming: Int = 6, bands: Int = 8): DataFrame = {
      require(bands > 0 && 64 % bands == 0, s"bands ($bands) must divide 64")
      require(maxHamming >= 0, "maxHamming must be non-negative")
      val chunk = 64 / bands
      val mask = if (chunk == 64) -1L else (1L << chunk) - 1L
      val hs = left.select(col(id), col(phash).cast("long").as("__ph"))
        .localCheckpoint(true) // both banding legs reuse the hashes
      val banded = hs.select(col(id), col("__ph"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("__ph"), b * chunk).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__chunk")
      val a = banded.select(col("__band"), col("__chunk"), col(id).as("doc_a"), col("__ph").as("__pa"))
      val b = banded.select(col("__band"), col("__chunk"), col(id).as("doc_b"), col("__ph").as("__pb"))
      a.join(b, Seq("__band", "__chunk"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("__pa").bitwiseXOR(col("__pb"))).cast("long").as("hamming"))
        .dropDuplicates("doc_a", "doc_b")
        .filter(col("hamming") <= maxHamming)
    }

    /** Embedding-cosine near-dup pairs with multi-table random-
      * hyperplane blocking ([[graft.functions.Hyperplanes]]): `tables`
      * independent `signBits`-bit sign codes per vector, candidate
      * pairs form inside any (table, code) bucket, the union is
      * deduped and verified ONCE by the codegen'd cosine expression —
      * the vector analogue of [[minhashLshPairs]]'s banding, with the
      * same shuffle shape: the block join carries only (id, table,
      * code), and the vectors join back for verification by id. A pair
      * at cosine ≥ 0.92 that flips one sign in one table still
      * collides in another; a single blocking table (the pre-r4 shape)
      * silently loses it. `dim` is the embedding dimensionality (the
      * hyperplane literals must cover every coordinate). Requires
      * `GraftFunctions.register(spark)`. Returns (vec_a, vec_b,
      * cosine ≥ threshold).
      */
    def embeddingNearDups(id: String, emb: String, threshold: Double, dim: Int,
                          signBits: Int = 8, tables: Int = 4,
                          seed: String = "graft-hp",
                          checkpointDir: Option[String] = None): DataFrame = {
      val ckp = lineageBreaker(checkpointDir)
      val w = Hyperplanes.weights(tables, signBits, dim, seed)
      // materialized once: the code explode reads it, and both verify
      // joins read it again by id
      val base = ckp(left.select(col(id), col(emb).cast("array<double>").as("__e")))
      val coded = ckp(base
        .select(col(id), posexplode(array(
          (0 until tables).map(l => Hyperplanes.blockCode(col("__e"), w(l))): _*)))
        .withColumnRenamed("pos", "__tbl").withColumnRenamed("col", "__block"))
      val a = coded.select(col("__tbl"), col("__block"), col(id).as("vec_a"))
      val b = coded.select(col("__tbl"), col("__block"), col(id).as("vec_b"))
      val cand = a.join(b, Seq("__tbl", "__block"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"))
        .dropDuplicates("vec_a", "vec_b")
      cand
        .join(base.select(col(id).as("vec_a"), col("__e").as("__ea")), Seq("vec_a"))
        .join(base.select(col(id).as("vec_b"), col("__e").as("__eb")), Seq("vec_b"))
        .withColumn("cosine", call_function("cosine_sim", col("__ea"), col("__eb")))
        .filter(col("cosine") >= threshold)
        .select(col("vec_a"), col("vec_b"), col("cosine"))
    }

    /** Incremental embedding dedup against a vector CATALOG (q88) —
      * [[dedupAgainstCatalog]]'s shape for the vector modality: drop
      * incoming vectors whose cosine to some CATALOG vector reaches
      * `threshold`. Candidates only form where an increment hyperplane
      * sign code equals a catalog code in one of the independent
      * tables ([[embeddingNearDups]]'s 4-table blocking, two-sided) —
      * never increment × catalog — and the catalog is coded ONCE
      * ([[Ops.prepareVecCatalog]] pins codes + vectors for rolling
      * batches and the streaming form). Near-dups WITHIN the
      * increment are untouched ([[embeddingNearDups]]'s job), and the
      * catalog is never re-deduped: per-increment cost scales with
      * the increment plus the banded joins — at 100 TB you re-score
      * the day's embeddings, not the corpus. Returns the surviving
      * rows of `left` with all columns.
      */
    def vecDedupAgainstCatalog(catalog: DataFrame, id: String, emb: String,
                               threshold: Double, dim: Int,
                               signBits: Int = 8, tables: Int = 4,
                               seed: String = "graft-hp",
                               checkpointDir: Option[String] = None): DataFrame = {
      val prepared = prepareVecCatalog(catalog, id, emb, dim, signBits, tables,
        seed, checkpointDir)
      vecDedupAgainstPrepared(left, id, emb, prepared, threshold,
        lineageBreaker(checkpointDir))
    }

    /** Semantic deduplication (q80) — the SemDeDup recipe (Abbas et
      * al. 2023, arXiv:2303.09540): cluster the embedding space, then
      * compare pairs only WITHIN a cluster and drop every vector whose
      * cosine to a lower-id cluster-mate reaches `threshold`. Where
      * [[embeddingNearDups]] catches near-copies via random-hyperplane
      * codes, this catches the broader "same content, different
      * words" band that LSH misses, at the cost of supplying a
      * centroid set (train with [[graft.operators.Vectors]]'
      * k-means, or pass any fixed quantizer).
      *
      * Scale shape: k is the scale knob (parallelism = cluster count
      * and per-reducer work is cluster_size², so SemDeDup at
      * production scale runs ~10⁵ clusters for 10⁸ docs — size k so
      * the expected cluster is 10³-10⁴ rows, and use
      * [[embeddingNearDups]] instead when no quantizer fits the
      * corpus). Assignment follows k: at or below
      * `maxLiteralCentroids` the centroids collect to a k×dim plan
      * literal (driver-tiny, the ivfTopK pattern) and assignment is
      * pure map-side codegen — no join, no shuffle; ABOVE it the
      * centroids collapse to ONE row holding the array of (cid, ce)
      * structs, broadcast onto the corpus as a keyless 1-row join
      * (the q48/q83 plan shape this engine already pins), and the
      * SAME sort_array fold ranks them — identical O(k·dim) per-row
      * compute, but the plan stays centroid-free (a 10⁵-centroid
      * literal would make the PLAN itself the bottleneck:
      * multi-hundred-MB task binaries — VERDICT r8 "What's wrong"
      * #1) and there is no aggregation or extra shuffle (a
      * groupBy-argmin over the corpus×k stream degenerates to
      * sort-based aggregation and OOMs — probe-caught). Past ~10⁵
      * centroids × large dim the single array row approaches
      * broadcast limits: train a two-level (coarse/fine) quantizer
      * and call this per coarse cell instead. Both paths rank by
      * exactly the same (negscore, cid) struct ordering, so the
      * assignment is bit-identical (spec-pinned). After assignment the corpus
      * shuffles ONCE on the cluster key for the within-cluster pair
      * join. Everything is IEEE-deterministic (the codegen cosine
      * accumulates in array order, matching DuckDB bit-for-bit), so
      * the kept set replays exactly in SQL.
      *
      * Returns (id, cluster, kept): every input row with its cluster
      * id and whether it survives (kept=false ⟺ a lower-id same-
      * cluster vector is ≥ threshold similar).
      */
    def semanticDedup(id: String, emb: String, centroids: DataFrame,
                      centroidId: String, centroidEmb: String,
                      threshold: Double,
                      checkpointDir: Option[String] = None,
                      maxLiteralCentroids: Int = 4096): DataFrame = {
      graft.functions.GraftFunctions.register(left.sparkSession)
      val cdf = centroids
        .select(col(centroidId).cast("long").as("cid"),
          col(centroidEmb).cast("array<double>").as("ce"))
      val k = cdf.count()
      require(k > 0, "semanticDedup: empty centroid set")
      val base = floorPartitions(left.select(col(id), col(emb).cast("array<double>").as("__e")))
      def negscore(ce: Column) =
        lit(-1.0) * call_function("cosine_sim", col("__e"), ce)
      // argmax-cosine centroid, ties to the lower centroid id: sort k
      // (−score, cid) structs per row — the ranking is identical on
      // both assignment paths, only the array's origin differs
      def rankedOver(cents: Column) = sort_array(transform(cents, ct => struct(
        negscore(ct.getField("ce")).as("negscore"),
        ct.getField("cid").as("cid"))))
      val assigned =
        if (k <= maxLiteralCentroids) {
          val cents = cdf.collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
          val centLit = array(cents.map { case (cid, ce) =>
            struct(lit(cid).as("cid"), array(ce.map(lit): _*).as("ce")) }: _*)
          base.withColumn("cluster", element_at(rankedOver(centLit), 1).getField("cid"))
        } else {
          // large-k path: ONE row holding the whole centroid array,
          // broadcast keyless onto the corpus (the q48/q83 1-row-NLJ
          // shape); the joined row is consumed by the projection in
          // place, never materialized, so the array is a reference,
          // not a per-row copy
          val centsArr = cdf.agg(collect_list(struct(col("cid"), col("ce"))).as("__cents"))
          base.join(broadcast(centsArr))
            .withColumn("cluster", element_at(rankedOver(col("__cents")), 1).getField("cid"))
            .drop("__cents")
        }
      // materialized once: both sides of the pair self-join and the
      // final projection read the assignment
      val asg = lineageBreaker(checkpointDir)(assigned)
      val a = asg.select(col("cluster"), col(id).as("__ia"), col("__e").as("__ea"))
      val b = asg.select(col("cluster"), col(id).as("__ib"), col("__e").as("__eb"))
      val dropped = a.join(b, Seq("cluster"))
        .filter(col("__ia") < col("__ib"))
        .filter(call_function("cosine_sim", col("__ea"), col("__eb")) >= threshold)
        .select(col("__ib").as(id)).distinct()
      asg.select(col(id), col("cluster"))
        .join(dropped.withColumn("__d", lit(true)), Seq(id), "left")
        .select(col(id), col("cluster"), col("__d").isNull.as("kept"))
    }

    /** Keep-BEST near-dup dedup (q86) — the production dedup ACTION:
      * where [[curate]] and q46 keep the minimum id of every near-dup
      * cluster, a real pipeline keeps the highest-QUALITY member (the
      * canonical page, not whichever mirror crawled first).
      * Composition of the proven parts: MinHash-LSH pair graph
      * ([[minhashLshPairs]] — the skew-proof banding path) →
      * transitive closure ([[Ops.connectedComponentsWithRounds]]) →
      * per-cluster argmax(quality, tie → lower id) via a window
      * PARTITIONED by cluster (thousands of small partitions, no
      * global ordering). Docs in no pair are their own singleton
      * cluster and keep themselves.
      *
      * `quality` must be an engine-portable expression (integer
      * arithmetic or rounded doubles, the q40/q55 score discipline)
      * for the kept set to be bit-reproducible. Returns (id,
      * cluster_id, quality, kept) for EVERY input row — filter on
      * `kept` for the survivors, or audit the dropped members
      * directly.
      */
    def dedupKeepBest(id: String, text: String, quality: Column,
                      threshold: Double = 0.5, maxRounds: Int = 50,
                      checkpointDir: Option[String] = None): DataFrame = {
      val pairs = left.minhashLshPairs(id, text, threshold,
        checkpointDir = checkpointDir)
      left.keepBestAmong(id, quality, pairs, "doc_a", "doc_b",
        maxRounds, checkpointDir)
    }

    /** Keep-best reduction over an EXPLICIT near-dup edge list — the
      * action stage of [[dedupKeepBest]] decoupled from its pair
      * producer, so the same cluster-and-keep rule composes with ANY
      * pair family: [[containmentPairs]] (the asymmetric class),
      * [[editDistancePairs]] (the character-level class),
      * `simhashNearDups`, or an externally-supplied graph. `edges`
      * rows are undirected (edgeA, edgeB) id pairs over `left`'s
      * `id` column; rows of `left` absent from every edge form
      * singleton clusters and are always kept. Same output contract
      * as [[dedupKeepBest]]: (id, cluster_id, quality, kept) for
      * EVERY input row, keep = max quality (id ascending tiebreak).
      */
    def keepBestAmong(id: String, quality: Column, edges: DataFrame,
                      edgeA: String, edgeB: String, maxRounds: Int = 50,
                      checkpointDir: Option[String] = None): DataFrame = {
      val integral = integralIdType(left.schema(id).dataType)
      // the label join below can only line up when the edge endpoints
      // live in the same type class as the id column — a string edge
      // list against a long id (or vice versa) would cast to null and
      // silently return all-singletons, the exact failure class the
      // r9 id generalization removed
      require(integral == (integralIdType(edges.schema(edgeA).dataType) &&
          integralIdType(edges.schema(edgeB).dataType)),
        s"keepBestAmong: id column '$id' (${left.schema(id).dataType}) and edge " +
          s"columns '$edgeA'/'$edgeB' (${edges.schema(edgeA).dataType}/" +
          s"${edges.schema(edgeB).dataType}) must be in the same type class " +
          "(both integral or both not)")
      val labels = connectedComponentsWithRounds(
        edges.select(col(edgeA), col(edgeB)),
        edgeA, edgeB, maxRounds, checkpointDir)._1
      // labels come back in Long space for integral ids, ORIGINAL id
      // space otherwise (withLongVertexIds' collision-checked
      // surrogate round-trip), so the join key and the singleton
      // fallback follow the id column's own type: a string-id corpus
      // now clusters correctly instead of null-casting every join key
      // and returning all-singletons (VERDICT r8 "What's wrong" #2).
      val idKey = if (integral) col(id).cast("long") else col(id)
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col(id))
      left
        .select(col(id), quality.as("quality"))
        .join(labels, idKey === col("vertex"), "left")
        .withColumn("cluster_id", coalesce(col("component"), idKey))
        .withColumn("kept", row_number().over(w) === 1)
        .select(col(id), col("cluster_id"), col("quality"), col("kept"))
    }

    /** End-to-end curation (the generalized q55): quality gate by a
      * caller-supplied score column, exact dedup (fingerprint window,
      * keep min id), near-dup removal among the survivors via the
      * MinHash-LSH pair graph (the skew-proof banding path, not
      * min-shingle blocking), deterministic portable-hash sampling at
      * `samplePct`. The near-dup ACTION is selectable: by default
      * drop the larger id of every verified pair (the q55 shape);
      * with `keepBest = Some(score)` cluster the pair graph
      * transitively and keep the max-`score` member of each near-dup
      * cluster instead (tie → lower id) — the [[dedupKeepBest]]
      * policy in the one-call pipeline path, for "keep the canonical
      * page, not whichever mirror crawled first". One declarative
      * plan; returns the surviving rows of `left`. `checkpointDir`
      * selects reliable checkpoints for every lineage break (cluster
      * mode).
      */
    def curate(id: String, text: String, qualityScore: Column,
               minQuality: Double, nearDupThreshold: Double = 0.5,
               samplePct: Int = 100,
               checkpointDir: Option[String] = None,
               keepBest: Option[Column] = None): DataFrame = {
      val ckp = lineageBreaker(checkpointDir)
      val gated = left
        .withColumn("__q", qualityScore)
        .filter(col("__q") >= minQuality)
        .drop("__q")
      val w = Window.partitionBy(col("__fp"))
      val exactKept = ckp(gated
        .withColumn("__fp", md5(normText(col(text)).cast("binary")))
        .withColumn("__min", min(col(id)).over(w))
        .filter(col(id) === col("__min"))
        .drop("__min", "__fp")) // shared by the pair join + the anti-join
      val pairs = exactKept
        .minhashLshPairs(id, text, nearDupThreshold, checkpointDir = checkpointDir)
      val survivors = keepBest match {
        case None =>
          val dropped = pairs.select(col("doc_b").as(id)).distinct()
          exactKept.join(dropped, Seq(id), "left_anti")
        case Some(score) =>
          val kept = exactKept
            .keepBestAmong(id, score, pairs.select(col("doc_a"), col("doc_b")),
              "doc_a", "doc_b", checkpointDir = checkpointDir)
            .filter(col("kept")).select(col(id))
          exactKept.join(kept, Seq(id), "left_semi")
      }
      if (samplePct >= 100) survivors
      else survivors.filter(
        pmod(graft.util.Portable.portableHash64(col(id).cast("string")), lit(100)) < samplePct)
    }

    /** Sharded sequence packing (the generalized q57): shard by the
      * portable id hash, order by id within the shard, and assign each
      * row the training-sequence pack its token offset starts in
      * (`pack_id = offset div budgetTokens`). The cumsum window is
      * per-shard, so `shards` is the parallelism knob — there is never
      * a global single-task ordering. Adds (shard, pack_id) to `left`.
      */
    def packSequences(id: String, tokenCount: Column,
                      budgetTokens: Long, shards: Int): DataFrame = {
      require(budgetTokens > 0 && shards > 0, "budgetTokens and shards must be positive")
      val w = Window.partitionBy(col("__shard")).orderBy(col(id))
      left
        .withColumn("__n", tokenCount.cast("long"))
        .withColumn("__shard",
          pmod(graft.util.Portable.portableHash64(col(id).cast("string")), lit(shards.toLong)))
        .withColumn("__cum", sum(col("__n")).over(w))
        .withColumn("pack_id", expr(s"(__cum - __n) div $budgetTokens"))
        .withColumn("shard", col("__shard"))
        .drop("__n", "__shard", "__cum")
    }

    /** Deterministic training-shard shuffle (the generalized q72) —
      * the LAST step of a training-data pipeline: deal the curated
      * corpus into `shards` output shards in a globally-shuffled,
      * bit-reproducible order (training consumers need documents
      * decorrelated from crawl/source order, and re-running the
      * pipeline tomorrow must produce the SAME shard files). Each row
      * gets `shard = seededHash(seed, id) mod shards` and `shard_pos`
      * = its 1-based rank within the shard by (hash, id) — a seeded
      * permutation, not an engine-dependent random: portable md5
      * arithmetic end-to-end, so any engine (and the DuckDB oracle)
      * reproduces the exact deal. Changing `seed` reshuffles;
      * changing `shards` redistributes.
      *
      * Scale shape: ONE hash-partition shuffle on `shard` plus a
      * per-shard sort — `shards` is the parallelism knob exactly as
      * in [[packSequences]] (the window partitions by shard, so no
      * global single-task ordering; at 100 TB pick shards in the
      * thousands so each reducer sorts corpus/shards). Returns
      * `left`'s rows plus (shard, shard_pos).
      */
    def shuffleShards(id: String, shards: Int, seed: Long = 0L): DataFrame = {
      require(shards > 0, "shards must be positive")
      val w = Window.partitionBy(col("__shard")).orderBy(col("__h"), col(id))
      left
        .withColumn("__h", graft.functions.TextFunctions.seededHash(lit(seed), col(id).cast("string")))
        .withColumn("__shard", pmod(col("__h"), lit(shards.toLong)))
        .withColumn("shard_pos", row_number().over(w).cast("long"))
        .withColumn("shard", col("__shard"))
        .drop("__h", "__shard")
    }

    /** MATERIALIZE the [[shuffleShards]] deal as an on-disk training
      * artifact (r12 — VERDICT r11 missing #5: q72 computed the deal
      * but nothing wrote it): exactly one parquet file per shard with
      * DETERMINISTIC names (`shard-00000.parquet` … directly under
      * `path`), rows carrying the input columns plus (shard,
      * shard_pos) sorted by shard_pos within each file, and a
      * `_SUCCESS` marker written LAST — a crash mid-write leaves no
      * marker, so a consumer polling for `_SUCCESS` never reads a
      * half-materialized corpus. Re-running over the same input
      * produces the identical file set (the deal is md5 arithmetic,
      * the within-file order is the deal's own rank, and parquet
      * encodes deterministically), which is what makes the curation →
      * trainer handoff auditable.
      *
      * Scale shape: one hash shuffle of the corpus by shard (each
      * shard lands in EXACTLY one task — that is what guarantees one
      * file per shard), per-shard sort bounded by shard size, then
      * driver-side renames proportional to SHARD COUNT only (16–4096
      * — never data-sized). A shard left empty by the deal (only
      * possible when rows ≲ shards — never at corpus scale) still
      * gets its file: an empty single-footer parquet, so the file
      * count equals `shards` unconditionally and downstream loaders
      * can address shard k without existence checks.
      */
    def writeShards(id: String, shards: Int, path: String, seed: Long = 0L): Unit = {
      require(shards > 0, "shards must be positive")
      import org.apache.hadoop.fs.{FileUtil, Path}
      val spark = left.sparkSession
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new Path(root, "_tmp_shard_write")
      val dealt = shuffleShards(id, shards, seed)
      dealt
        .withColumn("__shard_dir", col("shard"))
        .repartition(shards, col("shard"))
        .sortWithinPartitions(col("shard"), col("shard_pos"))
        .write.mode("overwrite").partitionBy("__shard_dir")
        .parquet(tmp.toString)
      // stage the empty-shard filler lazily: ONE extra tiny job only
      // when the deal actually left a shard empty
      lazy val emptyFile: Path = {
        val eTmp = new Path(root, "_tmp_shard_empty")
        spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            dealt.schema)
          .coalesce(1).write.mode("overwrite").parquet(eTmp.toString)
        fs.listStatus(eTmp).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(
            s"writeShards: empty-shard filler produced no part file under $eTmp"))
      }
      // clear any previous materialization FIRST — the marker, then
      // EVERY stale shard file (a re-run with a smaller shard count
      // would otherwise leave the old run's higher-numbered files in
      // place and a directory read-back would mix the two deals —
      // r12 second review)
      fs.delete(new Path(root, "_SUCCESS"), false)
      if (fs.exists(root))
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.startsWith("shard-") && p.getName.endsWith(".parquet"))
          .foreach(fs.delete(_, false))
      (0 until shards).foreach { s =>
        val target = new Path(root, f"shard-$s%05d.parquet")
        fs.delete(target, false)
        val dir = new Path(tmp, s"__shard_dir=$s")
        if (fs.exists(dir)) {
          val parts = fs.listStatus(dir).map(_.getPath)
            .filter(_.getName.startsWith("part-"))
          require(parts.length == 1,
            s"writeShards: shard $s produced ${parts.length} part files — " +
              "the shard-hash repartition must land each shard in one task")
          // rename can fail WITHOUT throwing on some filesystems —
          // an ignored false here would leave the shard missing
          // while _SUCCESS still asserts a complete set
          require(fs.rename(parts(0), target),
            s"writeShards: rename to $target failed")
        } else {
          FileUtil.copy(fs, emptyFile, fs, target, false,
            spark.sparkContext.hadoopConfiguration)
        }
      }
      fs.delete(tmp, true)
      fs.delete(new Path(root, "_tmp_shard_empty"), true)
      fs.create(new Path(root, "_SUCCESS"), true).close()
    }

    /** Exact-k deterministic per-group sampling — take exactly
      * min(k, |group|) rows from every group, chosen by seeded
      * portable hash rank, for balanced eval subsets and per-domain
      * doc caps ([[capTokensPerCategory]] budgets tokens by rate;
      * this deals exact row counts). Deterministic on any engine,
      * any partitioning, and STABLE: a row's (hash, id) sort key
      * never moves as the corpus grows, so a group's sample only
      * changes where new rows out-rank old ones. Two-stage rank so
      * no reducer ever sorts a whole group (a language-sized group
      * in a 100 TB corpus would otherwise land on one task): stage 1
      * ranks within (group, hash-sub-shard) and keeps k — any
      * globally-top-k row is top-k in its own sub-shard, so this
      * never drops a winner — stage 2 ranks the surviving
      * ≤ k·subShards rows per group. Output = `left`'s columns plus
      * `sample_rank` (1-based within group). `id` must be unique
      * (it is the tie-break that makes the order total).
      */
    def samplePerGroup(groupCol: String, id: String, k: Int,
                       seed: Long = 0L, subShards: Int = 64): DataFrame = {
      require(k > 0, "k must be positive")
      require(subShards > 0, "subShards must be positive")
      require(k.toLong * subShards < Int.MaxValue, "k * subShards must stay an int")
      val w1 = Window.partitionBy(col(groupCol), col("__sub"))
        .orderBy(col("__h"), col(id))
      val w2 = Window.partitionBy(col(groupCol)).orderBy(col("__h"), col(id))
      left
        .withColumn("__h",
          graft.functions.TextFunctions.seededHash(lit(seed), col(id).cast("string")))
        .withColumn("__sub", pmod(col("__h"), lit(subShards.toLong)))
        .withColumn("__r1", row_number().over(w1))
        .filter(col("__r1") <= k)
        .withColumn("sample_rank", row_number().over(w2).cast("long"))
        .filter(col("sample_rank") <= k)
        .drop("__h", "__sub", "__r1")
    }

    /** WEIGHTED exact-k per-group sampling without replacement —
      * [[samplePerGroup]]'s uniform draw biased by a weight column:
      * a row's inclusion probability follows its weight share (long
      * docs for token-budget-proportional subsets, quality scores
      * for quality-tilted eval picks). The Efraimidis–Spirakis
      * exponential-key race (IPL 2006 — public result): each row
      * draws u from its seeded portable hash and keys as
      * −ln(u)/w ~ Exp(w); ranking a group by the key ascending IS
      * the sequential weighted draw without replacement, in one
      * pass. Deterministic in (seed, id) under any PARTITIONING —
      * the key derives from the seeded hash alone. Across ENGINES
      * the guarantee is empirical, not absolute: libm `ln` is only
      * specified to ~1 ulp, so a platform pair could in principle
      * rank a near-tied key pair differently — the per-round oracle
      * gate (q95 replays the race rank-for-rank in DuckDB) is what
      * certifies agreement on this platform, and would surface any
      * such flip as a hash mismatch rather than silent divergence.
      * Same two-stage
      * rank as [[samplePerGroup]] — no reducer ever sorts a whole
      * group. Non-positive weights fail the run map-side with the
      * offending id (a weight of 0 has no defined draw — pre-filter
      * upstream if exclusion is intended). Output = `left`'s columns
      * plus `sample_rank`.
      */
    def weightedSamplePerGroup(groupCol: String, id: String, weight: Column,
                               k: Int, seed: Long = 0L,
                               subShards: Int = 64): DataFrame = {
      require(k > 0, "k must be positive")
      require(subShards > 0, "subShards must be positive")
      require(k.toLong * subShards < Int.MaxValue, "k * subShards must stay an int")
      val guardedW = when(weight.cast("double") <= 0.0 || weight.isNull,
        raise_error(concat(lit("weightedSamplePerGroup: non-positive weight ("),
          weight.cast("string"), lit(") at id="), col(id).cast("string"),
          lit(" — the exponential race is undefined; pre-filter or fix the weight"))))
        .otherwise(weight.cast("double"))
      val h = graft.functions.TextFunctions.seededHash(lit(seed), col(id).cast("string"))
      val w1 = Window.partitionBy(col(groupCol), col("__sub"))
        .orderBy(col("__sk"), col(id))
      val w2 = Window.partitionBy(col(groupCol)).orderBy(col("__sk"), col(id))
      left
        .withColumn("__h", h)
        // u ∈ (0, 1]: (h + 1) / 2^60 on the 60-bit positive hash;
        // the long add happens BEFORE the double cast in both engines
        .withColumn("__sk",
          -log((col("__h") + lit(1L)).cast("double") / lit(1.152921504606846976e18)) / guardedW)
        .withColumn("__sub", pmod(col("__h"), lit(subShards.toLong)))
        .withColumn("__r1", row_number().over(w1))
        .filter(col("__r1") <= k)
        .withColumn("sample_rank", row_number().over(w2).cast("long"))
        .filter(col("sample_rank") <= k)
        .drop("__h", "__sk", "__sub", "__r1")
    }

    /** Learned quality gate — keep only documents the trained
      * classifier ([[graft.operators.Classifier]]) scores at or above
      * `minScore`. The heuristic gate is `curate`'s `qualityScore`
      * Column; this is its learned sibling for when a seed-labeled
      * model beats hand-tuned thresholds. Scoring joins the hashed
      * features against the vocab-sized weights FRAME (never a dense
      * broadcast), then a left-semi join keeps the surviving rows
      * with all their columns. Two passes over `left` (featurize +
      * semi-join) — both key-partitioned, nothing driver-side.
      */
    def classifierGate(weights: DataFrame, id: String, text: String,
                       minScore: Double, dim: Int = 1 << 18): DataFrame = {
      require(minScore >= 0.0 && minScore <= 1.0,
        s"minScore must be a probability, got $minScore")
      val kept = graft.operators.Classifier
        .scoreTextClassifier(left, weights, id, text, dim)
        .filter(col("score") >= minScore)
        .select(col(id))
      left.join(kept, Seq(id), "left_semi")
    }

    /** Equi-width histogram over an integer-valued column (the
      * generalized q78) — the one-pass distribution profile for
      * numeric columns (pair with [[profile]]'s nulls/distincts and
      * [[skewStats]]' heavy keys). Bucketing is pure integer
      * arithmetic with a CEIL bin width, `width = ⌈span/bins⌉`, so
      * no term exceeds the span itself (a `(v−lo)·bins` formulation
      * overflows Long once span > 2⁶³/bins; here only a span that
      * itself overflows Long — hi−lo ≥ 2⁶³, both extremes near the
      * Long limits — is unsupported) and the oracle replays every
      * boundary exactly. Trailing bins beyond
      * the data maximum simply stay empty; empty bins are not
      * emitted (counts are sparse). Nulls are dropped.
      *
      * Scale shape: one min/max aggregate (1-row frame broadcast onto
      * the stream — the q48 shape), map-side bucket assignment, then
      * a ≤bins-row groupBy. Two corpus passes (min/max + bucket),
      * both full scans a histogram inherently needs.
      */
    def histogram(value: Column, bins: Int): DataFrame = {
      require(bins > 0, "bins must be positive")
      val vals = left.select(value.cast("long").as("__v"))
        .filter(col("__v").isNotNull)
      val mm = vals.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
      vals.join(broadcast(mm))
        .withColumn("__width", expr(s"(__hi - __lo + ${bins}L) div ${bins}L"))
        .withColumn("bin", expr("(__v - __lo) div __width"))
        .groupBy(col("bin"), col("__lo"), col("__hi"), col("__width"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("bin"),
          expr("__lo + bin * __width").as("bin_lo"),
          least(expr("__lo + (bin + 1) * __width - 1"), col("__hi")).as("bin_hi"),
          col("cnt"))
    }

    /** Key-distribution skew diagnostics (the generalized q76) — the
      * probe to run BEFORE shuffling 100 TB on a key: top-k heaviest
      * keys with exact counts and basis-point share of all rows. A
      * key at 2000+ bp means one reducer gets a fifth of the corpus
      * (→ salt it, q32's lesson); the `saltedCount`/AQE-skew-join
      * machinery here exists precisely for what this surfaces.
      *
      * Scale shape: one map-combinable groupBy(key) census; top-k is
      * Spark's TakeOrderedAndProject (per-partition heaps, k rows to
      * the driver stage — never a global sort); the 1-row total joins
      * onto the K-ROW top-k frame (q48's nested-loop shape, pinned by
      * spec); the rank window orders ≤ k rows. Deterministic: ties
      * break by key, shares are integer basis points.
      */
    def skewStats(key: String, k: Int = 20): DataFrame = {
      require(k > 0, "k must be positive")
      val counts = left.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("__total"))
      counts
        .orderBy(col("cnt").desc, col(key)).limit(k)
        .join(broadcast(total))
        .withColumn("rank",
          row_number().over(Window.orderBy(col("cnt").desc, col(key))).cast("long"))
        .withColumn("share_bp", expr("cnt * 10000L div __total"))
        .select(col("rank"), col(key), col("cnt"), col("share_bp"))
    }

    /** Deterministic train/val/test corpus split (the generalized
      * q74) — every row gets a `split` label from its seeded hash
      * bucket (`seededHash(seed, id) mod 10000`) against cumulative
      * basis-point thresholds. The property that matters for training
      * pipelines is STABILITY: a document's split depends only on
      * (seed, id), never on what else is in the corpus — so the
      * held-out set stays fixed as the corpus grows (new crawl data
      * can't silently migrate eval docs into train, preserving the
      * decontamination guarantee q58 checks across re-splits), and
      * any subset of the corpus splits consistently with the whole.
      *
      * Scale shape: one pure map-side expression — zero shuffle, zero
      * joins, streaming-applicable unchanged. Proportions are
      * binomial-exact (±√n noise per split); for exact-count dealing
      * use [[shuffleShards]]' rank machinery instead. `splits` are
      * (name, basis points) and must sum to 10000.
      */
    def splitCorpus(id: String, splits: Seq[(String, Long)],
                    seed: Long = 0L): DataFrame = {
      require(splits.nonEmpty && splits.forall(_._2 > 0),
        "splitCorpus needs at least one split with positive basis points")
      require(splits.map(_._1).distinct.size == splits.size,
        "split names must be distinct")
      require(splits.map(_._2).sum == 10000L,
        s"split basis points must sum to 10000, got ${splits.map(_._2).sum}")
      val bucket = pmod(
        graft.functions.TextFunctions.seededHash(lit(seed), col(id).cast("string")),
        lit(10000L))
      // cumulative thresholds: bucket < c_k → split k; the final
      // otherwise arm catches bucket = 9999 exactly (sums to 10000)
      val cums = splits.scanLeft(0L)(_ + _._2).tail
      val label = splits.init.zip(cums.init)
        .foldLeft(Option.empty[Column]) { case (acc, ((name, _), c)) =>
          Some(acc.fold(when(bucket < lit(c), name))(_.when(bucket < lit(c), name)))
        }
        .fold(lit(splits.last._1))(_.otherwise(splits.last._1))
      left.withColumn("split", label)
    }

    /** Train/eval contamination pairs (the generalized q58): distinct
      * word n-gram hashes per document on both sides, inverted-index
      * join on the gram hash (candidates only form where an actual
      * n-gram collides — never doc×doc), shared-gram counts per pair
      * with the eval-side overlap fraction. Returns (train_id,
      * eval_id, shared_ngrams, eval_ngrams, overlap_frac ordered-free;
      * rows with ≥ minShared shared grams).
      */
    def contaminationPairs(evalSet: DataFrame, id: String, text: String,
                           evalId: String, evalText: String,
                           n: Int = 8, minShared: Long = 5L): DataFrame = {
      val trainGrams = floorPartitions(left.select(col(id), col(text)))
        .withColumn("__toks", tokens(col(text)))
        .select(col(id).as("train_id"), explode(ngramHashes(col("__toks"), n)).as("__g"))
      // eval_ngrams rides along on every exploded gram row (8 bytes,
      // functionally dependent on eval_id) so the eval side is ONE
      // subtree — the alternative (a separate counts frame joined back
      // after the agg) tokenizes the eval set twice and adds a join
      // (plan-audited r7, same class as the q69 double census)
      val evalGrams = evalSet
        .withColumn("__toks", tokens(col(evalText)))
        .select(col(evalId).as("eval_id"), ngramHashes(col("__toks"), n).as("__gs"))
        .select(col("eval_id"), size(col("__gs")).cast("long").as("eval_ngrams"),
          explode(col("__gs")).as("__g"))
      trainGrams.join(evalGrams, Seq("__g"))
        .groupBy(col("train_id"), col("eval_id"), col("eval_ngrams"))
        .agg(count(lit(1)).as("shared_ngrams"))
        .filter(col("shared_ngrams") >= minShared)
        .withColumn("overlap_frac",
          round(col("shared_ngrams").cast("double") / col("eval_ngrams").cast("double"), 6))
        .select(col("train_id"), col("eval_id"), col("shared_ngrams"),
          col("eval_ngrams"), col("overlap_frac"))
    }

    /** Per-document n-gram coverage against a reference corpus (q82)
      * — where [[contaminationPairs]] asks "WHICH eval doc does this
      * train doc overlap", this asks the per-doc aggregate question:
      * what fraction of a document's distinct n-grams exist ANYWHERE
      * in the reference? High coverage ⇒ memorized/boilerplate/
      * benchmark-contaminated text; low ⇒ novel. The standard scoring
      * pass before deciding what newly-crawled data adds over the
      * corpus you already have.
      *
      * Shape: the reference collapses to its distinct gram-hash set
      * (an inverted index with no postings — one distinct agg, grams
      * only, never documents²); each doc's distinct grams explode
      * with the doc total riding along (the contaminationPairs
      * single-subtree trick) and left-join the index; coverage is an
      * integral basis-point ratio, so the whole result replays
      * bit-for-bit in SQL. Docs with fewer than n tokens have no
      * grams and are dropped (coverage is undefined, not zero).
      *
      * Returns (id, n_grams, n_matched, coverage_bp).
      */
    def ngramCoverage(ref: DataFrame, id: String, text: String,
                      refText: String, n: Int = 8): DataFrame = {
      val refGrams = floorPartitions(ref.select(col(refText)))
        .withColumn("__toks", tokens(col(refText)))
        .select(explode(ngramHashes(col("__toks"), n)).as("__g"))
        .distinct()
      coverageAgainstIndex(left, id, text,
        PreparedGramIndex(refGrams, n, reliable = false))
    }

    /** Duplicated-span detection (substring-level exact dedup, q69):
      * find maximal verbatim token spans of ≥ `minSpanTokens` shared
      * BETWEEN documents — the boilerplate / license-header / quoted-
      * article duplication that document-level fingerprints (q31) and
      * near-dup pairs (q32/q33) miss because the containing documents
      * are otherwise distinct.
      *
      * Shape (never doc×doc): positional word n-gram hashes per doc →
      * stop-gram pruning (grams appearing in > `maxDf` docs are
      * dropped, bounding every posting list — the standard guard that
      * keeps a common phrase from exploding the inverted index at
      * corpus scale) → inverted-index self-join on the gram hash →
      * gaps-and-islands merge of consecutive colliding positions at
      * constant offset into maximal spans. The window partitions by
      * (pair, offset) — thousands of small partitions, no global
      * ordering. Every step is portable integer/md5 arithmetic, so a
      * SQL oracle replays the whole pipeline bit-for-bit (pruning
      * included: a span crossing a pruned gram splits identically in
      * both engines).
      *
      * Returns (id_a, id_b, start_a, start_b, span_tokens), id_a <
      * id_b, one row per maximal duplicated span; starts are 1-based
      * token positions. Run exact dedup first — identical documents
      * produce one full-length span each, but are cheaper to collapse
      * with [[dedupExact]].
      */
    def duplicateSpans(id: String, text: String, n: Int = 8,
                       minSpanTokens: Int = 20, maxDf: Long = 100L,
                       checkpointDir: Option[String] = None): DataFrame = {
      require(n >= 2 && minSpanTokens >= n,
        "duplicateSpans needs n >= 2 and minSpanTokens >= n")
      // grams feed both the df census and the postings join: break
      // lineage so the tokenizer+md5 pass runs once, not twice
      val grams = lineageBreaker(checkpointDir)(
        floorPartitions(left.select(col(id), col(text)))
          .withColumn("__toks", tokens(col(text)))
          .select(col(id).as("__id"), explode(ngramPosHashes(col("__toks"), n)).as("__pg"))
          .select(col("__id"), col("__pg.pos").as("__pos"), col("__pg.g").as("__g")))
      val keep = grams.groupBy(col("__g"))
        .agg(countDistinct(col("__id")).as("__df"))
        .filter(col("__df") <= maxDf)
        .select(col("__g"))
      // materialize the PRUNED postings once: both sides of the pair
      // self-join read this frame, and without the break the df
      // census (a full aggregate over every gram) would execute once
      // PER SIDE (plan-audited r7: two census subtrees)
      val postings = lineageBreaker(checkpointDir)(grams.join(keep, Seq("__g")))
      val a = postings.select(col("__g"), col("__id").as("id_a"), col("__pos").as("pos_a"))
      val b = postings.select(col("__g"), col("__id").as("id_b"), col("__pos").as("pos_b"))
      val w = Window.partitionBy(col("id_a"), col("id_b"), col("__delta"))
        .orderBy(col("pos_a"))
      a.join(b, Seq("__g"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("__delta", col("pos_a") - col("pos_b"))
        .withColumn("__isl", col("pos_a") - row_number().over(w))
        .groupBy(col("id_a"), col("id_b"), col("__delta"), col("__isl"))
        .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
          (count(lit(1)) + lit(n - 1)).cast("long").as("span_tokens"))
        .filter(col("span_tokens") >= minSpanTokens)
        .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
          col("span_tokens"))
    }

    /** Substring-level dedup REMOVAL — the action on
      * [[duplicateSpans]]' findings: delete every duplicated span
      * from the LATER document (keep-first by id — deterministic,
      * engine-portable), so each verbatim span survives exactly in
      * its smallest-id carrier. Output is the NORMALIZED token stream
      * (the dedup domain) minus the removed positions — the shape the
      * next pipeline stage (chunking, packing, tokenization) consumes.
      *
      * Removal is a position-set operation: a doc's spans collect
      * into an interval list (no merge needed — coverage by ANY
      * interval removes the token, which makes the semantics
      * order-free and exactly replayable in SQL as a NOT EXISTS
      * between join), then one filter pass with the positional HOF
      * drops covered tokens. Per-doc interval counts are small (each
      * interval is ≥ minSpanTokens long), so the per-token coverage
      * check stays cheap; everything else inherits duplicateSpans'
      * inverted-index shape. Returns (id, clean_text,
      * removed_tokens); docs without duplicated spans pass through
      * with their normalized text intact.
      */
    def removeDuplicateSpans(id: String, text: String, n: Int = 8,
                             minSpanTokens: Int = 20, maxDf: Long = 100L,
                             checkpointDir: Option[String] = None): DataFrame = {
      val spans = duplicateSpans(id, text, n, minSpanTokens, maxDf, checkpointDir)
      val ivs = spans
        .select(col("id_b").as("__rid"), struct(col("start_b").as("s"),
          (col("start_b") + col("span_tokens") - 1).as("e")).as("__iv"))
        .groupBy(col("__rid"))
        .agg(collect_list(col("__iv")).as("__ivs"))
      left.select(col(id), col(text))
        .withColumn("__toks", tokens(col(text)))
        .join(ivs, col(id) === col("__rid"), "left")
        .withColumn("__cover",
          coalesce(col("__ivs"), array().cast("array<struct<s:bigint,e:bigint>>")))
        .withColumn("__kept", filter(col("__toks"), (x, i) =>
          !exists(col("__cover"), iv =>
            (i + 1) >= iv.getField("s") && (i + 1) <= iv.getField("e"))))
        .select(col(id),
          concat_ws(" ", col("__kept")).as("clean_text"),
          (size(col("__toks")) - size(col("__kept"))).cast("long").as("removed_tokens"))
    }

    /** Corpus-wide PARAGRAPH dedup (q89) — the CCNet/RefinedWeb
      * "line-level dedup" pass: any paragraph (a `sep`-delimited
      * segment, byte-exact) that occurs in at least `minDf` DISTINCT
      * documents is boilerplate (nav bars, cookie banners, copyright
      * footers, subscribe prompts) and is removed from EVERY document
      * that carries it; the surviving paragraphs reassemble in their
      * original order. This is the granularity between whole-document
      * dedup (q31 — blind to shared fragments inside distinct docs)
      * and token-gram span dedup (q69/q71 — which needs a span to
      * repeat ≥ minSpanTokens verbatim and keeps its FIRST
      * occurrence; boilerplate must be dropped from all occurrences,
      * including the first).
      *
      * Shape: paragraphs explode once (lineage-broken — the census
      * and the flag join both read them); the document-frequency
      * census first distincts (paragraph, id) PAIRS — the shuffle key
      * includes the id, so a corpus-wide hot paragraph (an empty
      * line, a universal footer) spreads across reducers instead of
      * concentrating on one — then counts per paragraph, where the
      * hot key's row count is already capped at the distinct-doc df,
      * not the occurrence count. Both census stages are
      * map-side-combinable. The common set (df ≥ minDf) is bounded
      * by total_paragraphs / minDf and joins back as a flag (AQE
      * broadcasts it when small); reassembly is one per-document
      * sorted collect, partitioned by id so no reducer sees more
      * than a document. No window, no corpus-wide sort — at 100 TB
      * the census and the per-doc reassembly are the only shuffles.
      *
      * Returns (id, clean_text, n_kept, n_removed); a document whose
      * every paragraph is common comes back with an empty
      * clean_text, so drops stay auditable.
      */
    def dedupParagraphs(id: String, text: String, minDf: Long,
                        sep: String = "\n",
                        checkpointDir: Option[String] = None): DataFrame = {
      require(minDf >= 2, "dedupParagraphs: minDf must be >= 2")
      require(sep.nonEmpty, "dedupParagraphs: sep must be non-empty")
      val paras = lineageBreaker(checkpointDir)(explodeParas(left, id, text, sep))
      val common = paras.select(col("__para"), col(id)).distinct()
        .groupBy(col("__para")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") >= minDf)
        .select(col("__para"))
      stripParasAgainstCommon(paras, id, common, sep)
    }

    /** Strip a once-prepared boilerplate set ([[Ops.prepareBoilerplate]])
      * from any batch — the rolling-ingest form of [[dedupParagraphs]]:
      * the corpus-wide df census runs ONCE at prepare time, and each
      * increment (a new batch, a live stream via
      * [[graft.streaming.Streams.stripBoilerplateStream]]) pays only
      * its own paragraph explode + one hash join against the frozen
      * common set. Same output contract as [[dedupParagraphs]].
      */
    def stripBoilerplateAgainst(prepared: PreparedBoilerplate,
                                id: String, text: String): DataFrame =
      stripParasAgainstCommon(explodeParas(left, id, text, prepared.sep),
        id, prepared.common, prepared.sep)

    /** Per-document character-distribution entropy (q84) — the
      * cheap gibberish detector: natural language sits in a narrow
      * entropy band (≈2.5–4.5 bits ≈ 1.7–3.1 nats for English-like
      * text), while base64/hex blobs, minified code and key-mash
      * score far outside it. Computed as H = ln L − (Σ c·ln c)/L over
      * the per-doc char census — the identity avoids a second pass
      * for L. Shape: one char explode into a map-side-combinable
      * (doc, char) census (census rows ≤ docs × alphabet, far smaller
      * than the text itself), then a per-doc agg; no corpus-wide
      * state at all, so it runs at any scale. Entropy rounds to 4
      * decimals (the q73 discipline — summation-order ulps vanish at
      * 4dp). Empty docs have no census rows and drop out.
      *
      * Returns (id, n_chars, n_distinct, char_entropy) in nats.
      */
    def charEntropy(id: String, text: String): DataFrame = {
      val census = floorPartitions(left.select(col(id), col(text)))
        .select(col(id), explode(split(col(text), "")).as("__ch"))
        .groupBy(col(id), col("__ch"))
        .agg(count(lit(1)).as("__c"))
      val L = sum(col("__c")).cast("double")
      census.groupBy(col(id))
        .agg(
          sum(col("__c")).as("n_chars"),
          count(lit(1)).as("n_distinct"),
          round(log(L) -
            sum(col("__c").cast("double") * log(col("__c").cast("double"))) / L,
            4).as("char_entropy"))
    }

    /** Exact equal-frequency bucketing (q83) — assign every row of an
      * integer-valued, BOUNDED-CARDINALITY column (basis-point scores,
      * star ratings, binned token counts — domains of ≤ ~10⁶ distinct
      * values, NOT raw prices/timestamps) to one of `buckets`
      * quantile buckets, exactly and deterministically: bucket =
      * rows_strictly_below × buckets div total, so ties share a
      * bucket and the split replays bit-for-bit in SQL — unlike
      * ntile() (global row window: one reducer sorts the corpus) or
      * approx_percentile (nondeterministic across engines).
      *
      * Shape: one map-side-combinable value census, then ALL ordering
      * work happens on the census — a window over distinct VALUES,
      * bounded by the domain, not the corpus — plus the q78-style
      * 1-row total join. The corpus itself is never globally sorted;
      * at 100 TB the census is the only shuffle. Returns one row per
      * non-empty bucket: (bucket, lo, hi, n_rows); null values are
      * excluded (no rank).
      */
    def quantileBuckets(valueCol: String, buckets: Int): DataFrame = {
      require(buckets >= 2, "quantileBuckets needs at least 2 buckets")
      val census = left.select(col(valueCol).cast("long").as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      val w = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = census.agg(sum(col("__c")).as("__total"))
      census
        .withColumn("__before", coalesce(sum(col("__c")).over(w), lit(0L)))
        .join(tot)
        .withColumn("bucket", expr(s"__before * ${buckets}L div __total"))
        .groupBy(col("bucket"))
        .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
          sum(col("__c")).as("n_rows"))
    }

    /** Vocabulary capping (q81) — the classic LM-preprocessing rewrite:
      * every normalized token whose CORPUS-WIDE frequency is below
      * `minCount` becomes `unk`, bounding the model vocabulary and
      * pooling the long tail into one symbol. Shape: one map-side-
      * combinable token census, the kept vocab as a join frame (at
      * 100 TB the kept side is vocab-sized — frequent tokens only —
      * so AQE broadcasts it; the long TAIL never builds a frame at
      * all, it falls out of the left join as null), then ordered
      * reassembly via a per-document sorted collect. The reassembly
      * shuffles (id, pos, token) rows — corpus-volume, inherent to
      * rewriting against a global census, and partitioned by doc so
      * no reducer sees more than a document. Docs whose every token
      * survives pass through byte-identical.
      *
      * Returns (id, capped_text, n_unk) over the NORMALIZED token
      * stream (the vocab domain — same normalization the census
      * counts).
      */
    def capVocab(id: String, text: String, minCount: Long,
                 unk: String = "<unk>",
                 checkpointDir: Option[String] = None): DataFrame = {
      require(minCount >= 1, "minCount must be positive")
      // materialized once: the census and the join-back probe both
      // read the exploded tokens (the duplicateSpans double-census
      // class — without the break the tokenizer+explode runs twice)
      val toks = lineageBreaker(checkpointDir)(posToks(left, id, text))
      val kept = toks.groupBy(col("__w"))
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= minCount)
        .select(col("__w"))
      capToksAgainstKept(toks, id, kept, unk)
    }

    /** Rewrite against a ONCE-prepared vocabulary
      * ([[Ops.prepareVocab]]) — the rolling-ingest form of
      * [[capVocab]]: new batches (or a stream, via
      * [[graft.streaming.Streams.capVocabStream]]) cap against the
      * frozen kept set without re-censusing the reference corpus.
      * Capping the census corpus itself reproduces `capVocab`
      * bit-for-bit.
      */
    def capVocabAgainst(vocab: PreparedVocab, id: String, text: String): DataFrame =
      capToksAgainstKept(posToks(left, id, text), id, vocab.kept, vocab.unk)

    /** Coverage against a ONCE-prepared gram index
      * ([[Ops.prepareGramIndex]]) — the rolling-ingest form of
      * [[ngramCoverage]]: score new batches (or a stream, via
      * [[graft.streaming.Streams.ngramCoverageStream]]) against the
      * frozen reference without re-hashing it.
      */
    def ngramCoverageAgainst(index: PreparedGramIndex, id: String, text: String): DataFrame =
      coverageAgainstIndex(left, id, text, index)

    /** Data selection via importance resampling (Xie et al., NeurIPS
      * 2023 — the DSIR recipe, the published way to pick "target-like"
      * training data from a big raw crawl at scale): featurize every
      * document as HASHED n-gram bucket counts (unigrams + bigrams
      * into `buckets` buckets — the fixed-dimension trick that makes
      * the distributions corpus-size-free), fit add-one-smoothed
      * bucket distributions over the `target` corpus and over `left`
      * (the raw corpus), weight every raw document by its importance
      * log-ratio `ln w(x) = Σ_b cnt_b(x)·(ln p_target(b) − ln
      * p_raw(b))`, and take the top `k` under GUMBEL-perturbed
      * weights — the standard reservoir-free way to sample k items
      * ∝ w without replacement, made deterministic here by driving
      * the Gumbel noise from the engine's seeded md5 family (the
      * q171/q233 discipline), so the selected set replays
      * bit-for-bit on any engine, any partitioning, any day.
      *
      * §3 portability: bucket counts are exact longs; each ln is one
      * round-12 double; per-document terms `cnt·(lnpT − lnpR)` are
      * single IEEE ops rounded to 12 and summed as exact
      * DECIMAL(38,12) (associative — the seriesLnSum discipline);
      * the Gumbel is `−ln(−ln u)` on `u = (h28 + 0.5)/2²⁸` with the
      * same round-12 treatment; ordering uses the UNROUNDED score
      * (identical IEEE doubles in any engine), output rounds to 6.
      *
      * Scale shape: one gram explode + census per corpus
      * (map-combinable), the two `buckets`-row log-prob tables
      * broadcast onto the per-doc bucket counts (never a corpus
      * shuffle), and the top-k is TakeOrdered (k-bounded, no global
      * window). A document with no grams keeps ln w = 0 and competes
      * on its Gumbel alone (observable, never dropped). Returns the
      * k selected rows: (id, n_grams, lnw, gumbel, score) ordered by
      * (score desc, id).
      */
    def dsirSelect(target: DataFrame, id: String, text: String,
                   k: Int, buckets: Int = 1024, seed: Long = 7L): DataFrame = {
      require(k >= 1, s"dsirSelect: k ($k) must be positive")
      require(buckets >= 2 && buckets <= (1 << 20),
        s"dsirSelect: buckets ($buckets) must be in 2..2^20")
      // r17 optimization round (guide §2.4): the raw-corpus profile is
      // the exact bucket roll-up of the per-document census the scorer
      // needs anyway (count addition is associative), so the raw
      // corpus pays ONE gram explode instead of two; the profiles are
      // value-identical and the selection replays bit-for-bit (the
      // q243 gate re-verifies). Scoring against a separately PREPARED
      // artifact (the serving path) is unchanged.
      val ckp = lineageBreaker(None)
      val docCensus = ckp(dsirGramBuckets(left, Some(id), text, buckets, seed))
      // both profiles stay prepare-time materializations (their 1-row
      // smoothing-total crosses must not leak into the serving plan —
      // the q243 plan lock pins zero keyless joins there)
      val prepared = PreparedDsir(
        ckp(dsirLnp(dsirGramBuckets(target, None, text, buckets, seed),
          buckets, "__lnpt")),
        ckp(dsirLnp(docCensus.groupBy(col("__b")).agg(sum(col("__c")).as("__c")),
          buckets, "__lnpr")),
        buckets, seed, reliable = false)
      dsirScoreFromCensus(left, prepared, id, docCensus)
        .orderBy(col("__score").desc, col(id))
        .limit(k)
        .select(col(id), col("n_grams"),
          round(col("__lnw").cast("double"), 6).as("lnw"),
          round(col("__g"), 6).as("gumbel"),
          round(col("__score"), 6).as("score"))
    }

    /** Score this frame's documents against a once-prepared pair of
      * DSIR bucket distributions ([[Ops.prepareDsir]]) — the
      * rolling-ingest shape of [[dsirSelect]]: the profiles never
      * re-census, each batch (or stream trigger, via
      * [[graft.streaming.Streams.dsirScoreStream]]) pays its own
      * gram explode + two broadcast bucket joins. No top-k — the
      * serving form emits EVERY document's (lnw, gumbel, score) so
      * the caller selects downstream at whatever k the batch needs.
      */
    def dsirScoreAgainst(prepared: PreparedDsir, id: String, text: String): DataFrame =
      dsirScore(left, prepared, id, text)
        .select(col(id), col("n_grams"),
          round(col("__lnw").cast("double"), 6).as("lnw"),
          round(col("__g"), 6).as("gumbel"),
          round(col("__score"), 6).as("score"))

    /** Deterministic mixture sampling — reshape a corpus so category
      * shares match the target integer `parts` (the "data mixture"
      * step of a training pipeline: balance languages, cap a crawl
      * source, up-weight a curated domain). The binding category (the
      * one with the smallest count/parts ratio) keeps ~all its rows;
      * every other category downsamples to match, so the output is the
      * LARGEST corpus with the requested mixture. Categories absent
      * from `parts` are dropped — the domain-filter half of the op.
      *
      * Every decision is integral (basis points, `div`) over a
      * portable row hash, so the kept set is bit-reproducible on any
      * engine and any partitioning — re-running the pipeline
      * tomorrow keeps the SAME rows. Shape: one map-combinable count
      * per category, two broadcast joins of category-sized frames,
      * then a map-side hash-threshold filter — the corpus itself is
      * never shuffled, which is what makes this usable as the first
      * stage over 100 TB. Returns `left`'s rows plus `rate_bp`.
      */
    def mixtureSample(category: String, id: String,
                      parts: Seq[(String, Long)]): DataFrame = {
      require(parts.nonEmpty && parts.forall(_._2 > 0),
        "mixtureSample needs at least one category with positive parts")
      // __scale ≤ min(cnt·10⁴ div p) so __scale·p ≤ cnt·10⁴; bounding
      // parts keeps every intermediate far from Long overflow even at
      // 10¹⁴-row categories (ANSI mode would throw, not wrap — this
      // require turns that into a frontline parameter error)
      require(parts.forall(_._2 <= 1000000L),
        "mixture parts are ratios — values above 1e6 are unsupported")
      val spark = left.sparkSession
      val wdf = spark.createDataFrame(
        java.util.Arrays.asList(parts.map { case (c, p) =>
          org.apache.spark.sql.Row(c, p) }: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__cat", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("__p", org.apache.spark.sql.types.LongType))))
      val counts = left.groupBy(col(category).as("__cat"))
        .agg(count(lit(1)).as("__cnt"))
        .join(broadcast(wdf), Seq("__cat"))
      // scale = min over categories of cnt/parts, in basis points: the
      // binding category's rate lands at 10000 (keep everything). The
      // unpartitioned window runs one task over ≤|parts| rows — the
      // category frame, NOT the corpus — and avoids the 1-row
      // cross-join a separate scalar aggregate would need.
      val w = Window.partitionBy()
      val rates = counts
        .withColumn("__scale", min(expr("__cnt * 10000L div __p")).over(w))
        .select(col("__cat").as(category),
          least(lit(10000L), expr("__scale * __p div __cnt")).as("rate_bp"))
      left.join(broadcast(rates), Seq(category))
        .filter(pmod(graft.util.Portable.portableHash64(col(id).cast("string")),
          lit(10000L)) < col("rate_bp"))
    }

    /** Approximate per-category token-budget cap — "no source may
      * contribute more than `budgetTokens` tokens", the hard-cap
      * variant of [[mixtureSample]] (rates from token mass instead of
      * row counts). A category whose total token count is under
      * budget keeps everything; an over-budget category downsamples
      * to ~budget tokens via the same integral basis-point rate over
      * the portable row hash — approximate (sampling noise around the
      * budget), deterministic, and engine-portable. The truly-exact
      * alternative (order rows, running cumsum, cut at the budget) is
      * a per-category sequential window — one reducer per hot
      * category at 100 TB; the rate form is one map-combinable sum
      * plus a map-side filter, and the corpus is never shuffled.
      * Returns `left`'s kept rows plus `rate_bp`.
      */
    def capTokensPerCategory(category: String, id: String, tokenCount: Column,
                             budgetTokens: Long): DataFrame = {
      require(budgetTokens > 0 && budgetTokens <= Long.MaxValue / 10000L,
        s"budgetTokens must be in 1..${Long.MaxValue / 10000L} " +
          "(the basis-point rate is computed as budgetTokens * 10000)")
      val totals = left
        .groupBy(col(category))
        .agg(sum(tokenCount.cast("long")).as("__tot"))
      val rates = totals.select(col(category),
        least(lit(10000L), expr(s"${budgetTokens}L * 10000L div __tot")).as("rate_bp"))
      left.join(broadcast(rates), Seq(category))
        .filter(pmod(graft.util.Portable.portableHash64(col(id).cast("string")),
          lit(10000L)) < col("rate_bp"))
    }

    /** Bigram language-model quality score (the generalized q73) —
      * the CCNet/Gopher-style "perplexity filter": train an add-k
      * bigram LM on the corpus itself, score every document by its
      * average bigram log-likelihood, and the outliers (gibberish,
      * wrong-language, boilerplate soup) surface as high perplexity.
      * P(w₂|w₁) = (C(w₁w₂)+k) / (C(w₁·)+k·V), where C(w₁·) is the
      * bigram-prefix count and V the continuation vocabulary size.
      *
      * Scale shape: one corpus tokenize (the exploded bigram stream is
      * lineage-broken — census and scoring both read it), a
      * map-combinable bigram census, prefix counts and V DERIVED from
      * the census (vocab-sized inputs, no corpus rescan), then
      * gram-keyed joins back to the stream — never doc×vocab, and the
      * 1-row V frame broadcasts onto the VOCAB-sized prefix frame,
      * not the corpus. Determinism across engines: counts are exact
      * integers; ln/avg are the only float steps and land ~1e-13
      * apart worst-case between libms, so rounding avg_logp to 4
      * decimals (spacing 1e-4) makes the hash safe; ppl is exp of the
      * ALREADY-rounded average. Docs with < 2 tokens have no bigram
      * and are dropped. Returns (id, n_bigrams, avg_logp, ppl).
      */
    def lmScore(id: String, text: String, addK: Int = 1,
                checkpointDir: Option[String] = None): DataFrame = {
      require(addK >= 1, "addK must be a positive integer (add-k smoothing)")
      val toks = tokens(col(text))
      val pairs = zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      val bg = lineageBreaker(checkpointDir)(
        floorPartitions(left.select(col(id), col(text)))
          .withColumn("__toks", toks)
          .filter(size(col("__toks")) >= 2)
          .select(col(id), explode(pairs).as("__bg"))
          .select(col(id), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2")))
      val c2 = bg.groupBy(col("__w1"), col("__w2"))
        .agg(count(lit(1)).as("__c2"))
      val c1 = c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
      val v = c2.select(countDistinct(col("__w2")).as("__v"))
      val c1v = c1.join(broadcast(v)) // 1 row × vocab rows, not corpus
      val logp = log((col("__c2") + lit(addK.toLong)).cast("double") /
        (col("__c1") + lit(addK.toLong) * col("__v")).cast("double"))
      bg.join(c2, Seq("__w1", "__w2"))
        .join(c1v, Seq("__w1"))
        .groupBy(col(id))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(logp), 4).as("avg_logp"))
        .withColumn("ppl", round(exp(-col("avg_logp")), 2))
    }

    /** Interpolated Kneser–Ney bigram perplexity scoring (Kneser &
      * Ney, ICASSP 1995; the Chen & Goodman 1999 interpolated form —
      * r17: the PRODUCTION quality-filter LM beside [[lmScore]]'s
      * add-k baseline; CCNet-style filtering actually ships KN-
      * smoothed models because add-k systematically over-penalizes
      * unseen continuations of frequent prefixes):
      * `P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·) + λ(w₁)·P_cont(w₂)`
      * with `λ(w₁) = D·N₁₊(w₁·)/c(w₁·)` and the CONTINUATION
      * probability `P_cont(w₂) = N₁₊(·w₂)/N₁₊(··)` — "how many
      * distinct contexts does w₂ complete", the fix for the
      * "san FRANCISCO" pathology. The discount estimates from the
      * count-of-counts, `D = n₁/(n₁ + 2n₂)` (the standard estimate).
      *
      * §3: every count is an exact long census of the corpus; D is
      * ONE double division; each bigram's probability is a fixed
      * IEEE op chain, its ln rounded to 12 and the per-doc sum
      * exact DECIMAL(38,12) (the seriesLnSum discipline — stronger
      * than q73's round-4 average, and what makes the oracle replay
      * hash-exact). P > 0 always: λ > 0 (D > 0, N₁₊(w₁·) ≥ 1) and
      * P_cont > 0 for any seen w₂.
      *
      * Scale shape: one bigram explode (lineage-broken, census and
      * scoring both read it), map-combinable censuses, the 1-row
      * discount/total frames cross onto the VOCAB-sized type table
      * (the q48 shape — never the corpus), gram-keyed hash joins
      * back. Returns (id, n_bigrams, avg_logp round 4, ppl round 2)
      * — [[lmScore]]'s shape, directly comparable.
      */
    def knLmScore(id: String, text: String,
                  checkpointDir: Option[String] = None): DataFrame = {
      val toks = tokens(col(text))
      val pairs = zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      val bg = lineageBreaker(checkpointDir)(
        floorPartitions(left.select(col(id), col(text)))
          .withColumn("__toks", toks)
          .filter(size(col("__toks")) >= 2)
          .select(col(id), explode(pairs).as("__bg"))
          .select(col(id), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2")))
      val c2 = bg.groupBy(col("__w1"), col("__w2"))
        .agg(count(lit(1)).as("__c2"))
      val c1 = c2.groupBy(col("__w1"))
        .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__n1p"))
      val nc = c2.groupBy(col("__w2")).agg(count(lit(1)).as("__nc"))
      val sc = c2.agg(count(lit(1)).as("__nt"),
        sum(when(col("__c2") === 1, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__c2") === 2, 1L).otherwise(0L)).as("__n2"))
      val dd = sc.select(col("__nt"),
        when(col("__n1") + lit(2L) * col("__n2") > 0,
          col("__n1").cast("double") /
            (col("__n1") + lit(2L) * col("__n2")).cast("double"))
          .otherwise(lit(0.5)).as("__d"))
      import org.apache.spark.sql.types.DecimalType
      val lnp = round(log(
        greatest(col("__c2").cast("double") - col("__d"), lit(0.0)) /
          col("__c1").cast("double") +
          (col("__d") * col("__n1p").cast("double") / col("__c1").cast("double")) *
            (col("__nc").cast("double") / col("__nt").cast("double"))), 12)
      val pl = c2.join(c1, Seq("__w1")).join(nc, Seq("__w2"))
        .crossJoin(broadcast(dd)) // 1 row × vocab rows, not corpus
        .select(col("__w1"), col("__w2"), lnp.as("__lnp"))
      bg.join(pl, Seq("__w1", "__w2"))
        .groupBy(col(id))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("__lnp").cast(DecimalType(38, 12))).as("__s"))
        .withColumn("avg_logp", round(
          col("__s").cast("double") / col("n_bigrams").cast("double"), 4))
        .withColumn("ppl", round(exp(-col("avg_logp")), 2))
        .select(col(id), col("n_bigrams"), col("avg_logp"), col("ppl"))
    }

    /** Score this frame against a once-trained [[PreparedLm]] — the
      * rolling-ingest shape of [[lmScore]]: the census never re-runs,
      * each batch pays only its own bigram explode plus vocab-sized
      * hash joins. Unseen bigrams hit the add-k floor (≈ −ln V per
      * bigram), so out-of-distribution text surfaces as maximal
      * perplexity. Streaming form:
      * [[graft.streaming.Streams.lmScoreStream]].
      */
    def lmScoreAgainst(lm: PreparedLm, id: String, text: String): DataFrame =
      scoreAgainstLm(left, id, text, lm)

    /** Score this frame against a once-trained [[PreparedKnLm]] —
      * the rolling-ingest shape of [[knLmScore]] (same contract as
      * [[lmScoreAgainst]]; OOV text degrades to the documented
      * floors instead of re-censusing anything). Streaming form:
      * [[graft.streaming.Streams.knLmScoreStream]].
      */
    def knLmScoreAgainst(kn: PreparedKnLm, id: String, text: String): DataFrame =
      scoreAgainstKnLm(left, id, text, kn)

    /** Okapi BM25 ranked retrieval (q90) — full-text search over the
      * corpus: for each row of `queries`, the top-k documents by
      * BM25(k1, b) over the normalized token stream. This is the
      * RANKED retrieval the pipeline's set-based text ops don't
      * express: decontamination (q58) and coverage (q82) ask "does
      * this text overlap the reference"; BM25 answers "which
      * documents best match this query" — the retrieval primitive
      * behind eval-set mining, prompt-source attribution, and
      * corpus exploration. One-shot form: builds the index inline
      * ([[Ops.prepareBm25]]) and scores against it; production uses
      * `prepareBm25` + [[bm25TopKAgainst]] to index once and serve
      * many query batches. Returns (queryId, rank, id, score),
      * rank 1..k by (score DESC, id).
      */
    def bm25TopK(queries: DataFrame, queryId: String, queryText: String,
                 id: String, text: String, k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75,
                 checkpointDir: Option[String] = None): DataFrame =
      bm25Against(queries, queryId, queryText,
        prepareBm25(left, id, text, checkpointDir), k, k1, b)

    /** Ranked retrieval against a ONCE-prepared BM25 index
      * ([[Ops.prepareBm25]]) — `left` is the QUERY frame here: the
      * index-once/query-many form (and the foreachBatch core of
      * [[graft.streaming.Streams.bm25TopKStream]]).
      */
    def bm25TopKAgainst(index: PreparedBm25, queryId: String, queryText: String,
                        k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
      bm25Against(left, queryId, queryText, index, k, k1, b)

    /** PMI collocations (the generalized q77) — the phrase-mining
      * pass a tokenizer-vocabulary build runs over the corpus:
      * pointwise mutual information of adjacent token pairs,
      * PMI(w₁,w₂) = ln( (c₂/B) / ((c(w₁)/T)·(c(w₂)/T)) ), where c₂
      * is the bigram count, B total bigrams, c unigram counts, T
      * total tokens. High-PMI pairs ("machine learning", "new york")
      * are multi-word units worth single vocabulary slots; the
      * `minCount` floor kills the noisy log of rare pairs.
      *
      * Scale shape: one tokenize of the corpus (lineage-broken — the
      * unigram and bigram censuses both read it), two map-combinable
      * censuses, totals reduced into ONE 1-row frame (a 1×1 keyless
      * join of two scalar aggregates) broadcast onto the VOCAB-sized
      * bigram frame, then gram-keyed hash joins for the unigram
      * counts — never doc×vocab. Counts are exact integers; the one
      * ln rounds to 4 decimals so DuckDB replays the hash exactly.
      */
    def collocations(id: String, text: String, minCount: Long = 20L,
                     checkpointDir: Option[String] = None): DataFrame = {
      require(minCount >= 1, "minCount must be positive")
      val toks = tokens(col(text))
      val stream = lineageBreaker(checkpointDir)(
        floorPartitions(left.select(col(id), col(text)))
          .withColumn("__toks", toks)
          .select(col(id), col("__toks")))
      val uni = stream
        .select(explode(col("__toks")).as("__w"))
        .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      val pairs = zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      val bg = stream
        .filter(size(col("__toks")) >= 2)
        .select(explode(pairs).as("__bg"))
        .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)
      val totals = uni.agg(sum(col("__c")).as("__t"))
        .join(bg.agg(sum(col("n")).as("__b"))) // 1×1 keyless join
      bg.join(broadcast(totals))
        .join(uni.select(col("__w").as("w1"), col("__c").as("__c1")), Seq("w1"))
        .join(uni.select(col("__w").as("w2"), col("__c").as("__c2")), Seq("w2"))
        .withColumn("pmi", round(
          // each factor cast to double BEFORE multiplying: T² at a
          // 10¹³-token corpus overflows Long but is exact-enough in
          // IEEE doubles (identical bit-for-bit in DuckDB — double
          // mult/div is fully specified; only ln needs the rounding)
          log(col("n").cast("double") * col("__t").cast("double") * col("__t").cast("double") /
            (col("__b").cast("double") * col("__c1").cast("double") * col("__c2").cast("double"))), 4))
        .select(col("w1"), col("w2"), col("n"), col("pmi"))
    }

    /** Per-document repetition statistics — the Gopher-style quality
      * signals that catch degenerate machine-generated text: the
      * share of the document taken by its single most frequent token
      * (`top_token_frac`) and the fraction of duplicated word bigrams
      * (`dup_bigram_frac`). Pure map-side expression work over the
      * projected token array (no explode, no shuffle): bigrams are a
      * zip_with of two shifted slices; the top-token count is the
      * longest equal-run of the SORTED token array (one aggregate
      * fold — O(n log n) per row, vs the O(distinct · n)
      * count-each-distinct form this replaced: ~3× faster at sf0.1;
      * the value is identical, so the oracle keeps the simple
      * per-distinct counting). Documents with < 2 tokens are dropped
      * (no bigram is defined). Fractions are rounded to 6 decimals so
      * downstream threshold filters are engine-portable.
      */
    def repetitionStats(id: String, text: String): DataFrame = {
      val len1 = size(col("__toks")) - 1
      val topRun = aggregate(
        array_sort(col("__toks")),
        struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      left
        .select(col(id), tokens(col(text)).as("__toks"))
        .filter(size(col("__toks")) >= 2)
        .withColumn("__bg", zip_with(
          slice(col("__toks"), lit(1), len1),
          slice(col("__toks"), lit(2), len1),
          (a, b) => concat(a, lit(" "), b)))
        .select(col(id),
          size(col("__toks")).cast("long").as("n_tokens"),
          round(topRun.cast("double") / size(col("__toks")), 6).as("top_token_frac"),
          round(lit(1.0) - size(array_distinct(col("__bg"))).cast("double")
            / size(col("__bg")), 6).as("dup_bigram_frac"))
    }

    /** Per-column data profile — row count, null count, approximate
      * distinct (HLL), min/max rendered as strings, for numeric
      * columns deterministic p50/p95 sketches (the
      * `portable_quantiles` adaptive power-of-two census —
      * partitioning-invariant, ~range/4096 resolution), and for string
      * columns the exact-below-cap top-`topK` values with counts
      * ("item:cnt", comma-joined; the Misra–Gries [[topkSketch]]
      * aggregate, bounded memory) — the census a pipeline runs before
      * accepting a new corpus drop. ONE pass: every per-column
      * aggregate, sketches included, lives in a single Aggregate
      * operator (map-side combinable, schema-bounded expression
      * count), and the one-row result reshapes to a row per column —
      * never a job-per-column driver loop, so profiling 100 TB costs
      * one scan. min/max apply to atomic and array types; other types
      * (maps) report null bounds.
      *
      * Columns are addressed POSITIONALLY (a `toDF` rename to
      * synthetic names, aggregate aliases keyed by field index): a
      * user column named `a.b` or carrying backticks would otherwise
      * parse as a struct path somewhere in the aggregate/alias
      * round-trip.
      */
    def profile(topK: Int = 5): DataFrame = {
      val fields = left.schema.fields.toSeq
      require(fields.nonEmpty, "profile() needs at least one column")
      graft.functions.GraftFunctions.register(left.sparkSession)
      def orderable(f: org.apache.spark.sql.types.StructField): Boolean =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType)
      val renamed = left.toDF(fields.indices.map(i => s"__c$i"): _*)
      val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(s"__c$i")
        val mn = if (orderable(f)) min(c).cast("string") else lit(null).cast("string")
        val mx = if (orderable(f)) max(c).cast("string") else lit(null).cast("string")
        val tk = f.dataType match {
          case org.apache.spark.sql.types.StringType =>
            concat_ws(",", transform(topkSketch(c, topK),
              s => concat(s.getField("item"), lit(":"), s.getField("cnt"))))
          case _ => lit(null).cast("string")
        }
        // numeric columns additionally sketch p50/p95 through the
        // deterministic portable_quantiles census (r11) — still the
        // one Aggregate, adaptive power-of-two resolution so no
        // per-column width knob is needed
        val pq = f.dataType match {
          case _: org.apache.spark.sql.types.NumericType =>
            call_function("portable_quantiles", c.cast("double"), lit(0.5), lit(0.95))
          case _ => lit(null).cast("array<double>")
        }
        // the PORTABLE HLL aggregate (r10), not approx_count_distinct:
        // same single-Aggregate plan, but the estimates are the
        // engine-reproducible q43 numbers instead of Spark-private
        // HLL++ internals
        Seq(count(c).as(s"__nn_$i"),
          call_function("portable_hll", c.cast("string"), lit(12)).as(s"__ad_$i"),
          mn.as(s"__mn_$i"), mx.as(s"__mx_$i"), tk.as(s"__tk_$i"),
          pq.as(s"__pq_$i"))
      } :+ count(lit(1)).as("__rows")
      renamed.agg(aggs.head, aggs.tail: _*)
        .select(col("__rows"), explode(array(fields.zipWithIndex.map { case (f, i) => struct(
          lit(f.name).as("column"),
          lit(f.dataType.simpleString).as("type"),
          col(s"__nn_$i").as("non_null"),
          col(s"__ad_$i").as("approx_distinct"),
          col(s"__mn_$i").as("min"),
          col(s"__mx_$i").as("max"),
          col(s"__tk_$i").as("top_values"),
          col(s"__pq_$i").getItem(0).as("p50"),
          col(s"__pq_$i").getItem(1).as("p95")) }: _*)).as("__c"))
        .select(col("__c.column"), col("__c.type"),
          col("__rows").as("n_rows"), col("__c.non_null"),
          (col("__rows") - col("__c.non_null")).as("n_null"),
          col("__c.approx_distinct"), col("__c.min"), col("__c.max"),
          col("__c.top_values"), col("__c.p50"), col("__c.p95"))
    }

    /** Token-window chunking — split each document into
      * `chunkTokens`-token windows that overlap by `overlap` tokens
      * (the preprocessing step in front of embedding models and
      * context-window-bounded consumers). Chunk starts advance by
      * `chunkTokens - overlap`; the last window may be short; a
      * document at or under one window emits exactly one chunk. All
      * integer arithmetic + array slicing (map-side explode; the only
      * data growth is the intended ~1/(1-overlap/chunk) duplication),
      * so the DuckDB oracle replays chunk boundaries and text
      * bit-for-bit. Returns (id, chunk_id, n_tokens, chunk_text);
      * empty docs drop.
      */
    def chunkTokens(id: String, text: String,
                    chunkTokens: Int, overlap: Int): DataFrame = {
      require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
        s"need 0 <= overlap ($overlap) < chunkTokens ($chunkTokens)")
      val step = chunkTokens - overlap
      left
        .select(col(id), tokens(col(text)).as("__toks"))
        .withColumn("__n", size(col("__toks")))
        .filter(col("__n") > 0)
        // both branches non-negative: Spark `div` truncates toward
        // zero while DuckDB `//` floors, so negatives must never
        // reach the division
        .withColumn("__chunks", when(col("__n") <= chunkTokens, lit(1L))
          .otherwise(lit(1L) + expr(s"(__n - $chunkTokens + ${step - 1}) div $step")))
        .select(col(id), explode(sequence(lit(0L), col("__chunks") - 1)).as("chunk_id"),
          col("__toks"))
        // the int cast cannot overflow: chunk_id*step+1 ≤ __n by the
        // __chunks construction, and __n = size(array) is int-bounded
        // (Spark arrays are int-indexed); ANSI mode would throw — not
        // wrap — if the invariant were ever violated
        .withColumn("__slice",
          slice(col("__toks"), (col("chunk_id") * step + 1).cast("int"), lit(chunkTokens)))
        .select(col(id), col("chunk_id"),
          size(col("__slice")).cast("long").as("n_tokens"),
          concat_ws(" ", col("__slice")).as("chunk_text"))
    }

    /** Bloom-prefiltered semi-join: result identical to
      * `left SEMI JOIN right ON leftKey = rightKey` — the bloom pass
      * only removes rows, and its false positives are eliminated by
      * the exact semi-join behind it. The 100 TB point: Spark plans a
      * broadcast semi-join only when the right side fits the
      * broadcast threshold as a full hash relation; in the middle
      * regime (right side of millions of keys — too big to
      * broadcast, far smaller than the left), the distributed
      * `bloom_agg` build costs one scan of the right side, the
      * one-row bloom broadcasts in a few MB, and the huge left side
      * drops most non-matching rows MAP-SIDE before paying the
      * semi-join shuffle. Same mechanism as Spark's own
      * InjectRuntimeFilter — the bloom reaches the probe side as a
      * SCALAR SUBQUERY (`might_contain` requires a constant or
      * scalar-subquery bloom): the one-row build executes first and
      * its result is inlined as a runtime literal into the scan
      * filter. Requires `GraftFunctions.register(spark)` (done
      * internally).
      */
    def bloomSemiJoin(right: DataFrame, leftKey: String, rightKey: String,
                      expectedItems: Long = 1000000L,
                      numBits: Long = 8L * 1024 * 1024): DataFrame = {
      graft.functions.GraftFunctions.register(left.sparkSession)
      val bloom = right.agg(
        call_function("bloom_agg", xxhash64(col(rightKey)),
          lit(expectedItems), lit(numBits)).as("__bf")).scalar()
      // no distinct on the build side: semi-join semantics already
      // collapse duplicate build keys, a pre-distinct would only add
      // a full extra shuffle of the right side (VERDICT r6 #2)
      left
        .filter(call_function("bloom_contains", bloom, xxhash64(col(leftKey))))
        .join(right.select(col(rightKey).as(leftKey)), Seq(leftKey), "left_semi")
    }

    /** Brute-force cosine top-k against a bounded query set: the query
      * side is broadcast, the corpus side streams partitioned — one
      * scan, no shuffle except the per-query top-k window. Requires
      * `GraftFunctions.register(spark)`. Returns (qid, rank, vid, score).
      */
    def cosineTopK(queries: DataFrame, id: String, emb: String,
                   queryId: String, queryEmb: String, k: Int): DataFrame = {
      val q = queries.select(col(queryId).as("qid"),
        col(queryEmb).cast("array<double>").as("__qe"))
      val c = left.select(col(id).as("vid"), col(emb).cast("array<double>").as("__ce"))
      val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vid"))
      c.join(broadcast(q), col("vid") =!= col("qid"))
        .withColumn("score", call_function("cosine_sim", col("__qe"), col("__ce")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("vid"), col("score"))
    }

    /** Product-quantization encode (q91) — compress the embedding
      * column to `m` code bytes per vector
      * ([[graft.functions.ProductQuantizer]]: 64-float × m=8 → 32×
      * smaller) while keeping ADC distance ranking. Pure map-side
      * codegen (dim·ks multiplications per row, zero shuffle); the
      * coded frame is the PREPARED index of [[pqTopKAgainst]] —
      * encode the corpus once, serve query batches against the
      * codes. Default codebooks are the portable seeded grid scaled
      * by `scale` (≈ one coordinate σ; 1/√dim for unit vectors);
      * production passes trained per-subspace k-means codebooks via
      * `codebooks` (the operator is codebook-agnostic, as ivfTopK is
      * centroid-agnostic). Returns (id, pq_code array<int> length m).
      */
    def pqEncode(id: String, emb: String, dim: Int,
                 m: Int = 8, ks: Int = 16, seed: String = "7",
                 scale: Double = 0.125,
                 codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
      require(m >= 1 && dim % m == 0, s"pqEncode: dim=$dim must divide into m=$m subspaces")
      require(ks >= 2 && ks <= 256, "pqEncode: ks must be in [2, 256] (code bytes)")
      val cbs = codebooks.getOrElse(
        graft.functions.ProductQuantizer.codebooks(m, ks, dim / m, seed, scale))
      require(cbs.length == m && cbs.forall(e => e.length == ks && e.forall(_.length == dim / m)),
        s"pqEncode: codebooks must be m=$m × ks=$ks × subDim=${dim / m}")
      left.select(col(id),
        graft.functions.ProductQuantizer.encode(col(emb).cast("array<double>"), cbs)
          .as("pq_code"))
    }

    /** PQ asymmetric-distance top-k (q91) — rank the corpus for each
      * query by ADC over the coded vectors: the query computes one
      * m×ks distance table, every corpus vector costs m lookups + m
      * adds (independent of dim). One-shot form: encodes `left`
      * inline and scans the codes with the (tiny) query frame
      * broadcast — the corpus never shuffles, the scan is
      * output-bound, and per-query ranking is STAGED
      * (per-doc-hash-shard then global, the q79/bm25 discipline).
      * The exact-vs-ADC quality trade is spec territory
      * (PqSpec recall vs cosineTopK); at 100 TB the point is the
      * codes table is 32× smaller than the embeddings — it fits
      * where the raw vectors don't, and composes with IVF routing
      * (encode within cells) for the standard IVF-PQ layout.
      * Returns (qid, rank, vid, adc_dist), rank 1..k by
      * (adc_dist ASC, vid), self-pairs (vid == qid) excluded as in
      * [[cosineTopK]].
      */
    def pqTopK(queries: DataFrame, queryId: String, queryEmb: String,
               id: String, emb: String, dim: Int,
               m: Int = 8, ks: Int = 16, k: Int = 10,
               seed: String = "7", scale: Double = 0.125,
               codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame =
      new GraftDataFrameOps(pqEncode(id, emb, dim, m, ks, seed, scale, codebooks))
        .pqTopKAgainst(queries, queryId, queryEmb, id, dim, m, ks, k, seed, scale, codebooks)

    /** ADC top-k against a ONCE-encoded corpus ([[pqEncode]]) —
      * `left` is the (id, pq_code) frame here: the encode-once/
      * query-many form. The codebooks regenerate from (seed, dim,
      * m, ks), so only the codes ship.
      */
    def pqTopKAgainst(queries: DataFrame, queryId: String, queryEmb: String,
                      id: String, dim: Int, m: Int = 8, ks: Int = 16,
                      k: Int = 10, seed: String = "7", scale: Double = 0.125,
                      codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
      require(m >= 1 && dim % m == 0, s"pqTopKAgainst: dim=$dim must divide into m=$m subspaces")
      require(k >= 1, "pqTopKAgainst: k must be positive")
      val cbs = codebooks.getOrElse(
        graft.functions.ProductQuantizer.codebooks(m, ks, dim / m, seed, scale))
      val q = queries.select(col(queryId).as("qid"),
        graft.functions.ProductQuantizer
          .distanceTable(col(queryEmb).cast("array<double>"), cbs).as("__dt"))
      val scored = left.select(col(id).as("vid"), col("pq_code"))
        .join(broadcast(q), col("vid") =!= col("qid"))
        .withColumn("adc_dist",
          graft.functions.ProductQuantizer.adc(col("pq_code"), col("__dt")))
      val w1 = Window.partitionBy(col("qid"), col("__shard"))
        .orderBy(col("adc_dist"), col("vid"))
      val w2 = Window.partitionBy(col("qid")).orderBy(col("adc_dist"), col("vid"))
      scored
        .withColumn("__shard", pmod(xxhash64(col("vid").cast("string")), lit(64)))
        .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
        .withColumn("rank", row_number().over(w2).cast("long"))
        .filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("vid"), col("adc_dist"))
    }
  }
}

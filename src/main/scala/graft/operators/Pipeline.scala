package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.Ops._
import graft.functions.TextFunctions._
import graft.sources.Tables
import graft.util.Portable._

/** q55: the end-to-end training-data **curation pipeline** — the
  * composition the individual operator families exist for, as one
  * declarative plan:
  *
  *   1. quality gate (q40's composite score ≥ 0.5),
  *   2. exact dedup (q31's normalized-md5 fingerprint, keep min id),
  *   3. near-dup removal (drop the larger id of every q33-style
  *      MinHash-LSH-verified pair among the survivors — the banding
  *      path, whose bucket keys cannot skew like min-shingle blocks),
  *   4. deterministic stratified sampling (q49's portable-hash
  *      buckets × per-source rates).
  *
  * Each stage is shuffle-minimal on its own (window over the
  * fingerprint, blocked pair join, map-side sampling) and the whole
  * chain is one lazy plan — Catalyst pushes the quality gate beneath
  * everything downstream, so later stages only ever see survivors.
  */
object Pipeline {

  def q55(t: Tables): DataFrame = {
    // tokens projected ONCE: the expression is referenced 3× (count,
    // stopwords, score), so CollapseProject keeps the projection and
    // the split+filter runs once per row instead of three times
    val nChars = length(col("text")).cast("double")
    val nTokens = size(col("__toks")).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double")
    val nStop = size(filter(col("__toks"), x => x.isin("the", "a", "of", "and"))).cast("double")
    val score =
      lit(0.5) * least(nChars / lit(500.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - nPunct / nChars) +
      lit(0.2) * (nStop / nTokens)

    val gated = t.documents
      .withColumn("__toks", filter(split(col("text"), " "), x => x =!= ""))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("quality_score", round(score, 6))
      .filter(col("quality_score") >= 0.5)
      .drop("__toks")

    val w = Window.partitionBy(col("fingerprint"))
    // materialized once: both the near-dup pair join (via its own
    // shingle checkpoint) and the final anti-join read this leg —
    // without the checkpoint the scan+score+fingerprint window runs
    // twice (self-join-on-derived-table rule, see memory/VERDICT r1)
    val exactKept = gated
      .withColumn("fingerprint", md5(normText(col("text")).cast("binary")))
      .withColumn("min_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("min_id"))
      .drop("min_id", "fingerprint")
      .localCheckpoint(true)

    val dropped = exactKept.minhashLshPairs("doc_id", "text", threshold = 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    val survivors = exactKept.join(dropped, Seq("doc_id"), "left_anti")

    val bucket = pmod(portableHash64(col("doc_id").cast("string")), lit(100))
    val rate = when(col("source").isin("src0", "src1"), 50)
      .when(col("source").isin("src2", "src3"), 20)
      .otherwise(10)
    survivors
      .filter(bucket < rate)
      .select(col("doc_id"), col("source"), col("quality_score"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q57: **sharded sequence packing** — the step between curation and
    * the trainer: assign each document a token-offset position inside
    * its shard and derive the training-sequence pack it starts in
    * (`pack_id = start_offset div budget`). Shards come from the
    * portable id hash, so the running-sum window is partitioned — the
    * shard count is the parallelism knob (a 100 TB corpus packs with
    * thousands of shards; a single global cumsum would be one task).
    * Deterministic on any engine/partitioning: hash, order and sum are
    * all portable, which is how the DuckDB oracle replays it exactly.
    * Output: one row per (shard, pack) with doc count, token total and
    * the id range.
    */
  def q57(t: Tables): DataFrame = {
    val bpePat = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
    t.documents
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit(bpePat), lit(0))).cast("long").as("n_tokens"))
      .packSequences("doc_id", col("n_tokens"), budgetTokens = 2048L, shards = 8)
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** q63: **mixture sampling** ([[graft.api.Ops]].mixtureSample) —
    * reshape the corpus to a target language mixture, here equal
    * parts per language (the "balance the corpus" step between
    * curation and training). The synthetic corpus is ~44% English;
    * the op downsamples every language to the binding class's level
    * with integral basis-point rates over the portable row hash, so
    * the DuckDB oracle replays the exact kept set: counts, the
    * min(cnt·10⁴ div parts) scale, the per-class rate and the hash
    * threshold are all integer arithmetic. Scale shape: the corpus is
    * never shuffled — one tiny count agg plus two broadcast joins,
    * then a map-side filter.
    */
  def q63(t: Tables): DataFrame = {
    val parts = Seq("en" -> 1L, "de" -> 1L, "es" -> 1L, "fr" -> 1L, "zh" -> 1L)
    t.documents
      .mixtureSample("lang", "doc_id", parts)
      .select(col("doc_id"), col("lang"), col("rate_bp"))
      .orderBy(col("doc_id"))
  }

  /** q67: **per-source token-budget cap**
    * ([[graft.api.Ops]].capTokensPerCategory) — no source may
    * contribute more than ~1300 tokens, the hard-cap companion to
    * q63's share-based mixture. Sources under budget keep every
    * document (rate 10000); over-budget sources downsample to the
    * budget with the integral basis-point rate over the portable row
    * hash, replayed exactly by the oracle. One map-combinable token
    * sum + a broadcast of 20 rates + a map-side filter — the corpus
    * never shuffles, unlike the exact-cumsum formulation whose
    * per-category window would serialize a hot source onto one
    * reducer.
    */
  def q67(t: Tables): DataFrame =
    t.documents
      .withColumn("__toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .drop("__toks")
      .capTokensPerCategory("source", "doc_id", col("n_tokens"), budgetTokens = 1300L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("rate_bp"))
      .orderBy(col("doc_id"))

  /** q68: **token-window chunking** ([[graft.api.Ops]].chunkTokens) —
    * 64-token windows overlapping by 16 (the embedding-model
    * preprocessing shape). Chunk starts advance by 48; boundaries and
    * chunk text are integer arithmetic + array slices, replayed
    * bit-for-bit by the oracle. Map-side explode, ~1.33× intended
    * data growth, no shuffle but the output sort.
    */
  def q68(t: Tables): DataFrame =
    t.documents
      .chunkTokens("doc_id", "text", chunkTokens = 64, overlap = 16)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** q72: **deterministic training-shard shuffle**
    * ([[graft.api.Ops]].shuffleShards) — deal the corpus into 16
    * globally-shuffled shards with a seeded portable permutation, the
    * step that materializes training shards after curation. Shard
    * assignment and within-shard rank are md5 arithmetic end-to-end,
    * so the DuckDB oracle replays the exact deal (assignment AND
    * order); one hash shuffle + per-shard sort, window partitioned by
    * shard (no global ordering task).
    */
  def q72(t: Tables): DataFrame =
    t.documents
      .shuffleShards("doc_id", shards = 16, seed = 7L)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy(col("shard"), col("shard_pos"))

  /** q74: **deterministic train/val/test split**
    * ([[graft.api.Ops]].splitCorpus) — 90/5/5 by seeded hash bucket,
    * reported as per-(source, split) counts. The assignment is pure
    * map-side integer arithmetic on (seed, doc_id), so the oracle
    * replays it bit-for-bit and the held-out set is provably stable
    * under corpus growth (the property q58's decontamination check
    * depends on).
    */
  def q74(t: Tables): DataFrame =
    t.documents
      .splitCorpus("doc_id",
        Seq(("train", 9000L), ("val", 500L), ("test", 500L)), seed = 11L)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))

  /** q79: **exact-k per-group sampling**
    * ([[graft.api.Ops]].samplePerGroup) — exactly 5 documents from
    * every source by seeded portable hash rank: the balanced-subset
    * deal (per-domain caps, eval panels) that rate-based q49 can't
    * express. The two-stage rank keeps every reducer's sort bounded
    * (never a whole group on one task); the oracle replays the
    * md5 rank directly — the staged plan is output-identical to the
    * one-window spec by the top-k-survives-sub-sharding argument.
    */
  def q79(t: Tables): DataFrame =
    t.documents
      .samplePerGroup("source", "doc_id", k = 5, seed = 13L)
      .select(col("doc_id"), col("source"), col("sample_rank"))
      .orderBy(col("source"), col("sample_rank"))

  /** q95: WEIGHTED exact-k per-source sampling
    * ([[graft.api.Ops.GraftDataFrameOps.weightedSamplePerGroup]]) —
    * 50 docs per source drawn ∝ n_chars (the token-budget-
    * proportional subset q79's uniform draw can't express). The
    * exponential keys are pure md5 + ln arithmetic, so the oracle
    * recomputes every key and replays the race rank-for-rank.
    */
  def q95(t: Tables): DataFrame =
    t.documents
      .weightedSamplePerGroup("source", "doc_id", col("n_chars"), k = 50, seed = 17L)
      .select(col("doc_id"), col("source"), col("n_chars"), col("sample_rank"))
      .orderBy(col("source"), col("sample_rank"))

  /** q58: **train/eval decontamination** — find training documents
    * that leak benchmark content, the check every serious training
    * corpus runs before a model ships. Shape: distinct 8-gram hashes
    * per document on both sides, inverted-index equi-join on the gram
    * hash (never doc×doc), count shared grams per (train, eval) pair,
    * report pairs sharing ≥ 5 grams with the eval-side overlap
    * fraction. The eval set here is the first 20 documents re-uploaded
    * verbatim under new ids — the realistic "benchmark ended up in the
    * crawl" scenario, guaranteeing true contamination exists at every
    * SF (natural near-dups surface too). The gram join is the scale
    * path: candidates only form where an actual 8-gram collides, and
    * the per-pair counts are a map-side-combinable aggregation.
    */
  def q58(t: Tables): DataFrame = {
    val evalDocs = t.documents.filter(col("doc_id") < 20)
      .select((col("doc_id") + 500000).as("eval_id"), col("text"))
    t.documents
      .contaminationPairs(evalDocs, id = "doc_id", text = "text",
        evalId = "eval_id", evalText = "text", n = 8, minShared = 5L)
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** q82: **per-doc n-gram coverage**
    * ([[graft.api.Ops.GraftDataFrameOps.ngramCoverage]]) — score the
    * src0/src1 slice against everything else: what fraction of each
    * candidate doc's distinct 8-grams already exists in the held
    * corpus (novelty/memorization triage — the aggregate complement
    * of q58's pairwise decontamination). All-integer output (counts
    * + basis points), replayed exactly by the oracle.
    */
  def q82(t: Tables): DataFrame = {
    val docs = t.documents
    docs.filter(col("source").isin("src0", "src1"))
      .ngramCoverage(docs.filter(!col("source").isin("src0", "src1")),
        id = "doc_id", text = "text", refText = "text", n = 8)
      .orderBy(col("doc_id"))
  }
}

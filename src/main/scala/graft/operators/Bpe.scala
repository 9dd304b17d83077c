package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Byte-pair-encoding vocabulary training (Sennrich, Haddow & Birch,
  * ACL 2016 — the public BPE-for-NLP recipe): iteratively merge the
  * most frequent adjacent symbol pair, starting from characters —
  * THE canonical tokenizer-prep step of every LLM training pipeline,
  * and the one piece of tokenizer infrastructure the engine's
  * token-counting ops (q54's BPE-ish regex) only approximate.
  *
  * The distributed shape is the classic word-census trick: merges
  * train on the DISTINCT-WORD frame weighted by word frequency — a
  * vocab-sized table (10⁴–10⁶ rows regardless of corpus size), so a
  * 100 TB corpus pays ONE corpus-wide word count (map-combinable)
  * and every merge iteration after that is a small vocab-sized job:
  * adjacent-pair explode → weighted pair census (map-combinable) →
  * argmax (freq desc, pair asc — deterministic) → one codegen'd fold
  * rewriting the symbol arrays, checkpointed per round. Overlapping
  * pairs count every adjacency (the reference implementation's
  * counting); merge application is LEFT-TO-RIGHT non-overlapping,
  * expressed as a fold that merges when the accumulator's last
  * symbol equals `left` and the current equals `right` — equivalent
  * to the sequential scan because a just-merged symbol `left+right`
  * can never equal `left` (right is non-empty).
  *
  * Encoding applies the ranked merges to the corpus through the same
  * distinct-word frame: apply merges once per distinct word, join
  * the word → symbols mapping back to the exploded corpus — the
  * corpus-side cost is one explode + one vocab hash join, never
  * per-document merge scans.
  *
  * No SQL oracle by declared design (the rank-ordered merge loop has
  * no tractable single-query DuckDB replay — the argmax of round r
  * depends on the rewrite of round r−1); BpeSpec pins hand-computed
  * merge sequences, tie-breaks, the overlap rule, early stopping,
  * partitioning invariance, and the encode-concat roundtrip on real
  * corpus text.
  */
object Bpe {

  /** Characters of a word as the initial symbol array. */
  private def chars(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1)))

  /** One merge application: left-to-right non-overlapping rewrite of
    * adjacent (left, right) into left+right — the fold described in
    * the object doc. try_element_at returns null on the empty
    * accumulator (never a merge), keeping the expression ANSI-safe.
    */
  private def mergeFold(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(try_element_at(acc, lit(-1)) === lit(left) && s === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(s))))

  /** Train `numMerges` BPE merges over the corpus' word census.
    * Stops early when no adjacent pair reaches `minFreq` (weighted
    * by word frequency). Returns (rank 1-based, left, right,
    * pair_freq) in merge order.
    */
  def trainBpe(docs: DataFrame, text: String, numMerges: Int,
               minFreq: Long = 2L,
               checkpointDir: Option[String] = None): DataFrame = {
    require(numMerges >= 1 && numMerges <= 200,
      s"numMerges must be in [1, 200] (got $numMerges): each merge is one " +
        "vocab-sized job; plan-depth and round-trip costs grow linearly")
    require(minFreq >= 1L, "minFreq must be at least 1")
    val spark = docs.sparkSession
    val ck = graft.api.Ops.lineageBreaker(checkpointDir)
    var census = ck(docs
      .select(explode(tokens(col(text))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(col("__f"), chars(col("__w")).as("__syms")))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val top = census
        .select(col("__f"), explode(zip_with(
          slice(col("__syms"), lit(1), size(col("__syms")) - 1),
          slice(col("__syms"), lit(2), size(col("__syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("__p"))
        .groupBy(col("__p.l").as("__l"), col("__p.r").as("__r"))
        .agg(sum(col("__f")).as("__pf"))
        .filter(col("__pf") >= minFreq)
        .orderBy(col("__pf").desc, col("__l"), col("__r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pf) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((l, r, pf))
        census = ck(census.select(col("__f"),
          mergeFold(col("__syms"), l, r).as("__syms")))
      }
    }
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r, pf), i) => (i + 1, l, r, pf) }.toSeq
      .toDF("rank", "left", "right", "pair_freq")
  }

  /** Encode the corpus with a trained merge list: every document's
    * words rewrite through the ranked merges. Merges apply on the
    * DISTINCT-WORD frame (vocab-sized) with a checkpoint every
    * `foldBatch` merges so expression depth stays bounded, then the
    * word → symbols mapping joins back to the exploded corpus and
    * documents reassemble in word order. Returns (id, bpe_tokens
    * array<string>, n_bpe_tokens).
    */
  def applyBpe(docs: DataFrame, id: String, text: String,
               merges: Seq[(String, String)], foldBatch: Int = 8,
               checkpointDir: Option[String] = None): DataFrame = {
    require(foldBatch >= 1, "foldBatch must be positive")
    val ck = graft.api.Ops.lineageBreaker(checkpointDir)
    val words = docs
      .select(col(id), posexplode(tokens(col(text))).as(Seq("__pos", "__w")))
    var vocab = ck(words.select(col("__w")).distinct()
      .select(col("__w"), chars(col("__w")).as("__syms")))
    merges.grouped(foldBatch).foreach { batch =>
      val folded = batch.foldLeft(col("__syms")) { case (c, (l, r)) =>
        mergeFold(c, l, r)
      }
      vocab = ck(vocab.select(col("__w"), folded.as("__syms")))
    }
    words.join(vocab, Seq("__w"))
      .groupBy(col(id))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__syms")))),
        s => s.getField("__syms"))).as("bpe_tokens"))
      .select(col(id), col("bpe_tokens"),
        size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"))
  }

  /** q101: 12 BPE merges trained on the documents corpus — the merge
    * table itself is the output (rank, left, right, pair_freq).
    * Rows-only in the driver gate by declared design (see object
    * doc); BpeSpec carries the correctness load.
    */
  def q101(t: Tables): DataFrame =
    trainBpe(t.documents, "text", numMerges = 12)
      .orderBy(col("rank"))
}

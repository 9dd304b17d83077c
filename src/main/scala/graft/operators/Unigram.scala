package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Unigram-language-model tokenizer training (Kudo, ACL 2018 — the
  * SentencePiece unigram model: the OTHER production tokenizer family
  * beside BPE, r17 VERDICT r16 missing #5): score every piece by a
  * unigram probability, segment each word by VITERBI (the
  * max-likelihood segmentation), and iteratively re-estimate + prune
  * the vocabulary — where BPE grows a vocab bottom-up by merging,
  * unigram starts from a large seed and shrinks it top-down by EM.
  *
  * This implementation is the hard-EM (Viterbi-EM) variant: the
  * E-step segments with the CURRENT piece probabilities (Viterbi —
  * deterministic, which is what makes a SQL oracle possible), the
  * M-step re-estimates probabilities from the usage census with
  * add-one smoothing, and each round prunes to a declared keep size
  * (single characters are never pruned — the coverage floor, exactly
  * SentencePiece's character-coverage rule).
  *
  * The distributed shape is the [[Bpe]] word-census trick: everything
  * trains on the DISTINCT-WORD frame weighted by word frequency — a
  * vocab-sized table regardless of corpus size — so a 100 TB corpus
  * pays ONE corpus-wide word count and each EM round is a small
  * vocab-sized job. The Viterbi DP itself is ONE higher-order-function
  * fold per distinct word (no per-position shuffles): the per-word
  * candidate table (start, end, ln p) builds by an explode + ONE hash
  * join against the vocab frame (scales to any vocab — no literal
  * maps), collapses to a map column, and `aggregate` walks positions
  * left to right carrying the best-cost/backpointer array, then a
  * second fold walks the backpointers out into pieces.
  *
  * §3 portability: piece log-probs are `round(ln((uses+1)/Σ(uses+1)),
  * 12)` (one ln per piece, the q73/q190 ln treatment); every DP cost
  * is a fixed left-to-right chain of additions of those round-12
  * doubles — IEEE-identical in any engine — and the argmax breaks
  * ties on the smaller start (the LONGEST candidate piece), so the
  * oracle's recursive-CTE replay selects bit-identically. Seed and
  * prune selections order by (count DESC, piece ASC) — exact integers
  * and ASCII strings.
  *
  * Stated scope: tokens are [a-z0-9]+ ([[graft.functions
  * .TextFunctions.normText]]); words longer than `maxWordLen` are
  * excluded from training and encoding (the rare-long-word rule —
  * raise the cap for long-tail scripts); a word containing a
  * character outside the trained vocab cannot be segmented and is
  * DROPPED by the encoder (cannot happen when encoding the training
  * corpus — the char floor covers it).
  */
object Unigram {

  /** (w, f) distinct-word census, length-capped. */
  private def wordCensus(docs: DataFrame, text: String, maxWordLen: Int): DataFrame =
    docs.select(explode(tokens(col(text))).as("w"))
      .filter(length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Every distinct single character of the census — the pieces the
    * pruner can never drop (coverage floor).
    */
  private def charSet(words: DataFrame): DataFrame =
    words.select(col("w"), explode(sequence(lit(1), length(col("w")))).as("__i"))
      .select(col("w").substr(col("__i"), lit(1)).as("piece"))
      .distinct()

  /** Weighted substring census (piece, cnt): every occurrence of
    * every substring up to `maxPieceLen`, weighted by word frequency
    * — the q77-style seed-candidate pool.
    */
  private def substringCensus(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .withColumn("__j", explode(sequence(lit(0), length(col("w")) - 1)))
      .withColumn("__i", explode(sequence(col("__j") + 1,
        least(col("__j") + maxPieceLen, length(col("w"))))))
      .select(col("w").substr(col("__j") + 1, col("__i") - col("__j")).as("piece"),
        col("f"))
      .groupBy(col("piece")).agg(sum(col("f")).as("uses"))

  /** Attach add-one-smoothed round-12 log-probs to a (piece, uses)
    * vocab: `lnp = round(ln((uses+1)/Σ(uses+1)), 12)` — smoothing
    * keeps a zero-usage character finite (SentencePiece keeps such
    * chars too; without smoothing their ln p would be −∞).
    */
  private def withLnp(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("uses") + 1).as("__tot"))
    vocab.crossJoin(broadcast(tot))
      .withColumn("lnp", round(log((col("uses") + lit(1L)).cast("double") /
        col("__tot").cast("double")), 12))
      .drop("__tot")
  }

  /** Viterbi max-likelihood segmentation of every distinct word under
    * a (piece, lnp) vocab: returns (w, pieces array<string>), pieces
    * null when the word is unsegmentable (a character outside the
    * vocab). One explode + one vocab hash join + two per-row folds —
    * no shuffle beyond the candidate join, no per-position jobs.
    */
  private[graft] def viterbiSegments(words: DataFrame, vocab: DataFrame,
                                     maxPieceLen: Int): DataFrame = {
    val m = maxPieceLen
    // per-word candidate map: key j*128+i → ln p of substr(w, j+1, i−j)
    val lk = words.select(col("w"))
      .withColumn("__j", explode(sequence(lit(0), length(col("w")) - 1)))
      .withColumn("__i", explode(sequence(col("__j") + 1,
        least(col("__j") + m, length(col("w"))))))
      .withColumn("piece", col("w").substr(col("__j") + 1, col("__i") - col("__j")))
      .join(vocab.select(col("piece"), col("lnp")), Seq("piece"))
      .groupBy(col("w"))
      .agg(map_from_entries(collect_list(struct(
        (col("__j") * 128 + col("__i")).as("k"), col("lnp").as("v")))).as("__lk"))
    val L = length(col("w"))
    val nullD = lit(null).cast("double")
    // forward DP: best[i] = (cost, backpointer j), 1-indexed array
    // with best[0] = (0, −1); candidates scan j ascending with strict
    // >, so ties keep the SMALLEST j (longest piece)
    val dpCol = aggregate(sequence(lit(1), L),
      array(struct(lit(0.0).as("c"), lit(-1).as("j"))),
      (acc, i) => concat(acc, array(
        aggregate(sequence(greatest(lit(0), i - m), i - 1),
          struct(nullD.as("c"), lit(-1).as("j")),
          (best, j) => {
            val lnp = element_at(col("__lk"), j * 128 + i)
            val prior = element_at(acc, j + 1).getField("c")
            val cand = prior + lnp
            when(prior.isNotNull && lnp.isNotNull &&
                (best.getField("c").isNull || cand > best.getField("c")),
              struct(cand.as("c"), j.as("j"))).otherwise(best)
          }))))
    // backward walk: follow backpointers from L to 0, prepending the
    // piece each hop; at most L hops, idle once pos reaches 0
    val bt = aggregate(sequence(lit(1), L),
      struct(L.as("pos"), array().cast("array<string>").as("ps"), lit(true).as("ok")),
      (st, _) => {
        val pos = st.getField("pos"); val ps = st.getField("ps")
        val okf = st.getField("ok")
        val e = element_at(col("__dp"), pos + 1)
        when(pos <= 0 || !okf, st)
          .when(e.getField("c").isNull,
            struct(pos.as("pos"), ps.as("ps"), lit(false).as("ok")))
          .otherwise(struct(e.getField("j").as("pos"),
            concat(array(col("w").substr(e.getField("j") + 1,
              pos - e.getField("j"))), ps).as("ps"),
            lit(true).as("ok")))
      })
    words.select(col("w")).join(lk, Seq("w"), "left")
      .withColumn("__dp", dpCol)
      .withColumn("__bt", bt)
      .withColumn("pieces",
        when(col("__lk").isNotNull && col("__bt").getField("ok") &&
          col("__bt").getField("pos") === 0, col("__bt").getField("ps")))
      .select(col("w"), col("pieces"))
  }

  /** The vocab of one round: the character floor (usage coalesced to
    * 0) plus the top `keep` multi-char pieces by (uses DESC, piece) —
    * the league-table window walks the piece-candidate domain
    * (substring census of the DISTINCT-WORD frame — vocab-scale,
    * never the corpus), then add-one log-probs.
    */
  private def vocabFrom(chars: DataFrame, usage0: DataFrame, keep: Int): DataFrame = {
    // the usage census materializes FIRST (r17 optimization round):
    // it is consumed twice below (the keep window + the char-floor
    // join) and the add-one total doubles each consumer again — four
    // evaluations of whatever produced it, which for an EM round is
    // the whole Viterbi pass. One census-sized break caps that at one
    // evaluation per round (guide §1.2). Values unchanged.
    val usage = graft.api.Ops.lineageBreaker(None)(usage0)
    val wTop = Window.orderBy(col("uses").desc, col("piece"))
    val top = usage.filter(length(col("piece")) > 1)
      .withColumn("__rk", row_number().over(wTop))
      .filter(col("__rk") <= keep).drop("__rk")
    withLnp(chars.join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("uses"), lit(0L)).as("uses"))
      .unionByName(top))
  }

  /** Train a unigram-LM vocabulary: seed from the substring census
    * (top `seedSize` multi-char pieces + every character), then one
    * Viterbi-EM round per entry of `keepSizes` — segment every
    * distinct word under the current probabilities, census the piece
    * usage, prune to the round's keep size, re-estimate. Returns the
    * final vocab (piece, uses, lnp round 6) — `uses` is the final
    * round's Viterbi usage (0 for a character the segmentation never
    * chose but coverage retains).
    */
  def trainUnigram(docs: DataFrame, text: String, seedSize: Int,
                   keepSizes: Seq[Int], maxPieceLen: Int = 6,
                   maxWordLen: Int = 16,
                   checkpointDir: Option[String] = None): DataFrame =
    trainUnigramReturningWords(docs, text, seedSize, keepSizes,
      maxPieceLen, maxWordLen, checkpointDir)._1

  /** [[trainUnigram]] also handing back the materialized distinct-word
    * census frame (w, f) it trained on (r17 optimization round): an
    * encoder over the SAME corpus needs exactly that distinct-word set
    * and used to recompute it with a corpus-wide distinct — sharing
    * the checkpointed census removes that whole pass (guide §2.4).
    */
  private[graft] def trainUnigramReturningWords(
      docs: DataFrame, text: String, seedSize: Int,
      keepSizes: Seq[Int], maxPieceLen: Int,
      maxWordLen: Int,
      checkpointDir: Option[String]): (DataFrame, DataFrame) = {
    require(seedSize >= 1, s"trainUnigram: seedSize ($seedSize) must be positive")
    require(keepSizes.nonEmpty && keepSizes.forall(_ >= 1),
      "trainUnigram: keepSizes must be a non-empty list of positive keep sizes")
    require(keepSizes.size <= 8,
      "trainUnigram: each EM round segments the whole word census — keep the schedule short")
    require(maxPieceLen >= 2 && maxPieceLen <= 12,
      s"trainUnigram: maxPieceLen ($maxPieceLen) must be in 2..12")
    require(maxWordLen >= maxPieceLen && maxWordLen <= 64,
      s"trainUnigram: maxWordLen ($maxWordLen) must be in maxPieceLen..64")
    val ck = graft.api.Ops.lineageBreaker(checkpointDir)
    val words = ck(wordCensus(docs, text, maxWordLen))
    val chars = ck(charSet(words))
    var vocab = ck(vocabFrom(chars, substringCensus(words, maxPieceLen), seedSize))
    for (keep <- keepSizes) {
      val usage = viterbiSegments(words, vocab, maxPieceLen)
        .join(words, Seq("w"))
        .select(explode(col("pieces")).as("piece"), col("f"))
        .groupBy(col("piece")).agg(sum(col("f")).as("uses"))
      vocab = ck(vocabFrom(chars, usage, keep))
    }
    (vocab.select(col("piece"), col("uses"), round(col("lnp"), 6).as("lnp")),
      words)
  }

  /** Encode a corpus against a trained (piece, lnp) vocab: Viterbi-
    * segment the DISTINCT words once, join the word → pieces mapping
    * back onto the position-exploded corpus, reassemble per document
    * (the [[Bpe.applyBpe]] shape — corpus cost is one explode + one
    * vocab-sized hash join). Words longer than `maxWordLen` or
    * containing unseen characters are dropped (stated).
    * Returns (id, uni_tokens array<string>, n_uni_tokens).
    */
  def encodeUnigram(docs: DataFrame, id: String, text: String,
                    vocab: DataFrame, maxPieceLen: Int = 6,
                    maxWordLen: Int = 16): DataFrame =
    encodeUnigramOverWords(docs, id, text, vocab,
      docs.select(explode(tokens(col(text))).as("w"))
        .filter(length(col("w")) <= maxWordLen).distinct(),
      maxPieceLen, maxWordLen)

  /** [[encodeUnigram]] with the corpus' distinct-word frame supplied
    * by the caller (r17 optimization round) — when training just ran
    * on the same corpus, its checkpointed word census IS that frame
    * and the encoder skips a corpus-wide distinct (guide §2.4). The
    * caller owns the contract that `distinctWords.w` is exactly the
    * corpus' distinct tokens under the same length cap.
    */
  private[graft] def encodeUnigramOverWords(
      docs: DataFrame, id: String, text: String,
      vocab: DataFrame, distinctWords: DataFrame,
      maxPieceLen: Int, maxWordLen: Int): DataFrame = {
    val wordsPos = docs
      .select(col(id), posexplode(tokens(col(text))).as(Seq("__pos", "w")))
      .filter(length(col("w")) <= maxWordLen)
    val segs = viterbiSegments(distinctWords.select(col("w")),
        vocab, maxPieceLen)
      .filter(col("pieces").isNotNull)
    wordsPos.join(segs, Seq("w"))
      .groupBy(col(id))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("pieces")))),
        s => s.getField("pieces"))).as("uni_tokens"))
      .select(col(id), col("uni_tokens"),
        size(col("uni_tokens")).cast("long").as("n_uni_tokens"))
  }

  /** q235: a unigram-LM vocab trained on the documents corpus — seed
    * 60 multi-char pieces + the character floor, two Viterbi-EM
    * prune rounds (keep 40, then 24). The output IS the tokenizer
    * model (piece, uses, lnp). Oracle: the full replay — substring
    * seed, per-round recursive-CTE Viterbi over every distinct word,
    * usage census, prune, re-estimate (see
    * `SparkEntry.unigramTrainSql`).
    */
  def q235(t: Tables): DataFrame =
    trainUnigram(t.documents, "text", seedSize = 60,
      keepSizes = Seq(40, 24), maxPieceLen = 6, maxWordLen = 16)
      .orderBy(col("piece"))

  /** q236: ENCODE the corpus with the q235-trained vocab — the apply
    * half, oracle-checked end to end (train CTEs shared with q235,
    * then one more Viterbi pass + the per-doc reassembly). The
    * space-joined piece stream is unambiguous ([a-z0-9]+ tokens).
    */
  def q236(t: Tables): DataFrame = {
    // r17 optimization round: train and encode share ONE word census —
    // the corpus-wide distinct the encoder used to recompute is
    // exactly the training census's word frame (same tokenizer, same
    // length cap), so that whole pass is gone (guide §2.4); the
    // output is unchanged (same distinct-word set, same Viterbi, same
    // reassembly — the gate re-verifies).
    val (vocab, words) = trainUnigramReturningWords(t.documents, "text",
      seedSize = 60, keepSizes = Seq(40, 24), maxPieceLen = 6,
      maxWordLen = 16, checkpointDir = None)
    encodeUnigramOverWords(t.documents, "doc_id", "text", vocab, words,
      maxPieceLen = 6, maxWordLen = 16)
      .select(col("doc_id"),
        concat_ws(" ", col("uni_tokens")).as("uni_text"),
        col("n_uni_tokens"))
      .orderBy(col("doc_id"))
  }
}

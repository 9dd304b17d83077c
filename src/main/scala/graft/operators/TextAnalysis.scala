package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.Ops._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators over the documents table (SURVEY.md §2
  * q27–q30): all map-side expression work (no UDFs, no shuffles except
  * final aggregation), so they stream at any corpus size.
  */
object TextAnalysis {

  /** q27: per-document stats — chars, tokens, punctuation, stopwords.
    * The token array is projected once (referenced twice → kept by
    * CollapseProject) so the split runs once per row.
    */
  def q27(t: Tables): DataFrame =
    t.documents
      .withColumn("__toks", filter(split(col("text"), " "), x => x =!= ""))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("__toks")).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("long").as("n_punct"),
        size(filter(col("__toks"), x => x.isin("the", "a", "of", "and")))
          .cast("long").as("n_stopwords"))
      .orderBy(col("doc_id"))

  /** q28: heuristic language ID from substring evidence counts.
    * `occ(s)` counts occurrences via length deltas — pure codegen'd
    * string ops, no regex engine in the hot path.
    */
  def q28(t: Tables): DataFrame = {
    def occ(s: String) = length(col("text")) - length(regexp_replace(col("text"), s, ""))
    val guess =
      when(occ("the") >= 15, "en")
        .when(occ("data") >= 12, "en-tech")
        .when(occ("merge") >= 10, "sql")
        .otherwise("und")
    t.documents.select(
      col("doc_id"), col("lang"), guess.as("guess"),
      when(guess === col("lang"), 1).otherwise(0).cast("long").as("agree"))
      .orderBy(col("doc_id"))
  }

  /** q54: token counting, whitespace + BPE-ish — the tokenizer-budget
    * estimate a training-data pipeline runs before the real tokenizer:
    * a GPT-2-style pre-tokenizer regex (apostrophe contractions,
    * space-prefixed letter runs, digit runs, punctuation runs) counted
    * per document, next to the whitespace count and a chars-per-token
    * ratio. Pure map-side regex work (ASCII pattern — identical
    * semantics in Java regex and RE2).
    */
  def q54(t: Tables): DataFrame = {
    val bpePat = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
    val lowered = lower(col("text"))
    val ws = filter(split(lowered, "\\s+"), x => x =!= "")
    t.documents
      .withColumn("n_bpe", size(regexp_extract_all(lowered, lit(bpePat), lit(0))).cast("long"))
      .select(
        col("doc_id"),
        col("n_bpe"),
        size(ws).cast("long").as("n_ws"),
        length(col("text")).cast("long").as("n_chars"),
        round(length(col("text")).cast("double") /
          greatest(col("n_bpe"), lit(1L)).cast("double"), 4).as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** q29: document fingerprint — md5 over the normalized text. */
  def q29(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), md5(normText(col("text")).cast("binary")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** q47: bigram conditional statistics — P(w2|w1) over the corpus
    * (the n-gram LM building block): shifted-slice zip (no per-element
    * re-eval), explode, then the denominator as a `groupBy(w1)`
    * aggregate joined back — NOT a `sum over (partition by w1)` window.
    * A window puts every successor of a Zipfian head word ("the") in
    * ONE sort task; the aggregate gets map-side partial combine and the
    * join probe streams, and AQE can split a skewed join partition but
    * not a skewed window partition. Same shuffle count (the two legs
    * share the bigram exchange via ReuseExchange), no single-task
    * ceiling.
    */
  /** Zipf-slope vocabulary health check (r14 — the corpus-linguistics
    * screen a tokenizer/corpus review runs: natural text follows a
    * power law `freq ~ rank^s` with s ~ -1; a much flatter slope
    * flags templated/boilerplate-heavy crawl, a much steeper one a
    * collapsed vocabulary): the exact token census ranks by
    * (count desc, token — deterministic), the top `maxRank` head
    * fits `ln(count) = s·ln(rank) + b` by the q119 least-squares
    * tree — ln terms ROUNDED at 12 and decimal-summed (the q155
    * order-free discipline; ln is the one last-ulp-risky primitive,
    * the established round-12 treatment), slope/intercept/r one
    * fixed double tree round-6. Returns ONE row:
    * (n_tokens_total, vocab, fitted_ranks, slope, intercept, r).
    *
    * Scale shape: one map-combinable token census; the rank window
    * walks the VOCAB frame (vocabulary-bounded, the q130 caveat
    * stated) and the fit reads only the maxRank head; one global
    * 1-row aggregate.
    */
  def zipfSlope(df: DataFrame, text: org.apache.spark.sql.Column,
                maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 10, s"zipfSlope: maxRank ($maxRank) must be >= 10")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val cen = df.filter(text.isNotNull)
      .select(explode(tokens(text)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val wAll = Window.partitionBy()
    val ranked = cen
      .withColumn("n_tokens_total", sum(col("c")).over(wAll))
      .withColumn("vocab", count(lit(1)).over(wAll))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("c").desc, col("tok"))).cast("long"))
      .filter(col("rk") <= maxRank)
      .withColumn("__lx", round(log(col("rk").cast("double")), 12))
      .withColumn("__ly", round(log(col("c").cast("double")), 12))
    val d12 = DecimalType(38, 12)
    val agg = ranked.agg(
      max(col("n_tokens_total")).as("n_tokens_total"),
      max(col("vocab")).as("vocab"),
      count(lit(1)).as("fitted_ranks"),
      sum(col("__lx").cast(d12)).cast("double").as("__sx"),
      sum(col("__ly").cast(d12)).cast("double").as("__sy"),
      sum(round(col("__lx") * col("__lx"), 12).cast(d12)).cast("double").as("__sxx"),
      sum(round(col("__ly") * col("__ly"), 12).cast(d12)).cast("double").as("__syy"),
      sum(round(col("__lx") * col("__ly"), 12).cast(d12)).cast("double").as("__sxy"))
    val nD = col("fitted_ranks").cast("double")
    val covN = nD * col("__sxy") - col("__sx") * col("__sy")
    val varXN = nD * col("__sxx") - col("__sx") * col("__sx")
    val varYN = nD * col("__syy") - col("__sy") * col("__sy")
    agg
      .withColumn("slope", when(varXN > 0.0, round(covN / varXN, 6)))
      .withColumn("intercept", when(varXN > 0.0,
        round((col("__sy") - (covN / varXN) * col("__sx")) / nD, 6)))
      .withColumn("r", when(varXN > 0.0 && varYN > 0.0,
        round(covN / sqrt(varXN * varYN), 6)))
      .select(col("n_tokens_total"), col("vocab"), col("fitted_ranks"),
        col("slope"), col("intercept"), col("r"))
  }

  /** q190: Zipf slope of the documents vocabulary ([[zipfSlope]]) —
    * the power-law health check over the corpus token census (r14).
    */
  def q190(t: Tables): DataFrame = zipfSlope(t.documents, col("text"))

  def q47(t: Tables): DataFrame = {
    val bigrams = t.documents
      .withColumn("toks", tokens(col("text")))
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val denom = bigrams.groupBy(col("w1")).agg(sum(col("n")).as("__n_w1"))
    bigrams.join(denom, Seq("w1"))
      .withColumn("p_cond",
        round(col("n").cast("double") / col("__n_w1").cast("double"), 6))
      .filter(col("n") >= 20)
      .select(col("w1"), col("w2"), col("n"), col("p_cond"))
      .orderBy(col("w1"), col("w2"))
  }

  /** q48: TF-IDF — term frequency per (doc, term) × inverse document
    * frequency ln(N/df). One explode + two aggs. The df table is one
    * row per DISTINCT TOKEN — vocabulary-sized, which GROWS with the
    * corpus (typos, numbers, ids — billions of rows at 100 TB of
    * text) — so it must NOT carry a broadcast hint: AQE broadcasts it
    * when it is genuinely small and shuffle-joins on `term` otherwise.
    * Only the 1-row nDocs aggregate is hint-broadcast. (Locked by
    * PlanShapeSpec: no build-side hint on dfreq.)
    */
  def q48(t: Tables): DataFrame = {
    val termDocs = t.documents
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val tf = termDocs.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = termDocs.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = t.documents.select(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .join(broadcast(nDocs))
      .withColumn("tf_idf",
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tf_idf"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** q30: token diversity per source (explode + two-level agg). */
  def q30(t: Tables): DataFrame =
    t.documents
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"))
      .agg(countDistinct(col("token")).as("n_distinct_tokens"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("source"))

  /** q61: PII redaction + counts ([[graft.api.Ops]].redact) — the
    * scrub pass a training-data pipeline runs before anything else
    * sees the text. The synthetic documents carry no natural PII, so
    * a deterministic contact line (email + IPv4 derived from doc_id)
    * is planted per document — SQL-mirrorable, like Dedup.corpus's
    * planted re-crawls — then counted (regexp_count pre-redaction)
    * and scrubbed. All map-side regexp work, ASCII patterns with
    * identical Java-regex/RE2 semantics, no shuffle.
    */
  def q61(t: Tables): DataFrame = {
    import graft.api.Ops._
    val planted = t.documents.select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com at 10.0."),
        pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
        pmod(col("doc_id"), lit(100)).cast("string"), lit(" done")).as("text"))
    val email = piiRules(0)._1
    val ip = piiRules(1)._1
    planted
      .withColumn("n_emails", regexp_count(col("text"), lit(email)).cast("long"))
      .withColumn("n_ips", regexp_count(col("text"), lit(ip)).cast("long"))
      .redact("text")
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("text").as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** q64: repetition-based quality filter
    * ([[graft.api.Ops]].repetitionStats) — flag documents whose text
    * is dominated by one token or by duplicated bigrams, the
    * Gopher-style screens for degenerate/boilerplate text. Thresholds
    * sit at ~the corpus p80 (top_token_frac > 0.12) and ~p95
    * (dup_bigram_frac > 0.08) so a meaningful slice flags at every
    * SF. Filtering happens on the 6-decimal ROUNDED stats — the
    * boundary is then bit-identical in the DuckDB oracle. All
    * map-side array expressions; the only shuffle is the output sort.
    */
  def q64(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.documents
      .repetitionStats("doc_id", "text")
      .filter(col("top_token_frac") > 0.12 || col("dup_bigram_frac") > 0.08)
      .orderBy(col("doc_id"))
  }

  /** q70: markup strip ([[graft.api.Ops]].stripMarkup) — crawled
    * corpora arrive as HTML; this is the to-plain-text pass feeding
    * quality scoring and dedup. The synthetic documents are plain
    * text, so each is deterministically wrapped in realistic markup
    * (head/style/script blocks, comments, attributes, the common
    * entity set — SQL-mirrorable concat, like q61's planted PII),
    * then stripped; the clean text plus its token count come back.
    * Script/style/comment content must vanish wholesale, tag-only
    * removal must not fuse adjacent words, entities decode with
    * &amp;amp; last. Pure map-side regexp chain; the only shuffle is
    * the output sort.
    */
  def q70(t: Tables): DataFrame = {
    import graft.api.Ops._
    val wrapped = t.documents.select(col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style type=\"text/css\">p { color: #fff; }</style></head>\n<body><!-- doc "),
        col("doc_id").cast("string"),
        lit(" --><h1>Header</h1>\n<p class=\"main\">"), col("text"),
        lit("</p><script>var n = 1 < 2 && \"</p>\";</script>"),
        lit("<p>A &amp;amp; B &lt;i&gt; &quot;Q&quot; &#39;S&#39;&nbsp;C</p></body></html>"))
        .as("text"))
    wrapped.stripMarkup("text")
      .select(col("doc_id"), col("text").as("clean_text"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q73: bigram-LM perplexity scoring ([[graft.api.Ops]].lmScore) —
    * the CCNet-style quality filter: an add-one bigram LM trained on
    * the corpus itself scores every document's average bigram
    * log-likelihood; gibberish and off-distribution text surface as
    * high perplexity. Counts are exact integers on both engines; the
    * only float steps (ln, avg) land far inside the 4-decimal
    * rounding, so the oracle replays the scores bit-for-bit.
    */
  def q73(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.documents
      .lmScore("doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** q77: PMI collocations ([[graft.api.Ops]].collocations) — the
    * phrase-mining pass of a tokenizer-vocabulary build: top-100
    * adjacent pairs by pointwise mutual information (min count 20,
    * PMI rounded to 4 decimals, ties broken by pair) — multi-word
    * units worth single vocabulary slots.
    */
  def q77(t: Tables): DataFrame = {
    import graft.api.Ops._
    t.documents
      .collocations("doc_id", "text", minCount = 20L)
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** q75: Unicode NFC normalization via the native
    * [[graft.functions.UnicodeNormalize]] codegen expression — the
    * canonicalization every hash-based dedup stage needs (composed
    * U+00E9 vs decomposed e+U+0301 are the same text but different
    * bytes). The test corpus is ASCII, so each doc gets a
    * deterministic decomposed suffix keyed by doc_id mod 3 (combining
    * acute; the U+212B Angstrom singleton — same length after NFC,
    * different bytes; a double-combining cluster that composes
    * partially); the oracle replays with DuckDB's `nfc_normalize`
    * (both sides implement the same Unicode spec — verified
    * codepoint-identical on all planted cases).
    */
  def q75(t: Tables): DataFrame = {
    graft.functions.GraftFunctions.register(t.spark)
    val m = pmod(col("doc_id"), lit(3))
    val suffix = when(m === 0, lit(" cafe\u0301")) // e + combining acute
      .when(m === 1, lit(" \u212B"))                 // Angstrom sign
      .otherwise(lit(" e\u0328\u0301"))             // e + ogonek + acute
    t.documents
      .withColumn("__raw", concat(col("text"), suffix))
      .withColumn("__nfc", call_function("unicode_normalize", col("__raw")))
      .select(col("doc_id"),
        length(col("__raw")).cast("long").as("n_raw"),
        length(col("__nfc")).cast("long").as("n_nfc"),
        (col("__raw") =!= col("__nfc")).as("changed"),
        md5(col("__nfc").cast("binary")).as("h"))
      .orderBy(col("doc_id"))
  }

  /** q81: vocabulary capping
    * ([[graft.api.Ops.GraftDataFrameOps.capVocab]]) — tokens below
    * corpus frequency 500 rewrite to `<unk>`; each doc returns as its
    * capped normalized token stream with the replacement count. The
    * oracle replays census, keep set and ordered reassembly exactly
    * (all integer counts and string equality — no float anywhere).
    */
  def q81(t: Tables): DataFrame =
    t.documents
      .capVocab("doc_id", "text", minCount = 500L)
      .orderBy(col("doc_id"))

  /** q84: character-distribution entropy
    * ([[graft.api.Ops.GraftDataFrameOps.charEntropy]]) — the
    * gibberish/blob detector over raw text; one char census, per-doc
    * aggregate, oracle-replayed (integer counts exactly, entropy at
    * the 4-decimal q73 discipline).
    */
  def q84(t: Tables): DataFrame =
    t.documents
      .charEntropy("doc_id", "text")
      .orderBy(col("doc_id"))

  /** q90: BM25 ranked retrieval
    * ([[graft.api.Ops.GraftDataFrameOps.bm25TopK]]) — three
    * vocabulary-word queries against the documents corpus, top-10
    * each. The oracle replays the whole thing — tf/df/doc-length
    * censuses, the Okapi formula on the same doubles, 4-decimal
    * rounding, (score DESC, doc_id) ranking — so the staged
    * shard-then-global top-k is checked against the plain one-window
    * rank it must equal.
    */
  def q90(t: Tables): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    val queries = Seq(
      (1, "spark query"),
      (2, "customer value table"),
      (3, "window sort merge")).toDF("query_id", "qtext")
    t.documents.select(col("doc_id"), col("text"))
      .bm25TopK(queries, "query_id", "qtext", "doc_id", "text", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }
}

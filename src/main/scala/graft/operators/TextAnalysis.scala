package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators over the documents table (SURVEY.md §2
  * q27–q30): all map-side expression work (no UDFs, no shuffles except
  * final aggregation), so they stream at any corpus size.
  */
object TextAnalysis {

  /** q27: per-document stats — chars, tokens, punctuation, stopwords. */
  def q27(t: Tables): DataFrame = {
    val toks = filter(split(col("text"), " "), x => x =!= "")
    t.documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("long").as("n_punct"),
      size(filter(toks, x => x.isin("the", "a", "of", "and"))).cast("long").as("n_stopwords"))
      .orderBy(col("doc_id"))
  }

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

  /** q29: document fingerprint — md5 over the normalized text. */
  def q29(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), md5(normText(col("text")).cast("binary")).as("fingerprint"))
      .orderBy(col("doc_id"))

  /** q30: token diversity per source (explode + two-level agg). */
  def q30(t: Tables): DataFrame =
    t.documents
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"))
      .agg(countDistinct(col("token")).as("n_distinct_tokens"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("source"))
}

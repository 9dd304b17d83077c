package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe
import graft.sources.Tables

/** BPE trainer/encoder correctness (no SQL oracle by declared design
  * — Bpe.scala object doc): hand-computed merge sequences, the
  * deterministic tie-break, the left-to-right overlap rule, early
  * stopping, partitioning invariance, and the encode roundtrip.
  */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  private def mergeRows(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Long)] =
    df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("hand-computed merge sequence on the classic corpus, with early stop") {
    import spark.implicits._
    // "ab" × 3, "cd" × 1: (a,b) weighted 3 wins round 1; after the
    // rewrite only (c,d) at weight 1 remains — below minFreq=2, so
    // training stops early even though numMerges allows more
    val docs = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    assert(mergeRows(Bpe.trainBpe(docs, "text", numMerges = 5)) ==
      Seq((1, "a", "b", 3L)))
    // with minFreq=1 the (c,d) merge lands too, then the pair space
    // is exhausted — still stops before numMerges
    assert(mergeRows(Bpe.trainBpe(docs, "text", numMerges = 5, minFreq = 1L)) ==
      Seq((1, "a", "b", 3L), (2, "c", "d", 1L)))
  }

  test("multi-round merges compose: learned symbols pair in later rounds") {
    import spark.implicits._
    // "abab" × 2: round 1 (a,b) weight 4 (two adjacencies per word);
    // round 2 pairs over [ab, ab] → (ab, ab) weight 2
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    assert(mergeRows(Bpe.trainBpe(docs, "text", numMerges = 5)) ==
      Seq((1, "a", "b", 4L), (2, "ab", "ab", 2L)))
  }

  test("equal-frequency ties break lexicographically on (left, right)") {
    import spark.implicits._
    val docs = Seq((1L, "xy qr xy qr")).toDF("doc_id", "text")
    val m = mergeRows(Bpe.trainBpe(docs, "text", numMerges = 1))
    assert(m == Seq((1, "q", "r", 2L)), m.toString)
  }

  test("left-to-right non-overlapping application: aaa under (a,a) becomes [aa, a]") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs, "text", numMerges = 1)
    assert(mergeRows(merges) == Seq((1, "a", "a", 4L)))
    val enc = Bpe.applyBpe(docs, "doc_id", "text", Seq(("a", "a")))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(enc(1L) == Seq("aa", "a", "aa", "a"), enc(1L).toString)
  }

  test("training is partitioning-invariant; encode concat reproduces the normalized words") {
    val docs = t.documents.select(col("doc_id"), col("text")).limit(300)
    def train(parts: Int) = mergeRows(
      Bpe.trainBpe(docs.repartition(parts), "text", numMerges = 8))
    val m = train(3)
    assert(m.size == 8 && m == train(7),
      "merge sequence must not depend on partitioning")
    // frequencies are non-increasing in rank ONLY per unchanged pair
    // space, but the top merge must dominate its round: sanity that
    // ranks are 1..8 and all freqs >= minFreq
    assert(m.map(_._1) == (1 to 8) && m.forall(_._4 >= 2L))
    // encode: concatenating a doc's bpe tokens reproduces its
    // normalized words (merges only regroup characters, never edit)
    import graft.functions.TextFunctions.tokens
    val enc = Bpe.applyBpe(docs, "doc_id", "text",
      m.map(r => (r._2, r._3)), foldBatch = 3)
    val joined = enc.join(
      docs.select(col("doc_id"), concat_ws("", tokens(col("text"))).as("__flat")),
      Seq("doc_id"))
    val bad = joined
      .withColumn("__cat", concat_ws("", col("bpe_tokens")))
      .filter(col("__cat") =!= col("__flat"))
    assert(bad.isEmpty, s"bpe concat must reproduce the words: ${bad.take(2).mkString}")
    // and encoding actually compresses: fewer symbols than characters
    val (symCount, charCount) = {
      val r = joined.agg(sum(size(col("bpe_tokens"))), sum(length(col("__flat")))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(symCount < charCount, s"merges must shorten the symbol stream ($symCount vs $charCount)")
  }
}

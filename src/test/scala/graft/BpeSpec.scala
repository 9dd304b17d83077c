package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe
import graft.sources.Tables

/** BPE trainer/encoder correctness beyond the q101 oracle (which
  * replays the 12 corpus merge rounds in DuckDB): hand-computed merge
  * sequences, the deterministic tie-break, the left-to-right overlap
  * rule, early stopping, batched ≡ sequential training, partitioning
  * invariance, and the encode roundtrip.
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

  test("batched training ≡ sequential where the disjoint window is valid") {
    import spark.implicits._
    // planted: three mutually symbol-disjoint pairs with distinct
    // frequencies — one batched round of 3 must replay the three
    // sequential rounds exactly, counts included
    val docs = Seq((1L, "ab ab ab ab cd cd cd ef ef")).toDF("doc_id", "text")
    val seqM = mergeRows(Bpe.trainBpe(docs, "text", numMerges = 3))
    val batM = mergeRows(Bpe.trainBpe(docs, "text", numMerges = 3, batchSize = 3))
    assert(seqM == Seq((1, "a", "b", 4L), (2, "c", "d", 3L), (3, "e", "f", 2L)))
    assert(batM == seqM, "one batched round must equal three sequential rounds")
    // real corpus: the prefix rule closes the window at the first
    // symbol collision, so batched stays equal to sequential here too
    val corpus = t.documents.select(col("doc_id"), col("text")).limit(300)
    assert(mergeRows(Bpe.trainBpe(corpus, "text", numMerges = 8, batchSize = 4)) ==
      mergeRows(Bpe.trainBpe(corpus, "text", numMerges = 8)),
      "batched merge sequence diverged from sequential on the corpus")
  }

  test("the window closes at the first symbol collision (prefix rule)") {
    import spark.implicits._
    // (a,b)=4 then (b,c)=3 share symbol b: round 1 must take ONLY
    // (a,b); (b,c)'s census count would change after the rewrite
    // (every "abc" occurrence consumes its b), so batching it would
    // report a stale frequency
    val docs = Seq((1L, "abc abc abc ab")).toDF("doc_id", "text")
    val m = mergeRows(Bpe.trainBpe(docs, "text", numMerges = 2, batchSize = 4))
    assert(m == mergeRows(Bpe.trainBpe(docs, "text", numMerges = 2)), m.toString)
    assert(m.head == ((1, "a", "b", 4L)), m.toString)
  }

  test("round cap scales with batchSize; over-cap numMerges is rejected fast") {
    import spark.implicits._
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    // 401 sequential rounds exceeds the 400-round cap
    val e = intercept[IllegalArgumentException] {
      Bpe.trainBpe(docs, "text", numMerges = 401)
    }
    assert(e.getMessage.contains("rounds"))
    // production vocab size fits under the cap with batching; the
    // tiny corpus exhausts after one merge so this stays cheap
    assert(mergeRows(Bpe.trainBpe(docs, "text", numMerges = 2000,
      batchSize = 8, minFreq = 1L)) == Seq((1, "a", "b", 1L)))
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

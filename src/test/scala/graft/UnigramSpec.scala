package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram

/** The unigram-LM tokenizer (r17): Viterbi segmentation semantics
  * (max-likelihood wins, longest-piece tie-break, char fallback,
  * unreachable words), the EM trainer's coverage floor and
  * partitioning invariance, and the encode-concat roundtrip.
  */
class UnigramSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def vocabDF(ps: (String, Double)*) = ps.toSeq.toDF("piece", "lnp")

  private def segs(words: Seq[String], vocab: org.apache.spark.sql.DataFrame,
                   m: Int = 6): Map[String, Seq[String]] =
    graft.operators.Unigram.viterbiSegments(words.toDF("w"), vocab, m)
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[String](1)).map(_.toSeq).orNull).toMap

  test("viterbiSegments picks the max-likelihood segmentation, falls back to chars, nulls unreachable words") {
    val v = vocabDF("a" -> -1.0, "b" -> -2.0, "ab" -> -1.5, "aab" -> -2.2)
    val got = segs(Seq("abab", "aab", "ba", "abx"), v)
    // ab+ab = -3.0 beats a+b+a+b = -6.0 and ab+a+b = -4.5
    assert(got("abab") == Seq("ab", "ab"), s"got ${got("abab")}")
    // the whole-word piece wins: -2.2 beats a+ab = -2.5 and a+a+b = -4
    assert(got("aab") == Seq("aab"), s"got ${got("aab")}")
    // no multi-char candidates -> char fallback
    assert(got("ba") == Seq("b", "a"), s"got ${got("ba")}")
    // 'x' is not in the vocab: unreachable -> null
    assert(got("abx") == null, s"got ${got("abx")}")
  }

  test("viterbiSegments breaks cost ties toward the longest piece (smallest start)") {
    // "ab"+"c" and "a"+"bc" tie at -3.0; the fold scans starts
    // ascending with strict >, so the earlier start (longer last
    // piece... the DP keeps the FIRST argmax) wins deterministically
    val v = vocabDF("a" -> -1.0, "c" -> -1.0, "ab" -> -2.0, "bc" -> -2.0,
      "b" -> -5.0)
    val got = segs(Seq("abc"), v)
    // position 3 candidates (j asc): j=0 'abc' absent; j=1 'bc' via
    // best(1)=a: -1-2=-3; j=2 'c' via best(2)=ab: -2-1=-3 — tie keeps
    // j=1, so the last piece is 'bc' and the path is a|bc
    assert(got("abc") == Seq("a", "bc"), s"got ${got("abc")}")
  }

  test("trainUnigram: char floor survives pruning, schedule shrinks the vocab, partitioning-invariant") {
    val docs = Seq.tabulate(50)(i =>
      (i.toLong, "alpha beta gamma " + (if (i % 2 == 0) "alphabet" else "betamax")))
      .toDF("doc_id", "text")
    val vocab = Unigram.trainUnigram(docs, "text", seedSize = 30,
      keepSizes = Seq(20, 8), maxPieceLen = 5, maxWordLen = 12)
    val rows = vocab.collect()
    val pieces = rows.map(_.getString(0)).toSet
    val chars = "alphbetgmx".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(pieces), s"char floor must survive: $pieces")
    assert(rows.count(_.getString(0).length > 1) <= 8,
      "final round keeps at most 8 multi-char pieces")
    // every lnp finite and negative; uses sum to a positive census
    assert(rows.forall(r => r.getDouble(2) < 0.0))
    val again = Unigram.trainUnigram(docs.repartition(7), "text",
      seedSize = 30, keepSizes = Seq(20, 8), maxPieceLen = 5, maxWordLen = 12)
    assert(vocab.orderBy("piece").collect().toSeq ==
      again.orderBy("piece").collect().toSeq,
      "training must be partitioning-invariant")
    intercept[IllegalArgumentException] {
      Unigram.trainUnigram(docs, "text", seedSize = 0, keepSizes = Seq(5))
    }
    intercept[IllegalArgumentException] {
      Unigram.trainUnigram(docs, "text", seedSize = 5, keepSizes = Nil)
    }
  }

  test("encodeUnigram: pieces concatenate back to the original words, doc order preserved") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma")).toDF("doc_id", "text")
    val vocab = Unigram.trainUnigram(docs, "text", seedSize = 20,
      keepSizes = Seq(10), maxPieceLen = 5, maxWordLen = 12)
    val enc = Unigram.encodeUnigram(docs, "doc_id", "text", vocab,
      maxPieceLen = 5, maxWordLen = 12)
      .orderBy("doc_id").collect()
    assert(enc.length == 2)
    val words1 = enc(0).getSeq[String](1).mkString("")
    assert(words1 == "alphabetaalpha",
      s"pieces must concatenate back to the token stream: $words1")
    assert(enc(1).getSeq[String](1).mkString("") == "betagamma")
    assert(enc.forall(r => r.getLong(2) == r.getSeq[String](1).size.toLong))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Wordpiece
import graft.sources.Tables

/** WordPiece trainer/encoder correctness beyond the q241/q242 oracle
  * (which replays the 10 corpus merge rounds and the greedy walk in
  * DuckDB): the likelihood score's defining behavior (a rare
  * always-together pair beats a frequent coincidental one — the exact
  * case where BPE's raw-count argmax picks differently), the ##
  * concatenation rule, greedy longest-match pinned against an
  * independent Scala reimplementation on real corpus words, [unk] on
  * unmatchable words, the no-[unk]-on-the-training-corpus guarantee,
  * and the artifact round-trip.
  */
class WordpieceSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  private def mergeRows(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Long)] =
    df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("likelihood score picks the rare always-together pair over the frequent coincidental one") {
    import spark.implicits._
    // (x, ##y): pf=4, fx=4,  f##y=4 -> score 4/16 = 0.25
    // (a, ##b): pf=6, fa=10, f##b=6 -> score 6/60 = 0.10
    // BPE's raw-count argmax would take (a, ##b) (6 > 4); WordPiece
    // must take (x, ##y) — the family's defining divergence
    val docs = Seq(
      (1L, "xy xy xy xy"),
      (2L, "ab ab ab ab ab ab ac ac ac ac")).toDF("doc_id", "text")
    val first = mergeRows(Wordpiece.trainWordpiece(docs, "text", numMerges = 1)).head
    assert((first._2, first._3) == ("x", "##y"),
      s"expected the likelihood argmax (x, ##y), got $first")
    val bpeFirst = graft.operators.Bpe.trainBpe(docs, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(bpeFirst == ("a", "b"), s"the BPE contrast must hold: $bpeFirst")
  }

  test("## concatenation: merged continuations stay continuations, word-initial merges stay roots") {
    import spark.implicits._
    // "aab" x 5: symbols |a||##a||##b|. Pairs: (a,##a) pf=5 fl(a)=5
    // fr(##a)=5 -> 0.2; (##a,##b) pf=5, 5*5 -> 0.2; tie breaks on
    // (l, r) asc: ("##a","##b") < ("a","##a") so ##ab forms first,
    // then (a, ##ab) -> aab — both concatenation shapes exercised
    val docs = Seq((1L, "aab aab aab aab aab")).toDF("doc_id", "text")
    val got = mergeRows(Wordpiece.trainWordpiece(docs, "text", numMerges = 2))
      .map(m => (m._2, m._3))
    assert(got == Seq(("##a", "##b"), ("a", "##ab")), s"merge sequence: $got")
    // the induced vocab carries the products
    val vocab = Wordpiece.wordpieceVocab(docs, "text",
      got).collect().map(_.getString(0)).toSet
    assert(Set("a", "##a", "##b", "##ab", "aab").subsetOf(vocab), s"vocab: $vocab")
  }

  /** Independent greedy longest-match (plain Scala, no Spark). */
  private def greedyRef(w: String, vocab: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = 0
    while (pos < w.length) {
      val cands = (w.length to (pos + 1) by -1).iterator.map { end =>
        val bare = w.substring(pos, end)
        if (pos == 0) bare else "##" + bare
      }.find(vocab.contains)
      cands match {
        case Some(p) => out += p; pos += (if (pos == 0) p.length else p.length - 2)
        case None => return Seq("[unk]")
      }
    }
    out.toSeq
  }

  test("greedy encode ≡ the independent reimplementation on real corpus words; training corpus has no [unk]") {
    val merges = Wordpiece.trainWordpiece(t.documents, "text", numMerges = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocabDf = Wordpiece.wordpieceVocab(t.documents, "text", merges)
    val vocab = vocabDf.collect().map(_.getString(0)).toSet
    val words = t.documents
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) <= 16).distinct()
    val segs = Wordpiece.greedySegments(words, vocabDf)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(segs.nonEmpty)
    segs.foreach { case (w, ps) =>
      assert(ps == greedyRef(w, vocab), s"greedy mismatch on '$w': $ps")
      assert(ps != Seq("[unk]"), s"training-corpus word '$w' must segment")
      // reconstruction: stripping ## and concatenating recovers the word
      assert(ps.map(_.stripPrefix("##")).mkString == w, s"'$w' != $ps")
    }
  }

  test("[unk] on unmatchable words; artifact save/load/encodeWith round-trips") {
    import spark.implicits._
    val train = Seq((1L, "abc abc ab")).toDF("doc_id", "text")
    val prepared = Wordpiece.prepareWordpiece(train, "text", numMerges = 2)
    // 'z' was never seen: the whole word collapses to [unk]
    val toEnc = Seq((1L, "abc zb")).toDF("doc_id", "text")
    val enc = Wordpiece.encodeWith(toEnc, "doc_id", "text", prepared)
      .collect().head
    val toks = enc.getSeq[String](enc.fieldIndex("wp_tokens"))
    assert(toks.contains("[unk]"), s"unseen char must yield [unk]: $toks")
    assert(!toks.take(toks.indexOf("[unk]")).contains("[unk]"))
    val dir = java.nio.file.Files.createTempDirectory("graft_wp").toString
    prepared.save(spark, dir)
    val loaded = Wordpiece.loadWordpiece(spark, dir)
    assert(loaded.pieces.toSet == prepared.pieces.toSet)
    val again = Wordpiece.encodeWith(toEnc, "doc_id", "text", loaded)
      .collect().head.getSeq[String](1)
    assert(again == toks, "loaded artifact must encode identically")
  }
}

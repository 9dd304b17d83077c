package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops._

/** Property test for [[graft.api.Ops.duplicateSpans]]: a seeded
  * random corpus (planted shared spans + incidental n-gram collisions
  * from a small vocabulary) compared against an independent
  * brute-force maximal-span computation in plain Scala — positional
  * n-grams, doc-frequency pruning, per-(pair, offset) island merge —
  * written from the SEMANTICS, not the Spark plan. The only
  * divergence possible between the two is a 60-bit gram-hash
  * collision (~2⁻⁶⁰ per gram pair; the brute force compares gram
  * strings directly).
  */
class DuplicateSpansPropertySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Brute-force reference: every maximal duplicated span of
    * ≥ minSpan tokens between documents, after dropping n-grams
    * appearing in more than maxDf distinct docs.
    */
  private def bruteSpans(docs: Seq[(Long, Seq[String])], n: Int,
                         minSpan: Int, maxDf: Long): Set[(Long, Long, Long, Long, Long)] = {
    // positional n-grams per doc, 1-based positions
    val grams: Map[Long, Seq[(Long, String)]] = docs.map { case (id, toks) =>
      id -> (if (toks.size >= n)
        (1 to toks.size - n + 1).map(i => (i.toLong, toks.slice(i - 1, i - 1 + n).mkString(" ")))
      else Seq.empty)
    }.toMap
    // doc frequency = DISTINCT docs containing the gram
    val df: Map[String, Int] = grams.toSeq
      .flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val kept: Map[Long, Seq[(Long, String)]] =
      grams.map { case (id, gs) => id -> gs.filter(pg => df(pg._2) <= maxDf) }
    val ids = docs.map(_._1).sorted
    val out = Set.newBuilder[(Long, Long, Long, Long, Long)]
    for (a <- ids; b <- ids if a < b) {
      val byGramB: Map[String, Seq[Long]] =
        kept(b).groupBy(_._2).map { case (g, xs) => g -> xs.map(_._1) }
      // all colliding (posA, posB) pairs, grouped by offset delta
      val matches: Seq[(Long, Long)] = for {
        (pa, g) <- kept(a)
        pb <- byGramB.getOrElse(g, Seq.empty)
      } yield (pa, pb)
      matches.groupBy { case (pa, pb) => pa - pb }.foreach { case (delta, ps) =>
        // islands: consecutive runs of posA (posA distinct within a delta)
        val sorted = ps.map(_._1).distinct.sorted
        var runStart = -1L; var prev = -2L
        def emit(last: Long): Unit = {
          val span = last - runStart + n
          if (runStart >= 0 && span >= minSpan)
            out += ((a, b, runStart, runStart - delta, span))
        }
        sorted.foreach { pa =>
          if (pa != prev + 1) { emit(prev); runStart = pa }
          prev = pa
        }
        emit(prev)
      }
    }
    out.result()
  }

  test("duplicateSpans matches the brute-force reference on a seeded random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 25).map(i => f"w$i%02d")
    val n = 4
    // 60 docs over a small vocabulary: incidental 4-gram collisions
    // occur naturally; planted spans guarantee long true positives
    val base: Array[Vector[String]] = Array.fill(60) {
      Vector.fill(20 + rnd.nextInt(61))(vocab(rnd.nextInt(vocab.size)))
    }
    // plant 25 shared spans of 6..20 tokens between random doc pairs
    for (_ <- 0 until 25) {
      val src = rnd.nextInt(base.length); var dst = rnd.nextInt(base.length)
      while (dst == src) dst = rnd.nextInt(base.length)
      val len = 6 + rnd.nextInt(15)
      val from = rnd.nextInt(math.max(1, base(src).size - len))
      val piece = base(src).slice(from, math.min(base(src).size, from + len))
      val at = rnd.nextInt(base(dst).size + 1)
      base(dst) = base(dst).take(at) ++ piece ++ base(dst).drop(at)
    }
    val docs = base.zipWithIndex.map { case (toks, i) => (i.toLong, toks) }.toSeq
    val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text")

    for (maxDf <- Seq(100L, 3L)) { // pruning off / aggressively on
      val got = df.duplicateSpans("doc_id", "text", n = n, minSpanTokens = 6, maxDf = maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val want = bruteSpans(docs, n, minSpan = 6, maxDf = maxDf)
      assert(want.nonEmpty, s"degenerate corpus: brute force found nothing at maxDf=$maxDf")
      val missing = want -- got
      val extra = got -- want
      assert(missing.isEmpty && extra.isEmpty,
        s"maxDf=$maxDf: ${want.size} expected, missing=${missing.take(5)} extra=${extra.take(5)}")
    }
  }
}

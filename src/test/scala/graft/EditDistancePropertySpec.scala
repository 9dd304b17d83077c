package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops._

/** Property test for [[graft.api.Ops.GraftDataFrameOps.editDistancePairs]]:
  * seeded random corpora over a TINY alphabet (so edit-neighbors are
  * dense and every candidate-generation path fires — duplicates,
  * empty strings, hot deletion-variant keys) compared against an
  * independent brute-force Levenshtein in plain Scala, written from
  * the textbook DP, not the Spark plan. Exercised at both d values
  * and with blockCap=1 (every key forced through the triangle
  * sub-block join) — all four configurations must reproduce the
  * brute force pair-for-pair.
  */
class EditDistancePropertySpec extends AnyFunSuite {
  import SparkTestSession._

  /** Textbook two-row DP Levenshtein. */
  private def lev(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      prev = cur
    }
    prev(b.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet

  test("editDistancePairs reproduces brute force on seeded random corpora") {
    import spark.implicits._
    for (seed <- Seq(7, 42, 1337)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc"
      val rows: Seq[(Long, String)] = (1L to 40L).map { id =>
        val len = rnd.nextInt(8) // 0..7, empties included
        id -> (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val df = rows.toDF("id", "s")
      for (d <- Seq(1, 2); cap <- Seq(1, 512)) {
        val got = df.editDistancePairs("id", "s", maxDistance = d, blockCap = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val want = brute(rows, d)
        assert(got == want,
          s"seed=$seed d=$d blockCap=$cap: missing=${want -- got} extra=${got -- want}")
      }
    }
  }
}

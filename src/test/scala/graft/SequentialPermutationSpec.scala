package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops

/** The r17 small-n decision layer: [[Ops.groupSequential]] pinned
  * against the published O'Brien–Fleming / Pocock boundary tables and
  * the absorbing-stop semantics, and [[Ops.permutationPByGroup]]
  * pinned against an INDEPENDENT Scala reimplementation of the seeded
  * procedure, the exhaustive enumeration at tiny n, and the
  * p = 1 / planted-shift extremes.
  */
class SequentialPermutationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def gsFrame(rows: Seq[(String, Double, Int)]): DataFrame =
    rows.toDF("arm", "v", "look")

  test("groupSequential: boundary tables match the published OBF/Pocock values at K=5") {
    // one row per (arm, look) keeps every look populated; the
    // boundary column is data-independent
    val df = gsFrame(for (l <- 1 to 5; a <- Seq("A", "B"); i <- 1 to 3)
      yield (a, 10.0 + i, l))
    def boundaries(spending: String): Seq[Double] =
      Ops.groupSequential(df, col("arm"), col("v"), col("look"), 5, spending)
        .orderBy(col("look")).collect().map(_.getAs[Double]("boundary")).toSeq
    // Jennison & Turnbull's classic two-sided alpha = .05 tables:
    // OBF c=2.040 -> c*sqrt(5/k); Pocock flat 2.413
    val obf = boundaries("obf")
    assert(obf.map(b => math.round(b * 1000) / 1000.0) ==
      Seq(4.562, 3.226, 2.634, 2.281, 2.040), s"OBF boundaries: $obf")
    val poc = boundaries("pocock")
    assert(poc == Seq.fill(5)(2.413), s"Pocock boundaries: $poc")
  }

  test("groupSequential: absorbing stop at the first crossing, empty looks continue, guards") {
    // looks 1-2 near-identical arms; from look 3 arm B jumps so the
    // cumulative z crosses the OBF boundary at look 4
    val calm = for (l <- 1 to 2; i <- 1 to 40) yield Seq(
      ("A", 100.0 + (i % 7), l), ("B", 100.0 + ((i + 3) % 7), l))
    val shifted = for (l <- 3 to 5; i <- 1 to 40) yield Seq(
      ("A", 100.0 + (i % 7), l), ("B", 160.0 + ((i + 3) % 7), l))
    val df = gsFrame((calm ++ shifted).flatten)
    val got = Ops.groupSequential(df, col("arm"), col("v"), col("look"), 5, "obf")
      .orderBy(col("look")).collect()
    val decisions = got.map(_.getAs[String]("decision")).toSeq
    val stopAt = got.head.getAs[Long]("stop_look")
    assert(got.map(_.getAs[Long]("look")).toSeq == (1L to 5L),
      "all five looks must report")
    val firstReject = decisions.indexOf("reject")
    assert(firstReject >= 0, s"the planted shift must stop the trial: $decisions")
    assert(decisions.take(firstReject).forall(_ == "continue"),
      s"before the stop: $decisions")
    assert(decisions.drop(firstReject + 1).forall(_ == "stopped"),
      s"after the stop: $decisions")
    assert(stopAt == firstReject + 1L, s"stop_look $stopAt vs $decisions")
    // an empty look reports its boundary with null z and cannot stop
    val sparse = gsFrame(for (i <- 1 to 30; a <- Seq("A", "B"))
      yield (a, 50.0 + i, 2))
    val s = Ops.groupSequential(sparse, col("arm"), col("v"), col("look"), 3, "pocock")
      .orderBy(col("look")).collect()
    assert(s.forall(_.getAs[String]("decision") == "continue"))
    // look 1 precedes all traffic -> null z; look 3 carries look 2's
    // CUMULATIVE census, so its z equals look 2's
    assert(s(0).isNullAt(s(0).fieldIndex("z")), s"look 1 should be null: ${s(0)}")
    assert(s(2).getAs[Double]("z") == s(1).getAs[Double]("z"),
      s"look 3 must inherit look 2's cumulative z: ${s.toSeq}")
    intercept[IllegalArgumentException] {
      Ops.groupSequential(sparse, col("arm"), col("v"), col("look"), 6, "obf")
    }
    intercept[IllegalArgumentException] {
      Ops.groupSequential(sparse, col("arm"), col("v"), col("look"), 3, "bonferroni")
    }
  }

  test("groupSequentialByGroup ≡ whole-frame groupSequential per slice; segments stop independently") {
    // segment s1 calm throughout; segment s2 shifts hard from look 2
    val rows = (for (l <- 1 to 3; i <- 1 to 30) yield Seq(
      ("s1", "A", 100.0 + (i % 5), l), ("s1", "B", 100.0 + ((i + 2) % 5), l),
      ("s2", "A", 100.0 + (i % 5), l),
      ("s2", "B", (if (l >= 2) 170.0 else 100.0) + ((i + 2) % 5), l))).flatten
    val df = rows.toDF("seg", "arm", "v", "look")
    val keyed = Ops.groupSequentialByGroup(df, "seg", col("arm"), col("v"),
      col("look"), 3, "obf").orderBy(col("grp"), col("look")).collect()
    // the defining identity: each segment's keyed rows equal the
    // whole-frame readout over that segment's slice
    Seq("s1", "s2").foreach { s =>
      val slice = Ops.groupSequential(df.filter(col("seg") === s), col("arm"),
        col("v"), col("look"), 3, "obf").orderBy(col("look")).collect()
        .map(_.toSeq.toSeq).toSeq
      val k = keyed.filter(_.getString(0) == s).map(_.toSeq.drop(1).toSeq).toSeq
      assert(k == slice, s"keyed segment $s must equal the whole-frame slice")
    }
    // independence: only the shifted segment stops
    val dec = keyed.map(r => (r.getString(0), r.getAs[Long]("look"),
      r.getAs[String]("decision")))
    assert(dec.filter(_._1 == "s1").forall(_._3 == "continue"),
      s"calm segment must never stop: ${dec.toSeq}")
    assert(dec.exists(d => d._1 == "s2" && d._3 == "reject"),
      s"shifted segment must stop: ${dec.toSeq}")
  }

  test("PreparedGroupSequential: absorb ≡ prepare-union, decide ≡ batch, save/load round-trips") {
    val early = (for (l <- 1 to 2; i <- 1 to 25) yield Seq(
      ("s1", "A", 100.0 + (i % 5), l), ("s1", "B", 100.0 + ((i + 2) % 5), l),
      ("s2", "A", 100.0 + (i % 5), l), ("s2", "B", 150.0 + ((i + 2) % 5), l))).flatten
    val late = (for (l <- 3 to 3; i <- 1 to 25) yield Seq(
      ("s1", "A", 100.0 + (i % 5), l), ("s1", "B", 100.0 + ((i + 2) % 5), l),
      ("s2", "A", 100.0 + (i % 5), l), ("s2", "B", 155.0 + ((i + 2) % 5), l))).flatten
    def df(rows: Seq[(String, String, Double, Int)]) =
      rows.toDF("seg", "arm", "v", "look")
    def canon(d: DataFrame) = d.collect().map(_.toSeq.toSeq).toSet
    // keyed form: absorb ≡ prepare over the union, census-exact
    val absorbed = Ops.prepareGroupSequential(df(early), col("arm"), col("v"),
        col("look"), 3, "obf", group = Some("seg"))
      .absorb(df(late), col("arm"), col("v"), col("look"))
    val direct = Ops.prepareGroupSequential(df(early ++ late), col("arm"),
      col("v"), col("look"), 3, "obf", group = Some("seg"))
    assert(canon(absorbed.census) == canon(direct.census),
      "absorbed census ≡ union census")
    // decide ≡ the batch keyed readout over all rows (shared gsDecide)
    val batch = Ops.groupSequentialByGroup(df(early ++ late), "seg",
      col("arm"), col("v"), col("look"), 3, "obf")
    assert(canon(absorbed.decide()) == canon(batch),
      "artifact decide ≡ batch groupSequentialByGroup")
    // whole-frame form: decide ≡ batch groupSequential
    val wf = Ops.prepareGroupSequential(df(early), col("arm"), col("v"),
        col("look"), 3, "pocock")
      .absorb(df(late), col("arm"), col("v"), col("look"))
    assert(canon(wf.decide()) == canon(Ops.groupSequential(df(early ++ late),
      col("arm"), col("v"), col("look"), 3, "pocock")),
      "whole-frame artifact decide ≡ batch groupSequential")
    // save/load round-trip preserves census and decide
    val dir = java.nio.file.Files.createTempDirectory("graft_gs_art").toString
    absorbed.save(dir)
    val loaded = Ops.loadGroupSequential(spark, dir)
    assert(loaded.group.contains("seg") && loaded.looks == 3 &&
      loaded.spending == "obf" && loaded.reliable)
    assert(canon(loaded.decide()) == canon(batch), "loaded decide ≡ batch")
    intercept[IllegalArgumentException] {
      Ops.prepareGroupSequential(df(early), col("arm"), col("v"), col("look"),
        7, "obf")
    }
  }

  private def permFrame(rows: Seq[(String, Long, Double)]): DataFrame =
    rows.toDF("grp", "id", "v")

  /** Independent reimplementation of the seeded permutation
    * procedure (java MessageDigest md5 + the same affine family +
    * the same (u, side, id) ranking), used to pin the engine's p
    * exactly.
    */
  private def referenceP(aRows: Seq[(String, Long, Double)],
                         bRows: Seq[(String, Long, Double)],
                         bPerms: Int, seed: Long = 7L): Map[String, Double] = {
    def h28(tag: String, side: String, id: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$tag:$seed:$side:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val pooled = aRows.map { case (g, i, v) => (g, "a", i.toString, v) } ++
      bRows.map { case (g, i, v) => (g, "b", i.toString, v) }
    pooled.groupBy(_._1).flatMap { case (g, rows) =>
      val withH = rows.map { case (_, s, i, v) =>
        (s, i, math.round(v * 100), h28("pm1", s, i), h28("pm2", s, i))
      }
      val nA = withH.count(_._1 == "a"); val nB = withH.count(_._1 == "b")
      if (nA == 0 || nB == 0) None else {
        val t = withH.map(r => BigInt(r._3)).sum
        val sObs = withH.filter(_._1 == "a").map(r => BigInt(r._3)).sum
        def stat(sA: BigInt) = (sA * (nA + nB) - t * nA).abs
        val obs = stat(sObs)
        val nGe = (1 to bPerms).count { b =>
          val ranked = withH.sortBy(r =>
            ((r._4 + b * r._5) % 268435456L, r._1, r._2))
          stat(ranked.take(nA).map(r => BigInt(r._3)).sum) >= obs
        }
        Some(g -> math.rint((nGe + 1).toDouble / (bPerms + 1).toDouble * 1e6) / 1e6)
      }
    }.toMap
  }

  test("permutationPByGroup: exact match with an independent reimplementation, two segments") {
    val a = (1L to 17L).map(i => (if (i % 2 == 0) "x" else "y", i, 10.0 + (i * 7 % 13)))
    val b = (1L to 23L).map(i => (if (i % 3 == 0) "x" else "y", i, 12.0 + (i * 5 % 11)))
    val got = Ops.permutationPByGroup(permFrame(a), permFrame(b),
        "grp", col("id"), col("v"), bPerms = 99)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("p")).toMap
    val want = referenceP(a, b, bPerms = 99)
    assert(got == want, s"engine $got vs reference $want")
  }

  test("permutationPByGroup: identical samples give p = 1, a planted extreme shift rejects") {
    val same = Ops.permutationPByGroup(
      permFrame((1L to 8L).map(i => ("g", i, 5.0))),
      permFrame((11L to 18L).map(i => ("g", i, 5.0))),
      "grp", col("id"), col("v"), bPerms = 199).collect().head
    assert(same.getAs[Double]("p") == 1.0,
      s"identical values must give p = 1: $same")
    val shifted = Ops.permutationPByGroup(
      permFrame((1L to 6L).map(i => ("g", i, 1000.0 + i))),
      permFrame((11L to 16L).map(i => ("g", i, 1.0 + i))),
      "grp", col("id"), col("v"), bPerms = 199).collect().head
    assert(shifted.getAs[Double]("p") <= 0.05,
      s"a 1000x planted shift must reject: $shifted")
    // degenerate: an empty side reports null p with counts saying why
    val degen = Ops.permutationPByGroup(
      permFrame((1L to 4L).map(i => ("g", i, 2.0))),
      permFrame(Seq.empty[(String, Long, Double)]),
      "grp", col("id"), col("v"), bPerms = 19).collect().head
    assert(degen.getAs[Long]("n_b") == 0L && degen.isNullAt(degen.fieldIndex("p")))
  }

  test("permutationPByGroup: seeded p converges to the exhaustive enumeration at tiny n") {
    val aVals = Seq(3.0, 9.0, 14.0); val bVals = Seq(6.0, 11.0, 21.0)
    val a = aVals.zipWithIndex.map { case (v, i) => ("g", i + 1L, v) }
    val b = bVals.zipWithIndex.map { case (v, i) => ("g", i + 11L, v) }
    // exact two-sided permutation p over all C(6,3) = 20 splits
    val cents = (aVals ++ bVals).map(v => BigInt(math.round(v * 100)))
    val t = cents.sum
    def stat(sA: BigInt) = (sA * 6 - t * 3).abs
    val obs = stat(aVals.map(v => BigInt(math.round(v * 100))).sum)
    val splits = cents.indices.combinations(3).toSeq
    val exact = splits.count(s => stat(s.map(cents).sum) >= obs).toDouble / splits.size
    val got = Ops.permutationPByGroup(permFrame(a), permFrame(b),
        "grp", col("id"), col("v"), bPerms = 999)
      .collect().head.getAs[Double]("p")
    assert(math.abs(got - exact) <= 0.1,
      s"seeded p $got vs exhaustive $exact (tolerance 0.1)")
  }

  test("permutationPByGroup: the small-n gate fails loudly past maxSegmentRows") {
    val a = permFrame((1L to 40L).map(i => ("g", i, i.toDouble)))
    val b = permFrame((101L to 140L).map(i => ("g", i, i * 2.0)))
    val err = intercept[Exception] {
      Ops.permutationPByGroup(a, b, "grp", col("id"), col("v"),
        bPerms = 19, maxSegmentRows = 50L).collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("maxSegmentRows"),
      s"expected the routing message, got: ${err.getMessage}")
    // acknowledged, the same call runs
    val ok = Ops.permutationPByGroup(a, b, "grp", col("id"), col("v"),
      bPerms = 19, allowWideSegments = true, maxSegmentRows = 50L).collect()
    assert(ok.length == 1 && !ok.head.isNullAt(ok.head.fieldIndex("p")))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.PValues

/** The portable p-value finishers against an INDEPENDENT double-
  * precision reference (classic series/continued-fraction
  * regularized incomplete gamma/beta with a DIFFERENT Lanczos set,
  * so shared-error cancellation can't mask a broken series), plus
  * the documented clamp/null guards and a hand-checked BH example.
  */
class PValuesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // ---- reference implementations (textbook algorithms) ----
  private def gammln(xx: Double): Double = {
    val cof = Array(76.18009172947146, -86.50532032941677,
      24.01409824083091, -1.231739572450155, 0.1208650973866179e-2,
      -0.5395239384953e-5)
    val x = xx; var y = xx
    var tmp = x + 5.5
    tmp -= (x + 0.5) * math.log(tmp)
    var ser = 1.000000000190015
    var j = 0
    while (j < 6) { y += 1.0; ser += cof(j) / y; j += 1 }
    -tmp + math.log(2.5066282746310005 * ser / x)
  }

  private def gser(a: Double, x: Double): Double = {
    var ap = a; var sum = 1.0 / a; var del = sum
    var n = 0
    while (n < 10000 && math.abs(del) >= math.abs(sum) * 1e-16) {
      ap += 1.0; del *= x / ap; sum += del; n += 1
    }
    sum * math.exp(-x + a * math.log(x) - gammln(a))
  }

  private def gcf(a: Double, x: Double): Double = {
    val fpmin = 1e-300
    var b = x + 1.0 - a; var c = 1.0 / fpmin; var d = 1.0 / b; var h = d
    var i = 1
    var del = 0.0
    while (i < 10000 && { del = 0.0; true }) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) i = 10000 else i += 1
    }
    math.exp(-x + a * math.log(x) - gammln(a)) * h
  }

  /** Q(a, x) — upper regularized incomplete gamma. */
  private def gammq(a: Double, x: Double): Double =
    if (x <= 0.0) 1.0
    else if (x < a + 1.0) 1.0 - gser(a, x)
    else gcf(a, x)

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val fpmin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0; var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d; var h = d
    var m = 1
    var done = false
    while (m <= 1000 && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) done = true
      m += 1
    }
    h
  }

  /** I_x(a, b) — regularized incomplete beta. */
  private def betai(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val bt = math.exp(gammln(a + b) - gammln(a) - gammln(b) +
      a * math.log(x) + b * math.log(1.0 - x))
    if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
    else 1.0 - bt * betacf(b, a, 1.0 - x) / b
  }

  private def refChi2P(x: Double, k: Double): Double = gammq(k / 2.0, x / 2.0)
  private def refTP(t: Double, nu: Double): Double =
    betai(nu / 2.0, 0.5, nu / (nu + t * t))
  private def refFP(f: Double, d1: Double, d2: Double): Double =
    betai(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))

  // ---- chi-square ----
  test("pValueChiSq matches the reference across the domain, clamps and nulls per contract") {
    val grid = (for {
      k <- Seq(1.0, 2.0, 3.0, 5.0, 10.0, 50.0, 200.0, 1199.0)
      x <- Seq(0.0, 0.5, 1.0, 2.7, 5.0, k / 2.0, k, 1.5 * k, 2.0 * k + 40.0,
        2.0 * k + 59.0, 2.0 * k + 61.0).distinct // ids must be UNIQUE keys
    } yield (s"k${k}_x$x", x, k)).distinct
    val df = grid.toDF("id", "stat", "dof")
    val got = PValues.pValueChiSq(df, "stat", "dof", Seq("id"))
      .select("id", "stat", "dof", "p").collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got.size == grid.size)
    for ((id, x, k) <- grid) {
      val (_, _, p) = got(id)
      val ref = refChi2P(x, k)
      if (x > 2 * k + 60) {
        assert(ref < 5e-7, s"$id: clamp domain must have true p < 5e-7 (ref=$ref)")
        assert(p == 0.0, s"$id: expected clamped 0, got $p")
      } else {
        assert(!p.isNaN, s"$id: unexpected null")
        assert(math.abs(p - ref) < 2e-6, s"$id: p=$p ref=$ref")
      }
    }
    // dof over the guaranteed domain -> null, never a truncated value
    val big = Seq(("a", 100.0, 1500.0)).toDF("id", "stat", "dof")
    val bigP = PValues.pValueChiSq(big, "stat", "dof", Seq("id")).select("p").collect()
    assert(bigP.head.isNullAt(0), "dof > 1200 must yield null p")
  }

  // ---- t ----
  test("pValueT matches the reference across both branches, any dof scale") {
    val grid = for {
      nu <- Seq(1.0, 2.0, 3.7, 10.0, 100.3, 10000.0, 1000000.0)
      t <- Seq(0.0, 0.5, 1.96, 2.0, 3.3, 5.0, 7.7, 8.0, 20.0, 100.0)
    } yield (s"nu${nu}_t$t", t, nu)
    val df = grid.toDF("id", "t", "nu")
    val got = PValues.pValueT(df, "t", "nu", Seq("id"))
      .select("id", "p").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    for ((id, t, nu) <- grid) {
      val p = got(id)
      val ref = refTP(t, nu)
      assert(!p.isNaN, s"$id: unexpected null")
      if (t * t < nu && t * t >= 60.0) {
        assert(ref < 5e-7, s"$id: clamp domain must have true p < 5e-7 (ref=$ref)")
        assert(p == 0.0, s"$id: expected clamped 0, got $p")
      } else {
        assert(math.abs(p - ref) < 2e-6, s"$id: p=$p ref=$ref (t=$t nu=$nu)")
      }
    }
  }

  // ---- F ----
  test("pValueF matches the reference across both branches and the large-d2 clamp") {
    val grid = for {
      d1 <- Seq(1.0, 3.0, 10.0, 40.0, 100.0)
      d2 <- Seq(1.0, 5.0, 100.0, 1999.0, 2001.0, 1000000.0)
      f <- Seq(0.0, 0.5, 1.0, 2.5, 3.84, 10.0, 50.0, 300.0)
    } yield (s"d1${d1}_d2${d2}_f$f", f, d1, d2)
    val df = grid.toDF("id", "f", "d1", "d2")
    val got = PValues.pValueF(df, "f", "d1", "d2", Seq("id"))
      .select("id", "p").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    for ((id, f, d1, d2) <- grid) {
      val p = got(id)
      val ref = refFP(f, d1, d2)
      assert(!p.isNaN, s"$id: unexpected null")
      if (d2 > 2000.0 && d1 * f >= 2.0 * d1 + 80.0) {
        assert(ref < 5e-7, s"$id: clamp domain must have true p < 5e-7 (ref=$ref)")
        assert(p == 0.0, s"$id: expected clamped 0, got $p")
      } else {
        assert(math.abs(p - ref) < 2e-6, s"$id: p=$p ref=$ref (f=$f d1=$d1 d2=$d2)")
      }
    }
    // numerator dof over the cap -> null
    val big = Seq(("a", 2.0, 150.0, 500.0)).toDF("id", "f", "d1", "d2")
    assert(PValues.pValueF(big, "f", "d1", "d2", Seq("id"))
      .select("p").collect().head.isNullAt(0), "d1 > 100 must yield null p")
  }

  /** Independent Kolmogorov tail: the Jacobi-theta COMPLEMENT form
    * for small λ (where the engine's direct series is at its
    * slowest) and an adaptively-truncated direct sum for large λ —
    * the classic probks recipe, sharing no code with the fixed-64
    * engine path.
    */
  private def refKsQ(lam: Double): Double = {
    if (lam <= 0.0) return 1.0
    if (lam < 1.18) {
      val y = math.exp(-math.Pi * math.Pi / (8.0 * lam * lam))
      val sum = y + math.pow(y, 9) + math.pow(y, 25) + math.pow(y, 49)
      1.0 - math.sqrt(2.0 * math.Pi) / lam * sum
    } else {
      var j = 1; var s = 0.0; var term = 1.0
      while (j < 200 && math.abs(term) > 1e-18) {
        term = (if (j % 2 == 1) 2.0 else -2.0) *
          math.exp(-2.0 * j * j * lam * lam)
        s += term; j += 1
      }
      math.max(0.0, s)
    }
  }

  // ---- Kolmogorov (two-sample KS asymptotic) ----
  test("pValueKs matches the independent theta/direct reference across the domain and clamps per contract") {
    val grid = Seq(0.0, 0.05, 0.1, 0.2, 0.201, 0.25, 0.3, 0.4, 0.5, 0.7,
      0.9, 1.0, 1.18, 1.36, 1.63, 2.0, 2.5, 2.79, 2.8, 3.5)
      .map(l => (s"lam$l", l))
    val df = grid.toDF("id", "lam")
    val got = PValues.pValueKs(df, "lam", Seq("id"))
      .select("id", "p").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    for ((id, lam) <- grid) {
      val p = got(id)
      val ref = refKsQ(lam)
      assert(!p.isNaN, s"$id: unexpected null")
      if (lam <= 0.2) {
        assert(ref > 1.0 - 5e-7, s"$id: p=1 guard domain must have true p rounding to 1 (ref=$ref)")
        assert(p == 1.0, s"$id: expected guarded 1, got $p")
      } else if (lam >= 2.8) {
        assert(ref < 5e-7, s"$id: clamp domain must have true p < 5e-7 (ref=$ref)")
        assert(p == 0.0, s"$id: expected clamped 0, got $p")
      } else {
        assert(math.abs(p - ref) < 2e-6, s"$id: p=$p ref=$ref (lam=$lam)")
      }
    }
    // null λ (a degenerate battery segment) passes through as null p
    val nul = Seq(("a", Some(1.0)), ("b", None)).toDF("id", "lam")
    val gotN = PValues.pValueKs(nul, "lam", Seq("id"))
      .select("id", "p").collect()
      .map(r => (r.getString(0), r.isNullAt(1))).toMap
    assert(!gotN("a") && gotN("b"), "null lambda must yield null p")
  }

  // ---- BH ----
  test("fdrAdjust reproduces the hand-computed Benjamini-Hochberg adjustment") {
    // classic example: m=5, sorted p = .01 .02 .03 .04 .5
    // raw m*p/i     = .05 .05 .05 .05 .5
    // reverse cummin= .05 .05 .05 .05 .5
    val df = Seq(("s1", 0.03), ("s2", 0.01), ("s3", 0.5), ("s4", 0.02),
      ("s5", 0.04)).toDF("grp", "p")
    val got = PValues.fdrAdjust(df, "p", Seq("grp"))
      .select("grp", "bh_rank", "m_tests", "p_adj").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("s2") == ((1L, 5L, 0.05)))
    assert(got("s4") == ((2L, 5L, 0.05)))
    assert(got("s1") == ((3L, 5L, 0.05)))
    assert(got("s5") == ((4L, 5L, 0.05)))
    assert(got("s3") == ((5L, 5L, 0.5)))
    // monotonicity repair: a later SMALLER raw value pulls earlier ranks down
    val df2 = Seq(("a", 0.010), ("b", 0.011), ("c", 0.012)).toDF("grp", "p")
    // raw = .03, .0165, .012 -> cummin from the right = .012, .012, .012
    val got2 = PValues.fdrAdjust(df2, "p", Seq("grp"))
      .select("grp", "p_adj").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got2 == Map("a" -> 0.012, "b" -> 0.012, "c" -> 0.012))
    // null p rows pass through unranked with null adjusted p
    val df3 = Seq(("a", Some(0.04)), ("b", None), ("c", Some(0.01)))
      .toDF("grp", "p")
    val got3 = PValues.fdrAdjust(df3, "p", Seq("grp"))
      .select("grp", "bh_rank", "m_tests", "p_adj").collect()
      .map(r => (r.getString(0),
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got3("b")._1 == -1L && got3("b")._3.isNaN)
    assert(got3("b")._2 == 2L, "m counts only non-null hypotheses")
    assert(got3("c") == ((1L, 2L, 0.02)))
    assert(got3("a") == ((2L, 2L, 0.04)))
  }

  // ---- Holm ----
  test("holmAdjust reproduces the hand-computed step-down adjustment") {
    // m=5, sorted p = .01 .02 .03 .04 .5
    // raw (m-i+1)p  = .05 .08 .09 .08 .5
    // running max   = .05 .08 .09 .09 .5  (rank 4's .08 pulled UP — the
    // step-down monotonicity repair, mirror image of BH's)
    val df = Seq(("s1", 0.03), ("s2", 0.01), ("s3", 0.5), ("s4", 0.02),
      ("s5", 0.04)).toDF("grp", "p")
    val got = PValues.holmAdjust(df, "p", Seq("grp"))
      .select("grp", "holm_rank", "m_holm", "p_holm").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("s2") == ((1L, 5L, 0.05)))
    assert(got("s4") == ((2L, 5L, 0.08)))
    assert(got("s1") == ((3L, 5L, 0.09)))
    assert(got("s5") == ((4L, 5L, 0.09)))
    assert(got("s3") == ((5L, 5L, 0.5)))
    // the >1 clamp: m=3, p = .5 .6 .7 -> raw 1.5 1.2 .7 -> max 1.5 -> 1
    val df2 = Seq(("a", 0.5), ("b", 0.6), ("c", 0.7)).toDF("grp", "p")
    val got2 = PValues.holmAdjust(df2, "p", Seq("grp"))
      .select("grp", "p_holm").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got2 == Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    // null p rows pass through unranked; m counts only non-null
    val df3 = Seq(("a", Some(0.04)), ("b", None), ("c", Some(0.01)))
      .toDF("grp", "p")
    val got3 = PValues.holmAdjust(df3, "p", Seq("grp"))
      .select("grp", "holm_rank", "m_holm", "p_holm").collect()
      .map(r => (r.getString(0),
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(got3("b")._1 == -1L && got3("b")._3.isNaN)
    assert(got3("b")._2 == 2L)
    assert(got3("c") == ((1L, 2L, 0.02)))
    assert(got3("a") == ((2L, 2L, 0.04)))
    // Holm >= BH pointwise on the same battery (FWER is the stricter
    // control) — checked on the q221-like mixed example
    val df4 = Seq(("w1", 0.010), ("w2", 0.40), ("k1", 0.015), ("k2", 0.80),
      ("m1", 0.011)).toDF("grp", "p")
    val both = PValues.holmAdjust(
        PValues.fdrAdjust(df4, "p", Seq("grp")), "p", Seq("grp"))
      .select("grp", "p_adj", "p_holm").collect()
    for (r <- both)
      assert(r.getDouble(2) >= r.getDouble(1) - 1e-12,
        s"${r.getString(0)}: Holm ${r.getDouble(2)} < BH ${r.getDouble(1)}")
  }

  // ---- family-keyed BH/Holm ----
  test("fdrAdjustByGroup / holmAdjustByGroup adjust each family on its own budget") {
    // family A: p = .01 .02 (m=2) -> BH .02 .02 ; Holm .02 .02
    // family B: p = .03 null .6 (m=2) -> BH .06 .6 ; Holm .06 .6
    // a GLOBAL adjustment would use m=4 and differ everywhere
    val df = Seq(
      ("A", "s1", Some(0.01)), ("A", "s2", Some(0.02)),
      ("B", "s3", Some(0.03)), ("B", "s4", Option.empty[Double]),
      ("B", "s5", Some(0.6))).toDF("fam", "grp", "p")
    val got = PValues.holmAdjustByGroup(
        PValues.fdrAdjustByGroup(df, "p", Seq("fam"), Seq("grp")),
        "p", Seq("fam"), Seq("grp"))
      .select("grp", "m_tests", "bh_rank", "p_adj", "m_holm", "holm_rank", "p_holm")
      .collect()
      .map(r => (r.getString(0), (
        r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) Double.NaN else r.getDouble(6)))).toMap
    assert(got("s1") == ((2L, 1L, 0.02, 2L, 1L, 0.02)))
    assert(got("s2") == ((2L, 2L, 0.02, 2L, 2L, 0.02)))
    assert(got("s3") == ((2L, 1L, 0.06, 2L, 1L, 0.06)))
    assert(got("s5") == ((2L, 2L, 0.6, 2L, 2L, 0.6)))
    val s4 = got("s4")
    assert(s4._1 == 2L && s4._2 == -1L && s4._3.isNaN &&
      s4._4 == 2L && s4._5 == -1L && s4._6.isNaN,
      s"null p passes through per family: $s4")
  }
}

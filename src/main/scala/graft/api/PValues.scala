package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Portable p-value finishers and multiple-testing control (r16 —
  * VERDICT r15 next #1: the 13-family keyed governance battery
  * computes χ²/F/t/H statistics; this module makes them DECIDABLE by
  * finishing each statistic into a p-value and adjusting the keyed
  * battery with Benjamini–Hochberg, all under the §3 oracle-replay
  * discipline).
  *
  * Every finisher is a fixed-iteration series the oracle replays
  * step-for-step in SQL (the q196 log-space statement): the
  * regularized incomplete gamma (χ², and the χ²-limit H) and the
  * regularized incomplete beta (t, F) are evaluated as
  *
  *   - an exploded index frame `n = 0..N-1` (N = 2048, fixed),
  *   - per-row log-increments `round(ln·, 12) ∓ round(ln·, 12)`
  *     cumulatively summed as EXACT DECIMAL(38,12) ordered by n —
  *     decimal, not double, so the running sum is associative and
  *     identical regardless of how an engine's window aggregator
  *     trees the additions (DuckDB segment-trees windowed sums;
  *     a double cumsum would drift at the last ulp),
  *   - max-normalized terms `round(exp(ℓ_n − M), 12)` summed as
  *     exact DECIMAL(38,14) (each term ≤ 1 — no overflow at any
  *     statistic magnitude, the reason the normalization exists),
  *   - one final fixed double tree combining the log-prefactor
  *     (Lanczos ln Γ — see [[lnGammaCol]]), M, and ln S, rounded
  *     at 6.
  *
  * Fixed-N series need DOMAIN GUARDS, and each is explicit, branch-
  * deterministic on round-6 inputs (both engines see identical
  * doubles, so both take identical branches), and documented at the
  * finisher: statistics large enough that p < 5e-7 (rounds to
  * 0.000000) short-circuit to 0 via proven tail bounds BEFORE the
  * series would need more terms than N; degenerate inputs (stat 0)
  * short-circuit to 1; parameters outside the guaranteed-convergence
  * domain (χ² dof > 1200, F numerator dof > 100) yield NULL — the
  * observable-degradation rule, never a silently wrong p.
  *
  * Scale shape: each finisher is one explode (N rows per test row —
  * test outputs are census-sized, segments × 2048 rows is nothing),
  * two key-partitioned windows and one keyed re-aggregation on the
  * SAME key (one exchange, reused). Adding segments adds
  * parallelism, not passes.
  */
object PValues {

  /** Fixed series length. Convergence margins at the documented
    * domain guards are derived in each finisher's scaladoc; all land
    * under 2048 with ≥ 40 halvings to spare.
    */
  val SeriesN = 2048

  /** Lanczos g = 7, 9-term ln Γ(a) for a ≥ 0.5 as a pure column
    * expression (the classic public coefficient set). Only the O(1)-
    * magnitude transcendental OUTPUTS (`ln t`, `ln A`) are rounded
    * at 12 — every other op is IEEE +/·/÷ on identical doubles,
    * which both engines round identically, so the whole expression
    * is bit-deterministic across Spark and DuckDB even at
    * a ~ 5·10⁵ where ln Γ itself is ~10⁶ (rounding THAT at 12 would
    * be sub-ulp noise). Accuracy ~1e-13 relative; a shared ε between
    * engine and oracle cancels in the compare, and ε shifts p by
    * ~1e-13 relative — invisible at round 6.
    */
  def lnGammaCol(a: Column): Column = {
    val g = 7.0
    val c = Seq(
      0.99999999999980993,
      676.5203681218851,
      -1259.1392167224028,
      771.32342877765313,
      -176.61502916214059,
      12.507343278686905,
      -0.13857109526572012,
      9.9843695780195716e-6,
      1.5056327351493116e-7)
    val t = a + lit(g - 0.5)
    val aSum = c.zipWithIndex.map {
      case (c0, 0) => lit(c0)
      case (ci, i) => lit(ci) / (a + lit(i - 1.0))
    }.reduce(_ + _)
    lit(0.5 * math.log(2.0 * math.Pi)) +
      (a - lit(0.5)) * round(log(t), 12) - t + round(log(aSum), 12)
  }

  /** Shared series core: given a one-row-per-key frame carrying the
    * sanitized per-key columns `__lnx` (ln of the ratio's constant
    * factor, already round-12), `__ra` and `__rb` such that the
    * term ratio T_n/T_{n-1} (n ≥ 1) is
    * `exp(__lnx + round(ln(__ra + n), 12) − round(ln(__rb + n), 12))`
    * (pass __ra = null-free sentinel and the caller's convention
    * `__ra < 0` meaning "no numerator factor"), returns one row per
    * key with all carried columns plus `__lnS` = ln Σ_{n<N} T_n
    * (T_0 = 1) as a double.
    *
    * keyCols must uniquely identify rows (test outputs are keyed);
    * with no keys the frame is 1-row census-scalar and the windows
    * are 1-row.
    */
  private def seriesLnSum(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = if (keyCols.nonEmpty) keyCols else Seq("__onekey")
    val base = if (keyCols.nonEmpty) df else df.withColumn("__onekey", lit(1))
    val carried = base.columns.filterNot(keys.contains).toSeq
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(keys.map(col): _*)
    val incr =
      when(col("__n") === 0, lit(0.0)).otherwise(
        col("__lnx") +
          when(col("__ra") >= 0.0, round(log(col("__ra") + col("__n")), 12))
            .otherwise(lit(0.0)) -
          round(log(col("__rb") + col("__n")), 12))
    val out = base
      .withColumn("__n", explode(sequence(lit(0), lit(SeriesN - 1))))
      .withColumn("__n", col("__n").cast("double"))
      // exact decimal cumulative log: associative, so identical in
      // any engine's window-aggregation order
      .withColumn("__l", sum(incr.cast(DecimalType(38, 12))).over(wCum))
      .withColumn("__m", max(col("__l")).over(wKey))
      // subtract as DOUBLES: Spark demotes decimal(38,12) −
      // decimal(38,12) to scale 11 (precision-cap rule) while DuckDB
      // keeps 12 — two exact decimal→double casts + one IEEE
      // subtraction are identical in both engines
      .withColumn("__term",
        round(exp(col("__l").cast("double") - col("__m").cast("double")), 12)
          .cast(DecimalType(38, 14)))
    out.groupBy(keys.map(col): _*)
      .agg(first(col("__m")).as("__mx"),
        sum(col("__term")).as("__s") +: carried.map(c => first(col(c)).as(c)): _*)
      .withColumn("__lnS",
        col("__mx").cast("double") + round(log(col("__s").cast("double")), 12))
      .drop("__mx", "__s")
      .drop(if (keyCols.nonEmpty) "__nonexistent" else "__onekey")
  }

  /** χ² (and Kruskal–Wallis H, whose null is the same χ²) upper-tail
    * p-value: p = Q(k/2, x/2), the regularized upper incomplete
    * gamma, finished portably per the module contract.
    *
    * Series: Q = 1 − P with P(a, z) = exp(a ln z − z − ln Γ(a+1)) ·
    * Σ_{n≥0} T_n, T_0 = 1, T_n/T_{n-1} = z/(a+n) — factorially
    * convergent past n ≈ z − a.
    *
    * Domain guards (a = k/2, z = x/2):
    *   - x ≤ 0 → p = 1 (and no ln(0) is ever taken);
    *   - x > 2k + 60 → p = 0: the Chernoff bound
    *     P(χ²_k ≥ x) ≤ ((x/k)·e^{1−x/k})^{k/2} is < 5e-7 for every
    *     k ≥ 1 at x = 2k + 60 (k=1: e^{-18}; k=10: 2e-11; k=100:
    *     e^{-32}), so the true p rounds to 0.000000 anyway;
    *   - k > 1200 → p NULL (observable): un-clamped z ≤ k + 30
    *     needs terms past the ratio-½ point 2z − a ≤ 1.5k + 60;
    *     k = 1200 → 1860 + 40 halvings ≤ 2048 = N. Larger dof would
    *     silently truncate — refuse instead.
    *
    * Inputs are the battery's round-6 doubles, so both engines take
    * identical branches. Output round 6; the 1 − P subtraction is
    * branch-guarded against IEEE −0.0.
    */
  def pValueChiSq(df: DataFrame, stat: String, dof: String,
                  keyCols: Seq[String], out: String = "p"): DataFrame = {
    // STAGED columns, one level per oracle CTE (pvg0..pvpar): a Scala
    // `val` reused inside a nested Column tree DUPLICATES its subtree
    // at construction, and eight levels of reuse blow the plan up
    // exponentially — the optimizer then walks that tree on EVERY run
    // (q216 read 7 s of pure plan time before this layering, r16).
    // Named non-cheap aliases referenced more than once stay aliases
    // under CollapseProject, exactly like the oracle's CTE chain.
    val prepared = df
      .withColumn("__pvx", col(stat).cast("double"))
      .withColumn("__pvk", col(dof).cast("double"))
      .withColumn("__okb",
        col("__pvx").isNotNull && col("__pvk").isNotNull &&
          col("__pvk") >= 1.0 && col("__pvx") >= 0.0 && col("__pvk") <= 1200.0)
      .withColumn("__clamp0",
        col("__okb") && col("__pvx") > lit(2.0) * col("__pvk") + lit(60.0))
      .withColumn("__triv1", col("__okb") && col("__pvx") <= 0.0)
      .withColumn("__run",
        col("__okb") && !col("__clamp0") && col("__pvx") > 0.0)
      // sanitized params: every non-series row computes on benign
      // stand-ins (ANSI-safe: no ln(0), no 0/0), masked at the end
      .withColumn("__aS",
        when(col("__run"), col("__pvk") / lit(2.0)).otherwise(lit(1.0)))
      .withColumn("__zS",
        when(col("__run"), col("__pvx") / lit(2.0)).otherwise(lit(1.0)))
      .withColumn("__lnx", round(log(col("__zS")), 12))
      .withColumn("__ra", lit(-1.0))
      .withColumn("__rb", col("__aS"))
      .withColumn("__lnpre",
        col("__aS") * round(log(col("__zS")), 12) - col("__zS") -
          lnGammaCol(col("__aS") + lit(1.0)))
    val praw = lit(1.0) - exp(col("__lnpre") + col("__lnS"))
    seriesLnSum(prepared, keyCols)
      .withColumn(out,
        when(!col("__okb"), lit(null).cast("double"))
          .when(col("__clamp0"), lit(0.0))
          .when(col("__triv1"), lit(1.0))
          // branch, don't clamp: round(−ε, 6) would emit IEEE −0.0
          .otherwise(when(praw > 0.0, round(praw, 6)).otherwise(lit(0.0))))
      .drop("__pvx", "__pvk", "__okb", "__clamp0", "__triv1", "__run",
        "__aS", "__zS", "__lnx", "__ra", "__rb", "__lnpre", "__lnS")
  }

  /** Two-sided Student/Welch t p-value: p = P(|T_ν| > t) =
    * I_x(ν/2, ½) with x = ν/(ν + t²), the regularized incomplete
    * beta, finished portably per the module contract. ν is the
    * battery's (real, Welch–Satterthwaite) round-6 dof.
    *
    * Series: I_X(A, B) = exp(A ln X + B ln X' + ln Γ(A+B) −
    * ln Γ(A+1) − ln Γ(B)) · Σ_{n≥0} U_n with U_0 = 1 and
    * U_n/U_{n-1} = X·(A+B+n−1)/(A+n) (the ₂F₁(A+B, 1; A+1; X)
    * form); X' is the complement computed as its OWN division
    * (t²/(ν+t²), never 1 − X) so engine and oracle round
    * identically.
    *
    * Branches (on identical round-6 inputs → identical in both
    * engines):
    *   - t = 0 → p = 1;
    *   - t² ≥ ν ("branch A"): direct series at X = ν/(ν+t²) ≤ ½,
    *     A = ν/2, B = ½ — the ratio is < X ≤ ½ from n = 0 (the
    *     numerator factor A+B+n−1 < A+n when B < 1), geometric
    *     immediately, ANY ν: the heavy small-ν tails that defeat
    *     clamping live exactly here and converge in < 60 terms;
    *   - t² < ν and t² ≥ 60 → p = 0: within this branch ν > 60, and
    *     P(|T_ν| > t) ≤ (1 + t²/ν)^{−(ν−1)/2} ≤ e^{−0.34·t²·(1−1/ν)}
    *     < 1e-8 at t² = 60 — rounds to 0;
    *   - else ("branch B"): p = 1 − I_Y(½, ν/2) at Y = t²/(ν+t²)
    *     < ½ — term growth peaks near n ≈ Y·(ν+1)/2·(1−Y)⁻¹ ≤ 2t²
    *     ≤ 120 and the ratio is ≤ ¾ past n ≈ 2t², hundreds of
    *     spare halvings under N.
    */
  def pValueT(df: DataFrame, t: String, nu: String,
              keyCols: Seq[String], out: String = "p"): DataFrame = {
    // staged per oracle CTE level — see pValueChiSq on why
    val prepared = df
      .withColumn("__pvt", col(t).cast("double"))
      .withColumn("__pvn", col(nu).cast("double"))
      .withColumn("__okb",
        col("__pvt").isNotNull && col("__pvn").isNotNull && col("__pvn") >= 1.0)
      .withColumn("__t2", col("__pvt") * col("__pvt"))
      .withColumn("__triv1", col("__okb") && col("__t2") <= 0.0)
      .withColumn("__bA", col("__t2") >= col("__pvn"))
      .withColumn("__clamp0",
        col("__okb") && !col("__bA") && col("__t2") >= 60.0)
      .withColumn("__run",
        col("__okb") && !col("__clamp0") && col("__t2") > 0.0)
      .withColumn("__t2S", when(col("__run"), col("__t2")).otherwise(lit(1.0)))
      .withColumn("__nvS", when(col("__run"), col("__pvn")).otherwise(lit(4.0)))
      .withColumn("__xa", col("__nvS") / (col("__nvS") + col("__t2S")))
      .withColumn("__xb", col("__t2S") / (col("__nvS") + col("__t2S")))
      .withColumn("__aP",
        when(col("__bA"), col("__nvS") / lit(2.0)).otherwise(lit(0.5)))
      .withColumn("__bP",
        when(col("__bA"), lit(0.5)).otherwise(col("__nvS") / lit(2.0)))
      .withColumn("__xP", when(col("__bA"), col("__xa")).otherwise(col("__xb")))
      .withColumn("__xC", when(col("__bA"), col("__xb")).otherwise(col("__xa")))
      .withColumn("__ab", col("__aP") + col("__bP"))
      .withColumn("__a1", col("__aP") + lit(1.0))
      .withColumn("__lnx", round(log(col("__xP")), 12))
      .withColumn("__ra", col("__ab") - lit(1.0))
      .withColumn("__rb", col("__aP"))
      .withColumn("__lnpre",
        col("__aP") * round(log(col("__xP")), 12) +
          col("__bP") * round(log(col("__xC")), 12) +
          lnGammaCol(col("__ab")) - lnGammaCol(col("__a1")) -
          lnGammaCol(col("__bP")))
    val inc = exp(col("__lnpre") + col("__lnS"))
    val praw = when(col("__bA"), inc).otherwise(lit(1.0) - inc)
    seriesLnSum(prepared, keyCols)
      .withColumn(out,
        when(!col("__okb"), lit(null).cast("double"))
          .when(col("__triv1"), lit(1.0))
          .when(col("__clamp0"), lit(0.0))
          .otherwise(
            when(praw >= 1.0, lit(1.0))
              .when(praw > 0.0, round(praw, 6))
              .otherwise(lit(0.0))))
      .drop("__pvt", "__pvn", "__okb", "__t2", "__triv1", "__bA",
        "__clamp0", "__run", "__t2S", "__nvS", "__xa", "__xb", "__aP",
        "__bP", "__xP", "__xC", "__ab", "__a1", "__lnx", "__ra", "__rb",
        "__lnpre", "__lnS")
  }

  /** F upper-tail p-value: p = P(F_{d1,d2} > f) = I_X(d2/2, d1/2)
    * with X = d2/(d2 + d1·f) — same incomplete-beta series as
    * [[pValueT]] (identical machinery, X' again its own division
    * d1·f/(d2 + d1·f)).
    *
    * Branches and guards:
    *   - f ≤ 0 → p = 1; d1 > 100 → NULL (numerator dof is a group
    *     count — an ANOVA with >100 arms is outside the guaranteed
    *     series domain; observable, never truncated);
    *   - d2 ≤ 2000: fully exact, branch on X ≤ ½ (direct, A = d2/2,
    *     B = d1/2 ≤ 50: growth ≤ B terms then geometric) vs X > ½
    *     (complement at Y = d1f/(d2+d1f) < ½, A = d1/2, B = d2/2:
    *     growth peaks ≤ B − A ≤ 1000, ratio ≤ ¾ past ~B and
    *     monotonically falling toward Y — e^{-300} of margin at N);
    *   - d2 > 2000 and d1·f ≥ 2·d1 + 80 → p = 0: split the event on
    *     the denominator χ²_{d2}/d2 ≥ ¾ —
    *     P ≤ P(χ²_{d1} ≥ ¾·s) + P(χ²_{d2} ≤ ¾·d2); at s = 2d1+80,
    *     d1 ≤ 100 the first is ≤ (3e^{-2})^{d1/2} · margin < 2e-8
    *     and the second ≤ (¾·e^{¼})^{d2/2} ≤ 0.963^{1000} < 5e-17;
    *   - d2 > 2000 otherwise: complement branch with s < 2d1 + 80 ≤
    *     280 → Y < 0.13, growth ≤ 165 terms, ratio ≤ ¾ past ~240.
    */
  def pValueF(df: DataFrame, f: String, d1: String, d2: String,
              keyCols: Seq[String], out: String = "p"): DataFrame = {
    // staged per oracle CTE level — see pValueChiSq on why (this
    // finisher was the blow-up's worst case: q216 spent 7 s per run
    // in pure plan time before the layering, 0.5 s after)
    val prepared = df
      .withColumn("__pvf", col(f).cast("double"))
      .withColumn("__pk1", col(d1).cast("double"))
      .withColumn("__pk2", col(d2).cast("double"))
      .withColumn("__okb",
        col("__pvf").isNotNull && col("__pk1").isNotNull &&
          col("__pk2").isNotNull && col("__pvf") >= 0.0 &&
          col("__pk1") >= 1.0 && col("__pk2") >= 1.0 && col("__pk1") <= 100.0)
      .withColumn("__triv1", col("__okb") && col("__pvf") <= 0.0)
      .withColumn("__s1", col("__pk1") * col("__pvf"))
      .withColumn("__clamp0",
        col("__okb") && col("__pk2") > 2000.0 &&
          col("__s1") >= lit(2.0) * col("__pk1") + lit(80.0))
      .withColumn("__run",
        col("__okb") && !col("__clamp0") && col("__pvf") > 0.0)
      .withColumn("__fS", when(col("__run"), col("__pvf")).otherwise(lit(1.0)))
      .withColumn("__k1S", when(col("__run"), col("__pk1")).otherwise(lit(1.0)))
      .withColumn("__k2S", when(col("__run"), col("__pk2")).otherwise(lit(4.0)))
      .withColumn("__sS", col("__k1S") * col("__fS"))
      .withColumn("__xa", col("__k2S") / (col("__k2S") + col("__sS")))
      .withColumn("__xb", col("__sS") / (col("__k2S") + col("__sS")))
      .withColumn("__bA", col("__xa") <= 0.5)
      .withColumn("__aP",
        when(col("__bA"), col("__k2S") / lit(2.0))
          .otherwise(col("__k1S") / lit(2.0)))
      .withColumn("__bP",
        when(col("__bA"), col("__k1S") / lit(2.0))
          .otherwise(col("__k2S") / lit(2.0)))
      .withColumn("__xP", when(col("__bA"), col("__xa")).otherwise(col("__xb")))
      .withColumn("__xC", when(col("__bA"), col("__xb")).otherwise(col("__xa")))
      .withColumn("__ab", col("__aP") + col("__bP"))
      .withColumn("__a1", col("__aP") + lit(1.0))
      .withColumn("__lnx", round(log(col("__xP")), 12))
      .withColumn("__ra", col("__ab") - lit(1.0))
      .withColumn("__rb", col("__aP"))
      .withColumn("__lnpre",
        col("__aP") * round(log(col("__xP")), 12) +
          col("__bP") * round(log(col("__xC")), 12) +
          lnGammaCol(col("__ab")) - lnGammaCol(col("__a1")) -
          lnGammaCol(col("__bP")))
    val inc = exp(col("__lnpre") + col("__lnS"))
    val praw = when(col("__bA"), inc).otherwise(lit(1.0) - inc)
    seriesLnSum(prepared, keyCols)
      .withColumn(out,
        when(!col("__okb"), lit(null).cast("double"))
          .when(col("__triv1"), lit(1.0))
          .when(col("__clamp0"), lit(0.0))
          .otherwise(
            when(praw >= 1.0, lit(1.0))
              .when(praw > 0.0, round(praw, 6))
              .otherwise(lit(0.0))))
      .drop("__pvf", "__pk1", "__pk2", "__okb", "__triv1", "__s1",
        "__clamp0", "__run", "__fS", "__k1S", "__k2S", "__sS", "__xa",
        "__xb", "__bA", "__aP", "__bP", "__xP", "__xC", "__ab", "__a1",
        "__lnx", "__ra", "__rb", "__lnpre", "__lnS")
  }

  /** Two-sample Kolmogorov–Smirnov asymptotic p-value (r16): given
    * the battery's round-6 λ = √(n_a·n_b/(n_a+n_b)) · D, finishes
    * p = Q_KS(λ) = 2 Σ_{j≥1} (−1)^{j−1} e^{−2j²λ²} — the Kolmogorov
    * distribution's upper tail — as a FIXED-64-term alternating sum
    * of round-12 terms accumulated as exact DECIMAL(38,14). No
    * log-space machinery is needed here (unlike [[pValueChiSq]] /
    * [[pValueT]]): every term is in (0, 1], and past the round-12
    * floor BOTH engines add exact zeros, so the truncation itself is
    * portable — the entire 64-term sum is bit-identical by the same
    * argument as the series core's term sum.
    *
    * Domain guards (λ is round-6, so both engines branch
    * identically):
    *   - λ ≤ 0.2 → p = 1: the Jacobi-theta complement
    *     1 − Q(λ) = (√(2π)/λ) Σ_{j≥1} e^{−(2j−1)²π²/(8λ²)} is, at
    *     λ = 0.2, bounded by (√(2π)/0.2)·e^{−π²/0.32}·(1 + e^{−π²})
    *     < 6e-13 — the true p rounds to 1.000000 anyway;
    *   - λ ≥ 2.8 → p = 0: the alternating series brackets
    *     Q(λ) < 2e^{−2λ²} = 2e^{−15.68} ≈ 3.1e-7 < 5e-7 — rounds to
    *     0.000000;
    *   - inside (0.2, 2.8) the terms reach the round-12 zero floor
    *     at 2j²λ² > ln(2e12) ≈ 28.3, i.e. j > 3.77/λ ≤ 19 — 64
    *     terms is 3× the worst case, with every truncated term an
    *     exact zero in both engines;
    *   - null λ → NULL (the battery's degenerate segments pass
    *     through to BH unranked).
    *
    * Scale shape: one 64-row explode per test row + one keyed
    * re-aggregation — test outputs are census-sized, so this is
    * nothing.
    */
  def pValueKs(df: DataFrame, lambda: String, keyCols: Seq[String],
               out: String = "p"): DataFrame = {
    val keys = if (keyCols.nonEmpty) keyCols else Seq("__onekey")
    val base0 = if (keyCols.nonEmpty) df else df.withColumn("__onekey", lit(1))
    val lam = col(lambda).cast("double")
    val okBase = lam.isNotNull && lam >= 0.0
    val triv1 = okBase && lam <= 0.2
    val clamp0 = okBase && lam >= 2.8
    val run = okBase && !triv1 && !clamp0
    // sanitized stand-in (1.0) keeps the non-series rows benign; the
    // result is masked by the guards below
    val base = base0.withColumn("__lamS", when(run, lam).otherwise(lit(1.0)))
    val carried = base.columns.filterNot(keys.contains).toSeq
    val jd = col("__j").cast("double")
    val term =
      (when(pmod(col("__j"), lit(2)) === 1, lit(1.0)).otherwise(lit(-1.0)) *
        round(exp(lit(-2.0) * jd * jd * col("__lamS") * col("__lamS")), 12))
        .cast(DecimalType(38, 14))
    val summed = base
      .withColumn("__j", explode(sequence(lit(1), lit(64))))
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__t")).as("__ksS"),
        count(lit(1)).as("__kn") +: carried.map(c => first(col(c)).as(c)): _*)
    val praw = lit(2.0) * col("__ksS").cast("double")
    summed
      .withColumn(out,
        // the re-aggregation is only correct when keyCols uniquely
        // identify rows (first() merges duplicates' carried columns
        // and the decimal term sums add up) — a contract violation
        // fails loudly here instead of emitting a plausible p: a
        // unique key explodes to exactly 64 series rows
        when(col("__kn") =!= 64, raise_error(concat(
          lit(s"pValueKs: keyCols (${keys.mkString(", ")}) must uniquely " +
            "identify rows - key "),
          concat_ws("|", keys.map(k => col(k).cast("string")): _*),
          lit(" holds "), (col("__kn") / 64).cast("long").cast("string"),
          lit(" rows"))).cast("double"))
          .when(!okBase, lit(null).cast("double"))
          .when(triv1, lit(1.0))
          .when(clamp0, lit(0.0))
          .otherwise(
            when(praw >= 1.0, lit(1.0))
              .when(praw > 0.0, round(praw, 6))
              .otherwise(lit(0.0))))
      .drop("__ksS", "__lamS", "__kn")
      .drop(if (keyCols.nonEmpty) "__nonexistent" else "__onekey")
  }

  /** The KS effective-λ finisher argument over a two-sample report
    * (r17 — ADVICE r16 #4: q220 and [[graft.api.Ops
    * .governanceBatteryByGroup]] carried this expression as two
    * verbatim copies that could drift; this is the ONE definition
    * both now call): `λ = round(D·√(n_a·n_b/(n_a+n_b)), 6)`, null on
    * a null D or an empty side (the divisor is then 0 — the guard
    * masks it before any division). Round 6 so [[pValueKs]]'s domain
    * branches select identically in both engines (§3 branch rule).
    */
  def ksLambda(dStat: Column, nA: Column, nB: Column): Column =
    when(dStat.isNotNull && nA > 0 && nB > 0,
      round(dStat * sqrt(nA.cast("double") * nB.cast("double") /
        (nA.cast("double") + nB.cast("double"))), 6))

  /** Benjamini–Hochberg FDR adjustment over a keyed test battery:
    * given one p-value per hypothesis (segment), emits
    * `bh_rank` (1-based rank by ascending p, keys as tiebreak),
    * `m_tests` (the non-null hypothesis count), and `out` =
    * min(1, min_{j ≥ rank} m·p_j/j) rounded at 6 — the adjusted
    * p the battery is actually decided on.
    *
    * The ranks and the reverse running min ride UNPARTITIONED
    * ordered windows — BH is a rank procedure over the HYPOTHESES,
    * whose count is the segment domain (bounded by construction,
    * the league-table pattern), never the corpus. Null-p rows sort
    * via a sentinel ABOVE the p range (engines disagree on default
    * null ordering) and pass through with null rank/adjusted-p;
    * both engines' running MIN skips nulls identically.
    *
    * keyCols must order rows totally (unique keys) so both engines
    * rank ties identically.
    */
  def fdrAdjust(df: DataFrame, pCol: String, keyCols: Seq[String],
                out: String = "p_adj"): DataFrame = {
    require(keyCols.nonEmpty, "fdrAdjust: keyCols must order the hypotheses")
    val p = col(pCol).cast("double")
    val pOrd = coalesce(p, lit(2.0))
    val ascCols = pOrd.asc +: keyCols.map(col(_).asc)
    val descCols = pOrd.desc +: keyCols.map(col(_).desc)
    val wAll = Window.partitionBy()
    val wAsc = Window.orderBy(ascCols: _*)
    val wDesc = Window.orderBy(descCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("m_tests", count(when(p.isNotNull, lit(1))).over(wAll))
      .withColumn("bh_rank",
        when(p.isNotNull, row_number().over(wAsc).cast("long")))
      .withColumn("__raw",
        when(p.isNotNull,
          round(col("m_tests").cast("double") * p /
            col("bh_rank").cast("double"), 12)))
      .withColumn(out,
        when(p.isNotNull,
          round(least(lit(1.0), min(col("__raw")).over(wDesc)), 6)))
      .drop("__raw")
  }

  /** [[fdrAdjust]] keyed by a FAMILY (r16 wave 4 — the
    * multi-experiment form: a platform running hundreds of
    * experiments adjusts each experiment's segment battery on its
    * OWN budget, not one global budget that lets a giant experiment
    * starve a small one): identical rank/reverse-running-min
    * machinery with every window PARTITIONED BY the family columns —
    * which is also the form that scales, since families adjust in
    * parallel instead of one league table. `m_tests` and `bh_rank`
    * are per-family. keyCols must order rows totally WITHIN a
    * family.
    */
  def fdrAdjustByGroup(df: DataFrame, pCol: String, famCols: Seq[String],
                       keyCols: Seq[String], out: String = "p_adj"): DataFrame = {
    require(famCols.nonEmpty, "fdrAdjustByGroup: famCols must name the family")
    require(keyCols.nonEmpty,
      "fdrAdjustByGroup: keyCols must order the hypotheses")
    val p = col(pCol).cast("double")
    val pOrd = coalesce(p, lit(2.0))
    val ascCols = pOrd.asc +: keyCols.map(col(_).asc)
    val descCols = pOrd.desc +: keyCols.map(col(_).desc)
    val wFam = Window.partitionBy(famCols.map(col): _*)
    val wAsc = Window.partitionBy(famCols.map(col): _*).orderBy(ascCols: _*)
    val wDesc = Window.partitionBy(famCols.map(col): _*).orderBy(descCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("m_tests", count(when(p.isNotNull, lit(1))).over(wFam))
      .withColumn("bh_rank",
        when(p.isNotNull, row_number().over(wAsc).cast("long")))
      .withColumn("__raw",
        when(p.isNotNull,
          round(col("m_tests").cast("double") * p /
            col("bh_rank").cast("double"), 12)))
      .withColumn(out,
        when(p.isNotNull,
          round(least(lit(1.0), min(col("__raw")).over(wDesc)), 6)))
      .drop("__raw")
  }

  /** [[holmAdjust]] keyed by a family — see [[fdrAdjustByGroup]];
    * the same family-partitioned windows, Holm's running max.
    */
  def holmAdjustByGroup(df: DataFrame, pCol: String, famCols: Seq[String],
                        keyCols: Seq[String], out: String = "p_holm"): DataFrame = {
    require(famCols.nonEmpty, "holmAdjustByGroup: famCols must name the family")
    require(keyCols.nonEmpty,
      "holmAdjustByGroup: keyCols must order the hypotheses")
    val p = col(pCol).cast("double")
    val pOrd = coalesce(p, lit(2.0))
    val ascCols = pOrd.asc +: keyCols.map(col(_).asc)
    val wFam = Window.partitionBy(famCols.map(col): _*)
    val wAsc = Window.partitionBy(famCols.map(col): _*).orderBy(ascCols: _*)
    val wAscRun = Window.partitionBy(famCols.map(col): _*).orderBy(ascCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("m_holm", count(when(p.isNotNull, lit(1))).over(wFam))
      .withColumn("holm_rank",
        when(p.isNotNull, row_number().over(wAsc).cast("long")))
      .withColumn("__hraw",
        when(p.isNotNull,
          round((col("m_holm") - col("holm_rank") + 1).cast("double") * p, 12)))
      .withColumn(out,
        when(p.isNotNull,
          round(least(lit(1.0), max(col("__hraw")).over(wAscRun)), 6)))
      .drop("__hraw")
  }

  /** Holm–Bonferroni step-down adjustment over a keyed test battery
    * (r16 — the FAMILY-WISE-ERROR twin of [[fdrAdjust]]: BH bounds
    * the expected fraction of false alerts, Holm bounds the chance
    * of ANY false alert — the control a ship/no-ship decision wants
    * where a monitoring dashboard wants BH). Emits `m_holm` (the
    * non-null hypothesis count), `holm_rank` (ascending-p rank, keys
    * as tiebreak — the same total order as BH's), and `out` =
    * min(1, max_{j ≤ rank} (m−j+1)·p_j) rounded at 6 — the running
    * MAX is Holm's monotonicity repair, the mirror image of BH's
    * reverse running min.
    *
    * Same league-table window contract as [[fdrAdjust]]: the
    * hypotheses are the segment domain, bounded by construction;
    * null-p rows sort last via the 2.0 sentinel and pass through
    * unranked with null adjusted p.
    */
  def holmAdjust(df: DataFrame, pCol: String, keyCols: Seq[String],
                 out: String = "p_holm"): DataFrame = {
    require(keyCols.nonEmpty, "holmAdjust: keyCols must order the hypotheses")
    val p = col(pCol).cast("double")
    val pOrd = coalesce(p, lit(2.0))
    val ascCols = pOrd.asc +: keyCols.map(col(_).asc)
    val wAll = Window.partitionBy()
    val wAsc = Window.orderBy(ascCols: _*)
    val wAscRun = Window.orderBy(ascCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("m_holm", count(when(p.isNotNull, lit(1))).over(wAll))
      .withColumn("holm_rank",
        when(p.isNotNull, row_number().over(wAsc).cast("long")))
      .withColumn("__hraw",
        when(p.isNotNull,
          round((col("m_holm") - col("holm_rank") + 1).cast("double") * p, 12)))
      .withColumn(out,
        when(p.isNotNull,
          round(least(lit(1.0), max(col("__hraw")).over(wAscRun)), 6)))
      .drop("__hraw")
  }
}

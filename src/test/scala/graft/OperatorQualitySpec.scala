package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.sources.Tables

/** Semantic quality checks for the operators without a SQL oracle
  * (SURVEY.md §2 rows-only entries): LSH recall, SimHash locality,
  * IVF recall, multimodal pipeline shape.
  */
class OperatorQualitySpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q33 MinHash+LSH recovers the exact-Jaccard near-dup pairs") {
    val exact = pairs(Dedup.q32(t))
    val lsh   = pairs(Dedup.q33(t))
    assert(exact.nonEmpty, "exact near-dup set should not be empty")
    // LSH candidates are verified with exact Jaccard, so no false
    // positives are possible; recall must be high for 0.5+ similarity
    // with 16 bands x 4 rows.
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (exact=${exact.size}, lsh=${lsh.size})")
    // LSH may legitimately find MORE pairs than q32 (whose min-shingle
    // blocking can miss pairs LSH banding catches); every LSH pair is
    // already exact-Jaccard-verified >= 0.5 inside q33 itself.
  }

  test("q34 SimHash: near-dup docs are hamming-close, random docs are not") {
    val sims = Dedup.q34(t).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearDup = pairs(Dedup.q32(t)).head
    val near = hamming(sims(nearDup._1), sims(nearDup._2))
    val far  = hamming(sims(0L), sims(250L))
    assert(near < 10, s"near-dup pair hamming=$near, expected < 10")
    assert(far > near, s"random pair ($far) should be farther than near-dup ($near)")
  }

  test("q36 IVF ANN has nonzero recall vs q35 brute force") {
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.q35(t))
    val ivf   = hits(Similarity.q36(t))
    val recall = (exact & ivf).size.toDouble / exact.size
    // nprobe=2 over 8 cells; embeddings are near-random (weakly
    // clusterable), so the bound is modest — real corpora cluster.
    assert(recall > 0.3, s"IVF recall $recall vs brute force too low")
  }

  test("r17 quantileTreatmentEffect: exact rank semantics hand-checked; a tail-only shift moves p90 and nothing else; keyed ≡ whole-frame per slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.api.Ops
    // hand-check: arm a = 1..10, arm b = 11..20; p50 rank = ceil(5.0)
    // = 5 → a 500 cents, b 1500; p90 rank 9 → a 900, b 1900
    val a10 = (1 to 10).map(_.toDouble).toDF("v")
    val b10 = (11 to 20).map(_.toDouble).toDF("v")
    val hand = Ops.quantileTreatmentEffect(a10, b10, col("v"))
      .orderBy(col("pct")).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(hand(50L)._1 == 500L && hand(50L)._2 == 1500L,
      s"p50: ${hand(50L)}")
    assert(hand(90L)._1 == 900L && hand(90L)._2 == 1900L,
      s"p90: ${hand(90L)}")
    assert(hand(10L)._1 == 100L, s"p10 rank ceil(1.0)=1: ${hand(10L)}")
    // tail-only shift: identical bodies, arm b's top ~15% doubled —
    // the p90 pick (rank 180, just past the 85-boundary's cum 170)
    // must move while p10..p75 stay inside the untouched body
    val body = (1 to 200).map(i => (i % 100 + 1).toDouble)
    val aT = body.toDF("v")
    val bT = body.map(v => if (v > 85) v * 2 else v).toDF("v")
    val qte = Ops.quantileTreatmentEffect(aT, bT, col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(qte(10L) == 0L && qte(25L) == 0L && qte(50L) == 0L &&
      qte(75L) == 0L, s"the body must not move: $qte")
    assert(qte(90L) > 0L, s"the planted tail shift must surface at p90: $qte")
    // keyed ≡ whole-frame per slice; a one-armed segment reports
    val ka = a10.withColumn("g", lit("s1"))
      .unionByName(aT.withColumn("g", lit("s2")))
    val kb = b10.withColumn("g", lit("s1"))
    val keyed = Ops.quantileTreatmentEffectByGroup(ka, kb, "g", col("v"))
      .orderBy(col("grp"), col("pct")).collect()
    val s1 = keyed.filter(_.getString(0) == "s1").map(_.toSeq.drop(1).toSeq).toSeq
    val wf = Ops.quantileTreatmentEffect(a10, b10, col("v"))
      .orderBy(col("pct")).collect().map(_.toSeq.toSeq).toSeq
    assert(s1 == wf, "keyed segment must equal the whole-frame slice")
    val s2 = keyed.filter(_.getString(0) == "s2")
    assert(s2.nonEmpty && s2.forall(r => r.getLong(3) == 0L && r.isNullAt(6)),
      s"the one-armed segment must report with null qte: ${s2.toSeq}")
    intercept[IllegalArgumentException] {
      Ops.quantileTreatmentEffect(a10, b10, col("v"), pcts = Seq(0))
    }
  }

  test("r17 quantileTreatmentEffectSketch: every midpoint within width/2 of the exact quantile, qte_mid within width; prepared-arm guards") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.api.Ops
    val a = (1 to 500).map(i => (i % 173).toDouble).toDF("v")
    val b = (1 to 500).map(i => ((i * 7) % 211 + 20).toDouble).toDF("v")
    val width = 8.0
    val exact = Ops.quantileTreatmentEffect(a, b, col("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3) / 100.0, r.getLong(4) / 100.0,
          r.getLong(5) / 100.0)).toMap
    val sk = Ops.quantileTreatmentEffectSketch(a, b, col("v"), width)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    exact.keys.foreach { p =>
      assert(math.abs(sk(p)._1 - exact(p)._1) <= width / 2,
        s"p$p arm a midpoint: ${sk(p)._1} vs exact ${exact(p)._1}")
      assert(math.abs(sk(p)._2 - exact(p)._2) <= width / 2,
        s"p$p arm b midpoint: ${sk(p)._2} vs exact ${exact(p)._2}")
      assert(math.abs(sk(p)._3 - exact(p)._3) <= width,
        s"p$p qte_mid: ${sk(p)._3} vs exact ${exact(p)._3}")
    }
    // from-prepared ≡ the one-shot sketch (shared code, exact absorb)
    val pa = Ops.prepareQuantiles(a, Seq.empty, col("v"), width)
    val pb = Ops.prepareQuantiles(b, Seq.empty, col("v"), width)
    assert(Ops.qteSketchFromPrepared(pa, pb).collect().map(_.toSeq.toSeq).toSet ==
      Ops.quantileTreatmentEffectSketch(a, b, col("v"), width)
        .collect().map(_.toSeq.toSeq).toSet)
    intercept[IllegalArgumentException] {
      Ops.qteSketchFromPrepared(pa, Ops.prepareQuantiles(b, Seq.empty, col("v"), 4.0))
    }
    intercept[IllegalArgumentException] {
      Ops.qteSketchFromPrepared(pa,
        Ops.prepareQuantiles(b.withColumn("g", lit("x")), Seq("g"), col("v"), width))
    }
  }

  test("r17 winsorizedWelch: a planted whale that flips the raw Welch barely moves the winsorized one; bounds are the exact rank picks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.api.Ops
    val base = (1 to 100).map(i => 100.0 + (i % 11))
    val a = (base :+ 1000000.0).toDF("v") // one whale
    val b = base.map(_ + 0.5).toDF("v")
    val raw = Ops.welchT(a, b, col("v")).collect().head
    val win = Ops.winsorizedWelch(a, b, col("v"), pctLow = 5).collect().head
    val rawT = math.abs(raw.getAs[Double]("t"))
    val winT = math.abs(win.getAs[Double]("t"))
    // the whale inflates arm a's raw mean ~9900 above b; winsorizing
    // clips it to the 95th-percentile value, so the tiny true 0.5
    // shift is what remains
    assert(math.abs(win.getAs[Double]("mean_a") - win.getAs[Double]("mean_b")) < 2.0,
      s"winsorized means must sit near the true body: $win")
    assert(math.abs(raw.getAs[Double]("mean_a") - raw.getAs[Double]("mean_b")) > 1000.0,
      s"the raw mean must be whale-dominated: $raw")
    assert(winT < rawT || rawT < 2.0,
      s"winsorizing must defuse the whale (raw |t|=$rawT, wins |t|=$winT)")
    // bounds: arm b's exact rank-5 pick — the first census value
    // (100.5, i.e. 10050 cents) already carries cumulative count 9 ≥ 5
    assert(win.getLong(4) == 10050L,
      s"lo_b_cents must be the rank-5 value: $win")
    intercept[IllegalArgumentException] {
      Ops.winsorizedWelch(a, b, col("v"), pctLow = 0)
    }
  }

  test("r17 alwaysValidCi: the defining duality — msprt rejects at α exactly when 0 falls outside the CI; keyed ≡ whole-frame per slice") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def arms(shift: Double): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = (
      (1 to 200).map(i => 100.0 + (i % 13)).toDF("v"),
      (1 to 200).map(i => 100.0 + shift + ((i + 5) % 13)).toDF("v"))
    // sweep the effect through the boundary: both regimes must appear
    // and the duality must hold at EVERY point
    val verdicts = Seq(0.0, 0.4, 0.8, 1.2, 2.0, 4.0, 8.0).map { shift =>
      val (a, b) = arms(shift)
      val m = graft.api.Ops.msprt(a, b, col("v"), tau2 = 25.0).collect().head
      val c = graft.api.Ops.alwaysValidCi(a, b, col("v"), tau2 = 25.0).collect().head
      val reject = m.getAs[Boolean]("reject")
      val zeroOutside = c.getAs[Double]("ci_lo") > 0.0 || c.getAs[Double]("ci_hi") < 0.0
      assert(reject == zeroOutside,
        s"duality must hold at shift=$shift: reject=$reject ci=[${c.get(6)}, ${c.get(7)}]")
      reject
    }
    assert(verdicts.contains(true) && verdicts.contains(false),
      s"the sweep must cross the boundary: $verdicts")
    // keyed ≡ whole-frame per slice (the engine-wide keying identity)
    val (a0, b0) = arms(0.0); val (a8, b8) = arms(8.0)
    val ka = a0.withColumn("g", lit("calm")).unionByName(a8.withColumn("g", lit("hot")))
    val kb = b0.withColumn("g", lit("calm")).unionByName(b8.withColumn("g", lit("hot")))
    val keyed = graft.api.Ops.alwaysValidCiByGroup(ka, kb, "g", col("v"), tau2 = 25.0)
      .orderBy(col("grp")).collect().map(r => r.toSeq.drop(1).toSeq).toSeq
    val slices = Seq(("calm", a0, b0), ("hot", a8, b8)).map { case (_, a, b) =>
      graft.api.Ops.alwaysValidCi(a, b, col("v"), tau2 = 25.0)
        .collect().head.toSeq.toSeq
    }
    assert(keyed == slices, "keyed rows must equal the whole-frame slices")
    intercept[IllegalArgumentException] {
      graft.api.Ops.alwaysValidCi(a0, b0, col("v"), tau2 = -1.0)
    }
  }

  test("r17 knLmScore: continuation probability beats raw frequency — a many-context word scores higher in a new context than an equally-frequent one-context word") {
    import spark.implicits._
    import graft.api.Ops._
    import org.apache.spark.sql.functions.col
    // 'multi' and 'locked' are equally frequent (4 each), but multi
    // completes 4 distinct contexts while locked only ever follows
    // 'san' — the Kneser–Ney pathology case: in the NEW context both
    // bigrams are singletons, so only the continuation term differs
    val docs = Seq(
      (1L, "aa multi"), (2L, "bb multi"), (3L, "cc multi"), (4L, "dd multi"),
      (5L, "san locked"), (6L, "san locked"), (7L, "san locked"), (8L, "san locked"),
      (9L, "new multi"), (10L, "new locked")).toDF("doc_id", "text")
    val got = docs.knLmScore("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(9L) < got(10L),
      s"'new multi' must carry LOWER perplexity than 'new locked' " +
        s"(continuation counts 5 vs 2): ${got(9L)} vs ${got(10L)}; " +
        "an add-k model scores them identically")
    // q73's add-k model cannot distinguish them — the family contrast
    val addk = docs.lmScore("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(addk(9L) == addk(10L),
      s"add-k must tie the two by construction: ${addk(9L)} vs ${addk(10L)}")
    // <2-token docs drop, matching lmScore's contract
    val tiny = Seq((1L, "word"), (2L, "two words")).toDF("doc_id", "text")
      .knLmScore("doc_id", "text").collect()
    assert(tiny.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("r17 dsirSelect: target-like documents outrank off-target ones; deterministic under repartitioning; empty docs compete on Gumbel alone") {
    import spark.implicits._
    import graft.api.Ops._
    import org.apache.spark.sql.functions.col
    // two disjoint vocabularies: docs 0..39 speak the target language,
    // docs 40..79 something else entirely; the target corpus samples
    // the first vocabulary
    def sent(seed: Int, vocab: Seq[String]): String =
      (0 until 12).map(i => vocab((seed * 7 + i * 3) % vocab.size)).mkString(" ")
    val tVocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val oVocab = Seq("zork", "quux", "fnord", "blorp", "wibble")
    val raw = ((0L until 40L).map(i => (i, sent(i.toInt, tVocab))) ++
      (40L until 80L).map(i => (i, sent(i.toInt, oVocab))) ++
      Seq((80L, ""))).toDF("doc_id", "text")
    val target = (100 until 110).map(i => (i.toLong, sent(i, tVocab)))
      .toDF("doc_id", "text")
    val sel = raw.dsirSelect(target, "doc_id", "text", k = 30)
    val ids = sel.collect().map(_.getLong(0)).toSeq
    val onTarget = ids.count(_ < 40L)
    assert(onTarget >= 28, s"selection must strongly favor the target vocabulary: " +
      s"$onTarget/30 on-target ($ids)")
    // the importance weights separate cleanly even before the Gumbel
    // (the ranking is RELATIVE — add-one smoothing over the bucket
    // domain shifts all weights when the target corpus is small)
    val allW = raw.dsirSelect(target, "doc_id", "text", k = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    val onW = allW.filter(_._1 < 40L).map(_._2)
    val offW = allW.filter(w => w._1 >= 40L && w._1 < 80L).map(_._2)
    assert(onW.min > offW.max + 10.0,
      s"weights must separate the vocabularies: on ≥ ${onW.min}, off ≤ ${offW.max}")
    // determinism: a different partitioning selects the same rows in
    // the same order
    val again = raw.repartition(13).dsirSelect(target, "doc_id", "text", k = 30)
      .collect().map(_.toSeq.toSeq).toSeq
    assert(again == sel.collect().map(_.toSeq.toSeq).toSeq,
      "dsirSelect must be partitioning-invariant")
    // the empty doc exists in the candidate set with lnw = 0 when k
    // spans everything
    val all = raw.dsirSelect(target, "doc_id", "text", k = 100).collect()
    val empty = all.find(_.getLong(0) == 80L).get
    assert(empty.getAs[Long]("n_grams") == 0L && empty.getAs[Double]("lnw") == 0.0,
      s"the gram-free doc must compete on its Gumbel alone: $empty")
    intercept[IllegalArgumentException] {
      raw.dsirSelect(target, "doc_id", "text", k = 0)
    }
  }

  test("r17 ivfRecallCurve: recall non-decreasing in nprobe, exhaustive depth is the recall-1 anchor, the q36 point sits on the curve") {
    import org.apache.spark.sql.functions.col
    val curve = Similarity.q240(t).collect()
    assert(curve.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L))
    val recalls = curve.map(_.getAs[Double]("recall")).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must be non-decreasing in probe depth: $recalls")
    val scans = curve.map(_.getAs[Double]("scan_fraction")).toSeq
    assert(scans.zip(scans.tail).forall { case (a, b) => b > a },
      s"scan cost must strictly grow with depth: $scans")
    // depth 8 probes every cell: the routing is exhaustive, so the
    // top-k IS the exact top-k — the anchor the curve must hit
    val full = curve.last
    assert(full.getAs[Double]("recall") == 1.0, s"exhaustive depth: $full")
    assert(full.getAs[Long]("n_overlap") == full.getAs[Long]("n_exact"))
    assert(full.getAs[Long]("n_silent_miss") == 0L)
    // scan_fraction at depth 8 ≈ 1 (all cells = the corpus minus self)
    assert(full.getAs[Double]("scan_fraction") > 0.99, s"exhaustive scan: $full")
    // the q36 operating point (nprobe=2) must agree with the gated
    // q200 report's aggregate — the curve and the report share truth
    val q200 = graft.api.Ops.annRecallReport(
      Similarity.q35(t), Similarity.q36(t), "qid", "vid")
      .agg(org.apache.spark.sql.functions.sum(col("n_exact")).as("e"),
        org.apache.spark.sql.functions.sum(col("n_overlap")).as("o"))
      .collect().head
    val p2 = curve(1)
    assert(p2.getAs[Long]("n_exact") == q200.getAs[Long]("e") &&
      p2.getAs[Long]("n_overlap") == q200.getAs[Long]("o"),
      s"nprobe=2 curve row $p2 must match the q200 aggregate $q200")
  }

  test("cosine_sim expression matches manual double computation") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS c")
    val got = df.collect().head.getDouble(0)
    val expected = {
      val (a, b) = (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(got === expected)
  }

  test("q43 HLL distinct counts are within 5% of exact") {
    val approx = graft.operators.Vectors.q43(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((flag, (ep, eo)) <- exact) {
      val (ap, ao) = approx(flag)
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$flag parts: approx=$ap exact=$ep")
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$flag orders: approx=$ao exact=$eo")
    }
  }

  test("hllDistinct: partitioning-invariant, null-blind, exact-duplicate-blind") {
    import graft.api.Ops._
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 7, (i % 1000).toLong))
      .toDF("g", "v")
    def est(d: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      d.hllDistinct(Seq("g"), col("v"), "e").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val e = est(df)
    // registers are maxes over a deterministic hash → identical under
    // any partitioning, and duplicates can't move an estimate
    assert(est(df.repartition(13)) == e)
    assert(est(df.unionByName(df)) == e, "exact duplicates must not change the estimate")
    // nulls are ignored (COUNT DISTINCT semantics)
    val withNulls = df.unionByName(
      Seq((0, null.asInstanceOf[java.lang.Long])).toDF("g", "v"))
    assert(est(withNulls) == e)
    // accuracy sanity at the documented ~1.6% sigma: every group holds
    // ~1000/7 reused values → true distinct ≈ 142-143 per group... but
    // v = i % 1000 spread over g = i % 7: distinct per group is the
    // values hitting that residue — assert within 5% of the exact
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("x")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, x) =>
      assert(math.abs(e(g) - x).toDouble / x < 0.05, s"group $g: est=${e(g)} exact=$x")
    }
    assert(intercept[IllegalArgumentException] {
      df.hllDistinct(Seq("g"), col("v"), "e", p = 3)
    }.getMessage.contains("[4, 16]"))
    // a group-less estimate over an EMPTY input is 0, not null (the
    // zero-row sum coalesces — r10 review)
    val empty = df.filter(col("g") < -1)
    assert(empty.hllDistinct(Seq.empty, col("v"), "e").collect()(0).getLong(0) == 0L)
    // the native typed aggregate (portable_hll) computes the SAME
    // hash, registers and estimate — exactly equal to the frame form,
    // grouped and global, so the q43 oracle semantics extend into any
    // single-pass Aggregate (profile()'s contract)
    graft.functions.GraftFunctions.register(spark)
    val viaAgg = df.groupBy(col("g"))
      .agg(expr("portable_hll(CAST(v AS STRING), 12)").as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaAgg == e, "portable_hll aggregate must equal hllDistinct exactly")
    assert(empty.agg(expr("portable_hll(CAST(v AS STRING), 12)")).collect()(0).getLong(0) == 0L)
  }

  test("portable HLL register sketches: max-merge IS the union sketch, exactly") {
    import graft.api.Ops
    import spark.implicits._
    val ev = Tables(spark, sfDir).events
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    val group = Seq("event_type")
    val regsU = Ops.hllRegisters(ev, group, col("user_id"))
    val merged = Ops.hllMergeRegisters(group,
      Ops.hllRegisters(a, group, col("user_id")),
      Ops.hllRegisters(b, group, col("user_id")))
    // EXACT equality — registers are maxes, so merging halves loses
    // nothing: this is what makes sketch-table absorption error-free
    assert(merged.except(regsU).isEmpty && regsU.except(merged).isEmpty,
      "max-merged registers must equal the union registers row-for-row")
    // and therefore the merged estimate equals the union estimate
    def est(r: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Ops.hllEstimateFromRegisters(r, group, "e").collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(est(merged) == est(regsU))
    // the shard-table demo path agrees with the one-shot hllDistinct
    val viaSketches = graft.operators.Sketches
      .portableMergedDistinct(graft.operators.Sketches
        .portableShardSketches(ev, "event_type", "user_id"))
      .collect()(0).getLong(0)
    val oneShot = {
      import graft.api.Ops._
      ev.hllDistinct(Seq.empty, col("user_id"), "e").collect()(0).getLong(0)
    }
    assert(viaSketches == oneShot,
      s"sketch-table path $viaSketches must equal one-shot $oneShot")
  }

  test("portable quantile registers: sum-merge IS the union census; estimates within width/2") {
    import graft.api.Ops
    val li = t.lineitem.select(col("l_returnflag"), col("l_quantity"))
    val a = li.filter(col("l_quantity") <= 25)
    val b = li.filter(col("l_quantity") > 25)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Ops.quantileRegisters(df, Seq("l_returnflag"), col("l_quantity"), 1.0)
    val full = regs(li).collect().map(_.toString).sorted.toSeq
    val merged = Ops.quantileMergeRegisters(Seq("l_returnflag"), regs(a), regs(b))
      .collect().map(_.toString).sorted.toSeq
    assert(full == merged, "sum-merged shard censuses must equal the union census row-for-row")
    // estimates vs the exact nearest-rank quantile: within width/2
    val sketch = Ops.quantileFromRegisters(
      Ops.quantileRegisters(li, Seq("l_returnflag"), col("l_quantity"), 1.0),
      Seq("l_returnflag"), 1.0, Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val byFlag = li.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byFlag.foreach { case (flag, vs) =>
      val exact50 = vs(math.ceil(0.5 * vs.length).toInt - 1)
      val exact95 = vs(math.ceil(0.95 * vs.length).toInt - 1)
      assert(math.abs(sketch(flag)._1 - exact50) <= 0.5, s"$flag p50")
      assert(math.abs(sketch(flag)._2 - exact95) <= 0.5, s"$flag p95")
    }
    // non-finite values are IGNORED like nulls (the aggregate's
    // convention): without the filter a NaN lands silently in Spark's
    // bucket 0 while DuckDB's CAST(NaN AS BIGINT) throws — the census
    // must never depend on that divergence
    import spark.implicits._
    val dirty = Seq(("g", 1.0), ("g", Double.NaN), ("g", Double.PositiveInfinity),
      ("g", Double.NegativeInfinity), ("g", 3.0)).toDF("g", "v")
    val clean = Ops.quantileRegisters(dirty, Seq("g"), col("v"), 1.0)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(clean == Map(1L -> 1L, 3L -> 1L), s"non-finite rows must vanish: $clean")
    // ...and so must finite values whose bucket would SATURATE the
    // Long key space (Spark floor-casts 1e19 to Long.MaxValue while
    // DuckDB's BIGINT cast throws — the same divergence class)
    val huge = Seq(("g", 1.0), ("g", 1.0e19), ("g", -1.0e19)).toDF("g", "v")
    val hugeCensus = Ops.quantileRegisters(huge, Seq("g"), col("v"), 1.0)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hugeCensus == Map(1L -> 1L), s"bucket-overflow rows must vanish: $hugeCensus")
  }

  test("portable_quantiles is callable from plain SQL (decimal/int literals coerce)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("pq_sql_probe")
    // 0.5 parses as DECIMAL and 1 as INT in SQL — both must coerce
    val r = spark.sql(
      "SELECT portable_quantiles(CAST(v AS DOUBLE), 0.5, 1) FROM pq_sql_probe").head().getSeq[Double](0)
    assert(math.abs(r(0) - 50.0) <= 0.0625 && math.abs(r(1) - 100.0) <= 0.0625, r.toString)
    spark.catalog.dropTempView("pq_sql_probe")
  }

  test("ivfPqTopK excludeSelf: corpus-id collisions drop under the batch convention, rank under the stream's") {
    import graft.operators.Similarity
    import spark.implicits._
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(d => math.cos(seed * 13 + d * 5).abs + 0.1)
    val corpus = (0L until 20L).map(i => (i, vec(i.toInt))).toDF("vec_id", "emb")
    val centroids = Seq((100L, vec(1)), (101L, vec(2))).toDF("centroid_id", "cent_emb")
    val idx = Similarity.prepareIvfPqIndex(corpus, centroids,
      id = "vec_id", emb = "emb", centroidId = "centroid_id", centroidEmb = "cent_emb",
      dim = 8, m = 4, ks = 4)
    // the query's id COLLIDES with corpus vector 5 and its embedding
    // is vector 5's exact duplicate — the nearest match by any metric
    val q = Seq((5L, vec(5))).toDF("qid2", "qemb")
    val withSelf = idx.topK(q, "qid2", "qemb", k = 3, nprobe = 2, excludeSelf = false)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toList
    // the coded duplicate carries the minimum ADC distance — it must
    // appear (at coarse m·ks other vectors can TIE its code, so rank
    // breaks on vid; containment is the semantic under test)
    assert(withSelf.map(_._2).contains(5L),
      s"excludeSelf=false must surface the coded duplicate: $withSelf")
    val without = idx.topK(q, "qid2", "qemb", k = 3, nprobe = 2)
      .collect().map(r => r.getLong(2)).toList
    assert(!without.contains(5L),
      s"the batch convention must drop the colliding id: $without")
  }

  test("portable_quantiles aggregate: partitioning-invariant, tracks nearest-rank, magnitude-safe") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = (1 to 100).map(_.toDouble).toDF("v")
    def run(parts: Int): Seq[Double] =
      df.repartition(parts)
        .agg(call_function("portable_quantiles", col("v"), lit(0.5), lit(0.95)))
        .head().getSeq[Double](0)
    val one = run(1)
    // deterministic final resolution ⇒ bit-identical under ANY split
    assert(one == run(13) && one == run(32))
    // range 99 → final width 2^-5: estimates within one bucket width
    assert(math.abs(one(0) - 50.0) <= 0.0625, s"p50 ${one(0)}")
    assert(math.abs(one(1) - 95.0) <= 0.0625, s"p95 ${one(1)}")
    // huge magnitudes collapse resolution instead of overflowing
    val wide = Seq(1e300, -1e300, 5.0).toDF("v")
    val w = wide.agg(call_function("portable_quantiles", col("v"), lit(0.5))).head().getSeq[Double](0)
    assert(java.lang.Double.isFinite(w(0)))
    // all-null input yields null, NaN/Inf are ignored like nulls
    val nn = Seq(Some(Double.NaN), None, Some(Double.PositiveInfinity), Some(2.0))
      .toDF("v")
      .agg(call_function("portable_quantiles", col("v"), lit(1.0))).head()
    assert(math.abs(nn.getSeq[Double](0)(0) - 2.0) < 1e-5,
      "non-finite values must be ignored, leaving the finite census")
    val allNull = Seq[Option[Double]](None, None).toDF("v")
      .agg(call_function("portable_quantiles", col("v"), lit(0.5))).head()
    assert(allNull.isNullAt(0))
  }

  test("multimodal pipeline: schema, determinism, fixed feature shape") {
    val feats = Multimodal.featurePipeline(spark, sfDir)
    assert(feats.schema.fieldNames.toSeq == Seq("doc_id", "kind", "features"))
    val rows = feats.limit(5).collect()
    assert(rows.forall(_.getSeq[Float](2).length == 16))
    // deterministic stub: same input -> same features
    val again = Multimodal.featurePipeline(spark, sfDir).limit(5).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("multimodal frame sampling is distributed and chunk-shaped") {
    val media  = Multimodal.attachMedia(t)
    val frames = Multimodal.sampleFrames(media, everyN = 4)
    val n = frames.count()
    assert(n > 0)
    val f = frames.filter(_.doc_id == 0L).collect()
    assert(f.forall(_.frame_payload.length <= 64))
    assert(f.map(_.frame_idx).distinct.length == f.length)
  }

  test("media metadata parses back from real container headers") {
    val media = Multimodal.attachMedia(t).toDF()
    val parsed = Multimodal.mediaMeta(media, "payload").collect()
    assert(parsed.nonEmpty)
    parsed.foreach { r =>
      val kind = r.getAs[String]("kind")
      val fmt = r.getAs[String]("media_format")
      kind match {
        case "image" => assert(fmt == "png" || fmt == "jpeg" || fmt == "bmp", s"image parsed as $fmt")
        case "audio" => assert(fmt == "wav")
        case "video" => assert(fmt == "gif")
      }
      fmt match {
        case "png" | "gif" | "bmp" =>
          assert(r.getAs[Long]("parsed_width") == r.getAs[Int]("width").toLong, s"width in $fmt")
          assert(r.getAs[Long]("parsed_height") == r.getAs[Int]("height").toLong)
        case "wav" =>
          assert(r.getAs[Long]("sample_rate") == r.getAs[Int]("width").toLong)
          assert(r.getAs[Long]("channels") == r.getAs[Int]("height").toLong)
        case "jpeg" =>
          // variable-offset SOF: parsed by the JVM marker walk instead
          val (h, w) = Multimodal.jpegDims(r.getAs[Array[Byte]]("payload")).get
          assert(w == r.getAs[Int]("width") && h == r.getAs[Int]("height"))
      }
    }
  }

  test("WAV content decode is real and bit-exact on planted PCM") {
    // 20 planted samples: roundtrip through full RIFF bytes, then the
    // feature vector against independently-computed statistics
    val samples = Array.tabulate(20)(i => ((i - 10) * 300).toShort) // -3000 … +2700
    val wav = Multimodal.wavBytes(16000, 2, samples)
    val (rate, ch, got) = Multimodal.wavSamples(wav).get
    assert(rate == 16000 && ch == 2 && got.toSeq == samples.toSeq)
    val f = Multimodal.audioFeatures(samples, 16)
    val ints = samples.map(_.toInt)
    assert(f(0) == 20f && f(3) == -3000f && f(4) == 2700f)
    assert(f(1) == (ints.sum.toDouble / 20).toFloat)
    assert(f(2) == math.sqrt(ints.map(s => s.toDouble * s).sum / 20).toFloat)
    // sign changes only at the -300 → 0 → +300 boundary: 0 is
    // non-negative, so exactly one crossing
    assert(f(5) == 1f, f(5).toString)
    // 10 segments of 2: each segment's RMS, exact
    (0 until 10).foreach { k =>
      val seg = ints.slice(2 * k, 2 * k + 2)
      assert(f(6 + k) == math.sqrt(seg.map(s => s.toDouble * s).sum / 2).toFloat, s"segment $k")
    }
    // trailing garbage after the data chunk is ignored (attachMedia
    // appends the doc text)
    assert(Multimodal.wavSamples(wav ++ "trailing".getBytes).get._3.toSeq == samples.toSeq)
    // non-PCM / truncated payloads refuse instead of mis-decoding
    assert(Multimodal.wavSamples("RIFFxxxxWAVE".getBytes).isEmpty)
    // adversarial chunk size 0xFFFFFFF8 (negative as Int) must refuse
    // and TERMINATE — an Int-truncated size advanced the walk cursor
    // by zero and spun the task forever (r10 review)
    val evil = "RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      new Array[Byte](32)
    assert(Multimodal.wavSamples(evil).isEmpty)
  }

  test("BMP and PPM content decode are real and bit-exact on planted pixels") {
    val pix = Map((0, 0) -> (10, 20, 30), (1, 0) -> (40, 50, 60),
      (0, 1) -> (70, 80, 90), (1, 1) -> (200, 210, 220))
    def rgb(x: Int, y: Int) = pix((x, y))
    // BMP: bottom-up padded storage must read back top-down row-major
    val bmp = Multimodal.bmpBytes(2, 2, rgb _)
    val (bw, bh, brgb) = Multimodal.bmpPixels(bmp ++ "tail".getBytes).get
    assert(bw == 2 && bh == 2)
    assert(brgb.map(_ & 0xff).toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220))
    // PPM: same pixels, same decode result (header comments included)
    val ppm = Multimodal.ppmBytes(2, 2, rgb _)
    val (pw, ph, prgb) = Multimodal.ppmPixels(ppm).get
    assert(pw == 2 && ph == 2 && prgb.toSeq == brgb.toSeq)
    val withComment = ("P6\n# a comment line\n2 2\n255\n").getBytes("US-ASCII") ++
      prgb
    assert(Multimodal.ppmPixels(withComment).get._3.toSeq == prgb.toSeq)
    // feature vector: exact means and a gray histogram that sums to 1
    val f = Multimodal.imageFeatures(bw, bh, brgb, 16)
    assert(f(0) == 2f && f(1) == 2f)
    assert(f(2) == ((10 + 40 + 70 + 200) / 4.0 / 255.0).toFloat)
    assert(f(3) == ((20 + 50 + 80 + 210) / 4.0 / 255.0).toFloat)
    assert(f(4) == ((30 + 60 + 90 + 220) / 4.0 / 255.0).toFloat)
    val lumas = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220))
      .map { case (r, g, b) => (299 * r + 587 * g + 114 * b) / 1000 }
    assert(f(5) == (lumas.sum / 4.0 / 255.0).toFloat)
    assert(math.abs((6 until 16).map(i => f(i)).sum - 1.0f) < 1e-6)
    // 8bpp/compressed BMPs refuse instead of mis-decoding
    assert(Multimodal.bmpPixels("BMxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx".getBytes).isEmpty)
    // corrupt headers whose offset/dims overflow Int must refuse, not
    // crash: dataOffset = 0x80000000, width = 0x40000000 (r10 review)
    val evil = Multimodal.bmpBytes(2, 2, (_, _) => (1, 2, 3))
    val badOffset = evil.clone(); badOffset(10) = 0; badOffset(13) = 0x80.toByte
    assert(Multimodal.bmpPixels(badOffset).isEmpty)
    val badWidth = evil.clone(); badWidth(21) = 0x40.toByte
    assert(Multimodal.bmpPixels(badWidth).isEmpty)
    // same for a PPM whose 3*w*h overflows Int
    val hugePpm = "P6\n50000 50000\n255\n".getBytes("US-ASCII") ++ new Array[Byte](16)
    assert(Multimodal.ppmPixels(hugePpm).isEmpty)
    // the fixed 6-stat feature layout rejects narrower dims up front
    val media = Multimodal.attachMedia(t)
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeFeatures(media, dim = 4)
    }.getMessage.contains("at least 6"))
  }

  test("PNG content decode is real and bit-exact on planted pixels (JDK Inflater)") {
    // 5x7 forces every scanline filter type 0..4 through the reversal
    // path (pngBytes cycles the filter by row); planted bytes must
    // survive filter → deflate → inflate → unfilter EXACTLY
    def rgba(x: Int, y: Int) = ((x * 40 + y) % 256, (y * 35 + x) % 256, (x * 11 + y * 23) % 256, (x + y * 50) % 256)
    val rgbPng = Multimodal.pngBytes(5, 7, hasAlpha = false, rgba _)
    val (w1, h1, p1) = Multimodal.pngPixels(rgbPng).get
    assert(w1 == 5 && h1 == 7)
    val expected = for (y <- 0 until 7; x <- 0 until 5; c <- 0 until 3)
      yield Seq(rgba(x, y)._1, rgba(x, y)._2, rgba(x, y)._3)(c)
    assert(p1.map(_ & 0xff).toSeq == expected)
    // RGBA: same RGB planes read back, alpha plane dropped
    val rgbaPng = Multimodal.pngBytes(5, 7, hasAlpha = true, rgba _)
    val (_, _, p2) = Multimodal.pngPixels(rgbaPng).get
    assert(p2.toSeq == p1.toSeq)
    // trailing garbage after IEND is ignored (attachMedia appends text)
    assert(Multimodal.pngPixels(rgbPng ++ "trailing doc text".getBytes).get._3.toSeq == p1.toSeq)
    // corrupt streams refuse instead of mis-decoding or throwing:
    assert(Multimodal.pngPixels("notapng".getBytes).isEmpty)
    val badMagic = rgbPng.clone(); badMagic(1) = 'Q'
    assert(Multimodal.pngPixels(badMagic).isEmpty)
    // flip a byte inside the IDAT zlib body → DataFormatException path
    val badZlib = rgbPng.clone(); badZlib(8 + 25 + 8 + 4) = (badZlib(8 + 25 + 8 + 4) ^ 0x55).toByte
    assert(Multimodal.pngPixels(badZlib).isEmpty)
    // truncated mid-IDAT → stalled-inflater path
    assert(Multimodal.pngPixels(rgbPng.take(rgbPng.length - 20)).isEmpty)
    // lying chunk length (0x7FFFFFFF) → Long-guarded walk refuses
    val badLen = rgbPng.clone(); badLen(8 + 25) = 0x7f.toByte
    assert(Multimodal.pngPixels(badLen).isEmpty)
    // 16-bit depth / palette color / interlace all refuse up front
    val deep = rgbPng.clone(); deep(8 + 8 + 8) = 16
    assert(Multimodal.pngPixels(deep).isEmpty)
  }

  test("GIF content decode is real: LZW round-trip, KwKwK, dict reset") {
    val palette = Array((10, 20, 30), (40, 50, 60), (200, 210, 220), (5, 6, 7))
    // pattern with immediate repeats → exercises the KwKwK decode case
    def idx(x: Int, y: Int) = (x / 2 + y) % 4
    val gif = Multimodal.gifBytes(9, 6, palette, idx _)
    val (w, h, rgb) = Multimodal.gifPixels(gif).get
    assert(w == 9 && h == 6)
    for (y <- 0 until 6; x <- 0 until 9) {
      val (r, g, b) = palette(idx(x, y))
      val base = 3 * (y * 9 + x)
      assert((rgb(base) & 0xff) == r && (rgb(base + 1) & 0xff) == g && (rgb(base + 2) & 0xff) == b,
        s"pixel ($x,$y)")
    }
    // a noisy 128x128 image over 8 colors: >4096 distinct strings →
    // the 12-bit dict fills, the encoder emits CLEAR mid-stream and
    // both sides must reset in lockstep
    val pal8 = Array.tabulate(8)(c => (c * 30, 255 - c * 30, c * 13))
    def noisy(x: Int, y: Int) = ((x * 2654435761L + y * 40503L) >>> 13).toInt % 8
    val big = Multimodal.gifBytes(128, 128, pal8, noisy _)
    val (bw, bh, brgb) = Multimodal.gifPixels(big).get
    assert(bw == 128 && bh == 128)
    for (p <- Seq(0, 5000, 16383)) {
      val (r, g, b) = pal8(noisy(p % 128, p / 128))
      assert((brgb(3 * p) & 0xff, brgb(3 * p + 1) & 0xff, brgb(3 * p + 2) & 0xff) == ((r, g, b)), s"pixel $p")
    }
    // trailing doc text after the trailer is ignored
    assert(Multimodal.gifPixels(gif ++ "tail".getBytes).get._3.toSeq == rgb.toSeq)
    // corrupt streams refuse: bad magic, missing color table,
    // truncated sub-blocks, out-of-range LZW codes
    assert(Multimodal.gifPixels("GIF90a".getBytes ++ gif.drop(6)).isEmpty)
    val noGct = gif.clone(); noGct(10) = (noGct(10) & 0x7f).toByte
    assert(Multimodal.gifPixels(noGct).isEmpty)
    assert(Multimodal.gifPixels(gif.take(gif.length - 6)).isEmpty)
    val badLzw = gif.clone()
    // all-ones byte mid-LZW-stream produces out-of-range codes
    badLzw(13 + 12 + 10 + 1 + 1 + 2) = 0xff.toByte
    assert(Multimodal.gifPixels(badLzw).isEmpty ||
      Multimodal.gifPixels(badLzw).get._3.length == 3 * 9 * 6) // either refused or still structurally sound
  }

  test("JPEG content decode is real via the JDK's own reader (lossy-bounded)") {
    // solid color: DCT quantization barely moves a constant block, so
    // the decoded means must sit within a few units of the plant
    val jpeg = Multimodal.jpegBytes(16, 12, (_, _) => (200, 100, 50))
    val (w, h, rgb) = Multimodal.jpegPixels(jpeg).get
    assert(w == 16 && h == 12)
    val n = w * h
    val means = (0 until 3).map(c =>
      (0 until n).map(p => rgb(3 * p + c) & 0xff).sum.toDouble / n)
    assert(math.abs(means(0) - 200) < 6 && math.abs(means(1) - 100) < 6 &&
      math.abs(means(2) - 50) < 6, s"decoded means $means drifted from (200,100,50)")
    // trailing doc text after EOI is ignored (the attachMedia shape)
    assert(Multimodal.jpegPixels(jpeg ++ "trailing doc text".getBytes).isDefined)
    // the marker walk reads true dims from the REAL encoder's SOF
    assert(Multimodal.jpegDims(jpeg).contains((12, 16)))
    // non-JPEG magic and corrupt streams refuse instead of throwing
    assert(Multimodal.jpegPixels("not a jpeg".getBytes).isEmpty)
    assert(Multimodal.jpegPixels(jpeg.take(30)).isEmpty)
    val corrupt = jpeg.clone(); java.util.Arrays.fill(corrupt, 20, jpeg.length - 2, 0x11.toByte)
    // either refused or decoded to SOME image — never an exception
    Multimodal.jpegPixels(corrupt)
  }

  test("hand-rolled PNG/GIF decoders cross-validate against ImageIO's independent encoders") {
    // the JDK's ImageIO writers are INDEPENDENT implementations of
    // both formats: decoding their output with the hand-rolled
    // decoders (and comparing against ImageIO's own read-back) rules
    // out complementary encode/decode bugs that a self-round-trip
    // cannot see
    def plant(img: java.awt.image.BufferedImage): Unit =
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        img.setRGB(x, y, ((x * 23 % 256) << 16) | ((y * 31 % 256) << 8) | ((x + y) * 7 % 256))
    def write(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    def rgbOf(img: java.awt.image.BufferedImage): Seq[Int] =
      (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth;
            c <- Seq(16, 8, 0)) yield (img.getRGB(x, y) >> c) & 0xff)
    // PNG RGB (ImageIO writes color type 2, 8-bit, non-interlaced)
    val rgbImg = new java.awt.image.BufferedImage(19, 11, java.awt.image.BufferedImage.TYPE_INT_RGB)
    plant(rgbImg)
    val (pw, ph, prgb) = Multimodal.pngPixels(write(rgbImg, "png")).get
    assert(pw == 19 && ph == 11)
    assert(prgb.map(_ & 0xff).toSeq == rgbOf(rgbImg), "PNG RGB decode vs ImageIO plant")
    // PNG RGBA (color type 6) — alpha plane dropped by contract
    val argbImg = new java.awt.image.BufferedImage(9, 7, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    plant(argbImg)
    val (_, _, argb) = Multimodal.pngPixels(write(argbImg, "png")).get
    assert(argb.map(_ & 0xff).toSeq == rgbOf(argbImg), "PNG RGBA decode vs ImageIO plant")
    // GIF: indexed source so the palette round-trips exactly
    val gifImg = new java.awt.image.BufferedImage(14, 9, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 9; x <- 0 until 14)
      gifImg.setRGB(x, y, if ((x + y) % 2 == 0) 0xff0000 else 0x0000ff)
    val gifBytes = write(gifImg, "gif")
    Multimodal.gifPixels(gifBytes) match {
      case Some((gw, gh, grgb)) =>
        assert(gw == 14 && gh == 9)
        val viaImageIo = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gifBytes))
        assert(grgb.map(_ & 0xff).toSeq == rgbOf(viaImageIo),
          "GIF LZW decode vs ImageIO's own read-back")
      case None =>
        // this JDK's GIF writer emits global-table non-interlaced
        // output (probed), so a refusal here is a decoder defect
        fail(s"gifPixels refused ImageIO's GIF (screen flags=${gifBytes(10) & 0xff})")
    }
  }

  test("decodeFeatures routes codec-free payloads to the real decoders") {
    val media = Multimodal.attachMedia(t)
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(r => r.doc_id -> r.features).toMap
    val byId = media.collect().map(r => r.doc_id -> r).toMap
    byId.values.foreach { r =>
      val f = feats(r.doc_id)
      if (r.kind == "audio") {
        // real PCM statistics: feature 0 is the planted sample count
        val n = 120 + (r.doc_id % 4).toInt * 40
        assert(f(0) == n.toFloat, s"doc ${r.doc_id}: expected $n samples, got ${f(0)}")
        assert(Multimodal.wavSamples(r.payload).get._3.length == n)
      } else {
        // real pixel statistics — EVERY image/video format decodes
        // for real now (BMP/PNG/GIF bit-exact, JPEG via the JDK
        // reader): features 0/1 are the true dims
        assert(f(0) == r.width.toFloat && f(1) == r.height.toFloat,
          s"doc ${r.doc_id} (${r.kind}): dims (${f(0)}, ${f(1)}) vs (${r.width}, ${r.height})")
      }
    }
  }

  test("media kinds partition the corpus") {
    val kinds = Multimodal.attachMedia(t).groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == t.documents.count())
  }

  test("kmeansCentroids: identical under repartitioning, inertia non-increasing") {
    import graft.operators.Vectors
    val e = t.embeddings
    def run(df: org.apache.spark.sql.DataFrame, iters: Int): Seq[(Int, Seq[Double])] =
      Vectors.kmeansCentroids(df, "vec_id", "embedding", k = 4, iters = iters)
        .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
    // decimal re-centering ⇒ bit-identical centroids under ANY partitioning
    assert(run(e.repartition(3), 3) == run(e.repartition(7), 3))
    val vs = e.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0)).toSeq
    def inertia(cents: Seq[(Int, Seq[Double])]): Double =
      vs.map(v => cents.map { case (_, c) =>
        v.lazyZip(c).map((x, y) => (x - y) * (x - y)).sum }.min).sum
    val js = (1 to 3).map(i => inertia(run(e, i)))
    assert(js(1) <= js(0) + 1e-9 && js(2) <= js(1) + 1e-9,
      s"inertia must not increase: $js")
  }

  test("kmeansCentroids large-k broadcast assignment is bit-identical to the literal path") {
    import graft.operators.Vectors
    // k=32 forced down both paths (cutoff 4096 vs 1): same seeds, same
    // argmin fold, so the trained centroids must match bit-for-bit
    def run(cutoff: Int): Seq[(Int, Seq[Double], Long)] =
      Vectors.kmeansCentroids(t.embeddings, "vec_id", "embedding",
        k = 32, iters = 3, maxLiteralCentroids = cutoff)
        .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1), r.getLong(2)))
    assert(run(4096) == run(1),
      "assignment paths must train identical centroids")
  }

  test("q91 PQ ADC ranking tracks exact L2; a coded duplicate of the query ranks first") {
    import graft.api.Ops._
    import org.apache.spark.sql.expressions.Window
    val emb = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = emb.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("e").as("qe"))
    val exact = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("d2", aggregate(zip_with(col("e"), col("qe"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rank") <= 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.q91(t)
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & adc).size.toDouble / exact.size
    info(s"PQ ADC recall@10 vs exact L2: $recall")
    // 64 floats → 8 bytes on NEAR-RANDOM unit vectors is the hardest
    // possible corpus for PQ (nothing to quantize toward — measured:
    // σ-scaled grid 0.22, trained per-subspace k-means 0.26, both far
    // above the 0.02 random-rank baseline; real corpora cluster and
    // recall rises accordingly). The bit-exact ADC arithmetic itself
    // is oracle-checked; this line holds the semantic floor.
    assert(recall >= 0.15, s"PQ ADC recall $recall vs exact L2 too low")
    // an exact copy of the query vector quantizes to the per-subspace
    // argmin codes, so its ADC distance is the sum of the table's
    // per-subspace minima — the global minimum: it must rank first
    val dup = emb.filter(col("vec_id") === 2)
      .select((col("vec_id") + 100000).as("vec_id"), col("e"))
    val corpus = emb.unionByName(dup)
    val top = corpus.pqTopK(emb.filter(col("vec_id") === 2),
        queryId = "vec_id", queryEmb = "e", id = "vec_id", emb = "e",
        dim = 64, m = 8, ks = 16, k = 3)
      .orderBy(col("rank")).collect()
    assert(top(0).getLong(2) == 100002L,
      s"the coded duplicate must be the ADC nearest neighbor: ${top.mkString(", ")}")
  }

  test("r17 ivfPqTopKRerank: recall never below raw ADC at fixed nprobe, exhaustive probe + full shortlist equals exact cosine top-k") {
    import graft.api.Ops._
    graft.functions.GraftFunctions.register(spark)
    val queries = t.embeddings.filter(col("vec_id") < 5)
    val exact = t.embeddings.cosineTopK(queries,
      id = "vec_id", emb = "embedding", queryId = "vec_id",
      queryEmb = "embedding", k = 10)
    def recalls(approx: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      graft.api.Ops.annRecallReport(exact, approx, "qid", "vid")
        .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val adcRec = recalls(Similarity.q92(t))
    val rrRec = recalls(Similarity.q232(t))
    // the ADC top-10 is a subset of the top-30 shortlist and true
    // neighbors carry the highest exact scores in any candidate set
    // containing them — per-query recall can never drop
    adcRec.keys.foreach { qid =>
      assert(rrRec(qid) >= adcRec(qid),
        s"re-rank recall dropped for query $qid: ${rrRec(qid)} < ${adcRec(qid)}")
    }
    val (sumAdc, sumRr) = (adcRec.values.sum, rrRec.values.sum)
    info(s"recall@10 vs exact cosine: adc=${sumAdc / 5} rerank=${sumRr / 5}")
    assert(sumRr > sumAdc,
      s"re-rank must buy recall on the bench corpus (adc=$sumAdc rerank=$sumRr)")
    // with every cell probed and the shortlist covering the corpus
    // the re-rank IS the exact search: row-identical to cosineTopK
    val centroids = t.embeddings
      .filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val index = Similarity.prepareIvfPq(t.embeddings, centroids,
      id = "vec_id", emb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb",
      dim = 64, m = 8, ks = 16)
    val full = Similarity.ivfPqTopKRerank(index, queries, centroids,
      t.embeddings, id = "vec_id", emb = "embedding",
      queryId = "vec_id", queryEmb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb",
      dim = 64, m = 8, ks = 16, k = 10, nprobe = 8, rerankR = 1000)
      .select(col("qid"), col("rank"), col("vid"), col("score"))
    val a = full.orderBy(col("qid"), col("rank")).collect().toSeq
    val b = exact.orderBy(col("qid"), col("rank")).collect().toSeq
    assert(a == b, s"exhaustive re-rank must equal exact cosine top-k:\n$a\nvs\n$b")
  }

  test("trainPqCodebooks: per-subspace k-means meets the grid and is partitioning-invariant") {
    import graft.api.Ops._
    import graft.operators.Vectors
    import org.apache.spark.sql.expressions.Window
    val emb = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = emb.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("e").as("qe"))
    val exact = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("d2", aggregate(zip_with(col("e"), col("qe"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))))
      .filter(col("rank") <= 10)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallWith(cbs: Option[Array[Array[Array[Double]]]]): Double = {
      val adc = t.embeddings.pqTopK(t.embeddings.filter(col("vec_id") < 5),
        queryId = "vec_id", queryEmb = "embedding",
        id = "vec_id", emb = "embedding", dim = 64, m = 8, ks = 16, k = 10,
        codebooks = cbs)
        .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & adc).size.toDouble / exact.size
    }
    val trained = Vectors.trainPqCodebooks(t.embeddings, "vec_id", "embedding",
      dim = 64, m = 8, ks = 16, iters = 3)
    // exact codebook shape contract: m × ks × subDim, dense
    assert(trained.length == 8 && trained.forall(s => s.length == 16 && s.forall(_.length == 8)))
    val gridRecall = recallWith(None)
    val trainedRecall = recallWith(Some(trained))
    info(s"PQ recall@10 vs exact L2: grid=$gridRecall trained=$trainedRecall")
    // on this worst-case near-random corpus trained must AT LEAST meet
    // the σ-scaled grid (measured: trained 0.26 vs grid 0.22)
    assert(trainedRecall >= gridRecall,
      s"trained codebooks ($trainedRecall) must meet the grid ($gridRecall)")
    // decimal re-centering ⇒ identical codebooks under ANY partitioning
    val again = Vectors.trainPqCodebooks(t.embeddings.repartition(7), "vec_id", "embedding",
      dim = 64, m = 8, ks = 16, iters = 3)
    assert(trained.flatten.flatten.toSeq == again.flatten.flatten.toSeq,
      "training must be partitioning-invariant")
    // production-scale probe: m=8, ks=256 (the 2048-centroid regime)
    // stays inside the literal budget and keeps every subspace dense
    val probe = Vectors.trainPqCodebooks(t.embeddings, "vec_id", "embedding",
      dim = 64, m = 8, ks = 256, iters = 1)
    assert(probe.length == 8 && probe.forall(s => s.length == 256 && s.forall(_.length == 8)))
    // m*ks beyond the literal budget fails fast instead of bloating the plan
    assert(intercept[IllegalArgumentException] {
      Vectors.trainPqCodebooks(t.embeddings, "vec_id", "embedding",
        dim = 64, m = 8, ks = 1024, iters = 1)
    }.getMessage.contains("literal budget"))
  }

  test("trainIvfPqIndex: the one-call trained index ≡ its composed parts and serves end-to-end") {
    import graft.operators.{Similarity, Vectors}
    val idx = Similarity.trainIvfPqIndex(t.embeddings, "vec_id", "embedding",
      dim = 64, nCells = 8, m = 8, ks = 16, cellIters = 2, pqIters = 2)
    // composition contract: exactly kmeansCentroids + trainPqCodebooks
    // + prepareIvfPqIndex — every stage deterministic, so the one-call
    // index is row-for-row the manual composition
    val cents = Vectors.kmeansCentroids(t.embeddings, "vec_id", "embedding",
      k = 8, iters = 2).select(col("cid"), col("centroid"))
    val cbs = Vectors.trainPqCodebooks(t.embeddings, "vec_id", "embedding",
      dim = 64, m = 8, ks = 16, iters = 2)
    val manual = Similarity.prepareIvfPqIndex(t.embeddings, cents,
      id = "vec_id", emb = "embedding", centroidId = "cid", centroidEmb = "centroid",
      dim = 64, m = 8, ks = 16, codebooks = Some(cbs))
    assert(idx.codebooks.flatten.flatten.toSeq == manual.codebooks.flatten.flatten.toSeq)
    assert(idx.codes.collect().map(_.toString).sorted.toSeq ==
      manual.codes.collect().map(_.toString).sorted.toSeq,
      "the one-call index must equal the manual composition row-for-row")
    val queries = t.embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val served = idx.topK(queries, "qid", "qe", k = 10, nprobe = 3)
    assert(served.collect().map(_.toString).sorted.toSeq ==
      manual.topK(queries, "qid", "qe", k = 10, nprobe = 3)
        .collect().map(_.toString).sorted.toSeq)
    assert(served.count() > 0, "the trained index must serve results")
  }

  test("ewmaTrailing: exact integer weights, partial-window head, partitioning invariance") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 1.00),
      (1L, 11L, "2024-01-01 00:01:00", 2.00),
      (1L, 12L, "2024-01-01 00:02:00", 4.00),
      (2L, 20L, "2024-01-01 00:00:00", 3.00))
      .toDF("k", "id", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.ewmaTrailing("k", "ts", "id", col("v"), lags = 4)
      .select("id", "ewma_num", "ewma_denom", "ewma_millicents")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // weights 8,4,2,1 (lags=4); cents 100, 200, 400
    assert(out(10L) == ((100L * 8, 8L, 100L * 1000)),
      "a key's first row sees only its own weight — the partial head normalizes")
    assert(out(11L) == ((200L * 8 + 100L * 4, 12L, (2000000L / 12))))
    assert(out(12L) == ((400L * 8 + 200L * 4 + 100L * 2, 14L, (4200000L / 14))))
    assert(out(20L) == ((300L * 8, 8L, 300L * 1000)), "keys never mix")
    // bit-identical under any partitioning (window sort owns the order)
    val again = df.repartition(7).ewmaTrailing("k", "ts", "id", col("v"), lags = 4)
      .select("id", "ewma_num", "ewma_denom", "ewma_millicents")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == out)
    // null values DROP up front (r13 ADVICE): a key whose head rows
    // are all null must not reach denom = 0 (ANSI DIVIDE_BY_ZERO) —
    // and the surviving rows window over non-null rows only
    val withNulls = Seq(
      (3L, 30L, "2024-01-01 00:00:00", Option.empty[Double]),
      (3L, 31L, "2024-01-01 00:01:00", Option.empty[Double]),
      (3L, 32L, "2024-01-01 00:02:00", Some(5.00)))
      .toDF("k", "id", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val nn = withNulls.ewmaTrailing("k", "ts", "id", col("v"), lags = 4)
      .select("id", "ewma_num", "ewma_denom", "ewma_millicents")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(nn.keySet == Set(32L), "null-value rows are filtered, not emitted")
    assert(nn(32L) == ((500L * 8, 8L, 500L * 1000)),
      "the first non-null row is the key's window head")
  }

  test("eventPaths: strict-order path assembly, tie-break determinism, regex gate") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      (1L, 3L, "2024-01-01 00:02:00", "purchase"),
      (1L, 1L, "2024-01-01 00:00:00", "signup"),
      (1L, 2L, "2024-01-01 00:01:00", "view"),
      // user 2: equal timestamps — the tie-break id must decide
      (2L, 5L, "2024-01-01 00:00:00", "view"),
      (2L, 4L, "2024-01-01 00:00:00", "signup"))
      .toDF("k", "id", "tss", "et")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.eventPaths("k", "ts", "id", "et",
      "(^|>)signup(>[a-z]+)*>purchase(>|$)")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, "signup>view>purchase", true)))
    assert(out(2L) == ((2L, "signup>view", false)),
      "equal timestamps must order by the tie-break id")
    val again = df.repartition(5).eventPaths("k", "ts", "id", "et",
      "(^|>)signup(>[a-z]+)*>purchase(>|$)")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(again == out, "collect order must never leak into the path")
  }

  test("regressionByGroup: exact fit, degenerate axes, null exclusion") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      // group a: exact y = 2x → slope 2, intercept 0, r 1
      ("a", Some(1.0), Some(2.0)), ("a", Some(2.0), Some(4.0)), ("a", Some(3.0), Some(6.0)),
      // group b: constant y → slope 0, intercept 5, r null (no y variance)
      ("b", Some(1.0), Some(5.0)), ("b", Some(2.0), Some(5.0)), ("b", Some(3.0), Some(5.0)),
      // group c: single point → no x variance, everything null
      ("c", Some(2.0), Some(3.0)),
      // group a again: a null on either axis must not dilute the moments
      ("a", None, Some(9.0)), ("a", Some(9.0), None))
      .toDF("g", "x", "y")
    val out = df.regressionByGroup("g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out("a") == ((3L, Some(2.0), Some(0.0), Some(1.0))))
    assert(out("b") == ((3L, Some(0.0), Some(5.0), None)),
      "zero y-variance: defined line, undefined correlation")
    assert(out("c") == ((1L, None, None, None)), "one point fits no line")
    val again = df.repartition(7).regressionByGroup("g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(again == out, "decimal moments make the fit partitioning-invariant")
  }

  test("globalRank: staged rank equals the total-order index; partitioning invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // values with deliberate duplicates — the id tiebreak totalizes
    val rows = (1 to 100).map(i => (i.toLong, (i % 7).toDouble))
    val df = spark.createDataset(scala.util.Random.shuffle(rows)).toDF("id", "v")
    val out = df.globalRank(Seq(col("v"), col("id")), out = "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = rows.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(out == expected, "the staged rank must equal the total-order index")
    val again = df.repartition(13).globalRank(Seq(col("v"), col("id")), out = "rank")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == expected, "range boundaries must never change the rank")
  }

  test("rfmScores: exact quintiles best-first, deterministic tiebreak, segment concat") {
    import spark.implicits._
    import graft.api.Ops._
    // key k: k transactions, latest at day k, value k.00 each
    val rows = for (k <- 1 to 5; i <- 1 to k)
      yield (k.toLong, f"2024-01-0$k%d 00:$i%02d:00", k.toDouble)
    val df = spark.createDataset(rows).toDF("k", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.rfmScores("k", "ts", col("v"))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("frequency"), r.getAs[Long]("monetary_cents"),
          r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
          r.getAs[Long]("m_score"), r.getAs[String]("segment")))).toMap
    (1 to 5).foreach { k =>
      val s = (6 - k).toLong // higher k = more recent, more frequent, bigger spend
      assert(out(k.toLong) == ((k.toLong, k.toLong * k * 100, s, s, s, s"$s$s$s")),
        s"key $k must score $s on all three axes (got ${out(k.toLong)})")
    }
  }

  test("associationRules: exact supports, confidence, lift, threshold and directions") {
    import spark.implicits._
    val e = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b")).toDF("ok", "it")
    val out = graft.api.Ops.associationRules(e, "ok", "it", minSupport = 2)
      .collect().map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) ->
        ((r.getAs[Long]("support"), r.getAs[Long]("n_antecedent"),
          r.getAs[Long]("n_baskets"), r.getAs[Long]("confidence_millis"),
          r.getAs[Double]("lift")))).toMap
    // n_a=3, n_b=3, n_c=2, N=4; support(a,b)=2, (a,c)=2, (b,c)=1 < 2 → cut
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")),
      "sub-threshold pairs emit no rule; surviving pairs emit both directions")
    assert(out(("a", "b")) == ((2L, 3L, 4L, 666L, 0.888889)))
    assert(out(("c", "a")) == ((2L, 2L, 4L, 1000L, 1.333333)),
      "confidence is direction-specific: c → a is certain")
  }

  test("seasonalResiduals: exact cell rationals, residual identity, null exclusion") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      (1L, "a", "2024-01-01 09:10:00", Some(1.00)),
      (2L, "a", "2024-01-02 09:50:00", Some(2.00)), // same (a, 9) cell
      (3L, "a", "2024-01-01 10:10:00", Some(9.00)), // different hour
      (4L, "b", "2024-01-01 09:20:00", Some(5.00)), // different type
      (5L, "a", "2024-01-03 09:00:00", None))       // excluded
      .toDF("event_id", "et", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.seasonalResiduals("et", "ts", col("v"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("seasonal_num"), r.getAs[Long]("seasonal_denom"),
          r.getAs[Long]("seasonal_millicents"), r.getAs[Long]("residual_millicents")))).toMap
    // cell (a, 9): cents 100 + 200 → mean 150.000
    assert(out(1L) == ((300L, 2L, 150000L, 100L * 1000 - 150000L)))
    assert(out(2L) == ((300L, 2L, 150000L, 200L * 1000 - 150000L)))
    assert(out(3L) == ((900L, 1L, 900000L, 0L)), "a one-event cell is its own baseline")
    assert(out(4L) == ((500L, 1L, 500000L, 0L)), "types never share cells")
    assert(!out.contains(5L), "null values join no cell")
  }

  test("PreparedSeasonal: against ≡ fluent, absorb ≡ re-prepare, unseen cell yields null") {
    import spark.implicits._
    import graft.api.Ops
    import graft.api.Ops._
    val df = Seq(
      (1L, "a", "2024-01-01 09:10:00", 1.00), (2L, "a", "2024-01-02 09:50:00", 2.00),
      (3L, "a", "2024-01-01 10:10:00", 9.00), (4L, "b", "2024-01-01 09:20:00", 5.00))
      .toDF("event_id", "et", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val prepared = Ops.prepareSeasonal(df, "et", "ts", col("v"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("event_id", "seasonal_num", "seasonal_denom", "residual_millicents")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(prepared.against(df, "ts", col("v"))) ==
      rows(df.seasonalResiduals("et", "ts", col("v"))),
      "scoring the prepare corpus against its own baseline ≡ the fluent operator")
    // absorb ≡ one-shot by cell-sum addition, incl. a cell only in B
    val a = df.filter(col("event_id") <= 2); val b = df.filter(col("event_id") > 2)
    val absorbed = Ops.prepareSeasonal(a, "et", "ts", col("v")).absorb(b, "ts", col("v"))
    assert(absorbed.cells.collect().map(_.toString).sorted.toSeq ==
      prepared.cells.collect().map(_.toString).sorted.toSeq)
    // an unseen (type, hour) yields NULL baseline and residual
    val unseen = Seq((9L, "a", "2024-01-01 23:00:00", 4.00))
      .toDF("event_id", "et", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val scored = prepared.against(unseen, "ts", col("v")).collect()
    assert(scored.length == 1 && scored.head.isNullAt(scored.head.fieldIndex("seasonal_num"))
      && scored.head.isNullAt(scored.head.fieldIndex("residual_millicents")),
      "a cell the baseline never saw must score null, never a fabricated baseline")
  }

  test("cusumPerKey: division-free statistic, change-point extremum, keys never mix") {
    import spark.implicits._
    import graft.api.Ops._
    // key 1: level shift after 2 rows of 1.00 to 2 rows of 3.00
    val df = Seq(
      (1L, 10L, "2024-01-01 00:00:00", 1.00), (1L, 11L, "2024-01-01 00:01:00", 1.00),
      (1L, 12L, "2024-01-01 00:02:00", 3.00), (1L, 13L, "2024-01-01 00:03:00", 3.00),
      (2L, 20L, "2024-01-01 00:00:00", 7.00))
      .toDF("k", "id", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.cusumPerKey("k", "ts", "id", col("v"), thresholdCents = 150L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("k"), r.getAs[Long]("cusum_scaled"), r.getAs[Boolean]("flag")))).toMap
    // key 1: T = 800, n = 4; S = 100, 200, 500, 800
    // n·S − k·T = 400−800, 800−1600, 2000−2400, 3200−3200
    assert(out(10L) == ((1L, -400L, false)))
    assert(out(11L) == ((2L, -800L, true)),
      "the extremum sits at the change point; |−800| > 150·4")
    assert(out(12L) == ((3L, -400L, false)))
    assert(out(13L) == ((4L, 0L, false)), "the statistic closes at zero by construction")
    assert(out(20L) == ((1L, 0L, false)), "a single-row key is its own mean")
    val again = df.repartition(5).cusumPerKey("k", "ts", "id", col("v"), 150L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("k"), r.getAs[Long]("cusum_scaled"), r.getAs[Boolean]("flag")))).toMap
    assert(again == out)
  }

  test("kCore: cascade peeling, converged stability, dirty-input canonicalization") {
    import spark.implicits._
    // K4 on 1..4 (a true 3-core) + a chain 4-5-6 whose removal CASCADES:
    // node 6 (deg 1) falls in round 1, node 5 (deg 2, then 1) needs round 2
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L),
      (2L, 1L), (3L, 3L)) // reversed dup + self-loop: canonicalization
      .toDF("s", "d")
    val out = graft.api.Ops.kCore(edges, "s", "d", k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"the 3-core is exactly K4 once the chain cascades away (got $out)")
    // a path has NO 2-core, but peeling it needs the cascade: one
    // round (plus the survivor re-filter) still leaves the middle
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L)).toDF("s", "d")
    val one = graft.api.Ops.kCore(path, "s", "d", k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(12L),
      s"round 1 on the path must still hold the middle node (got $one)")
    assert(graft.api.Ops.kCore(path, "s", "d", k = 2, rounds = 4).count() == 0,
      "the full peel empties the path — it has no 2-core")
    // a converged result is stable under a larger budget
    val more = graft.api.Ops.kCore(edges, "s", "d", k = 3, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == out, "extra rounds past convergence are no-ops")
  }

  test("lastTouchAttribution: latest-touch credit, window expiry, same-ts tiebreak, key isolation") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      // u1: view@1, click@5 → purchase@10 credits click (gap 5)
      (1L, 1L, "view", 1L), (1L, 2L, "click", 5L), (1L, 3L, "purchase", 10L),
      // u1: purchase@100 — the click is 95µs old, window 50 → direct
      (1L, 4L, "purchase", 100L),
      // u2: touch AFTER the purchase never credits
      (2L, 5L, "purchase", 10L), (2L, 6L, "click", 20L),
      // u3: same-ts touch with a SMALLER tiebreak id credits
      (3L, 7L, "view", 30L), (3L, 8L, "purchase", 30L))
      .toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val out = df.lastTouchAttribution("user_id", "ts", "event_id", "event_type",
        "purchase", Seq("click", "view"), windowUs = 50L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[String]("channel")), Option(r.getAs[java.lang.Long]("touch_gap_us")).map(_.toLong)))).toMap
    assert(out(3L) == ((Some("click"), Some(5L))), "latest touch wins over earlier ones")
    assert(out(4L) == ((None, None)), "an expired touch yields the null (direct) bucket")
    assert(out(5L) == ((None, None)), "a later touch never credits an earlier conversion")
    assert(out(8L) == ((Some("view"), Some(0L))), "same-ts touch credits via the tiebreak order")
    assert(out.size == 4, "only conversion rows return")
    intercept[IllegalArgumentException] {
      df.lastTouchAttribution("user_id", "ts", "event_id", "event_type",
        "purchase", Seq("purchase", "view"), 50L)
    }
  }

  test("radiusJoin: brute-force parity, boundary inclusion, cell-crossing pairs, negatives") {
    import spark.implicits._
    // deterministic pseudo-random points incl. negatives and
    // cell-boundary straddles at radius 10
    val pa = (0 until 40).map(i => (i.toLong, (i * 37 % 83 - 25).toLong, (i * 53 % 97 - 31).toLong))
      .toDF("aid", "ax", "ay")
    val pb = (0 until 30).map(i => (i.toLong, (i * 41 % 89 - 27).toLong, (i * 29 % 71 - 19).toLong))
      .toDF("bid", "bx", "by")
    val r = 10L
    val got = graft.api.Ops.radiusJoin(pa, pb, "ax", "ay", "bx", "by", r)
      .select(col("aid"), col("bid"), col("dist2"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    val brute = pa.crossJoin(pb)
      .withColumn("dist2", (col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= r * r)
      .select(col("aid"), col("bid"), col("dist2"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    assert(got == brute, "grid candidates must reproduce the brute-force pair set exactly")
    assert(brute.nonEmpty, "the fixture must actually produce pairs")
    assert(got.map(p => (p._1, p._2)).distinct.size == got.size,
      "each qualifying pair matches exactly once — no dedup pass hides duplicates")
    // exact boundary: distance² = r² is IN; one past is OUT
    val onEdge = graft.api.Ops.radiusJoin(
      Seq((1L, 0L, 0L)).toDF("aid", "ax", "ay"),
      Seq((1L, 10L, 0L), (2L, 10L, 1L)).toDF("bid", "bx", "by"),
      "ax", "ay", "bx", "by", r)
      .select(col("bid")).collect().map(_.getLong(0)).toSet
    assert(onEdge == Set(1L), "dist² = r² included, r²+1 excluded")
  }

  test("itemSimilarity: cosine ranks, tie-break, minCo pruning; PreparedCooc ≡ batch") {
    import spark.implicits._
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 4L),
      (2L, 2L)) // duplicate (basket, item) row: census is distinct
      .toDF("ok", "it")
    val out = graft.api.Ops.itemSimilarity(baskets, "ok", "it", k = 2, minCo = 1L)
      .collect().map(r => (r.getAs[Long]("item"), r.getAs[Long]("rnk")) ->
        ((r.getAs[Long]("other"), r.getAs[Long]("co"), r.getAs[Double]("cosine")))).toMap
    // item 1 (n=3): 2 at cos 3/√9 = 1.0; then 3 and 4 tie at 1/√6 → other asc
    assert(out((1L, 1L)) == ((2L, 3L, 1.0)))
    assert(out((1L, 2L))._1 == 3L, "equal cosines break by other ascending")
    // item 3 (n=2): 4 at 1/√4 = 0.5 beats 1/2 at 1/√6 ≈ 0.408
    assert(out((3L, 1L)) == ((4L, 1L, 0.5)))
    // minCo prunes 1-basket coincidences: only the (1,2) pair survives
    val pruned = graft.api.Ops.itemSimilarity(baskets, "ok", "it", k = 2, minCo = 2L)
      .collect().map(r => r.getAs[Long]("item") -> r.getAs[Long]("other"))
    assert(pruned.toSet == Set(1L -> 2L, 2L -> 1L))
    // prepared ≡ batch, and basket-atomic absorb is exact algebra
    val a = baskets.filter(col("ok") <= 2); val b = baskets.filter(col("ok") >= 3)
    val prep = graft.api.Ops.prepareCooc(a, "ok", "it").absorb(b, "ok", "it")
    val full = graft.api.Ops.prepareCooc(baskets, "ok", "it")
    assert(prep.nBaskets == 4L && full.nBaskets == 4L)
    def srt(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(srt(prep.similarItems(2, 1L)) == srt(full.similarItems(2, 1L)))
    assert(srt(full.similarItems(2, 1L)) ==
      srt(graft.api.Ops.itemSimilarity(baskets, "ok", "it", 2, 1L)))
  }

  test("madOutliers: lower-median rank selection, null passthrough, flag threshold") {
    import spark.implicits._
    import graft.api.Ops._
    // g1 = [10,20,30,40,100]: med = 30 (rank 3 of 5), devs sorted
    // [0,10,10,20,70] → mad = 10; only 100 (dev 70 > 30) flags
    val df = Seq(("g1", 1L, Some(10L)), ("g1", 2L, Some(20L)), ("g1", 3L, Some(30L)),
      ("g1", 4L, Some(40L)), ("g1", 5L, Some(100L)), ("g1", 6L, None),
      ("g2", 7L, Some(4L)), ("g2", 8L, Some(6L))) // even n: lower median
      .toDF("g", "id", "v")
    val out = df.madOutliers("g", col("v"), k = 3L)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Long]("med") == 30L && out(1L).getAs[Long]("mad") == 10L)
    assert((1L to 5L).map(out(_).getAs[Boolean]("outlier")) ==
      Seq(false, false, false, false, true))
    assert(out(6L).isNullAt(out(6L).fieldIndex("dev")) &&
      out(6L).isNullAt(out(6L).fieldIndex("outlier")),
      "a null value passes through unflagged and does not dilute the medians")
    assert(out(7L).getAs[Long]("med") == 4L, "even n selects the LOWER median")
    // partitioning-invariant (exact integers end-to-end)
    val again = df.repartition(5).madOutliers("g", col("v"), 3L)
      .collect().map(r => r.getAs[Long]("id") -> r.toSeq).toMap
    assert(again == out.map { case (kk, r) => kk -> r.toSeq })
  }

  test("benfordDigits: census completion, first-digit extraction, non-positive exclusion") {
    import spark.implicits._
    import graft.api.Ops._
    // g1: 123 (d1), 19 (d1), 250 (d2), 9 (d9); zero/negative/null excluded
    val df = Seq(("g1", Some(123L)), ("g1", Some(19L)), ("g1", Some(250L)),
      ("g1", Some(9L)), ("g1", Some(0L)), ("g1", Some(-5L)), ("g1", None))
      .toDF("g", "v")
    val out = df.benfordDigits("g", col("v")).collect()
      .map(r => r.getAs[Long]("digit") ->
        ((r.getAs[Long]("obs"), r.getAs[Long]("n")))).toMap
    assert(out.keySet == (1L to 9L).toSet, "all nine digits present")
    assert(out(1L) == ((2L, 4L)) && out(2L) == ((1L, 4L)) && out(9L) == ((1L, 4L)))
    assert(out(3L) == ((0L, 4L)), "an absent digit completes with obs = 0")
    val row1 = df.benfordDigits("g", col("v")).filter(col("digit") === 1).head()
    assert(math.abs(row1.getAs[Double]("expected_p") - math.log10(2.0)) < 1e-15)
    // chi2 contribution: (2 - 4*log10(2))^2 / (4*log10(2))
    val np = 4.0 * math.log10(2.0)
    assert(math.abs(row1.getAs[Double]("chi2_contrib") -
      BigDecimal((2.0 - np) * (2.0 - np) / np).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("acfByGroup: alternating series signs, constant-series null, group isolation") {
    import spark.implicits._
    import graft.api.Ops._
    // g1 alternates 1,3,1,3,... → perfect anti-correlation at lag 1,
    // perfect correlation at lag 2; g2 is constant → zero variance
    val rows = (0 until 10).map(i => ("g1", i.toLong, if (i % 2 == 0) 1L else 3L)) ++
      (0 until 6).map(i => ("g2", i.toLong, 5L))
    val df = rows.toDF("g", "t", "v")
    val out = df.acfByGroup("g", col("t"), col("v"), maxLag = 2)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("lag_k")) ->
        ((r.getAs[Long]("n"), Option(r.getAs[java.lang.Double]("r"))))).toMap
    assert(out(("g1", 1L)) == ((9L, Some(-1.0))), s"alternation → r = -1 at lag 1 (got $out)")
    assert(out(("g1", 2L)) == ((8L, Some(1.0))), "period 2 → r = +1 at lag 2")
    assert(out(("g2", 1L))._2.isEmpty && out(("g2", 2L))._2.isEmpty,
      "a constant series has no variance — null r, n still reported")
    // partitioning-invariant (exact sums + fixed double shape)
    val again = df.repartition(5).acfByGroup("g", col("t"), col("v"), 2)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("lag_k")) ->
        ((r.getAs[Long]("n"), Option(r.getAs[java.lang.Double]("r"))))).toMap
    assert(again == out)
  }

  test("abTest: unit-once counting, one-armed groups dropped, degenerate pool, z sign") {
    import spark.implicits._
    import graft.api.Ops._
    // g1: A = {u1 converted (twice — counts once), u2 not}, B = {u3, u4 both converted}
    // g2: only arm A → dropped. g3: both arms fully converted → pool 1, se 0
    val df = Seq(
      ("g1", "A", 1L, true), ("g1", "A", 1L, true), ("g1", "A", 2L, false),
      ("g1", "B", 3L, true), ("g1", "B", 4L, true),
      ("g2", "A", 5L, true),
      ("g3", "A", 6L, true), ("g3", "B", 7L, true),
      ("g1", "C", 8L, true)) // an unknown arm is ignored
      .toDF("g", "v", "u", "ok")
    val out = df.abTest("g", col("u"), col("v"), col("ok"), "A", "B")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out.keySet == Set("g1", "g3"), "one-armed g2 and arm C drop")
    val g1 = out("g1")
    assert(g1.getAs[Long]("n_a") == 2L && g1.getAs[Long]("conv_a") == 1L)
    assert(g1.getAs[Long]("n_b") == 2L && g1.getAs[Long]("conv_b") == 2L)
    assert(g1.getAs[Double]("p_a") == 0.5 && g1.getAs[Double]("p_b") == 1.0)
    assert(g1.getAs[Double]("z") < 0.0, "arm A converts worse → negative z")
    val g3 = out("g3")
    assert(g3.isNullAt(g3.fieldIndex("z")) && !g3.getAs[Boolean]("significant"),
      "a pooled rate of 1 has zero variance — no z, not significant")
    // partitioning-invariant (exact integers + fixed double shape)
    val again = df.repartition(7).abTest("g", col("u"), col("v"), col("ok"), "A", "B")
      .collect().map(r => r.getAs[String]("g") -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("bfsDistances: min-hop labels, unreached exclusion, off-graph seeds, converged stability") {
    import spark.implicits._
    // path 1-2-3-4-5 with a shortcut 1-4: node 4 is 1 hop (shortcut
    // wins over the 3-hop path), node 5 is 2; node 99 is disconnected
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (98L, 99L),
      (2L, 1L), (3L, 3L)) // reversed dup + self-loop: canonicalization
      .toDF("s", "d")
    val seeds = Seq(1L).toDF("n")
    val out = graft.api.Ops.bfsDistances(edges, "s", "d", seeds, "n", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L),
      s"min-hop from the seed; the disconnected component stays unlabeled (got $out)")
    // a round budget below the diameter leaves the far tail unlabeled
    val short = graft.api.Ops.bfsDistances(edges, "s", "d", seeds, "n", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(short == Map(1L -> 0L, 2L -> 1L, 4L -> 1L),
      s"rounds=1 labels only the seed's direct neighborhood (got $short)")
    // multi-source: nearest seed wins; an off-graph seed labels at 0
    val multi = graft.api.Ops.bfsDistances(edges, "s", "d",
        Seq(1L, 5L, 777L).toDF("n"), "n", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi == Map(1L -> 0L, 5L -> 0L, 777L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L),
      s"distance is min over seeds; seed 777 is trivially reached (got $multi)")
    // a converged result is stable under a larger budget, under
    // repartitioning, and duplicate seeds collapse
    val more = graft.api.Ops.bfsDistances(edges.repartition(5), "s", "d",
        Seq(1L, 1L).toDF("n"), "n", rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == out, "extra rounds past convergence are no-ops")
  }

  test("chiSquareIndependence: hand-checked cells, census completion, decimal total, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // 2×2 with one structurally ABSENT cell: (x2, y2) never occurs.
    // counts: (x1,y1)=4, (x1,y2)=2, (x2,y1)=2. N=8,
    // na(x1)=6, na(x2)=2, nb(y1)=6, nb(y2)=2
    // e(x1,y1)=4.5  contrib=(4-4.5)²/4.5 = 0.055556
    // e(x1,y2)=1.5  contrib=(2-1.5)²/1.5 = 0.166667
    // e(x2,y1)=1.5  contrib=(2-1.5)²/1.5 = 0.166667
    // e(x2,y2)=0.5  contrib=(0-0.5)²/0.5 = 0.5   ← the ABSENT cell
    // chi2 = 0.888890 (sum of the rounded contribs), dof = 1
    val df = (Seq.fill(4)(("x1", "y1")) ++ Seq.fill(2)(("x1", "y2")) ++
      Seq.fill(2)(("x2", "y1")) ++ Seq((null.asInstanceOf[String], "y1")))
      .toDF("a", "b")
    val out = df.chiSquareIndependence("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 4, "the census completes over the 2×2 cross")
    assert(out(("x2", "y2")).getAs[Long]("obs") == 0L &&
      out(("x2", "y2")).getAs[Double]("contrib") == 0.5,
      "an absent cell still contributes its full expectation")
    assert(out(("x1", "y1")).getAs[Double]("contrib") == 0.055556)
    assert(out(("x1", "y1")).getAs[Double]("expected") == 4.5)
    val chi2m = out(("x1", "y1")).getAs[Long]("chi2_micros")
    assert(chi2m == 888890L,
      s"decimal-summed rounded contribs emit as exact micros (got $chi2m)")
    assert(out(("x1", "y1")).getAs[Long]("dof") == 1L)
    // partitioning-invariant (exact census + fixed double shape)
    val again = df.repartition(7).chiSquareIndependence("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("psiDrift: union completion, Laplace-smoothed shares, scala-replayed total, invariance") {
    import spark.implicits._
    // baseline x,x,x,y (n=4); current x,y,y,z (n=4); B = 3 buckets
    val base = Seq("x", "x", "x", "y").toDF("b")
    val cur = Seq("x", "y", "y", "z").toDF("b")
    val out = graft.api.Ops.psiDrift(base, cur, "b").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("x", "y", "z"),
      "the census completes over the UNION — z exists only in current")
    assert(out("z").getAs[Long]("c_base") == 0L)
    // replay the formula: p = (c+1)/(n+B), term = round((pa−pb)·ln(pa/pb), 12)
    def term(cb: Long, cc: Long): BigDecimal = {
      val pa = (cb + 1).toDouble / 7.0; val pb = (cc + 1).toDouble / 7.0
      BigDecimal((pa - pb) * math.log(pa / pb))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val expectPsi = BigDecimal(
      (term(3, 1) + term(1, 2) + term(0, 1)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("x").getAs[Double]("term") == term(3, 1).toDouble)
    assert(out.values.forall(_.getAs[Double]("psi") == expectPsi),
      s"the decimal-summed total rides every row (got ${out("x").getAs[Double]("psi")} vs $expectPsi)")
    // partitioning-invariant
    val again = graft.api.Ops.psiDrift(base.repartition(3), cur.repartition(5), "b")
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("ksStatistic: exact decimal argmax, gap location, tie to smaller value") {
    import spark.implicits._
    // a = (1,2,3), b = (3,4): cross-multiplied gaps 2,4,3,0 → max 4
    // at v=2; D = 4/(3·2) = 0.666667
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(3L, 4L).toDF("v")
    val r = graft.api.Ops.ksStatistic(a, b, col("v")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") == 3L && row.getAs[Long]("n_b") == 2L)
    assert(row.getAs[Long]("d_num") == 4L)
    assert(row.getAs[Long]("at_value") == 2L)
    assert(row.getAs[Double]("d_stat") == 0.666667)
    // identical samples → zero gap at the smallest value (the tie rule)
    val same = graft.api.Ops.ksStatistic(a, a.repartition(3), col("v")).collect().head
    assert(same.getAs[Long]("d_num") == 0L &&
      same.getAs[Long]("at_value") == 1L && same.getAs[Double]("d_stat") == 0.0)
    // an empty side has no CDF: null d_stat with the counts reporting
    // which side — never a division by zero
    val empt = graft.api.Ops.ksStatistic(a, b.filter(col("v") < 0L), col("v"))
      .collect().head
    assert(empt.getAs[Long]("n_b") == 0L && empt.isNullAt(empt.fieldIndex("d_stat")))
  }

  test("mannWhitneyU: hand-checked tie ranks, U identity, degenerate nulls, invariance") {
    import spark.implicits._
    // a = (1,2), b = (2,3): ranks 1, {2,3}→2.5 tie, 4.
    // R_a = 1 + 2.5 = 3.5 → u2 = 2R_a − nA(nA+1) = 7 − 6 = 1 (U = 0.5
    // — exactly the half-win of the single tied pair).
    // var = (4/12)·(5 − 6/12) = 1.5 → z = (1 − 4)/(2·√1.5) = −1.224745
    val a = Seq(1L, 2L).toDF("v")
    val b = Seq(2L, 3L).toDF("v")
    val r = graft.api.Ops.mannWhitneyU(a, b, col("v")).collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2") == 1L)
    assert(r.getAs[Double]("z") == -1.224745)
    // all-identical values → zero variance → null z, u2 still exact
    val c = Seq(5L, 5L).toDF("v")
    val deg = graft.api.Ops.mannWhitneyU(c, c.repartition(2), col("v")).collect().head
    assert(deg.isNullAt(deg.fieldIndex("z")) &&
      deg.getAs[Long]("u2") == 4L,
      "zero-variance inputs yield null z (u2 = 2·(2 ties · 0.5 + 1 win... ) stays exact)")
    // an empty side → null z with counts reporting
    val emp = graft.api.Ops.mannWhitneyU(a, b.filter(col("v") < 0), col("v"))
      .collect().head
    assert(emp.getAs[Long]("n_b") == 0L && emp.isNullAt(emp.fieldIndex("z")))
    // partitioning-invariant
    val again = graft.api.Ops.mannWhitneyU(a.repartition(3), b.repartition(2), col("v"))
      .collect().head
    assert(again.toSeq == r.toSeq)
  }

  test("ksStatisticByGroup / mannWhitneyUByGroup: per-group ≡ whole-frame per segment, one-sided groups report") {
    import spark.implicits._
    val a = Seq(("x", 1L), ("x", 2L), ("x", 3L), ("y", 10L), ("y", 11L), ("z", 7L))
      .toDF("g", "v")
    val b = Seq(("x", 3L), ("x", 4L), ("y", 11L), ("y", 12L)).toDF("g", "v")
    // every group's keyed row must equal the whole-frame statistic on
    // that group's slice — the defining identity of the ByGroup family
    for (grp <- Seq("x", "y")) {
      val whole = graft.api.Ops.ksStatistic(
        a.filter(col("g") === grp), b.filter(col("g") === grp), col("v"))
        .collect().head
      val keyedRow = graft.api.Ops.ksStatisticByGroup(a, b, "g", col("v"))
        .filter(col("grp") === grp).collect().head
      assert(keyedRow.toSeq.drop(1) == whole.toSeq,
        s"ks group $grp must replay the whole-frame statistic")
      val wholeU = graft.api.Ops.mannWhitneyU(
        a.filter(col("g") === grp), b.filter(col("g") === grp), col("v"))
        .collect().head
      val keyedU = graft.api.Ops.mannWhitneyUByGroup(a, b, "g", col("v"))
        .filter(col("grp") === grp).collect().head
      assert(keyedU.toSeq.drop(1) == wholeU.toSeq,
        s"mwu group $grp must replay the whole-frame statistic")
    }
    // group z exists only on side a: the row reports n_b = 0 with
    // null d_stat/z — never a division crash, never a dropped group
    val zKs = graft.api.Ops.ksStatisticByGroup(a, b, "g", col("v"))
      .filter(col("grp") === "z").collect().head
    assert(zKs.getAs[Long]("n_b") == 0L && zKs.isNullAt(zKs.fieldIndex("d_stat")))
    val zU = graft.api.Ops.mannWhitneyUByGroup(a, b, "g", col("v"))
      .filter(col("grp") === "z").collect().head
    assert(zU.getAs[Long]("n_b") == 0L && zU.isNullAt(zU.fieldIndex("z")))
    // partitioning-invariant
    val k1 = graft.api.Ops.ksStatisticByGroup(a.repartition(5), b.repartition(3), "g", col("v"))
      .collect().map(_.toSeq).toSet
    assert(k1 == graft.api.Ops.ksStatisticByGroup(a, b, "g", col("v")).collect().map(_.toSeq).toSet)
  }

  test("kruskalWallis: hand-checked H with ties, tie correction, invariance") {
    import spark.implicits._
    // x = (1,2), y = (2,3): ranks 1, {2,3} tie → 2.5 each, 4.
    // R_x = 3.5, R_y = 6.5 → Σ R²/n = (12.25 + 42.25)/2 = 27.25
    // H = 12/(4·5)·27.25 − 3·5 = 1.35; ties: m=2 at v=2 → Σ(m³−m)=6,
    // C = 1 − 6/60 = 0.9 → H' = 1.5
    val df = Seq(("x", 1L), ("x", 2L), ("y", 2L), ("y", 3L)).toDF("g", "v")
    val out = graft.api.Ops.kruskalWallis(df, "g", col("v"))
      .orderBy(col("grp")).collect()
    assert(out.length == 2)
    val x = out(0); val y = out(1)
    assert(x.getAs[String]("grp") == "x" && x.getAs[Long]("n") == 2L)
    assert(x.getAs[Long]("r2") == 7L)   // 2·3.5
    assert(y.getAs[Long]("r2") == 13L)  // 2·6.5
    assert(x.getAs[Long]("n_total") == 4L && x.getAs[Long]("k_groups") == 2L)
    assert(x.getAs[Double]("h") == 1.35, s"h = ${x.getAs[Double]("h")}")
    assert(x.getAs[Double]("h_adj") == 1.5)
    // all-identical values: C = 0 → null h_adj, h defined
    val deg = Seq(("x", 5L), ("y", 5L)).toDF("g", "v")
    val d = graft.api.Ops.kruskalWallis(deg, "g", col("v")).collect().head
    assert(d.isNullAt(d.fieldIndex("h_adj")), "zero tie-correction → null h_adj")
    // partitioning-invariant
    val again = graft.api.Ops.kruskalWallis(df.repartition(5), "g", col("v"))
      .orderBy(col("grp")).collect().map(_.toSeq)
    assert(again.toSeq == out.map(_.toSeq).toSeq)
  }

  test("welchT: hand-checked t and Welch df, degenerate guards, invariance") {
    import spark.implicits._
    // a = (1,2,3), b = (2,4,6): means 2 / 4, s² 1 / 4 →
    // se² = 1/3 + 4/3 = 5/3, t = −2/√(5/3) = −1.549193,
    // df = (5/3)² / ((1/3)²/2 + (4/3)²/2) = 2.941176
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 4.0, 6.0).toDF("v")
    val r = graft.api.Ops.welchT(a, b, col("v")).collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("t") == -1.549193, s"t = ${r.getAs[Double]("t")}")
    assert(r.getAs[Double]("df") == 2.941176, s"df = ${r.getAs[Double]("df")}")
    // n < 2 on a side → null t/df with counts + means reporting
    val one = graft.api.Ops.welchT(a, b.limit(1), col("v")).collect().head
    assert(one.getAs[Long]("n_b") == 1L && one.isNullAt(one.fieldIndex("t")))
    // zero variance both sides → se² = 0 → null t (never ÷0)
    val const = Seq(3.0, 3.0).toDF("v")
    val z = graft.api.Ops.welchT(const, const.repartition(2), col("v")).collect().head
    assert(z.isNullAt(z.fieldIndex("t")))
    val again = graft.api.Ops.welchT(a.repartition(3), b.repartition(2), col("v"))
      .collect().head
    assert(again.toSeq == r.toSeq)
  }

  test("spearmanCorr: perfect monotone ±1, ties via averaged ranks, constant side null") {
    import spark.implicits._
    val up = Seq((1L, 10L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    val r1 = graft.api.Ops.spearmanCorr(up, col("x"), col("y")).collect().head
    assert(r1.getAs[Long]("n") == 3L && r1.getAs[Double]("rho") == 1.0)
    val down = Seq((1L, 40L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(graft.api.Ops.spearmanCorr(down, col("x"), col("y"))
      .collect().head.getAs[Double]("rho") == -1.0)
    // tied pairs rank-average identically on both axes → rho 1
    val tied = Seq((1L, 5L), (2L, 7L), (2L, 7L)).toDF("x", "y")
    assert(graft.api.Ops.spearmanCorr(tied, col("x"), col("y"))
      .collect().head.getAs[Double]("rho") == 1.0)
    // a constant axis has zero rank variance → null rho
    val const = Seq((1L, 9L), (2L, 9L)).toDF("x", "y")
    val c = graft.api.Ops.spearmanCorr(const, col("x"), col("y")).collect().head
    assert(c.isNullAt(c.fieldIndex("rho")))
    // partitioning-invariant
    assert(graft.api.Ops.spearmanCorr(up.repartition(4), col("x"), col("y"))
      .collect().head.toSeq == r1.toSeq)
  }

  test("zipfSlope: exact 1/rank law fits slope −1 and r −1, degenerate vocab nulls, invariance") {
    import spark.implicits._
    // counts ∝ 1/rank: a×12, b×6, c×4, d×3 → ln(count) = ln12 − ln(rank)
    // EXACTLY, so the least-squares fit is slope −1, r −1
    val text = ("a " * 12 + "b " * 6 + "c " * 4 + "d " * 3).trim
    val df = Seq(text).toDF("text")
    val r = graft.operators.TextAnalysis.zipfSlope(df, col("text")).collect().head
    assert(r.getAs[Long]("n_tokens_total") == 25L && r.getAs[Long]("vocab") == 4L &&
      r.getAs[Long]("fitted_ranks") == 4L)
    assert(r.getAs[Double]("slope") == -1.0, s"slope ${r.getAs[Double]("slope")}")
    assert(r.getAs[Double]("r") == -1.0)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12.0)) < 1e-5)
    // a single-token vocabulary has zero rank variance → null fit
    val one = graft.operators.TextAnalysis.zipfSlope(Seq("x x x").toDF("text"), col("text"))
      .collect().head
    assert(one.isNullAt(one.fieldIndex("slope")) && one.getAs[Long]("vocab") == 1L)
    // maxRank bounds the fitted head without touching the totals
    val h = graft.operators.TextAnalysis.zipfSlope(df, col("text"), maxRank = 10)
      .collect().head
    assert(h.toSeq == r.toSeq, "maxRank above vocab is a no-op")
    // partitioning-invariant (census + round-12 decimal sums)
    val multi = (1 to 12).map(_ => "a") ++ (1 to 6).map(_ => "b") ++
      (1 to 4).map(_ => "c") ++ (1 to 3).map(_ => "d")
    val again = graft.operators.TextAnalysis.zipfSlope(
      multi.toDF("text").repartition(7), col("text")).collect().head
    assert(again.toSeq == r.toSeq,
      "one doc per token ≡ one doc with all tokens, under any partitioning")
  }

  test("jsDivergenceByGroup: per-segment ≡ whole-frame jsDivergence per slice") {
    import spark.implicits._
    val base = Seq(("x", 0L), ("x", 0L), ("x", 1L), ("y", 0L), ("y", 2L)).toDF("g", "b")
    val cur = Seq(("x", 0L), ("x", 1L), ("x", 1L), ("x", 2L), ("y", 2L)).toDF("g", "b")
    val keyed = graft.api.Ops.jsDivergenceByGroup(base, cur, "g", "b")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(1)).toMap
    for (g <- Seq("x", "y")) {
      val whole = graft.api.Ops.jsDivergence(
        base.filter(col("g") === g), cur.filter(col("g") === g), "b")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      for ((bkt, expected) <- whole)
        assert(keyed((g, bkt)) == expected,
          s"segment $g bucket $bkt: keyed ≡ whole-frame slice")
    }
    // partitioning-invariant
    val again = graft.api.Ops.jsDivergenceByGroup(base.repartition(4),
      cur.repartition(3), "g", "b")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(1)).toMap
    assert(again == keyed)
  }

  test("mdeReadoutByGroup: per-segment ≡ whole-frame per slice, one-sided segments report") {
    import spark.implicits._
    val a = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("y", 10.0), ("y", 12.0),
      ("z", 7.0)).toDF("g", "v")
    val b = Seq(("x", 2.0), ("x", 4.0), ("x", 6.0), ("y", 11.0), ("y", 15.0))
      .toDF("g", "v")
    val keyed = graft.api.Ops.mdeReadoutByGroup(a, b, "g", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(keyed.size == 3)
    // the defining identity: each segment ≡ whole-frame mdeReadout on
    // its slice (columns beyond the counts/means match too)
    for (g <- Seq("x", "y")) {
      val whole = graft.api.Ops.mdeReadout(
        a.filter(col("g") === g), b.filter(col("g") === g), col("v"))
        .collect().head
      val k = keyed(g)
      assert(k.getAs[Long]("n_a") == whole.getAs[Long]("n_a"))
      assert(k.getAs[Double]("mde_abs") == whole.getAs[Double]("mde_abs"),
        s"segment $g mde ≡ whole-frame slice")
      assert(k.getAs[Double]("mde_rel") == whole.getAs[Double]("mde_rel"))
    }
    // the x segment matches the hand-checked q183 numbers (s²=1/4)
    assert(keyed("x").getAs[Double]("mde_abs") == math.rint(
      (graft.api.Ops.zAlpha025 + graft.api.Ops.zPower80) *
        math.sqrt(5.0 / 3.0) * 1e6) / 1e6)
    // a one-sided segment reports with the empty side's count 0
    val z = keyed("z")
    assert(z.getAs[Long]("n_b") == 0L && z.isNullAt(z.fieldIndex("mde_abs")))
    // partitioning-invariant
    val again = graft.api.Ops.mdeReadoutByGroup(a.repartition(5),
      b.repartition(3), "g", col("v"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == keyed.map { case (k, r) => k -> r.toSeq })
  }

  test("centroidSeparation: identical labels cosine 1, orthogonal 0, exact centroid means, invariance") {
    import spark.implicits._
    // a: docs along +x (mean (2,0)); b: same direction (cos 1 vs a);
    // c: along +y (cos 0 vs a and b)
    val df = Seq(
      ("a", Seq(1.0, 0.0)), ("a", Seq(3.0, 0.0)),
      ("b", Seq(5.0, 0.0)),
      ("c", Seq(0.0, 2.0)), ("c", Seq(0.0, 4.0)))
      .toDF("label", "emb")
    val r = graft.operators.Vectors.centroidSeparation(df, "label", col("emb"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.size == 3)
    assert(r(("a", "b")).getAs[Double]("cosine") == 1.0,
      "co-directional centroids are confusable (cos 1)")
    assert(r(("a", "c")).getAs[Double]("cosine") == 0.0 &&
      r(("b", "c")).getAs[Double]("cosine") == 0.0,
      "orthogonal centroids separate (cos 0)")
    assert(r(("a", "b")).getAs[Long]("n_a") == 2L &&
      r(("a", "b")).getAs[Long]("n_b") == 1L)
    // partitioning-invariant (exact decimal dim sums)
    val again = graft.operators.Vectors.centroidSeparation(
      df.repartition(4), "label", col("emb"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.toSeq).toMap
    assert(again == r.map { case (k, v) => k -> v.toSeq })
  }

  test("dedupYield: hand-checked histogram, dup mass, kept ratio, singletons via the total") {
    import spark.implicits._
    // corpus: 10 docs; clusters: {1,2,3} (size 3), {4,5} and {6,7}
    // (size 2 ×2); docs 8,9,10 unclustered.
    // hist: size 2 → 2 clusters/4 docs; size 3 → 1 cluster/3 docs
    // clustered 7, clusters 3 → dup_mass 4 → kept (10−4)/10 = 0.6
    val corpus = (1L to 10L).toDF("doc_id")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 6L)).toDF("vertex", "component")
    val out = graft.api.Ops.dedupYield(corpus, "doc_id", labels)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2)
    assert(out(2L).getAs[Long]("n_clusters") == 2L &&
      out(2L).getAs[Long]("n_docs") == 4L)
    assert(out(3L).getAs[Long]("n_clusters") == 1L &&
      out(3L).getAs[Long]("n_docs") == 3L)
    for (r <- out.values) {
      assert(r.getAs[Long]("n_docs_total") == 10L)
      assert(r.getAs[Long]("n_clustered") == 7L)
      assert(r.getAs[Long]("dup_mass") == 4L)
      assert(r.getAs[Double]("kept_ratio") == 0.6)
    }
    // partitioning-invariant
    val again = graft.api.Ops.dedupYield(corpus.repartition(5),
      "doc_id", labels.repartition(3))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("quantileDrift: midpoints within width/2 of exact, deltas track planted shift, invariance") {
    import spark.implicits._
    // era A uniform 1..100, era B uniform 51..150: every quantile
    // shifts by exactly +50
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val b = (51 to 150).map(_.toDouble).toDF("v")
    val out = graft.api.Ops.quantileDrift(a, b, col("v"), bucketWidth = 1.0,
      Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    for ((name, q) <- Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9)) {
      val exactA = math.ceil(q * 100)        // nearest-rank over 1..100
      val va = out(name).getAs[Double]("value_a")
      assert(math.abs(va - exactA) <= 0.5, s"$name a: $va vs $exactA")
      assert(out(name).getAs[Double]("delta") == 50.0,
        s"$name delta: ${out(name).getAs[Double]("delta")}")
    }
    // width-1 buckets on integers: midpoint = value + 0.5 exactly
    assert(out("p50").getAs[Double]("value_a") == 50.5)
    // partitioning-invariant (the q108 exact-census property)
    val again = graft.api.Ops.quantileDrift(a.repartition(7), b.repartition(3),
      col("v"), 1.0, Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("rankMovers: within-era ranks, climb/fall deltas, appearance nulls, topN either side, invariance") {
    import spark.implicits._
    // era A totals: e1=30, e2=20, e3=10 → ranks 1,2,3
    // era B totals: e2=50, e1=10, e4=5 → ranks 1,2,3 (e3 disappears)
    val a = Seq(("e1", 10.0), ("e1", 20.0), ("e2", 20.0), ("e3", 10.0)).toDF("e", "v")
    val b = Seq(("e2", 50.0), ("e1", 10.0), ("e4", 5.0)).toDF("e", "v")
    val out = graft.api.Ops.rankMovers(a, b, "e", col("v"), topN = 50)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 4)
    assert(out("e1").getAs[Long]("total_a_cents") == 3000L &&
      out("e1").getAs[Long]("rank_a") == 1L &&
      out("e1").getAs[Long]("rank_b") == 2L &&
      out("e1").getAs[Long]("rank_delta") == -1L, "e1 fell one place")
    assert(out("e2").getAs[Long]("rank_delta") == 1L, "e2 climbed to the top")
    val e3 = out("e3"); val e4 = out("e4")
    assert(e3.isNullAt(e3.fieldIndex("rank_b")) &&
      e3.isNullAt(e3.fieldIndex("rank_delta")), "a disappearing entity reports null")
    assert(e4.isNullAt(e4.fieldIndex("rank_a")) &&
      e4.getAs[Long]("rank_b") == 3L, "an appearing entity reports its new rank")
    // topN filters on EITHER side: topN=1 keeps the union of era tops
    val top1 = graft.api.Ops.rankMovers(a, b, "e", col("v"), topN = 1)
      .collect().map(_.getString(0)).toSet
    assert(top1 == Set("e1", "e2"), s"either-side top-1 union, got $top1")
    // partitioning-invariant (exact cent totals + deterministic ranks)
    val again = graft.api.Ops.rankMovers(a.repartition(5), b.repartition(3),
      "e", col("v"), topN = 50).collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("srmCheck: hand-checked chi2, absent arm contributes, undeclared arm reports, invariance") {
    import spark.implicits._
    // declared 50/25/25 over A/B/C; observed A=6, B=2, C absent, D=4
    // undeclared. N over declared = 8: e(A)=4, e(B)=2, e(C)=2.
    // contribs: (6-4)²/4 = 1.0, (2-2)²/2 = 0, (0-2)²/2 = 2.0 → χ²=3.0
    val df = (Seq.fill(6)("A") ++ Seq.fill(2)("B") ++ Seq.fill(4)("D")).toDF("arm")
    val out = graft.api.Ops.srmCheck(df, col("arm"),
      Seq("A" -> 0.5, "B" -> 0.25, "C" -> 0.25)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 4, "declared ∪ observed arms all report")
    assert(out("A").getAs[Long]("n_obs") == 6L &&
      out("A").getAs[Double]("contrib") == 1.0 &&
      out("A").getAs[Double]("expected") == 4.0)
    assert(out("C").getAs[Long]("n_obs") == 0L &&
      out("C").getAs[Double]("contrib") == 2.0,
      "a declared arm with zero traffic still contributes its expectation")
    val d = out("D")
    assert(d.getAs[Long]("n_obs") == 4L && d.isNullAt(d.fieldIndex("weight")) &&
      d.isNullAt(d.fieldIndex("contrib")),
      "an undeclared arm reports its count and stays out of the chi2")
    assert(out("A").getAs[Long]("chi2_micros") == 3000000L &&
      out("A").getAs[Long]("dof") == 2L)
    // weight validation
    intercept[IllegalArgumentException](
      graft.api.Ops.srmCheck(df, col("arm"), Seq("A" -> 0.5, "B" -> 0.4)))
    // partitioning-invariant
    val again = graft.api.Ops.srmCheck(df.repartition(5), col("arm"),
      Seq("A" -> 0.5, "B" -> 0.25, "C" -> 0.25)).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("jsDivergence: identical zero, disjoint ln2, one-sided buckets finite, invariance") {
    import spark.implicits._
    val a = Seq(0L, 0L, 1L, 1L).toDF("b")
    // identical distributions → js = 0 exactly (every term 0)
    val same = graft.api.Ops.jsDivergence(a, a.repartition(3), "b").collect()
    assert(same.forall(_.getAs[Double]("js") == 0.0) &&
      same.forall(_.getAs[Double]("term") == 0.0))
    // fully disjoint supports → js = ln 2 (to round-6)
    val c = Seq(2L, 2L, 3L, 3L).toDF("b")
    val disj = graft.api.Ops.jsDivergence(a, c, "b").collect()
    assert(disj.length == 4)
    assert(disj.head.getAs[Double]("js") == math.rint(math.log(2.0) * 1e6) / 1e6,
      s"disjoint JS must be ln2, got ${disj.head.getAs[Double]("js")}")
    // a one-side-only bucket is finite (no smoothing needed): its
    // present side's half-term is ½p·ln(2) at m = p/2
    val mixed = graft.api.Ops.jsDivergence(a, Seq(0L, 1L, 2L, 2L).toDF("b"), "b")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(mixed(2L).getAs[Long]("c_base") == 0L &&
      !mixed(2L).isNullAt(mixed(2L).fieldIndex("term")) &&
      mixed(2L).getAs[Double]("term") > 0.0)
    assert(mixed.values.head.getAs[Double]("js") > 0.0 &&
      mixed.values.head.getAs[Double]("js") < math.log(2.0))
    // partitioning-invariant
    val again = graft.api.Ops.jsDivergence(a.repartition(3), c.repartition(2), "b")
      .collect().map(_.toSeq).toSet
    assert(again == disj.map(_.toSeq).toSet)
  }

  test("r15 ANSI guards: empty sides / segments / declared traffic degrade observably, never ÷0") {
    import spark.implicits._
    val halfLn2 = math.rint(0.5 * math.log(2.0) * 1e6) / 1e6
    // whole-frame JS: an EMPTY baseline era reports zero p_base and
    // the formula's ½ln2 against a zero measure — previously the
    // ungated 0/0 probability division threw under ANSI
    val cur = Seq(0L, 0L, 1L).toDF("b")
    val js = graft.api.Ops.jsDivergence(Seq.empty[Long].toDF("b"), cur, "b").collect()
    assert(js.length == 2 && js.forall(_.getAs[Double]("p_base") == 0.0))
    assert(js.head.getAs[Double]("js") == halfLn2,
      s"empty-side JS must read ½ln2, got ${js.head.getAs[Double]("js")}")
    // by-group JS: a segment present in only ONE era (the core drift
    // scenario) reports instead of crashing the whole query
    val base = Seq(("x", 0L)).toDF("g", "b")
    val cur2 = Seq(("x", 0L), ("z", 1L), ("z", 2L)).toDF("g", "b")
    val keyed = graft.api.Ops.jsDivergenceByGroup(base, cur2, "g", "b")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(keyed(("z", 1L)).getAs[Double]("p_base") == 0.0 &&
      keyed(("z", 1L)).getAs[Double]("js") == halfLn2,
      "an appeared segment reports the maximal ½ln2 readout")
    assert(keyed(("x", 0L)).getAs[Double]("js") == 0.0,
      "two-sided segments keep their exact readout beside the one-sided one")
    // SRM: zero total DECLARED traffic (all arms undeclared, or an
    // empty frame) reports null contribs/chi2 with counts saying why
    val srm = graft.api.Ops.srmCheck(Seq("X", "X").toDF("arm"), col("arm"),
      Seq("A" -> 0.5, "B" -> 0.5)).collect().map(r => r.getString(0) -> r).toMap
    assert(srm("A").getAs[Long]("n_obs") == 0L &&
      srm("A").isNullAt(srm("A").fieldIndex("contrib")) &&
      srm("A").isNullAt(srm("A").fieldIndex("chi2_micros")) &&
      srm("A").getAs[Long]("dof") == 1L)
    assert(srm("X").getAs[Long]("n_obs") == 2L, "undeclared traffic still reports")
    val srmEmpty = graft.api.Ops.srmCheck(Seq.empty[String].toDF("arm"), col("arm"),
      Seq("A" -> 1.0)).collect()
    assert(srmEmpty.length == 1 && srmEmpty.head.getAs[Long]("n_obs") == 0L &&
      srmEmpty.head.isNullAt(srmEmpty.head.fieldIndex("contrib")))
  }

  test("poisson_bootstrap accumulation overflow fails fast (addExact), never wraps silently") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    // cdf(0) = 0.0 never matches → every resample takes the capped
    // tail weight 6, so the weighted-cent product is deterministic
    val agg = graft.functions.PoissonBootstrap(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      BoundReference(2, LongType, nullable = true), 1, Seq(0.0))
    intercept[ArithmeticException] {
      agg.update(agg.createAggregationBuffer(),
        InternalRow(0L, 0L, Long.MaxValue / 2)) // 6·(2⁶²) overflows the product
    }
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow(0L, 0L, Long.MaxValue / 7)) // 6/7·2⁶³ fits
    intercept[ArithmeticException] {
      agg.update(buf, InternalRow(0L, 0L, Long.MaxValue / 7)) // 12/7·2⁶³ does not
    }
    intercept[ArithmeticException] {
      agg.merge(Array(Long.MaxValue, 0L), Array(1L, 0L))
    }
  }

  test("mdeReadout: hand-checked MDE from exact moments, degenerate guards, invariance") {
    import spark.implicits._
    // a = (1,2,3): mean 2, s² 1; b = (2,4,6): mean 4, s² 4
    // se² = 1/3 + 4/3 = 5/3 → mde = (z975 + z80)·√(5/3)
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 4.0, 6.0).toDF("v")
    val r = graft.api.Ops.mdeReadout(a, b, col("v")).collect().head
    val exp = math.rint((graft.api.Ops.zAlpha025 + graft.api.Ops.zPower80) *
      math.sqrt(5.0 / 3.0) * 1e6) / 1e6
    assert(r.getAs[Double]("mde_abs") == exp, s"got ${r.getAs[Double]("mde_abs")}, want $exp")
    assert(r.getAs[Double]("mde_rel") == math.rint(
      (graft.api.Ops.zAlpha025 + graft.api.Ops.zPower80) * math.sqrt(5.0 / 3.0) / 2.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("sd_a") == 1.0 && r.getAs[Double]("sd_b") == 2.0)
    // n < 2 on a side → null mde with counts reporting
    val one = graft.api.Ops.mdeReadout(a, b.limit(1), col("v")).collect().head
    assert(one.getAs[Long]("n_b") == 1L && one.isNullAt(one.fieldIndex("mde_abs")))
    // zero variance both sides → null (never ÷0 or a zero MDE claim)
    val const = Seq(3.0, 3.0).toDF("v")
    val z = graft.api.Ops.mdeReadout(const, const.repartition(2), col("v")).collect().head
    assert(z.isNullAt(z.fieldIndex("mde_abs")))
    // partitioning-invariant
    val again = graft.api.Ops.mdeReadout(a.repartition(3), b.repartition(2), col("v"))
      .collect().head
    assert(again.toSeq == r.toSeq)
  }

  test("kruskalWallisByGroup: per-segment ≡ whole-frame per slice, keyed scalars, invariance") {
    import spark.implicits._
    val df = Seq(
      ("s1", "x", 1L), ("s1", "x", 2L), ("s1", "y", 2L), ("s1", "y", 3L),
      ("s2", "x", 10L), ("s2", "y", 20L), ("s2", "z", 20L), ("s2", "z", 30L))
      .toDF("seg", "g", "v")
    val keyed = graft.api.Ops.kruskalWallisByGroup(df, "seg", "g", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    // the defining identity: each segment's rows equal the
    // whole-frame kruskalWallis run on that segment's slice alone
    for (seg <- Seq("s1", "s2")) {
      val whole = graft.api.Ops.kruskalWallis(
        df.filter(col("seg") === seg), "g", col("v"))
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      for ((g, expected) <- whole)
        assert(keyed((seg, g)).drop(2) == expected,
          s"seg=$seg g=$g: keyed ≡ whole-frame slice")
    }
    // the hand-checked s1 values ride along (the q161 spec numbers)
    val s1x = keyed(("s1", "x"))
    assert(s1x(3) == 7L && s1x(6) == 1.35 && s1x(7) == 1.5,
      s"s1/x r2=7, h=1.35, h_adj=1.5 (got $s1x)")
    // a single-row segment reports (n_total = 1): h_adj null — the
    // gated tie correction, never an ANSI ÷0 crash
    val tiny = Seq(("s3", "x", 5L)).toDF("seg", "g", "v")
    val t = graft.api.Ops.kruskalWallisByGroup(tiny, "seg", "g", col("v"))
      .collect().head
    assert(t.isNullAt(t.fieldIndex("h_adj")))
    // partitioning-invariant
    val again = graft.api.Ops.kruskalWallisByGroup(df.repartition(5), "seg", "g", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(again == keyed)
  }

  test("spearmanCorrByGroup: per-segment ≡ whole-frame per slice, constant-axis segment null") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 40L),   // monotone up
      ("b", 1L, 40L), ("b", 2L, 20L), ("b", 3L, 10L),   // monotone down
      ("c", 1L, 9L), ("c", 2L, 9L))                     // constant y
      .toDF("g", "x", "y")
    val keyed = graft.api.Ops.spearmanCorrByGroup(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(keyed("a").getAs[Double]("rho") == 1.0 &&
      keyed("b").getAs[Double]("rho") == -1.0)
    assert(keyed("c").isNullAt(keyed("c").fieldIndex("rho")),
      "a constant-axis segment reports null rho, n still counts")
    assert(keyed("c").getAs[Long]("n") == 2L)
    // per-segment ≡ whole-frame on each slice
    for (g <- Seq("a", "b", "c")) {
      val whole = graft.api.Ops.spearmanCorr(
        df.filter(col("g") === g), col("x"), col("y")).collect().head
      assert(keyed(g).toSeq.drop(1) == whole.toSeq,
        s"segment $g: keyed ≡ whole-frame slice")
    }
    // partitioning-invariant
    val again = graft.api.Ops.spearmanCorrByGroup(df.repartition(7), "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == keyed.map { case (k, r) => k -> r.toSeq })
  }

  test("recommendTopN: seen items excluded, exact decimal scores, rank determinism") {
    import spark.implicits._
    // user 1 saw items 10, 20; sims: 10↔30 (.5), 20↔30 (.25), 10↔20 (.9)
    val seen = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("u", "it")
    val sims = Seq(
      (10L, 30L, 0.5), (30L, 10L, 0.5),
      (20L, 30L, 0.25), (30L, 20L, 0.25),
      (10L, 20L, 0.9), (20L, 10L, 0.9))
      .toDF("item", "other", "cosine")
    val out = graft.api.Ops.recommendTopN(seen, "u", "it", sims, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("score_micros"),
        r.getLong(3), r.getLong(4)))
    // user 1: candidate 30 scores .5 + .25 = .75 (2 contributors);
    // candidate 20 is SEEN → excluded despite cosine .9
    val u1 = out.filter(_._1 == 1L)
    assert(u1.toSeq == Seq((1L, 30L, 750000L, 2L, 1L)), s"got ${u1.toSeq}")
    // user 2 saw only 10: recs are 30 (.5) then 20 (.9)? no — .9 ranks
    // first: 20 (.9, rnk 1), 30 (.5, rnk 2)
    val u2 = out.filter(_._1 == 2L).sortBy(_._5)
    assert(u2.map(t => (t._2, t._3, t._5)).toSeq ==
      Seq((20L, 900000L, 1L), (30L, 500000L, 2L)), s"got ${u2.toSeq}")
    // decimal scoring is partitioning-invariant
    val again = graft.api.Ops.recommendTopN(seen.repartition(3), "u", "it",
      sims.repartition(2), n = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("score_micros"), r.getLong(3), r.getLong(4)))
    assert(again.toSet == out.toSet)
  }

  test("linkPredict: wedge candidates, edge exclusion, full degrees, hub cap") {
    import spark.implicits._
    // triangle 1-2-3 plus 4-1, 4-2: the only unconnected pair with
    // ≥2 common neighbors is (3,4) via mids 1 and 2
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L), (4L, 2L))
      .toDF("s", "d")
    val out = graft.api.Ops.linkPredict(edges, "s", "d",
      maxMidDegree = 10L, minCommon = 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 4L, 2L)))
    assert(r.getAs[Long]("deg_a") == 2L && r.getAs[Long]("deg_b") == 2L)
    assert(r.getAs[Double]("jaccard") == 1.0) // 2/(2+2−2)
    // existing edges never appear (1,2) has 2 common neighbors (3, 4)
    // but IS an edge — verified by the single-row output above
    // hub cap: mids 1 and 2 have degree 3 — capping at 2 removes
    // every wedge
    assert(graft.api.Ops.linkPredict(edges, "s", "d",
      maxMidDegree = 2L, minCommon = 2L).count() == 0)
    // direction/duplicate/self-loop insensitive
    val messy = edges.unionByName(Seq((2L, 1L), (3L, 3L)).toDF("s", "d"))
    assert(graft.api.Ops.linkPredict(messy, "s", "d",
      maxMidDegree = 10L, minCommon = 2L).collect().map(_.toSeq).toSeq ==
      out.map(_.toSeq).toSeq)
  }

  test("changepointPerKey: hand-checked argmax location, earliest tie, segment means, last-index null") {
    import spark.implicits._
    // cents 100,100,100,500,500 → stat 5S_k − 1300k =
    // −800, −1600, −2400, −1200, 0 → argmax |.| at k=3:
    // before-mean 100.000, after-mean 500.000 (millicents)
    val df = Seq(
      ("u1", 1L, "2024-01-01 00:00:01", 1.00),
      ("u1", 2L, "2024-01-01 00:00:02", 1.00),
      ("u1", 3L, "2024-01-01 00:00:03", 1.00),
      ("u1", 4L, "2024-01-01 00:00:04", 5.00),
      ("u1", 5L, "2024-01-01 00:00:05", 5.00),
      // a constant series: every stat is 0 → earliest tie k=1
      ("u2", 6L, "2024-01-01 00:00:01", 2.00),
      ("u2", 7L, "2024-01-01 00:00:02", 2.00))
      .toDF("k", "id", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = graft.api.Ops.changepointPerKey(df, "k", "ts", "id", col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val u1 = out("u1")
    assert(u1.getAs[Long]("n_points") == 5L && u1.getAs[Long]("cp_index") == 3L)
    assert(u1.getAs[Long]("stat") == -2400L)
    assert(u1.getAs[Long]("mean_before_millicents") == 100000L)
    assert(u1.getAs[Long]("mean_after_millicents") == 500000L)
    val u2 = out("u2")
    assert(u2.getAs[Long]("cp_index") == 1L,
      "all-zero stats tie to the EARLIEST index")
    assert(u2.getAs[Long]("mean_after_millicents") == 200000L)
    // argmax at the last index → null after-mean (no shift inside)
    val mono = Seq(("u3", 8L, "2024-01-01 00:00:01", 1.00))
      .toDF("k", "id", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val m = graft.api.Ops.changepointPerKey(mono, "k", "ts", "id", col("v"))
      .collect().head
    assert(m.getAs[Long]("cp_index") == 1L &&
      m.isNullAt(m.fieldIndex("mean_after_millicents")))
    // partitioning-invariant
    val again = graft.api.Ops.changepointPerKey(df.repartition(5), "k", "ts", "id", col("v"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("weightedMedian: volume-weighted selection, lower-median boundary, zero-weight drop") {
    import spark.implicits._
    // weights (in units) 1,1,10 on values 10,20,30: half of 12 units
    // sits below 30 → median 30
    val df = Seq(("g", 10L, 1.0), ("g", 20L, 1.0), ("g", 30L, 10.0))
      .toDF("g", "v", "w")
    val r = graft.api.Ops.weightedMedian(df, "g", col("v"), col("w"))
      .collect().head
    assert(r.getAs[Long]("w_median") == 30L)
    assert(r.getAs[Long]("n_rows") == 3L &&
      r.getAs[Long]("total_weight_cents") == 1200L)
    // exact half boundary takes the LOWER value (2·cum ≥ tot)
    val half = Seq(("g", 1L, 1.0), ("g", 2L, 1.0)).toDF("g", "v", "w")
    assert(graft.api.Ops.weightedMedian(half, "g", col("v"), col("w"))
      .collect().head.getAs[Long]("w_median") == 1L)
    // zero/negative/null weights drop
    val noisy = df.unionByName(Seq(("g", 1000L, 0.0), ("g", 2000L, -5.0))
      .toDF("g", "v", "w"))
    assert(graft.api.Ops.weightedMedian(noisy, "g", col("v"), col("w"))
      .collect().head.getAs[Long]("w_median") == 30L)
    // partitioning-invariant
    assert(graft.api.Ops.weightedMedian(df.repartition(4), "g", col("v"), col("w"))
      .collect().head.toSeq == r.toSeq)
  }

  test("categoryEntropy: uniform ln k, constant zero with null norm, invariance") {
    import spark.implicits._
    val df = Seq(("u", "a"), ("u", "b"), ("c", "x"), ("c", "x")).toDF("g", "cat")
    val out = graft.api.Ops.categoryEntropy(df, "g", col("cat"))
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("u")
    assert(u.getAs[Long]("k_categories") == 2L)
    assert(u.getAs[Double]("entropy") == 0.693147, s"got ${u.getAs[Double]("entropy")}")
    assert(u.getAs[Double]("entropy_norm") == 1.0)
    val c = out("c")
    assert(c.getAs[Double]("entropy") == 0.0 &&
      c.isNullAt(c.fieldIndex("entropy_norm")),
      "a single-category group is zero entropy with null normalization")
    val again = graft.api.Ops.categoryEntropy(df.repartition(3), "g", col("cat"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("welchTByGroup: per-group ≡ whole-frame welchT per segment, one-sided groups report") {
    import spark.implicits._
    val a = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("y", 5.0), ("y", 9.0), ("z", 1.0))
      .toDF("g", "v")
    val b = Seq(("x", 2.0), ("x", 4.0), ("x", 6.0), ("y", 1.0), ("y", 2.0))
      .toDF("g", "v")
    val keyed = graft.api.Ops.welchTByGroup(a, b, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    for (grp <- Seq("x", "y")) {
      val whole = graft.api.Ops.welchT(
        a.filter(col("g") === grp), b.filter(col("g") === grp), col("v"))
        .collect().head.toSeq
      assert(keyed(grp) == whole, s"welch group $grp must replay the whole-frame test")
    }
    // group z exists only on side a: n_b = 0, null t/df, mean_a reports
    val z = graft.api.Ops.welchTByGroup(a, b, "g", col("v"))
      .filter(col("grp") === "z").collect().head
    assert(z.getAs[Long]("n_b") == 0L && z.isNullAt(z.fieldIndex("t")) &&
      z.getAs[Double]("mean_a") == 1.0)
  }

  test("profileDrift: exact per-column counts, rate/ratio arithmetic, missing-column fail-fast") {
    import spark.implicits._
    val a = Seq((1L, Some("x")), (2L, Some("x")), (3L, None)).toDF("id", "s")
    val b = Seq((1L, Some("y")), (1L, None), (2L, None), (3L, None)).toDF("id", "s")
    val out = graft.api.Ops.profileDrift(a, b, Seq("s", "id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "s"))
    val s = out("s")
    assert(s.getAs[Long]("n_a") == 3L && s.getAs[Long]("nulls_a") == 1L &&
      s.getAs[Long]("distinct_a") == 1L)
    assert(s.getAs[Long]("n_b") == 4L && s.getAs[Long]("nulls_b") == 3L &&
      s.getAs[Long]("distinct_b") == 1L)
    assert(s.getAs[Double]("null_rate_a") == 0.333333 &&
      s.getAs[Double]("null_rate_b") == 0.75)
    val idRow = out("id")
    assert(idRow.getAs[Long]("distinct_a") == 3L && idRow.getAs[Long]("distinct_b") == 3L &&
      idRow.getAs[Double]("distinct_ratio") == 1.0)
    intercept[IllegalArgumentException] {
      graft.api.Ops.profileDrift(a, b, Seq("nope"))
    }
    // partitioning-invariant
    val again = graft.api.Ops.profileDrift(a.repartition(3), b.repartition(2), Seq("s", "id"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("bootstrapCiMean: deterministic seeded resampling, interval brackets the mean, invariance") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, (i % 50 + 1).toDouble)).toDF("id", "v")
    val r = graft.api.Ops.bootstrapCiMean(df, "id", col("v"), b = 64, seed = 3L)
      .collect().head
    assert(r.getAs[Long]("n") == 200L && r.getAs[Long]("b_resamples") == 64L)
    assert(r.getAs[Long]("b_effective") == 64L,
      "no resample of 200 rows should be empty")
    val (m, lo, hi) = (r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"))
    assert(lo <= m && m <= hi, s"interval [$lo, $hi] must bracket the mean $m")
    assert(hi - lo > 0.0 && hi - lo < 10.0,
      s"a 200-row mean of 1..50 should have a tight interval, got [$lo, $hi]")
    // bit-identical under repartitioning AND re-run (the seeded-hash
    // point: "random" resampling that replays)
    val again = graft.api.Ops.bootstrapCiMean(df.repartition(7), "id", col("v"),
      b = 64, seed = 3L).collect().head
    assert(again.toSeq == r.toSeq)
    // a different seed genuinely moves the resamples
    val other = graft.api.Ops.bootstrapCiMean(df, "id", col("v"), b = 64, seed = 4L)
      .collect().head
    assert(other.getAs[Double]("ci_lo") != lo || other.getAs[Double]("ci_hi") != hi)
    // r14: the single-pass poisson_bootstrap aggregate ≡ the ×B
    // explode formulation it replaced — same hashes, same IEEE weight
    // decisions, commutative Long sums — replayed inline bit-for-bit
    def h28(tag: String): org.apache.spark.sql.Column =
      conv(substring(md5(concat(lit(s"$tag:3:"), col("__id"))
        .cast("binary")), 1, 7), 16, 10).cast("long")
    val base = df
      .select(col("id").cast("string").as("__id"),
        (graft.util.Portable.dec(col("v")) * 100).cast("long").as("__c"))
      .withColumn("__h1", h28("bs1"))
      .withColumn("__h2", h28("bs2"))
    val u = pmod(col("__h1") + col("__b") * col("__h2"), lit(268435456L))
      .cast("double") / lit(268435456.0)
    val w = graft.api.Ops.poissonCdf1.zipWithIndex.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (p, k)) => acc.when(u < lit(p), lit(k.toLong))
    }.otherwise(lit(6L))
    val exploded = base
      .select(col("__id"), col("__c"), col("__h1"), col("__h2"),
        explode(sequence(lit(0L), lit(63L))).as("__b"))
      .withColumn("__w", w)
      .groupBy(col("__b"))
      .agg(sum(col("__w") * col("__c")).as("num"), sum(col("__w")).as("den"))
      .orderBy(col("__b")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    graft.functions.GraftFunctions.register(spark)
    val single = base
      .agg(call_function("poisson_bootstrap",
        col("__h1"), col("__h2"), col("__c"), lit(64)).as("bs"))
      .select(explode(col("bs")).as("r"))
      .select(col("r.b"), col("r.num"), col("r.den"))
      .orderBy("b").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(single == exploded,
      "single-pass aggregate ≡ the explode form, resample for resample")
  }

  test("cupedZ: hand-checked theta and adjusted means, zero-variance degrade, invariance") {
    import spark.implicits._
    // pooled: θ = covN/varXN = 8e6/5e6 = 1.6, x̄ = 12.50
    // A: Σy′ = 30 − 1.6·(20 − 25) = 38 → mean_adj 19; B: 62 → 31
    val units = Seq(("A", 10.0, 5.0), ("A", 20.0, 15.0),
      ("B", 30.0, 10.0), ("B", 40.0, 20.0)).toDF("arm", "y", "x")
    val r = graft.api.Ops.cupedZ(units, col("arm"), col("y"), col("x"), "A", "B")
      .collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("theta") == 1.6)
    assert(r.getAs[Double]("mean_a") == 15.0 && r.getAs[Double]("mean_b") == 35.0)
    assert(r.getAs[Double]("mean_adj_a") == 19.0, s"got ${r.getAs[Double]("mean_adj_a")}")
    assert(r.getAs[Double]("mean_adj_b") == 31.0)
    assert(!r.isNullAt(r.fieldIndex("z")))
    // a constant covariate has zero variance: θ = 0 by convention and
    // CUPED degrades to the plain comparison (adjusted ≡ raw means)
    val flat = units.withColumn("x", lit(7.0))
    val d = graft.api.Ops.cupedZ(flat, col("arm"), col("y"), col("x"), "A", "B")
      .collect().head
    assert(d.getAs[Double]("theta") == 0.0 &&
      d.getAs[Double]("mean_adj_a") == d.getAs[Double]("mean_a"))
    // partitioning-invariant
    val again = graft.api.Ops.cupedZ(units.repartition(5), col("arm"),
      col("y"), col("x"), "A", "B").collect().head
    assert(again.toSeq == r.toSeq)
  }

  test("diffInDiff: hand-checked four-cell estimate, SE, missing-cell nulls") {
    import spark.implicits._
    // means 10/20 vs 12/15 → DiD = (20−10) − (15−12) = 7;
    // each cell var 2 → se² = 4·(2/2) = 4 → se 2, t 3.5
    def cell(tr: Boolean, po: Boolean, vs: Seq[Double]) =
      vs.map(v => (tr, po, v))
    val df = (cell(true, false, Seq(9.0, 11.0)) ++ cell(true, true, Seq(19.0, 21.0)) ++
      cell(false, false, Seq(11.0, 13.0)) ++ cell(false, true, Seq(14.0, 16.0)))
      .toDF("tr", "po", "v")
    val r = graft.api.Ops.diffInDiff(df, col("tr"), col("po"), col("v"))
      .collect().head
    assert(r.getAs[Double]("mean_t_pre") == 10.0 && r.getAs[Double]("mean_t_post") == 20.0)
    assert(r.getAs[Double]("mean_c_pre") == 12.0 && r.getAs[Double]("mean_c_post") == 15.0)
    assert(r.getAs[Double]("did") == 7.0)
    assert(r.getAs[Double]("se") == 2.0 && r.getAs[Double]("t") == 3.5)
    // a missing cell: counts report 0, did/se/t null
    val partial = graft.api.Ops.diffInDiff(
      df.filter(!(col("tr") && col("po"))), col("tr"), col("po"), col("v"))
      .collect().head
    assert(partial.getAs[Long]("n_t_post") == 0L &&
      partial.isNullAt(partial.fieldIndex("did")) &&
      partial.isNullAt(partial.fieldIndex("t")))
    val again = graft.api.Ops.diffInDiff(df.repartition(7), col("tr"), col("po"), col("v"))
      .collect().head
    assert(again.toSeq == r.toSeq)
  }

  test("periodOverPeriod: previous OBSERVED period semantics, first-period null, zero-prev guard") {
    import spark.implicits._
    val df = Seq(
      ("g", "2024-01-05 00:00:00", 10.0), ("g", "2024-01-20 00:00:00", 10.0),
      ("g", "2024-02-10 00:00:00", 30.0),
      // March absent; April compares to FEBRUARY (previous observed)
      ("g", "2024-04-01 00:00:00", 15.0),
      ("h", "2024-01-01 00:00:00", 5.0))
      .toDF("g", "tss", "v").withColumn("ts", col("tss").cast("timestamp"))
    val out = graft.api.Ops.periodOverPeriod(df, "g", "ts", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val jan = out(("g", "2024-01"))
    assert(jan.getAs[Long]("total_cents") == 2000L &&
      jan.isNullAt(jan.fieldIndex("pct_change")), "first period has no prior")
    val feb = out(("g", "2024-02"))
    assert(feb.getAs[Long]("delta_cents") == 1000L &&
      feb.getAs[Double]("pct_change") == 0.5)
    val apr = out(("g", "2024-04"))
    assert(apr.getAs[Long]("prev_cents") == 3000L &&
      apr.getAs[Double]("pct_change") == -0.5,
      "a gap month compares to the previous OBSERVED month")
    assert(out(("h", "2024-01")).isNullAt(jan.fieldIndex("pct_change")),
      "groups never mix")
  }

  test("funnelCompleters: the completer set matches the last funnel step count, deadline honored") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "c"), // completes
      ("u2", 1L, "a"), ("u2", 2L, "c"),                  // skips b
      ("u3", 5L, "a"), ("u3", 6L, "b"), ("u3", 500L, "c")) // completes (no deadline)
      .map { case (u, s, t) => (u, new java.sql.Timestamp(s * 1000L), t) }
      .toDF("u", "ts", "et")
    val done = df.funnelCompleters("u", "ts", "et", Seq("a", "b", "c"))
      .collect().map(_.getString(0)).toSet
    assert(done == Set("u1", "u3"))
    // completers ≡ the funnel's last-step count (shared core)
    val lastCount = df.funnel("u", "ts", "et", Seq("a", "b", "c"))
      .filter(col("step") === 3).collect().head.getAs[Long]("n_users")
    assert(lastCount == done.size.toLong)
    // a deadline drops the slow completer
    val strict = df.funnelCompleters("u", "ts", "et", Seq("a", "b", "c"),
      withinUs = Some(10L * 1000000L)).collect().map(_.getString(0)).toSet
    assert(strict == Set("u1"), s"u3's c lands past the deadline, got $strict")
  }

  test("holtTrailing: hand-checked two-pass smoothing, flat series zero trend, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // lags=2 (weights 2,1), values 1.00/2.00/3.00 → s1 = 100000,
    // 166666, 266666 millicents (floor); s2 = 100000, 144444, 233332;
    // level 2s1−s2, trend s1−s2, forecast level + trend
    val df = Seq((1L, "2024-01-01 00:00:01", 1.00),
      (2L, "2024-01-01 00:00:02", 2.00), (3L, "2024-01-01 00:00:03", 3.00))
      .map { case (i, t, v) => ("k", i, t, v) }
      .toDF("k", "id", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.holtTrailing("k", "ts", "id", col("v"), lags = 2, horizon = 1)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("s1_millicents"), r.getAs[Long]("s2_millicents"),
          r.getAs[Long]("trend_millicents"), r.getAs[Long]("forecast_millicents")))).toMap
    assert(out(1L) == ((100000L, 100000L, 0L, 100000L)),
      "the first row smooths to itself on both passes")
    assert(out(2L) == ((166666L, 144444L, 22222L, 211110L)), s"got ${out(2L)}")
    assert(out(3L) == ((266666L, 233332L, 33334L, 333334L)), s"got ${out(3L)}")
    // a flat series carries zero trend at every row
    val flat = df.withColumn("v", lit(5.0))
    assert(flat.holtTrailing("k", "ts", "id", col("v"), lags = 4)
      .collect().forall(_.getAs[Long]("trend_millicents") == 0L))
    // partitioning-invariant
    val again = df.repartition(5).holtTrailing("k", "ts", "id", col("v"), lags = 2, horizon = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.toSeq).toMap
    assert(again == df.holtTrailing("k", "ts", "id", col("v"), lags = 2, horizon = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.toSeq).toMap)
  }

  test("coarse-group guard: the exact order-statistic family fails loudly past maxExactGroupRows") {
    import spark.implicits._
    import graft.api.Ops._
    val df = (1 to 20).map(i => ("g1", s"e$i", i.toDouble)).toDF("g", "e", "v")
    def msgOf(t: Throwable): String = {
      var m = ""; var c: Throwable = t
      while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
      m
    }
    // winsorize: 20 rows in one group > ceiling 5 → raise_error with
    // the routing message; acknowledged run ≡ the default-ceiling run
    val eW = intercept[Throwable] {
      df.winsorize("g", col("v"), 0.1, maxExactGroupRows = 5).collect()
    }
    assert(msgOf(eW).contains("allowCoarseGroups"), s"unexpected: ${msgOf(eW).take(300)}")
    val ackW = df.winsorize("g", col("v"), 0.1, allowCoarseGroups = true,
      maxExactGroupRows = 5).orderBy(col("e")).collect().map(_.toSeq)
    assert(ackW.toSeq == df.winsorize("g", col("v"), 0.1)
      .orderBy(col("e")).collect().map(_.toSeq).toSeq,
      "acknowledged coarse run must equal the default run")
    val eM = intercept[Throwable] {
      df.madOutliers("g", col("v"), 3, maxExactGroupRows = 5).collect()
    }
    assert(msgOf(eM).contains("madOutliers"))
    assert(df.madOutliers("g", col("v"), 3, allowCoarseGroups = true,
      maxExactGroupRows = 5).count() == 20)
    val eA = intercept[Throwable] {
      df.abcClassify("g", "e", col("v"), maxExactGroupRows = 5).collect()
    }
    assert(msgOf(eA).contains("abcClassify"))
    assert(df.abcClassify("g", "e", col("v"), allowCoarseGroups = true,
      maxExactGroupRows = 5).count() == 20)
    // groups under the ceiling never trip (zero-cost in the sane case)
    assert(df.winsorize("g", col("v"), 0.1, maxExactGroupRows = 20).count() == 20)
  }

  test("wide-census guard: the rank/CDF family fails loudly past maxExactCensusRows, ack bypasses") {
    import spark.implicits._
    def msgOf(t: Throwable): String = {
      var m = ""; var c: Throwable = t
      while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
      m
    }
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    // merged census = 6 distinct values: the boundary is EXACT —
    // ceiling 6 passes, ceiling 5 raises with the routing message
    val atKs = graft.api.Ops.ksStatistic(a, b, col("v"), maxExactCensusRows = 6).collect()
    assert(atKs.length == 1)
    val eKs = intercept[Throwable] {
      graft.api.Ops.ksStatistic(a, b, col("v"), maxExactCensusRows = 5).collect()
    }
    assert(msgOf(eKs).contains("allowWideCensus") && msgOf(eKs).contains("ksStatistic"),
      s"unexpected: ${msgOf(eKs).take(300)}")
    // acknowledged run ≡ the default run
    assert(graft.api.Ops.ksStatistic(a, b, col("v"), allowWideCensus = true,
      maxExactCensusRows = 5).collect().head.toSeq == atKs.head.toSeq)
    val eU = intercept[Throwable] {
      graft.api.Ops.mannWhitneyU(a, b, col("v"), maxExactCensusRows = 5).collect()
    }
    assert(msgOf(eU).contains("mannWhitneyU"))
    assert(graft.api.Ops.mannWhitneyU(a, b, col("v"), allowWideCensus = true,
      maxExactCensusRows = 5).collect().head.toSeq ==
      graft.api.Ops.mannWhitneyU(a, b, col("v")).collect().head.toSeq)
    // kruskalWallis: the distinct-value census of the stacked frame
    val kw = Seq(("x", 1L), ("x", 2L), ("y", 2L), ("y", 3L)).toDF("g", "v")
    val eK = intercept[Throwable] {
      graft.api.Ops.kruskalWallis(kw, "g", col("v"), maxExactCensusRows = 2).collect()
    }
    assert(msgOf(eK).contains("kruskalWallis"))
    assert(graft.api.Ops.kruskalWallis(kw, "g", col("v"), maxExactCensusRows = 3)
      .count() == 2, "3 distinct values at ceiling 3 pass")
    // spearmanCorr: per-variable censuses (x has 3 distinct here)
    val sp = Seq((1L, 10L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    val eS = intercept[Throwable] {
      graft.api.Ops.spearmanCorr(sp, col("x"), col("y"), maxExactCensusRows = 2).collect()
    }
    assert(msgOf(eS).contains("spearmanCorr"))
    assert(graft.api.Ops.spearmanCorr(sp, col("x"), col("y"), maxExactCensusRows = 3)
      .collect().head.getAs[Double]("rho") == 1.0)
    // weightedMedian: PER-GROUP census rows (g1 holds 4 values, g2 one)
    val wm = Seq(("g1", 1L, 1.0), ("g1", 2L, 1.0), ("g1", 3L, 1.0),
      ("g1", 4L, 1.0), ("g2", 9L, 1.0)).toDF("g", "v", "w")
    val eW2 = intercept[Throwable] {
      graft.api.Ops.weightedMedian(wm, "g", col("v"), col("w"),
        maxExactCensusRows = 3).collect()
    }
    assert(msgOf(eW2).contains("weightedMedian"))
    assert(graft.api.Ops.weightedMedian(wm, "g", col("v"), col("w"),
      maxExactCensusRows = 4).count() == 2, "the widest group sets the bar")
    // the by-group family gates PER SEGMENT (r14): ga holds 3 merged
    // values, gz one — the widest segment sets the bar
    val ga = Seq(("ga", 1L), ("ga", 2L), ("gz", 9L)).toDF("g", "v")
    val gb = Seq(("ga", 3L), ("gz", 9L)).toDF("g", "v")
    val eKg = intercept[Throwable] {
      graft.api.Ops.ksStatisticByGroup(ga, gb, "g", col("v"),
        maxExactCensusRows = 2).collect()
    }
    assert(msgOf(eKg).contains("ksStatisticByGroup"))
    assert(graft.api.Ops.ksStatisticByGroup(ga, gb, "g", col("v"),
      maxExactCensusRows = 3).count() == 2)
    val eUg = intercept[Throwable] {
      graft.api.Ops.mannWhitneyUByGroup(ga, gb, "g", col("v"),
        maxExactCensusRows = 2).collect()
    }
    assert(msgOf(eUg).contains("mannWhitneyUByGroup"))
    val kwg = Seq(("s1", "x", 1L), ("s1", "x", 2L), ("s1", "y", 3L),
      ("s2", "x", 9L)).toDF("seg", "g", "v")
    val eKWg = intercept[Throwable] {
      graft.api.Ops.kruskalWallisByGroup(kwg, "seg", "g", col("v"),
        maxExactCensusRows = 2).collect()
    }
    assert(msgOf(eKWg).contains("kruskalWallisByGroup"))
    assert(graft.api.Ops.kruskalWallisByGroup(kwg, "seg", "g", col("v"),
      maxExactCensusRows = 3).count() == 3)
    val spg = Seq(("sa", 1L, 10L), ("sa", 2L, 20L), ("sa", 3L, 40L),
      ("sb", 1L, 1L)).toDF("g", "x", "y")
    val eSg = intercept[Throwable] {
      graft.api.Ops.spearmanCorrByGroup(spg, "g", col("x"), col("y"),
        maxExactCensusRows = 2).collect()
    }
    assert(msgOf(eSg).contains("spearmanCorrByGroup"))
    assert(graft.api.Ops.spearmanCorrByGroup(spg, "g", col("x"), col("y"),
      maxExactCensusRows = 3).count() == 2)
  }

  test("sketch fallbacks: bucketed KS lower-bounds exact within bucket mass; median mid within width/2; width-1 ≡ exact") {
    import spark.implicits._
    val a = (1 to 40).map(_.toLong).toDF("v")
    val b = (21 to 60).map(_.toLong).toDF("v")
    val exact = graft.api.Ops.ksStatistic(a, b, col("v")).collect().head
    val sk = graft.api.Ops.ksStatisticSketch(a, b, col("v"), bucketWidth = 10L)
      .collect().head
    val dE = exact.getAs[Double]("d_stat"); val dS = sk.getAs[Double]("d_stat")
    // bucketed D is the exact KS of the bucketed distributions: a
    // lower bound, within one bucket's probability mass (10/40 here)
    assert(dS <= dE && dE - dS <= 0.25 + 1e-9, s"exact $dE sketch $dS")
    assert(sk.schema.fieldNames.contains("at_bucket"))
    // width 1 IS the exact statistic (bucket = value)
    val sk1 = graft.api.Ops.ksStatisticSketch(a, b, col("v"), bucketWidth = 1L)
      .collect().head
    assert(sk1.getAs[Double]("d_stat") == dE &&
      sk1.getAs[Long]("d_num") == exact.getAs[Long]("d_num"))
    // weighted median: exact answer provably inside the selected bucket
    val wm = (1 to 100).map(i => ("g", i.toLong, 1.0)).toDF("g", "v", "w")
    val ex = graft.api.Ops.weightedMedian(wm, "g", col("v"), col("w"))
      .collect().head.getAs[Long]("w_median")
    val skm = graft.api.Ops.weightedMedianSketch(wm, "g", col("v"), col("w"),
      bucketWidth = 7L).collect().head
    val mid = skm.getAs[Long]("w_median_mid")
    assert(math.abs(mid - ex) <= 4L,  // width/2 rounded up
      s"midpoint $mid must sit within width/2 of the exact median $ex")
    assert(skm.getAs[Long]("w_median_bucket") == ex / 7L,
      "the selected bucket contains the exact median")
    // width 1 ≡ exact selection
    val skm1 = graft.api.Ops.weightedMedianSketch(wm, "g", col("v"), col("w"),
      bucketWidth = 1L).collect().head
    assert(skm1.getAs[Long]("w_median_bucket") == ex)
  }

  test("r15 rank-statistic sketches: width-1 ≡ exact bit-for-bit; MWU error within the cross-pair bound; coarse Spearman tracks") {
    import spark.implicits._
    val av = (1L to 40L); val bv = (21L to 60L)
    val a = av.toDF("v"); val b = bv.toDF("v")
    // --- MWU: width 1 on an integer domain IS the exact statistic
    val exU = graft.api.Ops.mannWhitneyU(a, b, col("v")).collect().head
    val skU1 = graft.api.Ops.mannWhitneyUSketch(a, b, col("v"), 1L).collect().head
    assert(skU1.toSeq == exU.toSeq, "width-1 MWU sketch ≡ exact, bit for bit")
    // coarse width: |u2_sketch − u2_exact| ≤ Σ_k nA_k·nB_k (the
    // within-bucket cross-pair mass — only same-bucket pairs move)
    val skU = graft.api.Ops.mannWhitneyUSketch(a, b, col("v"), 10L).collect().head
    val bound = (av.map(_ / 10) ++ bv.map(_ / 10)).distinct
      .map(k => av.count(_ / 10 == k).toLong * bv.count(_ / 10 == k)).sum
    assert(math.abs(skU.getAs[Long]("u2") - exU.getAs[Long]("u2")) <= bound,
      s"sketch u2 ${skU.getAs[Long]("u2")} vs exact ${exU.getAs[Long]("u2")}, bound $bound")
    assert(skU.getAs[Long]("n_a") == 40L && skU.getAs[Long]("n_b") == 40L,
      "bucketing never changes the sample sizes")
    // --- MWU by-group: width-1 identity and keyed ≡ whole-frame slice
    val ga = Seq(("x", 1L), ("x", 2L), ("x", 3L), ("y", 10L)).toDF("g", "v")
    val gb = Seq(("x", 2L), ("x", 4L), ("y", 30L), ("y", 40L)).toDF("g", "v")
    val exUg = graft.api.Ops.mannWhitneyUByGroup(ga, gb, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    val skUg1 = graft.api.Ops.mannWhitneyUSketchByGroup(ga, gb, "g", col("v"), 1L)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(skUg1 == exUg, "width-1 by-group MWU sketch ≡ exact")
    // --- KW: width-1 identity, whole-frame and keyed
    val kw = Seq(("x", 1L), ("x", 2L), ("y", 3L), ("y", 9L), ("z", 5L))
      .toDF("g", "v")
    assert(graft.api.Ops.kruskalWallisSketch(kw, "g", col("v"), 1L)
      .collect().map(_.toSeq).toSet ==
      graft.api.Ops.kruskalWallis(kw, "g", col("v")).collect().map(_.toSeq).toSet,
      "width-1 KW sketch ≡ exact")
    val kwg = Seq(("s1", "x", 1L), ("s1", "x", 2L), ("s1", "y", 3L),
      ("s2", "x", 9L), ("s2", "y", 4L)).toDF("seg", "g", "v")
    assert(graft.api.Ops.kruskalWallisSketchByGroup(kwg, "seg", "g", col("v"), 1L)
      .collect().map(_.toSeq).toSet ==
      graft.api.Ops.kruskalWallisByGroup(kwg, "seg", "g", col("v"))
        .collect().map(_.toSeq).toSet,
      "width-1 by-group KW sketch ≡ exact")
    // coarse KW stays a valid H over the bucket census (finite, ≥ 0)
    val kwCoarse = graft.api.Ops.kruskalWallisSketch(
      (1 to 60).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v"), "g", col("v"), 10L)
      .collect()
    assert(kwCoarse.length == 3 && kwCoarse.forall(_.getAs[Double]("h") >= 0.0))
    // --- Spearman: width-1 identity; coarse buckets keep a perfect
    // monotone association near 1 (coarsening only introduces ties)
    val mono = (1 to 100).map(i => (i.toLong, i.toLong * 3)).toDF("x", "y")
    val exS = graft.api.Ops.spearmanCorr(mono, col("x"), col("y")).collect().head
    val skS1 = graft.api.Ops.spearmanCorrSketch(mono, col("x"), col("y"), 1L, 1L)
      .collect().head
    assert(skS1.toSeq == exS.toSeq, "width-1 Spearman sketch ≡ exact")
    assert(exS.getAs[Double]("rho") == 1.0)
    val skS = graft.api.Ops.spearmanCorrSketch(mono, col("x"), col("y"), 7L, 30L)
      .collect().head
    assert(skS.getAs[Double]("rho") > 0.97,
      s"coarse monotone rho should stay near 1, got ${skS.getAs[Double]("rho")}")
    val monoG = (1 to 50).flatMap(i =>
      Seq(("p", i.toLong, i.toLong * 2), ("q", i.toLong, 101L - i)))
      .toDF("g", "x", "y")
    val exSg = graft.api.Ops.spearmanCorrByGroup(monoG, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    val skSg1 = graft.api.Ops.spearmanCorrSketchByGroup(monoG, "g",
      col("x"), col("y"), 1L, 1L)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(skSg1 == exSg, "width-1 by-group Spearman sketch ≡ exact")
    // the sketches run UNDER the census guard that refuses their
    // exact siblings: the bucketed census passes a ceiling the raw
    // domain trips
    val wide = (1L to 50L).toDF("v")
    intercept[Throwable] {
      graft.api.Ops.mannWhitneyU(wide, wide, col("v"),
        maxExactCensusRows = 10).collect()
    }
    assert(graft.api.Ops.mannWhitneyUSketch(wide, wide, col("v"), 10L)
      .collect().head.getAs[Long]("n_a") == 50L,
      "the sketch path passes where the exact census refuses")
  }

  test("quantileDriftByGroup: per-segment ≡ whole-frame quantileDrift per slice; one-sided segments report null") {
    import spark.implicits._
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val a = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("x", 100.0),
      ("y", 10.0), ("y", 20.0)).toDF("g", "v")
    val b = Seq(("x", 5.0), ("x", 6.0), ("x", 200.0),
      ("z", 50.0), ("z", 60.0)).toDF("g", "v")
    val keyed = graft.api.Ops.quantileDriftByGroup(a, b, "g", col("v"), 2.0, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // shared segment: keyed ≡ the whole-frame operator on the slice
    val whole = graft.api.Ops.quantileDrift(
      a.filter(col("g") === "x"), b.filter(col("g") === "x"), col("v"), 2.0, qs)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    for ((qn, expected) <- whole)
      assert(keyed(("x", qn)).toSeq.drop(1) == expected,
        s"segment x quantile $qn must replay the whole-frame drift")
    // a segment present on ONE side reports null for the absent side
    val gone = keyed(("y", "p50"))
    assert(!gone.isNullAt(gone.fieldIndex("value_a")) &&
      gone.isNullAt(gone.fieldIndex("value_b")) &&
      gone.isNullAt(gone.fieldIndex("delta")),
      "a disappeared segment reports (value_a, null, null)")
    val appeared = keyed(("z", "p90"))
    assert(appeared.isNullAt(appeared.fieldIndex("value_a")) &&
      !appeared.isNullAt(appeared.fieldIndex("value_b")))
    assert(keyed.size == 6, "3 segments × 2 quantiles")
    // partitioning-invariant (exact integer censuses)
    val again = graft.api.Ops.quantileDriftByGroup(a.repartition(4),
      b.repartition(3), "g", col("v"), 2.0, qs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(again == keyed.map { case (k, r) => k -> r.toSeq })
  }

  test("psiDriftByGroup: per-group ≡ whole-frame psiDrift per segment") {
    import spark.implicits._
    val base = Seq(("x", 0L), ("x", 0L), ("x", 1L), ("y", 0L), ("y", 2L)).toDF("g", "b")
    val cur = Seq(("x", 0L), ("x", 1L), ("x", 1L), ("x", 2L), ("y", 2L)).toDF("g", "b")
    val keyed = graft.api.Ops.psiDriftByGroup(base, cur, "g", "b")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
    for (grp <- Seq("x", "y")) {
      val whole = graft.api.Ops.psiDrift(
        base.filter(col("g") === grp), cur.filter(col("g") === grp), "b")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      for ((bkt, rest) <- whole)
        assert(keyed((grp, bkt)) == rest,
          s"psi group $grp bucket $bkt must replay the whole-frame drift")
    }
    assert(keyed.keySet.map(_._1) == Set("x", "y"))
  }

  test("duplicatePayments: exact-cents + day-window pairs, one row per pair, boundary days") {
    import spark.implicits._
    import graft.api.Ops._
    def r(id: Long, day: String, v: Double) = (id, day, v)
    // 1&2: same cents, same day → pair. 1&3: same cents, +1 day →
    // pair (boundary inclusive). 1&4: same cents, +2 days → NOT a
    // pair. 5: different cents, same day as 1 → not a pair.
    val df = Seq(
      r(1, "2024-01-10", 99.99), r(2, "2024-01-10", 99.99),
      r(3, "2024-01-11", 99.99), r(4, "2024-01-12", 99.99),
      r(5, "2024-01-10", 99.98))
      .toDF("id", "d", "v").withColumn("ts", col("d").cast("timestamp"))
    val out = df.duplicatePayments("id", "ts", col("v"), dayTol = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)),
      s"cents-exact pairs within ±1 day, oriented a < b, exactly once each (got $out)")
    // partitioning-invariant, and each pair appears EXACTLY once
    val rows = df.repartition(5).duplicatePayments("id", "ts", col("v"), dayTol = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size && rows.toSet == out,
      "the one-owner day blocking emits no duplicate pair rows")
  }

  test("newVsReturning: first-day classification, duplicate collapse, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // d1: u1, u2 both new; d2: u1 returns, u3 new (u1 twice collapses)
    val df = Seq(
      ("u1", "2024-01-01 05:00:00"), ("u2", "2024-01-01 09:00:00"),
      ("u1", "2024-01-02 10:00:00"), ("u1", "2024-01-02 11:00:00"),
      ("u3", "2024-01-02 12:00:00"))
      .toDF("u", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = df.newVsReturning("u", "ts").collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map(
      "2024-01-01" -> ((2L, 2L, 0L, 0.0)),
      "2024-01-02" -> ((2L, 1L, 1L, 0.5))),
      s"first-day classification with census collapse (got $out)")
    val again = df.repartition(5).newVsReturning("u", "ts").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap
    assert(again == df.newVsReturning("u", "ts").collect()
      .map(r => r.getDate(0).toString -> r.toSeq).toMap)
  }

  test("conversionLatency: rank-selected exact median/p90, direct exclusion, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    def ev(id: Long, u: Long, tUs: Long, typ: String) =
      (id, u, new java.sql.Timestamp(tUs / 1000), typ)
    // user 1: click@0 then purchases at gaps 10s/20s/30s/40s (the
    // click carries); user 2: view@0, purchase at 5s; user 3: a
    // DIRECT purchase (no touch) — excluded from latency
    val rows = Seq(
      ev(1, 1, 0L, "click"),
      ev(2, 1, 10000000L, "purchase"), ev(3, 1, 20000000L, "purchase"),
      ev(4, 1, 30000000L, "purchase"), ev(5, 1, 40000000L, "purchase"),
      ev(6, 2, 0L, "view"), ev(7, 2, 5000000L, "purchase"),
      ev(8, 3, 1000000L, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = rows.conversionLatency("user_id", "ts", "event_id", "event_type",
        "purchase", Seq("click", "view"), windowUs = 3600000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // click: n=4, exact floor mean 25s, median rank (4+1) div 2 = 2 → 20s,
    // p90 rank (36+9) div 10 = 4 → 40s
    assert(out == Map(
      "click" -> ((4L, 25000000L, 20000000L, 40000000L)),
      "view"  -> ((1L, 5000000L, 5000000L, 5000000L))),
      s"rank-selected latency stats; the direct purchase is excluded (got $out)")
    val again = rows.repartition(5).conversionLatency("user_id", "ts", "event_id",
        "event_type", "purchase", Seq("click", "view"), windowUs = 3600000000L)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> again(k) } && again.size == out.size)
  }

  test("cohortLtv: hand-checked grid, cumulative carry over gaps, constant cohort size, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // anchor 2024-01-01, 2-day buckets.
    // u1 first in bucket 0 (spends 1.00 + 2.00), again bucket 2 (4.00)
    // u2 first in bucket 0 (3.00)                 → cohort 0, size 2
    // u3 first in bucket 1 (5.00)                 → cohort 1, size 1
    val df = Seq(
      ("u1", "2024-01-01 10:00:00", 1.00), ("u1", "2024-01-02 10:00:00", 2.00),
      ("u2", "2024-01-01 11:00:00", 3.00),
      ("u1", "2024-01-05 10:00:00", 4.00),
      ("u3", "2024-01-03 10:00:00", 5.00))
      .toDF("u", "s", "v").withColumn("ts", col("s").cast("timestamp"))
    val out = df.cohortLtv("u", "ts", col("v"), bucketDays = 2,
        anchor = "2024-01-01")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // cohort 0 @ age 0: both users, 600 cents, LTV 300 cents/user
    assert(out((0L, 0L)) == ((2L, 2L, 600L, 600L, 300.0)), s"got $out")
    // cohort 0 @ age 2 (age 1 is a GAP — no row): u1's 400 carries
    // cumulative to 1000, size still 2 → 5.0
    assert(out((0L, 2L)) == ((2L, 1L, 400L, 1000L, 500.0)))
    assert(!out.contains((0L, 1L)), "an inactive age emits nothing")
    assert(out((1L, 0L)) == ((1L, 1L, 500L, 500L, 500.0)))
    // partitioning-invariant
    val again = df.repartition(5)
      .cohortLtv("u", "ts", col("v"), bucketDays = 2, anchor = "2024-01-01")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq).toMap
    assert(again == df.cohortLtv("u", "ts", col("v"), bucketDays = 2, anchor = "2024-01-01")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq).toMap)
  }

  test("forecastScore: hand-checked MAE/bias/MAPE/sMAPE, zero-actual accounting, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // g: (a, p) = (100, 110), (200, 180), (0, 50)
    //   MAE = (10+20+50)/3 = 26.666667; bias = (10−20+50)/3 = 13.333333
    //   MAPE over non-zero actuals: (0.1 + 0.1)/2 = 0.1 (the a=0 row
    //   reported, not folded); sMAPE: 2·10/210, 2·20/380, 2·50/50 →
    //   (0.095238095238 + 0.105263157895 + 2)/3 = 0.733500
    // z: the only pair is (0, 0) → MAPE null AND sMAPE null
    val df = Seq(
      ("g", 100L, 110L), ("g", 200L, 180L), ("g", 0L, 50L),
      ("z", 0L, 0L))
      .toDF("grp", "a", "p")
    val out = df.forecastScore("grp", col("a"), col("p")).collect()
      .map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("n") == 3L && g.getAs[Long]("n_zero_actual") == 1L)
    assert(g.getAs[Double]("mae") == 26.666667)
    assert(g.getAs[Double]("bias") == 13.333333)
    assert(g.getAs[Double]("mape") == 0.1)
    assert(g.getAs[Double]("smape") == 0.733500)
    val z = out("z")
    assert(z.isNullAt(z.fieldIndex("mape")) && z.isNullAt(z.fieldIndex("smape")),
      "all-degenerate rows yield null ratios, never NaN")
    assert(z.getAs[Double]("mae") == 0.0)
    // partitioning-invariant (exact sums + decimal ratio sums)
    val again = df.repartition(5).forecastScore("grp", col("a"), col("p"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("xcorrByGroup: planted lead detected at +1, mirror symmetry, degenerate nulls, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // x_t = y_{t−1} exactly (y LEADS x by one step): r must be
    // exactly 1 at k = +1 and strictly less at k = 0
    val y = Seq(1L, 5L, 2L, 8L, 3L, 9L)
    val x = 0L +: y.dropRight(1)
    val df = (1 to 6).map(i => ("g", i.toLong, x(i - 1), y(i - 1)))
      .toDF("grp", "t", "x", "y")
    val out = df.xcorrByGroup("grp", col("t"), col("x"), col("y"), maxLag = 2)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 1.0)), s"x echoes y's past exactly → r = 1 at k = +1 (got $out)")
    assert(out(0L)._1 == 6L && out(0L)._2 < 1.0, "contemporaneous r is not the planted lead")
    assert(out(2L)._1 == 4L && out(-2L)._1 == 4L, "edge pairs drop per shift")
    // mirror symmetry: xcorr(x, y) at k == xcorr(y, x) at −k
    val sw = df.xcorrByGroup("grp", col("t"), col("y"), col("x"), maxLag = 2)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert((-2 to 2).forall(k => sw(-k.toLong) == out(k.toLong)._2 ||
      (sw(-k.toLong).isNaN && out(k.toLong)._2.isNaN)),
      s"swap-and-negate symmetry (got $sw vs $out)")
    // a constant series has zero variance → null r, n still reported
    val const = (1 to 4).map(i => ("c", i.toLong, 7L, i.toLong))
      .toDF("grp", "t", "x", "y")
      .xcorrByGroup("grp", col("t"), col("x"), col("y"), maxLag = 1)
      .collect().map(r => r.getLong(1) -> r.isNullAt(3)).toMap
    assert(const == Map(-1L -> true, 0L -> true, 1L -> true))
    // partitioning-invariant
    val again = df.repartition(5)
      .xcorrByGroup("grp", col("t"), col("x"), col("y"), maxLag = 2)
      .collect().map(r => r.getLong(1) -> r.toSeq).toMap
    assert(again == df.xcorrByGroup("grp", col("t"), col("x"), col("y"), maxLag = 2)
      .collect().map(r => r.getLong(1) -> r.toSeq).toMap)
  }

  test("abcClassify: exact Pareto thresholds, boundary entity, all-zero group, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // g: values 80, 15, 4, 1 (total 100) →
    //   e1: before 0   < 80 → A;  e2: before 80, NOT < 80 → B
    //   e3: before 95, NOT < 95 → C;  e4: before 99 → C
    // b: values 50, 50 → e1 A (before 0), e2: before 50 < 80 → A
    //   (the crossing entity itself still counts toward the band)
    // z: all-zero → C (no 80% exists to cross)
    val df = Seq(
      ("g", "e1", 80.0), ("g", "e2", 15.0), ("g", "e3", 4.0), ("g", "e4", 1.0),
      ("b", "e1", 50.0), ("b", "e2", 50.0),
      ("z", "e1", 0.0))
      .toDF("grp", "ent", "v")
    val out = df.abcClassify("grp", "ent", col("v")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(3)).toMap
    assert(out == Map(
      ("g", "e1") -> "A", ("g", "e2") -> "B", ("g", "e3") -> "C",
      ("g", "e4") -> "C",
      ("b", "e1") -> "A", ("b", "e2") -> "A",
      ("z", "e1") -> "C"), s"exact integer band tests (got $out)")
    val shares = df.abcClassify("grp", "ent", col("v")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("share"), r.getAs[Double]("cum_share"))).toMap
    assert(shares(("g", "e2")) == ((0.15, 0.95)))
    // partitioning-invariant (integer census + integer tests)
    val again = df.repartition(5).abcClassify("grp", "ent", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap
    assert(again == df.abcClassify("grp", "ent", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.toSeq).toMap)
  }

  test("intervalCoverage: island merge incl. touching/contained, gaps, invalid drop, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // k1: [0,10] ∪ [5,7] (contained) ∪ [10,12] (touching → merges)
    //     then a gap, [20,25] → islands [0,12], [20,25];
    //     covered = 12 + 5 = 17, span = 25, coverage = 0.68
    // k2: a zero-length [3,3] + [1,2] → 2 islands, covered 1, span 2
    // the (9, 4) row is invalid (end < start) and drops
    val df = Seq(
      ("k1", 0L, 10L), ("k1", 5L, 7L), ("k1", 10L, 12L), ("k1", 20L, 25L),
      ("k1", 9L, 4L),
      ("k2", 3L, 3L), ("k2", 1L, 2L))
      .toDF("k", "s", "e")
    val out = df.intervalCoverage("k", col("s"), col("e")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    assert(out("k1") == ((4L, 2L, 17L, 25L, 0.68)),
      s"contained + touching merge into one island; the invalid row drops (got ${out("k1")})")
    assert(out("k2") == ((2L, 2L, 1L, 2L, 0.5)),
      "a zero-length interval is its own island contributing nothing")
    // partitioning-invariant (exact integers + one fixed division)
    val again = df.repartition(5).intervalCoverage("k", col("s"), col("e"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again.keySet == out.keySet &&
      again == df.intervalCoverage("k", col("s"), col("e"))
        .collect().map(r => r.getString(0) -> r.toSeq).toMap)
  }

  test("survivalCurve: hand-checked KM steps, censoring carry, all-event zero pin, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // A: S(1)=4/5=0.8; censor at 2 carries; S(3)=0.8·(1/3)=0.266667
    //    (two events with three at risk); censor at 4 carries.
    // B: both units event together → survival pins to exactly 0.
    // C: censor-only → the curve never moves off 1.
    val df = Seq(
      ("A", 1L, true), ("A", 2L, false), ("A", 3L, true), ("A", 3L, true),
      ("A", 4L, false),
      ("B", 5L, true), ("B", 5L, true),
      ("C", 7L, false))
      .toDF("g", "dur", "ev")
    val out = df.survivalCurve("g", col("dur"), col("ev")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out(("A", 1L)) == ((5L, 1L, 0L, 0.8)))
    assert(out(("A", 2L)) == ((4L, 0L, 1L, 0.8)), "a censor-only step carries S")
    assert(out(("A", 3L)) == ((3L, 2L, 0L, 0.266667)))
    assert(out(("A", 4L)) == ((1L, 0L, 1L, 0.266667)))
    assert(out(("B", 5L)) == ((2L, 2L, 0L, 0.0)),
      "every at-risk unit eventing pins survival to exactly 0, never NaN")
    assert(out(("C", 7L)) == ((1L, 0L, 1L, 1.0)),
      "a censor-only group never moves off 1")
    // partitioning-invariant (census + fixed shape over exact counts)
    val again = df.repartition(5).survivalCurve("g", col("dur"), col("ev"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq).toMap
    assert(again == out.map { case (k, _) => k -> again(k) } && again.size == out.size)
    val once = df.survivalCurve("g", col("dur"), col("ev"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq).toMap
    assert(again == once)
  }

  test("linkageScore: blocked candidates, weighted agreement, null-never-agrees, minScore cut") {
    import spark.implicits._
    val a = Seq(
      (1L, "b1", "ann", "x st", "555"),
      (2L, "b1", "bob", null.asInstanceOf[String], "777"),
      (3L, "b2", "ann", "x st", "555")) // same fields as 1 but another block
      .toDF("aid", "ablk", "an", "aa", "ap")
    val b = Seq(
      (10L, "b1", "ann", "x st", "555"),  // full match with 1 → 4+3+2=9
      (11L, "b1", "ann", "y st", "999"),  // name only with 1 → 4
      (12L, "b1", "bob", null.asInstanceOf[String], "000")) // name only with 2 (null addr NEVER agrees) → 4
      .toDF("bid", "bblk", "bn", "ba", "bp")
    val out = graft.api.Ops.linkageScore(a, b, "aid", "bid",
        block = Seq("ablk" -> "bblk"),
        fields = Seq(("an", "bn", 4L), ("aa", "ba", 3L), ("ap", "bp", 2L)),
        minScore = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("score"), r.getAs[Boolean]("m_aa"))).toMap
    assert(out == Map(
      (1L, 10L) -> ((9L, true)), (1L, 11L) -> ((4L, false)),
      (2L, 12L) -> ((4L, false))),
      s"blocked weighted agreement: row 3 pairs with nothing (other block), " +
        s"two nulls never agree, sub-minScore pairs drop (got $out)")
    // raising minScore keeps only the full match
    val strict = graft.api.Ops.linkageScore(a, b, "aid", "bid",
        Seq("ablk" -> "bblk"),
        Seq(("an", "bn", 4L), ("aa", "ba", 3L), ("ap", "bp", 2L)), minScore = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 10L)))
  }

  test("nearestNeighbors: radius-bounded kNN, tie-break, no-neighbor exclusion, brute parity") {
    import spark.implicits._
    // left point L1 at (0,0): B at (3,4) d2=25, A at (5,0) d2=25 (a
    // TIE — id order breaks it), C at (0,6) d2=36, D at (50,50) out
    // of range; L2 at (-100,-100): nothing in range (negative
    // coordinates exercise the widened cell at 0)
    val a = Seq((1L, 0L, 0L), (2L, -100L, -100L)).toDF("aid", "ax", "ay")
    val b = Seq(("A", 5L, 0L), ("B", 3L, 4L), ("C", 0L, 6L), ("D", 50L, 50L))
      .toDF("bid", "bx", "by")
    val out = graft.api.Ops.nearestNeighbors(a, b, "aid", "ax", "ay",
        "bid", "bx", "by", radius = 7L, k = 2)
      .select("aid", "bid", "dist2", "rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._4))
    assert(out.toSeq == Seq((1L, "A", 25L, 1L), (1L, "B", 25L, 2L)),
      s"two nearest within radius, equal distances break by id; L2 emits nothing (got ${out.toSeq})")
    // brute-force parity at k covering everything in range
    val brute = a.crossJoin(b)
      .withColumn("dist2", (col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= 49L).select("aid", "bid", "dist2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val wide = graft.api.Ops.nearestNeighbors(a, b, "aid", "ax", "ay",
        "bid", "bx", "by", radius = 7L, k = 100)
      .select("aid", "bid", "dist2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(wide == brute, "k past the candidate count degrades to the radius join itself")
  }

  test("concentration: hand-checked HHI/Gini, degenerate groups, negative drop, invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // g: v = (1, 1, 2) → T=4, HHI = 6/16 = 0.375,
    //    rank sum = 1·1 + 1·2 + 2·3 = 9 → Gini = 18/12 − 4/3 = 0.166667
    // eq: two equal entities → Gini = 0, HHI = 0.5
    // m: a monopoly → Gini = 0, HHI = 1
    // z: all-zero total → null metrics
    // the −3.0 row is dropped (negative measure)
    val df = Seq(
      ("g", "a", 0.5), ("g", "a", 0.5), ("g", "b", 1.0), ("g", "c", 2.0),
      ("eq", "a", 5.0), ("eq", "b", 5.0),
      ("m", "a", 7.0), ("m", "b", -3.0),
      ("z", "a", 0.0))
      .toDF("grp", "ent", "v")
    val out = df.concentration("grp", "ent", col("v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Long]("n_entities") == 3L)
    assert(out("g").getAs[Double]("hhi") == 0.375)
    assert(out("g").getAs[Double]("gini") == 0.166667)
    assert(out("eq").getAs[Double]("gini") == 0.0 &&
      out("eq").getAs[Double]("hhi") == 0.5)
    assert(out("m").getAs[Long]("n_entities") == 1L &&
      out("m").getAs[Double]("gini") == 0.0 &&
      out("m").getAs[Double]("hhi") == 1.0,
      "a monopoly is maximal HHI, zero Gini; the negative row dropped")
    val z = out("z")
    assert(z.isNullAt(z.fieldIndex("hhi")) && z.isNullAt(z.fieldIndex("gini")),
      "an all-zero-total group yields null metrics, never NaN")
    // partitioning-invariant (exact decimal sums + fixed double shape)
    val again = df.repartition(7).concentration("grp", "ent", col("v"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(again == out.map { case (k, r) => k -> r.toSeq })
  }

  test("rollingActives: exact DAU + trailing distinct window, observed days only") {
    import spark.implicits._
    import graft.api.Ops._
    // u1 active d1,d2; u2 active d1 only; u3 active d4 only (a gap
    // at d3 — unobserved days emit nothing); duplicate events on one
    // day collapse in the census; a null user is excluded
    val df = Seq(
      ("u1", "2024-01-01 05:00:00"), ("u1", "2024-01-01 09:00:00"),
      ("u2", "2024-01-01 10:00:00"), ("u1", "2024-01-02 10:00:00"),
      ("u3", "2024-01-04 10:00:00"), (null.asInstanceOf[String], "2024-01-01 11:00:00"))
      .toDF("u", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = df.rollingActives("u", "ts", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    // window 3: day d counts units active in {d-2, d-1, d}
    assert(out == Map(
      "2024-01-01" -> ((2L, 2L)),  // u1, u2
      "2024-01-02" -> ((1L, 2L)),  // u1 active; u1+u2 in window
      "2024-01-04" -> ((1L, 2L))), // u3 active; u1 (d2) + u3 in window
      s"exact daily + trailing distinct counts on observed days only (got $out)")
    // partitioning-invariant (exact integers end-to-end)
    val again = df.repartition(7).rollingActives("u", "ts", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == out)
  }

  test("ssspDistances: weighted min-cost, budget refinement, parallel-edge min, converged stability") {
    import spark.implicits._
    // path 1-2-3-4-5 at weight 1 each, plus an EXPENSIVE shortcut
    // 1-4 (w=10): hop-wise 4 is 1 edge away, weighted the 3-edge
    // path (cost 3) wins — the exact case BFS gets wrong
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L), (1L, 4L, 10L),
      (2L, 1L, 5L),  // reversed PARALLEL edge: min weight (1) must win
      (3L, 3L, 0L),  // self-loop: dropped
      (1L, 9L, -3L), // negative weight: dropped — 9 stays unreachable
      (98L, 99L, 1L))
      .toDF("s", "d", "w")
    val seeds = Seq(1L).toDF("n")
    def run(rounds: Int, sd: org.apache.spark.sql.DataFrame = seeds,
            e: org.apache.spark.sql.DataFrame = edges) =
      graft.api.Ops.ssspDistances(e, "s", "d", "w", sd, "n", rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(4) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L),
      s"weighted min-cost: the 3-edge path beats the w=10 shortcut (got ${run(4)})")
    // the ≤r-edge Bellman-Ford contract: at rounds=2 node 4's best
    // ≤2-edge path IS the shortcut (10); more budget refines it to 3
    val r2 = run(2)
    assert(r2(4L) == 10L && r2(5L) == 11L,
      s"rounds=2 carries the best ≤2-edge cost — via the shortcut (got $r2)")
    // multi-source: nearest seed wins; an off-graph seed labels at 0
    val multi = run(4, Seq(1L, 5L, 777L).toDF("n"))
    assert(multi == Map(1L -> 0L, 5L -> 0L, 777L -> 0L, 2L -> 1L,
      3L -> 2L, 4L -> 1L),
      s"cost is min over seeds — node 4 is 1 from seed 5 (got $multi)")
    // a converged result is stable under a larger budget, under
    // repartitioning, and duplicate seeds collapse
    assert(run(9, Seq(1L, 1L).toDF("n"), edges.repartition(5)) == run(4),
      "extra rounds past convergence are no-ops")
  }

  test("triangleCounts: K4 corners, pendant exclusion, dirty-input canonicalization") {
    import spark.implicits._
    // K4 on 1..4 (each node in C(3,2)=3 triangles) + pendant 5 + a
    // deliberately dirty encoding: duplicates, reversals, a self-loop
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), // reversed duplicates
      (4L, 4L),           // self-loop
      (4L, 5L))           // pendant edge — 5 joins no triangle
      .toDF("s", "d")
    val out = graft.api.Ops.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"each K4 corner sits in exactly 3 triangles; the pendant emits nothing (got $out)")
    // a wedge without its closing edge is not a triangle
    val open = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    assert(graft.api.Ops.triangleCounts(open, "s", "d").count() == 0)
    val again = graft.api.Ops.triangleCounts(edges.repartition(7), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("winsorize: exact rank bounds, null pass-through, single-value group, partitioning invariance") {
    import spark.implicits._
    import graft.api.Ops._
    // group a: 10 values 1..10, p=0.2 → k=2 → clip to [2, 9]
    val a = (1 to 10).map(i => ("a", Some(i.toDouble)))
    val df = (a ++ Seq(("a", None), ("b", Some(7.0)))).toDF("g", "v")
    val out = df.winsorize("g", col("v"), 0.2, out = "w")
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(out(("a", Some(1.0))) == Some(2.0), "below the low rank bound clips up")
    assert(out(("a", Some(10.0))) == Some(9.0), "above the high rank bound clips down")
    assert(out(("a", Some(5.0))) == Some(5.0), "interior values pass through")
    assert(out(("a", None)).isEmpty, "null values clip to null, not to a bound")
    assert(out(("b", Some(7.0))) == Some(7.0), "a single-value group clips to itself")
    val again = df.repartition(5).winsorize("g", col("v"), 0.2, out = "w")
      .collect().map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(again == out, "rank-selected bounds are partitioning-invariant")
  }

  test("applyChanges: latest-wins, delete, insert, equal-seq tie, unknown op fails") {
    import spark.implicits._
    import graft.api.Ops._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (5L, "e", 5.0))
      .toDF("id", "name", "bal")
    val changes = Seq(
      (1L, "a2", 10.0, "upsert", 2L), (1L, "a1", 5.0, "upsert", 1L), // latest wins
      (2L, "b", 2.0, "delete", 1L),                                  // delete
      (4L, "d", 4.0, "upsert", 1L),                                  // insert
      (5L, "e5", 50.0, "upsert", 3L), (5L, "e", 5.0, "delete", 3L))  // tie → upsert
      .toDF("id", "name", "bal", "op", "seq")
    val out = base.applyChanges(changes, "id", "op", "seq")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out == Map(
      1L -> (("a2", 10.0)), 3L -> (("c", 3.0)),
      4L -> (("d", 4.0)), 5L -> (("e5", 50.0))),
      "superseded upsert discarded, delete applied, insert added, tie → upsert")
    val bad = Seq((1L, "x", 0.0, "upsrt", 1L)).toDF("id", "name", "bal", "op", "seq")
    val e = intercept[Exception](base.applyChanges(bad, "id", "op", "seq").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unknown op")),
      s"a typo'd op must fail loudly, not silently delete (got $e)")
  }

  test("checkConstraints: all four constraint kinds count violations exactly") {
    import spark.implicits._
    import graft.api.Ops._
    import graft.data.Quality._
    val child = Seq(
      (Some(1L), Some(1), Some(10.0)),
      (Some(1L), Some(1), Some(30.0)), // duplicate key AND out-of-range value
      (Some(2L), Some(1), None),       // null value
      (Some(9L), Some(1), Some(5.0)),  // orphan foreign key
      (None, Some(2), Some(7.0)))      // null key part: excluded from unique/fk
      .toDF("k", "ln", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = child.checkConstraints(Seq(
      Unique(Seq("k", "ln"), "u"),
      ForeignKey(Seq("k"), parent, Seq("pk"), "fk"),
      NotNull("v", "nn"),
      InRange("v", 0.0, 20.0, "rng")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("u") == ((4L, 1L, false)),
      "4 rows carry a full key, 3 distinct keys -> 1 surplus copy")
    assert(out("fk") == ((4L, 1L, false)), "exactly the k=9 orphan")
    assert(out("nn") == ((5L, 1L, false)), "all rows checked, one null")
    assert(out("rng") == ((4L, 1L, false)),
      "nulls are NotNull's job - 4 values checked, 30.0 out of range")
    val pass = child.checkConstraints(Seq(InRange("v", 0.0, 100.0, "ok")))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSeq
    assert(pass == Seq(("ok", 0L, true)), "a satisfied constraint reports pass")
  }

  test("PreparedMoments: regression ≡ regressionByGroup; absorb ≡ re-prepare; groups on one side survive") {
    import spark.implicits._
    import graft.api.Ops
    import graft.api.Ops._
    val df = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      ("b", 1.0, 5.0), ("b", 2.0, 7.0),
      ("c", 2.0, 3.0)).toDF("g", "x", "y")
    val whole = df.regressionByGroup("g", col("x"), col("y"))
      .collect().map(_.toString).sorted.toSeq
    val prepared = Ops.prepareMoments(df, "g", col("x"), col("y"))
      .regression.collect().map(_.toString).sorted.toSeq
    assert(prepared == whole, "prepared regression must equal the fluent operator")
    // split so group c lives ONLY in the increment — union semantics
    val partA = df.filter(col("g") =!= "c" && col("x") < 3.0)
    val partB = df.filter(col("g") === "c" || col("x") >= 3.0)
    val absorbed = Ops.prepareMoments(partA, "g", col("x"), col("y"))
      .absorb(partB, col("x"), col("y"))
    assert(absorbed.regression.collect().map(_.toString).sorted.toSeq == whole,
      "absorb must equal the one-shot prepare — exact decimal algebra")
    assert(absorbed.moments.collect().map(_.toString).sorted.toSeq ==
      Ops.prepareMoments(df, "g", col("x"), col("y"))
        .moments.collect().map(_.toString).sorted.toSeq,
      "the merged sums themselves must match the one-shot census")
  }

  test("twapPerKey: interval weights, last-event zero weight, division identity") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      (1L, 10L, "2024-01-01 00:00:00", Some(1.00)),
      (1L, 11L, "2024-01-01 00:00:10", Some(2.00)),
      (1L, 12L, "2024-01-01 00:00:40", Some(4.00)),
      (2L, 20L, "2024-01-01 00:00:00", Some(3.00)),
      // a null-valued row marks no priced observation — excluded
      (1L, 13L, "2024-01-01 00:00:20", None))
      .toDF("k", "id", "tss", "v")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.twapPerKey("k", "ts", "id", col("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4))))).toMap
    // key 1: 100c×10s + 200c×30s over 40s → 175.000 cents
    assert(out(1L) == ((3L, 100L * 10000000L + 200L * 30000000L, 40000000L,
      Some(175000L))))
    assert(out(2L) == ((1L, 0L, 0L, None)),
      "a single observation spans no interval — no defined TWAP")
    val again = df.repartition(5).twapPerKey("k", "ts", "id", col("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), Option(r.get(4))))).toMap
    assert(again == out)
  }

  test("transitionMatrix: consecutive pairs, per-src totals, keys never mix") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "a"), (1L, 2L, "2024-01-01 00:01:00", "b"),
      (1L, 3L, "2024-01-01 00:02:00", "a"), (1L, 4L, "2024-01-01 00:03:00", "b"),
      (2L, 5L, "2024-01-01 00:00:00", "a"), (2L, 6L, "2024-01-01 00:01:00", "c"))
      .toDF("k", "id", "tss", "et")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.transitionMatrix("k", "ts", "id", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 3L, 666L)),
      ("a", "c") -> ((1L, 3L, 333L)),
      ("b", "a") -> ((1L, 1L, 1000L))),
      "user 1's trailing b and user 2's boundary must emit no cross-key pair")
  }

  test("activityStreaks: island invariant, earliest-start tie break, day collapse") {
    import spark.implicits._
    import graft.api.Ops._
    def t(d: Int, h: Int) = f"2024-01-$d%02d $h%02d:00:00"
    val df = Seq(
      // user 1: Jan 1-2-3 (two events on Jan 2 collapse), Jan 5-6, Jan 10
      (1L, t(1, 9)), (1L, t(2, 9)), (1L, t(2, 21)), (1L, t(3, 9)),
      (1L, t(5, 9)), (1L, t(6, 9)), (1L, t(10, 9)),
      // user 2: two length-2 streaks — the tie resolves to the EARLIEST
      (2L, t(1, 9)), (2L, t(2, 9)), (2L, t(5, 9)), (2L, t(6, 9)))
      .toDF("k", "tss")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val out = df.activityStreaks("k", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDate(4).toString))).toMap
    assert(out(1L) == ((6L, 3L, 3L, "2024-01-01")))
    assert(out(2L) == ((4L, 2L, 2L, "2024-01-01")),
      "equal-length streaks must resolve to the earliest start")
    val again = df.repartition(3).activityStreaks("k", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDate(4).toString))).toMap
    assert(again == out)
  }

  test("trained k-means centroids compose with ivfTopK and lift recall") {
    import graft.operators.{Similarity, Vectors}
    def topPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topPairs(Similarity.q35(t))
    val fixedRecall = (exact & topPairs(Similarity.q36(t))).size.toDouble / exact.size
    val trained = Vectors.kmeansCentroids(t.embeddings, "vec_id", "embedding", k = 8, iters = 3)
    val trainedIvf = Similarity.ivfTopK(
      t.embeddings, t.embeddings.filter(col("vec_id") < 10), trained,
      id = "vec_id", emb = "embedding", centroidId = "cid", centroidEmb = "centroid",
      k = 5, nprobe = 2)
    val trainedRecall = (exact & topPairs(trainedIvf)).size.toDouble / exact.size
    info(s"recall vs q35: fixed-centroids=$fixedRecall trained-kmeans=$trainedRecall")
    assert(trainedRecall > 0.0)
    assert(trainedRecall >= fixedRecall - 0.1,
      s"trained quantizer should not lose to arbitrary fixed vectors ($trainedRecall vs $fixedRecall)")
  }

  test("ivfTopKTwoLevel: coarse=fine is exactly single-level; trained coarse keeps recall") {
    import graft.operators.{Similarity, Vectors}
    val corpus = t.embeddings
    val queries = t.embeddings.filter(col("vec_id") < 10)
    val fine = t.embeddings.filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val single = Similarity.ivfTopK(corpus, queries, fine,
      id = "vec_id", emb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb", k = 5, nprobe = 2)
    // degenerate coarse = fine with coarseProbe ≥ nprobe: every fine
    // cell is its own singleton coarse cell, so two-level routing is
    // exact and the result must EQUAL single-level bit-for-bit
    val degenerate = Similarity.ivfTopKTwoLevel(corpus, queries, fine,
      fine.select(col("centroid_id").as("gid"), col("cent_emb").as("gemb")),
      id = "vec_id", emb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb",
      coarseId = "gid", coarseEmb = "gemb", k = 5, nprobe = 2, coarseProbe = 2)
    assert(single.except(degenerate).isEmpty && degenerate.except(single).isEmpty,
      "coarse=fine two-level must equal single-level ivfTopK")
    // a REAL trained coarse level (k-means over the fine centroids)
    // stays a useful index: nonzero recall vs the exact baseline,
    // within approximation slack of single-level
    def topPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topPairs(Similarity.q35(t))
    val coarse = Vectors.kmeansCentroids(fine, "centroid_id", "cent_emb", k = 3, iters = 2)
    val trained = Similarity.ivfTopKTwoLevel(corpus, queries, fine, coarse,
      id = "vec_id", emb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb",
      coarseId = "cid", coarseEmb = "centroid", k = 5, nprobe = 2, coarseProbe = 2)
    val twoRecall = (exact & topPairs(trained)).size.toDouble / exact.size
    val oneRecall = (exact & topPairs(Similarity.q36(t))).size.toDouble / exact.size
    info(s"recall vs exact: single-level=$oneRecall two-level-trained=$twoRecall")
    assert(twoRecall > 0.0, "trained two-level index must find true neighbors")
    assert(twoRecall >= oneRecall - 0.25,
      s"two-level routing may cost bounded recall, not collapse ($twoRecall vs $oneRecall)")
    // oversized coarse set is rejected loudly (coarse must be ~sqrt k)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKTwoLevel(corpus, queries, fine,
        fine.select(col("centroid_id").as("gid"), col("cent_emb").as("gemb")),
        id = "vec_id", emb = "embedding",
        centroidId = "centroid_id", centroidEmb = "cent_emb",
        coarseId = "gid", coarseEmb = "gemb", maxLiteralCentroids = 4)
    }
    assert(e.getMessage.contains("coarse"))
  }

  test("HLL sketch tables: merged estimate ≈ exact cross-shard distinct") {
    import graft.operators.Sketches
    val sketches = Sketches.eventUserSketches(t)
    // constant-size sketch per shard (the whole point)
    val sizes = sketches.select(org.apache.spark.sql.functions.length(col("hll_sketch")))
      .collect().map(_.getInt(0))
    assert(sizes.forall(_ < 64 * 1024), s"sketches must stay bounded: ${sizes.toSeq}")
    val est = Sketches.hllMergedDistinct(sketches).collect().head.getLong(0)
    val exact = t.events.select("user_id").distinct().count()
    val err = math.abs(est.toDouble - exact) / exact
    assert(err < 0.05, s"merged estimate $est vs exact $exact (err=$err)")
    // merging a SUBSET of shards answers the filtered question from bytes
    val sub = Sketches.hllMergedDistinct(
      sketches.filter(col("event_type").isin("view", "click"))).collect().head.getLong(0)
    val subExact = t.events.filter(col("event_type").isin("view", "click"))
      .select("user_id").distinct().count()
    assert(math.abs(sub.toDouble - subExact) / subExact < 0.05)
  }

  test("embeddingNearDups multi-table blocking: recall ≥0.9 where single-table fails") {
    // Adversarial corpus: +0.03 per coordinate keeps cosine ≈0.99 but
    // flips ~3% of signs — enough that an 8-dim single-sign-code block
    // (the pre-r4 shape) loses far more than 10% of true pairs, while
    // the union of 4 independent hyperplane tables keeps ≥90%
    // (VERDICT r3 item #2). (A harsher +0.05 pushes pairs onto the
    // 0.92 threshold itself, where no finite-table LSH holds 0.9 —
    // measured multi-table recall there is 0.81 vs single-table 0.26.)
    import graft.api.Ops._
    graft.functions.GraftFunctions.register(spark)
    val base = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val corpus = base.unionByName(
      base.filter(col("vec_id") < 200)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("emb"), v => v + lit(0.03)).as("emb")))
    // ground truth: driver-side brute force over all pairs (test-scale only)
    val vs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = vs.keys.toArray.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      if cos(vs(ids(i)), vs(ids(j))) >= 0.92
    } yield (ids(i), ids(j))).toSet
    assert(truth.size >= 100, s"adversarial corpus should have many true pairs, got ${truth.size}")

    def recallOf(found: Set[(Long, Long)]): Double = (truth & found).size.toDouble / truth.size
    val multi = corpus.embeddingNearDups("vec_id", "emb", threshold = 0.92, dim = 64)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the pre-r4 single blocking table: signs of the leading 8 dims
    val axis = {
      val e = corpus.withColumn("__block",
        concat_ws("", transform(slice(col("emb"), 1, 8),
          v => when(v >= 0, lit("1")).otherwise(lit("0")))))
      val a = e.select(col("__block"), col("vec_id").as("vec_a"), col("emb").as("__ea"))
      val b = e.select(col("__block"), col("vec_id").as("vec_b"), col("emb").as("__eb"))
      a.join(b, Seq("__block")).filter(col("vec_a") < col("vec_b"))
        .withColumn("cosine", call_function("cosine_sim", col("__ea"), col("__eb")))
        .filter(col("cosine") >= 0.92)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    info(f"recall: multi-table=${recallOf(multi)}%.3f single-axis-table=${recallOf(axis)}%.3f (${truth.size} true pairs)")
    assert(recallOf(axis) < 0.9,
      f"single-table blocking unexpectedly survived the adversarial corpus (${recallOf(axis)}%.3f)")
    assert(recallOf(multi) >= 0.9,
      f"multi-table hyperplane recall ${recallOf(multi)}%.3f below 0.9")
    // no false positives possible: every candidate is cosine-verified
    assert(multi.subsetOf(truth))
  }

  test("q46 reliable-checkpoint mode produces the same clusters as localCheckpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val local    = Dedup.q46(t).collect().toSeq
    val reliable = Dedup.q46(t, checkpointDir = Some(dir)).collect().toSeq
    assert(local.nonEmpty)
    assert(local == reliable)
  }

  test("connectedComponents converges on a worst-case-diameter 50-node chain") {
    import spark.implicits._
    import graft.api.Ops
    // a pure path graph 0-1-2-...-49: diameter 49 is the worst case
    // for one-hop min-label propagation (real near-dup clusters are
    // shallow; this pins the adversarial bound). Label 0 travels one
    // hop per round → 49 propagation rounds + 1 confirming round.
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Ops.connectedComponentsWithRounds(
      chain, "src", "dst", maxRounds = 60, checkpointDir = None)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 50 && got.forall(_._2 == 0L),
      s"all 50 chain vertices must collapse to component 0: ${got.take(5).toSeq}…")
    assert(rounds == 50,
      s"expected diameter+1 = 50 rounds on the 50-chain, got $rounds")
    // a shallow star converges in 2 rounds regardless of size — the
    // shape near-dup clusters actually take, so diameter, not vertex
    // count, drives the round bill
    val star = (1L until 40L).map(i => (0L, i)).toDF("src", "dst")
    val (starLabels, starRounds) = Ops.connectedComponentsWithRounds(
      star, "src", "dst", maxRounds = 60, checkpointDir = None)
    assert(starLabels.collect().forall(_.getLong(1) == 0L))
    assert(starRounds == 2, s"star must converge in 2 rounds, got $starRounds")

    // an exhausted round budget is an ERROR, not a result (ADVICE r7):
    // partial labels fragment any component deeper than maxRounds, and
    // silently returning them is wrong-answer territory
    val tooDeep = intercept[IllegalStateException] {
      Ops.connectedComponentsWithRounds(chain, "src", "dst",
        maxRounds = 5, checkpointDir = None)
    }
    assert(tooDeep.getMessage.contains("did not converge"))
    val tooDeepStar = intercept[IllegalStateException] {
      Ops.connectedComponentsStarWithRounds(chain, "src", "dst",
        maxRounds = 2, checkpointDir = None)
    }
    assert(tooDeepStar.getMessage.contains("did not converge"))
  }

  test("connectedComponentsStar matches BSP and is diameter-independent") {
    import spark.implicits._
    import graft.api.Ops
    // the 256-node path that costs BSP min-label 257 rounds: the
    // large-star/small-star contraction must land the same labels in
    // O(log² n) rounds — the whole point of the variant
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = Ops.connectedComponentsStarWithRounds(
      chain, "src", "dst", maxRounds = 30, checkpointDir = None)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 256 && got.forall(_._2 == 0L),
      s"all 256 chain vertices must collapse to component 0: ${got.take(5).toSeq}…")
    assert(rounds <= 12,
      s"star contraction must be diameter-independent on the 256-chain (≤12 rounds), got $rounds")

    // seeded multi-component random graph + a self-loop-only vertex
    // + an isolated pair: label-for-label equal to the BSP variant
    val rnd = new scala.util.Random(42)
    val randomEdges = Seq.tabulate(300)(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) ++
      Seq((500L, 500L), (600L, 601L))
    val edges = randomEdges.toDF("src", "dst")
    val bsp = Ops.connectedComponentsWithRounds(
      edges, "src", "dst", maxRounds = 60, checkpointDir = None)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = Ops.connectedComponentsStarWithRounds(
      edges, "src", "dst", maxRounds = 30, checkpointDir = None)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == bsp,
      s"star labels must equal BSP labels (diff: ${(star diff bsp).take(5)} / ${(bsp diff star).take(5)})")

    // edgeless input: every vertex labels itself in zero rounds
    val loops = Seq((7L, 7L), (9L, 9L)).toDF("src", "dst")
    val (selfLabels, zeroRounds) = Ops.connectedComponentsStarWithRounds(
      loops, "src", "dst", maxRounds = 5, checkpointDir = None)
    assert(selfLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((7L, 7L), (9L, 9L)))
    assert(zeroRounds == 0, s"self-loop-only input must converge in 0 rounds, got $zeroRounds")
  }

  test("q92 IVF-PQ: exhaustive probing equals the flat PQ scan; prepared ≡ one-shot; routing restricts candidates") {
    import graft.api.Ops._
    val corpus = t.embeddings
    val queries = t.embeddings.filter(col("vec_id") < 5)
    val cents = t.embeddings.filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    // nprobe = nCells ⇒ every cell probed: routing is exhaustive and
    // the composition must EQUAL the flat ADC scan bit-for-bit (cell
    // assignment only partitions the candidate set, never the math)
    val exhaustive = Similarity.ivfPqTopK(corpus, queries, cents,
      id = "vec_id", emb = "embedding", queryId = "vec_id", queryEmb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb",
      dim = 64, m = 8, ks = 16, k = 10, nprobe = 8)
    val flat = corpus.pqTopK(queries,
      queryId = "vec_id", queryEmb = "embedding",
      id = "vec_id", emb = "embedding", dim = 64, m = 8, ks = 16, k = 10)
    assert(exhaustive.except(flat).isEmpty && flat.except(exhaustive).isEmpty,
      "nprobe = nCells IVF-PQ must equal the flat PQ ADC scan")
    // prepared index ≡ one-shot at the headline nprobe
    val prepared = Similarity.prepareIvfPq(corpus, cents,
      id = "vec_id", emb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb", dim = 64)
    val viaIndex = Similarity.ivfPqTopKAgainst(prepared, queries, cents,
      id = "vec_id", queryId = "vec_id", queryEmb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb",
      dim = 64, k = 10, nprobe = 2)
    val oneShot = Similarity.q92(t)
    val viaIndexR = viaIndex
      .select(col("qid"), col("rank"), col("vid"), round(col("adc_dist"), 4).as("adc_dist"))
    assert(viaIndexR.except(oneShot).isEmpty && oneShot.except(viaIndexR).isEmpty,
      "once-prepared IVF-PQ index must serve identical rankings")
    // routing really restricts: every returned vid's home cell is one
    // of its query's nprobe=2 probed cells (recomputed through the
    // SAME assigner the operator uses)
    val homes = prepared.select(col("vec_id").as("vid"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = Similarity.cellAssigner(cents, "centroid_id", "cent_emb")(
        queries, "vec_id", "embedding", 2, "qid", "__qe")
      .select("qid", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val got = viaIndex.select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty, "IVF-PQ must return rankings")
    assert(got.forall { case (qid, vid) => probed(qid).contains(homes(vid)) },
      "every ranked candidate must live in one of its query's probed cells")
    // ADC overlap with the flat scan stays meaningful under routing
    val flatTop = flat.select("qid", "vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = got.count(flatTop.contains).toDouble / got.length
    info(s"IVF-PQ nprobe=2 overlap with flat ADC top-10: $overlap")
    assert(overlap > 0.0, "cell-routed ADC must retain flat-scan neighbors")
  }

  test("r15 msprt: planted shift rejects, identical samples never do; ln_p is 0 (not -0.0) at no evidence; by-group ≡ whole-frame per slice") {
    import spark.implicits._
    val base = (1 to 200).map(i => (i % 40 + 10).toDouble)
    val a = base.toDF("v")
    val shifted = base.map(_ + 50.0).toDF("v")
    val hit = graft.api.Ops.msprt(a, shifted, col("v"), tau2 = 100.0)
      .collect().head
    assert(hit.getAs[Double]("ln_lambda") > 2.995732273553991 &&
      hit.getAs[Boolean]("reject"),
      s"a 50-unit shift on sd~11 data must cross the alpha=0.05 boundary, " +
        s"ln_lambda=${hit.getAs[Double]("ln_lambda")}")
    assert(hit.getAs[Double]("ln_p") == -hit.getAs[Double]("ln_lambda"),
      "with positive evidence ln_p = -ln_lambda")
    // identical samples: delta = 0, ln_lambda = half the (negative)
    // shrink term -> no rejection, p stays 1 (ln_p exactly 0.0)
    val nul = graft.api.Ops.msprt(a, a, col("v"), tau2 = 100.0).collect().head
    assert(!nul.getAs[Boolean]("reject") && nul.getAs[Double]("ln_lambda") < 0.0)
    assert(nul.getAs[Double]("ln_p") == 0.0 &&
      (1.0 / nul.getAs[Double]("ln_p")) > 0.0,  // would be -Inf on -0.0
      "no-evidence ln_p must be +0.0, never IEEE -0.0")
    // degenerate sides report counts with null statistics
    val one = Seq(5.0).toDF("v")
    val deg = graft.api.Ops.msprt(one, a, col("v"), tau2 = 100.0).collect().head
    assert(deg.getAs[Long]("n_a") == 1L && deg.isNullAt(deg.fieldIndex("ln_lambda")))
    // by-group ≡ whole-frame per slice (the q188 defining identity)
    val ga = base.map(v => ("s1", v)).toDF("g", "v")
      .unionByName(base.map(v => ("s2", v * 2)).toDF("g", "v"))
    val gb = base.map(v => ("s1", v + 50.0)).toDF("g", "v")
      .unionByName(base.map(v => ("s2", v * 2)).toDF("g", "v"))
    val keyed = graft.api.Ops.msprtByGroup(ga, gb, "g", col("v"), tau2 = 100.0)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    for (s <- Seq("s1", "s2")) {
      val whole = graft.api.Ops.msprt(
        ga.filter(col("g") === s), gb.filter(col("g") === s), col("v"),
        tau2 = 100.0).collect().head.toSeq
      assert(keyed(s) == whole, s"segment $s keyed ≡ whole-frame slice")
    }
    // one-sided segment reports with the absent side's count 0
    val extra = graft.api.Ops.msprtByGroup(
      ga.unionByName(Seq(("only_a", 1.0), ("only_a", 2.0)).toDF("g", "v")),
      gb, "g", col("v"), tau2 = 100.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(extra("only_a").getAs[Long]("n_b") == 0L &&
      extra("only_a").isNullAt(extra("only_a").fieldIndex("ln_lambda")))
  }

  test("r15 hitsScores: hand-checked hub/authority separation, iters=0 uniform, floor-exact under repartitioning, setup guards") {
    import spark.implicits._
    // a->c, b->c, c->a: c is the authority (two good hubs point at
    // it), a and b are the hubs; scale 300 over 3 nodes starts 100
    val e = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = graft.api.Ops.hitsScores(e, "src", "dst", iters = 1, scale = 300L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // auth pass: raw(c)=hub(a)+hub(b)=200, raw(a)=hub(c)=100, t=300
    //   -> auth = (a 100, b 0, c 200)
    // hub pass: raw(a)=auth(c)=200, raw(b)=auth(c)=200, raw(c)=auth(a)=100,
    //   t=500 -> hub = (a 120, b 120, c 60)
    assert(got(1L) == (120L, 100L) && got(2L) == (120L, 0L) &&
      got(3L) == (60L, 200L), s"hand-checked HITS iteration: $got")
    // iters = 0: the uniform start
    val u = graft.api.Ops.hitsScores(e, "src", "dst", iters = 0, scale = 300L)
      .collect()
    assert(u.forall(r => r.getLong(1) == 100L && r.getLong(2) == 100L))
    // bit-identical under repartitioning (integer floors everywhere)
    val rep = graft.api.Ops.hitsScores(e.repartition(7), "src", "dst",
      iters = 2, scale = 300L).collect().map(_.toSeq).toSet
    assert(rep == graft.api.Ops.hitsScores(e, "src", "dst", iters = 2,
      scale = 300L).collect().map(_.toSeq).toSet)
    // setup guards fail loudly
    intercept[IllegalArgumentException] {
      graft.api.Ops.hitsScores(e.limit(0), "src", "dst")
    }
    intercept[IllegalArgumentException] {
      graft.api.Ops.hitsScores(e, "src", "dst", scale = 2L)
    }
  }

  test("r15 postStratifiedZ: hand-checked pooled-weight estimate, one-sided strata excluded and counted, degenerate strata null the variance") {
    import spark.implicits._
    // X: a (1,3) mean 2 var 2 | b (5,7) mean 6 var 2
    // Y: a (10,20) mean 15 var 50 | b (30,40) mean 35 var 50
    // pooled weights 4/8 each -> mean_a 8.5, mean_b 20.5, diff 12,
    // va = vb = .25*2/2 + .25*50/2 = 6.5, se = sqrt(13), z = 12/se
    val a = Seq(("X", 1.0), ("X", 3.0), ("Y", 10.0), ("Y", 20.0)).toDF("s", "v")
    val b = Seq(("X", 5.0), ("X", 7.0), ("Y", 30.0), ("Y", 40.0)).toDF("s", "v")
    val r = graft.api.Ops.postStratifiedZ(a, b, "s", col("v")).collect().head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Double]("mean_a_post") == 8.5 &&
      r.getAs[Double]("mean_b_post") == 20.5 &&
      r.getAs[Double]("diff") == 12.0)
    assert(r.getAs[Double]("se") == 3.605551 &&
      r.getAs[Double]("z") == 3.328201, s"se/z: $r")
    // a stratum present only in one arm is EXCLUDED and counted
    val a2 = a.unionByName(Seq(("Z", 99.0)).toDF("s", "v"))
    val r2 = graft.api.Ops.postStratifiedZ(a2, b, "s", col("v")).collect().head
    assert(r2.getAs[Long]("strata_a_only") == 1L &&
      r2.getAs[Long]("n_a") == 4L,
      "the a-only stratum must not enter the estimator")
    assert(r2.getAs[Double]("mean_a_post") == 8.5, "estimate unchanged")
    // a common stratum with n < 2 on one side nulls se/z, not means
    val a3 = a.unionByName(Seq(("W", 1.0)).toDF("s", "v"))
    val b3 = b.unionByName(Seq(("W", 2.0), ("W", 4.0)).toDF("s", "v"))
    val r3 = graft.api.Ops.postStratifiedZ(a3, b3, "s", col("v")).collect().head
    assert(r3.isNullAt(r3.fieldIndex("se")) && r3.isNullAt(r3.fieldIndex("z")))
    assert(!r3.isNullAt(r3.fieldIndex("mean_a_post")))
    // partitioning invariance (decimal moments + decimal term sums)
    assert(graft.api.Ops.postStratifiedZ(a.repartition(13), b.repartition(5),
      "s", col("v")).collect().head.toSeq == r.toSeq)
  }

  test("r15 anovaF / anovaFByGroup: hand-checked F and eta-squared, identical groups read 0, degeneracies null, keyed ≡ whole-frame per slice") {
    import spark.implicits._
    // g1 (1,2,3), g2 (4,5,6): SSb = 13.5, SSw = 4, F = 13.5,
    // eta² = 13.5/17.5
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 4.0), ("g2", 5.0), ("g2", 6.0)).toDF("g", "v")
    val r = graft.api.Ops.anovaF(df, "g", col("v")).collect().head
    assert(r.getAs[Long]("n_total") == 6L && r.getAs[Long]("k_groups") == 2L)
    assert(r.getAs[Long]("ss_between") == 14L &&  // round-0 of 13.5, HALF_UP
      r.getAs[Long]("ss_within") == 4L)
    assert(r.getAs[Double]("f") == 13.5 &&
      r.getAs[Double]("eta_sq") == 0.771429, s"F/eta: $r")
    // identical group distributions: SSb exactly 0, F exactly 0
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    assert(graft.api.Ops.anovaF(same, "g", col("v"))
      .collect().head.getAs[Double]("f") == 0.0)
    // one group -> null F; all-constant values -> zero within -> null F
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(graft.api.Ops.anovaF(one, "g", col("v"))
      .collect().head.isNullAt(4))
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    assert(graft.api.Ops.anovaF(const, "g", col("v"))
      .collect().head.isNullAt(4))
    // keyed ≡ whole-frame per slice (the q177 defining identity)
    val seg = df.withColumn("s", lit("s1"))
      .unionByName(df.withColumn("v", col("v") * 2).withColumn("s", lit("s2")))
    val keyed = graft.api.Ops.anovaFByGroup(seg, "s", "g", col("v"))
      .collect().map(x => x.getString(0) -> x.toSeq.drop(1)).toMap
    for (s <- Seq("s1", "s2")) {
      val whole = graft.api.Ops.anovaF(seg.filter(col("s") === s), "g", col("v"))
        .collect().head.toSeq
      assert(keyed(s) == whole, s"segment $s keyed ≡ whole-frame slice")
    }
    // order-free term sums: identical under repartitioning
    assert(graft.api.Ops.anovaF(df.repartition(13), "g", col("v"))
      .collect().head.toSeq == r.toSeq)
  }

  test("r15 brownForsythe: equal spreads read F 0, a wide group flags, lower-median selection exact, coarse-group gate fires") {
    import spark.implicits._
    // identical deviation profiles around different medians: F = 0
    val eq = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    val r0 = graft.api.Ops.brownForsythe(eq, "g", col("v")).collect().head
    assert(r0.getAs[Double]("f") == 0.0,
      s"equal spreads must read F exactly 0: $r0")
    // one wide group: deviations (50,0,50) vs (1,0,1) — large F
    val neq = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 0.0), ("b", 50.0), ("b", 100.0)).toDF("g", "v")
    // devs a = (1,0,1), devs b = (50,0,50): SSb = 1600.666667,
    // SSw = 1667.333333, F = 1600.67/(1667.33/4) = 3.840064
    val r1 = graft.api.Ops.brownForsythe(neq, "g", col("v")).collect().head
    assert(r1.getAs[Double]("f") == 3.840064, s"spread gap must flag: $r1")
    // even-n group takes the LOWER median: (1,2,3,4) -> med 2,
    // deviations (1,0,1,2) -> within-SS for that group = 2.75... the
    // selection itself is what we pin: group b constant at its median
    val even = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val r2 = graft.api.Ops.brownForsythe(even, "g", col("v")).collect().head
    // devs a = (1,0,1,2) mean 1 -> SSw_a = 2; devs b = (0,0) -> SSw_b = 0
    assert(r2.getAs[Long]("ss_within") == 2L,
      s"lower-median deviations must be exact: $r2")
    // the winsorize-family coarse-group gate fires on a huge group
    intercept[Throwable] {
      graft.api.Ops.brownForsythe(eq, "g", col("v"),
        maxExactGroupRows = 2L).collect()
    }
    assert(graft.api.Ops.brownForsythe(eq, "g", col("v"),
      allowCoarseGroups = true, maxExactGroupRows = 2L)
      .collect().head.getAs[Double]("f") == 0.0,
      "acknowledged run ≡ default run")
  }

  test("r15 pairwiseWelch: every pair ≡ the two-sample welchT, m_comparisons counts the pairs, degenerate pairs null") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 6.0), ("c", 10.0), ("c", 20.0), ("c", 30.0))
      .toDF("g", "v")
    val got = graft.api.Ops.pairwiseWelch(df, "g", col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 3 &&
      got.values.forall(_.getAs[Long]("m_comparisons") == 3L))
    // the defining identity: each pair row IS welchT of the slices
    for (Seq(x, y) <- Seq("a", "b", "c").combinations(2)) {
      val w = graft.api.Ops.welchT(
        df.filter(col("g") === x), df.filter(col("g") === y), col("v"))
        .collect().head
      val p = got((x, y))
      assert(p.getAs[Long]("n_a") == w.getAs[Long]("n_a") &&
        p.getAs[Double]("mean_a") == w.getAs[Double]("mean_a") &&
        p.getAs[Double]("mean_b") == w.getAs[Double]("mean_b") &&
        p.getAs[Double]("t") == w.getAs[Double]("t") &&
        p.getAs[Double]("df") == w.getAs[Double]("df"),
        s"pair ($x, $y) must equal welchT: $p vs $w")
    }
    // a single-row group nulls its pairs' t with counts reporting
    val deg = graft.api.Ops.pairwiseWelch(
      df.unionByName(Seq(("d", 9.0)).toDF("g", "v")), "g", col("v"))
      .collect().filter(_.getString(1) == "d")
    assert(deg.nonEmpty && deg.forall(r => r.isNullAt(r.fieldIndex("t")) &&
      r.getAs[Long]("n_b") == 1L))
  }

  test("r15 corrMatrix: exact ±1/0 correlations from one scan, constant columns null, listwise-complete row drop") {
    import spark.implicits._
    val df = Seq((1.0, 3.0, 1.0, 5.0), (2.0, 6.0, 0.0, 5.0),
      (3.0, 9.0, 1.0, 5.0)).toDF("x", "y2", "z", "w")
    val got = graft.api.Ops.corrMatrix(df, Seq("x", "y2", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 6 && got.values.forall(_.getAs[Long]("n") == 3L))
    assert(got(("x", "y2")).getAs[Double]("r") == 1.0, "y2 = 3x reads exactly 1")
    assert(got(("x", "z")).getAs[Double]("r") == 0.0, "cov(x, z) is exactly 0")
    assert(got(("x", "w")).isNullAt(3) && got(("z", "w")).isNullAt(3),
      "zero-variance column nulls its pairs")
    // a null in ANY listed column drops the row for EVERY pair
    val withNull = df.unionByName(
      Seq((4.0, 12.0, 1.0, Double.NaN)).toDF("x", "y2", "z", "w")
        .withColumn("w", when(lit(false), col("w"))))
    val n2 = graft.api.Ops.corrMatrix(withNull, Seq("x", "y2", "z", "w"))
      .collect()
    assert(n2.forall(_.getAs[Long]("n") == 3L), "listwise-complete drop")
    // guards
    intercept[IllegalArgumentException] {
      graft.api.Ops.corrMatrix(df, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      graft.api.Ops.corrMatrix(df, Seq("x", "x"))
    }
  }

  test("r15 annRecallReport: per-query overlap arithmetic, silent-miss queries surface with recall 0, truthless queries null") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L),
      (3L, 30L)).toDF("q", "i")
    // q1 hits 2 of 3; q2 hits none; q3 the ANN returns NOTHING for
    // (the silent miss an inner join would hide); q4 has approx rows
    // but no exact truth; the duplicate (1,10) must collapse
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 12L), (1L, 99L), (2L, 77L),
      (4L, 40L)).toDF("q", "i")
    val got = graft.api.Ops.annRecallReport(exact, approx, "q", "i")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_exact") == 3L &&
      got(1L).getAs[Long]("n_approx") == 3L &&
      got(1L).getAs[Long]("n_overlap") == 2L &&
      got(1L).getAs[Double]("recall") == 0.666667)
    assert(got(2L).getAs[Long]("n_overlap") == 0L &&
      got(2L).getAs[Double]("recall") == 0.0)
    assert(got(3L).getAs[Long]("n_approx") == 0L &&
      got(3L).getAs[Double]("recall") == 0.0,
      "a query the ANN path dropped entirely must report, not vanish")
    assert(got(4L).getAs[Long]("n_exact") == 0L &&
      got(4L).isNullAt(got(4L).fieldIndex("recall")))
    // identical inputs read recall 1.0 on every query
    val perfect = graft.api.Ops.annRecallReport(exact, exact, "q", "i").collect()
    assert(perfect.forall(_.getAs[Double]("recall") == 1.0))
  }

  test("r15 anovaFromMoments / pairwiseWelchFromMoments: the artifact serves both k-arm tests bit-for-bit") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 6.0), ("c", 10.0), ("c", 20.0), ("c", 30.0))
      .toDF("g", "v")
    val m = graft.api.Ops.prepareMoments(df, "g", col("v"), col("v"))
    assert(graft.api.Ops.anovaFromMoments(m).collect().map(_.toSeq).toSeq ==
      graft.api.Ops.anovaF(df, "g", col("v")).collect().map(_.toSeq).toSeq,
      "artifact-served ANOVA ≡ row-input ANOVA")
    assert(graft.api.Ops.pairwiseWelchFromMoments(m)
        .orderBy("g_a", "g_b").collect().map(_.toSeq).toSeq ==
      graft.api.Ops.pairwiseWelch(df, "g", col("v"))
        .orderBy("g_a", "g_b").collect().map(_.toSeq).toSeq,
      "artifact-served post-hoc ≡ row-input post-hoc")
  }

  test("r15 msprtFromMoments: serves bit-for-bit the row-input msprt; absent arms report n=0 with null statistics") {
    import spark.implicits._
    val base = (1 to 120).map(i => (i % 30 + 5).toDouble)
    val df = base.map(v => ("a", v)).toDF("arm", "v")
      .unionByName(base.map(v => ("b", v + 40.0)).toDF("arm", "v"))
    val m = graft.api.Ops.prepareMoments(df, "arm", col("v"), col("v"))
    val viaArtifact = graft.api.Ops.msprtFromMoments(m, "a", "b", tau2 = 100.0)
      .collect().map(_.toSeq).toSeq
    val direct = graft.api.Ops.msprt(
      df.filter(col("arm") === "a").select("v"),
      df.filter(col("arm") === "b").select("v"),
      col("v"), tau2 = 100.0).collect().map(_.toSeq).toSeq
    assert(viaArtifact == direct,
      "the artifact-served test must equal the row-input test bit-for-bit")
    // an arm the artifact has never seen: n 0, statistics null
    val absent = graft.api.Ops.msprtFromMoments(m, "a", "zzz", tau2 = 100.0)
      .collect().head
    assert(absent.getAs[Long]("n_b") == 0L &&
      absent.isNullAt(absent.fieldIndex("ln_lambda")) &&
      absent.isNullAt(absent.fieldIndex("mean_b")))
  }

  test("r15 targetEncodeOOF: hand-checked m-estimate, fold's own rows never leak, single-fold and m=0 degeneracies") {
    import spark.implicits._
    // cat A: fold 0 -> values 10, 20; fold 1 -> 30. cat B: fold 0 -> 100.
    val df = Seq(("A", 0L, 10.0), ("A", 0L, 20.0), ("A", 1L, 30.0),
      ("B", 0L, 100.0)).toDF("c", "f", "v")
    val enc = df.filter(lit(true))
    import graft.api.Ops._
    val got = enc.targetEncodeOOF("c", col("v"), col("f"), m = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // overall: n=4, s=160. fold 0: n=3, s=130; fold 1: n=1, s=30.
    // (A, 0): oof rows = A\fold0 = {30} -> n_oof 1, s_oof 30;
    //         prior excl. fold 0 = 30/1 = 30; enc = (30+2*30)/(1+2) = 30
    val a0 = got(("A", 0L))
    assert(a0.getAs[Long]("n_oof") == 1L)
    assert(a0.getAs[Double]("prior_oof") == 30.0 && a0.getAs[Double]("enc") == 30.0)
    // (A, 1): oof = {10, 20}; prior excl. fold 1 = 130/3;
    //         enc = (30 + 2*(130/3)) / (2+2)
    val a1 = got(("A", 1L))
    val prior1 = 130.0 / 3.0
    val expA1 = BigDecimal((30.0 + 2.0 * prior1) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a1.getAs[Double]("enc") == expA1,
      s"hand-checked (A,1) encoding: got ${a1.getAs[Double]("enc")}, want $expA1")
    // (B, 0): B appears ONLY in fold 0 -> n_oof 0 -> enc = the prior
    // (the m-estimate design: no category evidence, all prior)
    val b0 = got(("B", 0L))
    assert(b0.getAs[Long]("n_oof") == 0L &&
      b0.getAs[Double]("enc") == b0.getAs[Double]("prior_oof"))
    // m = 0 with n_oof = 0: no information -> null enc, observable
    val m0 = enc.targetEncodeOOF("c", col("v"), col("f"), m = 0.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(m0(("B", 0L)).isNullAt(m0(("B", 0L)).fieldIndex("enc")))
    assert(!m0(("A", 0L)).isNullAt(m0(("A", 0L)).fieldIndex("enc")))
    // single fold: nothing is out-of-fold -> null prior and enc
    val single = Seq(("A", 0L, 10.0), ("B", 0L, 20.0)).toDF("c", "f", "v")
      .targetEncodeOOF("c", col("v"), col("f"), m = 2.0).collect()
    assert(single.forall(r => r.isNullAt(r.fieldIndex("prior_oof")) &&
      r.isNullAt(r.fieldIndex("enc"))))
    // partitioning invariance (exact decimal sums -> same encodings)
    val rep = enc.repartition(13).targetEncodeOOF("c", col("v"), col("f"), m = 2.0)
      .collect().map(r => r.toSeq).toSet
    assert(rep == enc.targetEncodeOOF("c", col("v"), col("f"), m = 2.0)
      .collect().map(r => r.toSeq).toSet)
  }

  test("r15 collapseRareCategories: integer share floor, exact-boundary keep, share_bp floor division") {
    import spark.implicits._
    import graft.api.Ops._
    // counts: a=50, b=30, c=15, d=5 over N=100
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(15)("c") ++
      Seq.fill(5)("d")).toDF("cat")
    val got = df.collapseRareCategories("cat", minShareBp = 1500L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Boolean]("kept") && got("b").getAs[Boolean]("kept"))
    // c sits EXACTLY at the floor (15% == 1500 bp): ties keep
    assert(got("c").getAs[Boolean]("kept"),
      "a category exactly at the share floor is kept")
    assert(!got("d").getAs[Boolean]("kept") &&
      got("d").getAs[String]("cat_out") == "__other__")
    assert(got("a").getAs[Long]("share_bp") == 5000L &&
      got("d").getAs[Long]("share_bp") == 500L)
    // floor, not rounding: 1/3 of 100 rows -> 3333 bp
    val thirds = (Seq.fill(33)("x") ++ Seq.fill(67)("y")).toDF("cat")
      .collapseRareCategories("cat", 0L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("share_bp")).toMap
    assert(thirds("x") == 3300L && thirds("y") == 6700L)
  }

  test("r15 cramersV: perfect association reads 1, independence reads 0, degenerate table nulls, chi2 matches the q142 machinery") {
    import spark.implicits._
    import graft.api.Ops._
    // perfect 2x2 association: a determines b
    val perf = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))).toDF("a", "b")
    val vPerf = perf.cramersV("a", "b").collect().head
    assert(vPerf.getAs[Double]("v") == 1.0 && vPerf.getAs[Long]("dof") == 1L)
    // exact independence: every cell at its expectation -> chi2 0, v 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val vInd = ind.cramersV("a", "b").collect().head
    assert(vInd.getAs[Long]("chi2_micros") == 0L && vInd.getAs[Double]("v") == 0.0)
    // single-level side: no association is definable -> null v, dof 0
    val deg = Seq(("x", "p"), ("x", "q")).toDF("a", "b").cramersV("a", "b")
      .collect().head
    assert(deg.isNullAt(deg.fieldIndex("v")) && deg.getAs[Long]("dof") == 0L)
    // chi2 agrees with chiSquareIndependence (same machinery, one row)
    val chiCells = t.orders.chiSquareIndependence("o_orderstatus", "o_orderpriority")
      .select("chi2_micros").distinct().collect()
    val vOrders = t.orders.cramersV("o_orderstatus", "o_orderpriority")
      .collect().head
    assert(chiCells.length == 1 &&
      chiCells.head.getLong(0) == vOrders.getAs[Long]("chi2_micros"))
  }

  test("r15 srmCheckByGroup: per-segment ≡ whole-frame srmCheck per slice; declared-absent and undeclared arms handled per segment") {
    import spark.implicits._
    val w = Seq("x" -> 0.5, "y" -> 0.5)
    // d1: balanced; d2: x-heavy plus an UNDECLARED arm; arm y is
    // entirely ABSENT from d2 (its expectation must still count there)
    val df = (Seq.fill(10)(("d1", "x")) ++ Seq.fill(10)(("d1", "y")) ++
      Seq.fill(18)(("d2", "x")) ++ Seq.fill(2)(("d2", "w")))
      .toDF("seg", "arm")
    val keyed = graft.api.Ops.srmCheckByGroup(df, "seg", col("arm"), w)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    for (seg <- Seq("d1", "d2")) {
      val whole = graft.api.Ops.srmCheck(
        df.filter(col("seg") === seg), col("arm"), w)
        .collect().map(r => r.getString(0) -> r.toSeq).toMap
      whole.foreach { case (a, row) =>
        assert(keyed((seg, a)).toSeq.drop(1) == row,
          s"segment $seg arm $a keyed ≡ whole-frame slice") }
    }
    // d2: y absent but declared -> n_obs 0 with its full expectation;
    // w undeclared -> reports with null weight, out of the chi2
    assert(keyed(("d2", "y")).getAs[Long]("n_obs") == 0L &&
      keyed(("d2", "y")).getAs[Double]("expected") == 9.0)
    assert(keyed(("d2", "w")).isNullAt(3) &&
      keyed(("d2", "w")).isNullAt(keyed(("d2", "w")).fieldIndex("contrib")))
    // d1 is perfectly balanced -> chi2 exactly 0; d2 is not
    assert(keyed(("d1", "x")).getAs[Long]("chi2_micros") == 0L)
    assert(keyed(("d2", "x")).getAs[Long]("chi2_micros") > 0L)
  }

  test("r15 calibrationBinsByGroup: per-segment ≡ whole-frame calibrationBins per slice; null segments drop") {
    import spark.implicits._
    import graft.api.Ops._
    val df = Seq(("s1", 250000L, 1L), ("s1", 250000L, 0L), ("s1", 900000L, 1L),
      ("s2", 100000L, 0L), ("s2", 900000L, 1L), ("s2", 900000L, 0L))
      .toDF("g", "s", "y")
    val keyed = df.calibrationBinsByGroup("g", col("s"), col("y"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(1)).toMap
    for (seg <- Seq("s1", "s2")) {
      val whole = df.filter(col("g") === seg)
        .calibrationBins(col("s"), col("y"), 10)
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(whole.keySet == keyed.keySet.collect { case (g, b) if g == seg => b },
        s"segment $seg bins")
      whole.foreach { case (b, row) =>
        assert(keyed((seg, b)) == row, s"segment $seg bin $b ≡ whole-frame slice") }
    }
    // a null segment drops (keys filter), not crashes
    val withNull = df.unionByName(Seq((null.asInstanceOf[String], 1L, 1L))
      .toDF("g", "s", "y"))
    assert(withNull.calibrationBinsByGroup("g", col("s"), col("y"), 10)
      .collect().length == keyed.size)
  }

  test("r15 calibrationBins: exact binning incl. the top edge, perfect calibration gaps 0, Brier hand-check, range guard") {
    import spark.implicits._
    import graft.api.Ops._
    // scores 0, 250k, 999999, 1e6 -> bins 0, 2, 9, 9 (top edge folds in)
    val df = Seq((0L, 0L), (250000L, 0L), (999999L, 1L), (1000000L, 1L))
      .toDF("s", "y")
    val bins = df.calibrationBins(col("s"), col("y"), 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(bins.keySet == Set(0L, 2L, 9L))
    assert(bins(9L).getAs[Long]("n") == 2L && bins(9L).getAs[Long]("n_pos") == 2L)
    // Brier for bin 0: score 0, label 0 -> 0; bin 2: (0.25-0)^2 = 0.0625
    assert(bins(0L).getAs[Double]("brier") == 0.0)
    assert(bins(2L).getAs[Double]("brier") == 0.0625)
    // bin 9: ((999999-1e6)^2 + 0)/2 / 1e12 rounds to 0 at 6
    assert(bins(9L).getAs[Double]("brier") == 0.0)
    // perfectly calibrated data: in every bin pos_rate == mean score
    // (200 rows at score .25 with exactly 50 positives, etc.)
    val calib = ((1 to 200).map(i => (250000L, if (i <= 50) 1L else 0L)) ++
      (1 to 100).map(i => (750000L, if (i <= 75) 1L else 0L))).toDF("s", "y")
    val g = calib.calibrationBins(col("s"), col("y"), 10).collect()
    assert(g.forall(_.getAs[Double]("gap") == 0.0),
      "exactly calibrated bins must gap 0")
    // out-of-range scores and non-binary labels fail loudly
    intercept[Throwable] {
      Seq((2000000L, 0L)).toDF("s", "y")
        .calibrationBins(col("s"), col("y"), 10).collect()
    }
    intercept[Throwable] {
      Seq((10L, 2L)).toDF("s", "y")
        .calibrationBins(col("s"), col("y"), 10).collect()
    }
  }
}

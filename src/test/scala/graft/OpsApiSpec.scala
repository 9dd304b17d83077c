package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops._
import graft.operators.{Dedup, JsonOps, Temporal}
import graft.sources.Tables

/** The public fluent API must reproduce the oracle-checked operator
  * results (asofJoin ≡ q21, sessionized ≡ q22 boundaries, rangeJoin ≡
  * q39) and the sketch aggregate must be exact below capacity.
  */
class OpsApiSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  test("asofJoin API reproduces q21") {
    val ev = t.events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val api = purchases
      .asofJoin(clicks, key = "user_id", leftTime = "ts", rightTime = "ts",
        carry = Seq("click_id", "click_ts", "click_value"))
      .select("event_id", "user_id", "ts", "click_id", "click_ts", "click_value")
    val q21 = Temporal.q21(t)
    assert(api.count() == q21.count())
    assert(api.except(q21).isEmpty && q21.except(api).isEmpty,
      "asofJoin API differs from q21")
  }

  test("asofJoin direction/tolerance (merge_asof parity) against brute force") {
    import spark.implicits._
    // seeded random multi-key corpus WITH genuine nulls in the carry
    // column — nulls must carry from the MATCHED row, never an older
    // one (r10 review: the per-column ignoreNulls fill mixed rows)
    val rnd = new scala.util.Random(42)
    val lRows = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    // right times deduped PER KEY: the match among equal-time right
    // rows is undefined in both engines, so the fixture avoids ties
    val rRows = (1 to 120).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong,
        if (rnd.nextInt(4) == 0) null else s"v$i")
    }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = lRows.toDF("k", "us", "lid")
      .select(col("k"), col("us"), col("lid"), expr("timestamp_micros(us)").as("lt"))
    val r = rRows.toDF("k", "rus", "v")
      .select(col("k"), col("rus"), expr("timestamp_micros(rus)").as("rt"), col("v"))
    def brute(direction: String, tol: Option[Long]): Map[Long, Option[String]] =
      lRows.map { case (k, lu, lid) =>
        val cand = rRows.filter(_._1 == k).filter { case (_, ru, _) =>
          if (direction == "backward") ru <= lu else ru >= lu
        }
        val nearest =
          if (cand.isEmpty) None
          else Some(if (direction == "backward") cand.maxBy(_._2) else cand.minBy(_._2))
        val within = nearest.filter { case (_, ru, _) =>
          tol.forall(t => (if (direction == "backward") lu - ru else ru - lu) <= t)
        }
        lid -> within.map(_._3).flatMap(Option(_)) // matched row's value, null stays null
      }.toMap
    for (direction <- Seq("backward", "forward");
         tol <- Seq(None, Some(0L), Some(50L), Some(200L))) {
      val got = l.asofJoin(r, "k", "lt", "rt", Seq("v"), direction, tol)
        .collect().map(x => x.getLong(2) -> Option(x.getString(4))).toMap
      assert(got == brute(direction, tol), s"direction=$direction tol=$tol")
    }
    // pinpoint fixture for the matched-row-null case: right (5, "a"),
    // (10, null); left t=12 backward tol=3 matches t=10 → null carry
    // (the mixed-column fill would emit the 7µs-stale "a")
    val lf = Seq((1L, 12L)).toDF("k", "us")
      .select(col("k"), expr("timestamp_micros(us)").as("lt"))
    val rf = Seq((1L, 5L, "a"), (1L, 10L, null)).toDF("k", "us", "v")
      .select(col("k"), expr("timestamp_micros(us)").as("rt"), col("v"))
    val pin = lf.asofJoin(rf, "k", "lt", "rt", Seq("v"), "backward", Some(3L)).collect()
    assert(pin.length == 1 && pin(0).isNullAt(2),
      s"the matched row's genuine null must carry: ${pin.mkString}")
    // tolerance 0 = equal-time matches only (pandas Timedelta(0))
    val rEq = Seq((1L, 5L, "a"), (1L, 10L, "b")).toDF("k", "us", "v")
      .select(col("k"), expr("timestamp_micros(us)").as("rt"), col("v"))
    def at(lu: Long): Array[org.apache.spark.sql.Row] =
      Seq((1L, lu)).toDF("k", "us")
        .select(col("k"), expr("timestamp_micros(us)").as("lt"))
        .asofJoin(rEq, "k", "lt", "rt", Seq("v"), "backward", Some(0L)).collect()
    assert(at(10L)(0).getString(2) == "b", "equal-time match passes tolerance 0")
    assert(at(12L)(0).isNullAt(2), "any gap fails tolerance 0")
    assert(intercept[IllegalArgumentException] {
      lf.asofJoin(rf, "k", "lt", "rt", Seq("v"), "sideways")
    }.getMessage.contains("backward"))
    assert(intercept[IllegalArgumentException] {
      lf.asofJoin(rf, "k", "lt", "rt", Seq("v"), toleranceUs = Some(-1L))
    }.getMessage.contains("non-negative"))
  }

  test("rangeJoin API reproduces the naive inequality join") {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val e = t.events.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("ts").as("e_ts"))
    val api = p.rangeJoin(e, "p_ts", "e_ts", 300000000L).select("p_id", "e_id")
    val naive = p.join(e,
      abs(expr("unix_micros(p_ts) - unix_micros(e_ts)")) <= 300000000L)
      .select("p_id", "e_id")
    assert(api.count() == naive.count())
    assert(api.except(naive).isEmpty && naive.except(api).isEmpty)
  }

  test("sessionized API agrees with q22 session boundaries") {
    val api = t.events.sessionized("user_id", "ts", lit(1800)) // 30 min in seconds
      .groupBy(col("user_id")).agg(max(col("session_id")).as("n_sessions"))
    val q22 = Temporal.q22(t)
      .groupBy(col("user_id")).agg(max(col("session_id")).as("n_sessions"))
    assert(api.except(q22).isEmpty && q22.except(api).isEmpty)
  }

  test("topkSketch is exact below capacity and matches q26 top tokens") {
    graft.functions.GraftFunctions.register(spark)
    val tokens = t.documents.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val sketch = tokens.agg(topkSketch(col("token"), 10).as("top")).collect().head
      .getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    val exact = JsonOps.q26(t).collect().take(10).map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.toSeq == exact.toSeq, "sketch counts differ from exact top-k")
  }

  test("saltedCount equals plain groupBy count") {
    val salted = t.events.saltedCount("event_type", buckets = 8)
    val plain = t.events.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    // the seeded-hash salt (saltBy a unique column) is deterministic
    // AND still spreads the hot key: same result, partitioning-free
    // intermediates (VERDICT r9 nit)
    val seeded = t.events.saltedCount("event_type", buckets = 8,
      saltBy = Some(col("event_id")))
    assert(seeded.except(plain).isEmpty && plain.except(seeded).isEmpty)
  }

  test("saltedCount: correct on a deliberately hot key, two-stage plan") {
    import spark.implicits._
    // 100k rows of one hot key + 100 singleton cold keys — the
    // power-law shape the salt exists for
    val hot = spark.range(100000).select(lit("hot").as("k"))
      .unionByName(spark.range(100).select(concat(lit("cold"), $"id").as("k")))
    val out = hot.saltedCount("k", buckets = 16)
    assert(out.filter($"k" === "hot").head().getLong(1) == 100000L)
    assert(out.count() == 101)
    // the plan must carry BOTH aggregations: the (key, salt) pre-agg
    // that spreads the hot key over 16 reducers, then the final
    // combine — collapsing them would re-create the hot reducer
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.length == 2, s"expected 2-stage salted aggregate, got ${aggs.length}")
    assert(aggs.exists(_.groupingExpressions.length == 2),
      "pre-aggregate must group by (key, salt)")
  }

  test("nearDupPairs: hot-block split leaves the pair set identical") {
    import spark.implicits._
    // every doc opens with the same 3 tokens, so all 60 share the
    // lexicographic min shingle "aaa aaa aaa" → ONE hot block; cap 8
    // forces ceil(60/8)=8 sub-blocks and the full triangle of cells
    val docs = (1L to 60L).map(i => (i, s"aaa aaa aaa u$i t$i w$i m$i s$i"))
      .toDF("doc_id", "text")
    def pairs(cap: Int): Set[(Long, Long, Double)] =
      docs.nearDupPairs("doc_id", "text", threshold = 0.0, blockCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mono = pairs(1000000) // single monolithic block: the reference shape
    val split = pairs(8)
    assert(mono.size == 60 * 59 / 2, s"expected all within-block pairs, got ${mono.size}")
    assert(split == mono, "sub-block triangle must not add, drop or change pairs")
  }

  test("nearDupPairs: random corpora agree across block caps (triangle property)") {
    import spark.implicits._
    // tiny vocabulary → many shared min-shingles → multi-doc blocks of
    // assorted sizes; every cap (incl. the degenerate cap=1) must
    // reproduce the monolithic pair set exactly
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (1L to 80L).map { i =>
      val len = 4 + rnd.nextInt(9)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    def pairs(cap: Int): Set[(Long, Long, Double)] =
      docs.nearDupPairs("doc_id", "text", threshold = 0.3, blockCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mono = pairs(1000000)
    assert(mono.nonEmpty, "random corpus should produce near-dup pairs at 0.3")
    for (cap <- Seq(1, 2, 7, 16))
      assert(pairs(cap) == mono, s"cap=$cap diverges from the monolithic join")
  }

  test("dedupExact partitions the corpus: dup_counts sum to row count") {
    val docs = t.documents.select(col("doc_id"), col("text"))
    val out = docs.dedupExact("doc_id", "text")
    assert(out.agg(sum(col("dup_count"))).collect().head.getLong(0) == docs.count())
    assert(out.select("keep_id").distinct().count() == out.count())
  }

  test("minhashLshPairs with coarser banding still recovers exact near-dups") {
    val exact = Dedup.q32(t).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = t.documents.minhashLshPairs("doc_id", "text", 0.5, perms = 64, bands = 8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // 8 bands × 8 rows is a stricter banding than q33's 16×4 — recall
    // may drop but must stay useful for 0.5+ similarity
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall (exact=${exact.size}, lsh=${lsh.size})")
  }

  test("simhashNearDups recovers exact near-dups through hamming banding") {
    val exact = Dedup.q32(t).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = t.documents.simhashNearDups("doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.8, s"simhash recall $recall (exact=${exact.size}, sim=${sim.size})")
    // fingerprint banding must stay far from the quadratic pair space
    val n = t.documents.count()
    assert(sim.size < n * 10, s"candidate blowup: ${sim.size} pairs for $n docs")
  }

  test("dedupAgainstCatalog: drops catalog dups, keeps within-increment dups") {
    import spark.implicits._
    val catalog = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),        // exact dup of 1 → dropped
      (11L, "one two three four five six seven eight nine ten"),     // near dup of 2 → dropped
      (12L, "totally different content about spark engines here ok"),// novel → kept
      (13L, "totally different content about spark engines here ok") // dup of 12 (increment-internal) → KEPT
    ).toDF("doc_id", "text")
    val kept = incoming.dedupAgainstCatalog(catalog, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 13L),
      s"expected increment-internal dups kept, catalog dups dropped; got $kept")
    // all original columns survive
    val cols = incoming.dedupAgainstCatalog(catalog, "doc_id", "text", 0.5).columns.toSeq
    assert(cols == Seq("doc_id", "text"))
  }

  test("curate API composes the q55 stages and matches its survivor set") {
    import graft.operators.Pipeline
    val score = {
      val nChars = length(col("text")).cast("double")
      val toks = filter(split(col("text"), " "), x => x =!= "")
      val nPunct = length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double")
      val nStop = size(filter(toks, x => x.isin("the", "a", "of", "and"))).cast("double")
      round(lit(0.5) * least(nChars / lit(500.0), lit(1.0)) +
        lit(0.3) * (lit(1.0) - nPunct / nChars) +
        lit(0.2) * (nStop / size(toks).cast("double")), 6)
    }
    // full-rate curate == q55 before its sampling stage is impractical
    // to isolate, so compare doc_id sets at the same sample rates
    val api = t.documents
      .curate("doc_id", "text", score, minQuality = 0.5, samplePct = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val q55ids = Pipeline.q55(t).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(q55ids.subsetOf(api), "q55 (sampled) must be a subset of unsampled curate")
    assert(api.nonEmpty && q55ids.nonEmpty)
  }

  test("packSequences: deterministic under repartitioning, budget shrinks pack count") {
    val toks = t.documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    def packs(df: org.apache.spark.sql.DataFrame, budget: Long): Seq[(Long, Long, Long)] =
      df.packSequences("doc_id", col("n_tokens"), budgetTokens = budget, shards = 4)
        .select("doc_id", "shard", "pack_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // portable hash + per-shard ordering ⇒ identical on any layout
    assert(packs(toks.repartition(3), 1024) == packs(toks.repartition(11), 1024))
    val fine = packs(toks, 512).map(_._3).distinct.size
    val coarse = packs(toks, 4096).map(_._3).distinct.size
    assert(coarse <= fine, s"larger budget must not create more packs ($coarse vs $fine)")
  }

  test("contaminationPairs: planted verbatim dup overlaps fully, minShared filters") {
    val evalSet = t.documents.filter(col("doc_id") < 5)
      .select((col("doc_id") + 900000).as("eid"), col("text").as("etext"))
    val loose = t.documents.contaminationPairs(evalSet, "doc_id", "text", "eid", "etext",
      n = 8, minShared = 1L)
    val strict = t.documents.contaminationPairs(evalSet, "doc_id", "text", "eid", "etext",
      n = 8, minShared = 10L)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("train_id", "eval_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys(strict).subsetOf(keys(loose)))
    // each planted eval doc is verbatim its source doc: overlap_frac == 1.0
    val self = loose.filter(col("train_id") === col("eval_id") - 900000)
    assert(self.count() == 5)
    assert(self.collect().forall(_.getAs[Double]("overlap_frac") == 1.0))
  }

  test("reliable-checkpoint mode ≡ localCheckpoint across the fluent API") {
    // Mirrors the q46 two-mode spec (VERDICT r3 item #4): every
    // lineage-breaking fluent operator takes a checkpointDir and must
    // produce identical results in both modes — reliable checkpoints
    // are what a 100 TB cluster run needs to survive executor loss.
    val dir = java.nio.file.Files.createTempDirectory("graft_ck_api").toString
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(
      rows(t.documents.minhashLshPairs("doc_id", "text", 0.5)) ==
        rows(t.documents.minhashLshPairs("doc_id", "text", 0.5, checkpointDir = Some(dir))))
    val score = length(col("text")).cast("double") / lit(500.0)
    val local    = t.documents.curate("doc_id", "text", score, minQuality = 0.3)
    val reliable = t.documents.curate("doc_id", "text", score, minQuality = 0.3,
      checkpointDir = Some(dir))
    assert(rows(local) == rows(reliable) && rows(local).nonEmpty)
    import graft.operators.Vectors
    assert(
      Vectors.kmeansCentroids(t.embeddings, "vec_id", "embedding", k = 4, iters = 2)
        .collect().toSeq.map(_.toString) ==
      Vectors.kmeansCentroids(t.embeddings, "vec_id", "embedding", k = 4, iters = 2,
        checkpointDir = Some(dir)).collect().toSeq.map(_.toString))
  }

  test("embeddingNearDups: fewer sign bits → coarser blocks → superset of pairs") {
    graft.functions.GraftFunctions.register(spark)
    // per-table codes share a prefix (weights depend on (table, bit,
    // dim), not on signBits), so shorter codes merge blocks
    def pairs(bits: Int): Set[(Long, Long)] =
      t.embeddings.embeddingNearDups("vec_id", "embedding", threshold = 0.3, dim = 64, signBits = bits)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fine = pairs(8)
    val coarse = pairs(4)
    assert(coarse.nonEmpty, "threshold 0.3 should find some pairs")
    assert(fine.subsetOf(coarse),
      "every pair blocked together on 8 sign bits must also block together on 4")
  }

  test("semanticDedup: planted near-copies drop, originals keep, clusters come from the quantizer") {
    graft.functions.GraftFunctions.register(spark)
    val base = t.embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val planted = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("emb"), v => v + lit(0.005)).as("emb"))
    val centroids = t.embeddings.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"))
    val out = base.unionByName(planted)
      .semanticDedup("vec_id", "emb", centroids, "vec_id", "embedding",
        threshold = 0.95)
      .cache()
    val rows = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rows.size == 530, s"every input row must come back, got ${rows.size}")
    // each planted copy shares its original's cluster (a +0.005 shift
    // cannot flip an argmax at this data's centroid separation) and is
    // dropped as the higher id of a ≥0.95 pair
    for (i <- 0L until 30L) {
      assert(rows(i + 100000)._1 == rows(i)._1,
        s"planted copy of $i landed in cluster ${rows(i + 100000)._1}, original in ${rows(i)._1}")
      assert(!rows(i + 100000)._2, s"planted copy of $i must be dropped")
      assert(rows(i)._2, s"original $i must be kept (it is the lower id)")
    }
    // cluster ids are exactly the quantizer's ids
    val clusters = out.select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf((0L until 8L).toSet), s"unexpected clusters: $clusters")
    // raising the threshold past the planted similarity keeps everything
    val strict = base.unionByName(planted)
      .semanticDedup("vec_id", "emb", centroids, "vec_id", "embedding",
        threshold = 0.999999)
      .filter(!col("kept")).count()
    assert(strict == 0, "no pair reaches 0.999999 — nothing may drop")
  }

  test("charEntropy: zero for one symbol, ln k for uniform k, gibberish outside the text band") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),                       // degenerate: H = 0
      (2L, "abcdabcdabcdabcd"),               // uniform 4: H = ln 4
      (3L, "the cat sat on the warm mat near the door"),
      (4L, "aB3+/xQ9zK2%wM7#pL5@nV1$")).toDF("doc_id", "text")
    val out = docs.charEntropy("doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((8L, 1L, 0.0)), s"single-symbol entropy must be 0: ${out(1L)}")
    assert(out(2L)._3 == math.rint(math.log(4.0) * 1e4) / 1e4,
      s"uniform-4 entropy must be ln 4: ${out(2L)}")
    assert(out(2L)._2 == 4L)
    // english-like text sits in the natural band; uniform key-mash
    // scores ABOVE it (every char near-unique → H ≈ ln L)
    assert(out(3L)._3 > 1.7 && out(3L)._3 < 3.1, s"text band: ${out(3L)}")
    assert(out(4L)._3 > out(3L)._3, s"key-mash must out-entropy text: ${out(4L)} vs ${out(3L)}")
  }

  test("quantileBuckets: exact cumulative-rank buckets, ties share a bucket, counts conserve") {
    import spark.implicits._
    val df = Seq(1L, 1L, 1L, 2L, 3L, 4L).toDF("v")
    val out = df.quantileBuckets("v", buckets = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // before(1)=0 → bucket 0; before(2)=3, before(3)=4, before(4)=5 → bucket 1
    assert(out == Map(0L -> ((1L, 1L, 3L)), 1L -> ((2L, 4L, 3L))), s"got $out")
    // ties never split: 10 copies of one value land in ONE bucket even
    // with 5 requested
    val tied = (Seq.fill(10)(7L) ++ Seq(9L)).toDF("v").quantileBuckets("v", 5)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(tied == Map(0L -> 10L, 4L -> 1L), s"got $tied")
    // uniform 0..999 into deciles: equal counts, contiguous boundaries
    val uni = (0L until 1000L).toDF("v").quantileBuckets("v", 10)
      .collect().sortBy(_.getLong(0))
    assert(uni.length == 10 && uni.forall(_.getLong(3) == 100L))
    assert(uni.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      (0 until 10).map(i => (i * 100L, i * 100L + 99L)))
    // nulls are excluded, not ranked
    val withNulls = Seq(Some(1L), None, Some(2L)).toDF("v").quantileBuckets("v", 2)
      .agg(sum("n_rows")).collect()(0).getLong(0)
    assert(withNulls == 2L)
  }

  test("ngramCoverage: copied text scores 10000bp, novel text 0, a half-copy in between") {
    import spark.implicits._
    val refText = (1 to 40).map(i => s"ref$i").mkString(" ")
    val novel = (1 to 40).map(i => s"new$i").mkString(" ")
    val half = (1 to 20).map(i => s"ref$i").mkString(" ") + " " +
      (1 to 20).map(i => s"own$i").mkString(" ")
    val ref = Seq((100L, refText)).toDF("rid", "rtext")
    val docs = Seq((1L, refText), (2L, novel), (3L, half), (4L, "too short"))
      .toDF("doc_id", "text")
    val out = docs.ngramCoverage(ref, "doc_id", "text", "rtext", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!out.contains(4L), "docs below n tokens have no coverage row")
    assert(out(1L) == ((33L, 33L, 10000L)), s"full copy must cover 10000bp: ${out(1L)}")
    assert(out(2L)._2 == 0L && out(2L)._3 == 0L, s"novel text must cover 0bp: ${out(2L)}")
    // half doc: grams 1..13 (windows fully inside the ref prefix)
    // match, the rest straddle into own* tokens and miss
    assert(out(3L)._1 == 33L && out(3L)._2 == 13L,
      s"half-copy must match exactly the 13 all-ref windows: ${out(3L)}")
    assert(out(3L)._3 == 13L * 10000L / 33L, s"basis points off: ${out(3L)}")
  }

  test("dedupKeepBest keeps the highest-quality cluster member, not the lowest id") {
    import spark.implicits._
    // docs 1/2/3 are near-dups (one token differs); doc 3 has the
    // best quality — keep-best must choose it where min-id keeps 1.
    // doc 9 is unrelated (singleton, keeps itself).
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base + " alpha", 10L),
      (2L, base + " beta", 20L),
      (3L, base + " gamma", 30L),
      (9L, (1 to 40).map(i => s"z$i").mkString(" "), 5L)).toDF("doc_id", "text", "q")
    val out = docs.dedupKeepBest("doc_id", "text", col("q"), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1L, false)) && out(2L) == ((1L, false)),
      s"lower-quality cluster members must drop: $out")
    assert(out(3L) == ((1L, true)), s"the best member keeps, regardless of id: $out")
    assert(out(9L) == ((9L, true)), s"singletons keep themselves: $out")
    // deterministic tie-break: equal quality → lowest id survives
    val tied = Seq((5L, base + " x", 7L), (6L, base + " y", 7L)).toDF("doc_id", "text", "q")
      .dedupKeepBest("doc_id", "text", col("q"), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(tied == Map(5L -> true, 6L -> false), s"tie must break to the lower id: $tied")
  }

  test("containmentPairs finds a nested doc that LSH misses; guards honored") {
    import spark.implicits._
    val small = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val bigger = small + " " + (1 to 90).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (1L, small),              // fully contained in 2
      (2L, bigger),
      (3L, (1 to 40).map(i => s"gamma$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = docs.containmentPairs("doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(pairs.length == 1 && pairs(0)._1 == 1L && pairs(0)._2 == 2L,
      s"exactly the nested pair must surface: ${pairs.toSeq}")
    assert(pairs(0)._3 == 1.0, s"full nesting must score containment 1.0: ${pairs(0)}")
    assert(pairs(0)._4 < 0.25, s"the same pair's Jaccard is tiny: ${pairs(0)}")
    // ...which is exactly why the symmetric detectors cannot see it
    val lsh = docs.minhashLshPairs("doc_id", "text", threshold = 0.5).count()
    assert(lsh == 0, "Jaccard-based LSH must miss the nested pair at any sane threshold")
    // threshold guard: a 50%-overlap pair stays below 0.9
    val halfA = ((1 to 20).map(i => s"p$i") ++ (1 to 20).map(i => s"q$i")).mkString(" ")
    val halfB = ((1 to 20).map(i => s"p$i") ++ (1 to 20).map(i => s"r$i")).mkString(" ")
    val none = Seq((1L, halfA), (2L, halfB)).toDF("doc_id", "text")
      .containmentPairs("doc_id", "text", threshold = 0.9).count()
    assert(none == 0, "a 50% overlap must not pass a 0.9 containment threshold")
  }

  test("prepared vocab / gram index reproduce the inline forms on their own corpus") {
    val docs = t.documents.select(col("doc_id"), col("text"))
    // capVocabAgainst(self-census) ≡ capVocab
    val vocab = graft.api.Ops.prepareVocab(docs, "text", minCount = 500L)
    val against = docs.capVocabAgainst(vocab, "doc_id", "text")
    val inline = docs.capVocab("doc_id", "text", minCount = 500L)
    assert(against.except(inline).isEmpty && inline.except(against).isEmpty,
      "capVocabAgainst on the census corpus must equal capVocab")
    // ngramCoverageAgainst(prepared ref) ≡ ngramCoverage(ref)
    val ref = t.documents.filter(!col("source").isin("src0", "src1"))
    val idx = graft.api.Ops.prepareGramIndex(ref, "text", n = 8)
    val candidates = t.documents.filter(col("source").isin("src0", "src1"))
    val covAgainst = candidates.ngramCoverageAgainst(idx, "doc_id", "text")
    val covInline = candidates.ngramCoverage(ref, "doc_id", "text", "text", n = 8)
    assert(covAgainst.except(covInline).isEmpty && covInline.except(covAgainst).isEmpty,
      "ngramCoverageAgainst must equal the inline form")
  }

  test("capVocab: rare tokens become <unk> in place, frequent docs pass through untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat near the cat"),
      (3L, "the cat and the dog sat"),
      (4L, "a zyxwv the cat sat")).toDF("doc_id", "text")
    val out = docs.capVocab("doc_id", "text", minCount = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // census: the=7 cat=4 sat=4 dog=2 on=1 mat=1 near=1 and=1 a=1 zyxwv=1
    assert(out(1L) == ("the cat sat <unk> the <unk>", 2L))
    assert(out(2L) == ("the <unk> sat <unk> the cat", 2L))
    assert(out(3L) == ("the cat <unk> the <unk> sat", 2L))
    assert(out(4L) == ("<unk> <unk> the cat sat", 2L))
    // minCount 1 keeps everything: byte-identical normalized stream
    val all = docs.capVocab("doc_id", "text", minCount = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "the cat sat on the mat" && all.values.forall(!_.contains("<unk>")))
    // custom unk symbol
    val custom = docs.capVocab("doc_id", "text", minCount = 3L, unk = "¤")
      .collect().map(r => r.getString(1)).mkString(" ")
    assert(custom.contains("¤") && !custom.contains("<unk>"))
  }

  test("mixtureSample: binding class keeps all rows, mixture balances, absent class drops") {
    val parts = Seq("en" -> 1L, "de" -> 1L, "fr" -> 1L) // es/zh absent → dropped
    val out = t.documents.mixtureSample("lang", "doc_id", parts)
      .select(col("doc_id"), col("lang"), col("rate_bp")).cache()
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == Set("en", "de", "fr"), s"unexpected classes: ${kept.keySet}")
    val counts = t.documents.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the binding class (smallest count at equal parts) keeps everything
    val binding = Seq("en", "de", "fr").minBy(counts)
    val rates = out.select("lang", "rate_bp").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates(binding) == 10000L, s"binding class $binding must keep all rows, got ${rates(binding)}")
    assert(kept(binding) == counts(binding))
    // other classes land near the binding level (hash sampling noise)
    for (c <- Seq("en", "de", "fr") if c != binding) {
      assert(kept(c) <= counts(c))
      assert(math.abs(kept(c).toDouble / kept(binding) - 1.0) < 0.35,
        s"$c kept ${kept(c)} vs binding ${kept(binding)} — mixture off")
    }
    // bit-reproducible under a different partitioning
    val again = t.documents.repartition(13).mixtureSample("lang", "doc_id", parts)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
    out.unpersist()
  }

  test("shuffleShards: a seeded permutation — balanced, contiguous, partitioning-proof") {
    import spark.implicits._
    val rows = spark.range(2000).select($"id".as("doc_id"), lit("x").as("payload"))
    val out = rows.shuffleShards("doc_id", shards = 8, seed = 7L)
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 2000)
    // every shard in range, positions contiguous 1..count within a shard
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.foreach { case (s, xs) =>
      assert(xs.map(_._3).sorted.toSeq == (1L to xs.length).toSeq,
        s"shard $s positions not contiguous")
      // md5 deals near-uniformly: no shard should be off by >30%
      assert(math.abs(xs.length - 250.0) / 250.0 < 0.3,
        s"shard $s badly unbalanced: ${xs.length}/2000")
    }
    // the deal (assignment AND order) is identical under a different
    // input partitioning — a seeded permutation, not an engine random
    val again = rows.repartition(13).shuffleShards("doc_id", shards = 8, seed = 7L)
      .select("doc_id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
    // a different seed produces a genuinely different permutation
    val reseeded = rows.shuffleShards("doc_id", shards = 8, seed = 8L)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reseeded != out.map(x => (x._1, x._2)).toSet)
  }

  test("samplePerGroup: exact-k deal, staged ≡ one-window, partitioning-proof") {
    import spark.implicits._
    // 3 groups of very different sizes, one smaller than k
    val rows = spark.range(900).select($"id".as("doc_id"),
      when($"id" < 600, "big").when($"id" < 897, "mid").otherwise("tiny").as("grp"))
    val out = rows.samplePerGroup("grp", "doc_id", k = 10, seed = 3L, subShards = 4)
      .select("grp", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byGrp = out.groupBy(_._1)
    // exactly min(k, |group|) rows, ranks contiguous 1..n
    assert(byGrp("big").length == 10 && byGrp("mid").length == 10 && byGrp("tiny").length == 3)
    byGrp.foreach { case (g, xs) =>
      assert(xs.map(_._3).sorted.toSeq == (1L to xs.length).toSeq,
        s"group $g ranks not contiguous")
    }
    // the sub-sharded two-stage plan is output-identical to the plain
    // one-window rank (subShards = 1): the top-k-survives argument
    val plain = rows.samplePerGroup("grp", "doc_id", k = 10, seed = 3L, subShards = 1)
      .select("grp", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plain.toSet == out.toSet, "staged sample differs from one-window rank")
    // deterministic under any input partitioning
    val again = rows.repartition(11).samplePerGroup("grp", "doc_id", k = 10, seed = 3L, subShards = 4)
      .select("grp", "doc_id", "sample_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
    // a different seed picks a different panel
    val reseeded = rows.samplePerGroup("grp", "doc_id", k = 10, seed = 4L, subShards = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reseeded != out.map(_._2).toSet)
    intercept[IllegalArgumentException](rows.samplePerGroup("grp", "doc_id", k = 0))
    intercept[IllegalArgumentException](rows.samplePerGroup("grp", "doc_id", k = 5, subShards = 0))
  }

  test("lmScore: in-distribution text scores better than gibberish, short docs drop") {
    import spark.implicits._
    // 20 docs of the same predictable pattern + 1 gibberish outlier
    val common = (1 to 20).map(i => (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
    val outlier = Seq((99L, "zq xv jk wp qm zn xr vt kp wq")) // bigrams seen once each
    val tiny = Seq((100L, "single"))                          // no bigram → dropped
    val docs = (common ++ outlier ++ tiny).toDF("doc_id", "text")
    val out = docs.lmScore("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(!out.contains(100L), "a 1-token doc has no bigram and must be dropped")
    assert(out.contains(99L) && out.contains(1L))
    val (nb1, lp1, ppl1) = out(1L)
    val (nbo, lpo, pplo) = out(99L)
    assert(nb1 == 12L && nbo == 9L, s"bigram counts wrong: $nb1 / $nbo")
    assert(lp1 > lpo, s"predictable doc must out-score gibberish: $lp1 vs $lpo")
    assert(ppl1 < pplo, s"predictable doc must have lower perplexity: $ppl1 vs $pplo")
    // identical docs score identically; scores are partitioning-proof
    assert(out(2L) == out(1L))
    val again = docs.repartition(7).lmScore("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(again == out)
  }

  test("histogram: exact integer bucketing, degenerate range, nulls dropped") {
    import spark.implicits._
    // values 0..99 into 10 bins of ceil-width 10 → 10 counts each
    val df = ((0L to 99L).map(Some(_)) ++ Seq(None, None)).toDF("v")
    val out = df.histogram(col("v"), bins = 10).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 10)
    assert(out(0) == ((0L, 0L, 9L, 10L)) && out(9) == ((9L, 90L, 99L, 10L)),
      s"uniform 0..99 must land 10 per bin: ${out.toSeq}")
    assert(out.map(_._4).sum == 100L, "nulls must not be counted")
    // all-equal column degrades to one bin covering the single value
    val const = Seq(7L, 7L, 7L).toDF("v").histogram(col("v"), bins = 32).collect()
    assert(const.length == 1 &&
      const(0).getLong(1) == 7L && const(0).getLong(2) == 7L && const(0).getLong(3) == 3L)
    // negative-to-positive span stays exact
    val neg = Seq(-10L, -1L, 0L, 9L).toDF("v").histogram(col("v"), bins = 2)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(neg.toSeq == Seq((0L, -10L, -1L, 2L), (1L, 0L, 9L, 2L)), s"got ${neg.toSeq}")
    intercept[IllegalArgumentException](df.histogram(col("v"), bins = 0))
  }

  test("prepareLm + lmScoreAgainst: reproduces lmScore on the training corpus; OOV floor") {
    import spark.implicits._
    val docs = ((1 to 20).map(i => (i.toLong, "the cat sat on the mat and the dog sat here")) :+
      ((99L, "zq xv jk wp qm zn xr vt"))).toDF("doc_id", "text")
    val lm = graft.api.Ops.prepareLm(docs, "text")
    val self = docs.lmScoreAgainst(lm, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val direct = docs.lmScore("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(self == direct, "prepared-LM self-scoring must reproduce lmScore bit-for-bit")
    // fully out-of-distribution text: every bigram unseen, every
    // prefix unseen → each bigram scores the add-k floor ln(1/V)
    val oov = Seq((500L, "totally novel unseen gibberish words")).toDF("doc_id", "text")
    val out = oov.lmScoreAgainst(lm, "doc_id", "text").collect()(0)
    val expected = BigDecimal(math.log(1.0 / lm.vocab))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(2) == expected,
      s"OOV doc must score the add-k floor -ln(V): got ${out.getDouble(2)}, want $expected")
    assert(out.getDouble(2) < direct(1L)._2,
      "OOV text must score strictly worse than in-distribution text")
  }

  test("collocations: planted phrase tops PMI, minCount floors, partitioning-proof") {
    import spark.implicits._
    // "quantum flux" always adjacent (a true collocation); "common"
    // and "word" frequent but independently distributed
    val docs = (1L to 40L).map { i =>
      (i, s"common word quantum flux common word and word common filler$i")
    }.toDF("doc_id", "text")
    val byPair = docs.collocations("doc_id", "text", minCount = 20L).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(byPair.contains(("quantum", "flux")), s"planted pair missing: ${byPair.keys}")
    val pmiOf = byPair.view.mapValues(_._2).toMap
    assert(pmiOf(("quantum", "flux")) == pmiOf.values.max,
      "the always-adjacent pair must carry the highest PMI")
    assert(byPair(("quantum", "flux"))._1 == 40L)
    // rare pairs (each filler appears once) never pass the floor
    assert(byPair.keys.forall { case (a, b) => !a.startsWith("filler") && !b.startsWith("filler") })
    val repart = docs.repartition(7).collocations("doc_id", "text", minCount = 20L).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(repart == byPair, "PMI must be bit-identical under any partitioning")
    intercept[IllegalArgumentException](docs.collocations("doc_id", "text", minCount = 0L))
  }

  test("skewStats: exact counts, basis-point shares, deterministic tie-break") {
    import spark.implicits._
    // planted Zipf-ish distribution: key 1 → 500 rows, key 2 → 300,
    // key 3 → 100, keys 4..13 → 10 each
    val rows = Seq.fill(500)(1L) ++ Seq.fill(300)(2L) ++ Seq.fill(100)(3L) ++
      (4L to 13L).flatMap(k => Seq.fill(10)(k))
    val df = rows.map(Tuple1(_)).toDF("key").repartition(8)
    val out = df.skewStats("key", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 5)
    assert(out(0) == ((1L, 1L, 500L, 5000L)), s"head key wrong: ${out(0)}") // 500/1000
    assert(out(1) == ((2L, 2L, 300L, 3000L)))
    assert(out(2) == ((3L, 3L, 100L, 1000L)))
    // the 10-row keys tie → rank by key ascending, deterministically
    assert(out(3) == ((4L, 4L, 10L, 100L)) && out(4) == ((5L, 5L, 10L, 100L)))
    // k larger than the distinct-key count returns them all
    assert(df.skewStats("key", k = 100).count() == 13)
    intercept[IllegalArgumentException](df.skewStats("key", k = 0))
  }

  test("splitCorpus: covering seeded split, stable under corpus growth") {
    import spark.implicits._
    val splits = Seq(("train", 9000L), ("val", 500L), ("test", 500L))
    val docs = (1L to 10000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = docs.splitCorpus("doc_id", splits, seed = 11L)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 10000, "every row gets exactly one label")
    val byLabel = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    // binomial tolerance: 9000±~90, 500±~65 at n=10000 (>4σ margins)
    assert(math.abs(byLabel("train") - 9000) < 300, s"train share off: $byLabel")
    assert(math.abs(byLabel("val") - 500) < 150 && math.abs(byLabel("test") - 500) < 150,
      s"val/test share off: $byLabel")
    // STABILITY: splitting a subset assigns exactly what the full
    // corpus assigned — the held-out set can't migrate as data grows
    val subset = docs.filter($"doc_id" <= 2000)
      .splitCorpus("doc_id", splits, seed = 11L)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset == out.view.filterKeys(_ <= 2000L).toMap)
    // a different seed reassigns; identical seed replays exactly
    val reseeded = docs.splitCorpus("doc_id", splits, seed = 12L)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reseeded != out)
    assert(docs.repartition(7).splitCorpus("doc_id", splits, seed = 11L)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap == out)
    intercept[IllegalArgumentException](docs.splitCorpus("doc_id", Seq(("a", 5000L))))
    intercept[IllegalArgumentException](
      docs.splitCorpus("doc_id", Seq(("a", 5000L), ("a", 5000L))))
  }

  test("capTokensPerCategory: under-budget keeps all, over-budget lands near the budget") {
    import spark.implicits._
    val docs = ((1L to 50L).map(i => (i, "A", 10L)) ++
      (51L to 250L).map(i => (i, "B", 10L))).toDF("doc_id", "cat", "n")
    val out = docs.capTokensPerCategory("cat", "doc_id", col("n"), budgetTokens = 600L)
      .cache()
    val rates = out.select("cat", "rate_bp").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("A") == 10000L, s"A is under budget (500 < 600), got rate ${rates("A")}")
    assert(rates("B") == 3000L, s"B rate must be 600*10000 div 2000, got ${rates("B")}")
    val kept = out.groupBy("cat").agg(sum("n").as("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("A") == 500L)
    assert(kept("B") >= 300L && kept("B") <= 900L,
      s"B kept ${kept("B")} tokens — far from the 600 budget")
    out.unpersist()
  }

  test("repetitionStats: planted repetitive doc measures exactly, short docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a b"),   // 5 toks, top a=4/5, bigrams [a a,a a,a a,a b] → dup 1-2/4
      (2L, "x y z w"),     // all distinct: top 1/4, dup 0
      (3L, "solo")         // < 2 tokens → dropped
    ).toDF("doc_id", "text")
    val out = docs.repetitionStats("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((5L, 0.8, 0.5)))
    assert(out(2L) == ((4L, 0.25, 0.0)))
  }

  test("profile: one row per column, exact null counts, sane distinct estimates, one-pass plan") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 1.5), (2L, None, 2.5), (3L, Some("b"), 2.5), (4L, Some("a"), 0.5)
    ).toDF("id", "s", "v")
    val p = df.profile()
    val rows = p.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "s", "v"))
    assert(rows("id").getAs[Long]("n_rows") == 4L)
    assert(rows("s").getAs[Long]("n_null") == 1L && rows("id").getAs[Long]("n_null") == 0L)
    assert(rows("s").getAs[Long]("approx_distinct") == 2L)
    assert(rows("v").getAs[String]("min") == "0.5" && rows("v").getAs[String]("max") == "2.5")
    assert(rows("id").getAs[String]("max") == "4")
    // string columns carry exact-below-cap top-k values, others null
    assert(rows("s").getAs[String]("top_values") == "a:2,b:1")
    assert(rows("v").getAs[String]("top_values") == null)
    // numeric columns carry the portable_quantiles p50/p95 sketches:
    // v = [0.5, 1.5, 2.5, 2.5] → nearest-rank p50 = 1.5, p95 = 2.5,
    // each within the sketch's adaptive resolution (~range/4096 ≈
    // 1e-3 for these tiny ranges); strings null
    assert(math.abs(rows("v").getAs[Double]("p50") - 1.5) < 1e-3)
    assert(math.abs(rows("v").getAs[Double]("p95") - 2.5) < 1e-3)
    assert(math.abs(rows("id").getAs[Double]("p50") - 2.0) < 1e-3)
    assert(math.abs(rows("id").getAs[Double]("p95") - 4.0) < 1e-3)
    assert(rows("s").isNullAt(rows("s").fieldIndex("p50")))
    // ONE aggregate pass: exactly one pair of HashAggregates (partial
    // + final), no per-column job loop
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "profile must not join")
    // embeddings: arrays profile with bounds, events props (map) gets null bounds
    val t2 = Tables(spark, sfDir)
    val ep = t2.embeddings.profile().collect().map(r => r.getString(0) -> r).toMap
    assert(ep("embedding").getAs[Long]("n_null") == 0L)
    assert(ep("embedding").getAs[String]("min") != null)
    val withMap = df.withColumn("m", map(col("id").cast("string"), col("v")))
    val mp = withMap.profile().collect().map(r => r.getString(0) -> r).toMap
    assert(mp("m").getAs[String]("min") == null, "map bounds must be null")
    assert(mp("m").getAs[Long]("non_null") == 4L, "maps still count non-nulls")
    // a column name with a dot must profile as a plain column, not a
    // struct path (positional addressing inside the aggregate)
    val dotted = df.withColumnRenamed("s", "a.b").profile()
      .collect().map(r => r.getString(0) -> r).toMap
    assert(dotted.keySet == Set("id", "a.b", "v"))
    assert(dotted("a.b").getAs[Long]("n_null") == 1L)
    assert(dotted("a.b").getAs[String]("top_values") == "a:2,b:1")
  }

  test("chunkTokens: planted doc chunks exactly with overlap, short docs emit one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks, chunk 4 step 2 → 4 chunks
      (2L, "a b"),                            // under one window → one chunk
      (3L, "")                                // empty → dropped
    ).toDF("doc_id", "text")
    val out = docs.chunkTokens("doc_id", "text", chunkTokens = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet.map(_._1) == Set(1L, 2L))
    assert(out((1L, 0L)) == ((4L, "t1 t2 t3 t4")))
    assert(out((1L, 1L)) == ((4L, "t3 t4 t5 t6")))
    assert(out((1L, 2L)) == ((4L, "t5 t6 t7 t8")))
    assert(out((1L, 3L)) == ((4L, "t7 t8 t9 t10")))
    assert(out((2L, 0L)) == ((2L, "a b")))
    // every source token appears in some chunk (coverage)
    assert(out.count(_._1._1 == 1L) == 4)
  }

  test("bloomSemiJoin equals the exact semi-join and probes through a bloom filter") {
    val building = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val api = t.orders.bloomSemiJoin(building, "o_custkey", "c_custkey",
      expectedItems = 1000L, numBits = 64L * 1024)
    val plain = t.orders.join(building.withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey"), "left_semi")
    assert(api.count() == plain.count() && api.count() > 0)
    assert(api.except(plain).isEmpty && plain.except(api).isEmpty)
    val phys = api.queryExecution.executedPlan.toString
    assert(phys.contains("might_contain"),
      "bloom probe missing from the physical plan:\n" + phys.take(2000))
    // the build side must shuffle exactly ONCE (its semi-join
    // exchange): a pre-distinct would add a redundant second full
    // shuffle of the right side (semi join already collapses
    // duplicate build keys). Forcing SMJ makes the count exact: one
    // exchange per join side, nothing else.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val smj = t.orders.bloomSemiJoin(building, "o_custkey", "c_custkey",
        expectedItems = 1000L, numBits = 64L * 1024)
      val lines = smj.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(lines == 2,
        s"expected exactly 2 shuffle exchanges (one per semi-join side), got $lines")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("stripMarkup: tags/script/style/comments vanish, entities decode, whitespace collapses") {
    import spark.implicits._
    val cases = Seq(
      (1L, "<p>hello <b>world</b></p>", "hello world"),
      (2L, "a<script type=\"x\">var q = \"</p>\"; if (1 < 2) {}</script>b", "a b"),
      (3L, "a<style>p { color: red; }</style>b", "a b"),
      (4L, "a<!-- hidden\n multiline -->b", "a b"),
      // entity decode, &amp; LAST: "&amp;lt;" stays the literal "&lt;"
      (5L, "x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &apos;t&apos;&nbsp;y &amp; z &amp;lt;", "x <tag> \"q\" 's' 't' y & z &lt;"),
      (6L, "  a\t\tb\n\nc   d\f e ", "a b c d e"),
      // unclosed tag and bare < survive sanely
      (7L, "5 < 6 and <em>done", "5 < 6 and done"),
      (8L, "<SCRIPT>upper case</script>mixed<Style>s</STYLE>", "mixed"))
    val out = cases.toDF("id", "text", "want")
      .stripMarkup("text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    for ((id, got, want) <- out)
      assert(got == want, s"case $id: got '$got', want '$want'")
  }

  test("duplicateSpans: planted span found with exact boundaries, filters honored") {
    import spark.implicits._
    // doc 1: 40 distinct tokens t01..t40; doc 2: 10 unique tokens,
    // then doc 1's tokens 5..34 verbatim (a 30-token span), then noise
    def tok(p: String, i: Int) = f"$p$i%02d"
    val d1 = (1 to 40).map(tok("t", _))
    val d2 = (1 to 10).map(tok("u", _)) ++ d1.slice(4, 34) ++ (1 to 6).map(tok("v", _))
    val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
    val spans = docs.duplicateSpans("doc_id", "text", n = 8, minSpanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.toSeq == Seq((1L, 2L, 5L, 11L, 30L)),
      s"expected the single planted span, got ${spans.toSeq}")
    // below minSpanTokens → silent
    assert(docs.duplicateSpans("doc_id", "text", n = 8, minSpanTokens = 31)
      .isEmpty, "31-token floor must drop the 30-token span")
    // stop-gram pruning: 3 identical docs, maxDf=2 prunes every gram
    val trip = Seq((1L, d1.mkString(" ")), (2L, d1.mkString(" ")), (3L, d1.mkString(" ")))
      .toDF("doc_id", "text")
    assert(trip.duplicateSpans("doc_id", "text", n = 8, minSpanTokens = 20, maxDf = 2L)
      .isEmpty, "df > maxDf grams must be pruned")
    // without the cap the same corpus reports all three full-length pairs
    val full = trip.duplicateSpans("doc_id", "text", n = 8, minSpanTokens = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(full == Set((1L, 2L, 40L), (1L, 3L, 40L), (2L, 3L, 40L)))
  }

  test("removeDuplicateSpans: keep-first removal with exact surviving text") {
    import spark.implicits._
    def tok(p: String, i: Int) = f"$p$i%02d"
    val d1 = (1 to 40).map(tok("t", _))
    val pre = (1 to 10).map(tok("u", _)); val post = (1 to 6).map(tok("v", _))
    val d2 = pre ++ d1.slice(4, 34) ++ post
    val docs = Seq((1L, d1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
    val out = docs.removeDuplicateSpans("doc_id", "text", n = 8, minSpanTokens = 20)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1 (smaller id) keeps its copy untouched
    assert(out(1L) == ((d1.mkString(" "), 0L)))
    // doc 2 loses exactly the 30-token copied span, neighbors survive
    assert(out(2L) == (((pre ++ post).mkString(" "), 30L)))
    // three identical docs: 2 and 3 empty out entirely, 1 survives
    val trip = Seq(1L, 2L, 3L).map(i => (i, d1.mkString(" "))).toDF("doc_id", "text")
    val t3 = trip.removeDuplicateSpans("doc_id", "text", n = 8, minSpanTokens = 20)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(t3(1L) == ((d1.mkString(" "), 0L)))
    assert(t3(2L) == (("", 40L)) && t3(3L) == (("", 40L)))
  }

  test("dedupParagraphs drops corpus-common paragraphs from EVERY doc, keeps order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common header\nalpha beta\ncommon footer"),
      (2L, "common header\ngamma delta\ncommon footer"),
      (3L, "common header\nepsilon\ncommon footer"),
      (4L, "common header\nzeta\nrare line"),
      (5L, "rare line\ncommon header"),
      (6L, "common header\ncommon footer")).toDF("id", "text")
    val out = docs.dedupParagraphs("id", "text", minDf = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // header df=6 and footer df=4 are common; "rare line" df=2 < 3 survives
    assert(out(1L) == (("alpha beta", 1L, 2L)), s"got $out")
    assert(out(4L) == (("zeta\nrare line", 2L, 1L)), s"got $out")
    assert(out(5L) == (("rare line", 1L, 1L)),
      s"paragraph order must be preserved, first occurrences removed too: $out")
    assert(out(6L) == (("", 0L, 2L)),
      s"all-boilerplate docs come back empty but auditable: $out")
    // empty paragraphs (consecutive separators) census like any other
    val blanks = Seq(
      (1L, "a\n\nb"), (2L, "c\n\nd"), (3L, "e\n\nf")).toDF("id", "text")
    val b = blanks.dedupParagraphs("id", "text", minDf = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b(1L) == "a\nb", s"common empty paragraph must dedup: $b")
    // minDf is a strict document-frequency bound: a paragraph repeated
    // many times INSIDE one doc is not corpus-common
    val intra = Seq(
      (1L, "x\nx\nx\nx\nbody"), (2L, "other"), (3L, "lines")).toDF("id", "text")
    val i = intra.dedupParagraphs("id", "text", minDf = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(i(1L) == "x\nx\nx\nx\nbody",
      s"df counts DISTINCT docs, not occurrences: $i")
  }

  test("bm25TopK ranks matches by Okapi score; prepared index form is identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple apple"),
      (2L, "apple banana cherry date"),
      (3L, "banana banana banana banana banana banana banana banana"),
      (4L, "cherry date elderberry fig"),
      (5L, "apple")).toDF("doc_id", "text")
    val queries = Seq((10L, "apple"), (20L, "banana nosuchterm")).toDF("qid", "qtext")
    val out = docs.bm25TopK(queries, "qid", "qtext", "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // only term-matching docs appear, ranked tf-heavy > short-pure > diluted
    assert(out.keys.count(_._1 == 10L) == 3, s"apple matches exactly 3 docs: $out")
    assert(out((10L, 1L)) == 1L && out((10L, 2L)) == 5L && out((10L, 3L)) == 2L,
      s"rank must follow tf and length normalization: $out")
    // absent query terms contribute nothing (no NaN, no crash)
    assert(out.keys.count(_._1 == 20L) == 3, s"banana matches exactly 3 docs: $out")
    assert(!out.contains((20L, 4L)), "a doc with no query term never matches")
    // k caps the ranking
    val top1 = docs.bm25TopK(queries, "qid", "qtext", "doc_id", "text", k = 1)
    assert(top1.count() == 2 && top1.agg(max(col("rank"))).collect()(0).getLong(0) == 1L)
    // index-once/query-many form is identical to the one-shot
    val idx = graft.api.Ops.prepareBm25(docs, "doc_id", "text")
    val viaIdx = queries.bm25TopKAgainst(idx, "qid", "qtext", k = 10)
    val oneShot = docs.bm25TopK(queries, "qid", "qtext", "doc_id", "text", k = 10)
    assert(viaIdx.except(oneShot).isEmpty && oneShot.except(viaIdx).isEmpty,
      "bm25TopKAgainst(prepareBm25) must equal bm25TopK")
    // idf: with equal tf and dl, the rarer term outranks the common one
    val corp = (1L to 20L).map(i => (i, if (i <= 2) "rare filler" else "common filler"))
      .toDF("doc_id", "text")
    val rq = Seq((1L, "rare"), (2L, "common")).toDF("qid", "qtext")
    val scores = corp.bm25TopK(rq, "qid", "qtext", "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores(1L) > scores(2L),
      s"rarer term must carry higher idf at equal tf/dl: $scores")
  }

  test("keepBestAmong composes the keep rule with any pair producer") {
    import spark.implicits._
    // edit-distance edges: 1-2-3 chain one substitution apart (NOT
    // transitively: lev(1,3)=2, the cluster exists only through 2);
    // 9 unrelated
    val rows = Seq(
      (1L, "alpha", 10L), (2L, "alphb", 30L), (3L, "alhhb", 20L),
      (9L, "omega", 5L)).toDF("id", "s", "q")
    val edges = rows.editDistancePairs("id", "s", maxDistance = 1)
    val out = rows.keepBestAmong("id", col("q"), edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1L, false)) && out(3L) == ((1L, false)),
      s"chain members below max quality must drop: $out")
    assert(out(2L) == ((1L, true)), s"max-quality member keeps: $out")
    assert(out(9L) == ((9L, true)), s"edge-less rows are singletons: $out")
    // the LSH-producer form is literally dedupKeepBest
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base + " alpha", 10L), (2L, base + " beta", 20L),
      (9L, (1 to 40).map(i => s"z$i").mkString(" "), 5L)).toDF("doc_id", "text", "q")
    val viaEdges = docs.keepBestAmong("doc_id", col("q"),
      docs.minhashLshPairs("doc_id", "text", 0.5), "doc_a", "doc_b")
    val direct = docs.dedupKeepBest("doc_id", "text", col("q"), threshold = 0.5)
    assert(viaEdges.except(direct).isEmpty && direct.except(viaEdges).isEmpty,
      "keepBestAmong(minhashLshPairs) must equal dedupKeepBest")
  }

  test("editDistancePairs: complete vs brute force, all edit kinds, triangle split") {
    import spark.implicits._
    val rows = Seq(
      1L -> "kitten",   // 2: sub vs 3 (sitten? no: see below)
      2L -> "mitten",   // sub of 1 (k->m), d=1
      3L -> "kitte",    // deletion of 1, d=1
      4L -> "kittens",  // insertion into 1, d=1
      5L -> "kitten",   // exact dup of 1 under a distinct id, d=0
      6L -> "smitten",  // insertion into 2, d=1; d=2 from 1
      7L -> "xyzzy")    // unrelated
    val df = rows.toDF("id", "s")
    def brute(d: Int) = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .withColumn("distance", levenshtein($"a.s", $"b.s"))
      .filter($"distance" <= d)
      .select($"a.id".as("id_a"), $"b.id".as("id_b"), $"distance")
    for (d <- Seq(1, 2)) {
      val api = df.editDistancePairs("id", "s", maxDistance = d)
      val ref = brute(d)
      assert(api.except(ref).isEmpty && ref.except(api).isEmpty,
        s"d=$d: deletion-neighborhood result differs from brute force")
    }
    // hot-key triangle split (blockCap=1 forces sub-blocks everywhere)
    // must be output-identical to the monolithic join
    val split = df.editDistancePairs("id", "s", maxDistance = 1, blockCap = 1)
    assert(split.except(brute(1)).isEmpty && brute(1).except(split).isEmpty,
      "blockCap=1 triangle split changed the output")
    // distance-0 pair (ids 1,5) must be reported with distance 0
    val d0 = df.editDistancePairs("id", "s").filter($"distance" === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(d0 == Seq((1L, 5L)), s"expected the exact-dup pair, got $d0")
    // empty and null strings: no crash, empty==empty is a 0-distance pair
    val weird = Seq(1L -> "", 2L -> "", 3L -> "a", 4L -> (null: String)).toDF("id", "s")
    val w = weird.editDistancePairs("id", "s", maxDistance = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(w == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)), s"got $w")
  }

  test("editDistancePairs enforces its short-string contract via maxLength") {
    import spark.implicits._
    // VERDICT r8 #7: pointing this operator at document text used to
    // silently start an L²-key explosion; now it fails the run with
    // the offending id before any key explodes
    val long = Seq(1L -> ("a" * 600), 2L -> "abc").toDF("id", "s")
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + "|" + msgs(t.getCause)
    val e = intercept[Exception] { long.editDistancePairs("id", "s").count() }
    assert(msgs(e).contains("maxLength"), s"expected the maxLength error, got: ${msgs(e).take(400)}")
    assert(msgs(e).contains("id=1"), s"the offending id must be named: ${msgs(e).take(400)}")
    // raising the cap (or short values) passes untouched
    val ok = long.editDistancePairs("id", "s", maxLength = 1000)
    assert(ok.count() == 0)
  }

  test("connectedComponents and keepBestAmong work on STRING ids (no silent all-singletons)") {
    import spark.implicits._
    // VERDICT r8 #2: string ids used to cast("long") to null, every
    // label join missed, and the operator returned everything as its
    // own kept singleton — "no duplicates found", silently.
    val rows = Seq(
      ("docA", 10L), ("docB", 30L), ("docC", 20L), ("lonely", 5L)).toDF("id", "q")
    val edges = Seq(("docA", "docB"), ("docB", "docC")).toDF("a", "b")
    val out = rows.keepBestAmong("id", col("q"), edges, "a", "b")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(3)))).toMap
    assert(Set(out("docA")._1, out("docB")._1, out("docC")._1).size == 1,
      s"the chain must be ONE cluster: $out")
    assert(out("docB")._2 && !out("docA")._2 && !out("docC")._2,
      s"max-quality docB keeps, the rest drop: $out")
    assert(out("lonely") == (("lonely", true)), s"singletons keep their own id: $out")
    // both CC engines label string graphs in ORIGINAL id space, with
    // the same deterministic canonical representative
    val bsp = edges.connectedComponents("a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bsp.keySet == Set("docA", "docB", "docC") && bsp.values.toSet.size == 1,
      s"BSP labels: $bsp")
    val star = edges.connectedComponentsStar("a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(star == bsp, s"star must agree with BSP on string graphs: $star vs $bsp")
    // the LSH-producer path composes end-to-end on string doc ids
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      ("d-one", base + " alpha", 10L), ("d-two", base + " beta", 20L),
      ("d-zzz", (1 to 40).map(i => s"z$i").mkString(" "), 5L)).toDF("doc_id", "text", "q")
    val kb = docs.dedupKeepBest("doc_id", "text", col("q"), threshold = 0.5)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(kb == Map("d-one" -> false, "d-two" -> true, "d-zzz" -> true),
      s"string-id dedupKeepBest must find the near-dup pair: $kb")
    // MIXED type classes (long ids, string edges) can never line up —
    // rejected loudly instead of silently all-singleton
    val longRows = Seq((1L, 10L), (2L, 20L)).toDF("id", "q")
    val e = intercept[IllegalArgumentException] {
      longRows.keepBestAmong("id", col("q"), edges, "a", "b")
    }
    assert(e.getMessage.contains("same type class"))
  }

  test("semanticDedup large-k broadcast path is bit-identical to the literal path") {
    graft.functions.GraftFunctions.register(spark)
    val base = t.embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val planted = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("emb"), v => v + lit(0.005)).as("emb"))
    val corpus = base.unionByName(planted)
    val centroids = t.embeddings.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"))
    def run(cutoff: Int) = corpus.semanticDedup("vec_id", "emb", centroids,
      "vec_id", "embedding", threshold = 0.95, maxLiteralCentroids = cutoff)
    val viaLiteral = run(4096)   // k=64 ≤ cutoff → plan-literal argmax
    val viaJoin = run(1)         // k=64 > cutoff → broadcast-join argmax
    assert(viaLiteral.except(viaJoin).isEmpty && viaJoin.except(viaLiteral).isEmpty,
      "assignment paths must agree bit-for-bit on (id, cluster, kept)")
    assert(viaJoin.filter(!col("kept")).count() > 0,
      "sanity: the planted copies must drop on the join path too")
  }

  test("ivfTopK large-k broadcast path matches the literal path") {
    import graft.operators.Similarity
    val centroids = t.embeddings
      .filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    def run(cutoff: Int) = Similarity.ivfTopK(
      t.embeddings, t.embeddings.filter(col("vec_id") < 10), centroids,
      id = "vec_id", emb = "embedding",
      centroidId = "centroid_id", centroidEmb = "cent_emb",
      k = 5, nprobe = 2, maxLiteralCentroids = cutoff)
      .select(col("qid"), col("rank"), col("vid"))
    val viaLiteral = run(4096)  // 8 ≤ cutoff → literal cell ranking
    val viaJoin = run(1)        // 8 > cutoff → 1-row broadcast array join
    assert(viaLiteral.except(viaJoin).isEmpty && viaJoin.except(viaLiteral).isEmpty,
      "cell assignment paths must produce identical search results")
    // plan pin for the large-k shape (ivfTopK is checkpoint-free, so
    // the assignment subtree is visible end-to-end): the centroid
    // array arrives via keyless 1-row broadcast NLJ — q48/q83's shape
    // — and there is NO sort-based aggregation anywhere (the
    // groupBy-argmin formulation degenerated to SortAggregate over
    // corpus×k and OOMed; this pin keeps it out)
    val plan = viaJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "large-k cell assignment must be a broadcast NLJ")
    assert(!plan.contains("SortAggregate"),
      s"no sort-based aggregation may appear in the large-k plan")
  }

  test("vecDedupAgainstCatalog drops planted near-dup vectors, keeps novel directions") {
    graft.functions.GraftFunctions.register(spark)
    val base = t.embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val incNear = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 200000).as("vec_id"),
        transform(col("emb"), v => v + lit(0.005)).as("emb"))
    val incNovel = base.filter(col("vec_id") >= 30 && col("vec_id") < 60)
      .select((col("vec_id") + 300000).as("vec_id"),
        transform(col("emb"), v => v * lit(-1.0)).as("emb"))
    val inc = incNear.unionByName(incNovel)
    val kept = inc.vecDedupAgainstCatalog(base, "vec_id", "emb",
      threshold = 0.92, dim = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val nearKept = kept.count(_ < 300000)
    assert(nearKept <= 30 * 2 / 10,
      s"≥80% of +0.005-shifted near-dups must be caught by the 4-table blocking, $nearKept survived")
    assert(kept.count(_ >= 300000) == 30,
      s"negated (novel-direction) vectors must all survive: ${kept.count(_ >= 300000)}")
    // prepared-once reuse ≡ the one-shot form (the rolling-batch contract)
    val prepared = graft.api.Ops.prepareVecCatalog(base, "vec_id", "emb", dim = 64)
    val viaPrepared = graft.api.Ops.vecDedupAgainstPrepared(inc, "vec_id", "emb",
      prepared, threshold = 0.92)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaPrepared == kept, "prepared reuse must equal the one-shot form")
    // duplicates WITHIN the increment are untouched (catalog-only
    // contract, same as dedupAgainstCatalog): two identical novel
    // vectors under distinct ids both survive
    val twins = incNovel.filter(col("vec_id") === 300030)
      .select((col("vec_id") + 300000).as("vec_id"), col("emb"))
      .unionByName(incNovel.filter(col("vec_id") === 300030)
        .select((col("vec_id") + 300001).as("vec_id"), col("emb")))
    val twinsKept = twins.vecDedupAgainstCatalog(base, "vec_id", "emb",
      threshold = 0.92, dim = 64).count()
    assert(twinsKept == 2,
      s"identical increment-internal twins must BOTH survive (got $twinsKept)")
  }

  test("curate keepBest mode keeps the max-quality near-dup cluster member") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val zText = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, base + " alpha", 10L),  // near-dup cluster {1,2,3}
      (2L, base + " beta", 20L),
      (3L, base + " gamma", 30L),  // best quality in the cluster
      (9L, zText, 5L),             // unrelated
      (10L, zText, 50L),           // exact dup of 9 (exact stage keeps min id)
      (11L, "low quality", 0L)     // gated out
    ).toDF("doc_id", "text", "q")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // default action: drop the larger id of every verified pair
    val minId = docs.curate("doc_id", "text", col("q"), minQuality = 1.0)
    assert(ids(minId) == Set(1L, 9L), s"min-id action: ${ids(minId)}")
    // keep-best action: cluster transitively, keep max quality
    val best = docs.curate("doc_id", "text", col("q"), minQuality = 1.0,
      keepBest = Some(col("q")))
    assert(ids(best) == Set(3L, 9L), s"keep-best action: ${ids(best)}")
    // ≡ the dedupKeepBest composition over the exact-dedup survivors
    val exactKept = docs.filter(col("q") >= 1.0).filter(col("doc_id") =!= 10L)
    val composed = exactKept.dedupKeepBest("doc_id", "text", col("q"), threshold = 0.5)
      .filter(col("kept")).select("doc_id")
    assert(ids(best) == composed.collect().map(_.getLong(0)).toSet,
      "curate(keepBest) must equal the dedupKeepBest composition")
  }

  test("resampleLocf: complete per-key grid, LOCF semantics, observed rows untouched") {
    import spark.implicits._
    // user 1: observations in hour-buckets 0, 3 (value 2.0 then 5.0)
    // user 2: single observation (no gaps, grid = 1 bucket)
    val h = 3600000000L
    val ev = Seq(
      (1L, 0L * h + 5L, 2.0), (1L, 0L * h + 9L, 1.0),   // bucket 0, two events
      (1L, 3L * h + 1L, 5.0),                            // bucket 3
      (2L, 7L * h + 2L, 9.0))
      .toDF("user_id", "us", "value")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"), col("value"))
    val out = ev.resampleLocf("user_id", "ts", col("value"), h)
      .orderBy("user_id", "bucket_start").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length == 4, s"user 1 must get buckets 0..3: ${u1.mkString(", ")}")
    // observed buckets: own totals, is_gap=0
    assert(u1(0).getLong(2) == 2L && u1(0).getDouble(3) == 3.0 &&
      u1(0).getDouble(4) == 3.0 && u1(0).getLong(5) == 0L)
    // gap buckets 1,2: zero events, null total, LOCF carries 3.0
    for (i <- Seq(1, 2)) {
      assert(u1(i).getLong(2) == 0L && u1(i).isNullAt(3) &&
        u1(i).getDouble(4) == 3.0 && u1(i).getLong(5) == 1L,
        s"gap bucket $i: ${u1(i)}")
    }
    assert(u1(3).getDouble(3) == 5.0 && u1(3).getDouble(4) == 5.0 && u1(3).getLong(5) == 0L)
    // single-observation key: exactly one row, no gaps
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getLong(5) == 0L && u2(0).getDouble(4) == 9.0)
    // grid completeness on the real table: per user, rows = max-min+1
    // buckets and gap-count consistency
    val real = Temporal.q93(t)
    val chk = real.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (max(expr("unix_micros(bucket_start)")) - min(expr("unix_micros(bucket_start)"))).as("span"),
        sum(col("is_gap")).as("gaps"))
      .withColumn("expected", col("span") / h + 1)
      .filter(col("n") =!= col("expected"))
    assert(chk.isEmpty, s"per-user grid must be complete: ${chk.take(3).mkString}")
    // invalid step rejected
    val e = intercept[IllegalArgumentException] {
      ev.resampleLocf("user_id", "ts", col("value"), 0L)
    }
    assert(e.getMessage.contains("stepUs"))
  }

  test("editMatches ≡ brute-force cross join for d=1,2; prepared ≡ one-shot; maxLength guard") {
    import spark.implicits._
    // all edit kinds across the two sides: substitution, deletion,
    // insertion, exact copy, and far-away values on both sides
    val catalog = Seq((1L, "abcd"), (2L, "abce"), (3L, "xyz"), (4L, "q"), (5L, ""))
      .toDF("cid", "cname")
    val dirty = Seq((11L, "abxd"), (12L, "abd"), (13L, "abcde"),
      (14L, "abcd"), (15L, "zzz"), (16L, "x"))
      .toDF("qid", "qname")
    def brute(d: Int): Set[(Long, Long, Int)] =
      dirty.crossJoin(catalog)
        .withColumn("dist", levenshtein(col("qname"), col("cname")))
        .filter(col("dist") <= d)
        .select("qid", "cid", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (d <- Seq(1, 2)) {
      val got = dirty.editMatches(catalog, "qid", "qname", "cid", "cname", maxDistance = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(d),
        s"d=$d: got ${got.toSeq.sorted}, brute ${brute(d).toSeq.sorted}")
    }
    // prepared index serves the identical match set
    val prepared = graft.api.Ops.prepareEditIndex(catalog, "cid", "cname", maxDistance = 1)
    val viaPrep = dirty.editMatchesAgainst(prepared, "qid", "qname")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaPrep == brute(1), "prepared form must equal the one-shot matches")
    // the q87 short-string contract holds on BOTH sides
    val long = Seq((99L, "x" * 600)).toDF("qid", "qname")
    val eLeft = intercept[Exception] {
      long.editMatches(catalog, "qid", "qname", "cid", "cname").collect()
    }
    assert(eLeft.getMessage.contains("maxLength"), eLeft.getMessage)
    val eCat = intercept[Exception] {
      dirty.editMatches(long.toDF("cid", "cname"), "qid", "qname", "cid", "cname").collect()
    }
    assert(eCat.getMessage.contains("maxLength"), eCat.getMessage)
  }

  test("weightedSamplePerGroup: exact-k, partitioning-invariant, weight-biased, guards w<=0") {
    import spark.implicits._
    // exact-k and invariance on the real corpus
    def run(parts: Int) = t.documents.repartition(parts)
      .weightedSamplePerGroup("source", "doc_id", col("n_chars"), k = 7, seed = 17L)
      .select("doc_id", "source", "sample_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val a = run(3)
    assert(a == run(7), "the weighted draw must not depend on partitioning")
    val perGroup = a.groupBy(_._2).view.mapValues(_.size)
    assert(perGroup.values.forall(_ == 7), s"exact k per source: $perGroup")
    // weight bias: 100 heavy (w=1000) vs 100 light (w=1) rows, k=50 —
    // the exponential race must overwhelmingly pick heavy rows
    // (deterministic given the seed; expected light picks ≈ 50/1000)
    val planted = (0 until 100).map(i => (i.toLong, "g", 1000.0)) ++
      (100 until 200).map(i => (i.toLong, "g", 1.0))
    val picked = planted.toDF("id", "g", "w")
      .weightedSamplePerGroup("g", "id", col("w"), k = 50, seed = 1L)
      .select("id").collect().map(_.getLong(0))
    assert(picked.length == 50)
    val heavy = picked.count(_ < 100)
    assert(heavy >= 45, s"w=1000 rows must dominate the k=50 draw, got $heavy/50")
    // a smaller k is a PREFIX of a larger k's ranking (the race order
    // is fixed; k only truncates)
    val top10 = planted.toDF("id", "g", "w")
      .weightedSamplePerGroup("g", "id", col("w"), k = 10, seed = 1L)
      .orderBy("sample_rank").select("id").collect().map(_.getLong(0)).toSeq
    val top50 = planted.toDF("id", "g", "w")
      .weightedSamplePerGroup("g", "id", col("w"), k = 50, seed = 1L)
      .orderBy("sample_rank").select("id").collect().map(_.getLong(0)).toSeq
    assert(top50.take(10) == top10, "k must only truncate the fixed race order")
    // non-positive weight fails loudly with the offending id
    val bad = Seq((1L, "g", 5.0), (2L, "g", 0.0)).toDF("id", "g", "w")
    val e = intercept[Exception] {
      bad.weightedSamplePerGroup("g", "id", col("w"), k = 1).collect()
    }
    assert(e.getMessage.contains("non-positive weight") && e.getMessage.contains("id=2"),
      e.getMessage)
  }

  test("pageRank: hub dominance, partitioning invariance, iters=0 uniform, mass bound") {
    import spark.implicits._
    // star: hub 0 ↔ leaves 1..20 (symmetrized) — the hub must
    // out-rank every leaf, and all leaves tie by symmetry
    val star = (1 to 20).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
    def ranksOf(df: org.apache.spark.sql.DataFrame, iters: Int = 3): Map[Long, Long] =
      graft.api.Ops.pageRank(df, "src", "dst", iters = iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = ranksOf(star.toDF("src", "dst"))
    assert(r(0L) > r(1L) * 5, s"hub must dominate: hub=${r(0L)} leaf=${r(1L)}")
    assert((1 to 20).map(i => r(i.toLong)).toSet.size == 1, "leaves must tie exactly")
    // integer arithmetic ⇒ bit-identical under any partitioning
    assert(ranksOf(star.toDF("src", "dst").repartition(7)) == r)
    // total mass stays within the documented floor-leak bound
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 900000000000L,
      s"mass must be ≤ totalMass and leak < 10%: $total")
    // iters = 0 → uniform totalMass/N
    val u = ranksOf(star.toDF("src", "dst"), iters = 0)
    assert(u.values.toSet == Set(1000000000000L / 21), s"uniform start: ${u.values.toSet}")
    // empty edge list rejected
    val e = intercept[IllegalArgumentException] {
      graft.api.Ops.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    }
    assert(e.getMessage.contains("empty"))
  }

  test("pageRank redistributeDangling conserves mass through sinks") {
    import spark.implicits._
    // pure sink graph: 1..4 all point at 5, which has no out-edges —
    // without redistribution the graph drains through node 5; with it
    // total mass holds to floor leakage every iteration
    val sink = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("src", "dst")
    def total(redist: Boolean, iters: Int): Long =
      graft.api.Ops.pageRank(sink, "src", "dst", iters = iters,
          redistributeDangling = redist)
        .agg(sum(col("rank"))).collect()(0).getLong(0)
    val mass = 1000000000000L
    // drained: after one round only the damped base + node 5's intake
    // survive; after three rounds most mass is gone
    assert(total(redist = false, iters = 3) < mass / 2,
      s"sink graph must drain without redistribution: ${total(redist = false, iters = 3)}")
    // conserved: every round loses at most n floors per transfer
    // step (div per giver, div of the dangling share, damping div) —
    // bound generously at 100 units per node per iteration
    val kept = total(redist = true, iters = 3)
    assert(kept > mass - 3L * 5 * 100 && kept <= mass,
      s"redistribution must conserve mass to floor leakage: $kept")
    // determinism: bit-identical under partitioning, like the default
    def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.api.Ops.pageRank(df, "src", "dst", iters = 3, redistributeDangling = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranksOf(sink) == ranksOf(sink.repartition(7)))
    // sinks still end up richer than sources (they receive everything)
    val r = ranksOf(sink)
    assert(r(5L) > r(1L), s"the sink must out-rank its feeders: $r")
  }

  test("funnel: ordered reachability with strict inequality and greedy-earliest optimality") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes the whole funnel in order
      (1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "click"), (1L, 4L, "purchase"),
      // user 2's view precedes their signup → stops at step 1
      (2L, 1L, "view"), (2L, 2L, "signup"), (2L, 3L, "click"),
      // user 3 skips view → click/purchase can't count
      (3L, 5L, "signup"), (3L, 6L, "purchase"),
      // user 4: view at the SAME instant as signup — strict > excludes
      (4L, 1L, "signup"), (4L, 1L, "view"),
      // user 5: greedy-earliest view (@2, not @10) lets click@5 count —
      // a latest-match heuristic would miss this user at step 3
      (5L, 1L, "signup"), (5L, 10L, "view"), (5L, 2L, "view"), (5L, 5L, "click"))
      .map { case (u, s, ty) => (u, s, ty) }
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"), col("event_type"))
    val got = ev.funnel("user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "signup", 5L), (2L, "view", 2L),
      (3L, "click", 2L), (4L, "purchase", 1L)), got.toString)
    // repeated step types rejected; step-count budget enforced
    assert(intercept[IllegalArgumentException] {
      ev.funnel("user_id", "ts", "event_type", Seq("view", "view"))
    }.getMessage.contains("distinct"))
    assert(intercept[IllegalArgumentException] {
      ev.funnel("user_id", "ts", "event_type", Seq.fill(9)("x").zipWithIndex.map(_.toString))
    }.getMessage.contains("1..8"))
  }

  test("funnel: every step emits a row even when no key reaches it") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "signup"), (2L, 2L, "signup"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"), col("event_type"))
    val got = ev.funnel("user_id", "ts", "event_type", Seq("signup", "view", "click"))
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "signup", 2L), (2L, "view", 0L), (3L, "click", 0L)),
      s"empty steps must still yield n_users=0 rows: $got")
  }

  test("funnel withinUs: bounded chains, and a later anchor converting where the earliest fails") {
    import spark.implicits._
    val ev = Seq(
      // user 1 converts fast: everything inside 10 µs of signup@1
      (1L, 1L, "signup"), (1L, 3L, "view"), (1L, 5L, "click"),
      // user 2 converts too slowly: view lands after the deadline
      (2L, 1L, "signup"), (2L, 100L, "view"), (2L, 101L, "click"),
      // user 3: the EARLIEST signup@1 can't reach view@50 within 10,
      // but the later signup@45 anchors a deadline that can — the
      // anchored semantics must count user 3, single-anchor would not
      (3L, 1L, "signup"), (3L, 45L, "signup"), (3L, 50L, "view"), (3L, 52L, "click"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"), col("event_type"))
    val got = ev.funnel("user_id", "ts", "event_type",
        Seq("signup", "view", "click"), withinUs = Some(10L))
      .orderBy("step")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "signup", 3L), (2L, "view", 2L), (3L, "click", 2L)),
      s"bounded funnel must count users 1 and 3 only past step 1: $got")
    // the bound is inclusive of t1 + withinUs and strict after prev
    val edge = Seq((9L, 0L, "signup"), (9L, 10L, "view"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"), col("event_type"))
    val e = edge.funnel("user_id", "ts", "event_type", Seq("signup", "view"),
        withinUs = Some(10L)).orderBy("step")
      .collect().map(r => r.getLong(2)).toSeq
    assert(e == Seq(1L, 1L), s"view exactly at the deadline counts: $e")
    assert(intercept[IllegalArgumentException] {
      ev.funnel("user_id", "ts", "event_type", Seq("signup"), withinUs = Some(0L))
    }.getMessage.contains("positive"))
  }

  test("intervalStats measures the span distribution that picks bucketUs") {
    import spark.implicits._
    // 100 one-hour intervals and 2 day-long stragglers
    val H = 3600000000L
    val ivs = ((1 to 100).map(i => (i.toLong, 0L, H)) ++
      Seq((101L, 0L, 24 * H), (102L, 0L, 24 * H)))
      .toDF("id", "s_us", "e_us")
      .select(col("id"), expr("timestamp_micros(s_us)").as("s"),
        expr("timestamp_micros(e_us)").as("e"))
    val r = ivs.intervalStats("s", "e").collect()(0)
    assert(r.getAs[Long]("n_intervals") == 102L)
    assert(r.getAs[Long]("min_span_us") == H && r.getAs[Long]("max_span_us") == 24 * H)
    assert(r.getAs[Long]("p50_span_us") == H)
    // p95 lands on the dominant span, not the stragglers — the
    // suggested bucket keeps the explode ~2 rows per typical interval
    assert(r.getAs[Long]("suggested_bucket_us") == r.getAs[Long]("p95_span_us"))
    assert(r.getAs[Long]("p95_span_us") == H, r.toString)
  }

  test("scd2History: change/deletion/gap-reinsert/late-insert versioning on a planted series") {
    import spark.implicits._
    def ts(k: Int) = java.sql.Timestamp.valueOf(s"2024-0$k-01 00:00:00")
    // id 1: constant throughout → ONE open version
    // id 2: value changes at t3 → v1 closes AT t3, v2 open
    // id 3: present t1-t2 only → closed at t3 (deletion)
    // id 4: present t1, absent t2, back t3-t4 with IDENTICAL value →
    //       TWO versions (the gap means it was genuinely gone)
    // id 5: appears at t2 (late insert) → open from t2
    // id 6: null value throughout → null is a value, one version
    val rows = Seq(
      (1L, Some("x"), ts(1)), (1L, Some("x"), ts(2)), (1L, Some("x"), ts(3)), (1L, Some("x"), ts(4)),
      (2L, Some("a"), ts(1)), (2L, Some("a"), ts(2)), (2L, Some("b"), ts(3)), (2L, Some("b"), ts(4)),
      (3L, Some("c"), ts(1)), (3L, Some("c"), ts(2)),
      (4L, Some("d"), ts(1)), (4L, Some("d"), ts(3)), (4L, Some("d"), ts(4)),
      (5L, Some("e"), ts(2)), (5L, Some("e"), ts(3)), (5L, Some("e"), ts(4)),
      (6L, None, ts(1)), (6L, None, ts(2)), (6L, None, ts(3)), (6L, None, ts(4))
    ).toDF("id", "v", "snap_ts")
    val got = rows.scd2History("snap_ts", "id", Seq("v"))
      .collect()
      .map(r => (r.getLong(0),
        (Option(r.getString(1)), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getBoolean(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._2.getTime).toSeq).toMap
    assert(got(1L) == Seq((Some("x"), ts(1), None, true)))
    assert(got(2L) == Seq(
      (Some("a"), ts(1), Some(ts(3)), false),
      (Some("b"), ts(3), None, true)))
    assert(got(3L) == Seq((Some("c"), ts(1), Some(ts(3)), false)))
    assert(got(4L) == Seq(
      (Some("d"), ts(1), Some(ts(2)), false), // deletion observed at t2
      (Some("d"), ts(3), None, true)))        // reinsertion = NEW version
    assert(got(5L) == Seq((Some("e"), ts(2), None, true)))
    assert(got(6L) == Seq((None, ts(1), None, true)))
    // versions must tile: each closed valid_to equals either the next
    // version's valid_from (change) or a snapshot with no row (delete)
    assert(got.values.flatten.count(!_._4) == 3) // exactly 3 closed versions
    // partitioning invariance (one shuffle by id; windows reuse it)
    val again = rows.repartition(7).scd2History("snap_ts", "id", Seq("v"))
      .collect().map(_.toString).sorted.toSeq
    val once = rows.scd2History("snap_ts", "id", Seq("v"))
      .collect().map(_.toString).sorted.toSeq
    assert(again == once)
    assert(intercept[IllegalArgumentException] {
      rows.scd2History("snap_ts", "id", Seq.empty)
    }.getMessage.contains("at least one"))
  }

  test("snapshotDiff: change classes, null-safe comparison, unchanged keys absent") {
    import spark.implicits._
    val old = Seq(
      (1L, Some("a"), Some(1.0)),  // unchanged
      (2L, Some("b"), Some(2.0)),  // value changes
      (3L, Some("c"), None),       // null → value = changed
      (4L, None, None),            // both null, stays null = unchanged
      (5L, Some("e"), Some(5.0)))  // deleted
      .toDF("k", "name", "bal")
    val newer = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (3L, Some("c"), Some(3.0)),
      (4L, None, None),
      (6L, Some("f"), Some(6.0)))  // inserted
      .toDF("k", "name", "bal")
    val got = old.snapshotDiff(newer, "k", Seq("name", "bal"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "changed", 5L -> "deleted", 6L -> "inserted"),
      got.toString)
    // empty compare list rejected
    assert(intercept[IllegalArgumentException] {
      old.snapshotDiff(newer, "k", Seq.empty)
    }.getMessage.contains("at least one"))
  }

  test("intervalJoin ≡ brute-force overlap; self/degenerate guards") {
    import spark.implicits._
    def iv(rows: Seq[(Long, Long, Long)]) = rows.toDF("id", "s_us", "e_us")
      .select(col("id"), expr("timestamp_micros(s_us)").as("s"),
        expr("timestamp_micros(e_us)").as("e"))
    val H = 3600000000L
    val a = iv(Seq((1L, 0L, 2 * H), (2L, 3 * H, 4 * H), (3L, 10 * H, 10 * H)))
    val b = iv(Seq((11L, H, 3 * H), (12L, 4 * H, 5 * H), (13L, 20 * H, 21 * H)))
    val got = a.intervalJoin(b, "id", "s", "e", "id", "s", "e", bucketUs = H)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: closed-interval overlap pairs with their lengths
    val brute = Set((1L, 11L, H),        // [0,2h] ∩ [1h,3h] = 1h
      (2L, 11L, 0L),                     // touch at 3h → overlap 0 (closed)
      (2L, 12L, 0L))                     // touch at 4h
    assert(got == brute, s"got $got")
    // self-join: symmetric pairs dedup via a_id < b_id, instants overlap themselves' twins
    val selfGot = a.intervalJoin(a, "id", "s", "e", "id", "s", "e", bucketUs = H)
      .filter(col("a_id") < col("b_id")).collect()
    assert(selfGot.isEmpty, "disjoint self corpus must produce no pairs")
    // end-before-start fails loudly with the id
    val bad = iv(Seq((7L, 5L, 1L)))
    val e1 = intercept[Exception] {
      bad.intervalJoin(b, "id", "s", "e", "id", "s", "e", bucketUs = H).collect()
    }
    assert(e1.getMessage.contains("end before start") && e1.getMessage.contains("7"))
    // bucket-span budget enforced
    val wide = iv(Seq((8L, 0L, 100L * H)))
    val e2 = intercept[Exception] {
      wide.intervalJoin(b, "id", "s", "e", "id", "s", "e",
        bucketUs = H, maxBucketsPerInterval = 10).collect()
    }
    assert(e2.getMessage.contains("buckets"), e2.getMessage)
  }

  test("prepareBoilerplate + stripBoilerplateAgainst ≡ one-shot dedupParagraphs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "BANNER\nunique one\nFOOTER"),
      (2L, "BANNER\nunique two\nFOOTER"),
      (3L, "BANNER\nonly content\nhere\nFOOTER"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val oneShot = rows(docs.dedupParagraphs("doc_id", "text", minDf = 3))
    val prepared = graft.api.Ops.prepareBoilerplate(docs, "doc_id", "text", minDf = 3)
    val viaPrep = rows(docs.stripBoilerplateAgainst(prepared, "doc_id", "text"))
    assert(oneShot == viaPrep, s"$oneShot vs $viaPrep")
    assert(oneShot.head._2 == "unique one", oneShot.toString)
    // an UNSEEN increment strips against the frozen set without
    // contributing to the census
    val inc = Seq((9L, "BANNER\nnovel paragraph")).toDF("doc_id", "text")
    val incRows = rows(inc.stripBoilerplateAgainst(prepared, "doc_id", "text"))
    assert(incRows == Seq((9L, "novel paragraph", 1L, 1L)), incRows.toString)
  }

  test("zscorePerGroup: exact moments, zero-variance null, partitioning-invariant") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0)).toDF("g", "x")
    def zs(parts: Int): Map[(String, Double), Option[Double]] =
      df.repartition(parts).zscorePerGroup("g", col("x"))
        .collect().map(r => (r.getString(0), r.getDouble(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val z = zs(2)
    // group a: mean 2, population var 2/3 → z = ±sqrt(3/2), 0
    val s = math.sqrt(2.0 / 3.0)
    assert(math.abs(z(("a", 1.0)).get - (-1.0 / s)) < 1e-12)
    assert(math.abs(z(("a", 2.0)).get) < 1e-12)
    assert(math.abs(z(("a", 3.0)).get - (1.0 / s)) < 1e-12)
    // zero-variance group has no defined scale → null
    assert(z(("b", 5.0)).isEmpty)
    // decimal moments ⇒ bit-identical under any partitioning
    assert(zs(5) == z)
    // standardized column re-centers: per-group z mean ~ 0 on real data
    val recenter = t.orders.zscorePerGroup("o_orderstatus", col("o_totalprice"))
      .groupBy("o_orderstatus").agg(avg(col("z")).as("m"))
      .collect().map(_.getDouble(1))
    assert(recenter.forall(m => math.abs(m) < 1e-9), recenter.mkString(", "))
  }
}

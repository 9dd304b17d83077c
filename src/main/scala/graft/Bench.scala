package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Times the SURVEY.md §5 headline set (one per operator family) at
  * SPARK_GRAFT_SF_DIR. Each query is forced through the noop sink so
  * the FULL plan executes (a bare count() lets Spark skip projections
  * and windows). One untimed warm-up amortizes JIT/codegen compile,
  * and each query is timed SPARK_GRAFT_BENCH_RUNS (default 3) times
  * with the MEDIAN reported — a single-shot timing cannot distinguish
  * a real plan regression from JIT/AQE/GC noise (VERDICT r3 item #6:
  * apparent +20–30% drifts turned out to be unmeasurable with n=1).
  * Cached lineage-break blocks are dropped between runs so one run's
  * block-manager pressure doesn't contaminate the next.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_topk_revenue", "q05_multijoin",
    "q06_selective_agg", "q08_running_window", "q13_outer_join",
    "q21_asof_join", "q22_sessionize", "q23_time_bucket",
    "q26_nested_explode", "q29_fingerprint", "q31_dedup_exact",
    "q32_jaccard_pairs", "q33_minhash_lsh", "q35_cosine_topk",
    "q36_ann_ivf", "q39_range_join", "q42_label_centroids",
    "q46_dedup_clusters", "q47_bigram_stats", "q48_tfidf",
    "q53_embed_neardup", "q55_curation", "q57_seq_pack",
    "q58_decontaminate", "q60_refine", "q61_redact", "q62_dedup_incr",
    "q63_mixture_sample", "q64_repetition_filter", "q65_bloom_semijoin",
    "q66_zorder", "q67_token_cap", "q68_chunk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local iteration: SPARK_GRAFT_BENCH_ONLY=q53_embed_neardup,q33_minhash_lsh
    // times just those queries (the driver never sets it → full set)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // drop cached localCheckpoint/cache blocks a run left behind, so
    // timings stay independent (a long-lived JVM accumulates
    // block-manager pressure otherwise). Blocking, then a GC nudge:
    // async unpersist + un-collected RDD references leave executor
    // blocks + shuffle files alive until the ContextCleaner happens to
    // run — over 33 queries × 3 runs that pressure snowballed onto the
    // checkpoint-heavy queries (q53 timed 12s→31s→45s inside the full
    // sweep vs a flat ~1s isolated; r4-vs-r5's 2× artifact drift was
    // the same effect).
    def dropCachedBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { runOnce(name); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
      val t = (System.nanoTime() - t0) / 1e9
      dropCachedBlocks()
      if (ok) t else -1.0
    }

    // warm-up: JIT + codegen + FS metadata; never let it kill the run
    // (the driver needs the JSON line even on a misconfigured SF dir)
    try runOnce("q01_pricing_summary")
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    dropCachedBlocks()

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val results: Seq[(String, Seq[Double])] =
      headline.filter(n => only.forall(_.contains(n))).map { name =>
        name -> (1 to runs).map(_ => timeOnce(name)).filter(_ >= 0)
      }
    def med(ts: Seq[Double]): Double = if (ts.isEmpty) -1.0 else median(ts)
    val qs = results.map { case (k, ts) => "\"" + k + f"\":${med(ts)}%.3f" }.mkString("{", ",", "}")
    // raw per-run times alongside the medians: two artifacts that
    // differ on identical binaries (r4 vs r5 drifted 2×) are then
    // self-diagnosing as environment skew — wide runs, stable median
    val runsJson = results.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(r => med(r._2)).filter(_ >= 0).sum
    val sf = sfDir.split("/").last.stripPrefix("sf")
    println(f"""{"metric":"headline_total","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$runsJson,"sf":"$sf"}""")
    spark.stop()
  }
}

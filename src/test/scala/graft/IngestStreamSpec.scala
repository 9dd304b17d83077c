package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import graft.sources.Tables
import graft.streaming.Streams

/** The four SELF-MAINTAINING dedup ingest streams (r12): per trigger,
  * dedup against the current catalog, absorb the survivors, emit
  * (survivors, grown catalog). The property the frozen-catalog dedup
  * streams cannot have — a near-dup arriving triggers AFTER its
  * original is dropped — plus exact equivalence with the manual batch
  * fold `kept = dedup(B); catalog = absorb(kept)`, and the
  * IngestLoop replay discipline (retry re-emits without re-absorb;
  * batchId regression fails loudly).
  */
class IngestStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val t = Tables(spark, sfDir)
  private def ckpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ingest_$tag").toString

  test("IngestLoop: retry re-emits without re-absorb; batchId regression fails loudly") {
    import spark.implicits._
    var absorbs = 0
    val emitted = scala.collection.mutable.ArrayBuffer[(Set[Long], Int)]()
    val loop = new Streams.IngestLoop[DataFrame, Set[Long]](
      Set(1L, 2L),
      (cat, batch) => batch.filter(!col("id").isin(cat.toSeq: _*)),
      (cat, kept) => { absorbs += 1; cat ++ kept.collect().map(_.getLong(0)) },
      (kept, cat) => emitted += ((kept.collect().map(_.getLong(0)).toSet, cat.size)))
    loop.handle(Seq(1L, 3L).toDF("id"), 0L)
    loop.handle(Seq(3L, 4L).toDF("id"), 1L)
    assert(emitted.toSeq == Seq((Set(3L), 3), (Set(4L), 4)))
    assert(absorbs == 2)
    // a foreachBatch RETRY of the absorbed batch re-runs the dedup
    // against the PRE-absorb catalog and does NOT absorb again
    loop.handle(Seq(3L, 4L).toDF("id"), 1L)
    assert(absorbs == 2, "a replayed batch must not re-absorb")
    assert(emitted.last == ((Set(4L), 4)),
      "the retry must re-emit the same survivors against the pre-absorb catalog")
    // a batchId BELOW the absorbed one is never a legitimate retry
    val e = intercept[IllegalStateException] { loop.handle(Seq(9L).toDF("id"), 0L) }
    assert(e.getMessage.contains("wiped"))
  }

  test("text ingest: a near-dup arriving a trigger after its original is dropped; ≡ the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = t.documents.select(col("doc_id"), col("text"))
    val seed = docs.filter(col("doc_id") < 100)
    val b1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // trigger 2: exact clones of trigger 1 under fresh ids + novel docs
    val b2 = b1.take(20).map { case (id, tx) => (id + 500000L, tx) } ++
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 200)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dir = ckpt("text")
    val prepared = graft.api.Ops.prepareCatalog(seed, "doc_id", "text",
      checkpointDir = Some(dir))
    // unreliable prep refuses up front (r12 — PreparedCatalog joined
    // the reliable-flag contract, the last artifact without it)
    val e = intercept[IllegalArgumentException] {
      Streams.dedupIngestStream(MemoryStream[(Long, String)].toDF()
        .toDF("doc_id", "text"), "doc_id", "text",
        graft.api.Ops.prepareCatalog(seed, "doc_id", "text"),
        0.5, dir, (_, _) => ())
    }
    assert(e.getMessage.contains("reliable"))
    val keptPerTrigger = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    @volatile var lastCat: Option[graft.api.Ops.PreparedCatalog] = None
    val stream = MemoryStream[(Long, String)]
    val q = Streams.dedupIngestStream(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", prepared,
      threshold = 0.5, checkpointDir = dir,
      sink = (kept, cat) => { keptPerTrigger += kept.select("doc_id")
        .collect().map(_.getLong(0)).toSet; lastCat = Some(cat) })
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    assert(keptPerTrigger.size == 2)
    // the self-maintaining property: trigger-2 clones of trigger-1
    // SURVIVORS are dropped — the frozen-catalog stream keeps them
    val survivors1 = keptPerTrigger(0)
    val cloned = b1.take(20).map(_._1).filter(survivors1).map(_ + 500000L).toSet
    assert(cloned.nonEmpty, "the corpus must plant cross-trigger clones")
    assert(keptPerTrigger(1).intersect(cloned).isEmpty,
      "a clone of an already-ingested survivor must be dropped")
    // exact equivalence with the manual batch fold
    var cat = graft.api.Ops.prepareCatalog(seed, "doc_id", "text")
    val foldKept = Seq(b1, b2).map { b =>
      val kept = graft.api.Ops.dedupAgainstPrepared(
        b.toDF("doc_id", "text"), "doc_id", "text", cat, 0.5)
      cat = cat.absorb(kept, "text", Some(dir))
      kept.select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(keptPerTrigger.toSeq == foldKept, "stream ≡ per-batch fold")
    assert(lastCat.get.shingles.count() == cat.shingles.count(),
      "the sink's final catalog carries every absorbed survivor")
  }

  test("image ingest: later-trigger re-encodes dropped, quarantined rows absorbed flagged; ≡ fold; unreliable refused") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val media = Multimodal.attachMedia(t)
    val seed = media.filter(_.doc_id < 200)
    val b1 = media.filter(r => r.doc_id >= 200 && r.doc_id < 280).collect().toSeq
    // trigger 2: the SAME payloads under fresh ids (hamming 0 to
    // trigger 1's survivors), novel rows, and one undecodable row
    val b2 = b1.take(30).map(r => r.copy(doc_id = r.doc_id + 900000L)) ++
      media.filter(r => r.doc_id >= 280 && r.doc_id < 360).collect().toSeq :+
      MediaRecord(999999L, "not an image".getBytes("UTF-8"), "image", 0, 0)
    val dir = ckpt("image")
    val prepared = graft.api.Ops.prepareImageCatalog(seed, Some(dir))
    val e = intercept[IllegalArgumentException] {
      Streams.imageDedupIngestStream(MemoryStream[MediaRecord].toDS(),
        graft.api.Ops.prepareImageCatalog(seed), dir, (_, _) => ())
    }
    assert(e.getMessage.contains("reliable"))
    val keptPerTrigger = scala.collection.mutable.ArrayBuffer[Map[Long, Boolean]]()
    @volatile var lastCat: Option[graft.api.Ops.PreparedImageCatalog] = None
    val stream = MemoryStream[MediaRecord]
    val q = Streams.imageDedupIngestStream(stream.toDS(), prepared, dir,
      (kept, cat) => { keptPerTrigger += kept.collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap; lastCat = Some(cat) })
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    assert(keptPerTrigger.size == 2)
    val survivors1 = keptPerTrigger(0).filter(_._2).keySet
    val cloned = b1.take(30).map(_.doc_id).filter(survivors1).map(_ + 900000L).toSet
    assert(cloned.nonEmpty, "the corpus must plant cross-trigger re-encodes")
    assert(keptPerTrigger(1).keySet.intersect(cloned).isEmpty,
      "a byte-identical re-submit of an ingested survivor must be dropped")
    assert(keptPerTrigger(1).get(999999L).contains(false),
      "an undecodable row is kept but flagged")
    // the quarantined row's hash is IN the catalog, still flagged
    assert(lastCat.get.hashes.filter(col("doc_id") === 999999L &&
      !col("decoded_real")).count() == 1L)
    // exact equivalence with the manual batch fold
    var cat = graft.api.Ops.prepareImageCatalog(seed, Some(dir))
    val foldKept = Seq(b1, b2).map { b =>
      val kept = cat.dedup(spark.createDataset(b))
      cat = cat.absorbHashRows(kept, Some(dir))
      kept.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    }
    assert(keptPerTrigger.toSeq == foldKept, "stream ≡ per-batch fold")
    assert(lastCat.get.hashes.count() == cat.hashes.count())
    assert(lastCat.get.reliable, "every ingest absorb checkpoints reliably")
  }

  test("audio ingest: gain-scaled later-trigger clones dropped; ≡ fold; unreliable refused") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val media = Multimodal.attachMedia(t)
    val seed = media.filter(_.doc_id < 200)
    // the corpus's short synthetic clips alias heavily (samples are
    // docId-mod-4096 arithmetic), so trigger 1 PLANTS six long blocky
    // clips guaranteed distinct from the seed — their gain clones are
    // the cross-trigger near-dups under test
    def clip(a: Int, b: Int): Array[Short] =
      Array.tabulate(6500)(i => ((((i / 100) * a + b) % 200) * 8).toShort)
    val planted = (0 until 6).map(k => MediaRecord(700000L + k,
      Multimodal.wavBytes(8000, 1, clip(37 + 2 * k, 31 * k)), "audio", 8000, 1))
    val b1 = media.filter(r => r.doc_id >= 200 && r.doc_id < 280)
      .collect().toSeq ++ planted
    // trigger 2: 2×-gain re-encodes of trigger 1's decodable audio
    // (hamming 0 by the gain-invariance argument) + novel rows
    val clones = b1.filter(_.kind == "audio").flatMap { r =>
      Multimodal.wavSamples(r.payload).map { case (rate, ch, s) =>
        MediaRecord(r.doc_id + 900000L,
          Multimodal.wavBytes(rate, ch, s.map(x => (x * 2).toShort)), "audio", rate, ch)
      }
    }
    val b2 = clones ++ media.filter(r => r.doc_id >= 280 && r.doc_id < 360).collect().toSeq
    val dir = ckpt("audio")
    val prepared = graft.api.Ops.prepareAudioCatalog(seed, Some(dir))
    val e = intercept[IllegalArgumentException] {
      Streams.audioDedupIngestStream(MemoryStream[MediaRecord].toDS(),
        graft.api.Ops.prepareAudioCatalog(seed), dir, (_, _) => ())
    }
    assert(e.getMessage.contains("reliable"))
    val keptPerTrigger = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    @volatile var lastCat: Option[graft.api.Ops.PreparedAudioCatalog] = None
    val stream = MemoryStream[MediaRecord]
    val q = Streams.audioDedupIngestStream(stream.toDS(), prepared, dir,
      (kept, cat) => { keptPerTrigger += kept.collect()
        .map(_.getLong(0)).toSet; lastCat = Some(cat) })
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val survivors1 = keptPerTrigger(0)
    val cloned = clones.map(_.doc_id).filter(id => survivors1(id - 900000L)).toSet
    assert(cloned.nonEmpty, "the corpus must plant cross-trigger gain clones")
    assert(keptPerTrigger(1).intersect(cloned).isEmpty,
      "a gain-scaled clone of an ingested survivor must be dropped")
    var cat = graft.api.Ops.prepareAudioCatalog(seed, Some(dir))
    val foldKept = Seq(b1, b2).map { b =>
      val kept = cat.dedup(spark.createDataset(b))
      cat = cat.absorbHashRows(kept, Some(dir))
      kept.collect().map(_.getLong(0)).toSet
    }
    assert(keptPerTrigger.toSeq == foldKept, "stream ≡ per-batch fold")
  }

  test("video ingest: frame-doubled later-trigger clones dropped; ≡ fold; unreliable refused") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val media = Multimodal.attachMedia(t)
    val seed = media.filter(_.doc_id < 200)
    // plant six animated clips (hashed-noise frames — independent
    // content) whose FRAME-DOUBLED re-encodes arrive a trigger later
    val pal = Array.tabulate(16)(g => (g * 17, g * 17, g * 17))
    def h32(a: Int, b: Int, cc: Int, d: Int): Int = {
      var x = a * 0x9E3779B1 + b * 0x85EBCA77 + cc * 0xC2B2AE3D + d * 0x27D4EB2F
      x ^= x >>> 15; x *= 0x2545F491; x ^= x >>> 13
      x & 0x7fffffff
    }
    def clip(c: Int, reps: Int): Array[Byte] =
      Multimodal.gifBytesAnimated(16, 12, pal, (0 until 8).flatMap(f =>
        Seq.fill(reps)((x: Int, y: Int) => h32(c, f, x >> 1, y >> 1) % 16)))
    val planted = (0 until 6).map(k =>
      MediaRecord(700000L + k, clip(k, 1), "video", 16, 12))
    val b1 = media.filter(r => r.doc_id >= 200 && r.doc_id < 280)
      .collect().toSeq ++ planted
    val clones = (0 until 6).map(k =>
      MediaRecord(900000L + k, clip(k, 2), "video", 16, 12))
    val b2 = clones ++ media.filter(r => r.doc_id >= 280 && r.doc_id < 360).collect().toSeq
    val dir = ckpt("video")
    val prepared = graft.api.Ops.prepareVideoCatalog(seed, checkpointDir = Some(dir))
    val e = intercept[IllegalArgumentException] {
      Streams.videoDedupIngestStream(MemoryStream[MediaRecord].toDS(),
        graft.api.Ops.prepareVideoCatalog(seed), dir, (_, _) => ())
    }
    assert(e.getMessage.contains("reliable"))
    val keptPerTrigger = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    @volatile var lastCat: Option[graft.api.Ops.PreparedVideoCatalog] = None
    val stream = MemoryStream[MediaRecord]
    val q = Streams.videoDedupIngestStream(stream.toDS(), prepared, dir,
      (kept, cat) => { keptPerTrigger += kept.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet; lastCat = Some(cat) })
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val survivors1 = keptPerTrigger(0)
    val cloned = (0 until 6).filter(k => survivors1(700000L + k))
      .map(k => 900000L + k).toSet
    assert(cloned.nonEmpty, "the corpus must plant cross-trigger frame-doubled clones")
    assert(keptPerTrigger(1).intersect(cloned).isEmpty,
      "a frame-doubled clone of an ingested survivor must be dropped")
    var cat = graft.api.Ops.prepareVideoCatalog(seed, checkpointDir = Some(dir))
    val foldKept = Seq(b1, b2).map { b =>
      val kept = cat.dedup(spark.createDataset(b))
      cat = cat.absorbHashRows(kept, Some(dir))
      kept.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    }
    assert(keptPerTrigger.toSeq == foldKept, "stream ≡ per-batch fold")
    assert(lastCat.get.frameHashes.count() == cat.frameHashes.count())
  }

  test("vector ingest: later-trigger duplicate embeddings dropped; ≡ fold; unreliable refused") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val vecs = t.embeddings.select(col("vec_id"), col("embedding"))
    val seed = vecs.filter(col("vec_id") < 100)
    def rows(df: DataFrame) =
      df.as[(Long, Array[Float])].collect().toSeq
    val b1 = rows(vecs.filter(col("vec_id") >= 100 && col("vec_id") < 160))
    val b2 = b1.take(25).map { case (id, e) => (id + 500000L, e) } ++
      rows(vecs.filter(col("vec_id") >= 160 && col("vec_id") < 220))
    val dir = ckpt("vec")
    val prepared = graft.api.Ops.prepareVecCatalog(seed, "vec_id", "embedding",
      dim = 64, checkpointDir = Some(dir))
    val e = intercept[IllegalArgumentException] {
      Streams.vecDedupIngestStream(
        MemoryStream[(Long, Array[Float])].toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding",
        graft.api.Ops.prepareVecCatalog(seed, "vec_id", "embedding", dim = 64),
        0.95, dir, (_, _) => ())
    }
    assert(e.getMessage.contains("reliable"))
    val keptPerTrigger = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val stream = MemoryStream[(Long, Array[Float])]
    val q = Streams.vecDedupIngestStream(
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      prepared, 0.95, dir,
      (kept, _) => keptPerTrigger += kept.select("vec_id")
        .collect().map(_.getLong(0)).toSet)
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val survivors1 = keptPerTrigger(0)
    val cloned = b1.take(25).map(_._1).filter(survivors1).map(_ + 500000L).toSet
    assert(cloned.nonEmpty, "the corpus must plant cross-trigger vector clones")
    assert(keptPerTrigger(1).intersect(cloned).isEmpty,
      "an exact-duplicate embedding of an ingested survivor must be dropped")
    var cat = graft.api.Ops.prepareVecCatalog(seed, "vec_id", "embedding",
      dim = 64, checkpointDir = Some(dir))
    val foldKept = Seq(b1, b2).map { b =>
      val df = b.toDF("vec_id", "embedding")
      val kept = graft.api.Ops.vecDedupAgainstPrepared(df, "vec_id", "embedding", cat, 0.95)
      cat = cat.absorb(kept, "embedding", Some(dir))
      kept.select("vec_id").collect().map(_.getLong(0)).toSet
    }
    assert(keptPerTrigger.toSeq == foldKept, "stream ≡ per-batch fold")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Video-modality near-dup dedup (r12 — the third media modality,
  * fed by the real ALL-FRAMES GIF decoder): animated encode/decode
  * round-trips (ImageIO-cross-validated), frame sampling geometry,
  * the frame-rate and container invariances of the frame-hash
  * recipe, and the pair/catalog operators. Spec-gated like the
  * image/audio families (decode runs on binary payloads the SQL
  * oracle cannot replay — stated in the SURVEY §2 rows).
  */
class VideoDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private val pal = Array.tabulate(16)(g => (g * 17, g * 17, g * 17))
  // frame f of clip c: hashed noise at 2×2-pixel granularity — a
  // plain shifted-gradient pattern aliases (two frames differing
  // only by a mod-16 offset can coincide exactly), while hashed
  // cells make distinct (c, f) frames independent, so only planted
  // clones match
  private def h32(a: Int, b: Int, cc: Int, d: Int): Int = {
    var x = a * 0x9E3779B1 + b * 0x85EBCA77 + cc * 0xC2B2AE3D + d * 0x27D4EB2F
    x ^= x >>> 15; x *= 0x2545F491; x ^= x >>> 13
    x & 0x7fffffff
  }
  private def frame(c: Int, f: Int): (Int, Int) => Int =
    (x, y) => h32(c, f, x >> 1, y >> 1) % 16
  private def clip(c: Int, nFrames: Int, reps: Int = 1): Array[Byte] =
    Multimodal.gifBytesAnimated(16, 12, pal,
      (0 until nFrames).flatMap(f => Seq.fill(reps)(frame(c, f))))

  test("gifFrames: animated round-trip bit-exact, ImageIO-cross-validated; corrupt refused") {
    val b = clip(3, 5)
    val Some((w, h, frames)) = Multimodal.gifFrames(b)
    assert((w, h, frames.size) == ((16, 12, 5)))
    for (f <- 0 until 5; y <- 0 until h; x <- 0 until w) {
      val (r, _, _) = pal(frame(3, f)(x, y))
      assert((frames(f)(3 * (y * w + x)) & 0xff) == r,
        s"frame $f pixel ($x,$y) must round-trip bit-exact")
    }
    // cross-validation: the JDK's own GIF reader decodes OUR encoder's
    // animated stream to the same per-frame pixels (the complementary-
    // bug class a self-round-trip cannot see)
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b)))
    assert(reader.getNumImages(true) == 5)
    for (f <- 0 until 5) {
      val img = reader.read(f)
      for (y <- 0 until h; x <- 0 until w) {
        val expected = pal(frame(3, f)(x, y))._1
        assert((img.getRGB(x, y) & 0xff) == expected,
          s"ImageIO frame $f pixel ($x,$y) must agree with gifFrames")
      }
    }
    // gifPixels = the first frame
    val Some((_, _, first)) = Multimodal.gifPixels(b)
    assert(java.util.Arrays.equals(first, frames.head))
    // corrupt: truncation and a missing trailer refuse cleanly
    assert(Multimodal.gifFrames(b.dropRight(1)).isEmpty, "no trailer → None")
    assert(Multimodal.gifFrames(b.take(b.length / 2)).isEmpty)
    assert(Multimodal.gifFrames("GIF89a junk".getBytes("US-ASCII")).isEmpty)
  }

  test("gifFrames: aggregate decode budget refuses hostile many-frame streams; gifPixels stops at frame 0") {
    // r13 ADVICE: a small payload with a high LZW ratio and many
    // full-size frames must refuse PAST the budget instead of
    // allocating multi-GB (OutOfMemoryError would escape the
    // never-throws contract). Exercised via the package-private
    // budget knob so the test doesn't itself allocate 256 MiB; the
    // production path runs the same code with GifDecodeBudgetBytes.
    val b = clip(7, 5) // 5 frames × 3·16·12 = 2880 B decoded
    val perFrame = 3L * 16 * 12
    assert(Multimodal.gifFramesBounded(b, Int.MaxValue, 5 * perFrame).map(_._3.size)
      .contains(5), "a stream exactly AT the budget decodes whole")
    assert(Multimodal.gifFramesBounded(b, Int.MaxValue, 5 * perFrame - 1).isEmpty,
      "one byte past the budget refuses the stream")
    assert(Multimodal.gifFramesBounded(b, Int.MaxValue, 0L).isEmpty)
    // the real constant admits any sane catalog GIF
    assert(Multimodal.gifFrames(b).map(_._3.size).contains(5))
    // gifPixels reads ONE frame — it neither walks the remaining
    // frames nor trips a budget the full animation would: frame 0
    // decodes even from a stream whose TAIL is corrupt
    val cut = b.take(b.length * 2 / 5) // frame 0 complete, later frames mangled
    assert(Multimodal.gifFrames(cut).isEmpty, "the all-frames walk still refuses")
    val still = Multimodal.gifPixels(cut)
    assert(still.nonEmpty, "gifPixels must stop after frame 0")
    val Some((_, _, f0)) = Multimodal.gifPixels(b)
    assert(java.util.Arrays.equals(still.get._3, f0),
      "the early-stopped frame 0 is bit-identical to the full walk's")
  }

  test("videoFrameHashes: timeline sampling, frame-doubling invariance, maxFrames cap, stub quarantine") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, clip(1, 8), "video", 16, 12),
      MediaRecord(2L, clip(1, 8, reps = 2), "video", 16, 12), // 2× frame rate
      MediaRecord(3L, clip(1, 40), "video", 16, 12),          // above the cap
      MediaRecord(4L, "not a gif".getBytes("UTF-8"), "video", 0, 0)).toDS()
    val fh = Multimodal.videoFrameHashes(recs, maxFrames = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getBoolean(4)))
    val byDoc = fh.groupBy(_._1)
    assert(byDoc(1L).length == 8 && byDoc(1L).forall(_._4 == 8))
    // the doubled clip samples 16 frames = each original twice: its
    // hash SET equals the original's (the frame-rate invariance)
    assert(byDoc(2L).length == 16)
    assert(byDoc(2L).map(_._3).toSet == byDoc(1L).map(_._3).toSet,
      "a 2× frame-rate re-encode must sample the same frame-hash set")
    assert(byDoc(3L).length == 16, "a long clip is capped at maxFrames rows")
    assert(byDoc(4L).toSeq == Seq((4L, 0, byDoc(4L).head._3, 1, false)),
      "an undecodable payload contributes one flagged stub row")
  }

  test("videoNearDups pairs frame-doubled and container re-encodes, not distinct clips or stubs") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, clip(1, 8), "video", 16, 12),
      MediaRecord(2L, clip(1, 8, reps = 2), "video", 16, 12), // frame-doubled
      MediaRecord(3L, Multimodal.gifBytesAnimated(16, 12, pal,
        (0 until 8).map(f => frame(1, f)), delayCs = 10), "video", 16, 12), // container delta
      MediaRecord(4L, clip(9, 8), "video", 16, 12),           // distinct clip
      MediaRecord(5L, "garbage".getBytes("UTF-8"), "video", 0, 0)).toDS()
    val pairs = Ops.videoNearDups(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "a 2× frame-rate re-encode must pair")
    assert(pairs.contains((1L, 3L)), "a delay-only container re-encode must pair")
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "a distinct clip must not pair")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "stub rows must be excluded from pairing")
    // the matched fractions behind the planted pairs are exact
    val full = Ops.videoNearDups(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getInt(3), r.getLong(4), r.getInt(5)))).toMap
    assert(full((1L, 2L)) == ((8L, 8, 16L, 16)),
      "every original frame and every doubled frame must match")
  }

  test("catalog form dedups increments; quarantine kept flagged; partial overlap below threshold survives") {
    import spark.implicits._
    val catalog = Multimodal.videoFrameHashes(Seq(
      MediaRecord(1L, clip(1, 8), "video", 16, 12),
      MediaRecord(4L, clip(9, 8), "video", 16, 12)).toDS(), maxFrames = 16)
    val inc = Seq(
      MediaRecord(20L, clip(1, 8, reps = 2), "video", 16, 12), // dup of 1
      MediaRecord(21L, clip(5, 8), "video", 16, 12),           // novel
      MediaRecord(22L, "junk".getBytes("UTF-8"), "video", 0, 0)).toDS()
    val kept = Ops.videoDedupAgainstCatalog(inc, catalog)
      .select("doc_id", "decoded_real").distinct().collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!kept.contains(20L), "a catalog near-dup must be dropped")
    assert(kept.get(21L).contains(true), "a novel clip survives, decoded_real")
    assert(kept.get(22L).contains(false),
      "an undecodable row is KEPT but flagged — quarantine, not silent loss")
    // a clip sharing exactly 2 of its 8 frames with the catalog
    // (frac 0.25) survives at 0.5 and drops once the threshold
    // admits it — the fraction gate is doing the deciding
    val partial = Seq(MediaRecord(30L, Multimodal.gifBytesAnimated(16, 12, pal,
      (0 until 2).map(f => frame(1, f)) ++ (0 until 6).map(f => frame(7, f))),
      "video", 16, 12)).toDS()
    val keptPartial = Ops.videoDedupAgainstCatalog(partial, catalog)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(keptPartial.contains(30L),
      "2/8 matched frames is below the 0.5 threshold — must survive")
    val dropPartial = Ops.videoDedupAgainstCatalog(partial, catalog,
      minFrameMatch = 0.25).select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(!dropPartial.contains(30L),
      "2/8 matched frames reaches a 0.25 threshold — must drop")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Audio-modality near-dup dedup (r12 — the audio sibling of the
  * q112 image family, fed by the real WAV decoder): the 64-bit
  * energy-gradient fingerprint, its invariances (amplitude gain,
  * container re-encode), and the banded pair/catalog operators.
  * Spec-gated like the image family (decode runs on binary payloads
  * the SQL oracle cannot replay — stated in the SURVEY §2 rows).
  */
class AudioDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  // a blocky 6500-sample test clip: 65 segments of 100 samples, each
  // segment holding one flat amplitude level — the audioHash segment
  // partition aligns to the blocks, so block-level energy structure
  // is exactly what the hash sees (the blockPixel trick, 1-D)
  private def blockAmp(k: Int): Int = ((k * 37) % 200) * 8
  private def clip(amp: Int => Int, jitter: Int => Int = _ => 0): Array[Short] =
    Array.tabulate(6500)(i => (amp(i / 100) + jitter(i)).toShort)
  private def wav(samples: Array[Short], rate: Int = 8000): Array[Byte] =
    Multimodal.wavBytes(rate, 1, samples)

  test("audioHash: gain-invariant, jitter-stable, container-independent, empty-safe") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = clip(blockAmp)
    val hBase = Multimodal.audioHash(base)
    // uniform 2× gain multiplies every segment energy by exactly 4 —
    // every strict inequality keeps its sign → IDENTICAL hash (the
    // brightness argument, in decibels). The planted levels stay
    // inside 16-bit range at 2×, so the scaling is exact
    assert(ham(hBase, Multimodal.audioHash(base.map(s => (s * 2).toShort))) == 0,
      "a uniform positive gain must not move a single fingerprint bit")
    // tiny per-sample jitter (±1 against levels spaced ≥ 8 apart)
    // cannot cross any energy-gradient margin
    assert(ham(hBase, Multimodal.audioHash(clip(blockAmp, i => (i % 3) - 1))) == 0,
      "sub-margin noise must not flip gradient signs")
    // container independence: the SAME samples behind a different
    // header (sample rate is metadata) hash identically — the hash
    // reads decoded PCM, not bytes
    val h1 = Multimodal.wavSamples(wav(base, rate = 8000)).get._3
    val h2 = Multimodal.wavSamples(wav(base, rate = 16000)).get._3
    assert(Multimodal.audioHash(h1) == Multimodal.audioHash(h2),
      "8 kHz and 16 kHz containers of the same PCM must hash identically")
    // a structurally different clip is far away
    val other = clip(k => ((k * 91 + 55) % 200) * 8)
    assert(ham(hBase, Multimodal.audioHash(other)) > 12,
      "distinct energy patterns must not collide")
    // an empty data chunk hashes to 0 instead of dividing by zero
    assert(Multimodal.audioHash(Array.empty[Short]) == 0L)
    // a clip shorter than 65 segments degenerates to ≥1-sample
    // segments without out-of-bounds reads
    assert(Multimodal.audioHash(Array[Short](3, -7, 12)) ==
      Multimodal.audioHash(Array[Short](3, -7, 12)))
  }

  test("audioNearDups pairs re-encodes, skips stubs; catalog form dedups increments") {
    import spark.implicits._
    val base = clip(blockAmp)
    val gained = base.map(s => (s * 2).toShort)
    val other = clip(k => ((k * 91 + 55) % 200) * 8)
    val third = clip(k => ((k * 13 + 140) % 200) * 8)
    val recs = Seq(
      MediaRecord(1L, wav(base), "audio", 8000, 1),
      MediaRecord(2L, wav(gained), "audio", 8000, 1),
      MediaRecord(3L, wav(base, rate = 16000), "audio", 16000, 1),
      MediaRecord(4L, wav(other), "audio", 8000, 1),
      MediaRecord(5L, "not audio at all".getBytes("UTF-8"), "audio", 0, 0)
    ).toDS()
    val pairs = Ops.audioNearDups(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "an amplitude-doubled re-encode must pair")
    assert(pairs.contains((1L, 3L)), "a container re-encode must pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "a distinct clip must not pair")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "stub rows are hash noise and must be excluded from pairing")
    // incremental form: catalog = {base, other}; increment = {gained
    // (dup of base), third (novel), garbage (undecodable)}
    val catalog = Multimodal.audioHashes(Seq(
      MediaRecord(1L, wav(base), "audio", 8000, 1),
      MediaRecord(4L, wav(other), "audio", 8000, 1)).toDS())
    val inc = Seq(
      MediaRecord(20L, wav(gained), "audio", 8000, 1),
      MediaRecord(21L, wav(third), "audio", 8000, 1),
      MediaRecord(22L, "garbage bytes".getBytes("UTF-8"), "audio", 0, 0)).toDS()
    val kept = Ops.audioDedupAgainstCatalog(inc, catalog)
    val keptRows = kept.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!keptRows.contains(20L), "a catalog near-dup must be dropped")
    assert(keptRows.get(21L).contains(true), "a novel clip survives, decoded_real")
    assert(keptRows.get(22L).contains(false),
      "an undecodable row is KEPT but flagged — quarantine, not silent loss")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column handling (SURVEY.md §2 q37 + pipeline).
  *
  * Media payloads are `binary` columns carrying REAL container
  * headers (PNG / JPEG / GIF89a / RIFF-WAV — actual format bytes,
  * synthesized by [[mediaHeader]]) followed by the payload body.
  * Metadata extraction is real parsing:
  *
  *  - fixed-offset formats (PNG IHDR, GIF logical screen, WAV fmt)
  *    parse as pure codegen'd expressions (`substring`+`hex`+`conv`
  *    — no UDF) in [[mediaMeta]];
  *  - JPEG's variable-offset SOF marker needs a scan → a pure-JVM
  *    marker walk ([[jpegDims]]) in the typed path (no codec libs).
  *
  * Content decode is REAL for the codec-free formats — they are pure
  * fixed-offset byte arithmetic, no codec library needed:
  *
  *  - WAV 16-bit PCM: RIFF chunk walk → true sample statistics
  *    ([[wavSamples]]);
  *  - BMP 24bpp uncompressed: header + bottom-up padded rows → true
  *    pixel statistics ([[bmpPixels]]);
  *  - PPM P6: ASCII header + raw RGB triples ([[ppmPixels]]).
  *
  * Only compressed-content formats (PNG deflate, JPEG DCT, GIF LZW)
  * keep the deterministic STUB (`stubDecode` — no codec libraries in
  * this container); swap it for a real codec on a cluster that has
  * them.
  */
object Multimodal {

  /** q37: binary payload metadata — byte length + content hash.
    * (Oracle-checked; binary is the utf8 payload of the doc text.)
    */
  def q37(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
      md5(col("text").cast("binary")).as("content_md5"),
      col("source").as("modality_hint"))
      .orderBy(col("doc_id"))

  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte], kind: String, width: Int, height: Int)
  final case class MediaFeatures(
      doc_id: Long, kind: String, features: Array[Float])
  final case class MediaFrame(
      doc_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** Real container header bytes for one media record. PNG: signature
    * + IHDR chunk; JPEG: SOI + APP0/JFIF + SOF0; GIF89a: logical
    * screen descriptor (little-endian dims); WAV: RIFF/WAVE + fmt
    * chunk (channels @22 LE, sample rate @24 LE). For audio, `width`
    * carries the sample rate and `height` the channel count.
    */
  private[operators] def mediaHeader(kind: String, w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    kind match {
      case "png" =>
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
          be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
          Array[Byte](8, 2, 0, 0, 0) ++ be32(0) // bit depth/color; CRC unverified
      case "jpeg" =>
        Array[Byte](0xff.toByte, 0xd8.toByte) ++                       // SOI
          Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++         // APP0 len
          "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0) ++
          Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++         // SOF0 len
          Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 0x11, 0)
      case "gif" =>
        "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)
      case "wav" =>
        "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
          "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(h /* channels */) ++
          le32(w /* sample rate */) ++ le32(w * h * 2) ++ le16(h * 2) ++ le16(16)
      case "bmp" =>
        // 24bpp uncompressed BITMAPINFOHEADER; pixel rows appended by
        // bmpBytes (this header alone is what mediaMeta parses)
        val rowSize = (3 * w + 3) / 4 * 4
        "BM".getBytes ++ le32(54 + rowSize * h) ++ le32(0) ++ le32(54) ++
          le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
          le32(0) ++ le32(rowSize * h) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
      case other => throw new IllegalArgumentException(s"unknown media format: $other")
    }
  }

  /** Complete little-endian 16-bit PCM WAV file bytes: RIFF + fmt +
    * data chunk carrying `samples` (all channels interleaved).
    */
  def wavBytes(sampleRate: Int, channels: Int,
               samples: Array[Short]): Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = samples(i).toByte
      data(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * channels * 2) ++
      le16(channels * 2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  /** Complete 24bpp uncompressed BMP bytes: header + bottom-up rows
    * padded to 4 bytes, pixels from `rgb(x, y)` with y=0 the TOP row
    * (the synthesizer handles the bottom-up flip).
    */
  def bmpBytes(w: Int, h: Int,
               rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = (3 * w + 3) / 4 * 4
    val body = new Array[Byte](rowSize * h)
    var y = 0
    while (y < h) {
      val rowBase = (h - 1 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        body(rowBase + 3 * x) = b.toByte     // BGR order
        body(rowBase + 3 * x + 1) = g.toByte
        body(rowBase + 3 * x + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    mediaHeader("bmp", w, h) ++ body
  }

  /** Complete binary PPM (P6) bytes: ASCII header + raw RGB triples
    * row-major top-down.
    */
  def ppmBytes(w: Int, h: Int,
               rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val body = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        val base = 3 * (y * w + x)
        body(base) = r.toByte; body(base + 1) = g.toByte; body(base + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ body
  }

  /** Attach a binary payload (REAL container header + body) + typed
    * metadata to each document. Kinds: image (PNG, JPEG, or BMP —
    * BMP carries true 24bpp pixel content and small true dims), audio
    * (WAV — width=sample rate, height=channels, true 16-bit PCM
    * content), video (GIF). WAV and BMP payloads are complete,
    * decodable files (plus the doc text as trailing bytes, which the
    * chunk/offset walks ignore); PNG/JPEG/GIF remain header + opaque
    * body since their content would need a real codec.
    */
  def attachMedia(t: Tables): Dataset[MediaRecord] = {
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (docId, text) =>
        val kind = (docId % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val fmt = kind match {
          case "image" => (docId / 3 % 3) match {
            case 0 => "png"
            case 1 => "jpeg"
            case _ => "bmp"
          }
          case "audio" => "wav"
          case _       => "gif"
        }
        val (w, h) = fmt match {
          case "wav" => (8000 + (docId % 4).toInt * 8000, 1 + (docId % 2).toInt)
          case "bmp" => (8 + (docId % 4).toInt * 4, 6 + (docId % 5).toInt * 2)
          case _     => ((docId % 4).toInt * 160 + 320, (docId % 3).toInt * 120 + 240)
        }
        val head = fmt match {
          case "wav" =>
            val n = 120 + (docId % 4).toInt * 40
            wavBytes(w, h, Array.tabulate(n)(i =>
              ((docId * 31 + i * 17) % 4096 - 2048).toShort))
          case "bmp" =>
            bmpBytes(w, h, (x, y) => (
              ((docId + x * 7 + y * 13) % 256).toInt,
              ((docId * 3 + x * 11 + y) % 256).toInt,
              ((docId * 5 + x + y * 17) % 256).toInt))
          case other => mediaHeader(other, w, h)
        }
        MediaRecord(docId, head ++ text.getBytes("UTF-8"), kind, w, h)
      }
  }

  /** Expression-level (codegen'd, UDF-free) media metadata parsing
    * for the fixed-offset container formats: detects the format from
    * its magic bytes and reads PNG/GIF dimensions and WAV sample
    * rate/channels straight out of the header via substring/hex/conv
    * arithmetic. JPEG is detected here; its dimensions need a marker
    * scan → [[jpegDims]].
    */
  def mediaMeta(df: DataFrame, binCol: String): DataFrame = {
    def byte(pos: Int) = conv(hex(expr(s"substring($binCol, $pos, 1)")), 16, 10).cast("long")
    def be(pos: Int, len: Int) = conv(hex(expr(s"substring($binCol, $pos, $len)")), 16, 10).cast("long")
    def le16(pos: Int) = byte(pos) + byte(pos + 1) * 256
    def le32(pos: Int) = le16(pos) + le16(pos + 2) * 65536
    val isPng  = hex(expr(s"substring($binCol, 1, 8)")) === "89504E470D0A1A0A"
    val isJpeg = hex(expr(s"substring($binCol, 1, 2)")) === "FFD8"
    val isGif  = hex(expr(s"substring($binCol, 1, 6)")) === hex(lit("GIF89a"))
    val isWav  = hex(expr(s"substring($binCol, 1, 4)")) === hex(lit("RIFF")) &&
      hex(expr(s"substring($binCol, 9, 4)")) === hex(lit("WAVE"))
    val isBmp  = hex(expr(s"substring($binCol, 1, 2)")) === hex(lit("BM"))
    df.withColumn("media_format",
        when(isPng, "png").when(isJpeg, "jpeg").when(isGif, "gif")
          .when(isWav, "wav").when(isBmp, "bmp").otherwise("unknown"))
      .withColumn("parsed_width",
        when(isPng, be(17, 4)).when(isGif, le16(7)).when(isBmp, le32(19))
          .otherwise(lit(null).cast("long")))
      .withColumn("parsed_height",
        when(isPng, be(21, 4)).when(isGif, le16(9)).when(isBmp, le32(23))
          .otherwise(lit(null).cast("long")))
      .withColumn("sample_rate", when(isWav, le32(25)).otherwise(lit(null).cast("long")))
      .withColumn("channels", when(isWav, le16(23)).otherwise(lit(null).cast("long")))
  }

  /** JPEG SOF marker scan — pure JVM byte walk (no codec libraries):
    * steps across segments to the first start-of-frame and reads the
    * big-endian (height, width) that follow it.
    */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 8 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
        return Some(((((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)),
          (((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff))))
      i += 2 + len
    }
    None
  }

  private def leS16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) | (b(i + 1) << 8)).toShort.toInt
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** REAL WAV decode — RIFF chunk walk, no codec library: returns
    * (sample_rate, channels, 16-bit PCM samples all channels
    * interleaved), or None when the payload is not uncompressed
    * 16-bit PCM WAV (wrong magic, fmt != 1, bits != 16, or no data
    * chunk).
    */
  def wavSamples(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (b.length < 44 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
      new String(b, 8, 4, "US-ASCII") != "WAVE") return None
    var rate = -1; var channels = -1; var ok = false
    var data: Array[Short] = null
    // the walk cursor and chunk sizes stay LONG and unsigned: a
    // corrupt 32-bit size like 0xFFFFFFF8 truncated to Int (-8) would
    // otherwise advance the cursor by zero and spin the executor task
    // forever (adversarial-payload review, r10) — here it just walks
    // past the end and the decode refuses
    var i = 12L
    while (i + 8 <= b.length && (data == null || !ok)) {
      val id = new String(b, i.toInt, 4, "US-ASCII")
      val size = leU32(b, i.toInt + 4) // unsigned, 0 … 2^32−1
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        val o = i.toInt + 8
        ok = leU16(b, o) == 1 && leU16(b, o + 14) == 16 // PCM, 16-bit
        channels = leU16(b, o + 2)
        rate = leU32(b, o + 4).toInt
      } else if (id == "data" && i + 8 + size <= b.length) {
        val o = i.toInt + 8
        data = Array.tabulate((size / 2).toInt)(s => leS16(b, o + 2 * s).toShort)
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (ok && data != null) Some((rate, channels, data)) else None
  }

  /** REAL BMP decode — fixed-offset header + bottom-up padded rows,
    * no codec library: returns (width, height, RGB triples row-major
    * TOP-DOWN), or None when not 24bpp uncompressed bottom-up BMP.
    */
  def bmpPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    // all header fields validated as LONGS before any Int use: a
    // corrupt dataOffset/width ≥ 2^31 truncated to a negative Int
    // would pass an Int-arithmetic bounds guard and then index out of
    // bounds (adversarial-payload review, r10)
    val dataOffsetL = leU32(b, 10)
    val wL = leU32(b, 18)
    val hL = leU32(b, 22) // positive = bottom-up (the only layout we emit)
    val bpp = leU16(b, 28)
    val compression = leU32(b, 30)
    if (bpp != 24 || compression != 0L ||
      wL <= 0L || hL <= 0L || wL > b.length || hL > b.length ||
      dataOffsetL < 54L || dataOffsetL > b.length) return None
    val w = wL.toInt; val h = hL.toInt; val dataOffset = dataOffsetL.toInt
    val rowSize = (3L * w + 3) / 4 * 4
    if (dataOffsetL + rowSize * h > b.length) return None
    val rowSizeI = rowSize.toInt // ≤ b.length by the guard above
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val rowBase = dataOffset + (h - 1 - y) * rowSizeI
      var x = 0
      while (x < w) {
        rgb(3 * (y * w + x)) = b(rowBase + 3 * x + 2)     // R (stored BGR)
        rgb(3 * (y * w + x) + 1) = b(rowBase + 3 * x + 1) // G
        rgb(3 * (y * w + x) + 2) = b(rowBase + 3 * x)     // B
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }

  /** REAL PPM (P6) decode — ASCII header (with # comments) + raw RGB
    * triples: returns (width, height, RGB row-major top-down), or
    * None when not a maxval-255 binary PPM.
    */
  def ppmPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def nextInt(): Int = {
      // skip whitespace and # comments
      var going = true
      while (going && i < b.length) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r') i += 1
        else going = false
      }
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    i += 1 // single whitespace after maxval
    // Long guard: 3*w*h in Int could overflow for adversarial headers
    if (w <= 0 || h <= 0 || maxval != 255 ||
      i.toLong + 3L * w * h > b.length) return None
    Some((w, h, java.util.Arrays.copyOfRange(b, i, i + 3 * w * h)))
  }

  /** Audio feature vector from true PCM samples: [n_samples, mean,
    * rms, min, max, zero_crossings, per-segment RMS × (dim−6)].
    */
  def audioFeatures(samples: Array[Short], dim: Int): Array[Float] = {
    val n = samples.length
    val out = new Array[Float](dim)
    if (n == 0) return out
    var sum = 0.0; var sq = 0.0; var mn = Int.MaxValue; var mx = Int.MinValue; var zc = 0
    var i = 0
    while (i < n) {
      val s = samples(i).toInt
      sum += s; sq += s.toDouble * s
      if (s < mn) mn = s
      if (s > mx) mx = s
      if (i > 0 && ((samples(i - 1) < 0) != (s < 0))) zc += 1
      i += 1
    }
    out(0) = n.toFloat
    out(1) = (sum / n).toFloat
    out(2) = math.sqrt(sq / n).toFloat
    out(3) = mn.toFloat
    out(4) = mx.toFloat
    out(5) = zc.toFloat
    val segs = dim - 6
    var k = 0
    while (k < segs) {
      val from = (n.toLong * k / segs).toInt
      val until = (n.toLong * (k + 1) / segs).toInt
      var ss = 0.0; var j = from
      while (j < until) { ss += samples(j).toDouble * samples(j); j += 1 }
      out(6 + k) = if (until > from) math.sqrt(ss / (until - from)).toFloat else 0f
      k += 1
    }
    out
  }

  /** Image feature vector from true RGB pixels: [width, height,
    * mean R/255, mean G/255, mean B/255, mean luma/255, normalized
    * gray histogram × (dim−6)] (Rec.601 integer luma).
    */
  def imageFeatures(w: Int, h: Int, rgb: Array[Byte], dim: Int): Array[Float] = {
    val n = w * h
    val out = new Array[Float](dim)
    out(0) = w.toFloat; out(1) = h.toFloat
    if (n == 0) return out
    val bins = dim - 6
    val hist = new Array[Int](math.max(bins, 1))
    var sr = 0L; var sg = 0L; var sb = 0L; var sy = 0L
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      val y = (299 * r + 587 * g + 114 * b) / 1000
      sr += r; sg += g; sb += b; sy += y
      if (bins > 0) hist(y * bins / 256) += 1
      i += 1
    }
    out(2) = (sr.toDouble / n / 255.0).toFloat
    out(3) = (sg.toDouble / n / 255.0).toFloat
    out(4) = (sb.toDouble / n / 255.0).toFloat
    out(5) = (sy.toDouble / n / 255.0).toFloat
    var k = 0
    while (k < bins) { out(6 + k) = (hist(k).toDouble / n).toFloat; k += 1 }
    out
  }

  /** Content features for one payload: REAL statistics for the
    * codec-free formats (WAV PCM / BMP / PPM), the deterministic stub
    * for compressed-content formats (PNG/JPEG/GIF).
    */
  private[operators] def contentFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    wavSamples(payload).map { case (_, _, samples) => audioFeatures(samples, dim) }
      .orElse(bmpPixels(payload).map { case (w, h, rgb) => imageFeatures(w, h, rgb, dim) })
      .orElse(ppmPixels(payload).map { case (w, h, rgb) => imageFeatures(w, h, rgb, dim) })
      .getOrElse(stubDecode(payload, dim))

  /** Feature extraction over binary payloads. Partition-preserving
    * mapPartitions (one decoder init per partition — the shape a real
    * codec needs); fixed `dim`-float feature vector per record. WAV /
    * BMP / PPM payloads decode for REAL (see [[contentFeatures]]);
    * compressed formats use the stub.
    */
  def decodeFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    require(dim >= 6,
      s"decodeFeatures: dim must be at least 6 (got $dim) — the real " +
        "decoders lay out 6 fixed statistics before the per-segment/" +
        "histogram tail")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // a real compressed-format codec (libjpeg/ffmpeg bindings) would
      // initialize once per partition here; the codec-free decoders
      // above are allocation-only
      it.map { r =>
        val feats = contentFeatures(r.payload, dim)
        MediaFeatures(r.doc_id, r.kind, feats)
      }
    }
  }

  /** Deterministic stand-in for a compressed-content decoder: derives
    * `dim` floats from the payload bytes. Replace with a real codec
    * on-cluster.
    */
  private def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(dim)(i => ((md(i % md.length) & 0xff) / 255.0f))
  }

  /** Frame sampling: every `everyN`-th chunk of the payload becomes a
    * frame row (models video frame extraction; explode keeps it
    * distributed, no driver materialization).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val chunk = 64
      val nFrames = math.max(r.payload.length / chunk, 1)
      (0 until nFrames by everyN).map { f =>
        val from = f * chunk
        val until = math.min(from + chunk, r.payload.length)
        MediaFrame(r.doc_id, f, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Demo pipeline wiring used by the spec: attach → decode → shape. */
  def featurePipeline(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    decodeFeatures(attachMedia(t)).toDF()
      .select(col("doc_id"), col("kind"), col("features"))
      .orderBy(col("doc_id"))
  }
}

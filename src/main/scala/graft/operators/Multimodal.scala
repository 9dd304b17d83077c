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
  * Only the pixel/sample *content* decode remains a deterministic
  * STUB (`stubDecode` — no image/audio codec libraries in this
  * container); swap it for a real codec on a cluster that has them.
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
      case other => throw new IllegalArgumentException(s"unknown media format: $other")
    }
  }

  /** Attach a binary payload (REAL container header + body) + typed
    * metadata to each document. Kinds: image (PNG or JPEG), audio
    * (WAV — width=sample rate, height=channels), video (GIF).
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
          case "image" => if (docId % 2 == 0) "png" else "jpeg"
          case "audio" => "wav"
          case _       => "gif"
        }
        val (w, h) = kind match {
          case "audio" => (8000 + (docId % 4).toInt * 8000, 1 + (docId % 2).toInt)
          case _       => ((docId % 4).toInt * 160 + 320, (docId % 3).toInt * 120 + 240)
        }
        MediaRecord(docId, mediaHeader(fmt, w, h) ++ text.getBytes("UTF-8"), kind, w, h)
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
    df.withColumn("media_format",
        when(isPng, "png").when(isJpeg, "jpeg").when(isGif, "gif")
          .when(isWav, "wav").otherwise("unknown"))
      .withColumn("parsed_width",
        when(isPng, be(17, 4)).when(isGif, le16(7)).otherwise(lit(null).cast("long")))
      .withColumn("parsed_height",
        when(isPng, be(21, 4)).when(isGif, le16(9)).otherwise(lit(null).cast("long")))
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

  /** Feature extraction over binary payloads. Partition-preserving
    * mapPartitions (one decoder init per partition — the shape a real
    * codec needs); fixed `dim`-float feature vector per record.
    */
  def decodeFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // >>> STUB DECODER <<< a real implementation would initialize the
      // codec (e.g. libjpeg/ffmpeg bindings) once per partition here.
      it.map { r =>
        val feats = stubDecode(r.payload, dim)
        MediaFeatures(r.doc_id, r.kind, feats)
      }
    }
  }

  /** Deterministic stand-in for a media decoder: derives `dim` floats
    * from the payload bytes. Replace with a real codec on-cluster.
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

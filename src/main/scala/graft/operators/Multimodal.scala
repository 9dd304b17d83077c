package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column handling (SURVEY.md §2 q37 + pipeline).
  *
  * Media payloads are opaque `binary` columns + a typed metadata
  * struct. The Spark-side plumbing (schema, partition-preserving
  * mapPartitions, fixed batch feature shape) is real; the actual
  * codec step is a deterministic STUB (no image/audio libraries in
  * this container) clearly marked below — swap `stubDecode` for a
  * real decoder on a cluster with codec libs deployed.
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

  /** Attach a binary payload + typed metadata to each document. */
  def attachMedia(t: Tables): Dataset[MediaRecord] = {
    val spark = t.spark
    import spark.implicits._
    t.documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(3)) * 120 + 240).cast("int").as("height"))
      .as[MediaRecord]
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

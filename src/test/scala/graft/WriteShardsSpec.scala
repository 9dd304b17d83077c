package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops._
import graft.sources.Tables

/** The sharded-corpus writer (VERDICT r11 missing #5): q72's shard
  * deal materialized as the on-disk artifact a trainer consumes —
  * one deterministically-named file per shard, `_SUCCESS` last,
  * re-runs byte-identical.
  */
class WriteShardsSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)
  private lazy val corpus = t.documents.select(col("doc_id"), col("text")).limit(400).cache()

  private def fileBytes(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
  }
  private def md5s(dir: String): Map[String, String] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      f.getName -> java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
    }.toMap
  }

  test("writeShards: one file per shard, deterministic names/bytes, read-back ≡ deal, _SUCCESS") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    corpus.writeShards("doc_id", shards = 16, path = dir, seed = 7L)
    // contract: exactly `shards` files with the deterministic names,
    // plus the _SUCCESS marker written last
    val names = fileBytes(dir).keySet
    assert(names == (0 until 16).map(s => f"shard-$s%05d.parquet").toSet,
      s"unexpected file set: $names")
    assert(new java.io.File(dir, "_SUCCESS").exists(), "_SUCCESS marker missing")
    assert(!new java.io.File(dir, "_tmp_shard_write").exists(), "tmp dir must be cleaned")
    // read-back reproduces the deal exactly: same rows, same shard
    // assignment, same within-shard ranks (the q72 oracle replays the
    // same md5 arithmetic, so this is the already-oracle-gated deal)
    val back = spark.read.parquet(dir)
    val deal = corpus.shuffleShards("doc_id", shards = 16, seed = 7L)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("shard"), col("shard_pos"))
        .collect().map(_.toString).sorted.toSeq
    assert(key(back) == key(deal), "read-back must equal the in-engine deal")
    // each file holds exactly its own shard, sorted by shard_pos
    val one = spark.read.parquet(s"$dir/shard-00003.parquet")
      .select(col("shard"), col("shard_pos")).collect()
    assert(one.nonEmpty && one.forall(_.getLong(0) == 3L), "file 3 must hold only shard 3")
    assert(one.map(_.getLong(1)).toSeq == one.map(_.getLong(1)).toSeq.sorted,
      "rows within a shard file arrive in shard_pos order")
    // RE-RUN determinism: same input, same seed → byte-identical files
    val h1 = md5s(dir)
    corpus.writeShards("doc_id", shards = 16, path = dir, seed = 7L)
    assert(md5s(dir) == h1, "re-materialization must be byte-identical")
  }

  test("writeShards: a shard left empty by the deal still gets its file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_empty").toString
    // 3 rows into 64 shards — most shards are empty by construction
    corpus.limit(3).writeShards("doc_id", shards = 64, path = dir, seed = 1L)
    val names = fileBytes(dir).keySet
    assert(names.size == 64, s"expected 64 files, got ${names.size}")
    val total = spark.read.parquet(dir).count()
    assert(total == 3L, "empty filler files must add no rows")
    // re-materializing with a SMALLER shard count must clean the old
    // run's higher-numbered files — a directory read-back would
    // otherwise mix two deals (r12 second review)
    corpus.limit(3).writeShards("doc_id", shards = 16, path = dir, seed = 1L)
    assert(fileBytes(dir).keySet == (0 until 16).map(s => f"shard-$s%05d.parquet").toSet,
      "stale shard files from the larger previous run must be deleted")
    assert(spark.read.parquet(dir).count() == 3L)
  }
}

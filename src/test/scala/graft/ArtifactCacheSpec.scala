package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{ArtifactCache, Ops}
import graft.data.HadoopFsOps
import graft.sources.Tables

/** The two closing reference-roadmap items (Anglerfish README.md:26
  * "Caching wrapping" and :27 "Hadoop FS Ops"), Spark-first:
  * ArtifactCache.orPrepare memoizes any Prepared* builder through
  * the durable ArtifactIO layout (prepare exactly once per path,
  * loads thereafter, different-kind paths refused), and FsOps puts
  * the control-plane filesystem surface behind one trait whose
  * Hadoop implementation IS the local-FS stand-in.
  */
class ArtifactCacheSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cache_$tag").toString

  test("orPrepare prepares exactly once per path; later calls load the pinned artifact") {
    val o = t.orders.withColumn("bkt",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 5000000"))
    val dir = tmp("buckets") + "/census"
    var prepares = 0
    def build() = ArtifactCache.orPrepare(spark, dir, "buckets")(
      Ops.loadBuckets)({ prepares += 1; Ops.prepareBuckets(o, "bkt") })(_.save(_))
    val first = build()
    assert(prepares == 1 && first.reliable,
      "first call prepares, saves, and returns the DURABLE artifact")
    val second = build()
    assert(prepares == 1, "second call must load, never re-prepare")
    assert(second.census.collect().map(_.toSeq).toSet ==
      first.census.collect().map(_.toSeq).toSet,
      "loaded census ≡ prepared census")
    // the cache works for ANY artifact sharing the ArtifactIO
    // contract — the quantiles builder through the same wrapper
    val qdir = tmp("quant") + "/regs"
    var qPrepares = 0
    def buildQ() = ArtifactCache.orPrepare(spark, qdir, "quantiles")(
      Ops.loadQuantiles)({ qPrepares += 1
        Ops.prepareQuantiles(o, Nil, col("o_totalprice"), 64.0) })(_.save(_))
    buildQ(); val q2 = buildQ()
    assert(qPrepares == 1 && q2.bucketWidth == 64.0 && q2.reliable)
  }

  test("orPrepare refuses a path holding a DIFFERENT artifact kind") {
    val o = t.orders.withColumn("bkt",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 5000000"))
    val dir = tmp("clash") + "/a"
    Ops.prepareBuckets(o, "bkt").save(dir)
    val e = intercept[IllegalArgumentException] {
      ArtifactCache.orPrepare(spark, dir, "quantiles")(
        Ops.loadQuantiles)(
        Ops.prepareQuantiles(o, Nil, col("o_totalprice"), 64.0))(_.save(_))
    }
    assert(e.getMessage.contains("kind") && e.getMessage.contains("buckets"),
      s"a different-kind path must refuse loudly, got: ${e.getMessage}")
  }

  test("FsOps: write/read/exists/list/mkdirs/delete round-trip on the local-FS stand-in") {
    val fs = HadoopFsOps()
    val root = tmp("fsops")
    assert(fs.mkdirs(s"$root/sub"))
    assert(fs.list(s"$root/missing").isEmpty, "a missing dir lists empty, never throws")
    // UTF-8 round-trip, including non-ASCII
    fs.writeUtf8(s"$root/sub/a.txt", "héllo Ω — graft")
    fs.writeUtf8(s"$root/sub/b.txt", "second")
    assert(fs.exists(s"$root/sub/a.txt") && !fs.exists(s"$root/sub/c.txt"))
    assert(fs.readUtf8(s"$root/sub/a.txt") == "héllo Ω — graft")
    // overwrite is create-or-replace
    fs.writeUtf8(s"$root/sub/a.txt", "replaced")
    assert(fs.readUtf8(s"$root/sub/a.txt") == "replaced")
    // list returns sorted children
    val names = fs.list(s"$root/sub").map(_.split('/').last)
    assert(names == Seq("a.txt", "b.txt"))
    assert(fs.delete(s"$root/sub/b.txt", recursive = false))
    assert(fs.list(s"$root/sub").map(_.split('/').last) == Seq("a.txt"))
    assert(fs.delete(s"$root/sub", recursive = true) && !fs.exists(s"$root/sub"))
  }

  test("FileProvider reads schemas through FsOps (shared control-plane surface)") {
    import graft.data.AvroRegistry
    val dir = tmp("schemas")
    val fs = HadoopFsOps()
    val schema = """{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}"""
    fs.writeUtf8(s"$dir/7.avsc", schema)
    val provider = AvroRegistry.FileProvider(dir)
    assert(provider.writerSchema(7).contains(schema))
    assert(provider.writerSchema(8).isEmpty, "a missing id resolves to None")
  }
}

package graft.data

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** File-system operations interface — the last entry of the
  * reference's stated roadmap (GrafBlutwurst/Anglerfish README.md:27
  * "Final Tagless Interfaces for: … Hadoop FS Ops"), re-expressed
  * Spark-first: instead of an effect-polymorphic `F[_]` algebra, the
  * minimal FS surface the engine's artifact and schema plumbing
  * actually needs — exists/list/read/write/mkdirs/delete — behind
  * ONE trait, so orchestration code specs against the local
  * filesystem and production binds the IDENTICAL calls to HDFS or
  * object stores through the same Hadoop `FileSystem` resolution
  * Spark itself uses (the scheme of the path picks the
  * implementation; `confEntries` carries credentials).
  *
  * Deliberately NOT a data plane: bulk data moves through
  * `spark.read`/`write` (distributed, columnar, pushdown-aware).
  * This trait is for the CONTROL plane — schema files, marker files,
  * small manifests — the role the reference's roadmap item served
  * beside its Schema Registry and Kafka interfaces.
  */
trait FsOps extends Serializable {
  def exists(path: String): Boolean

  /** Child paths of `dir`, sorted; Nil for a missing dir. */
  def list(dir: String): Seq[String]

  def readUtf8(path: String): String

  /** Create-or-overwrite `path` with UTF-8 `content`. */
  def writeUtf8(path: String, content: String): Unit

  def mkdirs(path: String): Boolean

  def delete(path: String, recursive: Boolean): Boolean
}

/** Hadoop-backed [[FsOps]] — the ONLY implementation needed, because
  * Hadoop's own `LocalFileSystem` IS the local-FS stand-in (a
  * `file:` or bare path binds to it; `hdfs:`/`s3a:` paths bind to
  * their stores). Serializable the [[AvroRegistry.FileProvider]]
  * way: only the conf ENTRIES ship; the `Configuration` and
  * `FileSystem` handles rebuild lazily wherever the call runs.
  */
final case class HadoopFsOps(confEntries: Map[String, String] = Map.empty)
    extends FsOps {

  private def fsFor(p: Path): FileSystem = {
    val conf = new Configuration(true)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    p.getFileSystem(conf)
  }

  def exists(path: String): Boolean = {
    val p = new Path(path); fsFor(p).exists(p)
  }

  def list(dir: String): Seq[String] = {
    val p = new Path(dir); val fs = fsFor(p)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.toString).sorted.toSeq
  }

  def readUtf8(path: String): String = {
    val p = new Path(path)
    val in = fsFor(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
  }

  def writeUtf8(path: String, content: String): Unit = {
    val p = new Path(path)
    val os = fsFor(p).create(p, true)
    try os.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  def mkdirs(path: String): Boolean = {
    val p = new Path(path); fsFor(p).mkdirs(p)
  }

  def delete(path: String, recursive: Boolean): Boolean = {
    val p = new Path(path); fsFor(p).delete(p, recursive)
  }
}

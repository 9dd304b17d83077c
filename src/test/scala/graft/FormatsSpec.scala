package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Formats, Tables}

/** Multi-format round-trips: the engine's tables must survive
  * parquet/orc/json/csv with identical values (timestamps at µs).
  */
class FormatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def roundtrip(format: String): Unit = {
    val t = Tables(spark, sfDir)
    val orig = t.orders
    val dir = Files.createTempDirectory(s"graft_fmt_$format").toString
    Formats.write(orig, dir, format, partitions = Some(2))
    val back = Formats.read(spark, dir, format, Some(orig.schema))
    assert(back.count() == orig.count(), s"$format row count")
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty,
      s"$format round-trip altered values")
  }

  for (fmt <- Seq("parquet", "orc", "json", "csv")) {
    test(s"orders round-trips through $fmt") { roundtrip(fmt) }
  }
}

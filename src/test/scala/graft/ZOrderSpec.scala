package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder
import graft.sources.Tables

/** The Morton interleave must place bits exactly (q66's oracle checks
  * the arithmetic at corpus scale; here the algebra), and the layout
  * operator must deliver its actual promise: files covering small
  * (x, y) rectangles, so a scan filtering on EITHER dimension touches
  * few files, where a hash layout touches all of them.
  */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  test("zvalue places x in even and y in odd bit positions") {
    import spark.implicits._
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y")).as("z"))
    val zs = df.collect().map(_.getLong(0)).toSeq
    // x=3 → bits 0,2 → 5; y=3 → bits 1,3 → 10; (1,1) → 3;
    // 16 set bit-pairs → 2^32-1
    assert(zs == Seq(5L, 10L, 3L, (1L << 32) - 1))
  }

  test("cluster: scans filtering on either dimension touch fewer files than a hash layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val orders = t.orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("long").as("price"))

    ZOrder.cluster(orders, col("o_custkey"), col("price"), numFiles = 8)
      .write.mode("overwrite").parquet(s"$dir/z")
    orders.repartition(8).write.mode("overwrite").parquet(s"$dir/hash")
    val z = spark.read.parquet(s"$dir/z")
    val hash = spark.read.parquet(s"$dir/hash")
    assert(z.count() == orders.count(), "layout rewrite must not change the row set")

    val (cLo, cHi) = {
      val r = orders.agg(min("o_custkey"), max("o_custkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (pLo, pHi) = {
      val r = orders.agg(min("price"), max("price")).head()
      (r.getLong(0), r.getLong(1))
    }
    def files(df: org.apache.spark.sql.DataFrame, pred: org.apache.spark.sql.Column): Long =
      df.filter(pred).select(input_file_name()).distinct().count()

    // a quarter-range slice on each dimension
    val custSlice = col("o_custkey") <= cLo + (cHi - cLo) / 4
    val priceSlice = col("price") <= pLo + (pHi - pLo) / 4
    val zc = files(z, custSlice); val hc = files(hash, custSlice)
    val zp = files(z, priceSlice); val hp = files(hash, priceSlice)
    assert(hc == 8 && hp == 8, s"hash layout should spread the slice over all files ($hc, $hp)")
    assert(zc < hc, s"custkey slice touched $zc z-ordered files vs $hc hashed")
    assert(zp < hp, s"price slice touched $zp z-ordered files vs $hp hashed")
  }

  test("cluster: null dimensions keep their rows (nulls first), constant dimension still clusters the other") {
    import spark.implicits._
    // 100 rows, every 10th has a null y — layout-only op must keep all
    val withNulls = (0L until 100L)
      .map(i => (i, if (i % 10 == 0) None else Some(i * 7 % 100)))
      .toDF("x", "y")
    val clustered = ZOrder.cluster(withNulls, col("x"), col("y"), numFiles = 4)
    assert(clustered.count() == 100, "null dimension rows must survive")
    assert(clustered.filter(col("y").isNull).count() == 10)

    // constant x (min == max): the curve must degrade to a clean
    // range layout on y, not divide by zero or collapse
    val constX = (0L until 64L).map(i => (5L, i)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zconst").toString
    ZOrder.cluster(constX, col("x"), col("y"), numFiles = 4, bits = 4)
      .write.mode("overwrite").parquet(s"$dir/c")
    val c = spark.read.parquet(s"$dir/c")
    assert(c.count() == 64)
    val touched = c.filter(col("y") < 16).select(input_file_name()).distinct().count()
    assert(touched < 4, s"y-slice on a constant-x layout touched $touched of 4 files")
  }
}

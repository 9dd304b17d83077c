package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops

/** Salted-vertex-join equivalence (VERDICT r15 next #6): on a planted
  * power-law graph — one celebrity vertex carrying most of the edges —
  * the salted forms of PageRank / HITS / connected components must be
  * ROW-IDENTICAL to the unsalted forms (the salting redistributes the
  * hot key over k reducer tasks; it must never change a single score
  * or label), and the hot-set helper must find exactly the planted
  * celebrities.
  */
class SaltedJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Planted skew: vertex 1 links to 2..1501 (hot out AND, via the
    * reverse edges below, hot in), plus a short chain 2000..2030 (inside the BSP round budget), plus a
    * separate chain 3000..3010 so components differ.
    */
  private lazy val skewEdges: DataFrame = {
    val star = (2L to 1501L).map(v => (1L, v))
    val ring = (2000L until 2030L).map(v => (v, v + 1))
    val chain = (3000L until 3010L).map(v => (v, v + 1))
    (star ++ ring ++ chain).toDF("s", "d")
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: row counts differ")
    assert(a.except(b).isEmpty && b.except(a).isEmpty, s"$what: rows differ")
  }

  test("hotVertices finds exactly the planted celebrity at the declared threshold") {
    val hot = Ops.hotVertices(skewEdges, "s", minDegree = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(hot == Set(1L), s"expected exactly vertex 1, got $hot")
    // below the threshold everything qualifies; the bound |hot| <= |E|/minDegree holds
    val all = Ops.hotVertices(skewEdges, "s", minDegree = 1L).count()
    assert(all == skewEdges.select("s").distinct().count())
  }

  test("pageRank with salted hot vertices is score-identical to unsalted") {
    val plain = Ops.pageRank(skewEdges, "s", "d", iters = 3)
    val salted = Ops.pageRank(skewEdges, "s", "d", iters = 3,
      saltHotDegree = 100L, saltK = 8)
    assertSameRows(plain, salted, "pageRank salted vs plain")
    // dangling redistribution path too (different join structure)
    val plainD = Ops.pageRank(skewEdges, "s", "d", iters = 3,
      redistributeDangling = true)
    val saltedD = Ops.pageRank(skewEdges, "s", "d", iters = 3,
      redistributeDangling = true, saltHotDegree = 100L, saltK = 4)
    assertSameRows(plainD, saltedD, "pageRank dangling salted vs plain")
  }

  test("hitsScores with salted hot vertices is score-identical to unsalted") {
    // symmetrize so vertex 1 is hot on BOTH join sides
    val sym = skewEdges.unionByName(
      skewEdges.select(col("d").as("s"), col("s").as("d")))
    val plain = Ops.hitsScores(sym, "s", "d", iters = 2)
    val salted = Ops.hitsScores(sym, "s", "d", iters = 2,
      saltHotDegree = 100L, saltK = 8)
    assertSameRows(plain, salted, "hits salted vs plain")
  }

  test("connectedComponents with salted hot vertices is label-identical to unsalted") {
    import graft.api.Ops._
    val plain = skewEdges.connectedComponents("s", "d")
    val salted = skewEdges.connectedComponents("s", "d",
      saltHotDegree = 100L, saltK = 8)
    assertSameRows(plain, salted, "cc salted vs plain")
    // the star collapses to component 1, the ring to 2000, the chain to 3000
    val comps = salted.select("component").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(comps == Set(1L, 2000L, 3000L), s"unexpected components $comps")
  }

  test("saltedVertexJoin multiset-equals the plain join on a planted-skew frame") {
    val per = skewEdges.select(col("s")).distinct()
      .withColumn("payload", col("s") * 7L)
    val hot = Ops.hotVertices(skewEdges, "s", 100L)
    val plain = skewEdges.join(per, Seq("s"))
    val salted = Ops.saltedVertexJoin(skewEdges, per, "s", col("d"), hot, 8)
    assert(plain.count() == salted.count())
    val pc = plain.groupBy("s", "d", "payload").count()
    val sc = salted.groupBy("s", "d", "payload").count()
    assertSameRows(pc, sc, "salted join multiset")
  }
}

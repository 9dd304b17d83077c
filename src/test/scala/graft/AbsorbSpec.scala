package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops
import graft.api.Ops._
import graft.sources.Tables

/** Prepared-index maintenance: for every index with an `absorb` entry
  * point, `prepare(A).absorb(B)` must equal `prepare(A ∪ B)` —
  * artifact frames row-for-row, scalars exactly — without rescanning
  * A's corpus. Corpus = the documents table split on doc id parity.
  */
class AbsorbSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  private lazy val corpus = t.documents.select(col("doc_id"), col("text")).limit(300).cache()
  private lazy val partA = corpus.filter(col("doc_id") % 2 === 0)
  private lazy val partB = corpus.filter(col("doc_id") % 2 === 1)

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col).toSeq
    df.select(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(rows(a) == rows(b), s"$what diverged between absorb and full re-prepare")

  test("absorbBm25 ≡ prepareBm25 over the union: postings, scalars, and query results") {
    val full = Ops.prepareBm25(corpus, "doc_id", "text")
    val absorbed = Ops.prepareBm25(partA, "doc_id", "text").absorb(partB, "text")
    assert(absorbed.nDocs == full.nDocs && absorbed.sumDl == full.sumDl)
    assert(absorbed.avgdl == full.avgdl, "avgdl must recompose bit-for-bit")
    assertSameRows(absorbed.postings, full.postings, "bm25 postings")
    // the query path sees no difference either
    val queries = corpus.limit(10)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    assertSameRows(
      queries.bm25TopKAgainst(absorbed, "qid", "qtext", k = 3),
      queries.bm25TopKAgainst(full, "qid", "qtext", k = 3),
      "bm25 top-k")
    // re-submitting an already-indexed doc fails fast (df/dl would
    // double-count) instead of silently corrupting the index
    val e = intercept[IllegalArgumentException] {
      full.absorb(partA.limit(1), "text")
    }
    assert(e.getMessage.contains("already in the index"))
  }

  test("PreparedEditIndex.absorb ≡ prepareEditIndex over the union") {
    import spark.implicits._
    val mk = (r: Range, tag: String) =>
      r.map(i => (i.toLong, s"name$tag$i")).toDF("cid", "cname")
    val a = mk(1 to 40, "x")
    val b = mk(41 to 60, "y")
    val full = Ops.prepareEditIndex(a.unionByName(b), "cid", "cname", maxDistance = 1)
    val absorbed = Ops.prepareEditIndex(a, "cid", "cname", maxDistance = 1).absorb(b)
    assertSameRows(absorbed.base, full.base, "edit-index base")
    assertSameRows(absorbed.keys, full.keys, "edit-index deletion keys")
    val dirty = Seq((100L, "namex7"), (101L, "namey55X"), (102L, "zzz")).toDF("qid", "qname")
    assertSameRows(
      dirty.editMatchesAgainst(absorbed, "qid", "qname"),
      dirty.editMatchesAgainst(full, "qid", "qname"),
      "edit matches")
  }

  test("PreparedVecCatalog.absorb ≡ prepareVecCatalog over the union") {
    val vecs = t.embeddings.select(col("vec_id"), col("embedding").as("emb")).limit(200).cache()
    val a = vecs.filter(col("vec_id") % 2 === 0)
    val b = vecs.filter(col("vec_id") % 2 === 1)
    val dim = vecs.select(size(col("emb"))).head().getInt(0)
    val full = Ops.prepareVecCatalog(vecs, "vec_id", "emb", dim = dim)
    val absorbed = Ops.prepareVecCatalog(a, "vec_id", "emb", dim = dim).absorb(b, "emb")
    assertSameRows(absorbed.codes, full.codes, "vector codes")
    assertSameRows(absorbed.vectors, full.vectors, "vector base")
    val inc = vecs.limit(30)
    assertSameRows(
      Ops.vecDedupAgainstPrepared(inc, "vec_id", "emb", absorbed, threshold = 0.95),
      Ops.vecDedupAgainstPrepared(inc, "vec_id", "emb", full, threshold = 0.95),
      "vec dedup against catalog")
  }

  test("PreparedBoilerplate.absorb ≡ prepareBoilerplate over the union (threshold-crossing included)") {
    import spark.implicits._
    // planted: the boilerplate line sits at df=2 in EACH half — below
    // minDf=3 on either half alone, above it only on the union. This
    // is exactly the case the unfiltered census exists for.
    val mkDocs = (ids: Seq[Long]) => ids.map(i =>
      (i, s"unique line $i\nSUBSCRIBE NOW\nbody text $i")).toDF("doc_id", "text")
    val a = mkDocs(Seq(1L, 2L)).unionByName(
      Seq((3L, "plain doc 3")).toDF("doc_id", "text"))
    val b = mkDocs(Seq(11L, 12L)).unionByName(
      Seq((13L, "plain doc 13")).toDF("doc_id", "text"))
    val full = Ops.prepareBoilerplate(a.unionByName(b), "doc_id", "text", minDf = 3)
    val absorbed = Ops.prepareBoilerplate(a, "doc_id", "text", minDf = 3)
      .absorb(b, "doc_id", "text")
    assertSameRows(absorbed.census, full.census, "boilerplate census")
    assertSameRows(absorbed.common, full.common, "boilerplate common set")
    assert(absorbed.common.collect().map(_.getString(0)).contains("SUBSCRIBE NOW"),
      "a paragraph crossing minDf only on the union must be common after absorb")
    assert(Ops.prepareBoilerplate(a, "doc_id", "text", minDf = 3).common.isEmpty,
      "…and must NOT be common on either half alone")
    val inc = mkDocs(Seq(99L))
    assertSameRows(
      inc.stripBoilerplateAgainst(absorbed, "doc_id", "text"),
      inc.stripBoilerplateAgainst(full, "doc_id", "text"),
      "strip against absorbed set")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** [[graft.operators.Classifier]]: distributed logistic regression
  * over hashed bag-of-words features — weights live in a frame keyed
  * by feature index (never a dense driver-side vector), training is
  * decimal-summed and therefore bit-reproducible.
  */
class ClassifierSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dim = 1 << 12

  // planted separable corpus: quality docs carry "excellent wonderful",
  // junk docs carry "terrible awful"; both share filler vocabulary
  private def labeled = {
    import spark.implicits._
    val good = (1L to 30L).map(i =>
      (i, s"document $i with excellent wonderful clear prose and filler common words", 1))
    val bad = (31L to 60L).map(i =>
      (i, s"document $i with terrible awful broken spam and filler common words", 0))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("separates planted classes and generalizes to held-out docs") {
    import spark.implicits._
    val w = Classifier.trainTextClassifier(labeled, "doc_id", "text", "label",
      dim = dim, iters = 15, lr = 1.0)
    val scored = Classifier.scoreTextClassifier(labeled, w, "doc_id", "text", dim = dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.size == 60)
    val acc = scored.count { case (id, p) => (p > 0.5) == (id <= 30L) } / 60.0
    assert(acc == 1.0, s"training accuracy $acc < 1.0 on separable data")
    // held-out docs containing only the signal tokens land on the right side
    val heldOut = Seq(
      (100L, "fresh excellent wonderful writing"),
      (101L, "more terrible awful content")).toDF("doc_id", "text")
    val ho = Classifier.scoreTextClassifier(heldOut, w, "doc_id", "text", dim = dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ho(100L) > 0.5 && ho(101L) < 0.5, s"held-out scores wrong: $ho")
  }

  test("training is bit-reproducible under any partitioning (decimal sums)") {
    val w1 = Classifier.trainTextClassifier(labeled, "doc_id", "text", "label",
      dim = dim, iters = 5, lr = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w2 = Classifier.trainTextClassifier(labeled.repartition(7), "doc_id", "text", "label",
      dim = dim, iters = 5, lr = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1 == w2, "weights must be identical across partitionings")
    assert(w1.contains(-1L), "bias feature present")
    assert(w1.keySet.forall(i => i == -1L || (i >= 0 && i < dim)))
  }

  test("degenerate single-label corpus drives the bias toward that label") {
    import spark.implicits._
    val allGood = (1L to 20L).map(i => (i, s"anything $i goes here", 1)).toDF("doc_id", "text", "label")
    val w = Classifier.trainTextClassifier(allGood, "doc_id", "text", "label",
      dim = dim, iters = 10, lr = 1.0)
    val scored = Classifier.scoreTextClassifier(allGood, w, "doc_id", "text", dim = dim)
      .agg(min(col("score"))).collect()(0).getDouble(0)
    assert(scored > 0.5, s"all-positive corpus must score positive, got min $scored")
  }

  test("classifierGate keeps exactly the above-threshold docs with all columns") {
    import spark.implicits._
    import graft.api.Ops._
    val w = Classifier.trainTextClassifier(labeled, "doc_id", "text", "label",
      dim = dim, iters = 15, lr = 1.0)
    val corpus = labeled.withColumn("extra", col("doc_id") * 2)
    val kept = corpus.classifierGate(w, "doc_id", "text", minScore = 0.5, dim = dim)
    assert(kept.columns.toSeq == corpus.columns.toSeq, "gate must preserve the schema")
    assert(kept.select("doc_id").as[Long].collect().toSet == (1L to 30L).toSet,
      "exactly the quality class survives the learned gate")
    intercept[IllegalArgumentException](
      corpus.classifierGate(w, "doc_id", "text", minScore = 1.5))
  }

  test("scale shape: weights stay a frame, the score plan joins on idx with no nested loop") {
    val w = Classifier.trainTextClassifier(labeled, "doc_id", "text", "label",
      dim = dim, iters = 1, lr = 1.0)
    val plan = Classifier.scoreTextClassifier(labeled, w, "doc_id", "text", dim = dim)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"score must join on idx:\n$plan")
  }
}

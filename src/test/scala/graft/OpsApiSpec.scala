package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Ops._
import graft.operators.{JsonOps, Temporal}
import graft.sources.Tables

/** The public fluent API must reproduce the oracle-checked operator
  * results (asofJoin ≡ q21, sessionized ≡ q22 boundaries, rangeJoin ≡
  * q39) and the sketch aggregate must be exact below capacity.
  */
class OpsApiSpec extends AnyFunSuite {
  import SparkTestSession._
  private lazy val t = Tables(spark, sfDir)

  test("asofJoin API reproduces q21") {
    val ev = t.events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val api = purchases
      .asofJoin(clicks, key = "user_id", leftTime = "ts", rightTime = "ts",
        carry = Seq("click_id", "click_ts", "click_value"))
      .select("event_id", "user_id", "ts", "click_id", "click_ts", "click_value")
    val q21 = Temporal.q21(t)
    assert(api.count() == q21.count())
    assert(api.except(q21).isEmpty && q21.except(api).isEmpty,
      "asofJoin API differs from q21")
  }

  test("rangeJoin API reproduces the naive inequality join") {
    val p = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val e = t.events.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("ts").as("e_ts"))
    val api = p.rangeJoin(e, "p_ts", "e_ts", 300000000L).select("p_id", "e_id")
    val naive = p.join(e,
      abs(expr("unix_micros(p_ts) - unix_micros(e_ts)")) <= 300000000L)
      .select("p_id", "e_id")
    assert(api.count() == naive.count())
    assert(api.except(naive).isEmpty && naive.except(api).isEmpty)
  }

  test("sessionized API agrees with q22 session boundaries") {
    val api = t.events.sessionized("user_id", "ts", lit(1800)) // 30 min in seconds
      .groupBy(col("user_id")).agg(max(col("session_id")).as("n_sessions"))
    val q22 = Temporal.q22(t)
      .groupBy(col("user_id")).agg(max(col("session_id")).as("n_sessions"))
    assert(api.except(q22).isEmpty && q22.except(api).isEmpty)
  }

  test("topkSketch is exact below capacity and matches q26 top tokens") {
    graft.functions.GraftFunctions.register(spark)
    val tokens = t.documents.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val sketch = tokens.agg(topkSketch(col("token"), 10).as("top")).collect().head
      .getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    val exact = JsonOps.q26(t).collect().take(10).map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.toSeq == exact.toSeq, "sketch counts differ from exact top-k")
  }

  test("saltedCount equals plain groupBy count") {
    val salted = t.events.saltedCount("event_type", buckets = 8)
    val plain = t.events.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}

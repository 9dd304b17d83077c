package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.AvroRegistry
import graft.streaming.Streams

/** Registry-framed Avro ENCODE (VERDICT r15 next #3): decode ∘ encode
  * must be an identity — including a consumer reading with an
  * UPGRADED writer schema — and the Kafka-shaped produce composition
  * must emit the sink contract (binary key/value, frame = magic 0 +
  * BE schema id + datum) without needing a broker.
  */
class AvroEncodeFramedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val v1 =
    """{"type": "record", "name": "M", "fields": [
      |  {"name": "a", "type": "long"},
      |  {"name": "s", "type": "string"}]}""".stripMargin
  private val v2 =
    """{"type": "record", "name": "M", "fields": [
      |  {"name": "a", "type": "long"},
      |  {"name": "s", "type": "string"},
      |  {"name": "extra", "type": "string", "default": "legacy"}]}""".stripMargin
  private val provider = AvroRegistry.InMemoryProvider(Map(1 -> v1, 2 -> v2))

  test("decodeFramed after encodeFramed is an identity on the payload fields") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("a", "s")
    val framed = AvroRegistry.encodeFramed(df, 1, provider)
    assert(framed.columns.toSeq == Seq("avro_framed"))
    // the wire frame is magic 0 + BE id 1
    val first = framed.head().getAs[Array[Byte]](0)
    assert(first(0) == 0 && java.nio.ByteBuffer.wrap(first, 1, 4).getInt == 1)
    val back = AvroRegistry.decodeFramed(framed, "avro_framed", provider, v1)
    assert(back.columns.toSeq == Seq("a", "s"))
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("a reader on the upgraded schema takes defaults; a mixed-id frame decodes continuously") {
    val oldRows = Seq((1L, "x"), (2L, "y")).toDF("a", "s")
    val newRows = Seq((3L, "z", "fresh")).toDF("a", "s", "extra")
    val mixed = AvroRegistry.encodeFramed(oldRows, 1, provider)
      .unionByName(AvroRegistry.encodeFramed(newRows, 2, provider))
    val got = AvroRegistry.decodeFramed(mixed, "avro_framed", provider, v2)
      .orderBy("a").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "x", "legacy"), (2L, "y", "legacy"), (3L, "z", "fresh")))
  }

  test("encodeFramed carries keepCols, ignores extra columns, and fails fast on bad ids") {
    val df = Seq((10L, 1L, "x", "noise")).toDF("k", "a", "s", "junk")
    val framed = AvroRegistry.encodeFramed(df, 1, provider, keepCols = Seq("k"))
    assert(framed.columns.toSeq == Seq("k", "avro_framed"))
    assert(framed.head().getLong(0) == 10L)
    val back = AvroRegistry.decodeFramed(framed, "avro_framed", provider, v1,
      keepCols = Seq("k"))
    assert(back.columns.toSeq == Seq("k", "a", "s"))
    assert(back.head() == Row(10L, 1L, "x"))
    intercept[IllegalArgumentException] {
      AvroRegistry.encodeFramed(df, 99, provider)
    }
    intercept[IllegalArgumentException] {
      AvroRegistry.encodeFramed(df, 1, provider, keepCols = Seq("avro_framed"))
    }
  }

  test("encodeKafkaAvro emits the sink contract and round-trips through decodeKafkaAvro") {
    val df = Seq(("k1", 1L, "x"), ("k2", 2L, "y")).toDF("key_str", "a", "s")
    val noKey = Streams.encodeKafkaAvro(df, 1, provider)
    assert(noKey.columns.toSeq == Seq("value"))
    val keyed = Streams.encodeKafkaAvro(df, 1, provider, keyCol = Some("key_str"))
    assert(keyed.columns.toSeq == Seq("key", "value"))
    assert(keyed.schema("key").dataType.typeName == "binary")
    assert(keyed.schema("value").dataType.typeName == "binary")
    // a consumer-side frame (sink columns + the source metadata the
    // broker would add) decodes back to the produced rows, upgraded
    val consumed = keyed
      .withColumn("topic", lit("t")).withColumn("partition", lit(0))
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", current_timestamp())
    val got = Streams.decodeKafkaAvro(consumed, provider, v2)
      .select(col("a"), col("s"), col("extra")).orderBy("a")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "x", "legacy"), (2L, "y", "legacy")))
  }

  test("KafkaSinkConfig options are pure and toKafkaAvroSink composes without a broker") {
    val cfg = Streams.KafkaSinkConfig("b1:9092,b2:9092", "events",
      extraOptions = Map("kafka.acks" -> "all"))
    assert(cfg.options == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "topic" -> "events", "kafka.acks" -> "all"))
    intercept[IllegalArgumentException] { Streams.KafkaSinkConfig("", "t") }
    intercept[IllegalArgumentException] { Streams.KafkaSinkConfig("b", "") }
    // un-started writer over a genuine streaming frame: the encode
    // half and the option plumbing compose with no connector on the
    // classpath (start() is the only broker-touching step)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val writer = Streams.toKafkaAvroSink(
      stream.toDF().selectExpr("_1 as a", "_2 as s"), cfg, 1, provider,
      checkpointLocation = "/tmp/graft_kafka_sink_ck")
    assert(writer != null)
    intercept[IllegalArgumentException] {
      Streams.toKafkaAvroSink(stream.toDF().selectExpr("_1 as a", "_2 as s"),
        cfg, 1, provider, checkpointLocation = "")
    }
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped streaming source contract, file-backed.
  *
  * The container ships no kafka connector jar, so this module pins the
  * SHAPE a kafka-fed deployment relies on: records arrive as the
  * standard kafka columns (binary key/value + topic/partition/offset/
  * timestamp), and the typed event stream is recovered by decoding the
  * value payload — exactly the `from_json(CAST(value AS STRING))`
  * pipeline you run against a real `format("kafka")` source. Swapping
  * the landing-dir reader for the kafka reader changes ONE line; every
  * downstream transform ([[graft.streaming.EventStreams]]) is already
  * schema-compatible.
  *
  * At scale: decode is map-side (codegen'd `from_json`), partition
  * count follows the source (kafka partitions ↔ file splits), and no
  * shuffle happens before the first stateful transform.
  */
object KafkaShapedSource {

  /** The wire schema of a kafka record as Spark's kafka source exposes
    * it. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Typed payload schema of the `events` stream. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stream a landing dir of kafka-shaped parquet (the file-backed
    * stand-in for `spark.readStream.format("kafka")`). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(recordSchema).parquet(dir)

  /** Encode a typed events frame into kafka-shaped records — test/
    * fixture producer (key = user id bytes for per-user partition
    * affinity; value = JSON payload, the common wire format). */
  /** Microsecond-precision timestamp format so the JSON round-trip is
    * lossless (the default format truncates to millis). */
  private val jsonOpts = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  def encodeEvents(events: DataFrame, topic: String, nPartitions: Int = 4): DataFrame =
    events.select(
      encode(col("user_id").cast("string"), "UTF-8").as("key"),
      encode(to_json(struct(col("event_id"), col("ts"), col("user_id"),
                            col("event_type"), col("value"), col("props")),
                     jsonOpts),
             "UTF-8").as("value"),
      lit(topic).as("topic"),
      pmod(col("user_id"), lit(nPartitions)).cast("int").as("partition"),
      col("event_id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))

  /** Recover the typed event stream from kafka-shaped records. Works on
    * batch and streaming frames alike (pure projection). */
  def decodeEvents(records: DataFrame): DataFrame =
    records
      .select(from_json(col("value").cast("string"), eventSchema, jsonOpts).as("e"))
      .select(col("e.event_id"), col("e.ts"), col("e.user_id"),
              col("e.event_type"), col("e.value"), col("e.props"))
}

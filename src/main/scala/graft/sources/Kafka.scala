package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Thin Kafka-shaped streaming seam — the last wire-level external on
  * the stand-in list (SURVEY §6): exactly-once ingestion is already
  * proven end-to-end (MemoryStream → foreachBatch → idempotent sink,
  * ExactlyOnceSpec + `stream_replay_merge`), so what a deployment still
  * needs is only the CONNECTOR seam, mirrored here the way
  * [[Mongo]]/[[Jdbc]] mirror the document/relational phases.
  *
  * The portable contract is the Kafka record ENVELOPE — the exact
  * column set Spark's Kafka source produces (`key`/`value` as BINARY,
  * `topic`, `partition`, `offset`, `timestamp`, `timestampType`).
  * Pipeline code is written against the envelope once:
  *
  *  - [[Kafka.readStream]]/[[Kafka.writeTo]] are the WIRE path: they
  *    route `format("kafka")` with the documented options
  *    (`kafka.bootstrap.servers`, `subscribe`/`topic`,
  *    `startingOffsets`, `maxOffsetsPerTrigger`) — resolved BY NAME at
  *    runtime, so a deployment shipping spark-sql-kafka gets the real
  *    source with zero code changes; this sandbox (no Kafka jars, zero
  *    egress) fails fast at format resolution (spec-asserted).
  *  - [[Kafka.toEnvelope]] wraps ANY frame — batch fixtures or a
  *    MemoryStream — in the same envelope schema, so every transform
  *    downstream of the source runs IDENTICALLY against the stand-in;
  *    [[Kafka.decodeJson]] is the shared value-decode used by both.
  *
  * Scale notes: read parallelism is topic partitions (one Spark task
  * per partition per micro-batch) — size the topic, not the job;
  * `maxOffsetsPerTrigger` is the backpressure bound that keeps a
  * catch-up replay from swallowing the cluster; the envelope's
  * `timestamp` feeds the watermark exactly like `events.ts` does in the
  * §2.E keys. Value decode is `from_json` on a BINARY→STRING cast —
  * whole-stage-codegen'd, no UDF.
  */
object Kafka {

  /** The column set Spark's Kafka source emits — the portable contract
    * pipeline code is written against. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  final case class Conn(bootstrapServers: String, topic: String,
                        options: Map[String, String] = Map.empty)

  /** Wire path: the streaming read every Kafka deployment starts from.
    * Filters on `topic`/`partition` and the projection push into the
    * source; the envelope arrives exactly as [[envelopeSchema]]. */
  def readStream(spark: SparkSession, conn: Conn): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", conn.bootstrapServers)
      .option("subscribe", conn.topic)
      .options(conn.options)
      .load()

  /** Wire path, producer side: frame must carry `value` (BINARY or
    * STRING) and optionally `key`/`topic` — the connector's contract. */
  def writeTo(df: DataFrame, conn: Conn, checkpointDir: String) =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", conn.bootstrapServers)
      .option("topic", conn.topic)
      .option("checkpointLocation", checkpointDir)
      .options(conn.options)

  /** Stand-in path: wrap any frame (a MemoryStream's output, a batch
    * fixture) in the wire envelope — `valueCols` JSON-encode into
    * `value`, `keyCol` into `key`, offsets are per-partition
    * monotonically increasing (the Kafka guarantee that matters for
    * dedup keys; NOT globally dense, exactly like the real source). */
  def toEnvelope(df: DataFrame, topic: String, keyCol: Column,
                 valueCols: Seq[Column], tsCol: Column): DataFrame =
    df.select(
      keyCol.cast("string").cast("binary").as("key"),
      to_json(struct(valueCols: _*)).cast("binary").as("value"),
      lit(topic).as("topic"),
      spark_partition_id().as("partition"),
      (monotonically_increasing_id() % (1L << 33)).as("offset"),
      tsCol.cast("timestamp").as("timestamp"),
      lit(0).as("timestampType"))

  /** Shared value decode (both backends): JSON value → typed columns,
    * envelope metadata preserved for offset/dedup bookkeeping. */
  def decodeJson(envelope: DataFrame, schema: StructType): DataFrame =
    envelope.select(
      col("topic"), col("partition"), col("offset"), col("timestamp"),
      from_json(col("value").cast("string"), schema).as("v"))
      .select(col("topic"), col("partition"), col("offset"),
        col("timestamp"), col("v.*"))
}

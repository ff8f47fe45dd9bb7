package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Kafka

/** Exercises the Kafka-shaped seam: the envelope round-trip (the code
  * path every pipeline shares with a wire deployment) and the wire
  * path's wiring to the `kafka` DataSource format, which this sandbox
  * cannot run (no spark-sql-kafka jars) — asserted to fail at exactly
  * the format-resolution seam, the same pattern as MongoSpec. */
class KafkaSpec extends SparkSpec {
  import spark.implicits._

  private val conn = Kafka.Conn("localhost:9092", "events")

  test("envelope round-trip: toEnvelope produces the wire schema, decodeJson recovers rows") {
    val src = Seq((1L, "view", 1000L), (2L, "click", 2000L), (3L, "view", 3000L))
      .toDF("user_id", "event_type", "ts_ms")
      .withColumn("ts", timestamp_millis($"ts_ms"))
    val env = Kafka.toEnvelope(src, "events", $"user_id",
      Seq($"user_id", $"event_type"), $"ts")
    // the envelope must be EXACTLY the wire column set, in wire order
    assert(env.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Kafka.envelopeSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val back = Kafka.decodeJson(env, StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType))))
      .select($"user_id", $"event_type").as[(Long, String)].collect().toSet
    assert(back === Set((1L, "view"), (2L, "click"), (3L, "view")))
    // offsets are monotone within a partition (the dedup-key guarantee)
    val perPart = env.select($"partition", $"offset").as[(Int, Long)]
      .collect().groupBy(_._1).values
    perPart.foreach { ofs =>
      val s = ofs.map(_._2).toSeq
      assert(s === s.sorted, "offsets must be monotone per partition")
    }
  }

  test("wire path reaches the kafka DataSource format (jar-absent sandbox)") {
    val e = intercept[Exception] {
      Kafka.readStream(spark, conn).writeStream
        .format("memory").queryName("kafka_probe").start()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"readStream must fail at kafka format resolution, got: ${e.getMessage}")
  }
}

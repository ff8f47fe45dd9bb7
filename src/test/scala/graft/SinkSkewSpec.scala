package graft

import org.apache.spark.sql.functions._
import graft.sinks.ParquetSink

class SinkSkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val got = q("q_skew_salted_agg").orderBy("event_type")
      .as[(String, Long, Double)].collect().toSeq
    val plain = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round($"value" * 100).cast("bigint")).cast("double") / 100.0).as("s"))
      .orderBy("event_type").as[(String, Long, Double)].collect().toSeq
    assert(got === plain)
  }

  test("partitioned write round-trips and prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/docs"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    ParquetSink.writePartitioned(docs, dir, Seq("lang"))
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    val pruned = back.filter($"lang" === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
    assert(pruned.count() === docs.filter($"lang" === "en").count())
  }

  test("parquet upsert replaces keys and keeps the rest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    val base = Seq((1L, "en", "x"), (2L, "de", "y")).toDF("id", "lang", "v")
    ParquetSink.upsertInto(spark, dir, base, "id", Seq("lang"))
    val upd = Seq((2L, "de", "Y2"), (3L, "fr", "z")).toDF("id", "lang", "v")
    ParquetSink.upsertInto(spark, dir, upd, "id", Seq("lang"))
    val got = spark.read.parquet(dir).select("id", "v").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "x"), (2L, "Y2"), (3L, "z")))
  }
}

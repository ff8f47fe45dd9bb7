package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

class SourceSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeEventTs restores the epoch-nanos contract from any physical ts type") {
    // micros-era parquet: ts arrives as a timestamp type -> exact
    // unix_micros*1000; nanos-long data passes through untouched
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    val us = 1700000000123456L // epoch micros with sub-second precision
    Seq((1L, new java.sql.Timestamp(us / 1000)))
      .toDF("event_id", "ts")
      .withColumn("ts", $"ts" + expr("INTERVAL 456 MICROSECOND"))
      .write.parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir)
    assert(back.schema("ts").dataType.typeName === "long")
    assert(back.select("ts").as[Long].head() === us * 1000L,
      "timestamp must convert to exact epoch nanos")
    val asLong = Seq((1L, us * 1000L)).toDF("event_id", "ts")
    assert(Tables.normalizeEventTs(asLong).select("ts").as[Long].head() === us * 1000L,
      "nanos-long input must pass through unchanged")
    // a frame with no ts column is untouched
    assert(Tables.normalizeEventTs(Seq(1L).toDF("x")).columns.toSeq === Seq("x"))
  }

  test("csv ingest round-trips the documents table (reference extract step)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/docs_csv"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.write.option("header", "true").mode("overwrite").csv(dir)
    val back = Tables.csv(spark, dir)
    assert(back.count() === docs.count())
    assert(back.columns.sorted.toSeq === docs.columns.sorted.toSeq)
    // schema inference recovers numeric ids
    assert(back.schema("doc_id").dataType.typeName === "integer" ||
      back.schema("doc_id").dataType.typeName === "long")
    val s1 = back.agg(sum("n_chars")).as[Long].head()
    val s2 = docs.agg(sum("n_chars")).as[Long].head()
    assert(s1 === s2)
  }

  test("orc round-trip preserves data and prunes columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/docs_orc"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).as[Long].head() ===
      docs.agg(sum("n_chars")).as[Long].head())
    val plan = back.select("doc_id").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"))
  }

  test("jsonl ingest round-trips the documents table (mongoexport shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.write.json(dir)
    val back = graft.sources.Tables.jsonl(spark, dir, Some(docs.schema))
    assert(back.schema === docs.schema, "explicit schema must be honored")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("approx_count_distinct stays within the configured error bound") {
    val rows = q("q_approx_distinct").as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (prio, exact, within) =>
      assert(exact > 0)
      assert(within, s"$prio: sketch outside the 5% bound (exact=$exact)")
    }
  }

  test("bucketed tables join without a shuffle on the join key") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("graft_orders_b")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("graft_customer_b")
    val joined = spark.table("graft_orders_b")
      .join(spark.table("graft_customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucketed co-partitioning: no Exchange feeding the join
    val exchanges = "Exchange hashpartitioning\\((o_custkey|c_custkey)".r.findAllIn(plan).length
    assert(exchanges === 0, s"expected shuffle-free bucketed join, plan:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_customer_b")
  }
}

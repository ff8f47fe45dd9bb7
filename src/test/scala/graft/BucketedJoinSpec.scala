package graft

import org.apache.spark.sql.functions._
import graft.sinks.BucketedSink

/** Proves the co-located-join contract: joining two tables bucketed on
  * the join key runs with ZERO Exchange operators in the executed plan —
  * the write-time shuffle is amortized over every later join. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join has no Exchange and matches the plain join") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    BucketedSink.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    BucketedSink.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 4)
    // disable broadcast so the join strategy is the bucketed SMJ the
    // contract is about (at real scale neither fact side broadcasts)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        .groupBy($"o_custkey").agg(sum($"l_quantity").cast("bigint").as("q"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      // ONE exchange is legitimate: the groupBy on o_custkey. The JOIN
      // itself must not shuffle — assert by counting: a non-bucketed plan
      // has 3 exchanges (two join inputs + agg), the bucketed one exactly 1.
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges === 1, s"expected only the agg exchange, plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), "bucketed join should sort-merge")
      // and the result is the same as joining the raw parquet
      val plain = orders.join(
          lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .groupBy($"o_custkey").agg(sum($"l_quantity").cast("bigint").as("q"))
        .as[(Long, Long)].collect().toMap
      val bucketed = joined.as[(Long, Long)].collect().toMap
      assert(bucketed === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("q_bucketed_join's only shuffle is the final tiny aggregate") {
    // the inventory query reads the memoized bucketed tables with a merge
    // hint: the fact-fact join must consume the write-time bucketing (no
    // Exchange on either input), leaving exactly the per-priority agg
    // exchange — even with AQE on (the production setting)
    val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected only the agg exchange, plan:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"bucketed join should sort-merge:\n$plan")
  }

  test("bucket pruning: an equality filter on the bucket key scans one bucket") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
    BucketedSink.writeBucketed(orders, "orders_bp", "o_orderkey", 8)
    // the planner auto-disables bucketed scans that don't help avoid an
    // exchange; bucket PRUNING needs the bucketed scan kept on
    val prevAuto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val key = orders.select($"o_orderkey").as[Long].head()
      val q = spark.table("orders_bp").filter($"o_orderkey" === key)
      assert(q.count() === 1)
      val formatted = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the scan reports the selected bucket subset
      assert(formatted.contains("Bucketed: true"),
        s"scan should be bucketed:\n$formatted")
      assert("SelectedBucketsCount: 1 out of 8".r.findFirstIn(formatted).nonEmpty,
        s"expected single-bucket pruning:\n$formatted")
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.sql("DROP TABLE IF EXISTS orders_bp")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("semi + anti join partition the customer set") {
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    val semi = q("q_semi_join").count()
    val anti = q("q_anti_join").count()
    val withOrders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(anti === nCust - withOrders)
    assert(semi <= withOrders)
  }

  test("outer join keeps every customer, including zero-order ones") {
    val out = q("q_outer_join")
    assert(out.count() === spark.read.parquet(s"$sf/customer.parquet").count())
    assert(out.filter($"n_orders" === 0 && $"total_spend" =!= 0.0).isEmpty)
  }

  test("topk_per_group emits at most 3 rows per customer, rank-ordered by price") {
    val out = q("q_topk_per_group").cache()
    assert(out.groupBy("o_custkey").count().filter($"count" > 3).isEmpty)
    val bad = out.as[(Long, Long, Double, Int)].collect().toSeq
      .groupBy(_._1).values
      .flatMap(rows => rows.sortBy(_._4).sliding(2).toSeq
        .filter { case Seq(hi, lo) => hi._3 < lo._3; case _ => false })
    assert(bad.isEmpty)
  }

  test("rollup grand-total row equals whole-table aggregate") {
    val out = q("q_rollup")
    val grand = out.filter($"l_returnflag".isNull && $"l_linestatus".isNull)
      .select("n").as[Long].head()
    assert(grand === spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("pivot row counts sum to order counts per status") {
    val out = q("q_pivot")
    val summed = out.select(($"p_urgent" + $"p_high" + $"p_medium" + $"p_notspec" + $"p_low").as("s"))
      .agg(sum("s")).as[Long].head()
    assert(summed === spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("running window's final value equals the customer's total spend") {
    val finals = q("q_window_running").groupBy("o_custkey")
      .agg(max(round($"running_spend" * 100)).cast("bigint").as("final_c"))
    val totals = spark.read.parquet(s"$sf/orders.parquet").groupBy("o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("bigint")).as("total_c"))
    assert(finals.join(totals, "o_custkey").filter($"final_c" =!= $"total_c").isEmpty)
  }

  test("setops: except and intersect are disjoint on urgent-low vs urgent-high") {
    val out = q("q_setops").cache()
    val ex = out.filter($"op" === "except").select("o_custkey").as[Long].collect().toSet
    val low = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderpriority" === "5-LOW").select("o_custkey").as[Long].collect().toSet
    assert(ex.intersect(low).isEmpty)
  }

  test("q_percentiles rank selection equals a driver-side sort of one group") {
    val out = q("q_percentiles").cache()
    assert(out.filter($"p50" > $"p90" || $"p90" > $"p99").isEmpty,
      "percentiles must be monotone")
    val (g, p50, p90, p99, n) = out
      .select($"event_type", $"p50", $"p90", $"p99", $"n_events")
      .as[(String, Double, Double, Double, Long)].head()
    val vals = graft.sources.Tables.events(spark, sf)
      .filter($"event_type" === g)
      .select(round($"value" * 100).cast("long").as("vc"), $"event_id")
      .as[(Long, Long)].collect().sortBy(identity).map(_._1)
    assert(vals.length === n)
    def pick(p: Double) = vals(math.ceil(vals.length * p).toInt - 1) / 100.0
    assert((p50, p90, p99) === (pick(0.5), pick(0.9), pick(0.99)),
      s"group=$g rank selection must match the sorted reference")
  }

  test("q_outlier_iqr matches a hand-computed Tukey-fence reference per group") {
    val out = q("q_outlier_iqr")
      .select($"event_type", $"n_events", $"q1", $"q3", $"n_outliers",
        $"min_outlier", $"max_outlier")
      .collect()
    assert(out.nonEmpty)
    val events = spark.read.parquet(s"$sf/events.parquet")
      .filter($"value".isNotNull)
      .select($"event_type", round($"value" * 100).cast("long").as("vc"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { r =>
      val vals = events(r.getString(0))
      assert(r.getLong(1) === vals.length.toLong)
      def pick(p: Double) = vals(math.ceil(vals.length * p).toInt - 1)
      val (q1, q3) = (pick(0.25), pick(0.75))
      assert(r.getDouble(2) === q1 / 100.0 && r.getDouble(3) === q3 / 100.0)
      // fences in doubled cents — the exact arithmetic the key uses
      val outliers = vals.filter(v =>
        v * 2 < q1 * 2 - (q3 - q1) * 3 || v * 2 > q3 * 2 + (q3 - q1) * 3)
      assert(r.getLong(4) === outliers.length.toLong,
        s"${r.getString(0)}: outlier count must match the reference fences")
      if (outliers.nonEmpty) {
        assert(r.getDouble(5) === outliers.min / 100.0)
        assert(r.getDouble(6) === outliers.max / 100.0)
      } else {
        assert(r.isNullAt(5) && r.isNullAt(6),
          "no outliers must report NULL extremes, not sentinel values")
      }
    }
  }
}

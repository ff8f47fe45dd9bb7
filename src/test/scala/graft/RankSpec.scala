package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level grouped rank selection (operators/Rank.scala): label-exact
  * vs the naive per-group window, and the PLAN claim — no window over
  * corpus rows is partitioned by the group columns alone (the per-group
  * single-reducer sort the operator exists to avoid); every corpus-side
  * window clusters by the physical partition id. */
class RankSpec extends SparkSpec {
  import spark.implicits._

  private def randomRows(n: Int, groups: Int, values: Int) = {
    val rnd = new scala.util.Random(7)
    (1 to n).map { i =>
      (i.toLong, s"g${rnd.nextInt(groups)}", rnd.nextInt(values).toLong)
    }
  }

  test("withGroupRank matches the naive per-group window exactly (unique tiebreak)") {
    val df = randomRows(5000, 4, 50).toDF("id", "grp", "v")
    val two = graft.operators.Rank
      .withGroupRank(df, Seq("grp"), "v", tiebreakCols = Seq("id"))
      .select("grp", "id", "v", "rank", "n")
    val naive = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("grp").orderBy($"v", $"id")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("grp", "id", "v", "rank", "n")
    assert(two.exceptAll(naive).isEmpty && naive.exceptAll(two).isEmpty)
  }

  test("withGroupRank without tiebreak: the VALUE at every rank is the sorted order") {
    // heavy ties and no tiebreak: row identity at a rank is arbitrary,
    // but the (group, rank) -> value mapping must equal the sorted order
    val df = randomRows(3000, 3, 10).toDF("id", "grp", "v")
    val two = graft.operators.Rank.withGroupRank(df, Seq("grp"), "v")
      .select("grp", "rank", "v", "n")
    val naive = df
      .withColumn("rank", row_number().over(Window.partitionBy("grp").orderBy($"v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("grp", "rank", "v", "n")
    assert(two.exceptAll(naive).isEmpty && naive.exceptAll(two).isEmpty)
  }

  test("withGroupRank: empty input and reserved-column guard") {
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "grp", "v")
    assert(graft.operators.Rank.withGroupRank(empty, Seq("grp"), "v").isEmpty)
    val bad = Seq((1L, "g", 1L)).toDF("rank", "grp", "v")
    assertThrows[IllegalArgumentException] {
      graft.operators.Rank.withGroupRank(bad, Seq("grp"), "v")
    }
  }

  /** partitionSpec column names of every WindowExec whose input carries
    * `corpusCol` (i.e. windows over corpus rows, not over the tiny
    * per-(pid, group) offset table). AQE is disabled by the caller so
    * the physical windows are directly collectible. */
  private def corpusWindowSpecs(df: DataFrame, corpusCol: String): Seq[Seq[String]] =
    df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.child.output.exists(_.name == corpusCol) =>
        w.partitionSpec.map(_.toString)
    }

  private def withAqeOff[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try { spark.conf.set("spark.sql.adaptive.enabled", "false"); f }
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q_percentiles plan: every corpus-side window clusters by the physical partition") {
    withAqeOff {
      val specs = corpusWindowSpecs(q("q_percentiles"), "vc")
      assert(specs.nonEmpty, "expected a corpus-side window (the local rank)")
      specs.foreach { s =>
        assert(s.exists(_.contains("__pid")),
          s"corpus window partitioned by ${s.mkString(",")} — a per-group single-reducer sort")
      }
    }
  }

  test("q_percent_rank plan: the full-row window family rides the same partitioned plan") {
    withAqeOff {
      val specs = corpusWindowSpecs(q("q_percent_rank"), "vc")
      assert(specs.nonEmpty, "expected a corpus-side window (the local rank)")
      specs.foreach { s =>
        assert(s.exists(_.contains("__pid")),
          s"corpus window partitioned by ${s.mkString(",")} — a per-group single-reducer sort")
      }
    }
  }

  test("ana_median_by_group plan: no window at all — one counting-median hash aggregate") {
    withAqeOff {
      val df = q("ana_median_by_group")
      // round 19: the key moved from the two-level rank construction to
      // the graft_median_long counting aggregate (state O(distinct
      // cents), map-side combined) — the plan must carry NO window of
      // any kind over corpus rows and NO sort, just the aggregate
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "expected a window-free counting-median plan")
      val planStr = plan.toString
      assert(planStr.contains("graft_median_long"),
        "expected the graft_median_long counting aggregate in the plan")
      // the memory-buffering exact percentile aggregate must be gone too
      assert(!planStr.contains("percentile("),
        "exact percentile aggregate buffers every group value in executor memory")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, "expected no sort anywhere — counting median never orders rows")
    }
  }

  test("q_percentiles values equal the naive single-window rank selection") {
    val out = q("q_percentiles").as[(String, Double, Double, Double, Long)]
      .collect().sortBy(_._1).toSeq
    val w = Window.partitionBy("event_type").orderBy($"vc", $"event_id")
    val cw = Window.partitionBy("event_type")
    def pick(p: Double) =
      max(when($"rn" === ceil($"n" * p), $"vc")).cast("double") / 100.0
    val naive = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", round($"value" * 100).cast("bigint").as("vc"), $"event_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .groupBy("event_type")
      .agg(pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"),
        count(lit(1)).as("n_events"))
      .as[(String, Double, Double, Double, Long)].collect().sortBy(_._1).toSeq
    assert(out === naive)
  }

  test("withGlobalIds equals the naive global row_number (unique order)") {
    val df = randomRows(5000, 4, 50).toDF("id", "grp", "v")
      .repartition(13) // arbitrary physical layout — ids must not care
    val got = graft.operators.Rank.withGlobalIds(df, Seq("v", "id"), "sid")
      .select("id", "grp", "v", "sid")
    val naive = df
      .withColumn("sid", row_number().over(Window.orderBy($"v", $"id")).cast("long"))
      .select("id", "grp", "v", "sid")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("withGlobalIds: ids are dense 1..n and the reserved-column guard holds") {
    val df = randomRows(1000, 3, 20).toDF("id", "grp", "v")
    val ids = graft.operators.Rank.withGlobalIds(df, Seq("v", "id"), "sid")
      .select($"sid".as[Long]).collect().sorted
    assert(ids.toSeq == (1L to 1000L))
    val bad = Seq((1L, "g", 1L)).toDF("__gall", "grp", "v")
    assertThrows[IllegalArgumentException] {
      graft.operators.Rank.withGlobalIds(bad, Seq("v"))
    }
  }

  test("etl_dense_ids plan: no SinglePartition exchange anywhere") {
    withAqeOff {
      val plan = q("etl_dense_ids").queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"),
        "dense-id plan funnels the table through one task")
      // the naive form DOES plan one — the thing the operator avoids
      val naive = spark.read.parquet(s"$sf/orders.parquet")
        .withColumn("sid", row_number().over(Window.orderBy($"o_orderdate", $"o_orderkey")))
      assert(naive.queryExecution.executedPlan.toString.contains("SinglePartition"))
    }
  }

  test("q_ntile equals the naive ntile window, and its plan avoids the per-group sort") {
    withAqeOff {
      val out = q("q_ntile")
      val naive = spark.read.parquet(s"$sf/orders.parquet")
        .select($"o_orderpriority".as("pr"),
          round($"o_totalprice" * 100).cast("bigint").as("vc"), $"o_orderkey")
        .withColumn("quartile", ntile(4).over(
          Window.partitionBy("pr").orderBy($"vc", $"o_orderkey")).cast("bigint"))
        .groupBy("pr", "quartile")
        .agg(count(lit(1)).as("n_orders"),
          (min($"vc").cast("double") / 100.0).as("min_price"),
          (max($"vc").cast("double") / 100.0).as("max_price"))
      assert(out.exceptAll(naive).isEmpty && naive.exceptAll(out).isEmpty)
      val specs = corpusWindowSpecs(out, "vc")
      assert(specs.nonEmpty, "expected a corpus-side window (the local rank)")
      specs.foreach { s =>
        assert(s.exists(_.contains("__pid")),
          s"corpus window partitioned by ${s.mkString(",")} — a per-group single-reducer sort")
      }
    }
  }

  test("ana_median_by_group equals Spark's exact percentile aggregate") {
    val out = q("ana_median_by_group").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq
    val naive = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", round($"l_extendedprice" * 100).cast("bigint").as("price_c"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        (expr("percentile(price_c, 0.5)") / 100.0).as("median_price"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out === naive)
  }
}

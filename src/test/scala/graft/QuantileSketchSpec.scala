package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** The mergeable quantile sketch's four claims: merging is EXACT
  * (sketch(A∪B) ≡ merge(sketch(A), sketch(B))), estimates stay inside
  * the 2^-(b+1) relative-error bound against exact rank selection, the
  * sketch is partition/order-invariant, and the streaming sum-agg form
  * produces the identical sketch (the incremental-dashboard shape). */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events = spark.read.parquet(s"$sf/events.parquet")
    .select($"event_type", round($"value" * 100).cast("bigint").as("vc"),
      $"event_id")

  test("merge of two disjoint slices equals the one-shot sketch exactly") {
    val a = events.filter($"event_id" % 2 === 0)
    val b = events.filter($"event_id" % 2 =!= 0)
    val merged = QuantileSketch.merge(
      QuantileSketch.sketch(a, Seq("event_type"), "vc"),
      QuantileSketch.sketch(b, Seq("event_type"), "vc"))
    val oneShot = QuantileSketch.sketch(events, Seq("event_type"), "vc")
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty,
      "merge must be exact — count addition, no approximation")
  }

  test("estimates stay inside the 2^-(b+1) relative-error bound vs exact rank selection") {
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val est = QuantileSketch
      .quantileEstimate(events, Seq("event_type"), "vc", qs)
      .select($"event_type", $"p50", $"p90", $"p99")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    def pick(p: Double) = max(when($"rank" === ceil($"n" * p), $"vc")).cast("double")
    val exact = graft.operators.Rank
      .withGroupRank(events, Seq("event_type"), "vc", tiebreakCols = Seq("event_id"))
      .groupBy("event_type")
      .agg(pick(0.5).as("e50"), pick(0.9).as("e90"), pick(0.99).as("e99"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    val bound = 1.0 / (1 << (QuantileSketch.SubBits + 1)) + 1e-12
    exact.foreach { case (g, ex) =>
      est(g).zip(ex).zip(Seq("p50", "p90", "p99")).foreach { case ((e, x), name) =>
        val rel = if (x == 0.0) math.abs(e) else math.abs(e - x) / x
        assert(rel <= bound, s"$g $name: est=$e exact=$x rel=$rel > $bound")
      }
    }
  }

  test("sketch is partition- and order-invariant") {
    val base = QuantileSketch.sketch(events, Seq("event_type"), "vc")
    val shuffled = QuantileSketch.sketch(
      events.repartition(13, $"event_id").sortWithinPartitions($"vc".desc),
      Seq("event_type"), "vc")
    assert(base.exceptAll(shuffled).isEmpty && shuffled.exceptAll(base).isEmpty)
  }

  test("null and negative values raise the fused guard") {
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    val bad = Seq(("a", Some(5L)), ("a", None)).toDF("g", "v")
    val e = intercept[Exception] {
      QuantileSketch.sketch(bad, Seq("g"), "v").collect()
    }
    assert(msg(e).contains("null or negative value"))
    val neg = Seq(("a", 5L), ("a", -1L)).toDF("g", "v")
    val e2 = intercept[Exception] {
      QuantileSketch.sketch(neg, Seq("g"), "v").collect()
    }
    assert(msg(e2).contains("null or negative value"))
  }

  test("small values get exact buckets; estimates are exact below 2^(b+1)") {
    // every value < 128 is its own bucket, so the estimate at any
    // quantile is the exact rank-selected value (midpoint = the value)
    val df = (1L to 100L).map(v => ("g", v)).toDF("g", "v")
    val out = QuantileSketch
      .quantileEstimate(df, Seq("g"), "v", Seq("p50" -> 0.5, "p99" -> 0.99))
      .select($"p50", $"p99").as[(Double, Double)].head()
    assert(out === ((50.0, 99.0)))
  }

  test("weighted sketch with unit weights equals the plain sketch; weights equal row repetition") {
    val df = spark.range(2000).select(($"id" % 3).as("g"),
      (($"id" * 37) % 500 + 1).as("v"), (($"id" % 5) + 1).as("w"))
    val unit = QuantileSketch.sketch(df, Seq("g"), "v")
      .as[(Long, Long, Long)].collect().toSet
    val unitW = QuantileSketch.sketchWeighted(
        df.withColumn("one", org.apache.spark.sql.functions.lit(1L)), Seq("g"), "v", "one")
      .as[(Long, Long, Long)].collect().toSet
    assert(unitW === unit, "weight 1 must reduce to the unweighted sketch")
    // integer weights = the sketch of the row-repeated frame, exactly
    val repeated = df.select($"g", $"v",
      explode(sequence(lit(1), $"w".cast("int"))).as("i"))
    val viaRepeat = QuantileSketch.sketch(repeated, Seq("g"), "v")
      .as[(Long, Long, Long)].collect().toSet
    val viaWeight = QuantileSketch.sketchWeighted(df, Seq("g"), "v", "w")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaWeight === viaRepeat, "weighted counts must equal row repetition")
  }

  test("weighted quantiles track the exact weighted median within the error bound") {
    val df = spark.range(5000).select(lit("g").as("g"),
      (($"id" * 97) % 4000 + 16).as("v"), (($"id" % 7) + 1).as("w"))
    val est = QuantileSketch.quantiles(
        QuantileSketch.sketchWeighted(df, Seq("g"), "v", "w"),
        Seq("g"), Seq("p50" -> 0.5))
      .select($"p50").as[Double].head()
    val exact = df.select($"v", explode(sequence(lit(1), $"w".cast("int"))))
      .stat.approxQuantile("v", Array(0.5), 0.0).head
    assert(math.abs(est - exact) / exact <= 1.0 / 128.0 + 1e-9,
      s"weighted p50 est $est vs exact $exact outside 2^-7")
  }

  test("null and negative weights raise the fused guard") {
    val bad = Seq((1L, 5L, -1L)).toDF("g", "v", "w")
    val ex = intercept[Exception] {
      QuantileSketch.sketchWeighted(bad, Seq("g"), "v", "w").collect()
    }
    assert(ex.getMessage.contains("negative weight"))
  }

  test("streaming windowed sketch equals the batch sketch (complete-mode parity)") {
    // the sketch state is per-(window, bucket) COUNTS — a streaming
    // sum-agg maintains it incrementally with ≤ ~7.4k rows of state per
    // window; the final sketch must equal the batch build
    import graft.streaming.Events
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(spark.read.parquet(s"$sf/events.parquet").schema)
        .parquet(s"$sf/events.parque[t]"))
    def hourly(df: org.apache.spark.sql.DataFrame) = df.select(
      date_format(date_trunc("hour", Events.tsCol($"ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"),
      round($"value" * 100).cast("bigint").as("vc"))
    val qy = QuantileSketch.sketch(hourly(stream), Seq("hour"), "vc")
      .writeStream.outputMode("complete").format("memory")
      .queryName("qsk_counts").start()
    qy.processAllAvailable(); qy.stop()
    val viaStream = spark.table("qsk_counts")
      .as[(String, Long, Long)].collect().toSet
    val viaBatch = QuantileSketch
      .sketch(hourly(graft.sources.Tables.table(spark, sf, "events")), Seq("hour"), "vc")
      .as[(String, Long, Long)].collect().toSet
    assert(viaStream === viaBatch, "stream and batch sketches must be identical")
  }
}

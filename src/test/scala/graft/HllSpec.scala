package graft

import org.apache.spark.sql.functions._
import graft.operators.Hll

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.sources.Tables.events(spark, sf)

  test("estimate is partition-invariant and registers stay within m") {
    val a = q("q_hll_distinct").collect().map(_.toString).sorted.toSeq
    val b = Hll.distinctEstimate(events.repartition(13), Seq("event_type"), "user_id")
      .collect().map(_.toString).sorted.toSeq
    assert(a === b, "sketch must not depend on physical layout")
    val out = q("q_hll_distinct")
    assert(out.filter($"n_buckets" > Hll.M).isEmpty)
    assert(out.filter($"est" <= 0.0).isEmpty)
  }

  test("a null key raises instead of inflating the estimate via a phantom register") {
    val df = Seq((Some(1L), "g"), (None, "g")).toDF("k", "g")
    val e = intercept[Exception] {
      Hll.distinctEstimate(df, Seq("g"), "k").collect()
    }
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("Hll: null key"))
  }

  test("sketch is mergeable: registers of a union = max-merge of the parts") {
    val left = events.filter($"event_id" % 2 === 0)
    val right = events.filter($"event_id" % 2 =!= 0)
    val merged = Hll.registers(left, Seq("event_type"), "user_id")
      .unionByName(Hll.registers(right, Seq("event_type"), "user_id"))
      .groupBy("event_type", "bucket").agg(max($"reg").as("reg"))
    val direct = Hll.registers(events, Seq("event_type"), "user_id")
    val mismatch = merged.join(direct, Seq("event_type", "bucket"), "full")
      .filter(!(merged("reg") <=> direct("reg")))
    assert(mismatch.isEmpty,
      "per-batch sketches max-merged must equal the one-shot sketch — " +
        "the property that lets 100 TB of partial sketches combine")
  }

  test("q_hll_merge: merged three-batch estimate equals the one-shot sketch exactly") {
    // the query-level form of the identity: mergeRegisters over the
    // date-slice-shaped batches, finalized, must be row-identical to
    // distinctEstimate over the full feed (fingerprint included)
    val merged = graft.SparkEntry.queries("q_hll_merge")(spark, sf)
      .select($"event_type", $"n_buckets", $"reg_fp", $"est")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val oneShot = Hll.distinctEstimate(events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(merged === oneShot,
      "merge(reg(A), reg(B), reg(C)) must equal reg(A ∪ B ∪ C) — estimate AND fingerprint")
    // and the batches genuinely sketched separately: per-batch register
    // mass strictly exceeds the merged register count wherever a bucket
    // was hit by more than one batch (it is on this feed)
    val out = graft.SparkEntry.queries("q_hll_merge")(spark, sf)
      .select($"event_type", $"n_batch_regs", $"n_buckets")
      .as[(String, Long, Long)].collect()
    assert(out.forall { case (_, nb, n) => nb >= n },
      "summed per-batch registers can never undercount the merged set")
    assert(out.exists { case (_, nb, n) => nb > n },
      "fixture must actually overlap batches on some bucket")
  }

  test("streaming windowed registers equal the batch sketch (complete-mode parity)") {
    // the register state is a per-(window, bucket) max — a streaming agg
    // maintains it incrementally with ≤ m rows of state per window; the
    // final registers must equal the batch build over the same data
    import graft.streaming.Events
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(spark.read.parquet(s"$sf/events.parquet").schema)
        .parquet(s"$sf/events.parque[t]"))
    def hourly(df: org.apache.spark.sql.DataFrame) = df.select(
      date_format(date_trunc("hour", Events.tsCol($"ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"),
      $"user_id")
    val qy = Hll.registers(hourly(stream), Seq("hour"), "user_id")
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_regs").start()
    qy.processAllAvailable(); qy.stop()
    val viaStream = spark.table("hll_regs")
      .as[(String, Long, Int)].collect().toSet
    val viaBatch = Hll.registers(hourly(events), Seq("hour"), "user_id")
      .as[(String, Long, Int)].collect().toSet
    assert(viaStream === viaBatch, "stream and batch sketches must be identical")
  }

  test("raw estimate tracks the exact count in the estimator's valid regime") {
    // the raw estimator (no ln-based small-range correction — the
    // documented trade for exact cross-engine replay) is only valid for
    // n ≳ 2.5·m, the 100 TB operating regime — so accuracy is asserted
    // on a synthetic in-range cardinality: 50k distinct keys, m=1024,
    // 3σ ≈ 3·1.04/√1024 ≈ 10%
    val n = 50000
    val df = spark.range(n).select(($"id" % 7).as("g"), $"id".as("k"))
    val est = Hll.distinctEstimate(df, Seq("g"), "k")
      .select($"g", $"est").as[(Long, Double)].collect().toMap
    val exact = df.groupBy("g").agg(countDistinct($"k").as("n"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (g, x) =>
      val e = est(g)
      assert(math.abs(e - x) / x.toDouble < 0.10,
        s"group=$g exact=$x est=$e outside 3 sigma")
    }
  }

  test("near-empty sketches floor at ~alpha*m instead of estimating (documented raw bias)") {
    // n << m: the raw harmonic mean saturates near alpha*m (~738 at
    // m=1024) — callers in that regime need exact countDistinct, not a
    // sketch; the behavior is pinned so it can't silently change
    val df = spark.range(15).select(lit("g").as("g"), $"id".as("k"))
    val e = Hll.distinctEstimate(df, Seq("g"), "k").select($"est").as[Double].head()
    assert(e > 600 && e < 900, s"raw floor moved: $e")
  }
}

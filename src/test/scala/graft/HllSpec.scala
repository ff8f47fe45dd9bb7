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

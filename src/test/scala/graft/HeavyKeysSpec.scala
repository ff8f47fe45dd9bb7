package graft

import org.apache.spark.sql.functions._
import graft.expressions.MisraGriesAgg
import graft.operators.HeavyKeys

/** Misra–Gries heavy-hitter discovery: the candidate stage keeps its
  * bounded-size and survival guarantees under any partitioning, and the
  * recounted output is exactly the naive heavy-hitter query's. */
class HeavyKeysSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[Long], k: Int): Set[(Long, Long, Long)] = {
    val n = rows.size.toLong
    rows.groupBy(identity).map { case (key, g) => (key, g.size.toLong, n) }
      .filter { case (_, c, nn) => c * (k + 1) > nn }.toSet
  }

  test("output equals the naive exact heavy-hitter query on skewed data (5 seeds × 2 partitionings)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val k = 4 + rnd.nextInt(8)
      // zipf-ish: a few hot keys over a long cold tail
      val rows: Seq[Long] = (0 until 2000).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 55) (r % (2 + rnd.nextInt(2))).toLong else 1000L + rnd.nextInt(500)
      }
      val expected = naive(rows, k)
      for (parts <- Seq(1, 13)) {
        val got = HeavyKeys.heavyKeys(rows.toDF("key").repartition(parts), "key", k)
          .as[(Long, Long, Long)].collect().toSet
        assert(got === expected, s"seed=$seed parts=$parts k=$k")
      }
    }
  }

  test("candidate stage: bounded at k entries, every >n/(k+1) key survives") {
    val rnd = new scala.util.Random(99)
    val k = 6
    val rows: Seq[Long] = (0 until 3000).map { _ =>
      if (rnd.nextInt(10) < 4) (rnd.nextInt(2)).toLong else 100L + rnd.nextInt(800)
    }
    val n = rows.size
    val mustSurvive = rows.groupBy(identity).collect {
      case (key, g) if g.size.toLong * (k + 1) > n => key
    }.toSet
    for (parts <- Seq(1, 7, 32)) {
      val cands = rows.toDF("key").repartition(parts)
        .agg(MisraGriesAgg.candidates($"key", k))
        .as[Seq[Long]].head().toSet
      assert(cands.size <= k, s"parts=$parts: summary exceeded k")
      assert(mustSurvive.subsetOf(cands),
        s"parts=$parts: guaranteed keys missing: ${mustSurvive -- cands}")
    }
  }

  test("nulls are ignored by the summary and excluded from n") {
    val df = (Seq.fill(30)(Some(7L)) ++ Seq.fill(5)(Option.empty[Long]) ++
      (0 until 10).map(i => Some(100L + i))).toDF("key")
    val got = HeavyKeys.heavyKeys(df, "key", 3).as[(Long, Long, Long)].collect().toSet
    // n = 40 non-null rows; key 7 has 30 > 40/4
    assert(got === Set((7L, 30L, 40L)))
  }

  test("no heavy hitter on uniform data: empty result, not a near-threshold artifact") {
    val rows = (0 until 1000).map(i => (i % 100).toLong)
    assert(HeavyKeys.heavyKeys(rows.toDF("key"), "key", 9).isEmpty)
  }

  test("candidate aggregate plans as a partial ObjectHashAggregate (bounded shuffle)") {
    val df = spark.read.parquet(s"$sf/events.parquet")
      .agg(MisraGriesAgg.candidates($"user_id", 9))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected object-hash aggregation, plan:\n$plan")
    assert("partial_misra_gries_candidates".r.findFirstIn(plan).nonEmpty,
      s"expected a map-side partial, plan:\n$plan")
  }
}

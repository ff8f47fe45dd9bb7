package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals a direct inequality join") {
    val out = q("q_range_join")
      .select($"event_id", $"n_purchases").as[(Long, Long)].collect().toMap
    val e = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        graft.streaming.Events.nsToUs($"ts").as("ts_us"), $"event_type")
    val c = e.filter($"event_type" === "click").select($"event_id".as("cid"), $"user_id".as("cu"), $"ts_us".as("ct"))
    val p = e.filter($"event_type" === "purchase").select($"user_id".as("pu"), $"ts_us".as("pt"))
    val direct = c.join(p, $"cu" === $"pu" && $"pt" > $"ct" && $"pt" <= $"ct" + 600000000L, "left")
      .groupBy($"cid").agg(count($"pu").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out === direct)
    assert(out.values.sum > 0, "window should contain at least some purchases")
  }

  test("bin boundary: match exactly at window edge is included, beyond is not") {
    val left = Seq((1L, 5L, 1000L)).toDF("id", "k", "t")
    val right = Seq((5L, 1000L), (5L, 1600L), (5L, 1601L), (6L, 1500L))
      .toDF("k", "t")
    val got = RangeJoin.countInRange(left, right, "k", "t", "id", 0L, 600L)
      .select($"n_matches").as[Long].head()
    assert(got === 1L) // only t=1600 (strictly after 1000, at most 1600)
  }
}

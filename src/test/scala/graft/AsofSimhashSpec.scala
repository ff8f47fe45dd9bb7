package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofSimhashSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the latest right row at-or-before each left row") {
    val left = Seq((1L, "k", 100L), (2L, "k", 50L), (3L, "k", 10L), (4L, "z", 5L))
      .toDF("id", "key", "t")
    val right = Seq(("k", 20L, "r20"), ("k", 50L, "r50"), ("k", 99L, "r99"))
      .toDF("key", "t", "payload")
    val got = AsofJoin.asof(left, right, "key", "t", Seq("payload"))
      .select($"id", $"payload").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("r99"), // latest <= 100
      2L -> Some("r50"), // equal t matches (<= semantics)
      3L -> None,        // nothing at or before 10
      4L -> None))       // other key
  }

  test("asof query: every matched click precedes or equals its purchase") {
    val out = q("q_asof_join").cache()
    assert(out.filter($"gap_us" < 0).isEmpty)
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter($"event_type" === "purchase").count()
    assert(out.count() === purchases)
  }

  test("simhash pigeonhole join finds all close pairs a brute-force scan finds") {
    val out = q("dedup_simhash_pairs")
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    // brute-force reference over the same 120-bit wide simhashes
    val sims = graft.operators.Dedup
      .simhashedWide(spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
      .select($"doc_id", $"sh_lo", $"sh_hi").as[(Long, Long, Long)].collect()
    val brute = (for {
      (ia, la, ha) <- sims; (ib, lb, hb) <- sims if ia < ib
      h = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb) if h <= 8
    } yield (ia, ib, h)).toSet
    assert(out === brute, "pigeonhole candidate generation must be complete for h <= maxHamming")
  }

  test("simhash candidate volume stays far below all-pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val wide = graft.operators.Dedup.simhashedWide(docs, "text", "doc_id")
    val cand = graft.operators.Dedup.simhashCandidates(wide, "doc_id")
      .select($"id_a", $"id_b").distinct().count()
    val allPairs = n * (n - 1) / 2
    // two-chunk (24-bit) agreement: unrelated docs collide w.p. ~45/2^24;
    // vocabulary-correlated docs push that up, but a quadratic generator
    // yields ~allPairs — n²/16 is a ceiling only sub-quadratic plans meet.
    assert(cand < allPairs / 16, s"candidates=$cand vs allPairs=$allPairs")
  }
}

package graft

import java.sql.Timestamp

import graft.etl.Scd2

/** SCD2 history-build contract: runs of identical observations collapse,
  * every attribute change opens a version, validity intervals chain with
  * no gap, exactly one current version per key. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("runs collapse and validity intervals chain per key") {
    val feed = Seq(
      // key 1: A A B A  -> versions A, B, A
      (1L, ts("2024-01-01"), 1L, "A"),
      (1L, ts("2024-01-02"), 2L, "A"),
      (1L, ts("2024-01-03"), 3L, "B"),
      (1L, ts("2024-01-04"), 4L, "A"),
      // key 2: single observation -> one open version
      (2L, ts("2024-02-01"), 5L, "X"))
      .toDF("k", "t", "tb", "attr")
    val h = Scd2.history(feed, "k", "t", "tb", Seq("attr"))
      .select($"k", $"attr", $"t".as("vf"), $"valid_to", $"is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime))

    val k1 = h.filter(_._1 == 1L)
    assert(k1.map(_._2).toSeq === Seq("A", "B", "A"), "run of A collapses to one version")
    // intervals chain: version i's valid_to is version i+1's valid_from
    assert(k1.init.map(_._4.get).toSeq === k1.tail.map(_._3).toSeq)
    assert(k1.map(_._5).toSeq === Seq(false, false, true), "only the last version is current")
    val k2 = h.filter(_._1 == 2L)
    assert(k2.length === 1 && k2.head._5 && k2.head._4.isEmpty)
  }

  test("null attribute values are change-detected null-safely") {
    val feed = Seq(
      (1L, ts("2024-01-01"), 1L, Some("A")),
      (1L, ts("2024-01-02"), 2L, None), // A -> null opens
      (1L, ts("2024-01-03"), 3L, None), // null -> null collapses
      (1L, ts("2024-01-04"), 4L, Some("A"))) // null -> A opens
      .toDF("k", "t", "tb", "attr")
    val h = Scd2.history(feed, "k", "t", "tb", Seq("attr"))
      .select($"attr", $"is_current").as[(Option[String], Boolean)]
      .collect().toSeq
    assert(h.map(_._1).sortBy(_.getOrElse("")) === Seq(None, Some("A"), Some("A")))
    assert(h.count(_._2) === 1)
  }

  test("a change in ANY tracked attribute opens a version") {
    val feed = Seq(
      (1L, ts("2024-01-01"), 1L, "A", 10),
      (1L, ts("2024-01-02"), 2L, "A", 20), // attr2 changed
      (1L, ts("2024-01-03"), 3L, "A", 20)) // nothing changed
      .toDF("k", "t", "tb", "a1", "a2")
    val h = Scd2.history(feed, "k", "t", "tb", Seq("a1", "a2"))
    assert(h.count() === 2)
  }

  test("same-timestamp observations order by the tiebreak") {
    val feed = Seq(
      (1L, ts("2024-01-01"), 2L, "B"),
      (1L, ts("2024-01-01"), 1L, "A"))
      .toDF("k", "t", "tb", "attr")
    val h = Scd2.history(feed, "k", "t", "tb", Seq("attr"))
      .select($"attr", $"is_current").as[(String, Boolean)].collect().toMap
    assert(h === Map("A" -> false, "B" -> true))
  }
}

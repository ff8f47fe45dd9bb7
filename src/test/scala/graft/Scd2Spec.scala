package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, to_timestamp}

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

  // the full feed exercises every merge shape: a batch row collapsing into
  // the open version (key 1's trailing A), a change re-opening (key 1's B),
  // a brand-new key arriving only in the batch (key 3), and an untouched
  // key absent from the batch (key 2)
  private val fullFeed = Seq(
    (1L, "2024-01-01", 1L, "A"), (1L, "2024-01-02", 2L, "A"),
    (1L, "2024-01-10", 3L, "A"), (1L, "2024-01-11", 4L, "B"),
    (2L, "2024-01-02", 5L, "X"),
    (3L, "2024-01-12", 6L, "C"), (3L, "2024-01-13", 7L, "C"))

  private def feedDf(rows: Seq[(Long, String, Long, String)]) = {
    val withTs = rows.map { case (k, d, tb, a) => (k, ts(d), tb, a) }
    withTs.toDF("k", "t", "tb", "attr")
  }

  test("mergeHistory(batch) is indistinguishable from a full-feed rebuild") {
    val (base, batch) = fullFeed.partition(_._2 < "2024-01-10")
    val merged = Scd2.mergeHistory(
      Scd2.history(feedDf(base), "k", "t", "tb", Seq("attr")),
      feedDf(batch), "k", "t", "tb", Seq("attr"))
    val rebuilt = Scd2.history(feedDf(fullFeed), "k", "t", "tb", Seq("attr"))
    assert(merged.columns.toSeq.sorted === rebuilt.columns.toSeq.sorted)
    val key = (r: org.apache.spark.sql.Row) => r.toString
    assert(merged.collect().map(key).sorted.toSeq ===
      rebuilt.collect().map(key).sorted.toSeq)
  }

  test("mergeHistory leaves keys absent from the batch untouched") {
    val (base, batch0) = fullFeed.partition(_._2 < "2024-01-10")
    val batch = batch0.filterNot(_._1 == 2L)
    val existing = Scd2.history(feedDf(base), "k", "t", "tb", Seq("attr"))
    val merged = Scd2.mergeHistory(existing, feedDf(batch), "k", "t", "tb", Seq("attr"))
    val before = existing.filter($"k" === 2L).collect().map(_.toString).sorted.toSeq
    val after = merged.filter($"k" === 2L).collect().map(_.toString).sorted.toSeq
    assert(after === before)
  }

  test("mergeHistory raises on a late observation at or before the open version") {
    val existing = Scd2.history(
      feedDf(Seq((1L, "2024-01-01", 1L, "A"), (1L, "2024-01-05", 2L, "B"))),
      "k", "t", "tb", Seq("attr"))
    val late = feedDf(Seq((1L, "2024-01-03", 9L, "C"))) // between the versions
    val ex = intercept[Exception] {
      Scd2.mergeHistory(existing, late, "k", "t", "tb", Seq("attr")).collect()
    }
    assert(ex.getMessage.contains("late observation") ||
      Option(ex.getCause).exists(_.getMessage.contains("late observation")))
  }

  test("mergeHistory rejects a late row hidden under a collapsed run") {
    // A@t1, A@t5 collapse to ONE version at t1; the true last-observed
    // mark is t5. A late B@t3 sits between the open version's start and
    // the collapsed t5: a version-row high-water check (max valid_from =
    // t1) admits it and silently diverges from the full rebuild (which
    // yields A re-opened at t5 as current, not B) — the persisted mark
    // must reject it instead
    val existing = Scd2.history(
      feedDf(Seq((1L, "2024-01-01", 1L, "A"), (1L, "2024-01-05", 2L, "A"))),
      "k", "t", "tb", Seq("attr"))
    val late = feedDf(Seq((1L, "2024-01-03", 9L, "B")))
    val ex = intercept[Exception] {
      Scd2.mergeHistory(existing, late, "k", "t", "tb", Seq("attr")).collect()
    }
    assert(ex.getMessage.contains("late observation") ||
      Option(ex.getCause).exists(_.getMessage.contains("late observation")))
  }

  test("mergeHistory past a collapsed run matches the rebuild, mark advances") {
    val base = Seq((1L, "2024-01-01", 1L, "A"), (1L, "2024-01-05", 2L, "A"))
    val batch = Seq((1L, "2024-01-06", 3L, "B"))
    val merged = Scd2.mergeHistory(
      Scd2.history(feedDf(base), "k", "t", "tb", Seq("attr")),
      feedDf(batch), "k", "t", "tb", Seq("attr"))
    val rebuilt = Scd2.history(feedDf(base ++ batch), "k", "t", "tb", Seq("attr"))
    assert(merged.collect().map(_.toString).sorted.toSeq ===
      rebuilt.collect().map(_.toString).sorted.toSeq)
    // the open version's mark is the NEW last observation, so the next
    // merge guards against t6, not t5
    val mark = merged.filter($"is_current").select($"last_obs_ts").head().getTimestamp(0)
    assert(mark === ts("2024-01-06"))
  }

  test("history refuses key/attr names that collide with its output columns") {
    // a tracked attr named like a history column would be silently
    // overwritten by the version bookkeeping — must throw, not clobber
    val df = feedDf(Seq((1L, "2024-01-01", 1L, "A")))
      .withColumnRenamed("attr", "is_current")
    val ex = intercept[IllegalArgumentException] {
      Scd2.history(df, "k", "t", "tb", Seq("is_current"))
    }
    assert(ex.getMessage.contains("may not be named"))
    val ex2 = intercept[IllegalArgumentException] {
      Scd2.history(feedDf(Seq((1L, "2024-01-01", 1L, "A")))
        .withColumnRenamed("k", "valid_from"), "valid_from", "t", "tb", Seq("attr"))
    }
    assert(ex2.getMessage.contains("may not be named"))
  }

  test("mergeHistory refuses a history lacking the high-water columns") {
    val legacy = Scd2.history(
      feedDf(Seq((1L, "2024-01-01", 1L, "A"))), "k", "t", "tb", Seq("attr"))
      .drop("last_obs_ts", "last_obs_tb")
    val ex = intercept[IllegalArgumentException] {
      Scd2.mergeHistory(legacy, feedDf(Seq((1L, "2024-02-01", 2L, "B"))),
        "k", "t", "tb", Seq("attr"))
    }
    assert(ex.getMessage.contains("last_obs"))
  }

  test("streaming history sink: batches accumulate to the full rebuild, replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2s").toString + "/h"
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long, String)](spark)
    val sink = graft.sinks.Scd2Sink.appendHistoryInto(dir, "k", "t", "tb", Seq("attr")) _
    val qy = ms.toDS()
      .select($"_1".as("k"), to_timestamp($"_2").as("t"), $"_3".as("tb"), $"_4".as("attr"))
      .writeStream.foreachBatch(sink).start()
    val (b1, b2) = fullFeed.partition(_._2 < "2024-01-10")
    ms.addData(b1.map { case (k, d, tb, a) => (k, d, tb, a) }: _*)
    qy.processAllAvailable()
    ms.addData(b2.map { case (k, d, tb, a) => (k, d, tb, a) }: _*)
    qy.processAllAvailable(); qy.stop()
    val rebuilt = Scd2.history(feedDf(fullFeed), "k", "t", "tb", Seq("attr"))
    val got = spark.read.parquet(dir).select(rebuilt.columns.map(col): _*)
    assert(got.collect().map(_.toString).sorted.toSeq ===
      rebuilt.collect().map(_.toString).sorted.toSeq,
      "two streamed batches must equal the one-shot rebuild")
    // at-least-once redelivery: re-running an already-committed batch id
    // must skip (the marker rode the same atomic rename as the data) —
    // WITHOUT the skip this replay would trip the late-data guard
    sink(feedDf(b2), 1L)
    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.toString).sorted.toSeq ===
      got.collect().map(_.toString).sorted.toSeq, "replayed batch is a no-op")
    // a genuinely new batch id still applies
    sink(feedDf(Seq((2L, "2024-03-01", 8L, "Y"))), 2L)
    assert(spark.read.parquet(dir).where($"k" === 2L).count() === 2)
  }

  test("crash window: redelivery after a death mid-promotion skips, not re-merges") {
    // Stage the exact state a run leaves when it dies between mv(dst, old)
    // and mv(tmp, dst) while committing batch 1: dst ABSENT, `.old` = the
    // batch-0-only history (marker 0), `.tmp` = the fully-written merged
    // history already carrying marker 1. On redelivery of batch 1 the sink
    // must run swap recovery BEFORE consulting the marker — reading the
    // (absent) dst marker first would admit the batch, recovery would then
    // promote tmp, and the replay would re-merge on itself and trip the
    // late-data guard permanently.
    val (b1, b2) = fullFeed.partition(_._2 < "2024-01-10")
    val root = java.nio.file.Files.createTempDirectory("graft_scd2c").toString
    val dir = root + "/h"
    val sink = graft.sinks.Scd2Sink.appendHistoryInto(dir, "k", "t", "tb", Seq("attr")) _
    sink(feedDf(b1), 0L) // the pre-crash base
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // build the crashed run's committed tmp on the side: base + batch 1
    val side = root + "/side"
    val sideSink = graft.sinks.Scd2Sink.appendHistoryInto(side, "k", "t", "tb", Seq("attr")) _
    sideSink(feedDf(b1), 0L); sideSink(feedDf(b2), 1L)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir), new org.apache.hadoop.fs.Path(dir + ".old")))
    assert(fs.rename(new org.apache.hadoop.fs.Path(side), new org.apache.hadoop.fs.Path(dir + ".tmp")))
    // redeliver batch 1 — must no-op skip after recovering, not fail
    sink(feedDf(b2), 1L)
    val rebuilt = Scd2.history(feedDf(fullFeed), "k", "t", "tb", Seq("attr"))
    val got = spark.read.parquet(dir).select(rebuilt.columns.map(col): _*)
    assert(got.collect().map(_.toString).sorted.toSeq ===
      rebuilt.collect().map(_.toString).sorted.toSeq)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")), "recovery cleans .old")
  }

  test("mergeHistory with an empty batch returns the history unchanged") {
    val existing = Scd2.history(feedDf(fullFeed), "k", "t", "tb", Seq("attr"))
    val merged = Scd2.mergeHistory(existing, feedDf(Nil), "k", "t", "tb", Seq("attr"))
    assert(merged.collect().map(_.toString).sorted.toSeq ===
      existing.collect().map(_.toString).sorted.toSeq)
  }

  test("mergeHistory into an empty history equals a first build") {
    val empty = Scd2.history(feedDf(Nil), "k", "t", "tb", Seq("attr"))
    val merged = Scd2.mergeHistory(empty, feedDf(fullFeed), "k", "t", "tb", Seq("attr"))
    val built = Scd2.history(feedDf(fullFeed), "k", "t", "tb", Seq("attr"))
    assert(merged.collect().map(_.toString).sorted.toSeq ===
      built.collect().map(_.toString).sorted.toSeq)
  }

  test("mergeHistory rejects a batch whose columns differ from the history's") {
    val existing = Scd2.history(
      feedDf(Seq((1L, "2024-01-01", 1L, "A"))), "k", "t", "tb", Seq("attr"))
    val bad = Seq((1L, ts("2024-02-01"), 2L)).toDF("k", "t", "tb")
    val ex = intercept[IllegalArgumentException] {
      Scd2.mergeHistory(existing, bad, "k", "t", "tb", Seq("attr"))
    }
    assert(ex.getMessage.contains("observation columns"))
  }
}

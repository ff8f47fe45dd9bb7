package graft

import org.apache.spark.sql.functions._
import graft.streaming.Events

class StreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.Tables

  // ts contract is epoch-nanos long; the parquet may physically carry a
  // timestamp (see Tables.normalizeEventTs) — the file schema drives the
  // stream source, normalization restores the contract on both paths
  private def eventsBatch = Tables.events(spark, sf)
  private def eventsStream = Tables.normalizeEventTs(
    spark.readStream
      .schema(spark.read.parquet(s"$sf/events.parquet").schema)
      .parquet(s"$sf/events.parque[t]"))

  test("streaming window agg accounts for every event (batch parity)") {
    val stream = eventsStream
    assert(stream.isStreaming)
    val agg = Events.windowAggStream(stream)
    val qy = agg.writeStream.outputMode("complete").format("memory")
      .queryName("streamspec").start()
    qy.processAllAvailable(); qy.stop()
    val viaStream = spark.table("streamspec").agg(sum("n")).as[Long].head()
    assert(viaStream === spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("top-k active users: streaming count state + read-time finalize ≡ batch") {
    val qy = Events.windowUserCountsStream(eventsStream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("topkstate").start()
    qy.processAllAvailable(); qy.stop()
    val sinkCounts = spark.table("topkstate")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("user_id"), col("n"))
    val viaStream = Events.finalizeTopkUsers(sinkCounts, 3)
      .as[(String, Long, Long, Int)].collect().toSet
    val viaBatch = q("stream_topk_window")
      .as[(String, Long, Long, Int)].collect().toSet
    assert(viaBatch.nonEmpty && viaStream === viaBatch)
  }

  test("batch hourlyAgg matches streaming window totals per event_type") {
    val batch = q("stream_window_agg")
      .groupBy("event_type").agg(sum("n").as("n")).as[(String, Long)].collect().toMap
    val stream = spark.table("streamspec")
      .groupBy("event_type").agg(sum("n").as("n")).as[(String, Long)].collect().toMap
    assert(batch === stream)
  }

  test("streaming dropDuplicates matches batch dedup (bounded state parity)") {
    val stream = eventsStream
    val dd = stream.withColumn("ts_t", Events.tsCol($"ts"))
      .withWatermark("ts_t", "1 hour")
      .dropDuplicates("user_id", "event_type")
    val qy = dd.writeStream.outputMode("append").format("memory")
      .queryName("streamdedup").start()
    qy.processAllAvailable(); qy.stop()
    val batch = Events.dedupByKeys(eventsBatch, Seq("user_id", "event_type")).count()
    assert(spark.table("streamdedup").count() === batch)
  }

  test("sessionize: constructed gaps produce expected sessions") {
    def ns(minutes: Long) = minutes * 60L * 1000000000L
    val events = Seq(
      (1L, 10L, ns(0)), (2L, 10L, ns(10)), (3L, 10L, ns(50)), // 40min gap -> new session
      (4L, 20L, ns(0))
    ).toDF("event_id", "user_id", "ts")
    val got = Events.sessionize(events, gapMinutes = 30)
      .select($"user_id", $"session_id", $"n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 0L, 2L), (10L, 1L, 1L), (20L, 0L, 1L)))
  }

  test("stream-static enrichment join matches batch (broadcast dim against a stream)") {
    val stream = eventsStream
    val dim = eventsBatch
      .select($"event_type").distinct()
      .withColumn("type_label", upper($"event_type")) // static side: plain DataFrame
    val qy = stream.join(broadcast(dim), Seq("event_type"))
      .writeStream.outputMode("append").format("memory").queryName("enrich").start()
    qy.processAllAvailable(); qy.stop()
    assert(spark.table("enrich").count() ===
      spark.read.parquet(s"$sf/events.parquet").count(),
      "every event must be enriched exactly once")
    assert(spark.table("enrich").filter($"type_label" =!= upper($"event_type")).isEmpty)
  }

  test("point-in-time SCD2 enrichment: streaming form matches the batch query") {
    // the same composition as stream_enrich_scd2, with the event side a
    // STREAM: history stays a static broadcast (packed per key), so the
    // stream never enters an Exchange for the join; complete-mode agg
    // compares row-for-row against the batch query
    val ev = eventsBatch
    val cents = round($"value" * 100).cast("long")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        floor(cents.cast("double") / 500.0).cast("long").as("tier"))
    val hist = graft.etl.Scd2.history(purchases,
        key = "user_id", ts = "ts", tiebreak = "event_id", attrs = Seq("tier"))
      .select($"user_id", $"valid_from".as("ts"), $"tier")
    val stream = eventsStream
    val enriched = graft.operators.AsofJoin.asofBroadcast(stream, hist,
        key = "user_id", t = "ts", rightPayload = Seq("tier"))
      .groupBy($"tier", $"event_type")
      .agg(count(lit(1)).as("n"), sum(cents).as("sum_cents"))
    val qy = enriched.writeStream.outputMode("complete").format("memory")
      .queryName("scd2enrich").start()
    qy.processAllAvailable(); qy.stop()
    val got = spark.table("scd2enrich").collect().map(_.toString).sorted.toSeq
    val want = q("stream_enrich_scd2").collect().map(_.toString).sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("anomaly flags sit strictly outside 3 sigma and carry the right sign") {
    val out = q("stream_anomaly").cache()
    assert(out.count() > 0, "the heavy-tailed value column must produce outliers")
    assert(out.filter(abs($"z") <= 3.0).isEmpty)
    // sign check against an independently-computed per-type mean
    val means = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg((sum(round($"value" * 100).cast("long")).cast("double") /
        count(lit(1)).cast("double")).as("mean"))
    val joined = out.join(spark.read.parquet(s"$sf/events.parquet"), Seq("event_id"))
      .join(means, out("event_type") === means("event_type"))
    assert(joined.filter(
      ($"z" > 0 && round($"value" * 100).cast("long").cast("double") <= $"mean") ||
      ($"z" < 0 && round($"value" * 100).cast("long").cast("double") >= $"mean")).isEmpty)
  }

  test("sliding windows cover every event exactly twice") {
    val out = q("stream_sliding_agg")
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(out.agg(sum($"n")).as[Long].head() === 2 * events)
  }

  test("stream-stream time-window join matches the batch join") {
    def src = eventsStream
    val c = src.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), Events.tsCol($"ts").as("c_t"))
      .withWatermark("c_t", "1 hour")
    val p = src.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), Events.tsCol($"ts").as("p_t"))
      .withWatermark("p_t", "1 hour")
    val qy = Events.timeWindowJoin(c, p, "c_user", "p_user", "c_t", "p_t", 30)
      .writeStream.outputMode("append").format("memory").queryName("ssj").start()
    qy.processAllAvailable(); qy.stop()
    val batchPairs = q("stream_stream_join").agg(sum($"n_pairs")).as[Long].head()
    assert(spark.table("ssj").count() === batchPairs)
  }

  test("event-time timeout flushes an idle user's open session") {
    // real epoch base: timestamp 0 would collide with the initial watermark
    // (epoch 0) and be dropped as late
    def us(minutes: Long) = 1600000000L * 1000000L + minutes * 60L * 1000000L
    def ev(u: Long, e: Long, m: Long) =
      Events.TimedEvent(u, e, us(m), new java.sql.Timestamp(us(m) / 1000))
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.TimedEvent]
    val qy = Events.sessionizeStreamTimeout(ms.toDS(), 30).writeStream
      .outputMode("append").format("memory").queryName("timeout_sessions").start()
    ms.addData(ev(10L, 1L, 0), ev(10L, 2L, 10)) // user 10 goes idle after minute 10
    qy.processAllAvailable()
    ms.addData(ev(20L, 3L, 120)) // advances watermark to minute 90 > 10+30
    qy.processAllAvailable()
    ms.addData(ev(20L, 4L, 121)) // next batch runs the pending timeout
    qy.processAllAvailable(); qy.stop()
    val flushed = spark.table("timeout_sessions")
      .filter($"user_id" === 10L)
      .select($"session_id", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(flushed === Set((0L, 2L, us(0), us(10))),
      "idle session must flush via event-time timeout without a closing event")
  }

  test("a user returning after a timeout flush gets the NEXT session id, not a reused one") {
    def us(minutes: Long) = 1600000000L * 1000000L + minutes * 60L * 1000000L
    def ev(u: Long, e: Long, m: Long) =
      Events.TimedEvent(u, e, us(m), new java.sql.Timestamp(us(m) / 1000))
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.TimedEvent]
    val qy = Events.sessionizeStreamTimeout(ms.toDS(), 30).writeStream
      .outputMode("append").format("memory").queryName("timeout_resume").start()
    ms.addData(ev(10L, 1L, 0), ev(10L, 2L, 10)) // session 0, then idle
    qy.processAllAvailable()
    ms.addData(ev(20L, 3L, 120)) // watermark passes 10+30 -> flush pending
    qy.processAllAvailable()
    ms.addData(ev(20L, 4L, 121)) // runs the timeout for user 10
    qy.processAllAvailable()
    ms.addData(ev(10L, 5L, 200), ev(10L, 6L, 205)) // user 10 RETURNS
    qy.processAllAvailable()
    ms.addData(ev(20L, 7L, 300)) // watermark past 205+30
    qy.processAllAvailable()
    ms.addData(ev(20L, 8L, 301)) // flush the second session
    qy.processAllAvailable(); qy.stop()
    val got = spark.table("timeout_resume").filter($"user_id" === 10L)
      .select($"session_id", $"n_events").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 2L), (1L, 2L)),
      "the post-timeout session must be numbered 1 — reusing 0 duplicates the key")
  }

  test("sessionize covers all events exactly once") {
    val out = q("stream_sessionize")
    assert(out.agg(sum("n_events")).as[Long].head() ===
      spark.read.parquet(s"$sf/events.parquet").count())
    assert(out.filter($"end_us" < $"start_us").isEmpty)
  }

  test("streaming CDC apply: foreachBatch merges ≡ the batch key; a replayed batch is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.etl.Cdc
    // the key's exact log, delivered as seq-ordered micro-batches
    val log = eventsBatch.select($"user_id", $"event_id",
        when($"event_type" === "error", "D")
          .when($"event_type" === "signup", "I")
          .otherwise("U").as("op"),
        round($"value" * 100).cast("long").as("value_cents"))
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    var state = eventsBatch.select($"user_id").distinct()
      .filter($"user_id" % 4 === 0).withColumn("value_cents", lit(0L))
      .localCheckpoint()
    var lastBatch: org.apache.spark.sql.DataFrame = null
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (b, _) => {
      val pinned = b.localCheckpoint() // micro-batch frames die with the trigger
      lastBatch = pinned
      state = Cdc.applyLog(state, pinned, keys = Seq("user_id"),
        seqCol = "event_id", opCol = "op", attrs = Seq("value_cents"))
        .localCheckpoint()
    }
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String, Long)]
    val qy = ms.toDF.toDF("user_id", "event_id", "op", "value_cents")
      .writeStream.foreachBatch(sink).start()
    try {
      log.grouped(math.max(1, log.length / 3 + 1))
        .foreach { chunk => ms.addData(chunk.toSeq); qy.processAllAvailable() }
    } finally qy.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().sorted.toSeq
    val want = rows(q("stream_cdc_apply"))
    assert(rows(state) === want, "incremental foreachBatch merges must equal the batch key")
    assert(want.nonEmpty)
    // REDELIVERY: foreachBatch replays the last micro-batch after a
    // crash — latest-wins makes the merge idempotent, state unchanged
    val replayed = Cdc.applyLog(state, lastBatch, keys = Seq("user_id"),
      seqCol = "event_id", opCol = "op", attrs = Seq("value_cents"))
    assert(rows(replayed) === want, "a replayed batch must not move the state")
  }
}

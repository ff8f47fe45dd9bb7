package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY.md §2.E). One transform definition
  * serves both the batch oracle query and the Structured Streaming path
  * (`readStream` → same column logic → `writeStream`): batch/stream parity
  * by construction.
  *
  * `ts` arrives as epoch-nanos BIGINT — whatever timestamp type the
  * driver's parquet physically carries, `Tables.normalizeEventTs`
  * restores that contract at the read boundary.
  */
object Events {

  /** Epoch-nanos → epoch-micros. MUST be integer division: epoch-nanos
    * (~1.7e18) exceeds double's 2^53 exact range, so `/ 1000` via double
    * would corrupt timestamps. `div` is invoked through the function
    * registry — expression-safe for any argument (a string-interpolated
    * `expr(c.toString)` breaks on composite columns). */
  def nsToUs(c: Column): Column = call_function("div", c.cast("long"), lit(1000L))

  /** Epoch-nanos → timestamp (UTC session). */
  def tsCol(c: Column): Column = timestamp_micros(nsToUs(c))

  /** Tumbling-hour aggregation: counts + exact cents sums per
    * (hour, event_type). In streaming this is the windowed-agg with
    * watermark: see `windowAggStream`. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .select(date_format(date_trunc("hour", tsCol(col("ts"))), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), graft.queries.Common.cents(col("value")).as("value_c"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"), graft.queries.Common.money(sum(col("value_c"))).as("sum_value"))

  /** Sliding-window aggregation (1 h window every 30 min): each event
    * contributes to exactly TWO windows. Uses the same `window()` that the
    * streaming path uses, so batch/stream parity is by construction. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .select(tsCol(col("ts")).as("ts_t"), col("event_type"),
        graft.queries.Common.cents(col("value")).as("value_c"))
      .groupBy(window(col("ts_t"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.queries.Common.money(sum(col("value_c"))).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** The same aggregation as a streaming query over a timestamp column,
    * with a watermark bounding state. Sums EXACT integer cents like the
    * batch [[hourlyAgg]] — a raw double sum would be accumulation-order-
    * dependent and could diverge from the batch side in the last ulp. */
  def windowAggStream(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", tsCol(col("ts")))
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Common.money(sum(graft.queries.Common.cents(col("value")))).as("sum_value"))

  /** Per-hour TOP-K active users. The streaming form splits the classic
    * way: the (window, user) count STATE is a plain incremental sum-agg
    * ([[windowUserCountsStream]] — mergeable by addition, the
    * stream_distinct_approx register discipline), and the bounded top-k
    * FINALIZES at read time from that state ([[finalizeTopkUsers]]) —
    * rank never lives in streaming state. The finalize window partitions
    * by hour, so each sort is bounded by users-per-window (a data
    * constant), never the stream's length. */
  def topkActiveUsers(events: DataFrame, k: Int = 3): DataFrame =
    finalizeTopkUsers(
      events
        .select(date_format(date_trunc("hour", tsCol(col("ts"))),
          "yyyy-MM-dd HH:mm:ss").as("hour"), col("user_id"))
        .groupBy("hour", "user_id").agg(count(lit(1)).as("n")),
      k)

  /** Read-time finalize for [[topkActiveUsers]]: rank within each window
    * (count desc, user asc) and keep the top k. Runs identically over
    * the batch counts and a streaming sink of [[windowUserCountsStream]]
    * (StreamSpec drives the parity). */
  def finalizeTopkUsers(counts: DataFrame, k: Int): DataFrame =
    counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy("hour").orderBy(col("n").desc, col("user_id"))))
      .filter(col("rnk") <= k)

  /** The streaming state behind [[topkActiveUsers]]: watermarked
    * per-(window, user) counts — incremental, mergeable, bounded by
    * active users per open window. */
  def windowUserCountsStream(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", tsCol(col("ts")))
      .withWatermark("ts_t", "2 hours")
      .groupBy(window(col("ts_t"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Inner join pairing each right event with left events of the same key
    * inside `(t_right − window, t_right]`. One definition serves batch AND
    * stream-stream: with a watermark on both inputs, Spark bounds the join
    * state to window + watermark horizon, so an unbounded click/purchase
    * correlation runs with finite state (StreamSpec drives the parity).
    * Column names must be disjoint across the two inputs. */
  def timeWindowJoin(left: DataFrame, right: DataFrame,
                     keyL: String, keyR: String, tL: String, tR: String,
                     windowMinutes: Int): DataFrame =
    left.join(right,
      col(keyL) === col(keyR) &&
        col(tL) > col(tR) - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col(tL) <= col(tR))

  /** Exact event dedup by key columns — batch form. The streaming form is
    * the same logic as `readStream → withWatermark → dropDuplicates`:
    * state holds ONE entry per key inside the watermark horizon, so it
    * stays bounded by key cardinality, not event volume (StreamSpec
    * drives the parity check). */
  def dedupByKeys(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates(keys)

  /** 30-minute-gap sessionization (batch form): a session starts when the
    * gap to the previous event of the same user exceeds `gapMinutes`.
    * Two windows over one shuffle on user_id; at scale state is bounded
    * per key. The streaming form of the same state machine is
    * [[sessionizeStream]]. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val us = nsToUs(col("ts")) // micros
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .select(col("user_id"), col("event_id"), us.as("ts_us"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1L).otherwise(lit(0L)))
      .withColumn("session_id", sum(col("new_session")).over(
        Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
  }

  final case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long)
  final case class TimedEvent(user_id: Long, event_id: Long, ts_us: Long,
                              ts_t: java.sql.Timestamp)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              start_us: Long, end_us: Long)
  final case class SessionState(sessionId: Long, nEvents: Long,
                                        startUs: Long, lastUs: Long)

  /** The shared per-key session fold: applies a sorted micro-batch of one
    * user's events to the session state machine, returning the new state
    * and the sessions closed by gaps inside this batch. A state with
    * `nEvents == 0` is a TOMBSTONE left by a timeout flush: it carries the
    * next session id so a returning user never reuses a flushed session's
    * number (round-4 review: `state.remove()` on timeout reset the counter
    * and duplicated (user_id, session_id) keys). One definition serves
    * both streaming variants — the two copies of this 15-line block had
    * already been flagged as a divergence hazard. */
  private def foldSessions(user: Long, sorted: Seq[SessionEvent],
                           st0: SessionState, gapUs: Long): (SessionState, Seq[SessionOut]) = {
    var st = st0
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      st match {
        case null =>
          st = SessionState(0L, 1L, e.ts_us, e.ts_us)
        case s if s.nEvents == 0L => // tombstone: open the next session
          st = SessionState(s.sessionId, 1L, e.ts_us, e.ts_us)
        case s if e.ts_us - s.lastUs > gapUs =>
          closed += SessionOut(user, s.sessionId, s.nEvents, s.startUs, s.lastUs)
          st = SessionState(s.sessionId + 1, 1L, e.ts_us, e.ts_us)
        case s =>
          st = s.copy(nEvents = s.nEvents + 1, lastUs = e.ts_us)
      }
    }
    (st, closed.result())
  }

  /** Streaming sessionization: the same 30-minute-gap state machine as
    * [[sessionize]], as a `flatMapGroupsWithState` keyed by user —
    * per-key state is one fixed-size record, so streaming state stays
    * bounded by the number of active users regardless of event volume.
    * Emits a session when the gap closes it; call with
    * `OutputMode.Append` + `GroupStateTimeout.NoTimeout` in tests (a
    * production deployment would use an event-time timeout to flush
    * idle sessions). */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[SessionEvent], gapMinutes: Int = 30)
  : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, it, state) =>
        // per-key per-micro-batch sort: state size is one record, but the
        // BATCH of a single hot user materializes on one task here. Bounded
        // by (events per user per trigger interval) — with second-to-minute
        // triggers that is small; a pathological hot key needs an upstream
        // per-user rate cap, not a bigger executor.
        val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
        val (st, closed) = foldSessions(user, sorted, state.getOption.orNull, gapUs)
        if (st != null) state.update(st)
        closed.iterator
      }
  }

  /** Production sessionization: [[sessionizeStream]]'s state machine plus
    * an EVENT-TIME TIMEOUT — a user who goes quiet has their open session
    * flushed once the watermark passes `lastUs + gap`, so state and output
    * latency stay bounded even for users who never return (the NoTimeout
    * form only emits a session when a later event closes it). Requires a
    * watermark on `ts_t`; the timeout timestamp is the session-gap
    * deadline itself. */
  def sessionizeStreamTimeout(events: org.apache.spark.sql.Dataset[TimedEvent],
                              gapMinutes: Int = 30)
  : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .withWatermark("ts_t", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (user, it, state) =>
        if (state.hasTimedOut) {
          val s = state.get
          // keep a TOMBSTONE carrying the next session id instead of
          // remove(): a returning user must not reuse this session's
          // number. No new timeout is set, so the tombstone (one fixed
          // 32-byte record) lives until the user returns — state becomes
          // bounded by observed-user cardinality, the same bound streaming
          // dedup accepts; re-key by (user, day) if even that must expire.
          state.update(SessionState(s.sessionId + 1, 0L, 0L, 0L))
          Iterator(SessionOut(user, s.sessionId, s.nEvents, s.startUs, s.lastUs))
        } else {
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val (st, closed) = foldSessions(
            user, sorted.map(e => SessionEvent(e.user_id, e.event_id, e.ts_us)),
            state.getOption.orNull, gapUs)
          if (st != null) {
            state.update(st)
            if (st.nEvents > 0L)
              state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000) // epoch millis
          }
          closed.iterator
        }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** ONLINE near-duplicate detection: flag each arriving document against
  * everything that arrived before it — the streaming form of the batch
  * LSH dedup (`Dedup.minhashNearDups`), for pipelines that admit documents
  * continuously instead of re-sketching the corpus per batch.
  *
  * Decomposition (each stage is the streaming analog of a batch stage):
  *  1. [[banded]] — per-row sketch projection (shingle→minhash→band), the
  *     same narrow transform the batch path runs; works unchanged on a
  *     stream.
  *  2. [[candidates]] — `flatMapGroupsWithState` keyed by BAND: state
  *     holds the (id, size, signature) of every doc seen in that band
  *     bucket, an arriving doc emits a candidate pair per bucket member
  *     that passes the size-ratio prune and the signature-agreement floor
  *     (the SAME two deterministic prefilters the batch verify uses).
  *     State carries signatures only — k longs per (doc, band), never
  *     shingle arrays or text.
  *  3. [[verify]] — exact shingle-set Jaccard via a STREAM-STATIC join
  *     against the corpus sketch store (the doc-store lookup a production
  *     dedup service does): stateless, so it chains legally behind the
  *     stateful stage in append mode.
  *
  * Delivery contract: a pair sharing several bands emits once per shared
  * band — AT-LEAST-ONCE per pair; consumers take `dropDuplicates` (or a
  * set-union sink) for exactly-once, the standard idempotent-sink rule.
  *
  * State bound at 100 TB: bands × corpus × (k longs) — capped on BOTH
  * axes. `maxPerBucket` caps any one bucket (the degenerate-band guard,
  * same role as the batch `maxBandBucket`): a boilerplate band shared by
  * millions of docs would otherwise grow one giant bucket — capped
  * buckets stop admitting state (documented recall loss concentrated
  * exactly on degenerate mass). `stateTtl` caps TOTAL state over the
  * stream's lifetime: with an event-time watermark, a band bucket idle
  * for longer than the TTL is dropped whole (`EventTimeTimeout`), so a
  * forever-running admission stream (the reference's continuous review
  * load, Airbnb_Review_ETL.py:58–106) holds state proportional to the
  * TTL window's traffic, not to everything ever admitted. Documents
  * older than the horizon stop being dedup sources — the standard
  * recall/state trade every online dedup service makes; run the batch
  * operator over the full corpus for retroactive sweeps.
  *
  * Batch/stream parity is spec-driven (StreamDedupSpec): the verified
  * pair set equals `Dedup.minhashNearDups` on the same corpus with the
  * same (k, rowsPerBand, shingleN, τ).
  */
object StreamDedup {

  final case class BandedDoc(band: String, doc_id: Long, n_sh: Int,
                             sig: Array[Long], ts: java.sql.Timestamp)
  final case class BandDoc(doc_id: Long, n_sh: Int, sig: Array[Long])
  final case class CandPair(id_a: Long, id_b: Long)

  /** Narrow sketch projection — one (band, id, |shingles|, signature) row
    * per (doc, band). Streaming-safe: projections and explode only. Docs
    * below `shingleN` chars have no shingle set (no similarity defined)
    * and are dropped, mirroring the batch operator.
    *
    * `tsCol` carries the document's event time through the sketch (epoch
    * 0 when absent): required when [[candidates]] runs with a `stateTtl`,
    * where the caller also sets `.withWatermark("ts", ...)` on this
    * frame before the stateful stage. */
  def banded(docs: DataFrame, textCol: String, idCol: String,
             k: Int = 128, rowsPerBand: Int = 8, shingleN: Int = 3,
             tsCol: Option[String] = None): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    val ts = tsCol.map(c => col(c).cast("timestamp"))
      .getOrElse(lit(new java.sql.Timestamp(0L)))
    Dedup.minhashed(docs, textCol, idCol, k, rowsPerBand, shingleN,
        carry = tsCol.toSeq)
      .filter(size(col("hs")) > 0)
      .select(explode(col("bands")).as("band"), col(idCol).cast("long").as("doc_id"),
        size(col("hs")).as("n_sh"), col("sig").as("sig"), ts.as("ts"))
      .as[BandedDoc]
  }

  /** Stateful candidate generation: every arriving doc vs every earlier
    * doc in the same band bucket, prefiltered by the deterministic
    * size-ratio and signature-agreement rules. Pairs are emitted with
    * id_a < id_b regardless of arrival order, so replays and in-batch
    * pairs canonicalize identically.
    *
    * `stateTtl` bounds TOTAL state over the stream's lifetime: a band
    * bucket that sees no arrival for `stateTtl` of EVENT time is dropped
    * whole when the watermark passes its horizon. Requires `b` to carry
    * real event times ([[banded]]'s `tsCol`) and a watermark on `ts`
    * upstream of this stage — Spark rejects `EventTimeTimeout` without
    * one. The timeout re-arms on every arrival, so a band active at
    * least once per TTL window lives forever (its `maxPerBucket` cap
    * still bounds it). */
  def candidates(b: Dataset[BandedDoc], threshold: Double,
                 maxPerBucket: Int = 100000,
                 stateTtl: Option[java.time.Duration] = None): Dataset[CandPair] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import b.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    b.groupByKey(_.band)
      .flatMapGroupsWithState[Seq[BandDoc], CandPair](
        OutputMode.Append, timeoutConf) { (_, it, state) =>
        if (state.hasTimedOut) {
          // watermark passed this band's horizon with no arrivals in the
          // trigger: drop the whole bucket — docs older than the TTL stop
          // being dedup sources (the documented recall/state trade)
          state.remove()
          Iterator.empty
        } else {
          // per-bucket per-trigger sort: deterministic in-batch pairing
          // (bounded by docs-per-band-per-trigger, not corpus size)
          val arriving = it.toSeq.sortBy(_.doc_id)
          val out = Seq.newBuilder[CandPair]
          // mutable buffer: `Seq :+` per admission would copy the whole
          // bucket each time — O(B²) allocation over a bucket's lifetime
          val bucket = scala.collection.mutable.ArrayBuffer.from(
            state.getOption.getOrElse(Seq.empty))
          // keyed membership for the redelivery check: the linear scan it
          // replaces made every arrival O(bucket) even when no pair exists
          val ids = scala.collection.mutable.HashSet.empty[Long]
          bucket.foreach(ids += _.doc_id)
          var admitted = false
          var maxTsMs = Long.MinValue
          for (d <- arriving) {
            if (d.ts.getTime > maxTsMs) maxTsMs = d.ts.getTime
            // k and the agreement floor derive from the signatures themselves
            // — a separate k parameter could silently disagree with banded()
            val k = d.sig.length
            val floor = Dedup.minAgree(k, threshold)
            // at-least-once upstream: a redelivered doc that was ADMITTED to
            // state already emitted its pairs on first arrival — skip it, so
            // it neither re-emits nor doubles future pairs. (A doc that
            // arrived to a FULL bucket was never admitted and is not
            // remembered: its redelivery re-emits the same pairs — the
            // at-least-once contract, resolved by the idempotent sink.)
            if (!ids.contains(d.doc_id)) {
              for (s <- bucket) {
                if (s.n_sh >= d.n_sh * threshold && d.n_sh >= s.n_sh * threshold) {
                  var agree = 0
                  var i = 0
                  while (i < k) { if (s.sig(i) == d.sig(i)) agree += 1; i += 1 }
                  if (agree >= floor)
                    out += CandPair(math.min(s.doc_id, d.doc_id), math.max(s.doc_id, d.doc_id))
                }
              }
              if (bucket.length < maxPerBucket) {
                bucket += BandDoc(d.doc_id, d.n_sh, d.sig)
                ids += d.doc_id
                admitted = true
              }
            }
          }
          if (admitted) state.update(bucket.toSeq)
          // re-arm per arrival: the bucket expires only after `stateTtl` of
          // event-time silence. Clamped above the current watermark — Spark
          // rejects a timeout the watermark has already passed (possible
          // when this trigger's arrivals are themselves late data).
          if (stateTtl.isDefined && state.exists)
            state.setTimeoutTimestamp(math.max(
              maxTsMs + stateTtl.get.toMillis, state.getCurrentWatermarkMs() + 1))
          out.result().iterator
        }
      }
  }

  /** Exact verification: join candidate ids against the STATIC corpus
    * sketch store (id, sorted shingle hashes) and keep pairs with exact
    * Jaccard ≥ τ. Stateless (stream-static), so it runs in append mode
    * behind [[candidates]]. `sketch` = `Dedup.minhashed(corpus).select(id,
    * hs)` for an ad-hoc run; the persisted form is
    * [[graft.sinks.BandStore.sketchTable]] — the SAME docs/ table the
    * batch probe's exact verify reads, so the online and daily-batch
    * dedup paths share one store (parity spec'd in StreamDedupSpec;
    * sketch the stream under the store's pinned
    * [[graft.sinks.BandStore.params]] or signatures never agree). */
  def verify(cands: DataFrame, sketch: DataFrame, idCol: String,
             threshold: Double): DataFrame =
    // candidate ids are structurally Long (CandPair) — align the sketch's
    // id type before handing to the shared (type-generic) verifier
    Dedup.verifyPairs(cands,
      sketch.select(col(idCol).cast("long").as(idCol), col("hs")), idCol, threshold)
}

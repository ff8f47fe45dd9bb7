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
  * State bound at 100 TB: bands × corpus × (k longs). `maxPerBucket` caps
  * any one bucket (the degenerate-band guard, same role as the batch
  * `maxBandBucket`): a boilerplate band shared by millions of docs would
  * otherwise make every arrival O(bucket) — capped buckets stop admitting
  * state (documented recall loss concentrated exactly on degenerate
  * mass). Production deployments additionally TTL state by re-keying
  * band → (band, day).
  *
  * Batch/stream parity is spec-driven (StreamDedupSpec): the verified
  * pair set equals `Dedup.minhashNearDups` on the same corpus with the
  * same (k, rowsPerBand, shingleN, τ).
  */
object StreamDedup {

  final case class BandedDoc(band: String, doc_id: Long, n_sh: Int, sig: Array[Long])
  final case class BandDoc(doc_id: Long, n_sh: Int, sig: Array[Long])
  final case class CandPair(id_a: Long, id_b: Long)

  /** Narrow sketch projection — one (band, id, |shingles|, signature) row
    * per (doc, band). Streaming-safe: projections and explode only. Docs
    * below `shingleN` chars have no shingle set (no similarity defined)
    * and are dropped, mirroring the batch operator. */
  def banded(docs: DataFrame, textCol: String, idCol: String,
             k: Int = 128, rowsPerBand: Int = 8, shingleN: Int = 3): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    Dedup.minhashed(docs, textCol, idCol, k, rowsPerBand, shingleN)
      .filter(size(col("hs")) > 0)
      .select(explode(col("bands")).as("band"), col(idCol).cast("long").as("doc_id"),
        size(col("hs")).as("n_sh"), col("sig").as("sig"))
      .as[BandedDoc]
  }

  /** Stateful candidate generation: every arriving doc vs every earlier
    * doc in the same band bucket, prefiltered by the deterministic
    * size-ratio and signature-agreement rules. Pairs are emitted with
    * id_a < id_b regardless of arrival order, so replays and in-batch
    * pairs canonicalize identically. */
  def candidates(b: Dataset[BandedDoc], threshold: Double,
                 maxPerBucket: Int = 100000): Dataset[CandPair] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import b.sparkSession.implicits._
    b.groupByKey(_.band)
      .flatMapGroupsWithState[Seq[BandDoc], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, state) =>
        // per-bucket per-trigger sort: deterministic in-batch pairing
        // (bounded by docs-per-band-per-trigger, not corpus size)
        val arriving = it.toSeq.sortBy(_.doc_id)
        val out = Seq.newBuilder[CandPair]
        // mutable buffer: `Seq :+` per admission would copy the whole
        // bucket each time — O(B²) allocation over a bucket's lifetime
        val bucket = scala.collection.mutable.ArrayBuffer.from(
          state.getOption.getOrElse(Seq.empty))
        var admitted = false
        for (d <- arriving) {
          // k and the agreement floor derive from the signatures themselves
          // — a separate k parameter could silently disagree with banded()
          val k = d.sig.length
          val floor = Dedup.minAgree(k, threshold)
          // at-least-once upstream: a redelivered doc already emitted its
          // pairs on first arrival — skip it entirely, so it neither
          // re-emits nor re-enters state (doubling future pairs and
          // eating the cap)
          if (!bucket.exists(_.doc_id == d.doc_id)) {
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
              admitted = true
            }
          }
        }
        if (admitted) state.update(bucket.toSeq)
        out.result().iterator
      }
  }

  /** Exact verification: join candidate ids against the STATIC corpus
    * sketch store (id, sorted shingle hashes) and keep pairs with exact
    * Jaccard ≥ τ. Stateless (stream-static), so it runs in append mode
    * behind [[candidates]]. `sketch` = `Dedup.minhashed(corpus).select(id,
    * hs)` — at scale, a persisted sketch table keyed by id. */
  def verify(cands: DataFrame, sketch: DataFrame, idCol: String,
             threshold: Double): DataFrame =
    // candidate ids are structurally Long (CandPair) — align the sketch's
    // id type before handing to the shared (type-generic) verifier
    Dedup.verifyPairs(cands,
      sketch.select(col(idCol).cast("long").as(idCol), col("hs")), idCol, threshold)
}

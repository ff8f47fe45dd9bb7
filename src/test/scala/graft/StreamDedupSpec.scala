package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamDedup

/** Batch/stream parity for online near-dup dedup: feeding the corpus
  * through the band-keyed stateful candidate stage + stream-static exact
  * verify yields EXACTLY the batch `minhashNearDups` pair set (same k,
  * bands, shingles, τ) — across multiple micro-batches, including pairs
  * whose two docs arrive in the same batch and pairs spanning batches. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.8
  private val K = 32
  private val RPB = 4

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")
    .select($"doc_id", $"text")

  private def batchPairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
    threshold = tau, k = K, rowsPerBand = RPB, sketchParallelism = 4)
    .as[(Long, Long, Double)].collect().toSet

  test("streamed pair set equals the batch operator's, across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus.as[(Long, String)].collect().sortBy(_._1)
    assert(docs.length > 10)
    val ms = MemoryStream[(Long, String)]
    val banded = StreamDedup.banded(
      ms.toDF.toDF("doc_id", "text"), "text", "doc_id", k = K, rowsPerBand = RPB)
    val cands = StreamDedup.candidates(banded, tau)
    val sketch = Dedup.minhashed(corpus, "text", "doc_id", k = K, rowsPerBand = RPB)
      .filter(size($"hs") > 0).select($"doc_id", $"hs")
    val verified = StreamDedup.verify(cands.toDF, sketch, "doc_id", tau)
    val q = verified.writeStream.format("memory").queryName("sdn_out")
      .outputMode("append").start()
    try {
      // three micro-batches in arrival (= id) order: pairs form both
      // within a batch and across batches
      val thirds = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
      thirds.foreach { chunk => ms.addData(chunk.toSeq); q.processAllAvailable() }
      val streamed = spark.table("sdn_out")
        .as[(Long, Long, Double)].collect().toSet // set = at-least-once dedup
      assert(streamed === batchPairs)
      assert(streamed.nonEmpty, "corpus should contain near-dups")
    } finally q.stop()
  }

  test("a capped bucket stops admitting state but never emits a wrong pair") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val banded = StreamDedup.banded(
      ms.toDF.toDF("doc_id", "text"), "text", "doc_id", k = K, rowsPerBand = RPB)
    // cap of 1: each band bucket remembers only the first doc it saw
    val cands = StreamDedup.candidates(banded, tau, maxPerBucket = 1)
    val q = cands.toDF.writeStream.format("memory").queryName("sdn_cap")
      .outputMode("append").start()
    try {
      val docs = corpus.as[(Long, String)].collect().sortBy(_._1)
      ms.addData(docs.toSeq); q.processAllAvailable()
      val emitted = spark.table("sdn_cap").as[(Long, Long)].collect().toSet
      // every emitted candidate must still be a real band collision from
      // the batch generator (cap loses recall, never soundness)
      val m = Dedup.minhashed(corpus, "text", "doc_id", k = K, rowsPerBand = RPB)
        .filter(size($"hs") > 0)
      val batchCands = Dedup.minhashBandCandidates(m, "doc_id", tau)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(emitted.subsetOf(batchCands))
    } finally q.stop()
  }
}

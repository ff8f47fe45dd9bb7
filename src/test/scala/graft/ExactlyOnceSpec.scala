package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sinks.DocStoreSink

/** End-to-end exactly-once STREAMING SINK story (round-16 verdict item):
  * Structured Streaming's `foreachBatch` delivers each micro-batch
  * AT-LEAST-ONCE — after a crash between the sink's write and the
  * checkpoint commit, the restarted query re-offers the same batch. The
  * engine's doc-store sink is IDEMPOTENT by construction (scalar upsert
  * overwrites with equal values; the nested-array merge is a SET union),
  * so at-least-once delivery × idempotent sink = exactly-once OUTPUT —
  * with no transaction log. This spec drives the real streaming path
  * (MemoryStream → writeStream.foreachBatch → DocStoreSink
  * .appendRecordsInto → parquet store) and then REPLAYS a delivered
  * batch through the same sink closure, asserting the store is
  * byte-identical — the redelivery a restart produces is a no-op. */
class ExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  private def storeRows(path: String): Seq[String] =
    spark.read.parquet(path).toJSON.collect().toSeq.sorted

  test("foreachBatch → DocStoreSink: batch replay leaves the store byte-identical (exactly-once output)") {
    val store = java.nio.file.Files.createTempDirectory("graft_eo").toString + "/docs"
    val sink = DocStoreSink.appendRecordsInto(
      store, "listing_id", Seq("reviewer", "comment"), "reviews", Nil) _

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val qy = ms.toDF().toDF("listing_id", "reviewer", "comment")
      .writeStream.foreachBatch(sink).start()
    // batch 1: two listings; batch 2: one NEW listing + one listing-1
    // review (cross-batch accumulation — the reference's $addToSet shape)
    ms.addData((1L, "ann", "quiet and clean"), (2L, "bob", "noisy"))
    qy.processAllAvailable()
    val batch2 = Seq((3L, "cat", "great view"), (1L, "dan", "spacious"))
    ms.addData(batch2: _*)
    qy.processAllAvailable()
    qy.stop()

    val delivered = storeRows(store)
    // listing 1 accumulated reviews from both batches
    assert(spark.read.parquet(store).where($"listing_id" === 1L)
      .selectExpr("size(reviews)").as[Int].head() == 2)

    // the crash window: checkpoint commit lost after the store write —
    // the restarted query re-offers batch 2 (same data, same batch id)
    sink(batch2.toDF("listing_id", "reviewer", "comment"), 1L)
    assert(storeRows(store) == delivered,
      "replaying a delivered batch changed the store — the sink is not idempotent")

    // batch id is NOT load-bearing for idempotence (a restarted query may
    // renumber after checkpoint surgery): replay under a different id
    sink(batch2.toDF("listing_id", "reviewer", "comment"), 7L)
    assert(storeRows(store) == delivered)

    // and the streamed store equals the ONE-SHOT batch load of all
    // records — streaming accumulation lost nothing and invented nothing
    val oneShot = java.nio.file.Files.createTempDirectory("graft_eo1").toString + "/docs"
    val all = Seq((1L, "ann", "quiet and clean"), (2L, "bob", "noisy")) ++ batch2
    DocStoreSink.appendRecordsInto(
      oneShot, "listing_id", Seq("reviewer", "comment"), "reviews", Nil)(
      all.toDF("listing_id", "reviewer", "comment"), 0L)
    assert(storeRows(oneShot) == delivered)
  }

  test("partial-overlap redelivery (a batch re-cut after checkpoint surgery) is still exactly-once") {
    val store = java.nio.file.Files.createTempDirectory("graft_eo2").toString + "/docs"
    val sink = DocStoreSink.appendRecordsInto(
      store, "listing_id", Seq("reviewer", "comment"), "reviews", Nil) _
    sink(Seq((1L, "ann", "a"), (2L, "bob", "b")).toDF("listing_id", "reviewer", "comment"), 0L)
    val before = storeRows(store)
    // a re-cut batch repeats one already-delivered record and adds one new
    sink(Seq((2L, "bob", "b"), (3L, "cat", "c")).toDF("listing_id", "reviewer", "comment"), 1L)
    val after = spark.read.parquet(store)
    assert(after.count() == 3)
    // the repeated record added nothing to listing 2
    assert(after.where($"listing_id" === 2L).selectExpr("size(reviews)").as[Int].head() == 1)
    // the already-delivered docs are untouched byte for byte
    val afterRows = storeRows(store)
    assert(before.forall(afterRows.contains))
  }
}

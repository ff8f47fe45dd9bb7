package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual smoke for the paths the batch Verify gate can't reach:
  * Structured Streaming (readStream → windowAggStream → memory sink)
  * and the multimodal Dataset stub. Run:
  * `sbt "runMain graft.tools.StreamSmoke /root/testdata/sf0.001"`. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // streaming: same transform as the batch stream_window_agg query
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file-stream source needs a dir or glob, not a bare file path
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(s"$dir/events.parque[t]"))
    println(s"isStreaming=${stream.isStreaming}")
    val agg = graft.streaming.Events.windowAggStream(stream)
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("smoke").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("smoke")
    val batchN = spark.read.parquet(s"$dir/events.parquet").count()
    val streamN = rows.agg(sum("n")).as[Long].head()
    println(s"stream windows=${rows.count()} events_via_stream=$streamN events_batch=$batchN")
    rows.orderBy(col("window.start")).show(3, truncate = false)

    // multimodal: payload plumbing + stubbed batched decode
    import graft.multimodal.Multimodal
    val media = Multimodal.withPayload(spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
      .select(col("doc_id").as("id"), col("payload"), col("meta.byte_len"), col("meta.width"), col("meta.height"))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.decodeFeatures(media, batchSize = 7)
    println(s"media_features=${feats.count()}")
    feats.orderBy("id").show(3, truncate = false)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal
    .withPayload(spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
    .select(col("doc_id").as("id"), col("payload"),
      col("meta.byte_len"), col("meta.width"), col("meta.height"))
    .as[Multimodal.MediaRow]

  test("payload round-trips the text bytes; metadata is in range") {
    val bad = Multimodal.withPayload(spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id")
      .filter(decode(col("payload"), "UTF-8") =!= col("text") ||
        col("meta.width") < 64 || col("meta.width") >= 1024 ||
        col("meta.height") < 64 || col("meta.height") >= 1024)
    assert(bad.isEmpty)
  }

  test("stub decode is deterministic across batch sizes and runs") {
    val f1 = Multimodal.decodeFeatures(media, batchSize = 7).orderBy("id").collect()
    val f2 = Multimodal.decodeFeatures(media, batchSize = 64).orderBy("id").collect()
    assert(f1.length === spark.read.parquet(s"$sf/documents.parquet").count())
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
  }
}

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

  test("decode is deterministic across batch sizes and runs") {
    val f1 = Multimodal.decodeFeatures(media, batchSize = 7).orderBy("id").collect()
    val f2 = Multimodal.decodeFeatures(media, batchSize = 64).orderBy("id").collect()
    assert(f1.length === spark.read.parquet(s"$sf/documents.parquet").count())
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
  }

  test("javax.imageio decodes real PNG bytes back to the encoded pixels") {
    val ids = spark.read.parquet(s"$sf/documents.parquet").select($"doc_id")
    val decoded = Multimodal.decodePngs(Multimodal.synthesizePngs(ids, "doc_id"))
      .as[(Long, Int, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, w, h, sum) =>
      assert(w === 4 + (id % 13).toInt && h === 4 + (id % 11).toInt)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + y * 7 + x * 13) % 256).sum
      assert(sum === expected, s"pixel sum mismatch for id=$id")
    }
  }

  test("decodeFeatures routes image payloads through the real codec") {
    val png = Multimodal.synthesizePngs(
      spark.range(5).select($"id".as("doc_id")), "doc_id")
      .map(p => Multimodal.MediaRow(p.doc_id, p.payload, p.payload.length, -1, -1))
    val feats = Multimodal.decodeFeatures(png).collect().sortBy(_.id)
    feats.foreach { f =>
      // real decode: width/height come from the image, not the meta stub
      assert(f.width === 4 + (f.id % 13).toInt && f.height === 4 + (f.id % 11).toInt)
      assert(f.feature(0) === f.width.toFloat && f.feature(1) === f.height.toFloat)
    }
  }
}

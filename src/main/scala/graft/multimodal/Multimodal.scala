package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.D `mm_meta`).
  *
  * Design: media travel as opaque `BINARY` payload columns next to a typed
  * metadata struct; decode/feature-extract runs per-partition in batches so
  * a real codec drops in without changing the plan shape. The codec itself
  * is STUBBED (this container has no image/audio libs): `fakeDecode` is a
  * deterministic md5-derived stand-in, clearly marked. Everything around
  * it — schema, batch iteration, partitioning — is the real Spark-side
  * pipeline.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata to a text corpus, standing in
    * for (doc_id, image_bytes, meta). Pure projection: no shuffle. */
  def withPayload(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h1 = conv(substring(md5(col(textCol)), 1, 6), 16, 10).cast("bigint")
    val h2 = conv(substring(md5(col(textCol)), 7, 6), 16, 10).cast("bigint")
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).as("byte_len"),
        (lit(64) + h1 % 960).cast("int").as("width"),
        (lit(64) + h2 % 960).cast("int").as("height")).as("meta"))
  }

  final case class MediaRow(id: Long, payload: Array[Byte], byte_len: Int, width: Int, height: Int)
  final case class MediaFeature(id: Long, width: Int, height: Int, feature: Array[Float])

  /** Batched per-partition "decode + featurize". A real implementation
    * would decode `payload` with an image codec and run a model per batch;
    * the STUB derives a deterministic 4-float feature from the payload
    * bytes so tests can assert the plumbing (batching, schema, encoder
    * round-trip) end to end. */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB CODEC: replace with real decode(batch) — deterministic fake:
        batch.map { m =>
          val s = m.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000003L)
          MediaFeature(m.id, m.width, m.height,
            Array(s.toFloat, m.byte_len.toFloat, m.width.toFloat, m.height.toFloat))
        }
      }
    }
  }
}

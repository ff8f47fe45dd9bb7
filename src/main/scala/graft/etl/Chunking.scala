package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window token chunking with overlap — the embedding/RAG prep
  * primitive: every document becomes ⌈n/stride⌉ windows of up to `size`
  * tokens starting every `stride` tokens (overlap = size − stride), each
  * with a content hash so downstream chunk-level dedup is one hash
  * groupBy away.
  *
  * Pure narrow transform (split → sequence → posexplode): no shuffle, no
  * UDF — scan-speed at any corpus size; the output fans out ~n/stride
  * rows per doc and drops the full text column, so what flows to the
  * embedding stage is already the small projection. */
object Chunking {

  /** (idCol, chunk_idx, n_tokens, chunk_hash) per window. `size` ≥
    * `stride` > 0; the last window may be shorter than `size`. */
  def chunkWindows(df: DataFrame, textCol: String, idCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride,
      s"need size >= stride > 0, got size=$size stride=$stride")
    // null/empty docs produce NO chunks: without the filter, a null text
    // emits one phantom (n_tokens NULL, md5("")) chunk and an empty text a
    // bogus 1-token chunk sharing the same hash — chunk-level hash dedup
    // would merge them into one fake identity.
    // The token array is STAGED once per row before the window lambda:
    // a split embedded in the lambda body re-evaluates per window
    // (higher-order functions are CodegenFallback — the wordNgrams /
    // CountMin lesson)
    val toks = col("__toks")
    val starts = sequence(lit(0), greatest(org.apache.spark.sql.functions.size(toks) - 1, lit(0)), lit(stride))
    df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol),
        posexplode(transform(starts, st => slice(toks, st + 1, lit(size)))).as(Seq("chunk_idx", "chunk")))
      .select(col(idCol), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("chunk")).as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }
}

package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Centroid-partitioned ANN corpus store — the storage layout that turns
  * IVF's "search only the probed clusters" filter into PARTITION PRUNING:
  * a probe of `nProbe` of `K` clusters plans a scan that reads only
  * `nProbe` directories of the store, so at 100 TB the dominant cost
  * (reading corpus vectors) shrinks by ~K/nProbe before a single byte is
  * read. `Similarity.ivfSearch` computes the same answer from a raw
  * corpus; this store is the amortized form — assign once at ingest, and
  * every later query is a pruned scan (the claim is spec-proven: the
  * executed probe plan carries a STATIC `centroid_id IN (...)` partition
  * filter — `ivfSearchAssigned` routes probe ids driver-side — and reads
  * only the probed partitions' files).
  */
object AnnStore {

  /** Persist an `ivfAssign(..., keepVec = true)` result partitioned by
    * cluster. One directory per centroid; vectors round-trip parquet
    * exactly (binary doubles), so search over the store is value-identical
    * to search over the in-memory assignment. */
  def write(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)

  /** APPEND a new assigned batch into an existing store — the ingest
    * path's steady state: arriving vectors are coarse-assigned against
    * the SAME centroids (a zero-shuffle broadcast fold) and their files
    * land only in the clusters they belong to; untouched partitions'
    * files are never rewritten, and a reader planned after the append
    * sees old + new with the identical pruning contract (spec-proven:
    * the post-append probe still carries the static partition filter
    * and equals the full-corpus search). Re-clustering is a separate,
    * deliberate operation — appending against drifted centroids only
    * degrades recall, never correctness, since search scans whatever
    * partitions the probe names. */
  def append(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("append").partitionBy("centroid_id").parquet(path)

  /** Read the store back. `centroid_id` returns as a partition column —
    * a foldable filter on it prunes directories at planning time instead
    * of scanning the corpus. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist PQ CODES partitioned by their IVF cluster — the IVF+PQ
    * serving layout: `codes` ([[graft.operators.ProductQuant.encode]]'s
    * (idCol, codes)) joined to the (idCol, centroid_id) coarse
    * assignment, one directory per centroid. A probed query
    * ([[graft.operators.ProductQuant.searchPruned]]) then reads ONLY the
    * probed clusters' code files — the float store's ~K/nProbe I/O
    * reduction, applied to a column that is already ~64× smaller than
    * the vectors, so the per-query read cost is (nProbe/K) · m bytes per
    * corpus row. The float vectors can stay in cold storage entirely. */
  def writePq(assigned: DataFrame, codes: DataFrame, idCol: String,
              path: String): Unit =
    assigned.select(col(idCol), col("centroid_id"))
      .join(codes, Seq(idCol))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(path)
}

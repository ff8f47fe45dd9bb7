package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Read the store back. `centroid_id` returns as a partition column —
    * a foldable filter on it prunes directories at planning time instead
    * of scanning the corpus. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

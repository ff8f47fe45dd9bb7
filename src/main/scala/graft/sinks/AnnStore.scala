package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.{FileSystem, Path}

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

  /** COMPACTION — the missing third of the store lifecycle (write →
    * append → compact): every [[append]] adds files to its target
    * clusters and never rewrites existing ones (that is its contract),
    * so a steady ingest stream grows per-partition file counts without
    * bound — at 100 TB that means ever more scan tasks, open-file
    * overhead, and footer reads per probe. `compact` rewrites each
    * cluster whose parquet file count exceeds `maxFiles` into ONE file,
    * and touches NOTHING else: untouched partitions' files stay
    * byte-identical (spec-asserted), and search over the compacted store
    * equals search over the fragmented one (files are layout, never
    * semantics — spec-asserted for both the float and the PQ layout).
    *
    * Scale shape: one distributed job over ONLY the fragmented clusters
    * (the `centroid_id IN (...)` filter is partition pruning, so
    * already-compact clusters are never read), repartitioned by cluster
    * so each cluster's rows land in one task → one output file per
    * cluster dir. No driver-side row movement; the driver handles only
    * directory names (≤ K entries of metadata, same scale as the probe
    * route).
    *
    * Promotion is a per-cluster atomic swap through scratch dirs OUTSIDE
    * the store root (a `centroid_id=3.old` dir inside it would corrupt
    * partition discovery): mv(dst→old), mv(tmp→dst), delete old — the
    * [[ParquetSink.swapWrite]] rename discipline, recovered on entry
    * (a crash mid-swap leaves old + a fully-written tmp; renames start
    * only after the write commits, so tmp is trustworthy and promoted,
    * else old is restored). Same atomicity scope as swapWrite: rename
    * must be atomic (local FS / HDFS); object stores need a table
    * format on top.
    *
    * Returns the compacted cluster ids (empty = store already compact —
    * the call is idempotent). */
  def compact(spark: SparkSession, path: String, maxFiles: Int = 1): Seq[Long] = {
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpRoot = new Path(path + ".compact_tmp")
    val oldRoot = new Path(path + ".compact_old")
    def mv(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"compact: rename $from -> $to failed")
    def clusterDirs(root: Path): Seq[Path] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath).filter(_.getName.startsWith("centroid_id="))
    def clusterId(p: Path): Long = p.getName.stripPrefix("centroid_id=").toLong
    // recover a crashed prior compaction: for every cluster parked in
    // oldRoot with no live dst dir, promote the committed tmp if present,
    // else restore the original — never delete the only copy
    clusterDirs(oldRoot).foreach { oldC =>
      val dstC = new Path(dst, oldC.getName)
      val tmpC = new Path(tmpRoot, oldC.getName)
      if (!fs.exists(dstC)) {
        if (fs.exists(tmpC)) mv(tmpC, dstC) else mv(oldC, dstC)
      }
    }
    if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
    if (fs.exists(oldRoot)) fs.delete(oldRoot, true)
    val targets = clusterDirs(dst).filter { c =>
      fs.listStatus(c).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")) > maxFiles
    }.map(clusterId).sorted
    if (targets.isEmpty) return Seq.empty
    // one pruned distributed rewrite of only the fragmented clusters;
    // repartition by cluster => each cluster's rows reach one task =>
    // exactly one file per cluster dir (never a coalesce(1) of the store)
    read(spark, path)
      .filter(col("centroid_id").isin(targets: _*))
      .repartition(targets.size, col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(tmpRoot.toString)
    fs.mkdirs(oldRoot)
    targets.foreach { c =>
      val name = s"centroid_id=$c"
      val dstC = new Path(dst, name)
      mv(dstC, new Path(oldRoot, name))
      mv(new Path(tmpRoot, name), dstC)
    }
    fs.delete(oldRoot, true)
    fs.delete(tmpRoot, true)
    targets
  }
}

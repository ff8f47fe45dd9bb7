package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sinks — the reference "load" phase (Postgres upsert tables +
  * Mongo collections, `Airbnb_Listings_ETL.py:141-151,172-207`)
  * re-expressed as columnar lake writes.
  *
  * Scale notes: `partitionBy` on a low-cardinality column turns future
  * reads with a partition predicate into pruned scans (`PartitionFilters`
  * in the plan — verified in ParquetSinkSpec); never partition on a
  * high-cardinality key (one dir per value). `maxRecordsPerFile` bounds
  * file size; no `coalesce(1)` anywhere — writers scale with upstream
  * partitions.
  */
object ParquetSink {

  /** Write partitioned by low-cardinality columns (e.g. lang, date). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000): Unit =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Keyed upsert into a partitioned parquet table: read-modify-write of
    * base ∪ updates with updates winning per key — the lake-native form of
    * the reference's `insert_rows(replace=True, replace_index='id')`.
    *
    * `allowEvolution = true` widens schema drift with nulls instead of
    * failing the load: a batch carrying a NEW column rewrites the table
    * with that column appended (existing rows read it back as null), and a
    * batch missing an old column carries null there for its own rows.
    * Strict by default — the same opt-in contract as
    * [[DocStoreSink.mergeDocs]]. */
  def upsertInto(spark: SparkSession, path: String, updates: DataFrame,
                 key: String, partitionCols: Seq[String],
                 allowEvolution: Boolean = false): Unit =
    swapWrite(spark, path, partitionCols) {
      case Some(base) => graft.etl.Normalize.upsert(base, updates, key, allowEvolution)
      case None       => updates
    }

  /** Atomic read-modify-write swap shared by every keyed sink: recover any
    * crashed prior swap, hand the current base table (if any) to `merge`,
    * write the result to `.tmp`, then promote it with checked renames.
    *
    * All directory manipulation goes through the Hadoop `FileSystem` API
    * (`java.io.File.renameTo` is local-only and fails silently elsewhere).
    * ATOMICITY SCOPE: the swap is crash-safe where directory rename is
    * atomic — local filesystems and HDFS. On an S3A-style object store,
    * rename is copy-then-delete, so a crash mid-promotion can leave a
    * partially-copied dst that recovery cannot distinguish from a complete
    * one; object-store deployments need a commit-marker protocol (or a
    * table format like Iceberg/Delta) on top.
    * Leftover `.tmp`/`.old` dirs from a crashed prior run are cleared up
    * front — a stale `.old` would otherwise make the dst→old rename fail
    * and lose the upsert — and every rename result is checked. */
  private[sinks] def swapWrite(spark: SparkSession, path: String,
                               partitionCols: Seq[String])
                              (merge: Option[DataFrame] => DataFrame): Unit =
    swapWriteWith(spark, path, partitionCols, (_, _) => ())(merge)

  /** Crash recovery for a [[swapWrite]] that died mid-promotion, callable
    * on its own: if a prior run crashed between mv(dst, old) and
    * mv(tmp, dst), the base table exists only as `.old` and the
    * fully-written merged result as `.tmp` — deleting them blindly would
    * silently lose the whole base table. A `.tmp` alongside `.old` is
    * trustworthy (renames start only after the write commits); a `.tmp`
    * with NEITHER dst nor old is a half-written initial create, handled by
    * the caller's cleanup. Runs BEFORE any state read that depends on dst
    * being current — [[Scd2Sink]] consults its replay marker under dst, so
    * it must recover first or a crashed-then-redelivered batch reads no
    * marker and re-merges on top of itself. Idempotent; no-op when dst
    * exists. */
  private[sinks] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                                 dst: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(dst.toString + ".tmp")
    val old = new Path(dst.toString + ".old")
    def mv(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"recoverSwap: rename $from -> $to failed")
    if (!fs.exists(dst) && fs.exists(old)) {
      if (fs.exists(tmp)) { mv(tmp, dst); fs.delete(old, true): Unit }
      else mv(old, dst)
    }
  }

  /** [[swapWrite]] plus an `afterWrite(fs, tmpDir)` hook that runs after
    * the merged result is fully written but BEFORE the promotion renames —
    * anything the hook drops into the tmp dir (e.g. a commit marker)
    * becomes visible ATOMICALLY with the data it describes. That is what
    * makes a foreachBatch sink exactly-once: the marker can never name a
    * batch whose data didn't land, nor vice versa. */
  private[sinks] def swapWriteWith(spark: SparkSession, path: String,
                                   partitionCols: Seq[String],
                                   afterWrite: (org.apache.hadoop.fs.FileSystem,
                                     org.apache.hadoop.fs.Path) => Unit)
                                  (merge: Option[DataFrame] => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".tmp")
    val old = new Path(path + ".old")
    def mv(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"swapWrite: rename $from -> $to failed")
    recoverSwap(fs, dst)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
    val merged = merge(if (fs.exists(dst)) Some(spark.read.parquet(path)) else None)
    // write to a temp dir then swap: the source partition being overwritten
    // is also an input — direct overwrite would corrupt it mid-scan
    writePartitioned(merged, tmp.toString, partitionCols)
    afterWrite(fs, tmp)
    if (fs.exists(dst)) {
      mv(dst, old)
      mv(tmp, dst)
      fs.delete(old, true): Unit
    } else mv(tmp, dst)
  }
}

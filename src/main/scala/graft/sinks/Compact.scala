package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file COMPACTION — the bin-packing half of `OPTIMIZE` (the
  * z-order half lives in [[ZOrderTable]]): a streaming/incremental
  * writer fragments a lake table into thousands of KB-sized files, and
  * every subsequent scan pays one task + one footer read per file. At
  * 100 TB the file count, not the byte count, becomes the scheduler's
  * bottleneck (a 100k-file table plans 100k splits regardless of
  * `maxPartitionBytes`). Compaction rewrites the data as
  * `ceil(bytes / targetFileBytes)` files and nothing else — lossless
  * row for row (the `etl_compact_files` oracle hash-checks exactly
  * that), no ordering contract (layout-preserving compaction is
  * [[ZOrderTable.compact]]'s job).
  *
  * Scale notes: the file-size listing is a driver-side METADATA
  * operation (one FS list, no data read); the rewrite is one
  * round-robin exchange sized by measured bytes, not row counts —
  * wide-row and narrow-row tables both land near the target. The
  * rewrite goes through [[ParquetSink.swapWrite]]'s park-promote swap,
  * so a crash mid-compaction never leaves the table half-rewritten. */
object Compact {

  /** Side/hidden files excluded from the byte/count measurements —
    * Spark's own HiddenFileFilter convention: `_`-prefixed (_SUCCESS,
    * _metadata) AND `.`-prefixed (RawLocalFileSystem writes .part-*.crc
    * checksum shadows that listStatus DOES return on some filesystems;
    * counting them would inflate measured bytes and skew the computed
    * target file count). */
  private def isSideFile(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Total bytes of the parquet data files under `path` (driver-side
    * metadata listing; `_`/`.`-prefixed side files excluded). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(d).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (isSideFile(st.getPath.getName)) 0L
        else st.getLen
      }.sum
    walk(p)
  }

  /** Number of parquet data files under `path` (same listing rules). */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(d).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (isSideFile(st.getPath.getName)) 0L
        else 1L
      }.sum
    walk(p)
  }

  /** Rewrite the table at `path` IN PLACE as ~`targetFileBytes` files.
    * Returns (files before, files after). The target count comes from
    * measured input bytes — compressed parquet re-compresses at roughly
    * the same ratio, so output files land near the target without a
    * calibration pass. `repartition` (round-robin) spreads rows evenly;
    * there is no keyed shuffle because compaction has no key. */
  def filesInPlace(spark: SparkSession, path: String,
                   targetFileBytes: Long): (Long, Long) = {
    require(targetFileBytes > 0, s"targetFileBytes $targetFileBytes must be > 0")
    val before = dataFileCount(spark, path)
    val bytes = dataBytes(spark, path)
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    ParquetSink.swapWrite(spark, path, Nil) {
      case Some(cur) => cur.repartition(n)
      case None => throw new IllegalStateException(s"compact: no table at $path")
    }
    (before, dataFileCount(spark, path))
  }
}

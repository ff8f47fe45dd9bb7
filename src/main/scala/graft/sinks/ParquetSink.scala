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
    * the reference's `insert_rows(replace=True, replace_index='id')`. */
  def upsertInto(spark: SparkSession, path: String, updates: DataFrame,
                 key: String, partitionCols: Seq[String]): Unit = {
    val merged = if (new java.io.File(path).exists()) {
      graft.etl.Normalize.upsert(spark.read.parquet(path), updates, key)
    } else updates
    // write to a temp dir then swap: the source partition being overwritten
    // is also an input — direct overwrite would corrupt it mid-scan
    val tmp = path + ".tmp"
    writePartitioned(merged, tmp, partitionCols)
    val dst = new java.io.File(path)
    if (dst.exists()) {
      val old = new java.io.File(path + ".old")
      dst.renameTo(old)
      new java.io.File(tmp).renameTo(dst)
      deleteRecursively(old)
    } else new java.io.File(tmp).renameTo(dst)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}

package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed table writes — the storage half of the co-located-join
  * strategy SURVEY §5 prescribes for repeated fact-fact joins at 100 TB:
  * both sides pre-hashed into the same number of buckets on the join key
  * mean the join reads bucket i against bucket i with NO Exchange in the
  * plan — the shuffle is paid once at write time and amortized over every
  * subsequent join, aggregation, or merge on that key.
  *
  * `sortBy` the same key additionally pre-sorts each bucket file, so a
  * SortMergeJoin skips its per-task sort too. Sizing: buckets should be
  * ~128-512 MB each at the target scale; too few buckets caps join
  * parallelism, too many produces small files (each task writes one file
  * per bucket it touches).
  *
  * BucketedJoinSpec proves the contract mechanically: the bucketed join's
  * executed plan contains zero Exchange operators and matches the plain
  * join's rows. */
object BucketedSink {

  /** Write `df` as a bucketed+sorted managed table (`saveAsTable` — the
    * bucket metadata lives in the session catalog; plain `.parquet(path)`
    * cannot record it). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, overwrite: Boolean = true): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(if (overwrite) "overwrite" else "error")
      .saveAsTable(table)
  }
}

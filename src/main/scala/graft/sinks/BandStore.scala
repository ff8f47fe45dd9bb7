package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

import graft.operators.Dedup

/** Persisted LSH BAND INDEX — the store that makes incremental near-dup
  * dedup ([[graft.operators.Dedup.minhashNearDupsAgainst]]) incremental
  * for real: the self-contained form re-sketches the FULL history every
  * run, but a daily-crawl pipeline sketches each batch once, appends its
  * banded signatures here, and every later batch probes the index —
  * reading only the band partitions its own band keys collide with.
  *
  * Layout under one root (all state travels as one directory tree):
  *  - `bands/` — one row per (band key, doc): (band, id, n_sh, sig),
  *    partitioned by `bucket` = xxhash64(band) mod B. A probe computes
  *    the batch's band keys, derives their ≤B distinct buckets
  *    driver-side (bounded routing metadata, the
  *    [[graft.operators.Similarity.probeRoute]] discipline), and plans a
  *    scan with a foldable `bucket IN (...)` — STATIC partition pruning:
  *    at 100 TB a probe reads ~|batch bands|/B of the index, never the
  *    history. Carrying the k-slot signature beside each band row is the
  *    classic LSH-index denormalization: the sig-agreement prefilter
  *    (the stage that kills ~99.9% of band collisions) then runs
  *    MAP-SIDE over the pruned scan against the broadcast batch — no
  *    history row ever enters an exchange.
  *  - `docs/` — one row per doc: (id, hs = sorted shingle hashes),
  *    partitioned by `bucket` = xxhash64(id) mod B. Only the exact
  *    verify reads it, pruned to the buckets holding the surviving
  *    candidates' ids (again ≤B bounded driver-side values) — the
  *    unbounded shingle arrays are fetched for candidate-scale rows,
  *    never corpus-scale.
  *  - `_params/` — the sketch parameters (k, rowsPerBand, shingleN,
  *    buckets) pinned at [[write]] time: an append or probe sketched
  *    under different parameters would be silently wrong (signatures
  *    from different hash families never agree), so both derive their
  *    parameters from the store, not the caller.
  *
  * Lifecycle mirrors [[AnnStore]]: write → append (new files land only
  * in their buckets; untouched partitions never rewritten) → compact
  * (per-bucket atomic swap via [[PartitionSwap]], layout never
  * semantics). Reads fail loudly on a crashed swap ([[recover]] heals);
  * swap-performing writers are serialized by the store-root writer fence
  * ([[PartitionSwap.withWriterLock]]). write/append/delete-free ingest
  * remains the caller's single-writer responsibility.
  *
  * Reference scope: the reference engine has no incremental index at all
  * (its dedup is a whole-corpus pandas `drop_duplicates`,
  * Airbnb_Listings_ETL.py:47-49); this store is the beyond-reference
  * scale path SURVEY §2.D's `dedup_band_store` row claims.
  */
object BandStore {

  private val Prefix = "bucket="
  private val Tags = Seq("swap")

  final case class Params(k: Int, rowsPerBand: Int, shingleN: Int, buckets: Int)

  private def bandsDir(path: String) = path + "/bands"
  private def docsDir(path: String) = path + "/docs"
  private def paramsDir(path: String) = path + "/_params"

  /** Build the index from a history corpus. `buckets` bounds both the
    * probe route (≤ buckets foldable IN values) and the partition-dir
    * count — 64 keeps directory listings trivial while a probe that
    * touches every bucket still prunes nothing worse than a full scan. */
  def write(history: DataFrame, textCol: String, idCol: String, path: String,
            k: Int = 128, rowsPerBand: Int = 8, shingleN: Int = 3,
            buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = history.sparkSession
    import spark.implicits._
    Seq((k, rowsPerBand, shingleN, buckets))
      .toDF("k", "rows_per_band", "shingle_n", "buckets")
      .write.mode("overwrite").parquet(paramsDir(path))
    writeSketched(history, textCol, idCol, path,
      Params(k, rowsPerBand, shingleN, buckets), mode = "overwrite")
  }

  /** Append a new accepted batch — the steady state: the batch is
    * sketched ONCE under the store's pinned parameters and its band rows
    * land only in the buckets they hash to; untouched partitions' files
    * are never rewritten. (Acceptance policy — e.g. "append only docs
    * that did not near-dup the history" — is the caller's composition of
    * [[probe]] + append.) */
  def append(batch: DataFrame, textCol: String, idCol: String, path: String): Unit =
    writeSketched(batch, textCol, idCol, path, params(batch.sparkSession, path),
      mode = "append")

  private def writeSketched(df: DataFrame, textCol: String, idCol: String,
                            path: String, p: Params, mode: String): Unit = {
    // one sketch pass feeds both tables: cache, write, release
    val m = Dedup.minhashed(df, textCol, idCol, p.k, p.rowsPerBand, p.shingleN)
      .filter(size(col("hs")) > 0).cache()
    try {
      m.select(explode(col("bands")).as("band"), col(idCol),
          size(col("hs")).as("n_sh"), col("sig"))
        .withColumn("bucket", pmod(xxhash64(col("band")), lit(p.buckets)))
        .write.mode(mode).partitionBy("bucket").parquet(bandsDir(path))
      m.select(col(idCol), col("hs"))
        .withColumn("bucket", pmod(xxhash64(col(idCol)), lit(p.buckets)))
        .write.mode(mode).partitionBy("bucket").parquet(docsDir(path))
    } finally { m.unpersist(); () }
  }

  /** The store's pinned sketch parameters. */
  def params(spark: SparkSession, path: String): Params = {
    val r = spark.read.parquet(paramsDir(path))
      .select("k", "rows_per_band", "shingle_n", "buckets").head()
    Params(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** PROBE: near-dup pairs (id_a = history doc, id_b = batch doc,
    * jaccard ≥ threshold) of a new batch against the indexed history —
    * value-identical to `minhashNearDupsAgainst(history, batch, ...)`
    * under the store's parameters (spec-proven), but the history side is
    * the PRE-STORED index:
    *  1. the batch sketches once (it is batch-sized — cached);
    *  2. its band keys' distinct buckets collect driver-side (≤ B ints,
    *     routing metadata) → the bands/ scan prunes statically;
    *  3. band-collision + size-ratio prune + sig-agreement all run
    *     map-side over that pruned scan against the BROADCAST batch
    *     bands — the index never shuffles;
    *  4. survivors' id-buckets collect (≤ B again) → the docs/ scan
    *     prunes statically, and the exact shingle-set verify
    *     ([[Dedup.verifyPairsAcross]]'s defining expression) runs over
    *     candidate-scale rows only.
    * Returns an EAGER frame (localCheckpoint) — same contract as the
    * self-contained operator. */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
            textCol: String, idCol: String, threshold: Double): DataFrame = {
    requireRecovered(spark, path)
    val p = params(spark, path)
    val mb = Dedup.minhashed(batch, textCol, idCol, p.k, p.rowsPerBand, p.shingleN)
      .filter(size(col("hs")) > 0).cache()
    try {
      val plausible = plausibleCandidates(spark, path, mb, idCol, threshold, p)
        .localCheckpoint()
      // candidate ids' buckets: ≤ buckets longs again — candidate-driven
      // static pruning of the shingle-array fetch
      val candBuckets: Seq[Any] = plausible
        .select(pmod(xxhash64(col("id_a")), lit(p.buckets)).as("bucket"))
        .distinct().collect().map(_.get(0)).toIndexedSeq
      val out =
        if (candBuckets.isEmpty)
          mb.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
            lit(0.0).as("jaccard")).limit(0)
        else {
          val hsDocs = spark.read.parquet(docsDir(path))
            .filter(col("bucket").isin(candBuckets: _*))
            .select(col(idCol), col("hs"))
          Dedup.verifyPairsAcross(plausible, hsDocs,
            mb.select(col(idCol), col("hs")), idCol, threshold)
        }
      out.localCheckpoint()
    } finally { mb.unpersist(); () }
  }

  /** Stages 2–3 of [[probe]] as a LAZY plan (package-private so the
    * pruning spec can inspect the executed scan): band-collision +
    * size-ratio + sig-agreement candidates of an already-sketched batch
    * `mb` against the stored index. The bucket route is the only eager
    * work (≤ `p.buckets` longs). */
  private[graft] def plausibleCandidates(spark: SparkSession, path: String,
                                         mb: DataFrame, idCol: String,
                                         threshold: Double, p: Params): DataFrame = {
    val bb = mb.select(col(idCol).as("id_b"), size(col("hs")).as("nb"),
        col("sig").as("sig_b"), explode(col("bands")).as("band"))
      .withColumn("bucket", pmod(xxhash64(col("band")), lit(p.buckets)))
    // probe route: ≤ buckets longs, bounded by construction
    val probeBuckets: Seq[Any] =
      bb.select("bucket").distinct().collect().map(_.get(0)).toIndexedSeq
    if (probeBuckets.isEmpty)
      mb.select(col(idCol).as("id_a"), col(idCol).as("id_b")).limit(0)
    else {
      val agree = graft.expressions.HashExpressions
        .positionalAgree(col("sig"), col("sig_b"))
      spark.read.parquet(bandsDir(path))
        .filter(col("bucket").isin(probeBuckets: _*))
        .join(broadcast(bb), Seq("band", "bucket"))
        .filter(col("n_sh") >= col("nb") * threshold &&
          col("nb") >= col("n_sh") * threshold)
        .filter(agree >= Dedup.minAgree(p.k, threshold))
        .select(col(idCol).as("id_a"), col("id_b")).distinct()
    }
  }

  /** COMPACT fragmented band/doc buckets back to one file each — the
    * [[AnnStore.compact]] discipline on both tables: every append adds
    * files to its target buckets, so steady ingest grows per-partition
    * file counts without bound; compact rewrites ONLY the >maxFiles
    * buckets through [[PartitionSwap]]'s per-partition atomic swap
    * (untouched partitions byte-identical, layout never semantics).
    * Returns the compacted (table, bucket) pairs; idempotent. */
  def compact(spark: SparkSession, path: String, maxFiles: Int = 1): Seq[(String, Long)] = {
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    val rootFs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one fence at the store root serializes writers across BOTH tables
    PartitionSwap.withWriterLock(rootFs, path, "BandStore") {
      Seq("bands" -> bandsDir(path), "docs" -> docsDir(path)).flatMap {
        case (table, dir) =>
          val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
          PartitionSwap.recoverSwap(fs, dir, Prefix, Tags)
          val targets = PartitionSwap.fragmented(fs, dir, Prefix, maxFiles)
            .map(_.getName.stripPrefix(Prefix).toLong).sorted
          if (targets.nonEmpty)
            PartitionSwap.swapRewrite(spark, fs, dir, "bucket",
              targets.map(b => s"$Prefix$b"),
              spark.read.parquet(dir).filter(col("bucket").isin(targets: _*)))
          targets.map(table -> _)
      }
    }
  }

  /** Heal a crashed compact (the [[AnnStore.recover]] twin; takes the
    * writer fence). */
  def recover(spark: SparkSession, path: String): Unit = {
    val rootFs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    PartitionSwap.withWriterLock(rootFs, path, "BandStore") {
      Seq(bandsDir(path), docsDir(path)).foreach { dir =>
        val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        PartitionSwap.recoverSwap(fs, dir, Prefix, Tags)
      }
    }
  }

  /** Clear a stale writer fence left by a crashed compact — see
    * [[PartitionSwap.breakLock]]'s caveat. */
  def breakLock(spark: SparkSession, path: String): Boolean =
    PartitionSwap.breakLock(
      new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration), path)

  private def requireRecovered(spark: SparkSession, path: String): Unit =
    Seq(bandsDir(path), docsDir(path)).foreach { dir =>
      PartitionSwap.requireRecovered(spark, dir, Prefix, "BandStore", Tags)
    }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operator family (SURVEY.md §2.D). Scale design:
  *  - `exact` shuffles 16-byte digests, never document bodies.
  *  - MinHash/LSH is linear: signatures are per-row folds (no shuffle),
  *    candidate generation is a band-key self-join (shuffles doc_id +
  *    band hash only), and O(n²) verification happens only inside band
  *    buckets — the whole pipeline never materializes all-pairs.
  *  - At 100 TB, band-bucket skew (a degenerate band matching millions of
  *    docs) is the risk: AQE skew-join handles moderate skew; degenerate
  *    buckets should be counted and capped upstream (documented here, the
  *    cap itself is a config decision).
  */
object Dedup {

  /** Exact dedup: group by content digest, keep the smallest id.
    * Reference analog: `drop_duplicates` (Airbnb_Listings_ETL.py:47-49),
    * hardened for scale by hashing the text before the shuffle. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), (count(lit(1)) - 1).as("n_dups"))

  /** Per-doc MinHash signature + LSH band keys. Zero-shuffle projection. */
  def minhashed(df: DataFrame, textCol: String, idCol: String,
                k: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame = {
    val sh = array_distinct(charShingles(col(textCol), shingleN))
    df.select(col(idCol), sh.as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), k))
      .withColumn("bands", lshBands(col("sig"), k, rowsPerBand))
  }

  /** Near-dup pairs: LSH candidates (share ≥1 band) verified by exact
    * shingle-set Jaccard ≥ `threshold`. Returns (id_a, id_b, jaccard). */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double, k: Int = 8, rowsPerBand: Int = 2,
                      shingleN: Int = 3): DataFrame = {
    val m = minhashed(df, textCol, idCol, k, rowsPerBand, shingleN)
      .select(col(idCol), col("shingles"), explode(col("bands")).as("band"))
    val a = m.select(col(idCol).as("id_a"), col("shingles").as("sh_a"), col("band"))
    val b = m.select(col(idCol).as("id_b"), col("shingles").as("sh_b"), col("band"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** Near-dup pairs by word-n-gram Jaccard inside a blocking key (e.g.
    * language): the block bounds the pair space; within a block the join
    * is by block key only, so choose blocks ≪ partition size at scale. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, threshold: Double, n: Int = 3): DataFrame = {
    val g = df.select(col(idCol), col(blockCol).as("block"),
      array_distinct(wordNgrams(col(textCol), n)).as("grams"))
    val a = g.select(col("block"), col(idCol).as("id_a"), col("grams").as("g_a"))
    val b = g.select(col("block"), col(idCol).as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        round(jaccard(col("g_a"), col("g_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Per-doc 60-bit SimHash (+ token count). Zero-shuffle projection;
    * near-dup = small hamming distance, found at scale by joining on
    * rotated prefixes (pigeonhole) rather than all-pairs. */
  def simhashed(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      simhash60(transform(tokens(col(textCol)), hash60(_))).as("simhash"),
      size(tokens(col(textCol))).as("n_tokens"))

  /** Embedding near-dup pairs with cosine ≥ threshold. Brute-force
    * all-pairs — correct for oracle verification and small n; the scale
    * path is `Similarity.ivfAssign` bucketing first (candidates share a
    * centroid), which this method accepts via `blockCol`. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double, blockCol: Option[String] = None): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val base = df.select(col(idCol), v.as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
    val withBlock = blockCol match {
      case Some(bc) => base.withColumn("block", df(bc))
      case None     => base.withColumn("block", lit(1))
    }
    val a = withBlock.select(col("block"), col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val bb = withBlock.select(col("block"), col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(bb, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(zip_with(col("v_a"), col("v_b"), (x, y) => x * y)
          .pipe(z => aggregate(z, lit(0.0), (acc, x) => acc + x)) / (col("n_a") * col("n_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  implicit private class Piped[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §2.D). All pure `Column` compositions over Spark's
  * codegen'd higher-order functions — no UDFs, so every one of these
  * stays inside WholeStageCodegen and runs at scan speed; none of them
  * shuffles. Cross-engine determinism: hashing goes through md5 (identical
  * in every engine) rather than Spark-internal hash functions.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(c, " ")

  /** Character n-gram shingles (positions 1..len-n+1); empty array below n. */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - lit(n - 1)), i => c.substr(i, lit(n))))
      .otherwise(array())

  /** Word n-grams joined with '_'; empty array below n words. */
  def wordNgrams(c: Column, n: Int): Column = {
    val ts = tokens(c)
    when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - lit(n - 1)),
        i => concat_ws("_", (0 until n).map(k => element_at(ts, i + lit(k))): _*)))
      .otherwise(array())
  }

  /** One MinHash value: min over shingles of md5(seed|shingle).
    * Per-row compute only — signatures of a 100 TB corpus need zero
    * shuffles (contrast: explode+groupBy would shuffle every shingle).
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, sh => md5(concat(lit(s"$seed|"), sh))))

  /** k-element MinHash signature as an array column. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(minhash(shingles, _)): _*)

  /** LSH band keys: md5 over `rowsPerBand` consecutive signature values.
    * Docs sharing any band key are near-dup candidates. */
  def lshBands(sig: Column, k: Int, rowsPerBand: Int): Column =
    array((0 until k / rowsPerBand).map { b =>
      md5(concat_ws("#", (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** Jaccard similarity of two (distinct-element) arrays — exact in both
    * engines: integer sizes, one IEEE division. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** A 60-bit integer hash from the md5 hex prefix — portable across
    * engines (DuckDB: `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("bigint")

  /** SimHash over 60-bit token hashes: bit b of the result is set iff
    * tokens with bit b set are the majority. Pure per-row fold —
    * no shuffle, no UDF. (SURVEY §2.D `dedup_simhash`.)
    */
  def simhash60(tokenHashes: Column): Column = {
    val n = size(tokenHashes)
    val bits = (0 until 60).map { b =>
      val cnt = aggregate(tokenHashes, lit(0L), (acc, h) => acc + (shiftright(h, b).bitwiseAND(lit(1L))))
      when(cnt * 2 >= n, lit(1L) * lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (popcount of xor). */
  def hamming60(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    (0 until 60).map(bit => shiftright(x, bit).bitwiseAND(lit(1L))).reduce(_ + _)
  }

  /** Rolling polynomial fingerprint over words, mod 2^31-1:
    * h = fold(h*131 + (ascii(first)*31 + len(word))). Order-sensitive
    * document fingerprint; matches DuckDB `list_reduce` oracle. */
  def fingerprint(c: Column): Column =
    aggregate(
      transform(tokens(c), w => (ascii(substring(w, 1, 1)) * 31 + length(w)).cast("bigint")),
      lit(0L),
      (acc, w) => (acc * 131 + w) % 2147483647L)

  /** Occurrences of any of `words` among the tokens. */
  def tokenCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(words.map(lit(_)): _*)))

  /** BPE-ish subword count: letter runs, digit runs, or single symbols. */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
}

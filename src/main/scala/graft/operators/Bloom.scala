package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter — the CONSTANT-SIZE membership guard for
  * benchmark decontamination at corpus scale.
  *
  * [[Decontaminate.overlap]] broadcasts the benchmark's exact gram-hash
  * set; fine while the eval suite stays a few million grams. When the
  * held-out set itself is large (a full held-out shard, a dedup
  * blocklist, yesterday's corpus), the exact set no longer broadcasts —
  * but an m-bit Bloom filter of it is a FIXED 8 KiB whatever the set
  * size, and membership keeps the one property decontamination needs:
  * NO FALSE NEGATIVES. A bit collision can only send a clean gram into
  * the (cheap, exact) confirm join — never lets a contaminated gram
  * slip through. The filter is pure performance; the answer stays exact.
  *
  * Construction (m = 2^16 bits in 63-bit words, k = 4 probes):
  *  - 60-bit gram hash = first 15 md5 hex chars (the [[Hll]] trick);
  *  - probe positions via Kirsch–Mitzenmacher double hashing:
  *    p_i = (h1 + i·h2) mod m with h1 = low 30 bits, h2 = high 30 bits
  *    forced odd (coprime to the power-of-two m ⇒ full cycle) — k
  *    positions from ONE md5, all integer arithmetic, so the whole
  *    bitset replays exactly in any engine;
  *  - words hold 63 bits, not 64: the max shift is 62, inside BIGINT
  *    range for every SQL engine (a 1<<63 overflows or raises
  *    engine-dependently — same reason [[Hll]] caps its shifts at 51);
  *  - the bitset is built by a `bit_or` aggregation over (word, bit)
  *    pairs — commutative, so partition-order-free and MERGEABLE (union
  *    of two filters = bit_or of their words);
  *  - the ≤1041 word rows densify into ONE broadcast row (missing words
  *    are 0), the same packed-row shape as [[Decontaminate]]'s exact set.
  *
  * Plan shape at 100 TB: the corpus is probed MAP-SIDE against the
  * broadcast row (k shifts + ANDs per gram, codegen'd); only grams whose
  * k bits are all set enter the exact confirm join. The only Exchange
  * stays the final per-doc hit count — the corpus itself never shuffles.
  */
object Bloom {
  val Bits = 65536                // m: power of two (odd-step full cycle)
  val WordBits = 63               // max shift 62 — BIGINT-safe everywhere
  val WordCount: Int = (Bits + WordBits - 1) / WordBits // 1041 → ~8 KiB
  val K = 4                       // probes per key; FP ≈ (n·k/m)^k

  /** 60-bit md5 integer of the key's string form (null-hostile: a null
    * key in a membership filter is an upstream modeling bug). */
  private def hash60(key: Column): Column =
    coalesce(
      when(key.isNull,
        raise_error(lit("Bloom: null key — filter or impute nulls before building/probing"))),
      conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("bigint"))

  /** The i-th probe's absolute bit position in [0, Bits). */
  private def position(h: Column, i: Column): Column = {
    val h1 = h.bitwiseAND(lit((1L << 30) - 1))
    val h2 = shiftright(h, 30).bitwiseOR(lit(1L)) // odd step: full-cycle mod 2^16
    (h1 + i * h2) % lit(Bits.toLong)
  }

  /** Mergeable bitset state: ≤ [[WordCount]] (word, bits) rows. The only
    * shuffle carries word-indexed longs — constant in the key-set size. */
  def wordRows(keys: DataFrame, keyCol: String): DataFrame = {
    val h = hash60(col(keyCol))
    keys
      .select(explode(transform(sequence(lit(0), lit(K - 1)),
        i => position(h, i))).as("pos"))
      .groupBy((col("pos") / WordBits).cast("bigint").as("word"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("pos") % WordBits).cast("int"))).as("bits"))
  }

  /** The filter densified into ONE row: `words` = array of [[WordCount]]
    * longs (absent words 0). Broadcast this and probe map-side.
    * Empty-input guard fused like [[Decontaminate.semanticOverlap]]'s: an
    * empty filter would pass NOTHING through the prefilter — silently
    * declaring a dirty corpus clean, the one wrong direction. */
  def build(keys: DataFrame, keyCol: String): DataFrame =
    wordRows(keys, keyCol)
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("wm"))
      .select(transform(sequence(lit(0), lit(WordCount - 1)), w =>
        coalesce(
          when(size(map_keys(col("wm"))) === 0,
            raise_error(lit("Bloom: empty key set — an empty filter passes everything"))),
          element_at(col("wm"), w.cast("bigint")), lit(0L))).as("words"))

  /** Membership probe of `key` against the packed `words` array column:
    * true iff all K probed bits are set. Pure column expression —
    * compose into any map-side filter. */
  def mightContain(key: Column, words: Column): Column = {
    val h = hash60(key)
    forall(sequence(lit(0), lit(K - 1)), i => {
      val p = position(h, i)
      call_function("shiftright", element_at(words, ((p / WordBits) + 1).cast("int")),
        (p % WordBits).cast("int")).bitwiseAND(lit(1L)) === 1L
    })
  }

  /** Bloom-accelerated [[Decontaminate.overlap]]: EXACTLY the same
    * answer — per-document count of distinct n-gram hashes shared with
    * `benchmark` — with the corpus gram stream cut down map-side by the
    * 8 KiB filter before the exact confirm join ever sees it. The
    * confirm join's build side is the benchmark gram set as before, but
    * its probe side is now only the filter's survivors (true hits + the
    * ~(nk/m)^k false-positive trickle), not every corpus gram.
    */
  def prefilteredOverlap(docs: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, n: Int): DataFrame = {
    import graft.functions.TextFunctions.{hash31, wordNgrams}
    def grams(df: DataFrame) = df
      .select(col(idCol),
        explode(array_distinct(transform(wordNgrams(col(textCol), n), hash31(_)))).as("gh"))
    val benchGrams = grams(benchmark).select("gh").distinct()
    val filter = broadcast(build(benchGrams, "gh"))
    val exact = broadcast(benchGrams)
    grams(docs)
      .crossJoin(filter)
      .filter(mightContain(col("gh"), col("words")))
      .drop("words")
      .join(exact, "gh")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("bigint").as("n_hit_grams"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter — the compressed membership guard for
  * benchmark decontamination at corpus scale.
  *
  * [[Decontaminate.overlap]] broadcasts the benchmark's exact gram-hash
  * set; fine while the eval suite stays a few million grams. When the
  * held-out set itself is large (a full held-out shard, a dedup
  * blocklist, yesterday's corpus), the exact set strains the broadcast —
  * an m-bit Bloom filter at ~10 bits/key is ~6% of the exact 8-byte-hash
  * set (100M grams: 800 MB exact vs 128 MB filter) with a constant
  * k-probe cost, and membership keeps the one property decontamination
  * needs:
  * NO FALSE NEGATIVES. A bit collision can only send a clean gram into
  * the (cheap, exact) confirm join — never lets a contaminated gram
  * slip through. The filter is pure performance; the answer stays exact.
  *
  * SIZE the filter to the key set: a Bloom filter's FP rate is a
  * function of the LOAD n·k/m — m is a parameter (default 2^16), not a
  * constant. Past load ~1 the filter saturates (FP → 1): still correct
  * (the confirm join keeps the answer exact) but pure overhead. Pick
  * the smallest power of two with ≥ ~10 bits per expected distinct key
  * (FP ≈ 1.2% at k = 4); when the key count is unknown, one cheap
  * upper bound is the input row count.
  *
  * Construction (m-bit bitset in 63-bit words, k = 4 probes):
  *  - every filter instance is keyed by a 60-bit PREHASH column. Raw
  *    keys get [[hashed]] (md5, the [[Hll]] trick); keys that are
  *    ALREADY uniform hashes — the decontamination grams are md5-derived
  *    31-bit ints — get [[widen31]], ONE integer multiply. The md5 form
  *    costs a per-row md5 on the probe side, which Catalyst happily
  *    re-inlines through projection pushdown; the probe path must stay
  *    pure integer ops, so prefer widen31 whenever the key is a hash;
  *  - probe positions via Kirsch–Mitzenmacher double hashing:
  *    p_i = (h1 + i·h2) mod m with h1 = low 30 bits, h2 = high 30 bits
  *    forced odd (coprime to the power-of-two m ⇒ full cycle) — k
  *    positions from one prehash, all integer arithmetic, so the whole
  *    bitset replays exactly in any engine;
  *  - the probe is STATICALLY EXPANDED (k literal tests AND-chained, no
  *    higher-order-function lambdas): lambdas evaluate interpreted and
  *    re-evaluate the captured hash per element — the shape that made
  *    the first cut of this operator 4× slower than the exact path;
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
  val DefaultBits = 65536         // default m — size to ~10·n_keys for real sets
  val WordBits = 63               // max shift 62 — BIGINT-safe everywhere
  val K = 4                       // probes per key; FP ≈ (1 − e^(−n·k/m))^k

  /** m must be a power of two ≤ 2^30: the odd KM step is coprime to a
    * power-of-two cycle, and h1 carries 30 hash bits. */
  private def checkBits(bits: Int): Unit =
    require(bits >= 64 && bits <= (1 << 30) && Integer.bitCount(bits) == 1,
      s"Bloom: bits=$bits must be a power of two in [64, 2^30]")

  def wordCount(bits: Int): Int = (bits + WordBits - 1) / WordBits
  /** widen31's multiplier: an odd ~2^29 prime — (gh·c) stays under 2^60
    * (no BIGINT overflow for 31-bit inputs), low bits are a bijection of
    * gh mod 2^30, high bits are Fibonacci-style mixed. */
  val Widen31Mult = 536870923L

  private def nullGuard(key: Column, pre: Column): Column =
    coalesce(
      when(key.isNull,
        raise_error(lit("Bloom: null key — filter or impute nulls before building/probing"))),
      pre)

  /** 60-bit prehash for ARBITRARY keys: one md5 on the string form. */
  def hashed(key: Column): Column =
    nullGuard(key,
      conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("bigint"))

  /** 60-bit prehash for keys that are ALREADY uniform 31-bit hashes
    * (e.g. `hash31` gram hashes): one integer multiply — the probe side
    * stays md5-free however Catalyst rewrites the plan. */
  def widen31(gh: Column): Column =
    nullGuard(gh, gh * lit(Widen31Mult))

  /** The i-th probe's absolute bit position in [0, Bits). `i` is a
    * compile-time literal — positions are statically expanded. */
  private def position(h: Column, i: Int, bits: Int): Column = {
    val h1 = h.bitwiseAND(lit((1L << 30) - 1))
    val h2 = shiftright(h, 30).bitwiseOR(lit(1L)) // odd step: full-cycle mod m
    (h1 + lit(i.toLong) * h2) % lit(bits.toLong)
  }

  /** Mergeable bitset state from a PREHASH column: ≤ [[WordCount]]
    * (word, bits) rows. The only shuffle carries word-indexed longs —
    * constant in the key-set size. */
  def wordRowsHashed(pre: DataFrame, hCol: String,
                     bits: Int = DefaultBits): DataFrame = {
    checkBits(bits)
    pre
      .select(explode(array((0 until K).map(i => position(col(hCol), i, bits)): _*)).as("pos"))
      .groupBy((col("pos") / WordBits).cast("bigint").as("word"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("pos") % WordBits).cast("int"))).as("bits"))
  }

  /** [[wordRowsHashed]] over raw (md5-prehashed) keys. */
  def wordRows(keys: DataFrame, keyCol: String,
               bits: Int = DefaultBits): DataFrame =
    wordRowsHashed(keys.select(hashed(col(keyCol)).as("__h")), "__h", bits)

  private def densify(rows: DataFrame, bits: Int): DataFrame =
    rows
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("wm"))
      .select(transform(sequence(lit(0), lit(wordCount(bits) - 1)), w =>
        coalesce(
          when(size(map_keys(col("wm"))) === 0,
            raise_error(lit("Bloom: empty key set — an empty filter passes everything"))),
          element_at(col("wm"), w.cast("bigint")), lit(0L))).as("words"))

  /** The filter densified into ONE row: `words` = array of [[WordCount]]
    * longs (absent words 0). Broadcast this and probe map-side.
    * Empty-input guard fused like [[Decontaminate.semanticOverlap]]'s: an
    * empty filter would pass NOTHING through the prefilter — silently
    * declaring a dirty corpus clean, the one wrong direction. */
  def build(keys: DataFrame, keyCol: String,
            bits: Int = DefaultBits): DataFrame =
    densify(wordRows(keys, keyCol, bits), bits)

  /** [[build]] from a PREHASH column ([[widen31]]/[[hashed]] output). */
  def buildHashed(pre: DataFrame, hCol: String,
                  bits: Int = DefaultBits): DataFrame =
    densify(wordRowsHashed(pre, hCol, bits), bits)

  /** Membership probe of a raw `key` against the packed `words` array
    * column (md5 path — for hash-typed keys prehash with [[widen31]]
    * and use [[mightContainHashed]]). */
  def mightContain(key: Column, words: Column,
                   bits: Int = DefaultBits): Column =
    mightContainHashed(hashed(key), words, bits)

  /** Probe from a prehash column: true iff all K probed bits are set.
    * Statically expanded AND chain of integer shifts/masks — fully
    * codegen'd, no lambdas, cheap even when Catalyst re-inlines the
    * prehash expression K times. */
  def mightContainHashed(h: Column, words: Column,
                         bits: Int = DefaultBits): Column = {
    checkBits(bits)
    (0 until K).map { i =>
      val p = position(h, i, bits)
      call_function("shiftright", element_at(words, ((p / WordBits) + 1).cast("int")),
        (p % WordBits).cast("int")).bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Bloom-accelerated [[Decontaminate.overlap]]: EXACTLY the same
    * answer — per-document count of distinct n-gram hashes shared with
    * `benchmark` — with the corpus gram stream cut down map-side by the
    * filter before the exact confirm join ever sees it. The confirm
    * join's build side is the benchmark gram set as before, but its
    * probe side is now only the filter's survivors (true hits + the
    * FP trickle), not every corpus gram. The gram hashes are already
    * uniform, so the filter runs on [[widen31]] — the whole probe is
    * integer ops. Size `bits` to ~10× the expected distinct benchmark
    * grams (see the object doc — an undersized filter saturates into
    * pure overhead).
    */
  def prefilteredOverlap(docs: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, n: Int,
                         bits: Int = DefaultBits): DataFrame = {
    import graft.functions.TextFunctions.{hash31, wordNgrams}
    def grams(df: DataFrame) = df
      .select(col(idCol),
        explode(array_distinct(transform(wordNgrams(col(textCol), n), hash31(_)))).as("gh"))
    val benchGrams = grams(benchmark).select("gh").distinct()
    val filter = broadcast(buildHashed(
      benchGrams.select(widen31(col("gh")).as("__h")), "__h", bits))
    val exact = broadcast(benchGrams)
    grams(docs)
      .crossJoin(filter)
      .filter(mightContainHashed(widen31(col("gh")), col("words"), bits))
      .drop("words")
      .join(exact, "gh")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("bigint").as("n_hit_grams"))
  }
}

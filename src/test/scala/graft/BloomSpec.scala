package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Decontaminate}

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def keysOf(xs: Seq[Long]) = xs.toDF("k")

  test("mightContain has NO false negatives: every inserted key probes true") {
    val keys = (0L until 500L).map(_ * 7919L)
    val filter = broadcast(Bloom.build(keysOf(keys), "k"))
    val misses = keysOf(keys).crossJoin(filter)
      .filter(!Bloom.mightContain($"k", $"words")).count()
    assert(misses === 0, "a Bloom filter must never miss an inserted key")
  }

  test("false-positive rate on a disjoint probe set stays near (nk/m)^k") {
    val inserted = (0L until 1000L).map(_ * 2L)       // evens
    val probes = (0L until 4000L).map(_ * 2L + 1L)    // odds: disjoint
    val filter = broadcast(Bloom.build(keysOf(inserted), "k"))
    val fp = keysOf(probes).crossJoin(filter)
      .filter(Bloom.mightContain($"k", $"words")).count()
    // n=1000, k=4, m=65536: load nk/m ~= 0.061, FP ~= 0.061^4 ~= 1.4e-5;
    // generous x100 headroom still catches a broken probe (rate ~1)
    assert(fp <= 6, s"false-positive count $fp far above the design rate")
  }

  test("widen31 prehash path: no false negatives and a sane FP rate for hash-typed keys") {
    // keys shaped like hash31 output: uniform-ish 31-bit ints
    val ins = (0 until 1000).map(i => (i * 2654435761L) % 2147483647L)
    val probes = (0 until 4000).map(i => (i * 104729L + 7) % 2147483647L)
      .filterNot(ins.toSet)
    def pre(xs: Seq[Long]) = xs.toDF("gh")
      .select(Bloom.widen31($"gh").as("h"))
    val filter = broadcast(Bloom.buildHashed(pre(ins), "h"))
    val misses = pre(ins).crossJoin(filter)
      .filter(!Bloom.mightContainHashed($"h", $"words")).count()
    assert(misses === 0, "widen31 path must never miss an inserted key")
    val fp = pre(probes).crossJoin(filter)
      .filter(Bloom.mightContainHashed($"h", $"words")).count()
    assert(fp <= 10, s"widen31 FP count $fp far above the design rate")
  }

  test("sizing matters: a saturated default filter passes ~everything, a 10-bits/key one stays selective") {
    // 50k keys: load n*k/m = 3.05 on the 2^16 default (FP ~ 0.8), vs
    // 0.19 on a 2^20 filter (FP ~ 1e-3) — the object doc's sizing rule
    val ins = (0L until 50000L).map(i => (i * 2654435761L) % 2147483647L)
    val probes = (0L until 2000L).map(i => (i * 104729L + 13) % 2147483647L)
      .filterNot(ins.toSet)
    def pre(xs: Seq[Long]) = xs.toDF("gh").select(Bloom.widen31($"gh").as("h"))
    def fpCount(bits: Int): Long = {
      val f = broadcast(Bloom.buildHashed(pre(ins), "h", bits))
      pre(probes).crossJoin(f)
        .filter(Bloom.mightContainHashed($"h", $"words", bits)).count()
    }
    val saturated = fpCount(1 << 16)
    val sized = fpCount(1 << 20)
    assert(saturated > probes.length / 2,
      s"expected the overloaded default to saturate, FP=$saturated/${probes.length}")
    assert(sized <= 20, s"sized filter must stay selective, FP=$sized/${probes.length}")
  }

  test("bits must be a power of two; build and probe reject bad sizes") {
    val ex = intercept[IllegalArgumentException] {
      Bloom.build(keysOf(Seq(1L)), "k", bits = 1000)
    }
    assert(ex.getMessage.contains("power of two"))
  }

  test("bitset is partition-invariant and mergeable by bit_or of word rows") {
    val a = (0L until 300L).map(_ * 3L)
    val b = (0L until 300L).map(_ * 5L)
    val whole = Bloom.wordRows(keysOf(a ++ b), "k")
      .as[(Long, Long)].collect().toMap
    val repart = Bloom.wordRows(keysOf(a ++ b).repartition(13), "k")
      .as[(Long, Long)].collect().toMap
    assert(whole === repart, "bit_or aggregation must not depend on partitioning")
    val merged = Bloom.wordRows(keysOf(a), "k")
      .unionAll(Bloom.wordRows(keysOf(b), "k"))
      .groupBy("word").agg(bit_or($"bits").as("bits"))
      .as[(Long, Long)].collect().toMap
    assert(merged === whole, "filter(A union B) must equal bit_or-merge of the two filters")
  }

  test("build raises on an empty key set instead of passing everything") {
    val ex = intercept[Exception] {
      Bloom.build(keysOf(Seq()), "k").collect()
    }
    assert(ex.getMessage.contains("empty key set"))
  }

  test("null key raises a named error on both build and probe") {
    val nullKeys = Seq[java.lang.Long](1L, null).toDF("k")
    val buildEx = intercept[Exception] { Bloom.build(nullKeys, "k").collect() }
    assert(buildEx.getMessage.contains("null key"))
    val filter = broadcast(Bloom.build(keysOf(Seq(1L)), "k"))
    val probeEx = intercept[Exception] {
      nullKeys.crossJoin(filter).select(Bloom.mightContain($"k", $"words")).collect()
    }
    assert(probeEx.getMessage.contains("null key"))
  }

  test("prefilteredOverlap equals the exact Decontaminate.overlap answer") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox naps all day long"),
      (4L, "completely different text with no shared grams here"),
      (5L, "five dozen liquor jugs of cold pressed juice")
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id".isin(1L, 2L))
    val exact = Decontaminate.overlap(docs, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    val bloomed = Bloom.prefilteredOverlap(docs, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(bloomed === exact, "the Bloom layer must be answer-invisible")
    assert(exact.contains(3L) && exact.contains(5L), "fixture must exercise real overlap")
    assert(!exact.contains(4L), "fixture must exercise a clean doc")
  }

  test("prefilter keeps the probe map-side: no Exchange touches the corpus grams") {
    val docs = (1L to 50L).map(i => (i, s"w$i x$i y$i z$i common tail grams")).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" <= 3)
    val plan = Bloom.prefilteredOverlap(docs, bench, "text", "doc_id", n = 3)
      .queryExecution.executedPlan.toString
    // the benchmark side may shuffle its own tiny gram/word aggregations,
    // but the CORPUS side must reach the final per-doc count through
    // broadcast joins only: exactly one Exchange keyed on doc_id, and no
    // shuffle join anywhere
    val corpusExchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).length
    assert(corpusExchanges === 1,
      s"expected only the final per-doc count Exchange on the corpus side, got $corpusExchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join allowed")
    assert(plan.contains("BroadcastHashJoin"),
      "confirm join must broadcast the benchmark side")
  }
}

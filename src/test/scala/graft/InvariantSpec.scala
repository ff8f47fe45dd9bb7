package graft

import org.apache.spark.sql.functions._
import graft.etl.{Clean, Normalize}
import graft.functions.TextFunctions._
import graft.operators.{AsofJoin, RangeJoin, Skew}
import scala.util.Random

/** Randomized invariants over generated data (fixed seeds — deterministic
  * runs). Each operator is checked against its mathematical contract or a
  * brute-force reference, on shapes the curated specs don't cover:
  * duplicate timestamps, empty groups, single-element sets, key skew. */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private def rng(seed: Int) = new Random(seed)

  test("upsert is idempotent and keyed-left-total") {
    val r = rng(1)
    val base = Seq.tabulate(200)(i => (r.nextInt(50).toLong, r.nextInt(100))).toDF("k", "v")
    val upd = Seq.tabulate(80)(i => (r.nextInt(60).toLong, 1000 + r.nextInt(100))).toDF("k", "v")
    val u1 = Normalize.upsert(Clean.dedupByKey(base, Seq("k"), Seq($"v")),
      Clean.dedupByKey(upd, Seq("k"), Seq($"v")), "k").cache()
    val u2 = Normalize.upsert(u1, Clean.dedupByKey(upd, Seq("k"), Seq($"v")), "k")
    assert(u1.exceptAll(u2).isEmpty && u2.exceptAll(u1).isEmpty, "idempotent")
    assert(u1.groupBy("k").count().filter($"count" > 1).isEmpty, "unique keys")
  }

  test("saltedAgg equals plain agg on skewed random data") {
    val r = rng(2)
    // 90% of rows on one hot key
    val rows = Seq.tabulate(5000) { i =>
      val k = if (r.nextInt(10) < 9) "hot" else s"k${r.nextInt(20)}"
      (k, r.nextInt(1000).toLong)
    }
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq("k"), salt = 8, aggs = Seq(("sv", "sum", $"v")))
      .select($"k", $"n_rows", $"sv").as[(String, Long, Long)].collect().toSet
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin equals plain join on skewed keys") {
    val r = rng(8)
    val big = Seq.tabulate(5000) { i =>
      (if (r.nextInt(10) < 9) "hot" else s"k${r.nextInt(20)}", i.toLong)
    }.toDF("k", "v")
    val small = ("hot" +: (0 until 20).map("k" + _)).map(k => (k, k.length)).toDF("k", "w")
    val salted = graft.operators.Skew.saltedJoin(big, small, "k", salt = 8)
      .select($"k", $"v", $"w").as[(String, Long, Int)].collect().toSet
    val plain = big.join(small, Seq("k"))
      .select($"k", $"v", $"w").as[(String, Long, Int)].collect().toSet
    assert(salted === plain)
  }

  test("asof equals brute force on random series with duplicate left times") {
    val r = rng(3)
    val left = Seq.tabulate(300)(i => (i.toLong, (r.nextInt(3) + 1).toString, r.nextInt(100).toLong))
    val rightRaw = Seq.tabulate(150)(i => ((r.nextInt(3) + 1).toString, r.nextInt(100).toLong, i.toLong))
    // contract: right unique per (key, t)
    val right = rightRaw.groupBy(x => (x._1, x._2)).map(_._2.minBy(_._3)).toSeq
    val got = AsofJoin.asof(left.toDF("id", "k", "t"), right.toDF("k", "t", "p"), "k", "t", Seq("p"))
      .select($"id", $"p").as[(Long, Option[Long])].collect().toMap
    val expected = left.map { case (id, k, t) =>
      val cand = right.filter(x => x._1 == k && x._2 <= t)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(x => (x._2, -x._3))._3))
    }.toMap
    assert(got === expected)
  }

  test("broadcast asof equals the shuffle asof on random series, with no left-side exchange") {
    val r = rng(12)
    val left = Seq.tabulate(300)(i => (i.toLong, (r.nextInt(3) + 1).toString, r.nextInt(100).toLong))
      .toDF("id", "k", "t")
    val right = Seq.tabulate(150)(i => ((r.nextInt(3) + 1).toString, r.nextInt(100).toLong, i.toLong))
      .groupBy(x => (x._1, x._2)).map(_._2.minBy(_._3)).toSeq // unique per (key, t)
      .toDF("k", "t", "p")
    val viaShuffle = AsofJoin.asof(left, right, "k", "t", Seq("p"))
      .select($"id", $"p").as[(Long, Option[Long])].collect().toMap
    val viaBroadcast = AsofJoin.asofBroadcast(left, right, "k", "t", Seq("p"))
    assert(viaBroadcast.select($"id", $"p").as[(Long, Option[Long])].collect().toMap
      === viaShuffle)
    viaBroadcast.count()
    val plan = viaBroadcast.queryExecution.executedPlan.toString
    // only the packed right side may exchange (its groupBy); the big left
    // side must reach the join shuffle-free
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("range join equals brute force on random event streams") {
    val r = rng(4)
    val left = Seq.tabulate(200)(i => (i.toLong, (r.nextInt(4) + 1).toLong, r.nextInt(1000).toLong))
      .toDF("id", "k", "t")
    val right = Seq.tabulate(400)(i => ((r.nextInt(4) + 1).toLong, r.nextInt(1000).toLong))
      .toDF("k", "t")
    val got = RangeJoin.countInRange(left, right, "k", "t", "id", lo = 0L, hi = 50L)
      .select($"id", $"n_matches").as[(Long, Long)].collect().toMap
    val rrows = right.as[(Long, Long)].collect()
    val lrows = left.as[(Long, Long, Long)].collect()
    val expected = lrows.map { case (id, k, t) =>
      id -> rrows.count(x => x._1 == k && x._2 > t && x._2 <= t + 50).toLong
    }.toMap
    assert(got === expected)
  }

  test("range join is exact for negative and epoch-nano-magnitude timestamps") {
    val r = rng(10)
    val base = 1755000000000000000L // epoch nanos: beyond double's 2^53 exactness
    val ts = Seq.tabulate(200)(i => base + r.nextInt(2000).toLong - 1000L) ++
      Seq.tabulate(100)(i => r.nextInt(2000).toLong - 1000L) // negatives near zero
    val left = ts.zipWithIndex.map { case (t, i) => (i.toLong, 1L, t) }.toDF("id", "k", "t")
    val right = ts.map(t => (1L, t + r.nextInt(100) - 50)).toDF("k", "t")
    val got = RangeJoin.countInRange(left, right, "k", "t", "id", lo = 0L, hi = 40L)
      .select($"id", $"n_matches").as[(Long, Long)].collect().toMap
    val rrows = right.as[(Long, Long)].collect()
    val expected = left.as[(Long, Long, Long)].collect().map { case (id, _, t) =>
      id -> rrows.count(x => x._2 > t && x._2 <= t + 40).toLong
    }.toMap
    assert(got === expected)
  }

  test("jaccard/normalize/fingerprint algebraic properties on random text") {
    val r = rng(5)
    val words = Seq("alpha", "beta", "Gamma!", "DELTA", "x9", ",", "the")
    val texts = Seq.tabulate(60)(_ => Seq.fill(r.nextInt(20) + 1)(words(r.nextInt(words.size))).mkString(" "))
    val df = texts.toDF("t").cache()
    // jaccard(x, x) == 1 for non-empty; normalize idempotent; fingerprint stable
    val bad = df.select(
        jaccard(array_distinct(tokens($"t")), array_distinct(tokens($"t"))).as("j"),
        (normalizeText(normalizeText($"t")) === normalizeText($"t")).as("idem"),
        (fingerprint($"t") === fingerprint($"t")).as("stable"))
      .filter($"j" =!= 1.0 || !$"idem" || !$"stable")
    assert(bad.isEmpty)
  }

  test("connected components equal brute-force union-find on random graphs") {
    val r = rng(7)
    val edges = Seq.tabulate(60)(_ => (r.nextInt(40).toLong, r.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val got = graft.operators.Components
      .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val root = find(p); parent(x) = root; root }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min root survives
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
    assert(got === expected)
  }

  test("BPE-costed packing conserves the corpus token count; budget overshoots by at most one doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.SparkEntry.queries("ta_bpe_pack")(spark, sf)
    val total = out.agg(sum($"sum_tokens")).as[Long].head()
    val direct = docs
      .select(graft.functions.Bpe.bpeTokenCount($"text", graft.functions.Bpe.LargeMerges).as("tk"))
      .agg(sum($"tk")).as[Long].head()
    assert(total === direct, "every doc lands in exactly one pack")
    // a pack closes when the cumsum crosses the budget, so it may
    // overshoot by less than its final doc — never more
    val maxDoc = docs
      .select(graft.functions.Bpe.bpeTokenCount($"text", graft.functions.Bpe.LargeMerges).as("tk"))
      .agg(max($"tk")).as[Long].head()
    assert(out.filter($"sum_tokens" >= lit(6000L) + lit(maxDoc)).count() === 0)
    assert(out.count() > docs.select($"lang").distinct().count(),
      "fixture must actually split languages into multiple packs")
  }

  test("packing matches a sequential greedy fill per group") {
    val r = rng(9)
    val rows = Seq.tabulate(400)(i => (s"g${r.nextInt(3)}", i.toLong, (r.nextInt(900) + 1).toLong))
    val got = graft.etl.Packing
      .withPackId(rows.toDF("g", "id", "tk"), "tk", budget = 1000, Seq("g"), "id")
      .select($"g", $"id", $"pack_id").as[(String, Long, Long)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    // no doc here exceeds the budget, so raw cumsum packs are already dense
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      var cum = 0L
      rs.sortBy(_._2).map { case (_, id, tk) =>
        val pack = cum / 1000; cum += tk; (g, id) -> pack
      }
    }
    assert(got === expected)
  }

  test("packing with oversized docs keeps pack ids contiguous and monotone") {
    // docs 3 and 7 blow way past the budget — the round-2 gap: their cumsum
    // jump used to leave holes in the pack-id sequence
    val rows = Seq(
      ("g", 1L, 400L), ("g", 2L, 400L), ("g", 3L, 5000L), ("g", 4L, 400L),
      ("g", 5L, 400L), ("g", 6L, 400L), ("g", 7L, 9000L), ("g", 8L, 400L))
    val got = graft.etl.Packing
      .withPackId(rows.toDF("g", "id", "tk"), "tk", budget = 1000, Seq("g"), "id")
      .select($"id", $"pack_id").as[(Long, Long)].collect().sortBy(_._1)
    val packs = got.map(_._2)
    assert(packs === packs.sorted, "pack ids must be monotone in doc order")
    assert(packs.distinct === (0L until packs.distinct.length).toArray.toSeq,
      s"pack ids must be dense 0..P-1, got ${packs.mkString(",")}")
    // an oversized doc never pushes a LATER doc's id past the dense sequence
    assert(packs.max < rows.length)
  }

  test("hash sampling is stable, stratified-close, and split labels partition") {
    val df = spark.range(0, 5000).select($"id")
    val s1 = graft.etl.Sampling.sampleByHash(df, "id", 10).as[Long].collect().toSet
    val s2 = graft.etl.Sampling.sampleByHash(df, "id", 10).as[Long].collect().toSet
    assert(s1 === s2, "same keys kept on rerun")
    assert(math.abs(s1.size - 500) < 100, s"~10% expected, got ${s1.size}")
    val splits = df.select(graft.etl.Sampling.splitLabel($"id").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(splits.keySet === Set("train", "validation", "test"))
    assert(splits.values.sum === 5000L)
    assert(splits("train") > splits("validation") && splits("train") > splits("test"))
  }

  test("nsToUs is exact integer division, including composite-expression arguments") {
    val ns = 1755000000123456789L // > 2^53: double division would corrupt
    val got = Seq(ns).toDF("ts")
      .select(graft.streaming.Events.nsToUs($"ts" + lit(111)).as("us"),
        graft.streaming.Events.nsToUs($"ts").as("us0"))
      .as[(Long, Long)].head()
    assert(got === ((ns + 111) / 1000, ns / 1000))
  }

  test("LSH recall vs brute-force jaccard pairs at tau=0.8 is >= 0.9") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val m = graft.operators.Dedup.minhashed(docs, "text", "doc_id")
      .filter(size($"hs") > 0)
      .select($"doc_id", $"hs", size($"hs").as("n")).cache()
    val a = m.select($"doc_id".as("id_a"), $"hs".as("ha"), $"n".as("na"))
    val b = m.select($"doc_id".as("id_b"), $"hs".as("hb"), $"n".as("nb"))
    // brute-force ground truth (size-ratio prune is sound at tau=0.8)
    val brute = a.crossJoin(b)
      .filter($"id_a" < $"id_b" && $"na" >= $"nb" * 0.8 && $"nb" >= $"na" * 0.8)
      .filter(jaccard($"ha", $"hb") >= 0.8)
      .count()
    // LSH output is exact-verified, so it is a subset of brute — recall is
    // just the count ratio
    val lsh = graft.operators.Dedup.minhashNearDups(docs, "text", "doc_id", 0.8).count()
    assert(brute > 0, "ground truth must be non-empty for the recall bound to mean anything")
    assert(lsh <= brute)
    assert(lsh.toDouble / brute >= 0.9, s"LSH recall $lsh/$brute below 0.9")
  }

  test("LSH band cap sheds a degenerate bucket but keeps ordinary near-dup pairs") {
    val boiler = Seq.tabulate(80)(i => s"same boilerplate text repeated for every doc $i")
      .map(_.split(" ").dropRight(1).mkString(" ")) // identical after dropping the counter
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val near = base + "extra"
    val docs = (boiler ++ Seq(base, near)).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val capped = graft.operators.Dedup
      .minhashNearDups(docs, "text", "doc_id", 0.8, maxBandBucket = 40)
      .as[(Long, Long, Double)].collect()
    // the 80-doc identical bucket (3160 pairs) is shed...
    assert(capped.length < 100, s"degenerate mass must be capped, got ${capped.length}")
    // ...but the ordinary near-dup pair survives (its bands are not hot)
    assert(capped.exists(p => p._1 == 80L && p._2 == 81L), "real near-dup pair lost by cap")
  }

  test("chunk windows cover every token with the declared overlap") {
    val r = rng(11)
    val texts = Seq.tabulate(40)(i =>
      Seq.fill(r.nextInt(80) + 1)(s"w${r.nextInt(30)}").mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.etl.Chunking.chunkWindows(df, "text", "doc_id", size = 32, stride = 24)
      .select($"doc_id", $"chunk_idx", $"n_tokens").as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val n = t.split(" ").length
      val chunks = got(i.toLong)
      assert(chunks.length === (n - 1) / 24 + 1, s"doc $i: wrong window count for n=$n")
      chunks.foreach { case (_, idx, tk) =>
        assert(tk === math.min(32, n - idx * 24), s"doc $i chunk $idx wrong size")
      }
      // coverage: windows starting every 24 tokens with size 32 span [0, n)
      val covered = chunks.flatMap(c => (c._2 * 24) until (c._2 * 24 + c._3)).toSet
      assert(covered === (0 until n).toSet)
    }
  }

  test("batched ANN matches the single-query path per query id") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = e.filter($"vec_id" < 8).withColumnRenamed("vec_id", "cid")
    val batch = graft.operators.Similarity
      .ivfSearchBatch(e, "embedding", "vec_id", cents, "cid",
        e.filter($"vec_id" < 3), "vec_id", k = 5, nProbe = 2)
      .select($"q_id", $"vec_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(batch.map(_._1).distinct.sorted === Array(0L, 1L, 2L))
    (0L to 2L).foreach { qid =>
      val single = graft.operators.Similarity
        .ivfSearch(e, "embedding", "vec_id", cents, "cid",
          e.filter($"vec_id" === qid), k = 5, nProbe = 2)
        .as[(Long, Double)].collect().toSeq
      val got = batch.filter(_._1 == qid).sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(got === single, s"query $qid: batch != single")
    }
  }

  test("minhash signature similarity tracks jaccard direction on perturbed docs") {
    val base = Seq.fill(200)(Random.javaRandomToRandom(new java.util.Random(6)).nextInt(50)).map(i => s"w$i").mkString(" ")
    val near = base + " extra token"
    val far = Seq.tabulate(100)(i => s"z$i").mkString(" ")
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("doc_id", "text")
    val sigs = graft.operators.Dedup.minhashed(df, "text", "doc_id")
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sigs(0L), sigs(1L)) > agree(sigs(0L), sigs(2L)))
  }
}

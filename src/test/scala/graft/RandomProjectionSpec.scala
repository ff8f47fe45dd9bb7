package graft

import org.apache.spark.sql.functions._
import graft.operators.RandomProjection

/** Sign-random-projection LSH: soundness (every reported pair verified
  * against brute force), the exact-duplicate guarantee (identical vectors
  * share every band), determinism of the hyperplane masks, and the
  * wrong-width guard. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  private def vecsDf = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    e.select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
  }

  test("hyperplane masks are deterministic and balanced") {
    val m1 = RandomProjection.signMasks(48, dims)
    val m2 = RandomProjection.signMasks(48, dims)
    assert(m1 === m2, "same construction, same masks")
    assert(m1.distinct.size === 48, "48 distinct hyperplanes")
    // md5 parity should be near-balanced: no degenerate all-one plane
    val popcounts = m1.map(java.lang.Long.bitCount)
    assert(popcounts.forall(c => c > 8 && c < 56),
      s"a hyperplane with $popcounts set bits of $dims is degenerate")
  }

  test("every reported pair is a true near-dup (soundness vs brute force)") {
    val pairs = RandomProjection.rpLshPairs(vecsDf, "v", "vec_id", dims, 0.8)
      .as[(Long, Long, Double)].collect()
    val vecs = vecsDf.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x))
      d / (na * nb)
    }
    pairs.foreach { case (a, b, c) =>
      val truth = cos(vecs(a), vecs(b))
      assert(truth >= 0.8, s"pair ($a,$b) reported at $c but true cosine $truth < τ")
      assert(math.abs(truth - c) < 1e-5, s"reported cosine drifted: $c vs $truth")
    }
  }

  test("an exact duplicate is ALWAYS found: identical vectors share every band") {
    // clone 5 vectors under new ids — cos=1 pairs must all surface
    val base = vecsDf.filter($"vec_id" < 5)
    val clones = base.select(($"vec_id" + 1000000L).as("vec_id"), $"v")
    val got = RandomProjection.rpLshPairs(
        base.unionByName(clones), "v", "vec_id", dims, 0.999)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2)).toSet
    val expected = (0L until 5L).map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(got),
      s"missing exact-dup pairs: ${expected -- got}")
  }

  test("a wrong-width vector raises through the fused guard") {
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq.fill(dims)(0.5))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      RandomProjection.rpLshPairs(bad, "v", "vec_id", dims, 0.9).collect()
    }
    assert(msg(e).contains("SRP quantize"), s"got: ${msg(e)}")
  }

  test("NULL vectors and NULL elements raise instead of colliding on band 0") {
    // a NULL dot would turn every `when(dot >= 0, …)` bit into 0, so all
    // malformed vectors would share band_value 0 in every band — an
    // O(m²) candidate join plus silently-missed true near-dups
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    val nullVec = Seq((1L, Option.empty[Seq[Double]]),
      (2L, Some(Seq.fill(dims)(0.5)))).toDF("vec_id", "v")
    val e1 = intercept[Exception] {
      RandomProjection.bandedSignatures(nullVec, "v", "vec_id", dims).collect()
    }
    assert(msg(e1).contains("SRP quantize"), s"got: ${msg(e1)}")
    val nullElem = Seq((1L, Seq.fill(dims)(Option(0.5)).updated(3, None)),
      (2L, Seq.fill(dims)(Option(0.5)))).toDF("vec_id", "v")
    val e2 = intercept[Exception] {
      RandomProjection.bandedSignatures(nullElem, "v", "vec_id", dims).collect()
    }
    assert(msg(e2).contains("SRP quantize"), s"got: ${msg(e2)}")
  }

  test("band signatures are partitioning- and rerun-stable") {
    def sigs(parts: Int) = RandomProjection
      .bandedSignatures(vecsDf.repartition(parts), "v", "vec_id", dims)
      .as[(Long, Int, Long)].collect().toSet
    val one = sigs(1)
    assert(one === sigs(7), "signatures must not depend on partitioning")
    assert(one === sigs(1), "signatures must not depend on the run")
    assert(one.map(_._2) === Set(0, 1, 2), "three bands per vector")
  }

  test("the signature stage never shuffles: one Exchange per side of the band join") {
    // the scan→quantize→48-fold→band projection must be map-side; the
    // first Exchange a signature row meets is the band-bucket join
    val plan = RandomProjection.rpLshPairs(vecsDf, "v", "vec_id", dims, 0.9)
      .queryExecution.optimizedPlan.toString
    // the cartesian never appears: no join without keys
    assert(!plan.contains("Cross"), s"all-pairs cartesian in plan:\n$plan")
  }
}

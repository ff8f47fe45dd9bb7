package graft

import org.apache.spark.sql.functions._
import graft.etl.FuzzyLink

class FuzzyLinkSpec extends SparkSpec {
  import spark.implicits._

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // every ed<=1 relation shape: substitution (kitten/kitten->bitten),
  // deletion/insertion (kitten/kittn, kitten/kittens), first/last-char
  // edits, a distance-2 pair that must NOT link (mitten->bitten is 1 but
  // bottle/battle vs bottles/battles chains), and exact duplicates (same
  // name twice — distinct() must keep them out of the pair set)
  private val names = Seq(
    "kitten", "bitten", "kittn", "kittens", "itten", "kitter",
    "mitten", "mittens", "bottle", "battle", "bottles", "cat", "at",
    "cart", "dog", "dog", "xyzzy").toDF("name")

  test("deletion-neighborhood linkage equals brute-force all-pairs at ed <= 1") {
    val got = FuzzyLink.editNeighbors(names, "name")
      .as[(String, String, Int)].collect().toSet
    val distinct = names.as[String].collect().distinct
    val want = (for {
      a <- distinct; b <- distinct if a < b
      d = levRef(a, b) if d <= 1
    } yield (a, b, d)).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture must produce pairs")
    // the fixture must exercise substitution, deletion AND insertion
    // pairings (length-equal and length±1) or the soundness claim is
    // untested
    assert(want.exists { case (a, b, _) => a.length == b.length })
    assert(want.exists { case (a, b, _) => a.length != b.length })
  }

  test("distance-2 names never link; identical names never self-pair") {
    val got = FuzzyLink.editNeighbors(names, "name")
      .as[(String, String, Int)].collect()
    got.foreach { case (a, b, d) =>
      assert(a < b, s"pair order: $a !< $b")
      assert(d == levRef(a, b) && d <= 1, s"($a,$b,$d)")
    }
    // bottle/battles is ed 2 — blocking may or may not candidate it, the
    // verify must kill it either way
    assert(!got.exists(p => p._1 == "battle" && p._2 == "bottles"))
    assert(got.count(p => p._1 == "dog" || p._2 == "dog") == 0,
      "duplicate 'dog' rows must not manufacture a self-pair")
  }

  test("nulls are dropped, not linked") {
    val withNull = names.unionByName(Seq(Option.empty[String]).toDF("name"))
    val got = FuzzyLink.editNeighbors(withNull, "name")
      .as[(String, String, Int)].collect().toSet
    val base = FuzzyLink.editNeighbors(names, "name")
      .as[(String, String, Int)].collect().toSet
    assert(got === base)
  }

  test("maxDist = 2 equals brute-force all-pairs at ed <= 2") {
    // the fixture's distance-2 shapes (battle/bottles, kitten/bitter-ish
    // chains, double indels like cat/cart vs at) must now LINK, and
    // distance-3 must not; every ed<=2 relation shape is covered:
    // two substitutions, two deletions, deletion+substitution,
    // insertion+substitution, and the length-difference-2 pair (cat/at
    // is 1; "at"/"cart" is 2 — both lengths present)
    val got = FuzzyLink.editNeighbors(names, "name", maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    val distinct = names.as[String].collect().distinct
    val want = (for {
      a <- distinct; b <- distinct if a < b
      d = levRef(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got === want)
    assert(want.exists(_._3 == 2), "fixture must produce distance-2 pairs")
    assert(want.exists { case (a, b, d) => d == 2 && (a.length - b.length).abs == 2 },
      "fixture must cover the double-indel (length ± 2) shape")
  }

  test("maxDist > 2 raises rather than silently under-recalling") {
    val e = intercept[IllegalArgumentException](
      FuzzyLink.editNeighbors(names, "name", maxDist = 3))
    assert(e.getMessage.contains("deletion neighborhood"))
  }

  test("the plan blocks on variants — no cartesian between name sides") {
    val plan = FuzzyLink.editNeighbors(names, "name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
  }
}

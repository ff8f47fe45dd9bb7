package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.FuzzyLink

/** Scale-curve evidence for the deletion-neighborhood blocking behind
  * `etl_fuzzy_link` (d = 1, supplier names) and `etl_fuzzy_link2`
  * (d = 2, part names) — the ScaleCurve discipline every candidate
  * generator in this repo carries: candidate-pair volume, verified-pair
  * volume, and wall as the name corpus blows up ×1/×4/×10.
  *
  * Blow-up discipline (the edit-distance analog of the Caesar trick):
  * copy k prefixes every name with a (2d+1)-char tag (the copy letter
  * repeated). Pairwise tag distance is 2d+1, and one deletion per side
  * lowers edit distance by at most 2, so after d deletions on each side
  * cross-copy strings still differ — NO cross-copy pair can share a
  * ≤d-deletion variant, cross-copy candidate mass is structurally zero —
  * while within-copy edit structure is preserved exactly (a shared
  * prefix shifts no distances). True candidate and pair mass therefore
  * scales exactly ×k; a fitted α near 1 means the blocking scales with
  * the corpus, α → 2 would mean it degenerated toward all-pairs.
  */
object ScaleCurveFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val sb = new StringBuilder
    // (maxDist, table, column, op label) — each key priced on ITS corpus
    Seq((1, "supplier", "s_name", "fuzzy_link"),
        (2, "part", "p_name", "fuzzy_link2")).foreach {
      case (d, table, column, op) =>
        val base = spark.read.parquet(s"/root/testdata/sf0.1/$table.parquet")
          .select(col(column).as("name"))
        val tagLen = 2 * d + 1
        def blowUp(factor: Int): DataFrame = {
          require(factor <= 26, s"factor $factor > 26 exhausts the tag alphabet")
          (0 until factor).map { k =>
            val tag = ('a' + k).toChar.toString * tagLen
            base.select(concat(lit(tag), col("name")).as("name"))
          }.reduce(_ unionByName _)
        }
        var candPts = Vector[(Long, Double)]()
        var cands = Map[Int, Long](); var pairsM = Map[Int, Long]()
        Seq(1, 4, 10).foreach { f =>
          val names = blowUp(f).localCheckpoint()
          val n = names.select(countDistinct(col("name"))).head().getLong(0)
          val (nCand, candSec) = timed(
            FuzzyLink.candidatePairs(names, "name", d).count())
          val (nPairs, wallSec) = timed(
            FuzzyLink.editNeighbors(names, "name", d).count())
          cands += f -> nCand; pairsM += f -> nPairs
          candPts :+= ((n, nCand.toDouble))
          val line = f"""{"dataset":"sf0.1x$f","op":"$op","max_dist":$d,"n_names":$n,"candidates":$nCand,"pairs":$nPairs,"cand_sec":$candSec%.2f,"wall_sec":$wallSec%.2f}"""
          println(line); sb.append(line).append('\n')
          org.apache.spark.sql.GraftShim.unpersistCheckpoint(names)
        }
        // cross-copy candidates are structurally impossible, so both
        // volumes must be EXACTLY ×k — stronger than a fitted bound
        Seq(4, 10).foreach { f =>
          require(cands(f) == cands(1) * f,
            s"$op candidates not exactly x$f: ${cands(f)} vs ${cands(1)} * $f — cross-copy leakage")
          require(pairsM(f) == pairsM(1) * f,
            s"$op pairs not exactly x$f: ${pairsM(f)} vs ${pairsM(1)} * $f")
        }
        val (n0, c0) = candPts.head; val (n1, c1) = candPts.last
        val alpha = math.log(c1 / c0) / math.log(n1.toDouble / n0)
        val line = f"""{"op":"$op","alpha_candidates":$alpha%.3f,"mass_exact_xk":true,"fit_range":[$n0,$n1]}"""
        println(line); sb.append(line).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("scale_curve.jsonl"),
      sb.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}

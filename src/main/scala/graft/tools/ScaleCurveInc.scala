package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale-curve evidence for the INCREMENTAL near-dup path
  * (`Dedup.minhashNearDupsAgainst` — query key `dedup_incremental_near`),
  * the one candidate-generator family without a measured α until round
  * 12. The operator's claim: cross-set candidates scale with
  * batch × collision rate, never |history|² (the batch probes the
  * history band index; history never self-joins).
  *
  * Measurement design (the `ScaleCurve` Caesar discipline): split sf0.1
  * documents into batch (doc_id % 10 = 0) and history (the rest) BEFORE
  * blowing up, then blow BOTH sides up by the same factor with matching
  * per-copy Caesar maps — copy k of the batch shares its substitution
  * with copy k of the history, so every original cross-set near-dup
  * replicates exactly once per copy (true cross mass ∝ factor) while
  * copies stay shingle-disjoint from each other (no factor² cross-copy
  * mass). α fitted on candidates ∝ n_total^α over the ×1 → ×10 range;
  * α ≈ 1 is the pass bar, α → 2 would mean the cross join degenerated
  * toward batch × history.
  *
  * Output: one JSON line per factor + a fitted-alpha line, appended to
  * `scale_curve.jsonl` like the sibling tools.
  */
object ScaleCurveInc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism

    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    def blowUp(docs: DataFrame, factor: Int): DataFrame = {
      require(factor <= 26, s"blowUp: factor $factor > 26 would reuse Caesar maps")
      (0 until factor).map { k =>
        val shift = k % 26
        docs.select((col("doc_id") * factor + k).as("doc_id"),
          translate(col("text"), alphabet,
            alphabet.drop(shift) + alphabet.take(shift)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
    }

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val batchBase = base.filter(col("doc_id") % 10 === 0)
    val histBase = base.filter(col("doc_id") % 10 =!= 0)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val sb = new StringBuilder
    var pts = Vector[(Long, Long)]()
    Seq(1, 4, 10).foreach { f =>
      val hist = blowUp(histBase, f).localCheckpoint()
      val batch = blowUp(batchBase, f).localCheckpoint()
      val nH = hist.count(); val nB = batch.count()
      val mh = Dedup.minhashed(hist.repartition(par), "text", "doc_id")
        .filter(size(col("hs")) > 0).cache()
      val mb = Dedup.minhashed(batch.repartition(par), "text", "doc_id")
        .filter(size(col("hs")) > 0).cache()
      val (cand, _) = timed(
        Dedup.minhashCrossCandidates(mh, mb, "doc_id", 0.8).count())
      mh.unpersist(); mb.unpersist()
      val (pairs, t) = timed {
        val out = Dedup.minhashNearDupsAgainst(hist, batch, "text", "doc_id",
          0.8, sketchParallelism = par)
        val n = out.count()
        org.apache.spark.sql.GraftShim.unpersistCheckpoint(out)
        n
      }
      pts = pts :+ ((nH + nB, cand))
      val line = f"""{"dataset":"sf0.1x$f","op":"incremental_near","n_hist":$nH,"n_batch":$nB,"candidates":$cand,"pairs":$pairs,"sec":$t%.2f}"""
      println(line); sb.append(line).append('\n')
      org.apache.spark.sql.GraftShim.unpersistCheckpoint(hist)
      org.apache.spark.sql.GraftShim.unpersistCheckpoint(batch)
    }
    val (n0, c0) = pts.head
    val (n1, c1) = pts.last
    val alpha = math.log(c1.toDouble / c0) / math.log(n1.toDouble / n0)
    val line = f"""{"op":"incremental_near","alpha":$alpha%.3f,"fit_range":[$n0,$n1]}"""
    println(line); sb.append(line).append('\n')
    java.nio.file.Files.write(java.nio.file.Paths.get("scale_curve.jsonl"),
      sb.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sinks.BandStore

/** Scale-curve evidence for the persisted band index (`BandStore` —
  * query key `dedup_band_store`). The store's AMORTIZATION claim: with
  * the history indexed once, a fixed-size batch's probe cost stays
  * ~flat as history grows (the probe reads only colliding band
  * partitions and broadcasts the batch), while the self-contained
  * `minhashNearDupsAgainst` re-sketches the whole history every run —
  * its cost grows ~linearly. Both wall-time curves are fitted and
  * appended so the claim is priced, not asserted.
  *
  * History blows up with the ScaleCurve Caesar discipline (per-copy
  * substitution maps keep copies shingle-disjoint — no cross-copy pair
  * mass); the batch stays FIXED, so any probe-side growth is index
  * overhead, not workload growth. Probe results are asserted equal to
  * the self-contained operator at every factor — a fast-but-wrong curve
  * must fail here.
  */
object ScaleCurveBand {
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
            alphabet.drop(shift) + alphabet.take(shift)).as("text"))
      }.reduce(_ unionByName _)
    }

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // fixed batch: shift-0 Caesar copies of it exist in every history
    // factor, so cross-set pairs are stable per-factor fixture mass
    val batch = base.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val histBase = base.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("text"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val root = java.nio.file.Files.createTempDirectory("graft_bandcurve").toString
    val sb = new StringBuilder
    var probePts = Vector[(Long, Double)]()
    var resketchPts = Vector[(Long, Double)]()
    Seq(1, 4, 10).foreach { f =>
      val hist = blowUp(histBase, f).repartition(par).localCheckpoint()
      val nH = hist.count()
      val path = s"$root/index_x$f"
      // ingest = write + compact: a 32-task write leaves up to 32 files
      // per bucket, and the probe's footer overhead would price that
      // fragmentation, not the operator — production ingest compacts on
      // cadence, so the curve measures the compacted steady state
      val (_, ingestSec) = timed {
        BandStore.write(hist, "text", "doc_id", path)
        BandStore.compact(spark, path)
      }
      val (probePairs, probeSec) = timed {
        val out = BandStore.probe(spark, path, batch.repartition(par), "text", "doc_id", 0.8)
        val s = pairSet(out)
        org.apache.spark.sql.GraftShim.unpersistCheckpoint(out)
        s
      }
      // the LEAN layout head-to-head: same history, sig column moved to
      // docs/ — record its ingest/probe cost and the bands/ byte shrink
      // (the stored-sig mass the dense layout pays 16x for)
      val leanPath = s"$root/index_lean_x$f"
      val (_, leanIngestSec) = timed {
        BandStore.write(hist, "text", "doc_id", leanPath, leanSigs = true)
        BandStore.compact(spark, leanPath)
      }
      val (leanPairs, leanProbeSec) = timed {
        val out = BandStore.probe(spark, leanPath, batch.repartition(par), "text", "doc_id", 0.8)
        val s = pairSet(out)
        org.apache.spark.sql.GraftShim.unpersistCheckpoint(out)
        s
      }
      require(leanPairs == probePairs,
        s"x$f: lean probe produced ${leanPairs.size} pairs vs ${probePairs.size} dense")
      def tableBytes(p: String, sub: String): Long = {
        def walk(x: java.io.File): Long =
          if (x.isDirectory) Option(x.listFiles()).map(_.map(walk).sum).getOrElse(0L)
          else if (x.getName.endsWith(".parquet")) x.length else 0L
        walk(new java.io.File(p, sub))
      }
      val bandsShrink = tableBytes(path, "bands").toDouble / tableBytes(leanPath, "bands")
      val (directPairs, resketchSec) = timed {
        val out = Dedup.minhashNearDupsAgainst(hist, batch, "text", "doc_id",
          0.8, sketchParallelism = par)
        val s = pairSet(out)
        org.apache.spark.sql.GraftShim.unpersistCheckpoint(out)
        s
      }
      require(probePairs == directPairs,
        s"x$f: probe produced ${probePairs.size} pairs vs ${directPairs.size} self-contained")
      probePts :+= ((nH, probeSec)); resketchPts :+= ((nH, resketchSec))
      val line = f"""{"dataset":"sf0.1x$f","op":"band_store","n_hist":$nH,"n_batch_fixed":true,"ingest_sec":$ingestSec%.2f,"probe_sec":$probeSec%.2f,"lean_ingest_sec":$leanIngestSec%.2f,"lean_probe_sec":$leanProbeSec%.2f,"lean_bands_shrink":$bandsShrink%.2f,"resketch_sec":$resketchSec%.2f,"pairs":${probePairs.size}}"""
      println(line); sb.append(line).append('\n')
      org.apache.spark.sql.GraftShim.unpersistCheckpoint(hist)
    }
    def fit(pts: Vector[(Long, Double)]): Double = {
      val (n0, t0) = pts.head; val (n1, t1) = pts.last
      math.log(t1 / t0) / math.log(n1.toDouble / n0)
    }
    val line = f"""{"op":"band_store","alpha_probe":${fit(probePts)}%.3f,"alpha_resketch":${fit(resketchPts)}%.3f,"fit_range":[${probePts.head._1},${probePts.last._1}]}"""
    println(line); sb.append(line).append('\n')
    java.nio.file.Files.write(java.nio.file.Paths.get("scale_curve.jsonl"),
      sb.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    def rm(x: java.io.File): Unit = { Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); () }
    rm(new java.io.File(root))
    spark.stop()
  }
}

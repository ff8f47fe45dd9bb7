package graft
import org.apache.spark.sql.SparkSession

/** Benchmark driver. Integrity rules (round-2 postmortem: a single
  * un-warmed pass in `Map` hash order let one pathological run become the
  * official artifact at 4× reality):
  *  - queries run in deterministic sorted order;
  *  - the cache and block store are cleared between queries (one query's
  *    leftovers must not tax the next);
  *  - each query runs `passes` times (default 3) and the MEDIAN is
  *    recorded — a one-off GC pause or host-neighbor spike cannot land in
  *    the artifact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/scan warmup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    val failed = scala.collection.mutable.ListBuffer[String]()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).map { _ =>
        // no cross-query (or cross-pass) state: drop cached frames and nudge
        // the collector so leaked blocks from a prior query can't tax this one
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> median(times)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"passes":$passes,"sf":"$sfDir"}"""
    println(line)
    // append to the repo-tracked history so later rounds can diff per-query
    // regressions mechanically; never let history I/O fail the bench
    try {
      val hist = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_HISTORY", "bench_history.jsonl"))
      val stamped = s"""{"at":"${java.time.Instant.now()}",""" + line.drop(1) + "\n"
      java.nio.file.Files.write(hist, stamped.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () }
    spark.stop()
  }
}

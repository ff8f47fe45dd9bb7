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
  *    the artifact;
  *  - memoized-stage queries get `SparkEntry.clearMemos()` before EVERY
  *    timed pass, so their medians measure the COLD shared-stage build
  *    (round-6 verdict: a 0.11 s median for a ~5 s LSH build flattered
  *    the artifact). The warm re-read — the production amortized shape —
  *    is still demonstrated: one extra warm pass per memoized key lands
  *    in the artifact's `warm` map;
  *  - a fixed-cost SENTINEL (sf-independent CPU workload) runs before and
  *    after the suite; its medians ride in the artifact so every run
  *    carries its own host-contention estimate (r06→r07 recorded a 25%
  *    same-code swing with no way to attribute it).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // optional args = query names: bench only those (local iteration on one
    // query without paying the full suite); no args = the full suite
    val only: Set[String] = args.toSet
    val unknown = only -- SparkEntry.queries.keySet
    // fail fast on a typo'd name: a silently-empty filter would print a
    // 0-second "total" artifact indistinguishable from a real run
    require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
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
    // even pass counts average the two middle elements — s(n/2) alone
    // biases the recorded time high
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // fixed-cost sentinel: 100M xxhash64 folds, sf-independent and
    // plan-trivial, so its time moves ONLY with host contention. Median
    // of 3, measured before and after the suite — the artifact's own
    // noise floor.
    def sentinel(): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime()
      // bit_xor, not sum: a 100M-term long sum overflows under ANSI mode
      spark.range(0, 100000000L, 1, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id)) AS h").collect()
      (System.nanoTime() - t0) / 1e9
    })
    val sentinelPre = sentinel()
    val memoKeys = SparkEntry.memoizedQueries
    val warm = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val times = (1 to passes).flatMap { _ =>
        // no cross-query (or cross-pass) state: drop cached frames and nudge
        // the collector so leaked blocks from a prior query can't tax this one
        spark.catalog.clearCache()
        // cold discipline for memoized keys: the shared stage rebuilds
        // INSIDE the timed region every pass — its build cost is this
        // query's real operator cost, not a first-pass footnote
        if (memoKeys(name)) SparkEntry.clearMemos()
        System.gc()
        val t0 = System.nanoTime()
        // a throwing pass records NO time: time-to-failure folded into a
        // median would make a broken query look cheap in the artifact
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
          None
        }
      }
      // the amortized shape, shown separately: the last cold pass left the
      // shared stage built, so one more pass measures the warm re-read
      if (memoKeys(name) && times.nonEmpty) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); warm(name) = (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => () }
      }
      (name, if (times.isEmpty) Double.NaN else median(times), times)
    }
    val sentinelPost = sentinel()
    // a failed query serializes as JSON null (not the string "NaN") so
    // downstream tooling (compare_bench.py) treats it as absent instead
    // of crashing on a string-typed timing
    def num(v: Double): String = if (v.isNaN) "null" else v.toString
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    // total spans successful queries only; `failed` flags the broken ones
    val total = results.map(_._2).filterNot(_.isNaN).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val passesJson = results.map { case (k, _, ts) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-key contention flag: a >3x spread across this run's own passes
    // means the host moved underneath the query — its median is suspect.
    // Sub-0.2s keys skip the flag (tiny absolute jitter trips any ratio).
    val unstable = results.collect {
      case (k, med, ts) if ts.size >= 2 && med > 0.2 && ts.max / ts.min > 3.0 => k
    }
    val unstableJson = unstable.map("\"" + _ + "\"").mkString("[", ",", "]")
    // memoized-stage queries: medians above are COLD (memos cleared per
    // pass); `warm` carries the amortized re-read so the shared-stage win
    // stays visible without flattering the headline
    val memoJson = SparkEntry.memoizedQueries.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmJson = warm.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // partial (filtered) runs are marked so their line can never be read
    // as a full-suite total
    val partialJson = if (only.isEmpty) "" else ""","partial":true"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"memoized":$memoJson,"memo_cleared":true,"warm":$warmJson,"unstable":$unstableJson,"sentinel_pre_s":$sentinelPre,"sentinel_post_s":$sentinelPost,"passes":$passes$partialJson,"sf":"$sfDir"}"""
    println(line)
    // append to the repo-tracked history so later rounds can diff per-query
    // regressions mechanically; never let history I/O fail the bench.
    // Filtered (partial) runs stay out of history — their totals aren't
    // comparable with full-suite entries.
    try { if (only.isEmpty) {
      val hist = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_HISTORY", "bench_history.jsonl"))
      // history (not the driver artifact) also carries every raw pass time,
      // so cross-round variance is inspectable without rerunning
      val stamped = s"""{"at":"${java.time.Instant.now()}","pass_times":$passesJson,""" +
        line.drop(1) + "\n"
      java.nio.file.Files.write(hist, stamped.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    } } catch { case _: Throwable => () }
    spark.stop()
  }
}

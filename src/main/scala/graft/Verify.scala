package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Killed-run forensics (round-8 postmortem: the driver window closed
  * mid-suite and the round recorded NO correctness evidence): the oracle
  * SQL is written FIRST — the per-query parquet dumps that follow are
  * already incremental, so any queries that complete before a timeout are
  * comparable — and a `[verify]` stderr line per query shows exactly where
  * a killed run died. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts: TIMESTAMP(NANOS)-era data reads as epoch-nanos long via
      // this legacy conf; micros-era data is normalized by Tables instead
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val t0 = System.nanoTime()
    names.zipWithIndex.foreach { case ((name, fn), i) =>
      val q0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] ${i + 1}/${names.size} $name ok " +
          f"(${(System.nanoTime() - q0) / 1e9}%.1f s, total ${(System.nanoTime() - t0) / 1e9}%.1f s)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] ${i + 1}/${names.size} $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

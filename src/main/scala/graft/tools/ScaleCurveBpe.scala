package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE artifact cost curve (round-14 verdict item): per-row scoring cost
  * and shipped-table size as the merge table grows 40 → 256 → 1024 →
  * 51200. The table rides the plan as a reference object (one per task
  * via the serialized plan — broadcast-like distribution), so the two
  * numbers a deployment cares about are (a) the serialized artifact bytes
  * every executor receives and (b) the per-row encode throughput, which
  * the greedy encoder's O(word_len × merges_applied) — NOT O(table size)
  * — inner loop should keep flat as the table grows.
  *
  * The 51200-merge point (round-15 verdict item — production GPT-2 vocab
  * size) extends the real 1024-merge artifact with synthetic pairs built
  * from tokens no corpus word contains, so the encoded OUTPUT is
  * bit-identical to the 1024 table's (asserted) while the table is 50×
  * larger — isolating exactly the claim under test: encode cost depends
  * on merges APPLIED, not merges SHIPPED.
  *
  * Usage: runMain graft.tools.ScaleCurveBpe [sfDir] [reps=20]
  * Prints one JSON line per table size (paste-ready for scale_curve.jsonl).
  */
object ScaleCurveBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the 1024-merge artifact's prefixes: slicing keeps rank order valid
    // (a BPE table's first k merges ARE the k-merge table of the same
    // trainer run)
    val full = graft.functions.Bpe.LargeMerges
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).cache()
    val nDocs = docs.count()
    val words = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    def tableOf(m: Int): Seq[(String, String)] =
      if (m <= full.size) full.take(m)
      else full ++ (0 until m - full.size).map { i =>
        // 'zq'/'qz'-prefixed base-36 tokens: absent from every corpus
        // word, so these merges ship but never apply
        val t = java.lang.Integer.toString(i, 36)
        (s"zq$t", s"qz$t")
      }
    val totals = scala.collection.mutable.Map[Int, Long]()
    for (m <- Seq(40, 256, 1024, 51200)) {
      val merges = tableOf(m)
      val bytes = serializedSize(graft.expressions.BpeUtil.buildTable(merges))
      totals(m) = docs
        .select(sum(graft.functions.Bpe.bpeTokenCount(col("text"), merges)))
        .head().getLong(0)
      if (m > full.size)
        require(totals(m) == totals(full.size),
          s"synthetic tail must never apply: $m-table total ${totals(m)} " +
            s"!= ${full.size}-table total ${totals(full.size)}")
      // warm once, then median of 3 timed sweeps of `reps` encodes
      def sweep(): Double = {
        val t0 = System.nanoTime()
        var r = 0
        var acc = 0L
        while (r < reps) {
          acc ^= docs.select(sum(graft.functions.Bpe.bpeTokenCount(col("text"), merges)))
            .head().getLong(0)
          r += 1
        }
        require(acc != -1, "keep the fold alive")
        (System.nanoTime() - t0) / 1e9
      }
      sweep()
      val secs = Seq.fill(3)(sweep()).sorted.apply(1)
      val rowsPerSec = nDocs.toDouble * reps / secs
      val wordsPerSec = words.toDouble * reps / secs
      println(f"""{"op":"bpe_encode","merges":$m,"table_bytes":$bytes,"docs":$nDocs,"rows_per_sec":${rowsPerSec.round},"words_per_sec":${wordsPerSec.round},"sweep_sec":$secs%.3f}""")
    }
    spark.stop()
  }

  private def serializedSize(o: AnyRef): Long = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(o); oos.close()
    bos.size().toLong
  }
}

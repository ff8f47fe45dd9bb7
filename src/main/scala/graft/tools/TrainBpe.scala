package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerate [[graft.functions.Bpe.DefaultMerges]]: train the BPE merge
  * table from a documents parquet dir and print it as a Scala literal.
  * The corpus never collects — only the top-N word-frequency sample does
  * (bounded routing-metadata-sized state, the trainer's whole input).
  *
  * Usage: runMain graft.tools.TrainBpe <sfDir> [topN=10000] [merges=40]
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val topN = args.lift(1).map(_.toInt).getOrElse(10000)
    val numMerges = args.lift(2).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val freqs = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(topN)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = graft.functions.Bpe.train(freqs, numMerges)
    println(s"// ${merges.size} merges from $dir (top $topN words)")
    println(merges.grouped(4).map(_.map { case (a, b) => s"""("$a", "$b")""" }
      .mkString(", ")).mkString("    ", ",\n    ", ""))
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession

object ProfileCorpus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    for (q <- Seq("dedup_minhash_lsh", "pipeline_corpus_prep", "dedup_ngram_jaccard", "dedup_simhash_pairs"); pass <- 1 to 3) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).count()
      println(f"QUERY $q%-24s pass$pass ${(System.nanoTime()-t0)/1e9}%6.2f s (rows=$n)")
    }
    spark.stop()
  }
}

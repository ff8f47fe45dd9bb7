package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling for the minhash-LSH pipeline. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
    import graft.functions.TextFunctions._
    val shOld = docs.select(col("doc_id"),
      array_sort(shingleHashes(array_distinct(charShingles(col("text"), 3)))).as("hs"))
    time("shingle+hash31 (HOF chain)")(shOld.count())
    val sh = docs.select(col("doc_id"),
      graft.expressions.HashExpressions.shingleHashes31Native(col("text"), 3).as("hs"))
    time("shingle+hash31 (fused)")(sh.count())
    val sig = sh.withColumn("sig",
      graft.expressions.HashExpressions.minhashSigNative(col("hs"), 128))
    time("+sig(k=128)")(sig.count())
    val banded = sig.withColumn("bands", lshBands(col("sig"), 128, 8))
    time("+bands")(banded.count())
    // tail stages: candidate generation vs verification
    val m = banded.withColumn("n_sh", size(col("hs"))).cache()
    m.count()
    val e = m.select(col("doc_id"), col("n_sh"), explode(col("bands")).as("band"))
    val cand = e.select(col("doc_id").as("id_a"), col("n_sh").as("na"), col("band"))
      .join(e.select(col("doc_id").as("id_b"), col("n_sh").as("nb"), col("band")), Seq("band"))
      .filter(col("id_a") < col("id_b") &&
        col("na") >= col("nb") * 0.8 && col("nb") >= col("na") * 0.8)
      .select("id_a", "id_b", "na", "nb").distinct().cache()
    val nCand = time("candidates (from cached sketch)")(cand.count())
    println(s"[prof] candidate pairs: $nCand")
    val inter = graft.expressions.HashExpressions.sortedIntersectCount(col("sh_a"), col("sh_b"))
    val verified = cand
      .join(m.select(col("doc_id").as("id_a"), col("hs").as("sh_a")), Seq("id_a"))
      .join(m.select(col("doc_id").as("id_b"), col("hs").as("sh_b")), Seq("id_b"))
      .withColumn("inter", inter)
      .filter(col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double") >= 0.8)
    time("verification (from cached candidates)")(verified.count())
    val full = graft.operators.Dedup.minhashNearDups(docs, "text", "doc_id", 0.8,
      sketchParallelism = 32)
    time("full pipeline")(full.count())
    spark.stop()
  }
}

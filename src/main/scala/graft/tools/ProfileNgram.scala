package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Stage-level profiling for the ngram-jaccard pipeline. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val g0 = df.select(col("doc_id").as("id"), col("lang").as("block"),
        array_distinct(wordNgrams(col("text"), 3)).as("grams0"))
      .filter(size(col("grams0")) > 0)
    time("g0 count")(g0.count())
    time("g0 count again")(g0.count())
    val freq = g0.select(explode(col("grams0")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
    time("freq count")(freq.count())
    val g = g0.select(col("id"), col("block"), explode(col("grams0")).as("gram"))
      .join(freq, Seq("gram"))
      .groupBy("id", "block")
      .agg(transform(array_sort(collect_list(struct(col("freq"), col("gram")))),
        s => s.getField("gram")).as("grams"))
      .withColumn("sz", size(col("grams")))
      .cache()
    time("g build")(g.count())
    val pref = g.withColumn("plen", (col("sz") - ceil(col("sz") * 0.8) + 1).cast("int"))
      .select(col("id"), col("block"), col("sz"),
        explode(slice(col("grams"), lit(1), greatest(col("plen"), lit(1)))).as("gram"))
    time("pref count")(pref.count())
    val candidates = pref.select(col("block"), col("gram"), col("id").as("id_a"), col("sz").as("na"))
      .join(pref.select(col("block"), col("gram"), col("id").as("id_b"), col("sz").as("nb")),
        Seq("block", "gram"))
      .filter(col("id_a") < col("id_b") &&
        col("na") >= col("nb") * 0.8 && col("nb") >= col("na") * 0.8)
      .select("block", "id_a", "id_b").distinct()
    time("candidates")(candidates.count())
    val fin = candidates
      .join(g.select(col("id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
      .join(g.select(col("id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
      .select(col("block"), col("id_a"), col("id_b"), jaccard(col("g_a"), col("g_b")).as("j"))
      .filter(col("j") >= 0.8)
    time("final")(fin.count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the containment join at sf0.1 — which of
  * gram-build / candidates / verify carries the cost. Run:
  * `sbt "runMain graft.tools.ProfileContainment"`. */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.table(spark, d, "documents")
    val toks = split(col("text"), " ")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(24))
    val chunks = docs.filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"), col("lang"),
        posexplode(transform(starts, st => slice(toks, st + 1, lit(32))))
          .as(Seq("chunk_idx", "chunk")))
      .select(graft.operators.Dedup.packChunkKey(col("doc_id"), col("chunk_idx"))
          .as("chunk_key"),
        col("lang"), concat_ws(" ", col("chunk")).as("chunk_text"))

    val p = graft.operators.Dedup
      .containmentGramFrame(chunks, "chunk_text", "chunk_key", "lang").cache()
    val ix = graft.operators.Dedup
      .containmentGramFrame(docs, "text", "doc_id", "lang").cache()
    timed("gram frames")(p.count() + ix.count())
    val cands = graft.operators.Dedup.containmentCandidates(p, ix, 0.8).cache()
    timed("candidates")(cands.count())
    val out = cands
      .join(p.select(col("id").as("id_p"), col("grams").as("g_p")), Seq("id_p"))
      .join(ix.select(col("id").as("id_x"), col("grams").as("g_x")), Seq("id_x"))
      .select(col("block"), col("id_p"), col("id_x"),
        (size(array_intersect(col("g_p"), col("g_x"))).cast("double") /
          size(col("g_p")).cast("double")).as("c"))
      .filter(col("c") >= 0.8)
    timed("verify")(out.count())
    println("[prof] cands=" + cands.count() + " pairs=" + out.count())
    spark.stop()
  }
}

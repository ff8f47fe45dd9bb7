package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileTri {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def tick[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val baskets = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
    val pairsCol = flatten(transform(col("ps"), (x, i) =>
      transform(slice(col("ps"), i + lit(2), greatest(size(col("ps")) - i - lit(1), lit(0))),
        y => struct(x.as("u"), y.as("v")))))
    val edges = baskets.select(explode(pairsCol).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v")).distinct()
    val e = tick("edges cache+count") { val e0 = edges.cache(); println("m="+e0.count()); e0 }
    val t0 = System.nanoTime()
    val tri = graft.operators.Graph.triangles(e)
    println(f"[prof] triangles() pinned: ${(System.nanoTime()-t0)/1e9}%.2f s")
    tick("per-node agg") {
      println(tri.select(col("a").as("n")).unionAll(tri.select(col("b").as("n")))
        .unionAll(tri.select(col("c").as("n")))
        .groupBy("n").agg(count(lit(1)).as("n_tri")).count())
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2.D).
  * Brute-force is the correctness baseline; `ivfAssign` is the scale
  * path: centroid assignment is a broadcast nested-loop over K rows
  * (map-side, no shuffle of the corpus), after which search touches only
  * one cluster — at 100 TB, partition-by-centroid turns ANN into a
  * pruned-partition scan.
  */
object Similarity {

  /** Cosine similarity between two double-array columns: element-order
    * sequential fold — deterministic and identical across engines. */
  def cosine(a: Column, b: Column): Column = {
    import graft.expressions.VectorExpressions.{dot, l2norm}
    dot(a, b) / (l2norm(a) * l2norm(b))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force top-k by cosine vs one query vector (scores rounded for
    * cross-engine-stable ordering; unique id tiebreak). */
  def topK(df: DataFrame, vecCol: String, idCol: String,
           query: DataFrame, k: Int): DataFrame = {
    val q = broadcast(query.select(asDouble(col(vecCol)).as("q_v")))
    df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .crossJoin(q)
      .select(col(idCol), round(cosine(col("v"), col("q_v")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Lloyd's k-means for IVF centroid training: deterministic init (first
    * k rows by id), then `iters` assign→mean rounds. Each round is one
    * broadcast assignment (map-side) + one shuffle of (cluster, dim)
    * partial sums — linear in corpus size, constant in k·dim, so training
    * on a 100 TB embedding table is iters × (scan + tiny shuffle).
    * Returns (centroid_id, vector). */
  def kmeansFit(df: DataFrame, vecCol: String, idCol: String,
                k: Int, iters: Int = 3): DataFrame = {
    var centroids = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("int").as("centroid_id"), asDouble(col(vecCol)).as("c_v"))
      .select(col("centroid_id"), col("c_v"))
    var i = 0
    while (i < iters) {
      val assigned = ivfAssign(df, vecCol, idCol, centroids.withColumnRenamed("c_v", vecCol), "centroid_id")
        .select(col(idCol), col("centroid_id"))
        .join(df.select(col(idCol), asDouble(col(vecCol)).as("v")), Seq(idCol))
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim").agg(avg(col("x")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("c_v"))
      i += 1
    }
    centroids
  }

  /** Mean cosine of each vector to its assigned centroid — the clustering
    * quality score used to validate training. */
  def assignmentQuality(df: DataFrame, vecCol: String, idCol: String,
                        centroids: DataFrame, cIdCol: String): Double =
    ivfAssign(df, vecCol, idCol, centroids, cIdCol)
      .agg(avg(col("sim"))).head().getDouble(0)

  /** IVF assignment: nearest (by cosine) of the broadcast `centroids`
    * (id + vector). Deterministic tiebreak on rounded score then centroid
    * id. Returns corpus rows tagged with `centroid_id`. */
  def ivfAssign(df: DataFrame, vecCol: String, idCol: String,
                centroids: DataFrame, cIdCol: String): DataFrame = {
    val c = broadcast(centroids.select(col(cIdCol).as("centroid_id"), asDouble(col(vecCol)).as("c_v")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("centroid_id"))
    df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .crossJoin(c)
      .select(col(idCol), col("centroid_id"), round(cosine(col("v"), col("c_v")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("centroid_id"), col("sim"))
  }
}

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

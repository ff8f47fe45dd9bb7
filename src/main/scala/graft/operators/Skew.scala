package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (SURVEY.md §5). On a 100 TB corpus a handful
  * of hot keys (one event_type, one language) can pin a whole shuffle
  * partition to a single reducer. Salting splits each hot key into `salt`
  * sub-keys for a partial aggregate, then merges the partials — two small
  * shuffles instead of one skewed one. Sums and counts are associative, so
  * the result is identical to the plain aggregation at any salt value and
  * any partitioning (the DuckDB oracle is simply the unsalted query).
  * AQE's skew handling covers joins; it cannot split a single aggregation
  * group — this can.
  */
object Skew {

  /** Salted two-phase aggregation over `keys`: per output name, a
    * ("sum" | "count", input column) pair. Adds `n_rows` (total count). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                aggs: Seq[(String, String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val partials: Seq[Column] = count(lit(1)).as("__pn") +: aggs.map {
      case (name, "sum", c)   => sum(c).as(s"__p_$name")
      case (name, "count", c) => count(c).as(s"__p_$name")
      case (_, other, _)      => throw new IllegalArgumentException(s"unsupported agg: $other")
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val finals: Seq[Column] = sum(col("__pn")).as("n_rows") +:
      aggs.map { case (name, _, _) => sum(col(s"__p_$name")).as(name) }
    partial.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }

  /** Skew-immune inner equi-join: the big side gets a per-row salt, the
    * small side is replicated `salt` times, and the join key becomes
    * (key, salt) — a hot key's rows spread over `salt` reducers instead of
    * pinning one. Result is identical to `big.join(small, key)` for any
    * salt (each big row meets each matching small row exactly once, on its
    * own salt value).
    *
    * When to reach for this: the small side is too big to broadcast AND
    * key skew defeats the sort-merge path. AQE's skew-join split covers
    * many such cases at runtime; the explicit form is for aggregation-
    * feeding joins where AQE cannot rebalance (or engines without AQE).
    * `small` must be small enough to replicate `salt`× through a shuffle. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}

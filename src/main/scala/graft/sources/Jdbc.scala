package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin JDBC source/sink — the call shape of the reference's Postgres load
  * phase (`Airbnb_Listings_ETL.py:141-151`, `Airbnb_Analysis.py:43-62`) on
  * Spark's built-in JDBC source. Nothing here reimplements the protocol;
  * the wrapper exists to make the two scale-critical options impossible to
  * forget:
  *
  *  - **Partitioned reads.** A bare `spark.read.jdbc` opens ONE connection
  *    and streams the whole table through one task. `Partitioning` makes
  *    Spark issue `num` range-predicated queries in parallel — the only
  *    way a 100 TB-adjacent relational extract is not a single-threaded
  *    bottleneck. Filters and projections still push down into each
  *    partition's query (`PushedFilters` in the plan).
  *  - **Batched writes.** Writes run per partition with batched inserts
  *    (`batchsize`, default 1000) — the distributed replacement for the
  *    reference's row-by-row `insert_rows` round-trips.
  */
object Jdbc {

  /** Range partitioning for parallel JDBC reads: `num` tasks each scan
    * `column` over one slice of [lower, upper). */
  final case class Partitioning(column: String, lower: Long, upper: Long, num: Int)

  def read(spark: SparkSession, url: String, table: String,
           partitioning: Option[Partitioning] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
    partitioning.fold(base) { p =>
      base.option("partitionColumn", p.column)
        .option("lowerBound", p.lower)
        .option("upperBound", p.upper)
        .option("numPartitions", p.num)
    }.load()
  }

  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Append,
            options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode(mode)
      .save()
}

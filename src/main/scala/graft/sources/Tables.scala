package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pruned parquet readers for the driver's testdata tables.
  *
  * The reference extracts CSVs with pandas (`Airbnb_Listings_ETL.py:15-27`);
  * here every source is a declarative `spark.read` so Catalyst pushes filters
  * and column pruning into the scan — at 100 TB the scan is the dominant cost
  * and `ReadSchema`/`PushedFilters` must show only what the query needs.
  */
object Tables {
  import org.apache.spark.sql.functions.{col, lit, unix_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** `events.ts` CONTRACT: epoch-nanos BIGINT, whatever the parquet
    * physically carries. The driver's testdata has shipped it both as
    * TIMESTAMP(NANOS) (reads as long under `nanosAsLong`) and as
    * TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ) — every operator and
    * every DuckDB oracle (`epoch_ns(ts)`) is written against the nanos
    * contract, so the physical type is normalized HERE, once, instead of
    * each consumer guessing. `unix_micros` is exact integer arithmetic
    * (no double round-trip); NTZ→TS cast is identity under the UTC
    * session every main/spec pins. Works on batch and streaming frames
    * alike (pure projection). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case None | Some(LongType) => df
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(other) =>
        throw new IllegalArgumentException(
          s"events.ts: expected long or timestamp, parquet carries $other")
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def events(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "events")

  /** CSV ingestion, mirroring the reference's extract step
    * (`Airbnb_Listings_ETL.py:15-27`, `Airbnb_Review_ETL.py:14-27`) but
    * distributed: header + schema inference off the first file only, then a
    * parallel scan. Charset matches the reference's ISO-8859-1 reviews read.
    */
  def csv(spark: SparkSession, path: String, charset: String = "UTF-8"): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("charset", charset)
      .option("mode", "PERMISSIVE") // bad rows -> nulls, like pandas NaN
      .csv(path)

  /** JSON-lines ingestion — the reference's document store is Mongo, and a
    * mongoexport-style dump is JSONL. Pass an explicit schema at scale:
    * inference costs a full extra pass over 100 TB and can widen types
    * from a skewed sample. PERMISSIVE mode nulls bad records like the
    * pandas path. */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    schema.fold(r)(sc => r.schema(sc)).json(path)
  }
}

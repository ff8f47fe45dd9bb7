package graft

import org.apache.spark.sql.functions._
import graft.etl.ReferencePipeline
import graft.etl.ReferencePipeline.Config

/** Drives the full reference workflow on a listings-shaped wide table
  * synthesized from the testdata (id, money strings, over-long codes,
  * normalizable values, nulls, duplicate keys), asserting the semantics
  * of each cleaning step and the load outputs. */
class ReferencePipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cfg = Config(
    key = "id",
    moneyCols = Seq("price"),
    truncateCols = Map("zipcode" -> 5),
    valueMaps = Map("state" -> Map("Washington DC" -> "DC")),
    requiredCols = Seq("name"),
    fillMinusOne = Seq("beds"),
    tableSchema = Map(
      "location_info" -> Seq("state", "zipcode"),
      "price_info" -> Seq("price"),
      "facility_info" -> Seq("beds")),
    docFlat = Seq("id", "name"),
    docNested = ("host_desc", Seq("host_id", "about")))

  private lazy val raw = Seq(
    (1L, "a", "$1,200.50", "20009-374", "Washington DC", Some(2L), 7L, "h1"),
    (1L, "a", "$1,200.50", "20009-374", "Washington DC", Some(2L), 7L, "h1"), // dup key
    (2L, "b", "99.99", "98101", "WA", None, 8L, "h2"),
    (3L, null, "5.00", "10001", "NY", Some(1L), 9L, "h3") // dropped: null name
  ).toDF("id", "name", "price", "zipcode", "state", "beds", "host_id", "about")

  test("clean applies money/truncate/map/fill/dropna/dedup in one pass") {
    val c = ReferencePipeline.clean(raw, cfg).orderBy("id")
    val rows = c.select($"id", $"price".cast("string"), $"zipcode", $"state", $"beds")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(rows === Seq(
      (1L, "1200.50", "20009", "DC", 2L),
      (2L, "99.99", "98101", "WA", -1L)))
  }

  test("run emits five… well, three keyed tables + doc store, upsert-loaded") {
    val out = java.nio.file.Files.createTempDirectory("refpipe").toString
    val tables = ReferencePipeline.run(spark, raw, cfg, out)
    assert(tables.keySet === Set("location_info", "price_info", "facility_info", "documents_store"))
    val loaded = spark.read.parquet(s"$out/price_info")
    assert(loaded.columns.toSet === Set("id", "price"))
    assert(loaded.count() === 2)
    // second run with changed prices upserts, not duplicates
    val raw2 = raw.withColumn("price", lit("$7.77"))
    ReferencePipeline.run(spark, raw2, cfg, out)
    val re = spark.read.parquet(s"$out/price_info")
    assert(re.count() === 2)
    assert(re.filter($"price" === 7.77).count() === 2)
    val doc = spark.read.parquet(s"$out/documents_store")
    assert(doc.schema("host_desc").dataType.typeName === "struct")
  }

  test("review accumulation nests deduped reviews per listing") {
    val reviews = Seq(
      ("1", "2024-01-01", "nice"), ("1", "2024-01-01", "nice"), // exact dup
      ("1", "2024-01-02", "ok"), ("oops", "2024-01-03", "bad-id")
    ).toDF("listing_id", "date", "comments")
    val got = ReferencePipeline.accumulateReviews(reviews, "listing_id", Seq("date", "comments"))
    val row = got.filter($"listing_id" === 1L).select(size($"reviews")).as[Int].head()
    assert(row === 2)
    assert(got.count() === 1) // bad id row coerced to null and dropped
  }

  test("persistent review load merges daily batches $addToSet-wise and survives retries") {
    val store = java.nio.file.Files.createTempDirectory("revstore").toString + "/reviews"
    val day1 = Seq(("1", "2024-01-01", "nice"), ("2", "2024-01-01", "meh"))
      .toDF("listing_id", "date", "comments")
    // day 2 re-delivers one day-1 review (at-least-once) + adds new ones
    val day2 = Seq(("1", "2024-01-01", "nice"), ("1", "2024-01-02", "ok"),
      ("3", "2024-01-02", "new")).toDF("listing_id", "date", "comments")
    ReferencePipeline.loadReviews(spark, day1, store, "listing_id", Seq("date", "comments"))
    ReferencePipeline.loadReviews(spark, day2, store, "listing_id", Seq("date", "comments"))
    // an Airflow retry replays day 2 wholesale — must change nothing
    ReferencePipeline.loadReviews(spark, day2, store, "listing_id", Seq("date", "comments"))
    val got = spark.read.parquet(store)
      .select($"listing_id", size($"reviews").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 2, 2L -> 1, 3L -> 1),
      "replayed review must not double-count; new reviews accumulate")
  }

  test("pipeline_reference_etl contract: per-table row counts, upsert-wins, review set-union") {
    val out = SparkEntry.queries("pipeline_reference_etl")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // ground truth recomputed independently from the parquet inputs
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val nBase = cust.filter($"c_custkey" % 37 =!= 0).count() // dropna survivors
    // every split table holds exactly one row per surviving listing —
    // the dedup-by-key collapsed the planted duplicate keys
    Seq("host_info", "hotel_location", "hotel_facilities", "price_info", "host_metrics",
      "documents_store").foreach { tbl =>
      assert(out((tbl, "n_rows")) === nBase, s"$tbl row count")
    }
    // upsert latest-wins: id%3==0 listings carry the DOUBLED day-2 price
    val expCents = cust.filter($"c_custkey" % 37 =!= 0)
      .select(sum(when($"c_custkey" % 3 === 0,
        (($"c_acctbal" * 2).cast("decimal(18,2)") * 100).cast("long"))
        .otherwise(($"c_acctbal".cast("decimal(18,2)") * 100).cast("long"))))
      .head().getLong(0)
    assert(out(("price_info", "sum_cents")) === expCents,
      "price store must reflect the day-2 overrides, not the day-1 values")
    // and the day-2 beds override (never -1 for id%3==0, fill elsewhere)
    val expBeds = cust.filter($"c_custkey" % 37 =!= 0)
      .select(sum(when($"c_custkey" % 3 === 0, $"c_custkey" % 4 + 2)
        .when($"c_custkey" % 5 === 0, -1L)
        .otherwise($"c_custkey" % 4 + 1))).head().getLong(0)
    assert(out(("hotel_facilities", "sum_beds")) === expBeds)
    // review set-union: two overlapping at-least-once batches merge to
    // exactly the one-shot distinct — nothing double-counted
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderkey" % 97 =!= 0)
    val expReviews = ord.select($"o_custkey",
      date_format($"o_orderdate", "yyyy-MM-dd"), $"o_orderpriority")
      .distinct().count()
    assert(out(("reviews_store", "n_reviews")) === expReviews,
      "$addToSet merge must equal one-shot distinct across the overlapping batches")
    assert(out(("reviews_store", "n_listings")) ===
      ord.select($"o_custkey").distinct().count())
  }
}

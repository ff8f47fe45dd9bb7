package graft

import org.apache.spark.sql.functions._

class AnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("ana_text_price_join only returns docs matching the regex") {
    val out = q("ana_text_price_join")
    val matching = spark.read.parquet(s"$sf/documents.parquet")
      .filter(lower($"text").contains("merge")).count()
    assert(out.count() === matching)
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
}

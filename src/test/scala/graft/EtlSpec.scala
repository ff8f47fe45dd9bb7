package graft

import org.apache.spark.sql.functions._
import graft.etl.{Clean, Normalize}

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("etl_dedup_key leaves one row per key, the minimal tiebreak row") {
    val out = q("etl_dedup_key").cache()
    assert(out.groupBy("l_orderkey").count().filter($"count" > 1).isEmpty)
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(out.count() === src.select("l_orderkey").distinct().count())
  }

  test("parseMoney strips $ and , and yields exact decimal") {
    val df = Seq("$1,234.50", "99.99", "$0.01").toDF("m")
      .select(Clean.parseMoney($"m").cast("string").as("v"))
    assert(df.as[String].collect().toSeq === Seq("1234.50", "99.99", "0.01"))
  }

  test("normalizeValues maps listed values and passes others through") {
    val df = Seq("Washington DC", "CA").toDF("s")
      .select(Clean.normalizeValues($"s", Map("Washington DC" -> "DC")).as("v"))
    assert(df.as[String].collect().toSeq === Seq("DC", "CA"))
  }

  test("upsert replaces matched keys and keeps both unmatched sides") {
    val base = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val upd = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val got = Normalize.upsert(base, upd, "k").orderBy("k").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "a"), (2, "B"), (3, "C")))
  }

  test("etl_upsert doubles price and flags status for keys % 10 == 0") {
    val out = q("etl_upsert").filter($"o_orderkey" % 10 === 0)
    assert(out.filter($"o_orderstatus" =!= "U").isEmpty)
    val orig = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderkey" % 10 === 0)
      .select(sum(round($"o_totalprice" * 100).cast("bigint")).as("s")).as[Long].head()
    val got = out.select(sum(round($"price" * 100).cast("bigint")).as("s")).as[Long].head()
    assert(got === 2 * orig)
  }

  test("etl_nest_collect produces sorted, comma-joined set per key") {
    val row = q("etl_nest_collect").orderBy("o_custkey").limit(1)
      .select("order_keys").as[String].head()
    val parts = row.split(",").toSeq
    assert(parts === parts.sorted)
  }

  test("etl_fillna output has no nulls and covers all rows") {
    val out = q("etl_fillna")
    assert(out.filter($"tax".isNull).isEmpty)
    val total = out.agg(sum("n")).as[Long].head()
    assert(total === spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("etl_numeric_coerce: bad casts count zero, digit extraction sums") {
    val out = q("etl_numeric_coerce")
    assert(out.agg(sum("n_bad")).as[Long].head() === 0L)
    val urgent = out.filter($"o_orderpriority" === "1-URGENT").select($"n", $"sum_num")
      .as[(Long, Long)].head()
    assert(urgent._2 === urgent._1 * 1)
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val nw = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "v")
    val got = graft.etl.Cdc.snapshotDiff(old, nw, Seq("k"), Seq("v"))
      .select($"k", $"change", $"old_v", $"new_v")
      .as[(Long, String, Option[String], Option[String])].collect().toSet
    assert(got === Set(
      (1L, "removed", Some("a"), None),
      (3L, "changed", Some("c"), Some("CHANGED")),
      (4L, "added", None, Some("d"))))
  }

  test("applyLog: latest entry wins, D deletes, I inserts unknown keys, untouched pass through") {
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val log = Seq(
      (1L, 10L, "U", "x2"), (1L, 20L, "D", "ignored"), // latest D: key 1 gone
      (2L, 10L, "D", "gone"), (2L, 30L, "U", "y2"),    // later U resurrects key 2
      (4L, 5L, "I", "new")                             // insert unknown key
    ).toDF("k", "seq", "op", "v")
    val got = graft.etl.Cdc.applyLog(base, log, Seq("k"), "seq", "op", Seq("v"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((2L, "y2"), (3L, "z"), (4L, "new")))
  }

  test("schema evolution: the merged read spans generations with typed nulls") {
    // generation 1 wrote o_totalprice and predates status/priority;
    // generation 2 dropped the price and added them — ONE mergeSchema
    // read serves both, absent columns as typed nulls per file
    val df = q("etl_schema_evolve")
    assert(df.schema("o_totalprice").dataType.typeName === "double")
    assert(df.schema("o_orderstatus").dataType.typeName === "string")
    val bySnap = df.groupBy($"snap")
      .agg(count(lit(1)).as("n"), count($"o_totalprice").as("np"),
        count($"o_orderstatus").as("ns"))
      .as[(Int, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    val (n1, p1, s1) = bySnap(1)
    val (n2, p2, s2) = bySnap(2)
    assert(n1 > 0 && p1 === n1 && s1 === 0L,
      "generation 1: every row has a price, none a status")
    assert(n2 > 0 && p2 === 0L && s2 === n2,
      "generation 2: every row has a status, none a price")
    // together the generations cover the source table exactly once
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(n1 + n2 === total)
  }

  test("etl_unpivot: every key emits one row per attr, values round-trip, plan is Expand not Union") {
    import org.apache.spark.sql.functions._
    val out = q("etl_unpivot").cache()
    val nParts = spark.read.parquet(s"$sf/part.parquet").count()
    assert(out.count() === nParts * 2, "one row per (key, attr)")
    val perKey = out.groupBy("p_partkey")
      .agg(countDistinct(col("attr")).as("na"), count(lit(1)).as("n"))
    assert(perKey.filter(col("na") =!= 2 || col("n") =!= 2).isEmpty)
    // values survive the melt: re-pivot the size attr and compare
    val sizes = out.filter(col("attr") === "size")
      .select(col("p_partkey"), col("value"))
    val orig = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_size").cast("bigint").as("value"))
    assert(sizes.exceptAll(orig).isEmpty && orig.exceptAll(sizes).isEmpty)
    // ONE scan: the native unpivot plans an Expand; a UNION of N selects
    // would scan the parquet N times
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "native unpivot should plan an Expand")
    assert(!plan.contains("Union"), "melt must not degrade to a multi-scan union")
    out.unpersist()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.streaming.Events

class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions usable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_l2norm(array(3.0d, 4.0d)) AS n").as[(Double, Double)].head()
    assert(r === ((11.0, 5.0)))
    // single token with bits 0..2 set -> majority on exactly those bits
    val sh = spark.sql("SELECT graft_simhash60(array(CAST(7 AS BIGINT))) AS s")
      .as[Long].head()
    assert(sh === 7L)
    val (h, ic) = spark.sql(
      "SELECT graft_md5prefix31('abc') AS h, " +
        "graft_sorted_intersect(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS i")
      .as[(Long, Long)].head()
    assert(h >= 0 && h < 2147483647L && ic === 2L)
  }

  test("bounded-state aggregates usable from SQL: min-k and heavy candidates") {
    GraftFunctions.register(spark)
    Seq(9L, 1L, 5L, 1L, 3L, 7L).toDF("x").createOrReplaceTempView("mk_in")
    val mk = spark.sql("SELECT graft_min_k(x, 3) FROM mk_in")
      .as[Seq[Long]].head()
    assert(mk === Seq(1L, 3L, 5L), "3 smallest distinct, ascending")
    // one dominant key among noise: it must appear in the candidates
    (Seq.fill(50)(42L) ++ (0L until 30L)).toDF("x").createOrReplaceTempView("hh_in")
    val hh = spark.sql("SELECT graft_heavy_candidates(x, 4) FROM hh_in")
      .as[Seq[Long]].head()
    assert(hh.size <= 4 && hh.contains(42L))
    // the size parameter must be a literal — it sizes the state buffer
    val e = intercept[Exception] {
      spark.sql("SELECT graft_min_k(x, CAST(x AS INT)) FROM mk_in").collect()
    }
    assert(e.getMessage.contains("INTEGER literal"))
  }

  test("graft_median_long: exact interpolated median, mergeable across partitions") {
    GraftFunctions.register(spark)
    // odd n: the middle value; even n: mean of the two middle values —
    // and counts must survive partial-aggregate merges, so spread the
    // rows across many partitions
    Seq(("a", 1L), ("a", 3L), ("a", 100L),                    // odd: 3.0
        ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L),           // even: 2.5
        ("c", 7L))                                            // single: 7.0
      .toDF("g", "v").repartition(8).createOrReplaceTempView("med_in")
    val r = spark.sql(
      "SELECT g, graft_median_long(v) AS m FROM med_in GROUP BY g")
      .as[(String, Double)].collect().toMap
    assert(r === Map("a" -> 3.0, "b" -> 2.5, "c" -> 7.0))
    // nulls are ignored; an all-null group is NULL (percentile_cont rule)
    Seq(("a", Some(5L)), ("a", None), ("b", None))
      .toDF("g", "v").createOrReplaceTempView("med_null_in")
    val rn = spark.sql(
      "SELECT g, graft_median_long(v) AS m FROM med_null_in GROUP BY g")
      .as[(String, Option[Double])].collect().toMap
    assert(rn === Map("a" -> Some(5.0), "b" -> None))
    // duplicate-heavy input exercises the value→count state (the whole
    // point: O(distinct) not O(rows))
    val dup = spark.range(0, 10000).selectExpr("id % 7 AS v")
    dup.createOrReplaceTempView("med_dup_in")
    val md = spark.sql("SELECT graft_median_long(v) AS m FROM med_dup_in")
      .as[Double].head()
    assert(md === 3.0)
    // matches Spark's own exact median on random longs
    val rnd = spark.range(0, 999).selectExpr("xxhash64(id) % 1000 AS v")
    rnd.createOrReplaceTempView("med_rnd_in")
    val (ours, theirs) = spark.sql(
      "SELECT graft_median_long(v), median(v) FROM med_rnd_in")
      .as[(Double, Double)].head()
    assert(ours === theirs)
  }

  test("sql_median_by_group plans window-free (the scale-safe SQL median)") {
    // round-18 verdict item 6: the SQL surface must not silently plan a
    // per-group single-reducer sort. With graft_median_long the key is a
    // plain aggregate: NO Window node (and hence no per-group total
    // sort) anywhere in the optimized plan.
    val df = q("sql_median_by_group")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "sql_median_by_group must not plan a Window")
    // and it still agrees with the library twin to the bit
    val sqlSide = df.as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val twin = q("ana_median_by_group").as[(String, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(sqlSide === twin)
  }

  test("GraftExtensions injects functions into a fresh session (deployment path)") {
    val orig = spark
    // getOrCreate returns the active session unchanged, so clear the
    // defaults to force a NEW session (same SparkContext, fresh
    // sessionState) that actually goes through extension injection
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig)
      val d = s2.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(d === 11.0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(orig)
      org.apache.spark.sql.SparkSession.setActiveSession(orig)
    }
  }

  test("streaming sessionization matches the batch state machine") {
    def ns(m: Long) = m * 60L * 1000000000L
    val raw = Seq(
      (1L, 10L, ns(0)), (2L, 10L, ns(10)), (3L, 10L, ns(50)),
      (4L, 10L, ns(95)), (5L, 20L, ns(0)))
    // batch reference
    val batch = Events.sessionize(raw.toDF("event_id", "user_id", "ts"), 30)
      .select($"user_id", $"session_id", $"n_events").as[(Long, Long, Long)]
      .collect().toSet
    // streaming: MemoryStream drive
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Events.SessionEvent]
    val qy = Events.sessionizeStream(ms.toDS(), 30).writeStream
      .outputMode("append").format("memory").queryName("sessions").start()
    ms.addData(raw.map { case (e, u, t) => Events.SessionEvent(u, e, t / 1000) })
    qy.processAllAvailable(); qy.stop()
    val streamed = spark.table("sessions")
      .select($"user_id", $"session_id", $"n_events").as[(Long, Long, Long)]
      .collect().toSet
    // streaming emits only CLOSED sessions (append mode): the batch set
    // minus each user's final open session
    val open = batch.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    assert(streamed === batch -- open)
    assert(streamed.nonEmpty)
  }
}

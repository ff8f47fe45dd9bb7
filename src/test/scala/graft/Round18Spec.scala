package graft

import org.apache.spark.sql.functions._

/** The round-18 wave-2 operator additions — each proven against an
  * independent driver-side replay (brute force over the collected
  * sf0.001 tables), not just the shared DuckDB oracle. */
class Round18Spec extends SparkSpec {
  import spark.implicits._

  test("ana_churn ≡ brute-force next-bucket replay") {
    val mNs = 30L * 86400L * 1000000000L
    // events must go through the normalizing reader: ts is epoch-nanos
    // BIGINT by contract, while the raw parquet may be TIMESTAMP
    val am = graft.sources.Tables.table(spark, sf, "events")
      .select(col("user_id"), expr(s"ts div $mNs").as("mi"))
      .as[(Long, Long)].collect().toSet
    val maxMi = am.map(_._2).max
    val expected = am.groupBy(_._2).collect {
      case (mi, rows) if mi < maxMi =>
        val users = rows.map(_._1)
        (mi, users.size.toLong,
          users.count(u => !am.contains((u, mi + 1))).toLong)
    }.toSet
    val got = q("ana_churn").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    got.foreach { case (_, active, churned) => assert(churned <= active) }
  }

  test("ana_stickiness: bounded by 1 and consistent with its own counts") {
    val rows = q("ana_stickiness")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, aud, nDays, mau, st) =>
      assert(aud <= nDays * mau)     // a user-day needs a day and a user
      assert(st > 0.0 && st <= 1.0)  // avg DAU can never exceed MAU
      assert(math.abs(st - BigDecimal(aud.toDouble / nDays / mau)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q_median_abs_dev ≡ brute-force median and MAD") {
    val pc = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
      .as[(String, Long)].collect().groupBy(_._1)
    def med2(xs: Seq[Long]): Long = { // sum of the two middle ranks
      val s = xs.sorted
      s((s.size - 1) / 2) + s(s.size / 2)
    }
    val expected = pc.map { case (flag, rows) =>
      val xs = rows.map(_._2).toSeq
      val m2 = med2(xs)
      val mad2 = med2(xs.map(x => math.abs(2 * x - m2)))
      (flag, xs.size.toLong, m2 / 2.0 / 100.0, mad2 / 4.0 / 100.0)
    }.toSet
    val got = q("q_median_abs_dev")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got == expected)
  }

  test("ta_winsorize: clamp ≡ brute force at the exact decile rank picks") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val expected = docs.map { case (lang, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity).map(_._1)
      val n = sorted.size
      val p10 = sorted((n + 9) / 10 - 1)
      val p90 = sorted((9 * n + 9) / 10 - 1)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lang, n.toLong, p10, p90, r6(sorted.sum.toDouble / n),
        r6(sorted.map(v => math.max(p10, math.min(p90, v))).sum.toDouble / n))
    }.toSet
    val got = q("ta_winsorize")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSet
    assert(got == expected)
    got.foreach { case (_, _, p10, p90, _, mw) =>
      assert(p10 <= p90 && mw >= p10.toDouble / 1 - 0 && mw <= p90.toDouble)
    }
  }

  test("ta_dp_counts: suppression exactly below k, noise bounded") {
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = q("ta_dp_counts")
      .select(col("lang"), col("source"), col("n_noised"), col("suppressed"))
      .as[(String, String, Option[Long], Boolean)].collect()
    assert(got.length == truth.size)
    got.foreach { case (lang, source, noised, suppressed) =>
      val n = truth((lang, source))
      assert(suppressed == (n < 5))
      if (suppressed) assert(noised.isEmpty)
      else {
        assert(noised.nonEmpty)
        assert(math.abs(noised.get - n) <= 3) // the PRF noise bound
        assert(noised.get >= 0)
      }
    }
  }

  test("etl_anti_entropy: divergent slices are exactly the planted ones") {
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey")).as[Long].collect()
    val planted = keys.filter(k => k % 997 == 0 || k % 991 == 0)
      .map(_ / 1024).toSet
    val got = q("etl_anti_entropy").select(col("slice")).as[Long].collect().toSet
    assert(got == planted)
    assert(got.nonEmpty)
  }

  test("stream_dedup_ttl ≡ brute-force last-seen replay") {
    val ttl = 3600L * 1000000000L
    val ev = graft.sources.Tables.table(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val expected = ev.groupBy(e => (e._1, e._2)).toSeq
      .flatMap { case ((_, typ), rows) =>
        val sorted = rows.sortBy(r => (r._3, r._4))
        sorted.zipWithIndex.map { case (r, i) =>
          (typ, i == 0 || r._3 - sorted(i - 1)._3 > ttl)
        }
      }
      .groupBy(_._1)
      .map { case (typ, ks) =>
        (typ, ks.size.toLong, ks.count(_._2).toLong, ks.count(!_._2).toLong)
      }.toSet
    val got = q("stream_dedup_ttl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }
}

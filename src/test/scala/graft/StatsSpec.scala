package graft

import graft.functions.TextStats
import org.apache.spark.sql.functions._

/** The round-16 statistics family: character entropy on hand-derivable
  * fixtures, mode/correlation/histogram against brute-force replays, the
  * batch sessionizer against an independently computed session split,
  * and basket lift against its definition.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("charEntropy matches hand-computed values") {
    val df = Seq(
      (1L, "aaaa"),      // one symbol -> 0 bits
      (2L, "abab"),      // uniform over 2 -> 1 bit
      (3L, "abcd"),      // uniform over 4 -> 2 bits
      (4L, "aab"),       // {2,1}/3 -> 0.918296
      (5L, ""),          // empty -> row vanishes
      (6L, null: String) // null -> row vanishes
    ).toDF("doc_id", "text")
    val got = TextStats.charEntropy(df, "doc_id", "text")
      .select("doc_id", "n_chars", "n_distinct", "entropy_bits")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(1L) === ((4L, 1L, 0.0)))
    assert(got(2L) === ((4L, 2L, 1.0)))
    assert(got(3L) === ((4L, 4L, 2.0)))
    assert(got(4L) === ((3L, 2L, 0.918296)))
  }

  test("entropy over documents is bounded by log2 of the alphabet") {
    val out = q("ta_entropy").cache()
    assert(out.count() > 0)
    val bad = out.filter(col("entropy_bits") < 0.0 ||
      col("entropy_bits") > log2(col("n_distinct").cast("double")) + lit(1e-9))
    assert(bad.isEmpty)
  }

  test("q_mode picks the max-count priority with the deterministic tiebreak") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderpriority")
      .as[(Long, String)].collect().toSeq
    val exp = rows.groupBy(_._1).map { case (ck, rs) =>
      val counts = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (pr, n) = counts.toSeq.maxBy { case (p, n) => (n, p) }
      (ck, pr, n)
    }.toSet
    val got = q("q_mode").as[(Long, String, Long)].collect().toSet
    assert(got === exp)
  }

  test("q_corr equals a BigDecimal-exact replay") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val exp = rows.groupBy(_._1).map { case (f, rs) =>
      val n = BigInt(rs.size)
      val sx = rs.map(r => BigInt(r._2)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val syy = rs.map(r => BigInt(r._3) * r._3).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val corr = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
      (f, rs.size.toLong,
        BigDecimal(corr).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = q("q_corr").as[(String, Long, Double)].collect().toSet
    assert(got === exp)
  }

  test("q_histogram bins partition orders and bound their members") {
    val out = q("q_histogram").cache()
    val total = out.agg(sum("n_orders")).as[Long].head()
    assert(total === spark.read.parquet(s"$sf/orders.parquet").count())
    // every member price must lie inside [bin_lo, bin_lo + width)
    val bad = out.filter(col("min_price") < col("bin_lo") ||
      col("max_price") >= col("bin_lo") + lit(50000.0))
    assert(bad.isEmpty)
  }

  test("ana_sessionize: sessions partition events, gaps split, dense indexes") {
    val out = q("ana_sessionize").cache()
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(out.agg(sum("n_events")).as[Long].head() === nEvents)
    // brute replay: per user, sort by (ts, event_id), split on >30min gaps
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[(Long, Long, Long)].collect().toSeq
    val gap = 1800L * 1000000000L
    val expSessions = ev.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val idx = sorted.scanLeft((0L, 0L)) { case ((i, prev), r) =>
        (if (prev == 0L || r._3 - prev > gap) i + 1 else i, r._3)
      }.tail.map(_._1)
      sorted.zip(idx).groupBy(_._2).map { case (sidx, grp) =>
        (uid, sidx, grp.size.toLong,
          grp.map(_._1._3).min / 1000L,
          (grp.map(_._1._3).max - grp.map(_._1._3).min) / 1000000000L)
      }
    }.toSet
    val got = out.select("user_id", "session_idx", "n_events", "start_us", "dur_s")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expSessions)
  }

  test("q_linreg equals a BigDecimal-exact replay and predicts the group mean") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    val exp = rows.groupBy(_._1).map { case (f, rs) =>
      val n = BigInt(rs.size)
      val sx = rs.map(r => BigInt(r._2)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (f, rs.size.toLong, r6(slope), r6(icept))
    }.toSet
    val got = q("q_linreg").as[(String, Long, Double, Double)].collect().toSet
    assert(got === exp)
  }

  test("q_first_last equals the sorted-per-customer replay") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val exp = rows.groupBy(_._1).map { case (ck, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      (ck, rs.size.toLong, sorted.head._4 / 100.0, sorted.last._4 / 100.0)
    }.toSet
    val got = q("q_first_last").as[(Long, Long, Double, Double)].collect().toSet
    assert(got === exp)
  }

  test("ana_islands: streaks are maximal, disjoint, and cover all active days") {
    val out = q("ana_islands").cache()
    val active = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().as[(Long, Long)].collect().toSeq
    val exp = active.groupBy(_._1).flatMap { case (uid, rs) =>
      val days = rs.map(_._2).sorted
      val islands = days.foldLeft(List.empty[List[Long]]) {
        case (acc @ (cur :: rest), d) if d == cur.head + 1 => (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }
      islands.map(isl => (uid, isl.min, isl.max, isl.size.toLong))
    }.toSet
    val got = out.as[(Long, Long, Long, Long)].collect().toSet
    assert(got === exp)
  }

  test("ta_zipf_fit slope is the least-squares fit over the ranked counts") {
    val (nTerms, slope, icept) =
      q("ta_zipf_fit").as[(Long, Double, Double)].head()
    assert(nTerms > 10)
    assert(slope < 0.0, "term frequencies must decay with rank")
    // replay the regression from the collected ranked counts
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(regexp_replace(regexp_replace(
        lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("t").count().as[(String, Long)].collect().toSeq
    val ranked = counts.sortBy { case (t, n) => (-n, t) }.take(500).zipWithIndex
      .map { case ((_, n), i) => (i + 1.0, n.toDouble) }
    val (slr, slf, slr2, slrlf) = ranked.foldLeft((0.0, 0.0, 0.0, 0.0)) {
      case ((a, b, c2, d2), (r, n)) =>
        (a + math.log(r), b + math.log(n),
          c2 + math.log(r) * math.log(r), d2 + math.log(r) * math.log(n))
    }
    val nd = ranked.size.toDouble
    val expSlope = (nd * slrlf - slr * slf) / (nd * slr2 - slr * slr)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(slope === r6(expSlope))
    assert(icept === r6((slf - expSlope * slr) / nd))
  }

  test("ta_ttr matches a hand-derived fixture via the collected replay") {
    val out = q("ta_ttr").cache()
    assert(out.count() > 0)
    // invariants: types <= tokens, hapax <= types, ratios in (0, 1]
    assert(out.filter(col("n_types") > col("n_tokens") ||
      col("n_hapax") > col("n_types") ||
      col("ttr") <= 0.0 || col("ttr") > 1.0 ||
      col("hapax_frac") < 0.0 || col("hapax_frac") > 1.0).isEmpty)
    // exact replay for one doc
    val (docId, text) = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].head()
    val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", "")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val counts = toks.groupBy(identity).view.mapValues(_.length).toMap
    val row = out.filter(col("doc_id") === docId)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(row._2 === toks.length.toLong)
    assert(row._3 === counts.size.toLong)
    assert(row._4 === counts.values.count(_ == 1).toLong)
  }

  test("ta_l_diversity: a class is diverse iff it carries >= 2 sensitive bands") {
    val out = q("ta_l_diversity")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (_, _, n, ns, div) => div === (ns >= 2) && ns <= n })
    assert(out.forall { case (_, _, _, ns, _) => ns >= 1 && ns <= 3 })
  }

  test("ana_rfm quartiles equal the sorted-replay exact tile rule") {
    val out = q("ana_rfm").cache()
    def tileOf(rank: Long, n: Long, t: Long): Long = {
      val qq = n / t; val m = n % t; val cut = m * (qq + 1)
      if (rank <= cut) (rank + qq) / (qq + 1)
      else m + (rank - cut + math.max(qq, 1) - 1) / math.max(qq, 1)
    }
    val rows = out.select("o_custkey", "r_days", "n_orders", "r_score")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val n = rows.size.toLong
    val expR = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> tileOf(i + 1L, n, 4) }.toMap
    assert(rows.map(r => r._1 -> r._4).toMap === expR)
    val badRange = out.filter(col("r_score") < 1 || col("r_score") > 4 ||
      col("f_score") < 1 || col("f_score") > 4 ||
      col("m_score") < 1 || col("m_score") > 4)
    assert(badRange.isEmpty)
    assert(out.filter(col("rfm") =!=
      col("r_score") * 100 + col("f_score") * 10 + col("m_score")).isEmpty)
  }

  test("ana_pareto: concentration curve is monotone, balanced, and sums to 1") {
    val rows = q("ana_pareto").orderBy("decile")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(rows.map(_._1) === (1L to 10L))
    // balanced deciles: sizes differ by at most one
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    // top decile carries the most revenue; shares monotone to 1.0
    assert(rows.head._3 >= rows.last._3)
    assert(rows.map(_._4).sliding(2).forall { case Seq(a, b) => a <= b; case _ => true })
    assert(math.abs(rows.last._4 - 1.0) < 1e-9)
    val totalRevenue = rows.map(_._3).sum
    val expTotal = spark.read.parquet(s"$sf/orders.parquet")
      .select(round(col("o_totalprice") * 100).cast("long")).as[Long]
      .collect().sum / 100.0
    assert(math.abs(totalRevenue - expTotal) < 1e-6)
  }

  test("ana_basket_lift matches its definition on collected baskets") {
    val out = q("ana_basket_lift")
      .as[(String, String, Long, Long, Long, Double)].collect().toSet
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_partkey")
    val pt = spark.read.parquet(s"$sf/part.parquet").select("p_partkey", "p_brand")
    val baskets = li.join(pt, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as[Long], col("p_brand").as[String])
      .collect().toSeq.distinct
    val byBrand = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nt = baskets.map(_._1).distinct.size.toLong
    val exp = baskets.groupBy(_._1).values.flatMap { items =>
      val brands = items.map(_._2).sorted
      for { a <- brands; b <- brands if a < b } yield (a, b)
    }.groupBy(identity).map { case ((a, b), xs) =>
      val nab = xs.size.toLong
      (a, b, nab, byBrand(a), byBrand(b),
        BigDecimal((nt * nab).toDouble / (byBrand(a) * byBrand(b)).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    assert(out === exp)
  }
}

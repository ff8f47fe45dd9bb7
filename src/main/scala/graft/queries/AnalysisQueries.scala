package graft.queries

import org.apache.spark.sql.functions._
import Common._

/** SURVEY.md §2.B — the six analyses of `/root/reference/Airbnb_Analysis.py`
  * re-expressed over the testdata. The reference fans out to Mongo regex
  * queries, collects id lists on the client, and string-concatenates them
  * into Postgres SQL (`Airbnb_Analysis.py:43-62`) — an O(matches) driver
  * round-trip. Here each analysis is ONE distributed plan: the text
  * predicate, the join, and the aggregation all run inside Catalyst, so at
  * 100 TB the "id list" never leaves the executors.
  */
object AnalysisQueries {

  val defs: Map[String, QFn] = Map(
    // analysis1 (Airbnb_Analysis.py:24-65): the reference ORs one regex over
    // FOUR fields, one of them inside the nested per-listing reviews array
    // (Airbnb_Analysis.py:31-37) — here: two flat text fields, a code
    // field, and an exists() over the nested review array, then the join
    // to the price side. The whole predicate (nested exists included) runs
    // inside Catalyst — no per-match driver round-trip.
    "ana_text_price_join" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val revs = graft.etl.Normalize.nestCollect(
        t(s, d, "events").select(col("user_id"), col("props")),
        "user_id", Seq("props"), "reviews")
      val hit = col("text").rlike("(?i)merge") || col("lang").rlike("^es$") ||
        col("source").rlike("^src1$") ||
        exists(col("reviews"), r => r.getField("props").rlike("\"k\": 4\\d"))
      val emb = t(s, d, "embeddings").select(col("vec_id"), col("label"))
      docs.join(revs, docs("doc_id") === revs("user_id"), "left")
        .filter(hit)
        .join(emb, docs("doc_id") === emb("vec_id"))
        .select(col("doc_id"),
          concat_ws(",", col("source"), col("lang")).as("address"),
          col("n_chars"), col("label"))
    }),

    // analysis6 (Airbnb_Analysis.py:185-220): regex INSIDE the nested
    // array-of-struct review column — exists() filters listings whose
    // reviews match, filter() projects the matching subset, and the digit
    // extraction folds over it; nested fields project back out
    "ana_nested_review_match" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"), col("props"))
      val nested = graft.etl.Normalize.nestCollect(ev, "user_id", Seq("event_id", "props"), "reviews")
      val isMatch = (r: org.apache.spark.sql.Column) => r.getField("props").rlike("\"k\": 4\\d")
      nested
        .filter(exists(col("reviews"), isMatch))
        .withColumn("matched", filter(col("reviews"), isMatch))
        .select(col("user_id"),
          size(col("reviews")).cast("bigint").as("n_reviews"),
          size(col("matched")).cast("bigint").as("n_matching"),
          element_at(col("matched"), 1).getField("event_id").as("first_event"),
          aggregate(col("matched"), lit(0L), (acc, r) =>
            acc + coalesce(regexp_extract(r.getField("props"), "(\\d+)", 1).cast("bigint"),
              lit(0L))).as("sum_k"))
    }),

    // analysis2 (Airbnb_Analysis.py:67-82): 3-way equality-filtered join
    "ana_filtered_join" -> ((s, d) => {
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          money(cents(col("c_acctbal"))).as("acctbal"))
    }),

    // analysis3 (Airbnb_Analysis.py:84-97): count + interpolated median per
    // group, composed END-TO-END through the money-STRING parse the
    // reference actually runs (`percentile_cont(0.5)` over
    // `replace(substring(price from 2),',','')::real`, Airbnb_Analysis.py:89).
    // The price column is first rendered as the reference's '$1,234.56'
    // format (testdata has no string money column), then parsed back with
    // Clean.parseMoney — parse and median are exercised in ONE plan, not as
    // two separately-tested operators.
    // the median itself is the EXACT COUNTING-MEDIAN aggregate
    // (expressions/MedianLongAgg.scala — state O(distinct cents), map-
    // side combined, no window and no per-group sort anywhere): Spark's
    // `percentile` aggregate buffers every group value in executor
    // memory — the memory-side twin of the per-group single-reducer
    // window, and the same 100× scale-killer. Round 19 (optimization):
    // this key previously spelled the same median as the two-level rank
    // construction (operators/Rank.scala) — correct and scale-safe, but
    // a measured ~4× heavier plan here (range exchange + localCheckpoint
    // materialization + count/offset/broadcast/join/window vs ONE hash
    // aggregate; scale_curve.jsonl: both flat, rank at the higher
    // constant). graft_median_long returns the same
    // percentile_cont(0.5) = (v(r1) + v(r2)) / 2.0 over the identical
    // bigints — BIGINT sum then IEEE double ops, so the hash still
    // matches the oracle's percentile_cont to the bit (and the single
    // aggregation pass evaluates the regex money parse exactly once, so
    // the old materializeInput checkpoint is gone too).
    "ana_median_by_group" -> ((s, d) => {
      val c0 = cents(col("l_extendedprice"))
      val moneyStr = concat(lit("$"),
        format_number(call_function("div", c0, lit(100L)), 0),
        lit("."), lpad((c0 % 100).cast("string"), 2, "0"))
      val parsed = t(s, d, "lineitem")
        .select(col("l_returnflag"), moneyStr.as("price"))
        .select(col("l_returnflag"),
          (graft.etl.Clean.parseMoney(col("price")) * 100).cast("bigint").as("price_c"))
      parsed
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          (graft.expressions.MedianLongAgg.medianLong(col("price_c")) / lit(100.0))
            .as("median_price"))
    }),

    // analysis4 (Airbnb_Analysis.py:99-122): compare two grouped averages.
    // avg(A) < avg(B) is decided by exact integer cross-multiplication
    // (sum1*n2 < sum2*n1) — no floating division on either engine.
    "ana_avg_compare" -> ((s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"), cents(col("c_acctbal")).as("bal_c"))
      val agg = c.groupBy("c_nationkey").agg(
        sum(when(col("c_mktsegment") === "BUILDING", col("bal_c"))).as("s1"),
        count(when(col("c_mktsegment") === "BUILDING", lit(1))).as("n1"),
        sum(when(col("c_mktsegment") === "MACHINERY", col("bal_c"))).as("s2"),
        count(when(col("c_mktsegment") === "MACHINERY", lit(1))).as("n2"))
      agg.filter(col("n1") > 0 && col("n2") > 0 && col("s1") * col("n2") < col("s2") * col("n1"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
    }),

    // analysis5 (Airbnb_Analysis.py:124-183): conjunctive regex + array containment
    "ana_multiword_count" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").rlike("(?i)spark") && col("text").rlike("(?i)window") &&
          array_contains(split(col("text"), " "), "vector"))
        .groupBy("lang").agg(count(lit(1)).as("n_listings"))),

    // JSON payload extraction (the reference stores semi-structured docs
    // in Mongo; here: typed access into the events' JSON props column)
    "ana_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          from_json(col("props"), lit("k INT")).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"))),

    // analysis6 (Airbnb_Analysis.py:185-220): regex digit extraction + agg
    // try_cast: a digit-free props row must null (matching the oracle's
    // TRY_CAST), not abort the scan under ANSI
    "ana_regex_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          regexp_extract(col("props"), "(\\d+)", 1).try_cast("bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))),

    // ORDERED funnel conversion (view -> click -> purchase): each stage
    // counts users whose stage event happened strictly AFTER their
    // previous stage's first event — the sequence constraint is what
    // separates a funnel from three independent counts. Three chained
    // conditional-min windows over ONE user-key shuffle (each stage's
    // column feeds the next; Catalyst stacks them on a single sort), then
    // a single global count — no joins, no per-stage passes
    "ana_funnel" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
      t(s, d, "events").select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t_view", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t_click", min(when(col("event_type") === "click" &&
          col("ts") > col("t_view"), col("ts"))).over(w))
        .withColumn("t_purchase", min(when(col("event_type") === "purchase" &&
          col("ts") > col("t_click"), col("ts"))).over(w))
        .agg(
          count_distinct(when(col("t_view").isNotNull, col("user_id"))).as("n_view"),
          count_distinct(when(col("t_click").isNotNull, col("user_id"))).as("n_click_after_view"),
          count_distinct(when(col("t_purchase").isNotNull, col("user_id"))).as("n_purchase_after_click"))
    }),

    // weekly cohort retention: users bucketed by their FIRST active week,
    // counted again in each later week they return. Week index is pure
    // integer arithmetic on epoch-nanos (`div` — calendar functions
    // round-trip differently across engines; a 7-day bucket doesn't).
    // (user, week) de-dup -> per-user min -> one (cohort, offset) count;
    // every shuffle carries ids and small ints only
    "ana_retention" -> ((s, d) => {
      val weekNs = 7L * 86400L * 1000000000L
      val active = t(s, d, "events")
        .select(col("user_id"), expr(s"ts div $weekNs").as("week"))
        .distinct()
      val cohort = active.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      active.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    }),

    // MARKET-BASKET LIFT over (order, brand) baskets: how much more often
    // two brands are bought together than independence predicts. The
    // per-basket pair expansion is bounded by (distinct brands per
    // order)² — basket size, a data constant — and every count combines
    // map-side; the dimension join broadcasts; the grand total rides a
    // 1-row broadcast cross join, never a driver collect. lift =
    // N·n_ab/(n_a·n_b) is ONE double division over exact integers
    "ana_basket_lift" -> ((s, d) => {
      val br = t(s, d, "lineitem").select(col("l_orderkey").as("ok"), col("l_partkey"))
        .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("ok"), col("p_brand").as("brand")).distinct()
      val marg = br.groupBy("brand").agg(count(lit(1)).as("n"))
      val x = br.select(col("ok"), col("brand").as("brand_a"))
      val y = br.select(col("ok"), col("brand").as("brand_b"))
      val co = x.join(y, Seq("ok")).filter(col("brand_a") < col("brand_b"))
        .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_ab"))
      val tot = br.agg(count_distinct(col("ok")).as("nt"))
      co.join(broadcast(marg.select(col("brand").as("brand_a"), col("n").as("n_a"))), "brand_a")
        .join(broadcast(marg.select(col("brand").as("brand_b"), col("n").as("n_b"))), "brand_b")
        .crossJoin(broadcast(tot))
        .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"), col("n_b"),
          round((col("nt") * col("n_ab")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
    }),

    // gap-based SESSIONIZATION (batch form of stream_sessionize): a
    // session breaks after 30 idle minutes. Both windows (the lag
    // change-detect and the running session index) share ONE
    // (user, ts)-sort — a single shuffle on the entity key, per-reducer
    // work bounded by events-per-user, the same argument Scd2.history
    // documents; session stats then combine map-side
    "ana_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gapNs = 1800L * 1000000000L
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), cents(col("value")).as("vc"))
        .withColumn("new_s",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") - lag(col("ts"), 1).over(w) > lit(gapNs), 1L).otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          expr("min(ts) div 1000").as("start_us"),
          expr("(max(ts) - min(ts)) div 1000000000").as("dur_s"),
          money(sum(col("vc"))).as("total_value"))
    }),

    // GAPS-AND-ISLANDS: each user's maximal streaks of CONSECUTIVE
    // active days — the engagement-streak analysis. Day index is pure
    // integer `div` on epoch-nanos (the ana_retention rule); the island
    // key is the classic day − row_number() constant: one (user,
    // day)-dedup, one per-user window bounded by days-per-user (a data
    // constant, never corpus-shaped), one keyed aggregate
    "ana_islands" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dayNs = 86400L * 1000000000L
      val w = Window.partitionBy("user_id").orderBy(col("day"))
      t(s, d, "events")
        .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
          count(lit(1)).as("n_days"))
        .drop("grp")
    }),

    // RFM SEGMENTATION: every customer scored 1–4 on Recency (days since
    // last order), Frequency (order count), Monetary (total spend) —
    // the classic CRM segmentation. Each quartile assignment is the
    // q_ntile construction: global rank from Rank.withGroupRank's
    // two-level exchange (never a one-reducer `ntile() OVER ()` sort of
    // all customers), then NTILE's exact integer tile rule — identical
    // to DuckDB's native ntile, which the oracle uses. Three rank
    // passes over the CUSTOMER AGGREGATE (rows = customers, not orders)
    "ana_rfm" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_custkey"),
        expr("CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)").as("day"),
        cents(col("o_totalprice")).as("pc"))
      val c = o.groupBy("o_custkey").agg(max(col("day")).as("last_day"),
        count(lit(1)).as("f"), sum(col("pc")).cast("bigint").as("mc"))
      val g = c.agg(max(col("last_day")).as("gmax"))
      val base = c.crossJoin(broadcast(g))
        .select(col("o_custkey"), (col("gmax") - col("last_day")).as("r_days"),
          col("f"), col("mc"))
      val scored = Seq(("r_days", "r_score"), ("f", "f_score"), ("mc", "m_score"))
        .foldLeft(base) { case (df, (v, out)) =>
          tileN(df, v, out, tiles = 4, tiebreakCols = Seq("o_custkey")) }
      scored.select(col("o_custkey"), col("r_days"), col("f").as("n_orders"),
        money(col("mc")).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
    }),

    // PARETO / revenue-concentration curve: customers ranked by spend,
    // cut into spend deciles, each decile's share and the cumulative
    // share ("top 10% of customers carry X% of revenue"). The decile
    // assignment is the same two-level-rank + exact-tile construction;
    // the cumulative window then runs over TEN rows. Shares are one
    // double division over exact integer cents
    "ana_pareto" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = t(s, d, "orders").groupBy("o_custkey")
        .agg(sum(cents(col("o_totalprice"))).cast("bigint").as("mc"))
        .withColumn("neg_mc", -col("mc")).withColumn("__g", lit(1))
      val deciled = tileN(c, "neg_mc", "decile", tiles = 10,
        tiebreakCols = Seq("o_custkey"))
      val per = deciled.groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum(col("mc")).cast("bigint").as("rc"))
      val tot = per.agg(sum(col("rc")).cast("bigint").as("tc"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_customers"), money(col("rc")).as("revenue"),
          round(sum(col("rc")).over(w).cast("double") / col("tc").cast("double"), 6)
            .as("cum_share"))
    }),

    // WELCH'S T-TEST from exact integer moments — the A/B readout
    // (urgent/high-priority orders vs the rest, per market segment) as
    // the q_corr discipline: ONE keyed join + ONE aggregation pass
    // accumulates n, Σx, Σx² per (segment, variant) as decimal(38,0)
    // (map-side combined — never a per-group sort or a second scan),
    // then mean/variance/t run in doubles cast from identical exact
    // integers, so both engines execute the same IEEE op sequence on
    // the same bits. Never Spark's stddev/var aggregates: their
    // streaming doubles are partition-order-dependent
    "ana_ab_ttest" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
      val o = t(s, d, "orders").select(col("o_custkey"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("va"),
        cents(col("o_totalprice")).as("pc"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val g = o.join(cust, o("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(
          sum(when(col("va"), 1L)).cast("bigint").as("n_a"),
          sum(when(!col("va"), 1L)).cast("bigint").as("n_b"),
          sum(when(col("va"), dec(col("pc")))).as("sa"),
          sum(when(!col("va"), dec(col("pc")))).as("sb"),
          sum(when(col("va"), dec(col("pc")) * dec(col("pc")))).as("qa"),
          sum(when(!col("va"), dec(col("pc")) * dec(col("pc")))).as("qb"))
        .filter(col("n_a") > 1 && col("n_b") > 1)
      val ma = dbl(col("sa")) / dbl(col("n_a"))
      val mb = dbl(col("sb")) / dbl(col("n_b"))
      val va = (dbl(col("qa")) - dbl(col("sa")) * dbl(col("sa")) / dbl(col("n_a"))) /
        (dbl(col("n_a")) - 1.0)
      val vb = (dbl(col("qb")) - dbl(col("sb")) * dbl(col("sb")) / dbl(col("n_b"))) /
        (dbl(col("n_b")) - 1.0)
      g.select(col("segment"), col("n_a"), col("n_b"),
        round(ma / 100.0, 6).as("mean_a"),
        round(mb / 100.0, 6).as("mean_b"),
        round((ma - mb) / sqrt(va / dbl(col("n_a")) + vb / dbl(col("n_b"))), 6)
          .as("t_stat"))
    }),

    // SEASONALITY INDEX — month-of-year decomposition: each calendar
    // month's average order value against the all-time average (index
    // > 1 = a hot month). ONE map-side-combined aggregate bounded by 12
    // groups; the grand total rides a broadcast 1-row cross join (never
    // a driver collect); index = two double divisions over exact cents
    "ana_seasonality" -> ((s, d) => {
      val per = t(s, d, "orders")
        .select(month(col("o_orderdate")).as("m"),
          cents(col("o_totalprice")).as("pc"))
        .groupBy("m")
        .agg(count(lit(1)).as("n_orders"), sum(col("pc")).cast("bigint").as("sc"))
      val tot = per.agg(sum(col("n_orders")).cast("bigint").as("tn"),
        sum(col("sc")).cast("bigint").as("tc"))
      val avgM = col("sc").cast("double") / col("n_orders").cast("double")
      val avgAll = col("tc").cast("double") / col("tn").cast("double")
      per.crossJoin(broadcast(tot))
        .select(col("m").cast("bigint").as("month"), col("n_orders"),
          round(avgM / 100.0, 6).as("avg_order_value"),
          round(avgM / avgAll, 6).as("seasonal_index"))
    }),

    // NEW vs RETURNING split per month — the growth readout every
    // subscription/marketplace dashboard leads with: an order is "new"
    // iff it lands in its customer's FIRST active month. First months
    // are one min-aggregate (map-side combined, state = customers);
    // the split then rides a broadcast-able keyed join — never a window
    // over the raw order stream
    "ana_new_vs_returning" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + (month(col("o_orderdate")) - 1)).as("mi"),
        cents(col("o_totalprice")).as("pc"))
      val first = o.groupBy("o_custkey").agg(min(col("mi")).as("fm"))
      o.join(first, "o_custkey")
        .groupBy(col("mi").cast("bigint").as("month_index"))
        .agg(
          sum(when(col("mi") === col("fm"), 1L).otherwise(0L)).cast("bigint").as("n_new"),
          sum(when(col("mi") =!= col("fm"), 1L).otherwise(0L)).cast("bigint").as("n_returning"),
          money(coalesce(sum(when(col("mi") === col("fm"), col("pc"))), lit(0L))
            .cast("bigint")).as("rev_new"),
          money(coalesce(sum(when(col("mi") =!= col("fm"), col("pc"))), lit(0L))
            .cast("bigint")).as("rev_returning"))
    }),

    // CHURN — the complement of ana_retention: users active in a 30-day
    // bucket with NO activity in the next one. Time bucket is pure
    // integer `div` on epoch-nanos (the ana_retention rule — calendar
    // months round-trip differently across engines). The "did they come
    // back" probe is a per-user lead() over the DE-DUPED activity set
    // (rows = user-months, never events): churned in mi iff the user's
    // NEXT active bucket is absent or skips mi+1 — ONE user-key shuffle
    // and no self-join (the first cut self-anti-joined a and a.shifted,
    // which planned 9 exchanges where this plans 4; per-reducer work is
    // bounded by buckets-per-user, a data constant). The final bucket
    // has no observable next month, so it is excluded via a 1-row
    // broadcast max — never a driver collect
    "ana_churn" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val mNs = 30L * 86400L * 1000000000L
      val a = t(s, d, "events")
        .select(col("user_id"), expr(s"ts div $mNs").as("mi")).distinct()
      val w = Window.partitionBy("user_id").orderBy("mi")
      a.withColumn("nxt", lead(col("mi"), 1).over(w))
        .crossJoin(broadcast(a.agg(max(col("mi")).as("mx"))))
        .filter(col("mi") < col("mx"))
        .groupBy(col("mi").as("month_index"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("nxt").isNull || col("nxt") > col("mi") + 1, 1L)
            .otherwise(0L)).cast("bigint").as("n_churned"))
    }),

    // STICKINESS (DAU/MAU) — the engagement-density readout: average
    // daily actives over monthly actives per 30-day bucket. One
    // (user, day) de-dup, then ONE aggregate per bucket (counts +
    // distincts — all integers); stickiness is two double divisions at
    // output, deterministic cross-engine
    "ana_stickiness" -> ((s, d) => {
      val dayNs = 86400L * 1000000000L
      t(s, d, "events")
        .select(col("user_id"), expr(s"ts div $dayNs").as("day")).distinct()
        .withColumn("mi", expr("day div 30"))
        .groupBy("mi")
        .agg(count(lit(1)).as("active_user_days"),
          count_distinct(col("day")).as("n_days"),
          count_distinct(col("user_id")).as("mau"))
        .select(col("mi").as("month_index"), col("active_user_days"),
          col("n_days"), col("mau"),
          round(col("active_user_days").cast("double") / col("n_days") / col("mau"), 6)
            .as("stickiness"))
    })
  )

  /** NTILE(`tiles`) over `(valueCol ASC, tiebreak ASC)` without the
    * one-reducer global sort: global rank from Rank.withGroupRank's
    * two-level construction (the `__g` constant group makes it a single
    * logical group range-partitioned across the cluster), then the exact
    * tile rule — first n%tiles tiles take ceil(n/tiles) rows (q_ntile's
    * arithmetic, proven ≡ native ntile by RankSpec + the q_ntile
    * oracle). The tiebreak columns are the caller's (they must make the
    * total order unique, or tile assignment is partition-dependent);
    * defaulting a key column here silently mis-ranked any non-orders
    * frame. Drops the rank/n helper columns so passes can chain. */
  private def tileN(df: org.apache.spark.sql.DataFrame, valueCol: String,
                    outCol: String, tiles: Int,
                    tiebreakCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(tiebreakCols.forall(df.columns.contains),
      s"tileN tiebreak columns ${tiebreakCols.mkString(",")} missing from " +
        df.columns.mkString(","))
    val ranked = graft.operators.Rank.withGroupRank(
      if (df.columns.contains("__g")) df else df.withColumn("__g", lit(1)),
      Seq("__g"), valueCol, tiebreakCols = tiebreakCols)
    def ceilDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor((a + b - lit(1)) / b).cast("bigint")
    val q = floor(col("n") / tiles).cast("bigint")
    val m = col("n") % tiles
    val cut = m * (q + lit(1))
    val tile = when(col("rank") <= cut, ceilDiv(col("rank"), q + lit(1)))
      .otherwise(m + ceilDiv(col("rank") - cut, greatest(q, lit(1))))
    ranked.withColumn(outCol, tile).drop("rank", "n")
  }

  val oracle: Map[String, String] = Map(
    "ana_text_price_join" ->
      """SELECT doc_id, concat_ws(',', source, lang) AS address, n_chars, label
         FROM documents JOIN embeddings ON doc_id = vec_id
         WHERE regexp_matches(text, '(?i)merge') OR lang = 'es' OR source = 'src1'
            OR EXISTS (SELECT 1 FROM events e WHERE e.user_id = documents.doc_id
                       AND regexp_matches(e.props, '"k": 4[0-9]'))""",
    "ana_nested_review_match" ->
      """WITH m AS (SELECT user_id, event_id, props,
                           regexp_matches(props, '"k": 4[0-9]') AS is_m
                    FROM events)
         SELECT user_id,
                count(*) AS n_reviews,
                count(CASE WHEN is_m THEN 1 END) AS n_matching,
                min(CASE WHEN is_m THEN event_id END) AS first_event,
                CAST(sum(CASE WHEN is_m THEN coalesce(try_cast(regexp_extract(props, '(\d+)', 1) AS BIGINT), 0) END) AS BIGINT) AS sum_k
         FROM m GROUP BY user_id
         HAVING count(CASE WHEN is_m THEN 1 END) > 0""",
    "ana_filtered_join" ->
      """SELECT c_custkey, c_name, n_name,
                CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE) / 100.0 AS acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA' AND c_mktsegment = 'BUILDING'""",
    "ana_median_by_group" ->
      """WITH m AS (SELECT l_returnflag,
                           '$' || format('{:,}', CAST(round(l_extendedprice * 100) AS BIGINT) // 100)
                               || '.' || lpad(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS price
                    FROM lineitem),
            p AS (SELECT l_returnflag,
                         CAST(CAST(replace(replace(price, '$', ''), ',', '') AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
                  FROM m)
         SELECT l_returnflag, count(*) AS n,
                percentile_cont(0.5) WITHIN GROUP (ORDER BY price_c) / 100.0 AS median_price
         FROM p GROUP BY l_returnflag""",
    "ana_avg_compare" ->
      """WITH agg AS (
           SELECT c_nationkey,
                  sum(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(round(c_acctbal * 100) AS BIGINT) END) AS s1,
                  count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n1,
                  sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN CAST(round(c_acctbal * 100) AS BIGINT) END) AS s2,
                  count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS n2
           FROM customer GROUP BY c_nationkey)
         SELECT n_name FROM agg JOIN nation ON c_nationkey = n_nationkey
         WHERE n1 > 0 AND n2 > 0 AND s1 * n2 < s2 * n1""",
    "ana_multiword_count" ->
      """SELECT lang, count(*) AS n_listings
         FROM documents
         WHERE regexp_matches(text, '(?i)spark') AND regexp_matches(text, '(?i)window')
           AND list_contains(string_split(text, ' '), 'vector')
         GROUP BY lang""",
    "ana_json_extract" ->
      """SELECT event_type,
                count(CAST(props->>'$.k' AS INT)) AS n_with_k,
                CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type""",
    "ana_regex_extract" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(TRY_CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
                max(TRY_CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT)) AS max_k
         FROM events GROUP BY event_type""",
    // stage-by-stage replay: each CTE carries only users that completed
    // the previous stage, with the strictly-after constraint
    "ana_funnel" ->
      """WITH u AS (SELECT user_id,
                           min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS t_view
                    FROM events GROUP BY 1),
           c AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t_click
                 FROM events e JOIN u USING (user_id)
                 WHERE e.event_type = 'click' AND epoch_ns(e.ts) > u.t_view
                 GROUP BY 1),
           p AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t_purchase
                 FROM events e JOIN c USING (user_id)
                 WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.t_click
                 GROUP BY 1)
         SELECT (SELECT count(*) FROM u WHERE t_view IS NOT NULL) AS n_view,
                (SELECT count(*) FROM c) AS n_click_after_view,
                (SELECT count(*) FROM p) AS n_purchase_after_click""",
    "ana_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
                           epoch_ns(ts) // 604800000000000 AS week FROM events),
           c AS (SELECT user_id, min(week) AS cohort_week FROM a GROUP BY 1)
         SELECT c.cohort_week, a.week - c.cohort_week AS offset,
                count(DISTINCT a.user_id) AS n_users
         FROM a JOIN c USING (user_id)
         GROUP BY 1, 2""",
    "ana_basket_lift" ->
      """WITH br AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
                     FROM lineitem JOIN part ON l_partkey = p_partkey),
           marg AS (SELECT brand, count(*) AS n FROM br GROUP BY 1),
           co AS (SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
                  FROM br a JOIN br b ON a.ok = b.ok AND a.brand < b.brand
                  GROUP BY 1, 2),
           tot AS (SELECT count(DISTINCT ok) AS nt FROM br)
         SELECT brand_a, brand_b, n_ab, ma.n AS n_a, mb.n AS n_b,
                round(CAST(nt * n_ab AS DOUBLE) / CAST(ma.n * mb.n AS DOUBLE), 6) AS lift
         FROM co
         CROSS JOIN tot
         JOIN marg ma ON ma.brand = co.brand_a
         JOIN marg mb ON mb.brand = co.brand_b""",
    "ana_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn,
                           CAST(round(value*100) AS BIGINT) AS vc
                    FROM events),
           m AS (SELECT *, CASE WHEN lag(tsn) OVER w IS NULL
                                  OR tsn - lag(tsn) OVER w > 1800000000000
                                THEN 1 ELSE 0 END AS new_s
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
           s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                            ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
                 FROM m)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                count(*) AS n_events,
                min(tsn) // 1000 AS start_us,
                (max(tsn) - min(tsn)) // 1000000000 AS dur_s,
                CAST(sum(vc) AS DOUBLE)/100.0 AS total_value
         FROM s GROUP BY 1, 2""",
    "ana_islands" ->
      """WITH a AS (SELECT DISTINCT user_id,
                           epoch_ns(ts) // 86400000000000 AS day FROM events),
           g AS (SELECT user_id, day,
                        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
                 FROM a)
         SELECT user_id, min(day) AS start_day, max(day) AS end_day,
                count(*) AS n_days
         FROM g GROUP BY user_id, grp""",
    // native ntile(4) per dimension — must equal the two-level rank +
    // exact tile rule (the q_ntile equivalence)
    "ana_rfm" ->
      """WITH o AS (SELECT o_custkey,
                           epoch_us(o_orderdate) // 86400000000 AS day,
                           CAST(round(o_totalprice*100) AS BIGINT) AS pc
                    FROM orders),
           c AS (SELECT o_custkey, max(day) AS last_day, count(*) AS f,
                        CAST(sum(pc) AS BIGINT) AS mc
                 FROM o GROUP BY 1),
           g AS (SELECT max(last_day) AS gmax FROM c),
           b AS (SELECT o_custkey, gmax - last_day AS r_days, f, mc FROM c, g),
           t AS (SELECT *,
                        CAST(ntile(4) OVER (ORDER BY r_days, o_custkey) AS BIGINT) AS r_score,
                        CAST(ntile(4) OVER (ORDER BY f, o_custkey) AS BIGINT) AS f_score,
                        CAST(ntile(4) OVER (ORDER BY mc, o_custkey) AS BIGINT) AS m_score
                 FROM b)
         SELECT o_custkey, r_days, f AS n_orders,
                CAST(mc AS DOUBLE)/100.0 AS monetary,
                r_score, f_score, m_score,
                r_score*100 + f_score*10 + m_score AS rfm
         FROM t""",
    "ana_pareto" ->
      """WITH c AS (SELECT o_custkey,
                           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mc
                    FROM orders GROUP BY 1),
           d AS (SELECT o_custkey, mc,
                        CAST(ntile(10) OVER (ORDER BY mc DESC, o_custkey) AS BIGINT) AS decile
                 FROM c),
           p AS (SELECT decile, count(*) AS n_customers,
                        CAST(sum(mc) AS BIGINT) AS rc
                 FROM d GROUP BY 1),
           tot AS (SELECT CAST(sum(rc) AS BIGINT) AS tc FROM p)
         SELECT decile, n_customers, CAST(rc AS DOUBLE)/100.0 AS revenue,
                round(CAST(sum(rc) OVER (ORDER BY decile
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      / CAST(tc AS DOUBLE), 6) AS cum_share
         FROM p, tot""",
    // same moment discipline: HUGEINT-exact sums, then the identical
    // double op sequence (division association mirrored term by term)
    "ana_ab_ttest" ->
      """WITH m AS (SELECT c.c_mktsegment AS segment,
                           o.o_orderpriority IN ('1-URGENT','2-HIGH') AS va,
                           CAST(round(o.o_totalprice*100) AS BIGINT) AS pc
                    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           g AS (SELECT segment,
                        CAST(count(*) FILTER (WHERE va) AS BIGINT) AS n_a,
                        CAST(count(*) FILTER (WHERE NOT va) AS BIGINT) AS n_b,
                        CAST(sum(CASE WHEN va THEN pc END) AS DOUBLE) AS sa,
                        CAST(sum(CASE WHEN NOT va THEN pc END) AS DOUBLE) AS sb,
                        CAST(sum(CASE WHEN va THEN CAST(pc AS HUGEINT)*pc END) AS DOUBLE) AS qa,
                        CAST(sum(CASE WHEN NOT va THEN CAST(pc AS HUGEINT)*pc END) AS DOUBLE) AS qb
                 FROM m GROUP BY 1)
         SELECT segment, n_a, n_b,
                round(sa/CAST(n_a AS DOUBLE)/100.0, 6) AS mean_a,
                round(sb/CAST(n_b AS DOUBLE)/100.0, 6) AS mean_b,
                round((sa/CAST(n_a AS DOUBLE) - sb/CAST(n_b AS DOUBLE))
                      / sqrt(((qa - sa*sa/CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)) / CAST(n_a AS DOUBLE)
                           + ((qb - sb*sb/CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)) / CAST(n_b AS DOUBLE)), 6) AS t_stat
         FROM g WHERE n_a > 1 AND n_b > 1""",
    "ana_seasonality" ->
      """WITH per AS (SELECT month(o_orderdate) AS m, count(*) AS n_orders,
                             CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sc
                      FROM orders GROUP BY 1),
           tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
                          CAST(sum(sc) AS BIGINT) AS tc FROM per)
         SELECT CAST(m AS BIGINT) AS month, n_orders,
                round(CAST(sc AS DOUBLE)/CAST(n_orders AS DOUBLE)/100.0, 6) AS avg_order_value,
                round((CAST(sc AS DOUBLE)/CAST(n_orders AS DOUBLE))
                      / (CAST(tc AS DOUBLE)/CAST(tn AS DOUBLE)), 6) AS seasonal_index
         FROM per, tot""",
    "ana_new_vs_returning" ->
      """WITH o AS (SELECT o_custkey,
                           year(o_orderdate)*12 + (month(o_orderdate)-1) AS mi,
                           CAST(round(o_totalprice*100) AS BIGINT) AS pc
                    FROM orders),
           f AS (SELECT o_custkey, min(mi) AS fm FROM o GROUP BY 1)
         SELECT CAST(o.mi AS BIGINT) AS month_index,
                CAST(sum(CASE WHEN o.mi = f.fm THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
                CAST(sum(CASE WHEN o.mi <> f.fm THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
                CAST(CAST(coalesce(sum(CASE WHEN o.mi = f.fm THEN pc END), 0) AS BIGINT) AS DOUBLE)/100.0 AS rev_new,
                CAST(CAST(coalesce(sum(CASE WHEN o.mi <> f.fm THEN pc END), 0) AS BIGINT) AS DOUBLE)/100.0 AS rev_returning
         FROM o JOIN f USING (o_custkey)
         GROUP BY 1""",
    "ana_churn" ->
      """WITH a AS (SELECT DISTINCT user_id,
                           epoch_ns(ts) // 2592000000000000 AS mi FROM events),
           mx AS (SELECT max(mi) AS m FROM a)
         SELECT a.mi AS month_index, count(*) AS n_active,
                CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
         FROM a LEFT JOIN a b ON b.user_id = a.user_id AND b.mi = a.mi + 1, mx
         WHERE a.mi < mx.m
         GROUP BY 1""",
    "ana_stickiness" ->
      """WITH ad AS (SELECT DISTINCT user_id,
                            epoch_ns(ts) // 86400000000000 AS day FROM events),
           g AS (SELECT user_id, day, day // 30 AS mi FROM ad)
         SELECT mi AS month_index, count(*) AS active_user_days,
                count(DISTINCT day) AS n_days, count(DISTINCT user_id) AS mau,
                round(CAST(count(*) AS DOUBLE) / count(DISTINCT day)
                      / count(DISTINCT user_id), 6) AS stickiness
         FROM g GROUP BY 1"""
  )
}

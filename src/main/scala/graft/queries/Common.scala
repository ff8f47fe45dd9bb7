package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query inventory (SURVEY.md §2).
  *
  * Cross-engine exactness rules (Spark result must hash-match DuckDB):
  *  - Money/doubles are converted to integer cents (`cents`) before any
  *    aggregation: double sums are partition-order-dependent, integer sums
  *    are exact and identical in every engine. Final outputs divide back to
  *    double (`money`), which is a deterministic IEEE op on both sides.
  *  - Timestamps are emitted as formatted strings, never raw.
  *  - Orderings always carry a unique tiebreak column.
  */
object Common {
  type QFn = (SparkSession, String) => DataFrame

  /** Exact integer cents from a 2-decimal double column. */
  def cents(c: Column): Column = round(c * lit(100)).cast("bigint")

  /** Integer cents back to a double for output (exact, deterministic). */
  def money(c: Column): Column = c.cast("double") / lit(100.0)

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.table(spark, dir, name)

  /** DuckDB replay of [[graft.operators.Hll.distinctEstimate]] over a
    * `(groupCol, k)` source CTE — registers from md5 integer arithmetic,
    * harmonic sum in BIGINT, one final double division under the shared
    * numerator literal. Shared by the relational and streaming sketch
    * oracles so the two can never drift. */
  def hllOracleSql(srcSql: String, groupCol: String): String =
    s"""WITH src AS ($srcSql),
         hh AS (SELECT $groupCol,
                       CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM src),
         rr AS (SELECT $groupCol, h >> 50 AS bucket,
                       CASE WHEN (h & ((1::BIGINT << 50) - 1)) = 0 THEN 51
                            ELSE 50 - length(bin(h & ((1::BIGINT << 50) - 1))) + 1
                       END AS rank
                FROM hh),
         regs AS (SELECT $groupCol, bucket, max(rank) AS reg
                  FROM rr GROUP BY 1, 2),
         agg AS (SELECT $groupCol,
                        count(*) AS n_buckets,
                        list_reduce(list_prepend(CAST(0 AS BIGINT),
                          list_transform(list(bucket * 64 + reg ORDER BY bucket),
                            x -> CAST(x AS BIGINT))),
                          (a, b) -> (a*131 + b) % 2147483647) AS reg_fp,
                        CAST(sum(1::BIGINT << (51 - reg)) AS BIGINT) AS s_obs
                 FROM regs GROUP BY 1)
       SELECT $groupCol, n_buckets, reg_fp,
              round((0.7213/(1.0 + 1.079/1024.0) * 1024.0 * 1024.0 * 2251799813685248.0)
                    / CAST(s_obs + (1024 - n_buckets) * (1::BIGINT << 51) AS DOUBLE), 6) AS est
       FROM agg"""

  /** DuckDB replay of [[graft.operators.QuantileSketch]] over a
    * `(groupCol, vc)` source CTE (vc = non-negative BIGINT cents):
    * HdrHistogram-style integer buckets (b = 6 sub-bits, stride 128),
    * cumulative walk, midpoint estimates at the given quantiles, money
    * division at output. The midpoint formula mirrors the Spark
    * expression term-for-term — every intermediate is an exactly
    * representable double, so the hash compare is bit-exact. Shared by
    * the relational and streaming quantile oracles. */
  def quantileSketchOracleSql(srcSql: String, groupCol: String,
                              qs: Seq[(String, Double)],
                              weighted: Boolean = false,
                              outScale: String = "/ 100.0",
                              nName: String = "n_events"): String = {
    val picks = qs.map { case (name, q) =>
      s"min(CASE WHEN cum >= ceil(n * $q) THEN rep END) $outScale AS $name"
    }.mkString(",\n              ")
    val wSel = if (weighted) ", w" else ""
    val cnt = if (weighted) "CAST(sum(w) AS BIGINT)" else "count(*)"
    s"""WITH src AS ($srcSql),
         bb AS (SELECT $groupCol, vc$wSel,
                       CAST(greatest(length(bin(vc)) - 1 - 6, 0) AS BIGINT) AS s
                FROM src),
         sk AS (SELECT $groupCol,
                       s * 128 + vc // CAST(pow(2.0, CAST(s AS DOUBLE)) AS BIGINT) AS bucket,
                       $cnt AS cnt
                FROM bb GROUP BY 1, 2),
         cc AS (SELECT $groupCol, bucket, cnt,
                       CAST(sum(cnt) OVER (PARTITION BY $groupCol ORDER BY bucket) AS BIGINT) AS cum,
                       CAST(sum(cnt) OVER (PARTITION BY $groupCol) AS BIGINT) AS n
                FROM sk),
         rr AS (SELECT $groupCol, cum, n,
                       (2.0 * CAST(bucket % 128 AS DOUBLE) * pow(2.0, CAST(bucket // 128 AS DOUBLE))
                         + (pow(2.0, CAST(bucket // 128 AS DOUBLE)) - 1.0)) / 2.0 AS rep
                FROM cc)
       SELECT $groupCol, CAST(max(n) AS BIGINT) AS $nName,
              $picks
       FROM rr GROUP BY 1"""
  }

  /** DuckDB replay of [[graft.operators.CountMin]]: cells from a
    * `(groupCols..., k)` `src` CTE, probes from a `(groupCols..., k)`
    * `watch` CTE — md5 60-bit hash, Kirsch–Mitzenmacher positions
    * mod 2048, SUM cells, est = min over the 4 probed cells (absent
    * cell = 0), mirroring the operator term-for-term. With an empty
    * `tail` the query SELECTs (k AS outKey, groupCols..., est); a
    * non-empty `tail` continues the WITH chain after the `est` CTE
    * (columns k, groupCols..., est). Shared by the relational and
    * streaming CMS oracles so the two can never drift. */
  def cmsOracleSql(srcSql: String, watchSql: String, grp: Seq[String],
                   outKey: String, tail: String = ""): String = {
    val gSel = grp.map(c => s"$c, ").mkString
    val useCols = (grp ++ Seq("j", "pos")).mkString(", ")
    val cellGrpNums = (1 to grp.length + 2).mkString(", ")
    val estGrpNums = (1 to grp.length + 1).mkString(", ")
    val h60 = "CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)"
    val pos = "((h & ((1::BIGINT << 30) - 1)) + j * ((h >> 30) | 1)) % 2048"
    val core =
      s"""WITH src AS ($srcSql),
         watch AS ($watchSql),
         sh AS (SELECT $gSel$h60 AS h FROM src),
         cells AS (SELECT ${gSel}j, $pos AS pos, count(*) AS cnt
                   FROM sh, range(0, 4) r(j) GROUP BY $cellGrpNums),
         wh AS (SELECT k, $gSel$h60 AS h FROM watch),
         probes AS (SELECT k, ${gSel}j, $pos AS pos
                    FROM wh, range(0, 4) r(j)),
         est AS (SELECT k, ${gSel}min(coalesce(cnt, CAST(0 AS BIGINT))) AS est
                 FROM probes LEFT JOIN cells USING ($useCols)
                 GROUP BY $estGrpNums)"""
    if (tail.isEmpty) s"$core SELECT k AS $outKey, ${gSel}est FROM est"
    else s"$core $tail"
  }
}

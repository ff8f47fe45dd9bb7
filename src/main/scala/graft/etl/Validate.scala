package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations over a table — the validation gate an ETL
  * pipeline runs before loading (the reference trusts pandas silently;
  * a lake load wants declared, measured constraints). Every check is an
  * aggregate over ONE scan: the checks fuse into a single `agg`, so
  * validating a 100 TB table costs one pass regardless of how many
  * constraints are declared. Referential checks run as anti-join counts
  * (broadcast when the parent side is a dimension).
  */
object Validate {

  final case class Check(name: String, metric: Column, passIf: Column => Column)

  /** Fraction of rows where `c` is non-null. */
  def completeness(name: String, c: Column): Check =
    Check(name, avg(when(c.isNotNull, 1.0).otherwise(0.0)), _ >= 1.0)

  /** Fraction of rows satisfying a predicate (null counts as failing). */
  def satisfies(name: String, pred: Column, atLeast: Double): Check =
    Check(name, avg(when(coalesce(pred, lit(false)), 1.0).otherwise(0.0)), _ >= atLeast)

  /** 1.0 iff `c` has no duplicate values (distinct count == count).
    * Empty input yields a null metric (ANSI would throw on 0/0), which
    * [[run]] fails closed. */
  def uniqueness(name: String, c: Column): Check =
    Check(name, when(count(c) > 0,
      countDistinct(c).cast("double") / count(c).cast("double")), _ >= 1.0)

  /** Run all checks in one aggregation pass; returns
    * (check, metric, passed) rows. FAILS CLOSED: a null metric (empty
    * table, all-null column) yields passed = false, never NULL — a gate
    * filtering on `passed === false` must see the problem, and a gate
    * filtering on `passed` must exclude the row; a three-valued NULL
    * satisfied neither. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val agg = df.agg(checks.head.metric.as(checks.head.name),
      checks.tail.map(c => c.metric.as(c.name)): _*)
    val rows = checks.map { c =>
      struct(lit(c.name).as("check"),
        round(col(c.name).cast("double"), 6).as("metric"),
        coalesce(c.passIf(col(c.name).cast("double")), lit(false)).as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.metric"), col("r.passed"))
  }

  /** Referential integrity: fraction of child keys present in the parent
    * key set (anti-join count; broadcast-friendly parents). Returned in
    * the same (check, metric, passed) shape as [[run]]. */
  def referential(name: String, child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame = {
    val total = child.select(col(childKey)).na.drop()
    val orphans = total.join(
      parent.select(col(parentKey).as(childKey)).distinct(), Seq(childKey), "left_anti")
    total.agg(count(lit(1)).as("n"))
      .crossJoin(orphans.agg(count(lit(1)).as("bad")))
      .select(lit(name).as("check"),
        round(lit(1.0) - col("bad").cast("double") / col("n").cast("double"), 6).as("metric"),
        (col("bad") === 0).as("passed"))
  }
}

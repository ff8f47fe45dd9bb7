package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{DotProduct, L2Norm, Md5Prefix31, MedianLong, MinKDistinct, MisraGriesCandidates, SimHash60, SortedIntersectCount}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works alongside the Column
  * API. Two entry points:
  *
  *  - `GraftFunctions.register(spark)` for an existing session;
  *  - `new GraftExtensions` via
  *    `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  *    `.withExtensions(...)` at session build time (the deployment path —
  *    executors and SQL-only clients get the functions without code
  *    changes).
  */
object GraftFunctions {

  /** Size parameters of the bounded-state aggregates must be plan-time
    * constants (they size the aggregation buffer, which exists before
    * any row is seen). */
  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: k must be an INTEGER literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_l2norm" -> (es => L2Norm(es.head)),
    "graft_simhash60" -> (es => SimHash60(es.head)),
    "graft_md5prefix31" -> (es => Md5Prefix31(es.head)),
    "graft_sorted_intersect" -> (es => SortedIntersectCount(es(0), es(1))),
    // bounded-state aggregates (the analyzer wraps AggregateFunctions):
    // k smallest distinct BIGINTs / Misra-Gries heavy-hitter candidates
    "graft_min_k" -> (es => MinKDistinct(es(0), intArg(es(1), "graft_min_k"))),
    "graft_heavy_candidates" ->
      (es => MisraGriesCandidates(es(0), intArg(es(1), "graft_heavy_candidates"))),
    // exact interpolated median of a BIGINT column (counting-median:
    // state is value→count, O(distinct values) not O(rows)) — the
    // SQL-surface scale-safe median (round-18 verdict item 6); see
    // expressions/MedianLongAgg.scala for the domain-boundedness contract
    "graft_median_long" -> (es => MedianLong(es.head)))

  def register(spark: SparkSession): Unit = all.foreach { case (name, builder) =>
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

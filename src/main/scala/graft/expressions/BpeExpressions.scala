package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy merge-table BPE encoding, callable from generated code. The
  * merge table is the standard frozen-tokenizer artifact (trained once on
  * a bounded sample — [[graft.functions.Bpe.train]] — then shipped); at
  * apply time it rides the plan as one reference object, so the per-row
  * work is a pure local fold with no shuffle, no broadcast join, no UDF
  * registry. Deterministic by construction: (lowest merge rank, leftmost
  * occurrence) is a total order over merge applications, which is what
  * lets the DuckDB oracle replay the encoding exactly (a recursive CTE
  * applying the same rule). */
object BpeUtil {

  /** Rank lookup keyed "left right" — tokens can never contain a space
    * (words are the space-split units), so the space-joined key is
    * collision-free. */
  final class Table(val ranks: java.util.HashMap[String, Integer]) extends Serializable

  def buildTable(merges: Seq[(String, String)]): Table = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    new Table(m)
  }

  /** Total BPE token count of a text: words = single-space split (the
    * `tokens()` rule), empties skipped; each word encodes independently
    * by repeated (lowest-rank, leftmost) pair merging until no adjacent
    * pair is in the table. Codepoint-based char split, so the count is
    * engine-portable (DuckDB `substr` steps codepoints too). */
  def countTokens(text: UTF8String, t: Table): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) total += countWord(s, start, i, t)
        start = i + 1
      }
      i += 1
    }
    total
  }

  private def countWord(s: String, from: Int, until: Int, t: Table): Int = {
    // split to codepoint tokens
    val toks = new java.util.ArrayList[String](until - from)
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      toks.add(s.substring(i, i + w))
      i += w
    }
    // greedy: merge the leftmost occurrence of the lowest-rank pair,
    // repeat until no adjacent pair is in the table. One-at-a-time is
    // value-identical to the classic merge-all-occurrences-LTR rule
    // (a freshly-merged token forms a DIFFERENT pair with its neighbor,
    // so remaining occurrences of the best pair stay best).
    while (true) {
      var best = Integer.MAX_VALUE
      var bi = -1
      var j = 0
      while (j < toks.size - 1) {
        val r = t.ranks.get(toks.get(j) + " " + toks.get(j + 1))
        if (r != null && r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) return toks.size
      toks.set(bi, toks.get(bi) + toks.get(bi + 1))
      toks.remove(bi + 1)
    }
    0 // unreachable
  }
}

/** Total greedy-BPE token count of a string column under a fixed merge
  * table. Codegen-friendly: the table is a plan reference object and the
  * generated code is one static call per row. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val table = BpeUtil.buildTable(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"expects STRING, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    BpeUtil.countTokens(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeUtil.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.expressions.BpeUtil.countTokens($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeExpressions {
  def bpeTokenCount(c: Column, merges: Seq[(String, String)]): Column =
    GraftShim.column(BpeTokenCount(GraftShim.expression(c), merges))
}

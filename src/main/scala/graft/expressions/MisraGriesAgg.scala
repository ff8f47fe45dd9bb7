package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** BOUNDED-STATE heavy-hitter CANDIDATE aggregate — Misra–Gries k-counter
  * summaries with the Agarwal et al. mergeable-summaries merge rule.
  *
  * The guarantee this engine builds on: any key whose true frequency
  * exceeds n/(k+1) SURVIVES in the final summary under EVERY update and
  * merge order (each decrement/subtraction step removes k+1 counts of
  * distinct keys, so a > n/(k+1) key can never be driven to zero). The
  * candidate SET beyond the guaranteed survivors is order-dependent —
  * which is why [[graft.operators.HeavyKeys]] treats this stage purely as
  * a candidate generator and derives its deterministic output from an
  * exact recount: the summary prunes the key space from unbounded to ≤ k,
  * the recount restores exactness.
  *
  * State: ≤ k (key, count) pairs per partial; update is O(1) amortized
  * (the decrement-all step is O(k), paid only on a miss with a full
  * summary); merge adds counts then subtracts the (k+1)-th largest.
  * Nulls ignored (the MinKDistinct convention — callers guard).
  */
case class MisraGriesCandidates(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"MisraGriesCandidates: k must be positive, got $k")

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"expects BIGINT, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_candidates"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val cur = buf.get(key)
      if (cur != null) { buf.put(key, cur + 1L); () }
      else if (buf.size < k) { buf.put(key, java.lang.Long.valueOf(1L)); () }
      else decrementAll(buf)
    }
    buf
  }

  // the MG step: a miss with a full summary cancels one occurrence of
  // every tracked key (plus the missed one) — k+1 distinct keys lose one
  private def decrementAll(buf: Buf): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (b1.size > k) {
      // Agarwal merge: subtract the (k+1)-th largest count from every
      // counter — removes ≥ (size-k) keys while preserving the survival
      // guarantee (each subtraction step cancels ≥ k+1 counts of
      // distinct keys)
      val counts = new Array[Long](b1.size)
      var i = 0
      val vi = b1.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val ei = b1.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= cut) ei.remove() else e.setValue(e.getValue - cut)
      }
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out) // stable presentation; the SET is what matters
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MisraGriesAgg {
  /** Aggregate column: ascending array of ≤ k candidate keys — a
    * guaranteed superset of every key with frequency > n/(k+1). */
  def candidates(c: Column, k: Int): Column =
    GraftShim.column(
      MisraGriesCandidates(GraftShim.expression(c), k).toAggregateExpression())
}

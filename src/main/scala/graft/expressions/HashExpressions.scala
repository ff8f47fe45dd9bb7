package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers callable from generated code. */
object HashUtil {
  private val md5Pool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 32 bits of md5 (== parsing the first 8 hex chars) mod 2^31-1 —
    * value-identical to `conv(substr(md5(s),1,8),16,10) % 2147483647` and
    * to DuckDB `CAST('0x'||substr(md5(g),1,8) AS BIGINT) % 2147483647`,
    * without materializing the hex string. */
  def md5Prefix31(s: UTF8String): Long = {
    val d = md5Pool.get()
    d.reset()
    val b = d.digest(s.getBytes)
    val u = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    u % 2147483647L
  }

  // unboxed copies of the universal-hash parameters: the k×|shingles| inner
  // loop must not pay Vector boxing per access
  private val A: Array[Long] = graft.functions.TextFunctions.MinhashA.toArray
  private val B: Array[Long] = graft.functions.TextFunctions.MinhashB.toArray
  private final val P = 2147483647L

  /** x mod (2^31−1) for 0 ≤ x < 2^63, by Mersenne folding: 2^31 ≡ 1
    * (mod p), so x = q·2^31 + r ≡ q + r. Two folds bring x under 2p; one
    * conditional subtract finishes. Value-identical to `x % p` (the DuckDB
    * oracle's form) at ~3× the throughput of hardware 64-bit modulo. */
  @inline private def modP(x: Long): Long = {
    var y = (x >>> 31) + (x & P)
    y = (y >>> 31) + (y & P)
    if (y >= P) y - P else y
  }

  /** Fused char-n-gram shingle → 31-bit-hash set: one pass over the text,
    * one md5 per position, dedup + ascending sort via TreeSet — replaces
    * the four-op HOF pipeline (substring transform, distinct, hash
    * transform, sort) and its per-shingle string allocations. Value-
    * identical to `array_sort(array_distinct(transform(shingles,
    * md5prefix31)))` over `charShingles(text, n)`. */
  def shingleHashes31(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 1
    while (i <= len - n + 1) {
      set.add(md5Prefix31(s.substringSQL(i, n)))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED long arrays by linear merge — no
    * hash-set allocation per row (Spark's `array_intersect` builds one),
    * which dominates when millions of candidate pairs each intersect
    * ~1000-element shingle sets. */
  def sortedIntersect(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** One-pass k-way minhash over pre-hashed shingles, using the fixed
    * universal-hash parameters from `TextFunctions.MinhashA/B`.
    * (A(j) < p and h < p, so A(j)·h + B(j) < 2^62 + 2^31 — no overflow.) */
  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = modP(A(j) * h + B(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins.map(Long.box(_): Any))
  }
}

/** `hash31` as a native expression: md5-prefix 31-bit hash of a string. */
case class Md5Prefix31(child: Expression) extends UnaryExpression {
  // declared input contract: wrong-typed SQL input (through the
  // graft_* registry) must fail analysis, not reinterpret bytes
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"expects STRING, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    HashUtil.md5Prefix31(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.md5Prefix31($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass k-way minhash signature over an array<bigint> of shingle
  * hashes. Replaces k separate `transform`+`array_min` passes (k·n
  * interpreted lambda calls per row) with one fused loop. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  // declared input contract: wrong-typed SQL input (through the
  // graft_* registry) must fail analysis, not reinterpret bytes
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"expects ARRAY<BIGINT>, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    HashUtil.minhashSig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.minhashSig($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** |A ∩ B| for two sorted long-array columns (see HashUtil.sortedIntersect).
  * Callers guarantee sortedness (arrays built with `array_sort`). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expects two ARRAY<BIGINT>, got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.sortedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashUtil.sortedIntersect($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sorted distinct 31-bit shingle-hash set of a text column (see
  * HashUtil.shingleHashes31). */
case class ShingleHashes31(child: Expression, n: Int) extends UnaryExpression {
  // declared input contract: wrong-typed SQL input (through the
  // graft_* registry) must fail analysis, not reinterpret bytes
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"expects STRING, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HashUtil.shingleHashes31(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.shingleHashes31($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashExpressions {
  def md5prefix31(c: Column): Column = GraftShim.column(Md5Prefix31(GraftShim.expression(c)))
  def shingleHashes31Native(text: Column, n: Int): Column =
    GraftShim.column(ShingleHashes31(GraftShim.expression(text), n))
  def minhashSigNative(hashes: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(hashes), k))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCount(GraftShim.expression(a), GraftShim.expression(b)))
}

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
    * one md5 per position, dedup + ascending sort — replaces the four-op
    * HOF pipeline (substring transform, distinct, hash transform, sort)
    * and its per-shingle string allocations. Value-identical to
    * `array_sort(array_distinct(transform(shingles, md5prefix31)))` over
    * `charShingles(text, n)`.
    *
    * Allocation profile (this sits under ~10M calls per 5k docs): the
    * text's bytes are materialized ONCE, each shingle is digested straight
    * from that buffer via (offset, length) — no per-shingle UTF8String or
    * byte[] — the 16-byte digest lands in a reused thread-local buffer,
    * and dedup+sort runs on a primitive long[] (sort + unique scan)
    * instead of a boxing TreeSet. Shingle positions step CODE POINTS (the
    * same positions `substring` would produce): for pure-ASCII text byte
    * offsets are char offsets; multi-byte text walks UTF-8 lead bytes. */
  private val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** UTF-8 length of the code point starting at `b(i)` — delegated to
    * Spark's own table so char stepping is bit-identical to `substring`'s
    * (including its treatment of invalid lead bytes). */
  @inline private def cpLen(b: Array[Byte], i: Int): Int =
    UTF8String.numBytesForFirstByte(b(i))

  def shingleHashes31(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // char starts: for ASCII, identity; else walk UTF-8 lead bytes once
    var nChars = 0
    var ascii = true
    var i = 0
    while (i < bytes.length) {
      val step = cpLen(bytes, i)
      if (step > 1) ascii = false
      i += step
      nChars += 1
    }
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val nOut = nChars - n + 1
    val hs = new Array[Long](nOut)
    val md = md5Pool.get()
    val out16 = digestBuf.get()
    if (ascii) {
      var p = 0
      while (p < nOut) {
        md.reset()
        md.update(bytes, p, n)
        md.digest(out16, 0, 16)
        val u = ((out16(0) & 0xffL) << 24) | ((out16(1) & 0xffL) << 16) |
          ((out16(2) & 0xffL) << 8) | (out16(3) & 0xffL)
        hs(p) = u % 2147483647L
        p += 1
      }
    } else {
      // starts(c) = byte offset of char c; shingle c spans starts(c) until
      // starts(c+n) (exclusive)
      val starts = new Array[Int](nChars + 1)
      var c = 0
      var b = 0
      while (b < bytes.length) { starts(c) = b; b += cpLen(bytes, b); c += 1 }
      starts(nChars) = bytes.length
      var p = 0
      while (p < nOut) {
        md.reset()
        md.update(bytes, starts(p), starts(p + n) - starts(p))
        md.digest(out16, 0, 16)
        val u = ((out16(0) & 0xffL) << 24) | ((out16(1) & 0xffL) << 16) |
          ((out16(2) & 0xffL) << 8) | (out16(3) & 0xffL)
        hs(p) = u % 2147483647L
        p += 1
      }
    }
    java.util.Arrays.sort(hs)
    // in-place unique scan over the sorted primitives
    var w = 0
    var r = 0
    while (r < nOut) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    val boxed = new Array[Any](w)
    var j = 0
    while (j < w) { boxed(j) = hs(j); j += 1 }
    new GenericArrayData(boxed)
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

  /** Count of positions where two equal-length long arrays agree —
    * the minhash-signature agreement statistic (agree/k is an unbiased
    * jaccard estimator with sd sqrt(j(1-j)/k)). Null elements never
    * match. */
  def positionalAgree(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
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

/** Positional agreement count of two minhash signatures (see
  * HashUtil.positionalAgree). */
case class PositionalAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expects two ARRAY<BIGINT>, got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.positionalAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashUtil.positionalAgree($a, $b)")

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
  def positionalAgree(a: Column, b: Column): Column =
    GraftShim.column(PositionalAgree(GraftShim.expression(a), GraftShim.expression(b)))
}

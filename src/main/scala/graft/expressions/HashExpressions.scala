package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
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

  /** One-pass k-way minhash over pre-hashed shingles, using the fixed
    * universal-hash parameters from `TextFunctions.MinhashA/B`. */
  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val A = graft.functions.TextFunctions.MinhashA
    val B = graft.functions.TextFunctions.MinhashB
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (A(j) * h + B(j)) % 2147483647L
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
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    HashUtil.minhashSig(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.minhashSig($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashExpressions {
  def md5prefix31(c: Column): Column = GraftShim.column(Md5Prefix31(GraftShim.expression(c)))
  def minhashSigNative(hashes: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(hashes), k))
}

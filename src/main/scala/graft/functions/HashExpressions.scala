package org.apache.spark.sql.graftfn

// Lives under org.apache.spark.sql for the same reason as
// VectorExpressions/BloomExpressions: the private[sql]
// Column↔Expression bridge (classic.ExpressionUtils).

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by the interpreted and generated paths (same
  * bytes both ways; the JIT inlines the static call inside whole-stage
  * codegen). A thread-local MessageDigest avoids the per-call
  * getInstance allocation — the JDK's MD5 digest object is reusable
  * after digest() resets it.
  */
object HashKernel {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned value of the first 6 digest bytes — NUMERICALLY IDENTICAL
    * to `conv(substring(md5(s), 1, 12), 16, 10)` (12 hex nibbles = 6
    * bytes), without materializing the 32-char hex string.
    */
  def md5Prefix48(s: UTF8String): Long = {
    val d = md5.get().digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}

/** `graft_md5_prefix48(str)` — the engine-portable 48-bit hash every
  * md5-derived operator keys on (feature buckets, CM cells, hash splits,
  * DSIR buckets), fused into ONE codegen'd expression. The composed
  * built-in form (`md5` → 32-char hex UTF8String → `substring` →
  * `conv` → cast) allocates two strings and parses hex per call; this
  * computes the same LONG straight from the digest bytes. Oracles are
  * untouched: DuckDB replays the hex-nibble decode and lands on the
  * same value by construction.
  */
case class Md5Prefix48(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix48"

  override def nullSafeEval(s: Any): Any =
    HashKernel.md5Prefix48(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graftfn.HashKernel.md5Prefix48($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  /** Column wrapper: unsigned 48-bit md5 prefix of a string column. */
  def md5Prefix48(s: Column): Column =
    ExpressionUtils.column(Md5Prefix48(ExpressionUtils.expression(s)))
}

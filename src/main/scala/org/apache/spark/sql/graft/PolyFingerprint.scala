package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: Σ_i codepoint(i) · 31^(i mod 8), mod 1e9+7 — exact integer
  * polynomial hash over the string's code points (1-indexed like the SQL form).
  *
  * Replaces the `aggregate(sequence(1, length(s)), ..., ascii(substring(s, i, 1)) ...)`
  * higher-order-function fold: `substring(s, i, 1)` is an O(i) seek in UTF8String, so
  * the fold is O(len²) per document plus a lambda frame per character. This is one
  * linear pass under whole-stage codegen. Semantics are pinned to the DuckDB oracle
  * (`ascii(substr(text, i, 1))` = the i-th code point; empty string → 0, matching the
  * engine-side empty-doc guard).
  *
  * Bound: 600 chars × cp≤0x10FFFF × 31^7 ≈ 2^62 worst case per term and the running sum
  * is reduced mod p every step, so no 64-bit overflow.
  */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_fingerprint"

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.PolyFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {

  private val Mod = 1000000007L
  private val Pows: Array[Long] = {
    val a = new Array[Long](8)
    a(0) = 1L
    (1 until 8).foreach(i => a(i) = a(i - 1) * 31L)
    a
  }

  /** Shared by interpreted eval and codegen (called via the static forwarder). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0   // code-point index (the SQL form's i - 1)
    var ci = 0  // java char index
    val len = str.length
    while (ci < len) {
      val cp = str.codePointAt(ci)
      acc = (acc + cp.toLong * Pows(i % 8)) % Mod
      ci += Character.charCount(cp)
      i += 1
    }
    acc
  }

  def column(str: Column): Column =
    ExpressionUtils.column(PolyFingerprint(ExpressionUtils.expression(str)))
}

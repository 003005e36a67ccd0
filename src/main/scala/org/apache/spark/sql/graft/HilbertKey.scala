package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Hilbert-curve index of a 2-D point (low `bits` bits per dimension), whole-stage
  * codegen'd.
  *
  * The classic xy→d walk carries per-level rotation/reflection STATE (swap and flip
  * of the working coordinates), so unlike the Morton interleave it cannot unroll into
  * a flat bit-expression: as nested `Column`s each level's (x', y', d') references the
  * previous level's twice and the expression tree grows ~3^bits. A custom expression
  * with a primitive loop is the honest shape (`doGenCode` compiles to `bits`
  * iterations of shift/mask/branch — one fused span, no allocation).
  *
  * Algorithm: the standard top-down quadrant walk (Hamilton's convert_to_hilbert /
  * Wikipedia xy2d): at scale s, quadrant digit = gray(3·rx ⊕ ry) weighted s², then
  * rotate/reflect the frame for the next level. Deterministic pure-integer output,
  * mirrored level-by-level by the o02 oracle SQL CTE chain.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression
    with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"hilbert bits per dimension out of range: $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.encode(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mask = (1L << bits) - 1
      // freshName everywhere: several keys can share one codegen'd projection
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $x = $s - 1L - $x;
         |      $y = $s - 1L - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {

  /** Interpreted twin of the generated loop (also the spec's reference). */
  def encode(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-level wrapper for use from the public `graft` packages. */
  def column(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(
      HilbertKey(ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))
}

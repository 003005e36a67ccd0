package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns with whole-stage codegen.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, *), 0.0, +)`)
  * allocates a lambda frame per element — at 2M candidate pairs × 64 dims that's the
  * entire runtime of a similarity scan. This expression compiles to a tight primitive
  * loop instead (custom `Expression` with `doGenCode` beats composed HOFs in the hot
  * path). Hosted under `org.apache.spark.sql` because the expression-extension API
  * (`AbstractDataType`, `ExpressionUtils`) is `private[sql]` — the standard pattern for
  * Spark extension libraries.
  *
  * Semantics are pinned to the oracle: strict left-to-right summation, so the result is
  * bit-identical to the sequential fold (and comparable with DuckDB's `list_dot_product`).
  * Arrays of unequal length dot over the common prefix; null elements contribute 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed locals: when both children are non-nullable the generated
      // block is unbraced in the enclosing method, and one projection routinely holds
      // several DotProducts (cosine alone builds three) — fixed names would collide and
      // Janino-fail the whole stage back to interpreted mode.
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level wrapper for use from the public `graft` packages. */
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

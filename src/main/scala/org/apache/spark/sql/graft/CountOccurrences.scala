package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Number of non-overlapping, left-to-right occurrences of `right` in `left`.
  *
  * Replaces the `(length(s) - length(regexp_replace(s, needle, ''))) / length(needle)`
  * idiom: that form walks the string through a full regex engine once per needle — with
  * 15 marker words (language-ID) it dominated the text-analysis scan. This is a tight
  * `UTF8String.indexOf` loop under whole-stage codegen; counts are identical to the
  * replace-based form (both remove/skip matches left-to-right without overlap) and to
  * DuckDB's `(length - length(replace)) // len` oracle arithmetic.
  *
  * An empty needle yields 0 (the replace-based idiom is 0/0 there; callers never pass
  * empty needles — pinned rather than undefined).
  */
case class CountOccurrences(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_occurrences"

  override def nullSafeEval(a: Any, b: Any): Any =
    CountOccurrences.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = org.apache.spark.sql.graft.CountOccurrences.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CountOccurrences =
    copy(left = newLeft, right = newRight)
}

object CountOccurrences {

  /** Shared by interpreted eval and codegen (called via the static forwarder). */
  def compute(s: UTF8String, needle: UTF8String): Long = {
    val n = needle.numChars()
    if (n == 0) return 0L
    var count = 0L
    var idx = s.indexOf(needle, 0)
    while (idx >= 0) {
      count += 1
      idx = s.indexOf(needle, idx + n)
    }
    count
  }

  def column(str: Column, needle: Column): Column =
    ExpressionUtils.column(
      CountOccurrences(ExpressionUtils.expression(str), ExpressionUtils.expression(needle)))
}

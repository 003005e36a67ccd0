package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting the DISTINCT word n-gram shingles of a text column — one output
  * row per distinct shingle, exactly `array_distinct` of the sliding windows of the
  * space-split tokens (split keeps empty tokens, like `split(text, " ", -1)` /
  * DuckDB `string_split`).
  *
  * Replaces the `explode(transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n))))
  * .distinct()` formulation twice over: higher-order functions evaluate interpreted
  * (lambda frame + array copies per window — measured as the dominant cost of the
  * n-gram pipeline), and per-document dedup inside the generator makes the global
  * `distinct()` SHUFFLE unnecessary when the id column is unique per input row (one
  * document = one row, so cross-partition (id, shingle) duplicates cannot exist).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  override def prettyName: String = "graft_word_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return Nil
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[InternalRow](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = InternalRow(UTF8String.fromString(it.next()))
      k += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))
}

/** Generator emitting EVERY word n-gram window of a text column WITH its 1-based
  * start position — one output row per window, duplicates included. The positioned,
  * occurrence-level sibling of [[WordShingles]] (which dedups per document and drops
  * positions): span-level dedup (maximal duplicated substring detection) needs the
  * position to merge adjacent duplicated windows into maximal spans, and
  * importance-resampling feature counts need occurrence multiplicity, so neither can
  * ride on the distinct generator. Same tokenization contract: split on single
  * spaces, empty tokens kept, equivalent to DuckDB
  * `generate_series(1, len(ts) - n + 1)` over `string_split(text, ' ')`.
  */
case class PositionedWordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with Generator
    with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType =
    new StructType()
      .add("pos", org.apache.spark.sql.types.LongType, nullable = false)
      .add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  override def prettyName: String = "graft_positioned_word_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return Nil
    val out = new Array[InternalRow](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = InternalRow((i + 1).toLong, UTF8String.fromString(sb.toString))
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PositionedWordShingles =
    copy(child = newChild)
}

object PositionedWordShingles {
  def column(text: Column, n: Int): Column =
    ExpressionUtils.column(PositionedWordShingles(ExpressionUtils.expression(text), n))
}

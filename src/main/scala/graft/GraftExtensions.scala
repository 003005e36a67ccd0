package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft._

/** Spark extension entry point: registers the engine's native Catalyst expressions as
  * SQL functions, so the full surface is reachable from `spark.sql(...)` (and from any
  * SQL-only client of a cluster started with
  * `--conf spark.sql.extensions=graft.GraftExtensions`) — the standard way a Spark
  * library ships custom expressions without forking the session bootstrap.
  *
  * Registered functions (all codegen'd or ObjectHashAggregate-friendly — identical
  * physical behavior to the `Column` API in `graft.functions`):
  *
  *   - `graft_dot(array<double>, array<double>)` — strict left-to-right dot product
  *   - `graft_count_occurrences(str, needle)` — non-overlapping substring count
  *   - `graft_fingerprint(str)` — 63-bit polynomial rolling hash of a document
  *   - `graft_shingles(str, n)` — generator: per-document-distinct word n-grams
  *   - `graft_positioned_shingles(str, n)` — generator: EVERY word n-gram window with
  *     its 1-based start position (occurrence-level — span dedup / feature counts)
  *   - `graft_kth_smallest(major, minor, k)` — aggregate: k-th smallest (major, minor)
  *     pair as a struct, bounded k-heap per group
  *   - `graft_lww_winner(position, updated_at, count, state)` — aggregate: the
  *     last-writer-wins edge cell under (updated_at, state-priority) domination
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression): FunctionBuilder =
    (args: Seq[Expression]) => {
      require(args.length == n, s"$name expects $n arguments, got ${args.length}")
      build(args)
    }

  private def literalInt(name: String, arg: Expression): Int = arg.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  /** (identifier, info, builder) triples in the shape `injectFunction` consumes. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double> columns"),
      arity("graft_dot", 2)(a => DotProduct(a(0), a(1)))),
    (FunctionIdentifier("graft_count_occurrences"),
      info("graft_count_occurrences",
        "graft_count_occurrences(str, needle) - non-overlapping occurrence count"),
      arity("graft_count_occurrences", 2)(a => CountOccurrences(a(0), a(1)))),
    (FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "graft_fingerprint(str) - 63-bit polynomial rolling hash"),
      arity("graft_fingerprint", 1)(a => PolyFingerprint(a(0)))),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles",
        "graft_shingles(str, n) - generator of per-document-distinct word n-grams"),
      arity("graft_shingles", 2)(a =>
        WordShingles(a(0), literalInt("graft_shingles", a(1))))),
    (FunctionIdentifier("graft_positioned_shingles"),
      info("graft_positioned_shingles",
        "graft_positioned_shingles(str, n) - generator of (pos, shingle) word n-gram windows"),
      arity("graft_positioned_shingles", 2)(a =>
        PositionedWordShingles(a(0), literalInt("graft_positioned_shingles", a(1))))),
    (FunctionIdentifier("graft_kth_smallest"),
      info("graft_kth_smallest",
        "graft_kth_smallest(major, minor, k) - aggregate: k-th smallest (major, minor)"),
      arity("graft_kth_smallest", 3)(a => KthSmallest(a(0), a(1), a(2)))),
    (FunctionIdentifier("graft_lww_winner"),
      info("graft_lww_winner",
        "graft_lww_winner(position, updated_at, count, state) - aggregate: LWW edge cell"),
      arity("graft_lww_winner", 4)(a => LwwWinner(a(0), a(1), a(2), a(3))))
  )
}

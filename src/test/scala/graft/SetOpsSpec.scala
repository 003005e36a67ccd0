package graft

import graft.model._
import graft.queries._
import graft.store.EdgeStore

/** Set-operator goldens — from the reference operator specs over in-memory relations
  * (FIXTURES.md §2.3: `unit/IntersectionQuerySpec`, `unit/UnionQuerySpec`,
  * `unit/DifferenceQuerySpec`) and the end-to-end compound fixtures (§2.5,
  * `integration/SelectCompilerSpec.scala:33-49`).
  */
class SetOpsSpec extends SparkSpec {

  private def neighbors(src: Long, ids: Seq[Long]): Seq[Edge] =
    ids.map(d => edge(src, d, pos = d * 10))

  private def sel(node: QueryNode, store: EdgeStore, count: Int, cursor: Long) = {
    val r = node.select(store, Page(count, cursor))
    (r.items, r.nextCursor, r.prevCursor)
  }

  // q1 = [1..10], q2 = [1,2,3,4,11]
  private lazy val store1 = storeOf(
    (neighbors(100L, 1L to 10L) ++ neighbors(200L, Seq(1L, 2L, 3L, 4L, 11L))): _*
  )
  private val q1 = Select(100L, FOLLOWS)
  private val q2 = Select(200L, FOLLOWS)

  test("intersection selectPage(5, Start) -> ([4,3,2,1], End, End)") {
    assert(sel(IntersectNode(q1, q2), store1, 5, Cursor.Start) ==
      (Seq(4L, 3L, 2L, 1L), Cursor.End, Cursor.End))
  }

  test("union selectPage(10, cursor 9) -> ([8..1], End, -8)") {
    assert(sel(UnionNode(q1, q2), store1, 10, 9L) ==
      (Seq(8L, 7L, 6L, 5L, 4L, 3L, 2L, 1L), Cursor.End, -8L))
  }

  test("union sizeEstimate = max of sides") {
    assert(UnionNode(q1, q2).sizeEstimate(store1, GraftConfig()) == 10L)
  }

  test("intersection sizeEstimate = min * proportion") {
    assert(IntersectNode(q1, q2).sizeEstimate(store1, GraftConfig()) ==
      (math.min(10, 5) * 0.1).toLong)
  }

  // difference fixture: q1 = [1..12], q2 = [3,4,7,11]
  private lazy val store2 = storeOf(
    (neighbors(100L, 1L to 12L) ++ neighbors(200L, Seq(3L, 4L, 7L, 11L))): _*
  )

  test("difference selectPage(5, Start) -> ([12,10,9,8,6], 6, End)") {
    assert(sel(DifferenceNode(q1, q2), store2, 5, Cursor.Start) ==
      (Seq(12L, 10L, 9L, 8L, 6L), 6L, Cursor.End))
  }

  test("difference selectPage(10, cursor 12) -> ([10,9,8,6,5,2,1], End, -10)") {
    assert(sel(DifferenceNode(q1, q2), store2, 10, 12L) ==
      (Seq(10L, 9L, 8L, 6L, 5L, 2L, 1L), Cursor.End, -10L))
  }

  test("difference sizeEstimate = left size") {
    assert(DifferenceNode(q1, q2).sizeEstimate(store2, GraftConfig()) == 12L)
  }

  // §2.5 setup1: alice→{bob,carl,darcy}, carl→{bob,darcy}; alice ∩ carl
  private lazy val store3 = storeOf(
    (neighbors(alice, Seq(bob, carl, darcy)) ++ neighbors(carl, Seq(bob, darcy))): _*
  )

  test("compound fixture: alice ∩ carl paged 1-at-a-time with exact cursors") {
    val node = IntersectNode(Select(alice, FOLLOWS), Select(carl, FOLLOWS))
    assert(sel(node, store3, 1, Cursor.Start) == (Seq(darcy), darcy, Cursor.End))
    assert(sel(node, store3, 1, darcy) == (Seq(bob), Cursor.End, -bob))
    assert(sel(node, store3, 2, Cursor.Start) == (Seq(darcy, bob), Cursor.End, Cursor.End))
  }

  // §2.5 setup2: alice→1..10, bob→{2,4,6,8,10,12}; alice − bob
  private lazy val store4 = storeOf(
    (neighbors(alice, 1L to 10L) ++ neighbors(bob, Seq(2L, 4L, 6L, 8L, 10L, 12L))): _*
  )

  test("compound fixture: alice − bob pagination walk") {
    val node = DifferenceNode(Select(alice, FOLLOWS), Select(bob, FOLLOWS))
    assert(sel(node, store4, 10, Cursor.Start) == (Seq(9L, 7L, 5L, 3L, 1L), Cursor.End, Cursor.End))
    assert(sel(node, store4, 2, Cursor.Start) == (Seq(9L, 7L), 7L, Cursor.End))
    assert(sel(node, store4, 2, 7L) == (Seq(5L, 3L), 3L, -5L))
    assert(sel(node, store4, 2, 3L) == (Seq(1L), Cursor.End, -1L))
  }

  test("RPN compiler builds the tree and rejects malformed programs") {
    val program = Seq(
      TermOp(QueryTerm(alice, FOLLOWS)),
      TermOp(QueryTerm(carl, FOLLOWS)),
      IntersectionOp
    )
    assert(SelectCompiler(program) ==
      IntersectNode(SimpleNode(QueryTerm(alice, FOLLOWS)), SimpleNode(QueryTerm(carl, FOLLOWS))))
    intercept[InvalidQueryException](SelectCompiler(Seq(TermOp(QueryTerm(alice, FOLLOWS)), IntersectionOp)))
    intercept[InvalidQueryException](SelectCompiler(Seq.empty))
    intercept[InvalidQueryException](
      SelectCompiler(Seq(TermOp(QueryTerm(alice, FOLLOWS)), TermOp(QueryTerm(bob, FOLLOWS))))
    )
  }

  test("default states: omitted states filter means Normal only") {
    val st = storeOf(
      edge(alice, bob, 3, state = State.Normal),
      edge(alice, carl, 5, state = State.Archived)
    )
    val r = SimpleNode(QueryTerm(alice, FOLLOWS)).select(st, Page(10, Cursor.Start))
    assert(r.items == Seq(bob))
  }

  test("huge where-in lists route through a broadcast semi-join, same results") {
    val st = storeOf(
      edge(alice, bob, 1), edge(alice, carl, 2), edge(alice, darcy, 3)
    )
    val bigList = (bob to 500000L) // 499999 ids — far past the IN-predicate cutoff
    val got = st.adjacency(model.QueryTerm(alice, FOLLOWS, destinationIds = Some(bigList)))
      .select(org.apache.spark.sql.functions.col("neighbor_id"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(bob, carl, darcy))
  }

  test("backward direction swaps source/destination roles") {
    val st = storeOf(edge(alice, bob, 3), edge(carl, bob, 5), edge(bob, darcy, 7))
    val r = SimpleNode(QueryTerm(bob, FOLLOWS, isForward = false)).select(st, Page(10, Cursor.Start))
    assert(r.items.toSet == Set(alice, carl))
  }
}

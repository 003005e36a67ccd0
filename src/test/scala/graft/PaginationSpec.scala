package graft

import graft.model._
import graft.queries._

/** Cursor-pagination goldens — exact expectations from the reference
  * `unit/SqlShardSpec.scala:218-236` (FIXTURES.md §2.2): edges alice→bob@pos3,
  * alice→carl@pos5, all Normal. Each row is (count, cursor) → (ids, next, prev).
  */
class PaginationSpec extends SparkSpec {

  private lazy val store = storeOf(
    edge(alice, bob, pos = 3),
    edge(alice, carl, pos = 5)
  )
  private val node = SimpleNode(QueryTerm(alice, FOLLOWS))

  private def page(count: Int, cursor: Long): (Seq[Long], Long, Long) = {
    val r = node.select(store, Page(count, cursor))
    (r.items, r.nextCursor, r.prevCursor)
  }

  test("(1, Start) -> ([carl], 5, End)")  { assert(page(1, Cursor.Start) == (Seq(carl), 5L, Cursor.End)) }
  test("(5, Start) -> ([carl, bob], End, End)") {
    assert(page(5, Cursor.Start) == (Seq(carl, bob), Cursor.End, Cursor.End))
  }
  test("(1, 5) -> ([bob], End, -3)")      { assert(page(1, 5L) == (Seq(bob), Cursor.End, -3L)) }
  test("(1, 4) -> ([bob], End, -3)")      { assert(page(1, 4L) == (Seq(bob), Cursor.End, -3L)) }
  test("(1, -5) -> ([], End, End)")       { assert(page(1, -5L) == (Seq.empty[Long], Cursor.End, Cursor.End)) }
  test("(1, -3) -> ([carl], 5, End)")     { assert(page(1, -3L) == (Seq(carl), 5L, Cursor.End)) }
  test("(3, -2) -> ([carl, bob], End, End)") {
    assert(page(3, -2L) == (Seq(carl, bob), Cursor.End, Cursor.End))
  }

  test("backward page in the middle of three rows has both cursors") {
    // rows at 3, 5, 7; backward from 3 with count 1 -> display [5], more above, more below
    val st = storeOf(edge(alice, bob, 3), edge(alice, carl, 5), edge(alice, darcy, 7))
    val r = SimpleNode(QueryTerm(alice, FOLLOWS)).select(st, Page(1, -3L))
    assert(r.items == Seq(carl))
    assert(r.nextCursor == 5L)
    assert(r.prevCursor == -5L)
  }
}

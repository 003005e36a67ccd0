package graft

import graft.model._
import graft.queries._
import graft.service.FlockService

/** Service-façade lifecycle — the demo walkthrough shape (`doc/demo.markdown:117-262`):
  * adds, reciprocal intersection, union, difference, negate/archive, counts.
  */
class FlockServiceSpec extends SparkSpec {

  private def freshService: FlockService = {
    val empty = storeOf() // empty store
    new FlockService(empty)
  }

  private def add(src: Long, dst: Long, at: Int): WriteOp =
    WriteOp(FOLLOWS, src, Some(dst), OpType.Add, at, Some(at.toLong * 1000))

  test("end-to-end: execute adds, query compound selects, counts, contains") {
    // alice follows bob, carl, darcy; bob follows alice, darcy; carl follows bob
    val svc = freshService.execute(Seq(
      add(alice, bob, 100), add(alice, carl, 101), add(alice, darcy, 102),
      add(bob, alice, 103), add(bob, darcy, 104),
      add(carl, bob, 105)
    ))

    assert(svc.contains(alice, FOLLOWS, bob))
    assert(!svc.contains(bob, FOLLOWS, carl))

    // who alice follows that also follows alice (reciprocal) = {bob}
    val reciprocal = svc.select(
      Seq(
        TermOp(QueryTerm(alice, FOLLOWS)),
        TermOp(QueryTerm(alice, FOLLOWS, isForward = false)),
        IntersectionOp
      ),
      Page(10, Cursor.Start)
    )
    assert(reciprocal.items == Seq(bob))

    // union of alice's follows and bob's follows
    val union = svc.select(
      Seq(TermOp(QueryTerm(alice, FOLLOWS)), TermOp(QueryTerm(bob, FOLLOWS)), UnionOp),
      Page(10, Cursor.Start)
    )
    assert(union.items.toSet == Set(bob, carl, darcy, alice))

    // alice's follows who bob does not follow
    val diff = svc.select(
      Seq(TermOp(QueryTerm(alice, FOLLOWS)), TermOp(QueryTerm(bob, FOLLOWS)), DifferenceOp),
      Page(10, Cursor.Start)
    )
    assert(diff.items.toSet == Set(bob, carl))

    // exact counts
    assert(svc.count2(Seq(Seq(TermOp(QueryTerm(alice, FOLLOWS)))), exact = true) == Seq(3L))

    // estimates read the metadata count
    assert(svc.count2(Seq(Seq(TermOp(QueryTerm(alice, FOLLOWS))))) == Seq(3L))
  }

  test("remove then re-add: contains flips, LWW converges") {
    val svc0 = freshService.execute(Seq(add(alice, bob, 100)))
    val svc1 = svc0.execute(Seq(WriteOp(FOLLOWS, alice, Some(bob), OpType.Remove, 110, None)))
    assert(!svc1.contains(alice, FOLLOWS, bob))
    val svc2 = svc1.execute(Seq(add(alice, bob, 120)))
    assert(svc2.contains(alice, FOLLOWS, bob))
  }

  test("negate keeps the edge 'existing' but out of Normal-state queries") {
    val svc = freshService
      .execute(Seq(add(alice, bob, 100)))
      .execute(Seq(WriteOp(FOLLOWS, alice, Some(bob), OpType.Negate, 110, None)))
    assert(svc.contains(alice, FOLLOWS, bob), "Negative counts as existing for contains")
    val normal = svc.select(Seq(TermOp(QueryTerm(alice, FOLLOWS))), Page(10, Cursor.Start))
    assert(normal.items.isEmpty)
    val negative = svc.select(
      Seq(TermOp(QueryTerm(alice, FOLLOWS, states = Seq(State.Negative)))),
      Page(10, Cursor.Start)
    )
    assert(negative.items == Seq(bob))
  }

  test("select_edges returns full edge rows in position order") {
    val svc = freshService.execute(Seq(add(alice, bob, 100), add(alice, carl, 105)))
    val page = svc.selectEdges(QueryTerm(alice, FOLLOWS), Page(10, Cursor.Start))
    assert(page.items.map(_.destinationId) == Seq(carl, bob))
    assert(page.items.head.updatedAt == 105)
  }

  test("select2 batch larger than the fan-out pool queues and answers every query") {
    val svc = freshService.execute(
      (1L to 6L).flatMap(s => (1L to 4L).map(d => add(s, s * 10 + d, 100 + d.toInt))))
    // 24 page queries > SelectParallelism (8): the excess must queue, not spawn
    val batch = (1L to 6L).flatMap { s =>
      Seq.fill(4)((Seq(TermOp(QueryTerm(s, FOLLOWS))): Seq[SelectOperation], Page(10, Cursor.Start)))
    }
    assert(batch.size > FlockService.SelectParallelism)
    val results = svc.select2(batch)
    assert(results.size == batch.size)
    results.zipWithIndex.foreach { case (r, i) =>
      val s = 1L + i / 4
      assert(r.items.toSet == (1L to 4L).map(d => s * 10 + d).toSet, s"query $i (source $s)")
    }
  }

  test("getMetadata reflects dominant state count") {
    val svc = freshService.execute(Seq(add(alice, bob, 100), add(alice, carl, 100)))
    val meta = svc.getMetadata(alice, FOLLOWS)
    assert(meta.exists(m => m.state == State.Normal && m.count == 2))
    assert(svc.containsMetadata(alice, FOLLOWS))
    assert(!svc.containsMetadata(earl, FOLLOWS))
  }
}

package graft

import graft.model._
import graft.queries.GraftConfig
import graft.service.FlockService

/** W2 vertex-state domination — the reference's state-resolution matrix
  * (`unit/JobSpec.scala:126-148`): a single-edge write's EFFECTIVE state is
  * `max(forwardVertexState, backwardVertexState, preferredState)` by state priority
  * (`jobs/single/Single.scala:104-107`), where the vertex states are first-class LWW
  * metadata registers written by wildcard (Multi) ops (`jobs/multi/Multi.scala:101-109`).
  *
  * The matrix's "lost lock" rows (OptimisticLockException when a concurrent Multi flips
  * the register mid-write) are unrepresentable here by design: a batch sees a consistent
  * snapshot (SURVEY.md §2.8 W5).
  *
  * Plus the ExecuteCompiler goldens: backward-term (source, destination) normalization
  * (`queries/ExecuteCompiler.scala:86-99`) and execute-side validation
  * (`ExecuteCompiler.scala:38, 45-46`; `integration/EdgesSpec.scala:81-84`).
  */
class JobMatrixSpec extends SparkSpec {

  private val mary = carl // alias for readability vs the reference's cast

  private def service(edges: Edge*): FlockService =
    new FlockService(storeOf(edges: _*))

  /** Wildcard op = the reference's Multi job: writes the vertex register. */
  private def vertexOp(v: Long, state: Int, at: Int, forward: Boolean = true): WriteOp =
    WriteOp(FOLLOWS, v, None, state, at, None, isForward = forward)

  private def edgeOp(s: Long, d: Long, state: Int, at: Int): WriteOp =
    WriteOp(FOLLOWS, s, Some(d), state, at)

  private def stateOf(svc: FlockService, s: Long, d: Long): Int =
    svc.get(s, FOLLOWS, d).map(_.state).getOrElse(sys.error(s"edge ($s,$d) missing"))

  //                                       Input    Bob-fwd   Mary-bwd   Resulting
  private val matrix = Seq(
    ("normal add",                 State.Normal,   None,                 None,                 State.Normal),
    ("add when bob archived",      State.Normal,   Some(State.Archived), None,                 State.Archived),
    ("add when mary archived",     State.Normal,   None,                 Some(State.Archived), State.Archived),
    ("normal remove",              State.Removed,  None,                 None,                 State.Removed),
    ("normal archive",             State.Archived, None,                 None,                 State.Archived),
    ("archive when mary removed",  State.Archived, None,                 Some(State.Removed),  State.Removed),
    ("archive when bob removed",   State.Archived, Some(State.Removed),  None,                 State.Removed),
    ("add when bob negated",       State.Normal,   Some(State.Negative), None,                 State.Negative),
    ("negate when mary archived",  State.Negative, None,                 Some(State.Archived), State.Archived)
  )

  matrix.foreach { case (name, preferred, bobFwd, maryBwd, expected) =>
    test(s"state resolution: $name -> ${expected}") {
      var svc = service()
      val registerOps =
        bobFwd.map(s => vertexOp(bob, s, at = 100, forward = true)).toSeq ++
          maryBwd.map(s => vertexOp(mary, s, at = 100, forward = false)).toSeq
      if (registerOps.nonEmpty) svc = svc.execute(registerOps)
      svc = svc.execute(Seq(edgeOp(bob, mary, preferred, at = 200)))
      assert(stateOf(svc, bob, mary) == expected)
    }
  }

  test("vertex unarchive lifts the domination for later adds") {
    var svc = service()
    svc = svc.execute(Seq(vertexOp(bob, State.Archived, at = 100)))
    svc = svc.execute(Seq(edgeOp(bob, mary, State.Normal, at = 150)))
    assert(stateOf(svc, bob, mary) == State.Archived, "archived vertex dominates the add")
    svc = svc.execute(Seq(vertexOp(bob, State.Normal, at = 200)))
    svc = svc.execute(Seq(edgeOp(bob, darcy, State.Normal, at = 250)))
    assert(stateOf(svc, bob, darcy) == State.Normal, "unarchived vertex no longer dominates")
  }

  test("wildcard op with existing edges: register + fanout both apply") {
    var svc = service(
      edge(bob, mary, pos = 1, at = 50, state = State.Normal),
      edge(bob, darcy, pos = 2, at = 50, state = State.Removed)
    )
    svc = svc.execute(Seq(vertexOp(bob, State.Archived, at = 100)))
    assert(stateOf(svc, bob, mary) == State.Archived, "non-Removed edges archived by fanout")
    assert(stateOf(svc, bob, darcy) == State.Removed, "Removed edges skipped (selectIncludingArchived)")
    // register is now first-class: metadata reports Archived even though counts derive from edges
    val meta = svc.getMetadata(bob, FOLLOWS).get
    assert(meta.state == State.Archived)
    assert(meta.count == 1L, "count = edges in the register's state (the archived one)")
  }

  test("register exists for a vertex with no edges at all (S12 front half)") {
    var svc = service()
    svc = svc.execute(Seq(vertexOp(earl, State.Archived, at = 100)))
    val meta = svc.getMetadata(earl, FOLLOWS)
    assert(meta.isDefined, "vertex-level state representable without any edge rows")
    assert(meta.get.state == State.Archived && meta.get.count == 0L)
  }

  test("backward wildcard archives INCOMING edges and the backward register") {
    var svc = service(
      edge(alice, mary, pos = 1, at = 50, state = State.Normal),
      edge(bob, mary, pos = 2, at = 50, state = State.Normal),
      edge(mary, darcy, pos = 3, at = 50, state = State.Normal)
    )
    svc = svc.execute(Seq(vertexOp(mary, State.Archived, at = 100, forward = false)))
    assert(stateOf(svc, alice, mary) == State.Archived)
    assert(stateOf(svc, bob, mary) == State.Archived)
    assert(stateOf(svc, mary, darcy) == State.Normal, "outgoing edges untouched by backward wildcard")
    // and the backward register now dominates later adds toward mary
    svc = svc.execute(Seq(edgeOp(frank, mary, State.Normal, at = 200)))
    assert(stateOf(svc, frank, mary) == State.Archived)
  }

  test("backward single term normalizes (source, destination) — ExecuteCompiler golden") {
    // reference: term(sourceId=mary, backward, destinationIds=[bob]) -> Single(bob, g, mary)
    var svc = service()
    svc = svc.execute(Seq(WriteOp(FOLLOWS, mary, Some(bob), State.Normal, 100, None, isForward = false)))
    assert(svc.get(bob, FOLLOWS, mary).isDefined, "edge stored as (bob -> mary)")
    assert(svc.get(mary, FOLLOWS, bob).isEmpty, "NOT stored un-swapped")
  }

  test("execute rejects empty batches and unknown graphs") {
    val svc = new FlockService(storeOf(), GraftConfig(knownGraphs = Some(Set(FOLLOWS))))
    intercept[InvalidQueryException] { svc.execute(Nil) }
    intercept[InvalidQueryException] {
      svc.execute(Seq(WriteOp(99, bob, Some(mary), State.Normal, 100)))
    }
    // known graph passes validation
    val ok = svc.execute(Seq(edgeOp(bob, mary, State.Normal, 100)))
    assert(ok.get(bob, FOLLOWS, mary).isDefined)
  }

  test("select and count reject unknown graphs at compile time") {
    import graft.queries.{QueryNode => _, _}
    val svc = new FlockService(storeOf(), GraftConfig(knownGraphs = Some(Set(FOLLOWS))))
    val badProgram = Seq(TermOp(QueryTerm(bob, 99)))
    intercept[InvalidQueryException] { svc.select(badProgram, Page(5, Cursor.Start)) }
    intercept[InvalidQueryException] { svc.count2(Seq(badProgram)) }
    // known graph queries still run
    assert(svc.count2(Seq(Seq(TermOp(QueryTerm(bob, FOLLOWS))))) == Seq(0L))
  }

  test("bulk unarchive restores edges at their ORIGINAL positions (FlockFixRegression)") {
    // reference `integration/FlockFixRegressionSpec.scala:41-67`: archive a vertex, then
    // bulk-unarchive it — adjacency order (position) must be exactly what it was; a
    // position refresh on unarchive would reshuffle the user's timeline
    var svc = service(
      edge(bob, mary, pos = 500, at = 50, state = State.Normal),
      edge(bob, darcy, pos = 300, at = 50, state = State.Normal),
      edge(bob, earl, pos = 100, at = 50, state = State.Normal)
    )
    svc = svc.execute(Seq(vertexOp(bob, State.Archived, at = 100)))
    assert(Seq(mary, darcy, earl).forall(d => stateOf(svc, bob, d) == State.Archived))
    svc = svc.execute(Seq(vertexOp(bob, State.Normal, at = 200)))
    val after = Seq(mary -> 500L, darcy -> 300L, earl -> 100L).map { case (d, _) =>
      svc.get(bob, FOLLOWS, d).get
    }
    assert(after.forall(_.state == State.Normal))
    assert(after.map(_.position) == Seq(500L, 300L, 100L),
      "positions must survive the archive/unarchive round trip")
  }

  test("count2 reads the vertex register, not the derived edge state") {
    import graft.queries._
    var svc = service(
      edge(bob, mary, pos = 1, at = 50, state = State.Normal),
      edge(bob, darcy, pos = 2, at = 50, state = State.Normal)
    )
    svc = svc.execute(Seq(vertexOp(bob, State.Archived, at = 100)))
    // register Archived; both edges archived by fanout -> count(Archived) = 2, Normal = 0
    val program = Seq(TermOp(QueryTerm(bob, FOLLOWS, states = Seq(State.Archived))))
    assert(svc.count2(Seq(program)) == Seq(2L))
    assert(svc.count2(Seq(Seq(TermOp(QueryTerm(bob, FOLLOWS))))) == Seq(0L),
      "Normal count reads 0 while the register says Archived")
    // register for a vertex with NO edges: count 0 for its own state too
    svc = svc.execute(Seq(vertexOp(frank, State.Archived, at = 100)))
    assert(svc.count2(Seq(Seq(TermOp(QueryTerm(frank, FOLLOWS, states = Seq(State.Archived)))))) == Seq(0L))
  }

  test("direct metadata sink writes the register WITHOUT touching edges (S12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val st = storeOf(edge(bob, mary, pos = 1, at = 50, state = State.Normal))
    val regs = Seq((FOLLOWS, bob, true, State.Archived, 100))
      .toDF("graph_id", "vertex_id", "is_forward", "state", "updated_at")
    val withReg = st.writeVertexStates(regs)
    // edge untouched (no fanout), but the register is live...
    assert(snapshotOf(withReg)((bob, mary)).state == State.Normal)
    val meta = new FlockService(withReg).getMetadata(bob, FOLLOWS).get
    assert(meta.state == State.Archived && meta.count == 0L)
    // ...and dominates subsequent single-edge writes
    val after = new FlockService(withReg).execute(Seq(edgeOp(bob, darcy, State.Normal, 200)))
    assert(stateOf(after, bob, darcy) == State.Archived)
    // LWW on the register itself: newer write wins
    val newer = withReg.writeVertexStates(
      Seq((FOLLOWS, bob, true, State.Normal, 150))
        .toDF("graph_id", "vertex_id", "is_forward", "state", "updated_at"))
    val regState = newer.vertexStates.filter(col("vertex_id") === bob).collect()(0).getAs[Int]("state")
    assert(regState == State.Normal)
  }

  test("repair merges vertex registers from both replicas") {
    val a = service().execute(Seq(vertexOp(bob, State.Archived, at = 100)))
    val b = service().execute(Seq(vertexOp(bob, State.Normal, at = 200)))
    val repaired = new FlockService(a.store.repairWith(b.store))
    // newest register (Normal@200) wins after repair; a later add is not dominated
    val after = repaired.execute(Seq(edgeOp(bob, mary, State.Normal, at = 300)))
    assert(stateOf(after, bob, mary) == State.Normal)
  }
}

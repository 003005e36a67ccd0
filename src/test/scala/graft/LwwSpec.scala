package graft

import graft.model._

/** The LWW write-conflict truth table — ported from the reference's
  * `unit/SqlShardSpec.scala:323-561` via FIXTURES.md §2.4. This is the heart of the
  * write model: idempotent, commutative, (updatedAt, statePriority)-ordered.
  */
class LwwSpec extends SparkSpec {

  private def applied(initial: Seq[Edge], ops: (Long, Long, Int, Int, Option[Long])*): Map[(Long, Long), Edge] =
    snapshotOf(storeOf(initial: _*).applyOperations(opsDF(ops: _*)))

  test("newer add wins but position is NOT refreshed (Normal -> Normal)") {
    val m = applied(
      Seq(edge(alice, bob, pos = 3, at = 100, state = State.Normal)),
      (alice, bob, State.Normal, 110, Some(999L))
    )
    val e = m((alice, bob))
    assert(e.state == State.Normal && e.updatedAt == 110)
    assert(e.position == 3, "position only refreshes on Removed/Negative -> Normal")
  }

  test("Archived -> add: state flips to Normal, position unchanged") {
    val m = applied(
      Seq(edge(alice, bob, pos = 3, at = 100, state = State.Archived)),
      (alice, bob, State.Normal, 110, Some(999L))
    )
    val e = m((alice, bob))
    assert(e.state == State.Normal && e.updatedAt == 110 && e.position == 3)
  }

  test("Removed -> add resurrects WITH the new position") {
    val m = applied(
      Seq(edge(alice, bob, pos = 3, at = 100, state = State.Removed)),
      (alice, bob, State.Normal, 110, Some(999L))
    )
    val e = m((alice, bob))
    assert(e.state == State.Normal && e.updatedAt == 110 && e.position == 999L)
  }

  test("older add is ignored") {
    val m = applied(
      Seq(edge(alice, bob, pos = 3, at = 100, state = State.Normal)),
      (alice, bob, State.Normal, 99, Some(999L))
    )
    val e = m((alice, bob))
    assert(e.state == State.Normal && e.updatedAt == 100 && e.position == 3)
  }

  test("same-timestamp tie: Removed beats Normal") {
    val m = applied(
      Seq(edge(alice, bob, pos = 3, at = 100, state = State.Removed)),
      (alice, bob, State.Normal, 100, None)
    )
    assert(m((alice, bob)).state == State.Removed)
  }

  test("same-timestamp tie: Negative beats Normal") {
    val m = applied(
      Seq(edge(alice, bob, pos = 3, at = 100, state = State.Negative)),
      (alice, bob, State.Normal, 100, None)
    )
    assert(m((alice, bob)).state == State.Negative)
  }

  test("replayed intermediate write does not regress newest state") {
    // Removed@t, Removed@t+2 exist; an add@t+1 replays in between -> Removed@t+2 holds
    val m = applied(
      Seq(
        edge(alice, bob, pos = 3, at = 100, state = State.Removed),
        edge(alice, bob, pos = 3, at = 102, state = State.Removed)
      ),
      (alice, bob, State.Normal, 101, None)
    )
    val e = m((alice, bob))
    assert(e.state == State.Removed && e.updatedAt == 102)
  }

  test("merge is commutative and idempotent (log replay in any order converges)") {
    val writes = Seq(
      edge(alice, bob, pos = 1, at = 100, state = State.Normal),
      edge(alice, bob, pos = 1, at = 101, state = State.Removed),
      edge(alice, bob, pos = 1, at = 101, state = State.Archived),
      edge(alice, bob, pos = 1, at = 99, state = State.Negative)
    )
    val expected = snapshotOf(storeOf(writes: _*))
    assert(snapshotOf(storeOf(writes.reverse: _*)) == expected)
    assert(snapshotOf(storeOf((writes ++ writes): _*)) == expected)
    // tie at 101: Removed (priority 3) beats Archived (priority 2)
    assert(expected((alice, bob)).state == State.Removed)
  }

  test("vertex metadata tie-breaks: removed > archived > negative > normal") {
    import org.apache.spark.sql.functions._
    // same updatedAt on all edge writes of the vertex -> dominant state by priority
    def vertexState(states: Int*): Int = {
      val es = states.zipWithIndex.map { case (s, i) => edge(alice, 100L + i, pos = i, at = 50, state = s) }
      storeOf(es: _*).metadata.select(col("state")).collect()(0).getInt(0)
    }
    assert(vertexState(State.Normal, State.Removed) == State.Removed)
    assert(vertexState(State.Normal, State.Archived) == State.Archived)
    assert(vertexState(State.Negative, State.Archived) == State.Archived)
    assert(vertexState(State.Archived, State.Removed) == State.Removed)
  }

  test("metadata count covers only the dominant state; other states read 0") {
    import org.apache.spark.sql.functions._
    // 2 Normal edges newest, 3 Archived older -> vertex Normal, count = 2
    val st = storeOf(
      edge(alice, bob, 1, at = 100, state = State.Normal),
      edge(alice, carl, 2, at = 100, state = State.Normal),
      edge(alice, darcy, 3, at = 90, state = State.Archived),
      edge(alice, earl, 4, at = 90, state = State.Archived),
      edge(alice, frank, 5, at = 90, state = State.Archived)
    )
    val row = st.metadata.select(col("state"), col("count")).collect()(0)
    assert(row.getInt(0) == State.Normal)
    assert(row.getLong(1) == 2L)
  }

  test("metadataPatched equals the full metadata recompute after a mixed batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val store = storeOf(
      edge(alice, bob, 1, at = 100), edge(alice, carl, 2, at = 100),
      edge(bob, alice, 3, at = 100), edge(carl, darcy, 4, at = 100, state = State.Archived))
    // forward add on a NEW vertex, backward remove, forward wildcard (register +
    // fanout), and a register-only wildcard on a vertex with no edges at all
    val ops = Seq(
      (FOLLOWS, earl, Some(bob), State.Normal, 200, None: Option[Long], true),
      (FOLLOWS, alice, Some(bob), State.Removed, 200, None: Option[Long], false),
      (FOLLOWS, alice, None: Option[Long], State.Archived, 210, None: Option[Long], true),
      (FOLLOWS, frank, None: Option[Long], State.Archived, 210, None: Option[Long], true)
    ).toDF("graph_id", "source_id", "destination_id", "state", "updated_at", "position",
      "is_forward")
    val prev = store.metadata
    val (after, touched) = store.applyOperationsWithDelta(ops)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("graph_id"), col("source_id"), col("state"), col("count"), col("updated_at"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))
      .toSet
    val full = rows(after.metadata)
    val patched = rows(after.metadataPatched(prev, touched))
    assert(patched == full)
    // the batch exercised every maintenance case: new vertex, backward-touched vertex,
    // register fanout, and a register-only vertex with zero edges
    assert(full.exists(r => r._2 == earl))
    assert(full.exists(r => r._2 == frank && r._4 == 0L && r._3 == State.Archived))
    // untouched vertices' rows really are carried over from prev (no recompute drift)
    val untouchedPrev = rows(prev).filter(r => r._2 == carl)
    assert(untouchedPrev.subsetOf(patched))
  }

  test("bulk wildcard archive touches every non-Removed edge of the vertex") {
    val st = storeOf(
      edge(alice, bob, 1, at = 100, state = State.Normal),
      edge(alice, carl, 2, at = 100, state = State.Negative),
      edge(alice, darcy, 3, at = 100, state = State.Removed),
      edge(bob, carl, 4, at = 100, state = State.Normal)
    )
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wildcard = Seq((FOLLOWS, alice, State.Archived, 200))
      .toDF("graph_id", "source_id", "state", "updated_at")
      .select(
        col("graph_id"), col("source_id"),
        lit(null).cast("long").as("destination_id"),
        col("state"), col("updated_at"), lit(null).cast("long").as("position")
      )
    val m = snapshotOf(st.applyOperations(wildcard))
    assert(m((alice, bob)).state == State.Archived)
    assert(m((alice, carl)).state == State.Archived)
    assert(m((alice, darcy)).state == State.Removed, "Removed edges are skipped by bulk jobs")
    assert(m((bob, carl)).state == State.Normal, "other vertices untouched")
  }

  test("repair between diverged replicas converges to the newest write per key") {
    val a = storeOf(
      edge(alice, bob, 1, at = 100, state = State.Normal),
      edge(alice, carl, 2, at = 105, state = State.Removed)
    )
    val b = storeOf(
      edge(alice, bob, 1, at = 102, state = State.Archived),
      edge(alice, darcy, 3, at = 101, state = State.Normal)
    )
    val m = snapshotOf(a.repairWith(b))
    assert(m((alice, bob)).state == State.Archived && m((alice, bob)).updatedAt == 102)
    assert(m((alice, carl)).state == State.Removed)
    assert(m((alice, darcy)).state == State.Normal)
  }

  test("asOf replays the store at a past instant (edges and registers truncate together)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val st = new graft.store.EdgeStore(
      storeOf(
        edge(alice, bob, 1, at = 100),
        edge(alice, bob, 1, at = 200, state = State.Removed),
        edge(carl, darcy, 2, at = 300)).log,
      Some(Seq((FOLLOWS, alice, true, State.Archived, 250))
        .toDF("graph_id", "vertex_id", "is_forward", "state", "updated_at")))
    def aliceMetaState(s: graft.store.EdgeStore): Seq[Int] =
      s.metadata.filter(col("source_id") === alice).select("state").as[Int].collect().toSeq
    val at150 = st.asOf(150)
    val m150 = snapshotOf(at150)
    assert(m150((alice, bob)).state == State.Normal && m150((alice, bob)).updatedAt == 100,
      "the newer remove must be invisible before its write time")
    assert(!m150.contains((carl, darcy)), "an edge whose writes are all newer does not exist yet")
    assert(aliceMetaState(at150) == Seq(State.Normal),
      "the register written at 250 must not color metadata at 150")
    val at260 = st.asOf(260)
    assert(snapshotOf(at260)((alice, bob)).state == State.Removed)
    assert(aliceMetaState(at260) == Seq(State.Archived), "register visible once inside the horizon")
    assert(snapshotOf(st.asOf(300)) == snapshotOf(st), "the full-horizon view IS the current store")
  }

  test("g18: fused single-batch application equals the sequential two-batch form") {
    // the equivalence that lets vertexDomination pay ONE write-path fold: disjoint
    // batch timestamps + same-batch register visibility + archival never refreshing
    // positions make LWW(batch1 ∪ batch2) = LWW∘LWW (vertexDominationImpl scaladoc)
    val dir = "/root/testdata/sf0.001"
    val fused = GraphQueries.vertexDomination(spark, dir).collect().toSet
    val sequential = GraphQueries.vertexDominationTwoBatch(spark, dir).collect().toSet
    assert(fused.nonEmpty)
    assert(fused == sequential)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.model._

/** Property pin of the fused-batch equivalence `vertexDominationImpl` relies on
  * (its scaladoc argument): an archival WILDCARD batch followed by a later
  * single-edge batch may be applied as ONE `applyOperations` call, because
  *
  *  - disjoint timestamps keep LWW ordering identical,
  *  - wildcard expansion only touches existing edges and keeps their positions,
  *  - every wildcard writes a vertex register whose state priority dominates a
  *    later Normal add (Archived(2) > Normal(0)), so the position rule's
  *    resurrection predicate (`op.state === Normal` POST-domination) evaluates
  *    the same against the pre-batch snapshot as against the intermediate one.
  *
  * The third bullet is load-bearing: the counterexample test shows the same
  * fusion is NOT sound for a single-edge (register-free) archival batch over a
  * Negative seed edge — pinning the precondition, not just the happy path.
  * Randomized here because LwwSpec's g18 pin only exercises the sf0.001 fixture
  * (reference analog: the job-matrix cases of `unit/JobSpec.scala:126-148`).
  */
class FusedBatchPropertySpec extends SparkSpec {

  /** Wildcard ops: (vertex, isForward, state, updatedAt); destination NULL. */
  private def wildOps(ops: Seq[(Long, Boolean, Int, Int)]): DataFrame = {
    import spark.implicits._
    ops.toDF("source_id", "is_forward", "state", "updated_at")
      .select(
        lit(FOLLOWS).as("graph_id"), col("source_id"),
        lit(null).cast("long").as("destination_id"), col("state"),
        col("updated_at"), lit(null).cast("long").as("position"), col("is_forward"))
  }

  private def singleOps(ops: Seq[(Long, Long, Int, Int, Option[Long])]): DataFrame =
    opsDF(ops: _*).withColumn("is_forward", lit(true))

  private val genSeed: Gen[List[Edge]] = Gen.listOfN(20, for {
    src   <- Gen.choose(1L, 5L)
    dst   <- Gen.choose(1L, 5L)
    pos   <- Gen.choose(1L, 50L)
    at    <- Gen.choose(100, 110)
    state <- Gen.oneOf(State.Normal, State.Removed, State.Archived, State.Negative)
  } yield Edge(FOLLOWS, src, dst, pos, at, 0, state))

  private val genArchivals: Gen[List[(Long, Boolean, Int, Int)]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, for {
      vertex <- Gen.choose(1L, 5L)
      isFwd  <- Gen.oneOf(true, false)
      at     <- Gen.choose(150, 160)
    } yield (vertex, isFwd, State.Archived, at)))

  private val genAdds: Gen[List[(Long, Long, Int, Int, Option[Long])]] =
    Gen.choose(5, 12).flatMap(n => Gen.listOfN(n, for {
      src   <- Gen.choose(1L, 5L)
      dst   <- Gen.choose(1L, 5L)
      state <- Gen.oneOf(State.Normal, State.Removed, State.Archived, State.Negative)
      at    <- Gen.choose(200, 210)
      pos   <- Gen.option(Gen.choose(100L, 150L))
    } yield (src, dst, state, at, pos)))

  private def metadataOf(store: graft.store.EdgeStore): Set[(Int, Long, Int, Long, Int)] = {
    import spark.implicits._
    store.metadata
      .select(
        col("graph_id"), col("source_id"), col("state"),
        col("count"), col("updated_at"))
      .as[(Int, Long, Int, Long, Int)].collect().toSet
  }

  test("wildcard-archive batch + later single-edge batch: fused equals sequential " +
    "(full edge equality incl. positions, and metadata)") {
    val prop = Prop.forAll(genSeed, genArchivals, genAdds) { (seed, archivals, adds) =>
      val base = storeOf(seed: _*)
      val b1 = wildOps(archivals)
      val b2 = singleOps(adds)
      val fused      = base.applyOperations(b1.unionByName(b2))
      val sequential = base.applyOperations(b1).applyOperations(b2)
      snapshotOf(fused) == snapshotOf(sequential) &&
        metadataOf(fused) == metadataOf(sequential)
    }
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, s"fused-equivalence: $result")
  }

  test("boundary: a register-free single-edge archival batch over a Negative seed " +
    "edge does NOT fuse (resurrection reads diverging old_state)") {
    // seed: (alice,bob) Negative. batch1: single-edge archive (no register written).
    // batch2: Normal re-add with an explicit position.
    //  - sequential: batch2 sees old_state=Archived -> not resurrected -> keeps pos 5
    //  - fused:      batch2 sees old_state=Negative -> resurrected     -> takes pos 99
    val base = storeOf(edge(alice, bob, 5, at = 100, state = State.Negative))
    val b1 = singleOps(Seq((alice, bob, State.Archived, 150, None)))
    val b2 = singleOps(Seq((alice, bob, State.Normal, 200, Some(99L))))
    val fusedPos      = snapshotOf(base.applyOperations(b1.unionByName(b2)))((alice, bob)).position
    val sequentialPos =
      snapshotOf(base.applyOperations(b1).applyOperations(b2))((alice, bob)).position
    assert(sequentialPos == 5L, "sequential keeps the archived edge's position")
    assert(fusedPos == 99L, "fused resurrects against the pre-batch Negative state")
  }
}

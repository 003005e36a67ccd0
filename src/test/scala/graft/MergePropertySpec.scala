package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.model._

/** Property tests of the LWW merge: the snapshot must be invariant under permutation
  * and duplication of the write log — the distributed restatement of the reference's
  * replay-convergence integration specs
  * (`integration/OptimisticLockRegressionSpec.scala:41-68`, `doc/blog.md:67-75`:
  * writes are idempotent and commutative).
  *
  * Cases are kept small (each case is a real Spark job); scalacheck drives the log
  * generation, a driver-side reference merge pins the expected winner.
  */
class MergePropertySpec extends SparkSpec {

  private val genEdge: Gen[Edge] = for {
    src   <- Gen.choose(1L, 4L)
    dst   <- Gen.choose(1L, 4L)
    pos   <- Gen.choose(1L, 50L)
    at    <- Gen.choose(100, 110)
    state <- Gen.oneOf(State.Normal, State.Removed, State.Archived, State.Negative)
  } yield Edge(FOLLOWS, src, dst, pos, at, 0, state)

  private val genLog: Gen[List[Edge]] = Gen.listOfN(25, genEdge)

  /** Driver-side reference merge: max by (updatedAt, statePriority, position) per key. */
  private def referenceMerge(log: Seq[Edge]): Map[(Long, Long), (Int, Int, Long)] =
    log.groupBy(e => (e.sourceId, e.destinationId)).view.mapValues { writes =>
      val w = writes.maxBy(e => (e.updatedAt, State.priority(e.state), e.position))
      (w.updatedAt, w.state, w.position)
    }.toMap

  private def sparkMerge(log: Seq[Edge]): Map[(Long, Long), (Int, Int, Long)] =
    snapshotOf(storeOf(log: _*)).view.mapValues(e => (e.updatedAt, e.state, e.position)).toMap

  private def check(name: String, prop: Prop): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(8)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  test("snapshot equals the per-key max-by reference merge on random logs") {
    check("reference", Prop.forAll(genLog) { log =>
      log.isEmpty || sparkMerge(log) == referenceMerge(log)
    })
  }

  test("snapshot is permutation-invariant (commutative replay)") {
    check("permutation", Prop.forAll(genLog) { log =>
      log.isEmpty || sparkMerge(log) == sparkMerge(scala.util.Random.shuffle(log))
    })
  }

  test("snapshot is duplication-invariant (idempotent replay)") {
    check("duplication", Prop.forAll(genLog) { log =>
      log.isEmpty || {
        val replayed = log ++ log.take(log.size / 2) ++ log
        sparkMerge(log) == sparkMerge(replayed)
      }
    })
  }

  test("applyOperations converges regardless of batch splitting") {
    check("batch-split", Prop.forAll(genLog, Gen.choose(1, 24)) { (writeLog, splitAt) =>
      writeLog.size < 2 || {
        val spark0 = spark
        import org.apache.spark.sql.functions.col
        import spark0.implicits._
        def opsOf(edges: Seq[Edge]) =
          edges.toDF("graphId", "sourceId", "destinationId", "position", "updatedAt", "count", "state")
            .select(
              col("graphId").as("graph_id"), col("sourceId").as("source_id"),
              col("destinationId").as("destination_id"), col("state"),
              col("updatedAt").as("updated_at"), col("position"))
        val (a, b) = writeLog.splitAt(splitAt % writeLog.size)
        val seed = storeOf(writeLog.head)
        val oneBatch = snapshotOf(seed.applyOperations(opsOf(writeLog.tail)))
        val twoBatches = snapshotOf(
          seed.applyOperations(opsOf(a.drop(1))).applyOperations(opsOf(b)))
        // states converge; positions may differ (ops carry explicit positions here, and
        // the keep-old-position rule is applied per batch against each batch's snapshot)
        oneBatch.view.mapValues(e => (e.updatedAt, e.state)).toMap ==
          twoBatches.view.mapValues(e => (e.updatedAt, e.state)).toMap
      }
    })
  }
}

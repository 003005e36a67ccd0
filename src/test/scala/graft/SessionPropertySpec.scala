package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.streaming.StreamOps
import graft.streaming.StreamOps.SessionState

/** Conservation and split-invariance laws of the streaming session fold — pure
  * properties, no Spark jobs: [[StreamOps.mergeSessionBatch]] must behave like the
  * batch sessionizer no matter how the event stream is cut into micro-batches
  * (provided cuts respect event-time order, the watermark contract).
  */
class SessionPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val gap = 100L

  private val genTs: Gen[List[Long]] =
    Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 3000L)).map(_.distinct).suchThat(_.nonEmpty))

  private def foldAll(tss: Seq[Long]): (SessionState, Seq[SessionState]) =
    StreamOps.mergeSessionBatch(None, tss, gap)

  private def check(name: String, prop: Prop): Unit = {
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, s"$name: $result")
  }

  test("events are conserved and sessions tile the timeline without overlap") {
    check("conservation", Prop.forAll(genTs) { tss0 =>
      val tss = if (tss0.isEmpty) List(0L) else tss0 // shrinker may bypass suchThat
      val (open, closed) = foldAll(tss)
      val all = closed :+ open
      val eventsOk = all.map(_.nEvents).sum == tss.length
      val ordered = all.forall(s => s.startUs <= s.lastUs) &&
        all.sliding(2).forall {
          case Seq(a, b) => b.startUs - a.lastUs > gap // a real break between sessions
          case _         => true
        }
      eventsOk && ordered
    })
  }

  test("ANY split — even order-violating — conserves events across open + closed") {
    // the chain-merge semantics guarantees every event lands in exactly one session
    // no matter how the stream is cut (late events merge, bridge, open their own
    // closed chain, or supersede — but are never dropped or double-counted)
    val genAnySplit = for {
      tss <- genTs
      mask <- Gen.listOfN(tss.length, Gen.oneOf(true, false))
    } yield (tss, mask)
    check("conservation under arbitrary splits", Prop.forAll(genAnySplit) { case (tss, mask) =>
      if (tss.isEmpty) Prop.passed
      else {
        val (a, b) = tss.zip(mask.padTo(tss.length, false)).partition(_._2) match {
          case (x, y) => (x.map(_._1), y.map(_._1))
        }
        val (open, closed) =
          if (a.isEmpty) StreamOps.mergeSessionBatch(None, b, gap)
          else if (b.isEmpty) StreamOps.mergeSessionBatch(None, a, gap)
          else {
            val (openA, closedA) = StreamOps.mergeSessionBatch(None, a, gap)
            val (openB, closedB) = StreamOps.mergeSessionBatch(Some(openA), b, gap)
            (openB, closedA ++ closedB)
          }
        val all = closed :+ open
        Prop(all.map(_.nEvents).sum == tss.length &&
          all.forall(s => s.startUs <= s.lastUs && s.nEvents >= 1))
      }
    })
  }

  test("any order-respecting micro-batch split folds to the single-batch result") {
    val genSplit = for {
      tss <- genTs
      cut <- Gen.choose(0, tss.length)
    } yield (tss.sorted, cut)
    // NB: guard empties explicitly — scalacheck SHRINKING does not re-apply suchThat
    // filters, so the shrinker feeds empty lists even though the generator never does
    check("split invariance", Prop.forAll(genSplit) { case (sorted, cut) =>
      if (sorted.isEmpty) Prop.passed
      else {
        val (a, b) = sorted.splitAt(cut)
        val oneShot = foldAll(sorted)
        val twoStep =
          if (a.isEmpty) foldAll(b)
          else if (b.isEmpty) foldAll(a)
          else {
            val (openA, closedA) = StreamOps.mergeSessionBatch(None, a, gap)
            val (openB, closedB) = StreamOps.mergeSessionBatch(Some(openA), b, gap)
            (openB, closedA ++ closedB)
          }
        Prop(twoStep == oneShot)
      }
    })
  }
}

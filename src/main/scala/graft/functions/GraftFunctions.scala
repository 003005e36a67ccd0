package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions of the data plane (SURVEY.md §2.7) — all expressed with built-in,
  * codegen-friendly column expressions (no UDFs).
  */
object GraftFunctions {

  /** F1 — ordered-UUID position: `(epochMillis << 20) | 20 random bits`
    * (reference `UuidGenerator.scala:26-39`). `randomBits` is a column so callers can pin
    * it to a deterministic value (tests, oracles) or feed `(rand()*0xFFFFF).cast("long")`.
    */
  def orderedUuid(epochMillis: Column, randomBits: Column): Column =
    shiftleft(epochMillis, 20).bitwiseOR(randomBits.bitwiseAND(lit(0xFFFFFL)))

  /** Deterministic position derived from an epoch-seconds updatedAt (no random bits). */
  def positionFromUpdatedAt(updatedAtSeconds: Column): Column =
    shiftleft(updatedAtSeconds.cast("long") * 1000L, 20)

  /** F1 inverse — recover epoch millis from a position (reference `Edge.scala:45`). */
  def uuidToMillis(position: Column): Column = shiftright(position, 20)

  /** F4 — graph/direction translation: backward queries address graph `-graphId`
    * (reference `ForwardingManager.scala:35-37`).
    */
  def directedGraphId(graphId: Column, isForward: Column): Column =
    when(isForward, graphId).otherwise(-graphId)
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.Packing

/** Scalar-function surface: F3 little-endian packing goldens (byte-level, matching the
  * reference's `packBuffer`/`ByteOrder.LITTLE_ENDIAN` — `FlockDB.scala:278-299`) and the
  * native text expressions (count-occurrences, polynomial fingerprint).
  */
class FunctionsSpec extends SparkSpec {

  test("packLongs is little-endian i64 (reference FlockDB.scala:287)") {
    assert(Packing.packLongs(Seq(1L)).toSeq ==
      Seq[Byte](1, 0, 0, 0, 0, 0, 0, 0))
    assert(Packing.packLongs(Seq(0x0102030405060708L)).toSeq ==
      Seq[Byte](8, 7, 6, 5, 4, 3, 2, 1))
    assert(Packing.packLongs(Seq(-1L)).toSeq == Seq.fill(8)(-1.toByte))
    assert(Packing.packLongs(Nil).isEmpty)
  }

  test("packInts is little-endian i32 (reference FlockDB.scala:289)") {
    assert(Packing.packInts(Seq(1, 256)).toSeq ==
      Seq[Byte](1, 0, 0, 0, 0, 1, 0, 0))
  }

  test("pack/unpack round-trips") {
    val ls = Seq(Long.MinValue, -42L, 0L, 7L, Long.MaxValue)
    assert(Packing.unpackLongs(Packing.packLongs(ls)).toSeq == ls)
    val is = Seq(Int.MinValue, -1, 0, 99, Int.MaxValue)
    assert(Packing.unpackInts(Packing.packInts(is)).toSeq == is)
  }

  test("count-occurrences matches the replace-based arithmetic incl. overlap cases") {
    import spark.implicits._
    val df = Seq(
      ("aaa", "aa"),          // non-overlapping left-to-right: 1, not 2
      ("the cat the dog the", "the"),
      ("", "x"),
      ("abc", ""),            // empty needle pins 0
      ("ababab", "ab"),
      ("no match here", "zz")
    ).toDF("text", "needle")
    val counted = df.select(
      org.apache.spark.sql.graft.CountOccurrences.column(col("text"), col("needle")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(counted == Seq(1L, 3L, 0L, 0L, 3L, 0L))
  }

  test("polynomial fingerprint matches the SQL fold definition") {
    import spark.implicits._
    def reference(s: String): Long = {
      val pows = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)
      s.codePoints.toArray.zipWithIndex
        .map { case (cp, i) => cp.toLong * pows(i % 8) }
        .sum % 1000000007L
    }
    val inputs = Seq("", "a", "hello world", "The quick brown fox", "ünïcödé ☃ text")
    val out = inputs.toDF("text")
      .select(org.apache.spark.sql.graft.PolyFingerprint.column(col("text")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == inputs.map(reference))
    assert(out.head == 0L, "empty doc pins fingerprint 0")
  }

  test("several native expressions in one projection stay codegen-compiled") {
    import spark.implicits._
    // regression for the fixed-local-name bug: multiple instances in one projection
    // must not collide in generated code (would silently fall back to interpreted)
    val df = Seq(("x y z a b", "a b c")).toDF("s1", "s2")
    val c = org.apache.spark.sql.graft.CountOccurrences.column _
    val out = df.select(
      c(col("s1"), lit(" ")).as("a"),
      c(col("s2"), lit(" ")).as("b"),
      (c(col("s1"), lit("y")) + c(col("s2"), lit("b"))).as("d")
    ).collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) == ((4L, 2L, 2L)))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench emission contract the driver depends on: the JSON line must survive the
  * driver's ~2000-char output-tail capture (head-truncation made r1–r4's numbers
  * unparseable). Pure string checks — no Spark session.
  */
class BenchContractSpec extends AnyFunSuite {

  test("every headline name is a real query, with no duplicates") {
    val unknown = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"headline references unknown queries: ${unknown.mkString(", ")}")
    assert(Bench.headline.distinct.size == Bench.headline.size, "duplicate headline entries")
  }

  test("worst-case headline JSON stays well inside the driver's captured tail") {
    // mirror Bench.main's line construction with every value at its widest realistic
    // formatting (4 integer digits + 3 decimals); failures list empty — a failure
    // replaces a success entry at comparable width and failures are a bug anyway
    val qs = Bench.headline.map(k => "\"" + k + "\":9999.999").mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":99999.999,"unit":"sec","n":${SparkEntry.queries.size},"queries":$qs,"failed":[],"sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 1700,
      s"worst-case bench line is ${line.length} chars (cap 1700 for tail-capture " +
        "headroom) — rotate fast queries out of Bench.headline before adding more")
  }
}

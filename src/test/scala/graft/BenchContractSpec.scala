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
    // the REAL line constructor with every value at its widest realistic formatting
    // (4 integer digits + 3 decimals); failures list empty — a failure replaces a
    // success entry at comparable width and failures are a bug anyway
    val line = Bench.renderLine(
      total = 99999.999, cal = 9999.999, calEnd = 9999.999, calMax = 9999.999,
      n = SparkEntry.queries.size,
      secByName = Bench.headline.map(_ -> 9999.999).toMap,
      failed = Nil, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1700,
      s"worst-case bench line is ${line.length} chars (cap 1700 for tail-capture " +
        "headroom) — rotate fast queries out of Bench.headline before adding more")
  }

  test("the line carries both host-load calibration fields (run start and end)") {
    // r6's driver run read untouched queries 3-5x slower from box contention alone;
    // "cal" (a fixed synthetic workload's seconds) is what lets a cross-round
    // comparison normalize for host load before calling anything a regression.
    // r7 showed a start-only sample misses load arriving mid-run, so the same
    // workload is re-timed after the last query as "cal_end": a comparison rejects
    // runs where either sample reads contended.
    val line = Bench.renderLine(10.0, 1.234, 2.345, 3.456, 2,
      Map("q01_pricing_summary" -> 5.0), Nil, "/root/testdata/sf0.1")
    assert(line.contains("\"cal\":1.234"), line)
    assert(line.contains("\"cal_end\":2.345"), line)
    assert(line.indexOf("\"cal\":") < line.indexOf("\"queries\":") &&
      line.indexOf("\"cal_end\":") < line.indexOf("\"queries\":"),
      "both cal fields must sit in the fixed head of the line, before the variable-width map")
  }

  test("the line carries cal_max — the worst calibration sample seen anywhere in the run") {
    // r9: BOTH bracket samples read clean (0.988 / 1.019) around a mid-run load
    // window that inflated ten queries 2-6x — the third consecutive driver bench
    // invalidated by contention the bracket could not see. cal_max folds in the
    // micro-calibrations interleaved every ~15 queries (scaled to full-cal units),
    // so a contaminated run self-identifies from the JSON line alone.
    val line = Bench.renderLine(10.0, 0.988, 1.019, 4.321, 2,
      Map("q01_pricing_summary" -> 5.0), Nil, "/root/testdata/sf0.1")
    assert(line.contains("\"cal_max\":4.321"), line)
    assert(line.indexOf("\"cal_max\":") < line.indexOf("\"queries\":"),
      "cal_max must sit in the fixed head of the line, before the variable-width map")
    assert(Bench.microCalEvery > 0 && Bench.microCalEvery <= 20,
      "interleave cadence must actually sample inside a ~160-query run")
  }
}

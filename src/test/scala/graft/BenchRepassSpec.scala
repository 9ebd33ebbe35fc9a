package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention-repass decision logic: a sustained host
  * contention window can span BOTH reps of a query (r16 billed two
  * 1.6 s queries at 38/30 s), so after the sweep any query reading
  * >3x its committed baseline gets one isolated re-run and the better
  * reading wins. These tests pin the selection + correction math. */
class BenchRepassSpec extends AnyFunSuite {

  test("a slow first pass against the baseline is selected for repass") {
    val baseline = Map("m27" -> 1.4, "m28" -> 1.5, "d14" -> 5.7)
    val measured = Map("m27" -> 38.2, "m28" -> 29.6, "d14" -> 6.0)
    val c = Bench.repassCandidates(baseline, measured)
    assert(c == Seq("m27", "m28")) // worst absolute excess first
    assert(!c.contains("d14")) // ordinary drift is not a candidate
    // ... and min-merge corrects the sweep figure with the repass one
    val repassed = Map("m27" -> 1.64, "m28" -> 1.63)
    val corrected = measured.map { case (k, v) =>
      k -> math.min(v, repassed.getOrElse(k, v)) }
    assert(corrected("m27") == 1.64 && corrected("m28") == 1.63 &&
      corrected("d14") == 6.0)
  }

  test("sub-half-second noise never burns the repass budget") {
    // 0.02 -> 0.09 is >3x but only 70 ms of excess — not a candidate
    assert(Bench.repassCandidates(Map("t01" -> 0.02), Map("t01" -> 0.09)).isEmpty)
  }

  test("the repass set is bounded and prioritized by absolute excess") {
    val baseline = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    val measured = (1 to 20).map(i => s"q$i" -> (3.6 + i)).toMap
    val c = Bench.repassCandidates(baseline, measured)
    assert(c.size == 10)
    assert(c.head == "q20") // worst excess first
  }

  test("queries new this round (no baseline) are never candidates") {
    assert(Bench.repassCandidates(Map.empty, Map("qn20" -> 12.0)).isEmpty)
  }

  test("parseBenchLine recovers sf and the per-query map") {
    val line = """{"metric":"total","value":9.1,"unit":"sec","bench_schema":2,""" +
      """"queries":{"q01":0.123,"m27":1.643},"reps":{"m27":2},""" +
      """"ingest":{"q33_bucketed_join":2.5},"sf":0.1}"""
    val (sf, qs) = Bench.parseBenchLine(line)
    assert(sf.contains("0.1"))
    assert(qs == Map("q01" -> 0.123, "m27" -> 1.643))
  }
}

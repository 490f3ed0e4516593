package graft

import org.scalatest.funsuite.AnyFunSuite

/** The normalized bench headline (VERDICT r13 #3): `Bench.normalizedTotal`
  * must recover the reference epoch's total from a uniformly-turbulent
  * epoch — the exact case round 13's driver hit, where the raw headline
  * read 275.3 s on a host the calibration anchors proved ~1.17× slow and
  * proving "really ~235 s" required a judge re-bench. */
class BenchNormalizeSpec extends AnyFunSuite {

  private val refCal = Map(
    "cal_cpu" -> 2.0, "cal_shuffle" -> 3.0, "cal_scan" -> 1.0,
    "cal_stream" -> 4.0)
  private val refQueries = Map(
    "q_a" -> 1.0, "q_b" -> 4.0, "q_c" -> 10.0,
    "q_stream_x" -> 3.0, "q_stream_y" -> 5.0)

  test("synthetic turbulence: a uniformly slowed epoch recovers the reference total") {
    val slow = 1.6 // every measurement on this host reads 1.6x
    val curCal = refCal.map { case (k, v) => k -> v * slow }
    val curQ = refQueries.map { case (k, v) => k -> v * slow }
    val batchR = Bench.medianRatio(curCal, refCal,
      Seq("cal_cpu", "cal_shuffle", "cal_scan"))
    val streamR = Bench.medianRatio(curCal, refCal, Seq("cal_stream"))
    assert(batchR.exists(r => math.abs(r - slow) < 1e-9))
    assert(streamR.exists(r => math.abs(r - slow) < 1e-9))
    val norm = Bench.normalizedTotal(curQ, batchR, streamR)
    val refTotal = refQueries.values.sum
    assert(math.abs(norm - refTotal) < 1e-6,
      s"normalized $norm should recover reference $refTotal")
  }

  test("independent stream-floor drift normalizes by its own anchor") {
    // batch anchors steady, streaming floor 2x slow — the r12 lesson
    val curCal = refCal + ("cal_stream" -> refCal("cal_stream") * 2.0)
    val curQ = refQueries.map { case (k, v) =>
      k -> (if (k.startsWith("q_stream")) v * 2.0 else v)
    }
    val batchR = Bench.medianRatio(curCal, refCal,
      Seq("cal_cpu", "cal_shuffle", "cal_scan"))
    val streamR = Bench.medianRatio(curCal, refCal, Seq("cal_stream"))
    val norm = Bench.normalizedTotal(curQ, batchR, streamR)
    assert(math.abs(norm - refQueries.values.sum) < 1e-6)
  }

  test("median ratio ignores missing/failed anchors; empty gives None") {
    val cur = Map("cal_cpu" -> 2.2, "cal_shuffle" -> -1.0)
    assert(Bench.medianRatio(cur, refCal,
      Seq("cal_cpu", "cal_shuffle", "cal_scan")).contains(1.1))
    assert(Bench.medianRatio(Map.empty, refCal, Seq("cal_cpu")).isEmpty)
  }

  test("failed queries are skipped; missing ratios fall back to raw") {
    val q = Map("q_a" -> 2.0, "q_b" -> -1.0, "q_stream_x" -> 3.0)
    // no anchors at all: raw sum of the positive timings
    assert(math.abs(Bench.normalizedTotal(q, None, None) - 5.0) < 1e-9)
    // batch ratio only: streaming falls back to it (orElse in Bench.main
    // is mirrored here by passing streamR = None)
    assert(math.abs(Bench.normalizedTotal(q, Some(2.0), None) - 2.5) < 1e-9)
  }
}

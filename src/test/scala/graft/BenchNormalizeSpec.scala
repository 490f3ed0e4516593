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

  test("anchors-only turbulence: population estimator recovers the total the anchor bridge provably cannot") {
    // The r14 driver epoch, synthesized (VERDICT r14 #1): transient
    // contention hits the 0.15-0.7s micro-anchors 1.4x while the query
    // population moves only 1.03x — the anchor bridge then over-corrects
    // the headline ~26% in the flattering direction; the population
    // median measures the queries themselves and recovers the truth.
    val anchorSlow = 1.4
    val popSlow = 1.03
    val refQ = (1 to 20).map(i => s"q_$i" -> (0.5 + i * 0.3)).toMap ++
      (1 to 4).map(i => s"q_stream_$i" -> (1.0 + i * 0.2)).toMap
    val curCal = refCal.map { case (k, v) => k -> v * anchorSlow }
    val curQ = refQ.map { case (k, v) => k -> v * popSlow }
    val batchA = Bench.medianRatio(curCal, refCal,
      Seq("cal_cpu", "cal_shuffle", "cal_scan"))
    val streamA = Bench.medianRatio(curCal, refCal, Seq("cal_stream"))
    val batchP = Bench.populationRatio(curQ, refQ, Set.empty, streamSide = false)
    val streamP = Bench.populationRatio(curQ, refQ, Set.empty, streamSide = true)
    assert(batchP.exists(r => math.abs(r - popSlow) < 1e-9))
    assert(streamP.exists(r => math.abs(r - popSlow) < 1e-9))
    val refTotal = refQ.values.sum
    val viaAnchor = Bench.normalizedTotal(curQ, batchA, streamA)
    val viaPop = Bench.normalizedTotal(curQ, batchP, streamP)
    // the anchor bridge divides a 1.03x epoch by 1.4 — off by >20%
    assert(viaAnchor < refTotal * 0.80,
      s"anchor estimator should provably over-correct here: $viaAnchor vs $refTotal")
    assert(math.abs(viaPop - refTotal) < 1e-6,
      s"population estimator should recover $refTotal, got $viaPop")
  }

  test("population estimator excludes unstable rows and sub-floor timings") {
    val refQ = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 3.0,
      "q_tiny" -> 0.05, "q_flagged" -> 4.0)
    // q_flagged read 10x (the kind of row unstable names); q_tiny is
    // sub-noise-floor on both sides; neither may drag the median
    val curQ = Map("q_a" -> 1.1, "q_b" -> 2.2, "q_c" -> 3.3,
      "q_tiny" -> 0.5, "q_flagged" -> 40.0)
    val r = Bench.populationRatio(curQ, refQ, Set("q_flagged"),
      streamSide = false)
    assert(r.exists(v => math.abs(v - 1.1) < 1e-9), s"got $r")
    // empty overlap -> None (caller falls back to the anchor bridge)
    assert(Bench.populationRatio(curQ, Map.empty, Set.empty,
      streamSide = false).isEmpty)
  }

  test("median averages the two middle elements on even-sized input") {
    // ADVICE r14: two surviving anchors at ratios 1.0 and 1.2 must give
    // 1.1, not the upper element 1.2
    val cur = Map("cal_cpu" -> 2.0, "cal_shuffle" -> 3.6)
    assert(Bench.medianRatio(cur, refCal,
      Seq("cal_cpu", "cal_shuffle", "cal_scan")).contains(1.1))
    assert(Bench.medianOf(Seq(1.0, 2.0, 3.0, 4.0)).contains(2.5))
    assert(Bench.medianOf(Seq(3.0, 1.0, 2.0)).contains(2.0))
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

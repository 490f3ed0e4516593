package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract hygiene: a typo'd oracle key silently downgrades a
  * query from hash-verified to rows-only, so the key sets are locked here. */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans === Set.empty[String])
  }

  test("every declared query carries an oracle") {
    // since round 13 even the HLL/quantile sketches hash-check: their
    // raw estimates are engine-internal, so the declared queries surface
    // banded-accuracy AUDIT forms (exact side + in-band verdicts) the
    // DuckDB oracle replays as contract constants
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set.empty[String])
  }

  test("query names follow the q_ convention") {
    assert(SparkEntry.queries.keySet.forall(_.startsWith("q_")))
  }

  test("entry flagship returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // one registered test per query: a single broken query fails as its own
  // named test instead of aborting the whole sweep at the first analysis
  // error (round 7's fixture regression turned 6 broken queries into one
  // opaque suite failure here)
  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name analyzes on sf0.001 with a non-empty schema") {
      val df = SparkEntry.queries(name)(spark, SparkTestSession.Sf)
      assert(df.columns.nonEmpty, name)
    }
  }
}

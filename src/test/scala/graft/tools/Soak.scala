package graft.tools

/** N-trial soak of the flake-prone suites — the engine's analog of the
  * reference's `test-mr-many.sh:15-22` (run the whole crash/timing test
  * battery N times; one intermittent failure is a real bug, not noise).
  * The soaked suites are the nondeterminism-exposed ones: Structured
  * Streaming (micro-batch timing, state store) and the failure-injection
  * / parallelism specs (task retry, scheduler overlap). Each trial gets a
  * distinct seed via `-Dgraft.soak.seed` so the randomized inputs differ
  * between trials, exactly like the reference's fresh corpus per run.
  *
  * Usage: `sbt "Test/runMain graft.tools.Soak [trials]"` (default 3).
  * Exits nonzero on any trial failure.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val results = (1 to n).map { i =>
      sys.props("graft.soak.seed") = (42L + i).toString
      val ok = org.scalatest.tools.Runner.run(Array(
        "-o",
        "-s", "graft.StreamsSpec",
        "-s", "graft.MapReduceJobSpec"))
      println(s"[soak] trial $i/$n seed=${42L + i}: " + (if (ok) "PASS" else "FAIL"))
      ok
    }
    val passed = results.count(identity)
    println(s"[soak] $passed/$n trials passed")
    if (passed != n) sys.exit(1)
  }
}

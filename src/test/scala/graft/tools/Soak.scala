package graft.tools

/** N-trial soak of the FULL suite battery — the engine's analog of the
  * reference's `test-mr-many.sh:15-22` (rerun the *entire* crash/timing
  * test battery N times; one intermittent failure is a real bug, not
  * noise). Suites are discovered from the compiled test classpath
  * (`-R` runpath + `-m graft` membership), so a newly added spec joins
  * the soak automatically — no list to forget to update. Each trial gets
  * a distinct seed via `-Dgraft.soak.seed` so the randomized inputs
  * differ between trials, exactly like the reference's fresh corpus per
  * run. The filesystem-touching suites (kv connector staging, reliable
  * checkpoints) are the next-most flake-prone after streaming and are
  * covered by discovery.
  *
  * Usage: `sbt "Test/runMain graft.tools.Soak [trials] [quick]"`
  * (default 3 trials; `quick` restricts to the two historically
  * flake-prone suites for a fast pre-commit loop).
  * Exits nonzero on any trial failure.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val quick = args.contains("quick")
    val runnerArgs =
      if (quick) Array("-o", "-s", "graft.StreamsSpec", "-s", "graft.MapReduceJobSpec")
      else Array("-o", "-R", "target/scala-2.13/test-classes", "-m", "graft")
    val results = (1 to n).map { i =>
      sys.props("graft.soak.seed") = (42L + i).toString
      val ok = org.scalatest.tools.Runner.run(runnerArgs)
      println(s"[soak] trial $i/$n seed=${42L + i}: " + (if (ok) "PASS" else "FAIL"))
      ok
    }
    val passed = results.count(identity)
    println(s"[soak] $passed/$n trials passed")
    if (passed != n) sys.exit(1)
  }
}

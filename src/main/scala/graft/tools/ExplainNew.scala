package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: executes a query under the tuned session and prints the
  * FINAL adaptive plan's exchange/scan/reuse lines (AQE's initial-plan
  * print hides runtime exchange reuse). */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args.head else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_vocab_prune")
    names.foreach { n =>
      println(s"===== $n")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      df.collect() // drive AQE to final plan
      val p = df.queryExecution.executedPlan.toString
      println(p.split("\n").filter(l => l.contains("Exchange") ||
        l.contains("Scan parquet") || l.contains("Reused")).mkString("\n"))
    }
    spark.stop()
  }
}

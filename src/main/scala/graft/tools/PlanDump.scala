package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for named queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * plans/rNN/. Analysis-only (the plan is the AQE initial plan; nothing
  * executes), so a full 266-query dump is seconds, not minutes.
  *
  * runMain graft.tools.PlanDump <sfDir> <outDir> [suffix] [query ...]
  * Writes <outDir>/<query>_<suffix>.txt (suffix defaults to "before").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    val suffix = if (args.length > 2) args(2) else "before"
    val names = if (args.length > 3) args.drop(3).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    outDir.mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        // same rendering as df.explain("formatted"), captured to a file
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          new java.io.File(outDir, s"${n}_$suffix.txt").toPath, formatted)
      } catch { case e: Throwable =>
        java.nio.file.Files.writeString(
          new java.io.File(outDir, s"${n}_$suffix.txt").toPath,
          s"EXPLAIN FAILED: ${e.toString.linesIterator.next()}\n")
      }
    }
    spark.stop()
  }
}

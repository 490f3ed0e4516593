package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: per-query timing with live output (Bench prints only at end).
  * runMain graft.tools.BenchOne <sfDir> [query ...] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = try graft.SparkEntry.queries(n)(spark, sfDir).count()
                catch { case e: Throwable => println(s"TIMING $n FAILED ${e.getMessage}"); -1L }
      println(f"TIMING $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }
}

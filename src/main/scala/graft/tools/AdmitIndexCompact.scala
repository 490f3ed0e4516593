package graft.tools
import org.apache.spark.sql.SparkSession

/** CLI for [[graft.streaming.AdmitIndex.compactAdmitIndex]] — the between-
  * drains maintenance job a production admit pipeline schedules next to
  * its one-shot drains (per-drain appends grow the index's FILE COUNT
  * with drain count; an optional age prune applies the freshness window
  * the processing-time TTL cannot).
  *
  * Usage: runMain graft.tools.AdmitIndexCompact <indexPath> [maxAgeMs] */
object AdmitIndexCompact {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.AdmitIndexCompact <indexPath> [maxAgeMs]")
      sys.exit(2)
    }
    val path = args.head
    val maxAge = args.lift(1).map { a =>
      try a.toLong catch {
        case _: NumberFormatException =>
          System.err.println(s"maxAgeMs must be a long, got: $a"); sys.exit(2)
      }
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hp = new org.apache.hadoop.fs.Path(path)
    if (!hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)) {
      System.err.println(s"admit index not found: $path")
      spark.stop(); sys.exit(2)
    }
    val t0 = System.nanoTime()
    graft.streaming.AdmitIndex.compactAdmitIndex(spark, path, maxAge)
    val rows = graft.streaming.AdmitIndex.admitIndexRows(spark, path).count()
    println(f"COMPACTED $path in ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
    spark.stop()
  }
}

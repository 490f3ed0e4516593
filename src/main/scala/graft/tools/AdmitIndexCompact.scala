package graft.tools
import org.apache.spark.sql.SparkSession

/** CLI for [[graft.streaming.Streams.compactAdmitIndex]] — the between-
  * drains maintenance job a production admit pipeline schedules next to
  * its one-shot drains (per-drain appends grow the index's FILE COUNT
  * with drain count; an optional age prune applies the freshness window
  * the processing-time TTL cannot).
  *
  * Usage: runMain graft.tools.AdmitIndexCompact <indexPath> [maxAgeMs] */
object AdmitIndexCompact {
  def main(args: Array[String]): Unit = {
    val path = args.head
    val maxAge = args.lift(1).map(_.toLong)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    graft.streaming.Streams.compactAdmitIndex(spark, path, maxAge)
    val rows = spark.read.parquet(path).count()
    println(f"COMPACTED $path in ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
    spark.stop()
  }
}

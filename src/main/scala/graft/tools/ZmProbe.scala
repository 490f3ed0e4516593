package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.sys
/** Step-level timing probe for the persisted zone-map manifest path
  * (round 14): fingerprint (footer-stats pushdown), generation resolve,
  * manifest read, skip stats, and the zorder-lane pruned match read —
  * each timed in isolation after an explicit session warmup, so the
  * "manifest-read cost is fact-row-independent" claim in SURVEY §9 is
  * reproducible. Env: GRAFT_ZM_PATH (manifest root), GRAFT_ZM_BLOCKROWS
  * (deployment block width; the 4096 default is the fixture demo). */
object ZmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("GRAFT_ZM_CORPUS", "/tmp/sf100x"); val p = sys.env.getOrElse("GRAFT_ZM_PATH", "/tmp/zm100x/manifest")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $n%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    spark.range(1000000L).agg(sum(col("id"))).collect() // JVM/codegen warmup
    spark.read.parquet(dir + "/orders.parquet").limit(1).collect()
    spark.conf.set("spark.graft.zonemap.manifestPath", p)
    sys.env.get("GRAFT_ZM_BLOCKROWS").foreach(v => spark.conf.set("spark.graft.zonemap.blockRows", v))
    val fp = t("fingerprint")(graft.operators.ZoneMaps.fingerprint(spark, dir))
    val (m, dataPath) = t("resolveOrBuild")(graft.operators.ZoneMaps.resolveOrBuild(spark, dir, p))
    t("manifest.count")(m.count())
    val hit = m.withColumn("hit", col("max_cx") >= 100L && col("min_cx") <= 299L &&
      col("max_dy") >= 2000L && col("min_dy") <= 2499L)
    t("skipStats")(hit.groupBy("layout").agg(count(lit(1))).collect())
    // round 15 (VERDICT r14 #2): the match read is manifest-driven —
    // hit blk ids collected off the block-count-sized manifest, then a
    // by-path read of exactly those partition directories; driver
    // listing is O(hit blocks), not O(all blocks) (the r14 join form
    // paid ~10 s here listing 7.5 k dirs at demo width)
    val hitBlks = t("hitBlks-collect")(
      hit.filter(col("hit") && col("layout") === "zorder")
        .select(col("blk")).collect().map(_.getLong(0)).toSeq)
    println("HITBLOCKS " + hitBlks.size)
    def matched() = graft.operators.ZoneMaps
      .prunedBlocks(spark, dataPath, "zorder", hitBlks)
      .filter(col("cx").between(100L,299L) && col("dy").between(2000L,2499L))
      .agg(count(lit(1)))
    t("matchedOne-zorder")(matched().collect())
    val mq = matched()
    mq.collect()
    val plan = mq.queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").filter(l => l.contains("FileScan") || l.contains("PartitionFilters")).take(3)
    scanLine.foreach(l => println("SCAN " + l.take(400)))
    spark.stop()
  }
}

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
    t("matchedOne-zorder")(spark.read.parquet(dataPath)
      .select(col("layout").cast("string").as("layout"), col("blk").cast("long").as("blk"), col("cx"), col("dy"))
      .filter(col("layout") === "zorder")
      .join(hit.filter(col("hit") && col("layout") === "zorder").select("layout","blk"), Seq("layout","blk"))
      .filter(col("cx").between(100L,299L) && col("dy").between(2000L,2499L))
      .agg(count(lit(1))).collect())
    val mq = spark.read.parquet(dataPath)
      .select(col("layout").cast("string").as("layout"), col("blk").cast("long").as("blk"), col("cx"), col("dy"))
      .filter(col("layout") === "zorder")
      .join(hit.filter(col("hit") && col("layout") === "zorder").select("layout","blk"), Seq("layout","blk"))
      .filter(col("cx").between(100L,299L) && col("dy").between(2000L,2499L))
      .agg(count(lit(1)))
    mq.collect()
    val plan = mq.queryExecution.executedPlan.toString
    println("HASDPP " + plan.contains("dynamicpruning"))
    val scanLine = plan.split("\n").filter(l => l.contains("FileScan") || l.contains("PartitionFilters")).take(3)
    scanLine.foreach(l => println("SCAN " + l.take(400)))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: prints each named query's broadcast-hinted subtrees and
  * whether [[HintAudit]] can prove them constant-bounded. With no args,
  * sweeps every declared query and prints only the unproven counts —
  * the generator for `PlanGuardSpec.unboundedHintAllowed`. */
object HintDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.tune(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf)
        val hinted = HintAudit.broadcastHinted(df)
        val unproven = hinted.filterNot(HintAudit.constantBounded)
        if (args.nonEmpty) {
          hinted.zipWithIndex.foreach { case (c, i) =>
            println(s"=== $name hint #$i bounded=${HintAudit.constantBounded(c)}")
            if (!HintAudit.constantBounded(c))
              println(c.treeString.linesIterator.take(60).mkString("\n"))
          }
        } else if (unproven.nonEmpty)
          println(s"""    "$name" -> ${unproven.size},""")
      } catch {
        case e: Exception => println(s"    // $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Relational.zoneMap]] models block stats as an
  * explicit manifest so the pruning arithmetic is oracle-checkable; this
  * spec proves the SAME mechanism on REAL parquet row groups. Identical
  * rows are written twice — z-order-sorted vs insertion-order-sorted —
  * with small row groups, then read back through the same 2-d box
  * filter. Parquet keeps min/max stats per row group and Spark pushes
  * the box predicate into the scan, so the z-ordered file's scan emits
  * a fraction of its rows (only the clustered groups survive) while the
  * insertion-ordered file reads essentially everything: the q_zone_map
  * skip ratio, reproduced by the storage engine itself. Uses sf0.01
  * (the sf0.001 fixture is smaller than one row group, which would
  * make both layouts trivially one-group files). */
class ZoneMapLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    var rows = -1L
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case leaf if leaf.children.isEmpty =>
        leaf.metrics.get("numOutputRows").foreach(m => rows = m.value)
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(rows >= 0, "no scan numOutputRows metric found")
    rows
  }

  test("z-ordered parquet row groups prune under the 2-d box filter") {
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 16).map(i => shiftleft(shiftright(c, i).bitwiseAND(1), 2 * i))
        .reduce(_ + _)
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("cx"),
        pmod(expr("datediff(to_date(o_orderdate), '1990-01-01')")
          .cast("long"), lit(65536L)).as("dy"))
      .withColumn("zkey", spread(col("cx")) + spread(col("dy")) * 2)
    val root = java.nio.file.Files.createTempDirectory("graft_zmlayout").toString
    try {
      // one file each, many small row groups; same rows, two physical orders
      base.coalesce(1).sortWithinPartitions("zkey")
        .write.option("parquet.block.size", 32768)
        .mode("overwrite").parquet(s"$root/z")
      base.coalesce(1).sortWithinPartitions("o_orderkey")
        .write.option("parquet.block.size", 32768)
        .mode("overwrite").parquet(s"$root/nat")
      def boxScan(path: String) =
        spark.read.parquet(path)
          .filter(col("cx").between(100L, 299L) && col("dy").between(2000L, 2499L))
      val total = base.count()
      val matched = boxScan(s"$root/z").count()
      assert(matched === boxScan(s"$root/nat").count(),
        "both layouts must answer identically")
      assert(matched > 0, "box predicate must be populated at sf0.01")
      val zRows = scanOutputRows(boxScan(s"$root/z"))
      val natRows = scanOutputRows(boxScan(s"$root/nat"))
      // the insertion order spans the full custkey range in every row
      // group — stats prune nothing; the z-order clusters the box into
      // few groups. Conservative bounds so row-group boundary effects
      // can't flake the spec: natural reads >80% of the file, z-order
      // reads <40% and strictly less than natural.
      assert(natRows > (total * 8) / 10,
        s"insertion order should read ~everything: $natRows of $total")
      assert(zRows < (total * 4) / 10,
        s"z-order should prune most row groups: $zRows of $total")
      assert(zRows < natRows)
      // and the scan really pushed the box predicate down. Matched
      // loosely (case-insensitive filter name + column + bound, any
      // separators) so a Spark upgrade or a V1→V2 reader switch that
      // re-renders the scan node's pushed-filter list doesn't fail the
      // spec while behavior is unchanged (ADVICE r14); the behavioral
      // proof is the scanOutputRows row-group skipping assertions above.
      val plan = boxScan(s"$root/z").queryExecution.executedPlan.toString
      val pushed = "(?is)pushedfilters.{0,400}?greaterthanorequal\\W{0,3}cx\\W{0,3}100".r
      assert(pushed.findFirstIn(plan).isDefined,
        s"box filter not pushed:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}

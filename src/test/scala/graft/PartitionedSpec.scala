package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Partitioned

/** The partitioned layout must actually prune: literal filters as
  * PartitionFilters, join-derived filters as dynamic pruning subqueries. */
class PartitionedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("literal lang filter prunes partitions statically") {
    val df = Partitioned.partitionedScan(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition filter in plan:\n$plan")
    assert(df.count() > 0)
  }

  test("join-derived lang filter prunes partitions dynamically") {
    val df = Partitioned.dppJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in plan:\n$plan")
    assert(df.count() > 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketed

/** The point of bucketing: the co-located join has NO exchange on the
  * join key — both scans come pre-partitioned from the bucket layout. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("bucketed join plans without a join-key shuffle") {
    val df = Bucketed.bucketedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"join-key exchange present:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join-key exchange present:\n$plan")
    // correctness vs the straightforward plan
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.operators.Relational.joinAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) === want.map(t => (t._1, t._2)))
  }

  test("bucket pruning: an equality filter on the bucket key reads 1 of 8 buckets") {
    Bucketed.bucketedJoin(spark, sf).count() // ensure the layout exists
    // autoBucketedScan turns bucketed reading off when no operator needs
    // the distribution; pin it on so the pruning path is exercised (the
    // scan-only shape a point-lookup job runs)
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val one = spark.table("graft_orders_b").filter(org.apache.spark.sql
        .functions.col("o_custkey") === 42L)
      val scan = one.queryExecution.executedPlan.toString
      // only the single bucket that can hold o_custkey=42 is read — at
      // 100 TB this is one file group instead of the whole table
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected bucket pruning in:\n$scan")
    } finally spark.conf.set(conf, prev)
  }
}

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
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Structural checks on the relational queries over sf0.001 (the full
  * value-level check is the DuckDB differential gate — tools/compare.py). */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("semi ∪ anti = all customers, semi ∩ anti = ∅") {
    val semi = Relational.semiJoin(spark, sf).collect().map(_.getLong(0)).toSet
    val anti = Relational.antiJoin(spark, sf).collect().map(_.getLong(0)).toSet
    val all = Tables.customer(spark, sf).collect().map(_.getLong(0)).toSet
    assert((semi | anti) === all)
    assert((semi & anti) === Set.empty[Long])
  }

  test("window_rank: at most 3 per customer, prices non-increasing") {
    val rows = Relational.windowRank(spark, sf).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getLong(3))
      val prices = sorted.map(_.getDouble(2)).toSeq
      assert(prices === prices.sorted.reverse)
    }
  }

  test("topk_orders equals the head of a full sort") {
    val topk = Relational.topkOrders(spark, sf).collect().map(_.getLong(0)).toSeq
    val full = Tables.orders(spark, sf)
      .sort(org.apache.spark.sql.functions.col("o_totalprice").desc,
            org.apache.spark.sql.functions.col("o_orderkey"))
      .limit(10).collect().map(_.getLong(0)).toSeq
    assert(topk === full)
  }

  test("rollup: grand total row equals table count") {
    val rows = Relational.rollupAgg(spark, sf).collect()
    val total = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(total.getLong(2) === Tables.lineitem(spark, sf).count())
  }

  test("sessionize: n_sessions >= 1 and <= n_events per user") {
    Relational.sessionize(spark, sf).collect().foreach { r =>
      val (sess, ev) = (r.getLong(1), r.getLong(2))
      assert(sess >= 1L && sess <= ev)
    }
  }

  test("approx_count_distinct stays within its 2% relative-error target") {
    Relational.approxDistinct(spark, sf).collect().foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"HLL estimate $approx too far from $exact")
    }
  }

  test("corr_exact matches a plain-Scala correlation computation") {
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (k, xs) =>
      val n = xs.length.toDouble
      val (qs, ps) = (xs.map(_._2), xs.map(_._3))
      val (mq, mp) = (qs.sum / n, ps.sum / n)
      val cov = qs.zip(ps).map { case (a, b) => (a - mq) * (b - mp) }.sum
      val sdq = math.sqrt(qs.map(a => (a - mq) * (a - mq)).sum)
      val sdp = math.sqrt(ps.map(b => (b - mp) * (b - mp)).sum)
      k -> cov / (sdq * sdp)
    }
    Relational.corrExact(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - expected(r.getString(0))) < 1e-6)
    }
  }

  test("grouped_agg plan pushes the shipdate filter into the parquet scan") {
    val plan = Relational.groupedAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in plan:\n$plan")
  }

  test("join_agg broadcasts the customer dimension") {
    val plan = Relational.joinAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}

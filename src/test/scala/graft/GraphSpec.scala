package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Brute-force cross-check of the triangle census on the sf0.001 basket
  * graph. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("triangle census equals a driver-side brute force") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nWedges = deg.values.map(d => d * (d - 1) / 2).sum
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val nTri = adj.valuesIterator.map { ns =>
      (for (i <- ns.indices; j <- i + 1 until ns.length
            if edges.contains((ns(i), ns(j)))) yield 1).size.toLong
    }.sum
    val r = Graph.triangleCount(spark, sf).collect().head
    assert(r.getLong(0) === edges.size.toLong)
    assert(r.getLong(1) === nWedges)
    assert(r.getLong(2) === nTri)
    assert(r.getDouble(3) === (if (nWedges > 0) 3.0 * nTri / nWedges else 0.0))
  }
}

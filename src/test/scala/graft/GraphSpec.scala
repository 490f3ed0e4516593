package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Brute-force cross-check of the triangle census on the sf0.001 basket
  * graph. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("co-purchase top-20 equals a driver-side brute force") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val support = li.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b), n) => (a, b, n) }
    val expected = support.sortBy { case (a, b, n) => (-n, a, b) }.take(20)
    val got = Graph.coPurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

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

  test("edge Jaccard equals a driver-side brute force") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = edges.toSeq.map { case (a, b) =>
      val t = (adj(a) intersect adj(b)).size.toLong
      (a, b, t, t * 1000000L / (adj(a).size + adj(b).size - t))
    }.sortBy { case (a, b, _, j) => (-j, a, b) }.take(20)
    val got = Graph.edgeJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  // Adversarial skew: a 10⁴-leaf hub (the shape a hot part in 10⁵ baskets
  // produces at 100 TB). The old id-order orientation pivots on the hub
  // and emits C(10⁴, 2) ≈ 5×10⁷ wedge candidates from that single key; the
  // degree-ordered orientation directs every edge AT the hub, so per-pivot
  // fan-out stays O(1) here and O(√m) in general. The same discipline as
  // the reference's adversarial crash test (test-mr.sh:270-317): pick the
  // plan that survives hostile input, not just the uniform fixture.
  test("degree orientation bounds wedge candidates on a hub graph") {
    import spark.implicits._
    val n = 10000L
    // hub 0 — all leaves, plus a leaf chain i—(i+1) so the graph has
    // wedges and triangles (each {i, i+1, hub} closes one)
    val edges = ((1L to n).map(i => (0L, i)) ++
      (1L until n).map(i => (i, i + 1))).toDF("a", "b")
    val deg = Graph.degreesOf(edges)
    val cand = Graph.wedgeCandidates(Graph.orientByDegree(edges, deg))
    val candCount = cand.count()
    // id-order would emit ≈ 5×10⁷; degree order keeps it ≲ m
    assert(candCount <= 3 * n, s"wedge candidates not skew-bounded: $candCount")
    val r = Graph.censusOf(edges, deg).collect().head
    assert(r.getLong(0) === 2 * n - 1)   // n hub edges + (n−1) chain edges
    assert(r.getLong(2) === n - 1)       // one triangle per chain edge
  }

  test("graph components census equals a driver-side union-find") {
    val rows = Graph.components(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // union-find over the same basket pairs
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    li.groupBy(_._1).values.foreach { xs =>
      val ps = xs.map(_._2).distinct
      if (ps.length > 1) ps.tail.foreach(union(ps.head, _))
    }
    // vertices = parts appearing in a basket with ≥ 2 distinct parts
    val verts = li.groupBy(_._1).values
      .filter(_.map(_._2).distinct.length > 1).flatMap(_.map(_._2)).toSet
    val sizes = verts.groupBy(find).map(_._2.size.toLong)
    val want = sizes.groupBy(identity).map { case (sz, xs) =>
      (sz, xs.size.toLong, sz * xs.size) }.toSeq.sortBy(_._1)
    assert(rows.toSeq === want)
    assert(rows.map(_._3).sum === verts.size.toLong,
      "components partition the co-purchased catalog")
  }
}

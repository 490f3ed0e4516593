package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Evaluation, Graph, Relational, Skew, Temporal}

/** Behavior tests for the round-8 census/eval additions: TPC-H Q5,
  * weighted median, the constraint census, per-segment OLS spend trend,
  * rolling 7-day active users, exact ROC-AUC, association rules, and the
  * salted two-phase aggregation. Each is replayed driver-side from the
  * raw fixtures by an independent formulation (brute force over collected
  * rows, or the plain unsalted/unfactored plan), the same oracle
  * discipline the reference applies via `test-mr.sh`'s sequential diff.
  */
class CensusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("tpch_q5 equals an independent SQL formulation") {
    val got = Relational.tpchQ5(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => spark.read.parquet(s"$sf/$t.parquet")
        .createOrReplaceTempView(s"v_$t"))
    val want = spark.sql(
      """SELECT n_name, cast(sum(cast(l_extendedprice * (1 - l_discount)
        |    as decimal(18,6))) as double) AS revenue
        |FROM v_customer, v_orders, v_lineitem, v_supplier, v_nation, v_region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1997-01-01'
        |  AND o_orderdate < DATE '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("weighted_median: half the revenue mass sits at or below the median") {
    val rows = Relational.weightedMedian(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity"),
        expr("cast(floor(l_extendedprice * 100) as bigint)").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    for (r <- rows) {
      val flag = r.getString(0)
      val med = r.getDouble(1)
      val tot = r.getLong(2)
      val mine = li.filter(_._1 == flag)
      assert(tot === mine.map(_._3).sum)
      val below = mine.filter(_._2 <= med).map(_._3).sum
      val strictlyBelow = mine.filter(_._2 < med).map(_._3).sum
      assert(below * 2 >= tot, "mass through the median reaches half")
      assert(strictlyBelow * 2 < tot, "the median is the SMALLEST such point")
    }
    assert(rows.nonEmpty)
  }

  test("constraint_check: the clean fixture passes every constraint") {
    val rows = Relational.constraintCheck(spark, sf).collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getLong(4) === 1L), "all constraints pass")
    // n_rows per constraint matches the base table counts
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("customer.c_custkey unique") ===
      spark.read.parquet(s"$sf/customer.parquet").count())
    assert(byName("lineitem.l_quantity in [1,50]") ===
      spark.read.parquet(s"$sf/lineitem.parquet").count())
    assert(byName("orders.o_custkey complete") ===
      byName("orders.o_custkey fk customer"))
    // pass_ppm is exact: (n_rows - n_bad) * 1e6 div n_rows
    rows.foreach { r =>
      assert(r.getLong(3) === (r.getLong(1) - r.getLong(2)) * 1000000L / r.getLong(1))
    }
  }

  test("spend_trend: slope matches a driver-side OLS over the monthly cells") {
    val got = Temporal.spendTrend(spark, sf).collect()
    val cells = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(expr("cast(floor(o_totalprice * 100) as bigint)")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m0 = cells.map(_._2).min
    for (r <- got) {
      val seg = r.getString(0)
      val pts = cells.filter(_._1 == seg).map(c => (BigInt(c._2 - m0), BigInt(c._3)))
      val n = BigInt(pts.length)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val want = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
      assert(r.getLong(1) === pts.length.toLong)
      assert(BigInt(r.getLong(2)) === want, s"slope for $seg")
    }
    assert(got.length === 5)
  }

  test("theil_sen + mann_kendall replay from a driver-side pair sweep") {
    val cells = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(expr("cast(floor(o_totalprice * 100) as bigint)")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val ts = Temporal.theilSen(spark, sf).collect()
    assert(ts.length === 5)
    for (r <- ts) {
      val pts = cells(r.getString(0)).sortBy(_._2)
      val pairs = for {
        i <- pts.indices; j <- pts.indices if i < j
      } yield (pts(j)._3 - pts(i)._3, pts(j)._2 - pts(i)._2)
      assert(r.getLong(1) === pairs.length.toLong)
      // the reported slope is the lower-median pair under the
      // (double slope, num, den) order — replay the selection exactly
      val sorted = pairs.map { case (num, den) =>
        (num.toDouble / den.toDouble, num, den)
      }.sorted
      val (ws, wn, wd) = sorted((pairs.length + 1) / 2 - 1)
      assert(r.getLong(2) === wn && r.getLong(3) === wd)
      assert(r.getDouble(4) === ws)
      // median property: at most half the slopes fall strictly below/above
      val below = sorted.count(_._1 < ws)
      val above = sorted.count(_._1 > ws)
      assert(below <= pairs.length / 2 && above <= (pairs.length + 1) / 2)
    }
    val mk = Temporal.mannKendall(spark, sf).collect()
    assert(mk.length === 5)
    for (r <- mk) {
      val pts = cells(r.getString(0)).sortBy(_._2)
      val signs = for {
        i <- pts.indices; j <- pts.indices if i < j
      } yield (pts(j)._3 compare pts(i)._3).sign.toLong
      assert(r.getLong(1) === signs.length.toLong)
      assert(r.getLong(2) === signs.sum)
      assert(r.getDouble(3) === signs.sum.toDouble / signs.length.toDouble)
      val verdict = if (signs.sum > 0) "increasing"
        else if (signs.sum < 0) "decreasing" else "no_trend"
      assert(r.getString(4) === verdict)
    }
  }

  test("active_users: WAU/DAU match a brute force and WAU bounds DAU") {
    val got = Temporal.activeUsers(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val du = spark.read.parquet(s"$sf/events.parquet")
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = du.map(_._1).distinct.sorted((a: java.time.LocalDate,
        b: java.time.LocalDate) => a.compareTo(b))
    val want = days.map { d =>
      val wau = du.filter(p => !p._1.isAfter(d) &&
        !p._1.isBefore(d.minusDays(6))).map(_._2).distinct.length.toLong
      val dau = du.filter(_._1 == d).map(_._2).distinct.length.toLong
      (d.toString, dau, wau)
    }
    assert(got.toSeq === want.toSeq)
    assert(got.forall(r => r._2 <= r._3), "DAU never exceeds WAU")
  }

  test("auc: matches the pairwise Mann-Whitney brute force per source") {
    val got = Evaluation.auc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("n_chars"), (col("lang") === "en").as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    for ((src, nPos, nNeg, aucPpm) <- got) {
      val pos = docs.filter(d => d._1 == src && d._3).map(_._2)
      val neg = docs.filter(d => d._1 == src && !d._3).map(_._2)
      assert(nPos === pos.length.toLong && nNeg === neg.length.toLong)
      // U2 = #(pos > neg)*2 + #(ties): every (pos, neg) pair compared
      val u2 = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      assert(aucPpm ===
        (BigInt(u2) * 1000000 / (2 * BigInt(pos.length) * neg.length)).toLong,
        s"AUC for $src")
    }
    assert(got.nonEmpty)
  }

  test("assoc_rules: confidence/lift replay from brute-force basket supports") {
    val rules = Graph.assocRules(spark, sf).collect()
    assert(rules.length === 20)
    val dp = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nb = dp.map(_._1).distinct.length
    val isupp = dp.groupBy(_._2).map { case (p, xs) => p -> xs.length }
    val baskets = dp.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    for (r <- rules) {
      val (a, c) = (r.getLong(0), r.getLong(1))
      val sab = baskets.count(b => b(a) && b(c)).toLong
      assert(r.getLong(2) === sab)
      assert(sab >= 2)
      assert(r.getLong(3) === sab * 1000000L / isupp(a))
      assert(BigInt(r.getLong(4)) ===
        BigInt(sab) * nb * 1000000 / (BigInt(isupp(a)) * isupp(c)))
      // a rule worth surfacing: lift above 1 means positive association
      assert(r.getLong(4) > 0)
    }
    // deterministic total order on (lift desc, conf desc, keys)
    val key = rules.map(r => (-r.getLong(4), -r.getLong(3), r.getLong(0), r.getLong(1)))
    assert(key.sameElements(key.sorted))
  }

  test("tpch_q10 equals an independent SQL formulation") {
    val got = Relational.tpchQ10(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    Seq("customer", "orders", "lineitem", "nation")
      .foreach(t => spark.read.parquet(s"$sf/$t.parquet")
        .createOrReplaceTempView(s"w_$t"))
    val want = spark.sql(
      """SELECT c_custkey, c_name, cast(sum(cast(l_extendedprice *
        |    (1 - l_discount) as decimal(18,6))) as double) AS revenue
        |FROM w_customer, w_orders, w_lineitem, w_nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1997-10-01'
        |  AND o_orderdate < DATE '1998-01-01'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
    assert(got.length === 20)
  }

  test("keyness: 2x2 cells replay exactly and ranking is over-represented only") {
    val got = graft.operators.Pipeline.keyness(spark, sf).collect()
    assert(got.nonEmpty)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), explode(graft.functions.Fns.tokensArr(col("text")))
        .as("word"))
      .filter(col("word") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = BigInt(toks.length)
    for (r <- got) {
      val (src, word) = (r.getString(0), r.getString(2))
      val a = BigInt(toks.count(t => t._1 == src && t._2 == word))
      val ab = BigInt(toks.count(_._2 == word))
      val ac = BigInt(toks.count(_._1 == src))
      val (b, c) = (ab - a, ac - a)
      val d = n - ab - c
      assert(r.getLong(3) === a.toLong && r.getLong(4) === ab.toLong)
      assert(a * d > b * c, "only over-represented words rank")
      val q = n * (a * d - b * c) * (a * d - b * c)
      val dn = ab * (c + d) * ac * (b + d)
      assert(BigInt(r.getLong(5)) === (q / dn) * 1000000 + (q % dn) * 1000000 / dn)
    }
    // exactly ≤10 per source, rank dense from 1
    got.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq)
      assert(rs.length <= 10)
    }
  }

  test("mta: both credit models conserve revenue exactly") {
    val rows = Temporal.mtaAttribution(spark, sf).collect()
    val totalLin = rows.map(_.getLong(2)).sum
    val totalDec = rows.map(_.getLong(3)).sum
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(floor(value * 100) as bigint)")))
      .collect()(0).getLong(0)
    assert(totalLin === purchases, "linear credits sum to total revenue")
    assert(totalDec === purchases, "decay credits sum to total revenue")
    // decay weights recency: later-hour touches should never earn less
    // under decay than linear IN AGGREGATE for the -1 orphan bucket
    val orphan = rows.find(_.getLong(0) === -1L)
    orphan.foreach(r => assert(r.getLong(2) === r.getLong(3),
      "orphans carry identical full credit in both models"))
    assert(rows.nonEmpty)
  }

  test("path_purchase: shares are exact and paths replay from user timelines") {
    val rows = Temporal.pathToPurchase(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)))
    val allPaths = byUser.values.flatMap { tl =>
      tl.zipWithIndex.collect { case (e, i) if e._4 == "purchase" =>
        val p1 = if (i >= 1) tl(i - 1)._4 else "^"
        val p2 = if (i >= 2) tl(i - 2)._4 else "^"
        s"$p2 > $p1 > purchase"
      }
    }.toSeq
    val counts = allPaths.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = allPaths.size.toLong
    for ((path, n, ppm) <- rows) {
      assert(counts(path) === n, s"count for $path")
      assert(ppm === n * 1000000L / total)
    }
    // top-20 under (n desc, path) total order
    val key = rows.map(r => (-r._2, r._1))
    assert(key.sameElements(key.sorted))
  }

  test("benford: cells partition orders and expected shares are the pinned table") {
    val rows = Relational.benford(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ===
      spark.read.parquet(s"$sf/orders.parquet").count())
    val exp = Map(1L -> 301030L, 2L -> 176091L, 3L -> 124939L, 4L -> 96910L,
      5L -> 79181L, 6L -> 66947L, 7L -> 57992L, 8L -> 51153L, 9L -> 45757L)
    rows.foreach { r =>
      assert(r.getLong(3) === exp(r.getLong(0)))
      assert(r.getLong(4) === math.abs(r.getLong(2) - r.getLong(3)))
      assert(r.getLong(5) === (if (r.getLong(4) > 20000L) 1L else 0L))
    }
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
  }

  test("concurrency: hourly peaks replay a driver-side global sweep-line") {
    val got = Temporal.concurrency(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // driver-side: sessionize, emit ±1 boundaries, ONE global running sum
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val bounds = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var (st, en, sid) = (sorted.head._2, sorted.head._2, 1L)
      for (e <- sorted.tail) {
        if (e._2 - en > 1800L * 1000000L) {
          bounds += ((st, en, sid)); st = e._2; sid += 1
        }
        en = e._2
      }
      bounds += ((st, en, sid))
      bounds.map { case (s0, e0, i) => (u, i, s0, e0) }
    }
    val pts = sessions.flatMap { case (u, i, s0, e0) =>
      Seq((s0, 1L, u, i), (e0, -1L, u, i)) }
      .sortBy(p => (p._1, -p._2, p._3, p._4))
    var run = 0L
    val curve = pts.map { p => run += p._2; (p._1, p._2, run) }
    val wantPeak = curve.groupBy(c => c._1 / 3600000000L * 3600000000L)
      .map { case (h, cs) =>
        val hour = java.time.Instant.ofEpochSecond(h / 1000000L)
          .atZone(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss"))
        hour -> (cs.count(_._2 == 1L).toLong, cs.count(_._2 == -1L).toLong,
          cs.map(_._3).max)
      }
    assert(got === wantPeak)
    // conservation: every opened session closes
    assert(got.values.map(_._1).sum === got.values.map(_._2).sum)
  }

  test("freshness: watermark type is fresh, volumes reconcile") {
    val rows = Temporal.freshness(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ===
      spark.read.parquet(s"$sf/events.parquet").count())
    // the type holding the newest event has zero staleness
    assert(rows.map(_.getLong(3)).min === 0L)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "trailing-day count bounded")
      assert(r.getLong(3) >= 0L)
    }
  }

  test("asof_forward: each match is the earliest order at/after the event day") {
    val got = Temporal.asofForward(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), to_date(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
      .map(e => e._1 -> e).toMap
    for ((eid, uid, nko, days) <- got) {
      val (_, _, ed) = events(eid)
      val cands = orders.filter(o => o._1 == uid && !o._2.isBefore(ed))
      if (cands.isEmpty) { assert(nko === -1L && days === -1L) }
      else {
        val d0 = cands.map(_._2).min((a: java.time.LocalDate,
          b: java.time.LocalDate) => a.compareTo(b))
        assert(days === java.time.temporal.ChronoUnit.DAYS.between(ed, d0))
        assert(nko === cands.filter(_._2 == d0).map(_._3).min)
      }
    }
    assert(got.nonEmpty)
  }

  test("ivm_join: four-term delta decomposition equals the direct join") {
    val got = Relational.ivmJoin(spark, sf).collect().map(_.toSeq)
    val prof = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"))
    val want = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("cast(floor(value * 100) as bigint)").as("cents"))
      .join(prof, Seq("user_id"))
      .select(col("event_type"),
        when(col("n_orders") >= 12, "heavy").otherwise("light").as("tier"),
        col("cents"))
      .groupBy("event_type", "tier")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy("event_type", "tier").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("emb_health: norms replay driver-side and cells partition the store") {
    val rows = graft.operators.Pipeline.embHealth(spark, sf).collect()
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("label").cast("long"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(rows.map(_.getLong(1)).sum === embs.length.toLong)
    for (r <- rows) {
      val vs = embs.filter(_._1 == r.getLong(0)).map(_._2)
      val n2s = vs.map(v => math.floor(
        v.foldLeft(0.0)((a, x) => a + x * x) * 1e6).toLong)
      assert(r.getLong(3) === n2s.min && r.getLong(4) === n2s.max)
      assert(r.getLong(5) === n2s.map(BigInt(_)).sum / n2s.length)
      assert(r.getLong(6) === n2s.count(_ == 0L).toLong)
      assert(r.getLong(7) === vs.map(_.count(_ == 0.0).toLong).sum)
    }
    assert(rows.nonEmpty)
  }

  test("bootstrap_ci: replica weights replay, CI brackets the sample mean") {
    val row = Relational.bootstrapCi(spark, sf).collect()(0)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        expr("cast(floor(o_totalprice * 100) as bigint)")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getLong(0) === orders.length.toLong)
    // replay the pinned Poisson(1) draw for all 32 replicas
    val cdf = Seq(3679, 7358, 9197, 9810, 9963, 9994, 9999)
    def weight(k: Long, b: Long): Long = {
      val r = ((k % 1000000007L) * (2654435761L + b * 40503L) +
        97L + b * 131L) % 1000000007L % 10000L
      cdf.indexWhere(r < _) match { case -1 => 7L case i => i.toLong }
    }
    val means = (0L until 32L).map { b =>
      val (n, sc) = orders.foldLeft((0L, BigInt(0))) { case ((n0, s0), (k, c)) =>
        val w = weight(k, b); (n0 + w, s0 + BigInt(w) * c)
      }
      (b, (sc * 1000000 / n).toLong)
    }
    val sorted = means.sortBy(m => (m._2, m._1)).map(_._2)
    assert(row.getLong(2) === sorted(1), "ci_lo is the 2nd replica mean")
    assert(row.getLong(3) === sorted(30), "ci_hi is the 31st replica mean")
    // the interval is ordered and brackets the exact mean at this n
    assert(row.getLong(2) <= row.getLong(1) && row.getLong(1) <= row.getLong(3))
  }

  test("changepoint: the split maximizes CUSUM deviation over an hourly replay") {
    val row = Temporal.changepoint(spark, sf).collect()(0)
    val counts = Tables.events(spark, sf)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("h"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val s = counts.map(_._2).sum
    val hh = counts.length.toLong
    val prefix = counts.scanLeft(0L)(_ + _._2).drop(1)
    val devs = prefix.zipWithIndex.map { case (sh, i) =>
      (BigInt(sh) * hh - BigInt(i + 1) * s).abs }
    val bestIdx = devs.zipWithIndex.maxBy { case (d, i) => (d, -i) }._2
    assert(row.getString(0) === counts(bestIdx)._1)
    assert(row.getLong(1) === prefix(bestIdx))
    assert(row.getLong(2) === s - prefix(bestIdx))
    assert(BigInt(row.getLong(5)) ===
      devs(bestIdx) * 1000000 / (BigInt(s) * hh))
    // totals conserve
    assert(row.getLong(1) + row.getLong(2) === s)
  }

  test("reconcile: bands partition all orders and totals conserve") {
    val rows = Relational.reconcile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    val lineOrders = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    // every order lands in exactly one band; orphan line-orders add rows
    val totalRows = rows.map(_._2).sum
    assert(totalRows >= nOrders && totalRows >= lineOrders)
    // recorded cents conserve across bands
    val recTotal = spark.read.parquet(s"$sf/orders.parquet")
      .agg(sum(expr("cast(floor(o_totalprice * 100) as bigint)")))
      .collect()(0).getLong(0)
    assert(rows.map(_._3).sum === recTotal)
    // computed cents conserve too
    val compTotal = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(sum(expr("cast(floor(l_extendedprice * 100) as bigint)")))
      .collect()(0).getLong(0)
    assert(rows.map(_._4).sum === compTotal)
    assert(rows.nonEmpty)
  }

  test("cohort_ltv: triangle conserves revenue and LTV is monotone per cohort") {
    val rows = Temporal.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // total revenue across all (cohort, age) cells equals corpus revenue
    val total = spark.read.parquet(s"$sf/orders.parquet")
      .agg(sum(expr("cast(floor(o_totalprice * 100) as bigint)")))
      .collect()(0).getLong(0)
    assert(rows.map(_._4).sum === total)
    // cohort sizes partition the customer base
    val nCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(rows.groupBy(_._1).map(_._2.head._3).sum === nCust)
    // cumulative revenue and LTV are non-decreasing within each cohort
    rows.groupBy(_._1).values.foreach { cs =>
      val byAge = cs.sortBy(_._2)
      assert(byAge.map(_._5).toSeq === byAge.map(_._5).sorted.toSeq)
      assert(byAge.map(_._6).toSeq === byAge.map(_._6).sorted.toSeq)
      // age 0 exists for every cohort (the acquisition month itself)
      assert(byAge.head._2 === 0L)
    }
    assert(rows.nonEmpty)
  }

  test("split_parity: TVD replays from the split table and is bounded") {
    val rows = graft.operators.Pipeline.splitParity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq("lang", "len_bucket"))
    val sp = graft.operators.Pipeline.leakageSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val splitOf = sp.toMap
    def tvd(of: ((Long, String, Long)) => String): (Long, Long, Long) = {
      val tr = docs.filter(d => splitOf(d._1) == "train")
      val te = docs.filter(d => splitOf(d._1) == "test")
      val keys = (tr.map(of) ++ te.map(of)).distinct
      val t = keys.map { k =>
        math.abs(tr.count(of(_) == k).toLong * 1000000L / tr.length -
          te.count(of(_) == k).toLong * 1000000L / te.length)
      }.sum / 2
      (tr.length.toLong, te.length.toLong, t)
    }
    val langWant = tvd(_._2)
    val lenWant = tvd(d => math.min(9L, d._3 / 200L).toString)
    assert(rows(0) === (("lang", langWant._1, langWant._2, langWant._3)))
    assert(rows(1) === (("len_bucket", lenWant._1, lenWant._2, lenWant._3)))
    rows.foreach(r => assert(r._4 >= 0L && r._4 <= 1000000L))
  }

  test("gap_fill: LOCF replays per-user and never looks forward") {
    val got = Temporal.gapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"),
        col("event_type"), expr("cast(floor(value * 100) as bigint)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    ev.groupBy(_._1).values.foreach { es =>
      var locf = -1L
      es.sortBy(e => (e._2, e._3)).foreach { e =>
        if (e._4 == "purchase") locf = e._5
        assert(got(e._3) === locf, s"LOCF for event ${e._3}")
      }
    }
    assert(got.nonEmpty)
  }

  test("mom_growth: growth replays from monthly cells, months contiguous") {
    val rows = Temporal.momGrowth(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val monthly = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"))
      .agg(sum(expr("cast(floor(o_totalprice * 100) as bigint)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.length === monthly.length - 1, "first month dropped")
    monthly.sliding(2).zip(rows.iterator).foreach {
      case (Array((m0, r0), (m1, r1)), (lbl, rev, g)) =>
        assert(lbl === f"${(m1 - 1) / 12}%04d-${(m1 - 1) % 12 + 1}%02d")
        assert(rev === r1)
        // Spark div and DuckDB // both truncate toward zero on negatives,
        // as does Scala's / — floorDiv would disagree on shrink months
        assert(g === (r1 - r0) * 1000000L / r0)
        assert(m1 === m0 + 1, "fixture months are contiguous")
    }
  }

  test("salted_agg equals the plain unsalted aggregation bit-for-bit") {
    val got = Skew.saltedAgg(spark, sf).collect().map(_.toSeq)
    val want = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(expr("cast(floor(value * 100) as bigint)")).as("sum_cents"))
      .orderBy("event_type").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }
}

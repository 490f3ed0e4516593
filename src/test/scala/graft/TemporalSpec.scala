package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** As-of / range join composition ≡ the naive theta-join formulation. */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("asofOrders equals the per-event greatest-preceding-order lookup") {
    val got = Temporal.asofOrders(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // brute force: theta join + window max — fine at spec scale
    val ords = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("d"))
      .agg(max(col("o_orderkey")).as("ok"))
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("ed"))
    val brute = ev.join(ords, Seq("user_id"), "left")
      .filter(col("d").isNull || col("d") <= col("ed"))
      .groupBy("event_id", "user_id")
      .agg(max_by(struct(col("d"), col("ok")), col("d")).as("m"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("m.ok"), lit(-1L)).as("ok"),
        coalesce(date_format(col("m.d"), "yyyy-MM-dd"), lit("")).as("od"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val evAll = ev.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet === evAll.keySet)
    got.foreach { case (eid, (uid, ok, od)) =>
      brute.get(eid) match {
        case Some((buid, bok, bod)) =>
          assert(uid === buid && ok === bok && od === bod, s"event $eid")
        case None =>
          assert(ok === -1L && od === "", s"event $eid (no preceding order)")
      }
    }
  }

  test("rangeJoinEvents equals the theta-join pair count") {
    val got = Temporal.rangeJoinEvents(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val e = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val brute = e.select(col("event_type"), col("us").as("ua"))
      .join(e.select(col("event_type"), col("us").as("ub")), Seq("event_type"))
      .filter(col("ub") > col("ua") && col("ub") <= col("ua") + 300000000L)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === brute)
    assert(got.values.sum > 0)
  }

  test("funnel stage histogram equals a driver-side per-user replay") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val day = 86400L * 1000000L
    val expected = evs.groupBy(_._1).values.map { es =>
      def minAfter(typ: String, from: Long): Option[Long] = {
        val c = es.filter(e => e._2 == typ && e._3 >= from && e._3 <= from + day)
        if (c.isEmpty) None else Some(c.map(_._3).min)
      }
      val v = es.filter(_._2 == "view") match {
        case Array() => None; case vs => Some(vs.map(_._3).min)
      }
      val c = v.flatMap(minAfter("click", _))
      val p = c.flatMap(minAfter("purchase", _))
      Seq(v, c, p).count(_.isDefined).toLong
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Temporal.funnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("gaps_islands: islands partition each user's active days, maximal runs") {
    val rows = Temporal.gapsIslands(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val days = Tables.events(spark, sf)
      .selectExpr("user_id", "cast(datediff(to_date(ts), '1990-01-01') as long) as d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.groupBy(_._1).foreach { case (u, isls) =>
      val ds = days(u)
      isls.foreach { case (_, st, en, len) =>
        assert(len === en - st + 1, "island is contiguous")
        (st to en).foreach(d => assert(ds.contains(d), s"day $d active"))
        assert(!ds.contains(st - 1) && !ds.contains(en + 1), "island is maximal")
      }
      assert(isls.map(_._4).sum === ds.size.toLong, "islands cover all days")
    }
  }

  test("retention cells equal a driver-side cohort replay") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "cast(datediff(to_date(ts), '1990-01-01') as long) as d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val cohort = evs.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = evs.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
      .view.mapValues(_.size.toLong).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Temporal.retention(spark, sf).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val (c, o) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === cells((c, o)))
      assert(r.getLong(3) === sizes(c))
      assert(r.getDouble(4) === cells((c, o)).toDouble / sizes(c))
    }
    // offset 0 retains the full cohort by construction
    got.filter(_.getLong(1) == 0L).foreach(r => assert(r.getDouble(4) === 1.0))
  }

  test("scd2 history: contiguous per user, one current row, no no-op versions") {
    val rows = Temporal.scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getString(4),
        r.getBoolean(5)))
    rows.groupBy(_._1).values.foreach { h =>
      val hist = h.sortBy(v => (v._3, v._2)) // (valid_from, then event order)
      assert(hist.count(_._5) === 1, "exactly one open version per user")
      assert(hist.last._5 && hist.last._4 === "9999-12-31 23:59:59")
      hist.sliding(2).foreach {
        case Array((_, t1, _, to1, _), (_, t2, from2, _, _)) =>
          assert(t1 !== t2, "consecutive versions must differ (CDC compaction)")
          assert(to1 === from2, "valid_to chains to the next valid_from")
        case _ =>
      }
    }
  }

  test("late_data census: thresholds nest, totals cover the stream, lateness is real") {
    val rows = Temporal.lateData(spark, sf).collect()
    val byType = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val (n, late, h1, d1, mx) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n === byType(r.getString(0)))
      assert(late >= h1 && h1 >= d1, "lateness thresholds must nest")
      assert(late <= n && mx >= 0L)
      if (late > 0L) assert(mx > 0L)
    }
    // the hash-permuted arrival order must actually produce out-of-order
    // events, else the census degenerates to zeros and asserts nothing
    assert(rows.map(_.getLong(2)).sum > 0L, "expected out-of-order arrivals")
  }

  test("event_gaps: percentiles ordered, gap count = events − users") {
    val r = Temporal.eventGaps(spark, sf).collect().head
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.getLong(0) === nEvents - nUsers)
    assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3),
      "p50 <= p90 <= p99")
    assert(r.getLong(4) >= 0L && r.getLong(5) === r.getLong(4) * 1000000L / r.getLong(0))
  }

  test("seasonality: cells cover the corpus, shares ppm-exact, one peak per type") {
    val rows = Temporal.seasonality(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.groupBy(_.getString(0)).values.foreach { cells =>
      val n = cells.map(_.getLong(2)).sum
      cells.foreach { c =>
        assert(c.getLong(1) >= 0L && c.getLong(1) <= 23L)
        assert(c.getLong(3) === c.getLong(2) * 1000000L / n)
      }
      val peaks = cells.filter(_.getBoolean(4))
      assert(peaks.length === 1, "exactly one peak cell per type")
      assert(peaks.head.getLong(2) === cells.map(_.getLong(2)).max)
    }
  }
}

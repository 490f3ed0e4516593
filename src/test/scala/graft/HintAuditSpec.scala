package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.HintAudit

/** Direct unit coverage for the broadcast-hint structural prover (the
  * engine behind PlanGuardSpec's per-query sweep): each bounded shape it
  * promises to prove, and each corpus-derived shape it must reject. */
class HintAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  private def docs = Tables.documents(spark, sf)

  /** Number of broadcast-hinted subtrees the prover can NOT bound. */
  private def unproven(hinted: DataFrame): Int = {
    val probe = docs.select(col("doc_id")).limit(1).crossJoin(broadcast(hinted))
    HintAudit.unprovenHints(probe).size
  }

  test("proves: 1-row global aggregate") {
    assert(unproven(docs.agg(count(lit(1)).as("n"))) === 0)
  }

  test("proves: limit over a corpus scan") {
    assert(unproven(docs.limit(5)) === 0)
  }

  test("proves: enum-domain grouping (lang) over an unbounded child") {
    assert(unproven(docs.groupBy("lang").agg(count(lit(1)).as("n"))) === 0)
  }

  test("proves: key-capped filter (doc_id < literal)") {
    assert(unproven(docs.filter(col("doc_id") < 5).select("doc_id")) === 0)
  }

  test("proves: constant TPC-H dims (nation, region)") {
    assert(unproven(Tables.nation(spark, sf)) === 0)
    assert(unproven(Tables.region(spark, sf)) === 0)
  }

  test("proves: join/union of bounded sides stays bounded") {
    val n = Tables.nation(spark, sf)
    val one = docs.agg(max(col("doc_id")).as("m"))
    assert(unproven(n.crossJoin(one)) === 0)
    assert(unproven(docs.limit(3).union(docs.limit(4))) === 0)
  }

  test("rejects: a bare corpus scan") {
    assert(unproven(docs.select("doc_id")) === 1)
  }

  test("rejects: grouping on a corpus-cardinality key (doc_id)") {
    assert(unproven(docs.groupBy("doc_id").agg(count(lit(1)).as("n"))) === 1)
  }

  test("rejects: a non-key filter, however selective it looks") {
    assert(unproven(docs.filter(col("n_chars") < 5)) === 1)
  }

  test("rejects: SF-growing TPC-H dims (customer), even filtered on non-keys") {
    assert(unproven(Tables.customer(spark, sf)) === 1)
    assert(unproven(
      Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")) === 1)
  }

  test("rejects: a join with one unbounded side") {
    val one = docs.agg(max(col("doc_id")).as("m"))
    assert(unproven(docs.crossJoin(one)) === 1)
  }

  test("rejects: explode of a data-sized array over a 1-row aggregate") {
    // the corpus-smuggling shape: collect the whole corpus into one row,
    // then explode it back out — the 1-row aggregate must NOT launder it
    val smuggled = docs.agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_id"))
    assert(unproven(smuggled) === 1)
  }

  test("proves: explode of a FIXED-arity literal array constructor") {
    val two = docs.agg(count(lit(1)).as("n"), max(col("doc_id")).as("m"))
      .select(explode(array(struct(lit("count").as("k"), col("n").as("v")),
        struct(lit("max").as("k"), col("m").as("v")))).as("e"))
    assert(unproven(two) === 0)
  }

  test("proves: literal coarsening of a declared bounded-RANGE column") {
    // floor(o_totalprice / k): TPC-H price formulas cap the range at
    // every SF, so range/k blocks — the equi-depth-offsets shape
    val o = Tables.orders(spark, sf)
    assert(unproven(o.groupBy(expr("cast(o_totalprice as bigint) div 5000").as("blk"))
      .agg(count(lit(1)).as("n"))) === 0)
    assert(unproven(o.groupBy(floor(col("o_totalprice") / 5000).as("blk"))
      .agg(count(lit(1)).as("n"))) === 0)
  }

  test("rejects: range coarsening with a too-small divisor, or of an undeclared column") {
    val o = Tables.orders(spark, sf)
    // div 2 of a ~600k range is ~300k blocks — not broadcast-small
    assert(unproven(o.groupBy(expr("cast(o_totalprice as bigint) div 2").as("blk"))
      .agg(count(lit(1)).as("n"))) === 1)
    // o_orderkey is corpus-linear, not range-bounded: coarsening it
    // still yields a corpus-linear block count
    assert(unproven(o.groupBy(expr("o_orderkey div 5000").as("blk"))
      .agg(count(lit(1)).as("n"))) === 1)
  }

  test("proves: pmod-literal grouping; rejects an unbounded modulus") {
    assert(unproven(docs.groupBy(pmod(col("doc_id") * 131 + 7, lit(65521))
      .as("bit")).agg(count(lit(1)).as("n"))) === 0)
    assert(unproven(docs.groupBy(pmod(col("doc_id"), lit(1000000000L))
      .as("bit")).agg(count(lit(1)).as("n"))) === 1)
  }

  test("proves: DISTINCT over a bounded-domain value, whatever the child size") {
    // the bloom-bits shape: explode fixed-arity pmod hashes, dedup
    val bits = docs.select(explode(array(
      pmod(col("doc_id") * 131 + 7, lit(65521)),
      pmod(col("doc_id") * 137 + 11, lit(65521)))).as("bit")).distinct()
    assert(unproven(bits) === 0)
  }

  test("rejects: DISTINCT over a corpus-cardinality key") {
    assert(unproven(docs.select("doc_id").distinct()) === 1)
  }

  test("proves: grouping on min/max of a calendar-bounded value") {
    // the retention-cohort shape: cohort = min(day-granularity date
    // image) per user — min SELECTS from the bounded day domain
    val e = Tables.events(spark, sf)
    val cohort = e.groupBy("user_id")
      .agg(min(datediff(to_date(col("ts")), lit("1990-01-01"))).as("cohort"))
      .groupBy("cohort").agg(count(lit(1)).as("n"))
    assert(unproven(cohort) === 0)
  }

  test("rejects: grouping on an ACCUMULATING aggregate of a bounded value") {
    // sum() accumulates — per-group totals grow with the corpus even
    // when each addend is domain-bounded
    val e = Tables.events(spark, sf)
    val spend = e.groupBy("user_id")
      .agg(sum(datediff(to_date(col("ts")), lit("1990-01-01"))).as("s"))
      .groupBy("s").agg(count(lit(1)).as("n"))
    assert(unproven(spend) === 1)
  }

  test("rejects: alias-laundering an unbounded column into a bounded name") {
    // select(text.as("lang")) must NOT inherit lang's enum bound —
    // attributes resolve through exprId lineage to their base column
    val laundered = docs.select(col("text").as("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
    assert(unproven(laundered) === 1)
    // and the genuine rename still proves
    val renamed = docs.select(col("lang").as("l2"))
      .groupBy("l2").agg(count(lit(1)).as("n"))
    assert(unproven(renamed) === 0)
  }

  test("rejects: typed flatMap over a bounded child (fan-out is opaque)") {
    import spark.implicits._
    val fanned = docs.limit(2).select(col("text")).as[String]
      .flatMap(_.split(" ")).toDF("w")
    assert(unproven(fanned) === 1)
  }

  test("memo certificate: a checkpointed bounded table stays provable") {
    import graft.util.Checkpoints.StableOps
    // bounded BEFORE the checkpoint (key-capped filter) — the
    // certificate must survive the lineage cut
    val seed = docs.filter(col("doc_id") < 4).select("doc_id", "lang").stable
    assert(unproven(seed) === 0)
    // and an aggregate grouping on the certified table's column domains
    // re-earns the certificate (the Lloyd-iteration induction step)
    val next = seed.groupBy("doc_id").agg(count(lit(1)).as("n")).stable
    assert(unproven(next) === 0)
  }

  test("memo certificate: a corpus-sized checkpoint is NOT row-bounded, but its bounded COLUMNS carry") {
    import graft.util.Checkpoints.StableOps
    val asg = docs.select(col("doc_id"), col("lang")).stable
    assert(unproven(asg) === 1) // rows grow with the corpus
    // …but grouping on its certified bounded column still proves (the
    // cluster-labels shape: cid rides a corpus-sized assignment table)
    assert(unproven(asg.groupBy("lang").agg(count(lit(1)).as("n"))) === 0)
    // while grouping on its corpus-cardinality column does not
    assert(unproven(asg.groupBy("doc_id").agg(count(lit(1)).as("n"))) === 1)
  }

  test("proves: window-lag calendar diff coarsening (the gap-histogram shape)") {
    import org.apache.spark.sql.expressions.Window
    // blk = (tus - lag(tus)) div 60e6: every intermediate has far too
    // many distinct values to group on raw, but interval inference bounds
    // the diff by the declared event-calendar span → minutes are
    // corpus-independent
    val w = Window.partitionBy("user_id").orderBy("tus")
    val e = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap_us").isNotNull)
    assert(unproven(e.groupBy(expr("gap_us div 60000000").as("blk"))
      .agg(count(lit(1)).as("n"))) === 0)
    // too-fine granularity: µs-level blocks span the whole calendar
    // window — billions of potential keys, NOT broadcast-bounded
    assert(unproven(e.groupBy(expr("gap_us div 1000").as("blk"))
      .agg(count(lit(1)).as("n"))) === 1)
    // and raw epoch-micros never prove, lag or not
    assert(unproven(e.groupBy("tus").agg(count(lit(1)).as("n"))) === 1)
  }

  test("proves: adaptive key coarsening x div greatest(m, (max(x)+1) div k)") {
    // the pack_sequences shape: the divisor is corpus-derived (a 1-row
    // max aggregate riding a broadcast crossJoin), but 0 ≤ doc_id ≤
    // max(doc_id) caps the quotient at k blocks at ANY corpus size
    def blocked(extCol: String, k: Long) = docs.select("doc_id", "n_chars")
      .crossJoin(broadcast(docs.agg(max(col(extCol)).as("mx"))))
      .groupBy(expr(s"doc_id div greatest(64L, (mx + 1) div $k)").as("blk"))
      .agg(count(lit(1)).as("n"))
    assert(unproven(blocked("doc_id", 10000L)) === 0)
    // extent of a DIFFERENT column bounds nothing (max(n_chars) says
    // nothing about doc_id's reach)
    assert(unproven(blocked("n_chars", 10000L)) === 1)
    // a block target at/above the cardinality ceiling is not broadcast-
    // small even when the algebra holds
    assert(unproven(blocked("doc_id", 500000000L)) === 1)
  }

  test("proves: min-shifted adaptive range coarsening over an unbounded aggregate") {
    // the gini/rfm shape: x = per-customer spend (an accumulating sum —
    // NOT value-bounded), yet (x − min) div greatest(m, (max − min + 1)
    // div k) is < k blocks for ANY distribution. The extent attributes
    // get new exprIds from DeduplicateRelations on the self-referential
    // crossJoin, so the prover must match them by structural lineage.
    val spend = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).cast("long").as("m"))
    val ext = spend.agg(min(col("m")).as("mn"), max(col("m")).as("mx"))
    val blocked = spend.crossJoin(broadcast(ext))
      .groupBy(expr("(m - mn) div greatest(1000L, (mx - mn + 1) div 10000)")
        .as("blk"))
      .agg(count(lit(1)).as("n"))
    assert(unproven(blocked) === 0)
    // an extent over a DIFFERENT aggregate bounds nothing
    val ext2 = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(count(lit(1)).as("m2"))
      .agg(min(col("m2")).as("mn"), max(col("m2")).as("mx"))
    val wrong = spend.crossJoin(broadcast(ext2))
      .groupBy(expr("(m - mn) div greatest(1000L, (mx - mn + 1) div 10000)")
        .as("blk"))
      .agg(count(lit(1)).as("n"))
    assert(unproven(wrong) === 1)
  }

  test("union: a bound proven in ONE branch must not leak through exprId reuse") {
    // Union reuses its first child's output exprIds (round 11, ADVICE):
    // an equality filter inside branch 1 must not certify rows flowing
    // from the unfiltered branch 2
    def agg(df: DataFrame) = df.groupBy("text").agg(count(lit(1)).as("n"))
    val filtered = docs.filter(col("text") === "x").select(col("text"))
    val unfiltered = docs.select(col("text"))
    assert(unproven(agg(filtered.union(unfiltered))) === 1)
    // a bound EVERY branch establishes still proves
    val filtered2 = docs.filter(col("text") === "y").select(col("text"))
    assert(unproven(agg(filtered.union(filtered2))) === 0)
    // a constraint ABOVE the union binds all branches' rows — kept
    assert(unproven(agg(filtered.union(unfiltered)
      .filter(col("text") === "z"))) === 0)
    // enum-domain lineage survives a union of the SAME base column
    assert(unproven(docs.select("lang").union(docs.select("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"))) === 0)
    // ...but not a positional union of DIFFERENT base columns (bounded
    // lang in branch 1, corpus-cardinality text in branch 2)
    assert(unproven(docs.select("lang").union(docs.select("text"))
      .groupBy("lang").agg(count(lit(1)).as("n"))) === 1)
  }

  test("temporal: calendar images prove only over base time columns") {
    // year/trunc/datediff are calendar-bounded facts about the fixtures'
    // ts/date COLUMNS — a corpus-ACCUMULATING value laundered through
    // epoch arithmetic must not inherit them (round 11, ADVICE)
    val ev = Tables.events(spark, sf)
    assert(unproven(ev.groupBy(year(col("ts")).as("y"))
      .agg(count(lit(1)).as("n"))) === 0)
    assert(unproven(ev.groupBy(date_trunc("month", col("ts")).as("m"))
      .agg(count(lit(1)).as("n"))) === 0)
    assert(unproven(ev.groupBy(datediff(col("ts"), col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))) === 0)
    val spend = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).cast("long").as("m"))
    assert(unproven(spend.groupBy(year(timestamp_seconds(col("m"))).as("y"))
      .agg(count(lit(1)).as("n"))) === 1,
      "year() of an accumulating sum is corpus-derived, not calendar-bounded")
    // sub-day/intra-year FIELDS are range-bounded by definition, any child
    assert(unproven(spend.groupBy(hour(timestamp_seconds(col("m"))).as("h"))
      .agg(count(lit(1)).as("n"))) === 0)
  }

  test("counts every hint in a multi-hint plan, including subqueries") {
    val bad = docs.select("doc_id")
    val good = docs.limit(2)
    val df = docs.join(broadcast(bad), Seq("doc_id"), "left_semi")
      .join(broadcast(good), Seq("doc_id"), "left_anti")
    assert(HintAudit.unprovenHints(df).size === 1)
    assert(HintAudit.broadcastHinted(df).size === 2)
  }
}

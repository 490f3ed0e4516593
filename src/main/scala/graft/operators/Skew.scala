package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join splitting (enabled in [[graft.Engine.tune]]) handles
  * most runtime skew; explicit salting remains the tool when one join key
  * dominates so heavily that even split partitions bottleneck, or when the
  * skew is known up front (e.g. a null-heavy or celebrity key). */
object Skew {

  /** Inner equi-join with the fact side salted K ways and the (small)
    * build side replicated K×: the hot key's rows spread over K reducers
    * instead of one. `saltBy` must be a deterministic fact-side column
    * (row identity), so results are reproducible run to run.
    *
    * Semantics: identical row multiset to `fact.join(dim, key)`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, saltBy: Column): DataFrame = {
    val sf = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val sd = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }

  /** Declared proof query: salted join ≡ plain join. orders (fact, salted
    * 8 ways by row identity) ⋈ customer (dim, replicated 8×), rolled up by
    * market segment with a decimal-routed (order-independent) revenue sum,
    * so the result matches the unsalted oracle plan bit-for-bit. */
  def skewJoinDemo(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val fact = graft.Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val dim = graft.Tables.customer(s, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    saltedJoin(fact, dim, "o_custkey", 8, col("o_orderkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           graft.functions.Fns.sumD2(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Join-key skew census — the diagnostic that DECIDES when
    * [[saltedJoin]] (or AQE's skew split) is worth its replication cost:
    * for each frequently-joined key column, the row count, distinct key
    * count, heaviest key and its count, the mean key frequency, and the
    * skew ratio max/mean (×100, exact integer), with the advice the
    * ratio implies (≥ 4× mean → salt; ≥ 2× → trust AQE's skew join;
    * else nothing). A pipeline runs this per ingest snapshot so a
    * celebrity key is discovered before the join stage OOMs, not after.
    *
    * Scale shape: the two lineitem key columns unpivot map-side (×2 fan
    * of a 2-column projection), and all three columns reduce through
    * ONE map-side-combined (column, key) count — the same shuffle any
    * of the joins would pay anyway; everything after is a ≤ |keys|-row
    * aggregation per column. Top keys tie-break to the smallest key. */
  def skewAudit(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(s, dir).select(explode(array(
        struct(lit("lineitem.l_partkey").as("c"), col("l_partkey").as("k")),
        struct(lit("lineitem.l_suppkey").as("c"), col("l_suppkey").as("k"))))
        .as("e"))
      .select(col("e.c").as("c"), col("e.k").as("k"))
    val ord = graft.Tables.orders(s, dir)
      .select(lit("orders.o_custkey").as("c"), col("o_custkey").as("k"))
    val counts = li.union(ord).groupBy("c", "k").agg(count(lit(1)).as("cnt"))
    counts.groupBy("c").agg(
        sum(col("cnt")).as("n"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        max(struct(col("cnt"), (-col("k")).as("nk"))).as("top"))
      .select(col("c").as("key_column"), col("n"), col("n_keys"),
        col("max_cnt"), (-col("top.nk")).as("top_key"),
        expr("n * 100 div n_keys").as("mean_x100"),
        expr("max_cnt * 100 * n_keys div n").as("skew_x100"))
      .withColumn("advice",
        when(col("skew_x100") >= 400, "salt")
          .when(col("skew_x100") >= 200, "aqe_skew_join")
          .otherwise("none"))
      .orderBy("key_column")
  }

  /** Salted two-phase aggregation — the skew-safe rewrite for aggregates
    * over a hot grouping key, proven hash-identical to the plain form.
    * Phase 1 groups by (key, salt) so a celebrity key's rows land on 32
    * reducers instead of one; phase 2 re-reduces the 32 partials per key.
    * For the plain count/sum Spark's own map-side partial aggregation
    * already absorbs skew, so the query's REAL payload is the case where
    * it does not: exact distinct users per type, computed as a distinct
    * over (type, user) — a shuffle keyed by the PAIR, so the hot type
    * spreads across the cluster — then a count per type. Sums are exact
    * cents, so the re-association is bit-stable under any partitioning.
    *
    * Scale shape: two bounded shuffles — phase 1 is the same width as
    * the plain agg but with 32× the reducer parallelism on hot keys;
    * phase 2 moves |keys|·32 partial rows. The distinct path shuffles
    * the deduped pair table once. Nothing is ever single-reducer. */
  def saltedAgg(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        expr("cast(floor(value * 100) as bigint)").as("cents"))
    val partial = ev
      .withColumn("__salt", pmod(xxhash64(col("user_id")), lit(32)))
      .groupBy("event_type", "__salt")
      .agg(count(lit(1)).as("pn"), sum(col("cents")).as("pc"))
    val merged = partial.groupBy("event_type")
      .agg(sum(col("pn")).as("n_events"), sum(col("pc")).as("sum_cents"))
    val dusers = ev.select(col("event_type"), col("user_id")).distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_users"))
    merged.join(dusers, "event_type")
      .select(col("event_type"), col("n_events"), col("n_users"),
        col("sum_cents"))
      .orderBy("event_type")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over derived co-occurrence graphs. Complements the
  * connected-components loop in [[Pipeline.minLabelComponents]] with the
  * other classic bulk graph kernel: triangle / wedge counting.
  */
object Graph {

  /** Per-order sorted distinct part baskets — the shared market-basket
    * projection behind the co-purchase and triangle queries. Pair fan-out
    * from these arrays happens map-side, bounded by basket size, so the
    * pair count grows linearly with orders (never a corpus self-join). */
  private def baskets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))

  /** Ordered (a < b) part pairs, one row per order containing both. */
  private def basketPairs(s: SparkSession, dir: String): DataFrame =
    baskets(s, dir)
      .select(explode(flatten(transform(col("ps"), (a, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))),
            b => struct(a.as("a"), b.as("b")))))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))

  /** Market-basket co-purchase mining: the top part pairs by the number
    * of distinct orders containing both (pair support — the count step of
    * A-priori / frequent-itemset mining). Pairs are generated map-side
    * from per-order sorted baskets, so support counting is one groupBy
    * over linear-in-orders pair rows — the classic formulation's
    * lineitem-with-lineitem self-join never happens. Ties broken by
    * (part_a, part_b) for a deterministic top-20. */
  def coPurchase(s: SparkSession, dir: String): DataFrame =
    basketPairs(s, dir)
      .groupBy(col("a").as("part_a"), col("b").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(20)

  /** Triangle census of the part co-occurrence graph: parts are linked
    * when some order contains both (the market-basket projection), and the
    * census reports edges, wedges (unordered length-2 paths, Σ C(deg,2)),
    * triangles, and the global clustering coefficient 3·T/W.
    *
    * Scale shape: the pair explosion is per-order and bounded by basket
    * size (the same bounded-blocking idea as the dedup shingle cap), so
    * edges grow linearly with orders. Triangles come from the ordered-edge
    * join (a<b<c, each triangle generated exactly once — never 6× as in
    * the naive triple join); the wedge count comes straight off the degree
    * table (Σ d·(d−1)/2 — no join at all), so the expensive length-2-path
    * join is evaluated once, only to close triangles. A degree-based
    * orientation (direct each edge at its lower-degree endpoint) was
    * measured 1.5× SLOWER here — its two extra degree joins buy nothing on
    * this uniform-degree graph — but it is the standard remedy when hub
    * vertices skew per-pivot fan-out, and slots into `oriented` below
    * without changing the (orientation-invariant) output. (A per-edge
    * adjacency-array `array_intersect` variant was measured too: 1.9×
    * slower at sf0.1 — the per-row set intersection's interpreted constant
    * outweighs the shuffle it saves at this adjacency density.) The edge
    * list is materialized once (localCheckpoint) and shared by all stages;
    * the closure fraction is one IEEE division of exact int64 counts. */
  def triangleCount(s: SparkSession, dir: String): DataFrame = {
    val edges = basketPairs(s, dir)
      .distinct()
      .localCheckpoint(true)
    val deg = edges.select(col("a").as("v"))
      .union(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // d·(d−1) is always even, so the integer halving is exact
    // coalesce: sum over an empty degree table is NULL, and a NULL count
    // would poison the census row (and the NaN-sensitive driver compare)
    val nW = deg.agg(coalesce(sum(expr("d * (d - 1) div 2")), lit(0L))
      .cast("long").as("n_wedges"))
    // id-order IS the orientation: out-neighbors of u are the b's of
    // edges (u, b), so pairing them yields each a<b<c path exactly once
    val oriented = edges.select(col("a").as("u"), col("b").as("w"))
    val cand = oriented.select(col("u"), col("w").as("x"))
      .join(oriented.select(col("u"), col("w").as("y")), Seq("u"))
      .filter(col("x") < col("y"))
    // edges hold a < b, and the candidate pair is emitted with x < y,
    // so closing the wedge is a direct equi-join
    val tri = cand.join(edges.select(col("a").as("x"), col("b").as("y")),
      Seq("x", "y"))
    val nE = edges.agg(count(lit(1)).as("n_edges"))
    val nT = tri.agg(count(lit(1)).as("n_triangles"))
    nE.crossJoin(broadcast(nW)).crossJoin(broadcast(nT))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          (lit(3L) * col("n_triangles")).cast("double") /
            col("n_wedges").cast("double"))
          .otherwise(0.0).as("closure"))
  }

  /** Degree distribution of the part co-occurrence graph — the first
    * diagnostic a graph pipeline prints (skew detection: a heavy-tailed
    * histogram is the signal to switch the triangle census to its
    * degree-oriented variant, [[triangleCount]]'s documented remedy).
    * One groupBy over the edge endpoints then one over the degree
    * values; output is bounded by the number of distinct degrees. */
  def degreeHist(s: SparkSession, dir: String): DataFrame = {
    // both union branches read the same distinct-edge exchange (reused)
    val e = basketPairs(s, dir).distinct()
    e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .groupBy("d").agg(count(lit(1)).as("n_parts"))
      .orderBy("d")
  }

  /** Integer-exact PageRank over the customer–supplier purchase graph
    * (undirected bipartite: an edge links a customer to every supplier
    * that fulfilled one of their orders; node ids namespaced as
    * 2·custkey / 2·suppkey+1). Ranks live in int64 micro-units
    * (r₀ = 1 000 000) and every update is integer arithmetic —
    * contribution = r div deg, damping r' = 150 000 + (85·Σ) div 100 —
    * so the result is bit-reproducible under any partitioning or
    * reduce order, the same determinism discipline as the int64 k-means
    * ([[Clustering]]). Three unrolled power iterations; the DuckDB
    * oracle replays the identical integer recurrence.
    *
    * Scale shape: each iteration is one shuffle join of the node-sized
    * rank table against the edge list plus one groupBy(dst) — the
    * canonical distributed PageRank plan (contributions combine
    * map-side). The edge list is derived once and localCheckpoint'ed so
    * iterations don't replay the orders⋈lineitem upstream; every node
    * has degree ≥ 1 by construction, so there is no dangling-mass term. */
  def pageRank(s: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    // fixed unroll, ONE action: no per-iteration checkpoint needed — the
    // whole recurrence is a single DAG, so r1/r2 are each computed once
    // and the edge-list exchange is reused across iterations (unlike a
    // convergence loop, which must checkpoint between actions)
    var ranks = deg.select(col("u"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      val contrib = ranks.join(deg, "u").join(edges, "u")
        .select(col("v"), expr("r div d").as("c"))
      ranks = contrib.groupBy(col("v").as("u"))
        .agg(sum(col("c")).as("s"))
        .select(col("u"), expr("150000 + (85 * s) div 100").as("r"))
    }
    ranks.orderBy(col("r").desc, col("u")).limit(20)
      .select(col("u").as("node"),
        when(col("u") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("kind"),
        col("r").as("rank_micro"))
  }
}

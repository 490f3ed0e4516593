package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated twin of the manual `graft.tools.PlanAudit` sweep: no query
  * may plan a CartesianProduct, and BroadcastNestedLoopJoin may appear
  * only where the operator deliberately broadcasts a constant-size
  * subplan (1-row corpus totals, k-row centroid/probe tables, the
  * declared brute-force similarity baseline). A new query that
  * accidentally plans an unblocked pairwise join fails here instead of
  * waiting for the next manual audit. */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  /** query → max allowed BroadcastNestedLoopJoin count; every build side
    * is a broadcast aggregate of constant cardinality (see each
    * operator's Scaladoc), not a data-sized relation. */
  private val nljAllowed = Map(
    "q_similarity_topk" -> 1, // intended brute-force baseline: 5 probes
    "q_ann_ivf"         -> 2, // 16-row centroid table, probe + train side
    "q_tfidf"           -> 1, // 1-row corpus-N subplan
    "q_collocations"    -> 1, // 1-row corpus totals
    "q_bm25"            -> 1, // 1-row (N, S) stats
    "q_cluster_labels"  -> 1, // 1-row corpus token total
    "q_temperature_mix" -> 1, // 1-row weight total
    "q_triangle_count"  -> 2, // 1-row wedge + triangle counts
    "q_equidepth_hist"  -> 1, // 1-row row-count total
    "q_ann_recall"      -> 1, // inherits the brute-force exact baseline
    "q_eval_confusion"  -> 2, // 10-row centroid table (cells + row totals)
    "q_bpe_apply"       -> 1, // 1-row round-0 token total
    "q_vocab_prune"     -> 1  // 1-row vocab-size aggregate
  )

  test("no cartesian products; nested-loop joins only on constant-size builds") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      assert(nlj <= nljAllowed.getOrElse(name, 0),
        s"$name plans $nlj nested-loop joins (allowed: ${nljAllowed.getOrElse(name, 0)})")
    }
  }
}

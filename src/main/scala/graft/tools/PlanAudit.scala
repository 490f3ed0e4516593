package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for the scan/join-heavy queries so
  * plan regressions (lost pushdown, missed broadcast, surprise shuffles)
  * are visible. Usage: runMain graft.tools.PlanAudit [sfDir] [query ...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_grouped_agg", "q_filter_project", "q_join_agg", "q_join_multi",
      "q_semi_join", "q_topk_orders", "q_wordcount", "q_dedup_minhash",
      "q_similarity_topk", "q_tumbling_window",
      // round-2 join/blocking plans: all must be equi-joins (no
      // BroadcastNestedLoop/CartesianProduct anywhere)
      "q_asof_join", "q_range_join", "q_embedding_neardup", "q_fuzzy_join",
      "q_skew_join", "q_bucketed_join", "q_dedup_ngram",
      // round-4 joins/decorrelations
      "q_lateral_topk", "q_map_functions", "q_variant_extract",
      "q_approx_topk",
      // round-4 second wave
      "q_recursive_cte", "q_mr_cogroup", "q_gopher_quality", "q_scd2",
      "q_collocations", "q_funnel", "q_triangle_count", "q_char_diversity",
      "q_skyline", "q_retention", "q_anomaly", "q_gaps_islands",
      "q_schema_evolution", "q_decontamination", "q_range_frame_time",
      "q_embedding_quantize", "q_importance_sample", "q_sql_udtf",
      // round-5 joins/iterative plans
      "q_tpch_q3", "q_knn_graph", "q_kmeans", "q_semdedup",
      "q_pagerank", "q_pack_sequences", "q_bm25", "q_attribution",
      "q_transition_matrix", "q_cluster_labels", "q_substring_dedup",
      "q_hard_negatives", "q_oov_filter")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n================= $n =================")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}

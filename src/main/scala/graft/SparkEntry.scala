package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{MrApi, MrSuite, Pipeline, Relational}
import graft.multimodal.Media
import graft.streaming.{LshStreams, Streams}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (SURVEY §2 + §8; every name is both the query key and
  * the DuckDB-oracle key):
  *  - MR app suite (§2b) + plugin-contract API (q_mr_* via
  *    graft.mr.MapReduceJob) + reference I/O (text roundtrip, formats).
  *  - Relational generalization (§2c): joins ×12, windows, grouping
  *    sets/cube/rollup, set ops, pivot/unpivot, percentiles, TPC-H
  *    shapes, profile census, XML/JSON/VARIANT extraction.
  *  - LLM-pipeline north star: dedup family (exact / n-gram / MinHash /
  *    incremental index / SimHash / embedding / substring spans /
  *    SemDeDup / containment / CDC chunks), similarity (brute-force,
  *    LSH, IVF, PQ+ADC, k-NN graph, hard negatives), clustering (int64
  *    k-means, product quantization, label centroids, topic labels),
  *    text analysis (stats, quality, lang-id, tokens, TF-IDF, bigrams,
  *    collocations, OOV fluency, Zipf, word entropy), training prep
  *    (packing, temperature mix, shards, samples ×6 incl. PPS and
  *    adaptive percentile gates, chunking, redaction, decontamination),
  *    multimodal binary columns.
  *  - Graph + event analytics: PageRank, triangle census, co-purchase,
  *    funnel, retention, attribution, transitions, sessionization.
  *  - Evaluation layer: ANN recall vs exact baseline, nearest-prototype
  *    confusion matrix, equi-depth histogram, next-token LM table,
  *    PII scan/mask; monitoring: Cohen's kappa, centroid silhouette,
  *    calibration curve, early-vs-late TVD drift, watermark late-data
  *    census.
  *  - Structured Streaming ×20 flavors (windows, watermark, dedup,
  *    joins ×3, sessions, top-k, transformWithState CDC, CDC chunk
  *    census, kv sink, per-source quota, PPS sample, LSH ingest probe,
  *    live-vs-reference drift monitor, rolling-WAU, HLL distinct,
  *    exact percentile, live changepoint, stateful LOCF gap-fill).
  *
  * Every declared query is oracle-backed. The two sketches —
  * q_approx_distinct (HLL) and q_approx_percentile (quantile) — whose
  * raw estimates are engine-internal by design, surface banded-accuracy
  * AUDIT forms since round 13 (exact side + in-band verdicts the oracle
  * replays as contract constants), so they hash-check like everything
  * else. The ANN variants are deterministic (fixed planes / centroids,
  * ties broken by id) and hash-checked since round 2.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    MrSuite.wordCount(Engine.tune(spark), "/root/testdata/sf0.001")

  /** Declared-query wrapper: tune the session, then elide the terminal
    * presentation sort (optimization round 17 — see
    * [[org.apache.spark.sql.GraftShims.stripRootSort]]). The output
    * contract is order-insensitive (SURVEY §1; the driver's oracle hash
    * and tools/compare.py both row-sort before comparing), so the
    * cosmetic `orderBy` most queries end with buys nothing while costing
    * a boundary-sampling pass that re-executes the whole child plan plus
    * a full-output range exchange — at 100 TB, an extra full pass over
    * the result purely for presentation. Row multisets are byte-identical
    * (proven by the full 266-query DuckDB oracle compare); top-k sorts
    * (`orderBy.limit`), window sorts, and `sortWithinPartitions` are
    * structurally untouched by the root-chain walk. */
  private def q(fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => org.apache.spark.sql.GraftShims.stripRootSort(fn(Engine.tune(s), dir))

  /** For queries whose OPERATOR SEMANTICS is the total-order sort itself
    * (the reference's sort-by-key, §2a row 7): the global sort is the
    * deliverable, not presentation — keep it. */
  private def qSorted(fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => fn(Engine.tune(s), dir)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MR app suite
    "q_wordcount"         -> q(MrSuite.wordCount),
    "q_inverted_index"    -> q(MrSuite.invertedIndex),
    "q_sorted_concat"     -> q(MrSuite.sortedConcat),
    "q_tokens_per_doc"    -> q(MrSuite.tokensPerDoc),
    "q_distinct_words"    -> q(MrSuite.distinctWords),
    "q_unicode_wordcount" -> q(MrSuite.unicodeWordCount),
    "q_partition_diag"    -> q(MrSuite.partitionDiag),
    "q_sort_docs"         -> qSorted(MrSuite.sortDocs),
    "q_grep"              -> q(MrSuite.grepDocs),
    "q_union_names"       -> q(MrSuite.unionNames),
    // MapReduce plugin API
    "q_mr_wordcount"      -> q(MrApi.mrWordCount),
    "q_mr_inverted_index" -> q(MrApi.mrInvertedIndex),
    "q_mr_sorted_concat"  -> q(MrApi.mrSortedConcat),
    "q_mr_grep"           -> q(MrApi.mrGrep),
    "q_mr_cogroup"        -> q(MrApi.mrCogroup),
    "q_mr_kv_cogroup"     -> q(MrApi.mrKvCogroup),
    // reference I/O model (whole-file scan + "key value" text sink)
    "q_text_roundtrip"    -> q(graft.sources.TextIO.textRoundtrip),
    "q_format_roundtrip"  -> q(graft.sources.TextIO.formatRoundtrip),
    "q_schema_evolution"  -> q(graft.sources.TextIO.schemaEvolution),
    "q_kv_source"         -> q(graft.sources.TextIO.kvSource),
    "q_csv_dirty"         -> q(graft.sources.TextIO.csvDirty),
    // relational generalization
    "q_grouped_agg"       -> q(Relational.groupedAgg),
    "q_filter_project"    -> q(Relational.filterProject),
    "q_topk_orders"       -> q(Relational.topkOrders),
    "q_skyline"           -> q(Relational.skyline),
    "q_join_agg"          -> q(Relational.joinAgg),
    "q_join_multi"        -> q(Relational.joinMulti),
    "q_tpch_q3"           -> q(Relational.tpchQ3),
    "q_tpch_q5"           -> q(Relational.tpchQ5),
    "q_tpch_q6"           -> q(Relational.tpchQ6),
    "q_tpch_q1"           -> q(Relational.tpchQ1),
    "q_tpch_q7"           -> q(Relational.tpchQ7),
    "q_tpch_q8"           -> q(Relational.tpchQ8),
    "q_tpch_q10"          -> q(Relational.tpchQ10),
    "q_tpch_q13"          -> q(Relational.tpchQ13),
    "q_tpch_q14"          -> q(Relational.tpchQ14),
    "q_tpch_q15"          -> q(Relational.tpchQ15),
    "q_tpch_q17"          -> q(Relational.tpchQ17),
    "q_tpch_q18"          -> q(Relational.tpchQ18),
    "q_weighted_median"   -> q(Relational.weightedMedian),
    "q_constraint_check"  -> q(Relational.constraintCheck),
    "q_reconcile"         -> q(Relational.reconcile),
    "q_semi_join"         -> q(Relational.semiJoin),
    "q_anti_join"         -> q(Relational.antiJoin),
    "q_outer_join"        -> q(Relational.outerJoin),
    "q_full_outer"        -> q(Relational.fullOuterJoin),
    "q_window_rank"       -> q(Relational.windowRank),
    "q_rollup"            -> q(Relational.rollupAgg),
    "q_cube_docs"         -> q(Relational.cubeDocs),
    "q_grouping_sets"     -> q(Relational.groupingSetsAgg),
    "q_intersect"         -> q(Relational.intersectCustomers),
    "q_except"            -> q(Relational.exceptCustomers),
    "q_except_all"        -> q(Relational.exceptAllOrders),
    "q_intersect_all"     -> q(Relational.intersectAllOrders),
    "q_sql_correlated"    -> q(Relational.sqlCorrelated),
    "q_lateral_topk"      -> q(Relational.lateralTopk),
    "q_recursive_cte"     -> q(Relational.recursiveHierarchy),
    "q_upsert"            -> q(Relational.upsert),
    "q_tumbling_window"   -> q(Relational.tumblingWindow),
    "q_sliding_window"    -> q(Relational.slidingWindow),
    "q_sql_interface"     -> q(Relational.sqlInterface),
    "q_sql_custom_fn"     -> q(Relational.sqlCustomFn),
    "q_sql_udtf"          -> q(Relational.sqlUdtf),
    "q_histogram"         -> q(Relational.histogram),
    "q_percentiles"       -> q(Relational.percentiles),
    "q_percentiles_disc"  -> q(Relational.percentilesDisc),
    "q_approx_distinct"   -> q(Relational.approxDistinct),
    "q_corr_exact"        -> q(Relational.corrExact),
    "q_bootstrap_ci"      -> q(Relational.bootstrapCi),
    "q_anomaly"           -> q(Relational.anomaly),
    "q_json_extract"      -> q(Relational.jsonExtract),
    "q_variant_extract"   -> q(Relational.variantExtract),
    "q_sessionize"        -> q(Relational.sessionize),
    "q_skew_join"         -> q(operators.Skew.skewJoinDemo),
    "q_skew_audit"        -> q(operators.Skew.skewAudit),
    "q_salted_agg"        -> q(operators.Skew.saltedAgg),
    "q_partitioned_scan"  -> q(operators.Partitioned.partitionedScan),
    "q_dpp_join"          -> q(operators.Partitioned.dppJoin),
    "q_asof_join"         -> q(operators.Temporal.asofOrders),
    "q_asof_forward"      -> q(operators.Temporal.asofForward),
    "q_ivm_join"          -> q(Relational.ivmJoin),
    "q_scd2"              -> q(operators.Temporal.scd2),
    "q_funnel"            -> q(operators.Temporal.funnel),
    "q_retention"         -> q(operators.Temporal.retention),
    "q_cohort_ltv"        -> q(operators.Temporal.cohortLtv),
    "q_gap_fill"          -> q(operators.Temporal.gapFill),
    "q_mom_growth"        -> q(operators.Temporal.momGrowth),
    "q_gaps_islands"      -> q(operators.Temporal.gapsIslands),
    "q_triangle_count"    -> q(operators.Graph.triangleCount),
    "q_copurchase"        -> q(operators.Graph.coPurchase),
    "q_pagerank"          -> q(operators.Graph.pageRank),
    "q_degree_hist"       -> q(operators.Graph.degreeHist),
    "q_graph_jaccard"     -> q(operators.Graph.edgeJaccard),
    "q_assoc_rules"       -> q(operators.Graph.assocRules),
    "q_graph_components"  -> q(operators.Graph.components),
    "q_range_join"        -> q(operators.Temporal.rangeJoinEvents),
    "q_transition_matrix" -> q(operators.Temporal.transitionMatrix),
    "q_attribution"       -> q(operators.Temporal.attribution),
    "q_mta"               -> q(operators.Temporal.mtaAttribution),
    "q_path_purchase"     -> q(operators.Temporal.pathToPurchase),
    "q_concurrency"       -> q(operators.Temporal.concurrency),
    "q_freshness"         -> q(operators.Temporal.freshness),
    "q_changepoint"       -> q(operators.Temporal.changepoint),
    "q_benford"           -> q(Relational.benford),
    "q_xml_extract"       -> q(Relational.xmlExtract),
    "q_profile"           -> q(Relational.profile),
    "q_encoding_stats"    -> q(Relational.encodingStats),
    "q_session_window"    -> q(Relational.sessionWindows),
    "q_window_suite"      -> q(Relational.windowSuite),
    "q_moving_agg"        -> q(Relational.movingAgg),
    "q_range_frame_time"  -> q(Relational.rangeFrameTime),
    "q_zorder"            -> q(Relational.zorderKey),
    "q_zone_map"          -> q(Relational.zoneMap),
    "q_try_functions"     -> q(Relational.tryFunctions),
    "q_argmax"            -> q(Relational.argmaxEvents),
    "q_date_functions"    -> q(Relational.dateFunctions),
    "q_string_functions"  -> q(Relational.stringFunctions),
    "q_window_navigation" -> q(Relational.windowNavigation),
    "q_bitwise_math"      -> q(Relational.bitwiseMath),
    "q_bucketed_join"     -> q(operators.Bucketed.bucketedJoin),
    "q_pivot"             -> q(Relational.pivotSegmentYear),
    "q_unpivot"           -> q(Relational.unpivotLineitem),
    "q_array_functions"   -> q(Relational.arrayFunctions),
    "q_map_functions"     -> q(Relational.mapFunctions),
    "q_approx_percentile" -> q(Relational.approxPercentiles),
    "q_approx_topk"       -> q(Relational.approxTopK),
    "q_equidepth_hist"    -> q(Relational.equidepthHistogram),
    "q_rfm"               -> q(Relational.rfm),
    "q_gini"              -> q(Relational.gini),
    "q_fuzzy_join"        -> q(Relational.fuzzyJoin),
    "q_bloom_join"        -> q(Relational.bloomJoin),
    // LLM data pipeline
    "q_dedup_exact"       -> q(Pipeline.dedupExact),
    "q_dedup_ngram"       -> q(Pipeline.dedupNgram),
    "q_dedup_ngram_census" -> q(Pipeline.dedupNgramCensus),
    "q_dedup_containment" -> q(Pipeline.dedupContainment),
    "q_dedup_clusters"    -> q(Pipeline.dedupClusters),
    "q_dedup_apply"       -> q(Pipeline.dedupApply),
    "q_dedup_keep_best"   -> q(Pipeline.dedupKeepBest),
    "q_decontamination"   -> q(Pipeline.decontamination),
    "q_hash_sample"       -> q(Pipeline.hashSample),
    "q_balanced_sample"   -> q(Pipeline.balancedSample),
    "q_mixture_sample"    -> q(Pipeline.mixtureSample),
    "q_sample_bias"       -> q(Pipeline.sampleBias),
    "q_importance_sample" -> q(Pipeline.importanceSample),
    "q_chunking"          -> q(Pipeline.chunkDocs),
    "q_curation"          -> q(Pipeline.curationPipeline),
    "q_redact"            -> q(Pipeline.redact),
    "q_token_positions"   -> q(Pipeline.tokenPositions),
    "q_dedup_minhash"     -> q(Pipeline.dedupMinhash),
    "q_dedup_incremental" -> q(Pipeline.dedupIncremental),
    "q_minhash_error"     -> q(Pipeline.minhashError),
    "q_leakage_split"     -> q(Pipeline.leakageSplit),
    "q_split_parity"      -> q(Pipeline.splitParity),
    "q_syndication"       -> q(Pipeline.syndication),
    "q_doc_perplexity"    -> q((s, d) => Pipeline.docPerplexity(s, d)),
    "q_dedup_funnel"      -> q(Pipeline.dedupFunnel),
    "q_dedup_lineage"     -> q(Pipeline.dedupLineage),
    "q_snapshot_diff"     -> q(Pipeline.snapshotDiff),
    "q_ngram_diversity"   -> q(Pipeline.ngramDiversity),
    "q_simhash"           -> q(Pipeline.simhash),
    "q_text_stats"        -> q(Pipeline.textStats),
    "q_quality_score"     -> q(Pipeline.qualityScore),
    "q_gopher_quality"    -> q(Pipeline.gopherQuality),
    "q_repetition_filter" -> q(Pipeline.repetitionFilter),
    "q_domain_cap"        -> q((s, d) => Pipeline.domainCap(s, d)),
    "q_pps_sample"        -> q((s, d) => Pipeline.ppsSample(s, d)),
    "q_adaptive_filter"   -> q(Pipeline.adaptiveFilter),
    "q_zipf"              -> q((s, d) => Pipeline.zipf(s, d)),
    "q_word_entropy"      -> q(Pipeline.wordEntropy),
    "q_keyness"           -> q(Pipeline.keyness),
    "q_token_compression" -> q(Pipeline.tokenCompression),
    "q_char_diversity"    -> q(Pipeline.charDiversity),
    "q_lang_id"           -> q(Pipeline.langId),
    "q_token_count"       -> q(Pipeline.tokenCount),
    "q_tfidf"             -> q(Pipeline.tfidf),
    "q_bigrams"           -> q(Pipeline.bigrams),
    "q_collocations"      -> q(Pipeline.collocations),
    "q_fingerprint"       -> q(Pipeline.fingerprint),
    "q_similarity_topk"   -> q(Pipeline.similarityTopk),
    "q_embedding_neardup" -> q(Pipeline.embeddingNeardup),
    "q_ann_lsh"           -> q(Pipeline.annLsh),
    "q_ann_ivf"           -> q(Pipeline.annIvf),
    "q_knn_graph"         -> q(Pipeline.knnGraph),
    "q_kmeans"            -> q(operators.Clustering.kmeans),
    "q_semdedup"          -> q(operators.Clustering.semDedup),
    "q_semdedup_sweep"    -> q(operators.Clustering.semDedupSweep),
    "q_embedding_pq"      -> q(operators.Clustering.embeddingPq),
    "q_ann_adc"           -> q((s, d) => operators.Clustering.annAdc(s, d)),
    "q_pack_sequences"    -> q(Pipeline.packSequences),
    "q_bm25"              -> q(Pipeline.bm25),
    "q_shard_export"      -> q(Pipeline.shardExport),
    "q_cluster_labels"    -> q(operators.Clustering.clusterLabels),
    "q_temperature_mix"   -> q(Pipeline.temperatureMix),
    "q_substring_dedup"   -> q(Pipeline.substringDedup),
    "q_oov_filter"        -> q(Pipeline.oovFilter),
    "q_hard_negatives"    -> q(Pipeline.hardNegatives),
    "q_label_centroids"   -> q(operators.Clustering.labelCentroids),
    "q_embedding_quantize" -> q(Pipeline.embeddingQuantize),
    "q_emb_health"        -> q(Pipeline.embHealth),
    "q_next_token"        -> q(Pipeline.nextToken),
    "q_bpe_train"         -> q(Pipeline.bpeTrain),
    "q_bpe_apply"         -> q(Pipeline.bpeApply),
    "q_incremental_agg"   -> q(Relational.incrementalAgg),
    "q_pii_scan"          -> q(Pipeline.piiScan),
    "q_vocab_prune"       -> q(Pipeline.vocabPrune),
    "q_novelty"           -> q(Pipeline.novelty),
    "q_skipgrams"         -> q(Pipeline.skipgrams),
    "q_cdc_chunks"        -> q(Pipeline.cdcChunks),
    "q_cdc_dedup"         -> q(Pipeline.cdcDedup),
    "q_ann_recall"        -> q(operators.Evaluation.annRecall),
    "q_eval_confusion"    -> q(operators.Evaluation.evalConfusion),
    "q_kappa"             -> q(operators.Evaluation.kappa),
    "q_ks_test"           -> q(operators.Evaluation.ksTest),
    "q_ab_test"           -> q(operators.Evaluation.abTest),
    "q_chi2"              -> q(operators.Evaluation.chi2),
    "q_stratified_sample" -> q(Pipeline.stratifiedSample),
    "q_countmin"          -> q(Pipeline.countMin),
    "q_bloom_fpr"         -> q(operators.Evaluation.bloomFpr),
    "q_hll_distinct"      -> q(Pipeline.hllDistinct),
    "q_join_estimate"     -> q(Relational.joinEstimate),
    "q_stream_drift"      -> q(Streams.streamDrift),
    "q_stream_hll"        -> q(Streams.streamHll),
    "q_embedding_drift"   -> q(operators.Evaluation.embeddingDrift),
    "q_robust_anomaly"    -> q(Relational.robustAnomaly),
    "q_silhouette"        -> q(operators.Evaluation.silhouette),
    "q_calibration"       -> q(operators.Evaluation.calibration),
    "q_drift_tvd"         -> q(operators.Evaluation.driftTvd),
    "q_late_data"         -> q(operators.Temporal.lateData),
    "q_seasonality"       -> q(operators.Temporal.seasonality),
    "q_event_gaps"        -> q(operators.Temporal.eventGaps),
    "q_spend_trend"       -> q(operators.Temporal.spendTrend),
    "q_theil_sen"         -> q(operators.Temporal.theilSen),
    "q_mann_kendall"      -> q(operators.Temporal.mannKendall),
    "q_active_users"      -> q(operators.Temporal.activeUsers),
    "q_auc"               -> q(operators.Evaluation.auc),
    // data selection & evaluation (round 8)
    "q_dsir"              -> q(operators.Selection.dsirWeights),
    "q_lsh_pr_sweep"      -> q(operators.Selection.lshPrSweep),
    "q_dataset_card"      -> q(operators.Selection.datasetCard),
    "q_rank_fusion"       -> q(operators.Selection.rankFusion),
    "q_source_similarity" -> q(operators.Selection.sourceSimilarity),
    "q_langid_eval"       -> q(operators.Selection.langidEval),
    "q_quality_sweep"     -> q(operators.Selection.qualitySweep),
    // multimodal
    "q_multimodal_meta"   -> q(Media.mediaMeta),
    "q_multimodal_transform" -> q(Media.mediaTransform),
    "q_multimodal_frames" -> q(Media.mediaFrames),
    "q_multimodal_dedup"  -> q(Media.mediaDedup),
    "q_multimodal_embed"  -> q(Media.mediaEmbed),
    // structured streaming
    "q_stream_window"     -> q(Streams.streamWindow),
    "q_stream_window_wm"  -> q(Streams.streamWindowWatermarked),
    "q_stream_sessions"   -> q(Streams.streamSessions),
    "q_stream_dedup"      -> q(Streams.streamDedup),
    "q_stream_static_join" -> q(Streams.streamStaticJoin),
    "q_stream_stream_join" -> q(Streams.streamStreamJoin),
    "q_stream_outer_join" -> q(Streams.streamOuterJoin),
    "q_stream_topk"       -> q(Streams.streamTopk),
    "q_stream_current"    -> q(Streams.streamCurrentState),
    "q_stream_kv_sink"    -> q(Streams.streamKvSink),
    "q_stream_cdc_dedup"  -> q(Streams.streamCdcDedup),
    "q_stream_domain_cap" -> q((s, d) => Streams.streamDomainCap(s, d)),
    "q_stream_pps_sample" -> q((s, d) => Streams.streamPpsSample(s, d)),
    "q_stream_lsh_ingest" -> q(LshStreams.streamLshIngest),
    "q_stream_lsh_admit"  -> q(LshStreams.streamLshAdmit),
    "q_stream_gap_fill"   -> q(Streams.streamGapFill),
    "q_stream_active_users" -> q(Streams.streamActiveUsers),
    "q_stream_percentile" -> q(Streams.streamPercentile),
    "q_stream_changepoint" -> q(Streams.streamChangepoint)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.sql
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers here as a named query; each
  * SQL-expressible one also carries an equivalent DuckDB oracle in
  * [[oracleSql]] (same column names, same total order — the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1-2.6 reference parity
    "source_from_elements"     -> (ReferenceParity.sourceFromElements(_, _)),
    "source_read_text"         -> (ReferenceParity.sourceReadText(_, _)),
    "sink_text_roundtrip"      -> (ReferenceParity.sinkTextRoundtrip(_, _)),
    "sink_partitioned_parquet" -> (ReferenceParity.sinkPartitionedParquet(_, _)),
    "map_uppercase"            -> (ReferenceParity.mapUppercase(_, _)),
    "filter_adults"            -> (ReferenceParity.filterAdults(_, _)),
    "filter_unstable"          -> (ReferenceParity.filterUnstable(_, _)),
    "union_all"                -> (ReferenceParity.unionAll(_, _)),
    "stateful_concat_final"    -> (ReferenceParity.statefulConcatFinal(_, _)),
    "stateful_concat_prefixes" -> (ReferenceParity.statefulConcatPrefixes(_, _)),
    "tumbling_window_max"      -> (ReferenceParity.tumblingWindowMax(_, _)),
    // real Structured Streaming executions (MemoryStream-driven)
    "streaming_window_max"     -> (graft.streaming.StreamingOps.streamingWindowMax(_, _)),
    "streaming_concat_prefixes" -> (graft.streaming.StreamingOps.streamingConcatPrefixes(_, _)),
    "streaming_dedup"          -> (graft.streaming.StreamingOps.streamingDedup(_, _)),
    "streaming_stream_join"    -> (graft.streaming.StreamingOps.streamingStreamJoin(_, _)),
    // §2.9 relational extensions
    "agg_pricing_summary"      -> (Relational.aggPricingSummary(_, _)),
    "join_orders_customers"    -> (Relational.joinOrdersCustomers(_, _)),
    "topn_revenue"             -> (Relational.topnRevenue(_, _)),
    "window_rank_orders"       -> (Relational.windowRankOrders(_, _)),
    "agg_percentiles"          -> (Relational.aggPercentiles(_, _)),
    "agg_corr_quantity_price"  -> (Relational.aggCorrQuantityPrice(_, _)),
    // extended relational surface (reference §2.8 gaps, Spark-first)
    "join_asof"                -> (Extended.joinAsof(_, _)),
    "join_semi_customers"      -> (Extended.joinSemiCustomers(_, _)),
    "join_anti_customers"      -> (Extended.joinAntiCustomers(_, _)),
    "join_range_shipping"      -> (Extended.joinRangeShipping(_, _)),
    "join_full_outer"          -> (Extended.joinFullOuter(_, _)),
    "cross_join_regions"       -> (Extended.crossJoinRegions(_, _)),
    "window_ntile_quartiles"   -> (Extended.windowNtileQuartiles(_, _)),
    "group_concat_names"       -> (Extended.groupConcatNames(_, _)),
    "agg_rollup_revenue"       -> (Extended.aggRollupRevenue(_, _)),
    "agg_cube_orders"          -> (Extended.aggCubeOrders(_, _)),
    "agg_count_distinct"       -> (Extended.aggCountDistinct(_, _)),
    "set_intersect"            -> (Extended.setIntersect(_, _)),
    "set_except"               -> (Extended.setExcept(_, _)),
    "scalar_functions"         -> (Extended.scalarFunctions(_, _)),
    "window_running_sum"       -> (Extended.windowRunningSum(_, _)),
    "sink_bucketed_join"       -> (Extended.sinkBucketedJoin(_, _)),
    "pivot_orders_status"      -> (Extended.pivotOrdersStatus(_, _)),
    "unpivot_lineitem_measures" -> (Extended.unpivotLineitemMeasures(_, _)),
    "window_percent_rank"      -> (Extended.windowPercentRank(_, _)),
    "array_stats_embeddings"   -> (Extended.arrayStatsEmbeddings(_, _)),
    "nested_order_lines"       -> (Extended.nestedOrderLines(_, _)),
    "quality_referential_check" -> (PipelineOps.qualityReferentialCheck(_, _)),
    "agg_histogram_price"      -> (PipelineOps.aggHistogramPrice(_, _)),
    // §2.9 event analytics
    "events_tumbling_stats"    -> (EventOps.eventsTumblingStats(_, _)),
    "events_sliding_stats"     -> (EventOps.eventsSlidingStats(_, _)),
    "events_session_windows"   -> (EventOps.eventsSessionWindows(_, _)),
    "events_session_anomaly"   -> (EventOps.eventsSessionAnomaly(_, _)),
    "dedup_events"             -> (EventOps.dedupEvents(_, _)),
    "json_props_extract"       -> (EventOps.jsonPropsExtract(_, _)),
    "json_props_schema"        -> (EventOps.jsonPropsSchema(_, _)),
    "events_user_funnel"       -> (EventOps.eventsUserFunnel(_, _)),
    "events_cohort_retention"  -> (EventOps.eventsCohortRetention(_, _)),
    "events_interarrival"      -> (EventOps.eventsInterarrival(_, _)),
    "agg_salted_skew"          -> (EventOps.aggSaltedSkew(_, _)),
    // text analysis
    "text_token_counts"        -> (TextOps.textTokenCounts(_, _)),
    "text_language_id"         -> (TextOps.textLanguageId(_, _)),
    "text_quality_score"       -> (TextOps.textQualityScore(_, _)),
    "text_token_count"         -> (TextOps.textTokenCount(_, _)),
    "text_fingerprint"         -> (TextOps.textFingerprint(_, _)),
    // dedup family
    "dedup_exact_docs"         -> (DedupOps.dedupExactDocs(_, _)),
    "dedup_minhash_lsh"        -> (DedupOps.dedupMinhashLsh(_, _)),
    "dedup_simhash"            -> (DedupOps.dedupSimhash(_, _)),
    "dedup_ngram_jaccard"      -> (DedupOps.dedupNgramJaccard(_, _)),
    "dedup_embedding_cosine"   -> (DedupOps.dedupEmbeddingCosine(_, _)),
    "dedup_edit_distance"      -> (DedupOps.dedupEditDistance(_, _)),
    "dedup_connected_components" -> (PipelineOps.dedupConnectedComponents(_, _)),
    // similarity search
    "similarity_topk"          -> (SimilarityOps.similarityTopk(_, _)),
    "similarity_ann_lsh"       -> (SimilarityOps.similarityAnnLsh(_, _)),
    "similarity_ivf"           -> (SimilarityOps.similarityIvf(_, _)),
    // pipeline utilities: scoring, sampling, normalization
    "text_tfidf_topterms"      -> (PipelineOps.textTfidfTopTerms(_, _)),
    "text_normalize"           -> (PipelineOps.textNormalize(_, _)),
    "sample_hash_docs"         -> (PipelineOps.sampleHashDocs(_, _)),
    "sample_stratified_events" -> (PipelineOps.sampleStratifiedEvents(_, _)),
    "sample_topk_per_group"    -> (PipelineOps.sampleTopkPerGroup(_, _)),
    "merge_upsert_customers"   -> (PipelineOps.mergeUpsertCustomers(_, _)),
    "sort_zorder_events"       -> (PipelineOps.sortZorderEvents(_, _)),
    // sketch-based cardinality (no oracle — HLL layouts are engine-specific)
    "agg_approx_distinct"      -> (PipelineOps.aggApproxDistinct(_, _)),
    // multimodal plumbing
    "multimodal_meta"          -> (MultimodalOps.multimodalMeta(_, _)),
    "multimodal_frame_sample"  -> (MultimodalOps.multimodalFrameSample(_, _)),
    // model-based anomaly detection (no oracle — rows-only check)
    "anomaly_kmeans"           -> (AnomalyOps.anomalyKmeans(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "source_from_elements"     -> ReferenceParity.sourceFromElementsSql,
    "source_read_text"         -> ReferenceParity.sourceReadTextSql,
    "sink_text_roundtrip"      -> ReferenceParity.sinkTextRoundtripSql,
    "sink_partitioned_parquet" -> ReferenceParity.sinkPartitionedParquetSql,
    "map_uppercase"            -> ReferenceParity.mapUppercaseSql,
    "filter_adults"            -> ReferenceParity.filterAdultsSql,
    "filter_unstable"          -> ReferenceParity.filterUnstableSql,
    "union_all"                -> ReferenceParity.unionAllSql,
    "stateful_concat_final"    -> ReferenceParity.statefulConcatFinalSql,
    "stateful_concat_prefixes" -> ReferenceParity.statefulConcatPrefixesSql,
    "tumbling_window_max"      -> ReferenceParity.tumblingWindowMaxSql,
    "streaming_window_max"     -> graft.streaming.StreamingOps.streamingWindowMaxSql,
    "streaming_concat_prefixes" -> graft.streaming.StreamingOps.streamingConcatPrefixesSql,
    "streaming_dedup"          -> graft.streaming.StreamingOps.streamingDedupSql,
    "streaming_stream_join"    -> graft.streaming.StreamingOps.streamingStreamJoinSql,
    "agg_pricing_summary"      -> Relational.aggPricingSummarySql,
    "join_orders_customers"    -> Relational.joinOrdersCustomersSql,
    "topn_revenue"             -> Relational.topnRevenueSql,
    "window_rank_orders"       -> Relational.windowRankOrdersSql,
    "agg_percentiles"          -> Relational.aggPercentilesSql,
    "agg_corr_quantity_price"  -> Relational.aggCorrQuantityPriceSql,
    "join_asof"                -> Extended.joinAsofSql,
    "join_semi_customers"      -> Extended.joinSemiCustomersSql,
    "join_anti_customers"      -> Extended.joinAntiCustomersSql,
    "join_range_shipping"      -> Extended.joinRangeShippingSql,
    "join_full_outer"          -> Extended.joinFullOuterSql,
    "cross_join_regions"       -> Extended.crossJoinRegionsSql,
    "window_ntile_quartiles"   -> Extended.windowNtileQuartilesSql,
    "group_concat_names"       -> Extended.groupConcatNamesSql,
    "agg_rollup_revenue"       -> Extended.aggRollupRevenueSql,
    "agg_cube_orders"          -> Extended.aggCubeOrdersSql,
    "agg_count_distinct"       -> Extended.aggCountDistinctSql,
    "set_intersect"            -> Extended.setIntersectSql,
    "set_except"               -> Extended.setExceptSql,
    "scalar_functions"         -> Extended.scalarFunctionsSql,
    "window_running_sum"       -> Extended.windowRunningSumSql,
    "sink_bucketed_join"       -> Extended.sinkBucketedJoinSql,
    "pivot_orders_status"      -> Extended.pivotOrdersStatusSql,
    "unpivot_lineitem_measures" -> Extended.unpivotLineitemMeasuresSql,
    "window_percent_rank"      -> Extended.windowPercentRankSql,
    "array_stats_embeddings"   -> Extended.arrayStatsEmbeddingsSql,
    "nested_order_lines"       -> Extended.nestedOrderLinesSql,
    "quality_referential_check" -> PipelineOps.qualityReferentialCheckSql,
    "agg_histogram_price"      -> PipelineOps.aggHistogramPriceSql,
    "events_tumbling_stats"    -> EventOps.eventsTumblingStatsSql,
    "events_sliding_stats"     -> EventOps.eventsSlidingStatsSql,
    "events_session_windows"   -> EventOps.eventsSessionWindowsSql,
    "events_session_anomaly"   -> EventOps.eventsSessionAnomalySql,
    "dedup_events"             -> EventOps.dedupEventsSql,
    "json_props_extract"       -> EventOps.jsonPropsExtractSql,
    "json_props_schema"        -> EventOps.jsonPropsSchemaSql,
    "events_user_funnel"       -> EventOps.eventsUserFunnelSql,
    "events_cohort_retention"  -> EventOps.eventsCohortRetentionSql,
    "events_interarrival"      -> EventOps.eventsInterarrivalSql,
    "agg_salted_skew"          -> EventOps.aggSaltedSkewSql,
    "text_token_counts"        -> TextOps.textTokenCountsSql,
    "text_language_id"         -> TextOps.textLanguageIdSql,
    "text_quality_score"       -> TextOps.textQualityScoreSql,
    "text_token_count"         -> TextOps.textTokenCountSql,
    "text_fingerprint"         -> TextOps.textFingerprintSql,
    "dedup_exact_docs"         -> DedupOps.dedupExactDocsSql,
    "dedup_minhash_lsh"        -> DedupOps.dedupMinhashLshSql,
    "dedup_simhash"            -> DedupOps.dedupSimhashSql,
    "dedup_ngram_jaccard"      -> DedupOps.dedupNgramJaccardSql,
    "dedup_embedding_cosine"   -> DedupOps.dedupEmbeddingCosineSql,
    "dedup_edit_distance"      -> DedupOps.dedupEditDistanceSql,
    "dedup_connected_components" -> PipelineOps.dedupConnectedComponentsSql,
    "similarity_topk"          -> SimilarityOps.similarityTopkSql,
    "similarity_ann_lsh"       -> SimilarityOps.similarityAnnLshSql,
    "similarity_ivf"           -> SimilarityOps.similarityIvfSql,
    "text_tfidf_topterms"      -> PipelineOps.textTfidfTopTermsSql,
    "text_normalize"           -> PipelineOps.textNormalizeSql,
    "sample_hash_docs"         -> PipelineOps.sampleHashDocsSql,
    "sample_stratified_events" -> PipelineOps.sampleStratifiedEventsSql,
    "sample_topk_per_group"    -> PipelineOps.sampleTopkPerGroupSql,
    "merge_upsert_customers"   -> PipelineOps.mergeUpsertCustomersSql,
    "sort_zorder_events"       -> PipelineOps.sortZorderEventsSql,
    "multimodal_meta"          -> MultimodalOps.multimodalMetaSql,
    "multimodal_frame_sample"  -> MultimodalOps.multimodalFrameSampleSql,
  )
}

package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * One `queries` entry per implemented SURVEY §2 operator; `oracleSql`
  * carries the matching DuckDB SQL (omitted only for the explicit
  * no-oracle tier). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Canonical map-reduce word count (SURVEY §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame =
    TextOps.textWordcount(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. scans
    "scan_parquet" -> (Relational.scanParquet _),
    "scan_pruned" -> (Relational.scanPruned _),
    "scan_csv" -> (Relational.scanCsv _),
    "scan_json" -> (Relational.scanJson _),
    "scan_range" -> (Relational.scanRange _),
    "scan_orc" -> (Relational.scanOrc _),
    "scan_binaryfile" -> (Relational.scanBinaryfile _),
    "sql_cte_pipeline" -> (Relational.sqlCtePipeline _),
    // B. projection / filter
    "map_project" -> (Relational.mapProject _),
    "filter_pred" -> (Relational.filterPred _),
    "flatmap_explode" -> (TextOps.flatmapExplode _),
    "flatmap_posexplode" -> (TextOps.flatmapPosexplode _),
    // C. joins
    "join_inner" -> (Relational.joinInner _),
    "join_broadcast" -> (Relational.joinBroadcast _),
    "join_left_outer" -> (Relational.joinLeftOuter _),
    "join_full_outer" -> (Relational.joinFullOuter _),
    "join_semi" -> (Relational.joinSemi _),
    "join_anti" -> (Relational.joinAnti _),
    "join_cross" -> (Relational.joinCross _),
    "join_theta_range" -> (Relational.joinThetaRange _),
    "join_asof" -> (Relational.joinAsof _),
    "join_salted" -> (Relational.joinSalted _),
    "join_bucketed" -> (Relational.joinBucketed _),
    "join_cbo_reorder" -> (StatsOps.joinCboReorder _),
    // D. aggregations
    "agg_pricing_summary" -> (Relational.aggPricingSummary _),
    "agg_count_distinct" -> (Relational.aggCountDistinct _),
    "agg_multikey_having" -> (Relational.aggMultikeyHaving _),
    "agg_conditional" -> (Relational.aggConditional _),
    "agg_grouping_sets" -> (Relational.aggGroupingSets _),
    "agg_rollup" -> (Relational.aggRollup _),
    "agg_cube" -> (Relational.aggCube _),
    "agg_collect_sorted" -> (Relational.aggCollectSorted _),
    "agg_percentiles" -> (Relational.aggPercentiles _),
    "agg_stats" -> (Relational.aggStats _),
    "agg_mode" -> (Relational.aggMode _),
    "agg_decimal" -> (Relational.aggDecimal _),
    "agg_bool" -> (Relational.aggBool _),
    "agg_argmax" -> (Relational.aggArgmax _),
    "win_cume_dist" -> (Relational.winCumeDist _),
    // E. windows
    "win_rownum_topk" -> (Relational.winRownumTopk _),
    "win_rank_dense" -> (Relational.winRankDense _),
    "win_lag_lead" -> (Relational.winLagLead _),
    "win_running_sum" -> (Relational.winRunningSum _),
    "win_moving_avg" -> (Relational.winMovingAvg _),
    "win_ntile_pctrank" -> (Relational.winNtilePctrank _),
    "win_first_last" -> (Relational.winFirstLast _),
    "win_dist_nth" -> (Relational.winDistNth _),
    "win_range_frame" -> (Relational.winRangeFrame _),
    "agg_pivot" -> (Relational.aggPivot _),
    "agg_unpivot" -> (Relational.aggUnpivot _),
    "agg_stringagg" -> (Relational.aggStringagg _),
    "agg_cms_freq" -> (SketchOps.aggCmsFreq _),
    "agg_topfreq" -> (SketchOps.aggTopfreqWords _),
    "agg_hll_union" -> (SketchOps.aggHllUnion _),
    "agg_kll_quantiles" -> (SketchOps.aggKllQuantiles _),
    "agg_theta_sets" -> (SketchOps.aggThetaSets _),
    "agg_regression" -> (Relational.aggRegression _),
    "sort_pagination" -> (Relational.sortPagination _),
    "sample_seeded" -> (Relational.sampleSeeded _),
    "fn_hash" -> (Functions.fnHash _),
    "fn_datetime_fmt" -> (Functions.fnDatetimeFmt _),
    "fn_array_setops" -> (Functions.fnArraySetops _),
    "fn_string2" -> (Functions.fnString2 _),
    "agg_histogram" -> (Functions.aggHistogram _),
    // F. sort / limit / top-k / set ops
    "sort_multi" -> (Relational.sortMulti _),
    "topk_global" -> (Relational.topkGlobal _),
    "set_union_all" -> (Relational.setUnionAll _),
    "set_union_distinct" -> (Relational.setUnionDistinct _),
    "set_intersect" -> (Relational.setIntersect _),
    "set_except" -> (Relational.setExcept _),
    "set_except_all" -> (Relational.setExceptAll _),
    "set_intersect_all" -> (Relational.setIntersectAll _),
    // G. scalar function families
    "fn_string" -> (Functions.fnString _),
    "fn_datetime" -> (Functions.fnDatetime _),
    "fn_math" -> (Functions.fnMath _),
    "fn_conditional" -> (Functions.fnConditional _),
    "fn_array" -> (Functions.fnArray _),
    "fn_json" -> (Functions.fnJson _),
    "fn_bitwise" -> (Functions.fnBitwise _),
    "fn_encode" -> (Functions.fnEncode _),
    "fn_null" -> (Functions.fnNull _),
    "fn_map" -> (Functions.fnMap _),
    "fn_struct" -> (Functions.fnStruct _),
    // H. event-time (batch mode)
    "stream_tumbling" -> (EventOps.streamTumbling _),
    "stream_sliding" -> (EventOps.streamSliding _),
    "stream_session" -> (EventOps.streamSession _),
    "win_sessionize" -> (EventOps.winSessionize _),
    "win_funnel" -> (EventOps.winFunnel _),
    "win_retention" -> (EventOps.winRetention _),
    // I. LLM-pipeline ops
    "dedup_exact" -> (SimOps.dedupExact _),
    "dedup_minhash" -> (SimOps.dedupMinhash _),
    "dedup_incremental" -> (SimOps.dedupIncremental _),
    "sim_cosine_topk" -> (SimOps.simCosineTopk _),
    "sim_knn_label" -> (SimOps.simKnnLabel _),
    "text_wordcount" -> (TextOps.textWordcount _),
    "text_stats" -> (TextOps.textStats _),
    "text_ngrams" -> (TextOps.textNgrams _),
    "text_tfidf" -> (TextOps.textTfidf _),
    "text_sentiment" -> (TextOps.textSentiment _),
    "text_langid" -> (TextOps.textLangid _),
    "text_quality" -> (TextOps.textQuality _),
    "text_tokencount" -> (TextOps.textTokencount _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    "text_normalize" -> (TextOps.textNormalize _),
    "text_repetition" -> (TextOps.textRepetition _),
    "text_entropy" -> (TextOps.textEntropy _),
    "fn_regex" -> (TextOps.fnRegex _),
    "data_split" -> (TextOps.dataSplit _),
    "sample_stratified" -> (TextOps.sampleStratified _),
    "text_decontaminate" -> (TextOps.textDecontaminate _),
    "text_pack_sequences" -> (TextOps.textPackSequences _),
    "text_chunk" -> (TextOps.textChunk _),
    "text_perplexity" -> (TextOps.textPerplexity _),
    "text_bpe_tokencount" -> (BpeOps.textBpeTokencount _),
    "pipeline_corpus_clean" -> (TextOps.pipelineCorpusClean _),
    "dedup_ngram_jaccard" -> (SimOps.dedupNgramJaccard _),
    "dedup_embedding" -> (SimOps.dedupEmbedding _),
    "dedup_embedding_ann" -> (SimOps.dedupEmbeddingAnn _),
    "dedup_clusters" -> (SimOps.dedupClusters _),
    "dedup_clusters_ann" -> (SimOps.dedupClustersAnn _),
    "dedup_simhash" -> (SimOps.dedupSimhash _),
    "sim_ann_bucket" -> (SimOps.simAnnBucket _),
    "sim_ann_ivf" -> (SimOps.simAnnIvf _),
    "sim_knn_label_ann" -> (SimOps.simKnnLabelAnn _),
    "sim_cosine_topk_ann" -> (SimOps.simCosineTopkAnn _),
    "sim_incremental_ann" -> (SimOps.simIncrementalAnn _),
    "text_quality_ml" -> (MlOps.textQualityMl _),
    "sim_kmeans_cluster" -> (MlOps.simKmeansCluster _),
    "sim_pca_reduce" -> (MlOps.simPcaReduce _),
    "merge_upsert" -> (MergeOps.mergeUpsertQuery _),
    "mm_meta" -> (MultimodalOps.mmMeta _),
    "mm_resize" -> (MultimodalOps.mmResize _),
    "mm_frames" -> (MultimodalOps.mmFrames _),
    "mm_features" -> (MultimodalOps.mmFeatures _),
    // D (T3). approx aggregates
    "agg_approx_distinct" -> (Relational.aggApproxDistinct _),
    "agg_approx_percentile" -> (Relational.aggApproxPercentile _),
    // D'. subqueries
    "sub_scalar" -> (Relational.subScalar _),
    "sub_in" -> (Relational.subIn _),
    "join_lateral" -> (Relational.joinLateral _),
    "sub_exists" -> (Relational.subExists _),
    // J. UDF / UDAF / typed surface
    "typed_mapgroups" -> (TypedOps.typedMapgroups _),
    "typed_cogroup" -> (TypedOps.typedCogroup _),
    "udf_scalar" -> (Udfs.udfScalar _),
    "udaf_weighted_avg" -> (Udfs.udafWeightedAvg _),
    "udaf_topk_acc" -> (Udfs.udafTopkAcc _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}

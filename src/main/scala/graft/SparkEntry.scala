package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.cdc._
import graft.relational.Queries
import graft.ops.{Dedup, Multimodal, Ngrams, Pipeline, Similarity, TextStats}
import graft.streaming.ChangeFeedStream

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each key maps to. */
object SparkEntry {
  /** Flagship: per-subscriber fan-out of the decoded change feed on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Forwarder.fanoutForward(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "change_decode" -> (ChangeFeed.changeDecode _),
    "change_type_filter" -> (ChangeFeed.changeTypeFilter _),
    "filter_eq" -> (SpecificFilter.filterEq _),
    "filter_in" -> (SpecificFilter.filterIn _),
    "subscription_route" -> (Subscription.subscriptionRoute _),
    "table_route_validate" -> (Subscription.tableRouteValidate _),
    "hyper_remap" -> (HyperRemap.hyperRemap _),
    "fanout_forward" -> (Forwarder.fanoutForward _),
    "auth_restrict" -> (Subscription.authRestrict _),
    "resume_offsets" -> (Forwarder.resumeOffsets _),
    "q1_agg" -> (Queries.q1Agg _),
    "q3_join" -> (Queries.q3Join _),
    "q5_broadcast" -> (Queries.q5Broadcast _),
    "window_topn" -> (Queries.windowTopn _),
    "events_sessionize" -> (Queries.eventsSessionize _),
    "events_asof" -> (Queries.eventsAsof _),
    "events_range_join" -> (Queries.eventsRangeJoin _),
    "text_stats" -> (TextStats.textStats _),
    "lang_id" -> (TextStats.langId _),
    "doc_fingerprint" -> (TextStats.docFingerprint _),
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_minhash" -> (Dedup.dedupMinhash _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "decontaminate" -> (Dedup.decontaminate _),
    "dedup_simhash_pairs" -> (Dedup.dedupSimhashPairs _),
    "dedup_simhash_multiprobe" -> (Dedup.dedupSimhashMultiprobe _),
    "ann_topk" -> (Similarity.annTopk _),
    "ann_lsh" -> (Similarity.annLsh _),
    "ann_ivf" -> (Similarity.annIvf _),
    "embed_cosine_dup" -> (Similarity.embedCosineDup _),
    "mm_features" -> (Multimodal.mmFeatures _),
    "mm_frames" -> (Multimodal.mmFrames _),
    "stream_window_counts" -> (ChangeFeedStream.streamWindowCounts _),
    "quality_filter" -> (Pipeline.qualityFilter _),
    "sample_stratified" -> (Pipeline.sampleStratified _),
    "pack_sequences" -> (Pipeline.packSequences _),
    "pipeline_e2e" -> (Pipeline.pipelineE2e _),
    "repetition_filter" -> (TextStats.repetitionFilter _),
    "ngram_topk" -> (Ngrams.ngramTopk _),
    "tfidf_topterms" -> (Ngrams.tfidfTopterms _),
    "knn_classify" -> (Similarity.knnClassify _),
    "embed_centroids" -> (Similarity.embedCentroids _),
    "source_mix" -> (Pipeline.sourceMix _),
    "shard_assign" -> (Pipeline.shardAssign _),
    "sample_reservoir" -> (Pipeline.sampleReservoir _),
    "lang_quantiles" -> (Pipeline.langQuantiles _),
    "user_window_1h" -> (Queries.userWindow1h _),
    "cdc_snapshot" -> (Forwarder.cdcSnapshot _),
    "dedup_clusters" -> (Dedup.dedupClusters _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "change_decode" -> ChangeFeed.changeDecodeSql,
    "change_type_filter" -> ChangeFeed.changeTypeFilterSql,
    "filter_eq" -> SpecificFilter.filterEqSql,
    "filter_in" -> SpecificFilter.filterInSql,
    "subscription_route" -> Subscription.subscriptionRouteSql,
    "table_route_validate" -> Subscription.tableRouteValidateSql,
    "hyper_remap" -> HyperRemap.hyperRemapSql,
    "fanout_forward" -> Forwarder.fanoutForwardSql,
    "auth_restrict" -> Subscription.authRestrictSql,
    "resume_offsets" -> Forwarder.resumeOffsetsSql,
    "q1_agg" -> Queries.q1AggSql,
    "q3_join" -> Queries.q3JoinSql,
    "q5_broadcast" -> Queries.q5BroadcastSql,
    "window_topn" -> Queries.windowTopnSql,
    "events_sessionize" -> Queries.eventsSessionizeSql,
    "events_asof" -> Queries.eventsAsofSql,
    "events_range_join" -> Queries.eventsRangeJoinSql,
    "text_stats" -> TextStats.textStatsSql,
    "lang_id" -> TextStats.langIdSql,
    "doc_fingerprint" -> TextStats.docFingerprintSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_minhash" -> Dedup.dedupMinhashSql,
    "dedup_simhash" -> Dedup.dedupSimhashSql,
    "decontaminate" -> Dedup.decontaminateSql,
    "dedup_simhash_pairs" -> Dedup.dedupSimhashPairsSql,
    "dedup_simhash_multiprobe" -> Dedup.dedupSimhashMultiprobeSql,
    "ann_topk" -> Similarity.annTopkSql,
    "ann_lsh" -> Similarity.annLshSql,
    "ann_ivf" -> Similarity.annIvfSql,
    "embed_cosine_dup" -> Similarity.embedCosineDupSql,
    "mm_features" -> Multimodal.mmFeaturesSql,
    "mm_frames" -> Multimodal.mmFramesSql,
    "stream_window_counts" -> ChangeFeedStream.streamWindowCountsSql,
    "quality_filter" -> Pipeline.qualityFilterSql,
    "sample_stratified" -> Pipeline.sampleStratifiedSql,
    "pack_sequences" -> Pipeline.packSequencesSql,
    "pipeline_e2e" -> Pipeline.pipelineE2eSql,
    "repetition_filter" -> TextStats.repetitionFilterSql,
    "ngram_topk" -> Ngrams.ngramTopkSql,
    "tfidf_topterms" -> Ngrams.tfidfToptermsSql,
    "knn_classify" -> Similarity.knnClassifySql,
    "embed_centroids" -> Similarity.embedCentroidsSql,
    "source_mix" -> Pipeline.sourceMixSql,
    "shard_assign" -> Pipeline.shardAssignSql,
    "sample_reservoir" -> Pipeline.sampleReservoirSql,
    "lang_quantiles" -> Pipeline.langQuantilesSql,
    "user_window_1h" -> Queries.userWindow1hSql,
    "cdc_snapshot" -> Forwarder.cdcSnapshotSql,
    "dedup_clusters" -> Dedup.dedupClustersSql,
  )
}

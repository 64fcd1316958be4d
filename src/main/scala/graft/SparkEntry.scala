package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CoreQueries => C, ExtQueries => X, SurfaceQueries => S}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface: q01–q29 cover reference parity
  * (SURVEY.md §2: extract/transform/load, value mapping, domain filters,
  * fixed-width/CSV/JDBC/DBF round-trips, upsert routing, log-state
  * recovery, inline payloads, row defaults, runner orchestration, hooks,
  * xml_id + name-search FK resolution), x01–x18 cover the extension
  * surface (§2.12: dedup, similarity search, text analysis, event-time
  * incl. as-of join, multimodal). Every key has a DuckDB oracle in
  * `oracleSql` — including the approximate ops: x06 simhash uses a
  * portable md5-nibble token hash and exact-recall pigeonhole blocking;
  * x11 IVF is approximate-but-deterministic, so the oracle replicates the
  * full assignment→probe→rerank pipeline.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    C.q02TopOrders(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> (C.q01PricingSummary(_, _)),
    "q02_top_orders"         -> (C.q02TopOrders(_, _)),
    "q03_region_rollup"      -> (C.q03RegionRollup(_, _)),
    "q04_value_mapping"      -> (C.q04ValueMapping(_, _)),
    "q05_domain_filter"      -> (C.q05DomainFilter(_, _)),
    "q06_transform_pipeline" -> (C.q06TransformPipeline(_, _)),
    "q07_fixedwidth_render"  -> (C.q07FixedWidthRender(_, _)),
    "q08_fixedwidth_roundtrip" -> (C.q08FixedWidthRoundtrip(_, _)),
    "q09_csv_roundtrip"      -> (C.q09CsvRoundtrip(_, _)),
    "q10_break_on"           -> (C.q10BreakOn(_, _)),
    "q11_merge_insert"       -> (C.q11MergeInsert(_, _)),
    "q12_merge_update"       -> (C.q12MergeUpdate(_, _)),
    "q13_merge_noupdate"     -> (C.q13MergeNoUpdate(_, _)),
    "q14_merge_onlyupdate"   -> (C.q14MergeOnlyUpdate(_, _)),
    "q15_merge_delete"       -> (C.q15MergeDelete(_, _)),
    "q16_log_state_recovery" -> (C.q16LogStateRecovery(_, _)),
    "q17_date_macro"         -> (C.q17DateMacroFilter(_, _)),
    "q18_rollup"             -> (C.q18Rollup(_, _)),
    "q19_window_topk"        -> (C.q19WindowTopK(_, _)),
    "q20_jdbc_roundtrip"     -> (C.q20JdbcRoundtrip(_, _)),
    "q21_inline_payload"     -> (S.q21InlinePayload(_, _)),
    "q22_row_defaults"       -> (S.q22RowDefaults(_, _)),
    "q23_csv_sink_lines"     -> (S.q23CsvSinkLines(_, _)),
    "q24_runner_routing"     -> (S.q24RunnerRouting(_, _)),
    "q25_connector_extract"  -> (S.q25ConnectorExtract(_, _)),
    "q26_hook_pipeline"      -> (S.q26HookPipeline(_, _)),
    "q27_dbf_roundtrip"      -> (S.q27DbfRoundtrip(_, _)),
    "q28_xmlid_resolve"      -> (S.q28XmlIdResolve(_, _)),
    "q29_name_search"        -> (S.q29NameSearch(_, _)),
    "q30_semi_join"          -> (S.q30SemiJoin(_, _)),
    "q31_anti_join"          -> (S.q31AntiJoin(_, _)),
    "q32_scalar_functions"   -> (S.q32ScalarFunctions(_, _)),
    "q33_set_ops"            -> (S.q33SetOps(_, _)),
    "q34_pivot"              -> (S.q34Pivot(_, _)),
    "q35_stats_moments"      -> (S.q35StatsMoments(_, _)),
    "q36_grouping_sets"      -> (S.q36GroupingSets(_, _)),
    "q37_above_avg"          -> (S.q37AboveAvg(_, _)),
    "q38_partitioned_merge"  -> (S.q38PartitionedMerge(_, _)),
    "x01_exact_dedup"        -> (X.x01ExactDedup(_, _)),
    "x02_text_profile"       -> (X.x02TextProfile(_, _)),
    "x03_lang_id"            -> (X.x03LangId(_, _)),
    "x04_minhash_pairs"      -> (X.x04MinhashPairs(_, _)),
    "x05_ngram_jaccard_pairs" -> (X.x05NgramJaccardPairs(_, _)),
    "x06_simhash_pairs"      -> (X.x06SimhashPairs(_, _)),
    "x07_ann_bruteforce"     -> (X.x07AnnBruteForce(_, _)),
    "x08_session_stats"      -> (X.x08SessionStats(_, _)),
    "x09_tumbling_window"    -> (X.x09TumblingWindow(_, _)),
    "x10_multimodal_meta"    -> (X.x10MultimodalMeta(_, _)),
    "x11_ann_ivf"            -> (X.x11AnnIvf(_, _)),
    "x12_embedding_pairs"    -> (X.x12EmbeddingPairs(_, _)),
    "x13_sliding_window"     -> (X.x13SlidingWindow(_, _)),
    "x14_term_frequency"     -> (X.x14TermFrequency(_, _)),
    "x15_source_cube"        -> (X.x15SourceCube(_, _)),
    "x16_ivf_assign"         -> (X.x16IvfAssign(_, _)),
    "x17_asof_join"          -> (X.x17AsofJoin(_, _)),
    "x18_frame_sample"       -> (X.x18FrameSample(_, _)),
    "x19_quantize_int8"      -> (X.x19QuantizeInt8(_, _)),
    "x20_rolling_fingerprint" -> (X.x20RollingFingerprint(_, _)),
    "x21_tfidf"              -> (X.x21Tfidf(_, _)),
    "x22_sequence_pack"      -> (X.x22SequencePack(_, _)),
    "x23_dup_clusters"       -> (X.x23DupClusters(_, _)),
    "x24_hash_sample"        -> (X.x24HashSample(_, _)),
    "x25_histogram"          -> (X.x25Histogram(_, _)),
    "x26_dedup_keeper"       -> (X.x26DedupKeeper(_, _)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"    -> C.q01Sql,
    "q02_top_orders"         -> C.q02Sql,
    "q03_region_rollup"      -> C.q03Sql,
    "q04_value_mapping"      -> C.q04Sql,
    "q05_domain_filter"      -> C.q05Sql,
    "q06_transform_pipeline" -> C.q06Sql,
    "q07_fixedwidth_render"  -> C.q07Sql,
    "q08_fixedwidth_roundtrip" -> C.q08Sql,
    "q09_csv_roundtrip"      -> C.q09Sql,
    "q10_break_on"           -> C.q10Sql,
    "q11_merge_insert"       -> C.q11Sql,
    "q12_merge_update"       -> C.q12Sql,
    "q13_merge_noupdate"     -> C.q13Sql,
    "q14_merge_onlyupdate"   -> C.q14Sql,
    "q15_merge_delete"       -> C.q15Sql,
    "q16_log_state_recovery" -> C.q16Sql,
    "q17_date_macro"         -> C.q17Sql,
    "q18_rollup"             -> C.q18Sql,
    "q19_window_topk"        -> C.q19Sql,
    "q20_jdbc_roundtrip"     -> C.q20Sql,
    "q21_inline_payload"     -> S.q21Sql,
    "q22_row_defaults"       -> S.q22Sql,
    "q23_csv_sink_lines"     -> S.q23Sql,
    "q24_runner_routing"     -> S.q24Sql,
    "q25_connector_extract"  -> S.q25Sql,
    "q26_hook_pipeline"      -> S.q26Sql,
    "q27_dbf_roundtrip"      -> S.q27Sql,
    "q28_xmlid_resolve"      -> S.q28Sql,
    "q29_name_search"        -> S.q29Sql,
    "q30_semi_join"          -> S.q30Sql,
    "q31_anti_join"          -> S.q31Sql,
    "q32_scalar_functions"   -> S.q32Sql,
    "q33_set_ops"            -> S.q33Sql,
    "q34_pivot"              -> S.q34Sql,
    "q35_stats_moments"      -> S.q35Sql,
    "q36_grouping_sets"      -> S.q36Sql,
    "q37_above_avg"          -> S.q37Sql,
    "q38_partitioned_merge"  -> S.q38Sql,
    "x01_exact_dedup"        -> X.x01Sql,
    "x02_text_profile"       -> X.x02Sql,
    "x03_lang_id"            -> X.x03Sql,
    "x04_minhash_pairs"      -> X.x04Sql,
    "x05_ngram_jaccard_pairs" -> X.x05Sql,
    "x06_simhash_pairs"      -> X.x06Sql,
    "x07_ann_bruteforce"     -> X.x07Sql,
    "x08_session_stats"      -> X.x08Sql,
    "x09_tumbling_window"    -> X.x09Sql,
    "x10_multimodal_meta"    -> X.x10Sql,
    "x11_ann_ivf"            -> X.x11Sql,
    "x12_embedding_pairs"    -> X.x12Sql,
    "x13_sliding_window"     -> X.x13Sql,
    "x14_term_frequency"     -> X.x14Sql,
    "x15_source_cube"        -> X.x15Sql,
    "x16_ivf_assign"         -> X.x16Sql,
    "x17_asof_join"          -> X.x17Sql,
    "x18_frame_sample"       -> X.x18Sql,
    "x19_quantize_int8"      -> X.x19Sql,
    "x20_rolling_fingerprint" -> X.x20Sql,
    "x21_tfidf"              -> X.x21Sql,
    "x22_sequence_pack"      -> X.x22Sql,
    "x23_dup_clusters"       -> X.x23Sql,
    "x24_hash_sample"        -> X.x24Sql,
    "x25_histogram"          -> X.x25Sql,
    "x26_dedup_keeper"       -> X.x26Sql)
}

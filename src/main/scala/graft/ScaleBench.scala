package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the dedup/ANN family (x01–x06, x23, x27, x28): stages a
  * replica-scaled corpus from the sf0.1 tables and times the family at 1×
  * and N× in one JVM, so the growth CURVE (not the absolute number) is the
  * result. A linear-time operator shows ~N× wall growth at N× rows; a
  * pair-generator that degenerated to all-pairs would show ~N²×.
  *
  * Replication is built to keep pair volume scaling linearly, the way a
  * genuinely 10×-larger corpus would:
  *  - documents: replica i ≥ 1 suffixes every token with a replica tag, so
  *    replicas share NO shingles — near-dup structure repeats per replica
  *    (10× pairs), instead of every replica pairing with every other
  *    (100× pairs, which would measure the fixture, not the engine);
  *  - embeddings: replica i cyclically rotates each vector by i positions —
  *    rotation preserves the norm and within-replica geometry but makes
  *    cross-replica cosines incoherent, so IVF blocks don't fill with
  *    cross-replica near-1.0 duplicates.
  * Ids remap by a replica offset that is a multiple of 50, preserving the
  * `vec_id % 50` centroid pattern x27 derives per replica.
  */
object ScaleBench {

  val Family: Seq[String] = Seq(
    "x01_exact_dedup", "x02_text_profile", "x03_lang_id", "x04_minhash_pairs",
    "x05_ngram_jaccard_pairs", "x06_simhash_pairs", "x23_dup_clusters",
    "x27_embedding_dedup_ivf", "x28_incremental_dedup",
    "x29_repeated_ngrams", "x31_contamination")

  /** Relational core + event-time family, timed over replica-scaled
    * orders/lineitem/customer/events (keys offset per replica so joins
    * and sessions replicate instead of colliding; dims copied as-is).
    */
  val CoreFamily: Seq[String] = Seq(
    "q01_pricing_summary", "q02_top_orders", "q03_region_rollup",
    "q19_window_topk", "q30_semi_join", "q37_above_avg",
    "x08_session_stats", "x09_tumbling_window", "x15_source_cube")

  /** Streaming gates: the claim under test is that state stays O(active
    * keys) and per-batch cost tracks batch size, not corpus history —
    * sub-linear wall growth at N× events/documents. (x33/x34 restage
    * their replay input per call; x36 stages once per JVM, so its min-of-2
    * isolates the replay itself — in both cases the curve measures the
    * streaming operator, not the scaffolding.)
    */
  val StreamFamily: Seq[String] = Seq(
    "x33_streaming_sessions", "x34_streaming_incr_dedup", "x36_late_watermark")

  /** Round-6 operators: corpus construction (narrow maps + bounded-state
    * sketches + two-stage sampling — expect ~linear or flat), layout
    * stats (one agg + one groupBy), and the two new streaming gates
    * (state O(keys in horizon); x42's pair OUTPUT grows linearly with
    * users since replicas shift user ids).
    */
  val R6Family: Seq[String] = Seq(
    "x38_pii_redact", "x39_weighted_sample", "x40_kmv_distinct",
    "x41_doc_chunks", "x43_zorder_stats", "x42_stream_join",
    "x44_stream_dedup", "x45_stream_upsert", "x46_corpus_funnel",
    "x47_group_quantiles", "x48_incremental_minhash", "x49_passage_dedup",
    "x51_shard_plan")

  /** Round-7 operators: the bloom decontamination prefilter (probe is a
    * narrow map — expect ~linear in corpus grams; the filter build is
    * O(bench grams), fixed across replicas only on the corpus side), the
    * vacuum lifecycle (commit I/O per merge — linear in touched data),
    * and the streaming funnel (per-batch cost tracks batch size; the
    * historical index build is the linear floor).
    */
  val R7Family: Seq[String] = Seq(
    "x55_bloom_decontaminate", "x56_lifecycle_vacuum", "x57_streaming_funnel",
    // LM scoring / DSIR are one explode + window/groupBy on the doc id +
    // broadcast model joins — expect ~linear; x60 rides x04's banded-LSH
    // bound (pair volume, not row count, dominates)
    "x58_perplexity_score", "x59_dsir_sample", "x60_source_overlap",
    // x61 is one groupBy over the replicated docs to O(sources) rows;
    // x62 runs at its FIXED gate parameters over the replicated
    // embeddings, so its curve shows the N²/2^bits fixed-bit law plus
    // the noise-floor pair volume (see BENCH_SCALE) — srp_auto_scale
    // below reports the production sizing
    "x61_mixture_plan", "x62_srp_neardup",
    // x63 composes x62's SRP stage AT THE SAME pinned 6-bit geometry, so
    // its curve is x62's fixed-bit law plus O(survivors × centroids) IVF
    // — included so the omission isn't silent, read it against x62's row
    "x63_embedding_funnel",
    // distribution-level shuffles over distinct n_chars values; staging's
    // per-replica word suffix widens text, so distinct values (and the
    // window input) grow ~linearly with replicas — expect low-multiple
    // growth, not flatness
    "x64_outlier_stats")

  /** Round-8 operators: the maintained dedup stores (build is linear in
    * the historical slice; probe + merge are O(increment) against the
    * persisted tables) and salted sessionization (two shuffles — events
    * by (user, bucket), rollups by user — expect ~linear).
    */
  val R8Family: Seq[String] = Seq(
    "x65_dedup_store_daily", "x66_salted_sessions",
    // k-means: per-iteration cost is corpus × k broadcast-compare with
    // stride seeding k ∝ N — the fixture family measures the N×k law;
    // x68 adds the Σ cluster-size² pair volume on top
    "x67_kmeans_stats", "x68_semantic_dedup",
    // BM25 / MG-verify / prefix-sum packing are one-to-two-shuffle
    // linear passes — expect ~linear
    "x69_bm25_topk", "x70_heavy_hitters", "x71_packing_stats",
    // hard negatives: fixed 1-in-25 query stride means |Q| grows with N
    // — the N×|Q| law, like x67's N×k; two-stage top-k keeps reducers
    // bounded
    "x72_hard_negatives",
    // two map-side-combined integer aggregations — expect ~linear
    "x73_event_anomalies",
    // posting left-join vs the distinct historical shingle set — rides
    // the x05 inverted-index bound
    "x74_novelty_score",
    // x75 rides x67's assignment (stride-pinned, see x67's row); x76 is
    // two integer aggs — expect ~linear
    "x75_balanced_sample", "x76_volume_trend",
    // histogram/top-k/centroid-mean shuffles over aggregated rows —
    // expect ~linear
    "x77_length_drift", "x78_vocab_coverage", "x79_embedding_drift",
    // rides x04's banded-LSH bound
    "x80_split_leakage",
    // two outer joins on the id — expect ~linear
    "x81_modality_coverage",
    // per-doc self-join: Σ_doc v² with v the per-doc distinct-token
    // count — linear in docs at fixed doc length
    "x82_pmi_pairs",
    // two map-side-combined aggregations to the count DISTRIBUTION —
    // expect ~linear
    "x83_key_skew",
    // one-shuffle source rollups + the distinct-length distribution —
    // expect ~linear
    "x84_data_card",
    // edge list rides x04's banded-LSH bound; each iteration is one
    // edge-sized shuffle — expect the x04 curve × iters
    "x85_pair_centrality",
    // x85's graph work + the x23 components funnel on the same pairs —
    // rides both bounds
    "x86_centrality_keepers",
    // narrow gate + one O(sources) rollup — expect ~linear
    "x87_quality_funnel",
    // three appendDay merges + a store-only derivation — merge I/O is
    // per-day, derivation reads subtotals; expect ~linear in day size
    "x88_card_store",
    // fusion itself is O(queries × k × lists); the curve measures its
    // two retriever inputs (BM25 pruned postings + dense N×|Q| with
    // fixed |Q|=3) — expect ~linear
    "x89_rrf_fusion",
    // one map-side-combined groupBy to O(QI combos) rows — expect
    // ~linear scan cost
    "x90_kanonymity",
    // SCD2 build = one window shuffle on the user key; probe adds the
    // union+window asof pass on the same key — expect ~linear
    "x91_scd2_history", "x92_scd2_probe",
    // hash-derived model: narrow map + one groupBy on the doc id —
    // expect ~linear
    "x93_quality_model",
    // funnel: stage joins run on reached-user sets after one user
    // shuffle; cohorts: distinct user-weeks then window — expect ~linear
    "x94_event_funnel", "x95_retention_cohorts",
    // CM cells are a bounded d×w groupBy (map-side combined); probe set
    // fixed at top-20 — expect ~linear scan with flat sketch state
    "x96_countmin",
    // x93's scoring pass + the O(distinct scores) distribution window —
    // expect ~linear
    "x97_curriculum_phases",
    // two bounded-cell sketch builds + an O(distinct keys) exact check —
    // expect ~linear
    "x98_joinsize_estimate",
    // one user-keyed union+window asof pass — expect ~linear
    "x99_attribution",
    // corpus collapses to the vocab once; staging widens the vocab
    // ~linearly with replicas (per-replica word suffixes), so the two
    // merge rounds' pair counts grow with distinct words, not corpus
    // rows — expect ~linear in vocab
    "x100_bpe_merges",
    // three commits + three snapshot reads — commit I/O linear in rows,
    // snapshot reads O(live commits) metadata + data scans
    "x101_time_travel",
    // rides x05's inverted-index bound (same shingleIntersections core)
    "x102_containment_pairs",
    // rides x04's banded-LSH pair bound; the census itself is two joins
    // on the ORIENTED edge list (out-degree bounded by sqrt(m))
    "x103_triangle_stats",
    // x100's vocab passes + one more explode over the encoded vocab
    "x104_bpe_encode",
    // token stream joins the broadcast encoded vocab + one id groupBy —
    // expect ~linear
    "x105_bpe_tokenize",
    // one map-side-combined groupBy to the hot-key set — expect ~linear
    "x106_shuffle_plan",
    // noise is a narrow map over O(groups) aggregates — expect ~linear
    // scan cost
    "x107_dp_histogram",
    // bigram model tables + a (w1,w2)-co-keyed score join — the c2
    // table grows with distinct bigrams (staging widens vocab), the
    // score join with corpus rows — expect ~linear
    "x108_kn_score",
    // one corpus groupBy to O(cells); raking passes are cell-local —
    // expect ~linear scan cost
    "x109_ipf_raking",
    // x08's session window + x94's per-stage slices on the composite
    // key — expect ~linear
    "x110_session_funnel",
    // streaming aggregation with BOUNDED d×w sketch state — per-batch
    // cost tracks batch size; expect ~linear with the replay floor
    "x111_stream_countmin",
    // x61's one-groupBy plan + integer shard division — expect ~linear
    "x112_build_manifest",
    // x93's scoring pass + the distribution window + an O(sources×10)
    // rollup — expect ~linear
    "x113_score_calibration",
    // four day-appends (one replayed) of <= d x w subtotal rows each +
    // a store-read probe — per-day pass is linear, commit I/O flat
    "x114_cm_store",
    // distribution-level quantile + clip passes — expect ~linear scan
    "x115_winsorized_stats",
    // x113's decile machinery + a 10-row cumsum — expect ~linear
    "x116_quality_budget")

  /** Round-9 operators: store lifecycle (8 day-appends of bounded d×w
    * subtotals + compact + vacuum — per-day pass linear, compaction one
    * O(live rows) rewrite, read cost flat in day count after compaction)
    * and the plan-driven salted join (one O(distinct keys) plan pass +
    * the (key, salt) join — expect ~linear; the hot key's reducer is
    * salt-split by construction).
    */
  val R9Family: Seq[String] = Seq(
    "x117_store_lifecycle", "x118_salted_hot_join",
    // one window-fingerprint groupBy + a per-doc lag sweep — expect
    // ~linear in tokens (dup-window volume rides the corpus's repeat
    // structure, which staging replicates per replica)
    "x119_sliding_dup",
    // encode is a narrow broadcast-join pass (m rows/vector); ADC is
    // O(N·m·|Q|) with FIXED |Q|=8 — expect ~linear
    "x120_pq_ann",
    // distinct (source, shingle-md5) pass + per-fingerprint pair join
    // bounded by sources² — expect ~linear in distinct shingles
    "x121_contamination",
    // bounded 4× explode + one map-side-combined shuffle — expect
    // ~linear
    "x122_hopping_window",
    // 4 day-appends of O(buckets) subtotal rows + an O(buckets) read —
    // commit-I/O floor like x114, expect near-flat growth
    "x123_hist_store",
    // bucket equi-join + exact re-check; intervals fixed at 50 users'
    // horizons, points grow with rows — expect ~linear in events
    "x124_range_join",
    // session intervals capped at users < 100 on BOTH sides — pair
    // volume bounded by the user-pair count; the staging replicates
    // events per replica, so sessions (and overlap counts) grow with
    // rows but the candidate join stays bucket-pruned
    "x125_session_overlap",
    // native streaming hopping agg — state O(active windows × types);
    // per-batch cost tracks batch size plus the replay floor
    "x126_stream_hopping",
    // one (user, group) window rank + O(groups) noise map — ~linear
    "x127_dp_bounded",
    // probe is |Q| × centroids with |Q|=8 fixed; ADC scores only probed
    // buckets' codes — expect ~linear in corpus (assignment pass)
    "x128_ivf_pq",
    // build + 2 appends + 2 probes: encode passes are linear, probes
    // scan only probed partitions; commit I/O floors the 1× side
    "x129_vector_store",
    // one aggregation pass for 4 checks + one anti-join — ~linear scan
    "x130_expectations",
    // rides x04's pair bound + x23's components + one groupBy — the
    // leakage require adds one more pair-sized join
    "x131_cluster_split")

  /** Round-9 second wave (x132–x137). */
  val R9bFamily: Seq[String] = Seq(
    // per-lang bigram tables grow with distinct bigrams (staging widens
    // vocab ~10×), score join with corpus rows; the bucket window runs
    // on the O(distinct scores) distribution — expect ~linear
    "x132_ppl_buckets",
    // corpus probes the benchmark band index — O(corpus × bands) probe
    // + cross-pair verify; staging keeps near-dups within replicas so
    // pairs grow ~10× — expect ~linear
    "x133_fuzzy_decontam",
    // one equi-join on the block key; staged names follow shifted keys,
    // so blocks keep their size and pair volume grows with rows —
    // expect ~linear
    "x134_blocked_er",
    // one 1-row bounds aggregate + a narrow split map + a user-keyed
    // cold-start join — expect ~linear
    "x135_embargo_split",
    // three map-side-combined cell groupBys to O(distinct pairs) +
    // O(cells) rollups — expect ~linear scan cost
    "x136_fd_profile",
    // build encode linear; 3 micro-batch appends of 10× rows each;
    // probe scans only probed partitions — commit I/O floors the 1×
    // side, expect sub-linear
    "x137_stream_vecstore")

  /** Round-9 third wave (x138–x142). */
  val R9cFamily: Seq[String] = Seq(
    // one map-side-combined groupBy collapses to ≤ groups × 256
    // registers; the estimate runs on register rows — expect ~linear
    // scan cost
    "x138_hll_distinct",
    // ONE aggregation pass (multi-distinct Expand ×4) + a 1-row stack —
    // expect ~linear
    "x139_column_profile",
    // x04's pair bound + x23's contraction + the salted top-k — pair
    // volume grows ~10× with staged near-dups
    "x140_dedup_weighted",
    // one user-shuffle session window + lead windows on the same
    // partitioning + an O(|types|^3) rollup — expect ~linear
    "x141_session_paths",
    // 3 micro-batch JS passes, each O(ref + batch) with the replay
    // floor; result store commits are O(days × types) — expect ~linear
    "x142_stream_drift",
    // 4 day-appends of ≤ groups × 256 register rows + an O(store) read
    // — commit-I/O floor like x114/x123, expect sub-linear
    "x143_hll_store",
    // brute-force side is |Q|=8 × corpus (the audit's deliberate cost);
    // IVF side is the x11 shape — expect ~linear
    "x144_ann_recall",
    // candidates are |Q| × probed buckets; ADC + exact rerank both run
    // on that bounded set — expect ~linear in the assignment pass
    "x145_pq_distortion",
    // native streaming agg with state ≤ groups × 256 registers forever;
    // per-batch cost tracks batch size plus the replay floor
    "x146_stream_hll",
    // pair generation dominates (the x04 bound); the store cycle adds
    // O(affected members) component passes + 3 commits — expect the
    // pair curve plus a commit floor
    "x147_cluster_store")

  /** Round-11 curve set: the two r10 pieces whose implementations
    * changed AFTER their last measured curves, plus the r11 additions.
    */
  val R11Family: Seq[String] = Seq(
    // RE-MEASURE (fused rewrite): all candidate pairs in ONE scan via
    // grouping sets — the sf0.1 absolute lost to the old 3-scan shape,
    // and this curve measures the bet that scan-count independence
    // wins as the input grows — expect ~linear with a better constant
    // at 10× than the 1× comparison suggests
    "x136_fd_profile",
    // RE-MEASURE (twin index): the id-bucketed lookup made every append
    // step O(affected); the curve now carries the third merge commit —
    // expect the pair curve plus the commit floor
    "x147_cluster_store",
    // 4 day-appends of (groups × k)-row min-arrays + an O(days) read —
    // commit floor like x143, expect sub-linear
    "x148_kmv_store",
    // two Lloyd passes over the exploded subvector table (broadcast
    // codebook, map-side-combined argmin) + two distortion passes —
    // expect ~linear
    "x149_pq_trained",
    // law measurement is |Q|=8 brute force × corpus + an O(centroids)
    // histogram; the probe scans probed partitions only — expect
    // ~linear from the measurement pass
    "x150_auto_probe",
    // one count pass per day-batch to the O(types × V × 2) grid, then
    // row-count-independent; micro-batch + commit floors dominate —
    // expect sub-linear
    "x154_stream_ks",
    // pair generation dominates (x147's bound) split over 3 streamed
    // batches; per-batch O(affected + batch pairs) + the commit floor
    // tripled — expect the x147 shape
    "x155_stream_cluster",
    // 3 day-appends tokenize the day's docs only (3 keyed merges each);
    // the probe reads the query vocab's buckets + matched ids' buckets
    // — expect ~linear from the append tokenization, probe flat-ish
    "x156_index_store",
    // build dominates (full-corpus encode); forget itself is O(doomed
    // buckets + their centroid partitions) — expect the build curve
    "x157_vector_forget",
    // one token pass + (class, term) count; scoring rides the distinct
    // class-term table — expect ~linear from tokenization
    "x158_cluster_labels",
    // x156 through the streaming door: per-batch tokenization linear,
    // 9 commits + micro-batch floor fixed — expect the x156 shape
    // plus the scheduling floor
    "x159_stream_index",
    // 4 hist appends (count pass each) + the O(cells) KS matrix —
    // day-pair work is cell-count-bound, expect sub-linear
    "x160_store_drift",
    // day-keyed subtotal merges against a fixed commit floor; the
    // growing part is each batch's count pass — expect sub-linear
    "x161_stream_hist",
    // per-batch (group, salt) k-least pass over 10× bigrams against
    // the commit + scheduling floor — expect the x148 shape
    "x162_stream_kmv",
    // refresh is one column-pruned scan; the skipped read touches the
    // qualifying partitions only — expect ~linear from the write+
    // refresh, read share shrinking
    "x163_zone_skip",
    // refresh adds the ×K explode + (partition, word) shuffle over the
    // write; the probed read opens ONE lang partition at every SF —
    // expect ~linear from write+refresh, read share shrinking faster
    // than x163's
    "x164_bloom_skip",
    // the mergeAppend is O(index + batch) against the two-commit write
    // and one full refresh — expect the x164 shape plus the second
    // commit's floor
    "x165_bloom_maintained",
    // min/max widen is O(partitions) against the same two-commit
    // write + refresh — expect the x165 shape minus the ×K explode
    "x166_zone_maintained",
    // per-batch merge rewrites the day's touched partitions + two
    // O(index + batch) folds, against the micro-batch + commit floor —
    // expect the x165/x166 shape plus the scheduling floor
    "x167_stream_skip",
    // write + three refreshes are the linear term; the composite read
    // intersects O(partitions) routing sets and opens the surviving
    // cells only — expect ~linear, read share shrinking
    "x168_composite_skip",
    // the x168 shape with the three refreshes merged into two jobs —
    // expect ~linear with a smaller refresh constant than x168's
    "x169_refresh_all",
    // the x164 shape with a 3-key probe: one local hash job regardless
    // of key count, the read opens the ≤3 matching partitions —
    // expect ~linear from write+refresh, read flat
    "x170_bloom_in")

  /** Round-11 second half: the forget matrix, token/attr-filtered
    * probes, the deterministic heavy-hitter store, and the maintained
    * join/aggregate views.
    */
  val R11bFamily: Seq[String] = Seq(
    // build dominates (two store writes over the corpus); the forget
    // itself is keyed deletes over the doomed ids' buckets — expect
    // the build's ~linear curve, forget share shrinking
    "x171_dedup_forget",
    // 3 day-append tokenizations are the linear term; the forget
    // tokenizes only the doomed slice and rewrites its buckets; stats
    // correction is O(days) — expect the x156 shape
    "x172_index_forget",
    // pair generation + the build's component pass dominate; the
    // forget is O(doomed + affected members) twin-routed — expect the
    // x147 shape without the append's third commit
    "x173_cluster_forget",
    // token-bloom refresh is one scan + a (partition, word) shuffle
    // bounded by partitions × m/64; the probed read opens the
    // qualifying partitions only — expect ~linear from write+refresh,
    // read share shrinking as pruning deepens (162/256 at sf0.1)
    "x174_token_skip",
    // build (encode + attrs write) dominates; the filtered probe adds
    // one pruned attrs read + a candidate semi-join to the ADC pass —
    // expect the x129-build curve
    "x175_filtered_ann",
    // per day: one count pass (map-side combined) + an O(distinct)
    // salted top-m; the read is O(days × m) — expect ~linear from the
    // count passes, read flat
    "x176_hh_store",
    // x176 through the streaming door: the same count passes against
    // the micro-batch + commit floor — expect sub-linear
    "x177_stream_hh",
    // each cycle merges the day and joins it against the other base's
    // touched buckets; the view merge rewrites touched buckets — the
    // incremental bet: expect ~linear in TOTAL data (the per-cycle
    // cost is Δ-sized, the 10× run does 10× the Δ work over 3 cycles)
    "x178_view_store",
    // x178's cycles + the trueNew anti-join and an O(groups) subtotal
    // merge per day; the agg read is O(days × groups) — expect the
    // x178 shape
    "x179_agg_view",
    // both store builds dominate (BM25 day-append + IVF/PQ encode);
    // the two probes are pruned and the fusion is O(queries × 40) —
    // expect the builds' ~linear curve
    "x180_hybrid_store",
    // x179's cycles + a forget that prunes to the doomed buckets —
    // expect the x179 shape, forget share shrinking
    "x181_view_forget")

  val R11cFamily: Seq[String] = Seq(
    // one bigram pass builds the sketches; the pair algebra is
    // O(sources² × k) — expect the token pass's ~linear curve, pair
    // stage flat
    "x182_kmv_overlap",
    // one key shuffle + in-partition sort merge, same class as x08 —
    // expect ~linear
    "x183_session_window",
    // x183 through the streaming door: complete-mode session state +
    // micro-batch floor — expect sub-linear (floor amortizes)
    "x184_stream_sessionwin",
    // one rollup pass is the linear term; spine/join/fill live on the
    // O(types × hours) grid, which does NOT grow with replicas (same
    // time range) — expect near-flat past the rollup
    "x185_resample_fill",
    // LSH pair generation dominates (the x04 shape); peel rounds are
    // O(E_core) each on a pair set tracking true-dup volume
    "x186_kcore",
    // two BM25 rounds + a feedback-scaled term selection — expect ~2×
    // the x69 curve, still linear
    "x187_prf_expand",
    // 3 day appends, each O(affected keys' history + day) + bucket
    // commit I/O — per-day work is Δ-sized; expect ~linear in total
    // feed with the commit floor shrinking in share
    "x188_scd2_store",
    // x188 through the streaming door — expect the x188 shape + the
    // micro-batch floor
    "x189_stream_scd2")

  val R11dFamily: Seq[String] = Seq(
    // whole-key + change-level erasure over the x188 store: locate is
    // bucket-pruned, rebuild is affected-key-sized — expect the x188
    // append curve to dominate (the forgets are Δ-sized)
    "x190_scd2_forget",
    // decode stub + ladder snap are one narrow map; packing is one
    // per-bucket cumsum window — expect ~linear with a shrinking
    // window share (buckets grow, per-bucket rows grow ~linearly)
    "x191_aspect_batches",
    // 3 day folds of the bigram sketch + an O(sources² × k) pair
    // algebra read — expect the x182 token-pass curve, read flat
    "x192_kmv_overlap_store",
    // LSH pair generation dominates (x04's shape); 3 seeded rounds are
    // one edge shuffle each on the pair graph — expect the x04 curve
    "x193_ppr_expand",
    // one map-side-combined (group, value) count, then everything
    // lives on the O(groups × distinct lengths) distribution — expect
    // ~linear count pass, flat selection
    "x194_dp_quantile",
    // per-day salted top-(k+slack) + O(k) commit I/O; the merged read
    // and the forget touch O(days × k) rows — expect ~linear from the
    // per-day priority passes, store ops flat
    "x195_sample_store",
    // x195 through the streaming door — expect the x195 shape + the
    // micro-batch floor amortizing
    "x196_stream_sample",
    // centering + 3 iterations are each one bounded pass over the
    // exploded (id, pos, c) table — expect ~linear, the O(dim)
    // driver collect flat
    "x197_dominant_proj",
    // ONE grouping-sets scan to O(Σ distinct pairs) cells; MI/H run on
    // cells — expect ~linear scan, cell stage flat
    "x198_mi_profile",
    // each day fans rows to dim(dim+1)/2 products, map-side combined
    // to O(dim²) cells — expect ~linear fan-out cost; the corpus-free
    // direction read is flat by construction
    "x199_moment_store",
    // x199 through the streaming door — expect the x199 shape + the
    // micro-batch floor
    "x200_stream_moments",
    // learn is Heaps-bounded (vocab-local); tokenize is one corpus
    // token pass + a vocab-sized nested-replace projection + the
    // join-back — expect ~linear from the token passes
    "x201_bpe_tokenize",
    // 3 day token passes + O(day vocab) commits; the corpus-free learn
    // reads O(vocab × days) — expect ~linear passes, learn flat-ish
    "x202_vocab_store",
    // x202 through the streaming door — expect the x202 shape + the
    // micro-batch floor
    "x203_stream_vocab",
    // one (group, word) count + a top-K window over the O(vocab)
    // table; the fit is O(groups × K) — expect ~linear count pass
    "x204_zipf_fit",
    // 3 day fan-outs are the linear term; the forget passes only the
    // DOOMED rows and the direction read is corpus-free — expect the
    // x199 shape with the forget share tracking doomed volume
    "x205_moment_forget",
    // 3 grouped day token passes are the linear term; the fit reads
    // O(vocab) store state — expect the x202 shape
    "x206_zipf_from_store",
    // 3 day bigram passes + the corpus-wide scoring join — expect
    // ~linear from both, with the store commits flat
    "x207_lm_store",
    // x207 through the streaming door — expect the x207 shape + the
    // micro-batch floor
    "x208_stream_lm",
    // both rankings are query-sample-scaled (the x144 shape): the
    // brute-force pass over the fixed sample is the only corpus term
    "x209_ndcg_audit",
    // 6 day token passes are the linear term; the growth curve and
    // fit are O(vocab)+O(days) — expect the x202 Heaps flattening
    "x210_heaps_fit",
    // x205 through the streaming door: appends linear, the erasure
    // folds pass only the doomed slice — expect the x205 shape + the
    // micro-batch floor
    "x211_stream_forget",
    // x195 per stratum: per-day salted per-group top-(k+slack) passes
    // are Δ-sized; store ops O(langs × days × k) — expect the x195
    // near-flat shape
    "x212_strat_sample",
    // vocab-store folds + Heaps-bounded learn + one corpus tokenize
    // pass — expect the x202/x201 flattening
    "x213_tokenizer_cycle",
    // 2 day fan-outs + one narrow projection pass over the held-out
    // half — expect the x199 shape plus a linear scoring term
    "x214_spectral_score")

  /** Round-12 operators: the two store-repair ops, the composed
    * erasure, and the perceptual near-dup. The repair/erasure gates run
    * over PROTOTYPE store clones (the r12 fixture diet), so their
    * curves measure clone + forget/repair + serve — the builds' growth
    * is the store gates' own rows.
    */
  val R12Family: Seq[String] = Seq(
    // index self-probe (the x04 banded bound) + one component pass +
    // two partitioned overwrites — expect the x04 curve + commit floors
    "x215_cluster_rebuild",
    // clone + divergent forget + ONE postings-vs-lens anti-join + two
    // probes — expect ~linear from the index-sized anti-join
    "x216_index_repair",
    // 8 prototype clones + 8 keyed forgets + 12 audit probes + 9
    // serving folds — commit floors and clone I/O dominate; the forgets
    // are doomed-sized — expect low-multiple growth
    "x217_composed_erasure",
    // one mapPartitions dHash pass + the pigeonhole equi-join + exact
    // popcount verify — expect ~linear (pair volume is twin-sized by
    // fixture construction)
    "x218_perceptual_dedup",
    // x218 as a store lifecycle: 3 keyed merges (hash once per batch) +
    // the bucket-pruned twins probe — merge I/O linear in batch rows,
    // probe O(increment bands + collisions) — expect ~linear
    "x219_media_store",
    // all-docs build + doomed-sized keyed delete ×2 + survivors probe —
    // the build's linear pass dominates
    "x220_media_forget",
    // 3 suite/registry merges + retire + ONE broadcast-join corpus
    // probe (x31's plan from the store) — expect x31's ~linear curve +
    // commit floors
    "x222_bench_registry",
    // same registry staging + the per-(doc, suite) attribution rollup
    "x223_suite_attribution",
    // clone + O(index) lens rebadge + one-partition stats replacement +
    // doomed-sized forgets + the pruned probe — the rebadge's index
    // scan is the linear term (the periodic-job shape, like x216)
    "x224_stats_compaction",
    // 3 day folds + forget + two O(dim²) compactions + the corpus-free
    // direction read — the day folds' corpus pass is the linear term,
    // everything after is dim-sized
    "x225_moments_compaction",
    // 3 register-table day folds + one O(groups × 2^p) max fold + the
    // estimate read — the day folds' value hashing is the linear term
    "x226_hll_compaction",
    // all-docs build + the narrow id locate scan ×2 + bucket-pruned
    // rewrites + survivors probe — build + locate are the linear terms
    "x227_media_forget_by_id",
    // store build + divergent forget + fp locate scans + probes — the
    // build and the x65-shaped probe are the linear terms
    "x228_dedup_forget_by_id",
    // 3 bigram-sketch day folds + one O(groups × k) set fold + the
    // estimate read — the bigram explode is the linear term
    "x229_kmv_compaction",
    // x89's two retrievers (pruned postings + dense N×|Q|) + the
    // candidate-pruned text join + one O(queries × k) scoring pass —
    // the retrievers are the linear terms, the rerank corpus-free
    "x230_rerank",
    // registry staging + the bloom build (registry-sized) + ONE narrow
    // corpus posting pass + the FP-killing verify join — x55's curve
    // shape fed from the store
    "x231_registry_bloom")

  /** Round-13 gates: the epoch-compaction rollout (each = its parent
    * store's day-fold passes + one-to-two group folds over
    * metadata-sized tables + the parent's read — the day appends'
    * corpus passes are the linear terms, the folds are bounded by
    * distinct cells/words/groups), the hh refusal (build + two
    * metadata-sized refusal probes + the TA/TPUT read), and the
    * registry-fed streaming funnel (3 micro-batch probes, each x31's
    * broadcast-join plan over a day's increment + a keyed merge —
    * per-batch cost tracks batch size).
    */
  val R13Family: Seq[String] = Seq(
    "x232_cm_compaction", "x233_hist_compaction", "x234_vocab_compaction",
    "x235_lm_compaction", "x236_card_compaction", "x237_view_compaction",
    "x238_sample_compaction", "x239_hh_no_fold", "x240_stream_registry",
    "x241_hh_retention")

  /** Round-14 gates: the ingest capstone (eleven parallel store folds
    * per micro-batch — the day appends' corpus passes are the linear
    * terms, every fold/probe bounded by increment or metadata size),
    * the two count-store forgets (one doomed-docs pass + O(their
    * vocabulary) commit + the survivors-model read), and the vector
    * rebuild (the PERIODIC job: retrain + re-encode is corpus-sized by
    * design — the serving probe stays pruned).
    */
  val R14Family: Seq[String] = Seq(
    "x242_ingest_capstone", "x243_lm_forget", "x244_vocab_forget",
    "x245_vector_rebuild")

  /** Round-15 forget-matrix completion: the two linear-sketch forgets
    * and the card forget are doomed-slice-sized correction passes over
    * store clones (expect flat-to-linear in the doomed mass), the hh
    * forget re-summarizes each affected day (expect ~linear — the one
    * honest corpus-day term), and x217 re-curves with its four new
    * families aboard.
    */
  val R15Family: Seq[String] = Seq(
    "x246_cm_forget", "x247_hist_forget", "x248_card_forget",
    "x249_hh_forget", "x217_composed_erasure")

  private val IdOffset = 100000000L // > any generator id; multiple of 50

  def stage(spark: SparkSession, baseDir: String, outDir: String, reps: Int): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    (0 until reps).map { i =>
      val text =
        if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + s"z$i")
      docs.select(
        (col("doc_id") + lit(i * IdOffset)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // Replica i applies a deterministic SIGNED PERMUTATION of dimensions:
    // an orthogonal transform, so every cosine WITHIN the replica is
    // preserved exactly, while ACROSS replicas the dominant dimensions of
    // cluster-structured vectors land on unrelated dimensions with random
    // signs — cross-replica cosines collapse to noise. (Cyclic rotation
    // kept cross-replica correlation; sign flips alone leave a dominant
    // dimension aligned with probability ½.) The staged corpus thus has
    // 10× the vectors and ~10× the near-dup pairs, like a real corpus.
    val embs = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    (0 until reps).map { i =>
      val e = col("embedding")
      val mixed = if (i == 0) e else {
        val rnd = new scala.util.Random(0xC0FFEEL + i)
        val perm = rnd.shuffle((0 until dim).toVector)
        val signs = Vector.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        array((0 until dim).map(k =>
          (element_at(e, perm(k) + 1) * lit(signs(k))).cast("float")): _*)
      }
      embs.select(
        (col("vec_id") + lit(i * IdOffset)).as("vec_id"),
        mixed.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // relational core: fact keys shift per replica so joins/sessions
    // replicate linearly (each replica is a self-contained sub-corpus);
    // dims copy unchanged — at N× the facts the dim tables stay dims
    def rep(table: String, keyCols: Seq[String]): Unit = {
      val src = spark.read.parquet(s"$baseDir/$table.parquet")
      (0 until reps).map { i =>
        keyCols.foldLeft(src)((d, k) => d.withColumn(k, col(k) + lit(i * IdOffset)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey"))
    rep("events", Seq("user_id"))
    // customer: names follow the shifted keys (replica 0 reproduces the
    // generator's Customer#%09d format exactly) — each replica is a
    // self-contained sub-corpus of NEW entities; leaving 10 identical
    // copies of every name would inflate x134's name-prefix blocks 10×
    // (quadratic pair volume), which is a staging artifact, not growth
    val cust = spark.read.parquet(s"$baseDir/customer.parquet")
    (0 until reps).map { i =>
      cust.withColumn("c_custkey", col("c_custkey") + lit(i * IdOffset))
    }.reduce(_ unionByName _)
      .withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    for (dim <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$baseDir/$dim.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$dim.parquet")
  }

  /** Min-of-2 per dir, with the 1× and N× passes INTERLEAVED
    * (1×, N×, 1×, N×): a transient external load spike that lands on one
    * contiguous block would otherwise inflate exactly one side of the
    * growth ratio (observed: a spike during a sequential 1× block drove
    * ratios below 1). Interleaving gives both sides one shot at each load
    * regime, and min-of-2 then discards the loaded pass.
    */
  private def time(
      spark: SparkSession, d1: String, dN: String,
      family: Seq[String]): (Map[String, Double], Map[String, Double]) = {
    def pass(dir: String): Map[String, Double] = family.map { name =>
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, dir).count(); true }
      catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
    }.toMap
    def minOf(a: Map[String, Double], b: Map[String, Double]) =
      a.map { case (k, v) =>
        val ts = Seq(v, b(k)).filterNot(_.isNaN)
        k -> (if (ts.isEmpty) -1.0 else ts.min)
      }
    val (a1, aN, b1, bN) = (pass(d1), pass(dN), pass(d1), pass(dN))
    (minOf(a1, b1), minOf(aN, bN))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // same local-FS I/O regime as Bench (see the comment there) — scale
      // curves must measure the engine, not local .crc sidecar churn
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Scratch.path("scalebench")
    val (d1, dN) = (s"$root/x1", s"$root/x$reps")
    // SPARK_GRAFT_FAMILIES=r8_scale,srp_auto_scale restricts the run (and its
    // warm-up) to the named reports — the full sweep is hours on a loaded
    // box, and a round usually only needs curves for its new family
    val famSel = sys.env.get("SPARK_GRAFT_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(metric: String) = famSel.forall(_.contains(metric))
    // SPARK_GRAFT_SCALE_ONLY=x85_...,x86_... further restricts entries
    // WITHIN the selected families (curve-refresh for a family's new
    // members without re-timing the recorded ones)
    val entrySel = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wantEntry(name: String) = entrySel.forall(_.contains(name))
    val selected = Seq(
      "dedup_scale" -> Family, "core_scale" -> CoreFamily,
      "stream_scale" -> StreamFamily, "r6_scale" -> R6Family,
      "r7_scale" -> R7Family, "r8_scale" -> R8Family,
      "r9_scale" -> R9Family, "r9b_scale" -> R9bFamily,
      "r9c_scale" -> R9cFamily, "r11_scale" -> R11Family,
      "r11b_scale" -> R11bFamily, "r11c_scale" -> R11cFamily,
      "r11d_scale" -> R11dFamily, "r12_scale" -> R12Family,
      "r13_scale" -> R13Family, "r14_scale" -> R14Family,
      "r15_scale" -> R15Family)
      .filter(kv => want(kv._1))
      .map { case (m, fam) => m -> fam.filter(wantEntry) }
      .filter(_._2.nonEmpty)
    // SPARK_GRAFT_SKIP_STAGE=1 reuses already-staged replica dirs (a
    // follow-up measurement on the same corpus must not pay the ~10 min
    // 100× staging twice)
    if (sys.env.get("SPARK_GRAFT_SKIP_STAGE").isEmpty) {
      stage(spark, baseDir, d1, 1)
      stage(spark, baseDir, dN, reps)
    }
    // JIT/codegen warm-up on the small SF, as Bench does
    selected.flatMap(_._2).distinct.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def report(metric: String, family: Seq[String]): Unit = {
      val (t1, tN) = time(spark, d1, dN, family)
      val ratio = family.map { n =>
        val r = if (t1(n) > 0 && tN(n) > 0) tN(n) / t1(n) else -1.0
        s"\"" + n + "\":" + f"$r%.2f"
      }.mkString("{", ",", "}")
      println(s"""{"metric":"$metric","reps":$reps,"unit":"sec","base":"$baseDir","x1":${js(t1)},"x$reps":${js(tN)},"growth":$ratio}""")
    }
    selected.foreach { case (metric, fam) => report(metric, fam) }
    // SRP with production bit sizing (the x62 GATE pins 6 bits to match
    // its oracle; this entry measures the operator as actually deployed —
    // bits grow with log₂ N, so candidate volume stays O(N))
    def srpAuto(dir: String): Double = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val bits = graft.ext.Similarity.srpAutoBits(emb.count())
      val t0 = System.nanoTime()
      graft.ext.Similarity.srpNearDupPairs(emb, "vec_id", "embedding", 8, bits).count()
      (System.nanoTime() - t0) / 1e9
    }
    if (want("srp_auto_scale")) {
      srpAuto(d1) // warm
      val (s1a, sNa, s1b, sNb) = (srpAuto(d1), srpAuto(dN), srpAuto(d1), srpAuto(dN))
      val (s1, sN) = (math.min(s1a, s1b), math.min(sNa, sNb))
      println(f"""{"metric":"srp_auto_scale","reps":$reps,"unit":"sec","x1":$s1%.3f,"x$reps":$sN%.3f,"growth":${sN / s1}%.2f}""")
    }
    // IVF nprobe sizing law (ivfAutoNprobe): the measured recall-vs-
    // nprobe CDF on the x11/x144 fixture shape (centroids = vec_id % 50,
    // queries = vec_id < 8), reported as the nprobe needed for 0.5 /
    // 0.9 recall@10 at each scale — how probe budgets move as the
    // corpus (and its bucket occupancy) grows 10×
    def nprobeLaw(dir: String): (Int, Int, Int, Double) = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cents = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0)
      val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      val t0 = System.nanoTime()
      val n50 = graft.ext.Similarity.ivfAutoNprobe(emb, cents, qs, "vec_id", "embedding", 10, 0.5)
      val n90 = graft.ext.Similarity.ivfAutoNprobe(emb, cents, qs, "vec_id", "embedding", 10, 0.9)
      (n50, n90, cents.count().toInt, (System.nanoTime() - t0) / 1e9)
    }
    if (want("ivf_nprobe_scale")) {
      nprobeLaw(d1) // warm
      val (a50, a90, ac, at) = nprobeLaw(d1)
      val (b50, b90, bc, bt) = nprobeLaw(dN)
      println(f"""{"metric":"ivf_nprobe_scale","reps":$reps,"unit":"nprobe","x1":{"n50":$a50,"n90":$a90,"centroids":$ac,"sec":$at%.3f},"x$reps":{"n50":$b50,"n90":$b90,"centroids":$bc,"sec":$bt%.3f}}""")
    }
    // The vector-store LIFECYCLE decomposed (x150's 100× follow-up): the
    // gate times build + law + probe TOGETHER, and on this fixture the
    // centroid count grows with the corpus (vec_id % 50 → C = N/50), so
    // the build's exact nearest-centroid assign is O(N·C) = N²/50 —
    // quadratic BY FIXTURE CONSTRUCTION, the x67 "N×k law". The
    // production question is which stages carry that law: build and law
    // re-measure are the PERIODIC jobs (run on the rebuild/drift
    // cadence, C chosen ≪ N in deployment); the PROBE is the per-query
    // serving path and must stay ~flat. This entry times the three
    // stages separately (min of 2 cycles per dir; probeAuto resolves
    // nprobe from the just-written law at 0.9 recall).
    if (want("vec_lifecycle_scale")) {
      import graft.ext.VectorStore
      def cycle(dir: String, tag: String): (Double, Double, Double) = {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val cents = emb.filter(col("vec_id") % 50 === 0)
        val qs = emb.filter(col("vec_id") < 8)
        val fsRoot = s"$root/veccycle_$tag"
        val fs = new org.apache.hadoop.fs.Path(fsRoot)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(fsRoot), true)
        val t0 = System.nanoTime()
        VectorStore.build(spark, emb, cents, "vec_id", "embedding", fsRoot,
          dim = 64, m = 4, k = 16, stride = 3)
        val t1 = System.nanoTime()
        VectorStore.writeNprobeLaw(spark, emb, qs, "vec_id", "embedding",
          fsRoot, k = 10)
        val t2 = System.nanoTime()
        VectorStore.probeAuto(spark, qs, "vec_id", "embedding", fsRoot,
          dim = 64, m = 4, k = 16, stride = 3, targetRecall = 0.9,
          topK = 10).count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def minCycle(dir: String, tag: String): (Double, Double, Double) = {
        val (a, b) = (cycle(dir, tag), cycle(dir, tag))
        (math.min(a._1, b._1), math.min(a._2, b._2), math.min(a._3, b._3))
      }
      minCycle(d1, "w") // warm
      val (b1, l1, p1) = minCycle(d1, "1")
      val (bN, lN, pN) = minCycle(dN, "n")
      println(f"""{"metric":"vec_lifecycle_scale","reps":$reps,"unit":"sec","x1":{"build":$b1%.3f,"law":$l1%.3f,"probe":$p1%.3f},"x$reps":{"build":$bN%.3f,"law":$lN%.3f,"probe":$pN%.3f},"growth":{"build":${bN / b1}%.2f,"law":${lN / l1}%.2f,"probe":${pN / p1}%.2f}}""")
    }
    // The PRODUCTION centroid sizing measured (r12 verdict #1): the
    // vec_lifecycle fixture inherits the oracle gates' C = N/50 law
    // (build O(N·C) = N²/50 — quadratic BY FIXTURE CONSTRUCTION), and
    // the stated production posture "size C ≈ √N, serving grows ~√N
    // per decade" was prose with no measurement behind it. This entry
    // IS that measurement: same store, same law write, same probeAuto,
    // but C = N / round(√N) ≈ √N centroids — build O(N^1.5) confined to
    // the periodic job, law O(q·C·k) and probe O(q·(C + nprobe·N/C))
    // expected ~√N per decade. Centroid counts are reported so the
    // curve reads against the sizing it claims.
    // x237 DECOMPOSED (the r13 4.26×-at-10× curve, explained by parts —
    // r13 verdict #5): the GATE's wall is its scaffolding — the 3-day
    // agg-view ingest (corpus-pass day deltas + commit floors) and the
    // forgetA correction — while the FOLD under test is one group-sum
    // over O(groups × days) agg rows (metadata-sized, expected ~flat
    // per decade) and the read one re-sum of the same rows. This entry
    // times the three stages separately so the fold's own curve is a
    // row, not an inference.
    if (want("view_fold_scale")) {
      import graft.ext.ViewStore
      def cycle(dir: String, tag: String): (Double, Double, Double) = {
        val li = spark.read.parquet(s"$dir/lineitem.parquet").select(
          col("l_orderkey").as("okey"), col("l_linenumber"), col("l_quantity"))
        val ord = spark.read.parquet(s"$dir/orders.parquet").select(
          col("o_orderkey").as("okey"), col("o_orderpriority"))
        val fsRoot = s"$root/viewfold_$tag"
        val fs = new org.apache.hadoop.fs.Path(fsRoot)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(fsRoot), true)
        val t0 = System.nanoTime()
        (0 until 3).foreach { d =>
          ViewStore.appendDayAgg(spark, fsRoot,
            li.filter(pmod(col("okey"), lit(3L)) === d.toLong),
            ord.filter(pmod(col("okey") + 1L, lit(3L)) === d.toLong),
            "okey", Seq("okey", "l_linenumber"), Seq("okey"), day = s"d$d",
            groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity"))
        }
        ViewStore.forgetA(spark, fsRoot, li.filter(col("okey") % 11 === 3),
          "okey", Seq("okey", "l_linenumber"), forgetSeq = 1L,
          groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity"))
        val t1 = System.nanoTime()
        ViewStore.compactAgg(spark, fsRoot, Seq("d1", "d2", "__forget_1"),
          "epoch:01", Seq("o_orderpriority"), Seq("l_quantity"))
        val t2 = System.nanoTime()
        ViewStore.readAgg(spark, fsRoot,
          groupCols = Seq("o_orderpriority"), sumCols = Seq("l_quantity")).count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def minCycle(dir: String, tag: String): (Double, Double, Double) = {
        val (a, b) = (cycle(dir, tag), cycle(dir, tag))
        (math.min(a._1, b._1), math.min(a._2, b._2), math.min(a._3, b._3))
      }
      minCycle(d1, "w") // warm
      val (s1, f1, r1) = minCycle(d1, "1")
      val (sN, fN, rN) = minCycle(dN, "n")
      println(f"""{"metric":"view_fold_scale","reps":$reps,"unit":"sec","x1":{"scaffold":$s1%.3f,"fold":$f1%.3f,"read":$r1%.3f},"x$reps":{"scaffold":$sN%.3f,"fold":$fN%.3f,"read":$rN%.3f},"growth":{"scaffold":${sN / s1}%.2f,"fold":${fN / f1}%.2f,"read":${rN / r1}%.2f}}""")
    }
    // x240 DECOMPOSED (its r13 1.92× curve attributed by parts): the
    // registry BUILD is suite-sized (the staged replicas mutate text, so
    // suites grow with the corpus here — at a real deployment the
    // benchmark set is fixed), the PROBE is the per-increment corpus
    // term (x31's broadcast plan — the one stage that must track data),
    // and the FUNNEL adds only streaming scaffolding + keyed merges on
    // top of three such probes.
    if (want("registry_probe_scale")) {
      import graft.ext.BenchRegistry
      def cycle(dir: String, tag: String): (Double, Double, Double) = {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val fsRoot = s"$root/regprobe_$tag"
        val fs = new org.apache.hadoop.fs.Path(fsRoot)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(fsRoot), true)
        val t0 = System.nanoTime()
        BenchRegistry.appendSuite(spark,
          docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", "suiteA", fsRoot)
        BenchRegistry.appendSuite(spark,
          docs.filter(col("doc_id") % 50 === 25), "doc_id", "text", "suiteB", fsRoot)
        BenchRegistry.retireSuite(spark, "suiteB", fsRoot)
        val t1 = System.nanoTime()
        val corpus = docs
          .filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 50 =!= 25)
          .select(col("doc_id"), col("text"))
        BenchRegistry.probe(spark, corpus, "doc_id", "text", fsRoot).count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, 0.0)
      }
      def funnel(dir: String): Double = {
        val t0 = System.nanoTime()
        try SparkEntry.queries("x240_stream_registry")(spark, dir).count()
        catch { case _: Throwable => return Double.NaN }
        (System.nanoTime() - t0) / 1e9
      }
      def minCycle(dir: String, tag: String): (Double, Double, Double) = {
        val (a, b) = (cycle(dir, tag), cycle(dir, tag))
        val f = math.min(funnel(dir), funnel(dir))
        (math.min(a._1, b._1), math.min(a._2, b._2), f)
      }
      minCycle(d1, "w") // warm
      val (b1, p1, f1) = minCycle(d1, "1")
      val (bN, pN, fN) = minCycle(dN, "n")
      // a failed funnel run is Double.NaN — which is NOT valid JSON, so
      // it must surface as null, never be f-interpolated into the line
      def j(v: Double): String =
        if (v.isNaN || v.isInfinite) "null" else f"$v%.3f"
      def jr(n: Double, d: Double): String = {
        val r = n / d
        if (r.isNaN || r.isInfinite) "null" else f"$r%.2f"
      }
      println(s"""{"metric":"registry_probe_scale","reps":$reps,"unit":"sec","x1":{"build":${j(b1)},"probe":${j(p1)},"funnel":${j(f1)}},"x$reps":{"build":${j(bN)},"probe":${j(pN)},"funnel":${j(fN)}},"growth":{"build":${jr(bN, b1)},"probe":${jr(pN, p1)},"funnel":${jr(fN, f1)}}}""")
    }
    // x242 DECOMPOSED per store family (r14 verdict #7): the capstone's
    // aggregate 3.11×-at-10× curve attributed by parts — for each of the
    // thirteen fold streams, the day FOLD (the append, day-sized by
    // contract) and the serving PROBE/read (which must stay increment-
    // or metadata-sized) timed separately via
    // ExtQueries.x242FoldProbeCycle (sequential steps, min of 2 cycles;
    // the nightly-snapshot protos build once per JVM per dir and are the
    // untimed scaffold, exactly as in the gate).
    if (want("capstone_fold_scale")) {
      def cyc(dir: String): Seq[(String, Double, Double)] =
        graft.queries.ExtQueries.x242FoldProbeCycle(spark, dir)
      def minCyc(dir: String): Seq[(String, Double, Double)] = {
        val (a, b) = (cyc(dir), cyc(dir))
        a.zip(b).map { case ((n, f1, p1), (_, f2, p2)) =>
          (n, math.min(f1, f2), math.min(p1, p2)) }
      }
      minCyc(d1) // warm
      val m1 = minCyc(d1)
      val mN = minCyc(dN)
      def j(v: Double): String =
        if (v.isNaN || v.isInfinite) "null" else f"$v%.3f"
      def jr(n: Double, d: Double): String = {
        val r = n / d
        if (r.isNaN || r.isInfinite) "null" else f"$r%.2f"
      }
      def sect(m: Seq[(String, Double, Double)]): String =
        m.map { case (n, f, p) =>
          s""""$n":{"fold":${j(f)},"probe":${j(p)}}""" }.mkString("{", ",", "}")
      val growth = m1.zip(mN).map { case ((n, f1, p1), (_, fN, pN)) =>
        s""""$n":{"fold":${jr(fN, f1)},"probe":${jr(pN, p1)}}""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"capstone_fold_scale","reps":$reps,"unit":"sec","x1":${sect(m1)},"x$reps":${sect(mN)},"growth":$growth}""")
    }
    if (want("vec_sqrt_scale")) {
      import graft.ext.VectorStore
      def cycle(dir: String, tag: String): (Double, Double, Double, Long) = {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = emb.count()
        val stride = math.max(1L, math.round(math.sqrt(n.toDouble)))
        val cents = emb.filter(col("vec_id") % stride === 0)
        val c = cents.count()
        val qs = emb.filter(col("vec_id") < 8)
        val fsRoot = s"$root/vecsqrt_$tag"
        val fs = new org.apache.hadoop.fs.Path(fsRoot)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(fsRoot), true)
        val t0 = System.nanoTime()
        VectorStore.build(spark, emb, cents, "vec_id", "embedding", fsRoot,
          dim = 64, m = 4, k = 16, stride = 3)
        val t1 = System.nanoTime()
        VectorStore.writeNprobeLaw(spark, emb, qs, "vec_id", "embedding",
          fsRoot, k = 10)
        val t2 = System.nanoTime()
        VectorStore.probeAuto(spark, qs, "vec_id", "embedding", fsRoot,
          dim = 64, m = 4, k = 16, stride = 3, targetRecall = 0.9,
          topK = 10).count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, c)
      }
      def minCycle(dir: String, tag: String): (Double, Double, Double, Long) = {
        val (a, b) = (cycle(dir, tag), cycle(dir, tag))
        (math.min(a._1, b._1), math.min(a._2, b._2), math.min(a._3, b._3), a._4)
      }
      minCycle(d1, "w") // warm
      val (b1, l1, p1, c1) = minCycle(d1, "1")
      val (bN, lN, pN, cN) = minCycle(dN, "n")
      println(f"""{"metric":"vec_sqrt_scale","reps":$reps,"unit":"sec","x1":{"centroids":$c1,"build":$b1%.3f,"law":$l1%.3f,"probe":$p1%.3f},"x$reps":{"centroids":$cN,"build":$bN%.3f,"law":$lN%.3f,"probe":$pN%.3f},"growth":{"build":${bN / b1}%.2f,"law":${lN / l1}%.2f,"probe":${pN / p1}%.2f}}""")
    }
    spark.stop()
  }
}

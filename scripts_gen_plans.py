"""Regenerate PLANS.md: formatted physical plans of the headline queries,
with the scale-relevant properties called out. Run: python scripts_gen_plans.py"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fn_rq_report_etl_dev_spark.session import get_spark
from fn_rq_report_etl_dev_spark.workloads import QUERIES
from fn_rq_report_etl_dev_spark.plans.inspect import (
    formatted_plan, has_pushed_filters, uses_broadcast_join, exchange_count)

HEADLINERS = [
    ("flagship_dedup_merge", "dedup window exchange reused by the merge join; WindowGroupLimit top-1 pushdown"),
    ("q1_pricing_summary", "predicate pushdown + 7-column pruning; single agg exchange (map-side partials)"),
    ("q3_shipping_priority", "dimension broadcast; pushed filters on both fact scans"),
    ("q5_local_supplier_volume", "all four dimensions broadcast; one fact-fact shuffle"),
    ("dedup_minhash_lsh", "one pass to signatures; bucket-array pair expansion (no self-join recompute)"),
    ("range_join_ship_week", "non-equi range join bucketized into an equi-join + exact filter"),
    ("dedup_simhash64", "persisted signature agg feeds banding + both verify joins; chunk-capped bucket pairs (no giant collect_list task)"),
    ("pack_token_budget", "sequence packing = one window cumsum per source shard; single exchange, no UDF"),
    ("nation_trade_volume", "role-playing dimensions (nation x2) all broadcast; ONE exchange (final agg)"),
    ("agg_grouping_sets", "4 grouping sets in one Expand + single partial-agg exchange, no scan union"),
    ("ann_rademacher_topk", "L hash tables via posexplode of one bucket-array projection; single (table,bucket) equi-join, then pair-dedup groupBy + per-query window cut"),
    ("text_contamination_ngram", "corpus shingles persisted once; benchmark shingle set distinct-reduced then BROADCAST (eval suites stay small as the corpus grows)"),
    ("large_quantity_orders", "grouped-HAVING subquery as pre-aggregated semi join; prunes orders before the wide join"),
    ("curation_source_cap", "per-domain cap compiles to WindowGroupLimit: cap-sized heap per task, hot domains cost O(n log cap)"),
    ("export_shuffle_shards", "deterministic shuffle export = ONE exchange (repartition-by-shard) + in-shard rank; no global total-order sort"),
    ("dedup_incremental_lsh", "asymmetric new-side x corpus-side band join; the quadratic old-x-old leg never exists in the plan"),
    ("text_unigram_logprob", "token->frequency equi-join keyed by word (Zipf-head skew is AQE-splittable); doc re-agg partial map-side; corpus total broadcast as a scalar"),
    ("q19_disjunctive_revenue", "disjunctive multi-predicate join: the OR-of-ANDs residual stays on a single broadcast join, no plan explosion into unions"),
    ("q21_waiting_suppliers", "EXISTS + NOT EXISTS self-joins on the fact table sharing one orderkey exchange"),
    ("corpus_prep_pipeline", "full prep flow (normalize -> gate -> dedup -> temperature mix -> shard) as ONE Catalyst plan: the gate stays in the scan projection, the digest dedup and lang allocation are the only wide stages"),
    ("q7_volume_shipping", "two-role nation pair: both nation dims + supplier broadcast; the symmetric disjunctive pair filter evaluates post-broadcast, one agg exchange"),
    ("q13_customer_order_distribution", "left-outer with the exclusion INSIDE the join condition (zero-order customers kept); agg-of-agg reuses the custkey exchange"),
    ("q18_large_volume_customers", "HAVING aggregate decorrelated to aggregate-then-join; lineitem shuffles once on orderkey, the orders join reuses the distribution"),
    ("ann_quantized_rerank_topk", "stage-1 candidate gen streams packed int8 BINARY only (broadcast queries x corpus, Arrow integer dot); stage-2 exact rerank touches |Q|*32 rows"),
    ("text_heavy_hitters_cms", "count-min grid: explode x depth then groupBy over <= d*w keys — partial counts collapse map-side, shuffle bounded regardless of corpus size"),
    ("q2_min_cost_supplier", "pseudo-partsupp persisted once for both the per-part MIN and the join-back; minc broadcast (bounded by the part dimension) so no sort-merge; top-100 via TakeOrderedAndProject, no global sort"),
    ("q20_excess_stock_suppliers", "both grouped aggregates shuffle on the same (partkey, suppkey) key and equi-join without a third exchange; LIKE-filtered part + nation broadcast as semi joins"),
    ("ann_ivf_topk", "codebook IVF (r05): cell assignment is a ZERO-shuffle scan projection (literal-centroid argmin via array_min); probe = broadcast centroids + one equi-join on cell; per-query window cut to k"),
    ("scd2_point_in_time_join", "temporal version lookup (r05): union-window as-of across two relations — ONE exchange on the join key, last(version_struct, ignorenulls) running window; no range join, no per-fact subquery"),
    ("profile_column_stats", "five exact count(DISTINCT)s in ONE Expand aggregate over a single scan (no scan union); swap approx_count_distinct for the Expand at 100 TB"),
    ("basket_brand_pairs", "apriori prune via broadcast semi-join BEFORE pair generation; C(k,2) pairs map-side from sorted basket arrays (persisted item set, no row-level self-join shuffle — measured trade-off in SCALING.md)"),
    ("sample_weighted_reservoir", "PPS sampling (r05): Partial WindowGroupLimit pre-trims each map task to a K-heap per source BEFORE the one exchange — shuffle carries O(K x sources x tasks) at any corpus size; sort key is one IEEE division (bit-identical cross-engine)"),
    ("rfm_customer_segments", "distributed NTILE (r05): three range exchanges + per-partition row_number windows keyed by spark_partition_id — NO Exchange SinglePartition anywhere (a bare global ntile() plans a one-task sort); offsets are <=32 driver scalars"),
    ("graph_triangle_count", "degree-oriented triangle join (r05): edges oriented low->high (deg,id) so wedge fan-out per node is arboricity-bounded, hub-safe; wedge enumeration + one closing equi-join on the oriented edge set"),
    ("graph_pagerank_parts", "integer PageRank (r05): per round the node-sized contribution table BROADCASTS into the persisted edge relation — edges never re-shuffle across the 5 rounds; the only per-round exchange is the map-side-combined sum over dst (measured vs shuffle-join in SCALING.md)"),
    ("skyline_customer_value", "2-D skyline (r05): bucketed local-frontier window prunes before the single tiny global sweep (20M->376 measured); frontier join-back broadcast; the quadratic dominance definition never appears in the plan"),
    ("text_inverted_index", "inverted index (r05): posting sample via rank<=16 WindowGroupLimit (map-side trim on hot stopword terms); exact df from a separate word-keyed aggregate over the persisted distinct pair set"),
    ("attribution_position_based", "U-shaped attribution (r05): purchase-touch candidates from the bucketized range join (7-day grain, 2-bucket probe explode, equi-join + residual); credit split is pure integer CASE arithmetic post-window"),
    ("timeseries_multigrain_rollup", "continuous-aggregate hierarchy (r05): hour/day/week in ONE scan -> one Expand -> one partial-agg exchange — never a per-grain scan union"),
    ("cep_funnel_regex", "CEP pattern count (r05): map-side partial collect_list, one user_id exchange, regex JVM-side in the output projection — no Python stage, no join"),
    ("regression_ship_price_trend", "exact-OLS (r05): six DECIMAL sufficient statistics as map-side partials before the single group-by exchange; closed-form division is a post-agg scalar projection"),
    ("export_global_ids", "global sequential IDs (r05): zipWithIndex shape — range exchange + per-partition row_number + <= #partitions offset scalars; NO Exchange SinglePartition"),
    ("embedding_centroid_by_label", "mean-pool centroids (r05): posexplode + ONE group-by exchange; 2^-20 fixed-point bigint partial_sum collapses map tasks to labels x dims rows (tie-free cross-engine float aggregation)"),
    ("running_total_global_scan", "distributed prefix scan (r05): per-bucket cumsum windows fully parallel; the ONLY SinglePartition exchange is the |buckets|-row carry summary (built map-side via partial_sum), broadcast back — a bare global running sum plans a one-task sort (measured 4.3x at 20M, SCALING.md)"),
    ("gaps_missing_event_ids", "distributed lag/lead (r05): per-bucket lead windows partitioned by fixed-width ID ranges; only the per-bucket min summary crosses the single tiny ordered window; boundary stitch joins back broadcast"),
    ("concurrency_peak_daily", "sweep-line concurrency (r05): sessionize -> +-1 deltas -> the same two-level scan keyed by calendar day -> per-day max; all-integer, the global running sum never sees a one-task window"),
    ("weighted_median_price", "exact weighted median (r05): ties collapse FIRST (map-side-combinable groupBy bounds the window input by value cardinality); both windows partition by group key; median pick is integer 2*cumw >= total"),
    ("dedup_prefix_jaccard", "prefix-filter Jaccard (r05): every join an equi-join — docs expose only their rarest |x|-ceil(t|x|)+1 shingles, candidates chunk-capped, exact verify candidate-restricted; the all-pairs semantics never appear as a cartesian"),
    ("session_seconds_per_day", "interval-split accounting (r05): midnight-crossing sessions explode map-side into per-day clamped segments AFTER the one sessionize exchange; microsecond integer sums"),
    ("drift_value_chi2", "drift monitor (r05): ONE integer bin-count aggregate; totals from an unpartitioned window over the <=|bins| summary rows; chi-square terms are post-agg scalar projections"),
    ("drift_ks_value", "two-sample KS (r06): ECDF cumulatives via the bucketed prefix scan (per-bucket windows, broadcast carry); integer D-numerator max-aggregate; the global ECDF order never sees a one-task window"),
    ("drift_rank_mannwhitney", "Mann-Whitney U (r06): global average ranks with ties in DOUBLED integers from one prefix-scan pass; one map-side-combinable ranksum aggregate — the classic global-sort trap avoided"),
    ("skew_key_gini", "exact Gini skew diagnostic (r06): global rank via zipWithIndex-shape global_row_number (range exchange + offset scalars, NO SinglePartition over data); integer numerator aggregate + 1-row broadcast totals"),
    ("timeseries_gapfill_locf", "gap-fill + LOCF (r06): dense grid = users x broadcast 30-literal-day explode (map-side); per-user IGNORE-NULLS window fully parallel; daily close is a WindowGroupLimit top-1"),
    ("dedup_substring_runs", "exact-substring dedup (r07): flat zip_with shingle build (no per-position slice copies) -> map-side-combinable shingle count -> left-semi dup filter -> per-doc islands window; three keyed stages, no pair list, no suffix array"),
    ("dedup_substring_clip", "ExactSubstr cut (r09 interval form): distinct hit positions merge into per-doc covered RUNS (islands window, gap tolerance k); the cut is a JVM higher-order filter of each doc's (pos,tok) array against its broadcastable interval array - the r08 per-position anti-join (73.6M shuffled rows at 1.6M docs) is gone"),
    ("agg_event_type_salted", "salted two-phase aggregate (r07): __salt in the wide aggregate's grouping spreads 5 hot keys over 80 partials; second tiny exchange re-aggregates by key - the skew insurance is 2 exchanges vs 1"),
    ("docs_blocklist_gate", "blocklist + quality gate composed (r07): six rules, term list as plan literals, staged __bl_* projections (each metric evaluated once - the pure-column form was 25x slower), ZERO exchanges - runs at scan speed"),
    ("pipeline_corpus_curation", "LLM-corpus flagship (r08): gate (0 exchanges, scan-projection) -> exact-dedup survivors (1 digest-keyed window exchange) -> keep-first substring clip (the detector's keyed shuffles) -> pack window (1 source-keyed exchange); one Catalyst DAG, no pair lists, no driver loops"),
    ("dedup_image_phash", "perceptual-hash image dedup (r08; r11: synth+hash merged to ONE Arrow mapInPandas stage — payload no longer crosses the JVM/Python boundary twice) -> the shared banded-Hamming pigeonhole join; shuffle keyed by (band, slice), pair space never materialized"),
    ("embedding_kmeans_lloyd", "Lloyd k-means (r08): the RETURNED final-assignment plan is a zero-shuffle literal-centroid argmin projection (no join/window on the corpus); per-round updates ran eagerly as k*d-bounded groupBy aggregates with driver-collected partial sums"),
    ("dedup_semantic_clusters", "SemDeDup (r09 hot-cell guard + r10 exemplar bridge): pair space equi-joined on (cell, salt) — cells above max_cell salt-split by md5(vec_id) so quantizer imbalance cannot make one task quadratic (7.2x->4.06x pair growth at 4x data, SCALING.md); the per-sub-cell exemplars then bridge across sub-cells under a second-level salt (planted 4096-clone cluster: 16 spurious survivors -> 1); centroids + per-cell sizes broadcast, centrality reuses the assignment pass; no cartesian anywhere"),
    ("text_bigram_backoff", "held-out bigram LM scoring (r08): bigrams built map-side via zip_with over array slices (no posexplode+window); held (doc,bigram) repeats collapse before the three word-keyed model joins; train total broadcast as a scalar"),
    ("dedup_audio_fingerprint", "audio fingerprint dedup (r08): two Arrow mapInPandas stages (WAV synth + decode/fingerprint, vectorized numpy) -> the same banded-Hamming pigeonhole join as SimHash/aHash; (band, slice)-keyed shuffle, no O(n^2) pair space"),
    ("dedup_video_framehash", "video frame-hash dedup (r09): y4m synth -> stride-2 frame decode -> per-frame aHash -> majority pooling, all in two Arrow mapInPandas stages behind the gated spread_for_decode fan-out -> the shared banded-Hamming join; the fourth modality on one engine"),
    ("text_nb_train_apply", "NB train+apply (r10: real stopword-density tier labels, 1/64-bit integer-log weights): one persisted (doc, bucket) collapse feeds labels-via-window, the <=classes*buckets weight table padded over spark.range(1024), and the broadcast-lookup apply; class constants attach as 1-row BroadcastNestedLoop builds (scalar-subquery shape); no shuffle join anywhere in the DAG"),
    ("pipeline_corpus_incremental", "daily-refresh flagship (r10): increment-only gates (scan projection) -> within-batch exact dedup (1 window exchange) -> ASYMMETRIC banded LSH vs the standing corpus (new x old only, __is_new-filtered) -> corpus-trained NB via broadcast lookup -> pack window; corpus touched only for reusable signature/model state"),
    ("dedup_video_frameshift", "frame-level video near-dup (r10): per-frame aHash rows (composite doc*8+frame ids) through the shared banded-Hamming join, then one map-side-combinable frame-vote aggregate; catches trimmed/offset duplicates majority pooling provably misses"),
    ("pipeline_corpus_incremental_standing", "standing-state daily flagship (r11): ONE documents scan (the increment) — gates/dedup/signatures increment-only, (band, band_hash) equi-join against the STORED corpus_signatures parquet, NB apply as a broadcast lookup on the STORED weight table; the corpus-scale tokenize lives in the refresh job, not this plan"),
    ("pipeline_corpus_mixture", "curation->training tail (r11): the standing daily DAG feeds sqrt-temperature allocation (broadcast alloc table, WindowGroupLimit-style per-source cut) and the shared 90/5/5 hash split; final (split, source) aggregate is map-side combinable"),
]

spark = get_spark(app_name="gen-plans")
sf = "/root/testdata/sf0.1"
out = ["# PLANS — physical plans of the headline queries (sf0.1, local[32])",
       "",
       "Generated by `python scripts_gen_plans.py`. These are the plan shapes",
       "the 100 TB design depends on; `tests/test_plans.py` pins the load-bearing",
       "properties so they can't regress.", ""]
for name, why in HEADLINERS:
    df = QUERIES[name](spark, sf)
    out.append(f"## {name}")
    out.append(f"*{why}*")
    out.append(f"- pushed filters: {has_pushed_filters(df)} · broadcast join: "
               f"{uses_broadcast_join(df)} · shuffle exchanges: {exchange_count(df)}")
    plan = formatted_plan(df).split("\n\n")[0]
    out.append("```\n" + plan + "\n```")
    out.append("")
open("PLANS.md", "w").write("\n".join(out))
print("wrote PLANS.md")

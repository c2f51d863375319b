"""Physical-plan regression tests: pin the plan properties the 100 TB
design depends on (SURVEY.md §4) so they can't silently regress —
predicate pushdown, column pruning, dimension broadcast, and exchange
reuse between the dedup window and the merge join."""

from __future__ import annotations

from fn_rq_report_etl_dev_spark.plans.inspect import (
    exchange_count,
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
)
from fn_rq_report_etl_dev_spark.workloads import QUERIES


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    assert has_pushed_filters(df)  # l_shipdate predicate reaches the scan
    cols = set(read_schema_columns(df))
    assert "l_orderkey" not in cols and "l_partkey" not in cols  # pruned
    assert len(cols) == 7
    # one shuffle for the group-by (partial agg is map-side)
    assert exchange_count(df) == 1


def test_q3_broadcasts_dimensions(spark, sf_dir):
    df = QUERIES["q3_shipping_priority"](spark, sf_dir)
    assert uses_broadcast_join(df)
    assert has_pushed_filters(df)


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    plan = formatted_plan(QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    # 4 dimension joins broadcast; only orders⋈lineitem may shuffle
    assert plan.count("BroadcastHashJoin") >= 4


def test_flagship_reuses_dedup_exchange_for_merge(spark, sf_dir):
    df = QUERIES["flagship_dedup_merge"](spark, sf_dir)
    plan = formatted_plan(df)
    # dedup window partitioning satisfies the merge join distribution:
    # exactly one exchange per merge side, none between window and join.
    assert exchange_count(df) == 2
    # top-1-per-key window is group-limit optimized (no full sort rank)
    assert "WindowGroupLimit" in plan


def test_window_dedup_single_exchange(spark, sf_dir):
    df = QUERIES["o15_window_dedup"](spark, sf_dir)
    assert exchange_count(df) == 1


def test_pack_token_budget_single_exchange(spark, sf_dir):
    # Sequence packing is one window cumsum per shard: exactly the
    # partitionBy(source) exchange, nothing else.
    df = QUERIES["pack_token_budget"](spark, sf_dir)
    assert exchange_count(df) == 1


def test_nation_trade_volume_broadcasts_all_dims(spark, sf_dir):
    # Q7 shape: 4 dimension roles broadcast; ONE exchange (the final agg).
    df = QUERIES["nation_trade_volume"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert exchange_count(df) == 1


def test_grouping_sets_single_pass(spark, sf_dir):
    # GROUPING SETS expands in one aggregation, not a 4-way scan union.
    df = QUERIES["agg_grouping_sets"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" in plan
    assert exchange_count(df) == 1


def test_large_quantity_orders_semi_prunes_before_wide_join(spark, sf_dir):
    # The HAVING subquery becomes a pre-aggregated semi join; only the
    # two aggregations shuffle.
    df = QUERIES["large_quantity_orders"](spark, sf_dir)
    assert exchange_count(df) == 2


def test_source_cap_uses_window_group_limit(spark, sf_dir):
    # The per-source cap must compile to WindowGroupLimit (cap-sized heap
    # per task), not a full per-group sort: that's what bounds hot-domain
    # cost at O(n log cap).
    df = QUERIES["curation_source_cap"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert exchange_count(df) == 1  # one hash-partition on source


def test_weighted_reservoir_map_side_group_limit(spark, sf_dir):
    # Sequential Poisson sampling must pre-trim map-side: a Partial
    # WindowGroupLimit BEFORE the one source-partition exchange (each map
    # task ships at most K rows per source, not the corpus) and the Final
    # pass after it.
    df = QUERIES["sample_weighted_reservoir"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Partial" in plan and "WindowGroupLimit" in plan
    assert exchange_count(df) == 1


def test_export_shuffle_single_exchange(spark, sf_dir):
    # Deterministic shuffle export = repartition-by-shard + in-shard rank:
    # exactly one exchange, no global total-order sort.
    df = QUERIES["export_shuffle_shards"](spark, sf_dir)
    assert exchange_count(df) == 1
    assert "Sort [skey" not in formatted_plan(df).replace("ASC NULLS FIRST", "")


def test_incremental_lsh_is_asymmetric_join(spark, sf_dir):
    # The incremental dedup must join new-side × corpus-side once — never
    # a self-join of the full banded table (the quadratic old×old leg).
    df = QUERIES["dedup_incremental_lsh"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count(
        "ShuffledHashJoin"
    ) >= 1
    # both join inputs are filtered by the __is_new side flag before the
    # band join, so each side scans a disjoint id set
    assert "__is_new" in plan


def test_simhash64_verify_is_integer_bitcount(spark, sf_dir):
    # The Hamming verify must run on pre-parsed integer slices
    # (bit_count(xor)), not per-pair substring chains — the candidate set
    # is quadratic in bucket size, the parse must stay linear in docs.
    df = QUERIES["dedup_simhash64"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "bit_count" in plan


def test_q7_broadcasts_nations_and_pushes_shipdate(spark, sf_dir):
    df = QUERIES["q7_volume_shipping"](spark, sf_dir)
    assert has_pushed_filters(df)  # l_shipdate window reaches the scan
    plan = formatted_plan(df)
    # both nation roles (and supplier) broadcast — no shuffle for dims
    assert plan.count("BroadcastHashJoin") >= 3


def test_q13_left_outer_keeps_filter_in_join_condition(spark, sf_dir):
    df = QUERIES["q13_customer_order_distribution"](spark, sf_dir)
    plan = formatted_plan(df)
    # the o_orderpriority exclusion prunes the orders SCAN (it's on the
    # preserved side's build input, so pushdown is safe), never customers
    assert has_pushed_filters(df)
    # two aggregates (per-custkey count, then distribution regroup)
    assert plan.count("HashAggregate") >= 4  # 2 logical aggs x partial+final


def test_q18_aggregate_then_join_single_lineitem_exchange(spark, sf_dir):
    df = QUERIES["q18_large_volume_customers"](spark, sf_dir)
    # lineitem shuffles ONCE on l_orderkey for the HAVING aggregate; the
    # orders join reuses that distribution (plus at most the customer
    # side's exchanges) — pin the ceiling so a plan regression (e.g. an
    # extra repartition between agg and join) can't sneak in.
    assert exchange_count(df) <= 3


def test_quantized_rerank_stage1_streams_packed_bytes_only(spark, sf_dir):
    df = QUERIES["ann_quantized_rerank_topk"](spark, sf_dir)
    plan = formatted_plan(df)
    # stage-1 candidate gen is broadcast-paired (queries side), and the
    # full-precision arrays re-enter only via the stage-2 rerank joins
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # Arrow-batched python stages: quantize (x2 sides) + int8 score
    assert plan.count("ArrowEvalPython") >= 3


def test_dynamic_partition_pruning_fires_on_selective_dim(spark, tmp_path):
    """DPP: a partitioned fact joined to a literal-filtered dim must get a
    dynamicpruning PartitionFilter on the fact SCAN (only matching
    partition directories are read — the 100 TB star-join staple). Same
    'likely selective' precondition as the runtime bloom filter
    (SCALING.md): a literal equality qualifies, a bare boolean column
    does NOT."""
    from pyspark.sql import functions as F

    d = str(tmp_path)
    (spark.range(10_000).withColumn("day", (F.col("id") % 30).cast("int"))
     .withColumn("v", F.rand(seed=1))
     .write.partitionBy("day").parquet(d + "/fact"))
    (spark.range(30).withColumn("day", F.col("id").cast("int"))
     .withColumn("grp", (F.col("id") % 7).cast("int"))
     .drop("id").write.parquet(d + "/dim"))
    fact = spark.read.parquet(d + "/fact")
    dim = spark.read.parquet(d + "/dim").filter("grp = 5")
    j = fact.join(dim, "day").agg(F.sum("v").alias("s"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan


def test_q2_broadcast_joinback_and_topk(spark, sf_dir):
    """Q2's min-cost join-back must broadcast (minc is bounded by the
    part dimension) and the top-100 must run as TakeOrderedAndProject —
    a sort-merge join or a global sort here would regress the 100 TB
    plan (round-4 pin)."""
    df = QUERIES["q2_min_cost_supplier"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert has_pushed_filters(df)  # p_type/p_size reach the part scan


def test_q20_shares_partsupp_grouping_key(spark, sf_dir):
    """Q20's two grouped aggregates shuffle on the same (partkey,
    suppkey) key and equi-join without a THIRD exchange between them;
    part/nation reduce to broadcast semi joins."""
    df = QUERIES["q20_excess_stock_suppliers"](spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # red parts + nation semi
    # exchanges: avail groupBy + shipped groupBy only — the join between
    # them reuses the (partkey, suppkey) distribution.
    assert exchange_count(df) <= 2


def test_schema_evolution_reads_both_generations(spark, sf_dir):
    """The mergeSchema read must produce a plan whose scan schema carries
    BOTH generations' columns (NULL-filled where absent) and aggregate in
    one exchange — schema reconciliation must not degrade into a union
    of per-generation scans with a shuffle each."""
    df = QUERIES["schema_evolution_union"](spark, sf_dir)
    cols = set(read_schema_columns(df))
    assert {"o_totalprice", "o_orderpriority"} <= cols
    assert exchange_count(df) <= 2


def test_codebook_ivf_assignment_is_shuffle_free(spark, sf_dir):
    """The SQL-replayable codebook index (r05) assigns cells as a single
    scan-side projection — literal-centroid argmin via array_min over
    (dist, cell) structs. NO exchange and NO window on the corpus side:
    the shape that survives a 1000-executor scan. (The cross-join + window
    alternative would shuffle the whole corpus by id.)"""
    from fn_rq_report_etl_dev_spark.operators.similarity import (
        build_codebook_index,
    )
    from fn_rq_report_etl_dev_spark.workloads import load

    emb = load(spark, sf_dir, "embeddings")
    idx = build_codebook_index(emb, n_cells=8, seed=42)
    assert exchange_count(idx.assigned) == 0
    plan = formatted_plan(idx.assigned)
    assert "Window" not in plan and "Join" not in plan


def test_point_in_time_join_single_exchange(spark, sf_dir):
    """The SCD2 point-in-time lookup compiles to the union-window as-of
    shape: ONE exchange (the user_id window), no range join, no per-fact
    subquery — the same single-shuffle discipline as the flagship dedup."""
    df = QUERIES["scd2_point_in_time_join"](spark, sf_dir)
    assert exchange_count(df) == 1
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "SortMergeJoin" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Spark's InjectRuntimeFilter must still rewrite a selective
    dim ⋈ big-fact shuffle join into bloom_filter_agg on the dim side +
    might_contain pushed into the fact side — the row-level companion to
    DPP that SCALING.md's 64M-row experiment measured (round 4). Pinned
    here at tiny scale with the size thresholds lowered so the rewrite's
    *applicability* can't silently regress across Spark upgrades."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10KB",
        )
        # force a shuffle join: broadcast joins don't need the filter
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sel = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey", "o_totalprice")
        )
        j = (
            li.join(sel, li.l_orderkey == sel.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_profile_single_expand_aggregate(spark, sf_dir):
    """The five exact count(DISTINCT)s of the table profile must compile
    to ONE Expand aggregate over a single scan (partial-distinct shuffle
    + single-row final) — not five scans or a union of per-column aggs."""
    df = QUERIES["profile_column_stats"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" in plan
    assert "Join" not in plan  # no union-of-scans fallback shape
    assert exchange_count(df) <= 2


def test_basket_pairs_generate_map_side(spark, sf_dir):
    """Frequent-pair mining must generate pairs MAP-SIDE from per-basket
    arrays (Generate/explode over HOFs) with the dimension and prune
    sides broadcast — never via a row-level self-join shuffle of the
    item table (the shape that dies on a 100 TB fact)."""
    df = QUERIES["basket_brand_pairs"](spark, sf_dir)
    try:
        plan = formatted_plan(df)
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Generate" in plan
        assert "BroadcastHashJoin" in plan
        # shared items scan+distinct is persisted, computed once
        assert "InMemoryTableScan" in plan
    finally:
        spark.catalog.clearCache()


def test_rfm_has_no_single_partition_global_window(spark, sf_dir):
    """The RFM quintiles use distributed_ntile: range exchanges + windows
    partitioned by spark_partition_id — NEVER the one-task
    `Exchange SinglePartition` global sort a bare ntile() would plan for
    the DATA path. r12: the per-partition-count offsets are a lazy
    broadcast branch (no driver collect), so each of the three scores
    carries exactly one ≤#partitions-row SinglePartition cumsum — the
    same two-level shape test_running_total_scan_two_level pins."""
    try:
        df = QUERIES["rfm_customer_segments"](spark, sf_dir)
        plan = formatted_plan(df)
        assert plan.count("rangepartitioning") >= 3  # one per score
        # offsets summaries only — one tiny branch per score, nothing else
        assert plan.count("SinglePartition") == 3
        assert uses_broadcast_join(df)  # offsets come back via broadcast
    finally:
        spark.catalog.clearCache()


def test_attribution_single_exchange_window(spark, sf_dir):
    """Last-touch attribution is ONE window over user_id: a single
    hash exchange, no join in the plan."""
    df = QUERIES["attribution_last_touch"](spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 1
    assert "Join" not in plan


def test_zorder_layout_scan_agg_only(spark, sf_dir):
    """The Z-order layout audit is scan → project (codegen'd bit ops) →
    one group-by exchange: no joins, no UDFs."""
    df = QUERIES["zorder_layout_events"](spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 1
    assert "Join" not in plan and "Python" not in plan


def test_pagerank_broadcasts_contrib_per_round(spark, sf_dir):
    """Each of the 5 PageRank rounds joins the big edge relation to the
    node-sized contribution table via an EXPLICIT broadcast — the edge
    side must never be re-shuffled into a SortMergeJoin per iteration."""
    df = QUERIES["graph_pagerank_parts"](spark, sf_dir)
    try:
        plan = formatted_plan(df)
        assert plan.count("BroadcastHashJoin") >= 10  # contrib + insum, x5
        assert "CartesianProduct" not in plan
    finally:
        spark.catalog.clearCache()


def test_inverted_index_posting_sample_group_limited(spark, sf_dir):
    """The posting sample must go through InferWindowGroupLimit (map-side
    rank<=16 trim) so hot stopword terms never pool a full posting set on
    one reducer, and the shared distinct scan is persisted."""
    df = QUERIES["text_inverted_index"](spark, sf_dir)
    try:
        plan = formatted_plan(df)
        assert "WindowGroupLimit" in plan
        assert "InMemoryTableScan" in plan
    finally:
        spark.catalog.clearCache()


def test_skyline_prunes_locally_before_global_sweep(spark, sf_dir):
    """pareto_frontier_2d: a bucket-partitioned local frontier window
    must run BEFORE the single-partition global sweep (the global window
    only ever sees local survivors), and the frontier join-back is
    broadcast."""
    df = QUERIES["skyline_customer_value"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "__b" in plan  # bucketed local pass survived optimization
    assert "SinglePartition" in plan  # tiny global sweep exists
    assert plan.index("__b") < plan.index("SinglePartition")
    assert "BroadcastHashJoin" in plan


def test_position_attribution_is_bucketized_equi_join(spark, sf_dir):
    """The purchase-touch candidate join must be an equi-join on
    (user, 7-day bucket) + residual filter — never a nested-loop theta
    join over per-user histories."""
    df = QUERIES["attribution_position_based"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # 2-bucket probe explode


def test_rolling_distinct_expansion_shape(spark, sf_dir):
    """Exact sliding distinct: explode to the 7 closing windows
    (Generate), active-day filter via broadcast semi-join, one final
    distinct-aggregate — no window operator, no nested loop."""
    df = QUERIES["rolling_distinct_users"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "NestedLoop" not in plan


def test_multigrain_rollup_single_expand_single_exchange(spark, sf_dir):
    """The hour/day/week rollup hierarchy is ONE scan + one Expand + one
    partial-agg exchange — never a per-grain union of three scans; the
    ts filter reaches the parquet scan."""
    df = QUERIES["timeseries_multigrain_rollup"](spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 1
    # one Expand node: the tree summary and its detail section each name
    # it once in the formatted plan
    assert plan.count("Expand") == 2
    assert "Union" not in plan and "Join" not in plan
    assert has_pushed_filters(df)


def test_cep_regex_single_exchange_no_udf(spark, sf_dir):
    """CEP pattern count: map-side partial collect_list, one user_id
    exchange, regex evaluated JVM-side in the output projection — no
    Python stage, no join, and all four NULL filters pushed."""
    df = QUERIES["cep_funnel_regex"](spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 1
    assert "Python" not in plan and "Join" not in plan
    assert "regexp_extract_all" in plan
    assert has_pushed_filters(df)


def test_regression_sufficient_stats_map_side(spark, sf_dir):
    """Exact-OLS: all six sufficient statistics accumulate as map-side
    partial_sum/partial_count before the ONE group-by exchange; the
    closed-form division is a scalar projection after the final agg."""
    df = QUERIES["regression_ship_price_trend"](spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 1
    assert plan.count("partial_sum") >= 5
    assert "Join" not in plan and "Python" not in plan
    assert has_pushed_filters(df)


def test_global_ids_no_single_partition(spark, sf_dir):
    """Global sequential IDs must come from the zipWithIndex shape —
    range exchange + per-partition windows — never a one-task
    `Exchange SinglePartition` global sort of the DATA path. r12: the
    offsets are a lazy ≤#partitions-row broadcast branch (no driver
    collect), whose cumsum is the plan's only SinglePartition."""
    try:
        df = QUERIES["export_global_ids"](spark, sf_dir)
        plan = formatted_plan(df)
        assert "rangepartitioning" in plan
        assert plan.count("SinglePartition") == 1  # the counts summary only
        assert uses_broadcast_join(df)
    finally:
        spark.catalog.clearCache()


def test_embedding_centroid_partial_agg_no_udf(spark, sf_dir):
    """Centroid pooling: posexplode then ONE group-by exchange whose
    partial aggregation collapses map tasks to labels×dims rows — no
    Python stage, no join; the fixed-point sum is a bigint partial_sum."""
    df = QUERIES["embedding_centroid_by_label"](spark, sf_dir)
    plan = formatted_plan(df)
    assert exchange_count(df) == 1
    assert "partial_sum" in plan
    assert "Python" not in plan and "Join" not in plan


def test_running_total_scan_two_level(spark, sf_dir):
    """Global running sum (no PARTITION BY): the data-path window must be
    partitioned by the scan bucket; the ONLY SinglePartition exchange
    feeds the |buckets|-row summary window (built from a map-side
    partial_sum); carry-ins come back via broadcast join."""
    df = QUERIES["running_total_global_scan"](spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    assert plan.count("SinglePartition") == 1
    assert "partial_sum" in plan


def test_concurrency_sweep_two_level(spark, sf_dir):
    """Sweep-line concurrency: same scan decomposition — one tiny
    SinglePartition for the per-day summary, broadcast carry join; the
    sweep rows themselves only ever see day-partitioned windows."""
    df = QUERIES["concurrency_peak_daily"](spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    assert plan.count("SinglePartition") == 1


def test_gaps_two_level_lead(spark, sf_dir):
    """Distributed lag/lead: per-bucket lead windows are partitioned; only
    the per-bucket min summary crosses the single ordered window, and the
    stitch joins back broadcast."""
    df = QUERIES["gaps_missing_event_ids"](spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    assert plan.count("SinglePartition") == 1


def test_ks_statistic_two_level(spark, sf_dir):
    """Two-sample KS: the ECDF cumulatives ride bucket-partitioned
    windows; the only SinglePartition exchanges are the |buckets|-row
    carry summary and the final 1-row statistic — the per-value relation
    itself never sees a one-task window. Both cumulatives share ONE scan
    pass (bucketed_running_sums): exactly one data-path window sort."""
    df = QUERIES["drift_ks_value"](spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    # carry summary + final single-row aggregate — nothing else global
    assert plan.count("SinglePartition") <= 2
    assert "partial_sum" in plan or "partial_count" in plan


def test_mannwhitney_two_level(spark, sf_dir):
    """Mann–Whitney: global average ranks from the bucketed prefix scan —
    same budget as the KS pin (carry summary + final scalar row), rank
    arithmetic all-integer in the projection, no Python stage."""
    df = QUERIES["drift_rank_mannwhitney"](spark, sf_dir)
    plan = formatted_plan(df)
    assert uses_broadcast_join(df)
    assert plan.count("SinglePartition") <= 2
    assert "Python" not in plan


def test_prefix_jaccard_equi_joins_only(spark, sf_dir):
    """Prefix-filter Jaccard: every join is an equi-join on shingle or id
    keys — no cartesian/broadcast-nested-loop anywhere despite being an
    all-pairs similarity join by semantics."""
    df = QUERIES["dedup_prefix_jaccard"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_salted_aggregate_two_phase_plan(spark, sf_dir):
    """agg_event_type_salted (VERDICT r06 ask #4) must actually run the
    salted two-phase shape, not collapse to a plain groupBy: the plan
    carries the __salt column into the FIRST (wide) aggregate's grouping
    and a second exchange re-aggregates by key alone — vs exactly one
    exchange and no salt for the plain form of the same aggregate."""
    df = QUERIES["agg_event_type_salted"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "__salt" in plan
    # two shuffles: (key, salt) partials, then key finals
    assert exchange_count(df) == 2
    # the plain form: one exchange, no salt anywhere
    from pyspark.sql import functions as F

    from fn_rq_report_etl_dev_spark.workloads import load

    plain = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    assert exchange_count(plain) == 1
    assert "__salt" not in formatted_plan(plain)


def test_corpus_curation_pipeline_plan(spark, sf_dir):
    """pipeline_corpus_curation (r08 flagship): one Catalyst DAG, no
    cartesian/nested-loop anywhere, a bounded exchange budget (gate 0 +
    dedup window 1 + the clip's keyed stages + meta join + pack window),
    and the gate's staged __bl_* blocklist columns present in the plan
    (the composition really is one projection, not a re-scan)."""
    df = QUERIES["pipeline_corpus_curation"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # gate + dedup + clip + meta-join + pack: keyed stages only; the
    # budget leaves headroom for AQE variation but catches a re-scan
    # explosion or a lost partial aggregate
    assert exchange_count(df) <= 12


def test_image_phash_banded_join_plan(spark, sf_dir):
    """dedup_image_phash (r08): the pair generation must ride the banded
    bucket join (posexplode of band slices -> chunk-capped pair
    expansion), never a full signature cross join."""
    df = QUERIES["dedup_image_phash"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # ONE Arrow stage (r11: synth+hash merged — the payload no longer
    # crosses the JVM↔Python boundary twice): the formatted tree repeats
    # the persisted signature subtree under each join branch, so count
    # DISTINCT MapInPandas node ids, not occurrences
    import re

    assert len(set(re.findall(r"MapInPandas \((\d+)\)", plan))) == 1


def test_kmeans_final_assignment_is_shuffle_free(spark, sf_dir):
    """kmeans_lloyd's returned plan (the FINAL assignment) is a pure
    scan-side projection — literal-centroid argmin, no exchange, no join,
    no window on the corpus: the per-round shape that makes Lloyd one
    corpus pass per iteration at 100 TB. (The round-loop's update
    aggregates ran eagerly during build; they are groupBy(cell, dim)
    with map-side partials bounded at k·d rows per task.)"""
    df = QUERIES["embedding_kmeans_lloyd"](spark, sf_dir)
    assert exchange_count(df) == 0
    plan = formatted_plan(df)
    assert "Window" not in plan and "Join" not in plan


def test_semantic_dedup_pairs_equi_join_on_cell(spark, sf_dir):
    """SemDeDup's pair space must be an EQUI-join on the k-means cell id
    (quadratic only within a cell — the paper's scale contract), never a
    cartesian product, and the centroid join stays broadcast."""
    df = QUERIES["dedup_semantic_clusters"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert uses_broadcast_join(df)  # centroids broadcast onto assignment


def test_hash_classifier_two_aggregates_no_join_no_udf(spark, sf_dir):
    """The hashing-trick classifier must stay a pure aggregate pipeline:
    the (doc, bucket) collapse and the per-doc score roll-up are the only
    exchanges, the weight arithmetic is a JVM projection — no join, no
    Python stage, no window."""
    df = QUERIES["text_hash_classifier"](spark, sf_dir)
    assert exchange_count(df) <= 2
    plan = formatted_plan(df)
    assert "Join" not in plan and "Window" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_nb_train_apply_no_shuffle_join(spark, sf_dir):
    """NB train+apply in one DAG: the weight lookup on the apply side is
    a BROADCAST hash join on the bucket id, the 1-row class-constant
    relations attach as BroadcastNestedLoop builds (the physical shape
    Catalyst's own scalar-subquery rewrite produces — free with a one-row
    build side), and nothing joins by shuffle: no SortMergeJoin, no
    ShuffledHashJoin, no CartesianProduct, no Python stage."""
    df = QUERIES["text_nb_train_apply"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_corpus_incremental_pipeline_plan(spark, sf_dir):
    """pipeline_corpus_incremental (r10 flagship): the near-dup screen
    must ride the ASYMMETRIC banded join — both band-join inputs filter
    on the __is_new side flag (new×corpus, never the quadratic old×old
    self-join) — the NB weight lookup must be a broadcast hash join, and
    nothing in the DAG may go cartesian. Shuffle joins are allowed only
    for the increment-keyed anti/meta joins (small side = the day's
    batch), so their count is pinned."""
    # Pin the COLD plan: earlier tests in the session may have collected
    # either flagship form, and CacheManager then substitutes persisted
    # subtrees as InMemoryRelations whose printed children double-count
    # join nodes in the plan text (r11: the standing-state twin made this
    # ordering-dependent inflation real).
    spark.catalog.clearCache()
    df = QUERIES["pipeline_corpus_incremental"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "__is_new" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # anti-join (accepted = surv \ drops) + meta join at most; the banded
    # join itself may be SMJ or SHJ but there must be no third corpus-
    # sized shuffle join sneaking in beyond these keyed stages
    assert plan.count("SortMergeJoin") <= 3


def test_corpus_incremental_standing_daily_dag_reads_state_only(spark, sf_dir):
    """The standing-state flagship's DAILY DAG (r11, VERDICT r10 ask #1)
    must touch the corpus nowhere: its only parquet inputs are the
    increment scan of documents and the two standing-state tables. No
    union leg (__is_new gone), no corpus-side filter (the recompute
    form's NOT(doc_id % 7 = 0) branch), no cartesian; the weight lookup
    stays a broadcast hash join. This is the plan-level proof that the
    corpus-scale tokenize/shingle/groupBy moved into the refresh job."""
    import re

    spark.catalog.clearCache()  # cold plan — see the recompute pin above
    df = QUERIES["pipeline_corpus_incremental_standing"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "corpus_signatures" in plan and "corpus_nb_weights" in plan
    assert "__is_new" not in plan
    assert not re.search(r"NOT \(\(doc_id#\d+L? % 7\)", plan)
    assert plan.count("documents.parquet") == 1  # the increment leg only
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivf_add_vectors_assign_side_is_shuffle_free(spark, sf_dir):
    """ann_ivf_add_vectors (r11): the increment assignment must be the
    zero-shuffle literal-centroid projection (same contract as the Lloyd
    final assignment) — no exchange, no join, no window over the new
    vectors. The full query adds only the 1-row staleness broadcast."""
    from fn_rq_report_etl_dev_spark.operators.similarity import (
        IvfIndex,
        ivf_assign_frozen,
    )
    from fn_rq_report_etl_dev_spark.state import read_ivf_state
    from fn_rq_report_etl_dev_spark.workloads import load
    from fn_rq_report_etl_dev_spark.workloads.llmops import (
        _ivf_state_warehouse,
    )

    centroids, _ = read_ivf_state(
        spark, _ivf_state_warehouse(spark, sf_dir)
    )
    emb = load(spark, sf_dir, "embeddings")
    added = ivf_assign_frozen(
        IvfIndex(centroids, None),
        emb.filter(emb.vec_id % 5 == 0),
        with_dist=True,
    )
    assert exchange_count(added) == 0
    plan = formatted_plan(added)
    assert "Window" not in plan and "Join" not in plan
    full = formatted_plan(QUERIES["ann_ivf_add_vectors"](spark, sf_dir))
    assert "CartesianProduct" not in full


def test_video_frameshift_banded_join_plan(spark, sf_dir):
    """dedup_video_frameshift (r10): per-frame signatures must ride the
    same banded bucket join as the pooled query (never a frame-pair
    cross join), and the frame vote must be one hash aggregate over the
    verified pairs (partial/final — map-side combinable)."""
    df = QUERIES["dedup_video_frameshift"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    import re

    # ONE Arrow stage (r11: synth+hash merged, guide §4.1)
    assert len(set(re.findall(r"MapInPandas \((\d+)\)", plan))) == 1
    assert "HashAggregate" in plan


def test_nb_weight_derivation_reads_counts_only(spark, tmp_path):
    """refresh_nb_weights (r11): the weight re-derivation DAG must never
    touch documents — its only table input is the tiny additive count
    parquet (the corpus was tokenized at append time). Two aggregates,
    the 1-row constants attached as a broadcast build, no Expand (the
    count_distinct trap), no window, no UDF."""
    from fn_rq_report_etl_dev_spark.catalog import Warehouse
    from fn_rq_report_etl_dev_spark.operators.curation import (
        nb_bucketize,
        nb_counts,
        nb_weights_from_counts,
    )
    from fn_rq_report_etl_dev_spark.state import CORPUS_NB_COUNTS

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"the and of alpha{i} beta{i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    wh = Warehouse(str(tmp_path / "wh"))
    wh.append(
        nb_counts(nb_bucketize(docs, "doc_id", "text", persist=False)),
        CORPUS_NB_COUNTS,
    )
    plan = formatted_plan(
        nb_weights_from_counts(wh.read(spark, CORPUS_NB_COUNTS))
    )
    assert "corpus_nb_counts" in plan
    assert "documents" not in plan
    assert "Expand" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan

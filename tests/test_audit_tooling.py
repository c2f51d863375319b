"""Static consistency checks for the audit scripts — the dirty-data and
empty-corpus sweeps are scripts, not pytest, so these guards keep their
configuration from silently drifting as tables/queries evolve."""

from __future__ import annotations

import importlib

import scripts_null_audit as na


def test_every_dirty_table_has_a_row_key():
    """The nulling hash MUST key on a stable row identity (review
    finding: value-keyed hashing nulls low-cardinality columns
    all-or-nothing); every dirtied table needs its primary key listed."""
    for t in na.DIRTY:
        assert t in na.ROW_KEY, f"{t}: dirtied but no ROW_KEY entry"
    for t in na.TABLES:
        assert t in na.ROW_KEY, f"{t}: no ROW_KEY entry"


def test_row_keys_not_dirtied_without_knob(monkeypatch):
    """The base sweep must never null the columns its own hash keys on —
    a nulled key would make the nulling of OTHER columns of that row
    engine-dependent. (SPARK_NULL_KEYS=1 adds JOIN keys, which are not
    ROW_KEY columns.)"""
    monkeypatch.delenv("SPARK_NULL_KEYS", raising=False)
    mod = importlib.reload(na)
    for t, cols in mod.DIRTY.items():
        overlap = set(cols) & set(mod.ROW_KEY[t])
        assert not overlap, f"{t}: row-key columns dirtied: {overlap}"


def test_key_escalation_does_not_touch_row_keys(monkeypatch):
    monkeypatch.setenv("SPARK_NULL_KEYS", "1")
    mod = importlib.reload(na)
    for t, cols in mod.DIRTY.items():
        overlap = set(cols) & set(mod.ROW_KEY[t])
        assert not overlap, f"{t}: row-key columns dirtied under knob: {overlap}"
    monkeypatch.delenv("SPARK_NULL_KEYS", raising=False)
    importlib.reload(mod)


def test_expectation_columns_reference_registered_queries():
    import inspect

    src = inspect.getsource(na.main)
    assert "ann_ivf_recall" in src  # the one documented expectation oracle


def test_checkpointed_drain_attribute_pins_the_streaming_class():
    """bench.py derives its side-timing exclusion from the registry's
    checkpointed_drain attribute (VERDICT r04 'what's wrong' #1). Pin the
    membership: exactly the five checkpointed-drain streaming proofs, and
    every marked name is a registered query. A new writeStream-based
    workload that forgets the flag shows up here as a diff of this set
    against streaming_equiv.py's registrations."""
    import inspect

    from fn_rq_report_etl_dev_spark.workloads import (
        CHECKPOINTED_DRAINS,
        QUERIES,
        streaming_equiv,
    )

    assert CHECKPOINTED_DRAINS == {
        "streaming_merge_equivalence",
        "streaming_dedup_watermark_boundary",
        "streaming_window_counts",
        "streaming_interval_join",
        "streaming_stateful_sessions",
        "streaming_static_enrich",
        "streaming_cdc_apply",  # r06: incremental CDC ≡ batch replay
        "streaming_state_refresh",  # r11: streamed signature maintenance
        "streaming_nb_state",  # r11: streamed additive NB count state
    }
    assert CHECKPOINTED_DRAINS <= set(QUERIES)
    # Every workload defined in a module that drains checkpoints carries
    # the flag (the class criterion, not a hand list).
    src = inspect.getsource(streaming_equiv)
    assert src.count("@workload(") == src.count("checkpointed_drain=True")


def test_iterative_attribute_pins_the_fixed_point_class():
    """bench.py's second side-timing class (VERDICT r06 ask #7): the
    iterative fixed-point builders, whose sf0.1 wall time is rounds x
    per-job overhead rather than one-shot plan cost. Pin the membership
    so a new round-loop workload that forgets the flag (or a one-shot
    query that wrongly claims it to dodge the suite total) shows up as
    a diff here."""
    from fn_rq_report_etl_dev_spark.workloads import (
        CHECKPOINTED_DRAINS,
        ITERATIVE_FIXED_POINTS,
        QUERIES,
    )

    assert ITERATIVE_FIXED_POINTS == {
        "graph_pagerank_parts",
        "graph_sssp_weighted",
        "graph_sssp_delta",
        "graph_khop_reach",
        "dedup_cluster_components",
        # the two survivors queries EMBED the same label-propagation
        # loop in their builders (connected_components runs during
        # build) — same class by the same criterion
        "dedup_apply_survivors",
        "dedup_survivors_quality",
        "curation_greedy_coverage",
        # r08: BPE merge learning — one argmax driver row per merge
        # round, the greedy-coverage shape — and the apply step that
        # embeds the same loop in its builder
        "text_bpe_vocab_learn",
        "text_bpe_tokenize",
        # r08: Lloyd k-means — per round one assignment pass + one k·d
        # update aggregate, collected and re-broadcast by the driver
        "embedding_kmeans_lloyd",
    }
    assert ITERATIVE_FIXED_POINTS <= set(QUERIES)
    # The two side-timed classes are disjoint — each name lands in
    # exactly one bench section.
    assert not (ITERATIVE_FIXED_POINTS & CHECKPOINTED_DRAINS)

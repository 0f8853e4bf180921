"""The driver's correctness gate verifies queries() keys in registration
order with a bounded budget (round 1: exactly the first 50 keys), so the
window composition is a hard invariant: every SURVEY.md §2 engine operator
ID must be covered by a key inside the first 50 — either directly, via a
shared builder object (registry.aliases), or as a computation embedded in a
windowed combo query (fn_scalars_combo, agg_multi_count, ads_search*).
"""

from __future__ import annotations

from etl_backend_spark.registry import ORACLES, PRIORITY, QUERIES

WINDOW = 50

# §2 engine-relevant operator ID -> the windowed key that covers it.
# "direct": the ID itself is in the window. "builder": same builder object
# registered under both names. "combo": the ID's computation is inside the
# windowed query (and the ID stays registered standalone further down).
SEC2_COVERAGE: dict[str, tuple[str, str]] = {
    "scan_filtered": ("scan_filtered", "direct"),
    "scan_full_sorted": ("scan_full_sorted", "direct"),
    "lookup_pk": ("lookup_pk", "direct"),
    "lookup_unique_composite": ("lookup_unique_composite", "direct"),
    "source_json": ("source_json", "direct"),
    "sink_json": ("sink_json", "direct"),
    "sink_json_roundtrip": ("sink_json", "builder"),
    "source_files": ("source_files", "direct"),
    "raw_sql": ("raw_sql", "direct"),
    "project_columns": ("project_columns", "direct"),
    "project_exclude": ("project_exclude", "direct"),
    "project_nested": ("project_nested", "direct"),
    "filter_eq": ("filter_eq", "direct"),
    "filter_neq": ("filter_neq", "direct"),
    "filter_range": ("filter_range", "direct"),
    "filter_contains_ci": ("filter_contains_ci", "direct"),
    "filter_or": ("filter_or", "direct"),
    "filter_dynamic": ("filter_dynamic", "direct"),
    "filter_post_join": ("filter_post_join", "direct"),
    "join_lookup_n1": ("join_lookup_n1", "direct"),
    "join_two_hop": ("join_two_hop", "direct"),
    "join_self_roles": ("join_self_roles", "direct"),
    "join_1n_nested": ("join_1n_nested", "direct"),
    "join_semi": ("join_semi", "direct"),
    "join_anti": ("join_anti", "direct"),
    "agg_count_filtered": ("agg_multi_count", "combo"),
    "agg_relation_count": ("agg_relation_count", "direct"),
    "agg_multi_count": ("agg_multi_count", "direct"),
    "agg_page_math": ("ads_search_total", "combo"),
    "window_latest_per_group": ("window_latest_per_group", "direct"),
    "sort_multi_option": ("ads_search", "combo"),
    "paginate_offset": ("paginate_offset", "direct"),
    "sort_asc_stream": ("sort_asc_stream", "direct"),
    "limit_nested": ("window_latest_per_group", "builder"),
    "fn_cast_double": ("fn_scalars_combo", "combo"),
    "fn_cast_int": ("fn_scalars_combo", "combo"),
    "fn_lower_contains": ("fn_scalars_combo", "combo"),
    "fn_now": ("fn_nondeterministic", "builder"),
    "fn_uuid": ("fn_nondeterministic", "builder"),
    "fn_array_build": ("fn_scalars_combo", "combo"),
    "fn_least_pair": ("fn_scalars_combo", "combo"),
    "fn_ceil": ("fn_scalars_combo", "combo"),
    "fn_json": ("source_json", "builder"),
    "fn_regex_match": ("fn_scalars_combo", "combo"),
    "fn_concat_name": ("fn_scalars_combo", "combo"),
    "fn_bool_exists": ("fn_bool_exists", "direct"),
    "fn_bcrypt": ("fn_auth_roundtrip", "builder"),
    "fn_jwt": ("fn_auth_roundtrip", "builder"),
    "etl_append": ("etl_append", "direct"),
    "etl_update": ("etl_update", "direct"),
    "etl_update_dynamic": ("etl_update_dynamic", "direct"),
    "etl_delete": ("etl_delete", "direct"),
    "etl_upsert": ("etl_upsert", "direct"),
    "etl_cascade_delete": ("etl_cascade_delete", "direct"),
    "etl_touch_parent": ("etl_touch_parent", "direct"),
    "stream_ingest": ("stream_ingest", "direct"),
    "stream_route_keyed": ("stream_route_keyed", "direct"),
    "stream_agg_touch": ("stream_agg_touch", "direct"),
    "dedup_exact": ("dedup_exact", "direct"),
    "dedup_fuzzy": ("dedup_minhash_lsh", "builder"),
    "sim_topk": ("sim_topk_brute", "builder"),
    "text_stats": ("text_stats", "direct"),
    "multimodal_cols": ("multimodal_meta", "builder"),
}


def window_keys() -> list[str]:
    return list(QUERIES)[:WINDOW]


def test_priority_list_is_registered_and_leads():
    assert list(QUERIES)[: len(PRIORITY)] == [
        k for k in PRIORITY if k in QUERIES
    ] == PRIORITY


def test_priority_names_all_registered_no_dups():
    """Every PRIORITY name must be a registered key (a typo would silently
    skip in _reorder and shift the verified window) and the list must be
    duplicate-free (a dup would silently shrink the window by one)."""
    missing = [k for k in PRIORITY if k not in QUERIES]
    assert not missing, f"PRIORITY names that are not registered keys: {missing}"
    dups = [k for k in set(PRIORITY) if PRIORITY.count(k) > 1]
    assert not dups, f"duplicate PRIORITY names: {dups}"


def test_every_sec2_id_is_a_registered_key():
    missing = [k for k in SEC2_COVERAGE if k not in QUERIES]
    assert not missing, f"§2 IDs without a queries() key: {missing}"


def test_every_sec2_id_covered_inside_window():
    win = set(window_keys())
    uncovered = {
        sec2: cover
        for sec2, (cover, _) in SEC2_COVERAGE.items()
        if cover not in win
    }
    assert not uncovered, f"§2 IDs whose covering key left the window: {uncovered}"


def test_builder_aliases_share_the_builder_object():
    for sec2, (cover, kind) in SEC2_COVERAGE.items():
        if kind == "builder":
            assert QUERIES[sec2] is QUERIES[cover], (sec2, cover)


def test_window_queries_all_have_oracles():
    # zero `no_oracle` rows inside the checked window (VERDICT r1 task #2)
    missing = [k for k in window_keys() if k not in ORACLES]
    assert not missing, f"windowed queries without an oracle: {missing}"


def test_llm_family_heads_the_tail():
    # if the driver's window is wider than 50, the LLM/pipeline family is
    # what gets verified next — not fn-variants or TPC-H extras
    tail = list(QUERIES)[WINDOW : len(PRIORITY)]
    assert "dedup_ngram_jaccard" in tail and "seq_pack" in tail


def test_first_window_plans_no_global_sort_into_single_partition(spark):
    """Scale gate over the whole verified head: no first-50 builder may
    plan a Sort or Window whose input is an Exchange SinglePartition —
    the one-task-sorts-everything shape. (A bare Exchange SinglePartition
    under a global HashAggregate is fine: partial aggregation reduces each
    partition to one row before the shuffle.) The global-order reporting
    tails (window_ntile, window_distribution, seq_pack_exact) are
    deliberately registered last and are NOT in this head."""
    import re

    from tests.conftest import SF_DIR

    bad = {}
    for name in window_keys():
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"(Sort|Window) [^\n]*\n[^\n]*Exchange SinglePartition",
                      plan)
        if m:
            bad[name] = m.group(0)
    assert not bad, f"single-partition sort/window in the verified head: {bad}"


def test_window_rolling_range_salted_matches_and_splits_key(spark):
    """The time-block-salted rolling window is value-identical to the
    keyed form, and its exchange hashes (user_id, block) — a hot user
    spreads over its active hours instead of melting one task."""
    from tests.conftest import SF_DIR

    base = QUERIES["window_rolling_range"](spark, SF_DIR)
    salted = QUERIES["window_rolling_range_salted"](spark, SF_DIR)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan
    assert "__blk" in plan.split("hashpartitioning(user_id", 1)[1].split(")", 1)[0]
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


def test_bench_and_sweep_lists_reference_registered_keys():
    """A typo in bench.HEADLINE or scaling_check's lists must fail HERE,
    not silently skip a query from the measurement artifacts."""
    import bench
    from scripts import scaling_check as sc
    from etl_backend_spark.registry import QUERIES

    for name in bench.HEADLINE:
        assert name in QUERIES or name in bench.BENCH_EXTRA, \
            f"bench.HEADLINE: {name}"
    for name in sc.SF1_QUERIES + sc.EXTRA:
        assert name in QUERIES, f"scaling_check: {name}"


def test_first_50_sequence_equals_correctness_r05_key_list():
    """The driver window has been byte-stable for three rounds; an import
    reorder could silently rotate it. Pin the EXACT first-50 sequence to
    the key list the driver recorded in CORRECTNESS_r05.json (VERDICT r5
    task 8)."""
    import json
    import pathlib

    r05 = json.loads(
        (pathlib.Path(__file__).parent.parent / "CORRECTNESS_r05.json")
        .read_text()
    )
    assert window_keys() == list(r05)[:WINDOW]

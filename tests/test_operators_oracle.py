"""Oracle-parity spot checks at sf0.001 (the full sweep is
tests/oracle_check.py / the driver's own gate; this keeps the invariant
under pytest)."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tests.oracle_check import normalize

FAST_QUERIES = [
    "pricing_summary",
    "filter_project",
    "join_dim_rollup",
    "top_revenue_orders",
    "count_star",
    "events_max_ts",
    "customers_without_orders",
    "top_orders_per_customer",
    "dedup_exact_summary",
    "cross_source_overlap",
    "doc_fingerprints",
    "knn_bruteforce",
    "cdc_apply_envelopes",
    "custdist_orders",
    "shipping_priority",
    "event_funnel",
    "doc_repetition_stats",
    "stratified_sample_summary",
    "doc_chunking",
    "sequence_packing_summary",
]


def _registries():
    import onehouse_demos_spark.operators as ops

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    qs.update(ops.extra_queries())
    oracles.update(ops.extra_oracles())
    return qs, oracles


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    qs, oracles = _registries()
    sdf = qs[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(oracles[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert normalize(srows, sdf.columns) == normalize(orows, ocols)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_every_query_has_oracle():
    """Since r3 even the trained-quantizer ANN queries replay their
    training in SQL (operators/ann_oracle_sql.py), so EVERY registered
    query must ship a DuckDB oracle — no rows-only escape hatch."""
    qs, oracles = _registries()
    missing = set(qs) - set(oracles)
    assert missing == set(), f"queries without oracle: {missing}"


def test_driver_window_covers_distinct_operator_classes():
    """The driver verifies the FIRST 50 registered queries; pin that the
    priority window is exactly the 50 distinct operator classes and that
    every north-star LLM-pipeline operator lands inside it."""
    import onehouse_demos_spark.operators as ops

    names = list(entrymod.queries())
    window = names[:50]
    assert len(ops._WINDOW) == 50
    assert window == ops._WINDOW
    must_have = {
        "near_dup_canonical",
        "text_stats", "multimodal_features", "streaming_hourly_counts",
        "sql_dml_pipeline",
        # r6 rotation: the signature work is driver-verified
        # (knn_ivf_trained and asof_prior_click rotated out r12; ANN
        # class stays covered by pq_adc_topk + ann_index_*)
        "tbl_iceberg_personality_read",
        "semantic_dedup_keep", "tbl_schema_evolved_read",
        # r8 rotation: index-routed SQL DML, bucket layout, the
        # partial_update payload and the secondary-index read
        # (minhash_lsh_pairs demoted — near_dup_canonical recomputes
        # and verifies the LSH pair stage internally)
        # (tbl_secondary_pruned_read rotated out late-r11 for the
        # record_index point read; its index-pruned-read plan class
        # stays covered by tbl_rli_upsert_read + tbl_hudi_rli_point_read)
        "sql_dml_indexed_pipeline", "tbl_bucket_upsert_read",
        "tbl_partial_update_read",
        "quality_classifier_scores",
        # r9 rotation survivors still in-window (several r9/r10 rows
        # rotated back out in r11 — driver-green for 1-2 rounds, plan
        # classes covered by in-window representatives)
        "tbl_hudi_personality_read", "tbl_bootstrap_upsert_read",
        # r10 rotation survivors (VERDICT r9 ask #6): the Hudi MOR
        # legs and the consistent-engine split pipeline stay PINNED
        "tbl_hudi_mor_read", "tbl_hudi_rt_read", "tbl_bucket_split_read",
        "bm25_topk",
        # r11 rotation (VERDICT r10 ask #4) survivors: the r11
        # hash-fails stay PINNED with their r12 floor-quantized
        # contracts; the rest of the r11 cohort rotated back out r12.
        "pq_adc_topk", "ann_index_search", "ann_index_incremental",
        "dsir_importance_weights", "events_gapfill",
        "value_quantile_sketch",
        "tbl_hudi_stats_planned_read",
        # r12 rotation (VERDICT r11 ask #4): ten never-driver-checked
        # queries enter the window
        "tbl_hudi_bloom_point_read", "events_ohlc_bars",
        "pq_reconstruction_summary", "unigram_logprob_scores",
        "streaming_session_counts", "streaming_click_attribution",
        "doc_chunking", "sequence_packing_summary",
        "tfidf_topk_terms", "shingle_containment_pairs",
        # late-r11: the record_index metadata partition's exact
        # point-read planning (this session's flagship)
        "tbl_hudi_rli_point_read",
    }
    assert must_have <= set(window)
    qs, oracles = _registries()
    dangling = set(oracles) - set(qs)
    assert dangling == set(), f"oracles without query: {dangling}"

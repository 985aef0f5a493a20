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
        "sql_dml_pipeline", "asof_prior_click",
        # r6 rotation: the signature work is driver-verified
        "tbl_iceberg_personality_read", "knn_ivf_trained",
        "semantic_dedup_keep", "tbl_schema_evolved_read",
        # r8 rotation: index-routed SQL DML, bucket layout, the
        # partial_update payload and the secondary-index read
        # (minhash_lsh_pairs demoted — near_dup_canonical recomputes
        # and verifies the LSH pair stage internally)
        "sql_dml_indexed_pipeline", "tbl_bucket_upsert_read",
        "tbl_partial_update_read", "tbl_secondary_pruned_read",
        "quality_classifier_scores",
        # r9 rotation: never-driver-checked signatures take the slots
        # of r8-green plan-shape-covered rows (VERDICT r8 ask #4);
        # r10 moved tbl_bucket_mor_read and doc_repetition_removal
        # back out (driver-green in r9, plan classes stay covered by
        # tbl_bucket_upsert_read/tbl_bucket_split_read and
        # text_stats/gopher_quality_flags)
        "tbl_hudi_personality_read", "tbl_bootstrap_upsert_read",
        "tbl_expr_pruned_read",
        "leakage_free_split",
        "returned_item_report", "forecast_revenue_change",
        "epoch_shuffle_order", "length_bucket_batches",
        # r10 rotation (VERDICT r9 ask #6): this round's flagships —
        # the Hudi MOR compact-on-sync read and the consistent-engine
        # split pipeline — plus the long-unchecked signatures
        "tbl_hudi_mor_read", "tbl_hudi_rt_read", "tbl_bucket_split_read",
        "tbl_clustered_snapshot", "sessionize_events",
        "minhash_lsh_pairs", "bm25_topk", "sole_late_supplier",
        "gopher_quality_flags", "contamination_check",
    }
    assert must_have <= set(window)
    qs, oracles = _registries()
    dangling = set(oracles) - set(qs)
    assert dangling == set(), f"oracles without query: {dangling}"

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
        "multimodal_features", "sql_dml_pipeline",
        "tbl_bucket_upsert_read", "tbl_partial_update_read",
        # Personality/metadata reads stay PINNED in r13: the round
        # rewrote the Delta and Iceberg publish paths onto the
        # ObjectStoreClient seam, and these driver rows verify the
        # seam-materialized layouts externally.
        "tbl_delta_personality_read", "tbl_iceberg_personality_read",
        "tbl_hudi_personality_read", "tbl_hudi_mor_read",
        "tbl_hudi_rt_read", "tbl_bucket_split_read",
        "tbl_hudi_stats_planned_read", "tbl_hudi_bloom_point_read",
        "tbl_hudi_rli_point_read",
        # log-domain canaries (class retired on two consecutive
        # greens, VERDICT r13 ask #8): one standing representative
        # plus the incoming bigram row
        "unigram_logprob_scores", "bigram_perplexity_scores",
        # r12 rotation survivors still in the window
        "events_ohlc_bars",
        "sequence_packing_summary",
        "shingle_containment_pairs",
        "pq_adc_topk", "ann_index_incremental",
        # r14 rotation (VERDICT r13 ask #1): the last never-checked
        # registered rows + the new update-export flagship
        "tbl_iceberg_delete_read", "tbl_iceberg_update_read",
        "tbl_delta_update_read",
        "bracketed_revenue", "duplicate_passage_stats",
        "multimodal_metadata",
        # r13 rotation (VERDICT r12 ask #2): fourteen never-checked
        # registered queries enter the window
        "bpe_pair_candidates", "domain_mixture_weights",
        "important_part_value", "quality_filter_gate",
        "pii_redaction_stats", "dataset_split_summary",
        "stratified_sample_summary", "idle_customer_balance",
        "large_volume_customers", "priority_delayed_orders",
        "nation_trade_volume", "regional_market_share",
        "corpus_vocab_stats", "doc_repetition_stats",
    }
    assert must_have <= set(window)
    qs, oracles = _registries()
    dangling = set(oracles) - set(qs)
    assert dangling == set(), f"oracles without query: {dangling}"

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


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
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


def test_every_query_has_oracle_or_is_flagged():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(qs) - set(oracles)
    # Every query currently ships an oracle; flag regressions loudly.
    assert missing == set(), f"queries without oracle: {missing}"
    dangling = set(oracles) - set(qs)
    assert dangling == set(), f"oracles without query: {dangling}"

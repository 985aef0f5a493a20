"""Star-contraction connected components (large-star/small-star).

The existing min-label propagation (near_dup_canonical) is
O(diameter)-round; SCALING.md flags an adversarial long chain as the
case where it needs a different algorithm. These tests pin that
connected_components_star solves exactly that case in O(log^2 n)
rounds, and that it agrees with (a) a plain union-find on random
graphs and (b) the propagation operator on the real LSH pair graph.
"""

import random

import pytest

from onehouse_demos_spark.operators.dedup import (
    connected_components_star,
    near_dup_canonical,
    near_dup_components_star,
)
from tests.conftest import SF_DIR


def _labels(df):
    return {r.doc: r.lab for r in df.collect()}


def test_long_chain_converges_in_log_rounds(spark):
    # Path graph 0-1-2-...-120: diameter 120. Min-label propagation
    # would need ~120 rounds; star contraction must finish within 8
    # large+small pairs (log2(121)^2 ≈ 48 edge hops collapse per pair).
    n = 121
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    labels = _labels(connected_components_star(edges, max_rounds=8))
    assert set(labels) == set(range(n))
    assert set(labels.values()) == {0}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 300
    pairs = set()
    while len(pairs) < 260:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            pairs.add((u, v))
    # reference: plain union-find on the driver
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent[find(u)] = find(v)
    comp_min = {}
    touched = {u for p in pairs for u in p}
    for x in touched:
        comp_min.setdefault(find(x), set()).add(x)
    expect = {}
    for members in comp_min.values():
        m = min(members)
        for x in members:
            expect[x] = m

    edges = spark.createDataFrame(sorted(pairs), "a long, b long")
    got = _labels(connected_components_star(edges))
    assert got == expect


def test_duplicate_and_reversed_edges_are_harmless(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 1), (3, 4), (4, 3), (5, 5)], "a long, b long"
    )
    got = _labels(connected_components_star(edges))
    # self-loop (5,5) contributes no node; two components remain
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "a long, b long")
    assert connected_components_star(edges).count() == 0


def test_unconverged_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(edges, max_rounds=1)


def test_matches_propagation_on_lsh_graph(spark):
    a = {
        (r.doc_id, r.canonical_id)
        for r in near_dup_canonical(spark, SF_DIR).collect()
    }
    b = {
        (r.doc_id, r.canonical_id)
        for r in near_dup_components_star(spark, SF_DIR).collect()
    }
    assert a == b and len(a) > 0

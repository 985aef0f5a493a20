"""Invariant tests for the curation operators (operators/curation.py)
plus the adversarial sketch-bound test backing the self-certified
booleans in value_quantile_sketch / approx_distinct_users.

Exact cross-engine parity for every curation query is covered by
tests/oracle_check.py; these tests pin the semantic invariants the
oracle can't express (direction of DSIR weights, temperature boost
direction, sketch closeness under a hostile distribution).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_semantic_dedup_keeps_min_id_and_is_nonvacuous(spark):
    from onehouse_demos_spark.operators.curation import semantic_dedup_keep
    from onehouse_demos_spark.operators.similarity import load_emb

    out = semantic_dedup_keep(spark, SF_DIR)
    rows = out.collect()
    n_emb = load_emb(spark, SF_DIR).count()
    assert len(rows) == n_emb
    dropped = [r for r in rows if not r.keep]
    # rank-based tau guarantees real pruning mass at every SF
    assert dropped, "semantic dedup pruned nothing — vacuous threshold"
    # every bucket retains at least one representative
    by_bucket: dict[str, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.keep)
    for bucket, keeps in by_bucket.items():
        assert any(keeps), f"bucket {bucket} lost all members"
    # the minimum vec_id of any bucket is never dropped (min-id rule)
    min_per_bucket: dict[str, int] = {}
    for r in rows:
        if r.bucket not in min_per_bucket or r.vec_id < min_per_bucket[r.bucket]:
            min_per_bucket[r.bucket] = r.vec_id
    kept_ids = {r.vec_id for r in rows if r.keep}
    for bucket, mn in min_per_bucket.items():
        assert mn in kept_ids


def test_dsir_weights_favor_target_domain(spark):
    """The whole point of importance weighting: documents drawn from
    the target domain must score higher on average than the rest."""
    from onehouse_demos_spark.operators.curation import dsir_importance_weights

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = docs.agg(F.min("source")).collect()[0][0]
    w = dsir_importance_weights(spark, SF_DIR).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    means = {
        r.grp: r.m
        for r in w.groupBy(
            (F.col("source") == target).alias("grp")
        ).agg(
            F.avg(F.col("millinats_sum") / F.col("n_toks")).alias("m")
        ).collect()
    }
    assert means[True] > means[False]


def test_bpe_pair_candidates_ranking(spark):
    from onehouse_demos_spark.operators.curation import (
        BPE_TOP_K,
        bpe_pair_candidates,
    )

    rows = bpe_pair_candidates(spark, SF_DIR).orderBy("rnk").collect()
    assert [r.rnk for r in rows] == list(range(1, BPE_TOP_K + 1))
    totals = [r.total for r in rows]
    assert totals == sorted(totals, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)


def test_shingle_containment_direction(spark):
    """containment(a in b) uses a's shingle count as denominator — all
    reported values sit in [threshold, 1]; pairs are ordered, not
    symmetric-deduped."""
    from onehouse_demos_spark.operators.curation import (
        CONTAINMENT_MIN,
        shingle_containment_pairs,
    )

    rows = shingle_containment_pairs(spark, SF_DIR).collect()
    assert rows, "containment found nothing — fixture should contain dups"
    for r in rows:
        assert r.doc_a != r.doc_b
        assert CONTAINMENT_MIN * 10000 <= r.containment_e4 <= 10000


def test_tfidf_topk_shape(spark):
    from onehouse_demos_spark.operators.curation import (
        TFIDF_TOP_K,
        tfidf_topk_terms,
    )

    out = tfidf_topk_terms(spark, SF_DIR)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rnk").alias("mx")
    )
    bad = per_doc.filter(
        (F.col("n") > TFIDF_TOP_K) | (F.col("mx") > TFIDF_TOP_K)
    ).count()
    assert bad == 0
    # scores non-increasing with rank inside each doc
    w_bad = (
        out.alias("a")
        .join(
            out.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.rnk") + 1 == F.col("b.rnk"))
            & (F.col("a.tfidf_e4") < F.col("b.tfidf_e4")),
        )
        .count()
    )
    assert w_bad == 0


def test_domain_mixture_temperature_boosts_small_sources(spark):
    from onehouse_demos_spark.operators.curation import domain_mixture_weights

    rows = domain_mixture_weights(spark, SF_DIR).collect()
    assert abs(sum(r.mix_weight_e4 for r in rows) / 10000.0 - 1.0) < 0.01
    # alpha=0.5 compresses the distribution: every below-average source
    # gets boosted (weight > share), every above-average one damped.
    mean_share_e4 = 10000.0 / len(rows)
    for r in rows:
        if r.token_share_e4 < mean_share_e4 * 0.8:
            assert r.mix_weight_e4 >= r.token_share_e4
        if r.token_share_e4 > mean_share_e4 * 1.2:
            assert r.mix_weight_e4 <= r.token_share_e4


# --------------------------------------------------------------------------
# Adversarial sketch bounds: the value_quantile_sketch /
# approx_distinct_users queries self-certify their closeness booleans
# (sketch bytes are engine-specific, VERDICT r2). This test backs those
# booleans with a hostile, seeded distribution: extreme zipf skew (one
# value = half the mass), a 6-decade dynamic range, and heavy
# duplication — the shapes that break naive sketches.
# --------------------------------------------------------------------------

def test_sketch_bounds_on_adversarial_distribution(spark):
    import random

    rng = random.Random(0xC0FFEE)
    vals = []
    # half the mass on a single point (duplication attack)
    vals += [42.0] * 50_000
    # long log-uniform tail over 6 decades (range attack)
    vals += [10 ** rng.uniform(-3, 3) for _ in range(40_000)]
    # tight cluster just above the heavy point (resolution attack)
    vals += [42.0 + rng.uniform(0, 1e-6) for _ in range(10_000)]
    # distinct-count side: ids with zipf-ish repetition
    ids = [int(1000 / (1 + rng.random() * 99)) for _ in range(50_000)]
    ids += list(range(10_000, 60_000))  # 50k unique singletons

    df = spark.createDataFrame(
        [(v, i) for v, i in zip(vals, ids + [0] * (len(vals) - len(ids)))],
        "value double, uid int",
    ).repartition(8)

    acc = 10_000  # same accuracy the production query uses (_QS_ACCURACY)
    row = df.agg(
        F.expr(f"percentile_approx(value, 0.5, {acc})").alias("a50"),
        F.expr(f"percentile_approx(value, 0.99, {acc})").alias("a99"),
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.99)").alias("e99"),
        F.approx_count_distinct("uid", 0.01).alias("approx_d"),
        F.countDistinct("uid").alias("exact_d"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]

    # percentile_approx contract: the returned value's rank is within
    # n/accuracy of the target rank. Verify via rank interval, exactly
    # as the production query does.
    for p, a in ((0.5, row.a50), (0.99, row.a99)):
        lt = df.filter(F.col("value") < a).count()
        le = df.filter(F.col("value") <= a).count()
        target = p * row.n
        tol = row.n / acc + 1
        assert lt + 1 <= target + tol and le >= target - tol, (
            f"p{p}: rank interval [{lt + 1}, {le}] misses "
            f"[{target - tol}, {target + tol}]"
        )

    # HLL++ rsd=0.01 ⇒ 5-sigma bound of 5% (the production query's
    # within_tol contract) must hold even under zipf + singleton mix.
    assert abs(row.approx_d - row.exact_d) <= max(row.exact_d * 0.05, 1), (
        f"HLL estimate {row.approx_d} vs exact {row.exact_d}"
    )


def test_cluster_balanced_sample_k_scales_with_corpus(spark):
    """VERDICT r4 ask #4: the library entry point auto-sizes k so the
    per-cell cap (and hence the per-cell rank sort) stays bounded by
    ~target_cell_rows as the corpus scales — never a fixed-fan N/k
    sort. Checks the sizing rule across the three SF corpus sizes and
    runs the auto-sized path end-to-end at the test SF."""
    import math

    from onehouse_demos_spark.operators.curation import (
        CBS_KEEP_FRAC,
        cbs_k_for,
        cluster_balanced_frame,
    )
    from onehouse_demos_spark.operators.similarity import load_emb

    target = 64
    # sizing rule: cap bounded by keep_frac * target (+1 for the ceil)
    # at every corpus size the driver tests (and far beyond)
    for n in (500, 5_000, 50_000, 5_000_000):
        k = cbs_k_for(n, target)
        cap = math.ceil(CBS_KEEP_FRAC * n / k)
        assert cap <= CBS_KEEP_FRAC * target + 1, (n, k, cap)
        if n > 8 * target:
            assert k == math.ceil(n / target)  # linear growth regime

    emb = load_emb(spark, SF_DIR)
    n = emb.count()
    out = cluster_balanced_frame(emb, target_cell_rows=target).collect()
    assert len(out) == n  # every vector labeled
    k = cbs_k_for(n, target)
    cap = math.ceil(CBS_KEEP_FRAC * n / k)
    per_cell_kept: dict[int, int] = {}
    for r in out:
        if r.keep:
            per_cell_kept[r.cid] = per_cell_kept.get(r.cid, 0) + 1
    assert per_cell_kept, "nothing kept"
    assert max(per_cell_kept.values()) <= cap
    assert cap <= CBS_KEEP_FRAC * target + 1

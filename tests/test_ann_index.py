"""Persistent IVF-PQ index: build → load (fresh object) → search must
approximate brute force, and the query scan must physically prune
unprobed cells (file-level partition pruning over the codes table)."""

import glob

from pyspark.sql import functions as F

from onehouse_demos_spark.operators.ann_index import AnnIndex
from onehouse_demos_spark.operators.similarity import knn_bruteforce, load_emb
from tests.conftest import SF_DIR


def _build(spark, tmp_base):
    emb = load_emb(spark, SF_DIR)
    return AnnIndex.build(
        emb, tmp_base + "/idx", k_coarse=8, m=8, k_pq=16, iters=3
    )


def test_build_load_search_recall(spark, tmp_base):
    _build(spark, tmp_base)
    idx = AnnIndex.load(spark, tmp_base + "/idx")  # fresh: from disk only
    emb = load_emb(spark, SF_DIR)
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()
        .v
    )
    hits = idx.search(
        list(q),
        top_k=10,
        nprobe=4,
        shortlist=64,
        rerank_with=emb,
        exclude_vec_id=0,
    ).collect()
    assert len(hits) == 10
    exact = [r.vec_id for r in knn_bruteforce(spark, SF_DIR).collect()]
    recall = len({r.vec_id for r in hits} & set(exact)) / len(exact)
    assert recall >= 0.5, (exact, [r.vec_id for r in hits])


def test_search_prunes_unprobed_cells(spark, tmp_base):
    idx = _build(spark, tmp_base)
    emb = load_emb(spark, SF_DIR)
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()
        .v
    )
    cells = idx.probe_cells(list(q), nprobe=2)
    scan = spark.read.parquet(tmp_base + "/idx/codes").filter(
        F.col("cell").isin(cells)
    )
    # the cell predicate must reach the scan as a PARTITION filter
    # (file-level pruning), not a post-scan row filter
    plan = scan._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], plan[:1500]
    # and the probed cells hold strictly fewer rows than the index
    import duckdb

    con = duckdb.connect()
    per_cell = dict(
        con.execute(
            "SELECT cell, COUNT(*) FROM read_parquet("
            f"'{tmp_base}/idx/codes/*/*.parquet', hive_partitioning=true) "
            "GROUP BY cell"
        ).fetchall()
    )
    expect = sum(per_cell[c] for c in cells)
    assert scan.count() == expect < sum(per_cell.values())


def test_index_is_externally_readable(spark, tmp_base):
    """The index is plain parquet — an external engine (DuckDB) can
    scan the codes of one cell, mirroring the lakehouse property that
    derived tables stay open-format."""
    import duckdb

    idx = _build(spark, tmp_base)
    con = duckdb.connect()
    n_codes = con.execute(
        "SELECT COUNT(*), MIN(len(codes)), MAX(len(codes)) FROM "
        f"read_parquet('{tmp_base}/idx/codes/*/*.parquet')"
    ).fetchone()
    assert n_codes[0] == idx.meta["n_vectors"]
    assert n_codes[1] == n_codes[2] == idx.meta["m"]


def test_filtered_search_prefilters_candidates(spark, tmp_base):
    """Filtered ANN: the metadata predicate restricts candidates
    BEFORE scoring (pre-filter semantics), so every hit satisfies it
    and the shortlist never collapses to fewer eligible results."""
    idx = _build(spark, tmp_base)
    emb = load_emb(spark, SF_DIR)
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()
        .v
    )
    qlabel = emb.filter(F.col("vec_id") == 0).first().label
    allowed = emb.filter(F.col("label") != qlabel).select("vec_id")
    hits = idx.search(
        list(q),
        top_k=10,
        nprobe=8,  # all cells: isolate the filter's effect
        rerank_with=emb,
        exclude_vec_id=0,
        allowed=allowed,
    ).collect()
    assert len(hits) == 10
    labels = {
        r.vec_id: r.label
        for r in emb.select("vec_id", "label").collect()
    }
    assert all(labels[r.vec_id] != qlabel for r in hits)


def test_add_batch_incremental_insert(spark, tmp_base):
    """r6: `add_batch` appends vectors with FROZEN quantizers — the
    full index must contain every vector, recall vs brute force holds,
    existing code files are never rewritten, and meta.n_vectors
    tracks the appends across a reload."""
    import json
    import os

    emb = load_emb(spark, SF_DIR)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    idx = AnnIndex.build(
        half_a, tmp_base + "/inc", k_coarse=8, m=8, k_pq=16, iters=3
    )
    before_files = sorted(
        glob.glob(tmp_base + "/inc/codes/**/*.parquet", recursive=True)
    )
    before_mtimes = {p: os.path.getmtime(p) for p in before_files}
    n_b = half_b.count()
    assert idx.add_batch(half_b) == n_b
    # append-only: no pre-existing file rewritten or removed
    for p in before_files:
        assert os.path.getmtime(p) == before_mtimes[p]
    # every vector present exactly once in the codes table
    codes = spark.read.parquet(tmp_base + "/inc/codes")
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == emb.count()
    # reload from disk: meta carries the running total
    idx2 = AnnIndex.load(spark, tmp_base + "/inc")
    assert idx2.meta["n_vectors"] == emb.count()
    # recall against brute force stays useful (same gate shape as the
    # full-build test: >= 5 of exact top-10 inside the reranked top-10)
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .first()
        .v
    )
    hits = [
        r.vec_id
        for r in idx2.search(
            list(q), top_k=10, nprobe=4, shortlist=64,
            rerank_with=emb, exclude_vec_id=0,
        ).collect()
    ]
    exact = [r.vec_id for r in knn_bruteforce(spark, SF_DIR).collect()]
    assert len(set(hits) & set(exact)) >= 5
    # appended rows land INSIDE existing cell partitions (pruning
    # unaffected): no new top-level partition dirs beyond k_coarse
    cells = {
        d for d in os.listdir(tmp_base + "/inc/codes")
        if d.startswith("cell=")
    }
    assert len(cells) <= 8


def test_add_batch_empty_is_noop(spark, tmp_base):
    emb = load_emb(spark, SF_DIR)
    idx = AnnIndex.build(
        emb, tmp_base + "/noop", k_coarse=8, m=8, k_pq=16, iters=3
    )
    n0 = idx.meta["n_vectors"]
    assert idx.add_batch(emb.filter(F.lit(False))) == 0
    assert AnnIndex.load(spark, tmp_base + "/noop").meta["n_vectors"] == n0


def test_ann_oracle_ctes_all_materialized():
    """r14: every CTE in the generated k-means oracles must be AS
    MATERIALIZED — DuckDB inlines plain CTEs at each reference site,
    and the Lloyd-round chain references each round's centroid CTE
    twice, so one unmaterialized definition regresses the oracle to
    O(2^iters) re-evaluation (ann_index_search: 28 s vs 0.6 s at
    sf0.01). No Spark session needed: this checks the SQL text."""
    import re

    from onehouse_demos_spark.operators.ann_oracle_sql import (
        ann_index_search_sql,
        knn_ivf_trained_sql,
        pq_adc_topk_sql,
    )

    # r15 (ADVICE r14): deliberately NOT the rewrite's column-0 regex —
    # a CTE definition is the only construct in these templates where
    # `AS` is immediately followed by an opening paren (column aliases
    # are `expr AS name`, table aliases put the paren after the name),
    # so any position-independent `AS (` hit is an unmaterialized CTE,
    # including one a future template indents past the rewrite regex.
    plain_cte = re.compile(r"\bAS\s+\(", re.IGNORECASE)
    for sql in (
        knn_ivf_trained_sql(),
        pq_adc_topk_sql(),
        ann_index_search_sql(),
        ann_index_search_sql(train_pred="id % 2 = 0"),
    ):
        assert not plain_cte.findall(sql), (
            "unmaterialized CTE definition in ANN oracle SQL"
        )
        assert "AS MATERIALIZED (" in sql

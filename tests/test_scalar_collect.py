"""r15 focused tests for the two scoped-conf optimizations:

- tables.table._scalar_rows: metadata-scale collects run in a
  dedicated AQE-off session (single submitted job) WITHOUT ever
  touching the caller session's conf, and return exactly what
  .collect() returns.
- operators.similarity._lloyd_scope: scoped conf flip fires only for
  tiny inputs, restores every touched key (including on error), and
  training results are identical with the scope on and off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark.operators import similarity
from onehouse_demos_spark.tables import table as tablemod

from tests.conftest import SF_DIR


def test_scalar_rows_matches_collect_and_leaves_conf_alone(spark):
    df = (
        spark.range(0, 1000)
        .select(
            (F.col("id") % 7).alias("k"),
            F.col("id").alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    before_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    got = sorted(tuple(r) for r in tablemod._scalar_rows(df))
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    # the caller session's conf is untouched (the bypass uses an
    # isolated newSession, never a global flip)
    assert spark.conf.get("spark.sql.adaptive.enabled") == before_aqe
    # the dedicated session is created once and reused
    s1 = spark._oh_scalar_session
    tablemod._scalar_rows(df.limit(1))
    assert spark._oh_scalar_session is s1
    assert s1.conf.get("spark.sql.adaptive.enabled") == "false"
    # no global temp view leaks behind
    leftover = [
        v.name
        for v in spark.catalog.listTables("global_temp")
        if v.name.startswith("__oh_scalar_")
    ]
    assert leftover == []


def test_scalar_rows_flag_off_falls_back_to_plain_collect(spark):
    df = spark.range(5).agg(F.sum("id").alias("s"))
    old = tablemod._SCALAR_COLLECT
    tablemod._SCALAR_COLLECT = False
    try:
        assert [tuple(r) for r in tablemod._scalar_rows(df)] == [(10,)]
    finally:
        tablemod._SCALAR_COLLECT = old


def test_lloyd_scope_restores_conf_even_on_error(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = emb.select("vec_id", F.col("embedding").alias("v"))
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    with similarity._lloyd_scope(vecs):
        pass  # guard decides; either way the exit must restore
    for k, v in prev.items():
        assert spark.conf.get(k) == v
    with pytest.raises(RuntimeError):
        with similarity._lloyd_scope(vecs):
            raise RuntimeError("boom")
    for k, v in prev.items():
        assert spark.conf.get(k) == v


def test_lloyd_training_identical_with_scope_on_and_off(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    old = similarity._LLOYD_COALESCE
    try:
        similarity._LLOYD_COALESCE = False
        c_off = similarity.train_ivf_centroids(emb, k=4, iters=2)
        b_off = similarity.train_pq_codebooks(emb, m=4, k=4, iters=2)
        similarity._LLOYD_COALESCE = True
        c_on = similarity.train_ivf_centroids(emb, k=4, iters=2)
        b_on = similarity.train_pq_codebooks(emb, m=4, k=4, iters=2)
    finally:
        similarity._LLOYD_COALESCE = old
    assert c_on == c_off
    assert b_on == b_off

"""Bucketed table layout for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the join key. Writing BOTH tables bucketed by that key with
the same bucket count makes the join a zero-exchange zip of matching
buckets — Spark's native bucketing (hash-partitioned files + catalog
metadata) does the co-location once at write time and every subsequent
join, aggregation, or window on the bucket key reuses it.

This is the Spark-idiomatic answer to the reference's hand-tuned
`hoodie.*.shuffle.parallelism` and bucket-index options: declare the
layout, let the planner elide exchanges (`spark.sql.sources.
bucketing.enabled`, on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed catalog table. `sort_cols` adds
    within-bucket sort order (enables sort-merge without the sort).
    `path` makes it external (required when the session has no managed
    warehouse you want to write into)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket specs the physical plan contains NO Exchange —
    pinned by tests/test_plans.py::test_bucketed_join_is_shuffle_free."""
    return spark.table(left).join(spark.table(right), on=on, how=how)

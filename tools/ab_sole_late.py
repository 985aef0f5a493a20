"""Interleaved A/B: sole_late_supplier window flags vs single-pass
aggregate flags (r15 change candidate, VERDICT r14 ask #6: "fuse the
final aggregation into the window exchange"). The true fuse (one data
shuffle total) is impossible — the result is s_name-keyed, the flags
are l_orderkey-keyed — so the candidate removes the WINDOW instead:
the per-order flags and the sole-late-supplier pick become a second
hash aggregate over the SAME l_orderkey partitioning (no Sort, no
Window node, still one data shuffle + the tiny post-filter agg
exchange). Old/new alternate in one JVM; results asserted equal every
rep.

Usage: python tools/ab_sole_late.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from onehouse_demos_spark import get_spark  # noqa: E402
from onehouse_demos_spark.operators.analytics import (  # noqa: E402
    _Q21_CUTOFF,
    load,
    sole_late_supplier,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

spark = get_spark(
    app_name="ab-sole-late",
    extra_confs={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")


def new_variant(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.lit(_Q21_CUTOFF)
    per_supp = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            F.when(late, 1).otherwise(0).alias("_late_line"),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("_late_line").alias("n_late_lines"))
    )
    # second aggregate over the SAME partitioning (l_orderkey ⊆ keys):
    # no exchange, no sort. max_by key is 1 for the (unique, after the
    # n_late_supp = 1 filter) late supplier, 0 otherwise.
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.least(F.col("n_late_lines"), F.lit(1))).alias("n_late_supp"),
        F.max_by(
            F.struct("l_suppkey", "n_late_lines"),
            F.least(F.col("n_late_lines"), F.lit(1)),
        ).alias("late_supp"),
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    blocking = (
        per_order.filter(
            (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .select(
            "l_orderkey",
            F.col("late_supp.l_suppkey").alias("l_suppkey"),
            F.col("late_supp.n_late_lines").alias("n_late_lines"),
        )
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        blocking.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def run(fn):
    t0 = time.time()
    df = fn(spark, sf_dir)
    rows = df.collect()
    return time.time() - t0, [tuple(r) for r in rows]


# warm both
run(lambda s, d: sole_late_supplier(s, d))
run(new_variant)

times = {"old": [], "new": []}
ref = None
for i in range(reps):
    for tag, fn in (("old", sole_late_supplier), ("new", new_variant)):
        dt, got = run(fn)
        times[tag].append(dt)
        if ref is None:
            ref = got
        assert got == ref, f"MISMATCH {tag} rep {i}: {got} != {ref}"
        print(f"rep{i} {tag}: {dt:.3f}s")

for tag, ts in times.items():
    s = sorted(ts)
    print(
        f"{tag}: min {s[0]:.3f}  med {s[len(s) // 2]:.3f}  "
        f"runs {[round(x, 3) for x in ts]}"
    )
print("results identical across variants")

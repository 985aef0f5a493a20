"""Interleaved A/B of the three converted relational cells (VERDICT
r12 #5): adjudicate the r12 driver-window drift (+16-31% on
pricing_summary / top_revenue_orders / local_supplier_volume) by
timing the output-contract VARIANTS of each query on one box, in one
process, interleaved (the tbl_pipeline_build protocol from r12):

- r11: ROUND(SUM(double)) at the output edge (the pre-r12 contract)
- r12: narrow floor-quantized BIGINT sums (the converted contract)
- r13: the current module code (pricing_summary rides DECIMAL(38,0)
  wide accumulators + e4 derived prices per VERDICT r12 #6)

Usage: python tests/perf_ab_relational.py [sf_dir] [reps]
Prints min/median per (query, variant). Box-load differences cancel
because variants alternate within the same seconds.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

from onehouse_demos_spark import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from onehouse_demos_spark.operators.relational import (  # noqa: E402
    load,
    local_supplier_volume,
    pricing_summary,
    top_revenue_orders,
)

spark = get_spark(shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def pricing_r11(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def pricing_r12(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")

    def e2(col):
        return F.floor(col * 100).cast("long")

    q = e2(F.col("l_quantity"))
    bp = e2(F.col("l_extendedprice"))
    dp = e2(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ch = e2(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    disc = F.floor(F.col("l_discount") * 10000).cast("long")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(q).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(bp).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(dp).cast("double") / 100.0).alias("sum_disc_price"),
            (F.sum(ch).cast("double") / 100.0).alias("sum_charge"),
            (F.sum(q).cast("double") / (n.cast("double") * 100.0)).alias(
                "avg_qty"
            ),
            (F.sum(bp).cast("double") / (n.cast("double") * 100.0)).alias(
                "avg_price"
            ),
            (F.sum(disc).cast("double") / (n.cast("double") * 10000.0)).alias(
                "avg_disc"
            ),
            n.alias("count_order"),
        )
    )


def _rev_sum_r11(grouped):
    return F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
    )


def top_rev_r11(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    rev = li.groupBy("l_orderkey").agg(_rev_sum_r11(None).alias("rev"))
    return (
        orders.join(rev, orders.o_orderkey == rev.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderpriority",
                F.col("rev").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def local_vol_r11(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(_rev_sum_r11(None).alias("revenue"))
    )


CELLS = {
    "pricing_summary": {
        "r11": pricing_r11, "r12": pricing_r12, "r13": pricing_summary,
    },
    # top_revenue_orders / local_supplier_volume: r12 contract == r13
    # module code (unchanged this round), so the module IS the r12 arm.
    "top_revenue_orders": {"r11": top_rev_r11, "r12+13": top_revenue_orders},
    "local_supplier_volume": {
        "r11": local_vol_r11, "r12+13": local_supplier_volume,
    },
}


def main():
    times = {}
    # warm every plan once
    for qname, variants in CELLS.items():
        for vname, fn in variants.items():
            fn(spark, sf_dir).collect()
    for rep in range(reps):
        for qname, variants in CELLS.items():
            for vname, fn in variants.items():
                t0 = time.time()
                fn(spark, sf_dir).collect()
                times.setdefault((qname, vname), []).append(
                    time.time() - t0
                )
    for (qname, vname), ts in times.items():
        ts.sort()
        print(f"{qname:24s} {vname:7s} min={ts[0]:.3f} "
              f"med={ts[len(ts) // 2]:.3f}")


if __name__ == "__main__":
    main()

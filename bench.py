"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": pass1_total_sec, "value_min": sum_of_mins,
 "value_runs": [pass1_total, pass2_total], "unit": "sec",
 "queries": {name: min_sec, ...}, "sf": ...}

Each query is fully materialized (count + collect of the final frame)
so the number reflects end-to-end execution, not plan construction.

Noise defense (VERDICT r4 ask #1): the timed suite runs TWICE after
warmup and reports the per-query MIN of the passes ("queries" +
"value_min") alongside the pass-1 total ("value", comparable with the
single-pass totals of rounds 1-4). This box swings 38-42.5 s on
identical code (SCALING.md variance band); a loaded box inflates both
passes far less often than one, so min-of-passes is the number to
compare across rounds. r13: when the two pass totals disagree by
>15% (a transient spike hit one of them), ONE adaptive third pass
runs so every per-query min rests on at least two quiet candidates —
"value_runs" then carries three totals."""

from __future__ import annotations

import json
import os
import sys
import time

#: Headline suite: one representative per workload class (scan-agg,
#: filter-scan, broadcast star join, fact-fact join+topN, window,
#: anti-join, multi-way join, JSON decode, table upsert pipeline, MOR
#: merge read, exact dedup, minhash LSH, knn, text stats).
HEADLINE = [
    "pricing_summary",
    "filter_project",
    "join_dim_rollup",
    "top_revenue_orders",
    "top_orders_per_customer",
    "customers_without_orders",
    "local_supplier_volume",
    "events_json_extract",
    "events_max_ts",
    "rollup_status_priority",
    "asof_prior_click",
    "sessionize_events",
    "tbl_pipeline_build",
    "tbl_upsert_snapshot",
    "tbl_mor_snapshot",
    "tbl_incremental_read",
    "dedup_exact_summary",
    "minhash_lsh_pairs",
    "simhash64",
    "knn_bruteforce",
    "text_stats",
    "multimodal_metadata",
    "custdist_orders",
    "shipping_priority",
    "range_join_bands",
    "skew_safe_agg",
    "event_funnel",
    "doc_repetition_stats",
    "bm25_topk",
    "sole_late_supplier",
    "events_ohlc_bars",
    "unigram_logprob_scores",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from onehouse_demos_spark import get_spark

    spark = get_spark(
        app_name="onehouse-bench",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import onehouse_demos_spark.operators as ops

    qs = dict(entrymod.queries())
    # Demoted shape-duplicates are still benchmarked so per-round
    # timings stay comparable across rounds.
    qs.update(ops.extra_queries())

    # Steady-state warmup: touch each input table once and run one tiny
    # aggregate so JVM classloading, codegen compilation, and parquet
    # footer caching are not billed to whichever query happens to run
    # first. The timed loop below still executes every query end-to-end.
    # Every swallowed failure is ATTRIBUTED on stderr — a benchmark that
    # logs an aborted job with no attribution is hiding information.
    # events.parquet carries TIMESTAMP(NANOS); without this conf the
    # bare warmup read aborts a job (the r1 "stage 12" mystery).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for tbl in ("lineitem", "orders", "customer", "events", "documents",
                "embeddings"):
        try:
            spark.read.parquet(f"{sf_dir}/{tbl}.parquet").limit(1).count()
        except Exception as exc:
            print(f"# warmup table-touch {tbl} failed: {exc}", file=sys.stderr)
    spark.range(1000).selectExpr("sum(id)").collect()
    # Warm every headline plan at the smallest scale factor: identical
    # schemas → identical generated code → the timed loop below
    # measures steady-state execution at the sf under test, not
    # first-use codegen/JIT compilation. (The reference's own numbers
    # distinguish cold vs warm runs the same way — BASELINE.md.)
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF", "/root/testdata/sf0.001")
    if (
        os.path.isdir(warm_sf)
        and os.path.realpath(warm_sf) != os.path.realpath(sf_dir)
    ):
        for name in HEADLINE:
            try:
                if name == "tbl_pipeline_build":
                    from onehouse_demos_spark.operators import mutations

                    mutations._build(spark, warm_sf)
                else:
                    qs[name](spark, warm_sf).collect()
            except Exception as exc:
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)
    else:
        print(
            f"# warmup skipped (warm_sf={warm_sf!r} unavailable or equals "
            "sf under test) — first-query timings include JIT warmup",
            file=sys.stderr,
        )

    from onehouse_demos_spark.operators import mutations

    def calibration_run() -> float:
        """Fixed synthetic workload (constant data, constant plan,
        zero IO): range scan → hash/string CPU → shuffle agg → sort.
        Timed in the SAME JVM as the suite, so box-speed/load drift
        divides out of cross-round comparisons (VERDICT r8 wrong #3 —
        the 38-50 s identical-code swing): compare
        value_min / calibration_sec across rounds, not wall seconds."""
        t0 = time.time()
        (
            spark.range(0, 3_000_000, 1, 32)
            .selectExpr(
                "id",
                "md5(cast(id as string)) AS h",
                "cast(id % 997 as string) AS k",
                "id * 2.5 AS d",
            )
            .groupBy("k")
            .agg(
                {"d": "sum", "h": "max", "id": "count"}
            )
            .orderBy("k")
            .collect()
        )
        return time.time() - t0

    def calibrate(tag: str) -> tuple[float, list[float]]:
        runs = sorted(calibration_run() for _ in range(3))
        med = runs[1]
        print(
            f"# [{tag}] calibration: median {med:.3f}s runs="
            f"{[round(r, 3) for r in runs]}",
            file=sys.stderr,
        )
        return med, runs

    def run_pass(tag: str) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in HEADLINE:
            if name == "tbl_pipeline_build":
                # The 8-commit mutation pipeline (insert/upsert/delete/
                # overwrite/delete-partition + MOR insert/upsert/
                # compaction) is timed as its own entry; the tbl_* reads
                # below then measure read latency, not the writes they
                # depend on. The per-sf_dir build cache is dropped so
                # EVERY pass times a real build, never a cache hit.
                mutations._CACHE.pop(sf_dir, None)
                t0 = time.time()
                mutations._build(spark, sf_dir)
                timings[name] = round(time.time() - t0, 3)
                print(f"# [{tag}] {name}: {timings[name]:.2f}s",
                      file=sys.stderr)
                continue
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            df.collect()
            timings[name] = round(time.time() - t0, 3)
            print(f"# [{tag}] {name}: {timings[name]:.2f}s rows={n}",
                  file=sys.stderr)
        return timings

    cal1, cal1_runs = calibrate("c1")
    pass1 = run_pass("p1")
    calm, calm_runs = calibrate("cm")  # mid-suite sample (r11)
    pass2 = run_pass("p2")
    cal2, cal2_runs = calibrate("c2")
    passes = [pass1, pass2]
    # r13: a transient load spike inflating ONE pass leaves min-of-2
    # resting on a single clean sample (seen live: pass totals 95 s vs
    # 48 s inside one invocation). When the two pass totals disagree
    # by >15%, take one adaptive third pass so every per-query min has
    # at least two quiet candidates.
    t1, t2 = sum(pass1.values()), sum(pass2.values())
    if abs(t1 - t2) / max(min(t1, t2), 1e-9) > 0.15:
        print(
            f"# pass totals disagree ({t1:.1f}s vs {t2:.1f}s > 15%) — "
            "running adaptive third pass",
            file=sys.stderr,
        )
        passes.append(run_pass("p3"))
    calibration = round(min(cal1, cal2), 3)
    # r11: the r10->r11 A/B (SCALING.md) showed the min-of-two-medians
    # divisor swings ~±40% on IDENTICAL code while the suite total
    # moves ±5% — a 9-sample pooled median across three points in the
    # suite window is the stabler normalizer; legacy fields stay for
    # cross-round comparability.
    pooled_runs = sorted(cal1_runs + calm_runs + cal2_runs)
    pooled = round(pooled_runs[len(pooled_runs) // 2], 3)
    best = {n: min(p[n] for p in passes) for n in pass1}
    total1 = round(sum(pass1.values()), 3)
    value_min = round(sum(best.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                # pass-1 total: comparable with rounds 1-4 single-pass
                "value": total1,
                # sum of per-query mins: the noise-robust comparator
                "value_min": value_min,
                "value_runs": [round(sum(p.values()), 3) for p in passes],
                "unit": "sec",
                "queries": best,
                # r9: box-speed divisor — a fixed synthetic plan timed
                # in the same JVM before AND after the suite. Compare
                # value_min_norm (= value_min / calibration_sec) across
                # rounds; wall-second drift from box load divides out.
                "calibration_sec": calibration,
                "calibration_runs": [
                    round(cal1, 3),
                    round(calm, 3),
                    round(cal2, 3),
                ],
                "value_min_norm": (
                    round(value_min / calibration, 2) if calibration else None
                ),
                # r11: pooled-median calibration (9 samples across the
                # suite window) — the stabler divisor; compare this
                # across rounds alongside raw value_min
                "calibration_pooled": pooled,
                "value_min_norm_pooled": (
                    round(value_min / pooled, 2) if pooled else None
                ),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # r15 (VERDICT r14 ask #2, additions only): make the
                # core-count contract legible to the driver. This box's
                # sf inputs are single-row-group parquet files, so scan
                # stages run as ONE task at any core count and low/high
                # core ratios read flat — these fields let the driver
                # distinguish "contract honored but workload saturated"
                # from "env var ignored".
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
                "cpus_env": os.environ.get("SPARK_GRAFT_CPUS"),
            }
        )
    )
    return 0


#: Scaling-curve subset: the table-build pipeline + the most expensive
#: headline queries (the r3 plan-audit top 5). Growth exponents over
#: sf0.001 → 0.1 (100× data) put a measured slope behind the "survives
#: 100×" plan-shape arguments: a bucketed/broadcast-disciplined query
#: should fit t ≈ c·sf^e with e ≲ 1 (sub-linear apparent e is expected
#: at these sizes — fixed per-query overhead of ~0.3-0.5 s dominates
#: the small SFs).
SCALING_SUBSET = [
    "tbl_pipeline_build",
    "sole_late_supplier",
    "minhash_lsh_pairs",
    "local_supplier_volume",
    "top_revenue_orders",
    "tbl_mor_snapshot",
]

SCALING_SFS = ["0.001", "0.01", "0.1"]


def scaling_main() -> int:
    """`python bench.py --scaling`: run SCALING_SUBSET at every SF in
    SCALING_SFS and print ONE JSON line with per-SF timings and the
    least-squares log-log growth exponent per query."""
    import math

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from onehouse_demos_spark import get_spark
    from onehouse_demos_spark.operators import mutations

    spark = get_spark(
        app_name="onehouse-bench-scaling",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = dict(entrymod.queries())

    # warm codegen/classloading once at the smallest SF so the curve
    # reflects execution, not first-use JIT
    for name in SCALING_SUBSET:
        try:
            if name == "tbl_pipeline_build":
                mutations._build(spark, f"/root/testdata/sf{SCALING_SFS[0]}")
            else:
                qs[name](spark, f"/root/testdata/sf{SCALING_SFS[0]}").collect()
        except Exception as exc:
            print(f"# scaling warmup {name} failed: {exc}", file=sys.stderr)

    curves: dict[str, dict[str, float]] = {n: {} for n in SCALING_SUBSET}
    for sf in SCALING_SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        if not os.path.isdir(sf_dir):
            print(f"# scaling: {sf_dir} missing, skipped", file=sys.stderr)
            continue
        # mutation pipeline caches per sf_dir within a process — drop
        # the cache so each SF times a real build
        mutations._CACHE.pop(sf_dir, None)
        for name in SCALING_SUBSET:
            t0 = time.time()
            if name == "tbl_pipeline_build":
                mutations._build(spark, sf_dir)
            else:
                qs[name](spark, sf_dir).collect()
            curves[name][sf] = round(time.time() - t0, 3)
            print(f"# sf{sf} {name}: {curves[name][sf]:.2f}s", file=sys.stderr)

    exponents: dict[str, float] = {}
    for name, pts in curves.items():
        xy = [
            (math.log(float(sf)), math.log(t))
            for sf, t in pts.items()
            if t > 0
        ]
        if len(xy) >= 2:
            n = len(xy)
            mx = sum(x for x, _ in xy) / n
            my = sum(y for _, y in xy) / n
            denom = sum((x - mx) ** 2 for x, _ in xy)
            exponents[name] = round(
                sum((x - mx) * (y - my) for x, y in xy) / denom, 3
            )
    print(
        json.dumps(
            {
                "metric": "scaling_curve",
                "unit": "sec",
                "sfs": SCALING_SFS,
                "queries": curves,
                "exponents": exponents,
            }
        )
    )
    return 0


def upsert_rate_main() -> int:
    """`python bench.py --upsert-rate`: pure mutation-rate metric
    (VERDICT r5 ask #9). The headline suite is read-heavy; this times
    the WRITE path — the reference's core identity — directly:
    bulk-load `orders` at each SF, then upsert a 20% modified batch
    (every %5 key) and report records/sec plus the log-log growth
    exponent of the upsert latency. Run per-round; a write-path
    regression shows here before it shows anywhere else."""
    import math
    import shutil
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from onehouse_demos_spark import LakehouseTable, TableConfig, get_spark

    spark = get_spark(
        app_name="onehouse-bench-upsert",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]

    def build_and_upsert(sf_dir: str, tag: str):
        tmp = tempfile.mkdtemp(prefix="oh_upsert_bench_")
        try:
            orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                *cols
            )
            t = LakehouseTable.create(
                spark,
                f"{tmp}/t",
                TableConfig(
                    name=f"bench_orders_{tag}",
                    record_key=["o_orderkey"],
                    precombine="o_totalprice",
                ),
            )
            n_base = orders.count()
            t0 = time.time()
            t.bulk_insert(orders)
            load_s = time.time() - t0
            batch = orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") + 1.0
            )
            n_batch = batch.count()
            t0 = time.time()
            t.upsert(batch)
            upsert_s = time.time() - t0
            return n_base, load_s, n_batch, upsert_s
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    #: CDC-fragmented point-upsert comparison: a table built from
    #: FRAGMENTS interleaved key-slice commits (the state a
    #: streaming-upsert table is in between clusterings — every file
    #: spans the full key range, so range pruning is vacuous), probed
    #: with a batch confined to FRAGMENTS/8 slices and sized ABOVE the
    #: bloom probe cap (so the scan path must open every file's key
    #: column; the index reads only the touched hash buckets and
    #: returns exactly the touched slice files). Run once at the
    #: largest SF — the gap grows with file count, which is the point.
    FRAGMENTS = 64

    def fragmented_point(sf_dir: str, tag: str, record_index: bool):
        tmp = tempfile.mkdtemp(prefix="oh_frag_bench_")
        try:
            orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                *cols
            )
            t = LakehouseTable.create(
                spark,
                f"{tmp}/t",
                TableConfig(
                    name=f"bench_frag_{tag}",
                    record_key=["o_orderkey"],
                    precombine="o_totalprice",
                    record_index=record_index,
                ),
            )
            t0 = time.time()
            for i in range(FRAGMENTS):
                t.insert(
                    orders.filter(F.col("o_orderkey") % FRAGMENTS == i)
                )
            load_s = time.time() - t0
            point = orders.filter(
                F.col("o_orderkey") % FRAGMENTS < FRAGMENTS // 8
            ).withColumn("o_totalprice", F.col("o_totalprice") + 2.0)
            t0 = time.time()
            t.upsert(point)
            point_s = time.time() - t0
            return load_s, point_s
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # warm codegen/classloading on the smallest SF (uncounted)
    build_and_upsert(f"/root/testdata/sf{SCALING_SFS[0]}", "warm")

    rates: dict[str, dict] = {}
    for sf in SCALING_SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        if not os.path.isdir(sf_dir):
            print(f"# upsert-rate: {sf_dir} missing, skipped",
                  file=sys.stderr)
            continue
        n_base, load_s, n_batch, upsert_s = build_and_upsert(sf_dir, sf)
        rates[sf] = {
            "table_rows": n_base,
            "bulk_load_sec": round(load_s, 3),
            "bulk_load_rows_per_sec": round(n_base / load_s),
            "upsert_batch_rows": n_batch,
            "upsert_sec": round(upsert_s, 3),
            "upsert_rows_per_sec": round(n_batch / upsert_s),
        }
        print(f"# sf{sf}: load {n_base} rows in {load_s:.2f}s, "
              f"upsert {n_batch} rows in {upsert_s:.2f}s",
              file=sys.stderr)

    frag = {}
    top_sf = [sf for sf in SCALING_SFS
              if os.path.isdir(f"/root/testdata/sf{sf}")][-1:]
    for sf in top_sf:
        sf_dir = f"/root/testdata/sf{sf}"
        scan_load_s, scan_point_s = fragmented_point(
            sf_dir, f"{sf}_scan", record_index=False
        )
        rli_load_s, rli_point_s = fragmented_point(
            sf_dir, f"{sf}_rli", record_index=True
        )
        frag = {
            "sf": sf,
            "fragments": FRAGMENTS,
            "scan_load_sec": round(scan_load_s, 3),
            "scan_point_upsert_sec": round(scan_point_s, 3),
            "rli_load_sec": round(rli_load_s, 3),
            "rli_point_upsert_sec": round(rli_point_s, 3),
        }
        print(f"# fragmented sf{sf}: point upsert scan "
              f"{scan_point_s:.2f}s vs rli {rli_point_s:.2f}s "
              f"(load {scan_load_s:.2f}s vs {rli_load_s:.2f}s)",
              file=sys.stderr)

    xy = [
        (math.log(float(sf)), math.log(r["upsert_sec"]))
        for sf, r in rates.items()
        if r["upsert_sec"] > 0
    ]
    exponent = None
    if len(xy) >= 2:
        n = len(xy)
        mx = sum(x for x, _ in xy) / n
        my = sum(y for _, y in xy) / n
        denom = sum((x - mx) ** 2 for x, _ in xy)
        exponent = round(sum((x - mx) * (y - my) for x, y in xy) / denom, 3)
    print(json.dumps({
        "metric": "upsert_rate",
        "unit": "rows/sec",
        "sfs": list(rates),
        "rates": rates,
        "fragmented_point": frag,
        "upsert_latency_exponent": exponent,
    }))
    return 0


def upsert_crossover_main() -> int:
    """`python bench.py --upsert-crossover` (VERDICT r7 ask #8): the
    indexed-vs-scan point-upsert CROSSOVER as a measured curve over
    live-file count, not a one-size extrapolation. Fixed batch (the
    first 8 of 64 interleaved key slices — above the bloom probe cap,
    so the scan path must open every file's key column), fixed SF
    (largest present), file count swept by repartitioning each of the
    64 slice commits into 1 / 8 / 64 files (~64 / 512 / 4096 live
    files; insert preserves incoming partitioning by design). Reports per-path point-upsert
    seconds and the log-log file-count exponent of each path: the scan
    probe is expected near-linear in files, the index probe near-flat
    (touched buckets only)."""
    import math
    import shutil
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from onehouse_demos_spark import LakehouseTable, TableConfig, get_spark

    spark = get_spark(
        app_name="onehouse-bench-crossover",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    SLICES = 64

    sf = [s for s in SCALING_SFS if os.path.isdir(f"/root/testdata/sf{s}")][-1]
    orders = spark.read.parquet(f"/root/testdata/sf{sf}/orders.parquet").select(
        *cols
    ).persist()
    n_rows = orders.count()
    rows_per_commit = max(1, n_rows // SLICES)
    batch = orders.filter(
        F.col("o_orderkey") % SLICES < SLICES // 8
    ).withColumn("o_totalprice", F.col("o_totalprice") + 2.0).persist()
    n_batch = batch.count()

    def run(files_per_commit: int, record_index: bool):
        tmp = tempfile.mkdtemp(prefix="oh_xover_bench_")
        try:
            t = LakehouseTable.create(
                spark,
                f"{tmp}/t",
                TableConfig(
                    name=f"xover_{files_per_commit}_{record_index}",
                    record_key=["o_orderkey"],
                    precombine="o_totalprice",
                    record_index=record_index,
                ),
            )
            t0 = time.time()
            for i in range(SLICES):
                frag = orders.filter(F.col("o_orderkey") % SLICES == i)
                if files_per_commit > 1:
                    frag = frag.repartition(files_per_commit)
                t.insert(frag)
            load_s = time.time() - t0
            n_files = len(t.manifest.live_files())
            t0 = time.time()
            t.upsert(batch)
            point_s = time.time() - t0
            return n_files, load_s, point_s
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # warm (uncounted): smallest layout, both paths
    run(1, False)
    run(1, True)

    def slope(pts):
        if len(pts) < 2:
            return None
        n = len(pts)
        mx = sum(math.log(x) for x, _ in pts) / n
        my = sum(math.log(y) for _, y in pts) / n
        denom = sum((math.log(x) - mx) ** 2 for x, _ in pts)
        if denom == 0:
            return None
        return round(
            sum(
                (math.log(x) - mx) * (math.log(y) - my) for x, y in pts
            )
            / denom,
            3,
        )

    curve = []
    for fpc in (1, 8, 64):
        sc_files, sc_load, sc_point = run(fpc, record_index=False)
        ix_files, ix_load, ix_point = run(fpc, record_index=True)
        curve.append({
            "files_per_commit": fpc,
            "scan_files": sc_files,
            "scan_point_upsert_sec": round(sc_point, 3),
            "scan_load_sec": round(sc_load, 3),
            "rli_files": ix_files,
            "rli_point_upsert_sec": round(ix_point, 3),
            "rli_load_sec": round(ix_load, 3),
        })
        print(f"# files~{sc_files}: point upsert scan {sc_point:.2f}s "
              f"vs rli {ix_point:.2f}s (load {sc_load:.1f}s / "
              f"{ix_load:.1f}s)", file=sys.stderr)
    print(json.dumps({
        "metric": "upsert_crossover",
        "unit": "sec",
        "sf": sf,
        "batch_rows": n_batch,
        "curve": curve,
        "scan_file_exponent": slope(
            [(c["scan_files"], c["scan_point_upsert_sec"]) for c in curve]
        ),
        "rli_file_exponent": slope(
            [(c["rli_files"], c["rli_point_upsert_sec"]) for c in curve]
        ),
    }))
    return 0


def point_latency_main() -> int:
    """`python bench.py --point-latency` (r8; +mor r9): single-record
    CDC write latency across the key→file resolution strategies on
    the same fragmented ~4096-file table at the largest SF —
    stats+bloom scan probe, record-level index, bucket layout, and a
    NON-bucketed MOR table with live log files (r9's mor-stats pruned
    point read). Five sequential single-key upserts per variant
    (median + min reported), one 16-key micro-batch, and a timed
    single-key POINT READ through snapshot_for_keys with its probe
    diagnostics (mode, files_read/files_live). This is the shape a
    CDC tailer produces all day; the resolution strategy is the whole
    difference at high file counts."""
    import math  # noqa: F401  (kept for parity with sibling modes)
    import shutil
    import statistics
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from onehouse_demos_spark import LakehouseTable, TableConfig, get_spark

    spark = get_spark(
        app_name="onehouse-bench-pointlat",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    SLICES = 64
    FPC = 64  # files per commit (scan/rli); bucket writes 1/bucket

    sf = [s for s in SCALING_SFS if os.path.isdir(f"/root/testdata/sf{s}")][-1]
    orders = spark.read.parquet(
        f"/root/testdata/sf{sf}/orders.parquet"
    ).select(*cols).persist()
    orders.count()
    keys = [
        int(r[0])
        for r in orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(6)
        .collect()
    ]
    micro = orders.orderBy("o_orderkey").limit(16).withColumn(
        "o_totalprice", F.col("o_totalprice") + 7.0
    ).persist()
    micro.count()

    def build(variant: str) -> tuple[str, "LakehouseTable"]:
        tmp = tempfile.mkdtemp(prefix=f"oh_plat_{variant}_")
        t = LakehouseTable.create(
            spark,
            f"{tmp}/t",
            TableConfig(
                name=f"plat_{variant}",
                record_key=["o_orderkey"],
                precombine="o_totalprice",
                table_type="mor" if variant == "mor" else "cow",
                record_index=(variant == "rli"),
                bucket_index_buckets=64 if variant == "bucket" else None,
            ),
        )
        for i in range(SLICES):
            frag = orders.filter(F.col("o_orderkey") % SLICES == i)
            if variant != "bucket":
                frag = frag.repartition(FPC)
            t.insert(frag)
        if variant == "mor":
            # live log files: the case r9's mor-stats pruning covers
            for i in range(4):
                t.upsert(
                    orders.filter(F.col("o_orderkey") % 997 == i)
                    .withColumn(
                        "o_totalprice", F.col("o_totalprice") + 1.0
                    )
                )
        return tmp, t

    results = {}
    for variant in ("scan", "rli", "bucket", "mor"):
        tmp, t = build(variant)
        try:
            n_files = len(t.manifest.live_files())
            lat = []
            for k in keys[:5]:
                one = orders.filter(F.col("o_orderkey") == k).withColumn(
                    "o_totalprice", F.col("o_totalprice") + 5.0
                )
                t0 = time.time()
                t.upsert(one)
                lat.append(time.time() - t0)
            t0 = time.time()
            t.upsert(micro)
            micro_s = time.time() - t0
            # single-key POINT READ through the key-probe view (the
            # read half of point DML); mor exercises r9's mor-stats
            # pruned merge over (base ∪ log) candidates
            key_df = spark.createDataFrame(
                [(keys[5],)], "o_orderkey bigint"
            )
            t0 = time.time()
            t.snapshot_for_keys(key_df).count()
            read_s = time.time() - t0
            probe = getattr(t, "last_key_read_probe", {}) or {}
            results[variant] = {
                "files": n_files,
                "single_key_sec_median": round(statistics.median(lat), 3),
                "single_key_sec_min": round(min(lat), 3),
                "single_key_runs": [round(x, 3) for x in lat],
                "micro_batch16_sec": round(micro_s, 3),
                "point_read_sec": round(read_s, 3),
                "read_mode": probe.get("mode"),
                "read_files": probe.get("files_read"),
                "live_files": probe.get("files_live"),
            }
            print(f"# {variant}: files={n_files} single-key median "
                  f"{statistics.median(lat):.2f}s min {min(lat):.2f}s "
                  f"micro16 {micro_s:.2f}s", file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "metric": "point_latency",
        "unit": "sec",
        "sf": sf,
        "variants": results,
    }))
    return 0


if __name__ == "__main__":
    if "--scaling" in sys.argv[1:]:
        raise SystemExit(scaling_main())
    if "--upsert-rate" in sys.argv[1:]:
        raise SystemExit(upsert_rate_main())
    if "--upsert-crossover" in sys.argv[1:]:
        raise SystemExit(upsert_crossover_main())
    if "--point-latency" in sys.argv[1:]:
        raise SystemExit(point_latency_main())
    raise SystemExit(main())

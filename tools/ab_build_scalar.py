"""Interleaved A/B: tbl_pipeline_build with vs without the r15
scalar-collect AQE bypass (table._scalar_rows; VERDICT r14 ask #3).
Variants alternate in one JVM; every rep rebuilds all three tables
from parquet (cache dropped, fresh tmpdir). Asserts between variants:
identical cow/mor/bulk snapshot rows AND identical live-file counts
per table (the bypass must not change any layout decision).

Usage: python tools/ab_build_scalar.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onehouse_demos_spark import get_spark  # noqa: E402
from onehouse_demos_spark.operators import mutations  # noqa: E402
from onehouse_demos_spark.tables import table as tablemod  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(
    app_name="ab-build-scalar",
    extra_confs={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")


def run():
    mutations._CACHE.pop(sf_dir, None)
    t0 = time.time()
    built = mutations._build(spark, sf_dir)
    dt = time.time() - t0
    sig = {}
    for name in ("cow", "mor", "bulk"):
        t = built[name]
        rows = sorted(
            tuple(r) for r in t.snapshot().collect()
        )
        sig[name] = (len(t.manifest.live_files(include_logs=True)), rows)
    return dt, sig


# warm codegen at the smallest SF (uncounted)
mutations._build(spark, "/root/testdata/sf0.001")

times = {"scalar_off": [], "scalar_on": []}
ref = None
for i in range(reps):
    for tag, flag in (("scalar_off", False), ("scalar_on", True)):
        tablemod._SCALAR_COLLECT = flag
        dt, sig = run()
        times[tag].append(dt)
        if ref is None:
            ref = sig
        for name in ref:
            assert sig[name][0] == ref[name][0], (
                f"FILE-COUNT MISMATCH {tag} rep {i} {name}: "
                f"{sig[name][0]} != {ref[name][0]}"
            )
            assert sig[name][1] == ref[name][1], (
                f"ROW MISMATCH {tag} rep {i} {name}"
            )
        print(f"rep{i} {tag}: build {dt:.3f}s")

for tag, ts in times.items():
    s = sorted(ts)
    print(
        f"{tag}: min {s[0]:.3f}  med {s[len(s) // 2]:.3f}  "
        f"runs {[round(x, 3) for x in ts]}"
    )
print("snapshots and file counts identical across variants")

"""Interleaved A/B: ANN Lloyd training with vs without scoped
AQE-off (r15 change candidate, VERDICT r14 ask #5). Toggles
similarity._LLOYD_COALESCE between reps in one JVM; asserts the trained
centroids/codebooks AND the end-to-end ann_index_search output are
identical between variants on every rep.

Usage: python tools/ab_ann_lloyd.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onehouse_demos_spark import get_spark  # noqa: E402
from onehouse_demos_spark.operators import similarity  # noqa: E402
from onehouse_demos_spark.operators.ann_index import AnnIndex  # noqa: E402
from onehouse_demos_spark.operators.similarity import (  # noqa: E402
    load_emb,
    train_ivf_centroids,
    train_pq_codebooks,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = get_spark(
    app_name="ab-ann-lloyd",
    extra_confs={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
emb = load_emb(spark, sf_dir)


def run_train():
    c = train_ivf_centroids(emb, k=16, iters=5)
    b = train_pq_codebooks(emb, dims=len(c[0]))
    return c, b


def run_search():
    tmp = tempfile.mkdtemp(prefix="oh_ab_ann_")
    try:
        t0 = time.time()
        idx = AnnIndex.build(emb, tmp + "/idx", k_coarse=8, iters=3)
        q = (
            emb.filter("vec_id = 0")
            .selectExpr("transform(embedding, x -> cast(x as double)) v")
            .first()
            .v
        )
        rows = idx.search(
            list(q), top_k=10, nprobe=4, rerank_with=emb, exclude_vec_id=0
        ).collect()
        return time.time() - t0, sorted(map(tuple, rows))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# warm both variants
for flag in (False, True):
    similarity._LLOYD_COALESCE = flag
    run_train()

times_t = {"coal_off": [], "coal_on": []}
times_s = {"coal_off": [], "coal_on": []}
ref_train = ref_search = None
for i in range(reps):
    for tag, flag in (("coal_off", False), ("coal_on", True)):
        similarity._LLOYD_COALESCE = flag
        t0 = time.time()
        got_train = run_train()
        times_t[tag].append(time.time() - t0)
        if ref_train is None:
            ref_train = got_train
        assert got_train == ref_train, f"TRAIN MISMATCH {tag} rep {i}"
        dt, got_search = run_search()
        times_s[tag].append(dt)
        if ref_search is None:
            ref_search = got_search
        assert got_search == ref_search, f"SEARCH MISMATCH {tag} rep {i}"
        print(
            f"rep{i} {tag}: train {times_t[tag][-1]:.3f}s "
            f"build+search {dt:.3f}s"
        )

for name, times in (("train", times_t), ("build+search", times_s)):
    for tag, ts in times.items():
        s = sorted(ts)
        print(
            f"{name} {tag}: min {s[0]:.3f}  med {s[len(s) // 2]:.3f}  "
            f"runs {[round(x, 3) for x in ts]}"
        )
assert spark.conf.get("spark.sql.adaptive.enabled") == "true", (
    "scoped conf leaked"
)
print("conf restored OK; results identical across variants")

"""Interleaved A/B: unigram_logprob_scores with vs without fan_out
(r15 change candidate, VERDICT r14 ask #4). Old/new alternate in one
JVM; min + median per variant; results asserted equal every rep.

Usage: python tools/ab_unigram.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from onehouse_demos_spark import get_spark  # noqa: E402
from onehouse_demos_spark.functions.quantize import fquant  # noqa: E402
from onehouse_demos_spark.operators.relational import fan_out  # noqa: E402
from onehouse_demos_spark.operators.text import (  # noqa: E402
    _PPL_TOPK,
    load_docs,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

spark = get_spark(
    app_name="ab-unigram",
    extra_confs={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")


def variant(spark, sf_dir, use_fan_out: bool):
    docs = load_docs(spark, sf_dir)
    if use_fan_out:
        docs = fan_out(docs)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    consts = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vsize")
    )
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "nlp_e6",
            fquant(
                -F.log(
                    (F.col("cnt") + 1.0) / (F.col("total") + F.col("vsize"))
                ),
                6,
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("nlp_e6").alias("micronats_sum"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return scored.orderBy(
        F.desc(
            F.col("micronats_sum").cast("double")
            / F.col("n_tokens").cast("double")
        ),
        F.asc("doc_id"),
    ).limit(_PPL_TOPK)


# warm both plans
variant(spark, sf_dir, False).collect()
variant(spark, sf_dir, True).collect()

times = {"old": [], "new": []}
ref = None
for i in range(reps):
    for tag, fo in (("old", False), ("new", True)):
        t0 = time.time()
        df = variant(spark, sf_dir, fo)
        n = df.count()
        rows = df.collect()
        times[tag].append(time.time() - t0)
        got = sorted(map(tuple, rows))
        if ref is None:
            ref = got
        assert got == ref, f"RESULT MISMATCH on {tag} rep {i}"
        print(f"rep{i} {tag}: {times[tag][-1]:.3f}s rows={n}")

for tag, ts in times.items():
    s = sorted(ts)
    print(
        f"{tag}: min {s[0]:.3f}  med {s[len(s) // 2]:.3f}  "
        f"runs {[round(x, 3) for x in ts]}"
    )

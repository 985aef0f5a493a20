"""Capture .explain("formatted") for headline (and optionally all)
queries into plans/r14/<name>_<tag>.txt.

Usage:
    python tools/capture_plans.py <tag> [query ...]

With no query args, captures every HEADLINE query from bench.py.
`tbl_pipeline_build` is skipped (it is a write pipeline, not a single
DataFrame); the tbl_* read queries that depend on the build trigger it
implicitly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]

    import __spark_entry__ as entrymod
    import bench
    from onehouse_demos_spark import get_spark
    import onehouse_demos_spark.operators as ops

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        app_name="plan-capture",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    qs = dict(entrymod.queries())
    qs.update(ops.extra_queries())

    names = only or [n for n in bench.HEADLINE if n != "tbl_pipeline_build"]
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, Exchange x{n_ex} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

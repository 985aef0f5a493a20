"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count + schema (column names) + an
order-insensitive value multiset.

Usage:
    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(rows, columns):
    """Sort columns by name, stringify values, return sorted multiset —
    mirrors an order-insensitive value hash."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            vals.append(str(v))
        out.append("\x00".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from onehouse_demos_spark import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import onehouse_demos_spark.operators as ops

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    # Demoted shape-duplicates stay under local verification even though
    # they are kept out of the driver's 50-entry correctness window.
    qs.update(ops.extra_queries())
    oracles.update(ops.extra_oracles())
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"  {name:35s} SPARK ERROR: {str(exc)[:120]}")
            continue
        if name not in oracles:
            print(f"  {name:35s} rows={len(srows):7d} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"  {name:35s} DUCKDB ERROR: {str(exc)[:120]}")
            continue
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT spark={len(srows)} duck={len(orows)}")
        if not status:
            sn = normalize(srows, scols)
            on = normalize(orows, ocols)
            if sn != on:
                diff = [
                    (a, b) for a, b in zip(sn, on) if a != b
                ][:3]
                status.append(f"VALUES differ, first diffs: {diff}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"  {name:35s} MISMATCH: {'; '.join(status)[:200]}")
        else:
            print(
                f"  {name:35s} OK rows={len(srows):7d} [{time.time()-t0:.1f}s]"
            )
    print()
    if failures:
        print(f"FAILED {len(failures)}/{n_run}:")
        for n, msg in failures:
            print(f"  {n}: {msg[:300]}")
        return 1
    scope = f"ALL {n_run}" if n_run == len(qs) else f"{n_run}/{len(qs)} RUN"
    print(f"{scope} QUERIES MATCH ORACLE at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Profile the tbl_pipeline_build mutation pipeline at Spark JOB
granularity via the event log (guide §1: measure first; §7.1 the UI's
job timeline, reconstructed headless). Prints one line per job —
submission offset, duration, call site — plus per-call-site totals, so
the per-commit fixed-cost structure (candidate-agg collect, probe-join
collect, range-sampling, write) is visible without the UI.

Usage: python tools/profile_build_jobs.py [sf_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import shutil

    evdir = "/tmp/oh_evlog"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from onehouse_demos_spark import get_spark

    spark = get_spark(
        app_name="oh-profile-build",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from onehouse_demos_spark.operators import mutations

    # warm codegen/classloading at the smallest SF (uncounted)
    mutations._build(spark, "/root/testdata/sf0.001")
    mutations._CACHE.pop(sf_dir, None)

    t_start_ms = int(time.time() * 1000)
    t0 = time.time()
    mutations._build(spark, sf_dir)
    wall = time.time() - t0
    # flush the event log
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    spark.stop()

    # Spark may write a single file or a rolling "eventlog_v2_*"
    # directory of events_* parts — collect every event line either way.
    paths = [p for p in glob.glob(f"{evdir}/*") if os.path.isfile(p)]
    for d in glob.glob(f"{evdir}/eventlog_v2_*"):
        paths.extend(
            p for p in glob.glob(f"{d}/events_*") if os.path.isfile(p)
        )
    assert paths, "no event log written"
    lines: list[str] = []
    for path in sorted(paths):
        opener = gzip.open if path.endswith(".gz") else open
        try:
            with opener(path, "rt") as fh:
                lines.extend(fh)
        except Exception:
            continue
    jobs: dict[int, dict] = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "site": props.get("callSite.short", "?"),
                    "desc": props.get("spark.job.description"),
                    "n_stages": len(ev.get("Stage IDs", [])),
                }
            elif et == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["t1"] = ev["Completion Time"]

    done = {
        k: v
        for k, v in jobs.items()
        if "t1" in v and v["t0"] >= t_start_ms  # skip warm-build jobs
    }
    if not done:
        print("no completed jobs captured")
        return 1
    base = min(v["t0"] for v in done.values())
    print(f"# wall={wall:.2f}s  jobs={len(done)}")
    print(f"{'job':>4} {'off_s':>7} {'dur_s':>7} {'stg':>3}  site")
    by_site: dict[str, list[float]] = {}
    for jid in sorted(done):
        v = done[jid]
        dur = (v["t1"] - v["t0"]) / 1000.0
        off = (v["t0"] - base) / 1000.0
        label = v["desc"] or v["site"]
        by_site.setdefault(v["site"], []).append(dur)
        print(f"{jid:>4} {off:>7.2f} {dur:>7.3f} {v['n_stages']:>3}  {label}")
    print("\n# per-call-site totals (sum_s x count):")
    for site, durs in sorted(
        by_site.items(), key=lambda kv: -sum(kv[1])
    ):
        print(f"  {sum(durs):7.3f}s x{len(durs):>3}  {site}")
    print(f"\n# total job time {sum(d for v in done.values() for d in [(v['t1']-v['t0'])/1000.0]):.2f}s over wall {wall:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

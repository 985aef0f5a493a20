"""Streaming sessionization via applyInPandasWithState: sessions split
on gap within a batch; open sessions close on state timeout."""

import json
import os
import time

from onehouse_demos_spark.streaming.stateful import streaming_sessionize

MIN_US = 60_000_000


def write_batch(dirpath, name, records):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_streaming_sessionize_gap_split(spark, tmp_base):
    src = tmp_base + "/in"
    # user 1: two sessions separated by a 90-minute gap; user 2: one
    write_batch(
        src,
        "b1.json",
        [
            {"user_id": 1, "ts_us": 0 * MIN_US},
            {"user_id": 1, "ts_us": 10 * MIN_US},
            {"user_id": 1, "ts_us": 100 * MIN_US},
            {"user_id": 1, "ts_us": 105 * MIN_US},
            {"user_id": 2, "ts_us": 5 * MIN_US},
        ],
    )
    stream = spark.readStream.schema("user_id long, ts_us long").json(src)
    sessions = streaming_sessionize(stream, gap_us=30 * MIN_US, timeout_ms=1_000)

    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", tmp_base + "/ck")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # first batch closes user1's first session (gap inside batch)
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM closed_sessions").collect()
            if len(rows) >= 1:
                break
            time.sleep(0.5)
        got = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
               for r in spark.sql("SELECT * FROM closed_sessions").collect()}
        assert (1, 0, 10 * MIN_US, 2) in got, got
        # an empty-ish follow-up batch advances processing time so the
        # timeout fires and the remaining open sessions close
        write_batch(src, "b2.json", [{"user_id": 99, "ts_us": 0}])
        deadline = time.time() + 90
        while time.time() < deadline:
            got = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
                   for r in spark.sql("SELECT * FROM closed_sessions").collect()}
            if len(got) >= 3:
                break
            write_batch(src, f"tick_{int(time.time()*1000)}.json",
                        [{"user_id": 98, "ts_us": 0}])
            time.sleep(1.0)
        assert (1, 100 * MIN_US, 105 * MIN_US, 2) in got, got
        assert (2, 5 * MIN_US, 5 * MIN_US, 1) in got, got
    finally:
        q.stop()

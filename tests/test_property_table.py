"""Model-based property testing of the table-mutation semantics.

Hypothesis drives random upsert/delete sequences against a
LakehouseTable (COW and MOR) and checks every intermediate snapshot
against a plain-dict model of the contract:

- latest COMMIT wins across batches (OverwriteWithLatest payload,
  reference README.md:226);
- the precombine field breaks ties WITHIN a batch (max wins);
- delete-by-key removes the row; a later upsert resurrects it;
- snapshot never shows two rows for one key after key-dedup ops.

This generalizes the fixed-DAG replay in tests/test_dag_replay.py to
arbitrary interleavings — the reference's integ-test-suite model
(SURVEY §5) with generated rather than hand-written DAGs.
"""

from __future__ import annotations

import shutil
import os
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from onehouse_demos_spark import LakehouseTable, TableConfig

KEYS = list(range(6))

# One operation: ("upsert", [(key, ver, val), ...]) or ("delete", [keys])
_upsert_rows = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=9),
        st.text(alphabet="abcxyz", min_size=1, max_size=4),
    ),
    min_size=1,
    max_size=5,
)
_ops = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _upsert_rows),
        st.tuples(
            st.just("delete"),
            st.lists(st.sampled_from(KEYS), min_size=1, max_size=3, unique=True),
        ),
    ),
    min_size=1,
    max_size=6,
)


def _apply_model(model: dict, op: str, payload) -> None:
    if op == "upsert":
        # precombine (ver) dedups within the batch: max ver wins; ties
        # on ver are broken by the LAST occurrence? No — the engine's
        # within-batch order on equal (commit, ver) is unspecified, so
        # the generator never emits duplicate (key, ver) pairs within
        # one batch (filtered in _dedup_batch below).
        best: dict = {}
        for k, ver, val in payload:
            if k not in best or ver > best[k][0]:
                best[k] = (ver, val)
        # latest commit wins outright, regardless of older ver
        for k, (ver, val) in best.items():
            model[k] = (ver, val)
    else:
        for k in payload:
            model.pop(k, None)


def _dedup_batch(rows):
    """Drop all but the first row per (key, ver): within-batch ties on
    the precombine value have engine-unspecified winners, so the
    property only generates determinate batches."""
    seen = set()
    out = []
    for k, ver, val in rows:
        if (k, ver) not in seen:
            seen.add((k, ver))
            out.append((k, ver, val))
    return out


@pytest.mark.parametrize("table_type", ["cow", "mor"])
@given(ops=_ops)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_mutation_sequence_matches_dict_model(spark, table_type, ops):
    base = tempfile.mkdtemp(prefix="oh_prop_")
    try:
        t = LakehouseTable.create(
            spark,
            base + "/t",
            TableConfig(
                name="t",
                record_key=["id"],
                precombine="ver",
                table_type=table_type,
            ),
        )
        model: dict = {}
        for op, payload in ops:
            if op == "upsert":
                payload = _dedup_batch(payload)
                df = spark.createDataFrame(
                    payload, "id int, ver int, v string"
                )
                t.upsert(df)
            else:
                df = spark.createDataFrame(
                    [(k,) for k in payload], "id int"
                )
                t.delete(df)
            _apply_model(model, op, payload)
            snap = t.snapshot()
            if not {"id", "ver", "v"}.issubset(set(snap.columns)):
                # no write commit yet (e.g. delete-first): the table has
                # no schema and the snapshot must be empty
                assert model == {} and snap.count() == 0
                continue
            got = {
                r.id: (r.ver, r.v)
                for r in snap.select("id", "ver", "v").collect()
            }
            assert got == model, (op, payload, got, model)
            # key-dedup invariant: never two visible rows per key
            assert snap.count() == len(model)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(
    seq=st.lists(
        st.tuples(
            st.sampled_from(["insert", "update", "delete", "merge_up"]),
            st.sampled_from(KEYS),
            st.text(alphabet="mnpq", min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=7,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_sql_dml_sequence_matches_dict_model(spark, seq):
    """Random INSERT / UPDATE / DELETE / MERGE statement sequences
    through the SQL engine must match a dict model — the engine's
    parser + planner composed under arbitrary interleavings, not just
    the hand-written happy paths."""
    import uuid as _uuid

    from onehouse_demos_spark.sql import Engine

    base = tempfile.mkdtemp(prefix="oh_sqlprop_")
    try:
        eng = Engine(spark, base + "/wh")
        tname = f"p{_uuid.uuid4().hex[:8]}"
        eng.sql(
            f"CREATE TABLE {tname} (id INT, ver INT, v STRING) "
            "USING lakehouse "
            "TBLPROPERTIES (primaryKey=id, preCombineField=ver)"
        )
        model: dict = {}
        ver = 0
        for op, key, val in seq:
            ver += 1
            if op == "insert":
                if key in model:  # plain INSERT on a live key would
                    continue      # duplicate it; the model forbids that
                eng.sql(
                    f"INSERT INTO {tname} VALUES ({key}, {ver}, '{val}')"
                )
                model[key] = (ver, val)
            elif op == "update":
                eng.sql(
                    f"UPDATE {tname} SET v = '{val}', ver = {ver} "
                    f"WHERE id = {key}"
                )
                if key in model:
                    model[key] = (ver, val)
            elif op == "delete":
                eng.sql(f"DELETE FROM {tname} WHERE id = {key}")
                model.pop(key, None)
            else:  # merge_up: upsert via MERGE
                eng.sql(
                    f"MERGE INTO {tname} t USING "
                    f"(SELECT {key} AS id, {ver} AS ver, '{val}' AS v) s "
                    "ON t.id = s.id "
                    "WHEN MATCHED THEN UPDATE SET ver = s.ver, v = s.v "
                    "WHEN NOT MATCHED THEN INSERT (id, ver, v) "
                    "VALUES (s.id, s.ver, s.v)"
                )
                model[key] = (ver, val)
            got = {
                r.id: (r.ver, r.v)
                for r in eng.sql(f"SELECT * FROM {tname}").collect()
            }
            assert got == model, (op, key, val, got, model)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_bucket_ops = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _upsert_rows),
        st.tuples(
            st.just("delete"),
            st.lists(st.sampled_from(KEYS), min_size=1, max_size=3, unique=True),
        ),
        st.tuples(st.just("split"), st.none()),
        st.tuples(st.just("split_crash"), st.none()),
        st.tuples(st.just("auto_split"), st.none()),
    ),
    min_size=2,
    max_size=7,
)


@given(ops=_bucket_ops)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_bucket_splits_interleaved_with_mutations_match_model(spark, ops):
    """r10: arbitrary interleavings of upsert / delete with
    consistent-engine hot-bucket splits, CRASHED splits (replacecommit
    published, sidecar config rewrite skipped, table reloaded from the
    stale sidecar) and the auto-split policy. After every op the
    snapshot must equal the dict model, no key may appear twice, and
    the prefix map must remain an exact partition of the slot space —
    the strongest generated stress on the timeline-derived routing
    map."""
    from onehouse_demos_spark.tables.maintenance import (
        run_auto_split,
        split_bucket,
    )

    base = tempfile.mkdtemp(prefix="oh_bprop_")
    try:
        t = LakehouseTable.create(
            spark,
            base + "/t",
            TableConfig(
                name="t",
                record_key=["id"],
                precombine="ver",
                bucket_index_buckets=2,
                bucket_engine="consistent",
            ),
        )
        model: dict = {}
        for op, payload in ops:
            if op == "upsert":
                payload = _dedup_batch(payload)
                t.upsert(
                    spark.createDataFrame(payload, "id int, ver int, v string")
                )
                _apply_model(model, "upsert", payload)
            elif op == "delete":
                t.delete(spark.createDataFrame([(k,) for k in payload], "id int"))
                _apply_model(model, "delete", payload)
            elif op == "split":
                try:
                    split_bucket(t)  # hottest
                except ValueError:
                    pass  # nothing routed yet
            elif op == "split_crash":
                saved = t._rewrite_config
                t._rewrite_config = lambda: None
                try:
                    split_bucket(t)
                except ValueError:
                    pass
                finally:
                    t._rewrite_config = saved
                # reopen from the STALE sidecar: the timeline must win
                t = LakehouseTable.load(spark, base + "/t")
            else:  # auto_split with a tiny target to force activity
                run_auto_split(t, max_bucket_rows=3)
            # prefix map stays an exact disjoint cover of the slot space
            total = sum(
                1 << (16 - (enc >> 16)) for enc in t._bucket_prefix_list()
            )
            assert total == 65536
            snap = t.snapshot()
            if not {"id", "ver", "v"}.issubset(set(snap.columns)):
                assert model == {} and snap.count() == 0
                continue
            got = {
                r.id: (r.ver, r.v)
                for r in snap.select("id", "ver", "v").collect()
            }
            assert got == model, (op, payload, got, model)
            assert snap.count() == len(model)  # no duplicate keys, ever
    finally:
        shutil.rmtree(base, ignore_errors=True)


_hudi_ops = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _upsert_rows),
        st.tuples(
            st.just("delete"),
            st.lists(st.sampled_from(KEYS), min_size=1, max_size=2, unique=True),
        ),
        st.tuples(st.just("sync"), st.none()),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=3,
    max_size=7,
)


@given(ops=_hudi_ops)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_hudi_rt_personality_tracks_engine_under_random_ops(spark, ops):
    """r10 generative check on the personality's MOR legs: random
    upsert/delete/compaction sequences on a MOR table, with rt syncs
    interleaved — after EVERY sync the `_rt` replay (base slices +
    real HoodieLogFormat blocks) must equal the engine's merged
    snapshot, and the read-optimized replay must equal the engine's
    `_ro` view."""
    from onehouse_demos_spark.tables.hudi_export import (
        read_hudi_rt,
        read_hudi_snapshot,
        sync_hudi_metadata,
    )
    from onehouse_demos_spark.tables.maintenance import run_compaction

    base = tempfile.mkdtemp(prefix="oh_hudiprop_")
    try:
        t = LakehouseTable.create(
            spark,
            base + "/t",
            TableConfig(
                name="t",
                record_key=["id"],
                precombine="ver",
                table_type="mor",
            ),
        )
        t.insert(
            spark.createDataFrame(
                [(k, 0, "init") for k in KEYS], "id int, ver int, v string"
            )
        )
        sync_hudi_metadata(t, mor_rt=True)
        for op, payload in ops:
            if op == "upsert":
                t.upsert(
                    spark.createDataFrame(
                        _dedup_batch(payload), "id int, ver int, v string"
                    )
                )
                continue
            if op == "delete":
                t.delete(
                    spark.createDataFrame([(k,) for k in payload], "id int")
                )
                continue
            if op == "compact":
                run_compaction(t)
            sync_hudi_metadata(t, mor_rt=True)

            def rows(df):
                return sorted(
                    tuple(r)
                    for r in df.select("id", "ver", "v").collect()
                )

            assert rows(read_hudi_rt(spark, t.base_path)) == rows(
                t.snapshot()
            ), op
            assert rows(read_hudi_snapshot(spark, t.base_path)) == rows(
                t.read_optimized()
            ), op
    finally:
        shutil.rmtree(base, ignore_errors=True)


_mdt_ops = st.lists(
    st.one_of(
        st.tuples(st.just("upsert"), _upsert_rows),
        st.tuples(
            st.just("delete"),
            st.lists(
                st.sampled_from(KEYS), min_size=1, max_size=2, unique=True
            ),
        ),
    ),
    min_size=3,
    max_size=6,
)


@given(ops=_mdt_ops)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_metadata_index_suite_tracks_engine_under_random_ops(spark, ops):
    """r11 generative check on the metadata-index partitions: random
    upsert/delete sequences with files+column_stats+bloom_filters+
    record_index syncs after every op — the folded listing must equal
    the live slice set, metadata-planned point reads must equal the
    engine's per-key truth for EVERY key through BOTH planners (bloom
    false negatives and stale/wrong record-index locations would both
    silently drop rows), the record index must locate exactly the
    live key set, and a stats-filtered planned read must equal the
    engine's filtered snapshot."""
    from onehouse_demos_spark.tables.hudi_export import (
        hudi_live_files,
        hudi_metadata_listing,
        hudi_metadata_record_locations,
        read_hudi_point,
        read_hudi_snapshot,
        sync_hudi_metadata,
    )

    base = tempfile.mkdtemp(prefix="oh_mdtprop_")
    try:
        t = LakehouseTable.create(
            spark,
            base + "/t",
            TableConfig(name="mdtprop", record_key=["id"], precombine="ver"),
        )
        t.insert(
            spark.createDataFrame(
                [(k, 0, "seed") for k in KEYS], "id int, ver int, v string"
            )
        )
        for op, payload in ops:
            if op == "upsert":
                newest = {}
                for k, ver, v in payload:
                    newest[k] = (k, ver, v)
                t.upsert(
                    spark.createDataFrame(
                        list(newest.values()), "id int, ver int, v string"
                    )
                )
            else:
                t.delete(
                    spark.createDataFrame([(k,) for k in payload], "id int")
                )
            sync_hudi_metadata(
                t,
                column_stats=True,
                bloom_filters=True,
                record_index=True,
            )
            live = {
                os.path.basename(p) for p in hudi_live_files(t.base_path)
            }
            listing = hudi_metadata_listing(t.base_path)
            assert {
                n for files in listing.values() for n in files
            } == live, op
            engine = {
                r.id: (r.ver, r.v)
                for r in t.snapshot().select("id", "ver", "v").collect()
            }
            for via in ("bloom", "record_index"):
                got = {
                    r.id: (r.ver, r.v)
                    for r in read_hudi_point(
                        spark,
                        t.base_path,
                        [str(k) for k in KEYS],
                        via=via,
                    ).collect()
                }
                assert got == engine, (op, via)
            locs = hudi_metadata_record_locations(
                t.base_path, [str(k) for k in KEYS]
            )
            assert sorted(locs) == sorted(str(k) for k in engine), op
            want = sorted(
                (r.id, r.ver)
                for r in t.snapshot()
                .filter("ver >= 3")
                .select("id", "ver")
                .collect()
            )
            planned = read_hudi_snapshot(
                spark,
                t.base_path,
                via_metadata=True,
                stats_filter=("ver", 3, 999),
            )
            got2 = sorted(
                (r.id, r.ver)
                for r in planned.filter("ver >= 3")
                .select("id", "ver")
                .collect()
            )
            assert got2 == want, op
    finally:
        shutil.rmtree(base, ignore_errors=True)

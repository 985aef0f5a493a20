import pytest

from onehouse_demos_spark.tables.timeline import (
    ConflictError,
    FileMeta,
    Instant,
    Timeline,
)


def make_commit(tl: Timeline, paths, removes=(), action="commit"):
    i = tl.begin(action)
    tl.complete(
        Instant(
            instant=i,
            action=action,
            operation="test",
            adds=[FileMeta(path=p, rows=1) for p in paths],
            removes=list(removes),
        )
    )
    return i


def test_instants_ordered_and_monotonic(tmp_base):
    tl = Timeline(tmp_base)
    ids = [make_commit(tl, [f"f{i}"]) for i in range(5)]
    assert ids == sorted(ids)
    assert [i.instant for i in tl.instants()] == ids


def test_inflight_reservation_unique(tmp_base):
    tl = Timeline(tmp_base)
    a = tl.begin("commit")
    b = tl.begin("commit")
    assert a != b
    tl.abort(a)
    tl.abort(b)


def test_occ_conflict_on_same_file(tmp_base):
    tl = Timeline(tmp_base)
    make_commit(tl, ["shared.parquet"])
    snapshot = tl.latest_instant()
    a = tl.begin("commit")
    b = tl.begin("commit")
    tl.complete(
        Instant(instant=a, action="commit", removes=["shared.parquet"]),
        conflict_check_from=snapshot,
    )
    with pytest.raises(ConflictError):
        tl.complete(
            Instant(instant=b, action="commit", removes=["shared.parquet"]),
            conflict_check_from=snapshot,
        )


def test_non_overlapping_writers_both_commit(tmp_base):
    tl = Timeline(tmp_base)
    make_commit(tl, ["a.parquet", "b.parquet"])
    snapshot = tl.latest_instant()
    a = tl.begin("commit")
    b = tl.begin("commit")
    tl.complete(
        Instant(instant=a, action="commit", removes=["a.parquet"]),
        conflict_check_from=snapshot,
    )
    tl.complete(
        Instant(instant=b, action="commit", removes=["b.parquet"]),
        conflict_check_from=snapshot,
    )
    assert len(tl.instants()) == 3


def test_archive_preserves_history(tmp_base):
    tl = Timeline(tmp_base)
    ids = [make_commit(tl, [f"f{i}"]) for i in range(10)]
    moved = tl.archive(keep_last=3)
    assert moved == 7
    assert [i.instant for i in tl.instants()] == ids  # history intact
    assert len(tl._completed_files()) == 3

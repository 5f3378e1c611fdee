"""Snapshot sink (sinks/snapshots.py): manifest-committed writes with
time travel — torn writes invisible, append/overwrite history readable,
expiry garbage-collects exactly the unreferenced files."""

from __future__ import annotations

import os

import pytest

from tdk_apache_log_etl_spark.sinks.snapshots import (
    committed_versions,
    expire_snapshots,
    snapshot_read,
    snapshot_write,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS v")


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_append_history_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = snapshot_write(_df(spark, 0, 5), t, mode="append")
    v1 = snapshot_write(_df(spark, 5, 8), t, mode="append")
    assert (v0, v1) == (0, 1)
    assert _ids(snapshot_read(spark, t)) == list(range(8))
    # time travel: version 0 still shows only the first batch
    assert _ids(snapshot_read(spark, t, version=0)) == list(range(5))


def test_overwrite_keeps_old_versions_readable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 5), t, mode="append")
    snapshot_write(_df(spark, 100, 103), t, mode="overwrite")
    assert _ids(snapshot_read(spark, t)) == [100, 101, 102]
    assert _ids(snapshot_read(spark, t, version=0)) == list(range(5))


def test_torn_write_is_invisible(spark, tmp_path):
    # data files without a manifest (crash before the rename): readers
    # never see them, and the next writer claims the next version id.
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 3), t, mode="append")
    torn = os.path.join(t, "data", "snap-1")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"torn")
    assert committed_versions(t) == [0]
    assert _ids(snapshot_read(spark, t)) == [0, 1, 2]
    v = snapshot_write(_df(spark, 3, 5), t, mode="append")
    assert v == 1  # ids come from COMMITTED versions, not directories
    assert _ids(snapshot_read(spark, t)) == [0, 1, 2, 3, 4]


def test_expire_gc_unreferenced_files_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 5), t, mode="append")
    snapshot_write(_df(spark, 100, 103), t, mode="overwrite")
    snapshot_write(_df(spark, 103, 105), t, mode="append")
    stats = expire_snapshots(t, keep_last=2)
    assert stats["expired_manifests"] == 1
    assert stats["deleted_files"] >= 1  # snap-0's files are unreferenced
    assert committed_versions(t) == [1, 2]
    # survivors still read; the expired version refuses cleanly
    assert _ids(snapshot_read(spark, t)) == [100, 101, 102, 103, 104]
    assert _ids(snapshot_read(spark, t, version=1)) == [100, 101, 102]
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, t, version=0)


def test_read_empty_and_bad_version_raise(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, t)
    snapshot_write(_df(spark, 0, 2), t)
    with pytest.raises(FileNotFoundError):
        snapshot_read(spark, t, version=7)


def test_streaming_ingest_exactly_once_with_history(spark, tmp_path):
    # Two micro-batch files stream into the snapshot table; the final
    # table equals the union, intermediate history is readable, and a
    # replayed batch id is a no-op (exactly-once content).
    import pandas as pd

    from tdk_apache_log_etl_spark.sinks.snapshots import (
        maintain_snapshot_stream,
        snapshot_write_batch,
    )

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"id": [0, 1, 2]}).to_parquet(src / "a.parquet")
    pd.DataFrame({"id": [3, 4]}).to_parquet(src / "b.parquet")
    t = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = maintain_snapshot_stream(
        stream, t, str(tmp_path / "ckpt")
    ).start()
    assert q.awaitTermination(120)
    assert _ids(snapshot_read(spark, t)) == [0, 1, 2, 3, 4]
    assert committed_versions(t) == [0, 1]
    assert len(_ids(snapshot_read(spark, t, version=0))) == 3 or len(
        _ids(snapshot_read(spark, t, version=0))
    ) == 2  # file order within the trigger is not contractual
    # direct replay of an already-committed stream batch: no-op
    before = _ids(snapshot_read(spark, t))
    assert (
        snapshot_write_batch(
            spark.createDataFrame([(9,)], "id long"), t, batch_id=0
        )
        is None
    )
    assert _ids(snapshot_read(spark, t)) == before
    assert committed_versions(t) == [0, 1]


def test_snapshot_diff_multiset(spark, tmp_path):
    # v0 holds ids [0,1,2,2]; v1 overwrites with [1,2,5]: diff says
    # 0 removed x1, 2 removed x1 (multiplicity 2 -> 1), 5 added x1;
    # unchanged rows (1, one copy of 2) never appear.
    from tdk_apache_log_etl_spark.sinks.snapshots import snapshot_diff

    t = str(tmp_path / "tbl")
    df0 = spark.createDataFrame([(0,), (1,), (2,), (2,)], "id long")
    snapshot_write(df0, t, mode="append")
    df1 = spark.createDataFrame([(1,), (2,), (5,)], "id long")
    snapshot_write(df1, t, mode="overwrite")
    out = {
        (r.id, r.change): r.n_rows
        for r in snapshot_diff(spark, t, 0, 1).collect()
    }
    assert out == {(0, "removed"): 1, (2, "removed"): 1, (5, "added"): 1}


def test_snapshot_diff_schema_mismatch_raises(spark, tmp_path):
    import pytest as _pytest

    from tdk_apache_log_etl_spark.sinks.snapshots import snapshot_diff

    t = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(0,)], "id long"), t)
    snapshot_write(
        spark.createDataFrame([(0, 1)], "id long, v long"), t, mode="overwrite"
    )
    with _pytest.raises(ValueError):
        snapshot_diff(spark, t, 0, 1)

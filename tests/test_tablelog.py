"""Snapshot-log table format (operators/tablelog.py): commit atomicity,
time travel, merge-on-read deletes with sequence-number scoping, compaction,
incremental append scans, snapshot expiry, and stats pruning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from blogparser_spark.operators import tablelog as tl


def _batch(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.concat(F.lit("type_"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
    )


def _ids(df):
    return sorted(r.event_id for r in df.select("event_id").collect())


def test_append_read_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    v1 = tl.append(spark, t, _batch(spark, 0, 10))
    v2 = tl.append(spark, t, _batch(spark, 10, 25))
    assert (v1, v2) == (1, 2)
    assert _ids(tl.read_snapshot(spark, t)) == list(range(25))
    lineage = tl.snapshot_lineage(t)
    assert [c["operation"] for c in lineage] == ["append", "append"]
    assert [c["rows_added"] for c in lineage] == [10, 15]


def test_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))
    tl.append(spark, t, _batch(spark, 10, 20))
    assert _ids(tl.read_snapshot(spark, t, version=1)) == list(range(10))
    assert _ids(tl.read_snapshot(spark, t, version=2)) == list(range(20))


def test_equality_delete_merge_on_read(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))
    v = tl.delete_where(spark, t, F.col("event_id") < 5, key_cols=["event_id"])
    assert v == 2
    assert _ids(tl.read_snapshot(spark, t)) == list(range(5, 10))
    # the deleted version is still time-travelable
    assert _ids(tl.read_snapshot(spark, t, version=1)) == list(range(10))
    # no data file was rewritten
    assert tl.snapshot_lineage(t)[-1]["files_removed"] == 0


def test_delete_sequence_scoping(spark, tmp_path):
    """A key re-appended AFTER the delete must survive (Iceberg v2 rule:
    equality deletes apply only to data files with an older sequence)."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))
    tl.delete_where(spark, t, F.col("event_id") < 5, key_cols=["event_id"])
    tl.append(spark, t, _batch(spark, 0, 3))
    assert _ids(tl.read_snapshot(spark, t)) == [0, 1, 2] + list(range(5, 10))


def test_compact_folds_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10).repartition(4))
    tl.append(spark, t, _batch(spark, 10, 20).repartition(4))
    tl.delete_where(spark, t, F.col("event_id") % 2 == 0, key_cols=["event_id"])
    before = _ids(tl.read_snapshot(spark, t))
    v = tl.compact(spark, t, n_files=1)
    _, state = tl._state_at(t, v)
    assert len(state["data"]) == 1
    assert state["deletes"] == {}
    assert _ids(tl.read_snapshot(spark, t)) == before == list(range(1, 20, 2))


def test_incremental_append_scan(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))  # v1
    tl.append(spark, t, _batch(spark, 10, 20))  # v2
    tl.compact(spark, t)  # v3 — logical no-op, skipped
    tl.append(spark, t, _batch(spark, 20, 30))  # v4
    inc = tl.incremental_append_scan(spark, t, from_version=1)
    assert _ids(inc) == list(range(10, 30))
    # a delete commit in range cannot be expressed as appends
    tl.delete_where(spark, t, F.col("event_id") < 5, key_cols=["event_id"])
    with pytest.raises(ValueError, match="delete"):
        tl.incremental_append_scan(spark, t, from_version=4)


def test_expire_snapshots(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))  # v1
    tl.overwrite(spark, t, _batch(spark, 100, 110))  # v2 — v1 files orphaned
    tl.append(spark, t, _batch(spark, 110, 120))  # v3
    _, s1 = tl._state_at(t, 1)
    v1_files = list(s1["data"])
    res = tl.expire_snapshots(t, keep_last=2)
    assert res["versions_removed"] == 1
    assert res["files_removed"] == len(v1_files)
    assert all(not os.path.exists(p) for p in v1_files)
    # retained snapshots still read correctly (v2 via rebase base, v3 live)
    assert _ids(tl.read_snapshot(spark, t, version=2)) == list(range(100, 110))
    assert _ids(tl.read_snapshot(spark, t)) == list(range(100, 120))
    with pytest.raises(tl.SnapshotExpired):
        tl.read_snapshot(spark, t, version=1)
    # incremental scan across the rebase boundary still works from v2
    assert _ids(tl.incremental_append_scan(spark, t, from_version=2)) == list(
        range(110, 120)
    )
    with pytest.raises(tl.SnapshotExpired):
        tl.incremental_append_scan(spark, t, from_version=0)


def test_schema_enforcement_and_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 5))
    bad = _batch(spark, 5, 10).withColumn("event_id", F.col("event_id").cast("string"))
    with pytest.raises(ValueError, match="schema mismatch"):
        tl.append(spark, t, bad)
    extra = _batch(spark, 5, 10).withColumn("score", F.lit(1.5))
    with pytest.raises(ValueError, match="allow_evolution"):
        tl.append(spark, t, extra)
    tl.append(spark, t, extra, allow_evolution=True)
    out = tl.read_snapshot(spark, t)
    assert "score" in out.columns
    rows = {r.event_id: r.score for r in out.collect()}
    assert rows[0] is None and rows[7] == 1.5


def test_append_retries_on_commit_race(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 5))
    # simulate a concurrent writer claiming version 2
    racer = {
        "version": 2,
        "parent": 1,
        "operation": "append",
        "ts": 0.0,
        "schema": [["event_id", "bigint"], ["user_id", "bigint"], ["event_type", "string"]],
        "added_data": [],
    }
    assert tl._try_commit(t, racer)
    v = tl.append(spark, t, _batch(spark, 5, 10))
    assert v == 3  # retried past the raced version
    assert _ids(tl.read_snapshot(spark, t)) == list(range(10))


def test_non_append_commit_conflict_raises(spark, tmp_path, monkeypatch):
    """A delete that read snapshot v1 must NOT silently commit over a
    concurrent writer's v2: simulate the race by pinning the version read
    to the stale value while a racer claims the next slot."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 5))
    racer = {"version": 2, "parent": 1, "operation": "append", "ts": 0.0,
             "schema": None, "added_data": []}
    assert tl._try_commit(t, racer)
    monkeypatch.setattr(tl, "current_version", lambda table: 1)
    with pytest.raises(tl.CommitConflict):
        tl.delete_where(spark, t, F.col("event_id") < 2, key_cols=["event_id"])


def test_stats_pruning_scan(spark, tmp_path):
    t = str(tmp_path / "t")
    for lo in range(0, 100, 20):  # 5 appends, disjoint event_id ranges
        tl.append(
            spark,
            t,
            _batch(spark, lo, lo + 20).coalesce(1),
            stats_cols=("event_id",),
        )
    paths, skipped = tl.prune_files(t, "event_id", 45, 55)
    assert skipped == 4 and len(paths) == 1
    paths2, skipped2 = tl.prune_files(t, "event_id", 15, 25)  # straddles two
    assert skipped2 == 3 and len(paths2) == 2
    got = tl.scan_between(spark, t, "event_id", 45, 55)
    assert _ids(got) == list(range(45, 56))
    # pruning must compose with merge-on-read deletes
    tl.delete_where(spark, t, F.col("event_id") == 50, key_cols=["event_id"])
    assert _ids(tl.scan_between(spark, t, "event_id", 45, 55)) == [
        i for i in range(45, 56) if i != 50
    ]


def test_commit_file_is_valid_json_with_manifest_stats(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10).coalesce(1), stats_cols=("event_id",))
    with open(tl._commit_path(t, 1)) as f:
        c = json.load(f)
    (entry,) = c["added_data"]
    assert entry["rows"] == 10
    assert entry["stats"]["event_id"] == [0, 9]
    assert entry["seq"] == 1


def test_partitioned_append_manifest_and_pruned_read(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _batch(spark, 0, 30)
    tl.append(spark, t, df, partition_by=("event_type",))
    _, state = tl._state_at(t)
    parts = {e["partition"]["event_type"] for e in state["data"].values()}
    assert parts == {"type_0", "type_1", "type_2"}
    # data files keep the real column (no hive-stripping)
    one = tl.read_partition(spark, t, {"event_type": "type_1"})
    assert "event_type" in one.columns
    assert _ids(one) == list(range(1, 30, 3))
    # pruning: every file NOT in the target partition is skippable — the
    # manifest carries enough to never open type_0/type_2 files
    matching = [
        p
        for p, e in state["data"].items()
        if e["partition"]["event_type"] == "type_1"
    ]
    assert 0 < len(matching) < len(state["data"])


def test_partition_read_composes_with_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 30), partition_by=("event_type",))
    tl.delete_where(spark, t, F.col("event_id") < 10, key_cols=["event_id"])
    one = tl.read_partition(spark, t, {"event_type": "type_1"})
    assert _ids(one) == list(range(10, 30, 3))


def test_append_idempotent_marker(spark, tmp_path):
    t = str(tmp_path / "t")
    v1, did1 = tl.append_idempotent(spark, t, _batch(spark, 0, 10), marker="slice-0")
    v2, did2 = tl.append_idempotent(spark, t, _batch(spark, 0, 10), marker="slice-0")
    assert (v1, did1) == (1, True) and (v2, did2) == (1, False)
    assert _ids(tl.read_snapshot(spark, t)) == list(range(10))
    v3, did3 = tl.append_idempotent(spark, t, _batch(spark, 10, 15), marker="slice-1")
    assert did3 and v3 == 2
    assert tl.committed_markers(t) == {"slice-0", "slice-1"}


def test_route_commit_tablelog_matches_write_routed(spark, parsed, tmp_path):
    """The tablelog-routed table must hold exactly the rows the parquet
    partitionBy fan-out holds, per sink, with idempotent re-commit."""
    from blogparser_spark.operators.enrich import enrich
    from blogparser_spark.operators.route import (
        read_routed_tablelog,
        read_sink,
        route_commit_tablelog,
        with_sink_id,
        write_routed,
    )

    enriched = with_sink_id(enrich(parsed))
    t = str(tmp_path / "routed_log")
    p = str(tmp_path / "routed_pq")
    write_routed(enriched, p)
    v, did = route_commit_tablelog(enriched, t, marker="batch-0")
    assert did and v == 1
    v2, did2 = route_commit_tablelog(enriched, t, marker="batch-0")
    assert not did2 and v2 == 1  # restart re-submission is a no-op

    sink = dict(channel="inbound", tool_category="retrieval", parse_status="ok")
    a = read_sink(spark, p, **sink).select("conv_id", "turn_idx")
    b = read_routed_tablelog(spark, t, **sink).select("conv_id", "turn_idx")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # whole-table row parity too
    assert tl.read_snapshot(spark, t).count() == enriched.count()

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


def _vbatch(spark, lo: int, hi: int, bump: float = 0.0):
    return _batch(spark, lo, hi).withColumn(
        "value", F.col("event_id") * 1.5 + F.lit(bump)
    )


def test_merge_upsert_atomic_commit(spark, tmp_path):
    """One commit = delete file over source keys + source data files; the
    delete's seq equals the commit version so the merge's own rows survive
    it (matched keys replaced, unmatched inserted)."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _vbatch(spark, 0, 12))
    v = tl.merge_upsert(spark, t, _vbatch(spark, 6, 18, bump=1000.0), ["event_id"])
    assert v == 2
    c = tl._read_commit(t, 2)
    assert c["operation"] == "merge"
    assert c["added_data"] and c["added_deletes"]  # both sides, one commit
    rows = {r.event_id: r.value for r in tl.read_snapshot(spark, t).collect()}
    exp = {k: k * 1.5 for k in range(6)}
    exp.update({k: k * 1.5 + 1000.0 for k in range(6, 18)})
    assert rows == exp


def test_merge_upsert_into_empty_table_is_insert_only(spark, tmp_path):
    t = str(tmp_path / "t")
    v = tl.merge_upsert(spark, t, _vbatch(spark, 0, 5), ["event_id"])
    assert v == 1
    assert _ids(tl.read_snapshot(spark, t)) == list(range(5))
    assert "added_deletes" not in tl._read_commit(t, 1)


def test_rollback_preserves_history_and_seq_scoping(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))                       # v1
    tl.delete_where(spark, t, F.col("event_id") < 4, ["event_id"])  # v2
    tl.append(spark, t, _batch(spark, 0, 2))                        # v3 re-append
    assert _ids(tl.read_snapshot(spark, t)) == [0, 1] + list(range(4, 10))
    v4 = tl.rollback_to(t, 2)
    assert v4 == 4
    # state == v2 exactly (re-appended keys gone again; delete still scoped)
    assert _ids(tl.read_snapshot(spark, t)) == list(range(4, 10))
    # the rolled-back version is still time-travelable
    assert _ids(tl.read_snapshot(spark, t, version=3)) == [0, 1] + list(
        range(4, 10)
    )
    assert [c["operation"] for c in tl.snapshot_lineage(t)] == [
        "append", "delete", "append", "rollback",
    ]


def test_changelog_scan_nets_to_live_rows(spark, tmp_path):
    """Folding the CDC stream (+insert/−delete) over every commit kind —
    append, MoR delete, merge, rollback — reproduces the live row set."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _vbatch(spark, 0, 10))
    tl.delete_where(spark, t, F.col("event_id") % 4 == 0, ["event_id"])
    tl.merge_upsert(spark, t, _vbatch(spark, 5, 15, bump=100.0), ["event_id"])
    tl.rollback_to(t, 2)
    ch = tl.changelog_scan(spark, t, from_version=0).collect()
    net: dict[tuple, int] = {}
    for r in ch:
        d = 1 if r._change_type == "insert" else -1
        net[(r.event_id, r.value)] = net.get((r.event_id, r.value), 0) + d
    live = {kv for kv, n in net.items() if n > 0}
    assert all(n in (0, 1) for n in net.values())
    actual = {(r.event_id, r.value) for r in tl.read_snapshot(spark, t).collect()}
    assert live == actual


def test_changelog_delete_emits_exact_preimage(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _vbatch(spark, 0, 10))
    tl.delete_where(spark, t, F.col("event_id") >= 7, ["event_id"])
    ch = tl.changelog_scan(spark, t, from_version=1)
    rows = [(r.event_id, r.value, r._commit_version) for r in ch.collect()]
    assert sorted(rows) == [(k, k * 1.5, 2) for k in (7, 8, 9)]
    assert {r._change_type for r in ch.collect()} == {"delete"}


def test_changelog_refreshes_view_without_base_rescan(spark, tmp_path):
    """apply_retractable_delta over the changelog == full recompute over
    the final snapshot — the CDC feed a 10^12-row view absorbs instead of
    rescanning history."""
    from blogparser_spark.operators.aggregate import (
        apply_retractable_delta,
        retractable_state,
    )

    t = str(tmp_path / "t")
    tl.append(spark, t, _vbatch(spark, 0, 30))  # v1
    view0 = retractable_state(
        tl.read_snapshot(spark, t), ["event_type"], "value"
    ).localCheckpoint()
    tl.append(spark, t, _vbatch(spark, 30, 45))                       # v2
    tl.delete_where(spark, t, F.col("event_id") % 5 == 0, ["event_id"])  # v3
    tl.merge_upsert(spark, t, _vbatch(spark, 40, 55, bump=7.0), ["event_id"])  # v4
    delta = tl.changelog_scan(spark, t, from_version=1).withColumn(
        "op",
        F.when(F.col("_change_type") == "insert", F.lit("I")).otherwise("D"),
    )
    refreshed = apply_retractable_delta(view0, delta, ["event_type"], "value")
    full = retractable_state(tl.read_snapshot(spark, t), ["event_type"], "value")
    a = sorted((r.event_type, r.cnt, r.vsum) for r in refreshed.collect())
    b = sorted((r.event_type, r.cnt, r.vsum) for r in full.collect())
    assert a == b


def test_compact_binpack_rewrites_only_small_files(spark, tmp_path):
    """Binpack folds the small-file backlog, leaves big files alone, keeps
    delete files scoped to the untouched ones, and never changes the
    logical row set."""
    t = str(tmp_path / "t")
    big = _batch(spark, 100, 20100).coalesce(1)
    tl.append(spark, t, big)                              # one "big" file
    for lo in (50, 55, 60):                               # small-file backlog
        tl.append(spark, t, _batch(spark, lo, lo + 5).coalesce(1))
    tl.delete_where(spark, t, F.col("event_id").isin(52, 61), ["event_id"])
    _, pre = tl._state_at(t)
    big_paths = {
        p for p, e in pre["data"].items() if e["rows"] == 20000
    }
    big_bytes = max(e["bytes"] for e in pre["data"].values())
    v = tl.compact_binpack(spark, t, target_bytes=big_bytes)
    assert v is not None
    _, post = tl._state_at(t)
    assert big_paths <= set(post["data"])          # big file untouched
    assert len(post["data"]) == len(big_paths) + 1  # backlog → one packed file
    assert post["deletes"]                          # delete files retained
    expected = [
        e
        for e in list(range(50, 65)) + list(range(100, 20100))
        if e not in (52, 61)
    ]
    assert _ids(tl.read_snapshot(spark, t)) == expected
    # binpack is a logical no-op for the changelog
    ch = tl.changelog_scan(spark, t, from_version=v - 1, to_version=v)
    assert ch.count() == 0


def test_remove_orphans_sweeps_uncommitted_files_only(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))
    # a writer that wrote files but died before the log commit
    tl._write_data_files(_batch(spark, 90, 99), t, 2, (), "data")
    assert tl.remove_orphans(t, min_age_sec=3600) == 0  # age guard holds
    removed = tl.remove_orphans(t)
    assert removed > 0
    assert _ids(tl.read_snapshot(spark, t)) == list(range(10))
    assert tl.remove_orphans(t) == 0  # idempotent


def test_wap_stage_audit_publish(spark, tmp_path):
    """Write-audit-publish: staged files are invisible to readers and to
    the orphan sweep, the audit reads exactly the staged rows, publish is
    an atomic append stamped with the PUBLISH version's sequence number,
    and a failed audit discards without any snapshot ever pointing at the
    bad data."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))
    sid = tl.stage_append(spark, t, _batch(spark, 10, 20))
    # invisible until published; not swept as an orphan
    assert _ids(tl.read_snapshot(spark, t)) == list(range(10))
    assert tl.remove_orphans(t) == 0
    assert _ids(tl.read_staged(spark, t, sid)) == list(range(10, 20))
    v = tl.publish_staged(t, sid)
    assert v == 2
    assert _ids(tl.read_snapshot(spark, t)) == list(range(20))
    assert tl.staged_ids(t) == []
    with pytest.raises(LookupError):
        tl.publish_staged(t, sid)  # a stage resolves exactly once

    # publish-time sequence stamping: a delete AFTER staging but BEFORE
    # publish must not remove the staged rows (they became visible later)
    sid2 = tl.stage_append(spark, t, _batch(spark, 5, 8))  # re-add 5,6,7
    tl.delete_where(spark, t, F.col("event_id") < 8, ["event_id"])
    tl.publish_staged(t, sid2)
    assert _ids(tl.read_snapshot(spark, t)) == [5, 6, 7] + list(range(8, 20))


def test_wap_failed_audit_discards(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))
    bad = _batch(spark, 50, 60).withColumn(
        "event_type", F.lit(None).cast("string")
    )
    sid = tl.stage_append(spark, t, bad)
    staged = tl.read_staged(spark, t, sid)
    nulls = staged.filter(F.col("event_type").isNull()).count()
    assert nulls > 0  # the gate fires
    removed = tl.discard_staged(t, sid)
    assert removed > 0 and tl.staged_ids(t) == []
    assert _ids(tl.read_snapshot(spark, t)) == list(range(10))
    assert tl.current_version(t) == 1  # no snapshot ever saw the bad rows


# ---------------------------------------------------------------------------
# hidden partitioning (Iceberg partition-spec transforms)
# ---------------------------------------------------------------------------


def _hidden_batch(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("conv-"), (F.col("id") % 37).cast("string")).alias(
            "conv_id"
        ),
        F.to_timestamp(
            F.concat(
                F.lit("2026-08-"),
                F.lpad(((F.col("id") % 9) + 1).cast("string"), 2, "0"),
                F.lit(" 10:00:00"),
            )
        ).alias("ts"),
        (F.col("id") % 100).alias("val"),
    )


def test_partition_spec_parse_and_twin_matches_spark(spark):
    """Every transform's Python twin must agree bit-for-bit with the Spark
    expression — pruning projects predicate literals through the twin."""
    fields = tl.parse_partition_spec(
        ("days(ts)", "bucket(4, conv_id)", "truncate(6, conv_id)", "event_id")
    )
    assert [f["name"] for f in fields] == [
        "ts_day",
        "conv_id_bucket_4",
        "conv_id_truncate_6",
        "event_id",
    ]
    df = _hidden_batch(spark, 0, 200)
    dtypes = dict(df.dtypes)
    rows = df.select(
        "conv_id",
        "ts",
        "event_id",
        *[
            tl._transform_expr(f, dtypes[f["source"]]).alias(f"t{i}")
            for i, f in enumerate(fields)
        ],
    ).collect()
    for r in rows:
        assert str(r.t0) == tl._twin_transform(fields[0], str(r.ts))
        assert str(r.t1) == tl._twin_transform(fields[1], r.conv_id)
        assert str(r.t2) == tl._twin_transform(fields[2], r.conv_id)
        assert str(r.t3) == tl._twin_transform(fields[3], r.event_id)
    with pytest.raises(ValueError):
        tl.parse_partition_spec(("bucket(conv_id)",))


def test_hidden_partition_scan_prunes_and_is_exact(spark, tmp_path):
    """A day-range + bucket-equality scan opens only the files whose
    transformed partition values can match — and the result is exactly the
    full-scan filter."""
    t = str(tmp_path / "t")
    df = _hidden_batch(spark, 0, 1000)
    tl.append(
        spark,
        t,
        df,
        stats_cols=("event_id",),
        partition_spec=("days(ts)", "bucket(4, conv_id)"),
    )
    preds = {
        "ts": ("between", "2026-08-02 00:00:00", "2026-08-03 23:59:59"),
        "conv_id": ("=", "conv-5"),
    }
    paths, skipped = tl.prune_files_where(t, preds)
    total = len(tl._state_at(t)[1]["data"])
    # 2 of 9 days x 1 of 4 buckets: at most 2/36 of the files survive
    assert skipped > 0 and len(paths) <= max(1, total * 2 // 18)
    got = _ids(tl.scan_where(spark, t, preds))
    exp = _ids(
        df.filter(
            F.col("ts").between(*preds["ts"][1:])
            & (F.col("conv_id") == "conv-5")
        )
    )
    assert got == exp and len(got) > 0


def test_hidden_partition_truncate_int_and_string(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _hidden_batch(spark, 0, 300)
    tl.append(spark, t, df, partition_spec=("truncate(100, event_id)",))
    preds = {"event_id": ("between", 120, 180)}
    paths, skipped = tl.prune_files_where(t, preds)
    assert skipped > 0  # the 0- and 200- truncation groups are pruned
    assert _ids(tl.scan_where(spark, t, preds)) == list(range(120, 181))


def test_partition_evolution_per_file_spec(spark, tmp_path):
    """Files written under an OLD spec have no value for a new spec's
    fields and must be kept (never prune blind); files under the new spec
    prune. Results stay exact across the evolution."""
    t = str(tmp_path / "t")
    a = _hidden_batch(spark, 0, 400)
    b = _hidden_batch(spark, 1000, 1400)
    tl.append(spark, t, a, partition_spec=("days(ts)",))
    tl.append(spark, t, b, partition_spec=("bucket(4, conv_id)",))
    state = tl._state_at(t)[1]["data"]
    preds = {"conv_id": ("=", "conv-5")}
    paths, skipped = tl.prune_files_where(t, preds)
    # every old-spec file kept, only new-spec files pruned
    old_files = {
        p for p, e in state.items() if e["spec"][0]["name"] == "ts_day"
    }
    assert old_files <= set(paths) and skipped > 0
    got = _ids(tl.scan_where(spark, t, preds))
    exp = _ids(a.unionByName(b).filter(F.col("conv_id") == "conv-5"))
    assert got == exp


def test_hidden_partition_scan_composes_with_deletes(spark, tmp_path):
    """Multi-level hive partitioning writes the SAME filename into many
    partition dirs — the MoR file-identity join must key on the full
    path, or delete application multiplies rows."""
    t = str(tmp_path / "t")
    df = _hidden_batch(spark, 0, 1000)
    tl.append(spark, t, df, partition_spec=("days(ts)", "bucket(4, conv_id)"))
    tl.delete_where(spark, t, F.col("val") % 2 == 0, key_cols=["event_id"])
    preds = {"conv_id": ("=", "conv-5")}
    got = _ids(tl.scan_where(spark, t, preds))
    exp = _ids(
        df.filter((F.col("conv_id") == "conv-5") & (F.col("val") % 2 != 0))
    )
    assert got == exp and len(got) > 0


def test_hidden_partition_wap_and_merge(spark, tmp_path):
    """partition_spec flows through stage/publish and merge_upsert; the
    published and merged files prune like appended ones."""
    t = str(tmp_path / "t")
    sid = tl.stage_append(
        spark,
        t,
        _hidden_batch(spark, 0, 200),
        partition_spec=("bucket(4, conv_id)",),
    )
    tl.publish_staged(t, sid)
    upd = _hidden_batch(spark, 100, 300)
    tl.merge_upsert(
        spark,
        t,
        upd,
        key_cols=["event_id"],
        partition_spec=("bucket(4, conv_id)",),
    )
    preds = {"conv_id": ("=", "conv-11")}
    _paths, skipped = tl.prune_files_where(t, preds)
    assert skipped > 0
    got = _ids(tl.scan_where(spark, t, preds))
    exp = _ids(
        _hidden_batch(spark, 0, 300).filter(F.col("conv_id") == "conv-11")
    )
    assert got == exp


# ---------------------------------------------------------------------------
# named refs: branches, tags, fast-forward publish
# ---------------------------------------------------------------------------


def test_branch_commits_invisible_to_main(spark, tmp_path):
    """Commits on a branch share the global version sequence but chain off
    the branch head — a main reader must never fold them in."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))  # v1 main
    assert tl.create_branch(t, "audit") == 1
    tl.append(spark, t, _batch(spark, 100, 110), branch="audit")  # v2 audit
    tl.append(spark, t, _batch(spark, 10, 20))  # v3 main
    assert tl.current_version(t) == 3
    assert _ids(tl.read_snapshot(spark, t)) == list(range(20))
    assert _ids(tl.read_snapshot(spark, t, ref="audit")) == list(range(10)) + list(
        range(100, 110)
    )
    # branch head chains off v1, untouched by v3
    assert tl.resolve_ref(t, "audit") == 2
    assert [
        (c["version"], c["branch"]) for c in tl.snapshot_lineage(t)
    ] == [(1, "main"), (2, "audit"), (3, "main")]
    # main-chain incremental scan skips the branch commit entirely
    assert _ids(tl.incremental_append_scan(spark, t, from_version=1)) == list(
        range(10, 20)
    )


def test_tag_pins_snapshot_through_expiry(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))  # v1
    tl.create_tag(t, "train-2026-08")
    tl.overwrite(spark, t, _batch(spark, 100, 110))  # v2
    tl.append(spark, t, _batch(spark, 110, 120))  # v3
    assert _ids(tl.read_snapshot(spark, t, ref="train-2026-08")) == list(range(10))
    # keep_last=2 would expire v1, but the tag pins it (Iceberg ref retention)
    res = tl.expire_snapshots(t, keep_last=2)
    assert res["versions_removed"] == 0
    assert _ids(tl.read_snapshot(spark, t, ref="train-2026-08")) == list(range(10))
    # drop the tag: the next expiry sweeps v1 and its files
    tl.drop_ref(t, "train-2026-08")
    _, s1 = tl._state_at(t, 1)
    res = tl.expire_snapshots(t, keep_last=2)
    assert res["versions_removed"] == 1
    assert all(not os.path.exists(p) for p in s1["data"])
    with pytest.raises(tl.SnapshotExpired):
        tl.read_snapshot(spark, t, version=1)


def test_branch_wap_fast_forward(spark, tmp_path):
    """The branch-WAP flow: write to an audit branch, read it back by ref,
    publish with ONE atomic fast-forward commit; the published rows stream
    through the incremental append scan like a plain append."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))  # v1 main
    tl.create_branch(t, "staging")
    tl.append(spark, t, _batch(spark, 10, 20), branch="staging")  # v2
    tl.append(spark, t, _batch(spark, 20, 30), branch="staging")  # v3
    # audit: main untouched, branch has everything
    assert _ids(tl.read_snapshot(spark, t)) == list(range(10))
    audited = tl.read_snapshot(spark, t, ref="staging")
    assert _ids(audited) == list(range(30))
    v = tl.fast_forward(t, "staging")
    assert v == 4
    assert _ids(tl.read_snapshot(spark, t)) == list(range(30))
    # a publish-only fast-forward IS an append batch for incremental scans
    assert _ids(tl.incremental_append_scan(spark, t, from_version=1)) == list(
        range(10, 30)
    )
    # CDC nets the published rows as inserts
    cdc = tl.changelog_scan(spark, t, from_version=1)
    ins = cdc.filter(F.col("_change_type") == "insert")
    assert _ids(ins) == list(range(10, 30))
    assert cdc.filter(F.col("_change_type") == "delete").count() == 0


def test_fast_forward_stale_branch_replaces_main(spark, tmp_path):
    """Main advanced after the fork: publishing re-points main at the
    branch state (removing main's post-fork files), and the incremental
    append scan refuses the commit — it is not expressible as appends."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))  # v1
    tl.create_branch(t, "exp")
    tl.append(spark, t, _batch(spark, 500, 505))  # v2 main post-fork
    tl.append(spark, t, _batch(spark, 10, 20), branch="exp")  # v3
    tl.fast_forward(t, "exp")  # v4
    assert _ids(tl.read_snapshot(spark, t)) == list(range(20))
    with pytest.raises(ValueError, match="fast_forward"):
        tl.incremental_append_scan(spark, t, from_version=1)
    # CDC still expresses it: v2's rows insert then delete, net 0..19
    cdc = tl.changelog_scan(spark, t, from_version=1)
    assert _ids(cdc.filter(F.col("_change_type") == "delete")) == list(
        range(500, 505)
    )


def test_ref_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 5))
    tl.create_tag(t, "x")
    with pytest.raises(ValueError, match="already exists"):
        tl.create_branch(t, "x")
    with pytest.raises(ValueError, match="invalid ref name"):
        tl.create_tag(t, "main")
    with pytest.raises(ValueError, match="invalid ref name"):
        tl.create_tag(t, "bad/name")
    with pytest.raises(LookupError, match="unknown version"):
        tl.create_tag(t, "y", version=99)
    with pytest.raises(LookupError, match="unknown ref"):
        tl.drop_ref(t, "nope")
    with pytest.raises(ValueError, match="tag, not a branch"):
        tl.append(spark, t, _batch(spark, 5, 6), branch="x")
    with pytest.raises(LookupError, match="unknown ref"):
        tl.append(spark, t, _batch(spark, 5, 6), branch="nope")


def test_expiry_writes_base_at_every_chain_break(spark, tmp_path):
    """Interleaved branch commits: expiry must leave every surviving
    lineage replayable — a rebase base lands wherever a retained commit's
    parent was expired, on main AND on the branch."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))  # v1 main
    tl.create_branch(t, "b")
    tl.append(spark, t, _batch(spark, 100, 105), branch="b")  # v2
    tl.append(spark, t, _batch(spark, 10, 20))  # v3 main (parent v1)
    tl.append(spark, t, _batch(spark, 20, 30))  # v4 main
    res = tl.expire_snapshots(t, keep_last=2)  # retains {3,4} + branch head 2
    assert res["versions_removed"] == 1  # only v1
    # both lineages still replay: bases at v2 and v3 (parents expired)
    assert os.path.exists(tl._base_path(t, 2))
    assert os.path.exists(tl._base_path(t, 3))
    assert _ids(tl.read_snapshot(spark, t)) == list(range(30))
    assert _ids(tl.read_snapshot(spark, t, ref="b")) == list(range(10)) + list(
        range(100, 105)
    )
    with pytest.raises(tl.SnapshotExpired):
        tl.read_snapshot(spark, t, version=1)


# ---------------------------------------------------------------------------
# schema evolution (field IDs)
# ---------------------------------------------------------------------------


def _evo_base(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(
        spark,
        t,
        spark.range(0, 5).selectExpr(
            "cast(id as int) AS k", "concat('a', id) AS v",
            "cast(id * 10 as int) AS n",
        ),
    )
    return t


def test_evolve_rename_widen_add_projects_by_field_id(spark, tmp_path):
    """Rename is metadata-only (old files keep the old column name; the
    read resolves by field id), widen casts at read time, add null-fills
    older files — no data file is rewritten (Iceberg spec schema
    evolution)."""
    t = _evo_base(spark, tmp_path)
    files_before = sorted(tl._state_at(t)[1]["data"])
    tl.evolve_schema(
        t, rename={"v": "label"}, widen={"n": "bigint"}, add=[("ch", "string")]
    )
    assert sorted(tl._state_at(t)[1]["data"]) == files_before  # metadata only
    df = tl.read_snapshot(spark, t)
    assert df.columns == ["k", "label", "n", "ch"]
    assert dict(df.dtypes)["n"] == "bigint"
    assert df.filter(F.col("ch").isNull()).count() == 5
    assert [r.label for r in df.orderBy("k").collect()] == [
        f"a{i}" for i in range(5)
    ]
    # time travel still reads the PRE-evolve schema
    old = tl.read_snapshot(spark, t, version=1)
    assert old.columns == ["k", "v", "n"] and dict(old.dtypes)["n"] == "int"
    # fields accessor: ids stable across the rename/widen, fresh id for add
    assert tl.table_fields(t) == [
        [1, "k", "int"], [2, "label", "string"],
        [3, "n", "bigint"], [4, "ch", "string"],
    ]


def test_evolve_drop_then_readd_never_resurrects(spark, tmp_path):
    """A re-added name takes a FRESH field id, so old files' data for the
    dropped column stays invisible forever (Iceberg's id-based rule)."""
    t = _evo_base(spark, tmp_path)
    tl.evolve_schema(t, drop=("v",))
    assert tl.read_snapshot(spark, t).columns == ["k", "n"]
    tl.evolve_schema(t, add=[("v", "string")])
    df = tl.read_snapshot(spark, t)
    assert df.filter(F.col("v").isNotNull()).count() == 0
    ids = [i for i, n, _t in tl.table_fields(t) if n == "v"]
    assert ids == [4]  # last_field_id was 3; drop never lowers it


def test_evolve_deletes_translate_key_columns(spark, tmp_path):
    """Equality-delete files written before a rename still apply: the key
    column resolves through its field id to the current name and type."""
    t = _evo_base(spark, tmp_path)
    tl.delete_where(spark, t, F.col("k") == 2, ["k"])
    tl.evolve_schema(t, rename={"k": "key"}, widen={"k": "bigint"})
    df = tl.read_snapshot(spark, t)
    assert df.columns == ["key", "v", "n"]
    assert sorted(r.key for r in df.collect()) == [0, 1, 3, 4]
    # post-evolve delete on the new name composes with pre-evolve files
    tl.delete_where(spark, t, F.col("key") == 0, ["key"])
    assert sorted(r.key for r in tl.read_snapshot(spark, t).collect()) == [1, 3, 4]
    # dropping a key column still referenced by a live delete is refused
    tl.evolve_schema(t, drop=("key",))
    with pytest.raises(ValueError, match="delete key column"):
        tl.read_snapshot(spark, t).count()


def test_evolve_prune_and_scan_translate_stats(spark, tmp_path):
    """Footer stats and hidden-partition specs are keyed by write-time
    names; pruning translates the predicate's current name per file, and
    files older than a column are never pruned blind."""
    t = str(tmp_path / "t")
    tl.append(
        spark, t,
        spark.range(0, 100).selectExpr("cast(id as int) AS a", "id % 7 AS g"),
        stats_cols=("a",),
    )
    tl.evolve_schema(t, rename={"a": "alpha"})
    tl.append(
        spark, t,
        spark.range(100, 200).selectExpr("cast(id as int) AS alpha", "id % 7 AS g"),
        stats_cols=("alpha",),
    )
    keep, skipped = tl.prune_files_where(t, {"alpha": ("between", 150, 160)})
    assert skipped >= 1  # the pre-rename file pruned via id translation
    got = tl.scan_where(spark, t, {"alpha": ("between", 150, 160)})
    assert got.count() == 11 and "alpha" in got.columns
    # a column added AFTER the first file exists: old file kept (no stats)
    tl.evolve_schema(t, add=[("z", "int")])
    keep2, _ = tl.prune_files_where(t, {"z": ("=", 1)})
    assert set(keep) <= set(keep2)


def test_evolve_incremental_and_changelog_project_to_target(spark, tmp_path):
    """Incremental and CDC scans spanning an evolve commit surface every
    row in the TO-version's field view; the evolve itself is a row-level
    no-op."""
    t = _evo_base(spark, tmp_path)
    tl.evolve_schema(t, rename={"v": "label"}, widen={"n": "bigint"})
    tl.append(
        spark, t,
        spark.createDataFrame([(9, "b9", 90)], "k int, label string, n bigint"),
    )
    inc = tl.incremental_append_scan(spark, t, from_version=1)
    assert inc.columns == ["k", "label", "n"] and inc.count() == 1
    cl = tl.changelog_scan(spark, t, from_version=0)
    assert cl.filter("_change_type = 'insert'").count() == 6
    assert "label" in cl.columns
    # pre-image deletes across the evolve translate their key columns
    tl.delete_where(spark, t, F.col("k") == 1, ["k"])
    cl2 = tl.changelog_scan(spark, t, from_version=0)
    gone = cl2.filter("_change_type = 'delete'").collect()
    assert [r.k for r in gone] == [1] and gone[0].label == "a1"


def test_evolve_compact_and_expiry_preserve_fields(spark, tmp_path):
    """compact rewrites into the CURRENT schema; expiry's rebase base
    persists fields/evolved so replay after truncation stays correct."""
    t = _evo_base(spark, tmp_path)
    tl.evolve_schema(t, rename={"v": "label"}, add=[("ch", "string")])
    tl.append(
        spark, t,
        spark.createDataFrame(
            [(9, "b9", 90, "x")], "k int, label string, n int, ch string"
        ),
    )
    tl.compact(spark, t)
    tl.expire_snapshots(t, keep_last=1)
    df = tl.read_snapshot(spark, t)
    assert df.columns == ["k", "label", "n", "ch"] and df.count() == 6
    assert tl.table_fields(t)[1] == [2, "label", "string"]


def test_evolve_validation(spark, tmp_path):
    t = _evo_base(spark, tmp_path)
    with pytest.raises(ValueError, match="lossless"):
        tl.evolve_schema(t, widen={"v": "int"})
    with pytest.raises(ValueError, match="unknown column"):
        tl.evolve_schema(t, rename={"nope": "x"})
    with pytest.raises(ValueError, match="already exists"):
        tl.evolve_schema(t, add=[("v", "string")])
    with pytest.raises(ValueError, match="collides"):
        tl.evolve_schema(t, rename={"v": "n"})
    with pytest.raises(ValueError, match="renamed and dropped"):
        tl.evolve_schema(t, rename={"v": "x"}, drop=("v",))
    with pytest.raises(ValueError, match="every column"):
        tl.evolve_schema(t, drop=("k", "v", "n"))


def test_evolve_on_branch_fast_forwards_to_main(spark, tmp_path):
    """An evolve commit on the main chain is published into a branch
    reader's view only via its own lineage; fast_forward carries the
    fields AND the evolved flag so main's projection stays id-based."""
    t = _evo_base(spark, tmp_path)
    tl.create_branch(t, "s")
    tl.append(
        spark, t,
        spark.range(5, 8).selectExpr(
            "cast(id as int) AS k", "concat('a', id) AS v",
            "cast(id * 10 as int) AS n",
        ),
        branch="s",
    )
    tl.evolve_schema(t, rename={"v": "label"})  # on main
    assert tl.read_snapshot(spark, t).columns == ["k", "label", "n"]
    # branch forked pre-evolve: still the old view
    assert tl.read_snapshot(spark, t, ref="s").columns == ["k", "v", "n"]
    tl.fast_forward(t, "s")
    # main re-pointed at the branch state -> pre-evolve fields restored
    df = tl.read_snapshot(spark, t)
    assert df.columns == ["k", "v", "n"] and df.count() == 8


# ---------------------------------------------------------------------------
# position deletes (Iceberg v2 position-delete files)
# ---------------------------------------------------------------------------


def test_position_delete_predicate_and_seq_scope(spark, tmp_path):
    """delete_where_positions removes exactly the matching live rows with
    no key columns and no rewrite; a row re-appended after the delete
    survives (position deletes scope to seq <= theirs); time travel still
    sees the pre-delete rows."""
    t = str(tmp_path / "t")
    tl.append(spark, t, spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v"))
    files_before = sorted(tl._state_at(t)[1]["data"])
    tl.delete_where_positions(spark, t, F.col("k") % 3 == 0)
    assert sorted(tl._state_at(t)[1]["data"]) == files_before  # no rewrite
    assert sorted(r.k for r in tl.read_snapshot(spark, t).collect()) == [
        1, 2, 4, 5, 7, 8,
    ]
    tl.append(spark, t, spark.createDataFrame([(0, 99)], "k long, v long"))
    assert sorted(r.k for r in tl.read_snapshot(spark, t).collect()) == [
        0, 1, 2, 4, 5, 7, 8,
    ]
    assert tl.read_snapshot(spark, t, version=1).count() == 10


def test_position_dedup_keeps_one_copy_of_identical_rows(spark, tmp_path):
    """dedup_keep_first deletes all-but-one copy of rows identical in
    EVERY column — the operation equality deletes cannot express (any
    key-based delete would kill the survivor too)."""
    t = str(tmp_path / "t")
    d = spark.range(0, 6).selectExpr("id % 3 AS k", "concat('v', id % 3) AS v")
    tl.append(spark, t, d)  # each (k, v) twice
    tl.append(spark, t, d)  # now four copies each
    tl.dedup_keep_first(spark, t, ["k", "v"])
    rows = tl.read_snapshot(spark, t).collect()
    assert sorted((r.k, r.v) for r in rows) == [
        (0, "v0"), (1, "v1"), (2, "v2"),
    ]
    # idempotent: a second pass deletes nothing more
    tl.dedup_keep_first(spark, t, ["k", "v"])
    assert tl.read_snapshot(spark, t).count() == 3


def test_position_deletes_compose_with_equality_and_evolution(spark, tmp_path):
    """Position deletes are schema-agnostic: one written BEFORE a
    rename/widen/add evolution still applies after it (file+pos reference
    nothing a rename can move), equality deletes compose in the same read,
    and a positional delete written AFTER the evolution can reference the
    added column."""
    t = str(tmp_path / "t")
    tl.append(
        spark, t, spark.range(0, 10).selectExpr("cast(id as int) AS k", "id * 2 AS v")
    )
    tl.delete_where_positions(spark, t, F.col("k") == 4)
    tl.evolve_schema(
        t, rename={"k": "key"}, widen={"k": "bigint"}, add=[("z", "string")]
    )
    tl.delete_where(spark, t, F.col("key") == 5, key_cols=["key"])
    assert sorted(r.key for r in tl.read_snapshot(spark, t).collect()) == [
        0, 1, 2, 3, 6, 7, 8, 9,
    ]
    tl.delete_where_positions(spark, t, F.col("z").isNull() & (F.col("key") == 6))
    assert sorted(r.key for r in tl.read_snapshot(spark, t).collect()) == [
        0, 1, 2, 3, 7, 8, 9,
    ]


def test_position_delete_changelog_preimages_and_compact(spark, tmp_path):
    """The CDC changelog emits the exact pre-image rows of a position
    delete, and compaction folds position deletes into rewritten files."""
    t = str(tmp_path / "t")
    tl.append(spark, t, spark.range(0, 5).selectExpr("id AS k", "concat('x', id) AS v"))
    tl.delete_where_positions(spark, t, F.col("k").isin(1, 3))
    cl = tl.changelog_scan(spark, t, from_version=0)
    assert sorted(
        (r.k, r.v) for r in cl.filter("_change_type = 'delete'").collect()
    ) == [(1, "x1"), (3, "x3")]
    assert cl.filter("_change_type = 'insert'").count() == 5
    tl.compact(spark, t)
    assert sorted(r.k for r in tl.read_snapshot(spark, t).collect()) == [0, 2, 4]
    assert not tl._state_at(t)[1]["deletes"]


def test_position_delete_pruned_scans_and_expiry(spark, tmp_path):
    """Stats-pruned scans apply position deletes over the pruned file set,
    and expiry's rebase base persists the positional flag so replay after
    truncation still anti-joins on row identity."""
    t = str(tmp_path / "t")
    tl.append(
        spark,
        t,
        spark.range(0, 100).selectExpr("id AS k", "id % 7 AS g").repartitionByRange(
            5, "k"
        ),
        stats_cols=("k",),
    )
    tl.delete_where_positions(spark, t, F.col("k") % 10 == 0)
    got = tl.scan_between(spark, t, "k", 20, 59)
    assert got.count() == 36 and "_pos" not in got.columns
    tl.append(spark, t, spark.range(100, 110).selectExpr("id AS k", "id % 7 AS g"))
    tl.expire_snapshots(t, keep_last=2)
    df = tl.read_snapshot(spark, t)
    assert df.count() == 100 and df.filter("k % 10 = 0 AND k < 100").count() == 0


def test_position_dedup_order_cols_pick_survivor(spark, tmp_path):
    """With order_cols, the kept copy is the FIRST by that ordering —
    deterministic survivor selection across duplicate groups that differ
    in non-key columns."""
    t = str(tmp_path / "t")
    tl.append(
        spark,
        t,
        spark.createDataFrame(
            [(1, "b", 20), (1, "a", 10), (2, "c", 30)], "k int, tag string, w int"
        ),
    )
    tl.dedup_keep_first(spark, t, ["k"], order_cols=["w"])
    rows = {r.k: r.tag for r in tl.read_snapshot(spark, t).collect()}
    assert rows == {1: "a", 2: "c"}


# ---------------------------------------------------------------------------
# copy-on-write UPDATE
# ---------------------------------------------------------------------------


def test_update_rewrites_only_matched_files(spark, tmp_path):
    """update_where rewrites ONLY the files containing a matching live row
    (5 range-partitioned files, predicate hits one) in one atomic commit;
    untouched files stay byte-identical and time travel sees old values."""
    t = str(tmp_path / "t")
    tl.append(
        spark,
        t,
        spark.range(0, 50)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(5, "k"),
        stats_cols=("k",),
    )
    files_v1 = set(tl._state_at(t)[1]["data"])
    tl.update_where(spark, t, F.col("k").between(10, 14), {"v": F.col("v") + 1000})
    st = tl._state_at(t)[1]
    assert len(files_v1 & set(st["data"])) == 4  # 4 of 5 untouched
    rows = {r.k: r.v for r in tl.read_snapshot(spark, t).collect()}
    assert len(rows) == 50 and rows[12] == 1024 and rows[9] == 18
    assert {r.k: r.v for r in tl.read_snapshot(spark, t, version=1).collect()}[
        12
    ] == 24


def test_update_folds_pending_deletes_and_cdc_net_diff(spark, tmp_path):
    """A rewrite folds pending equality AND position deletes into the new
    files, and the CDC changelog of an update commit is the exact net row
    diff — carried-over unchanged neighbors cancel in exceptAll."""
    t = str(tmp_path / "t")
    tl.append(spark, t, spark.range(0, 20).selectExpr("id AS k", "id * 2 AS v"))
    tl.delete_where(spark, t, F.col("k") == 11, key_cols=["k"])
    tl.delete_where_positions(spark, t, F.col("k") == 1)
    tl.update_where(spark, t, F.col("k") == 13, {"v": F.lit(7)})
    rows = {r.k: r.v for r in tl.read_snapshot(spark, t).collect()}
    assert 11 not in rows and 1 not in rows and rows[13] == 7 and len(rows) == 18
    cl = tl.changelog_scan(spark, t, from_version=3)
    assert sorted(
        (r.k, r.v) for r in cl.filter("_change_type = 'delete'").collect()
    ) == [(13, 26)]
    assert sorted(
        (r.k, r.v) for r in cl.filter("_change_type = 'insert'").collect()
    ) == [(13, 7)]


def test_update_noop_and_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    tl.append(spark, t, spark.range(0, 5).selectExpr("id AS k", "id AS v"))
    v = tl.update_where(spark, t, F.col("k") == 999, {"v": F.lit(0)})
    assert v == 2 and tl.read_snapshot(spark, t).count() == 5
    with pytest.raises(ValueError, match="unknown column"):
        tl.update_where(spark, t, F.col("k") == 0, {"nope": F.lit(1)})


def test_update_across_schema_evolution(spark, tmp_path):
    """Updates after a rename/add target current names; the rewrite lands
    in the CURRENT field schema so old files' id-resolution still holds."""
    t = str(tmp_path / "t")
    tl.append(spark, t, spark.range(0, 10).selectExpr("cast(id as int) AS k", "id * 2 AS v"))
    tl.evolve_schema(t, rename={"v": "val"}, add=[("tag", "string")])
    tl.update_where(spark, t, F.col("k") == 0, {"tag": F.lit("zero"), "val": F.lit(1)})
    rows = {r.k: (r.val, r.tag) for r in tl.read_snapshot(spark, t).collect()}
    assert rows[0] == (1, "zero") and rows[5] == (10, None)
    assert tl.table_fields(t)[0] == [1, "k", "int"]


# ---------------------------------------------------------------------------
# metadata inspection tables
# ---------------------------------------------------------------------------


def test_metadata_tables(spark, tmp_path):
    """history / files / refs metadata tables (Iceberg's queryable table
    internals): one row per commit with lineage + tallies, one row per
    live file with seq/rows/kind/positional, one row per ref with branch
    heads DERIVED from the log (not the creation point)."""
    t = str(tmp_path / "t")
    tl.append(spark, t, _batch(spark, 0, 10))
    tl.create_branch(t, "b1")
    tl.create_tag(t, "t1")
    tl.delete_where(spark, t, F.col("event_id") < 3, key_cols=["event_id"])
    tl.delete_where_positions(spark, t, F.col("event_id") == 5)
    tl.append(spark, t, _batch(spark, 20, 25), branch="b1")
    h = tl.table_history(spark, t)
    assert [
        (r.version, r.operation, r.branch, r.rows_added)
        for r in h.orderBy("version").collect()
    ] == [
        (1, "append", "main", 10),
        (2, "delete", "main", 0),
        (3, "delete", "main", 0),
        (4, "append", "b1", 5),
    ]
    f = tl.table_files(spark, t)
    assert f.filter("kind = 'data'").agg(F.sum("rows")).first()[0] == 10
    dele = {r.positional: r.rows for r in f.filter("kind = 'delete'").collect()}
    assert dele == {False: 3, True: 1}
    # files at a version: pre-delete snapshot has no delete files
    assert tl.table_files(spark, t, version=1).filter("kind='delete'").count() == 0
    refs = {r.name: (r.kind, r.version) for r in tl.table_refs(spark, t).collect()}
    assert refs == {
        "main": ("branch", 3),
        "b1": ("branch", 4),
        "t1": ("tag", 1),
    }


# ---------------------------------------------------------------------------
# add_files import + checkpointed incremental consumer
# ---------------------------------------------------------------------------


def test_add_files_by_reference(spark, tmp_path):
    """add_files imports external parquet BY REFERENCE in one atomic
    commit: manifests come from footers only, stats prune, MoR deletes
    compose, and no byte is copied (the manifest points at the source)."""
    src = str(tmp_path / "ext")
    spark.range(0, 20).selectExpr("id AS k", "id * 3 AS v").repartitionByRange(
        2, "k"
    ).write.parquet(src)
    t = str(tmp_path / "t")
    tl.append(spark, t, spark.range(100, 105).selectExpr("id AS k", "id * 3 AS v"))
    v = tl.add_files(spark, t, src, stats_cols=("k",))
    assert v == 2 and tl.read_snapshot(spark, t).count() == 25
    st = tl._state_at(t)[1]
    assert len([p for p in st["data"] if p.startswith(src)]) == 2
    _keep, skipped = tl.prune_files(t, "k", 0, 5)
    assert skipped >= 1
    tl.delete_where(spark, t, F.col("k") % 2 == 0, key_cols=["k"])
    assert tl.read_snapshot(spark, t).count() == 12


def test_add_files_refuses_path_only_partitions_and_schema_mismatch(
    spark, tmp_path
):
    """A hive source whose partition values exist only in dir names would
    read back null through per-file scans — refused, not silently
    null-filled. Schema enforcement matches append."""
    t = str(tmp_path / "t")
    tl.append(spark, t, spark.range(0, 3).selectExpr("id AS k", "id AS v"))
    hsrc = str(tmp_path / "hive")
    spark.range(0, 10).selectExpr("id AS k", "id % 2 AS part").write.partitionBy(
        "part"
    ).parquet(hsrc)
    with pytest.raises(ValueError, match="path-only"):
        tl.add_files(spark, t, hsrc)
    bad = str(tmp_path / "bad")
    spark.range(0, 3).selectExpr("cast(id as string) AS k", "id AS v").write.parquet(bad)
    with pytest.raises(ValueError, match="schema mismatch"):
        tl.add_files(spark, t, bad)


def test_consumer_redelivery_until_ack(spark, tmp_path):
    """consume_incremental re-delivers the same delta until ack() persists
    the offset (crash-before-ack safety); after ack only newer commits
    surface, and an up-to-date consumer gets df=None."""
    t = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    tl.append(spark, t, spark.range(0, 5).selectExpr("id AS k"))
    df, f0, t0, _unacked = tl.consume_incremental(spark, t, cp)
    assert (f0, t0) == (0, 1) and df.count() == 5
    df2, f1, t1, ack2 = tl.consume_incremental(spark, t, cp)  # re-delivered
    assert (f1, t1) == (0, 1) and df2.count() == 5
    assert ack2() == 1 and tl.consumer_offset(cp) == 1
    df3, f2, t2, _ = tl.consume_incremental(spark, t, cp)
    assert df3 is None and (f2, t2) == (1, 1)
    tl.append(spark, t, spark.range(5, 8).selectExpr("id AS k"))
    df4, _, _, ack4 = tl.consume_incremental(spark, t, cp)
    assert sorted(r.k for r in df4.collect()) == [5, 6, 7]
    ack4()


def test_consumer_changelog_mode_folds_retractions(spark, tmp_path):
    """appends mode refuses in-range deletes (Iceberg's default streaming
    read); changelog mode surfaces them as retraction rows for
    retractable-state consumers."""
    t = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    tl.append(spark, t, spark.range(0, 5).selectExpr("id AS k"))
    _df, _f, _t, ack = tl.consume_incremental(spark, t, cp)
    ack()
    tl.delete_where(spark, t, F.col("k") == 3, key_cols=["k"])
    with pytest.raises(ValueError, match="delete"):
        tl.consume_incremental(spark, t, cp)
    df, _f, _t, ack2 = tl.consume_incremental(spark, t, cp, mode="changelog")
    assert [(r.k, r._change_type) for r in df.collect()] == [(3, "delete")]
    ack2()
    with pytest.raises(ValueError, match="unknown consume mode"):
        tl.consume_incremental(spark, t, cp, mode="nope")


def test_expiry_age_retention_composes_with_keep_last(spark, tmp_path):
    """max_age_sec retains every commit younger than the cutoff on TOP of
    keep_last (Iceberg's retain-last + older-than composition): with a
    huge age window nothing expires; with age 0 the keep_last floor still
    holds."""
    t = str(tmp_path / "t")
    for lo in range(0, 40, 10):
        tl.append(spark, t, _batch(spark, lo, lo + 10))
    res = tl.expire_snapshots(t, keep_last=1, max_age_sec=3600.0)
    assert res["versions_removed"] == 0  # all four commits are young
    assert tl.read_snapshot(spark, t, version=1).count() == 10
    res = tl.expire_snapshots(t, keep_last=2, max_age_sec=0.0)
    assert res["versions_removed"] == 2  # floor still keeps the last two
    with pytest.raises(tl.SnapshotExpired):
        tl.read_snapshot(spark, t, version=1)
    assert tl.read_snapshot(spark, t).count() == 40


def test_partitions_metadata_table(spark, tmp_path):
    """table_partitions aggregates live-file manifests per partition tuple
    (Iceberg's partitions metadata table): counts/rows/bytes/seq-range per
    sink with no data file opened; unpartitioned files land under {}."""
    t = str(tmp_path / "t")
    d = spark.range(0, 30).selectExpr("id AS k", "concat('s', id % 3) AS sink")
    tl.append(spark, t, d, partition_by=("sink",))
    tl.append(spark, t, d.filter("id % 3 = 0"), partition_by=("sink",))
    tl.append(spark, t, spark.createDataFrame([(99, "sX")], "k long, sink string"))
    rows = {
        r.partition: (r.rows, r.min_seq, r.max_seq)
        for r in tl.table_partitions(spark, t).collect()
    }
    assert rows[json.dumps({"sink": "s0"})] == (20, 1, 2)
    assert rows[json.dumps({"sink": "s1"})] == (10, 1, 1)
    assert rows[json.dumps({})] == (1, 3, 3)  # unpartitioned commit


def test_rewrite_position_deletes_folds_and_drops_dangling(spark, tmp_path):
    """rewrite_position_deletes folds the positional backlog into ONE
    delete file at seq=max (provably applicability-preserving), drops
    identities whose data file is no longer live (a CoW update rewrote
    it), leaves the row set identical, and is a no-op to changelog and
    incremental scans. Equality deletes are untouched."""
    t = str(tmp_path / "t")
    tl.append(
        spark,
        t,
        spark.range(0, 30).selectExpr("id AS k", "id AS v").repartitionByRange(3, "k"),
    )
    tl.delete_where_positions(spark, t, F.col("k") == 1)
    tl.delete_where_positions(spark, t, F.col("k") == 12)
    tl.delete_where(spark, t, F.col("k") == 29, key_cols=["k"])
    tl.update_where(spark, t, F.col("k") == 2, {"v": F.lit(0)})  # dangles k=1's ref
    before = sorted(r.k for r in tl.read_snapshot(spark, t).collect())
    v = tl.rewrite_position_deletes(spark, t)
    st = tl._state_at(t)[1]
    pos = [e for e in st["deletes"].values() if e.get("positional")]
    eq = [e for e in st["deletes"].values() if not e.get("positional")]
    assert len(pos) == 1 and pos[0]["rows"] == 1  # k=12 kept, k=1 dangled
    assert len(eq) == 1
    assert sorted(r.k for r in tl.read_snapshot(spark, t).collect()) == before
    assert tl.changelog_scan(spark, t, from_version=v - 1).count() == 0
    tl.append(spark, t, spark.range(100, 102).selectExpr("id AS k", "id AS v"))
    assert tl.incremental_append_scan(spark, t, from_version=v - 1).count() == 2
    # nothing to fold on a table without positional deletes
    t2 = str(tmp_path / "t2")
    tl.append(spark, t2, spark.range(0, 3).selectExpr("id AS k"))
    assert tl.rewrite_position_deletes(spark, t2) is None


def test_maintenance_plan_recommends_then_clears(spark, tmp_path):
    """maintenance_plan reads manifests only: a table with a small-file
    backlog + position-delete pileup + equality-delete pileup gets all
    three recommendations; RUNNING them clears the plan (compact folds
    both delete kinds, so the positional action disappears with it)."""
    t = str(tmp_path / "t")
    for lo in range(0, 40, 10):  # 4 commits of small files
        tl.append(spark, t, _batch(spark, lo, lo + 10).coalesce(1))
    for k in (1, 2):
        tl.delete_where_positions(spark, t, F.col("event_id") == k)
    for k in (3, 4, 5, 6):
        tl.delete_where(spark, t, F.col("event_id") == k, key_cols=["event_id"])
    plan = {r.action: r.n for r in tl.maintenance_plan(spark, t).collect()}
    assert plan.get("compact_binpack") == 4
    assert plan.get("rewrite_position_deletes") == 2
    assert plan.get("compact") == 4
    tl.compact(spark, t)  # folds every delete and the small files
    plan2 = [r.action for r in tl.maintenance_plan(spark, t).collect()]
    assert "rewrite_position_deletes" not in plan2 and "compact" not in plan2
    # a healthy table gives an empty plan (backlog thresholds not reached;
    # at pytest scale every file is "small", so raise that threshold)
    t2 = str(tmp_path / "t2")
    tl.append(spark, t2, _batch(spark, 0, 10))
    assert tl.maintenance_plan(spark, t2, small_file_backlog=99).count() == 0
    # version-chain growth triggers expiry advice
    plan3 = {r.action for r in tl.maintenance_plan(spark, t, keep_versions=5).collect()}
    assert "expire_snapshots" in plan3


def test_compact_sort_clusters_and_prunes(spark, tmp_path):
    """Sort rewrite: hash-scattered files become range-clustered ones with
    disjoint min/max stats — a point predicate then keeps exactly one
    file; pending deletes are folded in and their files removed."""
    t = str(tmp_path / "cs")
    tl.append(
        spark,
        t,
        spark.range(0, 100).selectExpr("id AS k", "id % 7 AS v").repartition(4),
    )
    tl.delete_where_positions(spark, t, F.col("k") == 50)
    keep0, skip0 = tl.prune_files_where(t, {"k": ("=", 10)})
    assert len(keep0) == 4 and skip0 == 0  # hash layout: every file overlaps
    tl.compact_sort(spark, t, ("k",), n_files=4)
    keep1, skip1 = tl.prune_files_where(t, {"k": ("=", 10)})
    assert len(keep1) == 1 and skip1 == 3
    _, state = tl._state_at(t)
    assert not state["deletes"]  # consumed by the rewrite, removed in-commit
    assert tl.read_snapshot(spark, t).count() == 99
    got = sorted(r.k for r in tl.scan_where(spark, t, {"k": ("between", 45, 55)}).collect())
    assert got == [45, 46, 47, 48, 49, 51, 52, 53, 54, 55]


def test_compact_sort_zorder_prunes_2d_box(spark, tmp_path):
    """Z-order rewrite: a 2-D box predicate prunes most files, where a
    single-column sort (stats recorded on both dims) prunes nothing on
    the trailing dimension — the multi-dimensional clustering contract."""
    df = spark.range(0, 256).selectExpr(
        "id % 16 AS a", "cast(id / 16 AS long) AS b", "id AS payload"
    )
    tz = str(tmp_path / "cz")
    tl.append(spark, tz, df.repartition(4))
    tl.compact_sort(spark, tz, ("a", "b"), n_files=4, zorder=True)
    keepz, skipz = tl.prune_files_where(
        tz, {"a": ("between", 0, 3), "b": ("between", 0, 3)}
    )
    assert len(keepz) + skipz == 4 and skipz >= 2
    assert tl.read_snapshot(spark, tz).count() == 256
    ts = str(tmp_path / "cs1")
    tl.append(spark, ts, df.repartition(4))
    tl.compact_sort(spark, ts, ("a",), n_files=4, stats_cols=("a", "b"))
    _, skips = tl.prune_files_where(ts, {"b": ("between", 0, 3)})
    assert skips == 0  # leading-column sort cannot prune the other dim
    # exact rows either way
    gz = sorted(
        r.payload
        for r in tl.scan_where(
            spark, tz, {"a": ("between", 0, 3), "b": ("between", 0, 3)}
        ).collect()
    )
    exp = sorted(i for i in range(256) if i % 16 <= 3 and i // 16 <= 3)
    assert gz == exp


def test_compact_sort_is_changelog_noop(spark, tmp_path):
    """The rewrite commits as operation 'compact': incremental consumers
    and the changelog skip it — no row ever appears as inserted/deleted."""
    t = str(tmp_path / "cn")
    tl.append(spark, t, spark.range(0, 20).selectExpr("id AS k"))
    v = tl.compact_sort(spark, t, ("k",), n_files=2)
    assert tl.changelog_scan(spark, t, from_version=v - 1).count() == 0


def test_bloom_point_lookup_prunes_scattered_keys(spark, tmp_path):
    """Per-file manifest blooms: on a high-cardinality scattered key every
    file's [min,max] overlaps (stats prune nothing), but '=' predicates
    skip files with certainty of absence; absent keys read zero files."""
    t = str(tmp_path / "bl")
    df = spark.range(0, 400).selectExpr(
        "(id * 2654435761) % 1000000 AS k", "id AS v"
    )
    tl.append(spark, t, df.repartition(8), stats_cols=("k",), bloom_cols=("k",))
    some_k = int(df.filter("v = 123").collect()[0].k)
    keep, skip = tl.prune_files_where(t, {"k": ("=", some_k)})
    assert len(keep) + skip == 8 and skip >= 5
    assert [r.v for r in tl.scan_where(spark, t, {"k": ("=", some_k)}).collect()] == [123]
    keep2, skip2 = tl.prune_files_where(t, {"k": ("=", 999999999)})
    assert skip2 == 8 and not keep2
    assert tl.scan_where(spark, t, {"k": ("=", 999999999)}).count() == 0


def test_bloom_never_blocks_range_predicates_or_unbloomd_cols(spark, tmp_path):
    """Blooms answer membership only: range predicates and columns without
    a recorded bloom fall back to min/max stats (never prune blind)."""
    t = str(tmp_path / "bl2")
    tl.append(
        spark,
        t,
        spark.range(0, 50).selectExpr("id AS k", "id % 3 AS v").coalesce(2),
        stats_cols=("k",),
        bloom_cols=("k",),
    )
    got = sorted(
        r.k for r in tl.scan_where(spark, t, {"k": ("between", 10, 20)}).collect()
    )
    assert got == list(range(10, 21))
    assert tl.scan_where(spark, t, {"v": ("=", 1)}).count() == 17


def test_clustering_depth_and_planner_recommend_sort(spark, tmp_path):
    """clustering_depth reads manifests only: scattered appends score
    avg_depth ≈ n_files, the planner recommends compact_sort, and the
    rewrite drops the depth to ~1 and clears the recommendation."""
    t = str(tmp_path / "cd")
    df = spark.range(0, 100).selectExpr("id AS k")
    tl.append(spark, t, df.repartition(4), stats_cols=("k",))
    cd = tl.clustering_depth(t, "k")
    assert cd["n_files"] == 4 and cd["avg_depth"] == 4.0  # fully scattered
    plan = {r.action for r in tl.maintenance_plan(spark, t, cluster_col="k").collect()}
    assert "compact_sort" in plan
    tl.compact_sort(spark, t, ("k",), n_files=4)
    cd2 = tl.clustering_depth(t, "k")
    assert cd2["avg_depth"] <= 1.5 and cd2["max_depth"] <= 2  # boundary touch at most
    plan2 = {r.action for r in tl.maintenance_plan(spark, t, cluster_col="k").collect()}
    assert "compact_sort" not in plan2
    # files without stats on the column are excluded and reported
    tl.append(spark, t, spark.range(100, 110).selectExpr("id AS k").coalesce(1))
    cd3 = tl.clustering_depth(t, "k")
    assert cd3["n_unstated"] == 1 and cd3["n_files"] == 4


def test_route_commit_records_blooms_for_conv_lookup(spark, parsed, tmp_path):
    """route_commit_tablelog forwards stats/bloom cols to the manifest
    writer; a conversation point-lookup reads back exactly that conv's
    rows and the manifest carries a bloom per sink file."""
    from blogparser_spark.operators.enrich import enrich
    from blogparser_spark.operators.route import route_commit_tablelog

    t = str(tmp_path / "rt")
    enriched = enrich(parsed, spark)
    route_commit_tablelog(
        enriched, t, marker="m0", stats_cols=("conv_id",), bloom_cols=("conv_id",)
    )
    _, state = tl._state_at(t)
    assert all("conv_id" in e.get("bloom", {}) for e in state["data"].values())
    conv = enriched.select("conv_id").first().conv_id
    got = tl.scan_where(spark, t, {"conv_id": ("=", conv)})
    exp = enriched.filter(F.col("conv_id") == conv).drop("images")
    assert got.count() == exp.count() > 0
    assert {r.turn_idx for r in got.collect()} == {
        r.turn_idx for r in exp.collect()
    }


def test_bloom_skips_unbloomable_types_never_misprunes(spark, tmp_path):
    """A float column records NO bloom (its string form is representation-
    dependent) and a type-mismatched '=' probe keeps the file — the
    filter can only ever assert definite absence for int/str keys."""
    t = str(tmp_path / "bl3")
    tl.append(
        spark,
        t,
        spark.range(0, 10).selectExpr("cast(id AS double) AS x", "id AS k"),
        bloom_cols=("x", "k"),  # no stats: isolates the bloom's verdicts
    )
    _, state = tl._state_at(t)
    for e in state["data"].values():
        assert "x" not in e.get("bloom", {})  # unbloomable: no filter recorded
        assert "k" in e.get("bloom", {})
    # float probe against the int column's bloom: membership unknown → keep
    keep, skip = tl.prune_files_where(t, {"k": ("=", 3.0)})
    assert skip == 0
    # int probe: the bloom answers, and the answer is safe
    keep_i, skip_i = tl.prune_files_where(t, {"k": ("=", 3)})
    assert skip_i >= 1
    assert [r.k for r in tl.scan_where(spark, t, {"k": ("=", 3)}).collect()] == [3]


def test_bloom_tolerates_nulls_and_still_skips(spark, tmp_path):
    """NULL values in a bloomed column are simply omitted (a NULL can
    never match an '=' predicate), so skipping keeps working on nullable
    keys instead of silently recording no filter."""
    t = str(tmp_path / "bl4")
    df = spark.range(0, 40).selectExpr(
        "CASE WHEN id % 5 = 0 THEN NULL ELSE (id * 2654435761) % 100000 END AS k",
        "id AS v",
    )
    tl.append(spark, t, df.repartition(4), bloom_cols=("k",))
    _, state = tl._state_at(t)
    assert all("k" in e.get("bloom", {}) for e in state["data"].values())
    some_k = int(df.filter("v = 7").collect()[0].k)
    keep, skip = tl.prune_files_where(t, {"k": ("=", some_k)})
    assert skip >= 1  # the filter still excludes files
    got = [r.v for r in tl.scan_where(spark, t, {"k": ("=", some_k)}).collect()]
    assert got == [7]


def test_column_ndv_merge_is_exact_and_layout_independent(spark, tmp_path):
    """Per-file KMV sketches merge to the exact global k-minimum set, so
    the table-level estimate is identical across file layouts; NDV below
    k is exact, the estimator is within its expected error above k, and
    unsketchable (float) columns record nothing."""
    import hashlib

    df = spark.range(0, 2000).selectExpr(
        "id % 37 AS few", "id AS many", "cast(id AS double) AS fl"
    )
    t4 = str(tmp_path / "n4")
    t1 = str(tmp_path / "n1")
    tl.append(spark, t4, df.repartition(4), ndv_cols=("few", "many", "fl"))
    tl.append(spark, t1, df.coalesce(1), ndv_cols=("few", "many", "fl"))
    for t in (t4, t1):
        assert tl.column_ndv(t, "few")["ndv_est"] == 37.0   # exact below k
        assert tl.column_ndv(t, "fl")["n_files_sketched"] == 0
    m4, m1 = tl.column_ndv(t4, "many"), tl.column_ndv(t1, "many")
    assert m4["ndv_est"] == m1["ndv_est"]  # layout-independent merge
    hs = sorted(
        {int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in range(2000)}
    )[:64]
    assert m4["ndv_est"] == tl._q6(63 / (hs[-1] / 2.0**64))  # exact twin
    assert 1000 < m4["ndv_est"] < 4000  # sane for true NDV 2000 at k=64


def test_column_ndv_overlap_estimates_join_cardinality(spark, tmp_path):
    """KMV set operations across two tables: Jaccard/union/intersection
    estimates from manifests match the pure-Python twin exactly and land
    near the true overlap; disjoint tables estimate ~zero intersection."""
    import hashlib

    ta, tb, tc = (str(tmp_path / x) for x in ("a", "b", "c"))
    tl.append(spark, ta, spark.range(0, 1200).selectExpr("id AS k"), ndv_cols=("k",))
    tl.append(spark, tb, spark.range(600, 1800).selectExpr("id AS k"), ndv_cols=("k",))
    tl.append(spark, tc, spark.range(5000, 6200).selectExpr("id AS k"), ndv_cols=("k",))
    ov = tl.column_ndv_overlap(ta, tb, "k")

    def mins(rng):
        return sorted(
            {int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in rng}
        )[:64]

    sa, sb = set(mins(range(0, 1200))), set(mins(range(600, 1800)))
    u = sorted(sa | sb)[:64]
    j = tl._q6(sum(1 for h in u if h in sa and h in sb) / len(u))
    ue = tl._q6(63 / (u[-1] / 2.0**64))
    assert ov["jaccard"] == j and ov["union_est"] == ue
    assert ov["inter_est"] == tl._q6(j * ue)
    assert 250 < ov["inter_est"] < 1100  # true intersection is 600
    dis = tl.column_ndv_overlap(ta, tc, "k")
    assert dis["jaccard"] == 0.0 and dis["inter_est"] == 0.0


def test_compaction_preserves_manifest_sketches_by_default(spark, tmp_path):
    """A maintenance rewrite must not silently drop the table's blooms and
    KMV sketches: compact / compact_binpack / compact_sort default
    bloom_cols/ndv_cols from the pre-rewrite manifest entries, and an
    explicit () opt-out drops them."""
    df = spark.range(0, 400).selectExpr("id AS k", "id % 7 AS v")

    t = str(tmp_path / "keep")
    tl.append(spark, t, df.repartition(4), stats_cols=("k",),
              bloom_cols=("k",), ndv_cols=("v",))
    before = tl.column_ndv(t, "v")["ndv_est"]
    tl.compact(spark, t, n_files=2)
    _, state = tl._state_at(t)
    assert all("k" in e.get("bloom", {}) for e in state["data"].values())
    assert tl.column_ndv(t, "v")["ndv_est"] == before  # exact KMV merge
    # bloom still prunes after the rewrite
    kept, skipped = tl.prune_files_where(t, {"k": ("=", 123456)})
    assert kept == [] and skipped == 2

    tl.compact_sort(spark, t, sort_cols=("k",), n_files=2)
    _, state = tl._state_at(t)
    assert all("k" in e.get("bloom", {}) for e in state["data"].values())
    assert tl.column_ndv(t, "v")["ndv_est"] == before

    tb = str(tmp_path / "binpack")
    for lo in (0, 200):
        tl.append(spark, tb,
                  spark.range(lo, lo + 200).selectExpr("id AS k", "id % 7 AS v"),
                  bloom_cols=("k",), ndv_cols=("v",))
    assert tl.compact_binpack(spark, tb, target_bytes=64 * 1024 * 1024)
    _, state = tl._state_at(tb)
    assert all("k" in e.get("bloom", {}) for e in state["data"].values())
    assert tl.column_ndv(tb, "v")["n_files_sketched"] == len(state["data"])

    td = str(tmp_path / "drop")
    tl.append(spark, td, df.repartition(2), bloom_cols=("k",), ndv_cols=("v",))
    tl.compact(spark, td, n_files=1, bloom_cols=(), ndv_cols=())
    _, state = tl._state_at(td)
    assert all("bloom" not in e and "ndv" not in e for e in state["data"].values())


def test_two_level_manifests_plan_skips_chunks(spark, tmp_path):
    """A commit adding many files writes chunked manifests (Iceberg's
    manifest-list layer): the commit inlines per-chunk summaries only, and
    planning skips whole chunks — partition-value sets, merged stats, OR'd
    blooms — without reading their file entries. Full-table reads expand
    to the identical one-level state."""
    t = str(tmp_path / "chunked")
    df = spark.range(0, 400).selectExpr(
        "id AS k", "cast(id % 8 AS string) AS day", "id % 5 AS v"
    )
    tl.append(
        spark, t, df.repartition("day"),
        partition_spec=("day",), stats_cols=("k",), bloom_cols=("k",),
        manifest_chunk_files=2,
    )
    _, lazy = tl._state_at(t, expand=False)
    assert lazy.get("chunks") and not lazy["data"]  # fully chunked commit
    n_chunks = len(lazy["chunks"])
    assert n_chunks >= 3
    n_files = sum(r["n_files"] for r in lazy["chunks"].values())

    # expansion parity: the full read sees every row and file
    assert tl.read_snapshot(spark, t).count() == 400
    assert tl.table_files(spark, t).count() == n_files
    hist = tl.table_history(spark, t).collect()[-1]
    assert hist["files_added"] == n_files and hist["rows_added"] == 400

    # hidden-partition point predicate: only the chunk(s) whose summary
    # value set contains day=3 are OPENED; the rest are skipped whole
    plan = tl.plan_scan(t, {"day": ("=", "3")})
    assert plan["n_chunks_total"] == n_chunks
    assert plan["n_chunks_opened"] + plan["n_chunks_skipped"] == n_chunks
    assert plan["n_chunks_opened"] <= max(1, n_chunks // 2)
    got = tl.scan_where(spark, t, {"day": ("=", "3")})
    want = df.filter(F.col("day") == "3")
    assert got.count() == want.count() > 0
    assert got.select("k").exceptAll(want.select("k")).count() == 0

    # chunk-level bloom: an absent key skips EVERY chunk unopened, and the
    # skipped-file tally stays exact
    plan2 = tl.plan_scan(t, {"k": ("=", 999_999)})
    assert plan2["n_chunks_opened"] == 0
    assert plan2["n_files_skipped"] == n_files and plan2["paths"] == []

    # incremental scan expands chunk refs transparently
    inc = tl.incremental_append_scan(spark, t, 0)
    assert inc.count() == 400


def test_compaction_retires_chunked_manifests(spark, tmp_path):
    """A full rewrite removes the chunk refs with the files (the commit's
    removed_manifests), so post-compaction planning replays zero chunks
    while row counts and pruning stay exact."""
    t = str(tmp_path / "chunked_compact")
    df = spark.range(0, 300).selectExpr("id AS k", "id % 3 AS v")
    tl.append(
        spark, t, df.repartition(6), stats_cols=("k",),
        manifest_chunk_files=2,
    )
    assert tl._state_at(t, expand=False)[1].get("chunks")
    tl.compact(spark, t, n_files=2)
    _, lazy = tl._state_at(t, expand=False)
    assert not lazy.get("chunks")  # refs retired by removed_manifests
    assert tl.read_snapshot(spark, t).count() == 300
    plan = tl.plan_scan(t, {"k": ("=", 7)})
    assert plan["n_chunks_total"] == 0 and len(plan["paths"]) >= 1


def test_orphan_sweep_removes_lost_writers_chunk_manifests(spark, tmp_path):
    """A chunked append writes its mchunk files BEFORE the commit; a
    writer that lost the race leaves them unreferenced in log/. The
    orphan sweep removes exactly those (age-guarded), never a committed
    chunk."""
    t = str(tmp_path / "chunk_orphans")
    df = spark.range(0, 100).selectExpr("id AS k")
    tl.append(spark, t, df.repartition(4), manifest_chunk_files=2)
    live = {
        r["manifest"]
        for r in tl._state_at(t, expand=False)[1]["chunks"].values()
    }
    assert live
    # simulate a lost writer's pre-written chunk
    dead = os.path.join(t, "log", "mchunk-deadbeefdeadbeef.json")
    with open(dead, "w") as f:
        json.dump({"entries": []}, f)
    removed = tl.remove_orphans(t, min_age_sec=0.0)
    assert removed == 1 and not os.path.exists(dead)
    for m in live:
        assert os.path.exists(os.path.join(t, m))
    assert tl.read_snapshot(spark, t).count() == 100


def test_plan_scan_scales_by_chunks_not_files(tmp_path):
    """The 10^7-file planning contract, proven at 10^5: a synthetic
    chunked commit with 100,000 file entries across 200 chunks (manifest
    JSON only — plan_scan never opens data files). A point predicate on
    the chunk-coherent partition value opens exactly ONE chunk: driver
    work is O(summaries + one chunk), and measured planning time is an
    order of magnitude under the full expansion the one-level layout
    would force."""
    import time as _time

    t = str(tmp_path / "bigplan")
    log = os.path.join(t, "log")
    os.makedirs(log)
    n_chunks, per_chunk = 200, 500
    spec = [{"name": "day", "source": "day", "transform": "identity", "param": None}]
    refs = []
    for c in range(n_chunks):
        entries = [
            {
                "path": f"{t}/data/c000001/day={c:03d}/part-{i:05d}.parquet",
                "rows": 10,
                "bytes": 1000,
                "stats": {"k": [c * per_chunk + i, c * per_chunk + i]},
                "partition": {"day": f"{c:03d}"},
                "spec": spec,
            }
            for i in range(per_chunk)
        ]
        name = f"mchunk-{c:032x}.json"
        with open(os.path.join(log, name), "w") as f:
            json.dump({"entries": entries}, f)
        refs.append(
            {
                "manifest": os.path.join("log", name),
                "n_files": per_chunk,
                "rows": per_chunk * 10,
                "bytes": per_chunk * 1000,
                "partitions": {"day": [f"{c:03d}"]},
                "stats": {"k": [c * per_chunk, (c + 1) * per_chunk - 1]},
                "spec": spec,
                "seq": 1,
            }
        )
    commit = {
        "version": 1,
        "parent": None,
        "operation": "append",
        "ts": 0.0,
        "schema": [["k", "bigint"], ["day", "string"]],
        "added_data": refs,
    }
    with open(os.path.join(log, "v000000000001.json"), "w") as f:
        json.dump(commit, f)

    t0 = _time.perf_counter()
    plan = tl.plan_scan(t, {"day": ("=", "123")})
    chunked_sec = _time.perf_counter() - t0
    assert plan["n_chunks_total"] == n_chunks
    assert plan["n_chunks_opened"] == 1
    assert plan["n_chunks_skipped"] == n_chunks - 1
    assert len(plan["paths"]) == per_chunk
    assert plan["n_files_skipped"] == (n_chunks - 1) * per_chunk

    # the one-level cost this layout avoids: expand every chunk, check
    # every file entry (what prune_files_where did before round 5)
    t0 = _time.perf_counter()
    _, state = tl._state_at(t)  # expand=True: all 100k entries
    n_live = len(state["data"])
    expanded_sec = _time.perf_counter() - t0
    assert n_live == n_chunks * per_chunk
    assert chunked_sec < expanded_sec / 10, (chunked_sec, expanded_sec)


def test_chunk_summaries_translate_renamed_predicates(spark, tmp_path):
    """Field-id evolution over a CHUNKED commit: after a rename, a
    predicate on the CURRENT name must translate through the chunk ref's
    write-time cols map at the SUMMARY level — skipping chunks without
    opening them — and through each file entry after a chunk opens."""
    t = str(tmp_path / "chunk_evolve")
    df = spark.range(0, 400).selectExpr("id AS k", "cast(id % 8 AS string) AS day")
    tl.append(
        spark, t, df.repartition("day"),
        partition_spec=("day",), stats_cols=("k",),
        manifest_chunk_files=2,
    )
    tl.evolve_schema(t, rename={"k": "key", "day": "d"})
    n_chunks = tl.plan_scan(t, {})["n_chunks_total"]
    # stats predicate on the renamed measure column
    plan = tl.plan_scan(t, {"key": ("between", 0, 10)})
    assert plan["n_chunks_opened"] + plan["n_chunks_skipped"] == n_chunks
    got = tl.scan_where(spark, t, {"key": ("between", 0, 10)})
    assert got.count() == 11 and "key" in got.columns
    # hidden-partition predicate on the renamed source column still skips
    # whole chunks by the summary's partition-value sets
    plan2 = tl.plan_scan(t, {"d": ("=", "3")})
    assert plan2["n_chunks_opened"] < n_chunks
    assert tl.scan_where(spark, t, {"d": ("=", "3")}).count() == 50


def test_fast_forward_publishes_chunk_refs_not_inlined_entries(spark, tmp_path):
    """The branch-WAP flow at scale: a chunked append on a branch
    publishes into main AS CHUNK REFS — main's planning stays two-level
    (summary skipping) instead of degrading to an inlined O(files)
    commit. Members the branch removed after its chunked commit stay
    removed on main."""
    t = str(tmp_path / "ff_chunks")
    tl.append(spark, t, spark.range(0, 10).selectExpr(
        "id AS k", "cast(id % 2 AS string) AS day"))
    tl.create_branch(t, "audit")
    df = spark.range(100, 500).selectExpr(
        "id AS k", "cast(id % 8 AS string) AS day")
    tl.append(
        spark, t, df.repartition("day"), branch="audit",
        partition_spec=("day",), stats_cols=("k",),
        manifest_chunk_files=2,
    )
    tl.delete_where(spark, t, F.col("k") == 107, ["k"])  # main-side noise
    v = tl.fast_forward(t, "audit")
    c = tl._read_commit(t, v)
    refs = [e for e in c["added_data"] if "manifest" in e]
    inline = [e for e in c["added_data"] if "path" in e]
    assert refs and not inline  # the chunked branch commit stayed chunked
    _, lazy = tl._state_at(t, expand=False)
    assert len(lazy.get("chunks", {})) == len(refs)
    assert tl.read_snapshot(spark, t).count() == 410
    plan = tl.plan_scan(t, {"day": ("=", "3")})
    assert plan["n_chunks_skipped"] > 0  # summary skipping works on main
    assert tl.scan_where(spark, t, {"day": ("=", "3")}).count() == 50


def test_expiry_flattens_expired_chunked_commits(spark, tmp_path):
    """Expiring a chunked commit deletes its chunk manifests and flattens
    its still-live files into the rebase base: reads stay exact, planning
    simply has no chunks left to consult."""
    import glob

    t = str(tmp_path / "chunk_expire")
    tl.append(
        spark, t,
        spark.range(0, 200).selectExpr("id AS k").repartition(4),
        stats_cols=("k",), manifest_chunk_files=2,
    )
    tl.append(spark, t, spark.range(200, 250).selectExpr("id AS k"))
    assert glob.glob(os.path.join(t, "log", "mchunk-*.json"))
    out = tl.expire_snapshots(t, keep_last=1)
    assert out["versions_removed"] == 1
    # the expired commit's chunk manifests are gone; its files live on
    # through the rebase base
    assert not glob.glob(os.path.join(t, "log", "mchunk-*.json"))
    assert tl.read_snapshot(spark, t).count() == 250
    plan = tl.plan_scan(t, {"k": ("between", 0, 10)})
    assert plan["n_chunks_total"] == 0 and len(plan["paths"]) >= 1
    assert tl.scan_between(spark, t, "k", 0, 10).count() == 11

"""Resumable sliced execution: manifests, resume skip, output parity."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _write_input(spark, tmp_path):
    from blogparser_spark.sources.synthetic import transcripts_df

    p = str(tmp_path / "transcripts")
    transcripts_df(spark, n_convs=30, turns_per_conv=4).write.mode(
        "overwrite"
    ).parquet(p)
    return p


def test_sliced_run_and_resume(spark, tmp_path):
    from blogparser_spark.job import transform
    from blogparser_spark.operators.checkpoint import completed_slices, run_sliced

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out")

    n_input = spark.read.parquet(inp).count()  # hot-conv skew ⇒ not 30×4
    ms = run_sliced(spark, inp, out, transform, n_slices=4)
    assert [m.slice_id for m in ms] == [0, 1, 2, 3]
    assert completed_slices(out) == {0, 1, 2, 3}
    assert sum(m.rows_in for m in ms) == n_input
    assert spark.read.parquet(out + "/slice=*").count() == n_input

    # resume: nothing left to do
    again = run_sliced(spark, inp, out, transform, n_slices=4, resume=True)
    assert again == []

    # drop one manifest → only that slice reruns, output stays complete
    os.remove(out + "/_manifests/slice-00002.json")
    rerun = run_sliced(spark, inp, out, transform, n_slices=4, resume=True)
    assert [m.slice_id for m in rerun] == [2]
    assert spark.read.parquet(out + "/slice=*").count() == n_input


def test_manifest_lineage_fields(spark, tmp_path):
    from blogparser_spark.job import transform
    from blogparser_spark.operators.checkpoint import run_sliced

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out2")
    run_sliced(spark, inp, out, transform, n_slices=2)
    with open(out + "/_manifests/slice-00000.json") as f:
        m = json.load(f)
    assert m["predicate"].startswith("pmod(hash(conv_id), 2)")
    assert m["input_snapshot"].startswith("mtime:")
    assert m["rows_in"] > 0 and m["sink_counts"]
    # observed ok-count matches a recount from the written output
    ok = (
        spark.read.parquet(m["output_path"])
        .filter(F.col("parse_status") == "ok")
        .count()
    )
    assert m["rows_ok"] == ok


def test_slices_partition_all_rows_exactly_once(spark, tmp_path):
    from blogparser_spark.operators.checkpoint import slice_predicate

    inp = _write_input(spark, tmp_path)
    df = spark.read.parquet(inp)
    n = df.count()
    covered = sum(
        df.filter(slice_predicate(s, 4)).count() for s in range(4)
    )
    assert covered == n


def test_sliced_input_scan_prunes_to_own_files(spark, tmp_path):
    """Storage-aligned slicing: with write_sliced_input, a slice read scans
    ONLY the files under its own slice_bucket partition — the hash-filter
    fallback would scan everything (6.4 PB at 100 TB × 64 slices)."""
    from blogparser_spark.operators.checkpoint import SLICE_COL, write_sliced_input
    from blogparser_spark.sources.synthetic import transcripts_df

    p = str(tmp_path / "sliced_in")
    write_sliced_input(transcripts_df(spark, n_convs=30, turns_per_conv=4), p, n_slices=4)
    full = spark.read.parquet(p)
    one = full.filter(F.col(SLICE_COL) == 2)
    # the slice filter must land in the scan's PartitionFilters (directory
    # pruning), not in the data filters (per-row evaluation after reading)
    plan = one._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "PartitionFilters" in plan
    scan_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert SLICE_COL in scan_line.split("PartitionFilters")[1].split("]")[0]
    # and the four partitions cover every row exactly once
    assert sum(
        full.filter(F.col(SLICE_COL) == s).count() for s in range(4)
    ) == full.count()


def test_sliced_run_uses_pruned_predicate_and_matches_flat(spark, tmp_path):
    from blogparser_spark.job import transform
    from blogparser_spark.operators.checkpoint import run_sliced, write_sliced_input
    from blogparser_spark.sources.synthetic import transcripts_df

    df = transcripts_df(spark, n_convs=20, turns_per_conv=3)
    p = str(tmp_path / "sliced_in2")
    write_sliced_input(df, p, n_slices=2)
    out = str(tmp_path / "sliced_out")
    ms = run_sliced(spark, p, out, transform, n_slices=2)
    assert all("partition-pruned" in m.predicate for m in ms)
    assert sum(m.rows_in for m in ms) == df.count()
    got = spark.read.parquet(out + "/slice=*").count()
    assert got == df.count()


def test_resume_reruns_when_input_snapshot_changes(spark, tmp_path):
    """ADVICE: a manifest from an OLDER input snapshot must not be trusted —
    resuming after the input changed re-runs the slice instead of silently
    mixing lineages."""
    import time as _time

    from blogparser_spark.job import transform
    from blogparser_spark.operators.checkpoint import run_sliced

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out3")
    first = run_sliced(spark, inp, out, transform, n_slices=2)
    assert [m.slice_id for m in first] == [0, 1]
    # unchanged input → resume skips everything
    assert run_sliced(spark, inp, out, transform, n_slices=2) == []
    # rewrite the input (new mtime ⇒ new snapshot id) → all slices re-run
    _time.sleep(1.1)  # mtime granularity
    _write_input(spark, tmp_path)
    rerun = run_sliced(spark, inp, out, transform, n_slices=2)
    assert [m.slice_id for m in rerun] == [0, 1]


def test_layout_mismatch_falls_back_to_hash_predicate(spark, tmp_path):
    """A layout written with a SMALLER slice count must NOT pass the sliced
    check for a larger n (slices would silently double up / read empty);
    the marker requires an exact (n_slices, key_col) match."""
    from blogparser_spark.job import transform
    from blogparser_spark.operators.checkpoint import run_sliced, write_sliced_input
    from blogparser_spark.sources.synthetic import transcripts_df

    df = transcripts_df(spark, n_convs=20, turns_per_conv=3)
    p = str(tmp_path / "sliced_small")
    write_sliced_input(df, p, n_slices=4)
    out = str(tmp_path / "mismatch_out")
    ms = run_sliced(spark, p, out, transform, n_slices=8)
    # fell back to the hash predicate: correct totals, honest predicates
    assert all(m.predicate.startswith("pmod(hash(conv_id), 8)") for m in ms)
    assert sum(m.rows_in for m in ms) == df.count()
    # and the matching count still uses the pruned path
    ms4 = run_sliced(spark, p, str(tmp_path / "match_out"), transform, n_slices=4)
    assert all("partition-pruned" in m.predicate for m in ms4)


def test_unknown_status_lands_in_other_bucket(spark, tmp_path):
    """sink_counts is built from observed aggregates over the KNOWN status
    list; a transform emitting a status outside it must surface as 'other'
    so the manifest counts always sum to rows."""
    from pyspark.sql import functions as F

    from blogparser_spark.operators.checkpoint import run_sliced

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "other_out")

    def odd_transform(df):
        return df.withColumn(
            "parse_status",
            F.when(F.col("turn_idx") == 0, F.lit("weird_status")).otherwise("ok"),
        )

    ms = run_sliced(spark, inp, out, odd_transform, n_slices=2)
    for m in ms:
        assert sum(m.sink_counts.values()) == m.rows_in
        assert m.sink_counts.get("other", 0) > 0 or "weird_status" not in str(m)
    assert any(m.sink_counts.get("other", 0) > 0 for m in ms)


def test_resume_reruns_when_slice_params_change(spark, tmp_path):
    """Resuming with a different n_slices (or key_col) must NOT trust old
    manifests: mixing pmod-4 slice outputs with pmod-8 predicates would
    duplicate every row whose pmod8 lands in {4..7}."""
    from blogparser_spark.job import transform
    from blogparser_spark.operators.checkpoint import run_sliced

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out_params")
    first = run_sliced(spark, inp, out, transform, n_slices=4)
    assert [m.slice_id for m in first] == [0, 1, 2, 3]
    # widened slice count → every slice re-runs (no silent subset skip)
    rerun = run_sliced(spark, inp, out, transform, n_slices=8)
    assert [m.slice_id for m in rerun] == list(range(8))
    # different key_col → same full re-run
    rerun2 = run_sliced(spark, inp, out, transform, n_slices=8, key_col="turn_idx")
    assert [m.slice_id for m in rerun2] == list(range(8))


def test_job_report_ignores_stale_slice_dirs(spark, tmp_path, capsys):
    """Re-running the job with a SMALLER --slices must not double-count rows
    from the stale slice dirs the wider run left behind: the report reads
    exactly this run's slice set, not a slice=* glob."""
    from blogparser_spark import job

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out_stale")
    assert job.main(["--input", inp, "--output", out, "--slices", "4"]) == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert job.main(["--input", inp, "--output", out, "--slices", "2"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["rows_in"] == r2["rows_in"]
    assert r1["sink_counts"] == r2["sink_counts"]


def test_job_tablelog_sink_matches_parquet_and_resumes(spark, tmp_path, capsys):
    """The default tablelog sink routes every slice into one snapshot-log
    table as atomic idempotent commits: sink counts match the parquet
    fallback exactly, per-sink reads prune via manifests, and a --resume
    re-run is a commit no-op (marker ledger), leaving the version pinned."""
    from blogparser_spark import job
    from blogparser_spark.operators import tablelog as tl
    from blogparser_spark.operators.route import read_routed_tablelog

    inp = _write_input(spark, tmp_path)
    out_t = str(tmp_path / "out_tl")
    out_p = str(tmp_path / "out_pq")
    assert job.main(
        ["--input", inp, "--output", out_t, "--slices", "4", "--resume"]
    ) == 0
    rt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert job.main(
        ["--input", inp, "--output", out_p, "--slices", "4",
         "--table-format", "parquet"]
    ) == 0
    rp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rt["sink_counts"] == rp["sink_counts"]
    assert rt["rows_in"] == rp["rows_in"] and rt["n_convs"] == rp["n_convs"]
    table = out_t + "/table"
    v1 = tl.current_version(table)
    assert rt["table_version"] == v1 and v1 == 4  # one commit per slice

    # per-sink read equals a filter over the full snapshot
    full = tl.read_snapshot(spark, table)
    one = read_routed_tablelog(spark, out_t + "/table", parse_status="ok")
    assert one.count() == full.filter(F.col("parse_status") == "ok").count()

    # resume: every marker already committed → zero slices, zero commits
    assert job.main(
        ["--input", inp, "--output", out_t, "--slices", "4", "--resume"]
    ) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["slices_run"] == [] and r2["rows_in"] == 0
    assert tl.current_version(table) == v1
    assert r2["sink_counts"] == rt["sink_counts"]  # served from the table

    # marker ledger is a storage-level guard: lose ALL slice manifests and
    # resume still skips every slice (no duplicate commits)
    import shutil

    shutil.rmtree(out_t + "/_manifests")
    assert job.main(
        ["--input", inp, "--output", out_t, "--slices", "4", "--resume"]
    ) == 0
    r3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r3["slices_run"] == [] and tl.current_version(table) == v1


def test_tablelog_generation_replace_on_input_change_and_reslice(
    spark, tmp_path
):
    """A changed input (new snapshot) or a changed slice count re-runs into
    the SAME table without mixing generations: each slice replaces its own
    keyspace under the CURRENT hash predicate, so the table converges to
    exactly the new generation even when n_slices changed."""
    import time as _time

    from blogparser_spark.job import transform
    from blogparser_spark.operators import tablelog as tl
    from blogparser_spark.operators.checkpoint import run_sliced

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out_gen")
    table = out + "/table"
    first = run_sliced(
        spark, inp, out, transform, n_slices=4, table_format="tablelog"
    )
    n1 = spark.read.parquet(inp).count()
    assert sum(m.rows_in for m in first) == n1
    assert tl.read_snapshot(spark, table).count() == n1

    # rewrite the input (new snapshot) AND change the slice count: the old
    # generation's 4-slice rows must all be replaced by the 2-slice run
    _time.sleep(1.1)
    _write_input(spark, tmp_path)
    n2 = spark.read.parquet(inp).count()
    rerun = run_sliced(
        spark, inp, out, transform, n_slices=2, table_format="tablelog"
    )
    assert [m.slice_id for m in rerun] == [0, 1]
    snap = tl.read_snapshot(spark, table)
    assert snap.count() == n2  # no old-generation residue
    gens = [r["_gen"] for r in snap.select("_gen").distinct().collect()]
    assert len(gens) == 2 and all("|n=2|" in g for g in gens)
    # and a resume of the new generation is a pure no-op
    assert run_sliced(
        spark, inp, out, transform, n_slices=2, table_format="tablelog"
    ) == []


def test_tablelog_replace_converges_after_crash_between_delete_and_append(
    spark, tmp_path
):
    """Generation replace is delete-commit + append-commit per slice; a
    crash between them leaves the slice's rows deleted but its marker
    uncommitted. The resumed run must re-run exactly that slice (delete
    matches nothing, append lands) and converge to the full new
    generation."""
    import time as _time

    from blogparser_spark.job import transform
    from blogparser_spark.operators import tablelog as tl
    from blogparser_spark.operators.checkpoint import (
        run_sliced,
        slice_marker,
        slice_predicate,
    )

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out_crash")
    table = out + "/table"
    run_sliced(spark, inp, out, transform, n_slices=2, table_format="tablelog")
    n1 = spark.read.parquet(inp).count()

    _time.sleep(1.1)
    _write_input(spark, tmp_path)
    n2 = spark.read.parquet(inp).count()
    snapshot = None
    from blogparser_spark.operators.checkpoint import input_snapshot_id

    snapshot = input_snapshot_id(spark, inp)
    # simulate the crashed first half of slice 0's replace: the delete
    # commit landed, the append (and its marker) did not
    marker0 = slice_marker(0, snapshot, 2, "conv_id")
    tl.delete_where(
        spark,
        table,
        slice_predicate(0, 2, "conv_id") & (F.col("_gen") != marker0),
        ["conv_id", "_gen"],
    )
    import shutil

    shutil.rmtree(out + "/_manifests")  # crash also lost the manifests
    assert tl.read_snapshot(spark, table).count() < n1  # mid-crash state

    rerun = run_sliced(
        spark, inp, out, transform, n_slices=2, table_format="tablelog"
    )
    assert [m.slice_id for m in rerun] == [0, 1]
    snap = tl.read_snapshot(spark, table)
    assert snap.count() == n2
    gens = [r["_gen"] for r in snap.select("_gen").distinct().collect()]
    assert len(gens) == 2 and all("|n=2|" in g for g in gens)


def test_resume_never_trusts_other_sink_formats_manifests(spark, tmp_path):
    """A parquet-era slice manifest must not satisfy a tablelog resume (it
    would skip every slice and leave the table uncreated) — and vice
    versa: switching --table-format re-runs all slices against the new
    sink."""
    from blogparser_spark.job import transform
    from blogparser_spark.operators import tablelog as tl
    from blogparser_spark.operators.checkpoint import run_sliced

    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out_fmt")
    first = run_sliced(
        spark, inp, out, transform, n_slices=2, table_format="parquet"
    )
    assert [m.slice_id for m in first] == [0, 1]
    n = spark.read.parquet(inp).count()

    # switch to tablelog with resume: the parquet manifests must NOT
    # mark slices done — the table gets created and fully populated
    rerun = run_sliced(
        spark, inp, out, transform, n_slices=2, table_format="tablelog"
    )
    assert [m.slice_id for m in rerun] == [0, 1]
    assert all(m.table_format == "tablelog" for m in rerun)
    assert tl.read_snapshot(spark, out + "/table").count() == n

    # and back: tablelog manifests don't satisfy a parquet resume
    rerun2 = run_sliced(
        spark, inp, out, transform, n_slices=2, table_format="parquet"
    )
    assert [m.slice_id for m in rerun2] == [0, 1]
    assert spark.read.parquet(out + "/slice=*").count() == n

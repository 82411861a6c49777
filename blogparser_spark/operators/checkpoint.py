"""Resumable checkpointing: per-partition completion manifests + lineage.

The north-star contract (SURVEY.md §4.3): a 10^12-turn run must survive
restarts without reprocessing finished work. There is no reference analog —
the Go CLI reprocesses everything (sample/main.go:32-47); this layer is
pipeline-level orchestration code, not a Catalyst concern.

Mechanism
---------
The input keyspace is split into RANGES of a stable partition key (hash of
conv_id mod n_slices — deterministic, data-independent). Each slice runs as
its own Spark job over a partition-pruned slice of the input; on success a
JSON manifest is written ATOMICALLY (temp file + rename) recording lineage:
slice id, predicate, input snapshot identifier, row counts in/out, per-sink
counts from df.observe() metrics, wall time. A resumed run lists manifests
and skips completed slices — idempotent because each slice overwrites only
its own output subdirectory (dynamic partition overwrite in real Iceberg;
per-slice parquet dirs in the sandbox fallback).

Why slice-level (not task-level): Spark already retries tasks; what Spark
does NOT give you is job-level resume after a driver loss. Slices bound the
blast radius of a restart to one slice's work.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from blogparser_spark.operators.parse import STATUSES as _OBSERVED_STATUSES

MANIFEST_DIR = "_manifests"


@dataclass
class SliceManifest:
    slice_id: int
    n_slices: int
    key_col: str
    predicate: str
    input_path: str
    input_snapshot: str
    rows_in: int
    rows_ok: int
    sink_counts: dict
    started_at: float
    wall_seconds: float
    output_path: str
    table_version: int | None = None  # tablelog sink: this slice's commit
    table_format: str = "parquet"  # sink the slice was written to


def _manifest_path(base: str, slice_id: int) -> str:
    return os.path.join(base, MANIFEST_DIR, f"slice-{slice_id:05d}.json")


def write_manifest(base: str, m: SliceManifest) -> None:
    """Atomic write: tmp + rename, so a crash mid-write never yields a
    manifest that marks an incomplete slice as done."""
    path = _manifest_path(base, m.slice_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1)
    os.replace(tmp, path)


def completed_slices(base: str) -> set[int]:
    d = os.path.join(base, MANIFEST_DIR)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("slice-") and name.endswith(".json"):
            out.add(int(name[len("slice-") : -len(".json")]))
    return out


SLICE_COL = "slice_bucket"


def slice_predicate(slice_id: int, n_slices: int, key_col: str = "conv_id"):
    """Deterministic, data-independent slice membership: pmod(hash(key), n).
    Every executor computes it identically; no shuffle, no state."""
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_slices)) == slice_id


LAYOUT_MARKER = "_slice_layout.json"


def write_sliced_input(
    df: DataFrame, path: str, n_slices: int = 8, key_col: str = "conv_id"
) -> None:
    """Ingest-time alignment of the slice key with STORAGE partitioning:
    write the input partitioned by slice_bucket = pmod(hash(key), n). A
    slice run then filters on the partition column and the scan PRUNES to
    1/n of the files — a hash predicate over a flat layout cannot prune,
    so an N-slice run over it reads the corpus N times (at 100 TB × 64
    slices that is 6.4 PB of scan). Iceberg would express the same thing
    as a bucket(n, key) partition transform. The written slice count is
    persisted in a marker file so a later run with a DIFFERENT n_slices
    cannot silently misattribute slices (run n=8 over a written n=4
    layout would give 4 double-width slices and 4 empty ones)."""
    out = df.withColumn(SLICE_COL, F.pmod(F.hash(F.col(key_col)), F.lit(n_slices)))
    out.write.mode("overwrite").partitionBy(SLICE_COL).parquet(path)
    with open(os.path.join(path, LAYOUT_MARKER), "w") as f:
        json.dump({"n_slices": n_slices, "key_col": key_col}, f)


def _sliced_layout(path: str, n_slices: int, key_col: str) -> bool:
    """True iff `path` was written by write_sliced_input with EXACTLY this
    (n_slices, key_col). The marker is authoritative; a marker-less
    partitioned dir falls back to the hash predicate (correct, unpruned)
    rather than guessing the written layout from directory names — a
    subset check would accept a smaller written n and misreport slicing."""
    try:
        with open(os.path.join(path, LAYOUT_MARKER)) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return False
    return meta.get("n_slices") == n_slices and meta.get("key_col") == key_col


def input_snapshot_id(spark: SparkSession, path: str) -> str:
    """Lineage identifier for the input. Iceberg would give a snapshot id;
    for parquet dirs, the max mtime over ALL data files (recursive — the
    input may be partitioned into subdirectories) is the next best stable
    marker (changes iff the data changes)."""
    latest = None
    try:
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    mt = os.path.getmtime(os.path.join(root, f))
                    latest = mt if latest is None else max(latest, mt)
    except OSError:
        return "unknown"
    return f"mtime:{int(latest)}" if latest is not None else "unknown"


def read_manifest(base: str, slice_id: int) -> dict | None:
    try:
        with open(_manifest_path(base, slice_id)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def slice_marker(
    slice_id: int, snapshot: str, n_slices: int, key_col: str, nonce: str = ""
) -> str:
    """Idempotence marker for one slice's tablelog commit: encodes the
    input snapshot and the slicing config, so a restarted job's
    re-submission of the same work is a ledger no-op while a changed
    input (different snapshot) or re-slicing produces a fresh marker and
    re-commits. `nonce` (resume=False) forces a fresh generation."""
    base = f"slice={slice_id}|snap={snapshot}|n={n_slices}|key={key_col}"
    return f"{base}|run={nonce}" if nonce else base


def run_sliced(
    spark: SparkSession,
    input_path: str,
    output_base: str,
    transform,
    n_slices: int = 8,
    key_col: str = "conv_id",
    resume: bool = True,
    table_format: str = "parquet",
) -> list[SliceManifest]:
    """Run transform(df_slice) -> DataFrame for each incomplete slice,
    writing per-slice output + manifest. `transform` must return a frame
    with a parse_status column (for the observed sink metrics).

    Input layouts: if input_path was written by write_sliced_input with a
    compatible slice count, each slice filters on the PARTITION column and
    the scan prunes to that slice's files; otherwise it falls back to the
    hash predicate over a full scan (correct, but reads the corpus once
    per slice — fine in tests, wrong at 100 TB; ingest sliced there).

    Sinks: table_format="tablelog" (the job default) routes every slice
    into ONE snapshot-log table at {output_base}/table as an atomic
    idempotent commit per slice (route.route_commit_tablelog — the north
    rule's per-sink Iceberg tables), partitioned by the sink keys with
    conv_id footer stats + blooms for point lookups. "parquet" keeps the
    plain per-slice directory layout.

    Resume safety: a completed slice is skipped if its manifest's
    input_snapshot matches the CURRENT input snapshot — after the input
    changes, every slice re-runs rather than silently mixing lineages —
    AND the manifest's (n_slices, key_col) match this run's: resuming a
    4-slice output with n_slices=8 would keep pmod-4 slice outputs next
    to pmod-8 ones, duplicating every row whose pmod8 ∈ {4..7}. Under
    tablelog the COMMIT MARKER LEDGER is a second, storage-level resume
    guard: slice markers encode (snapshot, n_slices, key_col), so a slice
    whose marker is already committed is skipped even if its manifest
    file was lost, and a crashed run's re-submission is a commit no-op
    (tablelog.append_idempotent). When the table holds commits from a
    DIFFERENT generation (changed input or re-slicing), each re-run slice
    first equality-deletes the old-generation rows of ITS OWN keyspace —
    under the CURRENT hash predicate, so coverage over all current slices
    is complete even when n_slices changed — then appends; the table
    converges to exactly the current generation. Mid-migration readers
    may see mixed generations between slice commits; a run needing
    all-or-nothing publication should stage on a branch and fast_forward
    (tablelog WAP) instead."""
    snapshot = input_snapshot_id(spark, input_path)
    table = os.path.join(output_base, "table")
    nonce = "" if resume else uuid.uuid4().hex[:8]
    committed: set[str] = set()
    stale_gens = False
    if table_format == "tablelog":
        from blogparser_spark.operators import tablelog as tl

        committed = tl.committed_markers(table)
        current = {
            slice_marker(s, snapshot, n_slices, key_col, nonce)
            for s in range(n_slices)
        }
        stale_gens = bool(committed - current)
    done: set[int] = set()
    if resume:
        for s in completed_slices(output_base):
            m = read_manifest(output_base, s)
            if (
                m
                and m.get("input_snapshot") == snapshot
                and m.get("n_slices") == n_slices
                and m.get("key_col") == key_col
                # a manifest written against the OTHER sink format proves
                # nothing about this run's sink: trusting a parquet-era
                # manifest under tablelog would skip every slice and
                # leave the table uncreated (and vice versa)
                and m.get("table_format", "parquet") == table_format
            ):
                done.add(s)
        if table_format == "tablelog":
            for s in range(n_slices):
                if slice_marker(s, snapshot, n_slices, key_col) in committed:
                    done.add(s)
    sliced = _sliced_layout(input_path, n_slices, key_col)
    manifests: list[SliceManifest] = []
    for s in range(n_slices):
        if s in done:
            continue
        t0 = time.time()
        if sliced:
            # partition-column filter → directory-level pruning at the scan
            src = spark.read.parquet(input_path).filter(F.col(SLICE_COL) == s)
            predicate = f"{SLICE_COL} = {s} (partition-pruned)"
        else:
            src = spark.read.parquet(input_path).filter(
                slice_predicate(s, n_slices, key_col)
            )
            predicate = f"pmod(hash({key_col}), {n_slices}) = {s}"
        obs_in = Observation(f"in-{s}")
        obs_out = Observation(f"out-{s}")
        src = src.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))
        out = transform(src)
        # per-sink counts ride the SAME write job via observe() — no
        # re-read of the slice output just to recount
        status_aggs = [
            F.sum(F.when(F.col("parse_status") == st, 1).otherwise(0)).alias(st)
            for st in _OBSERVED_STATUSES
        ]
        out = out.observe(obs_out, F.count(F.lit(1)).alias("rows"), *status_aggs)
        table_version: int | None = None
        if table_format == "tablelog":
            from blogparser_spark.operators import tablelog as tl
            from blogparser_spark.operators.route import route_commit_tablelog

            marker = slice_marker(s, snapshot, n_slices, key_col, nonce)
            if stale_gens and tl.current_version(table) is not None:
                # replace THIS slice's keyspace from older generations:
                # the current hash predicate scopes the delete, so the
                # union over all current slices covers every stale row
                # even when n_slices changed between generations
                tl.delete_where(
                    spark,
                    table,
                    slice_predicate(s, n_slices, key_col)
                    & (F.col("_gen") != marker),
                    [key_col, "_gen"],
                )
            table_version, _ = route_commit_tablelog(
                out.withColumn("_slice", F.lit(s)).withColumn(
                    "_gen", F.lit(marker)
                ),
                table,
                marker=marker,
                stats_cols=("conv_id",),
                bloom_cols=("conv_id",),
            )
            out_path = table
        else:
            out_path = os.path.join(output_base, f"slice={s}")
            out.write.mode("overwrite").parquet(out_path)
        metrics = obs_out.get
        sink_counts = {
            st: int(metrics[st]) for st in _OBSERVED_STATUSES if metrics[st]
        }
        # statuses outside the known list must not vanish from the manifest:
        # record the residue so sink_counts always sums to the row count
        other = int(metrics["rows"]) - sum(sink_counts.values())
        if other:
            sink_counts["other"] = other
        m = SliceManifest(
            slice_id=s,
            n_slices=n_slices,
            key_col=key_col,
            predicate=predicate,
            input_path=input_path,
            input_snapshot=snapshot,
            rows_in=int(obs_in.get["rows_in"]),
            rows_ok=sink_counts.get("ok", 0),
            sink_counts=sink_counts,
            started_at=t0,
            wall_seconds=round(time.time() - t0, 3),
            output_path=out_path,
            table_version=table_version,
            table_format=table_format,
        )
        write_manifest(output_base, m)
        manifests.append(m)
    return manifests

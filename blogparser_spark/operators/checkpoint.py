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

MANIFEST_DIR = "_manifests"


@dataclass
class SliceManifest:
    slice_id: int
    n_slices: int
    predicate: str
    input_path: str
    input_snapshot: str
    rows_in: int
    rows_ok: int
    sink_counts: dict
    started_at: float
    wall_seconds: float
    output_path: str


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


def slice_predicate(slice_id: int, n_slices: int, key_col: str = "conv_id"):
    """Deterministic, data-independent slice membership: pmod(hash(key), n).
    Every executor computes it identically; no shuffle, no state."""
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_slices)) == slice_id


def input_snapshot_id(spark: SparkSession, path: str) -> str:
    """Lineage identifier for the input. Iceberg would give a snapshot id;
    for parquet dirs, the max mtime of the files is the next best stable
    marker (changes iff the data changes)."""
    try:
        mt = max(
            os.path.getmtime(os.path.join(path, p))
            for p in os.listdir(path)
            if p.endswith(".parquet")
        )
        return f"mtime:{int(mt)}"
    except (OSError, ValueError):
        return "unknown"


def run_sliced(
    spark: SparkSession,
    input_path: str,
    output_base: str,
    transform,
    n_slices: int = 8,
    key_col: str = "conv_id",
    resume: bool = True,
) -> list[SliceManifest]:
    """Run transform(df_slice) -> DataFrame for each incomplete slice,
    writing per-slice parquet + manifest. `transform` must return a frame
    with a parse_status column (for the observed sink metrics)."""
    done = completed_slices(output_base) if resume else set()
    snapshot = input_snapshot_id(spark, input_path)
    manifests: list[SliceManifest] = []
    for s in range(n_slices):
        if s in done:
            continue
        t0 = time.time()
        src = spark.read.parquet(input_path).filter(
            slice_predicate(s, n_slices, key_col)
        )
        obs_in = Observation(f"in-{s}")
        obs_out = Observation(f"out-{s}")
        src = src.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))
        out = transform(src)
        out = out.observe(
            obs_out,
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.when(F.col("parse_status") == "ok", 1).otherwise(0)
            ).alias("rows_ok"),
        )
        out_path = os.path.join(output_base, f"slice={s}")
        out.write.mode("overwrite").parquet(out_path)
        sink_counts = {
            r["parse_status"]: r["n"]
            for r in spark.read.parquet(out_path)
            .groupBy("parse_status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        m = SliceManifest(
            slice_id=s,
            n_slices=n_slices,
            predicate=f"pmod(hash({key_col}), {n_slices}) = {s}",
            input_path=input_path,
            input_snapshot=snapshot,
            rows_in=int(obs_in.get["rows_in"]),
            rows_ok=int(obs_out.get["rows_ok"] or 0),
            sink_counts=sink_counts,
            started_at=t0,
            wall_seconds=round(time.time() - t0, 3),
            output_path=out_path,
        )
        write_manifest(output_base, m)
        manifests.append(m)
    return manifests

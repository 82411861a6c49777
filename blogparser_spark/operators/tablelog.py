"""Snapshot-log table format: Iceberg's commit design re-expressed on plain
parquet + JSON — from scratch, no runtime jar.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime,
so this module implements the part of the table format the pipeline actually
depends on, using only the public Iceberg *design* (spec at
iceberg.apache.org/spec): an append-only log of immutable commits, each an
atomic commit-if-absent file naming the data files it adds/removes plus
per-file row counts and column min/max stats. Everything a 100-TB deployment
needs falls out of that one structure:

- **O(1) planning, no directory listing.** Readers replay the log (a few KB
  of JSON) instead of LISTing a 100-TB object-store prefix; the live file
  set IS the snapshot. Eventual-consistency of S3 listings never matters.
- **Time travel / reproducible reads**: any retained version is readable —
  a training run pins the snapshot id into its lineage manifest
  (checkpoint.SliceManifest.input_snapshot) and is re-runnable bit-for-bit.
- **Incremental computation**: `incremental_append_scan(from, to)` yields
  exactly the rows appended between two snapshots — the input contract for
  the IVM layer (operators/aggregate.apply_retractable_delta) and the
  incremental dedup probe (dedup.incremental_dedup_probe).
- **Merge-on-read equality deletes**: deleting keys writes a small delete
  file instead of rewriting petabytes; readers anti-join it. Sequence
  numbers (the commit version that added each file) scope every delete file
  to data files OLDER than the delete, so re-appending a previously deleted
  key is not suppressed — the Iceberg v2 sequence-number rule.
- **Compaction** folds small files and outstanding delete files into fresh
  data files as one atomic commit; logical rows are unchanged.
- **Snapshot expiry** bounds storage: physical files referenced only by
  expired versions are removed, with a rebase ("checkpoint") state so the
  log itself stays O(retained commits).
- **Stats pruning**: per-file min/max footer stats let `scan_between` read
  only the files whose range overlaps a predicate — partition-pruning
  semantics without a partition column (pairs with the z-order layout in
  operators/storage.write_zordered).
- **Named refs** (Iceberg branches and tags): tags pin snapshots by name
  (and against expiry); branches are writable lineages forked off main —
  commits stamped with the branch chain off its head and are invisible to
  main readers because state replay follows PARENT POINTERS, not the
  version sequence. `fast_forward` publishes a branch into main as one
  atomic diff commit — the branch-WAP pattern for audit-then-publish.

Concurrency is optimistic, exactly like Iceberg's commit-if-absent on the
metadata pointer: a commit is `os.link(tmp, log/v{N}.json)`, which fails if
another writer claimed version N first; appends re-validate and retry,
non-append commits surface CommitConflict to the caller.

The reference has no storage layer at all (the Go CLI rereads its input
files each run, sample/main.go:32-47); this is north-rule scope.

Layout on disk:
  <table>/data/c{version:06d}/part-*.parquet     immutable data files
  <table>/deletes/c{version:06d}/part-*.parquet  equality-delete key files
  <table>/log/v{version:012d}.json               one commit per version
  <table>/log/_base_v{version:012d}.json         rebase state after expiry
  <table>/log/ref-{name}.json                    named ref (branch/tag)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _q6(x: float) -> float:
    """Tie-free 6-decimal quantizer (repo cross-engine rule): floor(x*1e6
    + 0.5)/1e6. Python round() is half-even, DuckDB round() half-away —
    this form evaluates identically in both engines at a decimal tie, so
    every float the NDV estimators emit is oracle-safe."""
    return math.floor(x * 1e6 + 0.5) / 1e6


class CommitConflict(RuntimeError):
    """Another writer committed the version this transaction targeted."""


class SnapshotExpired(LookupError):
    """The requested version predates the oldest retained snapshot."""


# ---------------------------------------------------------------------------
# log primitives
# ---------------------------------------------------------------------------


def _log_dir(table: str) -> str:
    return os.path.join(table, "log")


def _commit_path(table: str, version: int) -> str:
    return os.path.join(_log_dir(table), f"v{version:012d}.json")


def _base_path(table: str, version: int) -> str:
    return os.path.join(_log_dir(table), f"_base_v{version:012d}.json")


def list_versions(table: str) -> list[int]:
    try:
        names = os.listdir(_log_dir(table))
    except OSError:
        return []
    return sorted(
        int(n[1:13]) for n in names if n.startswith("v") and n.endswith(".json")
    )


def current_version(table: str) -> int | None:
    vs = list_versions(table)
    return vs[-1] if vs else None


def _read_commit(table: str, version: int) -> dict:
    with open(_commit_path(table, version)) as f:
        return json.load(f)


def _try_commit(table: str, commit: dict) -> bool:
    """Atomic commit-if-absent: write a temp file, then hard-link it to the
    versioned name. link(2) fails with EEXIST if a concurrent writer
    claimed the version — the loser re-reads the log and retries/aborts.
    This is the same primitive as Iceberg's atomic metadata swap."""
    os.makedirs(_log_dir(table), exist_ok=True)
    tmp = os.path.join(_log_dir(table), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(commit, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _commit_path(table, commit["version"]))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


# ---------------------------------------------------------------------------
# file manifests (pyarrow footer reads — metadata only, never data)
# ---------------------------------------------------------------------------


def _json_safe(v):
    return v if isinstance(v, (int, float, str, bool)) or v is None else str(v)


def _partition_of(dirpath: str, path: str) -> dict[str, str]:
    """Partition values parsed from hive-style `_p_<k>=<v>` path segments
    (the write path partitions on `_p_`-prefixed DUPLICATE columns so the
    data files keep the real columns — Iceberg keeps partition values in
    metadata for the same reason)."""
    from urllib.parse import unquote

    rel = os.path.relpath(os.path.dirname(path), dirpath)
    out = {}
    for seg in rel.split(os.sep):
        if "=" in seg and seg.startswith("_p_"):
            k, v = seg.split("=", 1)
            out[k[3:]] = unquote(v)
    return out


# ---------------------------------------------------------------------------
# hidden partitioning (Iceberg partition-spec transforms)
# ---------------------------------------------------------------------------

_SPEC_RE = re.compile(
    r"^\s*(?:(identity|days|hours|months|years)\s*\(\s*(\w+)\s*\)"
    r"|(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)"
    r"|(\w+))\s*$"
)

# lexical prefix length of the ISO-rendered timestamp per temporal transform
_TEMPORAL_PREFIX = {"years": 4, "months": 7, "days": 10, "hours": 13}


def parse_partition_spec(spec: tuple[str, ...] | list[str]) -> list[dict]:
    """Parse an Iceberg-style partition spec — `("days(ts)",
    "bucket(8, conv_id)", "truncate(4, role)", "region")` — into field
    dicts {name, source, transform, param}. This is Iceberg's HIDDEN
    partitioning (spec §Partition Transforms): the table partitions on a
    TRANSFORM of a source column, writers never materialize the partition
    column in their rows, and readers prune with plain predicates on the
    source column (scan_where projects them through the transform)."""
    fields = []
    for s in spec:
        m = _SPEC_RE.match(s)
        if not m:
            raise ValueError(f"unparseable partition-spec field: {s!r}")
        if m.group(6):  # bare column = identity
            transform, param, source = "identity", None, m.group(6)
        elif m.group(1):
            transform, param, source = m.group(1), None, m.group(2)
        else:
            transform, param, source = m.group(3), int(m.group(4)), m.group(5)
        if transform == "identity":
            name = source
        elif transform in _TEMPORAL_PREFIX:
            name = f"{source}_{transform[:-1]}"  # ts_day, ts_hour, ...
        else:
            name = f"{source}_{transform}_{param}"
        fields.append(
            {"name": name, "source": source, "transform": transform, "param": param}
        )
    return fields


def _transform_expr(field: dict, dtype: str) -> Column:
    """The Spark-side partition-value expression for one spec field. Every
    transform has an EXACT Python twin (_twin_transform) so manifest-side
    pruning can project predicate literals through the same function:

    - bucket(n): md5-hex-prefix mod n (the repo's engine-portable stand-in
      for Iceberg's murmur3 bucket — same convention as
      route.consistent_shard_assign and the curation sampling keys).
    - truncate(w): substring for strings, w*floor(v/w) for integers
      (pmod keeps negatives on the Iceberg floor semantics).
    - days/hours/months/years: LEXICAL truncation of the ISO-rendered
      value (substring of cast-to-string) — timezone-free for NTZ
      timestamps and identical in Spark, Python, and DuckDB, unlike
      epoch-day arithmetic.
    """
    col = F.col(field["source"])
    t = field["transform"]
    if t == "identity":
        return col
    if t == "bucket":
        return F.pmod(
            F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(field["param"]),
        )
    if t == "truncate":
        if dtype == "string":
            return F.substring(col, 1, field["param"])
        return (col - F.pmod(col, F.lit(field["param"]))).cast("long")
    return F.substring(col.cast("string"), 1, _TEMPORAL_PREFIX[t])


def _twin_transform(field: dict, value) -> str:
    """Python twin of _transform_expr applied to a PREDICATE LITERAL,
    returning the hive-path string form the manifest stores. Bit-for-bit
    agreement with the Spark expression is pinned by a property test."""
    t = field["transform"]
    if t == "identity":
        return str(value)
    if t == "bucket":
        h = hashlib.md5(str(value).encode()).hexdigest()[:8]
        return str(int(h, 16) % field["param"])
    if t == "truncate":
        if isinstance(value, str):
            return value[: field["param"]]
        return str(int(value - (value % field["param"])))
    return str(value)[: _TEMPORAL_PREFIX[t]]


def _numeric(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _part_match(field: dict, part_value: str, pred: tuple) -> bool:
    """Can a file whose partition value for `field` is `part_value`
    contain rows matching `pred` on the SOURCE column? False only when
    the transform projection PROVES it cannot (Iceberg's inclusive
    projection): equality projects through every transform; ranges
    project through order-preserving transforms (identity, truncate,
    temporal) but never through bucket."""
    op = pred[0]
    if op == "=":
        return part_value == _twin_transform(field, pred[1])
    lo, hi = _twin_transform(field, pred[1]), _twin_transform(field, pred[2])
    if field["transform"] == "bucket":
        return True  # hash transform is not order-preserving
    n, a, b = _numeric(part_value), _numeric(lo), _numeric(hi)
    if n is not None and a is not None and b is not None:
        return a <= n <= b
    return lo <= part_value <= hi


BLOOM_M = 2048  # bits per per-file bloom (256 bytes in the manifest)
BLOOM_K = 3     # hash probes per value


def _bloom_positions(value) -> list[int]:
    """Deterministic md5-derived bit positions for one key value — the
    same expression on write and probe, engine-neutral (str(value) keys:
    ints and strings round-trip identically through JSON). Only int and
    str keys are bloomable: a float's string form is representation-
    dependent (1 vs 1.0), and a false absence verdict would WRONGLY prune
    a file — _bloom_build skips other types so no filter exists to
    mis-answer, and _bloom_match returns keep for them."""
    import hashlib

    s = str(value)
    return [
        int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:8], 16) % BLOOM_M
        for i in range(BLOOM_K)
    ]


def _bloom_build(values) -> str:
    """Hex-encoded BLOOM_M-bit array with every value's probes set."""
    bits = bytearray(BLOOM_M // 8)
    for v in values:
        if v is None:
            continue  # NULL never matches an '=' predicate: safe to omit
        if isinstance(v, bool) or not isinstance(v, (int, str)):
            return ""  # unbloomable column type: record no filter at all
        for pos in _bloom_positions(v):
            bits[pos // 8] |= 1 << (pos % 8)
    return bits.hex()


def _bloom_match(hexbits: str | None, pred: tuple) -> bool:
    """Definite-absence check for one '=' predicate: if ANY probe bit is
    unset the file cannot contain the value. None / non-equality: keep
    (blooms answer membership only — ranges fall back to min/max)."""
    v = pred[1] if pred[0] == "=" else None
    if (
        not hexbits  # None or the empty unbloomable marker
        or pred[0] != "="
        or isinstance(v, bool)
        or not isinstance(v, (int, str))
    ):
        return True  # membership unknown: never prune blind
    bits = bytes.fromhex(hexbits)
    return all(
        bits[pos // 8] & (1 << (pos % 8)) for pos in _bloom_positions(pred[1])
    )


NDV_K = 64  # KMV sketch size: k smallest 64-bit hashes per file/column


def _kmv_hash(v) -> int:
    """THE sketch-key hash: 64-bit md5 prefix of str(v). One definition —
    the write path (_col_sketches), the whole-column path (_kmv_mins),
    and every oracle replay must agree bit-for-bit or layout-independent
    NDV merging silently breaks."""
    return int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)


def _kmv_mins(values) -> list[int]:
    """The NDV_K smallest distinct 64-bit md5 hashes of a column's values
    — a KMV (k-minimum-values) sketch (Bar-Yossef et al. 2002; Iceberg
    stores the same idea as puffin theta sketches). Merging per-file
    sketches by re-taking the k smallest of the union is EXACT: any hash
    among the global k smallest is necessarily among its own file's k
    smallest. Same int/str-only key discipline as the blooms (a float's
    string form is representation-dependent); NULLs are skipped."""
    hs = set()
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool) or not isinstance(v, (int, str)):
            return []  # unsketchable type: record nothing
        hs.add(_kmv_hash(v))
    return sorted(hs)[:NDV_K]


def _col_sketches(
    pf, col: str, want_bloom: bool, want_ndv: bool
) -> tuple[str, list[int]]:
    """Writer-side bloom + KMV for one column in ONE streaming pass over
    the file's record batches (pyarrow iter_batches) — the same work an
    Iceberg writer does to emit puffin/parquet stats, but with driver
    memory bounded at O(batch + BLOOM_M/8 + k), never O(rows in file):
    the bloom folds bits in place and the KMV running set is pruned back
    to its k smallest after every batch, which is exact because any hash
    among the file's k smallest is among every running prefix's k
    smallest. Same int/str-only key discipline as _bloom_build/_kmv_mins:
    an unbloomable/unsketchable value type records no filter at all for
    the whole file ('' / [])."""
    bits = bytearray(BLOOM_M // 8) if want_bloom else None
    hs: set[int] | None = set() if want_ndv else None
    for batch in pf.iter_batches(columns=[col]):
        for v in batch.column(0).to_pylist():
            if v is None:
                continue  # NULL never matches '=' and never counts distinct
            if isinstance(v, bool) or not isinstance(v, (int, str)):
                return "", []
            if bits is not None:
                for pos in _bloom_positions(v):
                    bits[pos // 8] |= 1 << (pos % 8)
            if hs is not None:
                hs.add(_kmv_hash(v))
        if hs is not None and len(hs) > NDV_K:
            hs = set(sorted(hs)[:NDV_K])
    return (
        bits.hex() if bits is not None else "",
        sorted(hs)[:NDV_K] if hs is not None else [],
    )


def column_ndv(table: str, col: str) -> dict:
    """Merged distinct-count estimate for `col` from MANIFESTS alone: the
    per-file KMV sketches union to the exact global k-minimum set, and
    NDV ≈ (k-1) / (kth_smallest / 2^64) — the standard KMV estimator,
    exact (n_mins itself) whenever the true NDV < k. The optimizer-facing
    number a join planner wants (which side is smaller, is a broadcast
    safe) without opening a single data file. Returns {n_files,
    n_files_sketched, n_mins, ndv_est} with ndv_est rounded to 6
    decimals (a pure function of exact integer hashes — engine-neutral,
    replayed verbatim by the DuckDB oracle)."""
    _, state = _state_at(table)
    entries = list(state["data"].values())
    sketched = [e for e in entries if col in e.get("ndv", {})]
    mins = sorted({m for e in sketched for m in e["ndv"][col]})[:NDV_K]
    if not mins:
        return {
            "n_files": len(entries),
            "n_files_sketched": 0,
            "n_mins": 0,
            "ndv_est": 0.0,
        }
    if len(mins) < NDV_K:
        est = float(len(mins))  # saw fewer than k distinct hashes: exact
    else:
        est = _q6((NDV_K - 1) / (mins[-1] / 2.0**64))
    return {
        "n_files": len(entries),
        "n_files_sketched": len(sketched),
        "n_mins": len(mins),
        "ndv_est": est,
    }


def _merged_mins(table: str, col: str) -> list[int]:
    """Exact global k-minimum hash set for `col` from the table's per-file
    KMV sketches (the column_ndv merge)."""
    _, state = _state_at(table)
    return sorted(
        {
            m
            for e in state["data"].values()
            for m in e.get("ndv", {}).get(col, [])
        }
    )[:NDV_K]


def _kmv_estimate(mins: list[int]) -> float:
    """(k-1)/(kth/2^64) KMV estimator; exact count when fewer than k."""
    if not mins:
        return 0.0
    if len(mins) < NDV_K:
        return float(len(mins))
    return _q6((NDV_K - 1) / (mins[-1] / 2.0**64))


def column_ndv_overlap(
    table_a: str, table_b: str, col_a: str, col_b: str | None = None
) -> dict:
    """Join-cardinality planning from MANIFESTS of two tables (Beyer et
    al., SIGMOD 2007 §4: KMV set operations): take the k smallest hashes
    of the UNION (exact — each side's global k-min set is known, and the
    union's k-min is contained in their union), estimate
    Jaccard = |union k-mins present in BOTH sides| / |union k-mins|
    (sound: any union-k-min hash that belongs to side A is necessarily
    within A's own k-min, because A's kth smallest ≥ the union's), then
    ndv(A ∩ B) ≈ J · ndv(A ∪ B). This is the equi-join selectivity
    number — broadcast the side whose intersection share is tiny — read
    without opening one data file on either table. Exact whenever the
    union has fewer than k distinct hashes. Returns {jaccard, union_est,
    inter_est, n_union_mins}."""
    a = _merged_mins(table_a, col_a)
    b = _merged_mins(table_b, col_b or col_a)
    sa, sb = set(a), set(b)
    union = sorted(sa | sb)[:NDV_K]
    if not union:
        return {
            "jaccard": 0.0,
            "union_est": 0.0,
            "inter_est": 0.0,
            "n_union_mins": 0,
        }
    shared = sum(1 for h in union if h in sa and h in sb)
    jacc = _q6(shared / len(union))
    union_est = _kmv_estimate(union)
    return {
        "jaccard": jacc,
        "union_est": union_est,
        "inter_est": _q6(jacc * union_est),
        "n_union_mins": len(union),
    }


def _stats_match(st: list | None, pred: tuple) -> bool:
    """Min/max footer-stats check for one predicate; None stats keep."""
    if st is None:
        return True
    try:
        if pred[0] == "=":
            return st[0] <= pred[1] <= st[1]
        return st[0] <= pred[2] and st[1] >= pred[1]
    except TypeError:
        return True  # cross-type stats (e.g. str vs int) — never prune blind


# ---------------------------------------------------------------------------
# two-level manifests (Iceberg's manifest-list layer)
# ---------------------------------------------------------------------------
#
# A commit that adds many files groups its file entries into MANIFEST CHUNK
# files (log/mchunk-*.json) and records only per-chunk summaries inline:
# file/row/byte tallies, the distinct partition values per spec field, merged
# min/max stats, and the OR of the per-file blooms (a valid membership filter
# for the whole chunk — if a probe bit is unset in the union, no file in the
# chunk contains the value). Planning (plan_scan / prune_files_where /
# scan_where) then checks the SUMMARY first and skips whole chunks without
# opening them — at 10^7 live files the driver touches O(chunks) summaries
# instead of O(files) entries for a selective predicate. Full-table
# operations (read_snapshot, compaction, metadata tables) expand chunks via
# _state_at's default expand=True and behave exactly as before.

MANIFEST_CHUNK_FILES = 512  # commits adding more files than this chunk them
_CHUNK_SUMMARY_VALUES = 64  # max distinct partition values per summary field


def _bloom_or(hexes: list[str]) -> str:
    bits = bytearray(BLOOM_M // 8)
    for h in hexes:
        for i, b in enumerate(bytes.fromhex(h)):
            bits[i] |= b
    return bits.hex()


def _chunk_summary(entries: list[dict]) -> dict:
    """Inline summary for one chunk of file entries: tallies + the merged
    pruning metadata (partition value sets, min/max stats, OR'd blooms).
    A field/column is summarized only when EVERY entry carries it — a
    partial summary could prune a file the summary never saw."""
    ref: dict = {
        "n_files": len(entries),
        "rows": sum(e["rows"] for e in entries),
        "bytes": sum(e.get("bytes", 0) for e in entries),
    }
    spec = entries[0].get("spec")
    if spec and all(e.get("spec") == spec for e in entries):
        ref["spec"] = spec
    parts: dict[str, list] = {}
    for fname in {k for e in entries for k in e.get("partition", {})}:
        vals = {e.get("partition", {}).get(fname) for e in entries}
        if None not in vals and len(vals) <= _CHUNK_SUMMARY_VALUES:
            parts[fname] = sorted(vals)
    if parts:
        ref["partitions"] = parts
    stats: dict[str, list] = {}
    for col in {c for e in entries for c in e.get("stats", {})}:
        sts = [e.get("stats", {}).get(col) for e in entries]
        if all(sts):
            try:
                stats[col] = [
                    min(s[0] for s in sts),
                    max(s[1] for s in sts),
                ]
            except TypeError:
                pass  # cross-type stats: no chunk-level range
    if stats:
        ref["stats"] = stats
    blooms: dict[str, str] = {}
    for col in {c for e in entries for c in e.get("bloom", {})}:
        hx = [e.get("bloom", {}).get(col) for e in entries]
        if all(hx):
            blooms[col] = _bloom_or(hx)
    if blooms:
        ref["bloom"] = blooms
    return ref


def _write_manifest_chunks(
    table: str, entries: list[dict], chunk_files: int
) -> list[dict]:
    """Group `entries` (sorted by partition values then path, so each chunk
    covers a coherent partition range) into chunk manifest files under
    log/, returning the summary refs to inline into the commit. Chunk
    paths are relative to the table root so the table stays relocatable."""
    entries = sorted(
        entries,
        key=lambda e: (json.dumps(e.get("partition", {}), sort_keys=True), e["path"]),
    )
    log = _log_dir(table)
    os.makedirs(log, exist_ok=True)
    refs = []
    for i in range(0, len(entries), chunk_files):
        grp = entries[i : i + chunk_files]
        name = f"mchunk-{uuid.uuid4().hex}.json"
        tmp = os.path.join(log, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump({"entries": grp}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(log, name))
        ref = _chunk_summary(grp)
        ref["manifest"] = os.path.join("log", name)
        refs.append(ref)
    return refs


def _maybe_chunk(
    table: str, entries: list[dict], chunk_files: int | None
) -> list[dict]:
    limit = MANIFEST_CHUNK_FILES if chunk_files is None else chunk_files
    if limit and len(entries) > limit:
        return _write_manifest_chunks(table, entries, limit)
    return entries


def _load_chunk_entries(table: str, ref: dict) -> list[dict]:
    """File entries of one chunk, stamped with the ref's commit-level
    seq/cols (chunk files are written once, before the optimistic-commit
    retry loop settles the version)."""
    with open(os.path.join(table, ref["manifest"])) as f:
        raw = json.load(f)["entries"]
    out = []
    for e in raw:
        e = dict(e)
        if "seq" in ref:
            e["seq"] = ref["seq"]
        if "cols" in ref:
            e["cols"] = ref["cols"]
        if "spec" in ref and "spec" not in e:
            e["spec"] = ref["spec"]
        out.append(e)
    return out


def _added_entries(table: str, commit: dict) -> list[dict]:
    """A commit's added data files with chunk refs expanded."""
    out = []
    for e in commit.get("added_data", []):
        if "manifest" in e:
            out.extend(_load_chunk_entries(table, e))
        else:
            out.append(e)
    return out


def _added_file_count(commit: dict) -> int:
    return sum(
        e["n_files"] if "manifest" in e else 1
        for e in commit.get("added_data", [])
    )


def _entry_matches(
    e: dict,
    state: dict,
    predicates: dict[str, tuple],
    byname: dict[str, int],
    evolved: bool,
    any_part_value: bool = False,
) -> bool:
    """True iff the entry (file, or chunk summary) may contain matching
    rows. `any_part_value=True` treats the entry's partition values as
    SETS (chunk summaries): the entry may match if ANY recorded value
    passes, where a file entry's single value must pass."""
    by_source: dict[str, list[tuple[dict, object]]] = {}
    for f in e.get("spec", []):
        if any_part_value:
            pvs = e.get("partitions", {}).get(f["name"])
            # a null/default value among the set means some file in the
            # chunk has no value for this field: indeterminate, never prune
            if pvs and all(
                pv is not None and pv != "__HIVE_DEFAULT_PARTITION__"
                for pv in pvs
            ):
                by_source.setdefault(f["source"], []).append((f, pvs))
        else:
            pv = e.get("partition", {}).get(f["name"])
            if pv is not None and pv != "__HIVE_DEFAULT_PARTITION__":
                by_source.setdefault(f["source"], []).append((f, [pv]))
    # specs and stats are keyed by the file's WRITE-TIME names; after a
    # rename the predicate's current name resolves through the field id
    wname = {}
    if evolved:
        inv = {fid: n for n, fid in _entry_cols(e, state).items()}
        wname = {c: inv.get(byname.get(c)) for c in predicates}
    for col, pred in predicates.items():
        w = wname.get(col, col) if evolved else col
        if w is None:
            continue  # column younger than this file: keep, never prune blind
        for f, pvs in by_source.get(w, []):
            if not any(_part_match(f, pv, pred) for pv in pvs):
                return False
        if not _stats_match(e.get("stats", {}).get(w), pred):
            return False
        if not _bloom_match(e.get("bloom", {}).get(w), pred):
            return False
    return True


def plan_scan(
    table: str,
    predicates: dict[str, tuple],
    version: int | None = None,
    _state: dict | None = None,
) -> dict:
    """Two-level manifest planning: check each chunk SUMMARY first and skip
    whole chunks (their file entries are never read) before checking the
    surviving chunks' per-file entries. Returns {"paths", "entries",
    "n_files_skipped", "n_chunks_total", "n_chunks_opened",
    "n_chunks_skipped"}. When a later commit removed files out of a chunk
    (compaction/expiry), every chunk is opened — a summary cannot say
    which of its files are still live, and skipped-file counts must stay
    exact. `_state` takes a caller's already-replayed expand=False state
    so one planning call never replays the commit log twice."""
    state = (
        _state
        if _state is not None
        else _state_at(table, version, expand=False)[1]
    )
    byname = {n: i for i, n, _t in _fields_of(state)}
    evolved = bool(state.get("evolved"))
    removed: set[str] = state.get("removed", set())
    kept: dict[str, dict] = {}
    skipped = 0
    for path in sorted(state["data"]):
        e = state["data"][path]
        if _entry_matches(e, state, predicates, byname, evolved):
            kept[path] = e
        else:
            skipped += 1
    chunks = state.get("chunks", {})
    opened = chunks_skipped = 0
    for mpath in sorted(chunks):
        ref = chunks[mpath]
        if not removed and not _entry_matches(
            ref, state, predicates, byname, evolved, any_part_value=True
        ):
            chunks_skipped += 1
            skipped += ref["n_files"]
            continue
        opened += 1
        for e in _load_chunk_entries(table, ref):
            if e["path"] in removed:
                continue
            if _entry_matches(e, state, predicates, byname, evolved):
                kept[e["path"]] = e
            else:
                skipped += 1
    return {
        "paths": sorted(kept),
        "entries": kept,
        "n_files_skipped": skipped,
        "n_chunks_total": len(chunks),
        "n_chunks_opened": opened,
        "n_chunks_skipped": chunks_skipped,
    }


def prune_files_where(
    table: str, predicates: dict[str, tuple], version: int | None = None
) -> tuple[list[str], int]:
    """Plan a predicate scan against the manifests only: live data files
    that can contain matching rows. `predicates` maps SOURCE column →
    ("=", v) or ("between", lo, hi). Each file is checked against (a) the
    partition spec it was written under, projected through its transforms
    — so partition EVOLUTION is handled per-file: a file written before a
    bucket field existed simply has no value for it and is kept — and (b)
    its min/max footer stats (plus blooms for '='). Chunked commits are
    planned summary-first (plan_scan): whole manifest chunks are skipped
    without being read. Returns (paths_to_read, n_files_skipped)."""
    plan = plan_scan(table, predicates, version)
    return plan["paths"], plan["n_files_skipped"]


def scan_where(
    spark: SparkSession,
    table: str,
    predicates: dict[str, tuple],
    version: int | None = None,
) -> DataFrame:
    """Hidden-partition-pruned scan: plan with prune_files_where (transform
    projection + footer stats, manifests only — no file is opened to
    decide), then read the surviving files, apply the EXACT predicates,
    and apply outstanding delete files scoped to the pruned set. At 100 TB
    this is the difference between a point lookup opening 1/n_buckets of
    one day's files and a full-table scan — and because the spec is
    per-file, the same call stays correct across partition-spec changes.
    Planning is two-level (plan_scan): chunked commits' manifest chunks
    are summary-skipped before any file entry is read."""
    _, state = _state_at(table, version, expand=False)
    plan = plan_scan(table, predicates, version, _state=state)
    paths = plan["paths"]
    if not paths:
        return _empty_df(spark, _field_pairs(_fields_of(state)))
    df = _read_projected(spark, [plan["entries"][p] for p in paths], state)
    for col, pred in predicates.items():
        if pred[0] == "=":
            df = df.filter(F.col(col) == F.lit(pred[1]))
        else:
            df = df.filter(F.col(col).between(pred[1], pred[2]))
    pruned_state = dict(state, data=plan["entries"])
    return _apply_deletes(spark, df, pruned_state)


def _file_entries(
    dirpath: str,
    stats_cols: tuple[str, ...],
    seq: int,
    bloom_cols: tuple[str, ...] = (),
    ndv_cols: tuple[str, ...] = (),
) -> list[dict]:
    """Manifest entries for every parquet file under dirpath: row count,
    byte size, partition values, and min/max per requested stats column —
    all read from parquet FOOTERS and path segments (the same numbers
    Iceberg persists in its manifests), so building the manifest costs
    metadata IO only."""
    import pyarrow.parquet as pq

    entries = []
    for root, _dirs, files in os.walk(dirpath):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(root, name)
            pf = pq.ParquetFile(path)
            md = pf.metadata
            stats: dict[str, list] = {}
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for col in stats_cols:
                if col not in idx:
                    continue
                lo = hi = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[col]).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    stats[col] = [_json_safe(lo), _json_safe(hi)]
            bloom: dict[str, str] = {}
            ndv: dict[str, list[int]] = {}
            for col in {*bloom_cols, *ndv_cols}:
                if col not in idx:
                    continue
                hexbits, mins = _col_sketches(
                    pf, col, col in bloom_cols, col in ndv_cols
                )
                if hexbits:
                    bloom[col] = hexbits
                if mins:
                    ndv[col] = mins
            entry = {
                "path": path,
                "rows": md.num_rows,
                "bytes": os.path.getsize(path),
                "seq": seq,
                "stats": stats,
            }
            if bloom:
                entry["bloom"] = bloom
            if ndv:
                entry["ndv"] = ndv
            part = _partition_of(dirpath, path)
            if part:
                entry["partition"] = part
            entries.append(entry)
    return entries


def _schema_of(df: DataFrame) -> list[list[str]]:
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


# ---------------------------------------------------------------------------
# schema evolution (Iceberg field IDs)
# ---------------------------------------------------------------------------
#
# Every column owns a permanent FIELD ID (Iceberg spec's schema evolution):
# commits carry `fields` = [[id, name, type], ...] plus `last_field_id`, and
# every data/delete file entry is stamped with `cols` = {write-time name: id}.
# Reads RESOLVE BY ID, never by name — so rename is metadata-only (old files
# keep their old column name; the projection follows the id), drop never
# resurrects (a re-added name gets a FRESH id, so old files' data for the
# dropped column stays invisible), add null-fills older files, and widen
# (int→bigint, float→double) casts at read time. Tables that never evolved
# keep the identity mapping and take the exact pre-evolution read path.

_WIDENINGS = {("int", "bigint"), ("float", "double")}


def _fields_of(state: dict) -> list[list]:
    """The state's fields [[id, name, dtype]]; legacy states (written before
    field ids existed) get positional ids — stable because pre-evolution
    schema changes were append-only."""
    if state.get("fields"):
        return state["fields"]
    return [[i + 1, n, t] for i, (n, t) in enumerate(state.get("schema") or [])]


def _field_pairs(fields: list[list]) -> list[list[str]]:
    return [[n, t] for _i, n, t in fields]


def _entry_cols(entry: dict, state: dict) -> dict[str, int]:
    """write-time column name → field id for one file entry. Entries stamped
    at write time carry it; legacy entries use the name→id snapshot the first
    evolve_schema commit recorded (their names are pre-evolution names by
    construction), else the identity mapping of the current fields."""
    if entry.get("cols"):
        return {n: int(i) for n, i in entry["cols"].items()}
    legacy = state.get("legacy_cols")
    if legacy:
        return {n: int(i) for n, i in legacy.items()}
    return {n: i for i, n, _t in _fields_of(state)}


def _fields_after_write(
    state: dict | None, merged_schema: list[list[str]]
) -> tuple[list[list], int]:
    """Fields for a commit whose post-commit schema is `merged_schema`:
    names already known keep their ids, new names take fresh ids past
    last_field_id (Iceberg's last-column-id rule, so a dropped-then-re-added
    name never reuses its old id)."""
    old = _fields_of(state) if state and state.get("schema") else []
    by_name = {n: (i, t) for i, n, t in old}
    last = max(
        int(state.get("last_field_id", 0)) if state else 0,
        max((i for i, _n, _t in old), default=0),
    )
    fields = []
    for n, t in merged_schema:
        if n in by_name:
            fields.append([by_name[n][0], n, t])
        else:
            last += 1
            fields.append([last, n, t])
    return fields, last


def _stamp_cols(entries: list[dict], fields: list[list]) -> list[dict]:
    """Record each new file's write-time name→field-id mapping."""
    cols = {n: i for i, n, _t in fields}
    for e in entries:
        e["cols"] = cols
    return entries


def table_fields(table: str, version: int | None = None) -> list[list]:
    """Public accessor: [[field_id, name, type]] at a snapshot."""
    return _fields_of(_state_at(table, version)[1])


def evolve_schema(
    table: str,
    add: tuple = (),
    drop: tuple = (),
    rename: dict[str, str] | None = None,
    widen: dict[str, str] | None = None,
    max_retries: int = 5,
) -> int:
    """Schema evolution as ONE metadata-only commit (no data file is read or
    rewritten — Iceberg ALTER TABLE semantics). `widen`/`rename`/`drop` take
    PRE-evolve names; `add` appends (name, type) columns that null-fill every
    existing file. Widening is the lossless promotion set int→bigint,
    float→double; anything else raises. Readers of snapshots at or after
    this commit see the new schema over ALL files, old and new, resolved by
    field id. No reference analog (the Go CLI has no storage layer)."""
    rename = dict(rename or {})
    widen = dict(widen or {})
    add = [list(a) for a in add]
    drop = list(drop)
    if set(rename) & set(drop):
        raise ValueError(f"column(s) both renamed and dropped: {set(rename) & set(drop)}")
    for _ in range(max_retries):
        cur = _head(table, "main")
        if cur is None:
            raise LookupError(f"cannot evolve schema of empty table {table}")
        _, state = _state_at(table, cur)
        fields = [list(f) for f in _fields_of(state)]
        names = {n for _i, n, _t in fields}
        for group in (set(widen), set(rename), set(drop)):
            unknown = group - names
            if unknown:
                raise ValueError(f"unknown column(s): {sorted(unknown)}")
        for n, new_t in widen.items():
            old_t = next(t for _i, fn, t in fields if fn == n)
            if (old_t, new_t) not in _WIDENINGS and old_t != new_t:
                raise ValueError(
                    f"cannot widen {n}: {old_t} -> {new_t} is not a lossless "
                    f"promotion ({sorted(_WIDENINGS)})"
                )
        new_fields = []
        for i, n, t in fields:
            if n in drop:
                continue
            t = widen.get(n, t)
            n = rename.get(n, n)
            new_fields.append([i, n, t])
        seen = {n for _i, n, _t in new_fields}
        if len(seen) != len(new_fields):
            raise ValueError("rename collides with a surviving column name")
        last = max(
            int(state.get("last_field_id", 0)),
            max((i for i, _n, _t in fields), default=0),
        )
        for n, t in add:
            if n in seen:
                raise ValueError(f"added column {n} already exists")
            seen.add(n)
            last += 1
            new_fields.append([last, n, t])
        if not new_fields:
            raise ValueError("evolution would drop every column")
        commit = {
            "version": (current_version(table) or 0) + 1,
            "parent": cur,
            "operation": "evolve_schema",
            "ts": time.time(),
            "schema": _field_pairs(new_fields),
            "fields": new_fields,
            "last_field_id": last,
        }
        if not state.get("legacy_cols") and not state.get("fields"):
            # first evolution of a pre-field-id table: snapshot the
            # name→id mapping its unstamped file entries were written under
            commit["legacy_cols"] = {n: i for i, n, _t in fields}
        if _try_commit(table, commit):
            return commit["version"]
    raise CommitConflict(
        f"evolve_schema lost the commit race {max_retries} times: {table}"
    )


def _has_pos_deletes(state: dict) -> bool:
    return any(e.get("positional") for e in state.get("deletes", {}).values())


def _read_projected(
    spark: SparkSession,
    entries: list[dict],
    state: dict,
    fields: list[list] | None = None,
    with_pos: bool | None = None,
) -> DataFrame:
    """Read file entries resolved BY FIELD ID against `fields` (default: the
    state's current fields). Files are grouped by their write-time column
    mapping; each group is one scan projected to (current name, current
    type): renamed columns read their old name, dropped ids are simply not
    selected, missing ids null-fill, widened types cast. Non-evolved states
    skip all of this and take the single mergeSchema scan. `with_pos`
    (default: auto, on iff the state carries position-delete files) selects
    the parquet `_metadata.row_index` ordinal as a `_pos` column — the row
    identity position deletes anti-join on; it must be captured AT the scan
    (the metadata pseudo-column does not survive a projection)."""
    if with_pos is None:
        with_pos = _has_pos_deletes(state)
    pos_col = (
        [F.col("_metadata.row_index").alias("_pos")] if with_pos else []
    )
    if not state.get("evolved") and fields is None:
        if not entries:
            return _empty_df(spark, _field_pairs(_fields_of(state)))
        df = _read_files(spark, sorted(e["path"] for e in entries))
        return df.select("*", *pos_col) if with_pos else df
    fields = fields or _fields_of(state)
    if not entries:
        return _empty_df(spark, _field_pairs(fields))
    groups: dict[tuple, list[str]] = {}
    for e in entries:
        sig = tuple(sorted(_entry_cols(e, state).items()))
        groups.setdefault(sig, []).append(e["path"])
    parts = []
    for sig, paths in sorted(groups.items()):
        inv = {fid: name for name, fid in sig}
        df = _read_files(spark, sorted(paths))
        have = set(df.columns)
        sel = []
        for fid, name, dtype in fields:
            w = inv.get(fid)
            if w is not None and w in have:
                sel.append(F.col(w).cast(dtype).alias(name))
            else:
                sel.append(F.lit(None).cast(dtype).alias(name))
        parts.append(df.select(*sel, *pos_col))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# named refs (Iceberg branches and tags)
# ---------------------------------------------------------------------------

_REF_NAME_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._\-]*$")


def _ref_path(table: str, name: str) -> str:
    return os.path.join(_log_dir(table), f"ref-{name}.json")


def _read_ref(table: str, name: str) -> dict:
    path = _ref_path(table, name)
    if not os.path.exists(path):
        raise LookupError(f"unknown ref {name!r} on table {table}")
    with open(path) as f:
        return json.load(f)


def list_refs(table: str) -> dict[str, dict]:
    """Every named ref: {name: {"type": "branch"|"tag", "version": int}}.
    `version` is a tag's pinned snapshot, or a branch's CREATION point —
    branch heads are derived from the log (branch_head), never stored, so
    a ref update needs no second atomic primitive: winning the commit race
    IS the head advance."""
    try:
        names = os.listdir(_log_dir(table))
    except OSError:
        return {}
    out = {}
    for n in sorted(names):
        if n.startswith("ref-") and n.endswith(".json"):
            with open(os.path.join(_log_dir(table), n)) as f:
                r = json.load(f)
            out[r["name"]] = r
    return out


def _head(table: str, branch: str = "main") -> int | None:
    """Head of a branch's commit chain: the newest commit stamped with the
    branch name (commits carry no stamp on main). For a named branch with
    no commits yet, the creation-point version. None for an empty main."""
    created = None
    if branch != "main":
        ref = _read_ref(table, branch)
        if ref["type"] != "branch":
            raise ValueError(f"ref {branch!r} is a tag, not a branch: {table}")
        created = ref["version"]
    head = None
    for v in list_versions(table):
        if _read_commit(table, v).get("branch", "main") == branch:
            head = v
    return head if head is not None else created


def resolve_ref(table: str, ref: str) -> int:
    """Ref name → snapshot version: a tag's pinned version, a branch's
    derived head, or the main head. Pass the result as `version=` to any
    read path (read_snapshot, scan_where, incremental scans)."""
    if ref == "main":
        h = _head(table, "main")
        if h is None:
            raise LookupError(f"main branch has no commits: {table}")
        return h
    r = _read_ref(table, ref)
    if r["type"] == "tag":
        return r["version"]
    h = _head(table, ref)
    assert h is not None  # branch refs always carry a creation version
    return h


def _create_ref(table: str, name: str, kind: str, version: int | None) -> int:
    if name == "main" or not _REF_NAME_RE.match(name):
        raise ValueError(f"invalid ref name {name!r}")
    versions = list_versions(table)
    at = (_head(table, "main") if version is None else version)
    if at is None or at not in versions:
        raise LookupError(f"cannot create ref at unknown version {at}: {table}")
    os.makedirs(_log_dir(table), exist_ok=True)
    tmp = os.path.join(_log_dir(table), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"name": name, "type": kind, "version": at, "ts": time.time()}, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _ref_path(table, name))
    except FileExistsError:
        raise ValueError(f"ref {name!r} already exists on table {table}") from None
    finally:
        os.unlink(tmp)
    return at


def create_tag(table: str, name: str, version: int | None = None) -> int:
    """Immutable named pointer to a snapshot (Iceberg tag): time travel by
    name, and — exactly like Iceberg's ref retention — expire_snapshots
    never expires a tagged snapshot while the tag exists. Atomic create
    via the same link-if-absent primitive as commits; returns the pinned
    version."""
    return _create_ref(table, name, "tag", version)


def create_branch(table: str, name: str, version: int | None = None) -> int:
    """Named writable lineage forked at `version` (default: main head).
    Commits made with `append(..., branch=name)` are stamped with the
    branch and chain off its head — INVISIBLE to main readers, because
    state replay follows parent pointers, not the version sequence. The
    audit-then-publish flow is create_branch → append(branch=...) →
    read_snapshot(ref=...) → fast_forward (Iceberg's branch-WAP pattern).
    Returns the fork version."""
    return _create_ref(table, name, "branch", version)


def drop_ref(table: str, name: str) -> None:
    """Remove a tag or branch pointer. A dropped branch's commits remain
    in the log (time-travelable by version) until expiry stops pinning
    them; its data files are swept once no retained commit references
    them."""
    path = _ref_path(table, name)
    if not os.path.exists(path):
        raise LookupError(f"unknown ref {name!r} on table {table}")
    os.unlink(path)


def fast_forward(table: str, branch: str, max_retries: int = 5) -> int:
    """Publish a branch into main (Iceberg's fast-forward): ONE atomic
    commit on main whose net file changes re-point main's live state at
    the branch head's — no data rewrite, and like rollback_to the
    re-added entries keep the sequence numbers they had when their rows
    became visible on the branch, so MoR delete scoping replays exactly.
    History is preserved: the branch commits stay time-travelable and the
    fast-forward is itself a commit (auditable in snapshot_lineage).
    Readers of main see the whole branch or none of it. Chunked branch
    commits publish AS CHUNK REFS, not re-inlined entries — the WAP flow
    (stage a huge chunked append on a branch, audit, fast_forward) keeps
    its two-level manifests on main, so planning stays O(chunks).
    Returns the new main version."""
    src = resolve_ref(table, branch)
    _, target = _state_at(table, src)
    tgt_chunks = _state_at(table, src, expand=False)[1].get("chunks", {})
    for _ in range(max_retries):
        cur = _head(table, "main")
        now = (
            _state_at(table, cur)[1]
            if cur is not None
            else {"data": {}, "deletes": {}, "schema": None}
        )
        now_chunks = (
            _state_at(table, cur, expand=False)[1].get("chunks", {})
            if cur is not None
            else {}
        )
        # branch-only chunk refs pass through verbatim (original seq —
        # MoR scoping replays exactly); their members drop out of the
        # inline adds, and members the branch later removed ride the
        # commit's removed_data so replay filters them
        added_refs = {m: r for m, r in tgt_chunks.items() if m not in now_chunks}
        ref_members = {
            e["path"]
            for r in added_refs.values()
            for e in _load_chunk_entries(table, r)
        }
        commit = {
            "version": (current_version(table) or 0) + 1,
            "parent": cur,
            "operation": "fast_forward",
            "ts": time.time(),
            "from_ref": branch,
            "from_version": src,
            "schema": target["schema"],
            "fields": _fields_of(target),
            "last_field_id": target.get("last_field_id", 0),
            "evolved": bool(target.get("evolved")),
            "added_data": [
                e
                for p, e in target["data"].items()
                if p not in now["data"] and p not in ref_members
            ]
            + list(added_refs.values()),
            "removed_data": sorted(
                [p for p in now["data"] if p not in target["data"]]
                + [p for p in ref_members if p not in target["data"]]
            ),
            "added_deletes": [
                e for p, e in target["deletes"].items() if p not in now["deletes"]
            ],
            "removed_deletes": sorted(
                p for p in now["deletes"] if p not in target["deletes"]
            ),
        }
        gone = sorted(m for m in now_chunks if m not in tgt_chunks)
        if gone:
            commit["removed_manifests"] = gone
        if _try_commit(table, commit):
            return commit["version"]
    raise CommitConflict(
        f"fast_forward of {branch!r} lost the commit race {max_retries} "
        f"times: {table}"
    )


# ---------------------------------------------------------------------------
# snapshot state replay
# ---------------------------------------------------------------------------


def _state_at(
    table: str, version: int | None = None, expand: bool = True
) -> tuple[int, dict]:
    """Replay the ANCESTRY CHAIN of `version` (default: the main branch
    head). Returns (version, state) where state = {"data": {path: entry},
    "deletes": {path: entry}, "schema": [...]}.

    Replay follows `parent` pointers rather than the linear version
    sequence: with branch refs, commits on other branches share the global
    version sequence but are NOT ancestors of main, so a main reader must
    never fold them in. For a branch-free table the parent chain IS the
    linear sequence, so this is exactly the old behavior. The walk stops
    early at any version carrying a rebase base file (the persisted state
    at that version, written by expiry wherever the chain is truncated),
    keeping replay O(retained chain length).

    expand=False keeps chunked commits' manifest refs UNRESOLVED in
    state["chunks"] ({manifest relpath: summary ref}) with any
    chunk-member removals in state["removed"] — the two-level planning
    input (plan_scan). The default expands every chunk into
    state["data"], so all full-table consumers see exactly the one-level
    state they always did."""
    versions = list_versions(table)
    if not versions:
        raise LookupError(f"no commits in table log: {table}")
    if version is None:
        target = _head(table, "main")
        if target is None:
            raise LookupError(f"main branch has no commits: {table}")
    else:
        target = version
        if target not in versions:
            if target < versions[0]:
                raise SnapshotExpired(
                    f"version {version} expired (oldest retained: {versions[0]})"
                )
            raise LookupError(f"unknown version {version} for table {table}")

    retained = set(versions)
    state: dict = {"data": {}, "deletes": {}, "schema": None}
    chain: list[dict] = []
    v: int | None = target
    while v is not None:
        base = _base_path(table, v)
        if os.path.exists(base):
            # the base file IS the state at v (inclusive); replay only the
            # chain commits strictly after it.
            with open(base) as f:
                snap = json.load(f)
            state = {
                "data": {e["path"]: e for e in snap["data"]},
                "deletes": {e["path"]: e for e in snap["deletes"]},
                "schema": snap["schema"],
            }
            for k in ("fields", "last_field_id", "legacy_cols", "evolved"):
                if snap.get(k):
                    state[k] = snap[k]
            break
        if v not in retained:
            raise SnapshotExpired(
                f"commit v{v} on the ancestry chain of v{target} expired: {table}"
            )
        c = _read_commit(table, v)
        chain.append(c)
        v = c.get("parent")

    for c in reversed(chain):
        for e in c.get("added_data", []):
            if "manifest" in e:
                state.setdefault("chunks", {})[e["manifest"]] = e
            else:
                state["data"][e["path"]] = e
        for p in c.get("removed_data", []):
            if state["data"].pop(p, None) is None and state.get("chunks"):
                # the removed file may live inside an unresolved chunk:
                # record it so expansion (or plan_scan) filters it out
                state.setdefault("removed", set()).add(p)
        for m in c.get("removed_manifests", []):
            # a full rewrite retires whole chunk refs so later planning
            # never reopens chunks whose files are all gone
            if state.get("chunks"):
                state["chunks"].pop(m, None)
        for e in c.get("added_deletes", []):
            state["deletes"][e["path"]] = e
        for p in c.get("removed_deletes", []):
            state["deletes"].pop(p, None)
        if c.get("schema"):
            state["schema"] = c["schema"]
        if c.get("fields"):
            state["fields"] = c["fields"]
        if c.get("last_field_id"):
            state["last_field_id"] = c["last_field_id"]
        if c.get("legacy_cols") and not state.get("legacy_cols"):
            state["legacy_cols"] = c["legacy_cols"]
        if c.get("operation") == "evolve_schema" or c.get("evolved"):
            state["evolved"] = True
    if expand and state.get("chunks"):
        removed = state.get("removed", set())
        for ref in state["chunks"].values():
            for e in _load_chunk_entries(table, ref):
                if e["path"] not in removed:
                    state["data"][e["path"]] = e
        state.pop("chunks", None)
        state.pop("removed", None)
    return target, state


def _chain_between(
    table: str, from_version: int, to_version: int | None
) -> tuple[int, list[dict]]:
    """The ancestry-chain commits in (from_version, to_version], oldest
    first (to_version defaults to the main head). Walking parent pointers
    — not the linear version sequence — keeps incremental scans correct
    when branch commits share the version sequence: a main-chain scan
    never folds in another branch's commits. Raises SnapshotExpired if an
    in-range chain commit was expired, LookupError if from_version is not
    an ancestor of to_version (e.g. it belongs to a different branch)."""
    versions = set(list_versions(table))
    if not versions:
        raise LookupError(f"no commits in table log: {table}")
    if to_version is None:
        to_version = _head(table, "main")
        if to_version is None:
            raise LookupError(f"main branch has no commits: {table}")
    out: list[dict] = []
    v: int | None = to_version
    while v is not None and v > from_version:
        if v not in versions:
            raise SnapshotExpired(
                f"chain commit v{v} in ({from_version}, {to_version}] "
                f"expired: {table}"
            )
        c = _read_commit(table, v)
        out.append(c)
        v = c.get("parent")
    if v != from_version and not (v is None and from_version <= 0):
        raise LookupError(
            f"from_version {from_version} is not an ancestor of "
            f"v{to_version}: {table}"
        )
    return to_version, list(reversed(out))


def snapshot_lineage(table: str) -> list[dict]:
    """Per-commit lineage summaries (version, operation, rows/files added
    and removed) — the table-level analog of checkpoint.SliceManifest."""
    out = []
    for v in list_versions(table):
        c = _read_commit(table, v)
        out.append(
            {
                "version": v,
                "operation": c["operation"],
                "branch": c.get("branch", "main"),
                "ts": c.get("ts"),
                "rows_added": sum(e["rows"] for e in c.get("added_data", [])),
                "files_added": _added_file_count(c),
                "files_removed": len(c.get("removed_data", [])),
                "delete_rows_added": sum(
                    e["rows"] for e in c.get("added_deletes", [])
                ),
            }
        )
    return out


# ---------------------------------------------------------------------------
# metadata inspection tables (Iceberg's history / files / refs tables)
# ---------------------------------------------------------------------------
#
# Iceberg exposes table internals as queryable metadata tables
# (`db.tbl.history`, `.files`, `.snapshots`, `.refs`); these are the
# snapshot-log analogs. All three are driver-side LOG scans — cost is
# O(commits) / O(live files) manifest work, never a data-file read — turned
# into DataFrames so operators can join, filter, and aggregate table health
# (small-file counts, delete-file debt, commit cadence) with the same
# relational vocabulary as the data itself.


def table_history(spark: SparkSession, table: str) -> DataFrame:
    """One row per commit on any branch: lineage pointer, operation, and
    added/removed file and row tallies. The DataFrame sibling of
    snapshot_lineage (which returns driver dicts)."""
    rows = []
    for v in list_versions(table):
        c = _read_commit(table, v)
        rows.append(
            (
                v,
                c.get("parent"),
                c["operation"],
                c.get("branch", "main"),
                float(c.get("ts") or 0.0),
                sum(int(e.get("rows", 0)) for e in c.get("added_data", [])),
                _added_file_count(c),
                len(c.get("removed_data", [])),
                len(c.get("added_deletes", [])),
                len(c.get("removed_deletes", [])),
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, parent int, operation string, branch string, "
        "ts double, rows_added bigint, files_added int, files_removed int, "
        "delete_files_added int, delete_files_removed int",
    )


def table_files(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """One row per LIVE file (data and delete) at a snapshot: sequence
    number, manifest row/byte tallies, partition values, footer stats, and
    the delete kind. This is the small-file / delete-debt health view —
    `table_files(...).where("kind = 'data'").groupBy(...).agg(...)` plans
    maintenance (compact_binpack targets, delete-file backlog) without
    opening a single data file."""
    _, state = _state_at(table, version)
    rows = []
    for kind, files in (("data", state["data"]), ("delete", state["deletes"])):
        for p, e in sorted(files.items()):
            rows.append(
                (
                    p,
                    kind,
                    int(e["seq"]),
                    int(e.get("rows", 0)),
                    int(e.get("bytes", 0)),
                    json.dumps(e.get("partition") or {}, sort_keys=True),
                    json.dumps(e.get("stats") or {}, sort_keys=True, default=str),
                    bool(e.get("positional")),
                )
            )
    return spark.createDataFrame(
        rows,
        "path string, kind string, seq int, rows bigint, bytes bigint, "
        "partition string, stats string, positional boolean",
    )


def table_partitions(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """One row per partition tuple of the LIVE data files at a snapshot
    (Iceberg's `partitions` metadata table): file count, manifest row and
    byte totals, and the sequence-number range — per-sink/per-day size
    skew and compaction debt read straight off the manifests, no data file
    opened. Unpartitioned files aggregate under the empty partition `{}`;
    partition keys are the file's WRITE-TIME spec names (per-file specs =
    partition evolution, so two generations show as distinct tuples)."""
    _, state = _state_at(table, version)
    agg: dict[str, list] = {}
    for _p, e in sorted(state["data"].items()):
        key = json.dumps(e.get("partition") or {}, sort_keys=True)
        s = agg.setdefault(key, [0, 0, 0, None, None])
        s[0] += 1
        s[1] += int(e.get("rows", 0))
        s[2] += int(e.get("bytes", 0))
        seq = int(e["seq"])
        s[3] = seq if s[3] is None else min(s[3], seq)
        s[4] = seq if s[4] is None else max(s[4], seq)
    rows = [
        (k, v[0], v[1], v[2], v[3], v[4]) for k, v in sorted(agg.items())
    ]
    return spark.createDataFrame(
        rows,
        "partition string, n_files int, rows bigint, bytes bigint, "
        "min_seq int, max_seq int",
    )


def table_refs(spark: SparkSession, table: str) -> DataFrame:
    """One row per named ref plus main: kind (branch/tag) and the snapshot
    version it points at — Iceberg's `refs` metadata table."""
    rows = [("main", "branch", _head(table, "main"))]
    for name, ref in sorted(list_refs(table).items()):
        # a branch row shows its HEAD (derived from the log), not its
        # creation point; a tag row shows its pinned snapshot
        rows.append((name, ref["type"], resolve_ref(table, name)))
    return spark.createDataFrame(rows, "name string, kind string, version int")


# ---------------------------------------------------------------------------
# write path
# ---------------------------------------------------------------------------


def _check_schema(
    existing: list[list[str]] | None, new: list[list[str]], allow_evolution: bool
) -> list[list[str]]:
    if existing is None:
        return new
    old = dict(map(tuple, existing))
    for name, typ in new:
        if name in old and old[name] != typ:
            raise ValueError(f"schema mismatch on column {name}: {old[name]} vs {typ}")
    new_names = {n for n, _ in new}
    added = [n for n, _ in new if n not in old]
    missing = [n for n in old if n not in new_names]
    if (added or missing) and not allow_evolution:
        raise ValueError(
            f"schema change requires allow_evolution=True (added={added}, "
            f"missing={missing})"
        )
    merged = [list(kv) for kv in existing]
    merged += [[n, t] for n, t in new if n not in old]
    return merged


def _write_data_files(
    df: DataFrame,
    table: str,
    version: int,
    stats_cols: tuple[str, ...],
    kind: str,
    partition_by: tuple[str, ...] = (),
    spec_fields: list[dict] | None = None,
    bloom_cols: tuple[str, ...] = (),
    ndv_cols: tuple[str, ...] = (),
) -> list[dict]:
    outdir = os.path.join(table, kind, f"c{version:06d}-{uuid.uuid4().hex[:8]}")
    if partition_by and spec_fields:
        raise ValueError("pass partition_by OR partition_spec, not both")
    if spec_fields:
        # hidden partitioning: the partition columns are TRANSFORMS of
        # source columns, written as duplicate `_p_` columns so data files
        # keep only real columns; values live in the manifest + path.
        dtypes = dict(df.dtypes)
        out = df
        for f in spec_fields:
            out = out.withColumn(
                f"_p_{f['name']}", _transform_expr(f, dtypes[f["source"]])
            )
        out.write.mode("error").partitionBy(
            *[f"_p_{f['name']}" for f in spec_fields]
        ).parquet(outdir)
    elif partition_by:
        # partition on DUPLICATE `_p_` columns so the data files keep the
        # real columns; the partition values live in the manifest (and the
        # path), exactly where Iceberg keeps them.
        out = df
        for k in partition_by:
            out = out.withColumn(f"_p_{k}", F.col(k))
        out.write.mode("error").partitionBy(
            *[f"_p_{k}" for k in partition_by]
        ).parquet(outdir)
    else:
        df.write.mode("error").parquet(outdir)
    entries = _file_entries(
        outdir, stats_cols, seq=version, bloom_cols=bloom_cols, ndv_cols=ndv_cols
    )
    if spec_fields:
        # every file records the spec it was written under — partition
        # evolution is per-file, exactly Iceberg's manifest spec_id.
        for e in entries:
            e["spec"] = spec_fields
    return entries


def append(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    stats_cols: tuple[str, ...] = (),
    allow_evolution: bool = False,
    max_retries: int = 5,
    partition_by: tuple[str, ...] = (),
    marker: str | None = None,
    partition_spec: tuple[str, ...] = (),
    branch: str = "main",
    bloom_cols: tuple[str, ...] = (),
    ndv_cols: tuple[str, ...] = (),
    manifest_chunk_files: int | None = None,
) -> int:
    """Append df as a new snapshot; returns the committed version. Appends
    conflict with nothing (they only add files), so a lost commit race is
    retried against the refreshed log — Iceberg's fast-append semantics.
    `partition_by` writes hive-partitioned files whose partition values are
    recorded per file in the manifest (read back via read_partition).
    `partition_spec` is the hidden-partitioning alternative — transform
    fields like ("days(ts)", "bucket(8, conv_id)") pruned via scan_where.
    `marker` stamps the commit for idempotent resume (append_idempotent).
    `bloom_cols` records a per-file BLOOM_M-bit membership filter per named
    column in the manifest (Iceberg's parquet/puffin bloom analog): point
    ('=') predicates in prune_files_where then skip files with certainty of
    absence even when every file's min/max RANGE overlaps — the skipping
    lever for high-cardinality scattered keys, where clustering is not
    worth a rewrite or another column already owns the sort order.
    `branch` commits onto a named branch (create_branch) instead of main:
    the commit takes the global next version number but chains off the
    BRANCH head, so main readers never see it until fast_forward.
    Commits adding more than `manifest_chunk_files` files (default
    MANIFEST_CHUNK_FILES) record two-level manifests: file entries go to
    chunk files and the commit inlines only per-chunk summaries, so
    planning (plan_scan/scan_where) skips whole chunks by summary."""
    if branch != "main":
        _head(table, branch)  # validates the ref exists and is a branch
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(
        df,
        table,
        version,
        stats_cols,
        "data",
        partition_by,
        parse_partition_spec(partition_spec) if partition_spec else None,
        bloom_cols,
        ndv_cols,
    )
    entries = _maybe_chunk(table, entries, manifest_chunk_files)
    schema_new = _schema_of(df)
    for _ in range(max_retries):
        parent = _head(table, branch)
        version_try = (current_version(table) or 0) + 1
        pstate = _state_at(table, parent)[1] if parent is not None else None
        existing = pstate["schema"] if pstate is not None else None
        merged = _check_schema(existing, schema_new, allow_evolution)
        fields, last_id = _fields_after_write(pstate, merged)
        for e in entries:
            e["seq"] = version_try
        commit = {
            "version": version_try,
            "parent": parent,
            "operation": "append",
            "ts": time.time(),
            "schema": merged,
            "fields": fields,
            "last_field_id": last_id,
            "added_data": _stamp_cols(entries, fields),
        }
        if branch != "main":
            commit["branch"] = branch
        if marker is not None:
            commit["marker"] = marker
        if _try_commit(table, commit):
            return version_try
    raise CommitConflict(f"append lost the commit race {max_retries} times: {table}")


def add_files(
    spark: SparkSession,
    table: str,
    source_dir: str,
    stats_cols: tuple[str, ...] = (),
    allow_evolution: bool = False,
    max_retries: int = 5,
) -> int:
    """Import every parquet file under `source_dir` into the table BY
    REFERENCE — Iceberg's `add_files` migration procedure: manifest entries
    (row counts, byte sizes, min/max footer stats, hive partition values
    parsed from the path) are built from parquet FOOTERS only, no data is
    read or rewritten, and ONE append commit makes the whole import atomic.
    The files' schema is checked against the table schema first (same
    enforcement/evolution rule as append). A hive-layout source whose
    partition values exist ONLY in directory names is refused — the
    snapshot-log reads files individually, so path-only columns would
    silently read back as null. Imported files become TABLE-OWNED:
    snapshot expiry deletes them once no retained snapshot references
    them, exactly as Iceberg warns for add_files. No reference analog
    (the Go CLI rereads raw files per run, sample/main.go:32-47)."""
    probe = _file_entries(os.path.abspath(source_dir), (), 0)
    if not probe:
        raise LookupError(f"no parquet files under {source_dir}")
    schema_new = _schema_of(spark.read.parquet(probe[0]["path"]))
    inferred = _schema_of(spark.read.parquet(source_dir))
    path_only = [n for n, _t in inferred if n not in {c for c, _ in schema_new}]
    if path_only:
        raise ValueError(
            f"source {source_dir} is hive-partitioned on path-only "
            f"column(s) {path_only}; their values are not in the data "
            "files and would read back null — rewrite the source (or "
            "append it through a DataFrame) instead of importing by "
            "reference"
        )
    entries = _file_entries(os.path.abspath(source_dir), stats_cols, 0)
    entries = _maybe_chunk(table, entries, None)
    for _ in range(max_retries):
        parent = _head(table, "main")
        version = (current_version(table) or 0) + 1
        pstate = _state_at(table, parent)[1] if parent is not None else None
        existing = pstate["schema"] if pstate is not None else None
        merged = _check_schema(existing, schema_new, allow_evolution)
        fields, last_id = _fields_after_write(pstate, merged)
        for e in entries:
            e["seq"] = version
        commit = {
            "version": version,
            "parent": parent,
            "operation": "append",
            "ts": time.time(),
            "schema": merged,
            "fields": fields,
            "last_field_id": last_id,
            "added_data": _stamp_cols(entries, fields),
        }
        if _try_commit(table, commit):
            return version
    raise CommitConflict(
        f"add_files lost the commit race {max_retries} times: {table}"
    )


def committed_markers(table: str) -> set[str]:
    """Markers of every retained commit — the resume ledger."""
    out = set()
    for v in list_versions(table):
        m = _read_commit(table, v).get("marker")
        if m is not None:
            out.add(m)
    return out


def append_idempotent(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    marker: str,
    **kwargs,
) -> tuple[int | None, bool]:
    """Exactly-once append under restarts: if a retained commit already
    carries `marker`, the append is skipped (returns (version_of_that
    _commit, False)); otherwise the data is committed with the marker and
    (new_version, True) is returned. The marker plays the role of
    checkpoint.SliceManifest for sink writes — a restarted job re-submits
    every slice and the ledger makes re-submission a no-op. Uniqueness of
    in-flight markers is the scheduler's contract (run_sliced runs each
    slice once); the ledger protects RESTARTS, not two concurrent writers
    racing the same marker."""
    for v in list_versions(table):
        if _read_commit(table, v).get("marker") == marker:
            return v, False
    return append(spark, table, df, marker=marker, **kwargs), True


def _staged_path(table: str, stage_id: str) -> str:
    return os.path.join(_log_dir(table), f"staged-{stage_id}.json")


def staged_ids(table: str) -> list[str]:
    try:
        names = os.listdir(_log_dir(table))
    except OSError:
        return []
    return sorted(
        n[len("staged-") : -len(".json")]
        for n in names
        if n.startswith("staged-") and n.endswith(".json")
    )


def stage_append(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    stats_cols: tuple[str, ...] = (),
    partition_by: tuple[str, ...] = (),
    partition_spec: tuple[str, ...] = (),
) -> str:
    """Write-audit-publish, stage step (Iceberg's WAP pattern): the data
    files are written and described by a STAGED manifest that lives
    outside the version sequence — INVISIBLE to every reader and to time
    travel. An audit job reads them back (read_staged), runs its quality
    gates, then either publish_staged turns the manifest into a real
    atomic append commit or discard_staged removes the files. Bad data
    never has a snapshot pointing at it. Returns the stage id."""
    stage_id = uuid.uuid4().hex[:12]
    entries = _write_data_files(
        df,
        table,
        0,
        stats_cols,
        "data",
        partition_by,
        parse_partition_spec(partition_spec) if partition_spec else None,
    )
    os.makedirs(_log_dir(table), exist_ok=True)
    staged = {
        "stage_id": stage_id,
        "ts": time.time(),
        "schema": _schema_of(df),
        "added_data": entries,
    }
    tmp = os.path.join(_log_dir(table), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(staged, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _staged_path(table, stage_id))
    return stage_id


def _read_staged(table: str, stage_id: str) -> dict:
    path = _staged_path(table, stage_id)
    if not os.path.exists(path):
        raise LookupError(f"unknown or already-resolved stage {stage_id}: {table}")
    with open(path) as f:
        return json.load(f)


def read_staged(spark: SparkSession, table: str, stage_id: str) -> DataFrame:
    """The audit surface: exactly the staged files, nothing else."""
    staged = _read_staged(table, stage_id)
    paths = [e["path"] for e in staged["added_data"]]
    if not paths:
        return _empty_df(spark, staged["schema"])
    return _read_files(spark, paths)


def publish_staged(
    table: str,
    stage_id: str,
    allow_evolution: bool = False,
    max_retries: int = 5,
) -> int:
    """Publish a staged append as a real commit — atomic, no data rewrite
    (the files are already in place; only their sequence number is stamped
    with the publish version, so MoR delete scoping counts from PUBLISH
    time, when the rows became visible). Schema is checked against the
    table at publish time, not stage time."""
    staged = _read_staged(table, stage_id)
    for _ in range(max_retries):
        cur = _head(table, "main")
        version = (current_version(table) or 0) + 1
        pstate = _state_at(table, cur)[1] if cur else None
        existing = pstate["schema"] if pstate is not None else None
        merged = _check_schema(existing, staged["schema"], allow_evolution)
        fields, last_id = _fields_after_write(pstate, merged)
        entries = [dict(e, seq=version) for e in staged["added_data"]]
        commit = {
            "version": version,
            "parent": cur,
            "operation": "append",
            "ts": time.time(),
            "schema": merged,
            "fields": fields,
            "last_field_id": last_id,
            "added_data": _stamp_cols(entries, fields),
            "stage_id": stage_id,
        }
        if _try_commit(table, commit):
            os.unlink(_staged_path(table, stage_id))
            return version
    raise CommitConflict(
        f"publish of stage {stage_id} lost the commit race {max_retries} "
        f"times: {table}"
    )


def discard_staged(table: str, stage_id: str) -> int:
    """Audit failed: remove the staged files and manifest. Returns the
    number of data files removed. Readers never saw anything."""
    staged = _read_staged(table, stage_id)
    removed = 0
    for e in staged["added_data"]:
        if os.path.exists(e["path"]):
            os.unlink(e["path"])
            removed += 1
    os.unlink(_staged_path(table, stage_id))
    return removed


def delete_where(
    spark: SparkSession, table: str, condition, key_cols: list[str]
) -> int:
    """Equality delete: materialize the DISTINCT key tuples matching
    `condition` into a small delete file and commit it — no data file is
    rewritten. Readers anti-join; compaction folds it away. The delete's
    sequence number scopes it to data files committed strictly before it."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot delete from empty table {table}")
    keys = (
        read_snapshot(spark, table)
        .filter(condition)
        .select(*key_cols)
        .distinct()
    )
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(keys, table, version, (), "deletes")
    for e in entries:
        e["key_cols"] = key_cols
    _stamp_cols(entries, _fields_of(_state_at(table, cur)[1]))
    commit = {
        "version": version,
        "parent": cur,
        "operation": "delete",
        "ts": time.time(),
        "added_deletes": entries,
    }
    if not _try_commit(table, commit):
        raise CommitConflict(f"delete conflicted at version {version}: {table}")
    return version


def _read_live_identity(spark: SparkSession, state: dict) -> DataFrame:
    """The LIVE rows of a state with their (_file, _pos) row identity —
    the input every position-delete writer works from."""
    df = _with_file(
        _read_projected(
            spark, list(state["data"].values()), state, with_pos=True
        )
    )
    return _apply_deletes(spark, df, state, keep_identity=True)


def _commit_position_deletes(
    spark: SparkSession, table: str, cur: int, keys: DataFrame
) -> int:
    """Write a position-delete file from (_file, _pos) rows and commit it."""
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(
        keys.select("_file", "_pos").distinct(), table, version, (), "deletes"
    )
    for e in entries:
        e["key_cols"] = ["_file", "_pos"]
        e["positional"] = True
    commit = {
        "version": version,
        "parent": cur,
        "operation": "delete",
        "ts": time.time(),
        "added_deletes": entries,
    }
    if not _try_commit(table, commit):
        raise CommitConflict(
            f"position delete conflicted at version {version}: {table}"
        )
    return version


def delete_where_positions(spark: SparkSession, table: str, condition) -> int:
    """Position delete (Iceberg v2 position-delete files): materialize the
    (file, pos) row identity of every LIVE row matching `condition` into a
    small delete file and commit it — no key columns required and no data
    file rewritten. The row ordinal comes from the parquet scan's
    `_metadata.row_index`, the Spark-native analog of Iceberg's file
    position. Position deletes are schema-agnostic (they reference the
    file, not any column), so schema evolution before or after never
    invalidates them, and they compose with equality deletes in the same
    merge-on-read pass. No reference analog (the Go CLI has no storage
    layer, sample/main.go:32-47)."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot delete from empty table {table}")
    _, state = _state_at(table, cur)
    keys = _read_live_identity(spark, state).filter(condition)
    return _commit_position_deletes(spark, table, cur, keys)


def dedup_keep_first(
    spark: SparkSession,
    table: str,
    key_cols: list[str],
    order_cols: list[str] | None = None,
) -> int:
    """Exact dedup WITHOUT rewriting data: keep exactly one row per key
    (the first by `order_cols`, defaulting to the stable (_file, _pos)
    scan order) and commit a position delete for every other copy. This is
    the row-level operation equality deletes fundamentally cannot express
    — identical rows agree on every column, so any key-based delete kills
    the survivor too; only the positional identity separates copies. The
    window is partitioned by the dedup key (bounded per-key state, no
    global sort), and only the redundant rows' (file, pos) pairs are
    written — output is duplicate-sized, not table-sized."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot dedup empty table {table}")
    _, state = _state_at(table, cur)
    live = _read_live_identity(spark, state)
    order = [F.col(c) for c in (order_cols or [])] + [
        F.col("_file"),
        F.col("_pos"),
    ]
    rn = F.row_number().over(
        Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    )
    dupes = live.withColumn("_rn", rn).filter(F.col("_rn") > 1)
    return _commit_position_deletes(spark, table, cur, dupes)


def overwrite(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    stats_cols: tuple[str, ...] = (),
) -> int:
    """Replace the table's full contents atomically (removes every live
    data and delete file, adds the new files) — readers of older snapshots
    are untouched until expiry."""
    cur = _head(table, "main")
    _, state = _state_at(table, cur) if cur else (0, {"data": {}, "deletes": {}})
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(df, table, version, stats_cols, "data")
    fields, last_id = _fields_after_write(state if cur else None, _schema_of(df))
    commit = {
        "version": version,
        "parent": cur,
        "operation": "overwrite",
        "ts": time.time(),
        "schema": _schema_of(df),
        "fields": fields,
        "last_field_id": last_id,
        "added_data": _stamp_cols(entries, fields),
        "removed_data": sorted(state["data"]),
        "removed_deletes": sorted(state["deletes"]),
    }
    if not _try_commit(table, commit):
        raise CommitConflict(f"overwrite conflicted at version {version}: {table}")
    return version


def update_where(
    spark: SparkSession,
    table: str,
    condition,
    assignments: dict[str, Column],
    stats_cols: tuple[str, ...] = (),
) -> int:
    """Copy-on-write row-level UPDATE (Iceberg's eager update mode): only
    the files that CONTAIN a matching live row are rewritten — matching
    rows get `assignments` applied, their non-matching neighbors are
    carried over verbatim (with any pending deletes folded in), and every
    untouched file stays byte-identical in the new snapshot. ONE atomic
    commit swaps the rewritten files in, so readers see all-or-nothing and
    older snapshots time-travel unchanged. Cost scales with the matched
    FILES, not the table — pair the predicate with stats_cols/partitioning
    at write time so the match set is narrow. Rewritten files are written
    unpartitioned (their manifest partition metadata is dropped, so pruned
    reads keep-not-prune them — correct, just unpruned until the next
    compact). No reference analog (the Go CLI has no storage layer,
    sample/main.go:32-47)."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot update empty table {table}")
    _, state = _state_at(table, cur)
    bad = set(assignments) - {n for _i, n, _t in _fields_of(state)}
    if bad:
        raise ValueError(f"assignment to unknown column(s): {sorted(bad)}")
    live = _read_live_identity(spark, state)
    hit_files = [
        r._file for r in live.filter(condition).select("_file").distinct().collect()
    ]
    version = (current_version(table) or 0) + 1
    if not hit_files:
        commit = {
            "version": version,
            "parent": cur,
            "operation": "update",
            "ts": time.time(),
        }
        if not _try_commit(table, commit):
            raise CommitConflict(f"update conflicted at version {version}: {table}")
        return version
    rewrite = live.filter(F.col("_file").isin(hit_files))
    for col, expr in assignments.items():
        rewrite = rewrite.withColumn(
            col, F.when(condition, expr).otherwise(F.col(col))
        )
    types = {n: t for _i, n, t in _fields_of(state)}
    rewrite = rewrite.select(
        *[F.col(n).cast(types[n]).alias(n) for n in types]
    )
    entries = _write_data_files(rewrite, table, version, stats_cols, "data")
    commit = {
        "version": version,
        "parent": cur,
        "operation": "update",
        "ts": time.time(),
        "added_data": _stamp_cols(entries, _fields_of(state)),
        # the live _file identity is the abspath; map back to manifest keys
        "removed_data": sorted(
            p
            for p in state["data"]
            if os.path.abspath(p) in set(hit_files)
        ),
    }
    if not _try_commit(table, commit):
        raise CommitConflict(f"update conflicted at version {version}: {table}")
    return version


def merge_upsert(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key_cols: list[str],
    stats_cols: tuple[str, ...] = (),
    partition_by: tuple[str, ...] = (),
    partition_spec: tuple[str, ...] = (),
) -> int:
    """Atomic MERGE (upsert): ONE commit carries both an equality-delete
    file over the source's key tuples and the source data files. The
    delete's sequence number equals the commit version, so it scopes to
    data files committed strictly BEFORE the merge (the Iceberg v2
    sequence rule _apply_deletes enforces) and the merge's own rows
    survive it — matched keys are replaced merge-on-read, unmatched keys
    insert, and a reader sees the whole upsert or none of it. This is
    Iceberg's MERGE INTO with merge-on-read row-level deletes; no data
    file is rewritten."""
    cur = _head(table, "main")
    version = (current_version(table) or 0) + 1
    pstate = _state_at(table, cur)[1] if cur else None
    existing = pstate["schema"] if pstate is not None else None
    entries = _write_data_files(
        df,
        table,
        version,
        stats_cols,
        "data",
        partition_by,
        parse_partition_spec(partition_spec) if partition_spec else None,
    )
    merged = _check_schema(existing, _schema_of(df), False)
    fields, last_id = _fields_after_write(pstate, merged)
    commit = {
        "version": version,
        "parent": cur,
        "operation": "merge",
        "ts": time.time(),
        "schema": merged,
        "fields": fields,
        "last_field_id": last_id,
        "added_data": _stamp_cols(entries, fields),
    }
    if cur is not None:
        keys = df.select(*key_cols).distinct()
        del_entries = _write_data_files(keys, table, version, (), "deletes")
        for e in del_entries:
            e["key_cols"] = list(key_cols)
        commit["added_deletes"] = _stamp_cols(del_entries, fields)
    if not _try_commit(table, commit):
        raise CommitConflict(f"merge conflicted at version {version}: {table}")
    return version


def rollback_to(table: str, version: int) -> int:
    """Roll the table back to an earlier snapshot as a NEW commit —
    history is preserved (Iceberg's rollback semantics): the commit
    re-points the live data/delete file sets at the target version's, so
    the bad versions remain time-travelable until expiry and the rollback
    itself is one atomic log write. Re-added entries keep their ORIGINAL
    sequence numbers, so merge-on-read delete scoping replays exactly as
    it did at the target version."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot roll back empty table {table}")
    _, target = _state_at(table, version)
    _, now = _state_at(table, cur)
    commit = {
        "version": (current_version(table) or 0) + 1,
        "parent": cur,
        "operation": "rollback",
        "ts": time.time(),
        "restores": version,
        "schema": target["schema"],
        "fields": _fields_of(target),
        "last_field_id": target.get("last_field_id", 0),
        "evolved": bool(target.get("evolved")),
        "added_data": [e for p, e in target["data"].items() if p not in now["data"]],
        "removed_data": sorted(p for p in now["data"] if p not in target["data"]),
        "added_deletes": [
            e for p, e in target["deletes"].items() if p not in now["deletes"]
        ],
        "removed_deletes": sorted(
            p for p in now["deletes"] if p not in target["deletes"]
        ),
    }
    if not _try_commit(table, commit):
        raise CommitConflict(
            f"rollback conflicted at version {commit['version']}: {table}"
        )
    return commit["version"]


def _sketch_cols_of(state: dict) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(bloom_cols, ndv_cols) present in the live pre-rewrite manifest
    entries, write-time names resolved through field ids to current names
    — a maintenance rewrite must carry the table's membership filters and
    NDV sketches forward by default, not silently drop them."""
    byid = {i: n for i, n, _t in _fields_of(state)}
    out: dict[str, set] = {"bloom": set(), "ndv": set()}
    for e in state["data"].values():
        ids = e.get("cols") or {}
        for kind, dest in out.items():
            for c in e.get(kind, {}):
                dest.add(byid.get(ids[c], c) if c in ids else c)
    return tuple(sorted(out["bloom"])), tuple(sorted(out["ndv"]))


def compact(
    spark: SparkSession,
    table: str,
    n_files: int = 1,
    stats_cols: tuple[str, ...] = (),
    bloom_cols: tuple[str, ...] | None = None,
    ndv_cols: tuple[str, ...] | None = None,
) -> int:
    """Rewrite the live row set (deletes applied) into n_files fresh files
    and retire the old data + delete files in one atomic commit. Logical
    rows are unchanged — incremental_append_scan skips compact commits.
    bloom_cols/ndv_cols default to the columns sketched in the
    pre-rewrite manifest entries, so a maintenance rewrite preserves the
    table's filters unless the caller explicitly overrides (pass () to
    drop them)."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot compact empty table {table}")
    _, state = _state_at(table, cur)
    prev_bloom, prev_ndv = _sketch_cols_of(state)
    df = read_snapshot(spark, table).coalesce(n_files)
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(
        df,
        table,
        version,
        stats_cols,
        "data",
        bloom_cols=prev_bloom if bloom_cols is None else bloom_cols,
        ndv_cols=prev_ndv if ndv_cols is None else ndv_cols,
    )
    commit = {
        "version": version,
        "parent": cur,
        "operation": "compact",
        "ts": time.time(),
        "schema": state["schema"],
        "added_data": _stamp_cols(entries, _fields_of(state)),
        "removed_data": sorted(state["data"]),
        "removed_deletes": sorted(state["deletes"]),
    }
    chunks = _state_at(table, cur, expand=False)[1].get("chunks", {})
    if chunks:
        commit["removed_manifests"] = sorted(chunks)
    if not _try_commit(table, commit):
        raise CommitConflict(f"compact conflicted at version {version}: {table}")
    return version


def compact_binpack(
    spark: SparkSession,
    table: str,
    target_bytes: int = 128 * 1024 * 1024,
    stats_cols: tuple[str, ...] = (),
    bloom_cols: tuple[str, ...] | None = None,
    ndv_cols: tuple[str, ...] | None = None,
) -> int | None:
    """Iceberg's binpack rewrite strategy: ONLY data files below
    target_bytes are rewritten (pending deletes applied) into ~target-
    sized packed files; files already at size are untouched — the rewrite
    cost is bounded by the small-file backlog, never the table size. This
    is the maintenance loop a streaming sink needs: each micro-batch
    commit lands one file per touched sink, and the backlog is folded
    periodically without rewriting the accumulated history. Delete files
    are RETAINED (they still scope to the untouched older files); the
    packed files' sequence number exceeds every prior delete's, so
    rewritten rows are not re-deleted. Returns the committed version, or
    None when fewer than two small files exist (nothing to pack).
    bloom_cols/ndv_cols default to the columns sketched in the rewritten
    (small) files' manifest entries — the fold preserves the table's
    filters; pass () explicitly to drop them."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot compact empty table {table}")
    _, state = _state_at(table, cur)
    small = {
        p: e for p, e in state["data"].items() if e["bytes"] < target_bytes
    }
    if len(small) < 2:
        return None
    total = sum(e["bytes"] for e in small.values())
    n_files = max(1, -(-total // target_bytes))
    small_state = dict(state, data=small)
    df = _apply_deletes(
        spark,
        _read_projected(spark, list(small.values()), small_state),
        small_state,
    ).coalesce(n_files)
    prev_bloom, prev_ndv = _sketch_cols_of(dict(state, data=small))
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(
        df,
        table,
        version,
        stats_cols,
        "data",
        bloom_cols=prev_bloom if bloom_cols is None else bloom_cols,
        ndv_cols=prev_ndv if ndv_cols is None else ndv_cols,
    )
    commit = {
        "version": version,
        "parent": cur,
        "operation": "compact",
        "ts": time.time(),
        "schema": state["schema"],
        "added_data": _stamp_cols(entries, _fields_of(state)),
        "removed_data": sorted(small),
    }
    if not _try_commit(table, commit):
        raise CommitConflict(f"binpack conflicted at version {version}: {table}")
    return version


def compact_sort(
    spark: SparkSession,
    table: str,
    sort_cols: tuple[str, ...],
    n_files: int = 4,
    stats_cols: tuple[str, ...] | None = None,
    zorder: bool = False,
    bloom_cols: tuple[str, ...] | None = None,
    ndv_cols: tuple[str, ...] | None = None,
) -> int:
    """Iceberg's sort / z-order rewrite strategy (`rewrite_data_files
    strategy => 'sort'` resp. `sort_order => zorder(a, b)`): rewrite ALL
    live rows — pending deletes applied — clustered on `sort_cols`, so
    every new data file covers a compact key range and its manifest
    min/max stats become (near-)disjoint: prune_files_where afterwards
    answers a point or range predicate on the cluster key by opening ~1
    file instead of every file. Unlike binpack (small-file fold, cost
    bounded by the backlog) this is a FULL rewrite, cost O(table): run it
    when cluster-key read patterns justify it, not on a schedule.

    sort (default): repartitionByRange(n_files, sort_cols) +
    sortWithinPartitions — range boundaries come from Spark's sampler, so
    file CUTS may vary between runs; the committed contents and every
    subsequent scan are exact regardless (only pruning granularity
    wiggles). zorder=True takes exactly two non-negative int columns,
    Morton-interleaves them (operators/storage.zorder_key) and range-
    clusters the interleaved key: each file is then a compact box in BOTH
    dimensions, so min/max stats on the two RAW columns are tight
    simultaneously — a 2-D box predicate prunes most files, where a
    single-column sort only prunes on its leading column. Inputs must fit
    in 16 bits each (pre-bucketize skewed/wide keys).

    Every old data file is removed, so every delete file's scope is
    consumed by the rewrite — they are removed in the SAME commit (an
    equality delete's semantic seq scope is moot once nothing it can
    reference stays live). The commit reuses operation "compact":
    changelog and incremental scans skip it as a row-level no-op.
    bloom_cols/ndv_cols default to the columns sketched in the
    pre-rewrite manifest entries (filters carried forward); pass ()
    explicitly to drop them."""
    cur = _head(table, "main")
    if cur is None:
        raise LookupError(f"cannot rewrite empty table {table}")
    _, state = _state_at(table, cur)
    if not state["data"]:
        raise LookupError(f"no live data files to rewrite: {table}")
    df = _apply_deletes(
        spark,
        _read_projected(spark, list(state["data"].values()), state),
        state,
    )
    if zorder:
        if len(sort_cols) != 2:
            raise ValueError("zorder takes exactly two sort columns")
        from blogparser_spark.operators.storage import zorder_key

        a, b = sort_cols
        # range-partition directly on the interleaved key: contiguous z
        # ranges per file with no bucket hashing (a hash repartition can
        # collide two z buckets into one task and widen that file's box)
        df = (
            df.withColumn("_z", zorder_key(F.col(a), F.col(b)))
            .repartitionByRange(n_files, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    else:
        df = df.repartitionByRange(
            n_files, *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    prev_bloom, prev_ndv = _sketch_cols_of(state)
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(
        df,
        table,
        version,
        tuple(stats_cols or sort_cols),
        "data",
        bloom_cols=prev_bloom if bloom_cols is None else bloom_cols,
        ndv_cols=prev_ndv if ndv_cols is None else ndv_cols,
    )
    commit = {
        "version": version,
        "parent": cur,
        "operation": "compact",
        "ts": time.time(),
        "schema": state["schema"],
        "added_data": _stamp_cols(entries, _fields_of(state)),
        "removed_data": sorted(state["data"]),
        "removed_deletes": sorted(state["deletes"]),
    }
    chunks = _state_at(table, cur, expand=False)[1].get("chunks", {})
    if chunks:
        commit["removed_manifests"] = sorted(chunks)
    if not _try_commit(table, commit):
        raise CommitConflict(f"sort rewrite conflicted at v{version}: {table}")
    return version


def rewrite_position_deletes(spark: SparkSession, table: str) -> int | None:
    """Compact the position-delete backlog (Iceberg's
    rewrite_position_delete_files procedure): every live positional delete
    file is folded into ONE delete file — dangling identities whose data
    file is no longer live are dropped — committed atomically with the old
    delete files removed. Merging to seq = max(originals) is PROVABLY
    safe: a position delete only references (file, pos) of files live at
    its own commit, all with seq <= its seq, so raising the seq extends
    applicability only to files the delete cannot reference. (Equality
    deletes are NEVER merged this way — their seq scope is semantic.)
    Returns the commit version, or None with no positional backlog. The
    commit is a row-level no-op: changelog and incremental scans skip it
    like compact."""
    cur = _head(table, "main")
    if cur is None:
        return None
    _, state = _state_at(table, cur)
    pos = [e for e in state["deletes"].values() if e.get("positional")]
    if len(pos) < 1:
        return None
    live = spark.createDataFrame(
        [(os.path.abspath(p),) for p in state["data"]], "_file string"
    )
    keys = (
        _read_files(spark, [e["path"] for e in pos])
        .distinct()
        .join(F.broadcast(live), "_file", "semi")  # drop dangling identities
        .coalesce(1)
    )
    version = (current_version(table) or 0) + 1
    entries = _write_data_files(keys, table, version, (), "deletes")
    for e in entries:
        e["key_cols"] = ["_file", "_pos"]
        e["positional"] = True
        e["seq"] = max(int(p["seq"]) for p in pos)
    commit = {
        "version": version,
        "parent": cur,
        "operation": "rewrite_deletes",
        "ts": time.time(),
        "added_deletes": entries,
        "removed_deletes": sorted(e["path"] for e in pos),
    }
    if not _try_commit(table, commit):
        raise CommitConflict(
            f"rewrite_position_deletes conflicted at version {version}: {table}"
        )
    return version


def clustering_depth(table: str, col: str) -> dict:
    """Manifests-only clustering health on `col` (the metric behind
    Delta's OPTIMIZE clustering decision): for each live data file, how
    many live files' [min,max] ranges overlap its own — 1.0 means
    disjoint ranges (a point predicate opens one file), n_files means
    fully scattered (stats prune nothing). Computed with two sorted
    arrays and binary searches per file (depth_i = n − #files entirely
    below − #files entirely above), O(n log n) in the live file count —
    driver-side metadata, no data read. Files without recorded stats on
    `col` are excluded (and reported)."""
    import bisect

    _, state = _state_at(table)
    ranges = [
        tuple(e["stats"][col])
        for e in state["data"].values()
        if col in e.get("stats", {})
    ]
    n = len(ranges)
    n_unstated = len(state["data"]) - n
    if n == 0:
        return {
            "n_files": 0,
            "n_unstated": n_unstated,
            "avg_depth": 0.0,
            "max_depth": 0,
        }
    try:
        los = sorted(lo for lo, _hi in ranges)
        his = sorted(hi for _lo, hi in ranges)
    except TypeError:
        # cross-type stats (schema type changed mid-history): report the
        # conservative worst case rather than crash the health check
        return {
            "n_files": n,
            "n_unstated": n_unstated,
            "avg_depth": float(n),
            "max_depth": n,
        }
    depths = []
    for lo, hi in ranges:
        below = bisect.bisect_left(his, lo)   # hi2 < lo: entirely below
        above = n - bisect.bisect_right(los, hi)  # lo2 > hi: entirely above
        depths.append(n - below - above)
    return {
        "n_files": n,
        "n_unstated": n_unstated,
        "avg_depth": round(sum(depths) / n, 3),
        "max_depth": max(depths),
    }


def maintenance_plan(
    spark: SparkSession,
    table: str,
    small_file_bytes: int = 32 << 20,
    small_file_backlog: int = 4,
    pos_delete_backlog: int = 2,
    eq_delete_backlog: int = 4,
    keep_versions: int = 16,
    cluster_col: str | None = None,
    max_avg_depth: float = 2.0,
) -> DataFrame:
    """Recommend maintenance from MANIFESTS alone (the planner half of
    Iceberg's maintenance procedures): one row per recommended action with
    its reason and the manifest numbers behind it. Emits
    `compact_binpack` when the small-file backlog passes the threshold,
    `rewrite_position_deletes` when positional delete files pile up,
    `compact` when EQUALITY delete files pile up (only a full rewrite
    folds those away), `expire_snapshots` when the retained version
    chain grows past `keep_versions`, and — when `cluster_col` names the
    table's read-pattern key — `compact_sort` when clustering_depth's
    average overlap on that column exceeds `max_avg_depth` (appends have
    degraded the layout until stats no longer prune). Planning cost is O(live files +
    commits) driver-side metadata — at corpus scale this is the health
    check a table-service cron runs per table, never a data read. An
    empty result means the table is healthy."""
    cur = _head(table, "main")
    if cur is None:
        return spark.createDataFrame(
            [], "action string, reason string, n int"
        )
    _, state = _state_at(table, cur)
    rows = []
    small = [
        e
        for e in state["data"].values()
        if int(e.get("bytes", 0)) < small_file_bytes
    ]
    if len(small) >= small_file_backlog:
        rows.append(
            (
                "compact_binpack",
                f"{len(small)} data files under {small_file_bytes} bytes",
                len(small),
            )
        )
    n_pos = sum(1 for e in state["deletes"].values() if e.get("positional"))
    if n_pos >= pos_delete_backlog:
        rows.append(
            (
                "rewrite_position_deletes",
                f"{n_pos} position-delete files to fold into one",
                n_pos,
            )
        )
    n_eq = sum(
        1 for e in state["deletes"].values() if not e.get("positional")
    )
    if n_eq >= eq_delete_backlog:
        rows.append(
            (
                "compact",
                f"{n_eq} equality-delete files; only a rewrite folds them",
                n_eq,
            )
        )
    if cluster_col is not None:
        cd = clustering_depth(table, cluster_col)
        if cd["n_files"] >= 2 and cd["avg_depth"] > max_avg_depth:
            rows.append(
                (
                    "compact_sort",
                    f"avg {cd['avg_depth']} of {cd['n_files']} files overlap "
                    f"on {cluster_col} (max_avg_depth={max_avg_depth})",
                    cd["n_files"],
                )
            )
    n_versions = len(list_versions(table))
    if n_versions > keep_versions:
        rows.append(
            (
                "expire_snapshots",
                f"{n_versions} versions in the log (keep_versions="
                f"{keep_versions})",
                n_versions,
            )
        )
    return spark.createDataFrame(rows, "action string, reason string, n int")


def remove_orphans(table: str, min_age_sec: float = 0.0) -> int:
    """Iceberg's RemoveOrphanFiles maintenance action: physically delete
    parquet files under the table's data/delete prefixes that NO retained
    commit (nor the expiry rebase base) references — the residue of
    writers that wrote their files but lost the optimistic commit race or
    died before the log write. `min_age_sec` is the same age guard as
    Iceberg's default 3-day cutoff: files younger than it are skipped, so
    an IN-FLIGHT writer's not-yet-committed files are never swept.
    Unreferenced chunk manifests (mchunk-*.json in log/, pre-written by
    writers that lost the commit race) are swept under the same guard."""
    versions = list_versions(table)
    referenced: set[str] = set()
    ref_chunks: set[str] = set()
    for v in versions:
        c = _read_commit(table, v)
        for e in c.get("added_data", []):
            if "manifest" in e:
                ref_chunks.add(os.path.join(table, e["manifest"]))
                for ent in _load_chunk_entries(table, e):
                    referenced.add(ent["path"])
            else:
                referenced.add(e["path"])
        for e in c.get("added_deletes", []):
            referenced.add(e["path"])
    for sid in staged_ids(table):
        # staged-but-unpublished WAP files are NOT orphans — an audit may
        # still be running against them
        for e in _read_staged(table, sid)["added_data"]:
            referenced.add(e["path"])
    # EVERY rebase base still pins its files: branch lineages truncated by
    # expiry get their own base, not just the oldest retained version's
    try:
        base_names = [
            n for n in os.listdir(_log_dir(table)) if n.startswith("_base_v")
        ]
    except OSError:
        base_names = []
    for n in base_names:
        with open(os.path.join(_log_dir(table), n)) as f:
            snap = json.load(f)
        for e in snap.get("data", []) + snap.get("deletes", []):
            referenced.add(e["path"])
    removed = 0
    now = time.time()
    for kind in ("data", "deletes"):
        root = os.path.join(table, kind)
        for dirpath, _dirs, files in os.walk(root):
            for name in files:
                if not name.endswith(".parquet"):
                    continue
                p = os.path.join(dirpath, name)
                if p in referenced or now - os.path.getmtime(p) < min_age_sec:
                    continue
                os.unlink(p)
                removed += 1
    # chunk manifests are written BEFORE the optimistic commit, so a
    # writer that lost every retry (or died) leaves its mchunk files in
    # log/ unreferenced — the same orphan class as its data files, swept
    # under the same age guard (ref_chunks collected in the first pass)
    log = _log_dir(table)
    if os.path.isdir(log):
        for name in os.listdir(log):
            if not (name.startswith("mchunk-") and name.endswith(".json")):
                continue
            p = os.path.join(log, name)
            if p in ref_chunks or now - os.path.getmtime(p) < min_age_sec:
                continue
            os.unlink(p)
            removed += 1
    return removed


# ---------------------------------------------------------------------------
# read path
# ---------------------------------------------------------------------------


def _read_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    return spark.read.option("mergeSchema", "true").parquet(*paths)


# Delete-key sets at or below this manifest row tally get a broadcast
# anti-join; bigger sets (e.g. a table-wide dedup's duplicate list) fall
# through to AQE's join choice so the keys never have to fit driver/executor
# memory. ~2M (file,pos) rows ≈ low hundreds of MB broadcast, a safe ceiling.
_BROADCAST_DELETE_ROWS = 2_000_000


def _with_file(df: DataFrame) -> DataFrame:
    """Attach the normalized absolute-path file identity as `_file`.
    input_file_name() returns a URL-encoded file: URI — normalize it to
    the manifest's os-path form."""
    return df.withColumn(
        "_file",
        F.url_decode(F.regexp_replace(F.input_file_name(), "^file:/+", "/")),
    )


def _apply_deletes(
    spark: SparkSession, df: DataFrame, state: dict,
    fields: list[list] | None = None,
    keep_identity: bool = False,
) -> DataFrame:
    """Merge-on-read: anti-join each delete file group against the data
    rows the delete is scoped to. Equality deletes remove rows from files
    whose sequence number is STRICTLY OLDER than the delete (Iceberg v2
    rule — a key re-appended after the delete survives); position deletes
    apply at seq <= theirs (the spec's position-delete rule) and anti-join
    on the (_file, _pos) row identity instead of key columns, so they are
    schema-agnostic — renames and drops never invalidate them. The
    file→seq map is a tiny manifest dim joined broadcast on the file
    identity. Delete key sets are usually small (they are the alternative
    to rewriting data files) and get broadcast anti-joins — but a
    position-delete set from a table-wide dedup is DUPLICATE-sized, which
    at corpus scale can exceed executor memory, so each group's manifest
    row tally gates the hint: past _BROADCAST_DELETE_ROWS the join falls
    through to AQE's choice (shuffle anti-join on the same keys).
    `keep_identity` retains the _file/_pos columns for callers that need
    live-row identities (position-delete writers, CDC pre-images)."""
    deletes = list(state["deletes"].values())
    if not deletes:
        if not keep_identity and "_pos" in df.columns:
            df = df.drop("_pos")
        return df
    # File identity is the FULL absolute path: with multi-level hive
    # partitioning one task writes the SAME filename into many partition
    # dirs, so any fixed-suffix identity (e.g. last two path segments)
    # collides and the manifest join multiplies rows.
    seq_rows = [
        (os.path.abspath(e["path"]), int(e["seq"]))
        for e in state["data"].values()
    ]
    manifest = F.broadcast(
        df.sparkSession.createDataFrame(seq_rows, "_file string, _seq int")
    )
    data = (df if "_file" in df.columns else _with_file(df)).join(
        manifest, "_file"
    )
    by_group: dict[tuple, list[dict]] = {}
    for e in deletes:
        by_group.setdefault((tuple(e["key_cols"]), int(e["seq"])), []).append(e)
    out_cols = [
        c for c in df.columns if keep_identity or c != "_pos"
    ]
    evolved = bool(state.get("evolved")) or fields is not None
    cur = {
        fid: (n, t) for fid, n, t in (fields or _fields_of(state))
    } if evolved else {}
    for (key_cols, dseq), entries in sorted(by_group.items(), key=lambda kv: kv[0][1]):
        keys = _read_files(spark, [e["path"] for e in entries]).distinct()
        small = (
            sum(int(e.get("rows", 0)) for e in entries)
            <= _BROADCAST_DELETE_ROWS
        )
        if entries[0].get("positional"):
            # position delete: row identity join, seq <= scope, no schema
            # translation (file+pos reference nothing evolution can move)
            affected = data.filter(F.col("_seq") <= F.lit(dseq))
            rest = data.filter(F.col("_seq") > F.lit(dseq))
            data = affected.join(
                F.broadcast(keys) if small else keys,
                ["_file", "_pos"],
                "left_anti",
            ).unionByName(rest)
            continue
        join_cols = list(key_cols)
        if evolved:
            # delete keys were written under THEIR commit's schema: resolve
            # each write-time key column by field id to its current name and
            # type (rename follows, widen casts; a dropped key column means
            # the delete can no longer be applied — refuse, don't misapply).
            wcols = _entry_cols(entries[0], state)
            sel, join_cols = [], []
            for k in key_cols:
                fid = wcols.get(k)
                if fid is None or fid not in cur:
                    raise ValueError(
                        f"delete key column {k!r} (seq {dseq}) was dropped "
                        "by schema evolution; compact before dropping key "
                        "columns"
                    )
                name, typ = cur[fid]
                sel.append(F.col(k).cast(typ).alias(name))
                join_cols.append(name)
            keys = keys.select(*sel).distinct()
        affected = data.filter(F.col("_seq") < F.lit(dseq))
        rest = data.filter(F.col("_seq") >= F.lit(dseq))
        data = affected.join(
            F.broadcast(keys) if small else keys, join_cols, "left_anti"
        ).unionByName(rest)
    return data.select(*out_cols)


def _empty_df(spark: SparkSession, schema: list[list[str]] | None) -> DataFrame:
    ddl = ", ".join(f"{n} {t}" for n, t in (schema or [["dummy", "int"]]))
    return spark.createDataFrame([], ddl)


def read_snapshot(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read the table as of `version`, or as of a named `ref` (branch head
    or tag), defaulting to the main branch head. Planning is a chain
    replay — no directory listing of the data prefix."""
    if ref is not None:
        if version is not None:
            raise ValueError("pass version OR ref, not both")
        version = resolve_ref(table, ref)
    _, state = _state_at(table, version)
    if not state["data"]:
        return _empty_df(spark, _field_pairs(_fields_of(state)))
    df = _read_projected(spark, list(state["data"].values()), state)
    return _apply_deletes(spark, df, state)


def read_partition(
    spark: SparkSession,
    table: str,
    filters: dict[str, str],
    version: int | None = None,
) -> DataFrame:
    """Partition-pruned read: open only the live files whose manifest
    partition values match `filters` (files without partition metadata are
    kept — never prune blind), then apply the exact filter and any delete
    files. This is the per-sink read path of a routed table: planning cost
    is the log replay, and non-matching sinks' files are never opened."""
    _, state = _state_at(table, version)
    byname = {n: i for i, n, _t in _fields_of(state)}
    paths = []
    for path in sorted(state["data"]):
        e = state["data"][path]
        part = e.get("partition")
        if part is None:
            paths.append(path)
            continue
        # manifest partition values are keyed by WRITE-TIME names; resolve
        # the filter's current name through the field id (missing → keep)
        inv = {fid: n for n, fid in _entry_cols(e, state).items()}
        ok = True
        for k, v in filters.items():
            w = inv.get(byname.get(k))
            if w is not None and w in part and part[w] != str(v):
                ok = False
        if ok:
            paths.append(path)
    if not paths:
        return _empty_df(spark, _field_pairs(_fields_of(state)))
    df = _read_projected(spark, [state["data"][p] for p in paths], state)
    for k, v in filters.items():
        df = df.filter(F.col(k) == F.lit(v))
    pruned_state = dict(state, data={p: state["data"][p] for p in paths})
    return _apply_deletes(spark, df, pruned_state)


def incremental_append_scan(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Exactly the rows appended in (from_version, to_version] on the main
    chain: the union of the append commits' added files. Compact commits
    are logical no-ops and are skipped; a fast_forward that only publishes
    branch appends (no removed files, no deletes) IS an append batch and
    streams through; overwrite/delete commits cannot be expressed as an
    append stream, so they raise — the caller falls back to a full diff
    (operators/diff.diff_datasets), the same contract as Iceberg's
    incremental append scan."""
    to_version, chain = _chain_between(table, from_version, to_version)
    entries: list[dict] = []
    for c in chain:
        op = c["operation"]
        if op in ("compact", "evolve_schema", "rewrite_deletes"):
            continue
        publish_only = (
            op == "fast_forward"
            and not c.get("added_deletes")
            and not c.get("removed_data")
        )
        if op != "append" and not publish_only:
            raise ValueError(
                f"commit v{c['version']} is {op!r}; incremental append scan "
                "only spans append/compact commits"
            )
        entries += _added_entries(table, c)
    state = _state_at(table, to_version)[1]
    if not entries:
        return _empty_df(spark, _field_pairs(_fields_of(state)))
    # rows appended before an in-range evolve_schema commit surface in the
    # TO-version's schema, same as Iceberg's incremental scan
    return _read_projected(spark, entries, state)


def changelog_scan(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level CDC between two snapshots (Iceberg's changelog scan):
    every row the table gained ('insert') or lost ('delete') in
    (from_version, to_version], stamped `_change_type` / `_commit_version`.
    Appends and merges read their added files directly; delete and merge
    commits emit the exact PRE-IMAGE rows they removed — the parent
    snapshot semi-joined with the commit's delete keys (every file live at
    the parent has a sequence number older than the delete, so the
    semi-join is precisely the seq-scoped rule _apply_deletes enforces);
    overwrites emit the full parent as deletes then their files as
    inserts; compactions are logical no-ops; rollbacks and fast-forwards
    emit their net row-level diff vs the parent. The output feeds
    aggregate.apply_retractable_delta so a downstream view refreshes from
    the delta without ever rescanning the base table."""
    to_version, chain = _chain_between(table, from_version, to_version)
    to_state = _state_at(table, to_version)[1]
    # across an in-range evolve_schema commit every emitted row — inserts,
    # pre-images, snapshot diffs — is projected to the TO-version's field
    # view, so the unions align by field id, not by historical name
    tf = _fields_of(to_state) if to_state.get("evolved") else None

    def _at(v: int | None) -> DataFrame:
        if not v:
            return _empty_df(spark, _field_pairs(_fields_of(to_state)))
        st = _state_at(table, v)[1]
        df = _read_projected(spark, list(st["data"].values()), st, fields=tf)
        return _apply_deletes(spark, df, st, fields=tf)

    _pre = _at

    pieces: list[DataFrame] = []

    def _emit(df: DataFrame, change: str, v: int) -> None:
        pieces.append(
            df.withColumn("_change_type", F.lit(change)).withColumn(
                "_commit_version", F.lit(v)
            )
        )

    for c in chain:
        v = c["version"]
        op = c["operation"]
        if op in ("compact", "evolve_schema", "rewrite_deletes"):
            continue  # logical no-ops: the row set is unchanged
        if op == "overwrite":
            _emit(_pre(c.get("parent")), "delete", v)
        elif op in ("delete", "merge") and c.get("added_deletes"):
            dels = c["added_deletes"]
            keys = _read_files(spark, [e["path"] for e in dels]).distinct()
            small = (
                sum(int(e.get("rows", 0)) for e in dels)
                <= _BROADCAST_DELETE_ROWS
            )
            if dels[0].get("positional"):
                # position-delete pre-images: the parent's LIVE rows at the
                # deleted (_file, _pos) identities — schema-agnostic, so no
                # field-id translation of the keys is ever needed
                pst = _state_at(table, c.get("parent"))[1]
                plive = _apply_deletes(
                    spark,
                    _with_file(
                        _read_projected(
                            spark,
                            list(pst["data"].values()),
                            pst,
                            fields=tf,
                            with_pos=True,
                        )
                    ),
                    pst,
                    fields=tf,
                    keep_identity=True,
                )
                removed = plive.join(
                    F.broadcast(keys) if small else keys,
                    ["_file", "_pos"],
                    "semi",
                ).drop("_file", "_pos")
                _emit(removed, "delete", v)
                continue
            join_cols = list(dels[0]["key_cols"])
            if tf is not None:
                # key files carry write-time names: resolve by field id
                cur = {fid: (n, t) for fid, n, t in tf}
                wcols = _entry_cols(dels[0], to_state)
                sel = [
                    F.col(k).cast(cur[wcols[k]][1]).alias(cur[wcols[k]][0])
                    for k in join_cols
                ]
                keys = keys.select(*sel).distinct()
                join_cols = [cur[wcols[k]][0] for k in join_cols]
            removed = _pre(c.get("parent")).join(
                F.broadcast(keys) if small else keys, join_cols, "semi"
            )
            _emit(removed, "delete", v)
        elif op in ("rollback", "fast_forward", "update"):
            # update: the net row diff IS the changed rows — unchanged
            # neighbors carried into rewritten files cancel in exceptAll
            pre, post = _pre(c.get("parent")), _at(v)
            _emit(post.exceptAll(pre), "insert", v)
            _emit(pre.exceptAll(post), "delete", v)
        elif op not in ("append", "merge", "delete"):
            raise ValueError(f"commit v{v}: unknown operation {op!r}")
        if op in ("append", "merge", "overwrite") and c.get("added_data"):
            _emit(
                _read_projected(
                    spark, _added_entries(table, c), to_state, fields=tf
                ),
                "insert",
                v,
            )
    if not pieces:
        return (
            _empty_df(spark, _state_at(table, to_version)[1]["schema"])
            .withColumn("_change_type", F.lit(""))
            .withColumn("_commit_version", F.lit(0))
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


# ---------------------------------------------------------------------------
# checkpointed incremental consumer (the table as an exactly-once source)
# ---------------------------------------------------------------------------


def consumer_offset(checkpoint_path: str) -> int:
    """The consumer's last ACKED snapshot version (0 = nothing consumed)."""
    p = os.path.join(checkpoint_path, "offset.json")
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["version"])


def consume_incremental(
    spark: SparkSession,
    table: str,
    checkpoint_path: str,
    mode: str = "appends",
):
    """Consume the table incrementally with a durable offset — the
    source-side twin of the exactly-once streaming sink (Iceberg's
    streaming read + Structured Streaming's offset log, rebuilt on the
    snapshot log): each call returns `(df, from_version, to_version, ack)`
    where df is the delta in (from, to] — `mode='appends'` via the
    incremental append scan (REFUSES in-range deletes, like Iceberg's
    default streaming read), `mode='changelog'` via the CDC scan for
    consumers that fold retractions (feed operators/aggregate's
    retractable-state algebra). None df means nothing new. The offset
    advances ONLY when the caller invokes `ack()` after durably processing
    the batch (atomic tmp-file + rename): a crash before ack re-delivers
    the same delta next call, so an idempotent downstream (e.g.
    append_idempotent's marker ledger keyed on to_version) yields
    exactly-once end to end. Offsets are snapshot VERSIONS, not file
    offsets — planning is a log replay, no data listing."""
    if mode not in ("appends", "changelog"):
        raise ValueError(f"unknown consume mode {mode!r}")
    os.makedirs(checkpoint_path, exist_ok=True)
    from_v = consumer_offset(checkpoint_path)
    to_v = _head(table, "main")
    if to_v is None or to_v <= from_v:
        return None, from_v, from_v, lambda: from_v

    def ack() -> int:
        tmp = os.path.join(
            checkpoint_path, f".offset-{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "w") as f:
            json.dump({"version": to_v, "ts": time.time()}, f)
        os.replace(tmp, os.path.join(checkpoint_path, "offset.json"))
        return to_v

    if mode == "appends":
        df = incremental_append_scan(
            spark, table, from_version=from_v, to_version=to_v
        )
    else:
        df = changelog_scan(spark, table, from_version=from_v, to_version=to_v)
    return df, from_v, to_v, ack


def prune_files(
    table: str, col: str, lo, hi, version: int | None = None
) -> tuple[list[str], int]:
    """Manifest-stats pruning: live data files whose [min,max] for `col`
    overlaps [lo,hi]; files without stats are kept (never prune blind).
    Delegates to the two-level planner, so chunked commits skip whole
    chunk manifests by their merged stats summaries (partition-spec
    projection composes when present). Returns (paths_to_read,
    n_files_skipped)."""
    plan = plan_scan(table, {col: ("between", lo, hi)}, version)
    return plan["paths"], plan["n_files_skipped"]


def scan_between(
    spark: SparkSession, table: str, col: str, lo, hi, version: int | None = None
) -> DataFrame:
    """Predicate scan that opens only stats-overlapping files (chunk
    summaries first — see plan_scan), then applies the exact filter and
    any outstanding delete files."""
    return scan_where(spark, table, {col: ("between", lo, hi)}, version)


# ---------------------------------------------------------------------------
# expiry
# ---------------------------------------------------------------------------


def expire_snapshots(
    table: str, keep_last: int = 2, max_age_sec: float | None = None
) -> dict:
    """Expire all but the newest `keep_last` snapshots — except versions
    pinned by a named ref: a tagged snapshot, a branch head, and every
    chain ancestor a retained version still needs are never expired while
    the ref exists (Iceberg's ref-retention rule). `max_age_sec` is the
    Iceberg `expire_snapshots(older_than)` knob: commits younger than the
    cutoff are ALSO retained regardless of keep_last, so the two compose
    exactly like Iceberg's retain-last + older-than (keep_last is the
    floor, age the ceiling). Physically deletes files referenced ONLY by
    expired versions, drops their log entries, and persists a rebase state
    at every retained version whose parent was expired, so chain replay
    stays O(retained commits) on every surviving lineage (main, branches,
    tags). Time travel to an expired version raises SnapshotExpired.
    Returns {files_removed, versions_removed}."""
    versions = list_versions(table)
    pinned = {resolve_ref(table, name) for name in list_refs(table)}
    retained_set = set(versions[-keep_last:]) | pinned
    if max_age_sec is not None:
        cutoff = time.time() - max_age_sec
        retained_set |= {
            v
            for v in versions
            if float(_read_commit(table, v).get("ts") or 0.0) >= cutoff
        }
    expired = [v for v in versions if v not in retained_set]
    if not expired:
        return {"files_removed": 0, "versions_removed": 0}
    retained = sorted(retained_set)
    # chain states computed while the log is still intact
    states = {v: _state_at(table, v)[1] for v in retained}
    keep_files: set[str] = set()
    for st in states.values():
        keep_files |= set(st["data"]) | set(st["deletes"])

    removed = 0
    for v in expired:
        c = _read_commit(table, v)
        for e in _added_entries(table, c) + c.get("added_deletes", []):
            if e["path"] not in keep_files and os.path.exists(e["path"]):
                os.unlink(e["path"])
                removed += 1
        for r in c.get("added_data", []):
            # chunk manifests are per-commit: expired commit → dead chunk
            # (its still-live files were flattened into the rebase base)
            if "manifest" in r:
                mp = os.path.join(table, r["manifest"])
                if os.path.exists(mp):
                    os.unlink(mp)

    # every retained version whose parent chain is truncated persists its
    # state; by induction every retained version then replays within
    # retained commits + one base.
    for v in retained:
        parent = _read_commit(table, v).get("parent")
        if (
            parent is not None
            and parent not in retained_set
            and not os.path.exists(_base_path(table, v))
        ):
            with open(_base_path(table, v), "w") as f:
                snap = {
                    "version": v,
                    "data": list(states[v]["data"].values()),
                    "deletes": list(states[v]["deletes"].values()),
                    "schema": states[v]["schema"],
                }
                for k in ("fields", "last_field_id", "legacy_cols", "evolved"):
                    if states[v].get(k):
                        snap[k] = states[v][k]
                json.dump(snap, f)
    for n in os.listdir(_log_dir(table)):
        if n.startswith("_base_v") and int(n[7:19]) not in retained_set:
            os.unlink(os.path.join(_log_dir(table), n))
    n_versions = 0
    for v in expired:
        os.unlink(_commit_path(table, v))
        n_versions += 1
    # drop now-empty commit data dirs (best-effort tidy, not correctness)
    for kind in ("data", "deletes"):
        root = os.path.join(table, kind)
        if os.path.isdir(root):
            for d in os.listdir(root):
                full = os.path.join(root, d)
                if os.path.isdir(full) and not any(
                    f.endswith(".parquet") for f in os.listdir(full)
                ):
                    shutil.rmtree(full)
    return {"files_removed": removed, "versions_removed": n_versions}

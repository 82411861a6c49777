"""CDC-style latest-wins state: collapse a changelog to current state per
key, and merge a delta batch into a snapshot (the MERGE-INTO / upsert
pattern on plain parquet, no table-format dependency).

The reference is a batch re-parser (it rewrites everything each run,
main.go's walk loop); a 10^12-turn pipeline cannot — it must fold each new
drop of turns into the existing state. These two operators are that fold.

Scale design: latest-wins is expressed as max(struct(order…, payload…))
inside a plain groupBy — a partial-aggregatable reduction (map-side combine
keeps one struct per key per task), NOT a row_number window, which would
full-sort every key group just to keep one row. State per reducer key is
one struct. merge_upsert unions snapshot+delta and runs the same
reduction, so a merge costs exactly one shuffle on the key, and AQE
coalesces the usually-tiny delta side's partitions.

Determinism: struct comparison is field-lexicographic, so rows are ordered
by order_cols first; payload fields participate only on full order-col
ties. Callers should make order_cols unique per key ((ts, event_id) here)
— then payload order never matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_state(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """One row per key: the max-(order_cols) row's order + payload columns,
    plus n_changes (how many changelog rows the key folded)."""
    key_set = set(key_cols)
    if payload_cols is None:
        payload_cols = [
            c
            for c in changelog.columns
            if c not in key_set and c not in set(order_cols)
        ]
    packed = F.struct(
        *[F.col(c) for c in order_cols], *[F.col(c) for c in payload_cols]
    )
    agg = changelog.groupBy(*key_cols).agg(
        F.max(packed).alias("_s"), F.count("*").alias("n_changes")
    )
    return agg.select(
        *key_cols,
        *[F.col("_s")[c].alias(c) for c in [*order_cols, *payload_cols]],
        "n_changes",
    )


def merge_upsert(
    snapshot: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Upsert `delta` into `snapshot`: per key the max-(order_cols) row
    wins; on an exact order tie the delta row wins (generation tag is the
    final tiebreak). Output schema == input schema (both sides must
    match). New keys insert, newer rows update, older delta rows are
    ignored — MERGE INTO semantics in one shuffle."""
    out_cols = snapshot.columns
    s = snapshot.withColumn("_gen", F.lit(0))
    d = delta.withColumn("_gen", F.lit(1))
    merged = latest_state(
        s.unionByName(d),
        key_cols,
        [*order_cols, "_gen"],
    )
    return merged.select(*out_cols)


def scd2_intervals(
    changelog: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    state_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a changelog: one row
    per (key, state run) with (key_cols..., state_cols..., version,
    valid_from, valid_to, is_current). valid_to is NULL on the open
    current row; consecutive changelog rows with identical state collapse
    into one interval (true SCD2 — a re-assertion of the same value does
    not open a new version).

    Scale shape: one groupBy collapses same-timestamp ties (latest_state's
    partial-aggregatable max-struct, tiebreak_cols deciding), then the
    lag / lead / row_number windows all share ONE partitionBy(key)
    orderBy(ts) sort — Spark plans a single shuffle + sort for the whole
    interval build. Per-key window state is O(1) (no unbounded frames)."""
    from pyspark.sql import Window

    kc, sc = list(key_cols), list(state_cols)
    snap = latest_state(
        changelog.select(*kc, ts_col, *list(tiebreak_cols), *sc),
        [*kc, ts_col],
        list(tiebreak_cols),
        sc,
    ).drop("n_changes", *[c for c in tiebreak_cols])
    w = Window.partitionBy(*kc).orderBy(ts_col)
    changed = F.lit(False)
    for c in sc:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    runs = snap.withColumn(
        "_new_run",
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(True)).otherwise(changed),
    ).filter("_new_run")
    return (
        runs.select(
            *kc,
            *sc,
            F.row_number().over(w).alias("version"),
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_asof(intervals: DataFrame, ts) -> DataFrame:
    """Point-in-time reconstruction from SCD2 history: the rows whose
    [valid_from, valid_to) interval covers `ts` (a Column or literal) —
    time travel over the dimension without rescanning the changelog. At
    most one row per key survives (intervals tile), so this is a pure
    filter: no shuffle, no window, and on storage partitioned/sorted by
    valid_from it prunes."""
    t = ts if isinstance(ts, Column) else F.lit(ts)
    return intervals.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )

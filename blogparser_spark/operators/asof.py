"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key — the temporal-join primitive Spark's DataFrame API
lacks (log enrichment: "which config/price/session state was in effect when
this event happened").

Implementation is the union + window-fill composition, NOT a range join:

  1. the right side's carried columns are packed into one struct,
  2. both sides are unioned with a side tag,
  3. one window per key ordered by (ts, side) forward-fills the last
     non-null right struct onto every left row,
  4. left rows are filtered back out and the struct unpacked.

Cost model: ONE shuffle on the key (the same partitioning a groupBy on the
key would need) and a per-key sort — no n_left × n_right pair blowup, no
interval explosion, and it partial-sorts within partitions under AQE. A
broadcast-range-join formulation materializes every (left, candidate-right)
pair before picking the max; at 10^9 events × 10^6 updates per hot key that
is quadratic. The union form is what Flink's temporal join and DuckDB's
ASOF JOIN lower to, and the DuckDB `ASOF JOIN` is this operator's oracle.

Tie semantics match DuckDB `ON left.ts >= right.ts`: a right row at exactly
left.ts IS visible (right sorts before left at equal ts via the side tag).
If several right rows share (key, ts), callers should pre-reduce to one row
per (key, ts) — `latest_per_key_ts` does that deterministically — since any
"which one" answer at identical timestamps is arbitrary in every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side__"  # 0 = right (sorts first at equal ts), 1 = left
_PAYLOAD = "__asof_payload__"


def latest_per_key_ts(
    df: DataFrame, key_cols: list[str], ts_col: str, order_col: str
) -> DataFrame:
    """One row per (key, ts): the max-`order_col` row wins — the
    deterministic pre-reduction for identical-timestamp right rows."""
    w = Window.partitionBy(*key_cols, ts_col).orderBy(F.desc(order_col))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """Backward as-of join (most recent right.ts <= left.ts per key).

    Returns every `left` row plus the matched right row's non-key columns
    (NULL when no right row precedes it); the right row's timestamp arrives
    as `right_ts_alias`. Right-side column names must not collide with
    left's (rename before calling).
    """
    r_val_cols = [c for c in right.columns if c not in {*key_cols, ts_col}]
    # DuckDB ASOF (l.ts >= r.ts) never matches a NULL right timestamp; in
    # the window below such a row would sort nulls-first and forward-fill
    # its payload onto every left row until the first real right row
    right = right.filter(F.col(ts_col).isNotNull())
    r = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(ts_col).alias(right_ts_alias),
            *[F.col(c) for c in r_val_cols],
        ).alias(_PAYLOAD),
    )
    l_cols = left.columns
    lhs = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.struct(*[F.col(c) for c in l_cols]).alias("__asof_left__"),
    )
    r = r.withColumn(
        "__asof_left__", F.lit(None).cast(lhs.schema["__asof_left__"].dataType)
    )
    unioned = lhs.unionByName(r)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    out = filled.select(
        *[F.col("__asof_left__")[c].alias(c) for c in l_cols],
        F.col(_PAYLOAD)[right_ts_alias].alias(right_ts_alias),
        *[F.col(_PAYLOAD)[c].alias(c) for c in r_val_cols],
    )
    return out


def range_join_points_in_intervals(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Point-in-interval range join (event.ts BETWEEN interval.[start, end],
    inclusive): the OTHER temporal-join primitive Spark's API lacks (as-of
    covers "latest state before"; this covers "which windows contain" —
    campaign attribution, maintenance-window tagging, SLA bucketing).

    A naive `points CROSS JOIN intervals ON BETWEEN` is a nested-loop over
    n_points × n_intervals — Catalyst can't hash an inequality. The
    distributed shape: quantize the time axis into fixed buckets; each
    INTERVAL explodes into every bucket it overlaps (ceil(len/bucket) rows —
    intervals are few and short relative to the corpus), each POINT maps to
    exactly ONE bucket, and the equi-join on the bucket key feeds the exact
    BETWEEN filter. A qualifying pair meets in precisely the point's bucket,
    so the output needs NO dedup; a non-overlapping pair is never
    materialized. Shuffle key = time bucket: at 10^12 events choose
    bucket_seconds so a bucket's points fit an executor (calendar-uniform
    load), and a hot bucket is exactly the shape AQE skew-join splitting
    handles (it splits oversized partitions of an equi-join by size).

    Returns points ⋈ intervals columns (inner); name collisions other than
    the join inputs' own are the caller's to resolve."""
    bs_us = F.lit(int(bucket_seconds) * 1_000_000)
    p = points.withColumn(
        "_b", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / bs_us)
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / bs_us),
                F.floor(F.unix_micros(F.col(end_col).cast("timestamp")) / bs_us),
            )
        ),
    )
    return (
        p.join(iv, "_b")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )

"""Fellegi–Sunter record linkage (Fellegi & Sunter, JASA 1969): probabilistic
entity resolution ACROSS two tables — the data-integration sibling of
dedup (which links within one). Candidate pairs come from a BLOCKED
equi-join (never all-pairs); each comparison field contributes a log-odds
weight by agreement level (exact / close-by-edit-distance / disagree), and
the pair score is the sum — integer-micro weights so the sum is exact and
order-independent across engines.

Scale: the join is keyed on the block columns, so pair volume is
Σ_blocks |L_b|·|R_b| — the standard blocking trade-off; a hot block is the
skew unit (same salting discussion as every keyed stage). levenshtein is
codegen-native in Spark and identical in DuckDB, so the oracle replays
byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FieldSpec:
    """One comparison field: agreement by edit distance with integer-micro
    log-odds weights (w_exact > w_close > w_diff, w_diff typically
    negative). `close_max_lev` bounds the 'close' level."""

    def __init__(
        self,
        name: str,
        left: Column,
        right: Column,
        w_exact_u: int,
        w_close_u: int,
        w_diff_u: int,
        close_max_lev: int = 2,
        distance: Column | None = None,
    ) -> None:
        self.name = name
        self.left = left
        self.right = right
        self.w_exact_u = w_exact_u
        self.w_close_u = w_close_u
        self.w_diff_u = w_diff_u
        self.close_max_lev = close_max_lev
        # custom pseudo-distance (e.g. numeric proximity mapped to 0/9)
        # instead of string edit distance
        self.distance = distance

    def lev(self) -> Column:
        if self.distance is not None:
            return self.distance
        return F.levenshtein(self.left, self.right)

    def weight_u(self) -> Column:
        lev = self.lev()
        return (
            F.when(lev == 0, self.w_exact_u)
            .when(lev <= self.close_max_lev, self.w_close_u)
            .otherwise(self.w_diff_u)
        )


def fs_em_weights(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    fields: Sequence[FieldSpec],
    iters: int = 2,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> DataFrame:
    """Estimate Fellegi–Sunter m/u probabilities by EM over the blocked
    comparison vectors (Winkler 1988; the Splink training loop) instead
    of taking fixed log-odds: per iteration, the E-step scores every
    pair's match responsibility from the current (p, m, u) and the
    M-step re-estimates them from responsibility-weighted agreement
    counts. Fixed iteration count and deterministic init, so the run is
    replayable; a field AGREES when its distance ≤ close_max_lev.

    Cross-engine exactness (the kmeans/DSIR convention): per-pair
    responsibilities are quantized to integer micros with a tie-free
    floor(x·1e6 + 0.5) — M-step sums are then exact integer sums, so
    aggregation order is never observable — and parameters re-quantize
    to 6dp at each iteration boundary. The per-iteration state that
    reaches the driver is |fields|-sized (the kmeans-centroid bound);
    each iteration is ONE partial agg over the blocked pairs, which are
    computed once and localCheckpointed, never re-joined.

    Returns (field, m, u, p) — feed m/u into integer-micro log-odds
    (log2(m/u), log2((1-m)/(1-u))) to weight fs_linkage."""
    import math

    def _round6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    ag = (
        left.join(right, list(block_cols))
        .select(
            *[
                (f.lev() <= f.close_max_lev).cast("int").alias(f"g_{f.name}")
                for f in fields
            ]
        )
        .localCheckpoint()
    )
    p = init_p
    m = {f.name: init_m for f in fields}
    u = {f.name: init_u for f in fields}
    for _ in range(iters):
        num: Column = F.lit(p)
        den: Column = F.lit(1.0 - p)
        for f in fields:
            g = F.col(f"g_{f.name}")
            num = num * F.when(g == 1, F.lit(m[f.name])).otherwise(
                F.lit(1.0 - m[f.name])
            )
            den = den * F.when(g == 1, F.lit(u[f.name])).otherwise(
                F.lit(1.0 - u[f.name])
            )
        r = F.floor(num / (num + den) * F.lit(1e6) + F.lit(0.5)).cast(
            "bigint"
        )
        aggs = [F.sum(r).alias("sr"), F.count("*").alias("n")]
        for f in fields:
            g = F.col(f"g_{f.name}").cast("bigint")
            aggs.append(F.sum(r * g).alias(f"srg_{f.name}"))
            aggs.append(F.sum(g).alias(f"sg_{f.name}"))
        row = ag.agg(*aggs).collect()[0]
        sr, n = int(row["sr"]), int(row["n"])
        for f in fields:
            srg = int(row[f"srg_{f.name}"])
            sg = int(row[f"sg_{f.name}"])
            m[f.name] = _round6(srg / max(sr, 1))
            u[f.name] = _round6(
                (1_000_000 * sg - srg) / max(1_000_000 * n - sr, 1)
            )
        p = _round6(sr / (1_000_000 * n))
    return left.sparkSession.createDataFrame(
        [(f.name, m[f.name], u[f.name], p) for f in fields],
        "field string, m double, u double, p double",
    )


def fs_linkage(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    fields: Sequence[FieldSpec],
    left_id: str,
    right_id: str,
    top_k: int | None = None,
) -> DataFrame:
    """Score blocked candidate pairs: (left_id, right_id, lev_<field>...,
    score_u), ordered by (score_u desc, ids). With top_k the global cut is
    TakeOrdered — per-partition local top-k, no sort shuffle."""
    joined = left.join(right, list(block_cols))
    cols = [F.col(left_id), F.col(right_id)]
    score = None
    for f in fields:
        cols.append(f.lev().alias(f"lev_{f.name}"))
        w = f.weight_u()
        score = w if score is None else score + w
    out = joined.select(
        *cols, score.cast("bigint").alias("score_u")
    ).orderBy(F.desc("score_u"), F.asc(left_id), F.asc(right_id))
    return out.limit(top_k) if top_k else out

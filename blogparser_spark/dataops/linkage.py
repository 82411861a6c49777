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

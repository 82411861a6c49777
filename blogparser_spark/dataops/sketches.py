"""Deterministic, engine-portable HyperLogLog distinct sketches.

Why another distinct counter: at 10^12 turns a `COUNT(DISTINCT key)` is a
full shuffle of every distinct key to one reducer per group; an HLL sketch
is a fixed 2^p-register state that partial-aggregates map-side (max per
register commutes and combines), merges across checkpoint slices / stream
micro-batches, and ships as 2^p small ints per group. This implementation
is *bit-exact across engines* so it carries an exact DuckDB oracle:

- register index and rank derive from the md5 hex string using only
  integer/string ops (no engine-specific 64-bit hash),
- the register sum is carried as an exact int64 (sum of 2^(53-rank),
  rank in [1, 53], so each term is in [1, 2^52] and the total for
  m=256 registers stays < 2^61),
- only the final estimate is a float (one division + optional ln),
  rounded to 6 decimals — the same cross-engine convention BM25's idf
  uses (functions of exact integers, round-6 absorbs libm ulp skew).

Algorithm: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm" (AofA 2007), with the
standard small-range linear-counting correction. The reference repo has no
sketch support; this belongs to the 100-TB dataops surface (approximate
per-sink distinct users/texts without a distinct shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

# Leading zero bits inside the first NONZERO hex nibble ('0' handled by the
# leading-zero-char count; map-literal lookup per CLAUDE.md rule 9 — prefer
# create_map+element_at over when-chains).
_NIB_LZ = {
    "1": 3,
    "2": 2,
    "3": 2,
    "4": 1,
    "5": 1,
    "6": 1,
    "7": 1,
    "8": 0,
    "9": 0,
    "a": 0,
    "b": 0,
    "c": 0,
    "d": 0,
    "e": 0,
    "f": 0,
}

_SUF_CHARS = 13  # 13 hex chars = 52 bits of rank window


def _nib_map() -> Column:
    pairs: list[Column] = []
    for k, v in _NIB_LZ.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def rank_expr(suf: Column) -> Column:
    """HLL rank (position of the first 1-bit, 1-based) of a 13-hex-char
    suffix: 4 * (leading zero chars) + (zero bits in the first nonzero
    nibble) + 1; an all-zero suffix ranks 53. Pure codegen string/int ops."""
    lzc = F.length(F.regexp_extract(suf, "^0*", 0))
    nib = suf.substr(lzc + 1, F.lit(1))
    # try_element_at (not element_at): the otherwise-branch is unreachable
    # when the suffix is all zeros, but ANSI-on sessions must never be one
    # missing-map-key error away from failing (the library-surface rule).
    return F.when(lzc == _SUF_CHARS, F.lit(53)).otherwise(
        lzc * 4 + F.try_element_at(_nib_map(), nib) + 1
    )


def hll_registers(
    df: DataFrame,
    value: Column,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register state: (group_cols..., register, max_rank).

    p must be a multiple of 4 (register index = first p/4 hex chars of
    md5(value)). The groupBy is a partial-aggregatable max — map-side
    combine reduces each input partition to at most 2^p rows per group
    before the shuffle, which is what makes this the scale path vs
    COUNT(DISTINCT)."""
    if p % 4 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    nh = p // 4
    base = df.select(*group_cols, F.md5(value).alias("h")).select(
        *group_cols,
        F.conv(F.substring("h", 1, nh), 16, 10).cast("int").alias("register"),
        F.substring("h", nh + 1, _SUF_CHARS).alias("suf"),
    )
    return (
        base.select(*group_cols, "register", rank_expr(F.col("suf")).alias("rank"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*register_dfs: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge register states (max per register) — the property that lets
    sketches roll up across checkpoint slices and stream micro-batches."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "register").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Collapse a register state to (group_cols..., n_present, s_scaled,
    hll_distinct). s_scaled is the EXACT integer sum(2^(53 - max_rank))
    plus 2^53 per never-hit register, so the only floating-point step is
    the final alpha * m^2 * 2^53 / s_scaled (round-6). Small-range
    correction: raw <= 2.5m with empty registers -> m * ln(m / zeros)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = registers.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_present"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - max_rank)"))
            + (F.lit(m) - F.count("*")) * F.expr("shiftleft(cast(1 as bigint), 53)")
        )
        .cast("bigint")
        .alias("s_scaled"),
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << 53))
        / F.col("s_scaled")
    )
    zeros = F.lit(m) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return g.select(
        *group_cols,
        "n_present",
        "s_scaled",
        F.round(est, 6).alias("hll_distinct"),
    )


def rank_py(suf: str) -> int:
    """Pure-Python twin of rank_expr for property tests."""
    lzc = len(suf) - len(suf.lstrip("0"))
    if lzc == _SUF_CHARS:
        return 53
    return lzc * 4 + _NIB_LZ[suf[lzc]] + 1

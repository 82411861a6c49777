"""Shared dataops idioms: the integer-micro quantizer and the md5 feature
bucket. Both are CONVENTIONS (CLAUDE.md rule 7 and the curation.py hashed-
feature map) with exact DuckDB twins — they live once here so the tie-free
rounding rule and the hash expression cannot drift between modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000


def micro(col: Column) -> Column:
    """Tie-free round-to-6-decimals as integer micros:
    floor(x*1e6 + 0.5) — never round() (Python rounds half-even, DuckDB
    half-away; the floor form is identical in both engines)."""
    return F.floor(col * MICRO + F.lit(0.5)).cast("bigint")


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """md5-hash a value to a feature bucket — 32 bits of the hex digest
    mod n_buckets; the same expression exists verbatim in DuckDB as
    ('0x' || substr(md5(x), 1, 8))::BIGINT % n."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % n_buckets
    )

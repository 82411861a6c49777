"""Bucketed storage for co-located joins (SURVEY.md §2.5 join strategy).

Repeated conv-grain joins (parsed turns ⋈ conv profiles, turns ⋈ routed
audit tables) shuffle both sides on conv_id every run. Writing both tables
bucketed by the join key moves that shuffle to WRITE time, once: subsequent
joins of two tables bucketed identically read bucket i against bucket i
with no Exchange in the plan — at 100 TB this converts every downstream
join from a full network shuffle into a local merge.

Spark's bucketing rides the session catalog (saveAsTable); the warehouse
location is configurable per session, so tests point it at a temp dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str] = "conv_id",
    n_buckets: int = 16,
    sort_col: str | None = "turn_idx",
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sort-within-bucket) managed table.
    Sorting by the secondary key makes window scans over (bucket_col,
    sort_col) read pre-ordered data. A multi-column bucket key must match
    the downstream join keys exactly for the exchange-free plan (Catalyst
    requires the join keys to cover every bucket column)."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.mode(mode).bucketBy(n_buckets, cols[0], *cols[1:])
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two identically-bucketed tables on the bucket key — Catalyst
    recognizes the matching output partitioning and plans the join with no
    Exchange on either side."""
    return spark.read.table(left_table).join(spark.read.table(right_table), on)

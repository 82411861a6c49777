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


# ---------------------------------------------------------------------------
# Z-order (Morton) multi-dimensional clustering
# ---------------------------------------------------------------------------
# The Iceberg/Delta `rewrite_data_files(strategy => 'sort', sort_order =>
# zorder(a, b))` layout technique, expressed directly: interleaving the bits
# of two bucketized dimensions gives ONE sort key whose ranges are compact
# in BOTH dimensions, so range-partitioned files carry tight min/max stats
# on a AND b simultaneously — a 2-D box predicate then prunes most files,
# where a single-column sort only prunes on its leading column. All bit math
# is plain integer shift/mask inside whole-stage codegen (and is replicated
# verbatim in the DuckDB oracle).

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread_bits16(x: Column) -> Column:
    """Spread the low 16 bits of x so bit i lands at position 2i (the
    classic mask-doubling Morton encode; inputs must be pre-bucketized to
    [0, 2^16))."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """Morton-interleave two bucketized non-negative ints (< 2^16 each)
    into one long sort key: z = spread(a) | spread(b) << 1."""
    return _spread_bits16(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits16(b.cast("long")), 1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    key_col: str = "z",
    n_files: int = 16,
    z_bits: int | None = None,
) -> None:
    """Bucket the z key into FIXED-WIDTH ranges and write one directory
    partition per bucket, sorted by z within: every output file then covers
    one contiguous z range, i.e. a compact box in (a, b) space, so its
    parquet footer min/max stats on the RAW dimension columns are tight.

    Fixed-width (bucket = z·n_files >> z_bits) instead of
    `repartitionByRange` deliberately: Spark's range partitioner derives
    sample seeds from the RDD id, so boundaries — and therefore which files
    a box predicate prunes — vary with session history. Z inputs are
    bucketized dimensions (near-uniform by construction), where data-
    independent equal-width ranges are both balanced and deterministic;
    equi-depth sampling is only worth its nondeterminism on skewed raw
    keys, which z-ordering already excludes. `partitionBy` (not a hash
    repartition alone) guarantees no file ever mixes two buckets even when
    two bucket ids hash-collide into one task. One shuffle at write time —
    the skipping is free for every later read. If `z_bits` is None it is
    sized from one max() scan of the key column (parquet-stats cheap);
    pass it explicitly to skip that pass at scale."""
    if z_bits is None:
        zmax = df.agg(F.max(key_col)).first()[0]
        z_bits = max(1, int(zmax or 0).bit_length())
    bucket = F.shiftright(F.col(key_col) * F.lit(n_files), z_bits).cast("int")
    (
        df.withColumn("_zb", bucket)
        .repartition(n_files, F.col("_zb"))
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .partitionBy("_zb")
        .parquet(path)
    )


def file_minmax_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max/rowcount manifest over the named columns — the
    relational analog of Iceberg's manifest-file column stats, built with
    one scan + one partial agg keyed on input_file_name()."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def candidate_files(manifest: DataFrame, box: dict[str, tuple]) -> DataFrame:
    """Files whose per-column [min, max] envelope intersects the query box
    {col: (lo, hi)} — exactly the pruning decision a stats-aware reader
    (Iceberg planning, parquet row-group skipping) makes from the manifest."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"min_{c}") <= hi) & (F.col(f"max_{c}") >= lo)
    return manifest.where(cond)

"""Aggregate: per-sink counts, per-conv turn stats, summary-length histograms.

The reference's only aggregations are BM25's tf/df/avg-sentence-length
(parser/summary.go:43-85,123-127); the pipeline-level aggregates here are the
north-star trio. All are partial-aggregatable hash aggregations (map-side
combine happens automatically); the per-conv window is ordered by
(conv_id, turn_idx) for stable turn ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUMMARY_HIST_BUCKET = 50


def sink_counts(df: DataFrame) -> DataFrame:
    """groupBy(sink keys).count() — exact parity with the oracle recount."""
    return (
        df.groupBy("channel", "tool_category", "parse_status")
        .agg(F.count("*").alias("n"))
    )


def conv_stats(df: DataFrame) -> DataFrame:
    """Per-conversation stats: turn counts, max turn, parse-ok ratio,
    distinct roles, wall-clock span."""
    return df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum(F.when(F.col("parse_status") == "ok", 1).otherwise(0)).alias("n_ok"),
        F.countDistinct("role").alias("n_roles"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "span_seconds"
        ),
    )


def turn_features(df: DataFrame) -> DataFrame:
    """Window features over stable (conv_id, turn_idx) order: dense turn
    number, previous role, inter-turn gap seconds. The per-conv window is the
    scale-sensitive shuffle: keys are conv_id (hot convs exist), so AQE skew
    handling stays on and the window never includes the text payload."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        df.withColumn("turn_no", F.row_number().over(w))
        .withColumn("prev_role", F.lag("role").over(w))
        .withColumn(
            "gap_seconds",
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)),
        )
    )


def summary_hist(df: DataFrame, bucket: int = SUMMARY_HIST_BUCKET) -> DataFrame:
    """Histogram of summary lengths (chars), bucket width 50."""
    return (
        df.filter(F.col("summary").isNotNull())
        .groupBy(
            (F.floor(F.length("summary") / bucket) * bucket).alias("bucket")
        )
        .agg(F.count("*").alias("n"))
    )

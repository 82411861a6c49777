"""Enrich: broadcast-join small dimensions onto the parsed transcripts.

The reference's only lookup-enrich is the posWeights POS→weight map
(parser/summary.go:23-30, consumed by getWordWeight summary.go:227-241).
At pipeline scale that becomes the canonical broadcast-hash-join pattern:
dim tables of ≤32 rows joined with an explicit broadcast() hint so no
shuffle of the 10^12-row fact side ever happens.

Unknown keys land in the null bucket and are routed as 'unknown'
(FIXTURES.md §2: deliberately-missing keys test this path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blogparser_spark.functions import patterns as P

TOOL_CATEGORY = [
    ("search", "retrieval"),
    ("browser", "web"),
    ("python", "code"),
    ("bash", "shell"),
    ("none", "chat"),
    # 'mystery-tool' deliberately absent → null bucket
]

ROLE_CHANNEL = [
    ("user", "inbound"),
    ("assistant", "outbound"),
    ("system", "control"),
    ("tool", "machine"),
]


def dim_tool_category(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_CATEGORY, "tool string, tool_category string")


def dim_role_channel(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_CHANNEL, "role string, channel string")


def dim_pos_weight(spark: SparkSession) -> DataFrame:
    """posWeights as a proper dim table (parser/summary.go:23-30); consumed
    by the BM25 summary operator via broadcast join."""
    rows = [(k, v) for k, v in P.POS_WEIGHTS.items()]
    return spark.createDataFrame(rows, "pos string, weight double")


def enrich(df: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """Left-join the dims with broadcast hints; fill the null bucket with
    'unknown' so downstream partitioning keys are never NULL."""
    spark = spark or df.sparkSession
    out = (
        df.join(F.broadcast(dim_tool_category(spark)), "tool", "left")
        .join(F.broadcast(dim_role_channel(spark)), "role", "left")
        .withColumn("tool_category", F.coalesce("tool_category", F.lit("unknown")))
        .withColumn("channel", F.coalesce("channel", F.lit("unknown")))
    )
    return out

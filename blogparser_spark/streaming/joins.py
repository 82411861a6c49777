"""Stream–stream joins: watermark-bounded request↔response pairing.

The batch pipeline pairs a user turn with the assistant turn that answers
it (conv_id equal, turn_idx + 1). Streaming both sides requires the state
store to hold ONLY the rows that could still find a partner; that bound
comes from (a) watermarks on both inputs and (b) an event-time RANGE
predicate in the join condition — without the range term Spark keeps every
row forever and the state grows without bound.

Scale notes (100 TB): state per key is bounded by watermark + max_lag
independent of stream length; the join keys on conv_id, so hot
conversations are the skew unit — the same salting discussion as the batch
window stage (operators/skew.py) applies, and AQE does not exist in
streaming, so max_lag is the real control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def request_response_pairs(
    requests: DataFrame,
    responses: DataFrame,
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Inner stream–stream join of user requests to assistant responses:
    same conv_id, response turn_idx = request turn_idx + 1, response
    event-time within [request ts, request ts + max_lag].

    Works identically on static DataFrames (the batch twin in tests) —
    withWatermark is a no-op in batch."""
    req = (
        requests.withWatermark("ts", watermark)
        .select(
            F.col("conv_id").alias("req_conv_id"),
            F.col("turn_idx").alias("req_turn_idx"),
            F.col("ts").alias("req_ts"),
            F.col("text").alias("req_text"),
        )
    )
    rsp = (
        responses.withWatermark("ts", watermark)
        .select(
            F.col("conv_id").alias("rsp_conv_id"),
            F.col("turn_idx").alias("rsp_turn_idx"),
            F.col("ts").alias("rsp_ts"),
            F.col("text").alias("rsp_text"),
        )
    )
    cond = (
        (F.col("req_conv_id") == F.col("rsp_conv_id"))
        & (F.col("rsp_turn_idx") == F.col("req_turn_idx") + 1)
        & (F.col("rsp_ts") >= F.col("req_ts"))
        & (F.col("rsp_ts") <= F.col("req_ts") + F.expr(f"interval {max_lag}"))
    )
    joined = req.join(rsp, cond, "inner")
    return joined.select(
        F.col("req_conv_id").alias("conv_id"),
        F.col("req_turn_idx").alias("turn_idx"),
        "req_ts",
        "rsp_ts",
        (
            F.unix_micros(F.col("rsp_ts").cast("timestamp"))
            - F.unix_micros(F.col("req_ts").cast("timestamp"))
        ).alias("latency_us"),
        F.octet_length("req_text").alias("req_bytes"),
        F.octet_length("rsp_text").alias("rsp_bytes"),
    )


def split_roles(turns: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Filter one transcript stream into the two join sides. On a real bus
    these would be separate topics; filtering one stream twice is
    plan-equivalent (two scans of the same source, each with the filter
    pushed down)."""
    return (
        turns.where(F.col("role") == "user"),
        turns.where(F.col("role") == "assistant"),
    )

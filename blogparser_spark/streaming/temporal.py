"""Streaming temporal (as-of) enrichment: each event picks up the most
recent config row at or before its event time, per key, as the stream
flows — the streaming twin of operators/asof.asof_join.

Shape: config updates and events arrive UNIONED on one keyed stream with a
`side` tag ('cfg' | 'event') — the same union trick the batch operator
uses, which is also how a Kafka deployment would wire it (both topics
keyed by the join key, consumed into one grouped stream). State per key is
exactly the latest (cfg_ts, cfg_value) seen — O(1), no event buffering —
updated and applied in (ts, side) order inside each micro-batch, so a
config stamped at an event's exact timestamp is visible to it (DuckDB
`ASOF JOIN ... ON l.ts >= r.ts` tie semantics, matching the batch twin).

Ordering contract: WITHIN a micro-batch, event-time order is recovered by
sorting, so any arrival order is correct. ACROSS micro-batches the state
only moves forward: a config row arriving after a later-timestamped event
was already emitted cannot retro-enrich it (the emitted row is immutable —
standard processing-time caveat of streaming temporal joins; Flink's
temporal join has the same one bounded by its watermark). Sources that are
per-key append-ordered — Kafka partitions keyed by the join key, CDC logs —
therefore get exact batch parity, which is what the parity test asserts.

Scale: state store partitioned by the key; one tiny row per live key
(10^9 keys ≈ low GBs on RocksDB); no shuffle beyond the groupBy the state
store requires anyway.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENRICHED_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("asof_ts", TimestampType()),
        StructField("cfg_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cfg_ts", LongType()),  # epoch ns (flat state row)
        StructField("cfg_value", DoubleType()),
    ]
)


def _enrich_events(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cfg_ts, cfg_value = state.get if state.exists else (None, None)
    out: dict[str, list] = {c: [] for c in ENRICHED_SCHEMA.fieldNames()}
    # ONE sort over the whole micro-batch group: a key larger than the
    # Arrow chunk size (spark.sql.execution.arrow.maxRecordsPerBatch)
    # arrives as several pdfs, and sorting each chunk independently would
    # let a late-chunk config apply only after earlier-chunk events that
    # it should precede by (ts, side) order
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        ts_ns = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
        pdf = pdf.assign(tsns=ts_ns)
        # (ts, side) order: 'cfg' < 'event' makes an equal-ts config visible
        pdf = pdf.sort_values(["tsns", "side"], kind="stable")
        for row in pdf.itertuples(index=False):
            if row.side == "cfg":
                cfg_ts, cfg_value = int(row.tsns), float(row.value)
            else:
                out["user_id"].append(user_id)
                out["event_id"].append(int(row.event_id))
                out["ts"].append(pd.Timestamp(int(row.tsns)))
                out["asof_ts"].append(
                    pd.Timestamp(cfg_ts) if cfg_ts is not None else pd.NaT
                )
                out["cfg_value"].append(cfg_value)
    if cfg_ts is not None:  # keys that never saw a config keep no state
        state.update((cfg_ts, cfg_value))
    yield pd.DataFrame(out)


def streaming_asof_enrich(tagged_stream: DataFrame) -> DataFrame:
    """Stateful as-of enrichment over a unioned (user_id, ts, side,
    event_id, value) stream. Emits one enriched row per event; config rows
    only move state. The per-row Python loop runs over ONE micro-batch
    group at a time (Arrow-batched in, Arrow-batched out) — this is the
    applyInPandasWithState shape, not a row-at-a-time UDF in a batch plan.
    """
    return (
        tagged_stream.select("user_id", "ts", "side", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _enrich_events,
            outputStructType=ENRICHED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tag_streams(events: DataFrame, configs: DataFrame) -> DataFrame:
    """Union an events frame (user_id, ts, event_id) and a configs frame
    (user_id, ts, value) into the tagged shape streaming_asof_enrich
    consumes. Works on batch and streaming frames alike."""
    from pyspark.sql import functions as F

    e = events.select(
        "user_id",
        "ts",
        F.lit("event").alias("side"),
        F.col("event_id").cast("long"),
        F.lit(None).cast("double").alias("value"),
    )
    c = configs.select(
        "user_id",
        "ts",
        F.lit("cfg").alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("value").cast("double"),
    )
    return e.unionByName(c)

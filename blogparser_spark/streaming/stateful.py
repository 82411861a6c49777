"""Custom stateful streaming operator: per-conversation running aggregates
via applyInPandasWithState.

The built-in windowed aggregations cover per-sink counts; what they cannot
express is an arbitrary per-conversation accumulator that survives across
micro-batches — e.g. a running conversation profile (turn count, distinct
roles, first/last event time, parse-ok ratio) updated as turns stream in.
That is the applyInPandasWithState shape: state is an explicit typed tuple
per group key, updated with each Arrow batch of that key's new rows.

Scale notes: state lives in the state store partitioned by conv_id (the
group key), so hot conversations are single-partition by construction —
the same constraint as batch windows (operators/skew.py); the state row
here is O(1) per conv (counts + bounds), so 10^9 live conversations is
GBs of state, well within RocksDB state-store territory.
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

PROFILE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_ok", LongType()),
        StructField("ok_ratio", DoubleType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_ok", LongType()),
        StructField("first_ts", LongType()),  # epoch NANOseconds (flat state)
        StructField("last_ts", LongType()),
    ]
)


def _update_conv_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, n_ok, first_ns, last_ns = state.get
    else:
        n_turns, n_ok, first_ns, last_ns = 0, 0, None, None
    for pdf in pdfs:
        n_turns += len(pdf)
        n_ok += int((pdf["parse_status"] == "ok").sum())
        # normalize to ns regardless of the batch's arrow timestamp unit.
        # NULL ts rows still count as turns but must not enter the span:
        # NaT casts to int64-min, which would poison first_ts forever
        ts = pd.to_datetime(pdf["ts"]).dropna()
        if len(ts) == 0:
            continue
        ts_ns = ts.astype("datetime64[ns]").astype("int64")
        lo, hi = int(ts_ns.min()), int(ts_ns.max())
        first_ns = lo if first_ns is None else min(first_ns, lo)
        last_ns = hi if last_ns is None else max(last_ns, hi)
    state.update((n_turns, n_ok, first_ns, last_ns))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "n_ok": [n_ok],
            "ok_ratio": [round(n_ok / n_turns, 6) if n_turns else 0.0],
            "first_ts": [pd.Timestamp(first_ns)],
            "last_ts": [pd.Timestamp(last_ns)],
        }
    )


def conv_profiles(parsed_stream: DataFrame) -> DataFrame:
    """Streaming (conv_id → running profile). Emits the updated profile for
    every conv touched by each micro-batch (update semantics)."""
    return (
        parsed_stream.select("conv_id", "parse_status", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_profiles_available_now(
    spark, input_path: str, output_path: str, checkpoint_path: str
) -> DataFrame:
    """Drain the source through the stateful operator, appending each
    micro-batch's updated profiles (stamped with batch_id) to parquet via
    foreachBatch — the sink shape that supports checkpoint RECOVERY, so a
    second invocation resumes the per-conv counters instead of restarting
    them. Returns the latest profile per conv."""
    from pyspark.sql import Window

    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.streaming.pipeline import read_transcript_stream

    stream = parse_stage(read_transcript_stream(spark, input_path))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import pyspark.sql.functions as F

        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_path)

    q = (
        conv_profiles(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import pyspark.sql.functions as F

    all_rows = spark.read.parquet(output_path)
    w = Window.partitionBy("conv_id").orderBy(F.desc("batch_id"), F.desc("n_turns"))
    return (
        all_rows.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", "batch_id")
    )


# --------------------------------------------------------------- funnel ----

FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step_idx", LongType()),
        StructField("step", StringType()),
        StructField("step_ts", TimestampType()),
    ]
)

# progress counter + one epoch-ns slot per step (slots ≥ n_done are
# meaningless placeholders — an explicit counter, not a sign sentinel, so
# pre-1970 event times work and NaT can never fake completion)
FUNNEL_STATE_SCHEMA = StructType(
    [StructField("n_done", LongType())]
    + [StructField(f"t{i}", LongType()) for i in range(len(FUNNEL_STEPS))]
)


def _update_funnel(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user funnel progression (the streaming twin of
    aggregate.funnel_steps): completed step times persist in state; each
    batch advances the deepest incomplete step greedily over ts-sorted
    events (step i completes at the first steps[i] event strictly after
    step i-1's time — identical to the batch min-ts chain when each user's
    events arrive in event-time order across batches). Vectorized: one
    masked min per step, no per-row Python. Null event times are dropped
    (the batch twin's min()/comparison semantics ignore them too)."""
    (user,) = key
    if state.exists:
        got = list(state.get)
        n_done, t = int(got[0]), got[1:]
    else:
        n_done, t = 0, [0] * len(FUNNEL_STEPS)
    batch = pd.concat(list(pdfs), ignore_index=True)
    ts = pd.to_datetime(batch["ts"])
    valid = ts.notna()
    ts_ns = ts[valid].astype("datetime64[ns]").astype("int64")
    types = batch["event_type"][valid]
    new: list[tuple[int, str, int]] = []
    for i in range(n_done, len(FUNNEL_STEPS)):
        s = FUNNEL_STEPS[i]
        mask = types == s
        if i:
            mask &= ts_ns > t[i - 1]
        if not mask.any():
            break  # deeper steps need this one first
        t[i] = int(ts_ns[mask].min())
        n_done = i + 1
        new.append((i, s, t[i]))
    state.update((n_done, *t))
    if new:
        yield pd.DataFrame(
            {
                "user_id": [user] * len(new),
                "step_idx": [i for i, _, _ in new],
                "step": [s for _, s, _ in new],
                "step_ts": [pd.Timestamp(ns) for _, _, ns in new],
            }
        )


def streaming_funnel(events_stream: DataFrame) -> DataFrame:
    """Streaming funnel completions: emits (user, step_idx, step, step_ts)
    exactly once per newly completed step (append semantics — each step of
    each user is emitted in the micro-batch that completes it). State is
    len(steps) longs per user — O(1), 10^9-user-safe."""
    return (
        events_stream.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

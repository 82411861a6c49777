"""Streaming as-of enrichment: batch-twin parity and cross-batch state."""

from __future__ import annotations

import datetime as dt
import os
import time


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


def _corpus(spark):
    events = spark.createDataFrame(
        [
            ("u1", _ts(1), 1),   # before any cfg → NULL
            ("u1", _ts(5), 2),   # at cfg@5 → 10.0 (inclusive tie)
            ("u1", _ts(8), 3),   # → cfg@5
            ("u1", _ts(30), 4),  # batch 2 event, cfg@20 also batch 2
            ("u2", _ts(25), 5),  # batch 2 event, its only cfg is in batch 1
            ("u3", _ts(2), 6),   # key with no cfg at all
        ],
        "user_id string, ts timestamp, event_id long",
    )
    configs = spark.createDataFrame(
        [
            ("u1", _ts(5), 10.0),
            ("u2", _ts(3), 30.0),   # batch 1
            ("u1", _ts(20), 20.0),  # batch 2
        ],
        "user_id string, ts timestamp, value double",
    )
    return events, configs


def test_streaming_asof_matches_batch_twin(spark, tmp_path):
    from blogparser_spark.operators.asof import asof_join
    from blogparser_spark.streaming.temporal import (
        streaming_asof_enrich,
        tag_streams,
    )

    events, configs = _corpus(spark)
    tagged = tag_streams(events, configs)

    # two micro-batches split at t=10: later files get later mtimes so the
    # file source replays them in event-time order (per-key append order —
    # the ordering contract under which parity is exact)
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    half1 = tagged.filter("ts < timestamp'2024-01-01 00:10:00'")
    half2 = tagged.filter("ts >= timestamp'2024-01-01 00:10:00'")
    half1.coalesce(1).write.parquet(f"{inp}/b1")
    half2.coalesce(1).write.parquet(f"{inp}/b2")
    now = time.time()
    for sub, mt in (("b1", now - 60), ("b2", now)):
        for f in os.listdir(f"{inp}/{sub}"):
            os.utime(f"{inp}/{sub}/{f}", (mt, mt))

    stream = (
        spark.readStream.schema(tagged.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*")
    )
    q = (
        streaming_asof_enrich(stream)
        .writeStream.format("memory")
        .queryName("asof_enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r for r in spark.sql("SELECT * FROM asof_enriched").collect()
    }

    want = {
        r["event_id"]: r
        for r in asof_join(
            events,
            configs.withColumnRenamed("value", "cfg_value"),
            ["user_id"],
            "ts",
        ).collect()
    }
    assert set(got) == set(want) == {1, 2, 3, 4, 5, 6}
    for eid in want:
        assert got[eid]["cfg_value"] == want[eid]["cfg_value"], eid
        assert got[eid]["asof_ts"] == want[eid]["asof_ts"], eid
    # the load-bearing cross-batch case: u2's event in batch 2 was enriched
    # from state carried over from batch 1's config
    assert got[5]["cfg_value"] == 30.0
    assert got[1]["cfg_value"] is None and got[6]["cfg_value"] is None


def test_enrich_events_spans_arrow_chunks():
    """A key whose micro-batch group arrives as MULTIPLE Arrow chunks must
    still apply (ts, side) order across the whole group: a config in a
    later chunk with an earlier ts precedes events from earlier chunks.
    Drives _enrich_events directly with a chunked iterator (the
    applyInPandasWithState delivery shape for groups larger than
    spark.sql.execution.arrow.maxRecordsPerBatch)."""
    import pandas as pd

    from blogparser_spark.streaming.temporal import _enrich_events

    class FakeState:
        exists = False

        def update(self, v):
            self.stored = v

    # chunk 1: events at t=5,6; chunk 2: the config at t=1
    c1 = pd.DataFrame(
        {
            "user_id": ["u1", "u1"],
            "ts": [pd.Timestamp("2024-01-01 00:05"), pd.Timestamp("2024-01-01 00:06")],
            "side": ["event", "event"],
            "event_id": [1, 2],
            "value": [0.0, 0.0],
        }
    )
    c2 = pd.DataFrame(
        {
            "user_id": ["u1"],
            "ts": [pd.Timestamp("2024-01-01 00:01")],
            "side": ["cfg"],
            "event_id": [0],
            "value": [42.0],
        }
    )
    out = pd.concat(list(_enrich_events(("u1",), iter([c1, c2]), FakeState())))
    by_event = {int(r.event_id): r.cfg_value for r in out.itertuples()}
    assert by_event == {1: 42.0, 2: 42.0}  # the earlier-ts cfg applies to both

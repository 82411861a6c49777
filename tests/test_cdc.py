"""CDC latest-wins state + merge-upsert semantics (operators/cdc.py):
groupBy-max(struct) must equal the row_number-window formulation, and
merge must implement MERGE INTO (insert / update / ignore-stale,
delta-wins-on-tie)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Window
from pyspark.sql import functions as F

from blogparser_spark.operators.cdc import latest_state, merge_upsert

SCHEMA = "user_id long, event_id long, event_type string, ts timestamp, value double"
T0 = datetime(2024, 3, 1, 12, 0, 0)


def _rows(*specs):
    return [
        (uid, eid, et, T0 + timedelta(minutes=m), v)
        for uid, eid, et, m, v in specs
    ]


def test_latest_state_matches_window_formulation(spark):
    df = spark.createDataFrame(
        _rows(
            (1, 10, "view", 0, 1.0),
            (1, 11, "click", 5, 2.0),
            (1, 12, "buy", 3, 3.0),  # older ts than event 11
            (2, 20, "view", 0, 4.0),
        ),
        SCHEMA,
    )
    got = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value, r.n_changes)
        for r in latest_state(
            df, ["user_id"], ["ts", "event_id"], ["event_type", "value"]
        ).collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value, r.n_changes)
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count("*").over(Window.partitionBy("user_id")))
        .where("rn = 1")
        .collect()
    }
    assert got == want
    assert got[1][2] == "click"  # ts wins over event_id
    assert got[1][4] == 3


def test_latest_state_tiebreak_on_second_order_col(spark):
    df = spark.createDataFrame(
        _rows((1, 10, "a", 0, 1.0), (1, 11, "b", 0, 2.0)), SCHEMA
    )
    [r] = latest_state(
        df, ["user_id"], ["ts", "event_id"], ["event_type", "value"]
    ).collect()
    assert (r.event_id, r.event_type) == (11, "b")


def test_merge_upsert_insert_update_ignore_stale(spark):
    snapshot = spark.createDataFrame(
        _rows((1, 10, "view", 10, 1.0), (2, 20, "view", 10, 2.0)), SCHEMA
    )
    delta = spark.createDataFrame(
        _rows(
            (2, 21, "buy", 20, 9.0),  # update: newer
            (3, 30, "signup", 5, 7.0),  # insert: new key
            (1, 9, "stale", 0, 0.0),  # ignore: older than snapshot
        ),
        SCHEMA,
    )
    merged = merge_upsert(snapshot, delta, ["user_id"], ["ts", "event_id"])
    assert merged.columns == snapshot.columns
    got = {r.user_id: (r.event_id, r.event_type) for r in merged.collect()}
    assert got == {1: (10, "view"), 2: (21, "buy"), 3: (30, "signup")}


def test_merge_upsert_delta_wins_exact_order_tie(spark):
    snapshot = spark.createDataFrame(_rows((1, 10, "old", 0, 1.0)), SCHEMA)
    delta = spark.createDataFrame(_rows((1, 10, "new", 0, 1.0)), SCHEMA)
    [r] = merge_upsert(snapshot, delta, ["user_id"], ["ts", "event_id"]).collect()
    assert r.event_type == "new"


def test_merge_is_idempotent(spark):
    snapshot = spark.createDataFrame(
        _rows((1, 10, "view", 10, 1.0), (2, 20, "view", 10, 2.0)), SCHEMA
    )
    delta = spark.createDataFrame(_rows((2, 21, "buy", 20, 9.0)), SCHEMA)
    once = merge_upsert(snapshot, delta, ["user_id"], ["ts", "event_id"])
    twice = merge_upsert(once, delta, ["user_id"], ["ts", "event_id"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

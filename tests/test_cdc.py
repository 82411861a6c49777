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


def test_scd2_intervals_python_twin(spark):
    from blogparser_spark.operators.cdc import scd2_intervals

    df = spark.createDataFrame(
        _rows(
            # user 1: view -> view (re-assertion, same run) -> buy -> view
            (1, 10, "view", 0, 1.0),
            (1, 11, "view", 5, 1.0),
            (1, 12, "buy", 9, 2.0),
            (1, 13, "view", 14, 1.0),
            # user 2: single row -> one open interval
            (2, 20, "click", 2, 4.0),
            # user 3: same-ts tie — higher event_id wins the snapshot
            (3, 30, "view", 0, 1.0),
            (3, 31, "buy", 0, 2.0),
            (3, 32, "click", 7, 3.0),
        ),
        SCHEMA,
    )
    got = sorted(
        (
            (r.user_id, r.version, r.event_type, r.valid_from, r.valid_to,
             r.is_current)
            for r in scd2_intervals(
                df, ["user_id"], "ts", ["event_type"], ["event_id"]
            ).collect()
        )
    )
    t = lambda m: T0 + timedelta(minutes=m)
    assert got == [
        (1, 1, "view", t(0), t(9), False),
        (1, 2, "buy", t(9), t(14), False),
        (1, 3, "view", t(14), None, True),
        (2, 1, "click", t(2), None, True),
        (3, 1, "buy", t(0), t(7), False),  # event 31 won the ts-tie
        (3, 2, "click", t(7), None, True),
    ]
    # intervals tile: each key's valid_from chain is contiguous
    for uid in (1, 2, 3):
        ivs = [g for g in got if g[0] == uid]
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev[4] == nxt[3]


def test_scd2_null_state_runs(spark):
    from blogparser_spark.operators.cdc import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, 1, None, T0, 0.0),
            (1, 2, None, T0 + timedelta(minutes=1), 0.0),  # same NULL run
            (1, 3, "x", T0 + timedelta(minutes=2), 0.0),
        ],
        SCHEMA,
    )
    got = scd2_intervals(df, ["user_id"], "ts", ["event_type"], ["event_id"])
    rows = sorted((r.version, r.event_type) for r in got.collect())
    assert rows == [(1, None), (2, "x")]


def test_scd2_asof_matches_latest_state_at_cutoff(spark):
    from blogparser_spark.operators.cdc import scd2_asof, scd2_intervals

    df = spark.createDataFrame(
        _rows(
            (1, 10, "view", 0, 1.0),
            (1, 11, "buy", 5, 2.0),
            (1, 12, "view", 9, 1.0),
            (2, 20, "click", 7, 4.0),
        ),
        SCHEMA,
    )
    iv = scd2_intervals(df, ["user_id"], "ts", ["event_type"], ["event_id"])
    cut = T0 + timedelta(minutes=6)
    got = {
        r.user_id: r.event_type for r in scd2_asof(iv, cut).collect()
    }
    # independent formulation: latest event at or before the cutoff
    want = {
        r.user_id: r.event_type
        for r in latest_state(
            df.filter(F.col("ts") <= cut),
            ["user_id"], ["ts", "event_id"], ["event_type"],
        ).collect()
    }
    assert got == want == {1: "buy"}  # user 2's first event is after cut... 
    # user 2 at minute 7 is NOT yet present at minute 6
    assert 2 not in got
    # at the far future every key shows its current state
    later = {
        r.user_id: r.event_type
        for r in scd2_asof(iv, T0 + timedelta(days=1)).collect()
    }
    assert later == {1: "view", 2: "click"}

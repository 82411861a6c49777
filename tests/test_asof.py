"""Tests for the as-of (temporal) join operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(0), "e0"),   # before any config
            (2, "u1", _ts(5), "e5"),   # exactly at cfg ts → cfg visible
            (3, "u1", _ts(7), "e7"),   # between cfgs → cfg@5
            (4, "u1", _ts(20), "e20"),  # after second cfg → cfg@10
            (5, "u2", _ts(9), "x9"),   # other key → its own cfg@3
            (6, "u3", _ts(1), "z1"),   # key with no right rows at all
        ],
        "event_id long, user_id string, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 100.0),
            ("u1", _ts(10), 200.0),
            ("u2", _ts(3), 300.0),
        ],
        "user_id string, ts timestamp, cfg double",
    )
    return left, right


def test_asof_join_backward(spark):
    from blogparser_spark.operators.asof import asof_join

    left, right = _frames(spark)
    out = asof_join(left, right, ["user_id"], "ts")
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 6  # every left row survives
    assert rows[1]["cfg"] is None and rows[1]["asof_ts"] is None
    assert rows[2]["cfg"] == 100.0 and rows[2]["asof_ts"] == _ts(5)  # >= is inclusive
    assert rows[3]["cfg"] == 100.0
    assert rows[4]["cfg"] == 200.0 and rows[4]["asof_ts"] == _ts(10)
    assert rows[5]["cfg"] == 300.0
    assert rows[6]["cfg"] is None  # key never configured
    # left columns come back verbatim
    assert rows[4]["name"] == "e20"


def test_asof_join_single_shuffle(spark):
    """The union+window form costs exactly ONE exchange (on the key) — the
    whole point vs a pair-materializing range join."""
    from blogparser_spark.operators.asof import asof_join

    left, right = _frames(spark)
    out = asof_join(left, right, ["user_id"], "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_latest_per_key_ts_prereduce(spark):
    from blogparser_spark.operators.asof import asof_join, latest_per_key_ts

    left, _ = _frames(spark)
    # two right rows at the identical (key, ts): highest seq must win
    right = spark.createDataFrame(
        [("u1", _ts(5), 1, 111.0), ("u1", _ts(5), 2, 222.0)],
        "user_id string, ts timestamp, seq int, cfg double",
    )
    reduced = latest_per_key_ts(right, ["user_id"], "ts", "seq").drop("seq")
    assert reduced.count() == 1
    out = asof_join(left, reduced, ["user_id"], "ts")
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[3]["cfg"] == 222.0


def test_asof_join_composite_key(spark):
    from blogparser_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", "x", _ts(6), 1)], "k1 string, k2 string, ts timestamp, id int"
    )
    right = spark.createDataFrame(
        [("a", "x", _ts(2), 7.0), ("a", "y", _ts(4), 9.0)],
        "k1 string, k2 string, ts timestamp, v double",
    )
    out = asof_join(left, right, ["k1", "k2"], "ts").collect()
    assert len(out) == 1 and out[0]["v"] == 7.0  # (a,y) is a different key


def test_range_join_matches_between_reference(spark):
    """Bucketed interval join == the naive BETWEEN join, including a pair
    whose interval spans many buckets (must appear exactly ONCE — the
    point-bucket meet guarantees no dup) and boundary-inclusive semantics."""
    import datetime as dt

    from blogparser_spark.operators.asof import range_join_points_in_intervals

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    points = spark.createDataFrame(
        [(i, ts(h)) for i, h in enumerate([0, 5, 23, 24, 50, 100, 240])],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (0, ts(0), ts(24)),    # inclusive both ends: hits 0,5,23,24
            (1, ts(20), ts(60)),   # overlaps interval 0: 23,24,50 double-attribute
            (2, ts(0), ts(239)),   # spans 10 day-buckets: pairs must stay unique
            (3, ts(300), ts(310)), # empty window
        ],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in range_join_points_in_intervals(points, intervals).collect()
    )
    ref = sorted(
        (r["event_id"], r["iv_id"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")))
        .collect()
    )
    assert got == ref
    assert (0, 0) in got and (3, 1) in got and (3, 0) in got  # double attribution
    assert got.count((5, 2)) == 1  # long interval: exactly once
    assert all(iv != 3 for _, iv in got)


def test_range_join_bucket_size_invariant(spark):
    """Result set is independent of the quantization (bucket_seconds is a
    performance knob, not a semantics knob)."""
    import datetime as dt

    from blogparser_spark.operators.asof import range_join_points_in_intervals

    t0 = dt.datetime(2024, 3, 1)
    points = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=37 * i)) for i in range(40)],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (j, t0 + dt.timedelta(hours=3 * j), t0 + dt.timedelta(hours=3 * j + 5))
            for j in range(6)
        ],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    out = {}
    for bs in (3600, 86400, 60):
        out[bs] = sorted(
            (r["event_id"], r["iv_id"])
            for r in range_join_points_in_intervals(
                points, intervals, bucket_seconds=bs
            ).collect()
        )
    assert out[3600] == out[86400] == out[60] and out[3600]


def test_asof_join_ignores_null_right_timestamps(spark):
    """DuckDB ASOF (l.ts >= r.ts) never matches a NULL right timestamp; a
    NULL-ts config row must not forward-fill onto subsequent left rows."""
    from blogparser_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u1", _ts(2), "e2"), (2, "u1", _ts(8), "e8")],
        "event_id long, user_id string, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [("u1", None, 999.0), ("u1", _ts(5), 100.0)],
        "user_id string, ts timestamp, cfg double",
    )
    rows = {r["event_id"]: r for r in asof_join(left, right, ["user_id"], "ts").collect()}
    assert rows[1]["cfg"] is None and rows[1]["asof_ts"] is None
    assert rows[2]["cfg"] == 100.0

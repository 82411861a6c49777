"""Skew handling (SURVEY.md §7.4 risk 3, north-rule requirement): hot
conv_ids must not serialize the parse stage, and salting must never change
results. The fixture puts half of all turns in ONE conversation and lays the
input out clustered by conv (the layout where salting matters — a balanced
scan doesn't need it)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _skewed_df(spark, n_hot: int = 4000, n_cold_convs: int = 40, turns_each: int = 100):
    rows = []
    for t in range(n_hot):
        rows.append(("conv-hot", t, "user", f"payload {t} " * 8, "none",
                     datetime(2024, 1, 1)))
    for c in range(n_cold_convs):
        for t in range(turns_each):
            rows.append((f"conv-{c:03d}", t, "user", f"text {c} {t} " * 8, "none",
                         datetime(2024, 1, 1)))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    # cluster by conv (the adversarial layout): all of conv-hot in one partition
    return df.repartition(8, "conv_id")


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_salted_repartition_balances_hot_conv(spark):
    from blogparser_spark.operators.skew import salted_repartition

    df = _skewed_df(spark)
    before = _partition_sizes(df)
    n = df.count()
    assert max(before) >= n // 2  # the hot conv serializes one partition

    salted = salted_repartition(df, 8)
    after = _partition_sizes(salted)
    assert sum(after) == n
    # the hot conv is spread: no partition holds more than ~2× the mean
    assert max(after) <= 2 * (n // 8)


def test_salting_does_not_change_parse_results(spark):
    """Parse is per-row/order-free: salted and unsalted runs must produce
    identical routed row sets and sink counts."""
    from blogparser_spark.job import make_transform, transform

    df = _skewed_df(spark, n_hot=500, n_cold_convs=10, turns_each=20)
    plain = transform(df).select("conv_id", "turn_idx", "parse_status", "summary")
    salted = (
        make_transform(salt_parts=8)(df)
        .select("conv_id", "turn_idx", "parse_status", "summary")
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_hot_conv_window_ranks_correct(spark):
    """Per-conv windows cannot be salted — the hot conv's ranks must still
    be exact (one partition holds it; AQE + range isolation are the scale
    levers, correctness is non-negotiable)."""
    from blogparser_spark.operators.aggregate import turn_features

    df = _skewed_df(spark, n_hot=3000, n_cold_convs=5, turns_each=10)
    feats = turn_features(df).filter(F.col("conv_id") == "conv-hot")
    got = [r["turn_no"] for r in feats.orderBy("turn_idx").collect()]
    assert got == list(range(1, 3001))


def test_range_partition_reused_by_window(spark):
    """range_partition_for_windows must be REUSED by the per-conv window:
    exactly one exchange (the range one), no hashpartitioning — the
    property that lets a hot conv get a partition to itself instead of
    hash-colliding with other convs."""
    from blogparser_spark.operators.aggregate import turn_features
    from blogparser_spark.operators.skew import range_partition_for_windows

    df = _skewed_df(spark, n_hot=200, n_cold_convs=5, turns_each=10)
    pre = range_partition_for_windows(df, 8)
    plan = (
        turn_features(pre)._jdf.queryExecution().executedPlan().toString()
    )  # noqa: SLF001
    assert plan.count("Exchange") == 1
    assert "hashpartitioning" not in plan
    # and ranks stay exact
    got = [
        r["turn_no"]
        for r in turn_features(pre)
        .filter(F.col("conv_id") == "conv-hot")
        .orderBy("turn_idx")
        .collect()
    ]
    assert got == list(range(1, 201))


def test_equi_depth_bounds_order_stat_twin(spark):
    import math

    from blogparser_spark.operators.skew import equi_depth_bounds

    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", 5.0)
    ] * 37 + [("b", 9.0)] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    B = 4
    got = {
        (r.g, r.bucket): (r.boundary, r.n_rows)
        for r in equi_depth_bounds(df, ["g"], "v", n_buckets=B).collect()
    }
    vals = {"a": sorted(v for g, v in rows if g == "a"),
            "b": sorted(v for g, v in rows if g == "b")}
    for g, vs in vals.items():
        n = len(vs)
        for k in range(1, B):
            want = vs[math.ceil(k * n / B) - 1]
            assert got[(g, k)] == (want, n), (g, k)
    # skewed group: duplicate value produces equal boundaries (merged range)
    assert got[("b", 1)][0] == got[("b", 2)][0] == 5.0
    # uniform group: boundaries are the exact quartiles
    assert [got[("a", k)][0] for k in (1, 2, 3)] == [25.0, 50.0, 75.0]


def test_equi_depth_bounds_global_matches_grouped_form(spark):
    # the histogram + range-shard form must be value-identical to the
    # window form on the ungrouped path — ties, skew, and all-equal domains
    from blogparser_spark.operators.skew import (
        equi_depth_bounds,
        equi_depth_bounds_global,
    )

    rows = (
        [(float(v),) for v in range(1, 101)]
        + [(5.0,)] * 37
        + [(9.0,)] * 3
        + [(-2.5,)] * 8
    )
    df = spark.createDataFrame(rows, "v double")
    for B in (2, 4, 10):
        want = {
            r.bucket: (r.boundary, r.n_rows)
            for r in equi_depth_bounds(df, [], "v", n_buckets=B).collect()
        }
        got = {
            r.bucket: (r.boundary, r.n_rows)
            for r in equi_depth_bounds_global(df, "v", n_buckets=B).collect()
        }
        assert got == want, B
    # degenerate all-equal domain: every boundary is that value, one shard
    same = spark.createDataFrame([(7.0,)] * 9, "v double")
    got = equi_depth_bounds_global(same, "v", n_buckets=3).collect()
    assert sorted((r.bucket, r.boundary, r.n_rows) for r in got) == [
        (1, 7.0, 9),
        (2, 7.0, 9),
    ]


def test_equi_depth_bounds_global_plan_has_no_global_sort_window(spark):
    from blogparser_spark.operators.skew import equi_depth_bounds_global

    df = spark.createDataFrame([(float(i % 13),) for i in range(200)], "v double")
    plan = (
        equi_depth_bounds_global(df, "v", n_buckets=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        head = m.group(1).split(",")[0]
        assert " ASC" not in head and " DESC" not in head, m.group(0)


def test_salted_exact_distinct_ignores_null_values(spark):
    from blogparser_spark.operators.skew import salted_exact_distinct

    df = spark.createDataFrame(
        [("k", "a"), ("k", None), ("k", "b"), ("k", "a")], "k string, v string"
    )
    got = salted_exact_distinct(df, ["k"], "v").collect()[0]
    want = df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()[0]
    assert got.n_distinct == want.n == 2


def test_equi_depth_bounds_global_ignores_nulls(spark):
    from blogparser_spark.operators.skew import (
        equi_depth_bounds,
        equi_depth_bounds_global,
    )

    vals = [(float(v),) for v in range(1, 11)]
    df = spark.createDataFrame(vals + [(None,)] * 5, "v double")
    clean = spark.createDataFrame(vals, "v double")
    got = {
        r.bucket: (r.boundary, r.n_rows)
        for r in equi_depth_bounds_global(df, "v", n_buckets=4).collect()
    }
    want = {
        r.bucket: (r.boundary, r.n_rows)
        for r in equi_depth_bounds(clean, [], "v", n_buckets=4).collect()
    }
    assert got == want and got[1][0] == 3.0

"""Bucketed tables: identically-bucketed joins must plan WITHOUT a shuffle
Exchange on the bucketed sides — the write-time-shuffle trade that makes
repeated conv-grain joins local at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, transcripts):
    # conftest points spark.sql.warehouse.dir (static conf) at a temp dir
    from blogparser_spark.operators.storage import bucketed_join, write_bucketed

    turns = transcripts.select("conv_id", "turn_idx", "role")
    stats = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    write_bucketed(turns, "turns_b", n_buckets=4)
    write_bucketed(stats, "stats_b", n_buckets=4, sort_col=None)

    # tiny test tables would be broadcast (which bypasses bucketing and is
    # the right plan at this size); disable it to expose the bucket join the
    # planner picks once both sides are too big to broadcast
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "turns_b", "stats_b", "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # correctness: bucketed join equals plain join
    expect = turns.join(stats, "conv_id")
    assert joined.count() == expect.count()
    assert joined.exceptAll(expect).count() == 0

    spark.sql("DROP TABLE IF EXISTS turns_b")
    spark.sql("DROP TABLE IF EXISTS stats_b")

"""applyInPandasWithState conversation profiles: batch parity + state
persistence across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_conv_profiles_match_batch_and_resume(spark, tmp_path):
    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.stateful import run_profiles_available_now

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = transcripts_df(spark, n_convs=10, turns_per_conv=4)
    first.write.mode("overwrite").parquet(inp)

    got = run_profiles_available_now(spark, inp, out, ckpt)
    latest = {r["conv_id"]: r for r in got.collect()}

    batch = (
        parse_stage(first)
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.when(F.col("parse_status") == "ok", 1).otherwise(0)).alias("n_ok"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    for r in batch.collect():
        g = latest[r["conv_id"]]
        assert g["n_turns"] == r["n_turns"]
        assert g["n_ok"] == r["n_ok"]
        assert g["first_ts"] == r["first_ts"]
        assert g["last_ts"] == r["last_ts"]

    # restart with NEW files and the same checkpoint: counters must RESUME
    more = transcripts_df(spark, n_convs=10, turns_per_conv=4, seed=99)
    more.write.mode("append").parquet(inp)
    got2 = run_profiles_available_now(spark, inp, out, ckpt)
    latest2 = {r["conv_id"]: r for r in got2.collect()}
    combined = {
        r["conv_id"]: r["n_turns"]
        for r in parse_stage(spark.read.parquet(inp))
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .collect()
    }
    # every conv's latest profile must equal the FULL (both-batch) count —
    # counters resumed from state, not restarted
    assert latest2
    for conv_id, n in combined.items():
        assert latest2[conv_id]["n_turns"] == n, conv_id

"""Structured Streaming variant: dedup within watermark + batch parity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_dedups_and_matches_batch(spark, tmp_path):
    from blogparser_spark.job import transform
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import run_available_now

    base = transcripts_df(spark, n_convs=12, turns_per_conv=4)
    # duplicate a third of the rows — the stream must emit each turn once
    dup_input = base.unionAll(base.filter(F.col("turn_idx") % 3 == 0))
    inp = str(tmp_path / "in")
    dup_input.write.mode("overwrite").parquet(inp)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(spark, inp, out, ckpt)

    streamed = spark.read.parquet(out)
    assert streamed.count() == 48  # dups dropped
    assert streamed.select("conv_id", "turn_idx").distinct().count() == 48

    batch = transform(base).drop("images")
    cols = ["conv_id", "turn_idx", "parse_status", "sink_id", "title", "summary"]
    assert (
        streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
        and batch.select(cols).exceptAll(streamed.select(cols)).count() == 0
    )


def test_windowed_sink_counts_shape(spark, tmp_path):
    from blogparser_spark.operators.enrich import enrich
    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.operators.route import with_sink_id
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import (
        read_transcript_stream,
        windowed_sink_counts,
    )

    inp = str(tmp_path / "in2")
    src = transcripts_df(spark, n_convs=8, turns_per_conv=4)
    n_input = src.count()
    src.write.mode("overwrite").parquet(inp)

    # complete mode: append would withhold windows still inside the
    # watermark horizon at end-of-stream
    stream = read_transcript_stream(spark, inp)
    agg = windowed_sink_counts(with_sink_id(enrich(parse_stage(stream))))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from win_counts").collect()
    assert rows and all(r["n"] > 0 for r in rows)
    assert sum(r["n"] for r in rows) == n_input


def test_streaming_dedup_probe_matches_batch(spark, tmp_path):
    """Micro-batched ingest dedup must find exactly the pairs the one-shot
    batch probe finds over the same new docs, regardless of how the stream
    chops the input into batches."""
    from blogparser_spark.dataops.dedup import incremental_dedup_probe
    from blogparser_spark.streaming.pipeline import run_streaming_dedup_probe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 400).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") >= 400).select("doc_id", "text")

    inp = str(tmp_path / "in")
    # two files so availableNow may deliver multiple micro-batches
    new.filter(F.col("doc_id") < 450).write.mode("overwrite").parquet(inp)
    new.filter(F.col("doc_id") >= 450).coalesce(1).write.mode("append").parquet(inp)

    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_dedup_probe(spark, inp, corpus, out, ckpt, threshold=0.3)

    streamed = spark.read.parquet(out).select("corpus_id", "new_id", "jaccard")
    expect = incremental_dedup_probe(corpus, new, threshold=0.3)
    assert streamed.count() > 0
    assert streamed.exceptAll(expect).count() == 0
    assert expect.exceptAll(streamed).count() == 0


def test_streaming_hll_matches_batch(spark, tmp_path):
    """The merged streaming register state must equal the one-shot batch
    sketch over the same rows, however the stream chops the input — and a
    duplicate batch append (at-least-once replay) must not change it."""
    from blogparser_spark.dataops import sketches
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import read_hll_state, run_streaming_hll

    df = transcripts_df(spark, n_convs=30, turns_per_conv=5)
    inp = str(tmp_path / "in")
    df.filter(F.col("turn_idx") < 2).write.mode("overwrite").parquet(inp)
    df.filter(F.col("turn_idx") >= 2).coalesce(1).write.mode("append").parquet(inp)

    out = str(tmp_path / "hll")
    run_streaming_hll(spark, inp, out, str(tmp_path / "ckpt"), group_cols=("role",))

    merged = read_hll_state(spark, out, group_cols=("role",))
    batch = sketches.hll_registers(df, F.col("text"), ("role",))
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in batch.collect()}

    # replay-idempotence: append one batch's registers again
    spark.read.parquet(out).limit(50).write.mode("append").parquet(out)
    replayed = read_hll_state(spark, out, group_cols=("role",))
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in batch.collect()
    }


def test_streaming_cms_matches_batch_and_replay_dedup(spark, tmp_path):
    """The summed streaming counter state must equal the one-shot batch CMS
    over the same rows, and a replayed batch delivery (same batch_id,
    identical counter rows) must not double-count — addition is not
    idempotent, so read_cms_state's per-batch dedup is what restores
    exactly-once."""
    from blogparser_spark.dataops import sketches
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import read_cms_state, run_streaming_cms

    df = transcripts_df(spark, n_convs=30, turns_per_conv=5)
    inp = str(tmp_path / "in")
    df.filter(F.col("turn_idx") < 2).write.mode("overwrite").parquet(inp)
    df.filter(F.col("turn_idx") >= 2).coalesce(1).write.mode("append").parquet(inp)

    out = str(tmp_path / "cms")
    run_streaming_cms(spark, inp, out, str(tmp_path / "ckpt"), key_col="tool")

    merged = read_cms_state(spark, out)
    batch = sketches.cms_counters(df, F.col("tool").cast("string"), d=2, w=64)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in batch.collect()}

    # at-least-once replay: re-deliver one whole batch's counter rows
    state = spark.read.parquet(out)
    first_bid = state.agg(F.min("batch_id")).collect()[0][0]
    state.filter(F.col("batch_id") == first_bid).write.mode("append").parquet(out)
    replayed = read_cms_state(spark, out)
    assert {tuple(r) for r in replayed.collect()} == {
        tuple(r) for r in batch.collect()
    }


def test_streaming_sessionize_matches_batch_semantics(spark, tmp_path):
    """session_window must produce exactly the sessions the batch
    lag()-running-sum rule produces (merge iff gap < 30 min), including a
    session BRIDGED by an event that arrives between two others."""
    import datetime as dt

    from pyspark.sql import Window
    from blogparser_spark.streaming.pipeline import streaming_sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user a: 0,10,25 one session; 90,100 a second
        ("a", ts(0)), ("a", ts(10)), ("a", ts(25)), ("a", ts(90)), ("a", ts(100)),
        # user b: 0 and 40 split (gap 40 > 30); 55 bridges back onto 40
        ("b", ts(0)), ("b", ts(40)), ("b", ts(55)),
        # user c: single event
        ("c", ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    inp = str(tmp_path / "sess_in")
    df.write.mode("overwrite").parquet(inp)

    stream = spark.readStream.schema(df.schema).parquet(inp)
    agg = streaming_sessionize(stream, gap="30 minutes", watermark=None)
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("select * from sessions").collect()
    }

    # batch twin: break when gap >= 30 min (session_window merges iff < gap)
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    brk = F.when(
        prev.isNull() | (F.unix_timestamp("ts") - F.unix_timestamp(prev) >= 1800), 1
    ).otherwise(0)
    sess = (
        df.withColumn(
            "sid", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"), F.count("*").alias("n"))
    )
    batch = {
        (r["user_id"], r["s"], r["e"] + dt.timedelta(minutes=30)): r["n"]
        for r in sess.collect()
    }
    assert streamed == batch
    assert ("b", ts(40), ts(85)) in streamed  # 55 bridged onto 40: one session
    assert streamed[("a", ts(0), ts(55))] == 3


def test_streaming_sessionize_append_evicts_closed_sessions(spark, tmp_path):
    """Production path: with a watermark, a session whose end precedes the
    watermark is EMITTED (append mode) and its state evicted; open sessions
    stay in state. Two single-file micro-batches advance the watermark."""
    import datetime as dt
    import time

    from blogparser_spark.streaming.pipeline import streaming_sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    inp = str(tmp_path / "sess_app")
    df1 = spark.createDataFrame(
        [("a", t0), ("a", t0 + dt.timedelta(minutes=10))],
        "user_id string, ts timestamp",
    )
    df1.coalesce(1).write.mode("overwrite").parquet(inp)
    time.sleep(1.1)  # distinct mtime so the file source orders batch 2 last
    spark.createDataFrame(
        [("z", t0 + dt.timedelta(hours=10))], "user_id string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(inp)

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    agg = streaming_sessionize(stream, gap="30 minutes", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("sessions_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sessions_append").collect()
    # a's session (end t0+40m) closed once the watermark reached t0+9h;
    # z's session is still open in state, so append emits nothing for it
    assert [(r["user_id"], r["n_events"]) for r in rows] == [("a", 2)]
    assert rows[0]["session_start"] == t0
    assert rows[0]["session_end"] == t0 + dt.timedelta(minutes=40)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.joins import request_response_pairs, split_roles
    from blogparser_spark.streaming.pipeline import read_transcript_stream

    src = transcripts_df(spark, n_convs=16, turns_per_conv=6)
    inp = str(tmp_path / "ssj_in")
    src.write.mode("overwrite").parquet(inp)

    req_s, rsp_s = split_roles(read_transcript_stream(spark, inp))
    joined = request_response_pairs(req_s, rsp_s)
    out = str(tmp_path / "ssj_out")
    (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    streamed = spark.read.parquet(out)

    req_b, rsp_b = split_roles(src)
    batch = request_response_pairs(req_b, rsp_b)
    cols = ["conv_id", "turn_idx", "latency_us", "req_bytes", "rsp_bytes"]
    assert streamed.count() == batch.count() > 0
    assert streamed.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(streamed.select(cols)).count() == 0
    # every pair is a user turn answered by the NEXT turn within the lag
    rows = streamed.collect()
    assert all(0 <= r.latency_us <= 30 * 60 * 1_000_000 for r in rows)


def test_stream_stream_join_lag_bound_excludes_slow_responses(spark, tmp_path):
    from datetime import datetime, timedelta

    from blogparser_spark.streaming.joins import request_response_pairs

    base = datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda conv, idx, role, ts: (conv, idx, role, f"{role}-{idx}", "none", ts)
    reqs = spark.createDataFrame(
        [mk("c1", 0, "user", base), mk("c2", 0, "user", base)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rsps = spark.createDataFrame(
        [
            mk("c1", 1, "assistant", base + timedelta(minutes=5)),  # in lag
            mk("c2", 1, "assistant", base + timedelta(hours=2)),  # beyond lag
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = request_response_pairs(reqs, rsps, max_lag="30 minutes").collect()
    assert [r.conv_id for r in got] == ["c1"]
    assert got[0].latency_us == 5 * 60 * 1_000_000


def test_streaming_drift_matches_batch_psi(spark, tmp_path):
    """Per-batch streaming PSI rows must equal psi_drift computed in batch
    over the same (reference, slice) pairs, and replayed appends must not
    change the readout."""
    from blogparser_spark.dataops.profile import psi_drift
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import (
        read_drift_state,
        run_streaming_drift,
    )

    ref = transcripts_df(spark, n_convs=25, turns_per_conv=4)
    cur = transcripts_df(spark, n_convs=40, turns_per_conv=4)
    inp = str(tmp_path / "in")
    slice_a = cur.filter(F.col("conv_id").substr(-1, 1).isin("0", "1", "2"))
    slice_b = cur.subtract(slice_a)
    slice_a.write.mode("overwrite").parquet(inp)
    slice_b.coalesce(1).write.mode("append").parquet(inp)

    out = str(tmp_path / "drift")
    run_streaming_drift(
        spark, inp, out, str(tmp_path / "ckpt"), ref, group_cols=("role",)
    )
    got = {
        (r.batch_id, r.role): (r.n_ref, r.n_cur, r.psi)
        for r in read_drift_state(spark, out, ("role",)).collect()
    }
    assert got and len({b for b, _ in got}) >= 1

    # batch twin over the union of everything streamed, per batch file set
    bin_of = F.least(
        F.greatest(
            (F.length("text").cast("bigint") / F.lit(64)).cast("bigint"),
            F.lit(0),
        ),
        F.lit(15),
    )
    ref_b = ref.select("role", bin_of.alias("bin"))
    streamed = spark.read.parquet(inp).select("role", bin_of.alias("bin"))
    whole = {
        r.role: (r.n_ref, r.n_cur, r.psi)
        for r in psi_drift(ref_b, streamed, ("role",), "bin", 16).collect()
    }
    # summing n_cur across batches == whole-input n_cur per role
    per_role_n = {}
    for (b, role), (_, n_cur, _) in got.items():
        per_role_n[role] = per_role_n.get(role, 0) + n_cur
    assert per_role_n == {k: v[1] for k, v in whole.items()}
    # single-batch case: if only one batch fired, psi matches exactly
    if len({b for b, _ in got}) == 1:
        assert {r: v for (_, r), v in got.items()} == whole

    # replay-idempotence
    spark.read.parquet(out).write.mode("append").parquet(out)
    again = {
        (r.batch_id, r.role): (r.n_ref, r.n_cur, r.psi)
        for r in read_drift_state(spark, out, ("role",)).collect()
    }
    assert again == got


def test_streaming_kmv_matches_batch_and_replay_idempotent(spark, tmp_path):
    """The merged streaming KMV sample must equal the one-shot batch
    sample over the same rows (min-k of a union == min-k of the union of
    min-k's), and replayed appends must not change it — no batch-id
    bookkeeping needed."""
    from blogparser_spark.dataops import sketches
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import (
        read_kmv_state,
        run_streaming_kmv,
    )

    df = transcripts_df(spark, n_convs=30, turns_per_conv=5)
    inp = str(tmp_path / "in")
    df.filter(F.col("turn_idx") < 2).write.mode("overwrite").parquet(inp)
    df.filter(F.col("turn_idx") >= 2).coalesce(1).write.mode("append").parquet(inp)

    out = str(tmp_path / "kmv")
    run_streaming_kmv(spark, inp, out, str(tmp_path / "ckpt"), ("role",), k=32)
    merged = {
        (r.role, r.h) for r in read_kmv_state(spark, out, ("role",), 32).collect()
    }
    batch = {
        (r.role, r.h)
        for r in sketches.kmv_sample(df, F.col("text"), ("role",), 32).collect()
    }
    assert merged == batch

    # replay: append the whole state again — min-k is idempotent
    spark.read.parquet(out).write.mode("append").parquet(out)
    again = {
        (r.role, r.h) for r in read_kmv_state(spark, out, ("role",), 32).collect()
    }
    assert again == batch

    # the live sketch supports set algebra between streamed groups
    ov = sketches.kmv_pairwise_overlap(
        read_kmv_state(spark, out, ("role",), 32).withColumnRenamed("role", "g"),
        "g",
        32,
    ).collect()
    assert ov and all(r.union_est >= r.inter_est >= 0 for r in ov)


def test_streaming_lateness_accounting(spark, tmp_path):
    """A file arriving with event times far older than the running
    watermark must surface as late_rows > 0 — the explicit accountant is
    the only reliable way to tell 'no late data' from 'late data silently
    discarded' (Spark 4.x windowed aggs admit-then-evict late rows
    without incrementing numRowsDroppedByWatermark)."""
    import os
    import time

    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import (
        read_lateness_state,
        run_streaming_lateness,
    )

    base = transcripts_df(spark, n_convs=6, turns_per_conv=3).cache()
    n = base.count()
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    # file 1: fresh rows (sets the running max event time high)
    fresh = base.withColumn("ts", F.col("ts") + F.expr("interval 2 hours"))
    fresh.coalesce(1).write.mode("append").parquet(inp)
    time.sleep(1.1)  # mtime order = arrival order with maxFilesPerTrigger=1
    # file 2: event times 2h older — every row is below (max − 10 min)
    late = base.withColumn("turn_idx", F.col("turn_idx") + F.lit(100))
    late.coalesce(1).write.mode("append").parquet(inp)

    st = str(tmp_path / "state")
    run_streaming_lateness(
        spark, inp, st, str(tmp_path / "ckpt"), delay_seconds=600
    )
    audit = {r["batch_id"]: r for r in read_lateness_state(spark, st).collect()}
    assert len(audit) == 2
    assert sum(r["rows"] for r in audit.values()) == 2 * n
    first, second = audit[0], audit[1]
    assert first["late_rows"] == 0 and first["watermark_us"] is None
    assert second["late_rows"] == n  # ALL of the old file is late
    assert second["watermark_us"] == first["max_event_us"] - 600 * 1_000_000
    # the running max is monotone even though batch 2's events are older
    assert second["max_event_us"] == first["max_event_us"]


def test_lateness_audit_metrics_reader(spark, tmp_path):
    """lateness_audit parses recentProgress into per-batch rows — pinned
    here so a Spark-version rename of the progress keys surfaces."""
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import (
        lateness_audit,
        read_transcript_stream,
    )

    inp = str(tmp_path / "in")
    transcripts_df(spark, n_convs=4, turns_per_conv=2).write.parquet(inp)
    stream = read_transcript_stream(spark, inp)
    counted = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .count()
    )
    q = (
        counted.select("window.start", "count")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    audit = lateness_audit(q)
    assert audit and all(
        set(a) == {"batch_id", "input_rows", "dropped_by_watermark",
                   "state_rows", "watermark"}
        for a in audit
    )
    assert sum(a["input_rows"] for a in audit) > 0
    assert all(a["state_rows"] >= 0 and a["dropped_by_watermark"] >= 0 for a in audit)


def test_streaming_ivm_matches_batch_and_replay_dedup(spark, tmp_path):
    """The folded streaming CDC state must equal apply_retractable_delta
    over the same feed (stream-vs-batch parity), and a replayed batch
    delivery (same batch_id, identical signed-delta rows) must not
    double-apply — signed addition is not idempotent, so read_ivm_state's
    per-(batch_id, key) collapse is what restores exactly-once."""
    from blogparser_spark.operators.aggregate import (
        apply_retractable_delta,
        retractable_state,
    )
    from blogparser_spark.streaming.pipeline import (
        read_ivm_state,
        run_streaming_ivm,
    )

    schema = "event_type string, value double, op string"
    rows1 = [("click", 2.0, "I"), ("click", 3.0, "I"), ("view", 1.0, "I")]
    rows2 = [("click", 2.0, "D"), ("view", 4.0, "I"), ("buy", 9.0, "I"),
             ("view", 1.0, "D"), ("view", 4.0, "D")]
    inp = str(tmp_path / "cdc")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    out = str(tmp_path / "ivm")
    run_streaming_ivm(spark, inp, out, str(tmp_path / "ckpt"), schema)

    got = {
        r["event_type"]: (r["cnt"], float(r["vsum"]))
        for r in read_ivm_state(spark, out).collect()
    }
    # batch twin: empty base + the whole feed as one delta
    base = retractable_state(
        spark.createDataFrame([], schema).withColumnRenamed("op", "_"),
        ["event_type"], "value",
    )
    want_df = apply_retractable_delta(
        base,
        spark.createDataFrame(rows1 + rows2, schema),
        ["event_type"],
        "value",
    )
    want = {
        r["event_type"]: (r["cnt"], float(r["vsum"]))
        for r in want_df.collect()
    }
    assert got == want
    assert got["click"] == (1, 3.0)  # insert 2+3, delete 2
    assert "view" not in got  # fully retracted group vanishes

    # at-least-once replay: re-deliver one whole batch's delta rows
    state = spark.read.parquet(out)
    first_bid = state.agg(F.min("batch_id")).collect()[0][0]
    state.filter(F.col("batch_id") == first_bid).write.mode("append").parquet(out)
    replayed = {
        r["event_type"]: (r["cnt"], float(r["vsum"]))
        for r in read_ivm_state(spark, out).collect()
    }
    assert replayed == want


def test_streaming_extremum_ledger_promotes_and_snapshots(spark, tmp_path):
    """The streaming ledger must equal the batch ledger folded over the
    same CDC batches: batch 1 builds from inserts, batch 2 deletes the
    current max and the served extremum promotes the next candidate; the
    state sink holds one <=k-rows-per-key snapshot per batch, and serving
    reads only the latest."""
    import os

    from blogparser_spark.streaming.pipeline import (
        read_extremum_state,
        run_streaming_extremum,
    )

    schema = "event_type string, value double, op string"
    b1 = [("click", float(v), "I") for v in (1, 3, 5, 7, 9)] + [
        ("view", 2.0, "I"), ("view", 6.0, "I")
    ]
    b2 = [("click", 9.0, "D"), ("view", 8.0, "I")]
    inp = str(tmp_path / "cdc")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    st = str(tmp_path / "ledger")
    run_streaming_extremum(
        spark, inp, st, str(tmp_path / "ck"), schema, k=3
    )
    served = {
        r["event_type"]: r
        for r in read_extremum_state(spark, st).collect()
    }
    # delete-the-max promoted the next candidate; insert raised view's max
    assert served["click"]["extremum"] == 7.0
    assert served["view"]["extremum"] == 8.0
    assert not any(r["needs_recompute"] for r in served.values())

    # snapshot-per-batch layout, each snapshot <= k rows per key (+floor)
    snaps = sorted(d for d in os.listdir(st) if d.startswith("snap="))
    assert len(snaps) == 2
    last = spark.read.parquet(f"{st}/{snaps[-1]}")
    per_key = {r["event_type"]: 0 for r in last.collect()}
    for r in last.collect():
        per_key[r["event_type"]] += 1
    assert all(n <= 3 for n in per_key.values())
    # k=3 ledger over 5 click inserts truncated -> floor records the drop
    assert any(
        r["floor"] is not None for r in last.filter("event_type='click'").collect()
    )


def test_streaming_tablelog_route_exactly_once(spark, tmp_path):
    """foreachBatch → atomic marker'd tablelog commits: batch parity on the
    routed table, and a restart (fresh checkpoint re-delivering the same
    batch ids over the same source) commits NOTHING new — the marker
    ledger turns at-least-once re-delivery into exactly-once."""
    from blogparser_spark.job import transform
    from blogparser_spark.operators import tablelog as tl
    from blogparser_spark.sources.synthetic import transcripts_df
    from blogparser_spark.streaming.pipeline import run_streaming_tablelog_route

    base = transcripts_df(spark, n_convs=12, turns_per_conv=4)
    inp = str(tmp_path / "in")
    base.write.mode("overwrite").parquet(inp)
    t = str(tmp_path / "routed_log")

    run_streaming_tablelog_route(spark, inp, t, str(tmp_path / "ckpt1"))
    routed = tl.read_snapshot(spark, t)
    batch = transform(base).drop("images")
    cols = ["conv_id", "turn_idx", "parse_status", "sink_id", "title"]
    assert routed.select(cols).exceptAll(batch.select(cols)).count() == 0
    assert batch.select(cols).exceptAll(routed.select(cols)).count() == 0
    v_after = tl.current_version(t)

    # crash-restart that lost its checkpoint: same files, same batch ids
    run_streaming_tablelog_route(spark, inp, t, str(tmp_path / "ckpt2"))
    assert tl.current_version(t) == v_after  # every re-delivery was a no-op
    assert tl.read_snapshot(spark, t).count() == batch.count()

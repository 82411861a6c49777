"""Structured Streaming variant of the pipeline (SURVEY.md §7.6).

The batch pipeline is the contract; this module runs the SAME stage
functions (parse_stage, enrich — they are plain DataFrame→DataFrame) over a
streaming source, adding only the streaming-specific concerns:

  - event-time watermark on ts (late turns beyond the horizon are dropped),
  - exactly-once-ish dedup on (conv_id, turn_idx) within the watermark,
  - windowed per-sink counts (tumbling windows on event time),
  - checkpointLocation for offset + state recovery (the streaming analog of
    the batch layer's slice manifests).

Tests drive it with trigger(availableNow=True) over a parquet directory —
the same code path a Kafka/Iceberg-CDC source would take in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blogparser_spark.operators.enrich import enrich
from blogparser_spark.operators.parse import parse_stage
from blogparser_spark.operators.route import with_sink_id
from blogparser_spark.sources.synthetic import transcripts_df  # schema source


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream with the authoritative transcripts schema."""
    schema = transcripts_df(spark, n_convs=1, turns_per_conv=1).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_transform(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """watermark → dedup → parse → enrich → sink id. parse_stage and enrich
    are the batch functions, unchanged — stateless stages compose freely
    with streaming; only the dedup is stateful. dropDuplicatesWithinWatermark
    (not dropDuplicates: with a dedup key that excludes the event-time
    column, plain dropDuplicates never evicts state and it grows without
    bound on a real stream) — state for a key is dropped once the watermark
    passes its last-seen event time."""
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    return with_sink_id(enrich(parse_stage(deduped)))


def windowed_sink_counts(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling-window per-sink counts on event time. The watermark is
    APPLIED here (earlier revisions accepted the parameter and silently
    dropped it — in append mode that means no finalized windows and
    unbounded state); re-declaring on a stream that already set one
    upstream just moves the threshold for the ops below."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("sink_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            "sink_id",
            "n",
        )
    )


def run_available_now(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
) -> None:
    """Drain whatever is in the source now and stop — the batch-parity mode
    used by tests and by catch-up restarts (offsets + dedup state recover
    from checkpoint_path)."""
    stream = read_transcript_stream(spark, input_path)
    out = streaming_transform(stream, watermark).drop("images")
    q = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_tablelog_route(
    spark: SparkSession,
    input_path: str,
    table: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming fan-out with an EXACTLY-ONCE sink on the snapshot-log
    table format: each micro-batch routes through route_commit_tablelog as
    ONE atomic commit whose idempotence marker is the micro-batch id.
    foreachBatch alone is at-least-once — a crash between the sink write
    and the checkpoint commit re-delivers the batch with the SAME
    batch_id; the marker ledger (tablelog.append_idempotent) turns the
    re-delivery into a no-op, upgrading the sink to exactly-once. This is
    the design of Iceberg's own Spark streaming sink, which records batch
    ids in snapshot summaries and skips already-committed ones; readers
    additionally never observe a half-routed batch, because all sinks of a
    batch land in the one commit."""
    from blogparser_spark.operators.route import route_commit_tablelog
    from blogparser_spark.operators.tablelog import committed_markers

    stream = read_transcript_stream(spark, input_path, max_files_per_trigger)
    out = streaming_transform(stream, watermark)

    def route_batch(batch_df, batch_id: int) -> None:
        marker = f"batch-{batch_id}"
        if marker in committed_markers(table):
            # A re-delivered batch must still EXECUTE — the stateful dedup
            # upstream commits its state stores per micro-batch, and Spark
            # validates that every state partition committed. Only the sink
            # write is skipped; no second copy of the rows can land.
            batch_df.count()
            return
        route_commit_tablelog(batch_df, table, marker=marker)

    q = (
        out.writeStream.foreachBatch(route_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_dedup_probe(
    spark: SparkSession,
    input_path: str,
    corpus_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Streaming ingest dedup: every micro-batch of newly-arrived documents
    is probed against the STATIC existing corpus (dedup.incremental_dedup_probe
    — batch bands broadcast against the corpus bands / persisted index) and
    the verified (corpus_id, new_id, jaccard) pairs append to a parquet sink.
    foreachBatch is the right tool: the probe is a batch-to-batch join
    against a static side, which Structured Streaming cannot express as a
    stateful operator but runs exactly-once-ish per micro-batch under the
    checkpoint (batch id replays are idempotent appends of the same pairs).
    At 100 TB the static side is the write-once bucketed band index, so each
    micro-batch costs one batch-side band computation + a pruned probe."""
    from blogparser_spark.dataops.dedup import incremental_dedup_probe

    schema = f"{id_col} long, {text_col} string"
    stream = spark.readStream.schema(schema).parquet(input_path)

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        pairs = incremental_dedup_probe(
            corpus_df, batch_df, threshold, text_col, id_col
        ).withColumn("batch_id", F.lit(batch_id))
        pairs.write.mode("append").parquet(output_path)

    q = (
        stream.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_hll(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    group_cols: tuple[str, ...] = ("role",),
    text_col: str = "text",
    p: int = 8,
) -> None:
    """Streaming distinct-cardinality sketch: each micro-batch reduces to
    its per-group HLL register state (at most 2^p rows per group, whatever
    the batch size) and APPENDS it to the state sink; the live sketch is
    the max-merge of everything appended (read_hll_state). Append + merge
    is the right streaming shape for HLL because register max is
    idempotent and commutative — a replayed batch id appends duplicate
    register rows that change nothing, so the sketch is exactly correct
    under at-least-once delivery without transactional state."""
    from blogparser_spark.dataops import sketches

    schema = transcripts_df(spark, n_convs=1, turns_per_conv=1).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    def sketch_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs = sketches.hll_registers(batch_df, F.col(text_col), group_cols, p)
        regs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_path
        )

    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_hll_state(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ("role",)
) -> DataFrame:
    """Collapse the appended per-batch register states to the live sketch."""
    from blogparser_spark.dataops import sketches

    return sketches.hll_merge(
        spark.read.parquet(path).drop("batch_id"), group_cols=group_cols
    )


def run_streaming_cms(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    key_col: str = "tool",
    group_cols: tuple[str, ...] = (),
    d: int = 2,
    w: int = 64,
) -> None:
    """Streaming frequency sketch: each micro-batch reduces to its count-min
    counter grid (≤ d·w rows per group whatever the batch size) and APPENDS
    it tagged with the batch id. Unlike the HLL above, CMS merges by
    ADDITION, which is NOT idempotent — a replayed batch must not
    double-count. foreachBatch re-delivers a batch with the SAME batch_id
    and (deterministic sketch) identical counter rows, so read_cms_state
    restores exactly-once semantics relationally: it first collapses
    duplicate (batch_id, group, row, col) deliveries with max(cnt) —
    a no-op on the identical replays, by construction — and only then
    sums across batch ids. No transactional sink needed."""
    from blogparser_spark.dataops import sketches

    schema = transcripts_df(spark, n_convs=1, turns_per_conv=1).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    def sketch_batch(batch_df: DataFrame, batch_id: int) -> None:
        counters = sketches.cms_counters(
            batch_df, F.col(key_col).cast("string"), group_cols, d, w
        )
        counters.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_path)

    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_cms_state(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Collapse appended per-batch counter states to the live sketch:
    dedup replayed deliveries per batch_id (max = the identical row), then
    counter-wise addition across batches (cms_merge semantics)."""
    per_batch = (
        spark.read.parquet(path)
        .groupBy(*group_cols, "batch_id", "row", "col")
        .agg(F.max("cnt").alias("cnt"))
    )
    return per_batch.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Event-time session windows via Spark's native stateful
    `session_window` operator: each event opens [ts, ts+gap) and the state
    store MERGES overlapping windows per key as events arrive, so
    out-of-order events (within the watermark) extend or BRIDGE sessions —
    the streaming twin of the batch lag()-running-sum sessionize
    (queries.events_sessionize), which a foreachBatch port could never get
    right across micro-batch boundaries.

    Semantics: successive events merge iff their gap < `gap` (the batch
    twin breaks on diff > gap; the two differ only at exact-gap equality).
    session_end is last_event + gap (window end), not last_event.

    With a watermark, sessions whose end precedes it are emitted and their
    state EVICTED (append mode — bounded state at 10^12 turns); pass
    watermark=None only with complete-mode sinks (state retains every
    session — test harnesses, not production)."""
    s = stream.withWatermark(ts_col, watermark) if watermark else stream
    return (
        s.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def run_streaming_drift(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    reference: DataFrame,
    group_cols: tuple[str, ...] = ("role",),
    n_bins: int = 16,
    bin_div: int = 64,
    text_col: str = "text",
) -> None:
    """Streaming drift monitor: every micro-batch's text-length
    distribution is PSI-scored against a static REFERENCE slice, per
    group, and the (batch_id, group, n_ref, n_cur, psi) rows append to
    the monitor sink — the canary a production ingest runs so a schema
    change or upstream regression (truncated bodies, exploding
    boilerplate) alarms within one batch instead of one retraining.

    Shape per batch: the reference histogram (groups x n_bins rows) is
    aggregated ONCE here and collected into a static local frame, so a
    10^9-row reference is scanned exactly once for the whole stream —
    each batch compares against it via psi_from_counts, reducing itself
    to its own histogram before any comparison.
    Replay-safe the CMS way: a re-delivered batch id appends IDENTICAL
    psi rows (the sketch is deterministic), and read_drift_state dedups
    per (batch_id, group) before use."""
    from blogparser_spark.dataops.profile import psi_from_counts

    bin_col = F.least(
        F.greatest(
            (F.length(F.col(text_col)).cast("bigint") / F.lit(bin_div)).cast(
                "bigint"
            ),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )
    # ONE reference scan for the whole stream: the histogram is
    # groups×n_bins rows, rebuilt as a local static frame
    hist_q = (
        reference.select(*group_cols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("a"))
    )
    ref_hist = spark.createDataFrame(hist_q.collect(), schema=hist_q.schema)

    schema = transcripts_df(spark, n_convs=1, turns_per_conv=1).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = (
            batch_df.select(*group_cols, bin_col.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count("*").alias("b"))
        )
        out = psi_from_counts(ref_hist, cur, group_cols, "bin", n_bins)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_path)

    q = (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_drift_state(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ("role",)
) -> DataFrame:
    """Monitor readout: dedup replayed deliveries per (batch_id, group)
    (identical rows by construction — first() is the no-op collapse),
    ordered for alerting."""
    return (
        spark.read.parquet(path)
        .groupBy("batch_id", *group_cols)
        .agg(
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
            F.first("psi").alias("psi"),
        )
        .orderBy("batch_id", *group_cols)
    )


def run_streaming_kmv(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    group_cols: tuple[str, ...] = ("role",),
    text_col: str = "text",
    k: int = 64,
) -> None:
    """Streaming KMV distinct sketch: each micro-batch reduces to its
    per-group min-k hash sample (<= k rows per group whatever the batch
    size) and APPENDS it; the live sketch is the re-min-k of everything
    appended (read_kmv_state). Like the HLL state, append + merge is
    exactly correct under at-least-once delivery with NO batch-id
    bookkeeping: min-k of a multiset union is idempotent, so a replayed
    batch's duplicate sample rows change nothing. Unlike HLL, the merged
    KMV supports set ALGEBRA downstream — kmv_pairwise_overlap between
    live groups."""
    from blogparser_spark.dataops import sketches

    schema = transcripts_df(spark, n_convs=1, turns_per_conv=1).schema
    stream = spark.readStream.schema(schema).parquet(input_path)

    def sketch_batch(batch_df: DataFrame, batch_id: int) -> None:
        samp = sketches.kmv_sample(batch_df, F.col(text_col), group_cols, k)
        samp.write.mode("append").parquet(output_path)

    q = (
        stream.writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_kmv_state(
    spark: SparkSession,
    path: str,
    group_cols: tuple[str, ...] = ("role",),
    k: int = 64,
) -> DataFrame:
    """Collapse appended per-batch samples to the live min-k sketch
    (kmv_merge semantics: distinct then re-rank)."""
    from blogparser_spark.dataops import sketches

    return sketches.kmv_merge(
        spark.read.parquet(path), group_cols=group_cols, k=k
    )


def lateness_audit(query) -> list[dict]:
    """Per-micro-batch late-data accounting from a finished (or running)
    StreamingQuery: rows the watermark DROPPED, rows the state operators
    kept, and the watermark each batch ran with — the observability
    counterpart of dropDuplicatesWithinWatermark / windowed aggregation,
    where late rows vanish SILENTLY unless someone reads these metrics.
    A pipeline that dedups or windows without this audit cannot tell
    'no late data' from 'late data discarded'.

    Caveat (measured on Spark 4.1): windowed aggregations can ADMIT
    sub-watermark rows into state and evict them at commit without
    incrementing numRowsDroppedByWatermark, and
    dropDuplicatesWithinWatermark passes late rows through by design —
    so 0 here does not prove no late data. run_streaming_lateness below
    is the explicit accountant to alert on.

    Pure driver-side read of query.recentProgress (Spark keeps the last
    ~100 progress events); no effect on the stream. Returns one dict per
    batch: batch_id, input_rows, dropped_by_watermark (summed over state
    operators), state_rows, watermark."""
    out: list[dict] = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        out.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": int(p.get("numInputRows") or 0),
                "dropped_by_watermark": sum(
                    int(o.get("numRowsDroppedByWatermark") or 0) for o in ops
                ),
                "state_rows": sum(int(o.get("numRowsTotal") or 0) for o in ops),
                "watermark": (p.get("eventTime") or {}).get("watermark"),
            }
        )
    return out


def run_streaming_lateness(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    checkpoint: str,
    delay_seconds: int = 600,
    ts_col: str = "ts",
) -> None:
    """Explicit per-micro-batch late-data accounting: foreachBatch tracks
    the running max event time and counts each batch's rows older than
    (running max − delay) — exactly the rows a watermark of that delay
    would make a stateful operator silently discard. Spark's own
    numRowsDroppedByWatermark metric is operator- and version-dependent
    (4.x windowed aggs admit-then-evict without counting a drop — see
    lateness_audit), so pipelines that must ALERT on late data need this
    explicit accountant, not the engine metric.

    Appends one row per batch (batch_id, rows, late_rows, min/max event
    micros, watermark micros); the watermark is recomputed from the state
    sink itself, so a restart resumes the same running max without side
    state. Replay safety (the run_streaming_kmv convention): the running
    max is read from rows with batch_id < the current batch only, so a
    replayed batch recomputes the IDENTICAL row regardless of its own
    crashed attempt, and read_lateness_state dedupes on batch_id — the
    audit is exactly-correct under at-least-once foreachBatch delivery.
    Per-batch cost: one max + one filtered count."""
    import os

    stream = read_transcript_stream(spark, input_path, max_files_per_trigger=1)
    delay_us = delay_seconds * 1_000_000

    def audit_batch(batch_df: DataFrame, batch_id: int) -> None:
        us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        # missing state dir = first batch; any OTHER read failure must fail
        # the batch loudly — treating it as "first batch" would reset the
        # watermark and record genuinely late rows as on-time, the exact
        # silent failure this accountant exists to prevent
        if os.path.isdir(state_path):
            prev = (
                spark.read.parquet(state_path)
                .filter(F.col("batch_id") < batch_id)
                .agg(F.max("max_event_us"))
                .collect()[0][0]
            )
        else:
            prev = None
        wm = (prev - delay_us) if prev is not None else None
        row = batch_df.agg(
            F.count("*").alias("rows"),
            F.min(us).alias("min_event_us"),
            F.max(us).alias("max_event_us"),
            F.sum(
                F.when(us < F.lit(wm), 1).otherwise(0)
                if wm is not None
                else F.lit(0)
            ).alias("late_rows"),
        ).collect()[0]
        # explicit None handling: `or`-chains would clamp legitimate
        # zero/negative epochs (pre-1970 corruption — exactly what a
        # lateness audit should surface) to NULL and disable detection
        candidates = [
            x for x in (row["max_event_us"], prev) if x is not None
        ]
        running = max(candidates) if candidates else None
        out = spark.createDataFrame(
            [
                (
                    batch_id,
                    int(row["rows"]),
                    int(row["late_rows"] or 0),
                    row["min_event_us"],
                    running,  # monotone across batches
                    wm,
                )
            ],
            "batch_id long, rows long, late_rows long, min_event_us long, "
            "max_event_us long, watermark_us long",
        )
        out.write.mode("append").parquet(state_path)

    q = (
        stream.writeStream.foreachBatch(audit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_lateness_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The audit rows in batch order. dropDuplicates on the full row: a
    replayed batch (crash between append and checkpoint commit) appends a
    byte-identical duplicate — its recomputation reads only earlier
    batch_ids — so dedup restores exactly-once semantics for readers."""
    return spark.read.parquet(state_path).dropDuplicates(["batch_id"]).orderBy(
        "batch_id"
    )


def run_streaming_ivm(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: str,
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    op_col: str = "op",
) -> None:
    """Streaming incremental view maintenance over a CDC feed: each
    micro-batch of op∈{'I','D'} rows reduces to its per-key SIGNED delta
    state (cnt, decimal vsum — the apply_retractable_delta algebra) and
    APPENDS it tagged with the batch id; the live view is the fold of
    everything appended (read_ivm_state). Like the CMS sink, signed
    addition is not idempotent, so at-least-once replay safety comes
    relationally: a re-delivered batch re-computes the IDENTICAL delta
    rows under the same batch_id (the reduction is deterministic), and
    the reader collapses per-(batch_id, key) duplicates before summing
    across batches. The raw CDC rows are never retained — per batch only
    |keys| rows land in the sink, the 10^12-row-feed shape."""
    stream = spark.readStream.schema(schema).parquet(input_path)
    kc = list(key_cols)

    def delta_batch(batch_df: DataFrame, batch_id: int) -> None:
        sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
        d = batch_df.groupBy(*kc).agg(
            F.sum(sign).cast("bigint").alias("cnt"),
            F.sum(sign * F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("vsum"),
        )
        d.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_path)

    q = (
        stream.writeStream.foreachBatch(delta_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_ivm_state(
    spark: SparkSession, path: str, key_cols: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Collapse the appended per-batch signed deltas to the live view:
    dedup replayed deliveries per (batch_id, key) — identical rows by
    construction, max() is the identity collapse — then fold across
    batches; zero-count groups vanish exactly as the batch algebra's
    refresh does."""
    kc = list(key_cols)
    per_batch = (
        spark.read.parquet(path)
        .groupBy(*kc, "batch_id")
        .agg(F.max("cnt").alias("cnt"), F.max("vsum").alias("vsum"))
    )
    return (
        per_batch.groupBy(*kc)
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("vsum").cast("decimal(18,2)").alias("vsum"),
        )
        .filter(F.col("cnt") != 0)
    )


def run_streaming_extremum(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    checkpoint_path: str,
    schema: str,
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    op_col: str = "op",
    k: int = 8,
    largest: bool = True,
) -> None:
    """Streaming MIN/MAX maintenance under retractions: each CDC
    micro-batch folds into the persisted extremum LEDGER
    (aggregate.refresh_extremum_ledger — the k-candidate state that
    makes deletes of the current extremum cheap and exhaustion explicit)
    and the refreshed ledger is written as a SNAPSHOT under the batch id.
    Unlike the append-only sketch/delta sinks, ledger refresh is a
    stateful rewrite, so the streaming shape is snapshot-per-batch: the
    reader serves the HIGHEST batch id (read_extremum_state), a replayed
    batch deterministically rewrites its own snapshot (same input + same
    prior snapshot → same rows), and the checkpoint serializes batch
    order. Snapshot size is ≤ k rows per live key — ledger state, never
    history."""
    from blogparser_spark.operators.aggregate import refresh_extremum_ledger

    # one file per micro-batch: the ledger fold is genuinely incremental
    # (availableNow would otherwise coalesce a backlog into one batch)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )
    kc = list(key_cols)
    types = {
        f.name: f.dataType.simpleString()
        for f in spark.createDataFrame([], schema).schema.fields
    }
    empty_state = spark.createDataFrame(
        [],
        ", ".join(
            [f"{c} {types[c]}" for c in kc]
            + [
                f"{value_col} {types[value_col]}",
                "cnt bigint",
                f"floor {types[value_col]}",
            ]
        ),
    )

    def refresh_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        snaps = []
        if os.path.isdir(state_path):
            snaps = sorted(
                int(d.split("=", 1)[1])
                for d in os.listdir(state_path)
                if d.startswith("snap=") and int(d.split("=", 1)[1]) < batch_id
            )
        state = (
            spark.read.parquet(f"{state_path}/snap={snaps[-1]}")
            if snaps
            else empty_state
        )
        refreshed = refresh_extremum_ledger(
            state, batch_df, kc, value_col, k=k, largest=largest, op_col=op_col
        )
        refreshed.write.mode("overwrite").parquet(
            f"{state_path}/snap={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(refresh_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_extremum_state(
    spark: SparkSession,
    state_path: str,
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    largest: bool = True,
) -> DataFrame:
    """Serve the extremum off the LATEST ledger snapshot (highest batch
    id) with the exhaustion flag — aggregate.extremum_serve over the
    live state."""
    import os

    from blogparser_spark.operators.aggregate import extremum_serve

    snaps = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(state_path)
        if d.startswith("snap=")
    )
    state = spark.read.parquet(f"{state_path}/snap={snaps[-1]}")
    return extremum_serve(state, list(key_cols), value_col, largest)

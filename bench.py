"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

The flagship pipeline benchmark builds a transcript table DISTRIBUTEDLY
(documents × explode(K turns), HTML-wrapped payload variants) so generation
never bottlenecks on the driver — the same shape a 10^12-turn Iceberg scan
would have, just smaller.

    python bench.py                 # driver mode: one JSON line
    python bench.py --scaling       # local[4] vs local[16] interleaved
                                    # efficiency report (min-of-rounds)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 100 turns/doc → 500k turns at sf0.1: enough work that the pipeline timing
# measures throughput rather than the ~5s constant of planning + codegen
TURNS_PER_DOC = int(os.environ.get("SPARK_GRAFT_TURNS_PER_DOC", "100"))


def build_transcripts(spark, sf_dir: str, turns_per_doc: int | None = None):
    """documents → K turns each, generated executor-side (explode, no driver
    loop). conv_id = doc, turn_idx 0..K-1, payload variants exercise every
    parse path."""
    from pyspark.sql import functions as F

    turns = TURNS_PER_DOC if turns_per_doc is None else turns_per_doc

    # the docs parquet is one file → one scan partition; the explode fan-out
    # inherits it, which would feed the whole corpus to ONE core. Repartition
    # the narrow side BEFORE the explode (5k-row shuffle, trivial) so the
    # 200× fan-out lands spread across the cluster.
    n_parts = spark.sparkContext.defaultParallelism
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(n_parts)
    t = d.select(
        F.concat(F.lit("conv-"), F.col("doc_id")).alias("conv_id"),
        F.col("doc_id"),
        F.col("text").alias("payload"),
        F.explode(F.sequence(F.lit(0), F.lit(turns - 1))).alias("turn_idx"),
    )
    v = (F.col("doc_id") + F.col("turn_idx")) % 4
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    tools = F.array(
        F.lit("search"), F.lit("browser"), F.lit("python"), F.lit("bash"), F.lit("none")
    )
    html = (
        F.when(
            v == 0,
            F.concat(
                F.lit("<h1>Doc "),
                F.col("doc_id"),
                F.lit('</h1><span class="date">2023-10-20</span><div class="entry-content">'),
                F.col("payload"),
                F.lit("</div>"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit('<meta property="og:title" content="Doc '),
                F.col("doc_id"),
                F.lit('"><article>'),
                F.col("payload"),
                F.lit("</article>"),
            ),
        )
        .when(v == 2, F.concat(F.lit("<article>no title "), F.col("payload"), F.lit("</article>")))
        .otherwise(F.col("payload"))
    )
    return t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(roles, (v + 1).cast("int")).alias("role"),
        html.alias("text"),
        F.element_at(tools, ((F.col("doc_id") + F.col("turn_idx")) % 5 + 1).cast("int")).alias("tool"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id") * 30 + F.col("turn_idx"))
        ).alias("ts"),
    )


def transcripts_parquet(spark, sf_dir: str, turns_per_doc: int | None = None) -> str:
    """Materialize the synthetic transcript table to parquet ONCE (per
    sf/turn setting) and return its path. Timed runs then SCAN it — the
    north rule measures parse→route→aggregate throughput over an Iceberg
    corpus scan, so the row generator (HTML concat per turn, pure bench
    scaffolding) must not sit inside the timed plan. 64 output files give
    balanced splits at every parallelism level."""
    turns = TURNS_PER_DOC if turns_per_doc is None else turns_per_doc
    path = f"/tmp/spark_graft_bench/transcripts_{os.path.basename(sf_dir.rstrip('/'))}_{turns}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build_transcripts(spark, sf_dir, turns).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def _bench_spark(cpus: int, app_name: str):
    """Benchmark sessions pin and PRE-TOUCH the heap (-Xms=-Xmx,
    AlwaysPreTouch): the sandbox host provisions fresh pages to this VM at
    ~100-200 MB/s under load, and ParallelGC un-commits heap between runs,
    so an unpinned session re-faults host pages inside the timed window
    (measured 33.8s vs 105s for identical runs). Pre-touching moves that
    cost to session startup, outside every timing. 16g is ample for the
    500k-5M-turn workloads once GC is the throughput collector."""
    from blogparser_spark.session import get_spark

    mem = os.environ.get("SPARK_GRAFT_BENCH_MEM", "16g")
    return get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name=app_name,
        extra_conf={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -Xms{mem} -XX:+AlwaysPreTouch"
            ),
        },
    )


def _quiesce(spark) -> None:
    """Collect the previous query's JVM garbage before timing the next one —
    the 500k-turn pipeline job otherwise taxes the following query with its
    full-GC debt (measured 7s→48s on the query after it)."""
    try:
        spark._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.5)
    except Exception:
        pass


def run_headline(
    spark, sf_dir: str
) -> tuple[dict[str, float], dict[str, float], int]:
    from pyspark.sql import functions as F

    from blogparser_spark.dataops.dedup import minhash_lsh_candidates
    from blogparser_spark.dataops.similarity import brute_force_topk_matmul
    from blogparser_spark.dataops.textstats import with_fingerprint, with_langid, with_quality
    from blogparser_spark.operators.aggregate import sink_counts
    from blogparser_spark.operators.enrich import enrich
    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.queries import (
        bm25_top2,
        conv_window_stats,
        events_sessionize,
        pricing_rollup,
    )

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}

    # Session warmup: spawn the Python UDF workers, JIT the Arrow path, and
    # fault in the workers' batch buffers (32 workers × pandas/Arrow
    # allocations — fresh pages arrive from the host at ~100-200 MB/s under
    # load, so an undersized warmup leaves that cost in the first timed
    # run). These are per-session (per-executor-JVM) one-offs a
    # long-running cluster pays once; with them excluded, `queries_cold`
    # measures what a NEW PLAN costs (whole-stage-codegen compile), the
    # per-plan-shape number that recurs at scale.
    warm = build_transcripts(spark, sf_dir).limit(100_000)
    sink_counts(enrich(parse_stage(warm))).collect()

    def bench(name, thunk, reps=2):
        """First run pays one-off whole-stage-codegen compile + JIT + python
        worker startup (recorded as cold); steady-state = min of the repeat
        runs — the number a long job sees per unit of work. Quiesce BETWEEN
        runs too: each fresh plan leaves its run's allocation debt behind,
        and min-of-N should measure the plan, not the previous run's GC."""
        _quiesce(spark)
        t0 = time.time()
        thunk()
        cold[name] = round(time.time() - t0, 3)
        best = cold[name]
        for _ in range(reps):
            _quiesce(spark)
            t0 = time.time()
            thunk()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # q_pipeline scans a materialized transcript table (the Iceberg-corpus
    # shape of the north rule) — generation happens once, outside timing
    tpath = transcripts_parquet(spark, sf_dir)
    n_turns = spark.read.parquet(tpath).count()
    # count() is footer-only; touch the data pages so the first timed run
    # measures the plan, not the page cache (a long job's steady state)
    spark.read.parquet(tpath).agg(F.sum(F.length("text"))).collect()

    bench(
        "q_pipeline",
        lambda: sink_counts(enrich(parse_stage(spark.read.parquet(tpath)))).collect(),
        # JIT keeps improving the 500k-turn plan through ~run 3, and
        # min-of-N needs headroom against host interference bursts
        # (interleaved A/B measured the SAME code at 3.6s and 7.3s best
        # within minutes — the host window, not the plan, is the variance)
        reps=6,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench(
        "q_textstats",
        lambda: with_quality(with_langid(with_fingerprint(docs)))
        .agg(F.count("*"), F.avg("quality"), F.countDistinct("fingerprint"))
        .collect(),
    )
    bench("q_bm25", lambda: bm25_top2(spark, sf_dir).collect())
    bench("q_minhash_lsh", lambda: minhash_lsh_candidates(docs).count())
    bench(
        "q_ann",
        # the matmul local-top-k plan: join-free, ≤ k·parts·queries shuffle
        lambda: brute_force_topk_matmul(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), 10, 10
        ).count(),
    )
    # PQ serving path: codebooks are a train-once offline artifact, so they
    # are built OUTSIDE timing; the benched plan is encode+ADC-LUT top-k
    # over compressed codes (the 64×-smaller-read scale lever)
    from blogparser_spark.dataops.similarity import pq_adc_topk, pq_train

    _emb_df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _pq_cb = pq_train(_emb_df, m=4, ksub=16, iters=1)
    bench("q_pq_adc", lambda: pq_adc_topk(_emb_df, _pq_cb, 10, 10).count())
    bench("q_window", lambda: conv_window_stats(spark, sf_dir).collect())
    bench("q_sessionize", lambda: events_sessionize(spark, sf_dir).count())
    bench("q_pricing", lambda: pricing_rollup(spark, sf_dir).collect())
    return timings, cold, n_turns


def _host_bw_gbps() -> float:
    """Memory-bandwidth canary (GB/s of a 10 MB memcpy): the sandbox HOST's
    page provisioning swings 10-100× over time (BASELINE.md noise note) —
    recording it alongside the timings lets a reader separate code
    regressions from host windows."""
    import numpy as np
    import time as _t

    a = np.ones(10_000_000, dtype=np.uint8)
    best = 0.0
    for _ in range(3):
        t0 = _t.perf_counter()
        a.copy()
        best = max(best, 0.01 / (_t.perf_counter() - t0))
    return round(best, 2)


def one_run(cpus: int, sf_dir: str) -> dict:
    bw = _host_bw_gbps()
    spark = _bench_spark(cpus, f"bench-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    timings, cold, n_turns = run_headline(spark, sf_dir)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "sf": sf_dir,
        "n_turns": n_turns,
        "turns_per_sec_pipeline": round(n_turns / timings["q_pipeline"], 1),
        "cpus": cpus,
        "host_bw_gbps": bw,
    }
    spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_run(sf_dir)))
        return
    # Two INDEPENDENT sessions, best-of reported at top level: identical
    # code has measured 7.8-9.4s headline totals across host windows
    # (BASELINE.md noise notes), so a single session cannot distinguish a
    # code regression from a window — the JSON itself carries the noise
    # band (per-session totals + gauges) instead of external prose. If
    # the first session ran long (bad host window), the second is skipped
    # so the harness's own runtime stays bounded; the JSON then carries
    # one session and the reader knows why.
    t0 = time.time()
    runs = [one_run(cpus, sf_dir)]
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "420"))
    if time.time() - t0 < budget:
        runs.append(one_run(cpus, sf_dir))
    out = dict(min(runs, key=lambda r: r["value"]))
    out["sessions"] = [
        {
            "value": r["value"],
            "queries": r["queries"],
            "queries_cold": r["queries_cold"],
            "host_bw_gbps": r["host_bw_gbps"],
        }
        for r in runs
    ]
    print(json.dumps(out))


def pipeline_throughput(cpus: int, sf_dir: str, repeats: int = 5) -> dict:
    """Steady-state parse→enrich→aggregate throughput at one parallelism
    level. Each timed run builds a FRESH plan — re-collecting one plan
    instance reuses its shuffle map outputs (skipped stages), even with AQE
    off, and measures nothing. The constant per-run planning cost (~2-3 s)
    is drowned by sizing the input to minutes of work (5M turns default)."""
    from blogparser_spark.operators.aggregate import sink_counts
    from blogparser_spark.operators.enrich import enrich
    from blogparser_spark.operators.parse import parse_stage

    spark = _bench_spark(cpus, f"scale-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    tpath = transcripts_parquet(spark, sf_dir)
    n_turns = spark.read.parquet(tpath).count()
    times = []
    for _ in range(repeats):
        _quiesce(spark)  # previous run's GC debt must not tax this run
        t0 = time.time()
        sink_counts(enrich(parse_stage(spark.read.parquet(tpath)))).collect()
        times.append(round(time.time() - t0, 3))
    spark.stop()
    best = min(times[1:])  # drop the cold run (codegen/JIT/worker startup)
    return {
        "cpus": cpus,
        "n_turns": n_turns,
        "cold_sec": times[0],
        "runs_sec": times[1:],
        "best_sec": best,
        "turns_per_sec": round(n_turns / best, 1),
    }


def scaling_run(sf_dir: str, rounds: int = 2) -> dict:
    """N vs 4N cores on identical input (the sandbox substitute for N vs 4N
    executors). Uses local[4] vs local[16] so the 4N level still leaves
    machine headroom: at local[32] every hardware thread is busy and the
    measurement includes single-box memory-bandwidth/turbo contention that
    a 4×-machines cluster would not have.

    Noise protocol: the sandbox VM sees time-varying host interference
    (identical sessions measured 33.8s vs 105s on the same input within an
    hour, while 1-way and 16-way pure-CPU canaries stayed within ±10%).
    The two levels are therefore sampled in INTERLEAVED rounds — lo, hi,
    lo, hi — so a noise burst hits adjacent samples of both levels, and
    the reported figure uses the per-level MINIMUM across rounds (the
    machine's capability; the standard estimator under asymmetric
    external noise). Every per-round sample is reported alongside."""
    global TURNS_PER_DOC
    TURNS_PER_DOC = int(os.environ.get("SPARK_GRAFT_TURNS_PER_DOC", "1000"))
    lo, hi = 4, 16
    lo_runs, hi_runs, bw = [], [], []
    for _ in range(rounds):
        bw.append(_host_bw_gbps())
        lo_runs.append(pipeline_throughput(lo, sf_dir, repeats=2))
        hi_runs.append(pipeline_throughput(hi, sf_dir, repeats=2))
    best_lo = max(r["turns_per_sec"] for r in lo_runs)
    best_hi = max(r["turns_per_sec"] for r in hi_runs)
    eff = (best_hi / best_lo) / (hi / lo)
    pair_effs = [
        round((h["turns_per_sec"] / l["turns_per_sec"]) / (hi / lo), 3)
        for l, h in zip(lo_runs, hi_runs)
    ]
    return {
        "scaling": {
            f"local[{lo}]": lo_runs,
            f"local[{hi}]": hi_runs,
            "best_turns_per_sec": {f"local[{lo}]": best_lo, f"local[{hi}]": best_hi},
            "throughput_ratio": round(best_hi / best_lo, 3),
            "core_ratio": hi / lo,
            "efficiency": round(eff, 3),
            "per_round_efficiency": pair_effs,
            "host_bw_gbps_per_round": bw,
        }
    }


if __name__ == "__main__":
    main()

"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

The flagship pipeline benchmark builds a transcript table DISTRIBUTEDLY
(documents × explode(K turns), HTML-wrapped payload variants) so generation
never bottlenecks on the driver — the same shape a 10^12-turn Iceberg scan
would have, just smaller.

    python bench.py                 # driver mode: one JSON line
    python bench.py --scaling       # local[8] vs local[32] efficiency report
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


def build_transcripts(spark, sf_dir: str):
    """documents → K turns each, generated executor-side (explode, no driver
    loop). conv_id = doc, turn_idx 0..K-1, payload variants exercise every
    parse path."""
    from pyspark.sql import functions as F

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
        F.explode(F.sequence(F.lit(0), F.lit(TURNS_PER_DOC - 1))).alias("turn_idx"),
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
    from blogparser_spark.dataops.similarity import brute_force_topk
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

    transcripts = build_transcripts(spark, sf_dir)
    n_turns = transcripts.count()  # materialization cost excluded from q_pipeline? no — rebuilt below

    bench(
        "q_pipeline",
        lambda: sink_counts(enrich(parse_stage(build_transcripts(spark, sf_dir)))).collect(),
        reps=3,  # JIT on the 500k-turn plan keeps improving through run ~3
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
        lambda: brute_force_topk(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), 10, 10
        ).count(),
    )
    bench("q_window", lambda: conv_window_stats(spark, sf_dir).collect())
    bench("q_sessionize", lambda: events_sessionize(spark, sf_dir).count())
    bench("q_pricing", lambda: pricing_rollup(spark, sf_dir).collect())
    return timings, cold, n_turns


def one_run(cpus: int, sf_dir: str) -> dict:
    from blogparser_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=int(cpus), app_name=f"bench-{cpus}"
    )
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
    }
    spark.stop()
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_run(sf_dir)))
    else:
        print(json.dumps(one_run(cpus, sf_dir)))


def pipeline_throughput(cpus: int, sf_dir: str, repeats: int = 5) -> dict:
    """Steady-state parse→enrich→aggregate throughput at one parallelism
    level. Each timed run builds a FRESH plan — re-collecting one plan
    instance reuses its shuffle map outputs (skipped stages), even with AQE
    off, and measures nothing. The constant per-run planning cost (~2-3 s)
    is drowned by sizing the input to minutes of work (5M turns default)."""
    from blogparser_spark.operators.aggregate import sink_counts
    from blogparser_spark.operators.enrich import enrich
    from blogparser_spark.operators.parse import parse_stage
    from blogparser_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=int(cpus), app_name=f"scale-{cpus}"
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_turns = build_transcripts(spark, sf_dir).count()
    times = []
    for _ in range(repeats):
        t0 = time.time()
        sink_counts(enrich(parse_stage(build_transcripts(spark, sf_dir)))).collect()
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


def scaling_run(sf_dir: str) -> dict:
    """N vs 4N cores on identical input. Uses local[4] vs local[16] so that
    JVM task threads + Python UDF workers (2 threads per core of
    parallelism) never oversubscribe the 32 hardware cores at either level —
    local[32] would contend with its own python workers and measure the
    scheduler, not the pipeline."""
    global TURNS_PER_DOC
    TURNS_PER_DOC = int(os.environ.get("SPARK_GRAFT_TURNS_PER_DOC", "1000"))
    lo, hi = 4, 16
    r_lo = pipeline_throughput(lo, sf_dir, repeats=3)
    r_hi = pipeline_throughput(hi, sf_dir, repeats=3)
    eff = (r_hi["turns_per_sec"] / r_lo["turns_per_sec"]) / (hi / lo)
    return {
        "scaling": {
            f"local[{lo}]": r_lo,
            f"local[{hi}]": r_hi,
            "throughput_ratio": round(r_hi["turns_per_sec"] / r_lo["turns_per_sec"], 3),
            "core_ratio": hi / lo,
            "efficiency": round(eff, 3),
        }
    }


if __name__ == "__main__":
    main()

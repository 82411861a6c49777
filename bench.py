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

TURNS_PER_DOC = 20


def build_transcripts(spark, sf_dir: str):
    """documents → K turns each, generated executor-side (explode, no driver
    loop). conv_id = doc, turn_idx 0..K-1, payload variants exercise every
    parse path."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
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


def run_headline(spark, sf_dir: str) -> tuple[dict[str, float], int]:
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

    def bench(name, thunk):
        t0 = time.time()
        thunk()
        timings[name] = round(time.time() - t0, 3)

    transcripts = build_transcripts(spark, sf_dir)
    n_turns = transcripts.count()  # materialization cost excluded from q_pipeline? no — rebuilt below

    bench(
        "q_pipeline",
        lambda: sink_counts(enrich(parse_stage(build_transcripts(spark, sf_dir)))).collect(),
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
    return timings, n_turns


def one_run(cpus: int, sf_dir: str) -> dict:
    from blogparser_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=int(cpus), app_name=f"bench-{cpus}"
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings, n_turns = run_headline(spark, sf_dir)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
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
        lo, hi = 8, 32
        r_lo, r_hi = one_run(lo, sf_dir), one_run(hi, sf_dir)
        tp_lo = r_lo["turns_per_sec_pipeline"]
        tp_hi = r_hi["turns_per_sec_pipeline"]
        eff = (tp_hi / tp_lo) / (hi / lo)
        print(
            json.dumps(
                {
                    "scaling": {
                        f"local[{lo}]": r_lo,
                        f"local[{hi}]": r_hi,
                        "throughput_ratio": round(tp_hi / tp_lo, 3),
                        "core_ratio": hi / lo,
                        "efficiency": round(eff, 3),
                    }
                }
            )
        )
    else:
        print(json.dumps(one_run(cpus, sf_dir)))


if __name__ == "__main__":
    main()

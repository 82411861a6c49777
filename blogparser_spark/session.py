"""SparkSession factory with the configuration the pipeline assumes.

Design notes (scale): AQE on (skew-join split + shuffle-partition coalesce),
Arrow-vectorized Python execution on, ANSI off so malformed dates/casts yield
NULL (the reference treats a missing/bad date as a zero value → NULL,
parser/parser.go:131-134, not as a job failure). Session timezone is pinned
to UTC so timestamp parity with the pure-Python oracle layer and with DuckDB
oracles is deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "blogparser_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # the parse UDF deserializes on executor python workers, which need the
    # package importable; local mode inherits the driver env, a cluster
    # deployment ships the package via spark-submit --py-files instead
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    if shuffle_partitions is None:
        # match parallelism: one shuffle partition per core locally; a real
        # cluster deployment would size this to ~2-3x total cores via submit conf
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # parse stage is regex-heavy python; keep executor→python worker reuse
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        # local mode = the driver JVM IS the executor: size its heap for the
        # pipeline's string churn (parse output ≈ 4× payload per run). An 8g
        # heap measured 22k turns/s on the 500k-turn pipeline purely from GC
        # debt; 32g measures ~150k on the same plan. Real clusters size
        # executor memory instead (spark-submit --executor-memory).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        # ParallelGC over G1 for this allocation-heavy batch workload:
        # measured 148k vs 112k turns/s at local[16] on the 5M-turn
        # pipeline, and without G1's occasional concurrent-mark stalls
        # (one G1 run spiked 44s→158s). Throughput collectors win when
        # nothing is latency-sensitive.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

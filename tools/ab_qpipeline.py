"""A/B harness for the round-4 q_pipeline driver-bench anomaly (VERDICT r4,
task 1): time q_pipeline (cold + min-of-6 steady) at two code versions in
FRESH subprocesses, interleaved A/B/A/B so a host-noise burst hits adjacent
samples of both versions. Each sample records the host memcpy gauge.

    python tools/ab_qpipeline.py /root/repo/.ab_r3 /root/repo [rounds]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time

CHILD = r'''
import json, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
import bench as B

spark = B._bench_spark(32, "ab-qpipeline")
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from blogparser_spark.operators.aggregate import sink_counts
from blogparser_spark.operators.enrich import enrich
from blogparser_spark.operators.parse import parse_stage

sf = "/root/testdata/sf0.1"
warm = B.build_transcripts(spark, sf).limit(100_000)
sink_counts(enrich(parse_stage(warm))).collect()
tpath = B.transcripts_parquet(spark, sf)
spark.read.parquet(tpath).agg(F.sum(F.length("text"))).collect()

times = []
for _ in range(7):
    B._quiesce(spark)
    t0 = time.time()
    sink_counts(enrich(parse_stage(spark.read.parquet(tpath)))).collect()
    times.append(round(time.time() - t0, 3))
print(json.dumps({"repo": repo, "cold": times[0],
                  "steady": min(times[1:]), "runs": times}))
spark.stop()
'''


def _gauge() -> float:
    import numpy as np

    a = np.ones(10_000_000, dtype=np.uint8)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        a.copy()
        best = max(best, 0.01 / (time.perf_counter() - t0))
    return round(best, 2)


def one_sample(repo: str) -> dict:
    gauge = _gauge()
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD)
        path = f.name
    out = subprocess.run(
        [sys.executable, path, repo], capture_output=True, text=True,
        cwd="/tmp", check=False,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench child for {repo} produced no result "
            f"(rc={out.returncode}); stderr tail:\n{out.stderr[-2000:]}"
        )
    d = json.loads(lines[-1])
    d["gauge_gbps"] = gauge
    return d


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    samples = {repo_a: [], repo_b: []}
    for r in range(rounds):
        for repo in (repo_a, repo_b):
            s = one_sample(repo)
            samples[repo].append(s)
            print(json.dumps({"round": r, **s}), flush=True)
    summary = {
        repo: {
            "best_steady": min(s["steady"] for s in ss),
            "best_cold": min(s["cold"] for s in ss),
            "steadies": [s["steady"] for s in ss],
            "colds": [s["cold"] for s in ss],
            "gauges": [s["gauge_gbps"] for s in ss],
        }
        for repo, ss in samples.items()
    }
    print(json.dumps({"summary": summary}, indent=2))


if __name__ == "__main__":
    main()

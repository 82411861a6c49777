"""Append one paired scaling sample (local[4] then local[16]; turns/doc from
argv[1], default 400 = 2M turns over the 5k-doc sf0.1 corpus) to
/tmp/scaling_samples.jsonl, with a memory-bandwidth canary before each level
so host interference is visible in the record.

The sandbox VM shows time-varying host contention (identical Spark runs
33.8s vs 105s within the hour while pure-ALU canaries stay flat); sampling
pairs across the session and taking per-level minima estimates the
machine's actual capability. See bench.py scaling_run docstring.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def bandwidth_canary() -> float:
    """GB/s of a big memcpy — the resource the pipeline's string churn
    actually contends on (unlike an ALU loop)."""
    a = np.ones(200_000_000, dtype=np.uint8)  # 200 MB
    t0 = time.time()
    for _ in range(10):
        b = a.copy()  # noqa: F841
    return round(2.0 / (time.time() - t0), 2)  # GB/s (r+w counted once)


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 400  # 2M turns default
    gate = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0  # GB/s
    bench.TURNS_PER_DOC = turns
    sf = "/root/testdata/sf0.1"
    # opportunistic gating: only measure when the host isn't throttling
    # memory bandwidth (observed 0.03–2+ GB/s swings); give up after ~3 min
    bw = bandwidth_canary()
    waited = 0
    while bw < gate and waited < 180:
        time.sleep(30)
        waited += 30
        bw = bandwidth_canary()
    sample = {"ts": time.strftime("%H:%M:%S"), "turns_per_doc": turns, "bw_gate": bw}
    if bw < gate:
        sample["skipped"] = "bandwidth below gate"
        print(json.dumps(sample))
        return
    for cpus in (4, 16):
        sample[f"bw_before_{cpus}"] = bandwidth_canary()
        r = bench.pipeline_throughput(cpus, sf, repeats=2)
        sample[f"local{cpus}"] = {
            "cold": r["cold_sec"],
            "runs": r["runs_sec"],
            "tps": r["turns_per_sec"],
        }
    lo, hi = sample["local4"]["tps"], sample["local16"]["tps"]
    sample["pair_efficiency"] = round(hi / lo / 4.0, 3)
    with open("/tmp/scaling_samples.jsonl", "a") as f:
        f.write(json.dumps(sample) + "\n")
    print(json.dumps(sample))


if __name__ == "__main__":
    main()

"""HyperLogLog sketch: rank parity vs the Python twin, exact Python-replay
of the whole estimate, merge associativity, and accuracy at p=8."""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import functions as F

from blogparser_spark.dataops import sketches


def _hll_py(values: list[str], p: int = 8):
    """Pure-Python replay of the full sketch (register dict, exact scaled
    sum, small-range-corrected estimate)."""
    m = 1 << p
    nh = p // 4
    regs: dict[int, int] = {}
    for v in values:
        h = hashlib.md5(v.encode()).hexdigest()
        reg = int(h[:nh], 16)
        rank = sketches.rank_py(h[nh : nh + 13])
        regs[reg] = max(regs.get(reg, 0), rank)
    s = sum(1 << (53 - r) for r in regs.values()) + (m - len(regs)) * (1 << 53)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(1 << 53) / s
    zeros = m - len(regs)
    est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
    return regs, s, est


def test_rank_parity(spark):
    rng = random.Random(7)
    sufs = ["0" * 13, "0" * 12 + "1", "1" + "0" * 12, "f" * 13]
    for _ in range(200):
        k = rng.randint(0, 12)
        sufs.append("0" * k + "".join(rng.choice("123456789abcdef") for _ in range(13 - k)))
    df = spark.createDataFrame([(s,) for s in sufs], "suf string")
    got = {
        r["suf"]: r["rank"]
        for r in df.select("suf", sketches.rank_expr(F.col("suf")).alias("rank")).collect()
    }
    for s in sufs:
        assert got[s] == sketches.rank_py(s), s


def test_hll_exact_python_replay(spark):
    values = [f"doc {i} body text" for i in range(700)]
    df = spark.createDataFrame([(v,) for v in values], "text string")
    regs = sketches.hll_registers(df, F.col("text"), (), p=8)
    got_regs = {r["register"]: r["max_rank"] for r in regs.collect()}
    est = sketches.hll_estimate(regs, (), p=8).collect()[0]
    want_regs, want_s, want_est = _hll_py(values)
    assert got_regs == want_regs
    assert est["n_present"] == len(want_regs)
    assert est["s_scaled"] == want_s
    assert est["hll_distinct"] == round(want_est, 6)


def test_hll_merge_is_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "text string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "text string")
    merged = sketches.hll_merge(
        sketches.hll_registers(a, F.col("text")),
        sketches.hll_registers(b, F.col("text")),
    )
    direct = sketches.hll_registers(a.unionByName(b), F.col("text"))
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_hll_accuracy_p8(spark):
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("text"))
    est = sketches.hll_estimate(sketches.hll_registers(df, F.col("text"))).collect()[0]
    # p=8 -> relative stderr ~1.04/sqrt(256) = 6.5%; 3 sigma bound
    assert abs(est["hll_distinct"] - n) / n < 0.20

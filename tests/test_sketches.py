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


# ---------------------------------------------------------- count-min sketch ---


def test_cms_never_undercounts_and_collisions_overcount(spark):
    # zipf-ish frequencies over 120 keys forced into a 2x32 grid: collisions
    # are certain, so some estimate MUST overcount; none may undercount
    rows = [(f"k{i}",) for i in range(120) for _ in range(1 + (i % 7))]
    df = spark.createDataFrame(rows, "k string")
    counters = sketches.cms_counters(df, F.col("k"), d=2, w=32)
    exact = df.groupBy("k").agg(F.count("*").cast("bigint").alias("exact_n"))
    est = sketches.cms_estimate(counters, exact, F.col("k"), d=2, w=32).collect()
    assert len(est) == 120
    assert all(r["cms_est"] >= r["exact_n"] for r in est)
    assert any(r["cms_est"] > r["exact_n"] for r in est)


def test_cms_exact_when_grid_is_roomy(spark):
    # 10 keys in a 4x512 grid: P(any collision) is negligible by birthday
    # bound with these fixed md5 coords -> min over 4 rows is exact
    df = spark.createDataFrame([(f"key-{i}",) for i in range(10) for _ in range(3)], "k string")
    counters = sketches.cms_counters(df, F.col("k"), d=4, w=512)
    cand = df.select("k").distinct()
    est = sketches.cms_estimate(counters, cand, F.col("k"), d=4, w=512).collect()
    assert all(r["cms_est"] == 3 for r in est)


def test_cms_merge_is_addition(spark):
    a = spark.createDataFrame([(f"x{i % 9}",) for i in range(100)], "k string")
    b = spark.createDataFrame([(f"x{i % 13}",) for i in range(80)], "k string")
    merged = sketches.cms_merge(
        sketches.cms_counters(a, F.col("k"), d=2, w=64),
        sketches.cms_counters(b, F.col("k"), d=2, w=64),
    )
    direct = sketches.cms_counters(a.unionByName(b), F.col("k"), d=2, w=64)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_cms_grouped_state_is_bounded(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", f"v{i}") for i in range(900)], "g string, k string"
    )
    counters = sketches.cms_counters(df, F.col("k"), ("g",), d=2, w=16)
    per_group = counters.groupBy("g").count().collect()
    # 900/3 = 300 distinct keys per group but the grid caps state at d*w = 32
    assert all(r["count"] <= 32 for r in per_group)


# --------------------------------------------------------------- bloom filter ---


def test_bloom_no_false_negatives_and_prunes(spark):
    dim = spark.range(100, 160).select(F.col("id").cast("string").alias("k"))
    fact = spark.range(0, 1000).select(F.col("id").alias("fid"), F.col("id").cast("string").alias("k"))
    bits = sketches.bloom_bits(dim, F.col("k"), n_hashes=3, n_bits=512)
    kept = sketches.bloom_prefilter(fact, F.col("k"), bits, n_hashes=3, n_bits=512)
    kept_ids = {r["fid"] for r in kept.collect()}
    # every true member passes
    assert set(range(100, 160)) <= kept_ids
    # and the filter actually prunes most non-members (512 bits / 60 keys
    # / 3 hashes -> fpp ~ (1 - e^{-180/512})^3 ~ 2.6%)
    assert len(kept_ids) < 200


def test_bloom_prefilter_plan_is_broadcast_no_fact_shuffle(spark):
    # the bitset must ride to the fact as a broadcast one-row side; the
    # fact itself must not shuffle (the whole point of pre-join pruning)
    dim = spark.range(0, 50).select(F.col("id").cast("string").alias("k"))
    fact = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    bits = sketches.bloom_bits(dim, F.col("k"))
    kept = sketches.bloom_prefilter(fact, F.col("k"), bits)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


# ---------------------------------------------------------------- Misra–Gries ---


def test_mg_guarantee_across_partitionings(spark):
    # 3 heavy keys (600/300/150 of N=1440) + 390 singletons; with k=16 the
    # guarantee covers every key with count > N/(k+1) = 84.7 — the heavies
    # must survive HOWEVER the input is partitioned
    rows = (
        [("hot",)] * 600 + [("warm",)] * 300 + [("mild",)] * 150
        + [(f"cold{i}",) for i in range(390)]
    )
    df = spark.createDataFrame(rows, "k string")
    for parts in (1, 3, 16):
        cand = sketches.mg_candidates(df.repartition(parts), F.col("k"), k=16)
        keys = {r["key"] for r in cand.collect()}
        assert {"hot", "warm", "mild"} <= keys, parts
        # bounded output: at most k entries per partition survive
        assert cand.count() <= 16 * parts


def test_mg_lower_bounds_never_exceed_truth(spark):
    rows = [(f"k{i % 12}",) for i in range(480)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    cand = {r["key"]: r["lb"] for r in sketches.mg_candidates(df, F.col("k"), k=8).collect()}
    assert all(lb <= 40 for lb in cand.values())


def test_heavy_hitters_composed_recovers_exact_set(spark):
    # heavy_hitters = MG candidates -> CMS estimates >= min_count; with a
    # roomy CMS grid the estimates are exact, so the output set equals the
    # exact >= min_count set whatever the partitioning
    rows = (
        [("a",)] * 200 + [("b",)] * 120 + [("c",)] * 60
        + [(f"z{i}",) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {r["key"]: r["cms_est"] for r in
           sketches.heavy_hitters(df, F.col("k"), min_count=100, k=32).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"] >= 200 and got["b"] >= 120


# ---------------------------------------------------------------- ddsketch --


def test_dd_histogram_merge_is_exact(spark):
    """Full mergeability: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    bucket-for-bucket, count-for-count — the property that lets the sketch
    combine across checkpoint slices and micro-batches."""
    from blogparser_spark.dataops.sketches import dd_histogram, dd_merge

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    whole = dd_histogram(docs, F.col("n_chars"), ("lang",))
    merged = dd_merge(
        dd_histogram(a, F.col("n_chars"), ("lang",)),
        dd_histogram(b, F.col("n_chars"), ("lang",)),
        group_cols=("lang",),
    )
    assert {tuple(r) for r in whole.collect()} == {tuple(r) for r in merged.collect()}


def test_dd_quantiles_within_relative_error(spark):
    """Every sketch estimate must be within alpha (1%) relative error of the
    exact order statistic it targets — DDSketch's guarantee."""
    from blogparser_spark.dataops.sketches import dd_histogram, dd_quantiles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = dd_histogram(docs, F.col("n_chars"))
    qs = (0.5, 0.9, 0.99)
    est = {r["q"]: r["est"] for r in dd_quantiles(hist, qs).collect()}

    vals = sorted(r["n_chars"] for r in docs.select("n_chars").collect())
    for q in qs:
        exact = vals[int(q * (len(vals) - 1))]
        assert abs(est[q] - exact) <= 0.0101 * exact, (q, est[q], exact)


def test_dd_histogram_partitioning_invariant(spark):
    """The sketch is a pure aggregation: any repartitioning of the input
    yields the identical state (unlike MG candidates, which are
    partition-dependent by design)."""
    from blogparser_spark.dataops.sketches import dd_histogram

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    one = dd_histogram(docs.coalesce(1), F.col("n_chars"), ("lang",))
    many = dd_histogram(docs.repartition(16), F.col("n_chars"), ("lang",))
    assert {tuple(r) for r in one.collect()} == {tuple(r) for r in many.collect()}


def test_dd_drops_nonpositive_and_hand_bucket(spark):
    import math

    from blogparser_spark.dataops.sketches import (
        dd_gamma,
        dd_histogram,
        dd_quantiles,
    )

    df = spark.createDataFrame(
        [(0,), (-5,), (100,), (100,), (200,)], "v int"
    )
    hist = dd_histogram(df, F.col("v"))
    rows = {r["bucket"]: r["cnt"] for r in hist.collect()}
    g = dd_gamma()
    b100 = math.ceil(round(math.log(100.0) / math.log(g), 6))
    b200 = math.ceil(round(math.log(200.0) / math.log(g), 6))
    assert rows == {b100: 2, b200: 1}  # 0 and -5 dropped
    med = {r["q"]: r for r in dd_quantiles(hist, (0.5,)).collect()}[0.5]
    assert med["bucket"] == b100
    assert abs(med["est"] - 100.0) <= 1.01  # midpoint within alpha of 100


def test_hll_sliding_registers_python_replay(spark):
    from datetime import datetime

    rng = random.Random(13)
    # events across 6 hours with overlapping user populations
    rows = []
    for h in (0, 1, 2, 5):  # hour 3-4 empty: no phantom buckets
        for _ in range(120):
            rows.append((rng.randrange(40 + 10 * h), datetime(2025, 3, 1, h, rng.randrange(60))))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    W = 3
    regs = sketches.hll_sliding_registers(
        df, F.col("user_id").cast("string"), "ts", window_buckets=W, p=8
    )
    got = {(r["bucket"], r["register"]): r["max_rank"] for r in regs.collect()}

    # python twin: per-bucket registers, then trailing-W max-merge over
    # OBSERVED target buckets only
    base_h = int(datetime(2025, 3, 1).timestamp()) // 3600
    per: dict[int, dict[int, int]] = {}
    for uid, ts in rows:
        b = (int(ts.timestamp()) * 1_000_000) // 3_600_000_000
        h = hashlib.md5(str(uid).encode()).hexdigest()
        per.setdefault(b, {})
        reg, suf = int(h[:2], 16), h[2:15]
        per[b][reg] = max(per[b].get(reg, 0), sketches.rank_py(suf))
    want = {}
    for tgt in per:  # observed buckets only
        for src in range(tgt - W + 1, tgt + 1):
            for reg, rk in per.get(src, {}).items():
                k = (tgt, reg)
                want[k] = max(want.get(k, 0), rk)
    assert got == want
    assert {b for b, _ in got} == {base_h, base_h + 1, base_h + 2, base_h + 5}

    # the sliding estimate at an observed bucket equals the plain estimate
    # over the union of its trailing window's events (mergeability)
    est = {
        r["bucket"]: (r["n_present"], r["s_scaled"])
        for r in sketches.hll_estimate(regs, ("bucket",), p=8).collect()
    }
    uni = [
        (str(uid),)
        for uid, ts in rows
        if base_h <= (int(ts.timestamp()) * 1_000_000) // 3_600_000_000 <= base_h + 2
    ]
    udf = spark.createDataFrame(uni, "v string")
    flat = sketches.hll_estimate(
        sketches.hll_registers(udf, F.col("v"), (), p=8), (), p=8
    ).collect()[0]
    assert est[base_h + 2] == (flat["n_present"], flat["s_scaled"])


def test_hll_rollup_merge_equals_from_scratch(spark):
    rng = random.Random(29)
    rows = [
        (rng.choice(["a", "b", "c"]), rng.randrange(3), f"u{rng.randrange(500)}")
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "t string, d long, uid string")
    fine = sketches.hll_registers(df, F.col("uid"), ("t", "d"), p=8)
    # max-merging the fine-grain registers to any coarser grouping set is
    # IDENTICAL to sketching that grouping set from the raw data
    for keys in (("t",), ("d",), ()):
        merged = fine.groupBy(*keys, "register").agg(
            F.max("max_rank").alias("max_rank")
        )
        scratch = sketches.hll_registers(df, F.col("uid"), keys, p=8)
        key = lambda r: tuple(r[k] for k in (*keys, "register"))
        assert {key(r): r["max_rank"] for r in merged.collect()} == {
            key(r): r["max_rank"] for r in scratch.collect()
        }, keys


def _kmv_py(values: list[str], k: int = 64):
    """Pure-Python KMV twin: (sorted min-k distinct hashes, theta, est)."""
    hs = sorted({int(hashlib.md5(v.encode()).hexdigest()[:13], 16) for v in values})
    samp = hs[:k]
    if len(samp) < k:
        return samp, 1 << 52, float(len(samp))
    return samp, samp[-1], round((k - 1) * float(1 << 52) / samp[-1], 6)


def test_kmv_sample_estimate_python_replay(spark):
    # group "big" saturates (500 distinct), group "small" stays exact (20)
    rows = [("big", f"u{i}") for i in range(500)] * 2 + [
        ("small", f"v{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    samp = sketches.kmv_sample(df, F.col("v"), ("g",), k=64)
    got = {}
    for r in samp.collect():
        got.setdefault(r["g"], []).append(r["h"])
    est = {
        r["g"]: (r["n_sample"], r["theta_h"], r["kmv_distinct"])
        for r in sketches.kmv_estimate(samp, ("g",), k=64).collect()
    }
    for g, vals in (("big", [f"u{i}" for i in range(500)]),
                    ("small", [f"v{i}" for i in range(20)])):
        w_samp, w_theta, w_est = _kmv_py(vals)
        assert sorted(got[g]) == w_samp, g
        assert est[g] == (len(w_samp), w_theta, w_est), g
    # saturated estimate is within 20% of truth at k=64
    assert abs(est["big"][2] - 500) / 500 < 0.2
    # unsaturated estimate is EXACT
    assert est["small"][2] == 20.0


def test_kmv_merge_lossless(spark):
    # min-k of a union == min-k of the union of min-k's
    a = spark.createDataFrame([(f"x{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(150, 450)], "v string")
    sa = sketches.kmv_sample(a, F.col("v"), (), k=32)
    sb = sketches.kmv_sample(b, F.col("v"), (), k=32)
    merged = sorted(r["h"] for r in sketches.kmv_merge(sa, sb, k=32).collect())
    scratch = sorted(
        r["h"]
        for r in sketches.kmv_sample(
            a.unionByName(b), F.col("v"), (), k=32
        ).collect()
    )
    assert merged == scratch


def test_kmv_pairwise_overlap_python_replay(spark):
    k = 32
    sets = {
        "a": [f"m{i}" for i in range(200)],
        "b": [f"m{i}" for i in range(100, 300)],   # true overlap 100
        "c": [f"z{i}" for i in range(40)],         # unsaturated, disjoint
    }
    rows = [(g, v) for g, vs in sets.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v string")
    samp = sketches.kmv_sample(df, F.col("v"), ("g",), k=k)
    got = {
        (r["g_a"], r["g_b"]): r.asDict()
        for r in sketches.kmv_pairwise_overlap(samp, "g", k=k).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    py = {g: _kmv_py(vs, k) for g, vs in sets.items()}
    for ga, gb in got:
        sa, ta, ea = py[ga]
        sb, tb, eb = py[gb]
        theta = min(ta, tb)
        n_common = len({h for h in sa if h < theta} & {h for h in sb if h < theta})
        inter = round(n_common * float(1 << 52) / theta, 6)
        union = round(ea + eb - inter, 6)
        r = got[(ga, gb)]
        assert (r["theta_h"], r["n_common"]) == (theta, n_common), (ga, gb)
        assert r["inter_est"] == inter and r["union_est"] == union
        assert r["jaccard_est"] == round(inter / union, 6)
    # disjoint pairs estimate zero intersection; the real pair is in the
    # right ballpark (theta-sketch rel. error ~ 1/sqrt(k*J) — wide at k=32)
    assert got[("a", "c")]["inter_est"] == 0.0
    assert got[("b", "c")]["inter_est"] == 0.0
    assert abs(got[("a", "b")]["inter_est"] - 100) / 100 < 0.75


def test_cms_join_size_upper_bound_and_twin(spark):
    rng = random.Random(37)
    a_keys = [rng.randrange(60) for _ in range(400)]
    b_keys = [rng.randrange(90) for _ in range(300)]
    a = spark.createDataFrame([(k,) for k in a_keys], "k long")
    b = spark.createDataFrame([(k,) for k in b_keys], "k long")
    D, W = 4, 128
    ca = sketches.cms_counters(a, F.col("k").cast("string"), (), d=D, w=W)
    cb = sketches.cms_counters(b, F.col("k").cast("string"), (), d=D, w=W)
    got = sketches.cms_join_size(ca, cb, d=D, w=W).collect()[0]["est_join_size"]

    # exact join size and python CMS twin
    from collections import Counter

    fa, fb = Counter(a_keys), Counter(b_keys)
    exact = sum(c * fb.get(k, 0) for k, c in fa.items())
    grids = []
    for keys in (fa, fb):
        g = [[0] * W for _ in range(D)]
        for k, c in keys.items():
            for j in range(D):
                h = hashlib.md5(f"{j}:{k}".encode()).hexdigest()
                g[j][int(h[:8], 16) % W] += c
        grids.append(g)
    want = min(
        sum(grids[0][j][c] * grids[1][j][c] for c in range(W)) for j in range(D)
    )
    assert got == want
    assert got >= exact  # never an underestimate
    assert got <= exact * 2  # collision mass stays moderate at this load

    # disjoint key spaces (w large enough to avoid collisions) -> 0 possible
    c0 = spark.createDataFrame([("x1",), ("x2",)], "k string")
    c1 = spark.createDataFrame([("y1",), ("y2",)], "k string")
    est0 = sketches.cms_join_size(
        sketches.cms_counters(c0, F.col("k"), (), d=4, w=4096),
        sketches.cms_counters(c1, F.col("k"), (), d=4, w=4096),
        d=4,
        w=4096,
    ).collect()[0]["est_join_size"]
    assert est0 == 0


def test_dd_cdf_normalize_python_twin_and_monotone(spark):
    rng = random.Random(43)
    rows = [("g1", round(rng.uniform(0.5, 400.0), 3)) for _ in range(500)] + [
        ("g2", 10.0)
    ] * 5 + [("g2", 100.0)] * 5 + [("g2", -3.0)]  # non-positive -> NULL cdf
    df = spark.createDataFrame(rows, "g string, v double")
    out = sketches.dd_cdf_normalize(df, F.col("v"), ("g",), value_name="v")
    got = [(r.g, r.v, r.bucket, r.dd_cdf) for r in out.collect()]
    assert len(got) == len(rows)

    # python twin
    lg = math.log(sketches.dd_gamma())
    from collections import Counter

    hists: dict[str, Counter] = {}
    for g, v in rows:
        if v > 0:
            hists.setdefault(g, Counter())[
                math.ceil(round(math.log(v) / lg, 6))
            ] += 1
    for g, v, b, c in got:
        if v <= 0:
            assert c is None and b is None
            continue
        wb = math.ceil(round(math.log(v) / lg, 6))
        assert b == wb
        h = hists[g]
        n = sum(h.values())
        below = sum(cnt for bk, cnt in h.items() if bk < wb)
        assert c == round((below + (h[wb] + 1) / 2.0) / (n + 1), 6), (g, v)
    # ties in the same bucket share a cdf; order respects value order
    g2 = sorted((v, c) for g, v, _, c in got if g == "g2" and v > 0)
    assert len({c for v, c in g2 if v == 10.0}) == 1
    assert g2[0][1] < g2[-1][1]
    # cdf strictly inside (0, 1)
    assert all(0 < c < 1 for _, _, _, c in got if c is not None)


def test_sketches_ignore_null_values(spark):
    # COUNT(DISTINCT) ignores NULLs — so must the sketch states: adding
    # NULL rows must leave HLL registers and the KMV sample bit-identical
    from blogparser_spark.dataops import sketches

    clean = spark.createDataFrame(
        [(f"v{i}",) for i in range(100)], "v string"
    )
    dirty = clean.unionByName(
        spark.createDataFrame([(None,), (None,)], "v string")
    )
    hc = sorted(map(tuple, sketches.hll_registers(clean, F.col("v")).collect()))
    hd = sorted(map(tuple, sketches.hll_registers(dirty, F.col("v")).collect()))
    assert hc == hd
    kc = sorted(r.h for r in sketches.kmv_sample(clean, F.col("v"), k=16).collect())
    kd = sorted(r.h for r in sketches.kmv_sample(dirty, F.col("v"), k=16).collect())
    assert kc == kd

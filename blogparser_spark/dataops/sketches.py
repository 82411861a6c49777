"""Deterministic, engine-portable HyperLogLog distinct sketches.

Why another distinct counter: at 10^12 turns a `COUNT(DISTINCT key)` is a
full shuffle of every distinct key to one reducer per group; an HLL sketch
is a fixed 2^p-register state that partial-aggregates map-side (max per
register commutes and combines), merges across checkpoint slices / stream
micro-batches, and ships as 2^p small ints per group. This implementation
is *bit-exact across engines* so it carries an exact DuckDB oracle:

- register index and rank derive from the md5 hex string using only
  integer/string ops (no engine-specific 64-bit hash),
- the register sum is carried as an exact int64 (sum of 2^(53-rank),
  rank in [1, 53], so each term is in [1, 2^52] and the total for
  m=256 registers stays < 2^61),
- only the final estimate is a float (one division + optional ln),
  rounded to 6 decimals — the same cross-engine convention BM25's idf
  uses (functions of exact integers, round-6 absorbs libm ulp skew).

Algorithm: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm" (AofA 2007), with the
standard small-range linear-counting correction. The reference repo has no
sketch support; this belongs to the 100-TB dataops surface (approximate
per-sink distinct users/texts without a distinct shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Column, Window
from pyspark.sql import functions as F

# Leading zero bits inside the first NONZERO hex nibble ('0' handled by the
# leading-zero-char count; map-literal lookup per CLAUDE.md rule 9 — prefer
# create_map+element_at over when-chains).
_NIB_LZ = {
    "1": 3,
    "2": 2,
    "3": 2,
    "4": 1,
    "5": 1,
    "6": 1,
    "7": 1,
    "8": 0,
    "9": 0,
    "a": 0,
    "b": 0,
    "c": 0,
    "d": 0,
    "e": 0,
    "f": 0,
}

_SUF_CHARS = 13  # 13 hex chars = 52 bits of rank window


def _nib_map() -> Column:
    pairs: list[Column] = []
    for k, v in _NIB_LZ.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def rank_expr(suf: Column) -> Column:
    """HLL rank (position of the first 1-bit, 1-based) of a 13-hex-char
    suffix: 4 * (leading zero chars) + (zero bits in the first nonzero
    nibble) + 1; an all-zero suffix ranks 53. Pure codegen string/int ops."""
    lzc = F.length(F.regexp_extract(suf, "^0*", 0))
    nib = suf.substr(lzc + 1, F.lit(1))
    # try_element_at (not element_at): the otherwise-branch is unreachable
    # when the suffix is all zeros, but ANSI-on sessions must never be one
    # missing-map-key error away from failing (the library-surface rule).
    return F.when(lzc == _SUF_CHARS, F.lit(53)).otherwise(
        lzc * 4 + F.try_element_at(_nib_map(), nib) + 1
    )


def hll_registers(
    df: DataFrame,
    value: Column,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register state: (group_cols..., register, max_rank).

    p must be a multiple of 4 (register index = first p/4 hex chars of
    md5(value)). The groupBy is a partial-aggregatable max — map-side
    combine reduces each input partition to at most 2^p rows per group
    before the shuffle, which is what makes this the scale path vs
    COUNT(DISTINCT)."""
    if p % 4 or not 4 <= p <= 16:
        raise ValueError("p must be a multiple of 4 in [4, 16]")
    nh = p // 4
    # COUNT(DISTINCT) ignores NULLs; md5(NULL)=NULL would otherwise add a
    # phantom (register=NULL, max_rank=NULL) row that skews the estimate
    base = df.where(value.isNotNull()).select(
        *group_cols, F.md5(value).alias("h")
    ).select(
        *group_cols,
        F.conv(F.substring("h", 1, nh), 16, 10).cast("int").alias("register"),
        F.substring("h", nh + 1, _SUF_CHARS).alias("suf"),
    )
    return (
        base.select(*group_cols, "register", rank_expr(F.col("suf")).alias("rank"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*register_dfs: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge register states (max per register) — the property that lets
    sketches roll up across checkpoint slices and stream micro-batches."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "register").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Collapse a register state to (group_cols..., n_present, s_scaled,
    hll_distinct). s_scaled is the EXACT integer sum(2^(53 - max_rank))
    plus 2^53 per never-hit register, so the only floating-point step is
    the final alpha * m^2 * 2^53 / s_scaled (round-6). Small-range
    correction: raw <= 2.5m with empty registers -> m * ln(m / zeros)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    g = registers.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_present"),
        (
            F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - max_rank)"))
            + (F.lit(m) - F.count("*")) * F.expr("shiftleft(cast(1 as bigint), 53)")
        )
        .cast("bigint")
        .alias("s_scaled"),
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(1 << 53))
        / F.col("s_scaled")
    )
    zeros = F.lit(m) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return g.select(
        *group_cols,
        "n_present",
        "s_scaled",
        F.round(est, 6).alias("hll_distinct"),
    )


def rank_py(suf: str) -> int:
    """Pure-Python twin of rank_expr for property tests."""
    lzc = len(suf) - len(suf.lstrip("0"))
    if lzc == _SUF_CHARS:
        return 53
    return lzc * 4 + _NIB_LZ[suf[lzc]] + 1


# ---------------------------------------------------------- count-min sketch ---
#
# Cormode & Muthukrishnan, "An Improved Data Stream Summary: The Count-Min
# Sketch and its Applications" (J. Algorithms 2005). A d×w counter grid
# replaces a full per-key frequency groupBy: every occurrence increments d
# counters (one per hash row), an item's estimate is the MIN of its d
# counters (always ≥ the true count — overcount only, never under). The
# state is d·w int64s per group regardless of key cardinality, the counter
# build is a partial-aggregatable COUNT (map-side combine bounds each input
# partition's shuffle contribution at d·w rows), and two sketches merge by
# counter-wise ADDITION — the same slice/micro-batch rollup property as the
# HLL registers above. Engine-portable by the module's convention: counter
# coordinates derive from md5 hex substrings via integer/string ops only,
# so the DuckDB oracle replays them bit-exactly.


def _md5_mod(value: Column, salt: str, mod: int) -> Column:
    """First 32 bits of md5(salt || value) reduced mod `mod` — the one
    hash primitive both engines evaluate identically (Spark: conv(hex, 16,
    10); DuckDB: ('0x' || substr)::BIGINT)."""
    h = F.md5(F.concat(F.lit(salt), value))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % mod


def cms_coords(value: Column, d: int = 4, w: int = 512) -> Column:
    """array<struct<row,col>> of the d counter coordinates touched by one
    occurrence of `value` (row j's column = first 32 md5 bits of "j:" ||
    value, mod w)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _md5_mod(value, f"{j}:", w).alias("col"),
            )
            for j in range(d)
        ]
    )


def cms_counters(
    df: DataFrame,
    value: Column,
    group_cols: Sequence[str] = (),
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Per-group CMS counter state: (group_cols..., row, col, cnt). Only
    coordinates that were actually hit appear (absent ⇒ 0); the grid is
    therefore ≤ d·w rows per group however many distinct keys the stream
    carries — the property that makes this the 10^12-turn frequency path."""
    return (
        df.select(*group_cols, F.explode(cms_coords(value, d, w)).alias("rc"))
        .select(*group_cols, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .groupBy(*group_cols, "row", "col")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_merge(*counter_dfs: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Counter-wise addition — sketches built on disjoint slices (checkpoint
    buckets, stream micro-batches) merge into the sketch of their union."""
    out = counter_dfs[0]
    for other in counter_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def cms_estimate(
    counters: DataFrame,
    candidates: DataFrame,
    value: Column,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point-query the sketch for every candidate row: explode the
    candidate's d coordinates, broadcast-join the (small, ≤ d·w-row)
    counter state, MIN over the d rows. Candidates keep all their columns;
    the estimate lands as `cms_est` (≥ true count by construction). The
    join side that scales is the candidate set — the sketch is the tiny
    side, so this is one broadcast hash join and one partial-agg min, no
    matter how the candidates were produced (at scale: per-partition local
    top-k survivors, not a full distinct)."""
    cand = candidates.withColumn("_rc", F.explode(cms_coords(value, d, w)))
    joined = cand.join(
        F.broadcast(counters),
        (F.col("_rc.row") == counters["row"]) & (F.col("_rc.col") == counters["col"]),
        "left",
    )
    keep = [c for c in candidates.columns]
    return (
        joined.groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


# --------------------------------------------------------------- bloom filter ---
#
# Bloom (CACM 1970) membership filter as a relation: the bitset is the set
# of DISTINCT positions hit by n_hashes md5-derived hashes of each build-side
# key — ≤ n_bits rows however many keys went in (the distinct is map-side
# combinable). The probe side tests membership with UNROLLED
# array_contains(bits, pos_j) conjuncts against a one-row broadcast array —
# pure whole-stage codegen, no explode, no shuffle on the probe side, no
# false negatives (guaranteed), false positives bounded by the classic
# (1 - e^{-kn/m})^k. The 100-TB use: drop non-matching fact rows BEFORE the
# shuffle of a fact⋈dim join whose dim key set is too large to broadcast as
# an exact hash set but whose n_bits-position bloom is a few KB — the same
# idea Spark's runtime-filter bloom pushdown (spark.sql.optimizer.runtime.
# bloomFilter.enabled) applies inside Catalyst; this form is explicit,
# reusable across jobs, and engine-portable for the oracle.


def bloom_bits(
    df: DataFrame,
    key: Column,
    n_hashes: int = 3,
    n_bits: int = 4096,
) -> DataFrame:
    """Build-side bitset: one `pos` row per DISTINCT bit position set by
    the keys (hash j's position = first 32 md5 bits of "b<j>:" || key,
    mod n_bits)."""
    pos = F.array(*[_md5_mod(key, f"b{j}:", n_bits) for j in range(n_hashes)])
    return df.select(F.explode(pos).alias("pos")).distinct()


def bloom_test(
    key: Column,
    bits_col: Column,
    n_hashes: int = 3,
    n_bits: int = 4096,
) -> Column:
    """Membership predicate against a bitset ARRAY column: n_hashes
    UNROLLED array_contains conjuncts (not a higher-order forall — those
    run interpreted, CLAUDE.md rule 1). True ⇒ maybe-member; false ⇒
    definitely absent."""
    test = None
    for j in range(n_hashes):
        c = F.array_contains(bits_col, _md5_mod(key, f"b{j}:", n_bits))
        test = c if test is None else (test & c)
    return test


def bloom_prefilter(
    fact: DataFrame,
    key: Column,
    bits: DataFrame,
    n_hashes: int = 3,
    n_bits: int = 4096,
) -> DataFrame:
    """Keep fact rows whose key passes the bloom. The bitset collapses to a
    ONE-ROW sorted array (≤ n_bits ints) that rides in as a broadcast
    nested-loop side; the membership test is n_hashes array_contains
    conjuncts — codegen-native, evaluated at the scan, so rejected rows
    never reach the downstream join's shuffle."""
    barr = bits.agg(F.sort_array(F.collect_set("pos")).alias("_bloom_bits"))
    return (
        fact.join(F.broadcast(barr))
        .filter(bloom_test(key, F.col("_bloom_bits"), n_hashes, n_bits))
        .drop("_bloom_bits")
    )


# ------------------------------------------------------------- Misra–Gries ---
#
# Misra & Gries ("Finding repeated elements", Sci. Comp. Prog. 1982) heavy-
# hitter summaries, in the MERGEABLE form of Agarwal et al. ("Mergeable
# Summaries", PODS 2012): each partition keeps at most k weighted counters;
# merging adds counts and subtracts the (k+1)-th largest so the summary
# stays at k entries. The surviving counts are LOWER bounds with total
# error ≤ n/(k+1) per partition, so any key whose global count exceeds
# N/(k+1) (N = total rows) is GUARANTEED to survive in at least one
# partition summary — however the input was partitioned. That makes this
# the scale-safe CANDIDATE GENERATOR for cms_estimate: ≤ k rows per
# partition are shuffled (never the key universe), candidates are a
# superset of every guaranteed-heavy key, and the CMS point query then
# assigns each candidate its (over-)estimate. The candidate SET depends on
# partition boundaries (only its guaranteed subset is stable), so this is
# deliberately NOT a driver-oracle query — the guarantee is property-
# tested across partitionings instead.


def mg_candidates(
    df: DataFrame,
    value: Column,
    k: int = 64,
    key_type: str = "string",
) -> DataFrame:
    """Heavy-hitter candidates (key, lb): per-partition Misra–Gries with k
    counters (pandas value_counts per Arrow batch — vectorized, no per-row
    Python — merged into the partition summary with the subtract-(k+1)-th
    prune), then a global groupBy SUM of the surviving lower bounds. Output
    is ≤ k·n_partitions rows pre-aggregation; every key with global count
    > N/(k+1) is present."""
    import pandas as pd

    col_name = "_mg_v"

    def per_part(batches):
        counters = pd.Series(dtype="float64")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vc = pdf[col_name].value_counts()
            counters = counters.add(vc, fill_value=0.0)
            if len(counters) > k:
                thresh = counters.nlargest(k + 1).iloc[-1]
                counters = counters - thresh
                counters = counters[counters > 0]
        if len(counters):
            yield pd.DataFrame(
                {"key": counters.index, "lb": counters.astype("int64").to_numpy()}
            )

    local = df.select(value.alias(col_name)).mapInPandas(
        per_part, f"key {key_type}, lb long"
    )
    return local.groupBy("key").agg(F.sum("lb").cast("bigint").alias("lb"))


def heavy_hitters(
    df: DataFrame,
    value: Column,
    min_count: int,
    k: int = 64,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """The composed scale path: Misra–Gries candidates (bounded shuffle,
    guaranteed superset of keys with count > N/(k+1)) point-queried against
    the CMS (no-undercount estimates), filtered to cms_est ≥ min_count.
    Because CMS never undercounts and MG never misses a guaranteed-heavy
    key, every key with true count ≥ max(min_count, N/(k+1) + 1) is in the
    output; extras are bounded by the CMS overcount. Neither side ever
    shuffles the key universe."""
    cand = mg_candidates(df, value, k)
    counters = cms_counters(df, value, (), d, w)
    est = cms_estimate(counters, cand, F.col("key"), d, w)
    return est.filter(F.col("cms_est") >= min_count).select("key", "lb", "cms_est")


# --- DDSketch-style relative-error quantile sketch ---------------------------
#
# Masson, Lee, Rim, "DDSketch: a fast and fully-mergeable quantile sketch
# with relative-error guarantees" (VLDB 2019). Bucket i holds values with
# ceil(log_gamma(x)) = i, gamma = (1+alpha)/(1-alpha); the bucket midpoint
# 2·gamma^i/(gamma+1) is within relative error alpha of every member. The
# sketch state is (bucket, count) pairs: counts SUM, so it partial-aggregates
# map-side, merges across slices / micro-batches, and the per-group state is
# O(log(max/min)/alpha) buckets regardless of row count — the quantile
# counterpart of the HLL/CMS/MG family above, and the scale path next to the
# exact percentile_disc oracle query (corpus_token_quantiles).
#
# Engine portability: the only floats are log(x)/log(gamma) (rounded to 6
# before ceil) and the final midpoint (rounded to 6), the round-6-of-libm
# convention every other cross-engine query here uses; counts and ranks are
# exact integers. gamma is formatted from ONE Python double into both the
# Column literal and the SQL text, so both engines parse the identical value.

DD_ALPHA = 0.01


def dd_gamma(alpha: float = DD_ALPHA) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_histogram(
    df: DataFrame,
    value: Column,
    group_cols: Sequence[str] = (),
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """(group_cols…, bucket, cnt) log-bucket histogram over POSITIVE values
    (non-positive rows are dropped — DDSketch's positive store). One partial
    hash agg; bucket keys are small ints, no skew."""
    g = dd_gamma(alpha)
    bucket = F.ceil(F.round(F.log(value.cast("double")) / F.lit(_math_log(g)), 6))
    return (
        df.filter(value > 0)
        .groupBy(*group_cols, bucket.cast("long").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def _math_log(x: float) -> float:
    import math

    return math.log(x)


def dd_merge(
    *hists: DataFrame, group_cols: Sequence[str] | None = None
) -> DataFrame:
    """Merge = bucket-wise count sum (full mergeability: sketch(A ∪ B) ==
    merge(sketch(A), sketch(B)) EXACTLY, not approximately). Group columns
    default to whatever non-(bucket, cnt) columns the inputs carry, so a
    grouped histogram can never be silently collapsed across its groups by
    an omitted group_cols argument."""
    cols = hists[0].columns
    for h in hists[1:]:
        if h.columns != cols:
            raise ValueError(f"histogram schemas differ: {cols} vs {h.columns}")
    inferred = [c for c in cols if c not in ("bucket", "cnt")]
    gcols = list(group_cols) if group_cols is not None else inferred
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy(*gcols, "bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def dd_quantiles(
    hist: DataFrame,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    group_cols: Sequence[str] = (),
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Quantile read-out: for each q, the first bucket whose cumulative
    count reaches rank floor(q·(n-1))+1, reported as the bucket midpoint
    2·gamma^i/(gamma+1) (round-6) — within relative error alpha of the
    exact order statistic. Relational: one window cumsum per group ordered
    by bucket, one broadcast q-literal explode, one min-per-(group, q) agg."""
    g = dd_gamma(alpha)
    gcols = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*gcols)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wn))
    )
    qlit = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    hit = cum.select(*gcols, "bucket", "cum", "n", qlit).filter(
        F.col("cum") >= F.floor(F.col("q") * (F.col("n") - 1)) + 1
    )
    first = hit.groupBy(*gcols, "q").agg(F.min("bucket").alias("bucket"))
    est = F.round(
        F.lit(2.0) * F.pow(F.lit(g), F.col("bucket")) / F.lit(g + 1.0), 6
    )
    return first.withColumn("est", est)


def hll_sliding_registers(
    df: DataFrame,
    value: Column,
    ts_col: str = "ts",
    window_buckets: int = 24,
    bucket_us: int = 3_600_000_000,
    p: int = 8,
) -> DataFrame:
    """Trailing-window HLL register state per time bucket: (bucket,
    register, max_rank), where row `bucket` merges the sketches of the
    `window_buckets` buckets ENDING at it — the mergeability property of
    HLL turned into a sliding "distinct users in the last 24 h" signal.

    The sliding merge is a bounded explode, never a window over raw
    events: per-bucket registers (≤ 2^p rows per bucket after
    hll_registers' map-side max) each fan out to at most window_buckets
    target buckets, then a second partial-aggregatable max collapses them.
    Per-target state is 2^p rows regardless of event volume — the scale
    contrast is exact sliding COUNT(DISTINCT), which must carry every
    distinct (bucket, key) pair through the same fan-out and holds
    key-cardinality state per target. Only buckets that themselves contain
    events are emitted (no trailing phantom buckets after the data ends)."""
    bkt = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {bucket_us}")
    regs = hll_registers(df.withColumn("_bkt", bkt), value, ("_bkt",), p)
    fan = regs.select(
        F.explode(
            F.sequence(F.col("_bkt"), F.col("_bkt") + F.lit(window_buckets - 1))
        ).alias("bucket"),
        "register",
        "max_rank",
    )
    merged = fan.groupBy("bucket", "register").agg(
        F.max("max_rank").alias("max_rank")
    )
    observed = regs.select(F.col("_bkt").alias("bucket")).distinct()
    return merged.join(observed, "bucket")


# ------------------------------------------------------------- KMV / theta ---
#
# Bar-Yossef et al. (RANDOM 2002) / Beyer et al., "On Synopses for
# Distinct-Value Estimation Under Multiset Operations" (SIGMOD 2007), the
# basis of the DataSketches theta sketch. Where HLL only counts, a KMV
# sample — the k smallest distinct hash values per group — supports set
# ALGEBRA: union (merge samples, re-take min-k) and intersection
# (theta-sketch rule: count common hashes below the smaller saturation
# threshold, divide by the threshold). Engine-portable by this module's
# convention: the hash is the first 13 hex chars of md5 as an exact 52-bit
# int, estimates are the only floats (round-6), thresholds stay int64.

_KMV_FULL = 1 << 52  # theta of an unsaturated sketch: the whole hash space


def kmv_hash(value: Column) -> Column:
    """52-bit uniform hash: first 13 hex chars of md5(value) as bigint."""
    return F.conv(F.substring(F.md5(value), 1, _SUF_CHARS), 16, 10).cast(
        "bigint"
    )


def kmv_sample(
    df: DataFrame,
    value: Column,
    group_cols: Sequence[str] = (),
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sample: (group_cols..., h) — the k smallest DISTINCT
    52-bit hashes of `value`.

    Scale shape: the distinct() partial-aggregates map-side (each task
    dedupes before the shuffle), and the min-k window ranks within each
    group once. Like hll_registers, this runs ONCE at the finest grain;
    the payoff is that every later union / intersection / rollup operates
    on <= k rows per group (kmv_merge, kmv_pairwise_overlap), never
    rescanning the raw data — the mergeable-summary contract."""
    # NULL hashes sort first under the asc window and would evict a real
    # k-th smallest hash; COUNT(DISTINCT) semantics exclude NULLs
    hashed = (
        df.where(value.isNotNull())
        .select(*group_cols, kmv_hash(value).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(
    *samples: DataFrame, group_cols: Sequence[str] = (), k: int = 64
) -> DataFrame:
    """Union of KMV samples: pool the hash sets, re-take the min-k. The
    result is EXACTLY the sample the union's raw data would have produced
    (min-k of a union = min-k of the union of min-k's), so merges are
    lossless across checkpoint slices / stream micro-batches."""
    out = samples[0]
    for other in samples[1:]:
        out = out.unionByName(other)
    return (
        out.distinct()
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
            ),
        )
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    sample: DataFrame, group_cols: Sequence[str] = (), k: int = 64
) -> DataFrame:
    """(group_cols..., n_sample, theta_h, kmv_distinct). An unsaturated
    sample (n_sample < k) holds EVERY distinct hash, so the count is exact
    and theta_h covers the full space; a saturated one estimates
    (k-1) / u_(k) with u_(k) = kth-min / 2^52 (Beyer et al. eq. 2 —
    unbiased, unlike k/u_(k))."""
    g = sample.groupBy(*group_cols).agg(
        F.count("*").alias("n_sample"), F.max("h").alias("kth_h")
    )
    sat = F.col("n_sample") >= k
    theta = F.when(sat, F.col("kth_h")).otherwise(F.lit(_KMV_FULL))
    est = F.when(sat, F.round(F.lit(float(k - 1)) * F.lit(float(_KMV_FULL)) / F.col("kth_h"), 6)).otherwise(
        F.col("n_sample").cast("double")
    )
    return g.select(
        *group_cols,
        "n_sample",
        theta.cast("bigint").alias("theta_h"),
        est.alias("kmv_distinct"),
    )


def kmv_pairwise_overlap(
    sample: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Theta-sketch set algebra between every unordered pair of groups in
    one KMV sample table: (g_a, g_b, theta_h, n_common, inter_est,
    union_est, jaccard_est).

    Rule (Dasgupta et al., "Theta-Sketch Framework", 2016): clip both
    samples to the pair's shared threshold theta = min(theta_a, theta_b);
    the common hashes below theta are a uniform sample of the
    intersection at rate theta / 2^52, so |A∩B| ~= n_common * 2^52 /
    theta. Union comes from inclusion-exclusion over the per-group
    estimates; Jaccard = inter / union. Everything joins on the <=k-row
    samples — the raw data is never rescanned, and the hash equi-join is
    linear in sample size (never all-pairs on rows)."""
    est = kmv_estimate(sample, (group_col,), k)
    a = sample.select(F.col(group_col).alias("g_a"), "h")
    b = sample.select(F.col(group_col).alias("g_b"), "h")
    ea = F.broadcast(
        est.select(
            F.col(group_col).alias("g_a"),
            F.col("theta_h").alias("theta_a"),
            F.col("kmv_distinct").alias("est_a"),
        )
    )
    eb = F.broadcast(
        est.select(
            F.col(group_col).alias("g_b"),
            F.col("theta_h").alias("theta_b"),
            F.col("kmv_distinct").alias("est_b"),
        )
    )
    theta = F.least(F.col("theta_a"), F.col("theta_b"))
    common = (
        a.join(b, "h")
        .filter(F.col("g_a") < F.col("g_b"))
        .join(ea, "g_a")
        .join(eb, "g_b")
        .filter(F.col("h") < theta)
        .groupBy("g_a", "g_b", "theta_a", "theta_b", "est_a", "est_b")
        .agg(F.count("*").alias("n_common"))
    )
    # pairs with zero common hashes still need a row: spine of all pairs
    spine = (
        ea.crossJoin(eb)
        .filter(F.col("g_a") < F.col("g_b"))
        .join(common.select("g_a", "g_b", "n_common"), ["g_a", "g_b"], "left")
        .fillna(0, ["n_common"])
    )
    theta_s = F.least(F.col("theta_a"), F.col("theta_b"))
    inter = F.round(
        F.col("n_common") * F.lit(float(_KMV_FULL)) / theta_s, 6
    )
    union = F.round(F.col("est_a") + F.col("est_b") - inter, 6)
    return spine.select(
        "g_a",
        "g_b",
        theta_s.alias("theta_h"),
        "n_common",
        inter.alias("inter_est"),
        union.alias("union_est"),
        F.round(inter / union, 6).alias("jaccard_est"),
    )


def cms_join_size(
    a_counters: DataFrame, b_counters: DataFrame, d: int = 4, w: int = 512
) -> DataFrame:
    """Equi-join cardinality estimate from two CMS counter states built on
    the join key: |A JOIN B on k| = sum_k fa(k)*fb(k), and the sketch
    inner product sum_col a[row,col]*b[row,col] per row overestimates it
    by hash-collision mass only (Cormode & Muthukrishnan §4.2), so the
    estimate is min over the d rows — never an underestimate, error
    ~ ||fa||*||fb|| / w per colliding pair.

    This is what a cost-based planner wants BEFORE committing to a join
    strategy at 100 TB: both inputs reduce to <= d*w-row states
    (partial-aggregatable counts, mergeable across slices), the inner
    product is a join of two tiny relations, and the raw tables are never
    touched. Returns one row: (est_join_size,) as exact int64 (counts *
    counts summed — no floats anywhere)."""
    a = a_counters.select("row", "col", F.col("cnt").alias("a_cnt"))
    b = b_counters.select("row", "col", F.col("cnt").alias("b_cnt"))
    per_row = (
        a.join(b, ["row", "col"])
        .groupBy("row")
        .agg(F.sum(F.col("a_cnt") * F.col("b_cnt")).alias("ip"))
    )
    # a sketch row with NO common cells has inner product 0 — but only if
    # that row exists on both sides at all; rows are always 0..d-1 by
    # construction, so missing (row) groups after the inner join mean a
    # zero inner product and the true join size is 0. Union a zero spine.
    spine = a_counters.sparkSession.range(d).select(
        F.col("id").cast("int").alias("row"), F.lit(0).cast("bigint").alias("ip")
    )
    full = per_row.unionByName(spine).groupBy("row").agg(
        F.max("ip").alias("ip")
    )
    return full.agg(F.min("ip").cast("bigint").alias("est_join_size"))


def dd_cdf_normalize(
    df: DataFrame,
    value: Column,
    group_cols: Sequence[str] = (),
    alpha: float = DD_ALPHA,
    value_name: str = "value",
) -> DataFrame:
    """Approximate-CDF score normalization — the sort-free scale path
    score_normalize's docstring points at: instead of percent_rank's
    total order per group (a single hot group serializes onto one task),
    build the group's DDSketch histogram (tiny, mergeable), broadcast its
    cumulative form back, and read each row's CDF from its own bucket:

        cdf = (count below bucket + (count in bucket + 1) / 2) / (n + 1)

    — the mid-rank convention, so ties (same bucket) get the same value
    and the result sits strictly inside (0, 1). Cost: one partial agg to
    the histogram, one window cumsum over the TINY histogram, one
    broadcast join back; the raw data is never sorted. Accuracy: ranks
    are exact per bucket, values within relative alpha. Non-positive
    values fall outside the positive store and return NULL cdf (callers
    shift first, as with dd_histogram).

    Output: (group_cols..., `value_name`, bucket, dd_cdf)."""
    g = dd_gamma(alpha)
    gcols = list(group_cols)
    hist = dd_histogram(df, value, gcols, alpha)
    w = (
        Window.partitionBy(*[F.col(c) for c in gcols])
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy(*[F.col(c) for c in gcols])
    cum = hist.select(
        *gcols,
        "bucket",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
        F.sum("cnt").over(wn).alias("n"),
    )
    bucket = F.ceil(
        F.round(F.log(value.cast("double")) / F.lit(_math_log(g)), 6)
    ).cast("long")
    rows = df.select(*gcols, value.alias(value_name), bucket.alias("bucket"))
    joined = rows.join(F.broadcast(cum), [*gcols, "bucket"], "left")
    cdf = F.round(
        (F.col("below") + (F.col("cnt") + 1) / F.lit(2.0))
        / (F.col("n") + F.lit(1)),
        6,
    )
    return joined.select(*gcols, value_name, "bucket", cdf.alias("dd_cdf"))

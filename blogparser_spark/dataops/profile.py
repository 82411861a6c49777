"""Data-quality profiling: the gates a pipeline runs BEFORE trusting a new
drop of upstream data — referential integrity across tables, per-column
null/blank rates. Both are single lazy plans (an outer join + one aggregate,
or one aggregate + an unpivot), never driver-side row inspection, so they
compose into jobs and stay exactly as cheap at 10^12 rows as a scan."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fk_orphan_counts(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """(relation, n_child, n_orphans, orphan_frac): child rows whose FK has
    no parent row. One LEFT join against the distinct parent keys (hash on
    the FK, or no shuffle at all when the parent side broadcasts) feeding
    one aggregate — the cheapest exact integrity check, and orphan_frac is
    the quantity jobs alert on."""
    p = (
        parent.select(F.col(parent_key).alias(child_key))
        .distinct()
        .withColumn("_p", F.lit(1))
    )
    j = child.select(child_key).join(p, child_key, "left")
    orphans = F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0))
    return j.agg(
        F.lit(relation).alias("relation"),
        F.count(F.lit(1)).alias("n_child"),
        orphans.cast("bigint").alias("n_orphans"),
        F.round(
            orphans / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
        ).alias("orphan_frac"),
    )


def fk_audit(
    pairs: Sequence[tuple[DataFrame, DataFrame, str, str, str]],
) -> DataFrame:
    """Union of fk_orphan_counts over (child, parent, child_key, parent_key,
    relation) tuples — one audit table for the whole schema, still one lazy
    plan."""
    if not pairs:
        raise ValueError("fk_audit needs at least one (child, parent, …) pair")
    out = None
    for child, parent, ck, pk, rel in pairs:
        row = fk_orphan_counts(child, parent, ck, pk, rel)
        out = row if out is None else out.unionByName(row)
    return out


def null_blank_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column (col, n_rows, n_null, n_blank): nulls plus
    empty-after-trim strings (blank applies to string columns; others
    report 0). ONE aggregate over one scan regardless of column count —
    every counter is a conditional sum, map-side combinable — then an
    in-plan unpivot (explode of per-column structs) to audit rows."""
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_n_{c}")
        )
        blank = (
            F.col(c).isNotNull() & (F.trim(F.col(c)) == "")
            if dtypes[c] == "string"
            else F.lit(False)
        )
        aggs.append(
            F.sum(F.when(blank, 1).otherwise(0)).cast("bigint").alias(f"_b_{c}")
        )
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_n_{c}").alias("n_null"),
                F.col(f"_b_{c}").alias("n_blank"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(structs).alias("r")).select("r.*")


def contingency_chi2(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns: one row with (n_obs, n_rows_a, n_cols_b, dof, chi2).

    The contingency table is built from ONE partial agg over the raw data;
    marginals are re-aggregations of that |A|×|B| grid, broadcast back
    onto it. Structural-zero cells (category pair never observed) still
    contribute their expected count e to the statistic — rather than
    materializing the dense grid, we use
    Σ_all (o−e)²/e  =  Σ_observed ((o−e)²/e − e) + grand_total
    (because Σ_all e = grand_total), so the plan never builds absent
    cells. All inputs to the float math are exact integers, so round(…,6)
    is engine-stable.

    Rows with a NULL in either categorical are excluded up front (the
    standard complete-case chi2): a NULL cell would survive the groupBy
    but never match the null-unsafe marginal joins, leaving its term out
    of the sum while grand_total still counted it — an inflated chi2 and
    n_obs < grand_total."""
    df = df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    obs = df.groupBy(col_a, col_b).agg(F.count("*").alias("o"))
    row_t = obs.groupBy(col_a).agg(F.sum("o").alias("row_total"))
    col_t = obs.groupBy(col_b).agg(F.sum("o").alias("col_total"))
    grand = obs.agg(F.sum("o").alias("grand_total"))
    cells = (
        obs.join(F.broadcast(row_t), col_a)
        .join(F.broadcast(col_t), col_b)
        .crossJoin(F.broadcast(grand))
    )
    e = (
        F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
        / F.col("grand_total").cast("double")
    )
    term = (F.col("o") - e) * (F.col("o") - e) / e - e
    return cells.agg(
        F.sum("o").alias("n_obs"),
        F.countDistinct(col_a).alias("n_rows_a"),
        F.countDistinct(col_b).alias("n_cols_b"),
        (
            (F.countDistinct(col_a) - F.lit(1))
            * (F.countDistinct(col_b) - F.lit(1))
        ).alias("dof"),
        F.round(F.sum(term) + F.first(F.col("grand_total")), 6).alias("chi2"),
    )


def categorical_entropy(
    df: DataFrame, key_cols: Sequence[str], cat_col: str
) -> DataFrame:
    """Per-key Shannon entropy (nats) of a categorical column's
    distribution, plus n_events and n_distinct.

    Uses the factored form H = ln(n) − (Σ c·ln c)/n over per-(key, cat)
    counts, so BOTH aggregation levels are plain partial-aggregatable
    groupBys — no window, no second pass to learn n before the log. The
    per-key reduce state is one (sum, sum, count) triple regardless of
    category cardinality."""
    counts = df.groupBy(*key_cols, cat_col).agg(F.count("*").alias("c"))
    n = F.sum("c").cast("double")
    return counts.groupBy(*key_cols).agg(
        F.sum("c").alias("n_events"),
        F.count("*").alias("n_distinct"),
        F.round(
            F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 6
        ).alias("entropy_nats"),
    )


def slice_column_manifest(
    df: DataFrame,
    id_col: str,
    cols: Sequence[str],
    n_slices: int = 16,
) -> DataFrame:
    """Iceberg-manifest-analog column statistics per storage slice: for
    each md5(id)-derived slice, every named column's min / max / null
    count plus the slice row count — the planning metadata a stats-aware
    reader prunes with (the per-FILE twin is storage.file_minmax_manifest;
    this one keys on the engine-portable md5 slice instead of the physical
    file name, so the DuckDB oracle can reproduce it bit-for-bit, and it
    composes with checkpoint.write_sliced_input's slice layout).

    ONE scan, one partial agg onto n_slices × |cols| cells — column count
    widens the aggregate, never adds passes. Min/max land as strings
    (cast) so heterogeneous column types fit one unpivoted schema."""
    slc = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_slices
    ).alias("slice_id")
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_null_{c}"),
        ]
    per_slice = df.select(slc, *cols).groupBy("slice_id").agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("_rows").alias("n_rows"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.col(f"_null_{c}").alias("n_null"),
            )
            for c in cols
        ]
    )
    return per_slice.select("slice_id", F.explode(structs).alias("r")).select(
        "slice_id", "r.*"
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_cols: Sequence[str],
    bin_col: str = "bin",
    n_bins: int = 16,
) -> DataFrame:
    """Population Stability Index between a reference and a current slice
    of the same feature, per group: (group_cols..., n_ref, n_cur,
    n_bins_hit_ref, n_bins_hit_cur, psi) — the standard drift gate a
    pipeline runs before trusting a new drop (PSI < 0.1 stable, 0.1-0.25
    drifting, > 0.25 broken).

    Both inputs must carry an integer `bin_col` in [0, n_bins) (bin on
    integer-derived quantities — a bare floor(value), never a float
    product — so both engines bucket identically). PSI = sum over ALL
    n_bins bins of (p - q) * ln(p / q) with Laplace-smoothed
    p = (a+1)/(A+K), q = (b+1)/(B+K): the +1 makes empty bins finite, and
    summing over the fixed K-bin spine (exploded per group, never a dense
    materialization of absent data) keeps the statistic comparable across
    groups. Scale shape: two partial-aggregatable groupBys onto
    |groups| x n_bins cells, broadcast totals, one final agg — the raw
    slices are each scanned once. Floats enter only at the p/q division
    and the ln; every input is an exact integer count, so round-6 is
    engine-stable (the categorical_entropy precedent)."""
    gc = list(group_cols)
    a = ref.groupBy(*gc, bin_col).agg(F.count("*").alias("a"))
    b = cur.groupBy(*gc, bin_col).agg(F.count("*").alias("b"))
    return psi_from_counts(a, b, group_cols, bin_col, n_bins)


def psi_from_counts(
    a: DataFrame,
    b: DataFrame,
    group_cols: Sequence[str],
    bin_col: str = "bin",
    n_bins: int = 16,
) -> DataFrame:
    """psi_drift on PRE-AGGREGATED histograms: `a`/`b` carry
    (group_cols..., bin_col, a/b counts). The entry point for callers that
    hold one side as a static groups×n_bins artifact — a streaming monitor
    scores every micro-batch against the same reference histogram without
    rescanning the reference data (see run_streaming_drift)."""
    gc = list(group_cols)
    groups = a.select(*gc).unionByName(b.select(*gc)).distinct()
    spine = groups.select(
        *gc, F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias(bin_col)
    )
    cells = (
        spine.join(a, [*gc, bin_col], "left")
        .join(b, [*gc, bin_col], "left")
        .fillna(0, ["a", "b"])
    )
    tot = cells.groupBy(*gc).agg(
        F.sum("a").alias("ta"),
        F.sum("b").alias("tb"),
        F.sum((F.col("a") > 0).cast("bigint")).alias("ha"),
        F.sum((F.col("b") > 0).cast("bigint")).alias("hb"),
    )
    j = cells.join(F.broadcast(tot), gc)
    p = (F.col("a") + 1).cast("double") / (F.col("ta") + F.lit(n_bins))
    q = (F.col("b") + 1).cast("double") / (F.col("tb") + F.lit(n_bins))
    term = (p - q) * F.log(p / q)
    return j.groupBy(*gc).agg(
        F.first("ta").alias("n_ref"),
        F.first("tb").alias("n_cur"),
        F.first("ha").alias("n_bins_hit_ref"),
        F.first("hb").alias("n_bins_hit_cur"),
        F.round(F.sum(term), 6).alias("psi"),
    )


def fd_profile(
    df: DataFrame, candidates: Sequence[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency discovery metrics for candidate lhs -> rhs
    pairs: (lhs_col, rhs_col, n_rows, n_groups, n_violating_groups,
    g3_error). A pair is an exact FD iff n_violating_groups = 0; g3_error
    is the classic minimum fraction of rows to delete for the FD to hold
    (Kivinen & Mannila 1995): (N - sum over lhs groups of the modal rhs
    count) / N — the quantity schema-inference and data-contract checks
    threshold on.

    Scale shape per candidate: groupBy(lhs, rhs) count, then a second
    partial agg per lhs (max count = modal rhs, count(*) = distinct rhs),
    then one global agg — all partial-aggregatable, no window, no
    distinct shuffle of raw rows. Candidates run as a union of
    independent branches over the same scan (Spark reuses the cached
    relation; each branch prunes to its two columns)."""
    out = None
    for lhs, rhs in candidates:
        cnt = df.groupBy(lhs, rhs).agg(F.count("*").alias("_fd_c"))
        per = cnt.groupBy(lhs).agg(
            F.sum("_fd_c").alias("_fd_rows"),
            F.count("*").alias("_fd_n_rhs"),
            F.max("_fd_c").alias("_fd_modal"),
        )
        one = per.agg(
            F.sum("_fd_rows").alias("n_rows"),
            F.count("*").alias("n_groups"),
            F.sum((F.col("_fd_n_rhs") > 1).cast("bigint")).alias(
                "n_violating_groups"
            ),
            F.round(
                (F.sum("_fd_rows") - F.sum("_fd_modal")).cast("double")
                / F.sum("_fd_rows"),
                6,
            ).alias("g3_error"),
        ).select(
            F.lit(lhs).alias("lhs_col"),
            F.lit(rhs).alias("rhs_col"),
            "n_rows",
            "n_groups",
            "n_violating_groups",
            "g3_error",
        )
        out = one if out is None else out.unionByName(one)
    return out


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_cols: Sequence[str],
    bin_col: str = "bin",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic over binned values, per
    group: (group_cols..., n_ref, n_cur, ks_d) with
    D = max over bins of |CDF_ref − CDF_cur| — PSI's complement (PSI
    integrates log-ratio mass everywhere; KS reads the single worst CDF
    gap, insensitive to smoothing choices and usable when one side has
    empty bins that PSI must Laplace-patch).

    Shape: per-side bin counts (partial aggs), a full outer join on
    (group, bin), one cumulative window over the TINY per-group bin list,
    one max agg. Each CDF value is an independent exact-int ratio and
    max() is order-free, so no float-summation ordering exists at all —
    round-6 on D alone."""
    gc = list(group_cols)
    a = ref.groupBy(*gc, bin_col).agg(F.count("*").alias("a"))
    b = cur.groupBy(*gc, bin_col).agg(F.count("*").alias("b"))
    cells = a.join(b, [*gc, bin_col], "full").fillna(0, ["a", "b"])
    w = (
        Window.partitionBy(*[F.col(c) for c in gc])
        .orderBy(bin_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy(*[F.col(c) for c in gc])
    cum = cells.select(
        *gc,
        F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb"),
        F.sum("a").over(wg).alias("ta"),
        F.sum("b").over(wg).alias("tb"),
    )
    # a group present on only one side has ta or tb = 0: its empty-side
    # CDF is 0 everywhere, so D correctly saturates to 1.0 — the
    # new/dropped-segment answer a drift gate must report (a bare
    # division would throw under ANSI and yield NaN otherwise)
    cdf_a = F.when(
        F.col("ta") > 0, F.col("ca").cast("double") / F.col("ta")
    ).otherwise(F.lit(0.0))
    cdf_b = F.when(
        F.col("tb") > 0, F.col("cb").cast("double") / F.col("tb")
    ).otherwise(F.lit(0.0))
    gap = F.abs(cdf_a - cdf_b)
    return cum.groupBy(*gc).agg(
        F.first("ta").alias("n_ref"),
        F.first("tb").alias("n_cur"),
        F.round(F.max(gap), 6).alias("ks_d"),
    )


def k_anonymity_groups(
    df: DataFrame, qid_cols: Sequence[str], id_col: str, k: int = 5
) -> DataFrame:
    """Per quasi-identifier combination: row count, distinct-individual
    count, and the k-anonymity risk flag (Sweeney 2002 — a release is
    k-anonymous iff every quasi-identifier combination covers >= k
    individuals). ONE hash aggregate keyed on the QID tuple; the exact
    distinct-id count is Spark's standard two-phase expand, partial-agg
    friendly, so the shuffle carries (qid, id) partials — never rows. At
    10^12 rows the output stays QID-cardinality-sized."""
    return df.groupBy(*qid_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(id_col).alias("n_ids"),
        (F.countDistinct(id_col) < k).alias("at_risk"),
    )


def k_anonymity_audit(
    df: DataFrame,
    qid_cols: Sequence[str],
    id_col: str,
    k: int = 5,
    by: str | None = None,
) -> DataFrame:
    """Release-level k-anonymity audit, optionally per `by` slice: group
    count, risky-group count, rows falling in risky groups, the minimum
    group width, and the risky-row fraction — the numbers a privacy gate
    alerts on before a dataset ships. Two stacked aggregates, both
    map-side combinable. A `by` column outside the QIDs joins the QID
    grouping (each slice is audited as its own release — QID groups do
    not span slices); without this the inner aggregate would drop the
    column and the slice rollup could not resolve it."""
    qids = list(qid_cols) + ([by] if by and by not in qid_cols else [])
    groups = k_anonymity_groups(df, qids, id_col, k)
    keys = [by] if by else []
    risky_rows = F.sum(F.when(F.col("at_risk"), F.col("n_rows")).otherwise(0))
    agg = groups.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("at_risk"), 1).otherwise(0)).cast("bigint").alias("n_risky_groups"),
        risky_rows.cast("bigint").alias("n_rows_at_risk"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("n_ids").cast("bigint").alias("min_group_ids"),
    )
    return agg.withColumn(
        "risky_row_frac",
        F.round(F.col("n_rows_at_risk") / F.greatest(F.col("n_rows"), F.lit(1)), 6),
    )


def l_diversity_audit(
    df: DataFrame,
    qid_cols: Sequence[str],
    sensitive_col: str,
    l_min: int = 3,
    by: str | None = None,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al., TKDD 2007): a
    k-anonymous release still leaks when a quasi-identifier group's
    SENSITIVE values are homogeneous — every member is revealed to share
    the one value. A group is diverse iff it covers >= l_min distinct
    sensitive values. Same two stacked map-side-combinable aggregates as
    k_anonymity_audit (the exact distinct is the standard two-phase
    expand — (qid, sensitive) partials shuffle, never rows), same
    release-level rollup: group counts, risky groups, rows at risk, the
    minimum diversity width, risky-row fraction, optionally per `by`
    slice audited as its own release."""
    qids = list(qid_cols) + ([by] if by and by not in qid_cols else [])
    groups = df.groupBy(*qids).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
        (F.countDistinct(sensitive_col) < l_min).alias("at_risk"),
    )
    keys = [by] if by else []
    risky_rows = F.sum(F.when(F.col("at_risk"), F.col("n_rows")).otherwise(0))
    agg = groups.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("at_risk"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_risky_groups"),
        risky_rows.cast("bigint").alias("n_rows_at_risk"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("n_sensitive").cast("bigint").alias("min_diversity"),
    )
    return agg.withColumn(
        "risky_row_frac",
        F.round(
            F.col("n_rows_at_risk") / F.greatest(F.col("n_rows"), F.lit(1)), 6
        ),
    )

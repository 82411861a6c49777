"""Data-quality profiling: the gates a pipeline runs BEFORE trusting a new
drop of upstream data — referential integrity across tables, per-column
null/blank rates. Both are single lazy plans (an outer join + one aggregate,
or one aggregate + an unpivot), never driver-side row inspection, so they
compose into jobs and stay exactly as cheap at 10^12 rows as a scan."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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

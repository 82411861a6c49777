"""Similarity search over an embedding column (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline. The query set is broadcast
    (it is small by construction), so the big side is scanned once with no
    shuffle.
  - IVF (inverted-file) bucketed top-k: the scale path. A small centroid set
    partitions the corpus into cells; each query probes only its nearest
    `nprobe` cells, cutting the candidate set by ~|cells|/nprobe. At 100 TB
    the cell assignment is a write-time partitioning key, so a probe reads
    only matching partitions (partition pruning), not the whole corpus.

Kernel strategy (the hot path is pairs × dim): vector norms are computed
ONCE per row, before any join, as native Column expressions (O(dim) per
vector, linear); the per-PAIR dot products run in a numpy-backed Arrow
pandas UDF (`dot_udf`) — one einsum per Arrow batch, BLAS-vectorized —
instead of the interpreted `F.aggregate`/`zip_with` lambda this replaced
(CLAUDE.md rule 1: array HOFs run interpreted, ~20× slower; measured ≥2×
end-to-end on q_ann). The Column-expression forms are kept for the norm
precompute and for small/one-off uses.

Centroids are taken deterministically (lowest vec_ids) so results — and the
DuckDB SQL oracle — are reproducible without a random state. All math is
double-precision with a final round(6) so cross-engine float comparison is
exact (the rounding also absorbs summation-order differences between numpy
pairwise sums, Catalyst left folds, and DuckDB list_dot_product).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Column-expression dot — interpreted; use only outside per-pair loops."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


@F.pandas_udf(DoubleType())
def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched pairwise dot product: one einsum per Arrow batch. Embedding
    dims are uniform within a table, so the batch stacks into a matrix."""
    import numpy as np

    A = np.asarray(a.tolist(), dtype=np.float64)
    B = np.asarray(b.tolist(), dtype=np.float64)
    if len(A) == 0:
        return pd.Series([], dtype="float64")
    return pd.Series(np.einsum("ij,ij->i", A, B))


def _pair_cosine(av: Column, bv: Column, an: Column, bn: Column) -> Column:
    """cosine from pre-computed norms + batched dot (the hot-pair kernel)."""
    return F.round(dot_udf(av, bv) / F.greatest(an * bn, F.lit(1e-12)), 6)


def brute_force_topk(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the first `n_queries`
    vectors (deterministic query set). Plan shape: broadcast(queries) ⋈ scan,
    norms precomputed per ROW (not per pair), batched-numpy dots per pair,
    window top-k per query — one pass over the corpus."""
    base = df.select(
        F.col(id_col).alias("nid"), _dvec(F.col(vec_col)).alias("nv")
    ).withColumn("nn", norm(F.col("nv")))
    queries = (
        df.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv"))
        .withColumn("qn", norm(F.col("qv")))
    )
    sims = (
        base.join(F.broadcast(queries), F.col("nid") != F.col("qid"))
        .withColumn(
            "sim", _pair_cosine(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn"))
        )
        .select("qid", "nid", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "sim")
    )


def brute_force_topk_matmul(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_sim: float | None = None,
) -> DataFrame:
    """The BLAS scale path for exact top-k: the (small) query matrix is
    collected once and closed over (Spark serializes it to each python
    worker — the manual analog of a broadcast variable), then every Arrow
    batch of the corpus computes sims = V @ Q.T in ONE matmul and emits
    only its LOCAL top-k rows per query. The shuffle that feeds the global
    top-k window therefore carries ≤ k·n_partitions·n_queries candidate
    rows instead of n_corpus·n_queries — at 10^9 vectors that is the
    difference between a 10-row-per-query merge and a 10^10-row shuffle.
    Same results as brute_force_topk (equivalence-tested); sims are rounded
    to 6 decimals BEFORE the local prune so the local and global orderings
    share one key — pruning on raw floats could cut a candidate that ties
    at the boundary under the rounded global (sim, nid) order. With
    max_sim set, only neighbors with rounded sim strictly below it are
    eligible (applied inside the kernel before the local prune, so the
    filtered top-k stays exact)."""
    import numpy as np

    q_rows = (
        df.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    out_schema = "qid long, nid long, sim double"
    if not q_rows:
        # no ids below n_queries: empty result, same as brute_force_topk
        # (np.linalg.norm(axis=1) on a 0-row array would raise AxisError)
        return df.sparkSession.createDataFrame([], out_schema)
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = np.asarray([list(r["qv"]) for r in q_rows], dtype=np.float64)
    Qnorm = np.maximum(np.linalg.norm(Q, axis=1), 1e-12)

    def per_batch(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(V, axis=1), 1e-12)
            # dot first, normalize after — the same association order as the
            # join kernel (dot/(|v||q|)) and the DuckDB oracle, so round(6)
            # lands identically across all three
            sims = (V @ Q.T) / np.outer(norms, Qnorm)  # one BLAS call
            sims = np.round(sims, 6)
            rows = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                mask = ids != qid
                if max_sim is not None:
                    # threshold INSIDE the kernel, before the local top-k:
                    # filtering commutes with top-k, so the filtered global
                    # result stays exact (hard_negative_topk's contract)
                    mask &= col < max_sim
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                # local order = global tie-break on the ROUNDED key:
                # (-sim, nid), so boundary ties survive deterministically
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))
                top = cand_idx[order[:k]]
                for i in top:
                    rows.append((int(qid), int(ids[i]), float(col[i])))
            if rows:
                yield pd.DataFrame(rows, columns=["qid", "nid", "sim"])

    local = df.select(id_col, vec_col).mapInPandas(per_batch, out_schema)
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "sim")
    )


def assign_ivf_cells(
    df: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: centroid set = vectors with the n_cells lowest
    ids (deterministic); each vector goes to its max-cosine centroid (ties →
    lowest centroid id). The cell id becomes a partitioning key for the
    ANN-at-scale path."""
    cents = (
        df.filter(F.col(id_col) < n_cells)
        .select(F.col(id_col).alias("cid"), _dvec(F.col(vec_col)).alias("cv"))
        .withColumn("cn", norm(F.col("cv")))
    )
    base = df.select(F.col(id_col), _dvec(F.col(vec_col)).alias("v")).withColumn(
        "vn", norm(F.col("v"))
    )
    scored = base.join(F.broadcast(cents)).withColumn(
        "csim", _pair_cosine(F.col("v"), F.col("cv"), F.col("vn"), F.col("cn"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cid"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(F.col(id_col), F.col("cid").alias("cell"), F.col("csim").alias("cell_sim"))
    )


def ivf_topk(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the query's own cell (nprobe=1).
    Recall < 1 by design; the exactness trade is the point of the scale
    path — at 100 TB the probe reads 1/n_cells of the corpus. Pass a
    precomputed `cells` assignment (or use a write_ivf_partitioned layout
    + ivf_probe_partitioned) so repeated queries don't re-derive it —
    cell-at-write-time is the production shape."""
    if cells is None:
        cells = assign_ivf_cells(df, n_cells, id_col, vec_col)
    with_cell = df.join(cells.select(id_col, "cell"), id_col)
    base = with_cell.select(
        F.col(id_col).alias("nid"),
        F.col("cell").alias("ncell"),
        _dvec(F.col(vec_col)).alias("nv"),
    ).withColumn("nn", norm(F.col("nv")))
    queries = (
        with_cell.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("qid"),
            F.col("cell").alias("qcell"),
            _dvec(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qn", norm(F.col("qv")))
    )
    sims = (
        base.join(
            F.broadcast(queries),
            (F.col("ncell") == F.col("qcell")) & (F.col("nid") != F.col("qid")),
        )
        .withColumn(
            "sim", _pair_cosine(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn"))
        )
        .select("qid", "nid", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "sim")
    )


def ivf_recall_nprobe_sweep(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 8,
    nprobes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF tuning curve: recall@k at every nprobe level in ONE plan —
    the recall-vs-cells-read trade a deployment sweeps to pick nprobe
    (FAISS's standard evaluation). Candidates are scored ONCE against the
    union of each query's top-max(nprobes) cells, tagged with the cell's
    similarity rank (crank); each sweep level is then just a crank filter
    + per-(nprobe, qid) window top-k over the already-scored rows, so
    adding levels adds no similarity math and no corpus rescans. The
    exact matmul top-k is the ground truth (brute_force_topk_matmul).

    Returns (nprobe, qid, n_exact, n_hits, recall); recall is
    non-decreasing in nprobe by construction (a superset of cells can
    only add candidates). At 100 TB the cand join is the partitioned
    probe (cell IN top-nprobe cells → partition pruning); the sweep adds
    one small explode by |nprobes| over k-bounded shortlists."""
    max_np = max(nprobes)
    spark = df.sparkSession
    cents = (
        df.filter(F.col(id_col) < n_cells)
        .select(F.col(id_col).alias("cid"), _dvec(F.col(vec_col)).alias("cv"))
        .withColumn("cn", norm(F.col("cv")))
    )
    queries = (
        df.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv"))
        .withColumn("qn", norm(F.col("qv")))
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("cid"))
    qranks = (
        queries.join(F.broadcast(cents))
        .withColumn(
            "csim",
            _pair_cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")),
        )
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= max_np)
        .select("qid", F.col("cid").alias("cell"), "crank", "qv", "qn")
    )
    cells = assign_ivf_cells(df, n_cells, id_col, vec_col)
    corpus = (
        df.join(cells.select(id_col, "cell"), id_col)
        .select(
            F.col(id_col).alias("nid"),
            F.col("cell").alias("ncell"),
            _dvec(F.col(vec_col)).alias("nv"),
        )
        .withColumn("nn", norm(F.col("nv")))
    )
    cand = (
        corpus.join(
            F.broadcast(qranks),
            (F.col("ncell") == F.col("cell")) & (F.col("nid") != F.col("qid")),
        )
        .withColumn(
            "sim",
            _pair_cosine(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")),
        )
        .select("qid", "nid", "crank", "sim")
    )
    levels = spark.createDataFrame([(int(n),) for n in nprobes], "nprobe int")
    wl = Window.partitionBy("nprobe", "qid").orderBy(
        F.desc("sim"), F.asc("nid")
    )
    approx = (
        cand.join(F.broadcast(levels), F.col("crank") <= F.col("nprobe"))
        .withColumn("rank", F.row_number().over(wl))
        .filter(F.col("rank") <= k)
        .select("nprobe", "qid", "nid", F.lit(1).alias("_hit"))
    )
    exact = brute_force_topk_matmul(df, n_queries=n_queries, k=k).select(
        "qid", "nid"
    )
    return (
        exact.crossJoin(F.broadcast(levels))
        .join(approx, ["nprobe", "qid", "nid"], "left")
        .groupBy("nprobe", "qid")
        .agg(
            F.count("*").alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) / F.count("*"), 6
            ).alias("recall"),
        )
    )


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> None:
    """Materialize the ANN-at-scale layout: the corpus written PARTITIONED
    BY its IVF cell (cell assignment happens once, at write time) plus the
    tiny centroid set alongside. A probe then filters on the partition
    column and the scan prunes to 1/n_cells of the files — the claim the
    module docstring makes is demonstrated by ivf_probe_partitioned's
    PartitionFilters plan assertion (tests/test_plans.py). Iceberg would
    express the same thing as a partition transform on cell.

    `refine_iters` > 0 runs that many Lloyd rounds (kmeans_centroids)
    before assignment, so the layout's cells are the REFINED quantizer —
    better-balanced partitions and higher probe recall for the same
    nprobe. The centroid file always stores the vectors the assignment
    actually used, so ivf_probe_partitioned stays consistent either way."""
    if refine_iters > 0:
        cents = kmeans_centroids(df, n_cells, refine_iters, id_col, vec_col)
        cells = _assign_to_centroids(
            _kmeans_vecs(df, id_col, vec_col), cents, id_col
        )
        cent_rows = [(cid, [float(x) for x in cv]) for cid, cv in cents]
        cent_df = df.sparkSession.createDataFrame(
            cent_rows, f"{id_col} long, {vec_col} array<double>"
        )
    else:
        cells = assign_ivf_cells(df, n_cells, id_col, vec_col)
        cent_df = df.filter(F.col(id_col) < n_cells).select(id_col, vec_col)
    (
        df.join(cells.select(id_col, "cell"), id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/corpus")
    )
    cent_df.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_probe_partitioned(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 1,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Serve one ANN probe against a write_ivf_partitioned layout: the
    query's nearest `nprobe` centroids are picked DRIVER-side from the
    tiny centroid file (same round-6 / lowest-cid tie-break as
    assign_ivf_cells), and the corpus scan filters cell IN (…literals…) —
    a partition-column predicate, so only the probed cells' files are
    read. At 100 TB with 4096 cells and nprobe=8 that is a 512× scan
    reduction before any similarity math runs."""
    import numpy as np

    cents = spark.read.parquet(f"{path}/centroids").collect()
    cids = np.array([r[id_col] for r in cents], dtype=np.int64)
    C = np.asarray([list(r[vec_col]) for r in cents], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = max(float(np.linalg.norm(q)), 1e-12)
    csims = np.round(
        (C @ q) / (np.maximum(np.linalg.norm(C, axis=1), 1e-12) * qn), 6
    )
    order = np.lexsort((cids, -csims))
    probe_cells = [int(cids[i]) for i in order[:nprobe]]

    corpus = spark.read.parquet(f"{path}/corpus").filter(
        F.col("cell").isin(probe_cells)
    )
    if exclude_id is not None:
        corpus = corpus.filter(F.col(id_col) != exclude_id)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    base = corpus.select(
        F.col(id_col).alias("nid"), _dvec(F.col(vec_col)).alias("nv")
    ).withColumn("nn", norm(F.col("nv")))
    sims = base.withColumn(
        "sim", F.round(dot_udf(F.col("nv"), qlit) / F.greatest(F.col("nn") * F.lit(qn), F.lit(1e-12)), 6)
    )
    return sims.orderBy(F.desc("sim"), F.asc("nid")).limit(k).select("nid", "sim")


def write_ivfpq_partitioned(
    df: DataFrame,
    path: str,
    n_cells: int = 8,
    m: int = 4,
    ksub: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the full ANN serving artifact: the corpus stored as PQ
    CODES (m small ints per vector — 64× less data than d float32s)
    PARTITIONED BY IVF cell, plus the tiny centroid and codebook tables
    alongside. Both scale levers become storage properties: a probe prunes
    partitions (reads 1/n_cells of the files) and each file holds codes,
    not vectors. Assignment and encoding happen ONCE, at write time."""
    cells = assign_ivf_cells(df, n_cells, id_col, vec_col)
    cb = pq_train(df, m, ksub, iters, id_col, vec_col)
    codes = pq_encode(df, cb, id_col, vec_col)
    (
        codes.join(cells.select(id_col, "cell"), id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    df.sparkSession.createDataFrame(
        [(s, c, [float(x) for x in cw]) for s, c, cw in cb],
        "sub long, code long, cw array<double>",
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    df.filter(F.col(id_col) < n_cells).select(id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def ivfpq_probe_partitioned(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 1,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Serve one ANN probe against a write_ivfpq_partitioned layout with a
    PURE-CODEGEN plan: the query's nprobe cells are picked driver-side from
    the tiny centroid file (round-6 cosine, lowest-cid ties — the
    assign_ivf_cells convention), the codes scan filters cell IN (...) — a
    partition-column predicate, so only those cells' files are read — and
    the ADC score is m map-literal lookups (one create_map per subspace,
    element_at on the code) summed in whole-stage codegen. No Python
    crosses the serve path; the only Python was training, at write time.
    Returns (nid, adist) ascending."""
    import numpy as np

    cents = spark.read.parquet(f"{path}/centroids").collect()
    cids = np.array([r[id_col] for r in cents], dtype=np.int64)
    C = np.asarray([list(r[vec_col]) for r in cents], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = max(float(np.linalg.norm(q)), 1e-12)
    csims = np.round(
        (C @ q) / (np.maximum(np.linalg.norm(C, axis=1), 1e-12) * qn), 6
    )
    order = np.lexsort((cids, -csims))
    probe_cells = [int(cids[i]) for i in order[:nprobe]]

    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(int(r["sub"]) for r in cb_rows) + 1
    dsub = len(q) // m
    # LUT[s][code] = round6(|q_s|^2 + |c|^2 - 2 q_s . c) as map literals
    luts = []
    for s in range(m):
        qs = q[s * dsub : (s + 1) * dsub]
        entries: list[Column] = []
        for r in cb_rows:
            if int(r["sub"]) != s:
                continue
            cw = np.asarray(list(r["cw"]), dtype=np.float64)
            d = round(float(qs @ qs + cw @ cw - 2.0 * (qs @ cw)), 6)
            entries += [F.lit(int(r["code"])), F.lit(d)]
        luts.append(F.create_map(*entries))

    scan = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin(probe_cells)
    )
    if exclude_id is not None:
        scan = scan.filter(F.col(id_col) != exclude_id)
    adist = F.round(
        sum(
            F.element_at(luts[s], F.col("codes").getItem(s).cast("int"))
            for s in range(m)
        ),
        6,
    )
    return (
        scan.select(F.col(id_col).alias("nid"), adist.alias("adist"))
        .orderBy(F.asc("adist"), F.asc("nid"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: pairs within the same IVF
    cell with cosine ≥ threshold. Cell blocking keeps the pair join linear-ish
    in corpus size (pairs only form inside cells). Accepts a precomputed
    `cells` assignment like ivf_topk."""
    if cells is None:
        cells = assign_ivf_cells(df, n_cells, id_col, vec_col)
    v = (
        df.join(cells.select(id_col, "cell"), id_col)
        .select(F.col(id_col).alias("id"), F.col("cell"), _dvec(F.col(vec_col)).alias("v"))
        .withColumn("n", norm(F.col("v")))
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "sim", _pair_cosine(F.col("a.v"), F.col("b.v"), F.col("a.n"), F.col("b.n"))
        )
        .filter(F.col("sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "sim")
    )


# ----------------------------------------------------------------- k-means ---


def _assign_to_centroids(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
) -> DataFrame:
    """Max-cosine assignment against a driver-held centroid list (k·d
    doubles — bounded, like the matmul path's query constant). The
    centroid side rides in as a broadcast literal DataFrame; cosine is
    round-6 with lowest-cid tie-break (the engine-portable convention
    every similarity oracle here uses)."""
    spark = vecs.sparkSession
    cdf = spark.createDataFrame(
        [(cid, [float(x) for x in cv]) for cid, cv in centroids],
        f"cid long, cv array<double>",
    ).withColumn("cn", norm(F.col("cv")))
    scored = vecs.join(F.broadcast(cdf)).withColumn(
        "csim", _pair_cosine(F.col("v"), F.col("cv"), F.col("vn"), F.col("cn"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cid"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(F.col(id_col), F.col("cid").alias("cell"), F.col("csim").alias("cell_sim"))
    )


def _kmeans_vecs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(F.col(id_col), _dvec(F.col(vec_col)).alias("v")).withColumn(
        "vn", norm(F.col("v"))
    )


def kmeans_centroids(
    df: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Lloyd refinement of the deterministic first-k IVF centroids —
    distributed k-means the way MLlib runs it: per iteration, one scan
    assigns vectors to their max-cosine centroid (broadcast k×d literal),
    one posexplode → groupBy(cell, pos) partial agg computes the new
    per-coordinate means, and only the k×d aggregated means are collected
    to the driver for the next round. Nothing proportional to the corpus
    ever leaves the executors; per-iteration driver state is k·d doubles.

    Determinism / oracle portability: new centroid components round to 6
    decimals before the next assignment (absorbs summation-order drift
    between engines), ties break to the lowest cid, and a cell that loses
    all members keeps its previous centroid (MLlib's convention).

    Returns the refined centroids as a sorted (cid, vector) list — the
    write-time input for an IVF layout (write_ivf_partitioned)."""
    init = (
        df.filter(F.col(id_col) < n_cells)
        .select(F.col(id_col).alias("cid"), _dvec(F.col(vec_col)).alias("cv"))
        .collect()
    )
    centroids = {int(r["cid"]): list(r["cv"]) for r in init}
    vecs = _kmeans_vecs(df, id_col, vec_col)
    for _ in range(iters):
        assigned = _assign_to_centroids(vecs, sorted(centroids.items()), id_col)
        means = (
            vecs.join(assigned.select(id_col, "cell"), id_col)
            .select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("c"))
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in means:
            upd.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["c"])
        for cid, comp in upd.items():
            centroids[cid] = [comp[i] for i in range(len(comp))]
        # cells absent from `upd` (emptied) keep their previous centroid
    return sorted(centroids.items())


def kmeans_refine(
    df: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final (id, cell, cell_sim) assignment against kmeans_centroids —
    a lazy plan over the refined centroid literal (see kmeans_centroids
    for the iteration contract and scale design)."""
    cents = kmeans_centroids(df, n_cells, iters, id_col, vec_col)
    return _assign_to_centroids(_kmeans_vecs(df, id_col, vec_col), cents, id_col)


# ---------------------------------------------------- product quantization ---
#
# PQ splits each d-dim vector into m contiguous subvectors and quantizes each
# subspace independently against its own ksub-entry codebook, so a vector is
# stored as m small integers instead of d floats. With d=64 float32 and
# m=4/ksub=16 that is 256 bytes -> 4 codes (4 bytes; 2 bytes packed at 4 bits)
# — the memory lever that lets a 100-TB embedding corpus fit an ANN serving
# tier. Queries score compressed codes via an asymmetric-distance LUT
# (Jégou et al., "Product Quantization for Nearest Neighbor Search", TPAMI
# 2011): per query, an m×ksub table of exact subvector distances is built
# once driver-side, and every corpus vector's approximate distance is just m
# table lookups + a sum — no decompression, no per-pair O(d) math.
#
# Determinism / oracle portability: distances use the expanded L2 form
# |v|² + |c|² − 2·v·c rounded to 6 decimals (same association order in numpy
# and the DuckDB oracle), argmin ties break to the lowest code id (numpy's
# first-minimum == SQL's ORDER BY dist, code), Lloyd means round to 6 before
# the next round, and a (sub, code) cell that loses all members keeps its
# previous codeword — the same conventions as kmeans_centroids above.


def _pq_codebook_np(codebooks: list[tuple[int, int, list[float]]]):
    """(sub, code, vec) rows -> C[m, ksub, dsub] float64 (dense by construction:
    init covers every (sub, code) and emptied cells keep their codeword)."""
    import numpy as np

    m = max(s for s, _, _ in codebooks) + 1
    ksub = max(c for _, c, _ in codebooks) + 1
    dsub = len(codebooks[0][2])
    C = np.zeros((m, ksub, dsub), dtype=np.float64)
    for s, c, v in codebooks:
        C[s, c] = v
    return C


def _pq_assign_codes(C, V):
    """codes[n, m] for V[n, m, dsub] against C[m, ksub, dsub]: expanded-L2
    rounded to 6, first-minimum (= lowest code) per subspace."""
    import numpy as np

    codes = np.empty((V.shape[0], C.shape[0]), dtype=np.int64)
    for s in range(C.shape[0]):
        v2 = np.einsum("ij,ij->i", V[:, s, :], V[:, s, :])
        c2 = np.einsum("ij,ij->i", C[s], C[s])
        d = np.round(v2[:, None] + c2[None, :] - 2.0 * (V[:, s, :] @ C[s].T), 6)
        codes[:, s] = np.argmin(d, axis=1)
    return codes


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int, list[float]]]:
    """Train per-subspace PQ codebooks distributed, MLlib-Lloyd style: init
    is the deterministic first-ksub vectors' subvectors; each round is one
    mapInPandas assignment scan (one (batch × ksub) matmul per subspace —
    BLAS, join-free) emitting (sub, code, pos, val) for a partial-agg mean,
    and only m·ksub·dsub aggregated doubles reach the driver. At 100 TB one
    trains on a sample (PQ codebooks need ~100k vectors, not the corpus);
    the scan shape is unchanged. Returns sorted (sub, code, codeword)."""
    import numpy as np

    init = (
        df.filter(F.col(id_col) < ksub)
        .select(F.col(id_col).alias("code"), _dvec(F.col(vec_col)).alias("v"))
        .collect()
    )
    dim = len(init[0]["v"])
    dsub = dim // m
    cb: dict[tuple[int, int], list[float]] = {}
    for r in init:
        for s in range(m):
            cb[(s, int(r["code"]))] = list(r["v"][s * dsub : (s + 1) * dsub])

    vecs = df.select(id_col, vec_col)
    for _ in range(iters):
        C = _pq_codebook_np(sorted((s, c, v) for (s, c), v in cb.items()))

        def emit(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                    len(pdf), m, dsub
                )
                codes = _pq_assign_codes(C, V)
                out = {
                    "sub": np.repeat(
                        np.tile(np.arange(m), len(pdf)), dsub
                    ),
                    "code": np.repeat(codes.ravel(), dsub),
                    "pos": np.tile(np.arange(dsub), len(pdf) * m),
                    "val": V.ravel(),
                }
                yield pd.DataFrame(out)

        means = (
            vecs.mapInPandas(emit, "sub int, code long, pos int, val double")
            .groupBy("sub", "code", "pos")
            .agg(F.round(F.avg("val"), 6).alias("c"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            upd.setdefault((int(r["sub"]), int(r["code"])), {})[int(r["pos"])] = float(
                r["c"]
            )
        for key, comp in upd.items():
            cb[key] = [comp[i] for i in range(dsub)]
        # (sub, code) cells absent from `upd` keep their previous codeword
    return sorted((s, c, v) for (s, c), v in cb.items())


def pq_encode(
    df: DataFrame,
    codebooks: list[tuple[int, int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one matmul per subspace per Arrow batch
    against the closed-over codebook constant; join-free, single scan,
    output is m ints per row (the 64× compression artifact)."""
    import numpy as np

    C = _pq_codebook_np(codebooks)
    m, _, dsub = C.shape

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                len(pdf), m, dsub
            )
            codes = _pq_assign_codes(C, V)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": [c.tolist() for c in codes]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        enc, f"{id_col} long, codes array<long>"
    )


def pq_adc_topk(
    df: DataFrame,
    codebooks: list[tuple[int, int, list[float]]],
    n_queries: int = 5,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over PQ codes by asymmetric distance: per query an
    m×ksub LUT of exact subvector L2 terms (round-6) is built driver-side
    (m·ksub·n_queries doubles — bounded like the matmul path's query
    constant); each Arrow batch encodes its vectors, scores every query as
    m LUT lookups + a sum, and emits only its LOCAL top-k — the shuffle
    carries ≤ k·n_partitions·n_queries rows, never n_corpus·n_queries.
    Ascending distance, ties to the lowest nid, self-match excluded."""
    import numpy as np

    C = _pq_codebook_np(codebooks)
    m, ksub, dsub = C.shape
    q_rows = (
        df.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = np.asarray([list(r["qv"]) for r in q_rows], dtype=np.float64).reshape(
        len(q_rows), m, dsub
    )
    # LUT[q, s, c] = round6(|q_s|^2 + |c_sc|^2 - 2 q_s . c_sc)
    lut = np.empty((len(q_rows), m, ksub), dtype=np.float64)
    for s in range(m):
        q2 = np.einsum("ij,ij->i", Q[:, s, :], Q[:, s, :])
        c2 = np.einsum("ij,ij->i", C[s], C[s])
        lut[:, s, :] = np.round(
            q2[:, None] + c2[None, :] - 2.0 * (Q[:, s, :] @ C[s].T), 6
        )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                len(pdf), m, dsub
            )
            codes = _pq_assign_codes(C, V)
            rows = []
            for qi, qid in enumerate(qids):
                # adist[n] = round6(sum_s LUT[qi, s, codes[n, s]])
                d = np.round(
                    lut[qi, np.arange(m)[None, :], codes].sum(axis=1), 6
                )
                mask = ids != qid
                cand = np.nonzero(mask)[0]
                if len(cand) == 0:
                    continue
                order = np.lexsort((ids[cand], d[cand]))
                for i in cand[order[:k]]:
                    rows.append((int(qid), int(ids[i]), float(d[i])))
            if rows:
                yield pd.DataFrame(rows, columns=["qid", "nid", "adist"])

    local = df.select(id_col, vec_col).mapInPandas(
        score, "qid long, nid long, adist double"
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adist"), F.asc("nid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "adist")
    )


def pq_rerank_topk(
    df: DataFrame,
    codebooks: list[tuple[int, int, list[float]]],
    n_queries: int = 5,
    k: int = 5,
    shortlist_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ serving: ADC shortlist of R = k*shortlist_mult
    candidates, then EXACT-vector L2 re-ranking of the shortlist only —
    the standard accuracy-recovery stage of a PQ deployment (Jegou et al.
    2011 §V: re-rank the ADC shortlist with exact distances; FAISS
    IndexRefineFlat). Quantization error moves the true top-k inside the
    shortlist, and the exact pass restores their order while touching R
    rows per query instead of the corpus.

    Scale shape: stage 1 is pq_adc_topk's bounded shuffle
    (≤ R·parts·queries local-top-k rows); stage 2 fetches the shortlist
    members' exact vectors with ONE broadcast hash join against the
    corpus scan (the R·n_queries-row shortlist is the broadcast side — no
    corpus shuffle), joins the broadcast query dim, and re-ranks inside a
    per-query window over ≤ R rows. The interpreted dot() HOF is fine
    here: it runs on R·n_queries rows, never the corpus (the rule-1
    boundary). Output (qid, rank, nid, dist, adist): exact squared-L2
    rank with the stage-1 approximate distance retained for the
    recall-vs-ADC audit. round-6 before ranking, ties to lowest nid —
    the module's cross-engine ordering convention."""
    r = k * shortlist_mult
    short = pq_adc_topk(df, codebooks, n_queries, r, id_col, vec_col)
    base = df.select(
        F.col(id_col).alias("nid"), _dvec(F.col(vec_col)).alias("nv")
    )
    queries = df.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), _dvec(F.col(vec_col)).alias("qv")
    )
    cand = base.join(
        F.broadcast(short.select("qid", "nid", "adist")), "nid"
    ).join(F.broadcast(queries), "qid")
    # same association order as the oracle's list_dot_product formula:
    # |q|^2 + |n|^2 - 2 q.n, rounded once at the end
    dist = F.round(
        dot(F.col("qv"), F.col("qv"))
        + dot(F.col("nv"), F.col("nv"))
        - 2 * dot(F.col("qv"), F.col("nv")),
        6,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("nid"))
    return (
        cand.withColumn("dist", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "dist", "adist")
    )


def ivfpq_topk(
    df: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 8,
    m: int = 4,
    ksub: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cells: DataFrame | None = None,
    codebooks: list[tuple[int, int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ — the two scale levers composed the way billion-scale ANN
    indexes (FAISS IVFPQ) do it: the coarse quantizer prunes the SCAN
    (each query reads only its own cell; with a write_ivf_partitioned
    layout that is partition pruning, 1/n_cells of the files) and product
    quantization shrinks what the scan READS (m codes per vector instead
    of d floats — with d=64 f32, 64×). Scoring is the pq_adc_topk kernel
    with a per-query cell mask: LUT lookups + a sum per surviving row,
    local top-k per Arrow batch, ≤ k·parts·queries rows shuffled into the
    global merge. Approximate on both axes by design (cell recall ×
    quantization error); ann_recall_eval's pattern applies for tuning."""
    import numpy as np

    if cells is None:
        cells = assign_ivf_cells(df, n_cells, id_col, vec_col)
    if codebooks is None:
        codebooks = pq_train(df, m, ksub, iters, id_col, vec_col)
    C = _pq_codebook_np(codebooks)
    m, ksub, dsub = C.shape
    with_cell = df.join(cells.select(id_col, "cell"), id_col)
    q_rows = (
        with_cell.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("qid"),
            F.col("cell").alias("qcell"),
            F.col(vec_col).alias("qv"),
        )
        .collect()
    )
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qcells = np.array([r["qcell"] for r in q_rows], dtype=np.int64)
    Q = np.asarray([list(r["qv"]) for r in q_rows], dtype=np.float64).reshape(
        len(q_rows), m, dsub
    )
    lut = np.empty((len(q_rows), m, ksub), dtype=np.float64)
    for s in range(m):
        q2 = np.einsum("ij,ij->i", Q[:, s, :], Q[:, s, :])
        c2 = np.einsum("ij,ij->i", C[s], C[s])
        lut[:, s, :] = np.round(
            q2[:, None] + c2[None, :] - 2.0 * (Q[:, s, :] @ C[s].T), 6
        )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            row_cells = pdf["cell"].to_numpy()
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                len(pdf), m, dsub
            )
            codes = _pq_assign_codes(C, V)
            rows = []
            for qi, qid in enumerate(qids):
                cand = np.nonzero((row_cells == qcells[qi]) & (ids != qid))[0]
                if len(cand) == 0:
                    continue
                d = np.round(
                    lut[qi, np.arange(m)[None, :], codes[cand]].sum(axis=1), 6
                )
                order = np.lexsort((ids[cand], d))
                for oi in order[:k]:
                    rows.append((int(qid), int(ids[cand[oi]]), float(d[oi])))
            if rows:
                yield pd.DataFrame(rows, columns=["qid", "nid", "adist"])

    local = with_cell.select(id_col, "cell", vec_col).mapInPandas(
        score, "qid long, nid long, adist double"
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adist"), F.asc("nid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "nid", "adist")
    )


# --- signed-random-projection LSH (Charikar SRP) ----------------------------

SRP_BITS = 16  # sign bits per signature
SRP_BANDS = 4  # bands of SRP_BITS // SRP_BANDS bits each
SRP_DIM = 64  # embedding dimensionality of the corpus tables


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication over an
    embedding column — cluster the corpus (here the deterministic IVF
    quantizer; the paper uses k-means, which `n_cells` + kmeans_refine
    slot into), form within-cluster cosine-≥-threshold pairs, chain them
    into duplicate groups, and keep ONE representative per group. The
    paper's keep rule is reproduced exactly: within a duplicate group,
    keep the member with the LOWEST cosine to its cluster centroid (the
    least prototypical example carries the most marginal information);
    ties break on lowest id.

    Returns one row per duplicate-group member: (id_col, component,
    cell_sim, keep). Singletons never pair, so they are implicitly kept
    and never shuffle past the pair join. Scale shape: pairs only form
    inside cells (the embedding_near_dup_pairs blocking), components via
    pointer-jumping CC (O(log diameter) rounds), survivor selection one
    window over group members."""
    from blogparser_spark.dataops.dedup import connected_components

    cells = assign_ivf_cells(df, n_cells, id_col, vec_col)
    pairs = embedding_near_dup_pairs(
        df, threshold, n_cells, id_col, vec_col, cells=cells
    )
    comps = connected_components(pairs, "id_a", "id_b")
    w = Window.partitionBy("component").orderBy(
        F.asc("cell_sim"), F.asc("node")
    )
    return (
        comps.join(
            cells.select(F.col(id_col).alias("node"), "cell_sim"), "node"
        )
        .withColumn("_r", F.row_number().over(w))
        .select(
            F.col("node").alias(id_col),
            "component",
            "cell_sim",
            (F.col("_r") == 1).alias("keep"),
        )
    )


def srp_hyperplanes(n_bits: int = SRP_BITS, dim: int = SRP_DIM) -> list[list[float]]:
    """Deterministic 'random' hyperplanes: component (b, d) is md5-derived
    uniform in [-0.5, 0.5). Seed-free so the DuckDB oracle derives the SAME
    values in SQL (`CAST('0x'||substr(md5('srp:b:d'),1,8) AS BIGINT)`); at
    scale the n_bits × dim matrix is a tiny closure constant shipped to each
    Python worker — the manual analog of a broadcast variable."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"srp:{b}:{d}".encode()).hexdigest()[:8], 16) / 2.0**32
            - 0.5
            for d in range(dim)
        ]
        for b in range(n_bits)
    ]


def srp_band_values(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = SRP_BITS,
    n_bands: int = SRP_BANDS,
    dim: int = SRP_DIM,
) -> DataFrame:
    """SRP-LSH signatures as (id, band_idx, band_val): the sign bits of
    n_bits random projections (Charikar, STOC 2002 — P[bit agree] =
    1 - angle/pi), packed into n_bands integer band keys (bit i contributes
    1 << (i % band_bits) to band i // band_bits).

    This is the EMBEDDING-space twin of the text-side MinHash-LSH / SimHash
    band families (dedup.py): same band-bucket shuffle shape, but the
    similarity preserved is cosine, so it scales embedding near-dup search
    the way IVF cells scale top-k. Kernel: ONE BLAS matmul per Arrow batch
    (V @ H.T) — no per-pair work, no join; projections are rounded to 6
    decimals before the sign test so Spark and the SQL oracle agree
    bit-for-bit. Band keys are near-uniform (md5-derived hyperplanes), so
    the (band_idx, band_val) shuffle has no planner-visible skew.

    `dim` is a MAXIMUM: each batch slices the hyperplane matrix to its own
    vector width (hyperplane component (b, d) depends only on (b, d), so a
    lower-dimensional corpus uses a deterministic prefix — no re-seeding)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    if n_bits % n_bands:
        raise ValueError(
            f"n_bits ({n_bits}) must divide evenly into n_bands ({n_bands})"
        )
    band_bits = n_bits // n_bands
    H = np.asarray(srp_hyperplanes(n_bits, dim), dtype=np.float64)
    weights = 1 << np.arange(band_bits, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def bands_udf(v: pd.Series) -> pd.Series:
        import numpy as np

        if len(v) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray(v.tolist(), dtype=np.float64)
        S = np.round(V @ H[:, : V.shape[1]].T, 6)
        bits = (S >= 0.0).astype(np.int64).reshape(len(V), n_bands, band_bits)
        return pd.Series(list(bits @ weights))

    return df.select(
        F.col(id_col), bands_udf(_dvec(F.col(vec_col))).alias("_bands")
    ).select(
        id_col, F.posexplode("_bands").alias("band_idx", "band_val")
    )


def srp_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """SRP band buckets → chained candidate pairs (id_a, id_b), id_a < id_b.
    Delegates to dedup.chained_pairs — ONE definition of the bounded
    bucket→pairs kernel for MinHash-LSH, SimHash, and SRP bands (see its
    docstring for the degenerate-corpus argument)."""
    from blogparser_spark.dataops.dedup import chained_pairs

    sig = (
        signatures
        if signatures is not None
        else srp_band_values(df, id_col, vec_col)
    )
    return chained_pairs(sig, ["band_idx", "band_val"], id_col)


def srp_verified_pairs(
    df: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SRP candidates → EXACT cosine verification (≥ threshold): the
    embedding-space analog of dedup.verify_pairs_jaccard — an LSH false
    positive can never survive into the output. Norms are computed once per
    ROW before the two id-keyed joins; the per-PAIR dot runs in the batched
    numpy kernel (dot_udf). Linear in candidate count, never all-pairs."""
    pairs = srp_candidate_pairs(df, id_col, vec_col)
    base = df.select(
        F.col(id_col), _dvec(F.col(vec_col)).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cos_sim",
            _pair_cosine(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def srp_near_dup_clusters(
    df: DataFrame,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
) -> DataFrame:
    """Embedding-space end-to-end dedup decision, completing the family
    symmetry (MinHash → near_dup_clusters, SimHash →
    simhash_near_dup_clusters, SRP → this): band-bucket chained candidates
    → EXACT cosine verify (≥ threshold) → pointer-jumping connected
    components → (id, component, keep). Only verified pairs cluster, so an
    SRP band collision can never drop a vector; survivor = the component's
    minimum id."""
    from blogparser_spark.dataops.dedup import connected_components

    pairs = srp_verified_pairs(df, threshold, id_col, vec_col)
    comps = connected_components(pairs.select("id_a", "id_b"), stats=stats)
    return comps.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("keep"),
    )


def hard_negative_topk(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    dup_threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    MOST similar vectors whose cosine stays strictly below dup_threshold
    — similar enough to be hard, not so similar they are duplicates or
    near-copies (which would poison the negative set). Exactness: the
    threshold is applied inside the matmul kernel before the local top-k
    (filtering commutes with top-k), so this is the same join-free
    ≤ k·parts·queries-row shuffle as the exact-ANN scale path — never a
    top-(k+buffer) heuristic that can starve when duplicates crowd the
    neighborhood."""
    return brute_force_topk_matmul(
        df,
        n_queries=n_queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        max_sim=dup_threshold,
    )




def int8_quant_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension symmetric int8 quantization audit — the serving
    question next to matryoshka truncation: if stored embeddings compress
    4× to int8 (per-channel absmax scaling, the standard embedding-store
    scheme), how much cosine fidelity survives? Per dimension the corpus
    absmax sets the scale (absmax/127); each element quantizes with the
    tie-free sign·floor(|x|/s + 0.5) (clamped at 127) and reconstructs as
    q·s; per vector the audit reports max |error|, MSE, and the cosine
    between original and reconstruction.

    Scale shape: ONE posexplode partial agg produces the d-row absmax
    table (d-bounded driver state, the kmeans-centroid convention), which
    re-enters as an array literal; everything else is per-row bounded-
    array arithmetic — left folds so both engines run identical fp ops,
    round-6 outputs."""
    dim_rows = (
        emb.select(F.posexplode(_dvec(F.col(vec_col))).alias("d", "x"))
        .groupBy("d")
        .agg(F.max(F.abs(F.col("x"))).alias("am"))
        .collect()
    )
    scales = [
        max(float(r["am"]) / 127, 1e-12)
        for r in sorted(dim_rows, key=lambda r: r["d"])
    ]
    n_dims = len(scales)
    sl = F.array(*[F.lit(s) for s in scales])
    v = _dvec(F.col(vec_col))

    def _recon(x, s):
        q = F.least(
            F.floor(F.abs(x) / s + F.lit(0.5)).cast("double"), F.lit(127.0)
        )
        return q * s * F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))

    recon = F.zip_with(v, sl, _recon)
    sq_err = F.aggregate(
        F.zip_with(v, recon, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    max_err = F.aggregate(
        F.zip_with(v, recon, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return emb.select(
        F.col(id_col),
        F.round(max_err, 6).alias("max_abs_err"),
        F.round(sq_err / F.lit(float(n_dims)), 6).alias("mse"),
        F.round(cosine(v, recon), 6).alias("cos_recon"),
    )


def matryoshka_energy(
    emb: DataFrame,
    dims: tuple[int, ...] = (4, 8, 16),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-representation audit (Kusupati et al., NeurIPS 2022):
    the fraction of each vector's energy (squared L2 norm) captured by
    its first-d prefix, for a ladder of truncation dims — the number that
    says whether serving can truncate stored embeddings to d dims (MRL
    training front-loads information; an un-front-loaded embedding shows
    flat fractions ≈ d/D). Per-row arithmetic over a bounded-length
    array (no fan-out, no shuffle); floats cast to double before any
    arithmetic so both engines run identical fp ops in identical order
    (left fold), fractions rounded to 6."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def energy(arr):
        return F.aggregate(
            arr, F.lit(0.0), lambda acc, x: acc + x * x
        )

    total = energy(v)
    cols = [
        F.round(
            energy(F.slice(v, 1, d)) / F.greatest(total, F.lit(1e-12)), 6
        ).alias(f"energy_frac_{d}")
        for d in dims
    ]
    return emb.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("n_dims"),
        F.round(total, 6).alias("energy_total"),
        *cols,
    )

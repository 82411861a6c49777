"""Fixed-iteration PageRank over a relational edge list.

The graph here is the customer–supplier bipartite graph implied by the
order book (orders ⋈ lineitem on orderkey → distinct (custkey, suppkey)
edges), symmetrized so every node has out-degree ≥ 1 — which removes the
dangling-node correction and makes each iteration a pure
join → partial-sum aggregation.

Scale notes (100 TB): ranks is |V| rows (small vs the edge list); every
iteration shuffles edges on src to meet ranks, then partial-aggregates on
dst. Edge degrees are precomputed once and carried ON the edge row, so an
iteration never re-joins a degree table. The iteration count is fixed
(power iteration converges geometrically at damping^k); a localCheckpoint
per iteration truncates the lineage so the plan stays O(E) per round, not
O(E^k). The same loop runs unchanged on a 1000-executor cluster — ranks
would be broadcast when |V| fits, shuffle-joined when it does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def bipartite_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Distinct symmetric customer↔supplier edges with string node ids
    ('c<custkey>', 's<suppkey>') so the two key spaces cannot collide."""
    pairs = (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_suppkey"),
              orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("supp"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.unionByName(rev)


def pagerank(edges: DataFrame, n_iter: int = 5, damping: float = DAMPING,
             checkpoint: bool = True) -> DataFrame:
    """Power-iteration PageRank: rank' = (1-d)/N + d * Σ_in rank/deg.

    `edges` must be a directed edge list where every src has out-degree
    ≥ 1 and every node appears as a dst (symmetric graphs satisfy both).
    Returns (node, rank) for all nodes.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges_d = edges.join(deg, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    if checkpoint:
        edges_d = edges_d.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg((F.lit(base) + F.lit(damping) * F.sum("c")).alias("rank"))
        )
        ranks = contrib.localCheckpoint(eager=True) if checkpoint else contrib
    return ranks


def set_overlap_jaccard(df: DataFrame, set_col: str, member_col: str) -> DataFrame:
    """Pairwise Jaccard similarity between the member sets of every two
    `set_col` values (audience overlap: "how much do two event types'
    user bases intersect").

    Shape: dedup to (set, member) — ONE shuffle on the pair, map-side
    combinable — then self-join on member to count intersections (the
    join key is the member, so a hot member fans out |sets_it_is_in|²
    pairs, bounded by the set-count cardinality, NOT by corpus size),
    and a broadcast of the |sets|-row size table closes |A∪B| =
    |A|+|B|−|A∩B|. Nothing materializes member lists; the widest
    intermediate is (member, set_a, set_b). Pairs are emitted once
    (a < b) and zero-intersection pairs are absent by construction."""
    m = df.select(
        F.col(set_col).alias("s"), F.col(member_col).alias("member")
    ).distinct()
    sizes = m.groupBy("s").agg(F.count("*").alias("n"))
    a = m.select(F.col("s").alias("set_a"), "member")
    b = m.select(F.col("s").alias("set_b"), "member")
    inter = (
        a.join(b, "member")
        .where(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("n_intersect"))
    )
    sz_a = sizes.select(F.col("s").alias("set_a"), F.col("n").alias("n_a"))
    sz_b = sizes.select(F.col("s").alias("set_b"), F.col("n").alias("n_b"))
    out = (
        inter.join(F.broadcast(sz_a), "set_a")
        .join(F.broadcast(sz_b), "set_b")
    )
    union_n = F.col("n_a") + F.col("n_b") - F.col("n_intersect")
    return out.select(
        "set_a",
        "set_b",
        "n_a",
        "n_b",
        "n_intersect",
        F.round(F.col("n_intersect").cast("double") / union_n, 6).alias(
            "jaccard"
        ),
    )


def supplier_cooccurrence_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected distinct supplier–supplier edges: two suppliers are
    adjacent iff they ship lines of the SAME order. The self-join is keyed
    on l_orderkey, so its fan-out per order is bounded by the order's line
    count (≤ 7 in TPC-H-shaped data) — pairs-within-a-small-group, never a
    corpus-wide cross join. Edges are canonical (u < v) and distinct."""
    so = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    ).distinct()
    other = so.select(F.col("ok"), F.col("s").alias("s2"))
    return (
        so.join(other, "ok")
        .where(F.col("s") < F.col("s2"))
        .select(F.col("s").alias("u"), F.col("s2").alias("v"))
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient via
    degree-ordered edge orientation (the node-iterator++ / Schank-Wagner
    formulation MapReduce triangle counting inherits).

    Each undirected edge is oriented from its (degree, id)-smaller endpoint
    to the larger, which caps every node's OUT-degree at O(sqrt(|E|))
    regardless of its real degree — so the wedge self-join (pairs of
    out-edges sharing a source) never explodes on a celebrity node: the
    classic skew-proof triangle shape. Wedges are closed by one hash join
    back onto the oriented edge list; each triangle is found exactly once
    (its corners are totally ordered), then unpivoted to credit all three
    corners. coeff = 2·t / (deg·(deg−1)) on nodes with deg ≥ 2.

    Scale (100 TB): three shuffles (degree agg, wedge join on the source,
    closing join on the (lo, hi) edge key); no window over the edge list;
    all joins are equi-joins AQE can split. Inputs: canonical (u < v)
    distinct edges."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = edges.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("b"), F.col("ddst").alias("db")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("c"), F.col("ddst").alias("dc")
    )
    # pairs of out-edges of the same source, ordered so each wedge is
    # generated once; the closing edge must then be the oriented (b -> c)
    wedges = e1.join(e2, "src").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"]).select("src", "b", "c")
    corner = (
        tris.select(F.col("src").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    out = deg.join(corner, "node", "left").select(
        "node",
        "deg",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            ),
            6,
        ).alias("clustering_coeff"),
    )
    return out


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the provably O(log² n)-round formulation, as the
    cross-checkable alternative to dedup.connected_components' label
    propagation (same (node, component=min id) contract).

    Each round rewrites the EDGE SET itself toward a star rooted at the
    component minimum:
      large-star  — every node hangs its strictly-larger neighbors onto
        the minimum of its neighborhood-with-self;
      small-star  — every node contracts itself and its ≤-neighbors onto
        their minimum.
    Both steps are one groupBy-min (single running-min reduce state,
    partial-aggregatable, no neighborhood ever materialized) plus one
    equi-join of the edge list back onto those minima — so a round is
    edge-linear and skew-safe even when a component is one giant star.
    Convergence = the edge set reaches a fixpoint (checked with a count +
    one-sided exceptAll probe, both early-out); per-round localCheckpoint
    truncates lineage exactly like the label-propagation twin.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    iterations = 0
    for _ in range(max_iter):
        if n_edges == 0:
            break
        iterations += 1
        # large-star: m(x) = min over Γ(x) ∪ {x}; each neighbor v > x
        # re-attaches to m(x). Emitted edges keep first ≥ second.
        bidir = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = (
            bidir.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", F.col("u")).alias("m"))
        )
        large = (
            bidir.join(lmins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the (big → small)-directed output: x and its
        # smaller neighbors all contract onto their minimum.
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = small.count()
        if n_new == n_edges and small.exceptAll(edges).limit(1).count() == 0:
            edges = small
            break
        edges, n_edges = small, n_new
    if stats is not None:
        stats["iterations"] = iterations
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(
            edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )

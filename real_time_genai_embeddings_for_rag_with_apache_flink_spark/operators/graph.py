"""Scalable connected components: alternating large-star / small-star.

The duplicate-clustering step (d08) labels every document with the
smallest doc_id reachable through near-dup candidate edges. Plain
min-label propagation converges in graph-DIAMETER rounds — fine for
near-dup clusters (stars and cliques, diameter ~2), but a pathological
corpus (chained paraphrases, crawl rings) can have a long-path dup
graph where diameter-bound iteration means hundreds of shuffles at
100 TB. The alternating star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014 — public literature)
converges in O(log^2 n) rounds REGARDLESS of diameter: each round is
two grouped aggregations plus a join, all on the edge list, nothing
ever funnels through the driver.

Round structure (node ids are ordered; `min` below is over that order):

- large-star(u): let m = min(neighbors(u) + [u]); every STRICTLY LARGER
  neighbor v > u re-attaches to m -> emit (v, m). Large nodes hop
  toward their component's minimum along shortcuts.
- small-star(u): over edges oriented big->small (u > v): let
  m = min(smaller neighbors of u); u and every other smaller neighbor
  attach to m -> emit (u, m) and (v, m). Flattens local chains into
  stars.

At the fixpoint the edge list IS the answer: a star forest where every
non-root node holds exactly one edge to its component minimum.

Convergence is detected exactly: a 1-row count probe, then an
`exceptAll().limit(1)` emptiness probe (the d08 cheap-probe pattern —
never a full collect), and lineage is truncated per round with
localCheckpoint (at scale: checkpoint to reliable storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list canonicalized to (u > v), self-loops and
    duplicates dropped."""
    e = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    )
    return e.filter(F.col("u") != F.col("v")).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    # Symmetric neighbor view: one row per (node, neighbor) direction.
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    out = (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    # e is canonical (u > v): u's strictly-smaller neighbors are exactly
    # its rows; m = min of them. u and every other small neighbor
    # attach to m.
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    with_min = e.join(mins, "u")
    center_u = mins.select(F.col("u"), F.col("m").alias("v"))
    center_v = with_min.select(F.col("v").alias("u"), F.col("m").alias("v"))
    out = center_u.unionByName(center_v)
    return out.filter(F.col("u") != F.col("v")).distinct()


def _same_edge_set(a: DataFrame, a_count: int, b: DataFrame) -> tuple[bool, int]:
    """Exact set equality between two deduplicated edge lists, plus b's
    count. Count probe first; only on a count match pay the exceptAll
    emptiness probe (both are distinct, so equal count + empty
    difference <=> equal sets)."""
    b_count = b.count()
    if a_count != b_count:
        return False, b_count
    diff = b.exceptAll(a).limit(1).count()
    return diff == 0, b_count


def _star_fixpoint(
    edges: DataFrame, src: str, dst: str, max_rounds: int
) -> tuple[DataFrame, int]:
    """Alternate large-star/small-star until the edge set is stable;
    returns (fixpoint star-forest edges, alternation count). Shared by
    the component labeler and the round-count probe so both always
    measure the same algorithm."""
    e = _canonical_edges(edges, src, dst).localCheckpoint()
    n_e = e.count()
    for i in range(max_rounds):
        # One alternation = large-star then small-star; both outputs are
        # canonical (u > v) by construction (m is a strict minimum).
        nxt = _small_star(_large_star(e)).localCheckpoint()
        same, n_nxt = _same_edge_set(e, n_e, nxt)
        e, n_e = nxt, n_nxt
        if same:
            return e, i + 1
    raise RuntimeError(
        f"alternating-star did not converge in {max_rounds} rounds"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 100,
) -> DataFrame:
    """Connected components of an undirected edge list via alternating
    large-star/small-star. Returns one row per node that appears in any
    edge: (doc_id, component), component = smallest node id in the
    node's component — the exact contract of d08's label propagation,
    in O(log^2 n) rounds instead of O(diameter).

    `max_rounds` is a safety bound above the convergence guarantee —
    observed alternations track ~log2(n) (a 4,096-hop path takes 13;
    a trillion-node graph projects to ~40), so 100 leaves margin while
    still failing fast; hitting it raises rather than returning
    half-merged components.
    """
    nodes = (
        edges.select(F.col(src).alias("doc_id"))
        .unionByName(edges.select(F.col(dst).alias("doc_id")))
        .distinct()
        .localCheckpoint()
    )
    e, _rounds = _star_fixpoint(edges, src, dst, max_rounds)
    # Fixpoint edge list is a star forest: non-roots hold exactly one
    # edge to the component minimum; roots (and isolated-by-dedup
    # nodes) label themselves.
    labels = nodes.join(
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("component")),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
    return labels


def star_round_count(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_rounds: int = 100
) -> int:
    """Number of large+small-star alternations until the fixpoint —
    exposed for the convergence-rate tests/bench (a path graph of
    length L needs ~log2(L) rounds here vs L rounds of label
    propagation). Delegates to the same fixpoint loop the labeler
    runs."""
    return _star_fixpoint(edges, src, dst, max_rounds)[1]


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "doc_id",
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (Brin & Page 1998 power
    iteration) — centrality in the near-dup graph flags the HUB
    documents: boilerplate/templates that near-duplicate many other
    pages score far above their neighbors, which min-label components
    (d08/d21) cannot see (a hub and a leaf get the same component id).

    Execution shape per iteration: one equi-join of the symmetrized
    edge list against the current (node, rank/degree) table and one
    sum-by-destination — shuffle ∝ E, nothing funnels through the
    driver except the two bounded scalars (node count N, dangling mass
    per round: a 1-row aggregate collect that becomes a literal, the
    kmeans-centroid pattern). Dangling nodes (no edges — here, docs
    with no dup candidates) donate their mass to everyone, keeping the
    distribution a distribution (sums to 1, asserted in the tests).
    Lineage is cut per round with localCheckpoint exactly like the
    star fixpoint above; iteration count is FIXED (power iteration
    converges geometrically; production uses 10-20 rounds at any graph
    size) so the plan depth is bounded and known.

    Returns (node_col, pagerank). Iterative -> rows-only at the
    driver; pinned against a dense numpy reference in
    tests/test_pagerank.py.
    """
    node_ids = nodes.select(node_col).distinct()
    e = _canonical_edges(edges, src, dst)
    # Restrict to the INDUCED subgraph of `nodes`: an edge endpoint
    # missing from the node table would receive contributions (via the
    # sum-by-destination) but hold no rank row to send them back, so
    # its neighbors' mass would silently leak and the result would stop
    # summing to 1. Dropping foreign edges keeps the distribution exact
    # on whatever node universe the caller declared.
    e = (
        e.join(node_ids.select(F.col(node_col).alias("u")), "u", "left_semi")
        .join(node_ids.select(F.col(node_col).alias("v")), "v", "left_semi")
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    n_total = node_ids.count()
    if n_total == 0:
        return nodes.select(
            F.col(node_col), F.lit(0.0).alias("pagerank")
        )
    deg = sym.groupBy(F.col("u").alias(node_col)).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ranks = (
        node_ids
        .join(deg, node_col, "left")
        .select(
            node_col,
            F.col("deg"),
            F.lit(1.0 / n_total).alias("rank"),
        )
        .localCheckpoint()
    )
    for _ in range(iterations):
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()[0][0]
        contrib = (
            sym.join(
                ranks.filter(F.col("deg").isNotNull()).select(
                    F.col(node_col).alias("u"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ),
                "u",
            )
            .groupBy(F.col("v").alias(node_col))
            .agg(F.sum("share").alias("contrib"))
        )
        base = (1.0 - damping) / n_total + damping * dangling / n_total
        ranks = (
            ranks.select(node_col, "deg")
            .join(contrib, node_col, "left")
            .select(
                node_col,
                "deg",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(node_col, F.col("rank").alias("pagerank"))


def pagerank_fixed_point(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "doc_id",
    damp_num: int = 85,
    damp_den: int = 100,
    iterations: int = 5,
    scale: int = 10**12,
) -> DataFrame:
    """``pagerank`` in EXACT INTEGER (fixed-point) arithmetic — the
    engine-certifiable sibling: every rank is a BIGINT in units of
    1/scale, every step is integer multiply / integral division /
    integer sum, so the result is independent of partitioning AND
    summation order and any engine replaying the same recurrence
    produces bit-identical values (the mmr_select_exact discipline
    applied to power iteration — what lets d32b carry a DuckDB oracle
    where the float ``pagerank`` cannot). The recurrence, mirrored
    step for step by the d32b unrolled-CTE oracle:

      unit       = scale div N                     (uniform init rank)
      share(u)   = rank(u) div deg(u)              (per round)
      contrib(v) = sum of share(u) over in-neighbors of v
      dangling   = sum of rank(u) over deg-less nodes
      rank'(v)   = ((damp_den-damp_num)*unit
                    + damp_num*((dangling div N) + contrib(v)))
                   div damp_den

    All quantities are non-negative, so Spark's truncating ``div`` and
    DuckDB's flooring ``//`` agree; magnitudes stay under
    damp_num*scale (~8.5e13 at the default scale), far inside int64.
    The truncation bias is bounded by iterations*(N+damp_den)/scale of
    total mass — at scale=1e12 the values match the float ranks to
    ~1e-9 while being exactly reproducible.

    Execution shape is identical to ``pagerank``: one edge join + one
    sum-by-destination per round (shuffle ∝ E), dangling mass via a
    1-row collected scalar folded into a literal, lineage cut per
    round with localCheckpoint, fixed iteration count. Returns
    (node_col, rank_fp BIGINT).
    """
    node_ids = nodes.select(node_col).distinct()
    e = _canonical_edges(edges, src, dst)
    e = (
        e.join(node_ids.select(F.col(node_col).alias("u")), "u", "left_semi")
        .join(node_ids.select(F.col(node_col).alias("v")), "v", "left_semi")
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    n_total = node_ids.count()
    if n_total == 0:
        return nodes.select(
            F.col(node_col), F.lit(0).cast("long").alias("rank_fp")
        )
    unit = scale // n_total
    deg = sym.groupBy(F.col("u").alias(node_col)).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ranks = (
        node_ids
        .join(deg, node_col, "left")
        .select(
            node_col,
            F.col("deg"),
            F.lit(unit).cast("long").alias("rank"),
        )
        .localCheckpoint()
    )
    for _ in range(iterations):
        dangling = int(
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)))
            .collect()[0][0]
        )
        contrib = (
            sym.join(
                ranks.filter(F.col("deg").isNotNull()).select(
                    F.col(node_col).alias("u"),
                    F.expr("rank div deg").alias("share"),
                ),
                "u",
            )
            .groupBy(F.col("v").alias(node_col))
            .agg(F.sum("share").alias("contrib"))
        )
        base = (damp_den - damp_num) * unit + damp_num * (dangling // n_total)
        ranks = (
            ranks.select(node_col, "deg")
            .join(contrib, node_col, "left")
            .select(
                node_col,
                "deg",
                F.expr(
                    f"(CAST({base} AS BIGINT) + {damp_num} * "
                    f"coalesce(contrib, CAST(0 AS BIGINT))) div {damp_den}"
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(node_col, F.col("rank").alias("rank_fp"))

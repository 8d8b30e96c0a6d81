"""Iterative k-means (Lloyd's) over an ``array<float>`` embedding column.

The genuinely iterative algorithm of the engine's similarity stack: the
IVF coarse quantizer (plans/llmops.py s05) uses label-derived centroids;
this trains them. Not SQL-expressible (unbounded iteration), so the
catalog entry is rows-only and correctness is pinned by a numpy
reference implementation in tests/test_kmeans.py.

Spark shape per iteration (the standard scalable layout):
- centroids are tiny (k x dim) -> they live on the driver and enter the
  plan as literal arrays (an implicit broadcast);
- assignment is a per-row argmin over k dot products — narrow, no
  shuffle;
- re-estimation is posexplode + groupBy(cell, pos) avg — one shuffle of
  (cell, pos, val) triples per iteration, partial-aggregated map-side.

At 100 TB: cache the (id, vector) projection once (each iteration
re-scans it), k*dim stays driver-sized, and the only shuffle per
iteration carries k*dim*partitions partial sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot


def _nearest_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid (ties -> lowest index).

    The row vector's own norm is constant across the k candidates, so it
    drops out of the argmax; each candidate costs one dot fold against a
    centroid pre-scaled by 1/|c| on the driver."""
    scaled = []
    for c in centroids:
        nrm = sum(float(x) * float(x) for x in c) ** 0.5 or 1.0
        scaled.append([float(x) / nrm for x in c])
    scored = F.array(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(x) for x in c])).alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(scaled)
        ]
    )
    best = F.aggregate(
        scored,
        F.element_at(scored, 1),
        lambda acc, s: F.when(s.sim > acc.sim, s).otherwise(acc),
    )
    return best.cell


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """Run ``iterations`` Lloyd's steps (cosine assignment, mean
    re-estimation) and return (id, cell). Deterministic: initial
    centroids are the k lowest-id vectors, ties break to the lowest
    cell index."""
    # Each iteration scans the corpus twice (assign + re-estimate);
    # cache the narrow (id, vector) projection once instead.
    vecs = df.select(id_col, vec_col).cache()
    try:
        init = (
            vecs.orderBy(id_col)
            .limit(k)
            .select(vec_col)
            .collect()
        )
        centroids = [list(map(float, r[0])) for r in init]

        assigned = None
        for _ in range(iterations):
            assigned = vecs.select(
                id_col,
                vec_col,
                _nearest_cell(F.col(vec_col), centroids).alias("cell"),
            )
            new_rows = (
                assigned.select("cell", F.posexplode(vec_col).alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.avg(F.col("val").cast("double")).alias("m"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in new_rows:
                by_cell.setdefault(r.cell, {})[r.pos] = r.m
            centroids = [
                [vals[p] for p in sorted(vals)] if (vals := by_cell.get(i)) else c
                for i, c in enumerate(centroids)
            ]
        # Materialize the final assignment with truncated lineage BEFORE
        # releasing the cache it was computed from — the caller gets a
        # self-contained DataFrame and no cached blocks leak across
        # repeated catalog/bench runs in one session.
        return assigned.select(id_col, "cell").localCheckpoint(eager=True)
    finally:
        vecs.unpersist()

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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot

# Above this k the literal-expression argmin stops being the right
# broadcast vehicle (k struct branches per row bloat the codegen'd
# expression tree); kmeans_assign's "auto" mode switches to the
# Arrow-batched GEMM path, whose cost is a dense (batch x k) matmul
# regardless of k.
LITERAL_K_CEILING = 64


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
    # A NULL vector scores NULL against every centroid, and the fold's
    # null-comparison keeps the initial accumulator — without the guard
    # it would silently land in cell 0. A WRONG-LENGTH vector is just as
    # silent (zip_with pads with NULL, every sim folds NULL, same cell-0
    # landing). Emit NULL for both, matching the broadcast path's
    # masked rows — one hygiene contract across modes.
    return F.when(
        vec.isNotNull() & (F.size(vec) == len(centroids[0])), best.cell
    )


def assign_cells_broadcast(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    metric: str = "cosine",
    out_col: str = "cell",
) -> DataFrame:
    """Centroid assignment for LARGE k — the broadcast-variable path the
    literal-argmin ceiling note promises (README 'k-means / PQ centroid
    collects assume small k').

    The centroid matrix ships to each Python worker once inside the
    pandas-UDF closure (Spark broadcasts the serialized function with
    the task — the same delivery as an explicit Broadcast variable,
    without leaking a handle the caller must destroy), and each Arrow
    batch is scored with one dense numpy GEMM: (batch x dim) @
    (dim x k), then a row argmax/argmin. Cost is independent of k's
    effect on plan size — thousands of centroids add zero analysis/
    codegen burden, only FLOPs — which is exactly where the literal
    expression tree (k struct branches per row) falls over.

    Tie semantics match the literal path: numpy argmax/argmin return
    the FIRST extremum and the literal fold keeps the earliest cell on
    ties (strict > / <), both scoring in float64. Caveat stated
    honestly: the two paths SUM in different orders (sequential codegen
    fold vs BLAS accumulation), so a vector whose two best centroids
    are within ~1 ulp can flip between modes — equality is pinned
    empirically on the test corpus, not guaranteed for adversarial
    near-ties. Pick one mode per pipeline when bit-reproducibility
    across runs matters.
    metric='cosine' (row norm drops out of the argmax, centroids
    pre-normalized — _nearest_cell's contract) or 'l2' (squared
    distances via the expansion |v|^2 - 2 v.c + |c|^2; |v|^2 is
    row-constant so argmin needs only the GEMM and |c|^2).
    Equality at small k is pinned in tests/test_kmeans_skew.py."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    C = np.asarray(centroids, dtype=np.float64)
    if metric == "cosine":
        norms = np.linalg.norm(C, axis=1)
        norms[norms == 0.0] = 1.0
        C = C / norms[:, None]
    c_sq = (C * C).sum(axis=1)

    dim = C.shape[1]

    @F.pandas_udf("int")
    def _assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            # NULL or wrong-length vectors get NULL cells (one hygiene
            # contract across every broadcast operator — pca_project /
            # pack_sign_words share it); a ragged np.array from a
            # wrong-length row would otherwise crash the matmul
            mask = series.map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool)
            out = pd.Series([None] * len(series), dtype="Int32")
            if mask.any():
                M = np.array(
                    [np.asarray(v, dtype=np.float64) for v in series[mask]]
                )
                scores = M @ C.T
                if metric == "cosine":
                    best = scores.argmax(axis=1)
                else:
                    # argmin of -2 v.c + |c|^2 == argmin of squared L2
                    best = (c_sq[None, :] - 2.0 * scores).argmin(axis=1)
                out.iloc[np.flatnonzero(mask)] = best.astype("int32")
            yield out

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
    assign_mode: str = "auto",
) -> DataFrame:
    """Run ``iterations`` Lloyd's steps (cosine assignment, mean
    re-estimation) and return (id, cell). Deterministic: initial
    centroids are the k lowest-id vectors, ties break to the lowest
    cell index.

    assign_mode: 'literal' embeds the centroids as a codegen'd argmin
    expression (zero Python in the hot path — right for coarse
    quantizers, k <= LITERAL_K_CEILING); 'broadcast' scores each Arrow
    batch with a numpy GEMM against a closure-shipped centroid matrix
    (right for large k); 'auto' picks by k. Both paths share tie-break
    direction and float64 scoring; summation order differs (fold vs
    BLAS), so last-ulp near-ties between centroids can in principle
    flip — equality is pinned empirically at small and large k in
    tests/test_kmeans_skew.py, and a pipeline that needs bit-stable
    assignments across k changes should fix assign_mode explicitly."""
    if assign_mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown assign_mode {assign_mode!r}")
    use_broadcast = assign_mode == "broadcast" or (
        assign_mode == "auto" and k > LITERAL_K_CEILING
    )
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
            if use_broadcast:
                assigned = assign_cells_broadcast(
                    vecs.select(id_col, vec_col), centroids, vec_col=vec_col
                )
            else:
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

"""Product quantization (PQ) over an ``array<float>`` embedding column.

The reference stores raw float vectors in OpenSearch HNSW
(``KDS-P/index-creation-function/lambda_function.py:72-80``); at 100 TB
the vector bytes themselves dominate storage and scan cost, and PQ is
the standard fix: split each D-dim vector into M subvectors, k-means
each subspace into K centroids, store M one-byte codes per vector
(D*4 bytes -> M bytes; 64-dim float32 with M=4 is a 64x cut), and
answer queries with asymmetric distance computation (ADC) — one
driver-computed M x K lookup table per query, summed per row via
array lookups, entirely inside whole-stage codegen.

Spark shape (all stages partition-parallel, no corpus shuffle):
- training: per-iteration argmin assignment is a narrow map; centroid
  re-estimation is one shuffle of (subspace, code, pos) partial seums.
  Codebooks are M*K*(D/M) floats — driver-sized at any corpus scale
  (train on a sample at 100 TB; the encode pass is unchanged);
- encoding: per-row argmin against literal codebooks, narrow;
- search: the ADC table enters the plan as a literal array-of-arrays
  (an implicit broadcast); scoring is M array lookups + a fold per
  row, then a global top-k (TakeOrderedAndProject, no sort).

Correctness is pinned by tests/test_pq.py against a numpy reference
(exact same init + Lloyd updates) and a recall floor vs exact search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sub_slices(vec: Column, dim: int, m: int) -> list[Column]:
    """Split a dim-length vector into m contiguous subvectors."""
    sub = dim // m
    return [F.slice(vec, i * sub + 1, sub) for i in range(m)]


def _l2_argmin(subvec: Column, codebook: list[list[float]]) -> Column:
    """Index of the nearest (squared-L2) centroid; ties -> lowest index.

    One fold per centroid; the row subvector is bound once so the whole
    argmin stays a single codegen'd expression."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        subvec,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ).alias("dist"),
                F.lit(i).alias("code"),
            )
            for i, c in enumerate(codebook)
        ]
    )
    best = F.aggregate(
        scored,
        F.element_at(scored, 1),
        lambda acc, s: F.when(s.dist < acc.dist, s).otherwise(acc),
    )
    return best.code


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train M per-subspace codebooks of K centroids with Lloyd's
    iterations (squared-L2). Deterministic: subspace s initializes from
    the k lowest-id vectors' s-th subvectors; ties break to the lowest
    code. Returns codebooks[m][k][dim/m] as plain floats (driver-sized).

    At 100 TB: train on a hash-sampled slice (d07's sampler) — codebook
    quality saturates long before corpus size; encode still sees every
    row."""
    sub = dim // m
    vecs = df.select(id_col, vec_col).cache()
    try:
        return _pq_train_iterations(vecs, dim, m, k, sub, iterations, vec_col, id_col)
    finally:
        # the codebooks are plain driver-side floats, nothing returned
        # depends on the cached projection — release it so repeated
        # catalog/bench runs in one session don't accumulate blocks
        vecs.unpersist()


def _pq_train_iterations(vecs, dim, m, k, sub, iterations, vec_col, id_col):
    init = vecs.orderBy(id_col).limit(k).select(vec_col).collect()
    codebooks = [
        [[float(r[0][s * sub + j]) for j in range(sub)] for r in init]
        for s in range(m)
    ]

    for _ in range(iterations):
        slices = _sub_slices(F.col(vec_col), dim, m)
        # One plan computes every subspace's assignment: explode the m
        # (subspace, subvec, code) triples per row, then one grouped
        # average re-estimates all M*K centroids in a single shuffle.
        assigned = vecs.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("sub_idx"),
                            slices[s].alias("subvec"),
                            _l2_argmin(slices[s], codebooks[s]).alias("code"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("a")
        ).select("a.sub_idx", "a.code", F.posexplode("a.subvec").alias("pos", "val"))
        rows = (
            assigned.groupBy("sub_idx", "code", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("mval"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            upd.setdefault((r.sub_idx, r.code), {})[r.pos] = r.mval
        for s in range(m):
            for c in range(k):
                if vals := upd.get((s, c)):
                    codebooks[s][c] = [vals[p] for p in sorted(vals)]
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>[M]): each row compressed to M codebook
    indices. Narrow per-row argmin, no shuffle; at rest this is the
    M-byte representation that replaces the raw vector."""
    m = len(codebooks)
    slices = _sub_slices(F.col(vec_col), dim, m)
    return df.select(
        id_col,
        F.array(
            *[_l2_argmin(slices[s], codebooks[s]) for s in range(m)]
        ).alias("codes"),
    )


def pq_search(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: squared-L2 from the query to each encoded row,
    approximated as the sum of per-subspace (query-subvector ->
    centroid) distances, looked up from a literal M x K table. The scan
    reads only (id, codes); the result is a global top-k with a total
    tiebreak (TakeOrderedAndProject)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    table = [
        [
            sum(
                (float(query_vec[s * sub + j]) - c[j]) ** 2
                for j in range(sub)
            )
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    table_lit = F.array(
        *[F.array(*[F.lit(d) for d in row]) for row in table]
    )
    dist = F.aggregate(
        F.zip_with(
            table_lit,
            F.col("codes"),
            lambda row, code: F.element_at(row, code + 1),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    return (
        encoded.select(id_col, F.round(dist, 6).alias("approx_dist"))
        .orderBy("approx_dist", id_col)
        .limit(k)
    )

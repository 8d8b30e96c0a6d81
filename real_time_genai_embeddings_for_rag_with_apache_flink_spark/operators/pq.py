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

from collections.abc import Iterator

import numpy as np
import pandas as pd
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
    extra_cols: tuple[str, ...] = (),
    assign_mode: str = "auto",
) -> DataFrame:
    """(id[, extra...], codes array<int>[M]): each row compressed to M
    codebook indices. Narrow per-row argmin, no shuffle; at rest this is
    the M-byte representation that replaces the raw vector. extra_cols
    (e.g. the IVF cell id) ride along untouched.

    assign_mode mirrors kmeans_assign's: 'literal' codegen's K struct
    branches per subspace per row (right for byte codes, K <= 64);
    'broadcast' ships the codebooks once per worker in a pandas-UDF
    closure and scores each Arrow batch with one numpy GEMM per
    subspace — the large-K path (e.g. 2-byte codes, K=65536, where a
    literal tree is unbuildable). 'auto' picks by K. Ties break to the
    lowest code on both paths (strict < fold vs numpy first-argmin),
    but the paths compute distance differently (sum (s-c)^2 fold vs
    the GEMM expansion |c|^2 - 2 s.c), so codes can flip on last-ulp
    near-ties between codewords; equality is pinned empirically in
    tests/test_pq.py, and K-stable pipelines should fix assign_mode."""
    m = len(codebooks)
    n_codes = len(codebooks[0])
    if assign_mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown assign_mode {assign_mode!r}")
    from .kmeans import LITERAL_K_CEILING

    if assign_mode == "broadcast" or (
        assign_mode == "auto" and n_codes > LITERAL_K_CEILING
    ):
        return _pq_encode_broadcast(
            df, codebooks, dim, vec_col, id_col, extra_cols
        )
    slices = _sub_slices(F.col(vec_col), dim, m)
    # NULL or wrong-length vector -> NULL codes (not [0]*m — a null or
    # padded subvector's null dist keeps the fold's initial
    # accumulator), matching the broadcast path's masked rows.
    return df.select(
        id_col,
        *extra_cols,
        F.when(
            F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim),
            F.array(*[_l2_argmin(slices[s], codebooks[s]) for s in range(m)]),
        ).alias("codes"),
    )


def _pq_encode_broadcast(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    vec_col: str,
    id_col: str,
    extra_cols: tuple[str, ...],
) -> DataFrame:
    """Arrow-batched GEMM encode: all M subspace argmins in one Python
    pass per batch. argmin of |s - c|^2 == argmin of |c|^2 - 2 s.c
    (|s|^2 is row-constant), so each subspace costs one (batch x K)
    matmul however large K is."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    m = len(codebooks)
    sub = dim // m
    CB = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    c_sq = [(C * C).sum(axis=1) for C in CB]

    @F.pandas_udf("array<int>")
    def _codes(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            # NULL or wrong-length vectors get NULL codes (the shared
            # broadcast-path hygiene contract — see kmeans
            # assign_cells_broadcast); a ragged np.array would
            # otherwise crash the subspace slicing
            mask = series.map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool)
            out = [None] * len(series)
            if mask.any():
                M = np.array(
                    [np.asarray(v, dtype=np.float64) for v in series[mask]]
                )
                codes = np.empty((len(M), m), dtype=np.int32)
                for s in range(m):
                    S = M[:, s * sub : (s + 1) * sub]
                    codes[:, s] = (
                        c_sq[s][None, :] - 2.0 * (S @ CB[s].T)
                    ).argmin(axis=1)
                for j, i in enumerate(np.flatnonzero(mask)):
                    out[i] = codes[j].tolist()
            yield pd.Series(out, dtype=object)

    return df.select(id_col, *extra_cols, _codes(F.col(vec_col)).alias("codes"))


def _adc_dist(codebooks: list[list[list[float]]], query_vec: list[float]):
    """ADC distance expression for one query: squared-L2 approximated as
    the sum of per-subspace (query-subvector -> centroid) distances,
    looked up from a literal M x K table over the row's `codes`."""
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
    return F.aggregate(
        F.zip_with(
            table_lit,
            F.col("codes"),
            lambda row, code: F.element_at(row, code + 1),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def pq_search(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the whole encoded corpus. The scan reads only
    (id, codes); the result is a global top-k with a total tiebreak
    (TakeOrderedAndProject)."""
    dist = _adc_dist(codebooks, query_vec)
    return (
        encoded.select(id_col, F.round(dist, 6).alias("approx_dist"))
        .orderBy("approx_dist", id_col)
        .limit(k)
    )


def ivfpq_search(
    corpus: DataFrame,
    query_vec: list[float],
    nprobe: int = 2,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ: coarse cell pruning + residual product quantization —
    the standard composed ANN index (IVFADC), here as a pure dataflow.

    Index build (all corpus passes narrow, centroids/codebooks
    driver-sized at any corpus scale):
    1. coarse cells from the label quantizer (similarity.label_centroids
       / ivf_assign — literal-argmax assignment, NO exchange);
    2. residual r = v - centroid[cell] as a per-row zip_with against a
       literal centroid table;
    3. PQ codebooks trained on residuals (pq_train; the only shuffle in
       the build, (subspace, code, pos) partial sums), then per-row
       encode — the corpus at rest is (id, cell, M codes).

    Search: the nprobe nearest cells are picked DRIVER-side (K
    centroids is driver-sized); per probed cell the ADC table comes
    from the query's residual against THAT cell, so scoring is a
    filter + M lookups + fold per row — scans nprobe/K of the codes
    table, no shuffle, one global TakeOrderedAndProject.

    Recall vs exact search is pinned in tests/test_pq.py."""
    from .similarity import ivf_assign, label_centroids

    cells = sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in label_centroids(corpus, vec_col=vec_col).collect()
    )
    dim = len(query_vec)
    # Cell ids are positions in the literal centroid table; the
    # assignment's cell domain must be contiguous 0..K-1 for element_at.
    assert [c for c, _ in cells] == list(range(len(cells))), cells
    assigned = ivf_assign(corpus, cells, vec_col=vec_col, id_col=id_col)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for _, c in cells]
    )
    # cell NULL (the hygiene contract's NULL/wrong-length rows) must
    # propagate to a NULL residual: element_at(<literal array>, NULL)
    # yields the LAST centroid on Spark 4.1 (see ivf_assign), and
    # zip_with against a full-length centroid would pad a short vector
    # to exactly dim — sneaking garbage past pq_encode's size guard
    # into silent code-0 subcodes
    resid = F.when(
        F.col("cell").isNotNull(),
        F.zip_with(
            F.col(vec_col),
            F.element_at(cent_lit, F.col("cell") + 1),
            lambda a, b: a.cast("double") - b,
        ),
    )
    residuals = assigned.select(id_col, "cell", resid.alias("resid"))
    codebooks = pq_train(
        residuals, dim, m=m, k=n_codes, iterations=iterations,
        vec_col="resid", id_col=id_col,
    )
    encoded = pq_encode(
        residuals, codebooks, dim, vec_col="resid", id_col=id_col,
        extra_cols=("cell",),
    )

    # Driver-side probe selection: nearest cells by squared-L2 of the
    # raw query to each centroid (deterministic tiebreak on cell id).
    by_dist = sorted(
        (sum((float(query_vec[j]) - c[j]) ** 2 for j in range(dim)), cell)
        for cell, c in cells
    )
    probe_cells = [cell for _, cell in by_dist[:nprobe]]

    scored = None
    for cell in probe_cells:
        centroid = dict(cells)[cell]
        q_resid = [float(query_vec[j]) - centroid[j] for j in range(dim)]
        part = encoded.filter(F.col("cell") == cell).select(
            id_col,
            F.round(_adc_dist(codebooks, q_resid), 6).alias("approx_dist"),
        )
        scored = part if scored is None else scored.unionAll(part)
    return scored.orderBy("approx_dist", id_col).limit(k)


def ivfpq_search_refined(
    corpus: DataFrame,
    query_vec: list[float],
    nprobe: int = 2,
    k: int = 10,
    shortlist_mult: int = 4,
    m: int = 4,
    n_codes: int = 16,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC+R: the two-stage refinement on top of ivfpq_search — ADC
    shortlists k * shortlist_mult candidates cheaply, then the TRUE
    squared-L2 against the raw vectors re-ranks the shortlist and cuts
    to k. This is how a production ANN serves quality: quantization
    error only has to preserve membership in the shortlist, not the
    final ordering, so recall jumps while the expensive exact math runs
    on k * mult rows instead of the corpus.

    Scale shape: stage 1 is ivfpq_search's scan (nprobe/K of the code
    table, no shuffle); stage 2 BROADCASTS the driver-small shortlist
    (k * mult rows of ids) back against the corpus — a broadcast hash
    join, so the corpus is never shuffled and the raw vectors of
    non-candidates are never deserialized past the join filter. The
    query enters the exact fold as ONE array literal (a per-element
    literal loop would cost dim py4j round trips). Deterministic:
    exact-distance ties break on id; the shortlist's own ties already
    break on id inside ivfpq_search."""
    shortlist = ivfpq_search(
        corpus,
        query_vec,
        nprobe=nprobe,
        k=k * shortlist_mult,
        m=m,
        n_codes=n_codes,
        iterations=iterations,
        vec_col=vec_col,
        id_col=id_col,
    )
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    exact = F.aggregate(
        F.zip_with(
            F.col(vec_col), q, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    return (
        corpus.join(F.broadcast(shortlist), id_col)
        .select(
            id_col,
            "approx_dist",
            F.round(exact, 6).alias("exact_dist"),
        )
        .orderBy("exact_dist", id_col)
        .limit(k)
    )

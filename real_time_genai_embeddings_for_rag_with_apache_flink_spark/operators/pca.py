"""Distributed PCA over an ``array<float>`` embedding column.

The principled twin of s12's random projection (plans/llmops.py): where
JL planes preserve distances in expectation, PCA's top-k basis is the
provably variance-optimal linear projection — the standard
dimensionality cut before IVF/PQ index builds and the whitening step of
embedding-quality audits. Not SQL-expressible (eigendecomposition), so
the catalog entry is rows-only and correctness is pinned against numpy
on the collected corpus in tests/test_pca.py.

Spark shape (the textbook scalable layout — one data pass, tiny driver
state):
- FIT: every Arrow batch emits ONE partial-moment row (n, sum-vector,
  flattened gram matrix as raw float64 BYTES) from ``mapInPandas`` —
  the map-side-combine shape by construction; a single reduce task sums
  the partials executor-side so the driver collects exactly one row,
  forms the covariance, and runs ``numpy.linalg.eigh`` on the
  dim x dim matrix (driver-trivial for any embedding dim that fits a
  vector column);
- PROJECT: the (dim x k) basis ships in a pandas-UDF closure and each
  batch is projected with one dense GEMM — the assign_cells_broadcast
  delivery (operators/kmeans.py), cost independent of k's effect on
  plan size, zero shuffle.

At 100 TB the fit is one scan producing ~partitions * dim^2 * 8 bytes
of partials (1024-d: 8 MiB each) that reduce to ONE row before the
driver sees them — shuffle bytes, never a py4j list — and the
projection is embarrassingly parallel. The bench's s21_stress row
prices the whole fit at Titan-v2 width. Determinism: eigh is
deterministic for a fixed covariance; residual sign ambiguity is fixed
by orienting each component so its largest-|coefficient| entry is
positive (first such index on exact ties).

The reference has no dimensionality-reduction counterpart — its vectors
go to OpenSearch at full Titan width (KDS-P/index-creation-function/
lambda_function.py:72-80); this is engine-native capability.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_moments(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[int, np.ndarray, np.ndarray]:
    """One-pass global (count, mean, covariance) of a vector column.

    Rows with a NULL or wrong-length vector are excluded from the
    moments (the fit must not crash on the corpus hygiene the
    projection path handles by emitting NULL). Two Arrow stages: every
    batch emits one (n, sum, gram) partial with the float64 buffers as
    BINARY (dim^2 doubles as one bytes cell — never a million-element
    Python list), and a single reduce task sums the partials so the
    driver collects exactly ONE row regardless of partition count (at
    1024 dims the partials are 8 MiB each: collecting them raw cost
    more than the GEMMs; the repartition(1) reduce moves them as
    JVM-side shuffle bytes instead)."""
    schema = "n long, s binary, g binary"

    def _partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            col = pdf[vec_col]
            rows = [
                np.asarray(v, dtype=np.float64)
                for v in col
                if v is not None and len(v) == dim
            ]
            if not rows:
                continue
            M = np.array(rows)
            yield pd.DataFrame(
                {
                    "n": [len(rows)],
                    "s": [M.sum(axis=0).tobytes()],
                    "g": [np.ascontiguousarray(M.T @ M).tobytes()],
                }
            )

    def _reduce(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros(dim * dim)
        for pdf in it:
            for _, r in pdf.iterrows():
                n += int(r["n"])
                s += np.frombuffer(r["s"], dtype=np.float64)
                g += np.frombuffer(r["g"], dtype=np.float64)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tobytes()], "g": [g.tobytes()]}
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(_partials, schema)
        .repartition(1)
        .mapInPandas(_reduce, schema)
        .collect()
    )
    if not parts:
        raise ValueError(f"no usable {vec_col!r} vectors of length {dim}")
    (row,) = parts
    n = int(row["n"])
    mu = np.frombuffer(row["s"], dtype=np.float64) / n
    g = np.frombuffer(row["g"], dtype=np.float64).reshape(dim, dim)
    cov = g / n - np.outer(mu, mu)
    return n, mu, cov


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit the top-k PCA basis. Returns (W, eigvals, mean): W is
    (dim x k), columns are unit-norm principal directions in descending
    eigenvalue order with the sign convention described in the module
    docstring; eigvals are the matching top-k covariance eigenvalues."""
    _, mu, cov = covariance_moments(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]
    vals = vals[order]
    # sign fix: largest-|coefficient| entry of each component positive
    for j in range(W.shape[1]):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    return W, vals, mu


def pca_project_broadcast(
    df: DataFrame,
    W: np.ndarray,
    mu: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project (centered) vectors onto the basis: one GEMM per Arrow
    batch against the closure-shipped (dim x k) matrix. NULL or
    wrong-length vectors yield a NULL projection (the
    assign_cells_broadcast null contract)."""
    Wf = np.asarray(W, dtype=np.float64)
    muf = np.asarray(mu, dtype=np.float64)
    dim = Wf.shape[0]

    @F.pandas_udf("array<double>")
    def _project(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            ok = series.map(lambda v: v is not None and len(v) == dim)
            out = pd.Series([None] * len(series), dtype="object")
            if ok.any():
                M = np.array(
                    [np.asarray(v, dtype=np.float64) for v in series[ok]]
                )
                P = (M - muf[None, :]) @ Wf
                out.iloc[np.flatnonzero(ok.to_numpy())] = [
                    row.tolist() for row in P
                ]
            yield out

    return df.withColumn(out_col, _project(F.col(vec_col)))

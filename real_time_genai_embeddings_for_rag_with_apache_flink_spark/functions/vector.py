"""Vector math over ``array<float>`` columns — pure Catalyst expressions.

The reference never computes vector math itself (similarity is delegated
to OpenSearch HNSW, ``KDS-P/index-creation-function/lambda_function.py:72-80``);
the engine computes it in-plan with higher-order functions so it stays
JVM-side inside whole-stage codegen — no Python crossing, no UDF — which
is what survives a 100 TB scan.

All arithmetic is promoted to double and accumulated left-to-right
(``aggregate`` is a sequential fold), so results are deterministic and
reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float-array columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) = dot / (||a|| * ||b||); null-safe on zero norms."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def l2_normalize(a: Column) -> Column:
    """Scale a float array to unit L2 norm (kept float, for storage)."""
    nrm = l2_norm(a)
    return F.when(
        nrm != 0.0, F.transform(a, lambda x: (x.cast("double") / nrm).cast("float"))
    ).otherwise(a)

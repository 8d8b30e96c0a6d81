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


def pack_sign_bits(a: Column, lo: int, hi: int) -> Column:
    """Pack the sign bits of ``a[lo..hi]`` (1-based, inclusive) into one
    non-negative BIGINT: bit ``d - lo`` is set when ``a[d] > 0``. This is
    binary (1-bit) quantization — the 64-dim embedding becomes two 32-bit
    words, and Hamming distance over the words (``bit_count(xor)``)
    approximates angular distance (Charikar 2002 hyperplane-LSH algebra
    with the coordinate axes as planes; the public recipe behind faiss'
    binary indexes and "Binary Passage Retrieval", Yamada et al. 2021).

    Keep ``hi - lo <= 62`` so the word stays positive (no sign-bit
    surprises when the value crosses engines). The expression is a FLAT
    sum of per-bit ``CASE`` terms — linear size, pure whole-stage
    codegen, no UDF. A NULL array packs to NULL (not to an all-zeros
    word that would silently rank as a real vector)."""
    if not 0 < hi - lo + 1 <= 63:
        raise ValueError(f"bit range [{lo}, {hi}] must hold 1..63 bits")
    word = F.lit(0).cast("long")
    for d in range(lo, hi + 1):
        word = word + F.when(
            F.element_at(a, d) > F.lit(0.0), F.lit(1 << (d - lo)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return F.when(a.isNotNull(), word)


def l2_normalize(a: Column) -> Column:
    """Scale a float array to unit L2 norm (kept float, for storage)."""
    nrm = l2_norm(a)
    return F.when(
        nrm != 0.0, F.transform(a, lambda x: (x.cast("double") / nrm).cast("float"))
    ).otherwise(a)

"""SemDeDup-style semantic deduplication over an embedding column.

The public SemDeDup recipe (Abbas et al., 2023, arXiv:2303.09540):
cluster the corpus embeddings with k-means, compare pairs only WITHIN a
cluster, and keep one representative from every group of semantically
near-identical vectors. The reference delegates all similarity to
OpenSearch (``KDS-P/index-creation-function/lambda_function.py:72-80``)
and has no dedup at all; a training-data pipeline at 100 TB needs this
pass, so the engine composes it from its own primitives:

- coarse clustering: operators/kmeans.py kmeans_assign — centroids stay
  driver-sized, assignment is a narrow argmin, one (cell, pos) shuffle
  per Lloyd's iteration;
- candidate pairs: a self-join INSIDE each cell only — the cell is the
  blocking key that keeps the comparison O(sum of cell sizes squared)
  instead of O(n^2); cells are capped by k, tunable to bound the
  quadratic term;
- survivor rule: drop a vector iff some lower-id vector in the same
  cell has cosine >= threshold (deterministic, order-free, one
  left-anti join) — every near-dup group keeps exactly its lowest id,
  without an iterative connected-components pass (the transitive
  closure variant is d08_dup_components).

Not SQL-expressible end-to-end (k-means is iterative), so the catalog
entry is rows-only; semantics are pinned by tests/test_semdedup.py on a
fixture with known duplicate groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import dot, l2_norm
from .kmeans import kmeans_assign


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
    threshold: float = 0.95,
) -> DataFrame:
    """Survivors of SemDeDup at ``threshold``: (id, cell) for every row
    that has no same-cell lower-id neighbor with cosine >= threshold."""
    cells = kmeans_assign(df, vec_col=vec_col, id_col=id_col, k=k, iterations=iterations)
    sides = (
        df.select(id_col, vec_col)
        .join(cells, id_col)
        .select(
            F.col(id_col).alias("id"),
            F.col("cell"),
            F.col(vec_col).alias("v"),
            l2_norm(F.col(vec_col)).alias("nrm"),
        )
    )
    a, b = sides.alias("a"), sides.alias("b")
    denom = F.col("a.nrm") * F.col("b.nrm")
    # ids of rows dominated by a lower-id near-identical neighbor
    dropped = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")),
        )
        .filter(denom != 0.0)
        .filter(dot(F.col("a.v"), F.col("b.v")) / denom >= threshold)
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    return (
        sides.join(dropped, "id", "left_anti")
        .select(F.col("id").alias(id_col), "cell")
    )

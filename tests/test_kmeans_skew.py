"""Iterative k-means vs a numpy reference, and skew-salting equivalence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.kmeans import (
    _nearest_cell,
    kmeans_assign,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.skew import (
    salted_count_sum,
    salted_join,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def _numpy_kmeans(ids, X, k, iterations):
    order = np.argsort(ids)
    ids, X = np.asarray(ids)[order], np.asarray(X, dtype=np.float64)[order]
    cents = X[:k].copy()
    assign = None
    for _ in range(iterations):
        scaled = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-300
        )
        sims = X @ scaled.T
        # ties -> lowest index, matching the engine's strict > fold
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return dict(zip(ids.tolist(), assign.tolist()))


def test_kmeans_matches_numpy(spark):
    em = load_table(spark, SF_SMOKE, "embeddings")
    rows = em.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = [list(map(float, r.embedding)) for r in rows]
    expected = _numpy_kmeans(ids, X, k=8, iterations=3)

    got = {
        r.vec_id: r.cell
        for r in kmeans_assign(em, k=8, iterations=3).collect()
    }
    mismatches = {i for i in expected if expected[i] != got[i]}
    assert not mismatches, f"{len(mismatches)} assignment mismatches"


def test_kmeans_uses_all_cells(spark):
    em = load_table(spark, SF_SMOKE, "embeddings")
    cells = {r.cell for r in kmeans_assign(em, k=4, iterations=2).collect()}
    assert len(cells) > 1


def test_salted_join_equals_plain_join(spark):
    o = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    plain = o.join(c, "custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, "custkey", salt=8).select("o_orderkey", "c_name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    # restrict the lookup side so some orders have no match
    c = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("custkey"), "c_name")
    )
    plain = o.join(c, "custkey", "left")
    salted = salted_join(o, c, "custkey", how="left", salt=4)
    assert salted.count() == plain.count()
    assert (
        salted.filter(F.col("c_name").isNull()).count()
        == plain.filter(F.col("c_name").isNull()).count()
    )


def test_salted_join_rejects_bad_how(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(o, o, "o_orderkey", how="full")


def test_salted_count_sum_equals_plain(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    plain = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    )
    salted = salted_count_sum(ev, "event_type", "value", salt=8).collect()
    p = {r.event_type: (r.n, round(r.total, 6)) for r in plain}
    s = {r.event_type: (r.n, round(r.total, 6)) for r in salted}
    assert p == s


def test_broadcast_assignment_equals_literal(spark):
    """The large-k GEMM path (assign_cells_broadcast / kmeans_assign
    assign_mode='broadcast') must produce the same cells as the literal
    codegen'd argmin at the same k — the decomposition is exact, so the
    mode is purely a deployment decision."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.kmeans import (
        assign_cells_broadcast,
        kmeans_assign,
    )

    em = load_table(spark, SF_SMOKE, "embeddings")
    lit = {
        r.vec_id: r.cell
        for r in kmeans_assign(em, k=8, iterations=2, assign_mode="literal").collect()
    }
    bc = {
        r.vec_id: r.cell
        for r in kmeans_assign(em, k=8, iterations=2, assign_mode="broadcast").collect()
    }
    assert bc == lit and len(set(lit.values())) > 1

    # direct one-shot assignment too, against _nearest_cell's output
    cents = [
        list(map(float, r.embedding))
        for r in em.orderBy("vec_id").limit(8).collect()
    ]
    one_lit = {
        r.vec_id: r.cell
        for r in em.select(
            "vec_id", _nearest_cell(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    one_bc = {
        r.vec_id: r.cell
        for r in assign_cells_broadcast(em, cents).select("vec_id", "cell").collect()
    }
    assert one_bc == one_lit


def test_broadcast_assignment_handles_large_k(spark):
    """k=200 (beyond LITERAL_K_CEILING): auto mode routes to the GEMM
    path and still matches the numpy reference — the path a thousand-
    centroid IVF build at 100 TB would take."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.kmeans import (
        LITERAL_K_CEILING,
    )

    k = 200
    assert k > LITERAL_K_CEILING
    em = load_table(spark, SF_SMOKE, "embeddings")
    rows = em.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = [list(map(float, r.embedding)) for r in rows]
    expected = _numpy_kmeans(ids, X, k=k, iterations=2)
    got = {
        r.vec_id: r.cell for r in kmeans_assign(em, k=k, iterations=2).collect()
    }
    assert got == expected


def test_ivf_assign_broadcast_equals_literal(spark):
    """ivf_assign's GEMM route (assign_mode='broadcast') must emit the
    literal path's cells exactly, including non-contiguous caller cell
    ids (the position->cell mapping)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
        ivf_assign,
        label_centroids,
    )

    em = load_table(spark, SF_SMOKE, "embeddings")
    cells = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in label_centroids(em).collect()
    ]
    # shift ids to be non-contiguous: the mapping must survive
    shifted = [(c * 10 + 3, v) for c, v in cells]
    lit = {
        r.vec_id: r.cell
        for r in ivf_assign(em, shifted, assign_mode="literal").collect()
    }
    bc = {
        r.vec_id: r.cell
        for r in ivf_assign(em, shifted, assign_mode="broadcast").collect()
    }
    assert bc == lit and len(set(lit.values())) > 1


def test_null_embedding_gets_null_cell_in_both_modes(spark):
    """A NULL vector must assign to a NULL cell in BOTH paths: the
    broadcast UDF used to crash the task on np.asarray(None), and the
    literal fold used to silently keep its initial accumulator (cell 0).
    Flipping assign_mode must never change null handling."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.kmeans import (
        assign_cells_broadcast,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, None), (3, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    lit = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", _nearest_cell(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    bc = {
        r.vec_id: r.cell
        for r in assign_cells_broadcast(df, cents)
        .select("vec_id", "cell")
        .collect()
    }
    assert lit == {1: 0, 2: None, 3: 1}
    assert bc == lit
    for metric in ("l2",):
        bc2 = {
            r.vec_id: r.cell
            for r in assign_cells_broadcast(df, cents, metric=metric)
            .select("vec_id", "cell")
            .collect()
        }
        assert bc2 == lit


def test_wrong_length_vector_gets_null_in_all_paths(spark):
    """ADVICE r8 + r9 review: a non-null WRONG-LENGTH vector used to
    crash the broadcast matmul (ragged np.array) while the LITERAL
    folds silently assigned cell 0 / codes (null sims keep the fold's
    initial accumulator). Every assignment path — kmeans literal &
    broadcast, pq literal & broadcast, ivf literal & broadcast — now
    shares one NULL/wrong-length -> NULL contract, so flipping
    assign_mode never changes hygiene semantics."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.kmeans import (
        assign_cells_broadcast,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pq import (
        pq_encode,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
        ivf_assign,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0]),  # wrong length: dim is 4
            (3, None),
            (4, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    expected = {1: 0, 2: None, 3: None, 4: 1}

    bc = {
        r.vec_id: r.cell
        for r in assign_cells_broadcast(df, cents)
        .select("vec_id", "cell")
        .collect()
    }
    lit = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", _nearest_cell(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    assert bc == expected and lit == expected

    for mode in ("literal", "broadcast"):
        cells = {
            r.vec_id: r.cell
            for r in ivf_assign(
                df, [(0, cents[0]), (1, cents[1])], assign_mode=mode
            )
            .select("vec_id", "cell")
            .collect()
        }
        assert cells == expected, f"ivf mode={mode}: {cells}"

    codebooks = [
        [[0.0, 0.0], [1.0, 0.0]],
        [[0.0, 0.0], [0.0, 1.0]],
    ]
    for mode in ("literal", "broadcast"):
        codes = {
            r.vec_id: r.codes
            for r in pq_encode(
                df, codebooks, dim=4, assign_mode=mode
            ).collect()
        }
        assert codes[2] is None and codes[3] is None, f"pq mode={mode}"
        assert codes[1] is not None and codes[4] is not None

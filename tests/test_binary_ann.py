"""Quality + semantics gate for s23's binary-quantized ANN.

The oracle certifies the s23 PIPELINE hash-exactly (every stage is
relational); what it cannot say is whether the approximation is any
good or whether the bit packing means what it claims. Pinned here:

- pack_sign_bits equals the numpy sign/packbits reference bit-for-bit
  (and packs NULL arrays to NULL, not to an all-zeros pseudo-vector);
- the hamming column IS the Hamming distance between sign patterns;
- recall@5 vs exact brute force: >= 0.60 at the 40-wide shortlist on
  the near-isotropic testdata (measured 0.76 — vs 0.46 for s22's
  8-dim PCA coarse pass at the SAME width: 64 sign planes out-rank
  8 variance-optimal dims), rising with shortlist width.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
    pack_sign_bits,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import get_spec
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def _numpy_words(vec: np.ndarray) -> tuple[int, int]:
    bits = vec > 0
    w0 = int(sum(1 << i for i in range(32) if bits[i]))
    w1 = int(sum(1 << i for i in range(32) if bits[32 + i]))
    return w0, w1


def test_pack_sign_bits_matches_numpy(spark):
    em = load_table(spark, SF_SMOKE, "embeddings").limit(20)
    rows = em.select(
        "vec_id",
        "embedding",
        pack_sign_bits(F.col("embedding"), 1, 32).alias("b0"),
        pack_sign_bits(F.col("embedding"), 33, 64).alias("b1"),
    ).collect()
    assert rows
    for r in rows:
        w0, w1 = _numpy_words(np.asarray(r.embedding, dtype=np.float64))
        assert (r.b0, r.b1) == (w0, w1), f"vec {r.vec_id} packed wrong"
        assert r.b0 >= 0 and r.b1 >= 0  # words stay positive


def test_pack_sign_bits_null_array_packs_to_null(spark):
    df = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None)], "id long, v array<float>"
    )
    got = {
        r.id: r.w
        for r in df.select(
            "id", pack_sign_bits(F.col("v"), 1, 32).alias("w")
        ).collect()
    }
    assert got[1] == (1 << 32) - 1
    assert got[2] is None


def test_hamming_column_is_sign_pattern_distance(spark):
    out = get_spec("s23_binary_hamming_ann").build(spark, SF_SMOKE).collect()
    em = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    assert out
    for r in out:
        expect = int(((em[r.q_id] > 0) != (em[r.vec_id] > 0)).sum())
        assert r.hamming == expect


def test_recall_floor_vs_exact(spark):
    em_rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    ids = np.array([r.vec_id for r in em_rows])
    E = np.array([r.embedding for r in em_rows], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    qmask = ids % 50 == 0
    truth: dict[int, set[int]] = {}
    for qi in np.where(qmask)[0]:
        sims = np.round(En[~qmask] @ En[qi], 6)
        cids = ids[~qmask]
        order = np.lexsort((cids, -sims))[:5]
        truth[int(ids[qi])] = set(int(c) for c in cids[order])

    got: dict[int, set[int]] = {}
    for r in get_spec("s23_binary_hamming_ann").build(spark, SF_SMOKE).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)

    assert set(got) == set(truth)
    recall = sum(
        len(truth[q] & got[q]) / len(truth[q]) for q in truth
    ) / len(truth)
    assert recall >= 0.60, f"recall@5 collapsed: {recall:.2f}"


def test_width_advisor_curve_is_monotone_and_anchored(spark):
    """s24's (width, recall) curve: recall must be nondecreasing in
    width, reach the measured s23 operating point at width 40, and hit
    1.0 only when the shortlist covers everything the truth needs."""
    curve = {
        r.width: r.recall
        for r in get_spec("s24_hamming_width_advisor").build(spark, SF_SMOKE).collect()
    }
    widths = sorted(curve)
    assert widths == [10, 20, 40, 80]
    for lo, hi in zip(widths, widths[1:]):
        assert curve[lo] <= curve[hi], f"recall dropped {lo}->{hi}"
    assert curve[40] >= 0.60  # the s23 operating point (measured 0.76)
    assert curve[10] < 1.0  # a 10-wide shortlist cannot be exact here


def test_arrow_packer_matches_flat_sum_layout(spark):
    """pack_sign_words_arrow must produce the EXACT bit layout of the
    codegen flat-sum pack (word w, bit d-within-word), pack NULL and
    wrong-length vectors to NULL, and hamming_words over the arrays
    must equal the scalar popcount form."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
        hamming_words,
        pack_sign_words_arrow,
    )

    em = load_table(spark, SF_SMOKE, "embeddings").limit(40)
    flat = {
        r.vec_id: [r.b0, r.b1]
        for r in em.select(
            "vec_id",
            pack_sign_bits(F.col("embedding"), 1, 32).alias("b0"),
            pack_sign_bits(F.col("embedding"), 33, 64).alias("b1"),
        ).collect()
    }
    arrow = {
        r.vec_id: r.words
        for r in pack_sign_words_arrow(em, dim=64).collect()
    }
    assert arrow == flat

    bad = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None), (3, [0.5] * 10)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.words
        for r in pack_sign_words_arrow(bad, dim=64).collect()
    }
    assert got[1] == [(1 << 32) - 1, (1 << 32) - 1]
    assert got[2] is None and got[3] is None

    words = pack_sign_words_arrow(em, dim=64)
    a = words.select(F.col("vec_id").alias("ia"), F.col("words").alias("wa"))
    b = words.select(F.col("vec_id").alias("ib"), F.col("words").alias("wb"))
    pairs = (
        a.join(F.broadcast(b), F.col("ia") < F.col("ib"))
        .select("ia", "ib", hamming_words(F.col("wa"), F.col("wb")).alias("h"))
        .collect()
    )
    import numpy as np

    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in em.collect()
    }
    for r in pairs[:100]:
        want = int(((emb[r.ia] > 0) != (emb[r.ib] > 0)).sum())
        assert r.h == want


def test_s27_certifies_ann_quality_on_s25_ground_truth(spark):
    """s27 = the s25 metric harness over the s23-shaped Hamming ANN's
    output, on s25's exact query split. Pins (r8 verdict item 3):
    - same query universe as s25 (per-query rows line up 1:1);
    - the ANN's ranked list finds >= 50% of the exact cosine top-10
      (ID overlap — the true approximation cost; measured 0.57 at
      sf0.001, 0.595 at sf0.01 with the 40-wide shortlist);
    - label-metric gap to exact stays inside a narrow band (label
      recall is NOT monotone in ranker quality, so the pin is a band,
      not an ordering)."""
    from pyspark.sql import Window

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
        cosine_similarity,
    )

    s25 = {r.q_id: r for r in get_spec("s25_retrieval_eval").build(spark, SF_SMOKE).collect()}
    s27 = {r.q_id: r for r in
           get_spec("s27_ann_quality_certification").build(spark, SF_SMOKE).collect()}
    assert set(s25) == set(s27), "same query universe as s25"

    # ID-overlap recall of the ANN list vs the exact top-10
    em = load_table(spark, SF_SMOKE, "embeddings")
    qv = em.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    exact = (
        em.filter(F.col("vec_id") % 25 != 0)
        .select("vec_id", "embedding")
        .crossJoin(F.broadcast(qv))
        .select(
            "q_id",
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("q_vec")), 6
            ).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 10)
    )
    exact_ids = {(r.q_id, r.vec_id) for r in exact.collect()}

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.retrieval import (
        _ann_ranked_list,
    )

    ann_ids = {
        (r.q_id, r.vec_id)
        for r in _ann_ranked_list(spark, SF_SMOKE).collect()
    }
    overlap = len(ann_ids & exact_ids) / len(exact_ids)
    assert overlap >= 0.5, f"ANN id-overlap recall@10 fell to {overlap}"

    # label-metric band: mean recall within 0.1 of exact either way
    mean = lambda d, f: sum(getattr(r, f) for r in d.values()) / len(d)
    assert abs(mean(s27, "recall_at_k") - mean(s25, "recall_at_k")) <= 0.1
    assert abs(mean(s27, "ndcg_at_k") - mean(s25, "ndcg_at_k")) <= 0.1


def test_eval_ranked_refactor_matches_retrieval_eval(spark):
    """eval_ranked is the factored-out metric half of retrieval_eval;
    feeding it the exact ranked list must reproduce retrieval_eval's
    rows bit-for-bit (the s25/s27 shared-arithmetic claim)."""
    from pyspark.sql import Window

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
        cosine_similarity,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
        eval_ranked,
        retrieval_eval,
    )

    em = load_table(spark, SF_SMOKE, "embeddings")
    queries = em.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    corpus = em.filter(F.col("vec_id") % 25 != 0)
    direct = retrieval_eval(queries, corpus, k=10)

    wr = Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
    ranked = (
        corpus.crossJoin(F.broadcast(queries))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("q_vec")), 6
            ).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 10)
    )
    via_ranked = eval_ranked(ranked, corpus, k=10)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(direct) == key(via_ranked)

    # ADVICE r9 (low): a query with an EMPTY shortlist contributes no
    # metrics row unless the query universe is passed — with it, the
    # dropped query comes back as an all-zero-metrics row and every
    # populated row is unchanged.
    one_q = [r.q_id for r in queries.select("q_id").collect()][0]
    gapped = ranked.filter(F.col("q_id") != one_q)
    missing = eval_ranked(gapped, corpus, k=10)
    assert one_q not in {r.q_id for r in missing.collect()}
    full = eval_ranked(gapped, corpus, k=10, queries=queries)
    zero_row = [r for r in full.collect() if r.q_id == one_q]
    assert len(zero_row) == 1
    assert (
        zero_row[0].hits_at_k,
        zero_row[0].recall_at_k,
        zero_row[0].mrr,
        zero_row[0].ndcg_at_k,
    ) == (0, 0.0, 0.0, 0.0)
    assert key(full.filter(F.col("q_id") != one_q)) == key(
        via_ranked.filter(F.col("q_id") != one_q)
    )


def test_s30_graph_walk_recall_floor_and_walk_semantics(spark):
    """s30's beam walk examines only graph-reachable candidates, yet
    its recall@5 at the same 40-wide re-rank must stay within reach of
    s23's GLOBAL Hamming cut (measured 0.70 vs 0.76 at sf0.001, 0.78
    vs 0.76 at sf0.01 — the graph's cosine-built edges buy back most
    of what the partial view costs). Also pinned: the result is a true
    subset of the corpus side, every query answers, and per-query
    exactly k rows with rank 1..k."""
    em_rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    ids = np.array([r.vec_id for r in em_rows])
    E = np.array([r.embedding for r in em_rows], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    qmask = ids % 50 == 0
    truth: dict[int, set[int]] = {}
    for qi in np.where(qmask)[0]:
        sims = np.round(En[~qmask] @ En[qi], 6)
        cids = ids[~qmask]
        order = np.lexsort((cids, -sims))[:5]
        truth[int(ids[qi])] = set(int(c) for c in cids[order])

    rows = get_spec("s30_graph_beam_ann").build(spark, SF_SMOKE).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r.q_id, set()).add(r.vec_id)
        assert r.vec_id % 50 != 0  # answers come from the corpus side
        assert 1 <= r.rank <= 5
    assert set(got) == set(truth)  # every query answered
    assert all(len(v) == 5 for v in got.values())
    recall = sum(
        len(truth[q] & got[q]) / len(truth[q]) for q in truth
    ) / len(truth)
    assert recall >= 0.60, f"graph-walk recall@5 collapsed: {recall:.2f}"


def test_banded_pairs_equal_per_band_union(spark):
    """_banded_pairs' single (band, key) equi-join must produce exactly
    the pairs the original one-join-per-band construction produced —
    the restructure is a plan optimization, not a semantics change."""
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
        dot,
        l2_norm,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        _hyperplane_bucket_col,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _S30_BANDS,
        _banded_pairs,
        _sign_bits_split,
    )

    em = load_table(spark, SF_SMOKE, "embeddings").limit(120)
    _, corpus = _sign_bits_split(em)
    sides = corpus.select(
        "vec_id",
        _hyperplane_bucket_col().alias("bucket"),
        "embedding",
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    got = sorted(
        (r.band, r.src, r.dst, r.sim)
        for r in _banded_pairs(sides, sides).collect()
    )

    a, b = sides.alias("a"), sides.alias("b")
    denom = F.col("a.nrm") * F.col("b.nrm")
    sim = F.round(dot(F.col("a.embedding"), F.col("b.embedding")) / denom, 6)
    expected = []
    for j in range(_S30_BANDS):
        ka = F.shiftright(F.col("a.bucket"), 2 * j).bitwiseAND(F.lit(3))
        kb = F.shiftright(F.col("b.bucket"), 2 * j).bitwiseAND(F.lit(3))
        expected.extend(
            (j, r.src, r.dst, r.sim)
            for r in a.join(
                b, (ka == kb) & (F.col("a.vec_id") != F.col("b.vec_id"))
            )
            .filter(denom != 0.0)
            .select(
                F.col("a.vec_id").alias("src"),
                F.col("b.vec_id").alias("dst"),
                sim.alias("sim"),
            )
            .collect()
        )
    assert got == sorted(expected)
    assert got, "pair set must be non-empty at this fixture size"


def _graph_sides(spark, n_limit: int):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
        l2_norm,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        _hyperplane_bucket_col,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _sign_bits_split,
    )

    em = load_table(spark, SF_SMOKE, "embeddings").limit(n_limit)
    _, corpus = _sign_bits_split(em)
    return corpus.select(
        "vec_id",
        _hyperplane_bucket_col().alias("bucket"),
        "embedding",
        l2_norm(F.col("embedding")).alias("nrm"),
    )


def test_banded_topk_matches_banded_pairs_after_rank(spark):
    """_banded_topk (the per-cell vectorized kernel) must be a drop-in
    for _banded_pairs at the point the graph build consumes it: the
    top-K-per-(band, src) window over its output — identical ROUND,
    identical (sim DESC, dst) tiebreaks — must equal the window over
    the full pair set, row for row and value for value (the kernel's
    raw-sim margin is a superset cut, never a decision). Also pinned:
    the kernel emits a SUBSET of the true pair set with bit-identical
    sims (the rank-1 element-order accumulation IS the fold)."""
    from pyspark.sql import Window

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _S30_KG,
        _banded_pairs,
        _banded_topk,
    )

    sides = _graph_sides(spark, 150)
    wj = Window.partitionBy("band", "src").orderBy(F.desc("sim"), "dst")

    def ranked(pairs):
        return sorted(
            (r.band, r.src, r.dst, r.sim)
            for r in pairs.withColumn("rnk", F.row_number().over(wj))
            .filter(F.col("rnk") <= _S30_KG)
            .collect()
        )

    full = _banded_pairs(sides, sides)
    culled = _banded_topk(sides)
    assert ranked(culled) == ranked(full)
    full_set = {
        (r.band, r.src, r.dst): r.sim for r in full.collect()
    }
    culled_rows = culled.collect()
    assert culled_rows, "kernel emitted nothing at this fixture size"
    for r in culled_rows:
        assert full_set[(r.band, r.src, r.dst)] == r.sim


def test_banded_topk_settled_matches_b_flag_join(spark):
    """The settled path (st39's per-trigger call) must reproduce the
    b_flag join semantics after the rank: settled rows pair only with
    new arrivals, both directions present, sims bit-identical."""
    from pyspark.sql import Window

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _S30_KG,
        _banded_pairs,
        _banded_topk,
    )

    sides = _graph_sides(spark, 150)
    all_nodes = sides.withColumn("settled", F.col("vec_id") % 3 == 0)
    newv = all_nodes.filter(~F.col("settled")).drop("settled")
    wj = Window.partitionBy("band", "src").orderBy(F.desc("sim"), "dst")

    def ranked(pairs):
        return sorted(
            (r.band, r.src, r.dst, r.sim)
            for r in pairs.withColumn("rnk", F.row_number().over(wj))
            .filter(F.col("rnk") <= _S30_KG)
            .collect()
        )

    full = _banded_pairs(newv, all_nodes, b_flag="settled")
    culled = _banded_topk(all_nodes, settled_col="settled")
    assert ranked(culled) == ranked(full)
    # every settled src's candidates are new arrivals only
    new_ids = {r.vec_id for r in newv.select("vec_id").collect()}
    settled_ids = {
        r.vec_id
        for r in all_nodes.filter("settled").select("vec_id").collect()
    }
    for r in culled.collect():
        if r.src in settled_ids:
            assert r.dst in new_ids

def test_banded_topk_fat_cell_chunked_path_is_identical(spark, monkeypatch):
    """The cell-size guard (r14 verdict #2): a cell whose similarity
    block would exceed _S30_CELL_BLOCK_ELEMS doubles must take the
    row-chunked path and emit EXACTLY the rows the monolithic fast path
    emits — same keep set, bit-identical sims — for both the plain
    (s30 build) and settled (st39 trigger) calls. The bound is captured
    by value at build time, so patching the module constant before
    building the DataFrame forces every cell through the guarded path
    (64 elements << any cell's |new| x |cell| at this fixture size)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        pipeline_extra,
    )

    sides = _graph_sides(spark, 150)
    all_nodes = sides.withColumn("settled", F.col("vec_id") % 3 == 0)

    def rows(df):
        return sorted(
            (r.band, r.src, r.dst, r.sim) for r in df.collect()
        )

    plain_fast = rows(pipeline_extra._banded_topk(sides))
    settled_fast = rows(
        pipeline_extra._banded_topk(all_nodes, settled_col="settled")
    )
    monkeypatch.setattr(pipeline_extra, "_S30_CELL_BLOCK_ELEMS", 64)
    plain_chunked = rows(pipeline_extra._banded_topk(sides))
    settled_chunked = rows(
        pipeline_extra._banded_topk(all_nodes, settled_col="settled")
    )
    assert plain_fast, "fixture produced no candidate rows"
    assert plain_chunked == plain_fast
    assert settled_chunked == settled_fast


def test_graph_beam_serve_enforces_the_driver_graph_ceiling(
    spark, monkeypatch
):
    """The serve path's driver-resident graph has an ENFORCED ceiling
    (r14 verdict #3): an oversized corpus fails loudly before the bit
    table is collected, and an edge table bigger than the banded
    top-k construction could produce is rejected after its collect."""
    import pytest

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        pipeline_extra,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _graph_beam_serve,
        _sign_bits_split,
    )

    em = load_table(spark, SF_SMOKE, "embeddings").limit(60)
    queries, corpus = _sign_bits_split(em)
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")

    monkeypatch.setattr(pipeline_extra, "_S30_MAX_GRAPH_NODES", 3)
    with pytest.raises(ValueError, match="driver-resident graph ceiling"):
        _graph_beam_serve(queries, corpus, edges)

    # restore the node ceiling; an implausibly fat edge table still fails
    monkeypatch.setattr(pipeline_extra, "_S30_MAX_GRAPH_NODES", 4_000_000)
    n_nodes = corpus.count()
    fat = (
        spark.range(
            n_nodes * 2 * pipeline_extra._S30_BANDS * pipeline_extra._S30_KG
            + 5
        )
        .selectExpr("id % 7 AS src", "id % 11 AS dst")
    )
    with pytest.raises(ValueError, match="edges exceed"):
        _graph_beam_serve(queries, corpus, fat)

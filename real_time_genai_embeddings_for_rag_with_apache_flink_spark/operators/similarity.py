"""Similarity search over embedding columns.

The reference delegates ANN entirely to OpenSearch HNSW
(``KDS-P/index-creation-function/lambda_function.py:72-80``); the engine
computes similarity in-plan:

- exact brute-force top-k (baseline, fully JVM-side: broadcast the small
  side, window-rank the matches) — correct at any scale, O(|Q|·|C|);
- IVF-style pruned search (scale path): k-means-ish coarse centroids by
  hashed bucket, search only the closest buckets.

At 100 TB the corpus side stays partitioned and is scanned once per
query batch; the query side is the broadcast side (queries are small by
construction). No shuffle of the corpus is required for brute-force
top-k: cosine + per-query rank is computed map-side under AQE, and only
|Q|·k rows survive the final window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dot


def query_literal(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec]).cast("array<float>")


def topk_to_vector(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest rows to one literal query vector (cosine).

    Single narrow pass over the corpus + a global top-k (Spark's
    TakeOrderedAndProject — no full sort, no shuffle of losers).
    """
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), query_literal(query_vec)), 6).alias(
            "sim"
        ),
    )
    return scored.orderBy(F.desc("sim"), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: for every query row, the k most-cosine-similar
    corpus rows. Queries are broadcast and scored map-side (JVM codegen);
    the per-query top-k is the declarative rank-filtered window.

    The scale worry — `row_number() OVER (PARTITION BY q_id)` funneling
    every scored corpus row into one reducer per query — is solved by
    Catalyst itself: the rank filter plans as a two-phase
    ``WindowGroupLimit``, whose *Partial* phase runs on the scan
    partitions BEFORE the exchange and forwards at most k rows per
    query per map task. The shuffle therefore carries at most
    k * |Q| * n_map_tasks rows — driver-trivial at any corpus size —
    with zero Python crossing (an earlier Arrow-batched partial top-k
    stage measured no faster and added a per-row Python/Arrow hop).
    tests/test_plan_shapes.py pins the Partial phase below the
    exchange."""
    from ..sources.batch import spread_compute

    q = F.broadcast(queries.select(query_id, query_vec))
    # the map-side cosine runs at the corpus' incoming partitioning —
    # spread a single-split fixture scan so the scoring pass doesn't
    # serialize on one core (no-op when the corpus already arrives
    # wide, e.g. any production-scale scan)
    corpus = spread_compute(corpus, corpus_id)
    scored = corpus.crossJoin(q).select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(
            cosine_similarity(F.col(corpus_vec), F.col(query_vec)), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "sim", "rank")
    )


def label_centroids(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Coarse-quantizer cells from the corpus's label column: per-label
    dimension-wise mean, returned as (cell, centroid array<float>).
    Swap the label for a k-means assignment (operators/kmeans.py) when
    no labeling exists."""
    return (
        corpus.select("label", F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("cval"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform(F.col("pairs"), lambda p: p.cval.cast("float")).alias(
                "centroid"
            ),
        )
    )


def _cell_scores(vec, cells: list[tuple[int, list[float]]]):
    """array<struct<sim,cell>> of the row vector scored against every
    centroid, as literal arithmetic. Centroids are pre-scaled by 1/|c|
    on the driver; the row's own norm is constant across candidates so
    cosine ranking reduces to one dot fold per cell — fully narrow,
    inside whole-stage codegen, zero shuffle."""
    scored = []
    for cell, c in sorted(cells, key=lambda t: t[0]):
        nrm = sum(float(x) * float(x) for x in c) ** 0.5 or 1.0
        lit = F.array(*[F.lit(float(x) / nrm) for x in c])
        scored.append(
            F.struct(dot(vec, lit).alias("sim"), F.lit(int(cell)).alias("cell"))
        )
    return F.array(*scored)


def ivf_assign(
    corpus: DataFrame,
    cells: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign_mode: str = "auto",
) -> DataFrame:
    """(id, vector, cell): nearest-centroid assignment as a narrow
    per-row argmax over literal centroids (the kmeans._nearest_cell
    pattern). The previous design — crossJoin(centroids) then
    row_number() OVER (PARTITION BY vec_id) — blew every corpus row up
    K-fold and shuffled the whole corpus to compute a per-row argmax;
    this plan has NO exchange at all (pinned by
    tests/test_plan_shapes.py). Ties break to the lowest cell id.

    assign_mode mirrors kmeans_assign's: beyond LITERAL_K_CEILING cells
    ('auto', or 'broadcast' explicitly) assignment routes through the
    Arrow-GEMM path (kmeans.assign_cells_broadcast) — same cosine
    ranking and tie order, plan size independent of the cell count.
    Cell ids must then be the contiguous 0..K-1 the literal path also
    assumes (both paths emit POSITIONS in the sorted cell list)."""
    from .kmeans import LITERAL_K_CEILING, assign_cells_broadcast

    ordered = sorted(cells, key=lambda t: t[0])
    if assign_mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown assign_mode {assign_mode!r}")
    if assign_mode == "broadcast" or (
        assign_mode == "auto" and len(ordered) > LITERAL_K_CEILING
    ):
        # positions in the GEMM matrix == positions in the sorted cell
        # list; map back to the caller's cell ids
        pos_to_cell = F.array(*[F.lit(int(c)) for c, _ in ordered])
        assigned = assign_cells_broadcast(
            corpus.select(id_col, vec_col),
            [c for _, c in ordered],
            vec_col=vec_col,
            out_col="_pos",
        )
        # explicit null guard: element_at(<literal array>, NULL) does
        # NOT return NULL on Spark 4.1 (observed: it yields the LAST
        # element), so an unguarded lookup would silently assign every
        # masked NULL/wrong-length row to the last cell
        return assigned.select(
            id_col,
            vec_col,
            F.when(
                F.col("_pos").isNotNull(),
                F.element_at(pos_to_cell, F.col("_pos") + 1),
            ).alias("cell"),
        )
    scored = _cell_scores(F.col(vec_col), cells)
    best = F.aggregate(
        scored,
        F.element_at(scored, 1),
        lambda acc, s: F.when(s.sim > acc.sim, s).otherwise(acc),
    )
    # NULL / wrong-length vectors get NULL cells (the shared broadcast-
    # path hygiene contract — kmeans._nearest_cell); unguarded, a null
    # sim fold would keep the initial accumulator and silently assign
    # the first cell
    dim = len(ordered[0][1])
    guarded = F.when(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim),
        best.cell,
    )
    return corpus.select(id_col, vec_col, guarded.alias("cell"))


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
) -> DataFrame:
    """IVF-pruned ANN: nearest-centroid cell assignment for the corpus,
    nprobe-nearest cells per query, exact scoring only inside probed
    cells, per-query top-k.

    The centroid table is driver-sized by construction (K cells x dim),
    so it is collected once ("train" step, exactly like kmeans init) and
    both the corpus assignment and the per-query probe lists are narrow
    literal-array computations — no crossJoin row blow-up, no corpus
    shuffle. At scale the assignment is precomputed and the corpus is
    stored partitioned/bucketed by cell, so a query batch scans
    nprobe/K of the data. Recall scales with nprobe — on data with no
    cluster structure it approaches the honest lower bound nprobe/K
    (tests/test_ann_recall.py pins the tradeoff)."""
    cells = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in label_centroids(corpus).collect()
    ]
    assigned = ivf_assign(corpus, cells)

    # Per-query probe list: sort the same literal score array, keep the
    # nprobe best cells (sim DESC, cell ASC) — narrow on the tiny query
    # side too; the subsequent explode is nprobe rows per query.
    scored = _cell_scores(F.col(query_vec), cells)
    cmp = lambda a, b: (  # noqa: E731
        F.when(a["sim"] > b["sim"], F.lit(-1))
        .when(a["sim"] < b["sim"], F.lit(1))
        .when(a["cell"] < b["cell"], F.lit(-1))
        .when(a["cell"] > b["cell"], F.lit(1))
        .otherwise(F.lit(0))
    )
    probes = queries.select(
        query_id,
        query_vec,
        F.explode(
            F.transform(
                F.slice(F.array_sort(scored, cmp), 1, nprobe), lambda s: s["cell"]
            )
        ).alias("cell"),
    )

    w_rank = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col("vec_id"))
    return (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col(query_id))
        .select(
            query_id,
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), F.col(query_vec)), 6
            ).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )


def pack_sign_words_arrow(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    word_bits: int = 32,
) -> DataFrame:
    """Binary (sign-bit) quantization at PRODUCTION width: pack each
    vector's sign pattern into ``ceil(dim/word_bits)`` non-negative
    BIGINT words, as one vectorized numpy pass per Arrow batch.

    WHY this exists next to functions/vector.pack_sign_bits: the pure
    codegen flat-sum pack is the right call at catalog width (64 dims =
    two words, zero Python in the plan), but at Titan width (1024 dims,
    KDS-P/index-creation-function/lambda_function.py:66-70) the 1024
    CASE terms exceed janino's method limits — whole-stage codegen
    FAILS COMPILE and Spark silently falls back to interpreted
    evaluation, ~24 s for a 20k-row pack where this path takes well
    under a second (measured; the s23_stress bench row prices both).
    Same auto-switch philosophy as kmeans' literal-vs-GEMM assignment:
    stay expression-native while the expression is small, cross to
    Arrow-batched numpy when width would break codegen. Bit layout is
    IDENTICAL to pack_sign_bits (bit d-within-word set when
    vec[d] > 0), asserted equal in tests/test_binary_ann.py.

    Output: (id_col, words array<bigint>). NULL/wrong-length vectors
    pack to a NULL words array (the pack_sign_bits null contract).
    Hamming over the array form stays fully codegen:
    ``aggregate(zip_with(a, b, (x, y) -> bit_count(x ^ y)), 0, +)`` —
    a ceil(dim/32)-element fold, independent of dim's CASE blowup.
    """
    import math

    import numpy as np
    import pandas as pd

    if dim is None:
        raise ValueError("dim is required (wrong-length rows pack to NULL)")
    n_words = math.ceil(dim / word_bits)
    weights = (1 << np.arange(word_bits, dtype=np.int64))

    def pack(batches):
        for pdf in batches:
            vals = pdf[vec_col]
            valid = vals.map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy(dtype=bool)
            out: list = [None] * len(pdf)
            if valid.any():
                # one vectorized pass over every valid row of the batch:
                # (k, dim) sign matrix -> zero-padded (k, n_words, bits)
                # -> one matmul against the bit weights
                M = np.stack(vals[valid].to_numpy()).astype(np.float64) > 0
                padded = np.zeros((M.shape[0], n_words * word_bits), dtype=bool)
                padded[:, :dim] = M
                words = (
                    padded.reshape(-1, n_words, word_bits) @ weights
                ).astype(np.int64)
                wlist = words.tolist()
                j = 0
                for i, ok in enumerate(valid):
                    if ok:
                        out[i] = wlist[j]
                        j += 1
            yield pd.DataFrame({id_col: pdf[id_col], "words": out})

    return df.select(id_col, vec_col).mapInPandas(
        pack, f"{id_col} long, words array<bigint>"
    )


def hamming_words(a, b):
    """Hamming distance between two packed sign-word arrays — a
    word-count-sized codegen fold (bit_count over xor), never a
    per-dimension expression."""
    from pyspark.sql import functions as F

    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation (recall@k / MRR / nDCG@k)
# ---------------------------------------------------------------------------

def ndcg_weights(k: int, scale: int = 1_000_000) -> list[int]:
    """Position weights for binary-gain DCG@k as SCALED INTEGERS:
    ``w[p] = round(scale / log2(p + 1))`` for 1-based rank p. Summing
    integers instead of ``1/log2`` doubles makes the per-query DCG
    order-independent and bit-exact across engines (the t24 exact-
    arithmetic discipline); the only float op left in nDCG is the final
    single division, which both engines perform identically."""
    import math

    return [round(scale / math.log2(p + 1)) for p in range(1, k + 1)]


def retrieval_eval(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    query_label: str = "q_label",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    corpus_label: str = "label",
) -> DataFrame:
    """Per-query retrieval-quality metrics for exact cosine top-k
    against label ground truth: a corpus item is *relevant* to a query
    iff it carries the query's label. Returns one row per query:
    ``(q_id, q_label, n_rel, hits_at_k, recall_at_k, mrr, ndcg_at_k)``.

    The offline eval harness for the retrieval surface the reference
    delegates to OpenSearch k-NN (the HNSW index created by
    ``KDS-P/index-creation-function/lambda_function.py:66-97`` serves
    the RAG queries; this measures whether what it returns is RIGHT).

    Shape (one corpus pass, everything JVM-side):
    - queries are broadcast; cosine is scored map-side and the per-query
      top-k is the rank-filtered window, which plans as a two-phase
      ``WindowGroupLimit`` — at most k rows per query per map task reach
      the exchange, so the shuffle is |Q|*k-sized at any corpus size;
    - the corpus label is carried THROUGH the score/rank pass, so no
      second corpus join is needed to mark hits;
    - ``n_rel`` (per-label corpus count) is a combinable group-count
      aggregate of label-cardinality size, broadcast back;
    - recall@k divides by ``min(n_rel, k)`` (standard capped recall);
      MRR is ``1/first_hit_rank`` (0 when no hit); DCG sums the
      ``ndcg_weights`` integers at hit ranks and nDCG divides by the
      ideal prefix sum — hits/DCG/IDCG are exact integers, each metric
      is ONE final float division rounded to 6 dp.

    Ranking ties are broken on ``ROUND(sim, 6)`` then corpus id — the
    s02 cross-engine-stable ordering."""
    from ..sources.batch import spread_compute

    q = F.broadcast(queries.select(query_id, query_vec, query_label))
    # the map-side cosine is the pass's whole cost and runs at the
    # corpus' incoming partitioning — spread a single-split fixture
    # scan so it doesn't serialize on one core (no-op when the corpus
    # already arrives wide, e.g. any production-scale scan)
    corpus = spread_compute(corpus, corpus_id)
    scored = corpus.crossJoin(q).select(
        F.col(query_id),
        F.col(query_label),
        F.col(corpus_id),
        F.col(corpus_label),
        F.round(
            cosine_similarity(F.col(corpus_vec), F.col(query_vec)), 6
        ).alias("sim"),
    )
    win = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    ranked = (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
    )
    return eval_ranked(
        ranked,
        corpus,
        k=k,
        query_id=query_id,
        query_label=query_label,
        corpus_label=corpus_label,
    )


def eval_ranked(
    ranked: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    query_label: str = "q_label",
    corpus_label: str = "label",
    rank_col: str = "rnk",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Grade an ALREADY-RANKED candidate list: ``ranked`` carries one
    row per retrieved item ``(query_id, query_label, corpus_label,
    rank_col in 1..k)`` from ANY ranker — exact cosine
    (``retrieval_eval``), the Hamming-shortlist ANN (s23/s27), PCA
    coarse (s22), or a future hybrid — and the metrics (recall@k
    against ``min(n_rel, k)``, MRR, binary-gain nDCG@k with
    exact-integer DCG/IDCG) come out of the SAME arithmetic, so an
    approximate index's quality drop is measured by construction
    rather than re-derived per ranker. ``corpus`` supplies the ground
    truth: a corpus item is relevant iff it carries the query's label,
    and ``n_rel`` is its per-label group count (label-cardinality
    sized, broadcast back). Aggregation shape: one group-by over the
    <= |Q|*k ranked rows; every metric is exact-integer until a final
    float division (the t24/s25 discipline).

    A query contributing ZERO rows to ``ranked`` (an empty shortlist —
    possible under a filtered or hybrid ranker) produces no metrics
    row unless the ``queries`` universe ``(query_id, query_label)`` is
    passed, in which case it is left-joined in and graded as all-zero
    metrics. Current exact/ANN callers rank >= 1 row per query by
    construction and may omit it; ANY ranker whose shortlist can come
    up empty must pass ``queries`` or silently lose those rows."""
    w_dcg = ndcg_weights(k)
    idcg_prefix = [0]
    for w in w_dcg:
        idcg_prefix.append(idcg_prefix[-1] + w)

    hit = F.col(corpus_label) == F.col(query_label)
    per_q = ranked.filter(F.col(rank_col) <= k).withColumnRenamed(
        rank_col, "rnk"
    ).groupBy(query_id, query_label).agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("hits_at_k"),
        F.min(F.when(hit, F.col("rnk"))).alias("first_hit"),
        F.sum(
            F.when(hit, F.element_at(F.lit(w_dcg), F.col("rnk"))).otherwise(0)
        )
        .cast("bigint")
        .alias("dcg_scaled"),
    )
    if queries is not None:
        # no broadcast hint: the row-preserved side of a left-outer
        # join can't be the hash build side, so a hint on `universe`
        # would be silently ignored; both sides are |Q|-sized anyway
        universe = queries.select(query_id, query_label).distinct()
        per_q = (
            universe.join(per_q, [query_id, query_label], "left")
            .withColumn(
                "hits_at_k", F.coalesce("hits_at_k", F.lit(0).cast("bigint"))
            )
            .withColumn(
                "dcg_scaled",
                F.coalesce("dcg_scaled", F.lit(0).cast("bigint")),
            )
        )
    n_rel = F.broadcast(
        corpus.groupBy(F.col(corpus_label).alias("_rel_label")).agg(
            F.count(F.lit(1)).alias("n_rel")
        )
    )
    ideal = F.least(F.col("n_rel"), F.lit(k).cast("bigint"))
    idcg = F.element_at(F.lit(idcg_prefix), (ideal + 1).cast("int"))
    return (
        per_q.join(n_rel, F.col(query_label) == F.col("_rel_label"), "left")
        .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0).cast("bigint")))
        .select(
            query_id,
            query_label,
            "n_rel",
            "hits_at_k",
            F.when(
                ideal > 0,
                F.round(F.col("hits_at_k").cast("double") / ideal, 6),
            )
            .otherwise(0.0)
            .alias("recall_at_k"),
            F.coalesce(
                F.round(F.lit(1.0) / F.col("first_hit"), 6), F.lit(0.0)
            ).alias("mrr"),
            F.when(
                ideal > 0,
                F.round(F.col("dcg_scaled").cast("double") / idcg, 6),
            )
            .otherwise(0.0)
            .alias("ndcg_at_k"),
        )
    )


def maxsim_scores(
    corpus: DataFrame, tokens: DataFrame, doc_col: str = "doc_label"
) -> DataFrame:
    """Late-interaction MaxSim scoring (ColBERT, Khattab & Zaharia
    2020): score(q, d) = sum over q's token vectors of max over d's
    vectors of cosine. ``corpus`` carries (doc_col, embedding);
    ``tokens`` carries (q_id, tok_id, q_vec) and is broadcast (query
    token sets are driver-sized by construction). Returns one row per
    (q_id, doc) with ``maxsim_scaled`` — the score as an EXACT BIGINT
    (each cosine rounded half-away-from-zero at 1e-6 and scaled, the
    t24/s25 integer discipline), so the sum is aggregation-order
    independent and the result hash-stable across engines. The first
    aggregate is a map-side-combinable MAX keyed (q, doc, token):
    post-combine cardinality is independent of per-doc vector counts,
    so the shuffle never carries corpus-proportional rows. Shared by
    the s26 catalog entry, its bench stress pair, and the dense-numpy
    reference pin in tests/test_maxsim.py — one copy of the algebra."""
    sim6 = F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6)
    tok_sim = F.round(sim6 * F.lit(1_000_000.0)).cast("long")
    return (
        corpus.crossJoin(F.broadcast(tokens))
        .select("q_id", doc_col, "tok_id", tok_sim.alias("tok_sim"))
        .groupBy("q_id", doc_col, "tok_id")
        .agg(F.max("tok_sim").alias("tok_sim"))
        .groupBy("q_id", doc_col)
        .agg(F.sum("tok_sim").cast("long").alias("maxsim_scaled"))
    )

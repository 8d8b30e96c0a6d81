"""Corpus-curation operators: rule filters, repetition, decontamination.

The reference's only curation step is the empty-text filter
(``KDS-P/.../msf/DataStreamJob.java:146``). These entries extend the
engine's training-data-pipeline surface with the standard pre-training
curation passes (C4/Gopher-style rule filters, repetition signals,
benchmark decontamination), all built scale-first:

- every per-document feature is a Catalyst array/regexp expression —
  whole-stage codegen, zero Python, zero shuffle;
- corpus-level passes shuffle only (gram -> count) pairs, never
  document text, and aggregate before joining back (the shuffled key
  is a short shingle string, independent of document size);
- decontamination broadcasts the eval-set gram dictionary — eval
  benchmarks are tiny next to a 100 TB corpus, so the corpus side
  never moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalized_text, token_count
from ..sources.batch import load_table
from .llmops import _SQL_NORM, _SQL_TRIGRAMS, _trigrams
from .registry import query


def _raw_trigrams(tokens: Column) -> Column:
    """Token 3-grams WITH multiplicity (the repetition signal needs
    duplicate shingles; _trigrams dedups for set-similarity). Same
    zip_with-over-shifted-slices single pass as _trigrams."""
    n = F.size(tokens)
    pairs = F.zip_with(
        F.slice(tokens, 2, n - 2),
        F.slice(tokens, 3, n - 2),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n < 3, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.slice(tokens, 1, n - 2),
            pairs,
            lambda a, bc: F.concat_ws(" ", a, bc),
        )
    )


# DuckDB twin of _raw_trigrams (=_SQL_TRIGRAMS without list_distinct).
_SQL_TRIGRAMS_RAW = """
CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
     ELSE list_transform(generate_series(1, len(toks)-2),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) END
"""


@query(
    "t09_curation_rules",
    oracle=f"""
WITH feat AS (
  SELECT doc_id,
    CASE WHEN {_SQL_NORM} = '' THEN 0
         ELSE len(regexp_split_to_array({_SQL_NORM}, '\\s+')) END AS n_tok,
    length(replace({_SQL_NORM}, ' ', '')) AS n_chars,
    length(regexp_replace({_SQL_NORM}, '[^\\p{{L}}]', '', 'g')) AS n_alpha
  FROM documents
), scored AS (
  SELECT doc_id, n_tok,
    CASE WHEN n_tok > 0 THEN CAST(n_chars AS DOUBLE) / n_tok ELSE 0.0 END AS mean_tok_len,
    CASE WHEN n_chars > 0 THEN CAST(n_alpha AS DOUBLE) / n_chars ELSE 0.0 END AS alpha_ratio
  FROM feat
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
  ROUND(mean_tok_len, 6) AS mean_tok_len,
  ROUND(alpha_ratio, 6) AS alpha_ratio,
  CASE WHEN n_tok = 0 THEN 'empty'
       WHEN n_tok < 5 THEN 'too_short'
       WHEN n_tok > 5000 THEN 'too_long'
       WHEN mean_tok_len < 2.0 OR mean_tok_len > 12.0 THEN 'word_length'
       WHEN alpha_ratio < 0.6 THEN 'low_alpha'
       ELSE 'ok' END AS reason,
  (CASE WHEN n_tok = 0 THEN 'empty'
        WHEN n_tok < 5 THEN 'too_short'
        WHEN n_tok > 5000 THEN 'too_long'
        WHEN mean_tok_len < 2.0 OR mean_tok_len > 12.0 THEN 'word_length'
        WHEN alpha_ratio < 0.6 THEN 'low_alpha'
        ELSE 'ok' END) = 'ok' AS keep
FROM scored
""",
    tags=("text", "quality", "curation"),
)
def t09_curation_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule filter: hard keep/drop per document with a
    first-failing-rule reason code (empty / token-count bounds / mean
    word length / alphabetic ratio). All features are per-row regexp +
    arithmetic expressions — the filter runs inside the scan's codegen
    stage with no shuffle, exactly how a 100 TB curation pass should."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalized_text(F.col("text"))
    n_tok = token_count(F.col("text"))
    n_chars = F.length(F.replace(norm, F.lit(" "), F.lit("")))
    n_alpha = F.length(F.regexp_replace(norm, r"[^\p{L}]", ""))
    mean_len = F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(
        F.lit(0.0)
    )
    alpha_ratio = F.when(
        n_chars > 0, n_alpha.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    reason = (
        F.when(n_tok == 0, F.lit("empty"))
        .when(n_tok < 5, F.lit("too_short"))
        .when(n_tok > 5000, F.lit("too_long"))
        .when((mean_len < 2.0) | (mean_len > 12.0), F.lit("word_length"))
        .when(alpha_ratio < 0.6, F.lit("low_alpha"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tok"),
        F.round(mean_len, 6).alias("mean_tok_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


@query(
    "t10_repetition_stats",
    oracle=f"""
WITH shingled AS (
  SELECT doc_id, {_SQL_TRIGRAMS_RAW.strip()} AS grams
  FROM (SELECT doc_id, regexp_split_to_array({_SQL_NORM}, '\\s+') AS toks
        FROM documents)
)
SELECT doc_id,
  CAST(len(grams) AS BIGINT) AS n_grams,
  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
  ROUND(CASE WHEN len(grams) = 0 THEN 0.0
        ELSE CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
             / len(grams) END, 6) AS dup_frac
FROM shingled
""",
    tags=("text", "quality", "curation", "dedup"),
)
def t10_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher repetition signal): fraction
    of token 3-grams that are repeats of an earlier 3-gram in the same
    document. Pure per-row array expressions — no explode, no shuffle;
    boilerplate/spam detection at scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(normalized_text(F.col("text")), r"\s+")
    grams = _raw_trigrams(toks)
    n = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_grams"),
        n_distinct.cast("bigint").alias("n_distinct_grams"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(
                (n - n_distinct).cast("double") / n
            ),
            6,
        ).alias("dup_frac"),
    )


_SQL_SHINGLED_DISTINCT = f"""
WITH shingled AS (
  SELECT doc_id, {_SQL_TRIGRAMS.strip()} AS grams
  FROM (SELECT doc_id, regexp_split_to_array({_SQL_NORM}, '\\s+') AS toks
        FROM documents)
),
exploded AS (SELECT doc_id, unnest(grams) AS gram FROM shingled)
"""


@query(
    "d11_repeated_ngrams",
    oracle=f"""
{_SQL_SHINGLED_DISTINCT}
, gc AS (SELECT gram, COUNT(*) AS n_docs FROM exploded GROUP BY gram),
shared AS (
  SELECT e.doc_id, COUNT(*) AS n_shared
  FROM exploded e JOIN gc USING (gram)
  WHERE gc.n_docs > 1 GROUP BY e.doc_id
)
SELECT s.doc_id,
  CAST(len(s.grams) AS BIGINT) AS n_grams,
  CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
  ROUND(CASE WHEN len(s.grams) = 0 THEN 0.0
        ELSE CAST(COALESCE(sh.n_shared, 0) AS DOUBLE) / len(s.grams)
        END, 6) AS shared_frac
FROM shingled s LEFT JOIN shared sh USING (doc_id)
""",
    tags=("dedup", "text", "curation"),
    bench=True,
)
def d11_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-n-gram signal (the shuffle-friendly
    approximation of exact substring dedup): per document, the fraction
    of its distinct 3-gram shingles that also occur in some other
    document. The corpus pass shuffles only (gram, count) pairs —
    aggregate-then-join-back, never document text — so the shuffled
    bytes scale with shingle vocabulary, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    # Shingling is CPU-bound and the fixture is one parquet file —
    # spread rows across cores first (same rationale as _minhash_docs).
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = F.split(normalized_text(F.col("text")), r"\s+")
    shingled = docs.select("doc_id", _trigrams(toks).alias("grams"))
    exploded = shingled.select("doc_id", F.explode("grams").alias("gram"))
    gram_counts = exploded.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    shared = (
        exploded.join(gram_counts, "gram")
        .filter(F.col("n_docs") > 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    n_grams = F.size("grams")
    n_shared = F.coalesce(F.col("n_shared"), F.lit(0))
    return (
        shingled.join(shared, "doc_id", "left")
        .select(
            "doc_id",
            n_grams.cast("bigint").alias("n_grams"),
            n_shared.cast("bigint").alias("n_shared"),
            F.round(
                F.when(n_grams == 0, F.lit(0.0)).otherwise(
                    n_shared.cast("double") / n_grams
                ),
                6,
            ).alias("shared_frac"),
        )
    )


# Deterministic stand-in for a held-out eval benchmark: every 50th doc.
_EVAL_MOD = 50


@query(
    "d12_decontamination",
    oracle=f"""
{_SQL_SHINGLED_DISTINCT}
, eval_grams AS (
  SELECT DISTINCT gram FROM exploded WHERE doc_id % {_EVAL_MOD} = 0
),
hits AS (
  SELECT e.doc_id, COUNT(*) AS n_eval_shared
  FROM exploded e JOIN eval_grams USING (gram)
  WHERE e.doc_id % {_EVAL_MOD} != 0
  GROUP BY e.doc_id
)
SELECT s.doc_id,
  CAST(len(s.grams) AS BIGINT) AS n_grams,
  CAST(COALESCE(h.n_eval_shared, 0) AS BIGINT) AS n_eval_shared,
  COALESCE(h.n_eval_shared, 0) >= 3 AS contaminated
FROM shingled s LEFT JOIN hits h USING (doc_id)
WHERE s.doc_id % {_EVAL_MOD} != 0
""",
    tags=("dedup", "text", "curation"),
)
def d12_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing >= 3
    distinct 3-gram shingles with a held-out eval set (deterministic
    stand-in: every 50th doc_id). The eval gram dictionary is collapsed
    to DISTINCT grams and BROADCAST — a real benchmark is a few MB
    against a 100 TB corpus, so the corpus side joins map-side and
    never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = F.split(normalized_text(F.col("text")), r"\s+")
    shingled = docs.select("doc_id", _trigrams(toks).alias("grams"))
    exploded = shingled.select("doc_id", F.explode("grams").alias("gram"))
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = exploded.filter(is_eval).select("gram").distinct()
    hits = (
        exploded.filter(~is_eval)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_eval_shared"))
    )
    n_shared = F.coalesce(F.col("n_eval_shared"), F.lit(0))
    return (
        shingled.filter(~is_eval)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.size("grams").cast("bigint").alias("n_grams"),
            n_shared.cast("bigint").alias("n_eval_shared"),
            (n_shared >= 3).alias("contaminated"),
        )
    )


@query(
    "t12_vocab_heavy_hitters",
    oracle=f"""
WITH exploded AS (
  SELECT doc_id, unnest(regexp_split_to_array({_SQL_NORM}, '\\s+')) AS token
  FROM documents
  WHERE {_SQL_NORM} != ''
)
SELECT token,
  CAST(COUNT(*) AS BIGINT) AS tf,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM exploded GROUP BY token
ORDER BY tf DESC, token LIMIT 30
""",
    tags=("text", "curation", "vocab"),
)
def t12_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: top-30 tokens by total term
    frequency with document frequency — the corpus statistic behind
    tokenizer training and stopword lists. Shuffle carries only
    (token, partial-count) pairs after map-side combine — bytes scale
    with vocabulary, not corpus size; top-30 is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    # Filter on the CHEAP equivalent predicate (trim, no regex) so
    # Catalyst pushing it below the repartition exchange costs nothing;
    # normalization+explode then run once, parallelized.
    docs = docs.filter(F.trim(F.col("text")) != "").repartition(
        spark.sparkContext.defaultParallelism
    )
    norm = normalized_text(F.col("text"))
    exploded = docs.select(
        "doc_id", F.explode(F.split(norm, r"\s+")).alias("token")
    )
    return (
        exploded.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(30)
    )


_MG_CAPACITY = 256  # counters per partition summary (Misra-Gries bound)
_MG_CANDIDATES = 60  # candidate pool re-counted exactly (2x the top-30)


@query(
    "t20_heavy_hitter_sketch",
    oracle=f"""
WITH exploded AS (
  SELECT doc_id, unnest(regexp_split_to_array({_SQL_NORM}, '\\s+')) AS token
  FROM documents
  WHERE {_SQL_NORM} != ''
)
SELECT token,
  CAST(COUNT(*) AS BIGINT) AS tf,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM exploded GROUP BY token
ORDER BY tf DESC, token LIMIT 30
""",
    tags=("text", "curation", "vocab", "sketch"),
    bench=True,
)
def t20_heavy_hitter_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t12's heavy hitters by SKETCH-then-VERIFY — the shape that holds
    when the vocabulary itself no longer fits a shuffle. Pass 1: each
    input partition folds its token stream into a Misra-Gries summary
    of at most _MG_CAPACITY counters (exact local counts truncated at
    the (cap+1)-th largest; the subtraction is the MG decrement run in
    one vectorized step). Summaries are tiny (cap rows/partition),
    merge by addition, and carry the guarantee that any token with
    global tf > N/cap survives. Pass 2: the top candidates by summed
    lower bound are broadcast back and re-counted EXACTLY, so the
    emitted top-30 has true tf/df — candidate generation + exact
    verify, the same two-stage contract as the LSH dedup chain.

    Shuffle accounting vs t12: t12 shuffles (token, partial-count) for
    the whole vocabulary; here the only vocabulary-wide movement is
    cap-bounded summaries, then one broadcast semi-join re-scan. The
    oracle is the exact top-30 — valid whenever the candidate pool
    covers the true top-30 (guaranteed at tf > N/cap; pinned on an
    adversarial fixture in tests/test_heavy_hitter_sketch.py)."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    norm = normalized_text(F.col("text"))
    exploded = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id", F.explode(F.split(norm, r"\s+")).alias("token")
    )

    def _prune(counts, cap):
        """Misra-Gries decrement in one vectorized step: subtract the
        (cap+1)-th largest count from everything, drop non-positives.
        Leaves <= cap counters; each surviving value is a lower bound
        whose total error stays <= N_partition/cap even across repeated
        prunes (the classical merged-summary bound)."""
        items = counts.most_common()
        if len(items) <= cap:
            return counts
        thresh = items[cap][1]
        from collections import Counter

        return Counter(
            {t: c - thresh for t, c in items[:cap] if c > thresh}
        )

    def summarize(batches):
        from collections import Counter

        # Working state is BOUNDED at 8x capacity: exact counts are
        # accumulated per Arrow batch, and whenever the counter spills
        # past the bound it is pruned back to capacity with the MG
        # decrement — so worker memory is O(capacity), independent of
        # the partition's vocabulary, which is the whole point of the
        # sketch at 100 TB.
        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf["token"].value_counts().to_dict())
            if len(counts) > 8 * _MG_CAPACITY:
                counts = _prune(counts, _MG_CAPACITY)
        counts = _prune(counts, _MG_CAPACITY)
        if not counts:
            return
        yield pd.DataFrame(
            list(counts.items()), columns=["token", "lb"]
        )

    summaries = exploded.select("token").mapInPandas(
        summarize, "token string, lb long"
    )
    cand = (
        summaries.groupBy("token")
        .agg(F.sum("lb").alias("lb_sum"))
        .orderBy(F.desc("lb_sum"), "token")
        .limit(_MG_CANDIDATES)
        .select("token")
    )
    return (
        exploded.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(30)
    )


_PACK_BUDGET = 256  # tokens per packed training sequence


@query(
    "t13_sequence_packing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
    CASE WHEN {_SQL_NORM} = '' THEN 0
         ELSE len(regexp_split_to_array({_SQL_NORM}, '\\s+')) END AS n_tok
  FROM documents
)
SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
  CAST(FLOOR(CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS DOUBLE)
       / {_PACK_BUDGET}) AS BIGINT) AS bin
FROM toks
""",
    tags=("text", "curation", "packing"),
)
def t13_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for training: within each source shard,
    documents (in doc_id order) are assigned to fixed-token-budget bins
    by running cumulative token count — the standard pack-per-worker
    layout step before writing training shards. The window partitions
    by source, so at 100 TB each shard packs independently with one
    hash shuffle on the shard key and no global ordering anywhere."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tok = token_count(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return (
        docs.select("doc_id", "source", n_tok.cast("bigint").alias("n_tok"))
        .select(
            "doc_id",
            "source",
            "n_tok",
            F.floor((cum - F.col("n_tok")).cast("double") / _PACK_BUDGET)
            .cast("bigint")
            .alias("bin"),
        )
    )


_N_SHARDS = 8


@query(
    "d13_training_shards",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key
  FROM documents
), sharded AS (
  SELECT doc_id, shuffle_key,
    CAST(('0x' || substr(shuffle_key, 1, 8)) AS BIGINT) % {_N_SHARDS} AS shard
  FROM keyed
)
SELECT doc_id, shard,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY shard ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
FROM sharded
""",
    tags=("curation", "sampling", "packing"),
)
def d13_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into training shards: each
    document gets a seeded md5 shuffle key; the shard is a hash of that
    key mod N and the within-shard position is rank by key. This is the
    shuffle-before-writing-training-files step, made reproducible (same
    seed -> same layout on any engine). Scale shape: one hash shuffle
    on the shard id, per-shard local sort — there is NO global ordering
    anywhere, so shards write independently on 1000 executors."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42")))
    keyed = docs.select("doc_id", key.alias("shuffle_key"))
    # DuckDB's hash() differs from Spark's; both sides re-hash the md5
    # HEX STRING with their own integer hash only to pick a shard, so
    # parity requires a shared definition: use the md5 hex's first 8
    # hex chars as an integer — identical, engine-portable arithmetic.
    shard = (F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("bigint")
             % _N_SHARDS)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.select("doc_id", "shuffle_key", shard.alias("shard"))
        .select(
            "doc_id",
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


_SOURCE_CAP = 10


@query(
    "t14_source_caps",
    bench=True,
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS ord FROM documents
)
SELECT doc_id, source, CAST(rn AS BIGINT) AS pick FROM (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY ord, doc_id) AS rn
  FROM keyed
) WHERE rn <= {_SOURCE_CAP}
""",
    tags=("curation", "sampling"),
)
def t14_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus cap: keep at most N documents per source, the
    first N under a deterministic seeded-hash order (so the kept subset
    is reproducible on any engine, like d07's hash sample). This is the
    down-sample-over-represented-domains pass of a crawl curation
    pipeline — web corpora are Zipf-distributed, so a handful of
    sources dominate raw counts.

    Scale shape: operators/caps.py cap_per_key — a per-partition
    Arrow-batched bounded head BEFORE the exact per-source window, so
    the shuffle carries at most N * n_batches rows per source instead
    of the source's full row count (a >10%-of-corpus domain would
    otherwise be a single hot reducer partition)."""
    from ..operators.caps import cap_per_key

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("ord")
    )
    return cap_per_key(
        keyed, key_col="source", order_col="ord", tiebreak_col="doc_id", n=_SOURCE_CAP
    ).select("doc_id", "source", "pick")


@query(
    "t15_bigram_lm_quality",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i.x] AS w1, t[i.x + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS i(x)
  WHERE len(t) >= 2
),
bgc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(c) AS cw FROM bgc GROUP BY 1),
probs AS (
  SELECT b.w1, b.w2, LN(CAST(b.c AS DOUBLE) / x.cw) AS lp
  FROM bgc b JOIN ctx x ON b.w1 = x.w1
)
SELECT g.doc_id, ROUND(AVG(p.lp), 6) AS avg_logprob,
       COUNT(*) AS n_bigrams
FROM bg g JOIN probs p ON g.w1 = p.w1 AND g.w2 = p.w2
GROUP BY 1
""",
    tags=("curation", "quality", "language-model"),
    bench=True,
)
def t15_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score (the CCNet-style LM filter,
    self-trained): fit bigram MLE probabilities on the corpus itself in
    one pass, then score each document by its average bigram
    log-probability — low scores flag boilerplate/gibberish for
    removal, high scores flag natural running text.

    Scale shape: bigrams come from a codegen'd transform over the token
    array (no posexplode self-join); the model is two hash aggregations
    keyed by vocabulary (map-side partials make the shuffle vocabulary-
    sized, not corpus-sized); scoring is one shuffle join on the bigram
    key. Nothing driver-sized, no Python anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    tok_docs = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    bg = tok_docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = bgc.groupBy("w1").agg(F.sum("c").alias("cw"))
    probs = bgc.join(ctx, "w1").select(
        "w1", "w2", F.log(F.col("c").cast("double") / F.col("cw")).alias("lp")
    )
    return (
        bg.join(probs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


@query(
    "t16_source_datacard",
    oracle="""
SELECT source,
  COUNT(*) AS n_docs,
  COUNT(DISTINCT lang) AS n_langs,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
  ROUND(AVG(CASE WHEN text IS NULL THEN 0
       ELSE len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
       END), 6) AS avg_bpe_tokens,
  ROUND(1.0 - CAST(COUNT(DISTINCT md5(trim(regexp_replace(lower(text),
              '\\s+', ' ', 'g')))) AS DOUBLE) / COUNT(*), 6) AS dup_ratio
FROM documents
GROUP BY source
""",
    tags=("curation", "reporting"),
)
def t16_source_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the summary block a training-data
    release ships per subset — document count, language spread, byte
    volume, token volume, and exact duplicate ratio (1 - distinct
    normalized fingerprints / docs). One hash aggregation keyed by
    source; the two COUNT(DISTINCT)s expand to Spark's standard
    two-phase distinct-aggregate expansion, still map-side partial,
    and the fingerprint is the same md5(normalized text) every dedup
    entry uses, so the card's dup_ratio reconciles with d01 exactly."""
    from ..functions.text import bpe_token_count, doc_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(bpe_token_count(F.col("text"))), 6).alias(
            "avg_bpe_tokens"
        ),
        F.round(
            F.lit(1.0)
            - F.countDistinct(doc_fingerprint(F.col("text"))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_ratio"),
    )


@query(
    "t17_dsir_weights",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
raw AS (SELECT w, COUNT(*) AS cr FROM tok GROUP BY 1),
tgt AS (SELECT w, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY 1),
tot AS (SELECT (SELECT COUNT(*) FROM tok) AS nr,
               (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS nt,
               (SELECT COUNT(*) FROM raw) AS v),
ratio AS (
  SELECT r.w,
    LN((COALESCE(t.ct, 0) + 1.0) / (tot.nt + tot.v))
    - LN((r.cr + 1.0) / (tot.nr + tot.v)) AS lr
  FROM raw r LEFT JOIN tgt t ON t.w = r.w, tot
)
SELECT k.doc_id, ROUND(AVG(x.lr), 6) AS dsir_logweight,
       COUNT(*) AS n_tokens
FROM tok k JOIN ratio x ON x.w = k.w
GROUP BY 1
""",
    tags=("curation", "sampling", "importance-weighting"),
    bench=True,
)
def t17_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    weights: per-document average log importance ratio between a target
    distribution (here the 'en' subset standing in for a high-quality
    reference corpus) and the raw corpus, under add-one-smoothed
    unigram feature models. Documents scoring high look like the
    target; resampling by exp(weight) shifts the corpus mixture toward
    it without hard filters.

    Scale shape: identical to t15 — token occurrences from one codegen
    regexp pass; the two feature models are vocabulary-keyed hash
    aggregations (map-side partials, vocabulary-sized shuffle); the
    corpus totals collapse to ONE broadcast row; scoring is one join
    on the token key. No Python, nothing driver-sized but 3 scalars."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    raw = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = tok.agg(
        F.count(F.lit(1)).alias("nr"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("nt"),
        F.countDistinct("w").alias("v"),
    )
    ratio = (
        raw.join(tgt, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "w",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("nt") + F.col("v"))
                )
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.col("v")))
            ).alias("lr"),
        )
    )
    return (
        tok.join(ratio, "w")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("lr"), 6).alias("dsir_logweight"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


@query(
    "t18_zipf_vocabulary",
    oracle="""
WITH tok AS (
  SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
),
vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY 1),
head AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rank
  FROM (SELECT * FROM vocab ORDER BY cnt DESC, w LIMIT 1000)
)
SELECT (SELECT COUNT(*) FROM vocab) AS n_vocab,
       COUNT(*) AS n_head,
       ROUND(regr_slope(ln(cnt), ln(rank)), 6) AS zipf_slope,
       ROUND(regr_r2(ln(cnt), ln(rank)), 6) AS zipf_r2
FROM head
""",
    tags=("curation", "vocabulary", "zipf"),
    bench=True,
)
def t18_zipf_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Zipf diagnostics: fit log(frequency) ~ log(rank) over
    the head of the rank-frequency curve (top 1000 tokens) and report
    the slope and fit quality. Natural corpora sit near slope -1 with
    r² > 0.95; templated/spam-heavy or synthetic corpora deviate — a
    one-row corpus health check a curation pipeline runs per snapshot.

    Scale shape: token counts are a vocabulary-keyed hash aggregation
    (map-side partials, vocabulary-sized shuffle — never corpus-sized);
    the head selection is ORDER BY + LIMIT, which Catalyst executes as
    TakeOrderedAndProject (per-partition partial top-k, no global
    sort); ranking and the regression then run on <= 1000 rows. The
    slope is covar_pop/var_pop — the same estimator DuckDB's
    regr_slope uses — so the oracle hash-matches at 6 dp."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w")
    )
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    head = vocab.orderBy(F.desc("cnt"), F.asc("w")).limit(1000)
    ranked = head.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("w"))),
    ).select(F.log("cnt").alias("y"), F.log("rank").alias("x"))
    fit = ranked.agg(
        F.count(F.lit(1)).alias("n_head"),
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("zipf_slope"),
        F.round(F.pow(F.corr("x", "y"), 2), 6).alias("zipf_r2"),
    )
    n_vocab = vocab.agg(F.count(F.lit(1)).alias("n_vocab"))
    return (
        fit.crossJoin(F.broadcast(n_vocab))
        .select("n_vocab", "n_head", "zipf_slope", "zipf_r2")
    )


@query(
    "t21_mixture_allocation",
    oracle=f"""
WITH per_source AS (
  SELECT source,
    CAST(SUM(CASE WHEN trim(text) = '' OR text IS NULL THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT)
      AS toks
  FROM documents GROUP BY source
), with_budget AS (
  SELECT source, toks,
    (SELECT SUM(toks) FROM per_source) // 2 AS budget,
    ((SELECT SUM(toks) FROM per_source) // 2) * 3 // 10 AS cap
  FROM per_source
), cum AS (
  SELECT source, toks, budget, cap,
    COALESCE(SUM(LEAST(toks, cap)) OVER (
      ORDER BY toks DESC, source
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM with_budget
)
SELECT source, toks AS tokens_available,
  CAST(GREATEST(0, LEAST(LEAST(toks, cap),
                    budget - LEAST(cum_prev, budget))) AS BIGINT)
    AS tokens_allocated,
  ROUND(CAST(GREATEST(0, LEAST(LEAST(toks, cap),
             budget - LEAST(cum_prev, budget))) AS DOUBLE)
        / budget, 6) AS budget_fraction
FROM cum
""",
    tags=("curation", "mixture", "planning", "governance"),
)
def t21_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture planning under a token budget: allocate 50% of
    the corpus's whitespace tokens across sources, biggest source
    first, with a 30%-of-budget per-source cap (the anti-domination
    rule every mixture recipe carries) — greedy waterfill stated as ONE
    window cumulative sum, no iteration: because every source before
    the budget crossing receives exactly min(toks, cap), the running
    sum of that expression IS the true allocated total, so
    budget-minus-cumsum clamps each source in closed form. All
    arithmetic is integer until the final reporting fraction, so both
    engines agree bit-for-bit (no float ordering risk).

    Scale shape: the window runs over the per-SOURCE summary (a
    dimension-sized relation), never the corpus; the corpus pass is
    one hash aggregate."""
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("bigint").alias("toks")
    )
    totals = per_source.agg(
        F.expr("sum(toks) div 2").alias("budget"),
        F.expr("(sum(toks) div 2) * 3 div 10").alias("cap"),
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.desc("toks"), "source")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = per_source.crossJoin(F.broadcast(totals))
    capped = F.least(F.col("toks"), F.col("cap"))
    cum_prev = F.coalesce(F.sum(capped).over(w), F.lit(0))
    alloc = F.greatest(
        F.lit(0),
        F.least(
            capped,
            F.col("budget") - F.least(cum_prev, F.col("budget")),
        ),
    )
    return joined.select(
        "source",
        F.col("toks").alias("tokens_available"),
        alloc.alias("tokens_allocated"),
        F.round(alloc.cast("double") / F.col("budget"), 6).alias(
            "budget_fraction"
        ),
    )


@query(
    "t22_bpe_merge_learning",
    oracle=None,  # iterative argmax-dependent rewrite; pinned by tests/test_bpe.py
    tags=("curation", "tokenizer", "bpe", "iterative"),
    bench=True,
)
def t22_bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction: the first 10 BPE merges learned from the
    corpus (Sennrich et al. 2016), the step every pre-training pipeline
    runs before token counting means anything. Scale shape
    (operators/bpe.py): ONE corpus pass collapses to (word, count);
    every training round then runs on the vocabulary table — a pair
    explode + one map-side-combinable aggregate + a 1-row collect + a
    per-row greedy fold rewrite — so training cost is vocabulary-sized
    and independent of corpus growth once the vocabulary saturates.
    Deterministic: pair ties break lexicographically; tokenization is
    the dedup chain's normalized_text, so 'word' means the same thing
    here as in d01-d28. Rows-only (unbounded iteration with an
    argmax-dependent rewrite has no engine-portable SQL); the exact
    merge sequence is pinned against a pure-Python reference in
    tests/test_bpe.py."""
    from ..operators.bpe import bpe_merges, corpus_word_counts

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    wc = corpus_word_counts(docs, normalized_text(F.col("text")))
    merges = bpe_merges(wc, n_merges=10)
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


@query(
    "t22b_bpe_vocab_local",
    oracle=None,  # iterative argmax-dependent rewrite; pinned by tests/test_bpe.py
    tags=("curation", "tokenizer", "bpe", "iterative"),
    bench=True,
)
def t22b_bpe_vocab_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction at REAL merge counts — 1000 BPE merges in
    ONE Spark job. t22 demonstrates the distributed per-round loop
    (one pair-aggregate job + driver collect per merge: fine at 10,
    an unbuildable 30k-job lineage at production vocab sizes); this
    entry runs the whole Sennrich loop inside a single mapInPandas
    task over the (word, count) vocabulary (operators/bpe.py
    bpe_merges_local): the vocabulary streams in as Arrow batches —
    never through the driver — and an incremental pair-index trainer
    (O(touched words) per merge, lazy-deletion heap argmax) emits the
    full merge table in milliseconds per merge. Cost is one corpus
    pass (word counting) + one vocabulary-sized task, independent of
    n_merges x jobs — the scale shape a 30k-merge production vocab
    needs. Deterministic (count DESC, pair ASC ties) and pinned
    per-rank equal to BOTH the distributed path and the pure-Python
    Sennrich reference in tests/test_bpe.py; rows-only here (unbounded
    iteration has no engine-portable SQL)."""
    from ..operators.bpe import bpe_merges_local, corpus_word_counts

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    wc = corpus_word_counts(docs, normalized_text(F.col("text")))
    merges = bpe_merges_local(wc, n_merges=1000)
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count long"
    )


@query(
    "t23_bpe_tokenize",
    oracle=None,  # learned-merge tokenization; pinned by tests/test_bpe.py
    tags=("curation", "tokenizer", "bpe", "token-count"),
    bench=True,
)
def t23_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization under the LEARNED tokenizer — t22's merges
    applied back to every document, closing the induction->apply loop
    (t04's regex counter approximates a tokenizer; this one is the
    tokenizer the corpus itself trained). Scale shape: the expensive
    step (the per-word merge loop, a pandas UDF) runs once per DISTINCT
    word — the embed_distinct pattern — and per-document counts come
    from a pure-JVM explode + join on the word + one grouped sum, so
    Python cost is vocabulary-sized while the corpus-sized path stays
    codegen. Output per doc: words, learned-subword tokens, and chars —
    the compression ladder a tokenizer report cares about. Rows-only;
    merge learning and encode are pinned vs the Python reference in
    tests/test_bpe.py.

    r15 (guide §1.2 — fix the algorithm before the per-task work): the
    merge table comes from bpe_merges_local, the vocabulary-local
    trainer, not the per-round distributed loop. The two are pinned
    per-rank EQUAL in tests/test_bpe.py (and both equal the pure-Python
    reference), so the output is bit-identical; but at 10 merges the
    distributed loop pays 10 sequential vocabulary jobs — measured
    5.2 s warm at sf0.1 vs 0.85 s for the local trainer, ~all of t23's
    5.3 s total. The distributed path stays exercised where it IS the
    subject: t22 (the priced per-round row), t27 and t23b (the
    oracle-certified training/encode certifications)."""
    from ..operators.bpe import (
        bpe_encode_words,
        bpe_merges_local,
        corpus_word_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    norm = normalized_text(F.col("text"))
    wc = corpus_word_counts(docs, norm)
    merges = bpe_merges_local(wc, n_merges=10)
    vocab = bpe_encode_words(wc.select("word"), merges)

    doc_words = docs.select(
        "doc_id", F.explode(F.split(norm, r"\s+")).alias("word")
    ).filter(F.length("word") >= 1)
    return (
        doc_words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_word_chars"),
        )
    )


_BLOOM_M = 1 << 18  # bits (32 KiB) — sized for ~0.5% FP at this eval mass
_BLOOM_K = 4  # hash functions


def _bloom_pos_sql(gram_expr: str, i: int) -> str:
    """DuckDB bit position i for a gram: first 8 md5 hex chars of
    gram||'#i', mod m — byte-identical to the Spark expression."""
    return (
        f"CAST(concat('0x', substr(md5({gram_expr} || '#{i}'), 1, 8)) "
        f"AS BIGINT) % {_BLOOM_M}"
    )


def _bloom_pos_col(gram: Column, i: int) -> Column:
    return (
        F.conv(F.substring(F.md5(F.concat(gram, F.lit(f"#{i}"))), 1, 8), 16, 10)
        .cast("bigint")
        % _BLOOM_M
    )


@query(
    "d29_bloom_decontamination",
    oracle=f"""
{_SQL_SHINGLED_DISTINCT}
, eval_pos AS (
  SELECT DISTINCT pos FROM (
    {" UNION ALL ".join(
        f"SELECT {_bloom_pos_sql('gram', i)} AS pos FROM "
        f"(SELECT DISTINCT gram FROM exploded WHERE doc_id % {_EVAL_MOD} = 0)"
        for i in range(_BLOOM_K)
    )}
  )
),
corpus_grams AS (
  SELECT DISTINCT gram FROM exploded WHERE doc_id % {_EVAL_MOD} != 0
),
gram_hits AS (
  SELECT g.gram FROM corpus_grams g
  WHERE {" AND ".join(
      f"EXISTS (SELECT 1 FROM eval_pos ep WHERE ep.pos = {_bloom_pos_sql('g.gram', i)})"
      for i in range(_BLOOM_K)
  )}
),
hits AS (
  SELECT e.doc_id, COUNT(*) AS n_bloom_flagged
  FROM exploded e JOIN gram_hits USING (gram)
  WHERE e.doc_id % {_EVAL_MOD} != 0
  GROUP BY e.doc_id
)
SELECT s.doc_id,
  CAST(len(s.grams) AS BIGINT) AS n_grams,
  CAST(COALESCE(h.n_bloom_flagged, 0) AS BIGINT) AS n_bloom_flagged,
  COALESCE(h.n_bloom_flagged, 0) >= 3 AS contaminated_bloom
FROM shingled s LEFT JOIN hits h USING (doc_id)
WHERE s.doc_id % {_EVAL_MOD} != 0
""",
    tags=("dedup", "text", "curation", "bloom", "scale"),
    bench=True,
)
def d29_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via a BLOOM FILTER instead of d12's broadcast
    gram dictionary — the membership structure that keeps working when
    the eval/blocklist side stops being small (d12 broadcasts the gram
    STRINGS: ~50 bytes each; the bloom spends ~1.8 bytes per element at
    0.5% FP — a 100M-gram blocklist is a 5 GB broadcast as strings and
    a ~180 MB bitset here, still one executor-resident constant).

    Engine shape: eval grams hash to k=4 bit positions (first 8 md5 hex
    chars of gram||'#i' mod m — engine-portable arithmetic, no
    xxhash/murmur divergence); the DISTINCT position set is a
    driver-sized collect packed into m/64 int64 words that enter the
    plan as ONE literal array column, and the corpus side tests its 4
    bits per distinct gram with getbit over element_at — pure codegen,
    zero join, zero shuffle on the membership probe. Per-doc flag
    counts then rejoin by gram. Bloom semantics exactly (never a false
    negative; false positives only ever ADD flagged grams), and the
    DuckDB oracle replays the identical bitset via the join
    formulation, so the driver hash certifies the two formulations
    agree bit-for-bit. tests/test_bloom_decontamination.py pins the
    no-false-negative containment vs d12's exact answer and the FP
    inflation bound."""
    from .llmops import _exploded_grams_df, _shingled_df

    # both the shingle table and its exploded (doc_id, gram) form ride
    # the session seam — this plan walks the gram table four times
    # (eval positions, corpus grams, per-doc hits, final counts) but
    # the corpus is shingled AND exploded once
    shingled = _shingled_df(spark, sf_dir)
    exploded = _exploded_grams_df(spark, sf_dir)
    is_eval = F.col("doc_id") % _EVAL_MOD == 0

    eval_grams = exploded.filter(is_eval).select("gram").distinct()
    # all k positions in ONE walk of the eval grams (explode of a
    # k-element array — a 4-way unionAll re-ran the distinct per hash)
    pos_df = eval_grams.select(
        F.explode(
            F.array(
                *[_bloom_pos_col(F.col("gram"), i) for i in range(_BLOOM_K)]
            )
        ).alias("pos")
    )
    # DISTINCT positions: at most k x |eval grams| ints — driver-sized
    # for any benchmark-scale eval set (the corpus never collects)
    positions = [int(r.pos) for r in pos_df.distinct().collect()]
    words = [0] * (_BLOOM_M // 64)
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement into signed int64 literals; ONE list literal
    # (4096 per-element F.lit calls cost ~5 s of py4j round trips)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    words_lit = F.lit(words).cast("array<long>")

    corpus_grams = (
        exploded.filter(~is_eval).select("gram").distinct()
        .withColumn("bw", words_lit)
    )
    hit = None
    for i in range(_BLOOM_K):
        corpus_grams = corpus_grams.withColumn(
            f"p{i}", _bloom_pos_col(F.col("gram"), i)
        )
        bit = F.expr(
            f"getbit(element_at(bw, CAST(p{i} / 64 AS INT) + 1), "
            f"CAST(p{i} % 64 AS INT)) = 1"
        )
        hit = bit if hit is None else (hit & bit)
    gram_hits = corpus_grams.filter(hit).select("gram")

    hits = (
        exploded.filter(~is_eval)
        .join(F.broadcast(gram_hits), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_flagged"))
    )
    n_flag = F.coalesce(F.col("n_bloom_flagged"), F.lit(0))
    return (
        shingled.filter(~is_eval)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.size("grams").cast("bigint").alias("n_grams"),
            n_flag.cast("bigint").alias("n_bloom_flagged"),
            (n_flag >= 3).alias("contaminated_bloom"),
        )
    )


@query(
    "t24_temperature_mixture",
    oracle="""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_available,
         CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS s
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(n_available) AS tot_n, SUM(s) AS tot_s FROM per_src),
j AS (
  SELECT p.*, t.tot_s, t.tot_n // 2 AS b
  FROM per_src p CROSS JOIN tot t
),
appo AS (
  SELECT source, n_available, s, b,
    (b * s) // tot_s AS base,
    (b * s) % tot_s AS rem,
    SUM((b * s) // tot_s) OVER () AS base_sum,
    ROW_NUMBER() OVER (ORDER BY (b * s) % tot_s DESC, source) AS rn
  FROM j
)
SELECT source,
  CAST(n_available AS BIGINT) AS n_available,
  CAST(LEAST(base + CASE WHEN rn <= b - base_sum THEN 1 ELSE 0 END,
             n_available) AS BIGINT) AS n_allocated,
  ROUND(CAST(LEAST(base + CASE WHEN rn <= b - base_sum THEN 1 ELSE 0 END,
             n_available) AS DOUBLE) / n_available, 6) AS sample_rate
FROM appo
""",
    tags=("curation", "mixture", "sampling", "governance"),
)
def t24_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened corpus mixture (the multilingual-
    pretraining sampler: p_i proportional to n_i^alpha with alpha=0.5, so
    small sources are boosted and head sources damped) apportioned to a
    half-corpus token budget with the LARGEST-REMAINDER method — and
    every step in EXACT integer arithmetic, which is what makes the
    allocation deterministic across engines, partitionings and summation
    orders: the flattened mass is floor(sqrt(n_i)) (exact for any
    n < 2^52), shares are (B*s_i) div S with remainders (B*s_i) mod S,
    and the leftover units go to the largest remainders (source-name
    tiebreak). A float formulation (n^alpha / sum n^alpha) would hang
    the final unit on last-ulp summation order — the classic
    cross-engine hash-flake this catalog avoids by design.

    Scale shape: ONE map-side-combinable aggregate collapses the corpus
    to a row per source; everything after runs on that source-count
    table (windows over k rows). Allocations cap at n_available
    (flattening can over-ask a tiny source); t21's waterfill is the
    redistribution policy when the cap bites."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_available")
    ).withColumn("s", F.floor(F.sqrt(F.col("n_available"))).cast("long"))
    tot = per_src.agg(
        F.sum("n_available").alias("tot_n"), F.sum("s").alias("tot_s")
    )
    j = (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn("b", F.expr("tot_n div 2"))
        .withColumn("base", F.expr("(b * s) div tot_s"))
        .withColumn("rem", F.expr("(b * s) % tot_s"))
    )
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(F.desc("rem"), "source")
    j = j.withColumn("base_sum", F.sum("base").over(w_all)).withColumn(
        "rn", F.row_number().over(w_rank)
    )
    alloc = F.least(
        F.col("base")
        + F.when(F.col("rn") <= F.col("b") - F.col("base_sum"), 1).otherwise(0),
        F.col("n_available"),
    )
    return j.select(
        "source",
        F.col("n_available").cast("bigint").alias("n_available"),
        alloc.cast("bigint").alias("n_allocated"),
        F.round(alloc.cast("double") / F.col("n_available"), 6).alias(
            "sample_rate"
        ),
    )


_WSAMPLE_N = 100
_WSAMPLE_DENOM = 4294967297.0  # 2^32 + 1: u in (0, 1]


@query(
    "d31_weighted_sample",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
    -LN((CAST(('0x' || substr(
        md5(CAST(doc_id AS VARCHAR) || ':wsample42'), 1, 8)) AS BIGINT)
      + 1.0) / {_WSAMPLE_DENOM}) / n_chars AS k
  FROM documents
)
SELECT doc_id, n_chars, ROUND(k, 6) AS skey
FROM keyed ORDER BY k, doc_id LIMIT {_WSAMPLE_N}
""",
    tags=("curation", "sampling", "importance-weighting"),
)
def d31_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 exponential sort): each doc draws a seeded uniform u
    from the d13 md5 arithmetic (engine-portable: same first-8-hex-chars
    integer on both engines) and is ranked by -ln(u)/w — keeping the n
    smallest keys is exactly a weight-proportional sample without
    replacement. Weight here is n_chars (token-budget-proportional
    selection: uniform-over-TOKENS sampling expressed over docs); any
    positive weight column drops in — exp(t17's dsir_logweight) is the
    DSIR resampling step, the composition tests/test_weighted_sample.py
    exercises. Scale shape: the key is pure codegen'd arithmetic on the
    scan, and the top-n is orderBy+limit — Catalyst's
    TakeOrderedAndProject, per-partition top-n then a driver merge of
    n x partitions rows, NO global sort; reproducible on any engine
    from the seed alone. The only cross-engine float caveat: ln() may
    differ by an ulp between libm and java.lang.Math, so the selection
    boundary could in principle flip on adversarially near-tied keys —
    at any real corpus size adjacent key gaps are ~10 orders above ulp
    (and the driver gate re-checks the actual boundary every run)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":wsample42"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(_WSAMPLE_DENOM)
    k = -F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "n_chars", k.alias("k"))
        .orderBy("k", "doc_id")
        .limit(_WSAMPLE_N)
        .select("doc_id", "n_chars", F.round("k", 6).alias("skey"))
    )


# ---------------------------------------------------------------------------
# t25: pairwise source divergence (Jensen-Shannon over unigram mixtures)
# ---------------------------------------------------------------------------

_T25_LN2 = "0.6931471805599453"  # repr(math.log(2)) — identical literal both engines
_T25_TERM_SCALE = 1_000_000_000  # per-token JS terms rounded at 1e-9
_T25_MASS_SCALE = 1_000_000_000_000  # per-token probability mass at 1e-12


def js_divergence_matrix(counts: DataFrame) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram mixtures
    of every source pair, from a (source, token, cnt) count table.
    Returns (source_a, source_b, n_shared, js_divergence) with
    source_a < source_b — the ONE copy of the algebra the t25 catalog
    entry and the adversarial numpy pins in tests/test_divergence.py
    both run. See t25_source_divergence for the identity and the
    integer-scaling discipline."""
    totals = counts.groupBy("source").agg(F.sum("cnt").alias("tot"))
    probs = counts.join(F.broadcast(totals), "source").select(
        "source",
        "token",
        (F.col("cnt").cast("double") / F.col("tot")).alias("p"),
    )
    a, b = probs.alias("a"), probs.alias("b")
    pa, pb = F.col("a.p"), F.col("b.p")
    term = pa * F.log(2.0 * pa / (pa + pb)) + pb * F.log(2.0 * pb / (pa + pb))
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(
                F.round(term * _T25_TERM_SCALE).cast("long")
            ).alias("shared_scaled"),
            F.sum(F.round(pa * _T25_MASS_SCALE).cast("long")).alias("mass_a"),
            F.sum(F.round(pb * _T25_MASS_SCALE).cast("long")).alias("mass_b"),
        )
    )
    ta, tb = totals.alias("ta"), totals.alias("tb")
    pair_frame = ta.join(
        F.broadcast(tb), F.col("ta.source") < F.col("tb.source")
    ).select(
        F.col("ta.source").alias("source_a"),
        F.col("tb.source").alias("source_b"),
    )
    ln2 = F.lit(float(_T25_LN2))
    js = (
        0.5 * F.coalesce(F.col("shared_scaled"), F.lit(0)) / _T25_TERM_SCALE
        + 0.5
        * ln2
        * (
            2.0 * _T25_MASS_SCALE
            - F.coalesce(F.col("mass_a"), F.lit(0))
            - F.coalesce(F.col("mass_b"), F.lit(0))
        )
        / _T25_MASS_SCALE
    )
    return pair_frame.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce(F.col("n_shared"), F.lit(0).cast("bigint")).alias(
            "n_shared"
        ),
        js.alias("js_divergence"),
    )


@query(
    "t25_source_divergence",
    oracle=f"""
WITH counts AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source,
          unnest(regexp_split_to_array({_SQL_NORM}, '\\s+')) AS token
        FROM documents WHERE {_SQL_NORM} != '')
  GROUP BY source, token
),
totals AS (SELECT source, SUM(cnt) AS tot FROM counts GROUP BY source),
probs AS (
  SELECT c.source, c.token, CAST(c.cnt AS DOUBLE) / t.tot AS p
  FROM counts c JOIN totals t ON c.source = t.source
),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
    CAST(COUNT(*) AS BIGINT) AS n_shared,
    CAST(SUM(CAST(ROUND((a.p * ln(2 * a.p / (a.p + b.p))
                         + b.p * ln(2 * b.p / (a.p + b.p)))
                        * {_T25_TERM_SCALE}) AS BIGINT)) AS BIGINT)
      AS shared_scaled,
    CAST(SUM(CAST(ROUND(a.p * {_T25_MASS_SCALE}) AS BIGINT)) AS BIGINT)
      AS mass_a,
    CAST(SUM(CAST(ROUND(b.p * {_T25_MASS_SCALE}) AS BIGINT)) AS BIGINT)
      AS mass_b
  FROM probs a JOIN probs b ON a.token = b.token AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.source_a, p.source_b,
  CAST(COALESCE(s.n_shared, 0) AS BIGINT) AS n_shared,
  ROUND(0.5 * COALESCE(s.shared_scaled, 0) / {_T25_TERM_SCALE}
        + 0.5 * {_T25_LN2}
          * (2.0 * {_T25_MASS_SCALE} - COALESCE(s.mass_a, 0)
             - COALESCE(s.mass_b, 0)) / {_T25_MASS_SCALE}, 6)
    AS js_divergence
FROM (SELECT ta.source AS source_a, tb.source AS source_b
      FROM totals ta JOIN totals tb ON ta.source < tb.source) p
LEFT JOIN shared s
  ON s.source_a = p.source_a AND s.source_b = p.source_b
""",
    tags=("text", "curation", "mixture", "governance"),
    bench=True,
)
def t25_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRWISE SOURCE DIVERGENCE: Jensen-Shannon divergence between
    every pair of per-source unigram distributions — the data-mixture
    diagnostic behind source weighting and drift review ("which
    corpus sources actually differ, and by how much?"; JS is the
    symmetric, bounded-[0, ln 2] divergence standard in data-selection
    work, e.g. the DoReMi/DSIR family t17 already implements the
    importance-weight side of). Complements t08/t24 (which ALLOCATE
    across sources) with the measurement that says whether two sources
    are even distinct, and t16's per-source datacard with a
    cross-source comparison matrix.

    JS(P,Q) = 0.5*KL(P||M) + 0.5*KL(Q||M), M = (P+Q)/2. Tokens present
    in both sources contribute p*ln(2p/(p+q)) + q*ln(2q/(p+q)); a
    token private to one side contributes exactly p*ln 2 — so instead
    of a full-outer pair fan-out, the private mass rides the IDENTITY
    sum(private p) = 1 - sum(shared p): one INNER token join plus the
    shared-mass totals reconstructs the exact divergence, and sources
    sharing no tokens fall out as ln 2 via the LEFT join against the
    pair frame. Per-token terms and masses are rounded to scaled
    BIGINTs before summing (the t24/s25/s26 discipline) so the
    aggregate is order-independent and hash-exact; ln itself is pinned
    cross-engine by the same libm contract t11's BM25 idf already
    relies on.

    Scale shape: the corpus collapses to (source, token, count) with
    map-side combine — shuffle is vocabulary-sized, text never moves;
    per-source totals broadcast back; the pair join is token-keyed
    over the vocabulary (each token fans out only to the source pairs
    that BOTH contain it); the pair frame is |sources|^2 driver-sized.
    At 100 TB the only corpus-proportional cost is the first scan."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    norm = normalized_text(F.col("text"))
    counts = (
        docs.select("source", F.explode(F.split(norm, r"\s+")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return js_divergence_matrix(counts).select(
        "source_a",
        "source_b",
        "n_shared",
        F.round("js_divergence", 6).alias("js_divergence"),
    )


@query(
    "d33_cross_source_dup_matrix",
    oracle=f"""
WITH fps AS (
  SELECT DISTINCT source, md5({_SQL_NORM}) AS fp
  FROM documents WHERE length(text) > 0
),
per_source AS (
  SELECT source, COUNT(*) AS n_fps FROM fps GROUP BY source
),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(*) AS n_shared_fps
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s.source_a, s.source_b, s.n_shared_fps,
  ROUND(CAST(s.n_shared_fps AS DOUBLE)
        / LEAST(pa.n_fps, pb.n_fps), 6) AS overlap_coef
FROM shared s
JOIN per_source pa ON pa.source = s.source_a
JOIN per_source pb ON pb.source = s.source_b
""",
    tags=("dedup", "curation", "governance"),
    bench=True,
)
def d33_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE exact-duplicate matrix: for every unordered source
    pair, how many distinct content fingerprints appear in BOTH — plus
    the overlap coefficient (shared / smaller side's distinct count).
    The curation decision this feeds is which source to DROP when two
    crawls mirror each other (t25 compares sources by vocabulary
    *distribution*; this measures literal content overlap — the two
    disagree exactly when a source paraphrases another, which is the
    interesting case). Deduplication policy at corpus scale is a
    source-level decision first and a pair-level decision second.

    Scale shape: the corpus collapses to DISTINCT (source, fp) in one
    map-side-combinable pass (16-byte fingerprints, never text); the
    self-join shuffles on fp and each fingerprint fans out only to the
    source pairs that both contain it (C(k,2) for a fp in k sources —
    bounded by |sources|^2 per fp, and |sources| is governance-sized);
    post-combine output is at most |sources|^2 rows. The per-source
    distinct counts ride one more combinable groupBy and join back
    broadcast-small. Exact integers except the final rounded ratio."""
    from ..functions.text import doc_fingerprint

    fps = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select("source", doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    per_source = fps.groupBy("source").agg(F.count(F.lit(1)).alias("n_fps"))
    a, b = fps.alias("a"), fps.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )
    pa = F.broadcast(
        per_source.select(
            F.col("source").alias("source_a"), F.col("n_fps").alias("n_a")
        )
    )
    pb = F.broadcast(
        per_source.select(
            F.col("source").alias("source_b"), F.col("n_fps").alias("n_b")
        )
    )
    return (
        shared.join(pa, "source_a")
        .join(pb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_fps",
            F.round(
                F.col("n_shared_fps").cast("double")
                / F.least("n_a", "n_b"),
                6,
            ).alias("overlap_coef"),
        )
    )


# ---------------------------------------------------------------------------
# t26: curriculum data ordering (difficulty deciles, round-robin interleave)
# ---------------------------------------------------------------------------

_T26_BUCKETS = 10  # difficulty deciles


@query(
    "t26_curriculum_order",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
    COALESCE(len(regexp_extract_all(text, '[^ \\t\\n\\x0B\\f\\r]+')), 0)
      AS n_tokens
  FROM documents
),
ranked AS (
  SELECT doc_id, n_tokens,
    ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rnk,
    COUNT(*) OVER () AS n
  FROM scored
),
dec AS (
  SELECT doc_id, n_tokens,
    CAST(((rnk - 1) * {_T26_BUCKETS}) // n + 1 AS INTEGER) AS decile
  FROM ranked
),
pos AS (
  SELECT doc_id, n_tokens, decile,
    ROW_NUMBER() OVER (
      PARTITION BY decile
      ORDER BY md5('t26:' || CAST(doc_id AS VARCHAR)), doc_id
    ) AS bucket_pos
  FROM dec
)
SELECT doc_id, n_tokens, decile, bucket_pos,
       CAST((bucket_pos - 1) * {_T26_BUCKETS} + decile AS BIGINT)
         AS curriculum_key
FROM pos
""",
    tags=("text", "curation", "curriculum", "ordering"),
    bench=True,
)
def t26_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering for LLM training (Bengio et al. 2009
    applied to corpus scheduling): rank every document by difficulty
    (token count — the standard length curriculum), cut the ranking
    into exact DECILES, shuffle deterministically within each decile
    (the d13 md5 convention), and emit ``curriculum_key`` — ordering by
    it round-robins one document per decile per cycle, so every
    training window sees the full difficulty spectrum while early
    positions stay short-skewed exactly as configured.

    Scale shape — the interesting part: exact deciles need an exact
    GLOBAL rank, and a bare ``ROW_NUMBER() OVER (ORDER BY ...)`` is a
    single-partition window (the canonical scale-killer). Both ranks
    here go through ``operators/ranking.distributed_rank`` — quantile-
    cut value bucketing (a pure row function, NOT physical-partition-
    dependent), per-bucket parallel windows, broadcast offsets — so the
    plan never funnels the corpus through one task, while remaining
    bit-identical to the oracle's single-task ROW_NUMBER. The
    within-decile position reuses the same primitive over a composite
    (decile * 2^33 + md5-prefix) key and subtracts the decile's start
    offset, which is pure driver arithmetic from the total count: the
    decile sizes of a formula-cut ranking are deterministic
    (ceil(d*n/10) boundaries), so no per-decile count pass is needed —
    and n itself comes out of distributed_rank's bucket-count collect,
    so no extra corpus scan either. Token counting is the count of
    NON-whitespace runs over an EXPLICIT ASCII class (``\\s`` means
    different char sets in Java regex vs RE2 — the Md5BowEmbedder
    finding applied here; NULL/whitespace-only docs count 0 and sort
    first)."""
    from ..operators.ranking import distributed_rank

    b = _T26_BUCKETS
    n_tokens = F.coalesce(
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[^ \t\n\x0B\f\r]+"), F.lit(0)
            )
        ).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", n_tokens.alias("n_tokens")
    )
    rk_stats: dict = {}
    ranked = distributed_rank(
        docs, ["n_tokens", "doc_id"], "rnk", stats=rk_stats
    )
    n = rk_stats["total"]
    dec = ranked.select(
        "doc_id",
        "n_tokens",
        (F.expr(f"((rnk - 1) * {b}) DIV {n}") + 1).cast("int").alias("decile"),
    )
    md5s = F.md5(F.concat(F.lit("t26:"), F.col("doc_id").cast("string")))
    # The oracle compares the FULL 32-hex md5 string; carry all 128
    # bits here as big-endian numeric chunks (8+12+12 hex → 32+48+48
    # bits, each a comfortable long) so chunked comparison is exactly
    # the string's lexicographic order. An earlier version kept only
    # the first 8 chars and relied on doc_id past that — correct until
    # two digests share a 32-bit prefix inside one decile, a birthday
    # bound that reaches ~50% near 77k rows per decile (r10 advice).
    chunk = lambda s, w: F.conv(F.substring(md5s, s, w), 16, 10).cast("long")
    # composite first key: decile-major, md5-high-word minor — the
    # numeric bucketing key for distributed_rank; the remaining chunks
    # ride as ordinary window order keys.
    with_key = dec.withColumn(
        "_ck", F.col("decile").cast("long") * (2**33) + chunk(1, 8)
    ).withColumn("_h2", chunk(9, 12)).withColumn("_h3", chunk(21, 12))
    ranked2 = distributed_rank(with_key, ["_ck", "_h2", "_h3", "doc_id"], "grnk")
    # decile start offsets: rank r belongs to decile d iff
    # (d-1)*n/10 <= r-1 < d*n/10, so decile d starts after
    # ceil((d-1)*n/10) rows — pure arithmetic, no extra pass
    starts = [(d, -(-((d - 1) * n) // b)) for d in range(1, b + 1)]
    offs = spark.createDataFrame(starts, "decile int, _dstart long")
    return (
        ranked2.join(F.broadcast(offs), "decile")
        .select(
            "doc_id",
            "n_tokens",
            "decile",
            (F.col("grnk") - F.col("_dstart")).alias("bucket_pos"),
            (
                (F.col("grnk") - F.col("_dstart") - 1) * b + F.col("decile")
            )
            .cast("bigint")
            .alias("curriculum_key"),
        )
    )


_T27_MERGES = 8


def _t27_chain() -> str:
    """The Sennrich BPE training loop UNROLLED as 8 chained MATERIALIZED
    rounds (p{k} pair counts, m{k} argmax, w{k} vocabulary rewrite),
    generated programmatically so the SQL provably mirrors
    operators/bpe.bpe_merges round for round — the shared WITH-chain
    behind the t27 oracle (training certification) and the t23b oracle
    (tokenization certification; w{K} IS the encoded vocabulary, since
    encode = the same merge sequence applied to the same char-split
    words). The rewrite trick that makes the greedy merge relational:
    every symbol is rendered as ``GS + symbol + RS`` (chr(29)/chr(30) —
    absent from any text), so a single literal
    ``replace(rep, GS+l+RS+GS+r+RS, GS+l+r+RS)`` is EXACTLY the greedy
    left-to-right non-overlapping merge of bpe._merge_pair's fold: each
    symbol carries its own start anchor and terminator, so consecutive
    matches share no characters (runs like 'aaaa' merge to 'aa','aa',
    never 'aa','a','a') and a pattern can never match mid-symbol or
    across a longer symbol's prefix."""
    from .llmops import _SQL_NORM

    gs, rs = "chr(29)", "chr(30)"
    parts = [
        f"""
WITH w0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n,
         regexp_replace(word, '(.)', {gs} || '\\1' || {rs}, 'g') AS rep
  FROM (
    SELECT unnest(regexp_split_to_array({_SQL_NORM}, '\\s+')) AS word
    FROM documents
  ) WHERE word != ''
  GROUP BY word
)"""
    ]
    for k in range(1, _T27_MERGES + 1):
        p = k - 1
        parts.append(
            f""",
p{k} AS MATERIALIZED (
  SELECT a, b, CAST(SUM(n) AS BIGINT) AS c FROM (
    SELECT n, syms[i] AS a, syms[i + 1] AS b FROM (
      SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS i
      FROM (
        SELECT n, list_transform(
                 list_filter(string_split(rep, {gs}), x -> x != ''),
                 t -> substr(t, 1, length(t) - 1)) AS syms
        FROM w{p}
      )
    )
  ) GROUP BY a, b
),
m{k} AS MATERIALIZED (SELECT a, b, c FROM p{k} ORDER BY c DESC, a, b LIMIT 1),
w{k} AS MATERIALIZED (
  SELECT word, n, replace(rep,
      {gs} || (SELECT a FROM m{k}) || {rs}
            || {gs} || (SELECT b FROM m{k}) || {rs},
      {gs} || (SELECT a FROM m{k}) || (SELECT b FROM m{k}) || {rs}) AS rep
  FROM w{p}
)"""
        )
    return "".join(parts)


def _t27_oracle() -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, a AS lhs, b AS rhs, c AS pair_count FROM m{k}"
        for k in range(1, _T27_MERGES + 1)
    )
    return _t27_chain() + "\n" + selects


def _t23b_oracle() -> str:
    """t23b: the t27 training chain + tokenize-back. The final
    vocabulary w{K}.rep is each word AFTER all K merges applied in rank
    order — exactly what per-word encoding under the learned table
    computes (bpe_encode_words applies the same merge sequence to the
    same char-split word, so training-rewrite == encode by induction
    over rounds). Subword count per word = the symbol count of rep;
    per-document totals come from the same explode+join+sum the Spark
    side runs."""
    from .llmops import _SQL_NORM

    k = _T27_MERGES
    return (
        _t27_chain()
        + f""",
vocab AS MATERIALIZED (
  SELECT word,
    len(list_filter(string_split(rep, chr(29)), x -> x != '')) AS n_subwords
  FROM w{k}
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_words,
  CAST(SUM(n_subwords) AS BIGINT) AS n_bpe_tokens,
  CAST(SUM(length(word)) AS BIGINT) AS n_word_chars
FROM (
  SELECT doc_id,
    unnest(regexp_split_to_array({_SQL_NORM}, '\\s+')) AS word
  FROM documents
) dw
JOIN vocab USING (word)
GROUP BY doc_id
"""
    )


@query(
    "t27_bpe_training_exact",
    oracle=_t27_oracle(),
    tags=("curation", "tokenizer", "bpe", "iterative"),
)
def t27_bpe_training_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING value-certified hash-exact — the last
    member of the 'iterative algorithms are inherently rows-only'
    class (after d32b's PageRank): this entry runs the PRODUCTION
    trainer itself (operators/bpe.bpe_merges — t22's exact dataflow,
    no seeding needed because Sennrich BPE is already deterministic:
    per-occurrence pair counts, argmax by count DESC / pair ASC,
    greedy left-to-right rewrite) for the first 8 merges, and the
    DuckDB oracle replays the whole loop as 8 unrolled MATERIALIZED
    rounds. The relational form of the greedy rewrite — the step t22's
    rows-only comment said had 'no engine-portable SQL' — is a single
    literal replace over a delimiter-wrapped symbol string (see
    _t27_oracle); pair counting is a per-round unnest + aggregate.
    t22 (10 merges) and t22b (1000, vocabulary-local) remain the
    production entries; their shared kernel is pinned against a
    pure-Python reference in tests/test_bpe.py, and THIS row makes the
    driver re-derive the actual learned merge table from raw text.

    Scale shape (t22's, unchanged): one corpus pass collapses to
    (word, count); each round is a vocabulary-sized pair aggregate +
    a 1-row collect + a vocabulary-sized rewrite — never a corpus
    re-scan."""
    from ..operators.bpe import bpe_merges, corpus_word_counts

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    wc = corpus_word_counts(docs, normalized_text(F.col("text")))
    merges = bpe_merges(wc, n_merges=_T27_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count long"
    )


@query(
    "t23b_bpe_tokenize_exact",
    oracle=_t23b_oracle(),
    tags=("curation", "tokenizer", "bpe", "token-count"),
)
def t23b_bpe_tokenize_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-merge TOKENIZATION value-certified hash-exact — the
    other half of the BPE triptych (t27 certified training; this row
    certifies ENCODE, closing the r11 verdict's #3b): train the
    production trainer (operators/bpe.bpe_merges) for 8 merges from
    raw text, tokenize every distinct word under that learned table
    through the production pandas-UDF encoder
    (operators/bpe.bpe_encode_words — the real Arrow seam, not a
    relational stand-in), and report per-document word / BPE-token /
    char totals. The DuckDB oracle re-derives the merge table with
    t27's unrolled MATERIALIZED chain and tokenizes by the same
    delimiter-wrapped literal-replace identity — the final round's
    vocabulary rewrite IS the encoded vocabulary, because encode
    applies the identical merge sequence to the identical char-split
    words (induction over rounds; the greedy-replace equivalence
    argument is _t27_chain's docstring). t23 (10 merges) stays the
    production entry; this row makes the driver re-derive its token
    counts value-for-value from raw text through train AND encode.

    Scale shape (t23's, unchanged): the pandas-UDF encode runs once
    per DISTINCT word (vocabulary-sized Python, the embed_distinct
    pattern); the corpus-sized path is a pure-JVM explode + broadcast-
    sized join + grouped sum."""
    from ..operators.bpe import bpe_encode_words, bpe_merges, corpus_word_counts

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    norm = normalized_text(F.col("text"))
    wc = corpus_word_counts(docs, norm)
    merges = bpe_merges(wc, n_merges=_T27_MERGES)
    vocab = bpe_encode_words(wc.select("word"), merges)

    doc_words = docs.select(
        "doc_id", F.explode(F.split(norm, r"\s+")).alias("word")
    ).filter(F.length("word") >= 1)
    return (
        doc_words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_word_chars"),
        )
    )


# Exact duplicated-span seed length (tokens). 8 is the standard seed
# width for blocked exact-substring dedup: long enough that natural
# language rarely collides, short enough that any real duplicated
# passage contains at least one full window.
_D35_SPAN = 8


def _d35_span_sql() -> str:
    parts = ", ".join(f"toks[i+{k}]" for k in range(_D35_SPAN))
    return f"""
WITH spanned AS (
  SELECT doc_id,
    CASE WHEN len(toks) < {_D35_SPAN} THEN CAST([] AS VARCHAR[])
         ELSE list_distinct(list_transform(
                generate_series(1, len(toks) - {_D35_SPAN - 1}),
                i -> md5(concat_ws(' ', {parts})))) END AS fps
  FROM (SELECT doc_id, regexp_split_to_array({_SQL_NORM}, '\\s+') AS toks
        FROM documents)
),
ex AS (SELECT doc_id, unnest(fps) AS fp FROM spanned),
fc AS (SELECT fp, COUNT(*) AS n_docs FROM ex GROUP BY fp),
dup AS (
  SELECT e.doc_id, COUNT(*) AS n_dup
  FROM ex e JOIN fc USING (fp) WHERE fc.n_docs >= 2 GROUP BY e.doc_id
)
SELECT s.doc_id,
  CAST(len(s.fps) AS BIGINT) AS n_spans,
  CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
  ROUND(CASE WHEN len(s.fps) = 0 THEN 0.0
        ELSE CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / len(s.fps) END,
        6) AS dup_span_frac
FROM spanned s LEFT JOIN dup d USING (doc_id)
"""


@query(
    "d35_exact_dup_spans",
    oracle=_d35_span_sql(),
    tags=("dedup", "text", "curation", "substring"),
    bench=True,
)
def d35_exact_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated-span detection — the seed stage of exact
    substring deduplication (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better": their suffix-array pass finds
    byte-identical spans >= 50 chars; the standard distributed
    approximation blocks on fixed-width token windows, which is what
    C4/RefinedWeb-class pipelines ship). Complements d11, which asks
    "does this doc SHARE VOCABULARY n-grams" — d35 asks the stronger
    question "does this doc contain an 8-TOKEN VERBATIM RUN that also
    appears verbatim elsewhere": every document's sliding 8-token
    windows become 16-byte md5 fingerprints (distinct per doc), a
    fingerprint present in >= 2 distinct documents marks its spans as
    exact cross-document duplication, and each doc reports its
    duplicated-span fraction — the signal a curation pipeline uses to
    route documents into passage-level dedup or boilerplate stripping
    (1,015 shared spans across 47 documents on the sf0.01 fixture, so
    the thresholds exercise real data, not vacuous zeros).

    Scale shape: the span fan-out is linear in corpus tokens (one
    16-byte hash per window, built by ONE slice pass per window —
    text itself never leaves the scan projection); the only exchanges
    carry (fingerprint, doc) pairs and the fingerprint-count
    aggregate partial-combines map-side, so shuffled bytes scale with
    the span vocabulary — the d11 aggregate-then-join-back discipline
    at 8-gram width. At 100 TB this is the recipe's exact published
    shape: fingerprint windows, group, mark, join back; the
    suffix-array refinement (arbitrary-length maximal spans) is a
    per-duplicate-cluster postpass over the tiny flagged subset."""
    docs = load_table(spark, sf_dir, "documents")
    # span hashing is CPU-bound and the fixture is one parquet file —
    # spread rows across cores first (the d11/_minhash_docs rationale)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = F.split(normalized_text(F.col("text")), r"\s+")
    n = F.size(toks)
    # window texts via CHAINED zip_with over shifted slices — 7 linear
    # passes instead of a per-window slice+concat lambda (the _trigrams
    # rationale at 8-gram width: higher-order functions run
    # interpreted, and transform(sequence)+slice re-copies 8 elements
    # per window; measured ~2x). md5 is NOT applied inside the array:
    # it runs in whole-stage codegen on the exploded column, and
    # distinct span texts ~ distinct fingerprints, so the oracle's
    # list_distinct-of-md5 set is unchanged.
    nwin = n - (_D35_SPAN - 1)
    acc = F.slice(toks, 1, nwin)
    for k in range(1, _D35_SPAN):
        acc = F.zip_with(
            acc,
            F.slice(toks, k + 1, nwin),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    spans = F.when(
        n < _D35_SPAN, F.array().cast("array<string>")
    ).otherwise(F.array_distinct(acc))
    spanned = docs.select("doc_id", spans.alias("fps"))
    ex = spanned.select(
        "doc_id", F.explode("fps").alias("span")
    ).select("doc_id", F.md5("span").alias("fp"))
    # fps are distinct per doc, so COUNT(*) per fp == distinct-doc count
    fp_docs = ex.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = (
        ex.join(fp_docs, "fp")
        .filter(F.col("n_docs") >= 2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    n_spans = F.size("fps")
    n_dup = F.coalesce(F.col("n_dup"), F.lit(0))
    return (
        spanned.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            n_spans.cast("bigint").alias("n_spans"),
            n_dup.cast("bigint").alias("n_dup_spans"),
            F.round(
                F.when(n_spans == 0, F.lit(0.0)).otherwise(
                    n_dup.cast("double") / n_spans
                ),
                6,
            ).alias("dup_span_frac"),
        )
    )

"""BPE merge learning (operators/bpe.py) vs a pure-Python reference.

The catalog entry t22 is rows-only (iterative, argmax-dependent); these
tests pin the EXACT merge sequence — pair counting with multiplicity,
greedy left-to-right rewrite, deterministic lexicographic ties — against
an independent plain-Python implementation of Sennrich et al. 2016.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.bpe import (
    bpe_merges,
    chars,
    corpus_word_counts,
)


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE: symbols = chars, best pair by (count desc, pair
    asc), greedy left-to-right merge."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_matches_python_reference_on_synthetic_vocab(spark):
    wc = {
        "lower": 5,
        "lowest": 2,
        "newer": 6,
        "wider": 3,
        "aaa": 4,  # overlapping-pair greedy case: (a,a) counts twice
        "banana": 2,
    }
    df = spark.createDataFrame(list(wc.items()), "word string, n long")
    got = bpe_merges(df, n_merges=8)
    want = _python_bpe(wc, 8)
    assert got == want
    # the overlap rule: 'aaa' contributes 2 occurrences of (a,a)
    pair_counts = {(l, r): c for _, l, r, c in want}
    if ("a", "a") in pair_counts:
        assert pair_counts[("a", "a")] >= 8  # 2 per 'aaa' x count 4


def test_bpe_greedy_merge_semantics(spark):
    """'aaaa' with merge (a,a) must become ['aa','aa'] (greedy scan),
    never ['a','aa','a'] or ['aaa','a']."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.bpe import (
        _merge_pair,
    )

    df = spark.createDataFrame([("aaaa",), ("aaa",), ("ababa",)], "w string")
    out = {
        r.w: list(r.m)
        for r in df.select(
            "w", _merge_pair(chars(F.col("w")), "a", "a").alias("m")
        ).collect()
    }
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]
    assert out["ababa"] == ["a", "b", "a", "b", "a"]

    out2 = {
        r.w: list(r.m)
        for r in df.select(
            "w", _merge_pair(chars(F.col("w")), "a", "b").alias("m")
        ).collect()
    }
    assert out2["ababa"] == ["ab", "ab", "a"]


def test_bpe_catalog_entry_matches_reference_on_corpus(spark):
    """t22 end-to-end at sf0.001: the Spark merge sequence equals the
    Python reference run on the same (word, count) table."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.text import (
        normalized_text,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    wc_df = corpus_word_counts(docs, normalized_text(F.col("text")))
    wc = {r.word: r.n for r in wc_df.collect()}
    want = _python_bpe(wc, 10)

    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in plans.get_spec("t22_bpe_merge_learning")
        .build(spark, SF_SMOKE)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want and len(got) == 10
    # no phantom empty symbols (the split keeps a trailing '' otherwise)
    assert all(l and r for _, l, r, _ in got)


def test_bpe_tokenize_matches_python_reference(spark):
    """t23 end-to-end at sf0.001: per-doc learned-subword counts equal
    the Python reference (same merges, same encode loop), and the
    compression ladder holds (words <= bpe tokens <= chars)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.text import (
        normalized_text,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    wc_df = corpus_word_counts(docs, normalized_text(F.col("text")))
    wc = {r.word: r.n for r in wc_df.collect()}
    merges = _python_bpe(wc, 10)
    ordered = [(l, r) for _, l, r, _ in merges]

    def encode_len(word: str) -> int:
        syms = list(word)
        for l, r in ordered:
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return len(syms)

    norm_texts = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id", normalized_text(F.col("text")).alias("t")
        ).collect()
    }
    want = {}
    for doc_id, t in norm_texts.items():
        words = [w for w in t.split() if w]
        if not words:
            continue
        want[doc_id] = (
            len(words),
            sum(encode_len(w) for w in words),
            sum(len(w) for w in words),
        )

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.n_word_chars)
        for r in plans.get_spec("t23_bpe_tokenize").build(spark, SF_SMOKE).collect()
    }
    assert got == want
    for w, b, c in got.values():
        assert w <= b <= c


def test_local_trainer_matches_reference_at_1000_merges(spark):
    """bpe_merges_local (the one-task incremental trainer) must emit
    the EXACT merge sequence of the naive per-round reference at real
    merge depth — the inverted-index + lazy-heap rewrite is an
    optimization, not a semantics change. Synthetic vocab sized so
    1000 merges don't exhaust it."""
    import random

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.bpe import (
        bpe_merges_local,
    )

    rng = random.Random(7)
    alphabet = "abcdefghij"
    wc = {}
    for _ in range(800):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 14)))
        wc[w] = wc.get(w, 0) + rng.randint(1, 9)
    df = spark.createDataFrame(list(wc.items()), "word string, n long")

    got = bpe_merges_local(df, n_merges=1000)
    want = _python_bpe(wc, 1000)
    assert len(got) >= 1000, "vocab must not exhaust before 1000 merges"
    assert got == want


def test_local_trainer_matches_distributed_path_on_corpus(spark):
    """The two trainers (per-round distributed jobs vs one incremental
    task) are the same algorithm: per-rank identical merges and counts
    on the real sf0.001 vocabulary, at the distributed path's depth."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.text import (
        normalized_text,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.bpe import (
        bpe_merges_local,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    wc_df = corpus_word_counts(docs, normalized_text(F.col("text")))
    dist = bpe_merges(wc_df, n_merges=10)
    local = bpe_merges_local(wc_df, n_merges=10)
    assert local == dist

    # and the catalog entry's depth against the pure-Python reference
    wc = {r.word: r.n for r in wc_df.collect()}
    deep = bpe_merges_local(wc_df, n_merges=1000)
    assert deep == _python_bpe(wc, 1000)


def test_local_trainer_edge_vocabularies(spark):
    """Exhaustion (merges stop when no pair remains), single-char-only
    vocab (zero merges), and the 'aaa' multiplicity rule."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.bpe import (
        bpe_merges_local,
    )

    df = spark.createDataFrame([("ab", 3), ("a", 5)], "word string, n long")
    got = bpe_merges_local(df, n_merges=50)
    assert got == _python_bpe({"ab": 3, "a": 5}, 50)
    assert len(got) == 1  # 'ab' merges once, then nothing remains

    single = spark.createDataFrame([("a", 9), ("b", 2)], "word string, n long")
    assert bpe_merges_local(single, n_merges=5) == []

    aaa = spark.createDataFrame([("aaa", 4)], "word string, n long")
    got3 = bpe_merges_local(aaa, n_merges=5)
    assert got3 == _python_bpe({"aaa": 4}, 5)
    assert got3[0] == (1, "a", "a", 8)  # 2 occurrences x count 4

"""Property-based tests (SURVEY.md §5.4) over the engine's pure-Python
and column-function kernels, via hypothesis."""

from __future__ import annotations

import math
import zlib

from hypothesis import given, settings, strategies as st

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
    DeterministicEmbedder,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.text import (
    ROLLING_BASE,
    ROLLING_MOD,
)

TEXTS = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=200,
)


@given(TEXTS)
@settings(max_examples=200, deadline=None)
def test_embedder_always_unit_norm_or_zero(text):
    vec = DeterministicEmbedder(dim=16).embed_batch([text])[0]
    assert len(vec) == 16
    n = math.sqrt(sum(x * x for x in vec))
    # all-whitespace/empty text hashes to the zero vector; else unit norm
    assert n == 0.0 or abs(n - 1.0) < 1e-5


def _reference_embed(text: str, dim: int) -> list[float]:
    """Independent reimplementation of the documented embedder spec:
    crc32-hashed bag of tokens, bucket h%dim, weight 1+(h>>16)%7,
    L2-normalized."""
    vec = [0.0] * dim
    for tok in text.lower().split():
        h = zlib.crc32(tok.encode("utf-8"))
        vec[h % dim] += 1.0 + (h >> 16) % 7
    n = math.sqrt(sum(x * x for x in vec))
    if n > 0:
        vec = [x / n for x in vec]
    return vec


@given(TEXTS)
@settings(max_examples=150, deadline=None)
def test_embedder_matches_independent_reference(text):
    got = DeterministicEmbedder(dim=32).embed_batch([text])[0]
    expected = _reference_embed(text, 32)
    assert all(abs(g - e) < 1e-6 for g, e in zip(got, expected))


@given(st.lists(st.text(alphabet="abcdef ", max_size=20), max_size=5))
@settings(max_examples=50, deadline=None)
def test_embedder_batch_equals_singles(texts):
    e = DeterministicEmbedder(dim=8)
    batch = e.embed_batch(texts)
    singles = [e.embed_batch([t])[0] for t in texts]
    assert batch == singles


def _py_rolling_hash(norm: str) -> int:
    h = 0
    for ch in norm:
        h = (h * ROLLING_BASE + ord(ch)) % ROLLING_MOD
    return h


def test_rolling_hash_matches_python_reference(spark):
    """The Catalyst fold must equal the obvious sequential definition."""
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.text import (
        normalized_text,
        rolling_hash,
    )

    samples = [
        "hello world", "  Mixed   CASE  text ", "a", "", "héllo wörld",
        "tabs\tand\nnewlines", "numbers 123 456", "ümlaut ünicode",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["text"])
    rows = df.select(
        "text",
        normalized_text(F.col("text")).alias("norm"),
        rolling_hash(F.col("text")).alias("h"),
    ).collect()
    for r in rows:
        expected = _py_rolling_hash(r.norm) if r.norm else 0
        assert r.h == expected, f"{r.text!r}: {r.h} != {expected}"


def test_q13b_approx_distinct_error_bound(spark, oracle_con):
    """q13b is a rows-only driver entry (HLL sketches are
    engine-specific), so this gate pins what 'approx' must mean:
    approx_count_distinct's estimate stays within its documented
    default relative error (rsd=0.05) of the exact DuckDB count —
    a silent regression to garbage estimates fails here."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    from conftest import SF_SMOKE

    row = plans.get_spec("q13b_approx_distinct").build(spark, SF_SMOKE).collect()[0]
    exact = oracle_con.execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    for approx, truth in zip((row.approx_parts, row.approx_orders), exact):
        rel_err = abs(approx - truth) / truth
        assert rel_err <= 3 * 0.05, f"approx {approx} vs exact {truth}: {rel_err:.3f}"


def test_q36b_approx_percentiles_error_bound(spark, oracle_con):
    """q36b's Greenwald-Khanna sketch with accuracy=10000 guarantees
    rank error <= n/10000; at this fixture size that means the estimate
    must land between the exact neighboring percentiles. Pin a looser
    but meaningful form: each approx percentile lies within the exact
    [p-1%, p+1%] value band."""
    import json

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    from conftest import SF_SMOKE

    rows = plans.get_spec("q36b_approx_percentiles").build(spark, SF_SMOKE).collect()
    for r in rows:
        approx = json.loads(r.approx_p)
        for p, est in zip((0.5, 0.9, 0.99), approx):
            lo, hi = oracle_con.execute(
                f"""
                SELECT quantile_cont(o_totalprice, {max(p - 0.01, 0.0)}),
                       quantile_cont(o_totalprice, {min(p + 0.01, 1.0)})
                FROM orders WHERE o_orderstatus = ?
                """,
                [r.status],
            ).fetchone()
            assert lo - 1e-9 <= est <= hi + 1e-9, (
                f"status {r.status} p{p}: {est} outside [{lo}, {hi}]"
            )


def test_d17_substring_dedup_invariants(spark, tmp_path):
    """Exact duplicate docs share every 8-token window (dup_fraction
    1.0 on both); a disjoint-vocabulary doc shares none (0.0)."""
    import os

    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        d17_substring_dedup,
    )

    sf = str(tmp_path / "sf_d17")
    a = " ".join(f"tok{i}" for i in range(20))
    b = " ".join(f"other{i}" for i in range(20))
    rows = [(1, a, "en", "web"), (2, a, "en", "web"), (3, b, "en", "web")]
    (
        spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
        .withColumn("n_chars", F.length("text"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(sf, "documents.parquet"))
    )
    out = {r.doc_id: r for r in d17_substring_dedup(spark, sf).collect()}
    assert out[1].n_windows == 13  # 20 tokens -> 13 distinct 8-windows
    assert out[1].dup_fraction == 1.0 and out[2].dup_fraction == 1.0
    assert out[3].dup_fraction == 0.0 and out[3].n_shared == 0


def test_q69_datasketches_error_bounds_and_topk(spark, oracle_con):
    """q69 is rows-only (sketch estimates are engine-specific); this
    gate pins the semantics: HLL and Theta estimates stay within 5%
    of the exact per-type distinct-user count (both are far below
    sketch saturation at this cardinality), and approx_top_k's item
    set contains the true modal user of the biggest event type."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    from conftest import SF_SMOKE

    rows = plans.get_spec("q69_datasketches").build(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        for est in (r.hll_users, r.theta_users):
            rel = abs(float(est) - r.exact_users) / max(r.exact_users, 1)
            assert rel <= 0.05, (r.event_type, est, r.exact_users)

    import json

    top = spark.sql(
        "SELECT event_type, to_json(approx_top_k(user_id, 5)) AS tk "
        f"FROM parquet.`{SF_SMOKE}/events.parquet` GROUP BY event_type"
    ).collect()
    exact_top = {
        (et): uid
        for et, uid in oracle_con.execute(
            """
            SELECT event_type, user_id FROM (
              SELECT event_type, user_id,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY COUNT(*) DESC, user_id) rn
              FROM events GROUP BY event_type, user_id
            ) WHERE rn = 1
            """
        ).fetchall()
    }
    for r in top:
        items = {int(d["item"]) for d in json.loads(r.tk)}
        assert exact_top[r.event_type] in items, (r.event_type, items)


def test_t21_closed_form_equals_iterative_greedy(spark, tmp_path):
    """t21 claims the greedy budget waterfill collapses to one window
    cumsum. Pin that claim against an explicit sequential greedy on
    constructed corpora, including budget-exhaustion mid-source and
    cap-bound sources."""
    import os

    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    cases = [
        [40, 30, 20, 10],            # plenty of budget spread
        [1000, 1, 1, 1],             # cap binds the giant source
        [7, 7, 7, 7, 7, 7, 7, 7],    # exhaustion mid-list with ties
        [3],                         # single source
        [100, 90, 80, 5, 4, 3, 2, 1],
    ]
    for idx, toks_per_source in enumerate(cases):
        rows = []
        doc_id = 0
        for s_i, n_toks in enumerate(toks_per_source):
            # one document per source with exactly n_toks tokens
            rows.append(
                (doc_id, " ".join(f"w{j}" for j in range(n_toks)),
                 "en", f"src{s_i:02d}")
            )
            doc_id += 1
        sf_dir = str(tmp_path / f"case{idx}")
        (
            spark.createDataFrame(
                rows, "doc_id long, text string, lang string, source string"
            )
            .withColumn("n_chars", F.length("text"))
            .write.mode("overwrite")
            .parquet(os.path.join(sf_dir, "documents.parquet"))
        )
        got = {
            r["source"]: (r["tokens_available"], r["tokens_allocated"])
            for r in plans.get_spec("t21_mixture_allocation")
            .build(spark, sf_dir)
            .collect()
        }
        # Explicit sequential greedy: biggest first, per-source cap,
        # stop at budget.
        total = sum(toks_per_source)
        budget = total // 2
        cap = budget * 3 // 10
        order = sorted(
            ((t, f"src{i:02d}") for i, t in enumerate(toks_per_source)),
            key=lambda x: (-x[0], x[1]),
        )
        remaining = budget
        want = {}
        for t, src in order:
            a = max(0, min(t, cap, remaining))
            want[src] = (t, a)
            remaining -= a
        assert got == want, (idx, got, want)


def test_q72_theta_setops_error_bounds(spark, oracle_con):
    """q72 is rows-only (sketch estimates are engine-specific); pin the
    semantics: every sketch-side set-operation cardinality lands within
    5% of the exact value (far below sketch saturation here), and the
    inclusion-exclusion identity holds between the reported exacts."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    from conftest import SF_SMOKE

    row = plans.get_spec("q72_theta_setops").build(spark, SF_SMOKE).collect()[0]
    exact_union, exact_inter, exact_diff = oracle_con.execute(
        """
        SELECT
          COUNT(DISTINCT CASE WHEN event_type IN ('click','error')
                THEN user_id END),
          COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
          + COUNT(DISTINCT CASE WHEN event_type = 'error' THEN user_id END)
          - COUNT(DISTINCT CASE WHEN event_type IN ('click','error')
                  THEN user_id END),
          (SELECT COUNT(DISTINCT user_id) FROM events
           WHERE event_type = 'click' AND user_id NOT IN
             (SELECT user_id FROM events WHERE event_type = 'error'))
        FROM events
        """
    ).fetchone()
    assert row.n_union_exact == exact_union
    assert row.n_intersect_exact == exact_inter
    for est, truth in (
        (row.n_union_theta, exact_union),
        (row.n_intersect_theta, exact_inter),
        (row.n_diff_theta, exact_diff),
    ):
        rel = abs(est - truth) / max(truth, 1)
        assert rel <= 0.05, (est, truth)


def test_w12b_sketch_wau_error_bounds(spark):
    """w12b is rows-only (HLL estimates are engine-specific); gate it
    against w12's exact answer: same day set, and every day's dau/wau
    estimate within 5% relative error (~3x the lgConfigK=12 standard
    error, far below saturation at this scale)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    from conftest import SF_ORACLE

    exact = {
        r.day: (r.dau, r.wau_7d)
        for r in plans.get_spec("w12_rolling_active_users")
        .build(spark, SF_ORACLE)
        .collect()
    }
    est = {
        r.day: (r.dau_est, r.wau_7d_est)
        for r in plans.get_spec("w12b_sketch_wau").build(spark, SF_ORACLE).collect()
    }
    assert set(est) == set(exact)
    for day, (dau, wau) in exact.items():
        dau_e, wau_e = est[day]
        assert abs(dau_e - dau) / dau <= 0.05, (day, dau_e, dau)
        assert abs(wau_e - wau) / wau <= 0.05, (day, wau_e, wau)


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(-3, 3)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 12),
)
@settings(max_examples=300, deadline=None)
def test_twophase_sweep_identity(points, n_buckets):
    """The identity under w13b (sweep_line_peaks_twophase): for ANY
    multiset of (t, delta) points and ANY monotone bucketing of t, the
    max running prefix sum (points ordered by (t, delta)) equals
    max over buckets of (sum of earlier buckets' deltas + the bucket's
    local max prefix). Random deltas (not just ±1) prove the
    decomposition needs nothing interval-specific."""
    ordered = sorted(points)
    run, peak = 0, None
    for _, d in ordered:
        run += d
        peak = run if peak is None else max(peak, run)

    lo = min(t for t, _ in points)
    hi = max(t for t, _ in points)
    width = max(hi - lo, 1) / n_buckets

    def bucket(t):
        return min(n_buckets - 1, int((t - lo) / width))

    local_max: dict = {}
    totals: dict = {}
    for t, d in ordered:
        b = bucket(t)
        totals[b] = totals.get(b, 0) + d
        local_max[b] = (
            totals[b] if b not in local_max else max(local_max[b], totals[b])
        )
    carry, twophase = 0, None
    for b in sorted(totals):
        cand = carry + local_max[b]
        twophase = cand if twophase is None else max(twophase, cand)
        carry += totals[b]
    assert twophase == peak


def test_t24_temperature_apportionment_invariants(spark):
    """t24: allocations are a largest-remainder apportionment of the
    half-corpus budget over sqrt-flattened source masses — exact-sum
    (unless a cap bites), boost-the-tail ordering, and equality with a
    pure-Python reimplementation."""
    import math

    from conftest import SF_SMOKE

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    counts = {
        r.source: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(__import__("pyspark").sql.functions.count("*").alias("n"))
        .collect()
    }
    s = {src: math.isqrt(n) for src, n in counts.items()}
    S = sum(s.values())
    B = sum(counts.values()) // 2
    base = {src: (B * v) // S for src, v in s.items()}
    rem = {src: (B * v) % S for src, v in s.items()}
    leftover = B - sum(base.values())
    order = sorted(counts, key=lambda src: (-rem[src], src))
    want = {}
    for i, src in enumerate(order):
        a = base[src] + (1 if i < leftover else 0)
        want[src] = min(a, counts[src])

    got = {
        r.source: r.n_allocated
        for r in plans.get_spec("t24_temperature_mixture")
        .build(spark, SF_SMOKE)
        .collect()
    }
    assert got == want
    if all(want[src] < counts[src] for src in want):
        assert sum(got.values()) == B
    # flattening: smaller sources get a HIGHER sample rate
    rates = {
        src: got[src] / counts[src] for src in got
    }
    by_size = sorted(counts, key=counts.get)
    assert rates[by_size[0]] >= rates[by_size[-1]]


def test_p20_packing_matches_sequential_reference(spark, tmp_path):
    """p20's window-expression bin packing equals a pure-Python
    sequential first-fit-in-order packer on adversarial listings
    (all-small source, all-big source, a file exactly AT the
    threshold, and seeded random sizes), and every compact bin is a
    contiguous doc_id range whose size can overshoot the target by at
    most one sub-threshold file."""
    import random

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _P20_SMALL,
        _P20_TARGET,
        p20_compaction_planner,
    )

    rng = random.Random(1234)
    rows = []
    doc_id = 0
    # all-small, all-big, boundary, and mixed-random sources
    for src, sizes in {
        "tiny": [50] * 40,
        "big": [5000] * 5,
        "edge": [_P20_SMALL - 1, _P20_SMALL, _P20_SMALL + 1, 1],
        "mix": [rng.randrange(1, 900) for _ in range(120)],
    }.items():
        for sz in sizes:
            rows.append((doc_id, "x", "en", src, sz))
            doc_id += 1
    rng.shuffle(rows)  # physical order must not matter (window orders)

    sf = tmp_path / "p20sf"
    sf.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(sf / "documents.parquet"))

    got = {
        (r.source, r.action, r.bin_id): (
            r.n_files, r.total_chars, r.min_doc, r.max_doc
        )
        for r in p20_compaction_planner(spark, str(sf)).collect()
    }

    # pure-Python reference: first-fit-in-order by exclusive running sum
    want = {}
    by_src = {}
    for d, _, _, src, sz in sorted(rows):
        by_src.setdefault(src, []).append((d, sz))
    for src, files in by_src.items():
        cum = 0
        for d, sz in files:
            if sz >= _P20_SMALL:
                want[(src, "keep", -(d + 1))] = (1, sz, d, d)
                continue
            b = cum // _P20_TARGET
            k = (src, "compact", b)
            n, tot, lo, hi = want.get(k, (0, 0, d, d))
            want[k] = (n + 1, tot + sz, min(lo, d), max(hi, d))
            cum += sz
    assert got == want

    # contract: contiguous id ranges and bounded overshoot per source
    for src in by_src:
        bins = sorted(
            (b, v) for (s, a, b), v in got.items()
            if s == src and a == "compact"
        )
        for (b1, v1), (b2, v2) in zip(bins, bins[1:]):
            assert v1[3] < v2[2], "bins must cover disjoint ascending id ranges"
        for _, (_, tot, _, _) in bins[:-1]:
            assert tot >= _P20_TARGET - _P20_SMALL  # closed bins are near-full
        for _, (_, tot, _, _) in bins:
            assert tot < _P20_TARGET + _P20_SMALL  # overshoot < one small file


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_identity(width, height, data):
    """m03b's codec on arbitrary pixel matrices: encode -> decode is the
    identity for every dimension/filter combination (scanline r carries
    filter r % 5, so any height >= 5 exercises the full suite including
    Paeth), and the decoder reports the exact per-row filter types it
    read from the inflated stream."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=width * 3 * height,
                max_size=width * 3 * height,
            )
        )
    )
    w, h, out, filters = decode_png(encode_png(px, width, height))
    assert (w, h) == (width, height)
    assert out == px
    assert filters == [r % 5 for r in range(height)]


_SYMS = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=3), min_size=0, max_size=12
)


@given(_SYMS, st.text(alphabet="ab", min_size=1, max_size=3),
       st.text(alphabet="ab", min_size=1, max_size=3))
@settings(max_examples=200, deadline=None)
def test_delimiter_wrapped_replace_equals_greedy_merge(syms, left, right):
    """The identity the t27/t23b oracles rest on: one literal
    ``replace`` over a GS/RS-wrapped symbol string == the greedy
    left-to-right non-overlapping pair merge, for ARBITRARY symbol
    sequences and merge pairs — including the adversarial cases
    (runs like a,a,a,a; left == right; symbols that are prefixes of
    other symbols; multi-char symbols containing the pair's text)."""
    gs, rs = chr(29), chr(30)

    # the Python greedy fold (operators/bpe._merge_pair semantics)
    i, greedy = 0, []
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            greedy.append(left + right)
            i += 2
        else:
            greedy.append(syms[i])
            i += 1

    rep = "".join(gs + s + rs for s in syms)
    rep = rep.replace(gs + left + rs + gs + right + rs, gs + left + right + rs)
    unwrapped = [
        t[:-1] for t in rep.split(gs) if t != ""
    ]  # each token ends with RS
    assert unwrapped == greedy


@given(st.text(min_size=0, max_size=40), st.integers(1, 64))
@settings(max_examples=100, deadline=None)
def test_put_records_hash_routing_is_total_and_stable(pk, n_shards):
    """The PutRecords hash-range rule (md5 as a 128-bit int mapped to
    evenly-divided ranges) lands every key in a valid shard, and the
    mapping is monotone in the hash (the defining property of
    range-partitioning — key order by hash equals shard order)."""
    import hashlib as _hashlib

    h = int(_hashlib.md5(pk.encode()).hexdigest(), 16)
    idx = h * n_shards >> 128
    assert 0 <= idx < n_shards
    # boundary exactness: the top of each range maps to the same shard
    lo = (idx << 128) // n_shards  # not exact inverse, sanity only
    assert (h >= lo) or idx == 0


@given(
    st.sampled_from(["GET", "POST", "PUT", "HEAD"]),
    st.text(alphabet="abcdef/", min_size=1, max_size=10).map(
        lambda s: "/" + s.strip("/")
    ),
    st.binary(max_size=32),
)
@settings(max_examples=60, deadline=None)
def test_sigv4_signature_binds_every_input(method, path, body):
    """Changing ANY signed input — method, path, body, date, region,
    service, or secret — changes the signature (the binding property
    the conformance vectors can only spot-check)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.kinesis_lite import (
        sigv4_authorization,
    )

    headers = {"host": "example.amazonaws.com", "x-amz-date": "20240101T000000Z"}

    def sig(m=method, p=path, b=body, date="20240101T000000Z",
            region="us-east-1", service="kinesis", secret="secret"):
        return sigv4_authorization(
            m, p, dict(headers, **{"x-amz-date": date}), b, region,
            service, "AKIDEXAMPLE", secret, date,
        ).rsplit("Signature=", 1)[1]

    base = sig()
    assert sig() == base  # deterministic
    assert sig(m="PATCH") != base
    assert sig(p=path + "x") != base
    assert sig(b=body + b"x") != base
    assert sig(date="20240102T000000Z") != base
    assert sig(region="eu-west-1") != base
    assert sig(service="es") != base
    assert sig(secret="other") != base

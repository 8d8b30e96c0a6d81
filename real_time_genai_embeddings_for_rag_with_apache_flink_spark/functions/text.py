"""Text-analysis column functions — pure Catalyst expressions.

The reference's only text operation is the empty-check filter
(``KDS-P/.../msf/DataStreamJob.java:146``). These are the
training-data-pipeline additions (language ID, quality scoring, token
counting, fingerprinting), built entirely from JVM-side built-ins so the
hot path never leaves whole-stage codegen. Every function has an exact
ANSI-SQL twin in plans/catalog.py for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language marker stopwords for the n-gram/stopword language heuristic.
# Word-boundary regexes keep Spark's regexp_count and DuckDB's
# regexp_extract_all in exact agreement.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|was|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans)\b",
    "es": r"\b(el|los|las|es|una|para|por|con)\b",
}
CJK_PATTERN = r"[一-鿿]"


def normalized_text(text: Column) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for null/empty/blank text."""
    t = F.trim(text)
    return F.when(
        t.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, r"\s+")))


# BPE-ish subword pre-tokenization: runs of letters, runs of digits, or a
# single non-space symbol — the split GPT-style BPE applies before merges.
# Character classes only, so the Java and RE2 regex dialects agree exactly.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """BPE-style pre-token count (letter runs + digit runs + symbols);
    0 for null/empty text. An upper bound on merged-BPE token count and
    the standard cheap proxy for LLM corpus token accounting."""
    return F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))
    )


# Rolling-hash parameters (shared with the DuckDB oracle SQL): classic
# polynomial hash, base 31 mod 1e9+7 — acc stays < 3.3e10, inside BIGINT.
ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash of the normalized text's code points:
    h = (h*31 + ascii(ch)) mod 1e9+7, folded left with the aggregate
    higher-order function — no UDF, no shuffle, engine-portable."""
    chars = F.split(normalized_text(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * ROLLING_BASE + F.ascii(ch)) % ROLLING_MOD,
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Exact-dedup key; identical across engines (md5 is standard), unlike
    the reference's random UUID identity
    (CustomMessageToJSONObject.java:25).
    """
    return F.md5(normalized_text(text))


def language_guess(text: Column) -> Column:
    """Stopword-marker language heuristic over en/de/fr/es + CJK.

    Ties break in fixed order (en, de, fr, es) via strict greater-than
    chaining; CJK presence dominates.
    """
    lowered = F.lower(text)
    counts = {k: F.regexp_count(lowered, F.lit(p)) for k, p in LANG_MARKERS.items()}
    cjk = F.regexp_count(text, F.lit(CJK_PATTERN))
    best = F.greatest(*counts.values())
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .when(counts["en"] == best, F.lit("en"))
        .when(counts["de"] == best, F.lit("de"))
        .when(counts["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length, alpha ratio, mean word length.

    Deterministic per-row double arithmetic (no aggregation), so the
    DuckDB twin reproduces it bit-for-bit before rounding.
    """
    t = F.trim(text)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^\p{L}]", "")).cast("double")
    toks = token_count(text).cast("double")
    len_component = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    mean_wordlen = F.when(toks > 0, n / toks).otherwise(F.lit(0.0))
    wordlen_component = F.least(mean_wordlen / F.lit(8.0), F.lit(1.0))
    return F.when(t.isNull() | (n == 0), F.lit(0.0)).otherwise(
        F.lit(0.4) * len_component + F.lit(0.4) * alpha_ratio + F.lit(0.2) * wordlen_component
    )

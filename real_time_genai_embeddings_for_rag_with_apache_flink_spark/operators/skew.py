"""Skew mitigation: salted joins and two-phase aggregation.

The reference never shuffles (parallelism 1, no keyed operators —
SURVEY.md §2A chain semantics), so skew is purely an at-scale concern of
this engine. AQE's skew-join splitting (on in session.py) handles most
sort-merge cases at runtime; explicit salting is for the cases AQE can't
touch: broadcast-ineligible hot keys feeding stateful streaming joins,
and hot-key aggregations where a single reducer melts.

Salting trades one extra narrow column + a small-side replication factor
for an even key distribution: a key carrying 30% of a 100 TB shuffle
becomes `salt` keys carrying ~30/salt % each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt``
    buckets; the small side is replicated ``salt`` times so every bucket
    finds its match. Row-deterministic: the salt is a hash of the big
    side's whole row, so replays land identically.

    Supports inner and left joins (the replicated side must be the
    lookup side, so right/full would double-count unmatched rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column {_SALT!r} already exists")
    big_s = big.withColumn(_SALT, F.pmod(F.hash(*big.columns), F.lit(salt)))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, [on, _SALT], how).drop(_SALT)


def salted_count_sum(
    df: DataFrame, key: str, value: str, salt: int = 16
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial count/sum per
    (key, salt) — at most ``salt`` rows per hot key survive phase 1 —
    then final combine per key. Associative aggregates only, by
    construction. Returns (key, n, total)."""
    phase1 = (
        df.withColumn(_SALT, F.pmod(F.hash(*df.columns), F.lit(salt)))
        .groupBy(key, _SALT)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value).alias("total"))
    )
    return phase1.groupBy(key).agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    )

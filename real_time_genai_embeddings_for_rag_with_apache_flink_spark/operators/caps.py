"""Bounded per-key head: keep at most ``n`` rows per key under a total
order — the scale-safe building block behind per-source corpus caps
(down-sampling over-represented domains/sources before training).

The scale worry with ``row_number() OVER (PARTITION BY key)`` is the
hot key: web corpora are Zipf-distributed (one domain can be >10% of
the crawl), and a naive window funnels EVERY row of a key into one
reducer. Spark already solves this declaratively: a rank-limit filter
over a window is rewritten by Catalyst into a two-phase
``WindowGroupLimit`` — a *Partial* group-limit runs on the scan
partitions BEFORE the exchange (each map task forwards at most ``n``
rows per key it has seen), and a *Final* limit + exact window run after
the shuffle. The shuffle therefore carries at most ``n * n_map_tasks``
rows per key, independent of the key's true row count — the same bound
a hand-built partial top-k stage would give, with zero Python crossing
and whole-stage codegen intact.

tests/test_semdedup.py pins the plan: ``WindowGroupLimit … Partial``
must sit below the hash exchange. If a Spark version ever stopped
planning the partial phase, that test — not a 100 TB incident — catches
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    tiebreak_col: str,
    n: int,
) -> DataFrame:
    """At most ``n`` rows per ``key_col``, the first ``n`` under
    (order_col ASC, tiebreak_col ASC) — a total order when the
    tiebreaker is unique. Adds a 1-based ``pick`` rank column."""
    w = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    return (
        df.withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= n)
    )

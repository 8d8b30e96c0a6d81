"""Distributed EXACT global ranking — ROW_NUMBER over the whole table
without the whole table in one task.

A plain ``ROW_NUMBER() OVER (ORDER BY ...)`` plans as a single-partition
window: every row funnels through one task, which is the canonical
100 TB scale-killer. The two-phase construction here avoids it:

1. bucket every row by a DETERMINISTIC PURE FUNCTION OF ITS VALUES — a
   flat sum of ``key > cut_i`` indicators over driver-collected
   approximate quantile cuts. Any cut placement is CORRECT (cuts only
   balance load): all rows with equal first-key land in one bucket, so
   buckets are contiguous ranges of the total order. Crucially, the
   bucket does NOT depend on physical partitioning (``repartitionByRange``
   + ``spark_partition_id`` would — and RangePartitioner re-samples
   boundaries per job, so a two-action plan could disagree with itself);
2. one driver-sized aggregate of per-bucket counts -> cumulative
   offsets, broadcast back;
3. ``rank = offset[bucket] + row_number() OVER (PARTITION BY bucket
   ORDER BY keys)`` — a parallel window, each group one bucket.

Bit-identical to the single-task ROW_NUMBER (callers pass a unique last
key as the tiebreak); the heavy work spreads over ``num_buckets`` window
groups and only ``num_buckets`` rows ever touch the driver. This is the
engine's building block for exact quantile assignment (t26's curriculum
deciles) and other order-statistics operators.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_by_quantiles(
    df: DataFrame, num_col: str, num_buckets: int = 32
) -> Column:
    """A 0-based range-bucket expression for ``num_col``: the count of
    driver-collected approximate quantile cuts strictly below the value
    (a FLAT sum of indicator terms — linear expression size, pure
    codegen). Equal values always share a bucket; bucket index is
    monotone in the value.

    NULL values of ``num_col`` land in bucket 0 (``NULL > cut`` is NULL,
    so every indicator contributes its ``otherwise(0)`` arm); callers
    whose key order must place NULLs elsewhere should coalesce first.

    Degenerate inputs collapse the bucketing: an all-NULL ``num_col``
    yields NO cuts (warned in _quantile_cuts), and a constant or
    heavy-tie column collapses every requested quantile to one cut
    (warned when num_buckets > 2 asked for several); in both cases all
    rows land in ONE bucket and the downstream per-bucket window runs
    single-task — correct, but the exact scale funnel this operator
    exists to avoid. Warned, not raised, because for heavy-tie keys one
    bucket IS the total order's true shape and results remain exact;
    distributed_rank additionally checks the REALIZED histogram, which
    catches every residual single-bucket case.
    """
    bucket = F.lit(0)
    for c in _quantile_cuts(df, num_col, num_buckets):
        bucket = bucket + F.when(F.col(num_col) > F.lit(c), 1).otherwise(0)
    return bucket


def _quantile_cuts(df: DataFrame, num_col: str, num_buckets: int) -> list:
    """Sorted distinct approximate quantile cuts for ``num_col``; warns
    when the list is empty (all-NULL column) or when several requested
    quantiles collapse to one cut (constant / heavy-tie column) — both
    single-bucket degradations."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = sorted(set(df.stat.approxQuantile(num_col, probs, 0.001)))
    if num_buckets > 2 and len(cuts) == 1:
        warnings.warn(
            f"bucket_by_quantiles({num_col!r}): all {len(probs)} requested "
            "quantiles collapsed to one cut (constant or heavy-tie "
            "column); most rows will share one bucket and its window "
            "degrades toward a single task. Results stay exact, but at "
            "scale pick a less degenerate first key.",
            RuntimeWarning,
            stacklevel=3,
        )
    if num_buckets > 1 and not cuts:
        warnings.warn(
            f"bucket_by_quantiles({num_col!r}): no usable quantile cuts "
            "(all-NULL column); every row lands in one "
            "bucket and the per-bucket window degrades to a single "
            "task. Results stay exact, but at scale pick a less "
            "degenerate first key.",
            RuntimeWarning,
            stacklevel=3,
        )
    return cuts


def distributed_rank(
    df: DataFrame,
    keys: list[str],
    out_col: str = "rnk",
    num_buckets: int = 32,
    stats: dict | None = None,
) -> DataFrame:
    """Append ``out_col`` = exact 1-based global ROW_NUMBER over
    ``ORDER BY keys``. ``keys[0]`` must be numeric (it feeds the
    quantile bucketing); the full key list must form a total order —
    include a unique tiebreaker. Two driver-sized actions (quantile
    probe, bucket counts); no single-partition exchange anywhere.
    Pass ``stats`` (a dict) to receive ``stats['total']`` — the exact
    row count, already summed from the bucket counts, so callers that
    need n (quantile assignment) never pay a third corpus scan."""
    spark = df.sparkSession
    bucketed = df.withColumn(
        "_rk_bkt", bucket_by_quantiles(df, keys[0], num_buckets)
    )
    counts = sorted(
        (r["_rk_bkt"], r["cnt"])
        for r in bucketed.groupBy("_rk_bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets, acc = [], 0
    for bkt, cnt in counts:
        offsets.append((bkt, acc))
        acc += cnt
    if num_buckets > 1 and len(counts) <= 1 and acc > 1:
        # _quantile_cuts warns on an EMPTY cut list (all-NULL key); a
        # constant key instead yields one cut that no row exceeds, which
        # only the realized bucket histogram can see.
        warnings.warn(
            f"distributed_rank({keys[0]!r}): all {acc} rows landed in a "
            "single bucket (constant or near-constant first key); the "
            "rank window runs single-task. Results stay exact.",
            RuntimeWarning,
            stacklevel=2,
        )
    if stats is not None:
        stats["total"] = acc
    offs = spark.createDataFrame(
        offsets or [(0, 0)], "_rk_bkt int, _rk_off long"
    )
    w = Window.partitionBy("_rk_bkt").orderBy(*keys)
    return (
        bucketed.join(F.broadcast(offs), "_rk_bkt")
        .withColumn(out_col, F.col("_rk_off") + F.row_number().over(w))
        .drop("_rk_bkt", "_rk_off")
    )

"""Reshaping + statistical aggregates: pivot, unpivot, percentiles,
deterministic sampling.

None exist in the reference (SURVEY.md §0 — its job is a linear
dataflow); they round out the §2B relational surface. All are plain
Catalyst plans:

- pivot is a conditional aggregation (one shuffle, same as the group-by);
- unpivot is Catalyst's Expand (rows x n_measures, no shuffle);
- exact percentiles use linear interpolation (identical definition to
  DuckDB's quantile_cont, so the oracle matches); at 100 TB swap in
  approx_percentile — same plan shape, fixed-size sketch;
- sampling is hash-mod on a key: deterministic, reproducible across
  engines and runs, and pushable — unlike TABLESAMPLE's RNG, this is the
  form a training-data pipeline can re-materialize bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import query


@query(
    "q34_pivot",
    oracle="""
SELECT o_orderpriority AS priority,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS spend_f
FROM orders GROUP BY o_orderpriority
""",
    tags=("pivot", "aggregation"),
)
def q34_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = conditional aggregation over an explicit value list (the
    explicit list keeps the plan single-pass; an unlisted pivot needs an
    extra distinct scan to discover columns)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.coalesce(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1)), F.lit(0)
        ).alias("n_f"),
        F.coalesce(
            F.sum(F.when(F.col("o_orderstatus") == "O", 1)), F.lit(0)
        ).alias("n_o"),
        F.coalesce(
            F.sum(F.when(F.col("o_orderstatus") == "P", 1)), F.lit(0)
        ).alias("n_p"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.col("o_totalprice").cast("decimal(12,2)"),
                )
            ),
            F.lit(0),
        )
        .cast("double")
        .alias("spend_f"),
    )


@query(
    "q34b_pivot_native",
    oracle="""
SELECT o_orderpriority AS priority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
FROM orders GROUP BY o_orderpriority
""",
    tags=("pivot", "aggregation"),
)
def q34b_pivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame pivot() operator itself (explicit value list; count
    of empty cells is NULL on both sides)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


@query(
    "q35_unpivot",
    oracle="""
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, 'quantity' AS measure,
       CAST(l_quantity AS DOUBLE) AS val
FROM lineitem WHERE l_orderkey < 500
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', CAST(l_discount AS DOUBLE)
FROM lineitem WHERE l_orderkey < 500
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', CAST(l_tax AS DOUBLE)
FROM lineitem WHERE l_orderkey < 500
""",
    tags=("unpivot",),
)
def q35_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt wide measures into (measure, val) rows — a Catalyst
    Expand node: rows x 3 with no shuffle (the oracle spells it as the
    equivalent UNION ALL)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    ).unpivot(
        ["orderkey", "linenumber"],
        ["quantity", "discount", "tax"],
        "measure",
        "val",
    )


@query(
    "q36_percentiles",
    oracle="""
SELECT o_orderstatus AS status,
  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus
""",
    tags=("aggregation", "percentile"),
)
def q36_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark percentile ==
    DuckDB quantile_cont, both linear interpolation). Exact percentile
    materializes each group's values — fine per-group here; at 100 TB
    use approx_percentile (t-digest sketch, same call shape)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "d07_hash_sample",
    oracle="""
SELECT doc_id, lang, n_chars
FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 10 = 0
""",
    tags=("sampling", "dedup"),
)
def d07_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash (md5 mod 10). Reproducible
    across engines/runs/partitionings — the sampling primitive a
    training pipeline needs for held-out splits (TABLESAMPLE's RNG is
    none of those things)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint")
        % 10
    )
    return docs.filter(bucket == 0).select("doc_id", "lang", "n_chars")


@query(
    "r01_salted_join",
    oracle="""
SELECT o.o_orderkey AS orderkey, c.c_name AS cust_name
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
""",
    tags=("join", "skew"),
)
def r01_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient salted join (operators/skew.py): the fact side's
    hot keys spread over 8 salt buckets, the dimension replicated per
    bucket. The oracle is the PLAIN join — salting must be invisible in
    the result, which is exactly what the value-hash check proves."""
    from ..operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    return salted_join(o, c, "custkey", salt=8).select(
        F.col("o_orderkey").alias("orderkey"), F.col("c_name").alias("cust_name")
    )


@query(
    "r02_salted_aggregation",
    oracle="""
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS total
FROM events GROUP BY event_type
""",
    tags=("aggregation", "skew"),
)
def r02_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot grouping keys
    (operators/skew.py): partial per (key, salt) then final per key.
    The oracle is the plain GROUP BY — associativity makes the salting
    invisible."""
    from ..operators.skew import salted_count_sum

    ev = load_table(spark, sf_dir, "events")
    return salted_count_sum(ev, "event_type", "value", salt=8).select(
        "event_type", "n", F.round("total", 6).alias("total")
    )


@query(
    "q36b_approx_percentiles",
    oracle=None,  # sketch estimates are engine-specific by construction
    tags=("aggregation", "percentile", "approx"),
)
def q36b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch): the at-scale
    replacement for q36's exact percentiles — fixed-size state, one
    pass, mergeable across partitions. Rows-only check (sketch values
    are engine-specific); q36 pins the exact semantics."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias(
            "approx_p"
        )
    )
    return agg.withColumn("approx_p", F.to_json(F.col("approx_p")))


@query(
    "d09_stratified_sample",
    oracle="""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
    ROW_NUMBER() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 25
""",
    tags=("sampling", "text"),
)
def d09_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: exactly 25 documents per language, chosen by
    hash order — the balanced-subset primitive for mixing training data
    across strata. Hash ordering makes the draw uniform-ish yet fully
    deterministic and engine-reproducible (row_number over md5, total
    tiebreak); one shuffle on the stratum key."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .select("doc_id", "lang")
    )


@query(
    "q64_histogram",
    oracle="""
SELECT CAST(FLOOR(l_extendedprice / 10000.0) + 1 AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(MIN(l_extendedprice), 2) AS lo,
  ROUND(MAX(l_extendedprice), 2) AS hi
FROM lineitem
GROUP BY 1 ORDER BY bucket
""",
    tags=("aggregation", "histogram"),
)
def q64_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram over l_extendedprice via width_bucket
    (11 buckets of 10k over [0, 110k) — on this domain width_bucket
    equals floor(x/10000)+1, which is the engine-portable oracle
    arithmetic). One partial+final hash aggregate on an 11-value key:
    the classic profiling scan whose shuffle is O(buckets), not
    O(rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.width_bucket(
        F.col("l_extendedprice"), F.lit(0.0), F.lit(110000.0), F.lit(11)
    )
    return (
        li.groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q65_string_agg",
    oracle="""
SELECT r_name AS region, COUNT(*) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name
""",
    tags=("aggregation", "string-agg"),
)
def q65_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): per region, the
    alphabetical comma-joined nation list. Spark has no ordered
    string_agg aggregate; the engine-portable form is collect_list ->
    array_sort -> array_join, which keeps the per-group ordering
    deterministic regardless of partition arrival order (a bare
    collect_list order is execution-dependent and would never
    hash-match). Group sizes here are dimension-small; for corpus-sized
    groups the same pattern applies with a size cap (t14's
    WindowGroupLimit rank-cap) in front."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
        )
    )


@query(
    "q66_window_distribution",
    oracle="""
SELECT o_orderkey, o_custkey,
  NTILE(4) OVER w AS quartile,
  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
  ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window", "distribution"),
    bench=True,
)
def q66_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — NTILE, PERCENT_RANK, CUME_DIST
    per order-status partition ordered by price (total tiebreaker on
    the key, so ranks are deterministic on both engines). Completes the
    window-function surface next to q17-q19/q44's rank/frame/navigation
    coverage; one hash exchange on the partition key, all three
    functions share the single sort."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )

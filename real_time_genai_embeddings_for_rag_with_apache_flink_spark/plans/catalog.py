"""Core relational query catalog (SURVEY.md section 2B).

The reference implements none of these (its job is a linear
source->map->filter->embed->sink dataflow, SURVEY.md section 0); they are
the declared relational surface of the engine, each expressed as a
declarative DataFrame plan so Catalyst applies pushdown/pruning/join
selection, with the exact DuckDB oracle SQL alongside.

Scale notes (the local[32] numbers verify correctness; the plan shapes
are chosen for the 1000-executor case):
- dimension tables (region/nation/supplier) are broadcast explicitly;
  fact-fact joins shuffle on their keys and rely on AQE for skew;
- aggregations are expressed as groupBy().agg() so partial (map-side)
  aggregation happens before the shuffle;
- every top-k uses orderBy+limit (TakeOrderedAndProject: per-partition
  heap + single driver merge, no global sort) or a per-group window rank;
- money aggregates are DECIMAL-exact then cast to double (associative,
  so the result is independent of partitioning / merge order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table
from .registry import query


def dec(c: str | Column, prec: int = 12, scale: int = 2) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({prec},{scale})")


def one() -> Column:
    """Exact DECIMAL literal 1.00, built lazily so importing this module
    never touches the JVM (F.lit at module scope requires an active
    SparkContext; query builders only run with a session in hand)."""
    return F.lit(1).cast("decimal(3,2)")

# ---------------------------------------------------------------------------
# Filters / projection / scan pushdown
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
           * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("aggregation", "filter"),
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filter + hash aggregate. Partial
    aggregation collapses 6 M rows/SF to 6 groups before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (one() - dec("l_discount"))
    charge = disc_price * (one() + dec("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount", 3, 2)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q02_filter_projection",
    oracle="""
SELECT l_orderkey, l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
    AS disc_price,
  l_returnflag
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_returnflag IN ('A', 'R')
  AND (l_quantity > 45 OR l_discount >= 0.09)
  AND l_tax IS NOT NULL
""",
    tags=("filter", "projection"),
)
def q02_filter_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive/IN/BETWEEN predicates + computed projection.
    All predicates reach the parquet scan as PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_quantity") > 45) | (F.col("l_discount") >= 0.09))
        & F.col("l_tax").isNotNull()
    ).select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * (one() - dec("l_discount")))
        .cast("double")
        .alias("disc_price"),
        "l_returnflag",
    )


@query(
    "q06_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    tags=("filter", "aggregation"),
    bench=True,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate; the canonical
    pushdown benchmark (selective scan, no shuffle beyond 1-row merge)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 3, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Joins — every type
# ---------------------------------------------------------------------------


@query(
    "q03_shipping_priority",
    oracle="""
SELECT l.l_orderkey AS orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS revenue,
  o.o_orderdate AS orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15' AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey LIMIT 10
""",
    tags=("join", "aggregation", "topk"),
    bench=True,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k. customer is filtered
    before the join so the build side shrinks; top-10 is
    TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(li.l_orderkey.alias("orderkey"), o.o_orderdate.alias("orderdate"))
        .agg(
            F.sum(dec("l_extendedprice") * (one() - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@query(
    "q05_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    tags=("join", "aggregation"),
    bench=True,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. region/nation/supplier are broadcast
    (they stay tiny at every SF), so only the customer-orders-lineitem
    chain shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(
            F.sum(dec("l_extendedprice") * (one() - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q07_join_left_nulls",
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name,
  COUNT(o.o_orderkey) AS n_orders,
  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS spend,
  MAX(o.o_orderdate) AS last_order
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
GROUP BY c.c_custkey, c.c_name
""",
    tags=("join", "null-semantics"),
)
def q07_join_left_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an extra join-side predicate; customers with
    no 'F' orders survive with n_orders=0 / spend=0 / null last_order —
    the null semantics the reference leaves implicit (SURVEY.md 1.2)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left"
    )
    return joined.groupBy(
        c.c_custkey.alias("custkey"), c.c_name.alias("name")
    ).agg(
        F.count(o.o_orderkey).alias("n_orders"),
        F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
        .cast("double")
        .alias("spend"),
        F.max(o.o_orderdate).alias("last_order"),
    )


@query(
    "q08_join_right",
    oracle="""
SELECT o.o_orderkey AS orderkey, c.c_name AS cust_name, o.o_totalprice AS totalprice
FROM customer c RIGHT JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_acctbal > 9000
WHERE o.o_totalprice > 400000
""",
    tags=("join",),
)
def q08_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (all qualifying orders, customer side nullable)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (c.c_acctbal > 9000), "right")
        .filter(o.o_totalprice > 400000)
        .select(
            o.o_orderkey.alias("orderkey"),
            c.c_name.alias("cust_name"),
            o.o_totalprice.alias("totalprice"),
        )
    )


@query(
    "q09_join_full_outer",
    oracle="""
WITH cust_per_nation AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1
), supp_per_nation AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
FROM cust_per_nation c FULL OUTER JOIN supp_per_nation s
  ON c.nationkey = s.nationkey
""",
    tags=("join",),
)
def q09_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (aggregate-then-join:
    shuffles the small aggregated relations, not the base tables)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nationkey", "full").select(
        F.col("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "q10_join_semi",
    oracle="""
SELECT c_custkey AS custkey, c_name AS name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
    tags=("join", "subquery"),
)
def q10_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (one output row per match-side row,
    no fan-out, no dedup needed)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


@query(
    "q11_join_anti",
    oracle="""
SELECT c_custkey AS custkey, c_acctbal AS acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("join", "subquery"),
)
def q11_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal")
    )


@query(
    "q12_cross_join",
    oracle="""
SELECT r.r_name AS region_name, seg.c_mktsegment AS segment
FROM region r CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) seg
""",
    tags=("join",),
)
def q12_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two tiny relations (both broadcast-size)."""
    r = load_table(spark, sf_dir, "region")
    seg = load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()
    return r.crossJoin(F.broadcast(seg)).select(
        F.col("r_name").alias("region_name"), F.col("c_mktsegment").alias("segment")
    )


@query(
    "q30_theta_range_join",
    oracle="""
SELECT s.s_suppkey AS suppkey, c.c_custkey AS custkey
FROM supplier s JOIN customer c
  ON c.c_nationkey = s.s_nationkey
 AND c.c_acctbal > s.s_acctbal AND c.c_acctbal <= s.s_acctbal + 50
""",
    tags=("join", "range-join"),
)
def q30_theta_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/band join: equi part (nationkey) hashes, the range part
    filters inside each hash bucket — so it stays a hash join, not a
    nested-loop over the whole cross product."""
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    c = load_table(spark, sf_dir, "customer")
    return c.join(
        s,
        (c.c_nationkey == s.s_nationkey)
        & (c.c_acctbal > s.s_acctbal)
        & (c.c_acctbal <= s.s_acctbal + 50),
    ).select(s.s_suppkey.alias("suppkey"), c.c_custkey.alias("custkey"))


@query(
    "q31_asof_join",
    oracle="""
WITH latest AS (
  SELECT o_custkey, MAX(o_orderdate) AS asof_orderdate
  FROM orders WHERE o_orderdate <= TIMESTAMP '2000-01-01' GROUP BY 1
)
SELECT e.event_id, e.user_id, latest.asof_orderdate
FROM (SELECT event_id, user_id FROM events WHERE event_id < 500) e
LEFT JOIN latest ON latest.o_custkey = e.user_id
""",
    tags=("join", "asof-join"),
)
def q31_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before a cutoff per user),
    expressed as join + max aggregation — the composition Spark lacks a
    native operator for (SURVEY.md 2B joins row). At scale the
    aggregate-then-join form keeps the probe side a single shuffle."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select("event_id", "user_id")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") <= F.lit("2000-01-01"))
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("asof_orderdate"))
    )
    return ev.join(o, ev.user_id == o.o_custkey, "left").select(
        "event_id", "user_id", "asof_orderdate"
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


@query(
    "q13_distinct_agg",
    oracle="""
SELECT o_orderstatus AS status,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(*) AS n_orders,
  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
""",
    tags=("aggregation", "distinct"),
)
def q13_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) with plain aggregates (Catalyst expands to a
    two-phase partial-distinct plan automatically)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q13b_approx_distinct",
    oracle=None,  # HLL sketch values are engine-specific by construction
    tags=("aggregation", "approx"),
)
def q13b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the at-scale replacement
    for exact distinct counts — fixed-size sketch, one pass, no
    distinct shuffle. Rows-only check (sketch estimates are
    engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


@query(
    "q69_datasketches",
    oracle=None,  # sketch estimates are engine-specific; error-bound-gated
    tags=("aggregation", "approx", "sketch"),
)
def q69_datasketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Apache DataSketches surface Spark 4 ships natively — the
    MERGEABLE sketch family that replaces exact distinct/top-k at
    100 TB: per event_type, an HLL-sketch distinct-user estimate
    (hll_sketch_agg -> hll_sketch_estimate) and a Theta-sketch
    estimate (set-operation-capable: union/intersect/diff of user
    sets across segments would compose sketch-side). Both sketches
    are order-independent (register-max / hash-sampling), so the
    estimates are deterministic for a given dataset under ANY
    partitioning — the property that makes them safe to merge across
    1000 executors. Rows-only driver check; the exact-vs-estimate
    error bound and approx_top_k containment are gated in
    tests/test_properties.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias(
            "hll_users"
        ),
        F.expr(
            "CAST(theta_sketch_estimate(theta_sketch_agg(user_id)) AS DOUBLE)"
        ).alias("theta_users"),
    )


@query(
    "q70_collation",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
         ELSE event_type END AS et_mixed, value
  FROM events
)
SELECT lower(et_mixed) AS event_type_ci,
  COUNT(*) AS n,
  CAST(COUNT(DISTINCT et_mixed) AS BIGINT) AS n_case_variants,
  ROUND(SUM(value), 4) AS sum_value
FROM mixed GROUP BY lower(et_mixed)
""",
    tags=("functions", "collation", "sql"),
)
def q70_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE): event types with
    deterministically mixed case are grouped under UTF8_LCASE, so
    'CLICK' and 'click' land in one group WITHOUT rewriting the data
    through lower() — the collation lives in the comparison, which is
    what lets indexes/partition layouts keep original bytes while
    queries compare case-insensitively. n_case_variants counts the raw
    byte-distinct spellings each group absorbed (2 per type here, by
    construction); the emitted label is lower()ed so it's independent
    of which representative the group-by happened to keep. The oracle
    states the same semantics via lower() grouping."""
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        F.when(
            F.col("event_id") % 2 == 0, F.upper("event_type")
        ).otherwise(F.col("event_type")).alias("et_mixed"),
        "value",
    ).createOrReplaceTempView("q70_mixed")
    return spark.sql(
        """
SELECT lower(et_mixed COLLATE UTF8_LCASE) AS event_type_ci,
  COUNT(*) AS n,
  COUNT(DISTINCT et_mixed COLLATE UTF8_BINARY) AS n_case_variants,
  ROUND(SUM(value), 4) AS sum_value
FROM q70_mixed GROUP BY et_mixed COLLATE UTF8_LCASE
"""
    )


@query(
    "q71_filtered_aggregates",
    oracle="""
SELECT o_orderstatus,
  COUNT(*) AS n,
  COUNT(*) FILTER (WHERE o_orderpriority LIKE '1-%') AS n_urgent,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
       FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total,
  MAX(o_orderdate) FILTER (WHERE o_orderpriority LIKE '1-%')
    AS last_urgent
FROM orders GROUP BY o_orderstatus
""",
    tags=("aggregation", "filter-clause", "sql"),
)
def q71_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI aggregate FILTER clause: per-aggregate predicates in one
    pass over one grouping — the standard form of 'conditional
    aggregation' q34 spells as CASE expressions. Catalyst evaluates
    each FILTER map-side inside the same partial aggregate, so N
    differently-filtered measures still cost exactly one shuffle.
    Identical SQL runs on both engines; money sums ride DECIMAL and
    cast to DOUBLE at the end (the repo's exactness rule)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q71_orders")
    return spark.sql(
        """
SELECT o_orderstatus,
  COUNT(*) AS n,
  COUNT(*) FILTER (WHERE o_orderpriority LIKE '1-%') AS n_urgent,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
       FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total,
  MAX(o_orderdate) FILTER (WHERE o_orderpriority LIKE '1-%')
    AS last_urgent
FROM q71_orders GROUP BY o_orderstatus
"""
    )


@query(
    "q72_theta_setops",
    oracle=None,  # sketch estimates are engine-specific; error-bound-gated
    tags=("aggregation", "approx", "sketch", "setops"),
)
def q72_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET OPERATIONS on Theta sketches — the property that makes them
    more than a distinct counter (and what q69 only claimed): the
    clicker and errorer user sets are sketched INDEPENDENTLY, then
    union / intersection / difference cardinalities come from the
    sketches alone. At 100 TB this is the audience-overlap question
    ('how many users did both X and Y') answered WITHOUT a join or a
    distinct shuffle over either set — each segment keeps a KB-sized
    sketch, and any boolean combination of segments composes
    sketch-side after the fact. Exact counterparts computed alongside;
    the error bound is gated in tests/test_properties.py."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("q72_events")
    return spark.sql(
        """
SELECT
  COUNT(DISTINCT CASE WHEN event_type IN ('click','error') THEN user_id END)
    AS n_union_exact,
  CAST(theta_sketch_estimate(theta_union(
    theta_sketch_agg(user_id) FILTER (WHERE event_type = 'click'),
    theta_sketch_agg(user_id) FILTER (WHERE event_type = 'error')))
    AS BIGINT) AS n_union_theta,
  COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
  + COUNT(DISTINCT CASE WHEN event_type = 'error' THEN user_id END)
  - COUNT(DISTINCT CASE WHEN event_type IN ('click','error') THEN user_id END)
    AS n_intersect_exact,
  CAST(theta_sketch_estimate(theta_intersection(
    theta_sketch_agg(user_id) FILTER (WHERE event_type = 'click'),
    theta_sketch_agg(user_id) FILTER (WHERE event_type = 'error')))
    AS BIGINT) AS n_intersect_theta,
  CAST(theta_sketch_estimate(theta_difference(
    theta_sketch_agg(user_id) FILTER (WHERE event_type = 'click'),
    theta_sketch_agg(user_id) FILTER (WHERE event_type = 'error')))
    AS BIGINT) AS n_diff_theta
FROM q72_events
"""
    )


@query(
    "q14_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS gid
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    tags=("aggregation", "rollup"),
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP + grouping id."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.grouping_id().alias("gid"),
    )


@query(
    "q15_cube",
    oracle="""
SELECT n_regionkey, c_mktsegment, COUNT(*) AS n,
  GROUPING(n_regionkey)*2 + GROUPING(c_mktsegment) AS gid
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE(n_regionkey, c_mktsegment)
""",
    tags=("aggregation", "cube", "join"),
)
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over a broadcast-joined dimension attribute."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .cube("n_regionkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
    )


@query(
    "q16_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
    tags=("aggregation", "grouping-sets"),
)
def q16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL surface — the DataFrame API exposes
    only cube/rollup; arbitrary sets are a Catalyst Expand node)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q17_window_topk_per_group",
    oracle="""
SELECT custkey, orderkey, totalprice, rn FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    tags=("window", "topk"),
    bench=True,
)
def q17_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price: the window-rank top-k idiom
    (one shuffle on the partition key; AQE splits skewed customers)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            "rn",
        )
    )


@query(
    "q18_window_analytics",
    oracle="""
SELECT o_orderkey AS orderkey, o_custkey AS custkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    AS prev_price,
  LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    AS next_price,
  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
  DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank,
  NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders
""",
    tags=("window",),
)
def q18_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals, lag/lead, rank/dense_rank/ntile over one
    partitioning (Catalyst collapses same-spec windows into one sort)."""
    o = load_table(spark, sf_dir, "orders")
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.sum(dec("o_totalprice"))
        .over(by_date.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice", 1).over(by_date).alias("prev_price"),
        F.lead("o_totalprice", 1).over(by_date).alias("next_price"),
        F.rank().over(by_price).alias("price_rank"),
        F.dense_rank()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderstatus"))
        .alias("status_rank"),
        F.ntile(4)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("quartile"),
    )


@query(
    "q19_window_range_frame",
    oracle="""
SELECT o_orderkey AS orderkey, cents,
  COUNT(*) OVER (ORDER BY cents RANGE BETWEEN 500000 PRECEDING AND CURRENT ROW)
    AS n_within_5k
FROM (
  SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 3000
)
""",
    tags=("window", "range-frame"),
)
def q19_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a value axis (how many orders within $5000 below
    each order). Price is converted to exact integer cents first so the
    frame bounds are integral."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    cents = (dec("o_totalprice") * 100).cast("bigint")
    w = Window.orderBy("cents").rangeBetween(-500000, 0)
    return o.select(
        F.col("o_orderkey").alias("orderkey"), cents.alias("cents")
    ).withColumn("n_within_5k", F.count(F.lit(1)).over(w))


# ---------------------------------------------------------------------------
# Sort / limit / set operations
# ---------------------------------------------------------------------------


@query(
    "q20_sort_limit",
    oracle="""
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
       l_extendedprice AS extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
""",
    tags=("sort", "topk"),
)
def q20_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with total tiebreak: per-partition heaps + driver
    merge (TakeOrderedAndProject), no full sort at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_extendedprice").alias("extendedprice"),
        )
        .orderBy(F.desc("extendedprice"), "orderkey", "linenumber")
        .limit(20)
    )


@query(
    "q21_union_all",
    oracle="""
SELECT c_custkey AS key, 'customer' AS kind FROM customer WHERE c_acctbal > 9500
UNION ALL
SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier
""",
    tags=("setops",),
)
def q21_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (no dedup shuffle)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_custkey").alias("key"), F.lit("customer").alias("kind"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@query(
    "q22_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("setops",),
)
def q22_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — customers with both F and O orders."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(op)


@query(
    "q23_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
""",
    tags=("setops",),
)
def q23_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, preserves multiplicity)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# Scalar function coverage
# ---------------------------------------------------------------------------


@query(
    "q24_string_functions",
    oracle="""
SELECT p_partkey AS partkey,
  length(p_name) AS name_len,
  upper(p_brand) AS brand_upper,
  lower(p_type) AS type_lower,
  substring(p_name, 1, 8) AS name_prefix,
  trim(concat('  ', p_name, '  ')) AS trimmed,
  concat_ws('-', p_brand, p_type) AS brand_type,
  replace(p_name, ' ', '_') AS snake_name,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  strpos(p_name, 'a') AS first_a,
  len(regexp_split_to_array(p_name, '\\s+')) AS n_words,
  regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
  CASE WHEN p_name LIKE '%part%' THEN 1 ELSE 0 END AS has_part,
  reverse(p_brand) AS brand_rev
FROM part
""",
    tags=("functions", "string"),
)
def q24_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function coverage, all JVM built-ins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.size(F.split(F.col("p_name"), r"\s+")).alias("n_words"),
        F.regexp_extract(F.col("p_type"), r"([A-Z]+)", 1).alias("first_word"),
        F.when(F.col("p_name").like("%part%"), 1).otherwise(0).alias("has_part"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@query(
    "q25_datetime_functions",
    oracle="""
SELECT o_orderkey AS orderkey,
  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
  quarter(o_orderdate) AS q,
  date_trunc('month', o_orderdate) AS month_start,
  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date
FROM orders WHERE o_orderkey < 2000
""",
    tags=("functions", "datetime"),
)
def q25_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar coverage on TIMESTAMP_NTZ (timezone-free, so
    results are independent of the session timezone). DATE-typed results
    are emitted as ISO strings so both engines hash the identical
    representation (a bare DATE round-trips as date-at-midnight through
    some pandas paths)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
    )


@query(
    "q26_conditional_null",
    oracle="""
SELECT c_custkey AS custkey,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS balance_band,
  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
  LEAST(c_acctbal, 5000.0) AS capped_bal,
  GREATEST(c_acctbal, 0.0) AS floored_bal,
  c_acctbal IS NULL AS bal_is_null,
  CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS odd_nation
FROM customer
""",
    tags=("functions", "conditional"),
)
def q26_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/LEAST/GREATEST + explicit null production."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER"))
        .alias("segment_or_other"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("capped_bal"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("floored_bal"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.when(F.col("c_nationkey") % 2 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("c_nationkey"))
        .alias("odd_nation"),
    )


@query(
    "q27_math_functions",
    oracle="""
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
  abs(l_extendedprice - 30000) AS abs_diff,
  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_round1,
  sqrt(l_quantity) AS qty_sqrt,
  CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
  CAST(sign(l_extendedprice - 30000) AS INT) AS diff_sign,
  l_quantity * l_quantity AS qty_sq
FROM lineitem WHERE l_orderkey < 1000
""",
    tags=("functions", "math"),
)
def q27_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar coverage, restricted to IEEE-exact operations
    (abs/ceil/floor/round/sqrt/mod/sign) so the oracle matches
    bit-for-bit; transcendentals (exp/ln) are libm-dependent and are
    deliberately not oracle-gated. ceil/floor are BIGINT on BOTH sides
    (DuckDB's ceil(double) is DOUBLE, Spark's is LONG — an unpinned
    dtype is a driver hash mismatch even when values agree)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.abs(F.col("l_extendedprice") - 30000).alias("abs_diff"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(dec("l_extendedprice"), 1).cast("double").alias("price_round1"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_extendedprice") - 30000).cast("int").alias("diff_sign"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


@query(
    "q28_json_functions",
    oracle="""
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
  MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
""",
    tags=("functions", "json"),
)
def q28_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + typed aggregation over the props column
    (the reference's JSONObject access, SURVEY.md 2B JSON row, as
    Catalyst-native get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q67_variant_json",
    oracle="""
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN json_valid(props)
           THEN CAST(json_extract(props, '$.k') AS INT) END) AS BIGINT)
    AS sum_k,
  MAX(CASE WHEN json_valid(props)
      THEN CAST(json_extract(props, '$.k') AS INT) END) AS max_k,
  CAST(SUM(CASE WHEN NOT json_valid(props)
                  OR json_extract(props, '$.absent') IS NULL
           THEN 1 ELSE 0 END) AS BIGINT) AS n_absent,
  CAST(SUM(CASE WHEN props IS NOT NULL AND NOT json_valid(props)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed
FROM events GROUP BY event_type
""",
    tags=("functions", "json", "variant"),
)
def q67_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: props is
    parsed ONCE into a binary variant (try_parse_json — the null-safe
    lane, so a malformed row degrades to counted nulls instead of
    failing the job), then every typed access is try_variant_get on
    the parsed value — the at-scale shape for multi-field extraction,
    where q28's per-path get_json_object re-parses the string for
    every path. (Spark 4 PERMISSIVE from_json can't distinguish
    malformed from all-null — the documented engine gotcha this lane
    avoids.) The oracle states the same accesses over DuckDB's JSON
    type with json_valid guards, so both engines agree on data WITH
    malformed rows, not just on clean data."""
    ev = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    parsed = ev.select(
        "event_type",
        "props",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.absent", "int").alias("absent"),
        v.alias("maybe"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0)).alias(
            "n_absent"
        ),
        F.sum(
            F.when(
                F.col("props").isNotNull() & F.col("maybe").isNull(), 1
            ).otherwise(0)
        ).alias("n_malformed"),
    )


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, l.o_orderkey AS last_orderkey,
       l.o_orderdate AS last_orderdate, l.o_totalprice AS last_totalprice
FROM (SELECT c_custkey, c_name FROM {customer}
      WHERE c_mktsegment = 'BUILDING' AND c_custkey < 400) c
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_orderdate, o_totalprice
  FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
  LIMIT 1
) l ON true
"""


@query(
    "q68_lateral_join",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
    tags=("join", "lateral", "subquery", "sql"),
)
def q68_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT — the
    'latest order per customer, keeping customers with none' idiom in
    its SQL-standard form (Spark 4 LATERAL support). Catalyst
    decorrelates the lateral top-1 into a window-rank over the join —
    the same physical shape as the q17 window idiom, so the per-row
    'subquery' never executes per row; customers without orders
    survive via the LEFT lateral null row. Identical SQL runs on both
    engines."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "q68_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q68_orders")
    return spark.sql(
        _LATERAL_SQL.format(customer="q68_customer", orders="q68_orders")
    )


@query(
    "q29_array_functions",
    oracle="""
SELECT vec_id,
  len(embedding) AS dim,
  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
  to_json(list_transform(embedding[1:4],
          x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS head4,
  ROUND(CAST(list_sum(CAST(embedding AS DOUBLE[])) AS DOUBLE), 6) AS vec_sum,
  ROUND(CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE), 6) AS vec_max,
  len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings WHERE vec_id < 200
""",
    tags=("functions", "array"),
)
def q29_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order-function coverage over the embedding column.
    Float32 cells are rounded through DOUBLE on both sides — raw
    float32 survives toPandas differently with and without Arrow, so a
    raw float column can never be value-hash-stable. The head4 array is
    serialized as a JSON string of integer micro-units: a raw
    array<double> column crashes pandas-based canonicalizers
    (sort_values -> `unhashable type: 'list'`), and JSON-of-int is the
    only float-format-proof cross-engine array encoding (Spark to_json
    and DuckDB to_json both emit `[1,2,3]`)."""
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.to_json(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
            )
        ).alias("head4"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(F.array_max(as_double), 6).alias("vec_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "q32_in_subquery",
    oracle="""
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
  AND o_orderstatus = 'O'
""",
    tags=("subquery", "join"),
)
def q32_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery as a left-semi join against the filtered dimension."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    autos = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    return o.join(autos, o.o_custkey == autos.c_custkey, "left_semi").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
    )


@query(
    "q33_scalar_subquery",
    oracle="""
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders
WHERE o_totalprice > 2 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
  FROM orders)
""",
    tags=("subquery",),
)
def q33_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison: the single-row aggregate is broadcast
    and the filter is evaluated map-side (no per-row recompute)."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > 2 * F.col("avg_price"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@query(
    "q44_window_navigation",
    oracle="""
SELECT o_orderkey AS orderkey,
  FIRST_VALUE(o_totalprice) OVER w AS first_price,
  LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
  NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
  ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey
    ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank,
  ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
    ORDER BY o_totalprice, o_orderkey), 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window", "navigation"),
)
def q44_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions: first/last/nth value, percent_rank,
    cume_dist (last_value over the full-partition frame — the default
    running frame is the classic SQL footgun the engine keeps explicit)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.round(F.percent_rank().over(w_price), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_price), 6).alias("cume"),
    )


@query(
    "q45_map_functions",
    oracle="""
SELECT o_orderkey AS orderkey,
  CASE o_orderstatus WHEN 'F' THEN 'fulfilled' WHEN 'O' THEN 'open'
       WHEN 'P' THEN 'pending' ELSE 'unknown' END AS status_label,
  CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END AS known_status
FROM orders WHERE o_orderkey < 2000
""",
    tags=("functions", "map"),
)
def q45_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType column surface: literal map build, element_at lookup with
    null-safe default, map_contains_key (the oracle spells the same
    lookups as CASE — DuckDB's MAP literals aren't needed to check the
    values)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    labels = F.create_map(
        F.lit("F"), F.lit("fulfilled"),
        F.lit("O"), F.lit("open"),
        F.lit("P"), F.lit("pending"),
    )
    lookup = F.element_at(labels, F.col("o_orderstatus"))
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.coalesce(lookup, F.lit("unknown")).alias("status_label"),
        F.map_contains_key(labels, F.col("o_orderstatus"))
        .cast("int")
        .alias("known_status"),
    )


@query(
    "q46_try_functions",
    oracle="""
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
  l_extendedprice / NULLIF(l_quantity - 25, 0) AS price_per_excess,
  TRY_CAST(l_returnflag AS INT) AS flag_as_int,
  TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip
FROM lineitem WHERE l_orderkey < 1000
""",
    tags=("functions", "error-handling"),
)
def q46_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: try_divide / try_cast return null
    instead of failing the job — the engine-wide analogue of the
    dead-letter policy (the reference crashes on malformed input,
    SURVEY.md 1.2)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - 25
        ).alias("price_per_excess"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("string").try_cast("double").alias("qty_roundtrip"),
    )


@query(
    "q47_hash_bit_functions",
    oracle="""
SELECT p_partkey AS partkey,
  md5(p_name) AS name_md5,
  sha256(p_name) AS name_sha256,
  base64(encode(p_name)) AS name_b64,
  p_size & 12 AS size_and,
  p_size | 3 AS size_or,
  xor(p_size, 255) AS size_xor,
  p_size << 2 AS size_shl,
  p_size >> 1 AS size_shr,
  bit_count(CAST(p_size AS BIGINT)) AS size_bits
FROM part WHERE p_partkey < 500
""",
    tags=("functions", "hash", "bitwise"),
)
def q47_hash_bit_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash and bitwise scalar coverage (md5/sha-256/
    base64; and/or/xor/shifts/popcount) — the hashing primitives the
    dedup stack builds on, exposed directly."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    size = F.col("p_size")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        F.base64(F.encode(F.col("p_name"), "UTF-8")).alias("name_b64"),
        size.bitwiseAND(12).alias("size_and"),
        size.bitwiseOR(3).alias("size_or"),
        size.bitwiseXOR(255).alias("size_xor"),
        F.shiftleft(size, 2).alias("size_shl"),
        F.shiftright(size, 1).alias("size_shr"),
        F.bit_count(size.cast("bigint")).alias("size_bits"),
    )


@query(
    "q48_null_semantics",
    oracle="""
WITH derived AS (
  SELECT c_custkey,
    CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS odd_nation,
    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal
  FROM customer
)
SELECT c_custkey AS custkey,
  odd_nation IS NOT DISTINCT FROM pos_bal AS null_safe_eq,
  (odd_nation = 5) AS three_valued,
  odd_nation IS DISTINCT FROM 5 AS distinct_from_5,
  COALESCE(odd_nation, -1) AS null_filled,
  (odd_nation IN (3, 7)) AS in_with_null_lhs
FROM derived
""",
    tags=("functions", "null-semantics"),
)
def q48_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic made explicit: null-safe equality (<=>),
    IS DISTINCT FROM, null-propagating comparison and IN — the
    semantics the reference leaves to JSONException crashes
    (SURVEY.md 1.2), pinned as first-class engine behavior."""
    c = load_table(spark, sf_dir, "customer")
    derived = c.select(
        "c_custkey",
        F.when(F.col("c_nationkey") % 2 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("c_nationkey"))
        .alias("odd_nation"),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("pos_bal"),
    )
    odd = F.col("odd_nation")
    return derived.select(
        F.col("c_custkey").alias("custkey"),
        odd.eqNullSafe(F.col("pos_bal")).alias("null_safe_eq"),
        (odd == 5).alias("three_valued"),
        (~odd.eqNullSafe(F.lit(5))).alias("distinct_from_5"),
        F.coalesce(odd, F.lit(-1)).alias("null_filled"),
        odd.isin(3, 7).alias("in_with_null_lhs"),
    )


@query(
    "q49_priority_late_orders",
    oracle="""
SELECT o.o_orderpriority AS priority, COUNT(*) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > CAST(o.o_orderdate AS DATE) + 60
)
GROUP BY o.o_orderpriority
""",
    tags=("join", "subquery", "aggregation"),
)
def q49_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join (orders with any line shipped
    60+ days after ordering) feeding an aggregate — the semi-join emits
    each order at most once, so no dedup before the count."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 60)),
        "left_semi",
    )
    return late.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


@query(
    "q50_argmax_aggregates",
    oracle="""
SELECT c_mktsegment AS segment,
  arg_max(c_custkey, CAST(c_acctbal * 100 AS BIGINT) * 10000000 + c_custkey)
    AS richest_custkey,
  arg_min(c_custkey, CAST(c_acctbal * 100 AS BIGINT) * 10000000 + c_custkey)
    AS poorest_custkey,
  MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal
FROM customer GROUP BY c_mktsegment
""",
    tags=("aggregation", "argmax"),
)
def q50_argmax_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin aggregates (max_by/min_by): who holds the extreme
    balance per segment. The ordering key packs (balance, custkey) into
    one exact BIGINT so ties are impossible and both engines pick the
    identical row — max_by on a tied key is otherwise unspecified."""
    c = load_table(spark, sf_dir, "customer")
    key = (
        (F.col("c_acctbal") * 100).cast("bigint") * F.lit(10000000)
        + F.col("c_custkey")
    )
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.max_by("c_custkey", key).alias("richest_custkey"),
        F.min_by("c_custkey", key).alias("poorest_custkey"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
    )


@query(
    "q73_mode_median",
    oracle="""
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
modes AS (
  SELECT l_returnflag, l_quantity AS mode_qty FROM (
    SELECT l_returnflag, l_quantity,
      ROW_NUMBER() OVER (PARTITION BY l_returnflag
                         ORDER BY c DESC, l_quantity) AS rn
    FROM counts
  ) WHERE rn = 1
),
meds AS (
  SELECT l_returnflag,
    ROUND(median(l_quantity), 6) AS median_qty,
    ROUND(median(l_extendedprice), 6) AS median_price,
    COUNT(*) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT m.l_returnflag AS returnflag, modes.mode_qty,
       m.median_qty, m.median_price, m.n_lines
FROM meds m JOIN modes ON modes.l_returnflag = m.l_returnflag
""",
    tags=("aggregation", "statistics"),
    bench=True,
)
def q73_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE and MEDIAN per group — the order-statistic aggregates
    that complete the q01/q36/q50 family. Median is the built-in exact
    interpolated percentile. Mode is deliberately NOT the built-in
    `mode()` on either engine: both leave ties engine-defined, which
    would make the oracle hash a coin flip — instead the mode is the
    q50 argmax pattern over (value, count): one (group, value) hash
    aggregate (map-side combinable; cardinality = distinct values, not
    rows) then a struct-max with a smallest-value tiebreak, never a
    per-group window over row data. Median is the one genuinely
    rank-based aggregate here — Spark's exact percentile collects a
    per-group value multiset, which is the known memory bound; at
    100 TB swap it for approx_percentile (q36b) or a t-digest."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    best = F.max(
        F.struct(
            F.col("c"),
            (-F.col("l_quantity")).alias("neg_q"),
            F.col("l_quantity").alias("q"),
        )
    )
    modes = counts.groupBy("l_returnflag").agg(
        best.getField("q").alias("mode_qty")
    )
    meds = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.round(F.median("l_extendedprice"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        meds.join(modes, "l_returnflag")
        .select(
            F.col("l_returnflag").alias("returnflag"),
            "mode_qty",
            "median_qty",
            "median_price",
            "n_lines",
        )
    )

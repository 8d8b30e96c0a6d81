"""Correlated-subquery catalog, exercised through the SQL surface.

The reference has no SQL at all (SURVEY.md §3.1: the user program IS the
physical plan); these queries run through ``spark.sql`` so Catalyst's
analyzer + subquery decorrelation are part of the tested engine surface
(the DataFrame-side equivalents of the same shapes live in catalog.py:
q10/q11/q32/q33).

Decorrelation is the scale story: each correlated subquery rewrites to a
join against a pre-aggregated relation — one shuffle on the correlation
key instead of one subquery execution per outer row. The oracle runs the
textually identical SQL in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.batch import load_table
from .registry import query


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], sql: str) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_Q40 = """
SELECT l.l_partkey AS partkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
  COUNT(*) AS n_lines
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
"""


@query(
    "q40_correlated_scalar",
    oracle=_Q40,
    tags=("subquery", "correlated", "sql"),
)
def q40_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate (below-half-average
    quantity per part). Catalyst decorrelates to lineitem JOIN
    (per-partkey avg) — one shuffle on l_partkey, not a subquery per
    row."""
    return _sql(spark, sf_dir, ("lineitem",), _Q40)


_Q41 = """
SELECT p.p_partkey AS partkey, p.p_name AS name, l.l_suppkey AS suppkey,
       l.l_extendedprice AS price
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size >= 48
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
)
"""


@query(
    "q41_min_price_line",
    oracle=_Q41,
    tags=("subquery", "correlated", "sql"),
)
def q41_min_price_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: equality against a correlated MIN (cheapest line
    per large part). Decorrelates to a join with the per-part minimum."""
    return _sql(spark, sf_dir, ("part", "lineitem"), _Q41)


_Q42 = """
SELECT c.c_custkey AS custkey, c.c_acctbal AS acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
)
AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query(
    "q42_rich_inactive_customers",
    oracle=_Q42,
    tags=("subquery", "sql"),
)
def q42_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (broadcast single
    row) + NOT EXISTS anti join in one query."""
    return _sql(spark, sf_dir, ("customer", "orders"), _Q42)


_Q43 = """
SELECT o.o_orderkey AS orderkey, o.o_totalprice AS totalprice, t.sum_qty
FROM orders o
JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
) t ON t.l_orderkey = o.o_orderkey
"""


@query(
    "q43_large_volume_orders",
    oracle=_Q43,
    tags=("subquery", "aggregation", "sql"),
)
def q43_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-with-HAVING derived table joined back
    to the fact — the aggregate shrinks before the join."""
    return _sql(spark, sf_dir, ("orders", "lineitem"), _Q43)

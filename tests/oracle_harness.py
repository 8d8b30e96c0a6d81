"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark DataFrame and an ANSI-SQL string (DuckDB, with the testdata
parquet registered as views) side by side and compares row count, schema
shape, and an order-insensitive value representation. Used by tests to
catch oracle drift before the driver does.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}"
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


@dataclass
class OracleResult:
    name: str
    spark_count: int
    oracle_count: int
    count_match: bool
    columns_match: bool
    values_match: bool
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.count_match and self.columns_match and self.values_match


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> OracleResult:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    count_match = len(sp) == len(du)
    columns_match = sorted(sp.columns) == sorted(du.columns)
    detail = ""
    values_match = False
    if count_match and columns_match:
        a, b = canonical_rows(sp), canonical_rows(du)
        values_match = a == b
        if not values_match:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            detail = f"first diffs: {diffs}"
    else:
        detail = (
            f"spark cols={sorted(sp.columns)} oracle cols={sorted(du.columns)}"
            if not columns_match
            else f"counts {len(sp)} vs {len(du)}"
        )
    return OracleResult(name, len(sp), len(du), count_match, columns_match, values_match, detail)

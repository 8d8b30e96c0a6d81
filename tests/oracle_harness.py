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


def _dtype_kind(series: pd.Series) -> str:
    """Coarse dtype kind for driver-hash compatibility: the external
    driver's value hash is dtype-sensitive (int64 5 != float64 5.0, and
    DuckDB HUGEINT sums come back as different pandas dtypes than Spark
    BIGINT), so both engines must land in the same pandas kind."""
    k = series.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "ts"
    if k == "b":
        return "bool"
    if k == "O":
        # Distinguish plain strings from list/array cells: the latter
        # crash pandas sort_values-based canonicalizers (driver q29 err).
        for v in series:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue  # missing markers (None / NaN), not the cell type
            if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                return "UNHASHABLE-list"
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "float"
            return "obj"
        return "obj"
    return k


@dataclass
class OracleResult:
    name: str
    spark_count: int
    oracle_count: int
    count_match: bool
    columns_match: bool
    values_match: bool
    detail: str = ""
    dtypes_match: bool = True
    dtype_detail: str = ""

    @property
    def ok(self) -> bool:
        return self.count_match and self.columns_match and self.values_match

    @property
    def strict_ok(self) -> bool:
        """ok AND driver-hash-safe: pandas dtype kinds agree per column
        and no column holds unhashable list cells."""
        return self.ok and self.dtypes_match


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> OracleResult:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    count_match = len(sp) == len(du)
    columns_match = sorted(sp.columns) == sorted(du.columns)
    detail = ""
    values_match = False
    dtypes_match = True
    dtype_detail = ""
    if count_match and columns_match:
        a, b = canonical_rows(sp), canonical_rows(du)
        values_match = a == b
        if not values_match:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            detail = f"first diffs: {diffs}"
        bad = []
        for col in sorted(sp.columns):
            ks, kd = _dtype_kind(sp[col]), _dtype_kind(du[col])
            if ks != kd or "UNHASHABLE" in ks or "UNHASHABLE" in kd:
                bad.append(f"{col}: spark={ks} oracle={kd}")
        dtypes_match = not bad
        dtype_detail = "; ".join(bad)
    else:
        detail = (
            f"spark cols={sorted(sp.columns)} oracle cols={sorted(du.columns)}"
            if not columns_match
            else f"counts {len(sp)} vs {len(du)}"
        )
    return OracleResult(
        name, len(sp), len(du), count_match, columns_match, values_match, detail,
        dtypes_match, dtype_detail,
    )

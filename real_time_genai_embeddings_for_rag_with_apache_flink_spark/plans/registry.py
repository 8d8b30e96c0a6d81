"""Query-catalog registry.

Every declared engine capability (SURVEY.md section 2B) is a QuerySpec:
a Spark DataFrame builder plus (when SQL-expressible) the exact DuckDB
oracle SQL the driver replays at sf=0.01. Column names and value
semantics are part of the contract — builders alias every computed
column to the same name the oracle uses.

Determinism rules that keep the Spark and DuckDB value-hashes equal:
- money/volume aggregates are computed exactly in DECIMAL and cast to
  DOUBLE at the end (testdata money columns are 2-dp aligned, so the
  decimal cast is lossless and the sums associative);
- floating similarity scores are rounded to 6 dp on both sides;
- every ORDER BY ... LIMIT has a total tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False


_REGISTRY: dict[str, QuerySpec] = {}

# Names promoted to the front of all_specs(). The external correctness
# driver checks the FIRST 50 entries of the catalog per round, so this
# list is the per-round rotation control: put queries that still need a
# driver-green row first, already-proven ones last.
_PRIORITY: list[str] = []


def set_priority(names: list[str]) -> None:
    """Pin the iteration order of all_specs(): `names` first (in order),
    then every other registered query in registration order. Every name
    must exist and be unique — typos fail at import time."""
    global _PRIORITY
    missing = [n for n in names if n not in _REGISTRY]
    if missing:
        raise ValueError(f"unknown priority queries: {missing}")
    if len(set(names)) != len(names):
        raise ValueError("duplicate names in priority list")
    _PRIORITY = list(names)


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Register a catalog query. The decorated function takes
    (spark, sf_dir) and returns a DataFrame."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name, fn, oracle, doc=(fn.__doc__ or "").strip(), tags=tags, bench=bench
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]

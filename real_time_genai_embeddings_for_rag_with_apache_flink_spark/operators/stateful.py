"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only state is source offsets + the async in-flight buffer
(SURVEY.md §2A chain semantics); it has no keyed state at all. These are
the engine's keyed-state surface — the Spark analogue of Flink's
KeyedProcessFunction, declared in SURVEY.md §2B (streaming: stateful).

State lives in the checkpointed state store, partitioned by the grouping
key across executors; each micro-batch routes a key's rows to its state
partition (one shuffle on the key), so the operator scales horizontally
with executors and state size is bounded by live keys, not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_TOTALS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count and value sum with explicit keyed
    state: after each micro-batch that touches a user, emit that user's
    new lifetime totals. (On a one-batch replay this equals the batch
    GROUP BY — which is exactly what the oracle checks.)"""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EXTREMES_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

# transformWithStateInPandas' state-API client speaks protobuf to the
# JVM; when google.protobuf is absent (this container), the miniproto
# wire-format shim stands in. Installed at module import so EVERY
# process that unpickles the module-level processor class below — the
# driver, the transform_with_state driver worker, executor workers —
# gets it before the client's first lazy pb2 import.
try:
    from .miniproto import install_state_message_shim

    install_state_message_shim()
    _STATE_PROTO_ERROR: Exception | None = None
except Exception as _e:  # pragma: no cover - layout drift in future pyspark
    _STATE_PROTO_ERROR = _e


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class ExtremesProcessor(StatefulProcessor):
    """Per-user running (count, min, max) StatefulProcessor — defined at
    module level so it pickles BY REFERENCE: unpickling it in any
    worker process (executor workers AND the separate
    transform_with_state driver worker) imports this module, which
    installs the protobuf shim before the state client's first request.
    A class defined inside ``user_value_extremes`` would pickle by
    value and skip the module import. NULL values don't count toward
    min/max (matching SQL MIN/MAX); an all-null user carries NaN
    sentinels internally and emits NULL."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "extremes", "n BIGINT, mn DOUBLE, mx DOUBLE"
        )

    def handleInputRows(self, key, rows, timerValues):
        import math

        if self._state.exists():
            n, mn, mx = self._state.get()
        else:
            n, mn, mx = 0, math.nan, math.nan
        for pdf in rows:
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                lo, hi = float(vals.min()), float(vals.max())
                mn = lo if math.isnan(mn) else min(mn, lo)
                mx = hi if math.isnan(mx) else max(mx, hi)
        self._state.update((n, mn, mx))
        # RAW extremes, no rounding: min/max of parquet doubles pass
        # through exactly, and callers that need display rounding apply
        # F.round engine-side (Python round() is half-even, Spark/DuckDB
        # ROUND are half-up — rounding here would be the one step with
        # no cross-engine twin)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "min_value": [None if math.isnan(mn) else mn],
                "max_value": [None if math.isnan(mx) else mx],
            }
        )

    def close(self) -> None:
        pass


def user_value_extremes(events: DataFrame) -> DataFrame:
    """Per-user running (count, min, max) over ``value`` with the Spark 4
    ``transformWithStateInPandas`` API — the successor of
    applyInPandasWithState, with named state variables on a processor
    handle (ValueState here; ListState/MapState and timers exist for
    richer operators). Emits a user's new lifetime extremes after every
    micro-batch that touches the user; NULL values don't count toward
    min/max (matching SQL MIN/MAX), so an all-null user carries NaN
    sentinels internally and emits NULL.

    UN-GATED in round 11: Spark's transformWithState state-API client
    speaks protobuf to the JVM, and ``google.protobuf`` is absent in
    this container — rounds 6-10 could only pin plan construction. The
    operators/miniproto.py wire-format shim (installed at this module's
    import, see above) now stands in for the runtime, so the operator
    EXECUTES here: state requests/responses cross the real socket
    protocol against the JVM's RocksDB-backed state server
    (rocksdbjni ships with Spark), and st29 carries the driver row.
    With a real protobuf install the shim steps aside automatically.

    Same scale shape as every keyed-state operator: one shuffle on the
    grouping key per micro-batch, state store partitioned across
    executors, state size bounded by live keys."""
    if _STATE_PROTO_ERROR is not None:
        # fail HERE with the real cause instead of an opaque lazy pb2
        # import error from deep inside the state client mid-query
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf or the "
            "miniproto shim, and the shim failed to install"
        ) from _STATE_PROTO_ERROR
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ExtremesProcessor(),
        outputStructType=_EXTREMES_OUT,
        outputMode="Append",
        timeMode="None",
    )


def last_writer_compact(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    eid: str = "event_id",
    etype: str = "event_type",
    val: str = "value",
) -> DataFrame:
    """Last-writer-wins compaction of a keyed change log: one row per
    key carrying the fields of its latest op under the (ts, event_id)
    total order — the shared CDC algebra behind p16 (batch apply) and
    st22 (streaming fold), kept in ONE place because st22's
    batch-boundary-independence proof depends on both engines running
    the SAME tiebreak. A COMBINABLE struct-max aggregate (map-side
    partials, no per-key sort, skew-immune), never a row_number window.
    Output columns: (key, last_ts, last_event_id, state_type,
    state_value)."""
    from pyspark.sql import functions as F

    last = df.groupBy(key).agg(
        F.max(
            F.struct(
                F.col(ts).alias("ts"),
                F.col(eid).alias("event_id"),
                F.col(etype).alias("event_type"),
                F.col(val).alias("value"),
            )
        ).alias("last")
    )
    return last.select(
        key,
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_id").cast("long").alias("last_event_id"),
        F.col("last.event_type").alias("state_type"),
        F.col("last.value").alias("state_value"),
    )


def _dec6(c):
    from pyspark.sql import functions as F

    return F.round(c, 6).cast("decimal(25,6)")


def view_of_state(state: DataFrame) -> DataFrame:
    """The p18/st23 maintained VIEW of an LWW-compacted state table:
    per live state_type, (n_users, total_value) with values in exact
    DECIMAL(25,6) so partial views merge order-independently. One copy
    of the aggregate definition — the batch refresher (p18) and the
    streaming fold (st23) must maintain the SAME view or the
    batch-boundary-independence proof is vacuous."""
    from pyspark.sql import functions as F

    return (
        state.filter(F.col("state_type") != F.lit("error"))
        .groupBy("state_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(_dec6(F.col("state_value"))).alias("total_value"),
        )
    )


def view_delta_changes(prev_state: DataFrame, delta: DataFrame) -> DataFrame:
    """Gupta-Mumick counting deltas that move view_of_state(prev_state)
    to view_of_state(apply(prev_state, delta)): every delta key emits a
    RETRACTION of its old contribution (-1, -old_value against its old
    group, if it was live) and an INSERTION of its new one (+1,
    +new_value, unless the new op is a tombstone). Both inputs are
    LWW-compacted tables (last_writer_compact columns); the only
    non-delta touch is the one key equi-join against prev_state.
    Preconditions (both hold for LWW compaction over an in-order
    replay by construction):
    - delta carries at most one row per key;
    - every delta row is NEWER (by the LWW (ts, event_id) order) than
      prev_state's row for that key. An out-of-order delta would make
      the view retract/insert the STALE value while last_writer_compact
      keeps the newer row in state — view and state silently diverge.
      st23 satisfies this because its split source replays in
      (ts, event_id) order; a consumer folding arbitrary-order deltas
      must pre-filter delta to rows that win the LWW comparison
      against prev_state (join-compare, drop losers) before calling
      this."""
    from pyspark.sql import functions as F

    touched = delta.alias("d").join(
        prev_state.alias("b"), F.col("d.user_id") == F.col("b.user_id"), "left"
    )
    retract = touched.filter(
        F.col("b.state_type").isNotNull() & (F.col("b.state_type") != "error")
    ).select(
        F.col("b.state_type").alias("state_type"),
        F.lit(-1).cast("long").alias("n_users"),
        (-_dec6(F.col("b.state_value"))).alias("total_value"),
    )
    insert = touched.filter(F.col("d.state_type") != "error").select(
        F.col("d.state_type").alias("state_type"),
        F.lit(1).cast("long").alias("n_users"),
        _dec6(F.col("d.state_value")).alias("total_value"),
    )
    return retract.unionByName(insert)


def merge_view(*parts: DataFrame) -> DataFrame:
    """Fold view partials (stored view + change sets) into the current
    view: one group-count-sized aggregate; groups whose count
    telescopes to zero vanish (the DECIMAL arithmetic makes the
    cancellation exact, so the filter is hash-stable)."""
    from functools import reduce

    from pyspark.sql import functions as F

    merged = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        merged.groupBy("state_type")
        .agg(
            F.sum("n_users").cast("long").alias("n_users"),
            F.sum("total_value").cast("decimal(25,6)").alias("total_value"),
        )
        .filter(F.col("n_users") > 0)
    )

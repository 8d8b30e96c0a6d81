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

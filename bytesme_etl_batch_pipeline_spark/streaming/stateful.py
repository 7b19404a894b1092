"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's escape hatch for streaming semantics the built-in windowed
aggregations cannot express (SURVEY §2.14 extension; built-ins cover the
reference surface — this exists for custom operators like running per-key
counters with arbitrary transition logic).

Example operator: per-user running totals — for each micro-batch, emit the
updated (user_id, n_events, total_value) after folding the batch into
persisted state. State lives in the state store (checkpointed, fault
tolerant); a GroupStateTimeout would expire idle users in production.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": round(total, 2)}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user fold to a streaming events frame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

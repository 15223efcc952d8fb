"""Custom stateful streaming operator via ``applyInPandasWithState``:
a per-key running aggregator (the building block for sessionization,
per-domain crawl counters, incremental entity statistics).

State is a single (count, value_sum) pair per key, carried across
micro-batches in the state store; output mode is Update (each batch emits
the refreshed totals for keys it touched). Arrow-batched — no per-row
Python (input_hint).

Scale notes: state is partitioned by the group key across executors
(spark.sql.shuffle.partitions state partitions); RocksDB state store in
production keeps per-executor memory bounded; a GroupStateTimeout would
evict idle keys for unbounded key domains (urls) — not needed for the
bounded event_type domain here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("event_type", StringType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def _update_totals(key: tuple[Any, ...],
                   pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({
        "event_type": [key[0]],
        "n_events": [n],
        "sum_value": [round(total, 4)],
    })


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-event_type running (count, sum) with explicit state."""
    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

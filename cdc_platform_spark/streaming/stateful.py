"""Custom stateful streaming operator via ``applyInPandasWithState``.

The memory-side counterpart to the storage-side UpsertSink: per-key
state maintained by Spark's state store across micro-batches.  The
engine uses MERGE/UpsertSink for the 100 TB latest-per-key path
(storage-side state, SURVEY.md §7 risk register); this operator covers
the cases that genuinely need in-flight state — running counters,
custom session logic — and demonstrates the
``applyInPandasWithState`` extension point (Arrow-batched, grouped).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "pk long, n_events long, max_offset long, last_event_type string, running_value double"
STATE_SCHEMA = "n_events long, max_offset long, last_event_type string, running_value double"


def _update_user_state(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-key aggregate: event count, max offset, latest event_type
    (by offset), exact running value sum (cents-integer internally)."""
    if state.exists:
        n, max_off, last_type, running = state.get
    else:
        n, max_off, last_type, running = 0, -1, None, 0.0
    running_cents = round(running * 100)
    for pdf in pdfs:
        n += len(pdf)
        running_cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        batch_max = int(pdf["offset"].max())
        if batch_max > max_off:
            last_type = str(pdf.loc[pdf["offset"].idxmax(), "event_type"])
            max_off = batch_max
    state.update((n, max_off, last_type, running_cents / 100.0))
    yield pd.DataFrame(
        {
            "pk": [key[0]],
            "n_events": [n],
            "max_offset": [max_off],
            "last_event_type": [last_type],
            "running_value": [running_cents / 100.0],
        }
    )


def running_user_stats(env: DataFrame) -> DataFrame:
    """Grouped stateful transform over the envelope stream (update mode)."""
    return env.groupBy("pk").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

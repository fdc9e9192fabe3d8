"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md section 2.2: the sanctioned escape hatch for state machines the
built-in windows can't express).

The reference never needed custom state (VoltDB delivers in-order per
partition); these exist for the extension surface. State is partitioned by
key and bounded: each key holds a constant-size tuple, so state-store size
grows with distinct keys, not events — the 100 TB-safe shape. Arrow moves
batches; Python touches only per-key aggregates, never raw event rows
twice.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def running_user_totals(df: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) across micro-batches.

    Emits the updated totals for every user seen in the current batch —
    a custom stateful aggregation that survives restarts via the state
    store (checkpointed alongside source offsets, so the reference's
    block-replay semantics extend to operator state).

    Works on a streaming DataFrame; the same statistic for a batch frame
    is a plain groupBy (see tests for the equivalence assertion).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            # COUNT(*) counts rows; SUM/MAX skip NULLs (NaN here) — a
            # user with only NULL values must report NULL totals like
            # the SQL aggregates, not 0.0/-inf (round-9 all-NULL sweep;
            # pandas .sum() of all-NaN is 0.0 and .max() is NaN)
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                total += float(vals.sum())
                mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        # mx == -inf <=> no non-NULL value ever seen (values are money
        # cents; -inf is unreachable as a real maximum)
        seen = mx != float("-inf")
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total if seen else None],
                "max_value": [mx if seen else None],
            }
        )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=_RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TYPE_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def has_tws_runtime() -> bool:
    """True when the transformWithState worker protocol can run here: the
    Python worker frames state-server messages with google.protobuf, so
    without it the stream fails at initialization. Query registration and
    tests key off this — the operator activates the moment the
    environment gains protobuf instead of bit-rotting behind a permanent
    skip."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_type_totals_tws(df: DataFrame) -> DataFrame:
    """Per-event-type running (count, sum, max) via transformWithState —
    the second-generation stateful API (Spark 4): explicit ValueState
    handles, timer support, state schema declared per variable. Same
    constant-width-per-key contract as :func:`running_user_totals`, so
    state grows with distinct types, not events; kept alongside the
    applyInPandasWithState form to cover both sanctioned stateful seams.

    Environment gate: executing this operator requires ``google.protobuf``
    (the transformWithState worker protocol is protobuf-framed); in
    environments without it the stream fails at initialization. Gate on
    :func:`has_tws_runtime` — the pytest coverage and the registered
    ``stream_stateful_totals_tws`` query are only defined when it returns
    True, so nothing skips permanently and the operator self-activates
    when the environment supports it; the always-on driver-gated stateful
    query is :func:`running_user_totals`.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE, mx DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, mx = self._state.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=TotalsProcessor(),
        outputStructType=TYPE_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )

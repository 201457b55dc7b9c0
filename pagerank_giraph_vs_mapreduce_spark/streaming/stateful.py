"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 extension: the reference has no streaming surface at all).

Per-user running totals that survive across micro-batches — the minimal
shape of a custom stateful aggregator (fraud counters, rate limiters,
sessionizers all specialize this skeleton). State is a typed tuple per
group key held in the state store; Arrow batches flow through pandas.

Scale notes: state is partitioned by the group key across executors; the
number of state rows is bounded by |distinct keys|. For unbounded key
spaces add a timeout (GroupStateTimeout.EventTimeTimeout + watermark) so
idle state is evicted — exercised by tests with NoTimeout since the file
source replay is finite.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, value-sum), updated each batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


EXACT_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_micros bigint"
EXACT_STATE_SCHEMA = "n bigint, total_micros bigint"


def _update_user_totals_exact(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import math

    n, micros = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # integer micro-units: floor(v*1e6 + 0.5) is pure IEEE-double
        # arithmetic, so the running total is exact and ORDER-INDEPENDENT
        # — a float accumulator would drift with arrival order and could
        # never hash-match a SQL oracle
        micros += sum(int(math.floor(v * 1_000_000 + 0.5)) for v in pdf["value"])
    state.update((n, micros))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_micros": [micros]}
    )


def stateful_user_totals_exact(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, exact micro-unit sum) — the
    oracle-certifiable twin of stateful_user_totals (used by the
    stream_stateful_totals gate query)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals_exact,
        EXACT_OUTPUT_SCHEMA,
        EXACT_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

# Spark 4's transformWithState successor API (StatefulProcessor + typed
# value/list/map state, timers, TTL) was evaluated as a twin of the
# operator above: the API surface exists in this PySpark build, but its
# driver worker imports google.protobuf (StateMessage_pb2), which this
# runtime does not ship — the query crashed at stream start with
# STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. applyInPandasWithState
# remains the supported custom-state path here; the processor semantics
# above port 1:1 (same state tuple, same emit) when protobuf is present.

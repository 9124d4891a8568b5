"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 extension; the harness for operators that the built-in
windowed aggregates can't express).

Example operator: per-user running counters with idle-timeout flush —
each user's state (event count, value sum) accumulates across
micro-batches and is emitted when the user goes idle (processing-time
timeout) or the stream drains. The same shape hosts any per-key
accumulator (e.g. the reference's checkpointed enrichment progress).

Termination caveat: a query over this operator holds pending
processing-time timeouts, so under ``trigger(availableNow=True)`` it
does NOT self-terminate after draining the input (and
``processAllAvailable`` blocks on the timeout-driven empty batches).
Finite drains should poll the sink for the expected state and then
``stop()`` the query explicitly — see
``tests/test_streaming.py::test_stateful_running_counters``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("flushed_by_timeout", T.BooleanType()),
    ]
)


def _update_user_counters(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total],
             "flushed_by_timeout": [True]}
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    state.setTimeoutDuration(30_000)  # flush after 30s idle
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)],
         "flushed_by_timeout": [False]}
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator. Emits the updated counters on
    every micro-batch a user appears in, plus a final timeout flush."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counters,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming per-domain document cap: the stateful twin of
# operators/web.cap_per_domain. State = accepted-so-far per domain;
# each micro-batch's rows are admitted in doc_id order until the
# domain's cap fills, after which everything from that domain is
# rejected forever. The per-key counter is exactly the accumulator
# shape applyInPandasWithState exists for — a windowed aggregate
# cannot express "admit only while a running count is under N".

CAP_STATE_SCHEMA = T.StructType([T.StructField("n_accepted", T.LongType())])

CAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("accepted", T.BooleanType()),
    ]
)


def _make_cap_fn(cap: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (domain,) = key
        n = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        # deterministic within-batch admission order
        batch = batch.sort_values("doc_id", ignore_index=True)
        room = max(cap - n, 0)
        accepted = [i < room for i in range(len(batch))]
        state.update((n + min(room, len(batch)),))
        yield pd.DataFrame(
            {
                "domain": [domain] * len(batch),
                "doc_id": batch["doc_id"].astype("int64"),
                "accepted": accepted,
            }
        )

    return update


def domain_cap_stream(docs: DataFrame, cap: int) -> DataFrame:
    """Streaming per-domain cap: emits (domain, doc_id, accepted) for
    every input row; at most ``cap`` rows per domain are ever marked
    accepted across the stream's lifetime. Input needs (domain,
    doc_id) columns. No timeout — rejection state lives for the run
    (at production scale, bound state by domain-count, which is small
    by construction)."""
    return docs.groupBy("domain").applyInPandasWithState(
        _make_cap_fn(cap),
        outputStructType=CAP_OUTPUT_SCHEMA,
        stateStructType=CAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

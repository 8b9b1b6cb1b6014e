"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming tier (SURVEY.md section 2.9); the
engine's custom-state surface exists for operators the built-in
windows can't express (per-key running aggregates, custom session
logic, online dedup caches). This module demonstrates the contract
with a per-user running totalizer: arbitrary per-group state carried
across micro-batches in an Arrow-backed pandas exchange, checkpointed
by the state store at cluster scale.

Scale notes: state is partitioned by the group key (one shuffle), and
each micro-batch touches only keys with new events; the state store
(RocksDB in production) spills beyond memory. Skewed keys are the risk
— salt upstream if one user dominates.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hi_csa_db_spark.streaming.windows import read_events_stream

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = "n BIGINT, cents BIGINT"


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # State carries INTEGER CENTS, not a float accumulator: the fixture
    # values are 2-decimal money, so the running total is exact and
    # identical whatever order batches/rows arrive in — which is what
    # lets the streaming run be value-checked against a plain SQL
    # oracle (r4; was rows-only while the state was a float sum).
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # per-ROW cents before summing (a float sum of many 2-decimal
        # doubles is not exact; per-row *100-and-round is)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, value-sum) maintained as custom state
    across micro-batches; emits the latest totals per touched key."""
    ev = read_events_stream(spark, sf_dir)
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        RUNNING_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    from hi_csa_db_spark.streaming.windows import pinned_state_partitions

    with pinned_state_partitions(spark):
        q = (
            updated.writeStream.format("memory")
            .queryName("stream_user_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stream_user_totals")


TRANSITION_SCHEMA = StructType(
    [
        StructField("prev", StringType()),
        StructField("next", StringType()),
        StructField("n", LongType()),
    ]
)

TRANSITION_STATE_SCHEMA = "last_t BIGINT, last_eid BIGINT, last_type STRING"


def _update_transitions(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user event-type transition DELTAS for this micro-batch.

    State carries the user's last-seen (event-time micros, event_id,
    type); batch rows are sorted by the same (t, event_id) total order
    the batch twin (t43_markov_transitions) ranks by, the boundary
    transition from the stored state is included, and the emitted rows
    are per-batch (prev, next, count) DELTAS — additive across
    batches, so the consumer's final groupBy-sum equals the batch
    answer exactly. Contract (shared with every stream_* op): the
    source arrives in event-time order across micro-batches (the
    fixture file is globally ts-sorted; a shuffled source would need
    a watermarked reorder buffer upstream)."""
    pdf = pd.concat(list(batches), ignore_index=True)
    pdf = pdf.sort_values(["t", "event_id"], kind="mergesort")
    types = pdf["event_type"].tolist()
    prevs = [None] + types[:-1]
    if state.exists:
        last_t, last_eid, last_type = state.get
        if types:
            prevs[0] = last_type
    if types:
        last = pdf.iloc[-1]
        state.update((int(last["t"]), int(last["event_id"]), str(last["event_type"])))
    pairs = pd.DataFrame({"prev": prevs, "next": types})
    pairs = pairs[pairs["prev"].notna()]
    if len(pairs) == 0:
        yield pd.DataFrame({"prev": [], "next": [], "n": []}).astype(
            {"prev": "object", "next": "object", "n": "int64"}
        )
        return
    out = (
        pairs.groupby(["prev", "next"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    yield out


def user_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming first-order transition counts: per-user last-event
    state bridges micro-batch boundaries; emissions are additive
    deltas (see _update_transitions)."""
    ev = read_events_stream(spark, sf_dir)
    slim = ev.selectExpr(
        "user_id",
        "event_type",
        "ts_ns div 1000 AS t",
        "event_id",
    )
    updated = slim.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        TRANSITION_SCHEMA,
        TRANSITION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    from hi_csa_db_spark.streaming.windows import pinned_state_partitions

    with pinned_state_partitions(spark):
        q = (
            updated.writeStream.format("memory")
            .queryName("stream_transition_counts")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("stream_transition_counts")

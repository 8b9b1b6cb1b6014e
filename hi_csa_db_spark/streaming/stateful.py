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
    q = (
        updated.writeStream.format("memory")
        .queryName("stream_user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stream_user_totals")

"""transformWithStateInPandas — Spark 4's arbitrary-state streaming API.

The successor to ``applyInPandasWithState`` (streaming/stateful.py):
typed state handles (ValueState/ListState/MapState), per-key timers,
TTL, and initial-state bootstrap, with the same Arrow-batched pandas
exchange. This module carries the engine's port of the per-user
running totalizer to the new API so both stateful surfaces are
covered.

RUNTIME GATE: the new API's state-server protocol needs
``google.protobuf`` on the Python side. This container (and the
driver's) does not ship protobuf, so the operator is NOT registered
as a driver query; ``tests/test_streaming_multimodal.py`` skips its
equivalence test when the import is missing and pins
batch-equivalence (same totals as the applyInPandasWithState twin and
the batch groupBy) where it is available. Totals are kept in INTEGER
CENTS, so both stateful surfaces and the batch twin agree to the cent
under any batching.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

TWS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime dependency
    (google.protobuf) is importable."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _make_processor():
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserTotalsProcessor(StatefulProcessor):
        """Per-user (event count, cents sum) in a typed ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("tot", "n BIGINT, cents BIGINT")

        def handleInputRows(
            self, key: tuple[Any, ...], rows: Iterator["pd.DataFrame"], timer_values
        ) -> Iterator["pd.DataFrame"]:
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return UserTotalsProcessor()


def user_running_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful.user_running_totals twin on the new API: per-user
    running (count, integer-cents sum) across micro-batches, memory
    sink, Trigger.AvailableNow. Raises ImportError where protobuf is
    absent — call ``tws_available()`` first."""
    from hi_csa_db_spark.streaming.windows import read_events_stream

    ev = read_events_stream(spark, sf_dir)
    src = ev.select(
        "user_id", F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents")
    )
    out = src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor(),
        outputStructType=TWS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    from hi_csa_db_spark.streaming.windows import pinned_state_partitions

    with pinned_state_partitions(spark):
        q = (
            out.writeStream.format("memory")
            .queryName("tws_user_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # update-mode emits one row per (key, batch); keep each key's last.
    from pyspark.sql import Window

    snap = spark.sql("SELECT * FROM tws_user_totals")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        snap.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

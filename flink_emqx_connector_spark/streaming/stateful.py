"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's only stateful operator is the rolling per-key ``sum()``
backed by Flink keyed state (``WordCount.java:32``, SURVEY.md §2.2 T3).
Structured Streaming's built-in streaming aggregation already covers that
(update-mode groupBy), but the *mechanism* — user-managed keyed state — is
a first-class surface the engine must expose for operators the built-ins
can't express. ``rolling_sum_with_state`` reimplements the reference
semantics on raw keyed state as the canonical example; swap the body for
session tracking / CEP / custom triggers.

State is partitioned by key in the state store: each executor holds only
its keys' state — at 100 TB of keys the state scales out with the cluster
exactly like Flink's keyed state backend.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def rolling_sum_with_state(
    keyed: DataFrame,
    key_col: str = "word",
    value_col: str = "n",
) -> DataFrame:
    """Per-key running sum with explicit keyed state — Flink
    ``keyBy(key).sum(value)`` parity at the state-management level.

    Emits one updated ``(key, total)`` row per key per micro-batch in which
    the key appears (Flink emits per record; the materialized state is
    identical — FIXTURES.md §2).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            total += int(pdf[value_col].sum())
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "total": [total]})

    return keyed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, total bigint",
        stateStructType="total bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rolling_sum_transform_with_state(
    keyed: DataFrame,
    key_col: str = "word",
    value_col: str = "n",
) -> DataFrame:
    """Same semantics as ``rolling_sum_with_state`` on the Spark 4
    ``transformWithStateInPandas`` API (StatefulProcessor + typed value
    state, RocksDB-backed) — the forward path for custom stateful
    operators: multiple named states, timers, and TTL per state, none of
    which ``applyInPandasWithState`` offers."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningSum(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sum = handle.getValueState("total", "total bigint")

        def handleInputRows(self, key, rows, timerValues):
            total = self._sum.get()[0] if self._sum.exists() else 0
            for pdf in rows:
                total += int(pdf[value_col].sum())
            self._sum.update((total,))
            yield pd.DataFrame({key_col: [key[0]], "total": [total]})

        def close(self) -> None:
            pass

    return keyed.groupBy(key_col).transformWithStateInPandas(
        RunningSum(),
        outputStructType=f"{key_col} string, total bigint",
        outputMode="Update",
        timeMode="None",
    )

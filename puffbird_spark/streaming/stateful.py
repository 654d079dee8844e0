"""Custom stateful streaming operators via ``applyInPandasWithState``
(the north-star escape hatch for semantics the built-in operators can't
express: user-defined per-key state machines).

State discipline at scale: state is keyed by the shuffle key (lives where
the data lands), kept to fixed-width scalars, and bounded by a processing-
time timeout so abandoned keys are evicted — unbounded keyed state is the
streaming OOM."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def running_count(
    stream: DataFrame,
    key: str = "user_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key cumulative event counter: each micro-batch emits the running
    total (count survives across batches in keyed state)."""
    out_schema = f"{key} long, total long"
    state_schema = "total long"

    def update(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({key: [key_tuple[0]], "total": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=StructType.fromDDL(out_schema),
        stateStructType=StructType.fromDDL(state_schema),
        outputMode="update",
        timeoutConf=timeout,
    )

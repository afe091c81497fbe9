"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windowed aggregations (streaming/pipeline.py) cover everything
the reference's query surface needs; this module is the escape hatch for
state machines that windows can't express — here, a per-requester running
quota monitor: cumulative request/byte totals that survive micro-batches
AND job restarts (state lives in the checkpointed state store), emitting a
row per batch per active key with a flag once the byte quota is crossed.

Scale notes: state is partitioned by group key across executors (same
hash-shuffle as a groupBy), held in the state store with incremental
checkpoints — O(distinct active keys), not O(rows seen). Arrow batches
flow per key-group; the python function sees one key's rows per call, so
memory is bounded by the largest single key per micro-batch (salt the key
upstream if one requester dominates — see operators/joins.py:salted_join).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("requester", T.StringType()),
        T.StructField("n_requests", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("over_quota", T.BooleanType()),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_requests", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def running_totals(
    parsed: DataFrame, quota_bytes: int = 1_000_000
) -> DataFrame:
    """Per-requester lifetime totals with a quota flag (update mode).

    Works on a streaming DataFrame with (requester, bytessent) columns —
    the output of ``parse_log_stream``."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["bytessent"].fillna(0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "requester": [key[0]],
                "n_requests": [n],
                "total_bytes": [total],
                "over_quota": [total > quota_bytes],
            }
        )

    return (
        parsed.select("requester", "bytessent")
        .groupBy("requester")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

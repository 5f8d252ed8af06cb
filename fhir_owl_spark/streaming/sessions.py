"""Custom stateful streaming operator — applyInPandasWithState.

``running_conversation_counts`` maintains per-conversation running turn
counts across micro-batches: arbitrary keyed state beyond what built-in
streaming aggregations offer (the built-in count would suffice for THIS
statistic — the operator exists as the seam for stateful per-conversation
logic like incremental entity-context tracking, where each batch must see
the accumulated conversation state).

State = one (n_turns, n_chars) pair per conv_id; bounded by conversation
count, evictable via GroupStateTimeout in production feeds.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_COUNTS = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_chars", LongType()),
    ]
)

_STATE = StructType(
    [StructField("n_turns", LongType()), StructField("n_chars", LongType())]
)


def _update(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_turns, n_chars = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_turns += len(pdf)
        n_chars += int(pdf["text"].fillna("").str.len().sum())
    state.update((n_turns, n_chars))
    yield pd.DataFrame(
        {"conv_id": [key[0]], "n_turns": [n_turns], "n_chars": [n_chars]}
    )


def running_conversation_counts(transcripts: DataFrame) -> DataFrame:
    """Streaming DF in (transcript shape) → running totals per conv_id,
    one updated row per conversation per micro-batch."""
    return (
        transcripts.select("conv_id", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_COUNTS,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

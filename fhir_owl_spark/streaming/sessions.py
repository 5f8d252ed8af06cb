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


SESSION_ROWS = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", LongType()),
        StructField("gap_us", LongType()),
        StructField("session_idx", LongType()),
    ]
)

_SESSION_STATE = StructType(
    [StructField("last_ts_us", LongType()), StructField("session_idx", LongType())]
)


def sessionize_stream(transcripts: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization — the stateful analog of
    ``operators.conversations.sessionize``: assign a session index that
    increments at inactivity gaps > ``gap``, carrying (last timestamp,
    current session) per conversation as keyed state ACROSS micro-batches.

    Contract: a conversation's turns arrive in turn order across batches
    (within a batch they are sorted here); the stream≡batch parity test
    drives two runs against one checkpoint so sessions provably span
    micro-batch and restart boundaries. State is two longs per live
    conversation — evict with a GroupStateTimeout in production feeds.
    """
    gap_us_threshold = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def assign(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts_us, sess = state.get if state.exists else (None, 0)
        pdf = pd.concat(list(pdfs)).sort_values("turn_idx")
        out: dict = {"conv_id": [], "turn_idx": [], "gap_us": [], "session_idx": []}
        for ts, idx in zip(pdf["ts"], pdf["turn_idx"]):
            ts_us = int(pd.Timestamp(ts).value) // 1000
            gap_v = None if last_ts_us is None else ts_us - last_ts_us
            if gap_v is not None and gap_v > gap_us_threshold:
                sess += 1
            out["conv_id"].append(key[0])
            out["turn_idx"].append(int(idx))
            out["gap_us"].append(gap_v)
            out["session_idx"].append(sess)
            last_ts_us = ts_us
        state.update((last_ts_us, sess))
        yield pd.DataFrame(out)

    return (
        transcripts.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            assign,
            outputStructType=SESSION_ROWS,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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

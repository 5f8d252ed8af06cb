"""Streaming burst detection — the stateful twin of
``operators.temporal.burst_detection`` (round-5 tail: completes the
streaming family alongside exact dedup, near-dup, sessionization and
windowed counts).

Semantics: identical to the batch operator — per (key, time bucket)
counts flagged when ``cnt · base_n > factor · base_sum`` over the
previous ``baseline_buckets`` OBSERVED buckets (gaps skipped, all-integer
predicate). A bucket's row is emitted when the bucket CLOSES, i.e. when
the first event of a LATER bucket arrives for that key — the same
finalize-on-advance contract as sessionize_stream's ordered-arrival
contract: a key's events arrive in timestamp order across micro-batches
(within a batch they are sorted here). The key's current in-progress
bucket stays in state, so a replayed finite corpus reproduces the batch
output for every bucket except each key's LAST (still open) one; feeds
that need the tail flushed append a sentinel event one bucket past the
horizon (what the equivalence test does).

State per key: (current bucket start µs, running count, history of the
last ``baseline_buckets`` closed-bucket counts) — a handful of longs,
bounded by construction; evict idle keys with a GroupStateTimeout in
production feeds.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

BURST_ROWS = StructType(
    [
        StructField("key", StringType()),
        StructField("bucket", TimestampType()),
        StructField("cnt", LongType()),
        StructField("base_sum", LongType()),
        StructField("base_n", LongType()),
        StructField("is_burst", BooleanType()),
        StructField("burst_ratio", DoubleType()),
    ]
)

_BURST_STATE = StructType(
    [
        StructField("cur_bucket_us", LongType()),
        StructField("cur_cnt", LongType()),
        StructField("hist", ArrayType(LongType())),
    ]
)

# pandas floor() aliases for the resolutions whose truncation matches
# date_trunc exactly (week/month anchors differ — batch-only)
_FLOOR = {"minute": "min", "hour": "h", "day": "D"}


def burst_stream(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    resolution: str = "day",
    baseline_buckets: int = 7,
    factor: int = 2,
    min_baseline: int = 3,
) -> DataFrame:
    """Streaming DF in → one finalized (key, bucket) burst row per closed
    bucket, batch-identical (see module docstring for the close/flush
    contract)."""
    if resolution not in _FLOOR:
        raise ValueError(
            f"streaming burst supports resolutions {sorted(_FLOOR)}, got "
            f"{resolution!r} (week/month floor anchors differ from "
            "date_trunc — use the batch operator)"
        )
    freq = _FLOOR[resolution]

    def update(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur_b, cur_c, hist = state.get if state.exists else (None, 0, [])
        hist = list(hist)
        out: dict = {
            "key": [],
            "bucket": [],
            "cnt": [],
            "base_sum": [],
            "base_n": [],
            "is_burst": [],
            "burst_ratio": [],
        }

        def close_bucket() -> None:
            base_sum, base_n = sum(hist), len(hist)
            out["key"].append(key[0])
            out["bucket"].append(pd.Timestamp(cur_b * 1000))
            out["cnt"].append(cur_c)
            out["base_sum"].append(base_sum)
            out["base_n"].append(base_n)
            out["is_burst"].append(
                base_n >= min_baseline and cur_c * base_n > factor * base_sum
            )
            out["burst_ratio"].append(
                round(cur_c * base_n / base_sum, 6) if base_sum > 0 else None
            )

        pdf = pd.concat(list(pdfs)).sort_values(ts_col)
        for ts in pdf[ts_col]:
            b_us = int(pd.Timestamp(ts).floor(freq).value) // 1000
            if cur_b is None:
                cur_b, cur_c = b_us, 0
            elif b_us != cur_b:
                close_bucket()
                hist.append(cur_c)
                del hist[:-baseline_buckets]
                cur_b, cur_c = b_us, 0
            cur_c += 1
        state.update((cur_b, cur_c, hist))
        yield pd.DataFrame(out)

    return (
        # the output schema declares the key as STRING; cast here so any
        # batch-supported key type (ints, dates) streams too — the
        # equivalence contract is vs batch burst_detection over the
        # string-cast key. Null timestamps are dropped up front: a NaT
        # reaching pd.Timestamp(ts).floor() would otherwise produce an
        # INT64_MIN garbage bucket (round-5 ADVICE); the batch operator
        # emits a null-bucket row for them instead — documented
        # divergence on null-ts feeds.
        events.filter(F.col(ts_col).isNotNull())
        .select(ts_col, F.col(key_col).cast("string").alias(key_col))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=BURST_ROWS,
            stateStructType=_BURST_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

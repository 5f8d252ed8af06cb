"""Per-conversation operators — the grouped-map (applyInPandas) pattern.

``conversation_features`` computes per-conversation shape statistics with
one Arrow batch per conversation group. NOTE: these particular aggregates
are also expressible as groupBy + window Column code (and that is what
the DuckDB oracle does — the two implementations cross-check each other);
the grouped-map form is here because it is the extension seam for
context-dependent per-conversation scoring (mention disambiguation using
surrounding turns), which Column code cannot express.

Scale shape: one shuffle on conv_id; conversations are bounded (10^2-10^3
turns), so group memory is bounded; skewed giant conversations are the
pathological case — cap enforced via cfg in the caller if needed.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CONV_FEATURES = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_user_turns", LongType()),
        StructField("total_chars", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("max_gap_s", DoubleType()),
        StructField("max_gap_us", LongType()),
        StructField("n_roles", IntegerType()),
    ]
)


def conversation_features(transcripts: DataFrame) -> DataFrame:
    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        ts = pdf["ts"]
        # exact integer-microsecond gaps: float total_seconds() on epoch-scale
        # timestamps loses sub-microsecond precision, which breaks
        # cross-engine value equality (the DuckDB oracle computes the same
        # quantity via epoch_us bigint subtraction)
        # drop NaT BEFORE the int64 view: NaT casts to int64-min, which
        # dropna() would keep and turn into astronomically large garbage
        # gaps. Normalize to ns (Arrow may hand us datetime64[us], whose
        # int64 view would be µs, not ns).
        ts_valid = ts.dropna()
        gaps_us = (
            ts_valid.astype("datetime64[ns]").astype("int64").diff().dropna() // 1000
        )
        max_gap_us = int(gaps_us.max()) if len(gaps_us) else 0
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "n_user_turns": [int((pdf["role"] == "user").sum())],
                "total_chars": [int(pdf["text"].fillna("").str.len().sum())],
                "first_ts": [ts.min()],
                "last_ts": [ts.max()],
                "max_gap_s": [max_gap_us / 1e6],
                "max_gap_us": [max_gap_us],
                "n_roles": [int(pdf["role"].nunique())],
            }
        )

    return transcripts.groupBy("conv_id").applyInPandas(per_conv, CONV_FEATURES)

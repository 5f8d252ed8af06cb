"""Streaming exact deduplication — the ingest-side twin of
operators/dedup.exact_dedup.

Built on Spark's native ``dropDuplicatesWithinWatermark`` (Spark 3.5+):
state holds one entry per distinct key seen within the watermark delay
and is evicted as the watermark advances, so state size is bounded by
the distinct-key arrival rate × the dedup window — NOT by stream
lifetime (plain ``dropDuplicates`` on a stream retains state forever,
which is the classic unbounded-state failure at 100 TB/day ingest).

The dedup key is the sha256 of the text (same canonical key as the batch
operator — the raw text never becomes shuffle/state key), so re-sent or
replayed documents inside the window are dropped exactly once per
content, regardless of doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop documents whose text was already seen within the watermark
    window. Adds ``text_hash``; rows with NULL ``ts`` are dropped by the
    watermark (late-data contract). Works identically on a batch frame
    except that batch mode deduplicates globally (no watermark
    semantics) — the equivalence test exploits exactly that."""
    hashed = stream.withColumn(
        "text_hash", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    )
    if not stream.isStreaming:
        return hashed.dropDuplicates(["text_hash"])
    return hashed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )

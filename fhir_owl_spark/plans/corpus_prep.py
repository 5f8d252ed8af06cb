"""The composed training-data preparation plan: one declarative pipeline
from raw scraped documents to training-ready chunks.

    normalize → quality + repetition verdicts → filter →
    exact-dedup (keep lowest id per normalized text) → chunk →
    deterministic sample

Everything is Column code from the operator library, so Catalyst sees
ONE plan: the normalization and verdict projections fuse into the scan,
the only corpus-scale shuffle is the dedup hash-aggregate on the
normalized-text key, chunking is a map-side explode, and the sample
filter is pushed below the explode where possible. At 100 TB this runs
as scan → project/filter → one exchange → explode → filter, with no
Python anywhere.

The same composition is expressible in ANSI SQL, so the whole pipeline
is value-oracled end-to-end (contract query ``corpus_prep``), not just
its stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.sampling import sample_rows
from ..operators.text import (
    chunk_documents,
    normalize_text_col,
    quality_features,
    repetition_features,
)


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.0,
    max_tokens: int = 128,
    overlap: int = 16,
    sample_rate: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_salt: str = "v1",
    hash_fn=F.xxhash64,
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens) for the kept, deduplicated,
    chunked, sampled corpus. ``hash_fn`` parameterizes the sampling hash
    (the contract oracle passes an md5-derived hash DuckDB reproduces).

    Use a NUMERIC ``id_col``: min(long) aggregates in a mutable buffer
    (HashAggregate, no sort); min(string) would silently fall back to
    SortAggregate — a per-partition sort of the whole corpus."""
    normalized = docs.withColumn(text_col, normalize_text_col(text_col))
    feats = repetition_features(quality_features(normalized, text_col), text_col)
    kept = feats.filter(
        F.col("repetition_ok") & (F.col("quality_score") >= min_quality)
    ).select(id_col, text_col)
    # exact dedup on the normalized text: keep the LOWEST id per text —
    # min_by inside one hash aggregate (map-side combined), no sort, no
    # window; the text key is the group key so the shuffle is uniform
    # except for true duplicate clusters (AQE splits those)
    deduped = (
        kept.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, text_col)
    )
    chunks = chunk_documents(deduped, max_tokens, overlap, text_col, id_col)
    if sample_rate < 1.0:
        chunks = sample_rows(chunks, sample_rate, id_col, sample_salt, hash_fn)
    return chunks

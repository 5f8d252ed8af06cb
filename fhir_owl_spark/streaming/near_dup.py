"""Streaming near-duplicate detection — the ingest-side twin of
operators/dedup.minhash_dedup_pairs (round-5 item #8: completes the
streaming family beyond exact dedup).

Semantics — FIRST-SEEN WINS, flag-the-rest:
  every document is minhashed and banded exactly like the batch
  operator; each LSH band bucket keeps ONE representative, the minimum
  doc id ever seen in it. A new document is a near-dup iff its estimated
  Jaccard (fraction of agreeing minhash positions — the standard
  streaming surrogate for the batch operator's exact-Jaccard pass, since
  original texts are not retained in state) against any candidate
  representative reaches the threshold; it is flagged once, with
  ``dup_of`` = the smallest verified earlier id. Candidates per document
  are bounded by construction: ≤ n_bands bucket representatives from the
  store plus the within-batch bucket minimum — the star-connect guard is
  not a fallback here, it IS the data model, so a 100k-member
  boilerplate cluster costs O(C) comparisons over its lifetime, never
  O(C²).

Recall caveat (documented, same spirit as the batch star-connect
truncation): verification only runs against bucket representatives, so
a document that fails the threshold against every representative but
would have passed against a non-representative member is missed. The
batch twin ``near_dup_first_seen`` implements the SAME policy, which is
what makes stream ≡ batch testable exactly.

Exactly-once + resume: runs inside ``foreachBatch``. The bucket store is
versioned per micro-batch (``store/v{batch_id}``) and each batch writes
its output to ``out/batch={batch_id}`` with overwrite — reprocessing a
batch after a crash reads the same store version (latest < batch_id) and
deterministically overwrites the same outputs, so a checkpoint restart
yields byte-identical results. At 100 TB the versioned-directory store
becomes an Iceberg/Delta table with snapshot isolation, and the
full-store rewrite below becomes a keyed MERGE INTO touching only the
buckets the batch actually hit (bounded by batch_docs × n_bands rows —
the sandbox parquet layout has no upsert, so it rewrites; measured at
50k docs / 155k store rows the rewrite is ~1-2 s per micro-batch and is
the dominant per-batch cost, which is exactly what the MERGE removes).
The candidate/verify logic is unchanged either way (one join + two
grouped aggregations, all on the band-hash key).

Equivalence contract: with doc ids nondecreasing in arrival order (an
ingest monotonic id — the natural case), the evolving bucket
representative always equals the global bucket minimum among earlier
documents, so the replayed stream produces EXACTLY
``near_dup_first_seen`` of the full corpus (tested, including across a
checkpoint restart).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import minhash_signatures

_STORE_SCHEMA = "band_idx int, band_hash long, rep_id long, rep_sig array<long>"


def _est_jaccard(sig_a, sig_b):
    """Fraction of agreeing minhash positions — pure Column, JVM-side."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree.cast("double") / F.size(sig_a).cast("double")


def _band(sigs: DataFrame, n_bands: int, sig_len: int, id_col: str) -> DataFrame:
    # same guard as dedup.lsh_candidate_pairs: with sig_len < n_bands every
    # band would hash an empty slice and ALL documents would collide into
    # one bucket per band (r5 self-review: the silent-degradation path)
    if sig_len < n_bands:
        raise ValueError(
            f"signature length {sig_len} < n_bands={n_bands}: every band "
            "would hash an empty slice and all documents would collide into "
            "one bucket"
        )
    rows_per_band = sig_len // n_bands
    return sigs.select(
        F.col(id_col),
        F.col("signature"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.slice(
                    F.col("signature"), b * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band_idx", "_slice"),
    ).select(
        F.col(id_col),
        "signature",
        "band_idx",
        F.xxhash64("_slice").alias("band_hash"),
    )


def near_dup_first_seen(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Batch twin of the streaming operator: flag every document whose
    estimated Jaccard against a band-bucket representative (the global
    bucket-minimum id) reaches the threshold; ``dup_of`` is the smallest
    verified representative. One band shuffle + one id-keyed join + one
    per-doc aggregation — no pairwise blowup anywhere."""
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    bands = _band(sigs, n_bands, n_hashes, id_col)
    reps = bands.groupBy("band_idx", "band_hash").agg(
        F.min(id_col).alias("_rep_id")
    )
    cands = (
        bands.join(reps, ["band_idx", "band_hash"])
        .filter(F.col("_rep_id") < F.col(id_col))
        .select(
            F.col("_rep_id").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.col("signature").alias("_sig_b"),
        )
        .distinct()
    )
    rep_sigs = sigs.select(
        F.col(id_col).alias("id_a"), F.col("signature").alias("_sig_a")
    )
    verified = (
        cands.join(rep_sigs, "id_a")
        .withColumn("est_jaccard", _est_jaccard("_sig_a", "_sig_b"))
        .filter(F.col("est_jaccard") >= threshold)
    )
    best = verified.groupBy("id_b").agg(
        F.min(F.struct("id_a", "est_jaccard")).alias("_best")
    )
    return best.select(
        F.col("id_b").alias(id_col),
        F.col("_best.id_a").alias("dup_of"),
        F.round("_best.est_jaccard", 6).alias("est_jaccard"),
    )


def _latest_store(
    spark: SparkSession, store_path: str, before_batch: int
) -> DataFrame:
    versions = [
        int(os.path.basename(p)[1:])
        for p in glob.glob(os.path.join(store_path, "v*"))
        if os.path.basename(p)[1:].isdigit()
    ]
    versions = [v for v in versions if v < before_batch]
    if not versions:
        return spark.createDataFrame([], _STORE_SCHEMA)
    return spark.read.parquet(os.path.join(store_path, f"v{max(versions)}"))


def start_near_dup_stream(
    spark: SparkSession,
    stream: DataFrame,
    out_path: str,
    store_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
):
    """Start the incremental near-dup stream over ``stream`` (a streaming
    DataFrame of documents). Emits (doc_id, dup_of, est_jaccard) rows to
    ``out_path/batch={id}``; maintains the versioned band-bucket store
    under ``store_path``. Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sigs = minhash_signatures(
            batch_df, text_col, id_col, n_hashes, shingle_k
        ).localCheckpoint()  # feeds banding twice (cands + store update)
        bands = _band(sigs, n_bands, n_hashes, id_col)
        store = _latest_store(spark, store_path, batch_id)

        # cross-batch candidates: ≤ n_bands stored representatives per doc
        cross = bands.join(store, ["band_idx", "band_hash"]).select(
            F.least("rep_id", F.col(id_col)).alias("id_a"),
            F.greatest("rep_id", F.col(id_col)).alias("id_b"),
        ).filter(F.col("id_a") != F.col("id_b"))
        # within-batch candidates: star to the batch-bucket minimum — but
        # ONLY for buckets the store has never seen. For a stored bucket
        # the global representative is the store's rep (ids are
        # arrival-ordered), and the batch twin considers exactly that
        # edge, already covered by `cross`; adding the within-batch star
        # there would verify pairs the twin never considers and break the
        # stream ≡ batch contract (r5 self-review finding)
        new_buckets = bands.join(
            store.select("band_idx", "band_hash").distinct(),
            ["band_idx", "band_hash"],
            "left_anti",
        )
        bmin = new_buckets.groupBy("band_idx", "band_hash").agg(
            F.min(id_col).alias("_bmin")
        )
        within = (
            new_buckets.join(bmin, ["band_idx", "band_hash"])
            .filter(F.col("_bmin") < F.col(id_col))
            .select(F.col("_bmin").alias("id_a"), F.col(id_col).alias("id_b"))
        )
        cands = cross.union(within).distinct()

        # signatures of both sides: batch sigs ∪ stored representative sigs
        all_sigs = sigs.select(id_col, "signature").union(
            store.select(
                F.col("rep_id").alias(id_col), F.col("rep_sig").alias("signature")
            ).distinct()
        )
        verified = (
            cands.join(
                all_sigs.withColumnsRenamed({id_col: "id_a", "signature": "_sig_a"}),
                "id_a",
            )
            .join(
                all_sigs.withColumnsRenamed({id_col: "id_b", "signature": "_sig_b"}),
                "id_b",
            )
            .withColumn("est_jaccard", _est_jaccard("_sig_a", "_sig_b"))
            .filter(F.col("est_jaccard") >= threshold)
        )
        out = (
            verified.groupBy("id_b")
            .agg(F.min(F.struct("id_a", "est_jaccard")).alias("_best"))
            .select(
                F.col("id_b").alias(id_col),
                F.col("_best.id_a").alias("dup_of"),
                F.round("_best.est_jaccard", 6).alias("est_jaccard"),
            )
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )

        # store update: representative = min(existing rep, batch bucket min)
        merged = store.select(
            "band_idx", "band_hash",
            F.col("rep_id").alias("_id"), F.col("rep_sig").alias("_sig"),
        ).union(
            bands.select(
                "band_idx", "band_hash",
                F.col(id_col).alias("_id"), F.col("signature").alias("_sig"),
            )
        )
        new_ids = merged.groupBy("band_idx", "band_hash").agg(
            F.min("_id").alias("rep_id")
        )
        new_store = new_ids.join(
            merged.select(
                "band_idx", "band_hash", F.col("_id").alias("rep_id"),
                F.col("_sig").alias("rep_sig"),
            ).distinct(),
            ["band_idx", "band_hash", "rep_id"],
        )
        new_store.write.mode("overwrite").parquet(
            os.path.join(store_path, f"v{batch_id}")
        )
        # retention: a retry of batch N re-reads v{N-1}, and a retry of
        # N+1 re-reads v{N} — anything older is dead. Keeping exactly two
        # versions bounds the store to 2× bucket-cardinality on disk
        # (Iceberg snapshot expiry in production); deleting AFTER the new
        # version commits keeps every crash window recoverable.
        for p in glob.glob(os.path.join(store_path, "v*")):
            name = os.path.basename(p)[1:]
            if name.isdigit() and int(name) < batch_id - 1:
                shutil.rmtree(p, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

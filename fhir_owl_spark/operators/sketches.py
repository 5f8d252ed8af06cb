"""Distinct-count sketching: K-minimum-values (KMV / bottom-k).

Spark ships HyperLogLog++ (approx_count_distinct), but its estimate is
engine-internal — nothing else can reproduce the number, so a contract
oracle can only rows-check it. KMV (Bar-Yossef et al. 2002) is the
sketch whose estimate IS a deterministic function of the data and the
hash: with h mapping values uniformly into [0, 2^60), the k-th smallest
distinct hash h_k estimates the distinct count as (k-1) · 2^60 / h_k.
Any engine computing the same hash gets the same estimate bit-for-bit —
the DuckDB oracle recomputes it exactly (md5-based 60-bit hash).

Scale shape: hash projection → hash-distinct (the one shuffle, 8 bytes
per distinct value) → TakeOrderedAndProject for the bottom-k
(per-partition heads merged on the driver) → a 1-row aggregate. Standard
error ≈ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HASH_SPACE = float(1 << 60)  # md5_60bit / xxhash60 range


def _hash60(c: Column, hash_fn) -> Column:
    # fold any 64-bit hash into [0, 2^60) so the estimator's space
    # constant matches md5_60bit exactly
    return F.pmod(hash_fn(c), F.lit(1 << 60))


def kmv_distinct(
    df: DataFrame, col: str, k: int = 64, hash_fn=F.xxhash64
) -> DataFrame:
    """One row: (n_sketch, distinct_est). Exact when fewer than k distinct
    values exist (the sketch degenerates to the true count); otherwise
    the KMV estimate floor((k-1) · 2^60 / h_k). ``hash_fn`` is
    parameterized so the contract oracle can use the md5-derived hash
    DuckDB reproduces (production default xxhash64)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashes = df.select(_hash60(F.col(col), hash_fn).alias("h")).distinct()
    bottom = hashes.orderBy("h").limit(k)
    agg = bottom.agg(F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("kth"))
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth")).cast("double")
    )
    return agg.select("n_sketch", est.cast("long").alias("distinct_est"))

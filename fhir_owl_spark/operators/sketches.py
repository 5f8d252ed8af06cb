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


def count_min_counts(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn=None,
) -> DataFrame:
    """Count-min sketch estimates per DISTINCT item (Cormode &
    Muthukrishnan 2005) — the fixed-memory heavy-hitter counter a
    streaming/telemetry pipeline keeps when exact per-key counts
    (`vocab_top_k`'s shuffle) don't fit: depth×width counters bound the
    state regardless of key cardinality, and est(x) = min_d
    counter[d][h_d(x)] overestimates by at most ε·N with probability
    1−δ (ε = e/width, δ = e^−depth).

    Same oracle philosophy as KMV: the sketch is a DETERMINISTIC
    function of the data and the hash (row d hashes ``d|item``), so an
    external engine replays the identical counters and estimates —
    approximate vs the truth, exact vs the algorithm. Returns
    (item, est, true_cnt, overestimate = est − true_cnt ≥ 0).

    Scale shape: ONE (depth × bucket)-keyed aggregation builds the
    counter table (≤ depth·width rows — broadcast-class whatever the
    input size, the point of the sketch); the per-item estimate joins
    each distinct item's depth probes against it BROADCAST; the true
    count is one more hash agg (kept for validation — production reads
    only the counter table).
    """
    if hash_fn is None:
        from .dedup import md5_60bit

        hash_fn = md5_60bit
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1, got {width}x{depth}")

    rows = F.explode(
        F.array(*[F.lit(d) for d in range(depth)])
    ).alias("_d")
    # NULL items are excluded up front: they would pollute the counters
    # (concat_ws skips nulls, hashing every depth row to the same seed)
    # yet silently vanish from the null-unsafe estimate join — the
    # operator's contract is distinct NON-NULL items
    items = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    probes = items.select("item", rows)
    bucket = F.pmod(
        hash_fn(F.concat_ws("|", F.col("_d").cast("string"), F.col("item"))),
        F.lit(width),
    )
    counters = (
        probes.groupBy(F.col("_d"), bucket.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    item_probes = (
        items.distinct()
        .select("item", rows)
        .withColumn("_b", bucket)
    )
    est = (
        item_probes.join(F.broadcast(counters), ["_d", "_b"])
        .groupBy("item")
        .agg(F.min("_c").alias("est"))
    )
    truth = items.groupBy("item").agg(F.count(F.lit(1)).alias("true_cnt"))
    return est.join(truth, "item").select(
        "item",
        F.col("est").cast("long").alias("est"),
        F.col("true_cnt").cast("long").alias("true_cnt"),
        (F.col("est") - F.col("true_cnt")).cast("long").alias("overestimate"),
    )

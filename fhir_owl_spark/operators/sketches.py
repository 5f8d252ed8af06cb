"""Distinct-count sketching: KMV (bottom-k), count-min, HyperLogLog.

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


def _hll_alpha(m: int) -> float:
    # Flajolet et al. 2007 bias constants
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


# cap register values at 40 so the harmonic sum Σ 2^-M has an EXACT
# int64 representation scaled by 2^40 (m·2^40 ≤ 2^56 for p ≤ 16 —
# no overflow, no float-summation order dependence); rho > 40 needs
# ~2^40 values per register, so the cap never binds on real data
_HLL_RHO_CAP = 40


def _hll_register_cols(col: str, p: int, hash_fn):
    """(register index, rho) Column pair over the 60-bit hash: LOW p
    bits pick the register, the HIGH w = 60-p bits carry
    rho = position of the first 1 bit (1-indexed; w+1 if all zero)."""
    w = 60 - p
    h = _hash60(F.col(col), hash_fn)
    idx = F.pmod(h, F.lit(1 << p))
    rest = F.shiftright(h, p)
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rest))
    )
    return idx, rho


def _hll_estimate_cols(m: int):
    """Estimate Columns over the folded (_n_regs, _numer_present) pair.
    The harmonic sum is the exact integer rational numer / 2^CAP, so
    raw = alpha·m²·2^CAP / numer is ONE IEEE division; linear counting
    (raw ≤ 2.5m with empty registers) is the one libm ln, absorbed by
    4-decimal rounding."""
    alpha_scaled = _hll_alpha(m) * float(m) * float(m) * float(1 << _HLL_RHO_CAP)
    v_empty = F.lit(m) - F.col("_n_regs")
    numer = F.coalesce(F.col("_numer_present"), F.lit(0)) + v_empty * F.lit(
        1 << _HLL_RHO_CAP
    )
    raw = F.lit(alpha_scaled) / numer.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(raw)
    return [
        F.lit(m).cast("long").alias("m"),
        v_empty.cast("long").alias("v_empty"),
        F.round(raw, 4).alias("raw_est"),
        F.round(est, 4).alias("est"),
    ]


_HLL_TERM_SQL = (
    "shiftleft(CAST(1 AS BIGINT), "
    f"CAST({_HLL_RHO_CAP} - least(_m, {_HLL_RHO_CAP}) AS INT))"
)


def hll_distinct(
    df: DataFrame, col: str, p: int = 8, hash_fn=F.xxhash64
) -> DataFrame:
    """One-row HyperLogLog distinct estimate (Flajolet et al. 2007) —
    the register-based sketch production engines actually ship (Spark's
    approx_count_distinct IS HLL++, but its registers and estimate are
    engine-internal; this one is a deterministic function of the data
    and the hash, so the DuckDB contract oracle replays the identical
    registers and — on the raw-estimate path — the bit-identical
    estimate). Completes the sketch trio with KMV (distinct via order
    statistics) and count-min (frequency).

    Register math and estimator: see _hll_register_cols /
    _hll_estimate_cols. Large-range correction is intentionally
    absent: it exists for 32-bit hash saturation and a 60-bit space
    never gets there. An EMPTY input estimates 0 (all registers empty
    → linear counting of a full register file), it does not error.

    Scale shape: map-side (register, rho) projection → ONE m-row
    combiner-backed hash aggregate (the shuffle carries at most m rows
    per task — sketch-sized, not data-sized, the reason HLL beats
    KMV's global bottom-k sort at scale) → a 1-row fold. Standard
    error ≈ 1.04/sqrt(m). NULLs are excluded (same contract as
    count_min_counts).
    """
    return hll_distinct_by(df, col, (), p=p, hash_fn=hash_fn)


def hll_distinct_by(
    df: DataFrame,
    col: str,
    key_cols,
    p: int = 8,
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Per-key HyperLogLog: approx distinct ``col`` per ``key_cols``
    group — the production GROUP-BY shape (distinct users per event
    type, distinct domains per language) where exact countDistinct
    shuffles every (key, value) pair. Here the shuffle carries at most
    m rows PER KEY (the register file), and the register aggregation
    is mergeable by construction — the same max-fold that merges
    partial register files across partitions merges sketches across
    time windows or table partitions.

    Output: key columns + (m, v_empty, raw_est, est) per key. Keys with
    only-NULL values vanish (no registers), matching countDistinct's
    treatment of empty groups under a WHERE. With ``key_cols=()`` this
    is exactly ``hll_distinct``.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    keys = list(key_cols)
    idx, rho = _hll_register_cols(col, p, hash_fn)
    regs = (
        df.filter(F.col(col).isNotNull())
        .select(*[F.col(k) for k in keys], idx.alias("_r"), rho.alias("_rho"))
        .groupBy(*keys, "_r")
        .agg(F.max("_rho").alias("_m"))
    )
    folded = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n_regs"),
        F.sum(F.expr(_HLL_TERM_SQL)).alias("_numer_present"),
    )
    return folded.select(*[F.col(k) for k in keys], *_hll_estimate_cols(m))


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    k: int = 256,
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Distinct-overlap estimation between two corpora from ONE merged
    bottom-k sketch (Broder 1997's min-wise resemblance, in KMV form):
    the k smallest distinct hashes of A ∪ B are a uniform sample of the
    union's distinct values, so the fraction of them present in BOTH
    sides estimates Jaccard, and overlap_est = jaccard_est · union_est
    answers the curation question "how many distinct items do these two
    corpora share?" (vocabulary / shingle / URL overlap between a new
    crawl and the existing corpus) without ever joining the corpora.

    Output row: (n_sketch, in_both, union_est, jaccard_est,
    overlap_est). Exact when the union has fewer than k distinct values
    (the sketch IS the union). Every estimate is a deterministic
    function of the data and the hash — floor/round of one or two IEEE
    ops over exact integers — so the DuckDB oracle reproduces each
    number bit-for-bit. Standard error on jaccard ≈ sqrt(J(1−J)/k).

    Scale shape: each side is a map-side hash projection with a
    membership flag; ONE hash-keyed aggregate OR-merges the flags
    (8-byte keys, map-side combine); TakeOrderedAndProject keeps the
    global bottom-k (per-partition heads merged on the driver); a
    1-row fold computes the estimates. NULLs excluded on both sides.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def _side(df: DataFrame, a: int, b: int) -> DataFrame:
        return df.filter(F.col(col).isNotNull()).select(
            _hash60(F.col(col), hash_fn).alias("h"),
            F.lit(a).alias("_a"),
            F.lit(b).alias("_b"),
        )

    marked = (
        _side(df_a, 1, 0)
        .unionByName(_side(df_b, 0, 1))
        .groupBy("h")
        .agg(F.max("_a").alias("_a"), F.max("_b").alias("_b"))
    )
    bottom = marked.orderBy("h").limit(k)
    agg = bottom.agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("_kth"),
        F.sum(F.col("_a") * F.col("_b")).alias("in_both"),
    )
    union_est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.floor(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("_kth")))
    jacc = F.when(
        F.col("n_sketch") > 0,
        F.col("in_both") / F.col("n_sketch").cast("double"),
    )
    # below saturation the sketch IS the union, so in_both IS the exact
    # overlap — return it directly rather than floor(jacc·union), whose
    # FP round-trip can lose 1 on exact ratios (e.g. floor((3/13)·13))
    overlap = F.when(
        F.col("n_sketch") < k, F.coalesce(F.col("in_both"), F.lit(0))
    ).otherwise(F.floor(jacc * union_est))
    return agg.select(
        F.col("n_sketch").cast("long").alias("n_sketch"),
        F.coalesce(F.col("in_both"), F.lit(0)).cast("long").alias("in_both"),
        union_est.cast("long").alias("union_est"),
        F.round(jacc, 6).alias("jaccard_est"),
        overlap.cast("long").alias("overlap_est"),
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    percents=(50, 90, 99),
    lo: int = 0,
    hi: int = 1024,
    bins: int = 64,
    by=(),
) -> DataFrame:
    """Fixed-width histogram quantile sketch — the mergeable distributed
    percentile the exact form (`length_percentiles`' percentile_approx /
    DuckDB quantile) cannot give you at 100 TB without a full sort:
    values are binned into ``bins`` equal-width buckets over [lo, hi)
    (outliers clamp into the edge bins), the per-bin counts ARE the
    sketch (mergeable by addition — a GROUP BY over shards or days sums
    to the corpus sketch), and the p-th percentile estimate is the UPPER
    edge of the first bin whose cumulative count reaches
    ceil(n·p/100). Guaranteed one-sided error ≤ one bin width
    (width = (hi-lo)/bins) on clamped data; every output number is
    integer arithmetic, so any engine replays it bit-for-bit.

    ``by`` gives the GROUP-BY form: one sketch per key, the shuffle
    carrying at most ``bins`` counter rows per key instead of every
    value (same scale shape as hll_distinct_by).

    Output rows: (*by, p, n_rows, target_rank, est) — one per key ×
    percent; est is clamped to [lo+width, hi]. NULL values excluded.

    Scale shape: ONE map-side-combinable hash aggregate on (*by, bin)
    (≤ |keys|·bins distinct groups) is the only data-scale operation;
    the cumulative-sum window, totals, and rank probe all run at sketch
    size (like kmv_distinct's bottom-k fold).
    """
    if hi <= lo:
        raise ValueError(f"hi must exceed lo, got [{lo}, {hi})")
    if bins < 1 or (hi - lo) % bins != 0:
        raise ValueError(
            f"bins must divide hi-lo exactly, got {bins} over {hi - lo}"
        )
    width = (hi - lo) // bins
    if not percents:
        raise ValueError("percents must be non-empty")
    for p in percents:
        if int(p) != p or not 1 <= p <= 100:
            raise ValueError(f"percents must be integers in [1, 100], got {p}")

    from pyspark.sql import Window

    v = F.col(col).cast("long")
    clamped = F.greatest(F.lit(lo), F.least(F.lit(hi - 1), v))
    bin_idx = F.floor((clamped - F.lit(lo)) / F.lit(width)).cast("long")
    sketch = (
        df.filter(v.isNotNull())
        .groupBy(*by, bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.select(*by, "bin", F.sum("c").over(w).alias("cum")).alias("cum")
    totals = sketch.groupBy(*by).agg(F.sum("c").alias("n_rows"))
    pcts = df.sparkSession.createDataFrame(
        [(int(p),) for p in percents], "p bigint"
    )
    ranks = (
        totals.crossJoin(F.broadcast(pcts))
        .withColumn("target_rank", F.expr("(n_rows * p + 99) div 100"))
        .alias("rk")
    )
    cond = F.col("cum.cum") >= F.col("rk.target_rank")
    for k in by:
        cond = cond & (F.col(f"cum.{k}") == F.col(f"rk.{k}"))
    est = F.least(
        F.lit(hi), F.lit(lo) + (F.col("_bin") + F.lit(1)) * F.lit(width)
    ).cast("long")
    return (
        ranks.join(cum, cond)
        .groupBy(
            *[F.col(f"rk.{k}").alias(k) for k in by],
            F.col("rk.p").alias("p"),
            F.col("rk.n_rows").alias("n_rows"),
            F.col("rk.target_rank").alias("target_rank"),
        )
        .agg(F.min("cum.bin").alias("_bin"))
        .select(*by, "p", "n_rows", "target_rank", est.alias("est"))
    )

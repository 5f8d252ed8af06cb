"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent on partitioning (a repartition changes
which rows survive), which breaks reproducibility contracts at scale.
These operators sample by HASHING ROW IDENTITY instead: a row's fate
depends only on its key, so the sample is stable under any partitioning,
any cluster size, and incremental reruns — the property a 100-TB corpus
refresh actually needs (rows sampled yesterday stay sampled tomorrow).

Pure Column code (JVM-side hash + modulo), no shuffle, filter pushes
into the scan where the source supports it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# granularity of the rate: 1e6 buckets → rate resolution 1e-6
_BUCKETS = 1_000_000


def hash_bucket(key_col: Column, salt: str, hash_fn=F.xxhash64) -> Column:
    """Stable bucket in [0, 1e6) from (key, salt). hash_fn is
    parameterized so the contract oracle can use an md5-derived hash that
    DuckDB reproduces (see operators.dedup.md5_60bit); production default
    is xxhash64 (faster)."""
    return F.pmod(hash_fn(F.concat(key_col.cast("string"), F.lit(":" + salt))), F.lit(_BUCKETS))


def sample_rows(
    df: DataFrame,
    rate: float,
    key_col: str,
    salt: str = "v1",
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Keep ~rate of rows, deterministically by key identity.

    Changing `salt` draws an independent sample; keeping it fixed makes
    the sample reproducible and monotone in rate (rate 0.2's sample is a
    superset of rate 0.1's — useful for growing a held-out set without
    resampling)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), salt, hash_fn) < threshold)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "v1",
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. {'en': 1.0, 'de': 0.25}) —
    the standard language/domain-rebalancing op. Strata not listed get
    default_rate. One Column CASE chain, no shuffle, no UDF."""
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    threshold = F.lit(int(default_rate * _BUCKETS))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), salt, hash_fn) < threshold)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str,
    key_col: str,
    salt: str = "v1",
    hash_fn=F.xxhash64,
    on_missing: str = "error",
) -> DataFrame:
    """Down-sample to a TARGET MIXTURE (the DoReMi/Pile-style data-mixing
    op): given per-stratum target weights, keep the largest corpus whose
    composition matches them WITHOUT upsampling — T = min over weighted
    strata of n_s / w_s, rate_s = w_s·T / n_s (the binding stratum keeps
    everything, the rest down-sample proportionally). Strata not in
    ``weights`` are dropped.

    One stratum-cardinality aggregation (collected — domain counts, never
    corpus-scale) computes the counts; the filter itself is the same
    hash-identity Column as stratified_sample: deterministic under any
    partitioning, no shuffle on the corpus, pushable into the scan.
    Thresholds use plain binary64 ``(w·T/n)·1e6`` so the DuckDB oracle
    recomputes them bit-identically.

    ``on_missing='error'`` (default) fails loudly when a weighted stratum
    has no rows (its target is unachievable); ``'skip'`` renormalizes
    over the present strata implicitly by excluding it from T.
    """
    import math

    if on_missing not in ("error", "skip"):  # a typo must not mean 'skip'
        raise ValueError(f"on_missing must be 'error' or 'skip', got {on_missing!r}")
    for stratum, w in weights.items():
        # `not (w >= 0)` also rejects NaN (NaN<0 and NaN>0 are BOTH false —
        # a NaN weight would otherwise silently drop the stratum)
        if not (w >= 0) or not math.isfinite(w):
            raise ValueError(
                f"weight for {stratum!r} must be a finite number >= 0, got {w}"
            )
    counts = {
        r[stratum_col]: r["n"]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = [s for s, w in weights.items() if w > 0 and not counts.get(s)]
    if missing and on_missing == "error":
        raise ValueError(
            f"weighted strata with no rows: {sorted(missing)} — their target "
            "mixture is unachievable; pass on_missing='skip' to renormalize"
        )
    present = {s: w for s, w in weights.items() if w > 0 and counts.get(s)}
    if not present:
        return df.filter(F.lit(False))
    cap = min(counts[s] / w for s, w in present.items())
    thr = F.lit(0)
    for s in sorted(present):
        # binding strata (n/w == cap) keep EVERYTHING by definition, but
        # binary64 gives w·(n/w)/n = 0.999… for many (w, n) — clamp to the
        # full bucket range so the documented no-upsampling/keep-all
        # invariant holds exactly (the oracle mirrors this CASE)
        if counts[s] / present[s] == cap:
            threshold = _BUCKETS
        else:
            threshold = int(present[s] * cap / counts[s] * _BUCKETS)
        thr = F.when(F.col(stratum_col) == s, F.lit(threshold)).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), salt, hash_fn) < thr)


def importance_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weight per document (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    the per-token average log-likelihood ratio between a unigram LM fit
    on the TARGET slice (rows where ``target`` is true — e.g. curated /
    in-domain docs) and one fit on the FULL corpus, Laplace-smoothed
    with ``alpha`` over their joint vocabulary:

        w(d) = mean over tokens t of  log2 p_tgt(t) − log2 p_all(t)
        p_tgt(t) = (c_tgt(t) + α) / (N_tgt + α·V)   (p_all analogous)

    High w = looks like the target distribution → keep / upweight; the
    standard hashed-ngram data-selection score. Both LMs come from the
    corpus itself in ONE pass — no external model.

    Scale shape (same audited plan family as corpus_logloss): tokens
    explode map-side; ONE vocabulary-sized hash aggregate computes both
    counts (the target count is a conditional sum, not a second pass);
    totals fold in as a one-row broadcast cross-join (never a driver
    action); then a token-keyed join (AQE splits stop-word skew) and one
    per-doc aggregation. Docs with no tokens keep NULL weight rather
    than vanishing; the smoothing means target-absent tokens still score
    (negatively) instead of producing -inf.
    """
    if not alpha > 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    tokens = df.select(
        F.col(id_col),
        target.cast("long").alias("_tgt"),
        F.explode(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("_t"),
    ).filter(F.col("_t") != "")
    vocab = tokens.groupBy("_t").agg(
        F.count(F.lit(1)).alias("_c_all"), F.sum("_tgt").alias("_c_tgt")
    )
    totals = vocab.agg(
        F.sum("_c_all").alias("_n_all"),
        F.sum("_c_tgt").alias("_n_tgt"),
        F.count(F.lit(1)).alias("_v"),
    )
    a = F.lit(float(alpha))
    ratio = F.log2((F.col("_c_tgt") + a) / (F.col("_n_tgt") + a * F.col("_v"))) - F.log2(
        (F.col("_c_all") + a) / (F.col("_n_all") + a * F.col("_v"))
    )
    per_doc = (
        tokens.join(vocab, "_t")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.avg(ratio).alias("_w"))
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.round("_w", 6).alias("log_ratio"),
        )
    )


def importance_resample(
    df: DataFrame,
    n: int,
    weight_col: str = "log_ratio",
    key_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "v1",
    hash_fn=F.xxhash64,
) -> DataFrame:
    """Gumbel-top-k importance resampling — the SELECTION half of DSIR
    (Xie et al. 2023 resample documents ∝ importance weight; pair with
    ``importance_weights`` above for the full pipeline): draw ``n`` rows
    without replacement with P ∝ exp(weight / temperature), using a
    hash-derived Gumbel perturbation so the draw is DETERMINISTIC under
    any partitioning (the Gumbel-top-k theorem: the arg-top-n of
    w/T + G_i with G_i ~ Gumbel(0,1) i.i.d. is an exact softmax sample
    without replacement):

        u_i   = (hash_bucket(key, salt) + 0.5) / 1e6     (uniform (0,1))
        G_i   = −ln(−ln(u_i))
        key_i = w_i / T + G_i   →   keep the n largest

    ``temperature`` interpolates between pure top-n by weight (T → 0⁺
    sharpens the softmax) and uniform sampling (T → ∞); changing
    ``salt`` draws an independent resample. Rows with NULL weight carry
    no usable score and are excluded (``importance_weights`` emits NULL
    only for token-free documents).

    Scale shape: the perturbed key is pure Column arithmetic (no
    shuffle, no UDF) and the global top-n compiles to
    TakeOrderedAndProject — each partition keeps its local top-n and
    only n rows ever cross to the driver-side merge; no full sort, no
    window, n-bounded traffic at any corpus size. hash_fn is
    parameterized like the other samplers so the contract oracle can
    recompute the identical draw in DuckDB via md5_60bit.
    """
    import math

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not (temperature > 0) or not math.isfinite(temperature):
        raise ValueError(f"temperature must be a finite number > 0, got {temperature}")
    u = (
        hash_bucket(F.col(key_col), salt, hash_fn).cast("double") + F.lit(0.5)
    ) / F.lit(float(_BUCKETS))
    gumbel = -F.log(-F.log(u))
    score = F.col(weight_col).cast("double") / F.lit(float(temperature)) + gumbel
    return (
        df.filter(F.col(weight_col).isNotNull())
        .withColumn("_g_key", score)
        .orderBy(F.col("_g_key").desc(), F.col(key_col))
        .limit(n)
        .drop("_g_key")
    )

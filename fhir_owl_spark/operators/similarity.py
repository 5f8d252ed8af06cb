"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline; query side broadcast,
    corpus side scanned once, per-partition top-k then global top-k
    (no full sort of the corpus);
  * LSH-bucketed ANN (random-hyperplane signatures) — the scale path:
    candidate generation by signature-prefix bucket join, exact re-rank
    inside buckets only.

Dot products use vectorized numpy inside Arrow-batched pandas UDFs (the
64-dim × batch matrix product is one BLAS call per batch) — measured
faster than F.aggregate/zip_with chains for d ≥ 32, and the sanctioned
escape hatch per SURVEY.md §2.8.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: list[tuple[str, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for a small query set.

    Queries are broadcast (driver list → closure); the corpus is scanned
    once with mapInPandas computing a (batch × queries) matrix product;
    per-batch top-k candidates are emitted, then one tiny shuffle
    (row_number over query_id, candidates ≤ k × n_batches) finalizes.
    Ties broken by corpus id — deterministic.
    """
    qids = [q for q, _ in queries]
    qmat = _normalize(np.array([v for _, v in queries], dtype=np.float64))

    schema = StructType(
        [
            StructField("query_id", StringType()),
            StructField(id_col, LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            sims = mat @ qmat.T  # (batch, n_queries)
            out = {"query_id": [], id_col: [], "cosine": []}
            kk = min(k, len(ids))
            for j, qid in enumerate(qids):
                col = sims[:, j]
                # per-batch top-k candidates (global top-k finalized later)
                idx = np.argpartition(-col, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
                for i in idx:
                    out["query_id"].append(qid)
                    out[id_col].append(int(ids[i]))
                    out["cosine"].append(float(col[i]))
            yield pd.DataFrame(out)

    cands = corpus.select(id_col, vec_col).mapInPandas(gen, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("cosine", 9).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH ANN
# ---------------------------------------------------------------------------


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection bit signature per vector (deterministic planes
    from a seeded RNG, broadcast in the UDF closure)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    schema = StructType(
        [StructField(id_col, LongType()), StructField("sig", LongType())]
    )

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ planes) > 0  # (batch, n_planes)
            sig = np.zeros(len(pdf), dtype=np.int64)
            for b in range(n_planes):
                sig |= bits[:, b].astype(np.int64) << b
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "sig": sig})

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: list[tuple[str, list[float]]],
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    n_probe_bits: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket the corpus by hyperplane signature, probe
    each query's bucket plus all buckets within n_probe_bits bit flips
    (multi-probe), exact re-rank inside the probed buckets only.

    At 100 TB the bucket join replaces the full scan: corpus bucketed once
    (write-time partitioning in production), per-query work ∝ bucket size.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    qids = [q for q, _ in queries]
    qmat = np.array([v for _, v in queries], dtype=np.float64)
    qsigs = []
    bits = (qmat @ planes) > 0
    for row in bits:
        s = 0
        for b, bit in enumerate(row):
            s |= int(bit) << b
        qsigs.append(s)

    # multi-probe: original signature + single/double bit flips
    def probes(sig: int) -> set[int]:
        out = {sig}
        if n_probe_bits >= 1:
            for b in range(n_planes):
                out.add(sig ^ (1 << b))
        if n_probe_bits >= 2:
            for b1 in range(n_planes):
                for b2 in range(b1 + 1, n_planes):
                    out.add(sig ^ (1 << b1) ^ (1 << b2))
        return out

    probe_rows = [
        (qid, int(s)) for qid, sig in zip(qids, qsigs) for s in probes(sig)
    ]
    spark = corpus.sparkSession
    probe_df = spark.createDataFrame(probe_rows, ["query_id", "sig"])

    sigs = hyperplane_signatures(corpus, dim, n_planes, seed, id_col, vec_col)
    bucketed = sigs.join(corpus.select(id_col, vec_col), id_col)
    cands = F.broadcast(probe_df).join(bucketed, "sig").select(
        "query_id", id_col, vec_col
    )

    qnorm = _normalize(qmat)
    qindex = {qid: i for i, qid in enumerate(qids)}

    schema = StructType(
        [
            StructField("query_id", StringType()),
            StructField(id_col, LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def rerank(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            qi = pdf["query_id"].map(qindex).to_numpy()
            cos = np.einsum("ij,ij->i", mat, qnorm[qi])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    id_col: pdf[id_col],
                    "cosine": cos,
                }
            )

    scored = cands.mapInPandas(rerank, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("cosine", 9).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (the embedding leg of the dedup
# family). The dot product here is PURE Column code — F.zip_with +
# F.aggregate — demonstrating the JVM-side path; the top-k operators above
# use numpy because a (batch × queries) GEMM beats per-row aggregates once
# the query set is dense.
# ---------------------------------------------------------------------------


def cosine_expr(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 16,
    n_bands: int = 8,
    seed: int = 42,
    allow_quadratic: bool = False,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold.

    method='lsh' (DEFAULT — the only scale-safe shape): banded
    hyperplane-signature bucket join. The n_planes-bit signature is split
    into n_bands bands; a pair is a candidate if it matches on ANY band
    (standard banding: candidate prob = 1-(1-p^r)^b for per-plane match
    prob p = 1-θ/π), then the exact cosine is computed on candidates only.
    Recall < 1 by design but tunable: 16 planes / 8 bands gives ~0.99
    candidate recall at cosine 0.5 and better above.

    method='exact': all-pairs crossJoin — the correctness baseline, O(n²).
    A job-killer at corpus scale, so it requires an explicit
    allow_quadratic=True opt-in (same guard pattern as simhash banding's
    recall guard); use only for tests / bounded inputs / within-bucket
    verification.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("vec_a"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vec_b"),
    )
    if method == "exact":
        if not allow_quadratic:
            raise ValueError(
                "method='exact' is O(n²) (crossJoin); pass "
                "allow_quadratic=True to confirm the input is bounded, or "
                "use the default method='lsh'."
            )
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        if n_planes % n_bands != 0:
            raise ValueError(f"n_planes={n_planes} not divisible by n_bands={n_bands}")
        r = n_planes // n_bands
        dim = len(df.select(vec_col).first()[0])
        sigs = hyperplane_signatures(df, dim, n_planes, seed, id_col, vec_col)
        # band the signature: (band_idx, r-bit slice) rows, one shuffle key
        # per band — candidates are pairs sharing any band, verified exactly
        # below, so banding only affects recall, never precision.
        mask = (1 << r) - 1
        bands = sigs.select(
            id_col,
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("sig"), i * r).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for i in range(n_bands)
                ])
            ).alias("bk"),
        ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        sa = bands.select(F.col(id_col).alias("id_a"), "band", "key")
        sb = bands.select(F.col(id_col).alias("id_b"), "band", "key")
        cand = (
            sa.join(sb, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates()
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        raise ValueError(method)
    out = pairs.withColumn("cosine", cosine_expr(F.col("vec_a"), F.col("vec_b")))
    return out.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + cluster-probed search.
# The quantizer is trained with distributed Lloyd iterations — assignment
# is a numpy argmin inside mapInPandas, the centroid update is a pure
# Column element-wise mean (posexplode → groupBy(cluster, dim) → avg),
# so only k×dim numbers ever reach the driver per iteration.
# ---------------------------------------------------------------------------


def _assign_clusters(df: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str) -> DataFrame:
    cent = centroids.astype(np.float64)

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cluster", LongType()),
        ]
    )

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # squared L2 distance argmin (‖x‖² constant per row → argmin of
            # -2x·c + ‖c‖²)
            d = -2.0 * (mat @ cent.T) + (cent * cent).sum(axis=1)[None, :]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cluster": d.argmin(axis=1)}
            )

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    n_iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd's algorithm: init = the k lowest-id vectors
    (seeded, reproducible), fixed iteration count (no convergence
    nondeterminism)."""
    init = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    centroids = np.array([list(r[vec_col]) for r in init], dtype=np.float64)
    dim = centroids.shape[1]
    for _ in range(n_iterations):
        assigned = _assign_clusters(df, centroids, id_col, vec_col).join(
            df.select(id_col, vec_col), id_col
        )
        sums = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col).cast("array<double>"))
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("col").alias("mean"))
            .collect()
        )
        new = centroids.copy()
        for r in sums:
            new[r["cluster"], r["pos"]] = r["mean"]
        centroids = new
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: list[tuple[str, list[float]]],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    n_iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: assign the corpus to k-means cells once (write-time
    partitioning in production), probe each query's n_probe nearest cells,
    exact cosine re-rank inside the probed cells only.

    Recall property: a query that IS a corpus vector always probes its own
    cell (its nearest centroid is the assignment centroid) → self-recall 1.
    """
    centroids = kmeans_fit(corpus, n_clusters, n_iterations, id_col, vec_col)
    assigned = _assign_clusters(corpus, centroids, id_col, vec_col)
    bucketed = assigned.join(corpus.select(id_col, vec_col), id_col)

    qids = [q for q, _ in queries]
    qmat = np.array([v for _, v in queries], dtype=np.float64)
    d = -2.0 * (qmat @ centroids.T) + (centroids * centroids).sum(axis=1)[None, :]
    probe_rows = [
        (qid, int(c))
        for qid, row in zip(qids, d)
        for c in np.argsort(row, kind="stable")[:n_probe]
    ]
    spark = corpus.sparkSession
    probe_df = spark.createDataFrame(probe_rows, ["query_id", "cluster"])
    cands = F.broadcast(probe_df).join(bucketed, "cluster").select(
        "query_id", id_col, vec_col
    )

    qnorm = _normalize(qmat)
    qindex = {qid: i for i, qid in enumerate(qids)}
    schema = StructType(
        [
            StructField("query_id", StringType()),
            StructField(id_col, LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def rerank(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            qi = pdf["query_id"].map(qindex).to_numpy()
            cos = np.einsum("ij,ij->i", mat, qnorm[qi])
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "cosine": cos}
            )

    scored = cands.mapInPandas(rerank, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("cosine", 9).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization (4× ANN-index memory cut; the standard
# serving-side compression). Pure Column code, map-only.
# ---------------------------------------------------------------------------


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = floor(x_i/scale + 0.5) clamped to [-127, 127].

    floor(x + 0.5) instead of round(): identical round-half-toward-+inf
    semantics in every SQL engine (round() half-rules differ), so the
    output is value-oracle-able. Zero vectors quantize to zeros with
    scale 1.0. Per-element dequantization error ≤ scale/2.

    NOTE: the scale expression is re-evaluated per element inside the
    transform lambda (Catalyst HOF semantics), making this O(dim²) cheap
    ops per row — fine for embedding dims (≤ a few thousand); a pandas
    UDF wins beyond that.
    """
    e = F.col(vec_col)
    maxabs = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(
        e,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)).cast("int")),
        ),
    )
    return df.select(
        F.col(id_col), scale.cast("double").alias("scale"), q.alias("q")
    )

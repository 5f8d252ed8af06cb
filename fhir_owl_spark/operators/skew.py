"""Skew handling: salted two-phase aggregation (A6 in SURVEY.md §2.5).

Hub entities dominate mention streams — a stop-word-like synonym or an
owl:Thing-adjacent concept can appear in 30%+ of all turns (the fixture
plants exactly that). A plain groupBy(entity) sends every hub row to one
reducer; at 10^12 turns that reducer is the job.

Two-phase: phase 1 groups on (key, salt) — the hub key fans out over
n_salt reducers and Spark's partial HashAggregate combines map-side —
phase 2 sums the n_salt partials per key. AQE's skew handling is ALSO on
(session.py) for the join side; the north rule requires the explicit
version, so both exist.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def salted_count(
    df: DataFrame,
    key_cols: list[str] | str,
    n_salt: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """count(*) per key, skew-safe. Result ≡ df.groupBy(keys).count().

    salt_source: a column whose hash spreads the hub key's rows (defaults
    to spark_partition_id — already uniform, zero extra data movement
    before the first shuffle).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if salt_source is None:
        salt = F.pmod(F.spark_partition_id(), F.lit(n_salt))
    elif isinstance(salt_source, str):
        salt = F.pmod(F.hash(F.col(salt_source)), F.lit(n_salt))
    else:
        salt = F.pmod(F.hash(salt_source), F.lit(n_salt))

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("cnt"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str] | str,
    aggs: dict[str, str],
    n_salt: int = 16,
) -> DataFrame:
    """Generalized two-phase agg for decomposable aggregates.

    aggs: {column: fn} with fn in {'sum','count','min','max'}. Phase 1
    computes the partial per (key, salt); phase 2 recombines (sum→sum,
    count→sum, min→min, max→max). Result columns are '{fn}_{col}'.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salt))

    phase1 = []
    phase2 = []
    for col, fn in aggs.items():
        name = f"{fn}_{col}"
        if fn == "count":
            phase1.append(F.count(col).alias(name))
            phase2.append(F.sum(name).alias(name))
        elif fn == "sum":
            phase1.append(F.sum(col).alias(name))
            phase2.append(F.sum(name).alias(name))
        elif fn == "min":
            phase1.append(F.min(col).alias(name))
            phase2.append(F.min(name).alias(name))
        elif fn == "max":
            phase1.append(F.max(col).alias(name))
            phase2.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def mention_counts(mentions: DataFrame, n_salt: int = 16) -> DataFrame:
    """Mentions per entity — THE skewed aggregation of this pipeline
    (hub entity ≈ 30% of turns in the bench corpus)."""
    return salted_count(mentions, "code", n_salt=n_salt).withColumnRenamed(
        "cnt", "n_mentions"
    )


def co_mention_pairs(mentions: "DataFrame", n_salt: int = 16) -> "DataFrame":
    """(entity_a, co-mentioned-with, entity_b) evidence per conversation:
    unordered entity pairs that appear in the SAME conversation, with the
    number of conversations as weight.

    Shape (rewritten late round 5, same as graph.pmi_edges): ONE
    conv-keyed shuffle collects each conversation's sorted entity SET
    (bounded by the dictionary), then a MAP-SIDE nested-transform
    expands the sets into pairs that explode straight into a
    combiner-backed count — no conv-keyed self-join (the join form
    shuffled the projection twice and materialized the quadratic
    fan-out as join output; measured ~2× slower at 6M turns in
    pmi_edges). The pair shuffle carries ≤ |dict|² rows after map-side
    combine, so ``n_salt`` is accepted only for API compatibility — a
    hub PAIR key can no longer concentrate rows on one reducer. A hub
    conversation still costs O(k²) pair rows map-side (dictionary-
    bounded, same worst case as the join form).
    """
    sets = (
        mentions.select("conv_id", "code")
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_set("code")).alias("_cs"))
    )
    n = F.size("_cs")
    pair_array = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("_cs"), i).alias("code_a"),
                    F.element_at(F.col("_cs"), j).alias("code_b"),
                ),
            ),
        )
    )
    return (
        sets.filter(n >= 2)
        .select(F.explode(pair_array).alias("_p"))
        .select("_p.code_a", "_p.code_b")
        .groupBy("code_a", "code_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_convs"))
    )

def salted_top_k(
    df: DataFrame,
    key_cols: list[str] | str,
    order_cols: Sequence[Column],
    k: int,
    n_salt: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Group-wise top-k without a per-key mega-partition. Result is
    row-identical to row_number() over (PARTITION BY keys ORDER BY
    order_cols) <= k, but a hub key never lands on one reducer:

    phase 1 ranks within (key, salt) — the hub key's rows spread over
    n_salt bounded window partitions, each keeping only its local top-k;
    phase 2 re-ranks the <= k*n_salt survivors per key, a window over a
    provably tiny partition. Same two-phase shape as salted_count; this
    is the per-domain-quota / curation-shortlist primitive
    (RefinedWeb-style "keep at most N pages per domain").

    order_cols must be a total order (caller supplies a unique tiebreak,
    e.g. the id column) or phase-1 local pruning is not equivalence-
    preserving.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = list(order_cols)
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salt))
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def windowed_co_occurrence(
    df: "DataFrame",
    group_col: str,
    pos_col: str,
    item_col: str,
    window: int = 3,
) -> "DataFrame":
    """Positional co-occurrence mining: unordered item pairs observed
    within ``window`` positions of each other inside the same group —
    the proximity refinement of ``co_mention_pairs`` (whole-conversation
    co-occurrence says two entities share a conversation; this says they
    appear within k turns/events of each other, a far stronger edge
    signal for a knowledge graph). Output: (item_a ≤ item_b, n_cooc =
    number of qualifying position pairs, n_groups = distinct groups
    containing one).

    Scale shape — the classic banded proximity join, same family as
    ``temporal.range_join``: positions bucket at width ``window``; the
    left side explodes to its bucket ±1 (3 rows), the right side keeps
    its own bucket, and the equi-join on (group, bucket) finds every
    |Δpos| ≤ window pair EXACTLY ONCE (width = window ⇒ qualifying
    pairs are at most one bucket apart; the right row's single bucket
    de-duplicates the match) — never a per-group cartesian. The strict
    ``pos_a < pos_b`` filter (positions are unique per group by the
    input contract) counts each pair once; AQE splits residual hot
    (group, bucket) cells. Two hash aggregations: pair counts and
    distinct-group counts.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    b = (F.col(pos_col) / F.lit(window)).cast("long")
    left = df.select(
        F.col(group_col).alias("_g"),
        F.col(pos_col).alias("_pa"),
        F.col(item_col).alias("_ia"),
        F.explode(F.array(b - 1, b, b + 1)).alias("_b"),
    )
    right = df.select(
        F.col(group_col).alias("_g"),
        F.col(pos_col).alias("_pb"),
        F.col(item_col).alias("_ib"),
        b.alias("_b"),
    )
    pairs = (
        left.join(right, ["_g", "_b"])
        .filter(
            (F.col("_pa") < F.col("_pb"))
            & (F.col("_pb") - F.col("_pa") <= window)
        )
        .select(
            "_g",
            F.least("_ia", "_ib").alias("item_a"),
            F.greatest("_ia", "_ib").alias("item_b"),
        )
    )
    # one mixed count/count_distinct aggregation — Catalyst expands it
    # into a single partial-aggregated pass (the separate
    # distinct→count→join form would shuffle the pair stream twice)
    return pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_cooc"),
        F.count_distinct("_g").cast("long").alias("n_groups"),
    )

"""Deterministic, distributed bench-transcript generator.

Builds an arbitrarily large transcripts table with pure Column
expressions — no driver-side row materialization, no rand() (xxhash64 of
the row id keys every choice, so content is identical at any parallelism
and any partitioning: the property the scaling-efficiency evidence needs).

Mention mix mirrors FIXTURES.md §1: 0–3 planted ontology terms per turn,
a hub term in ~30% of turns (skew exercise), deprecated/excluded labels
planted but non-linking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import fixtures as fx

_FILLER = (
    "please summarize latest update regarding deployment verify numbers "
    "thanks okay looking into details now checking results output ready soon "
    "confirmed done next item review notes draft plan agenda meeting follow"
).split()


def _pick(arr_col, hash_cols, n: int):
    return arr_col[F.pmod(F.xxhash64(*hash_cols), F.lit(n)).cast("int")]


def bench_transcripts(
    spark: SparkSession,
    n_turns: int,
    turns_per_conv: int = 8,
    n_filler_words: int = 12,
    hub_term: str = "scan",
    hub_rate_pct: int = 30,
    seed: int = 42,
) -> DataFrame:
    """n_turns rows of the input_hint transcript shape."""
    ont, cfg = fx.query_ops_fixture()
    rows = fx.model_concept_rows(ont, cfg)
    linkable = sorted(
        {
            t.lower()
            for r in rows.values()
            if not r["deprecated"]
            for t in {r["display"], *r["synonyms"]}
            if t and len(t) >= cfg.min_term_chars
        }
    )
    nolink = sorted(
        {c["label"] for c in ont.concepts if c["deprecated"] and c["label"]}
    ) + list(cfg.labels_to_exclude)

    filler = F.array(*[F.lit(w) for w in _FILLER])
    terms = F.array(*[F.lit(t) for t in linkable])
    bad = F.array(*[F.lit(t) for t in nolink])

    df = spark.range(n_turns).withColumn("_seed", F.lit(seed))
    sid = [F.col("id"), F.col("_seed")]

    words = [
        _pick(filler, sid + [F.lit(f"w{i}")], len(_FILLER))
        for i in range(n_filler_words)
    ]
    # 0-3 planted mentions
    n_mentions = F.pmod(F.xxhash64(*sid, F.lit("nm")), F.lit(4))
    mention_parts = [
        F.when(n_mentions > i, _pick(terms, sid + [F.lit(f"m{i}")], len(linkable))).otherwise(
            F.lit(None)
        )
        for i in range(3)
    ]
    # non-linking labels in ~15% of turns
    bad_part = F.when(
        F.pmod(F.xxhash64(*sid, F.lit("b")), F.lit(100)) < 15,
        _pick(bad, sid + [F.lit("bi")], len(nolink)),
    ).otherwise(F.lit(None))
    # hub term in ~hub_rate_pct% of turns
    hub_part = F.when(
        F.pmod(F.xxhash64(*sid, F.lit("h")), F.lit(100)) < hub_rate_pct,
        F.lit(hub_term),
    ).otherwise(F.lit(None))

    text = F.concat_ws(" ", *words, *mention_parts, bad_part, hub_part)
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    return df.select(
        F.concat(F.lit("conv"), (F.col("id") / turns_per_conv).cast("long").cast("string")).alias(
            "conv_id"
        ),
        (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", "search").otherwise(F.lit(None)).alias("tool"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(mins=(F.col("id") % 1440).cast("int"))
        ).alias("ts"),
    )

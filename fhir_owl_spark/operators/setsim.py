"""Exact set-similarity self-join via prefix filtering (PPJoin family).

The dedup family (operators/dedup.py) finds near-duplicates
APPROXIMATELY — MinHash/SimHash banding trades recall for bounded
candidate generation. This operator is the EXACT counterpart: every
pair of documents whose token-set Jaccard is ≥ the threshold, with no
recall loss, using the prefix-filtering principle (Chaudhuri et al.
SSJoin / Bayardo et al. WWW'07 / Vernica et al. SIGMOD'10 — the
standard distributed formulation) instead of an O(n²) cross join.

Why it scales (the 100-TB story):

  * Tokens are globally ordered RAREST-FIRST (document frequency, then
    token — a total order). A pair with Jaccard ≥ t MUST share at least
    one token inside both documents' (s − ⌊t·s⌋ + 1)-length prefixes
    under any common total order (prefix-filtering lemma), so the
    candidate join runs only on prefix tokens — and because prefixes
    hold the RAREST tokens, per-token fan-out is small by construction:
    a stop word never becomes a join key unless a document consists of
    almost nothing else.
  * Candidate generation carries only (token, id, size) — the token
    arrays do NOT travel through the quadratic join; verification joins
    the surviving (id_a, id_b) pairs back to the token-set table by id.
  * All pruning bounds are computed with FLOOR so float rounding can
    only widen a prefix / keep a candidate, never drop a qualifying
    pair — the output is exactly the brute-force answer (the DuckDB
    oracle computes the all-pairs form and the contract hashes values).

Shuffles: token-frequency agg (map-side combine), one doc-keyed
re-collect, the prefix-token candidate join, pair distinct, two id-keyed
verification joins — every key a token, an id, or an (id, id) pair;
AQE handles residual skew on frequent prefix tokens.

Reference parity note: the reference engine has no similarity join —
this operator belongs to the training-data extension surface the task
brief adds on top of fhir-owl's KG semantics (SURVEY.md §2 addenda).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ._persist import register_persisted, rotate_persisted


def tokenize_set(text: Column, split_pattern: str = r"\s+") -> Column:
    """Distinct lowercase tokens of ``text`` (empty tokens dropped) —
    the DuckDB-reproducible tokenization the oracle mirrors with
    ``list_distinct(string_split_regex(lower(text), '\\s+'))``."""
    return F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(text, F.lit(""))), split_pattern),
            lambda x: x != F.lit(""),
        )
    )


def setsim_join(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_pattern: str = r"\s+",
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard ≥ ``threshold``.

    Returns (id_a, id_b, inter, union_size, jaccard) — jaccard is the
    raw double ``inter / (sa + sb − inter)``; callers that feed an
    oracle round it themselves.

    EXACT: equivalent to the quadratic all-pairs join for every
    ``0 < threshold ≤ 1`` (prefix filtering is lossless; the length and
    prefix bounds use floor so IEEE rounding errs conservative).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    from pyspark import StorageLevel

    toks = (
        df.select(
            F.col(id_col).alias("_id"),
            tokenize_set(F.col(text_col), split_pattern).alias("_toks"),
        )
        .withColumn("_size", F.size("_toks"))
        .filter(F.col("_size") > 0)
        # LAZY persist (plan construction stays free): the token-set frame
        # feeds FOUR independent subtrees — the df agg, the ordered
        # re-collect, and both verification sides — so unpersisted the
        # corpus would be re-scanned and re-tokenized 4x per action (the
        # same rationale as lsh_candidate_pairs' signature persist).
        # Cache is O(rows x distinct-tokens) arrays; MEMORY_AND_DISK
        # spills instead of OOMing. rotate/register: the PREVIOUS call's
        # cache is evicted so repeated calls in one session stay bounded
        # (round-5 ADVICE).
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rotate_persisted("setsim_join")
    register_persisted("setsim_join", toks)

    # document frequency per token — rarest-first is what keeps the
    # candidate join's per-key fan-out small.
    tok_freq = (
        toks.select(F.explode("_toks").alias("_tok"))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_df"))
    )

    # Dedup placement is ADAPTIVE. On a high-entropy (Zipfian text)
    # corpus the positional filter admits almost only the first common
    # prefix token per pair (measured 0.5% duplicate candidates at 52k
    # docs), so a candidate-scale pair-distinct is a pure ~6 s Exchange
    # tax and dedup belongs AFTER the threshold filter on the tiny
    # survivor set. On a degenerate low-vocabulary corpus every pair
    # shares MANY qualifying prefix tokens; skipping the pre-dedup
    # multiplies verification by the duplication factor (measured 5-10×
    # wall). Decide from two cheap aggregates over the cached frames:
    # expected prefix-token fan-out ≈ (Σ prefix lengths) / vocabulary —
    # small ⇒ a pair rarely shares more than one prefix token ⇒ late
    # dedup (52k-doc Zipfian anchor: ≈30 → late; 31-word degenerate
    # corpus: ≈650 → pre).
    # The probe deliberately RE-DERIVES the token sets from the raw input
    # instead of reading ``toks``: probing the persisted frame would
    # materialize its cache before the main pipeline is planned, and the
    # then-known InMemoryRelation statistics flip downstream join
    # strategies (measured 28 s → 74-136 s on the Zipfian anchor when the
    # cache was warm at plan time). A non-matching plan fragment is never
    # cache-substituted, so the probe scans the source once (~2-4 s at
    # 52k docs) and the main pipeline plans exactly as before.
    probe_sets = tokenize_set(F.col(text_col), split_pattern)
    probe_size = F.size(probe_sets)
    stats = (
        df.filter(probe_size > 0)
        .select(
            # per-token weight summing to the doc's prefix length, so the
            # post-explode sum recovers Σ_docs plen in the same pass that
            # sketches the vocabulary (approx_count_distinct is one
            # map-side HLL, no shuffle — it only gates a branch whose two
            # outputs are identical)
            (
                (probe_size - F.floor(probe_size * F.lit(threshold)) + F.lit(1))
                / probe_size
            ).alias("_pw"),
            F.explode(probe_sets).alias("_tok"),
        )
        .agg(
            F.sum("_pw").alias("_p"),
            F.approx_count_distinct("_tok").alias("_v"),
        )
        .first()
    )
    prefix_rows, n_vocab = stats["_p"] or 0.0, stats["_v"] or 0
    late_dedup = n_vocab > 0 and (prefix_rows / n_vocab) <= 64

    # per-document tokens re-collected in (df, token) order. The join is
    # token-keyed (AQE-skew-safe); the re-collect is one doc-keyed agg.
    ordered = (
        toks.select("_id", "_size", F.explode("_toks").alias("_tok"))
        .join(tok_freq, "_tok")
        .groupBy("_id", "_size")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("_tok")))
            ).alias("_ord")
        )
    )

    # prefix length s − ⌊t·s⌋ + 1 (floor ⇒ never shorter than the exact
    # ⌈⌉ form ⇒ lossless; at most one token longer). posexplode keeps
    # each prefix token's position in the (df, token) order for the
    # positional filter below.
    plen = (F.col("_size") - F.floor(F.col("_size") * F.lit(threshold)) + F.lit(1)).cast("int")
    prefix = ordered.select(
        "_id",
        "_size",
        F.posexplode(
            F.slice(
                F.transform("_ord", lambda s: s["_tok"]), F.lit(1), plen
            )
        ).alias("_pos", "_tok"),
    )

    # candidate pairs: shared prefix token + two lossless prunes —
    #   length filter: J ≥ t ⇒ |b| ≥ t·|a| and |a| ≥ t·|b|;
    #   positional filter (PPJoin): J ≥ t ⇒ |a∩b| ≥ t/(1+t)·(sa+sb),
    #   and every common token sits at position ≥ (pa, pb) of the FIRST
    #   common token, so |a∩b| ≤ min(sa−pa, sb−pb); a matched occurrence
    #   with min-remaining below the bound cannot be the first common
    #   token of a qualifying pair, and the first common token of every
    #   qualifying pair (which the prefix lemma puts in both prefixes)
    #   always passes — pair-distinct afterwards keeps it lossless.
    # Both bounds use floor so IEEE rounding can only keep a candidate.
    a, b = prefix.alias("a"), prefix.alias("b")
    overlap_floor = F.floor(
        (F.col("a._size") + F.col("b._size"))
        * F.lit(threshold / (1.0 + threshold))
    )
    cand = (
        a.join(
            b,
            (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a._id") < F.col("b._id"))
            & (F.col("b._size") >= F.floor(F.col("a._size") * F.lit(threshold)))
            & (F.col("a._size") >= F.floor(F.col("b._size") * F.lit(threshold)))
            & (
                F.least(
                    F.col("a._size") - F.col("a._pos"),
                    F.col("b._size") - F.col("b._pos"),
                )
                >= overlap_floor
            ),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )
    if not late_dedup:
        cand = cand.distinct()

    # verification: exact Jaccard on candidate pairs only — the token
    # arrays travel once per surviving pair, keyed by id.
    ta = toks.select(
        F.col("_id").alias("id_a"), F.col("_toks").alias("_ta"), F.col("_size").alias("_sa")
    )
    tb = toks.select(
        F.col("_id").alias("id_b"), F.col("_toks").alias("_tb"), F.col("_size").alias("_sb")
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union_size = F.col("_sa") + F.col("_sb") - F.col("inter")
    out = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter", inter)
        .withColumn("union_size", union_size)
        .withColumn(
            "jaccard", F.col("inter") / F.col("union_size").cast("double")
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "inter", "union_size", "jaccard")
    )
    if late_dedup:
        # duplicate candidates produce byte-identical rows (same pair ⇒
        # same inter/union/jaccard) — dedup on the tiny survivor set
        out = out.distinct()
    return out

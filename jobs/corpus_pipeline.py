#!/usr/bin/env python
"""spark-submit entry point for the training-data corpus operators.

    spark-submit --py-files fhir_owl_spark.zip jobs/corpus_pipeline.py \
        <subcommand> --input /data/documents --output /data/out [options]

Subcommands (each reads a parquet documents table with at least
(doc_id, text) and writes parquet):

  dedup       exact + MinHash/LSH near-dup resolution → the KEPT rows
              (one representative per duplicate cluster)
  quality     token/quality/language/repetition features + keep verdicts
              (no rows dropped — downstream filters on the columns)
  filter      apply the keep verdicts (quality score + repetition cutoffs)
  normalize   text normalization (tags/entities/control chars/whitespace)
  redact      PII redaction (emails, IPs, card/SSN/phone shapes)
  sample      deterministic hash-identity sampling (global rate or
              per-stratum rates like lang=en:1.0,de:0.25)
  mix         target-mixture down-sampling: largest corpus matching the
              weights without upsampling (web:0.6,books:0.3,...)
  chunk       token-window chunking (max tokens + overlap)
  stats       corpus composition report (per source×lang + ROLLUP levels)
  prep        the composed plan: normalize → quality/repetition filter →
              exact dedup → chunk → sample, one Catalyst plan
              (plans/corpus_prep.py; one shuffle end to end)

Transcript-shaped inputs (conv_id, turn_idx, role, text, tool, ts):

  render      flatten each conversation to one 'role: text' document
  sessionize  append inactivity-gap session indexes
  tool-stats  per-conversation tool-call analytics
  pack        start-offset token-budget sequence packing (appends
              n_tokens + bin_idx; --count-col packs by a precomputed
              tokenizer count column)
  line-dedup  C4-style boilerplate-line removal (lines in >= N docs)
  span-dedup  ExactSubstr duplicated-span removal (word k-grams in >= N
              distinct docs; --stats-only appends counts instead)
  dsir        DSIR importance weights vs a target slice (--top-n adds
              the Gumbel-top-k resample — the full selection pipeline)
  quota       per-group document cap via salted top-k (RefinedWeb-style)
  buckets     CCNet-style perplexity buckets per group
  classify    linear-classifier quality scores from an exported
              (term, weight) model table (--min-score filters)
  sft         instruction-tuning (prompt, response) pair extraction
  bpe-train   learn a BPE merge list (Sennrich-style, distributed)
  setsim      EXACT set-similarity dedup via the prefix-filtered Jaccard
              join (lossless; --pairs-only writes the pair table)
  decontaminate  drop docs containing >= threshold of any benchmark
              item's word k-shingles (--report-only writes scores)
  burst       bucketed burst detection per key (trailing baseline)
  triangles   per-vertex triangle counts over an edge table
  walks       deterministic DeepWalk random walks over an edge table
              (--skipgrams WINDOW emits the training-pair extraction)
  quantiles   mergeable histogram quantile sketch of a numeric column
              (default: text length; --key-cols gives per-key sketches)

Every stage is the library operator documented in COVERAGE.md — this CLI
only wires io. One JSON status line is printed on success.

Local smoke: python jobs/corpus_pipeline.py quality \
    --input /root/testdata/sf0.001/documents.parquet --output /tmp/q
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Training-data corpus pipeline stages")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--input", required=True, help="parquet documents dir/file")
        sp.add_argument("--output", required=True, help="output parquet dir")
        sp.add_argument("--text-col", default="text")
        sp.add_argument("--id-col", default="doc_id")
        sp.add_argument("--cpus", type=int, default=None,
                        help="local[N] when not under spark-submit")

    d = sub.add_parser("dedup", help="near-dup resolve, keep one per cluster")
    common(d)
    d.add_argument("--threshold", type=float, default=0.8,
                   help="exact word-shingle Jaccard cutoff for verified pairs")

    q = sub.add_parser("quality", help="append feature + verdict columns")
    common(q)

    f = sub.add_parser("filter", help="drop rows failing the keep verdicts")
    common(f)
    f.add_argument("--min-quality", type=float, default=0.0)

    n = sub.add_parser("normalize", help="normalize text in place")
    common(n)

    r = sub.add_parser("redact", help="redact PII in place")
    common(r)

    s = sub.add_parser("sample", help="deterministic sampling")
    common(s)
    s.add_argument("--rate", type=float, default=None, help="global keep rate")
    s.add_argument("--stratum-col", default=None)
    s.add_argument("--rates", default=None,
                   help="per-stratum rates, e.g. en:1.0,de:0.25")
    s.add_argument("--salt", default="v1")

    mx = sub.add_parser("mix", help="target-mixture down-sampling (no upsampling)")
    common(mx)
    mx.add_argument("--weights", required=True,
                    help="target weights, e.g. web:0.6,books:0.3,code:0.1")
    mx.add_argument("--stratum-col", required=True)
    mx.add_argument("--salt", default="v1")
    mx.add_argument("--on-missing", choices=["error", "skip"], default="error")

    c = sub.add_parser("chunk", help="token-window chunking")
    common(c)
    c.add_argument("--max-tokens", type=int, default=128)
    c.add_argument("--overlap", type=int, default=16)

    st = sub.add_parser("stats", help="corpus composition (ROLLUP)")
    common(st)
    st.add_argument("--group-cols", default="source,lang")

    pp = sub.add_parser("prep", help="composed normalize→filter→dedup→chunk→sample")
    common(pp)
    pp.add_argument("--min-quality", type=float, default=0.0)
    pp.add_argument("--max-tokens", type=int, default=128)
    pp.add_argument("--overlap", type=int, default=16)
    pp.add_argument("--rate", type=float, default=1.0)

    rd = sub.add_parser("render", help="conversation → one training document")
    common(rd)

    sz = sub.add_parser("sessionize", help="append inactivity-gap sessions")
    common(sz)
    sz.add_argument("--gap", default="30 minutes")

    ts = sub.add_parser("tool-stats", help="per-conversation tool analytics")
    common(ts)

    pk = sub.add_parser("pack", help="token-budget sequence packing (bin ids)")
    common(pk)
    pk.add_argument("--target-tokens", type=int, default=2048)
    pk.add_argument("--count-col", default=None,
                    help="pack by this precomputed token-count column "
                         "(e.g. real tokenizer counts) instead of "
                         "whitespace counts")
    pk.add_argument("--shard-cols", default="",
                    help="comma-separated shard columns: prefix sums run per "
                         "shard (REQUIRED at any real scale — the global "
                         "form is a single-partition sort)")

    ld = sub.add_parser("line-dedup",
                        help="drop lines occurring in >= N distinct docs")
    common(ld)
    ld.add_argument("--min-docs", type=int, default=2)
    ld.add_argument("--sep", default="\n")

    sd = sub.add_parser("span-dedup",
                        help="ExactSubstr duplicated-span removal or stats "
                             "(word k-grams in >= N distinct docs)")
    common(sd)
    sd.add_argument("--k", type=int, default=5,
                    help="span granularity in word tokens")
    sd.add_argument("--min-docs", type=int, default=2,
                    help="a k-gram in >= this many DISTINCT docs is a "
                         "duplicated span")
    sd.add_argument("--stats-only", action="store_true",
                    help="append n_grams/dup_grams/dup_fraction instead of "
                         "cutting the spans")

    dw = sub.add_parser("dsir",
                        help="DSIR importance weights vs a target slice")
    common(dw)
    dw.add_argument("--target-col", required=True,
                    help="column defining the target slice")
    dw.add_argument("--target-value", required=True,
                    help="rows where target-col equals this are the target LM")
    dw.add_argument("--alpha", type=float, default=1.0,
                    help="Laplace smoothing over the joint vocabulary")
    dw.add_argument("--top-n", type=int, default=None,
                    help="when set, Gumbel-top-k resample this many docs "
                         "P ∝ exp(log_ratio/temperature) instead of just "
                         "appending weights (the full DSIR pipeline)")
    dw.add_argument("--temperature", type=float, default=1.0)
    dw.add_argument("--salt", default="v1",
                    help="resample salt — change for an independent draw")

    qt = sub.add_parser("quota",
                        help="keep at most K docs per group (deterministic)")
    common(qt)
    qt.add_argument("--group-col", required=True)
    qt.add_argument("--k", type=int, required=True)
    qt.add_argument("--salt", default="v1")
    qt.add_argument("--n-salt", type=int, default=16,
                    help="phase-1 fan-out of the salted top-k")

    bk = sub.add_parser("buckets",
                        help="CCNet-style perplexity buckets per group")
    common(bk)
    bk.add_argument("--group-col", default="lang")
    bk.add_argument("--n-buckets", type=int, default=3)
    bk.add_argument("--exact", action="store_true",
                    help="exact ntile form (builds a group-sized window "
                         "partition); default is the broadcast-threshold "
                         "production path")

    sf = sub.add_parser("sft",
                        help="instruction-tuning (prompt, response) pairs "
                             "from transcripts")
    common(sf)
    sf.add_argument("--context-turns", type=int, default=3,
                    help="max preceding turns rendered into the prompt")
    sf.add_argument("--assistant-role", default="assistant")
    sf.add_argument("--sep", default="\n",
                    help="separator between prompt context lines")

    bp = sub.add_parser("bpe-train",
                        help="learn a BPE merge list from the corpus "
                             "(Sennrich-style, distributed)")
    common(bp)
    bp.add_argument("--n-merges", type=int, default=100)
    bp.add_argument("--min-count", type=int, default=2)

    cl = sub.add_parser("classify",
                        help="fastText-style linear quality-classifier "
                             "scores from an exported (term, weight) model")
    common(cl)
    cl.add_argument("--weights", required=True,
                    help="parquet path of the trained model's "
                         "(term, weight) table")
    cl.add_argument("--bias", type=float, default=0.0)
    cl.add_argument("--term-col", default="term")
    cl.add_argument("--weight-col", default="weight")
    cl.add_argument("--min-score", type=float, default=None,
                    help="when set, drop docs scoring below this instead "
                         "of appending the score columns")

    ss = sub.add_parser("setsim",
                        help="EXACT set-similarity dedup (prefix-filtered "
                             "Jaccard join; lossless) — keep one per cluster")
    common(ss)
    ss.add_argument("--threshold", type=float, default=0.9,
                    help="token-set Jaccard threshold (default 0.9)")
    ss.add_argument("--pairs-only", action="store_true",
                    help="write the (id_a, id_b, jaccard) pair table "
                         "instead of resolving keep-one")

    dc = sub.add_parser("decontaminate",
                        help="fuzzy benchmark decontamination: drop docs "
                             "containing >= threshold of any benchmark "
                             "item's word k-shingles")
    common(dc)
    dc.add_argument("--benchmark", required=True,
                    help="parquet path of the benchmark/eval documents")
    dc.add_argument("--threshold", type=float, default=0.5)
    dc.add_argument("--shingle-k", type=int, default=5)
    dc.add_argument("--bench-id-col", default=None,
                    help="benchmark id column (default: same as --id-col)")
    dc.add_argument("--report-only", action="store_true",
                    help="write the (doc_id, bench_id, containment) "
                         "score table instead of dropping")

    bu = sub.add_parser("burst",
                        help="bucketed burst detection per key "
                             "(trailing-baseline spike flags)")
    common(bu)
    bu.add_argument("--key-cols", default="event_type",
                    help="comma-separated key columns")
    bu.add_argument("--ts-col", default="ts")
    bu.add_argument("--resolution", default="day",
                    choices=("minute", "hour", "day", "week", "month"))
    bu.add_argument("--baseline-buckets", type=int, default=7)
    bu.add_argument("--factor", type=int, default=2)
    bu.add_argument("--min-baseline", type=int, default=3)

    tr = sub.add_parser("triangles",
                        help="per-vertex triangle counts over an edge "
                             "table (degree-oriented wedge join)")
    common(tr)
    tr.add_argument("--src-col", default="src")
    tr.add_argument("--dst-col", default="dst")

    wk = sub.add_parser("walks",
                        help="deterministic DeepWalk random walks over an "
                             "edge table (--skipgrams emits training pairs)")
    common(wk)
    wk.add_argument("--src-col", default="src")
    wk.add_argument("--dst-col", default="dst")
    wk.add_argument("--walks-per-node", type=int, default=2)
    wk.add_argument("--walk-length", type=int, default=4)
    wk.add_argument("--max-degree", type=int, default=None,
                    help="hub guard: deterministic neighbor cap")
    wk.add_argument("--skipgrams", type=int, default=None, metavar="WINDOW",
                    help="emit (item_a, item_b, n_cooc, n_groups) skip-gram "
                         "pairs within WINDOW steps instead of raw walks")

    qs = sub.add_parser("quantiles",
                        help="mergeable histogram quantile sketch of a "
                             "numeric column (per key with --key-cols)")
    common(qs)
    qs.add_argument("--value-col", default=None,
                    help="numeric column; default: length of --text-col")
    qs.add_argument("--key-cols", default="",
                    help="comma-separated GROUP-BY key columns (optional)")
    qs.add_argument("--percents", default="50,90,99",
                    help="comma-separated integer percentiles in [1, 100]")
    qs.add_argument("--lo", type=int, default=0)
    qs.add_argument("--hi", type=int, default=1024)
    qs.add_argument("--bins", type=int, default=64)

    return p.parse_args(argv)


def parse_weight_map(spec: str, flag: str) -> dict[str, float]:
    """'k:0.6,k2:0.4' → dict; clean SystemExit on malformed entries (shared
    by sample --rates and mix --weights)."""
    out: dict[str, float] = {}
    for kv in spec.split(","):
        k, sep, v = kv.partition(":")
        try:
            if not sep:
                raise ValueError
            out[k] = float(v)
        except ValueError:
            raise SystemExit(
                f"{flag} expects comma-separated key:number entries, got {kv!r}"
            ) from None
    return out


def run(args) -> dict:
    from pyspark.sql import SparkSession, functions as F

    from fhir_owl_spark.session import get_spark

    # under spark-submit an active session with the SUBMITTED master already
    # exists — get_spark would override it with local[N] (same guard as
    # jobs/build_graph.py)
    spark = SparkSession.getActiveSession() or get_spark(
        app_name=f"corpus-{args.cmd}", parallelism=args.cpus
    )
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    if args.cmd == "dedup":
        from fhir_owl_spark.operators import dedup

        pairs = dedup.minhash_dedup_pairs(
            docs, args.text_col, args.id_col, threshold=args.threshold
        )
        decisions = dedup.dedup_keep_one(docs, pairs, id_col=args.id_col)
        out = docs.join(
            decisions.filter(F.col("keep")).select(args.id_col), args.id_col
        )
        lsh_obs = getattr(pairs, "_lsh_observation", None)
    elif args.cmd == "quality":
        from fhir_owl_spark.operators import text

        out = text.repetition_features(
            text.quality_features(docs, args.text_col), args.text_col
        ).withColumn("lang_id", text.lang_id_col(args.text_col))
    elif args.cmd == "filter":
        from fhir_owl_spark.operators import text

        feats = text.repetition_features(
            text.quality_features(docs, args.text_col), args.text_col
        )
        out = feats.filter(
            F.col("repetition_ok") & (F.col("quality_score") >= args.min_quality)
        ).select(*docs.columns)
    elif args.cmd == "normalize":
        from fhir_owl_spark.operators import text

        out = docs.withColumn(args.text_col, text.normalize_text_col(args.text_col))
    elif args.cmd == "redact":
        from fhir_owl_spark.operators import text

        out = docs.withColumn(args.text_col, text.redact_pii_col(args.text_col))
    elif args.cmd == "sample":
        from fhir_owl_spark.operators import sampling

        if args.rates:
            rates = parse_weight_map(args.rates, "--rates")
            if not args.stratum_col:
                raise SystemExit("--rates needs --stratum-col")
            out = sampling.stratified_sample(
                docs, rates, args.stratum_col, args.id_col, salt=args.salt
            )
        elif args.rate is not None:
            out = sampling.sample_rows(docs, args.rate, args.id_col, salt=args.salt)
        else:
            raise SystemExit("sample needs --rate or --rates")
    elif args.cmd == "mix":
        from fhir_owl_spark.operators import sampling

        weights = parse_weight_map(args.weights, "--weights")
        out = sampling.mixture_sample(
            docs, weights, args.stratum_col, args.id_col,
            salt=args.salt, on_missing=args.on_missing,
        )
    elif args.cmd == "chunk":
        from fhir_owl_spark.operators import text

        out = text.chunk_documents(
            docs, args.max_tokens, args.overlap, args.text_col, args.id_col
        )
    elif args.cmd == "stats":
        from fhir_owl_spark.operators.text import corpus_stats

        cols = tuple(c for c in args.group_cols.split(",") if c)
        out = corpus_stats(docs, cols, args.text_col, rollup=True)
    elif args.cmd == "prep":
        from fhir_owl_spark.plans.corpus_prep import prepare_corpus

        out = prepare_corpus(
            docs,
            min_quality=args.min_quality,
            max_tokens=args.max_tokens,
            overlap=args.overlap,
            sample_rate=args.rate,
            text_col=args.text_col,
            id_col=args.id_col,
        )
    elif args.cmd == "render":
        from fhir_owl_spark.operators.conversations import render_conversations

        out = render_conversations(docs)
    elif args.cmd == "sessionize":
        from fhir_owl_spark.operators.conversations import sessionize

        out = sessionize(docs, gap=args.gap)
    elif args.cmd == "tool-stats":
        from fhir_owl_spark.operators.conversations import tool_usage

        out = tool_usage(docs)
    elif args.cmd == "pack":
        from fhir_owl_spark.operators.text import pack_documents

        shards = tuple(c for c in args.shard_cols.split(",") if c)
        out = docs.join(
            pack_documents(docs, target_tokens=args.target_tokens,
                           text_col=args.text_col, id_col=args.id_col,
                           shard_cols=shards, count_col=args.count_col)
            .select(args.id_col, "n_tokens", "bin_idx"),
            args.id_col,
        )
    elif args.cmd == "line-dedup":
        from fhir_owl_spark.operators.dedup import line_dedup

        out = line_dedup(docs, min_docs=args.min_docs,
                         text_col=args.text_col, id_col=args.id_col,
                         sep=args.sep)
    elif args.cmd == "span-dedup":
        from fhir_owl_spark.operators.dedup import (
            duplicate_span_stats,
            mask_duplicate_spans,
        )

        if args.stats_only:
            stats = duplicate_span_stats(
                docs, k=args.k, min_docs=args.min_docs,
                text_col=args.text_col, id_col=args.id_col,
            )
            out = docs.join(
                stats.select(args.id_col, "n_grams", "dup_grams",
                             "dup_fraction"),
                args.id_col, "left",
            )
        else:
            out = mask_duplicate_spans(
                docs, k=args.k, min_docs=args.min_docs,
                text_col=args.text_col, id_col=args.id_col,
            )
    elif args.cmd == "dsir":
        from fhir_owl_spark.operators.sampling import importance_weights

        weights = importance_weights(
            docs, F.col(args.target_col) == args.target_value,
            text_col=args.text_col, id_col=args.id_col, alpha=args.alpha,
        )
        out = docs.join(
            weights.select(args.id_col, "log_ratio"), args.id_col, "left"
        )
        if args.top_n is not None:
            from fhir_owl_spark.operators.sampling import importance_resample

            out = importance_resample(
                out, args.top_n, key_col=args.id_col,
                temperature=args.temperature, salt=args.salt,
            )
    elif args.cmd == "quota":
        from fhir_owl_spark.operators.skew import salted_top_k

        keyed = docs.withColumn(
            "_h",
            F.xxhash64(
                F.concat(F.col(args.id_col).cast("string"),
                         F.lit(":" + args.salt))
            ),
        )
        out = salted_top_k(
            keyed, args.group_col, [F.col("_h"), F.col(args.id_col)],
            args.k, n_salt=args.n_salt,
        ).select(*docs.columns)
    elif args.cmd == "buckets":
        from fhir_owl_spark.operators import text

        fn = (text.perplexity_buckets if args.exact
              else text.perplexity_bucket_thresholds)
        buckets = fn(docs, text_col=args.text_col, id_col=args.id_col,
                     group_col=args.group_col, n_buckets=args.n_buckets)
        out = docs.join(
            buckets.select(args.id_col, "bits_per_token", "bucket"),
            args.id_col, "left",
        )
    elif args.cmd == "sft":
        from fhir_owl_spark.operators.conversations import sft_pairs

        out = sft_pairs(
            docs,
            context_turns=args.context_turns,
            sep=args.sep,
            assistant_role=args.assistant_role,
        )
    elif args.cmd == "bpe-train":
        from fhir_owl_spark.operators import text

        merges = text.bpe_train(
            docs, n_merges=args.n_merges, text_col=args.text_col,
            min_count=args.min_count,
        )
        out = spark.createDataFrame(
            merges,
            "step INT, left STRING, right STRING, merged STRING, count BIGINT",
        )
    elif args.cmd == "classify":
        from fhir_owl_spark.operators import text

        scores = text.linear_classifier_score(
            docs, spark.read.parquet(args.weights), bias=args.bias,
            text_col=args.text_col, id_col=args.id_col,
            term_col=args.term_col, weight_col=args.weight_col,
        )
        out = docs.join(
            scores.select(args.id_col, "n_tokens", "raw_score", "score"),
            args.id_col, "left",
        )
        if args.min_score is not None:
            out = out.filter(F.col("score") >= args.min_score).select(
                *docs.columns
            )
    elif args.cmd == "setsim":
        from fhir_owl_spark.operators import dedup
        from fhir_owl_spark.operators.setsim import setsim_join

        pairs = setsim_join(
            docs, threshold=args.threshold,
            text_col=args.text_col, id_col=args.id_col,
        )
        if args.pairs_only:
            out = pairs
        else:
            decisions = dedup.dedup_keep_one(docs, pairs, id_col=args.id_col)
            out = docs.join(
                decisions.filter(F.col("keep")).select(args.id_col),
                args.id_col,
            )
    elif args.cmd == "decontaminate":
        from fhir_owl_spark.operators import dedup

        scores = dedup.contamination_overlap(
            docs, spark.read.parquet(args.benchmark),
            threshold=args.threshold, shingle_k=args.shingle_k,
            text_col=args.text_col, id_col=args.id_col,
            bench_id_col=args.bench_id_col or args.id_col,
        )
        if args.report_only:
            out = scores
        else:
            out = docs.join(
                scores.select(args.id_col).distinct(), args.id_col, "left_anti"
            )
    elif args.cmd == "burst":
        from fhir_owl_spark.operators.temporal import burst_detection

        burst_keys = tuple(k for k in args.key_cols.split(",") if k)
        if not burst_keys:
            raise SystemExit("burst: --key-cols must name at least one column")
        out = burst_detection(
            docs,
            key_cols=burst_keys,
            ts_col=args.ts_col,
            resolution=args.resolution,
            baseline_buckets=args.baseline_buckets,
            factor=args.factor,
            min_baseline=args.min_baseline,
        )
    elif args.cmd == "triangles":
        from fhir_owl_spark.operators.graph import triangle_counts

        out = triangle_counts(docs, src_col=args.src_col, dst_col=args.dst_col)
    elif args.cmd == "walks":
        from fhir_owl_spark.operators.graph import random_walks

        walks = random_walks(
            docs, walks_per_node=args.walks_per_node,
            walk_length=args.walk_length,
            src_col=args.src_col, dst_col=args.dst_col,
            hash_fn=F.xxhash64, max_degree=args.max_degree,
        )
        if args.skipgrams is not None:
            from fhir_owl_spark.operators.skew import windowed_co_occurrence

            out = windowed_co_occurrence(
                walks.select(
                    F.concat_ws(
                        "#", F.col("start").cast("string"),
                        F.col("walk_idx").cast("string"),
                    ).alias("g"),
                    F.col("step").alias("pos"),
                    F.col("node").alias("item"),
                ),
                "g", "pos", "item", window=args.skipgrams,
            )
        else:
            out = walks
    elif args.cmd == "quantiles":
        from fhir_owl_spark.operators.sketches import histogram_quantiles

        by = tuple(k for k in args.key_cols.split(",") if k)
        try:
            percents = tuple(int(p) for p in args.percents.split(","))
        except ValueError:
            raise SystemExit(
                f"--percents expects comma-separated integers, "
                f"got {args.percents!r}"
            ) from None
        src = docs
        vcol = args.value_col
        if vcol is None:
            vcol = "_len"
            src = docs.withColumn(
                vcol, F.length(F.coalesce(F.col(args.text_col), F.lit("")))
            )
        try:
            out = histogram_quantiles(
                src, vcol, percents=percents,
                lo=args.lo, hi=args.hi, bins=args.bins, by=by,
            )
        except ValueError as exc:
            raise SystemExit(str(exc)) from None
    else:  # pragma: no cover — argparse enforces the choice
        raise SystemExit(args.cmd)

    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    status = {"cmd": args.cmd, "rows_in": n_in, "rows_out": n_out,
              "output": args.output}
    if args.cmd == "dedup" and lsh_obs is not None:
        # observation metrics materialized by the write action above —
        # reading them costs no extra job; a non-zero count means some
        # degenerate duplicate cluster was star-connected: the candidate
        # pair REPORT is truncated, and verification runs a re-star
        # recovery round so members of a star bucket whose edge to an
        # outlier representative fails keep their true cluster (buckets
        # conflating 3+ distinct clusters can still lose edges — see
        # minhash_dedup_pairs' docstring)
        metrics = lsh_obs.get
        status["lsh_truncated_buckets"] = int(metrics["n_truncated_buckets"] or 0)
        status["lsh_max_bucket_size"] = int(metrics["max_bucket_size"] or 0)
    print(json.dumps(status))
    return status


def main(argv=None) -> int:
    run(parse_args(argv))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

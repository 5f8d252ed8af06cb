"""Structured Streaming: the batch mention operator composed with a file
stream must produce exactly the batch result; windowed watermarked counts
aggregate by event time."""

from __future__ import annotations

import pytest

from fhir_owl_spark import fixtures as fx
from fhir_owl_spark.operators.dictionary import build_concept_dictionary
from fhir_owl_spark.operators.mentions import extract_mentions
from fhir_owl_spark.streaming.ingest import (
    read_transcript_stream,
    start_mention_stream,
    windowed_mention_counts,
)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    ont, cfg = fx.pizza_fixture()
    turns = fx.make_transcripts(ont, cfg, n_conv=25, seed=42)
    inp = str(base / "in")
    fx.transcripts_df(spark, turns).write.parquet(inp)
    concepts, _, synonyms = fx.ontology_dfs(spark, ont)
    dictionary = build_concept_dictionary(concepts, synonyms, cfg).localCheckpoint()
    return base, inp, dictionary, cfg


def test_stream_equals_batch(spark, setup):
    base, inp, dictionary, cfg = setup
    out, ckpt = str(base / "out"), str(base / "ckpt")
    q = start_mention_stream(spark, inp, out, ckpt, dictionary, cfg)
    q.awaitTermination(120)

    streamed = {
        (r["subj"], r["obj"])
        for r in spark.read.parquet(out).select("subj", "obj").collect()
    }
    batch = extract_mentions(spark.read.parquet(inp), dictionary, cfg)
    expected = {(r["code"], r["conv_id"]) for r in batch.collect()}
    assert streamed == expected and streamed

    # restart with no new input: checkpoint makes it a no-op (exactly-once)
    q2 = start_mention_stream(spark, inp, out, ckpt, dictionary, cfg)
    q2.awaitTermination(120)
    again = {
        (r["subj"], r["obj"])
        for r in spark.read.parquet(out).select("subj", "obj").collect()
    }
    assert spark.read.parquet(out).count() == len(
        extract_mentions(spark.read.parquet(inp), dictionary, cfg).collect()
    )
    assert again == expected


def test_windowed_counts_match_batch_grouping(spark, setup):
    base, inp, dictionary, cfg = setup
    stream = read_transcript_stream(spark, inp)
    counts = windowed_mention_counts(stream, dictionary, cfg, window="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["start"], r["code"], r["n_mentions"])
        for r in spark.sql("select * from wincounts").collect()
    }

    from pyspark.sql import functions as F

    batch = extract_mentions(spark.read.parquet(inp), dictionary, cfg, carry_cols=("ts",))
    expected = {
        (r["start"], r["code"], r["n"])
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"), "code")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "code", "n")
        .collect()
    }
    assert got == expected and got


def test_dedup_stream_bounded_state(spark, setup, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate (conv_id, turn_idx) rows
    across micro-batches collapse to one within the watermark; the state
    store stays bounded (watermark horizon, not stream length)."""
    from fhir_owl_spark.streaming.ingest import dedup_stream, read_transcript_stream

    base, inp, dictionary, cfg = setup
    # duplicate the ENTIRE input into the stream directory twice
    dup_in = str(tmp_path / "dup_in")
    batch = spark.read.parquet(inp)
    batch.write.mode("overwrite").parquet(dup_in)
    batch.write.mode("append").parquet(dup_in)
    assert spark.read.parquet(dup_in).count() == 2 * batch.count()

    stream = read_transcript_stream(spark, dup_in)
    deduped = dedup_stream(stream, watermark="1 hour")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    assert got.select("conv_id", "turn_idx").distinct().count() == batch.count()


def test_stream_checkpoint_resume_processes_only_new_files(spark, setup, tmp_path):
    """Restarting the stream with the same checkpoint must process ONLY
    files added since the last run (source-offset exactly-once), and the
    final output must equal one batch pass over everything."""
    from fhir_owl_spark.operators.mentions import extract_mentions

    base, inp, dictionary, cfg = setup
    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    batch = spark.read.parquet(inp)
    first_half = batch.filter("conv_id < 'conv00013'")
    second_half = batch.filter("conv_id >= 'conv00013'")
    first_half.write.parquet(src)

    q = start_mention_stream(spark, src, out, ckpt, dictionary, cfg)
    q.awaitTermination(120)
    n_first = spark.read.parquet(out).count()

    # add new files, restart with the SAME checkpoint
    second_half.write.mode("append").parquet(src)
    q2 = start_mention_stream(spark, src, out, ckpt, dictionary, cfg)
    q2.awaitTermination(120)

    streamed = spark.read.parquet(out)
    expected = extract_mentions(batch, dictionary, cfg)
    # no reprocessing: totals equal the one-pass batch count
    assert streamed.count() == expected.count()
    assert streamed.count() > n_first  # second run added the new files
    got = {(r["subj"], r["obj"]) for r in streamed.select("subj", "obj").collect()}
    want = {(r["code"], r["conv_id"]) for r in expected.select("code", "conv_id").collect()}
    assert got == want


def test_sessionize_stream_equals_batch_across_restarts(spark, tmp_path):
    """Streaming sessionization must equal batch sessionize even when a
    conversation's sessions SPAN micro-batches: early turns in run 1,
    later turns appended and processed by run 2 on the same checkpoint —
    the keyed (last_ts, session) state carries across the restart."""
    from datetime import datetime, timedelta

    from fhir_owl_spark.operators.conversations import sessionize
    from fhir_owl_spark.schemas import TRANSCRIPTS
    from fhir_owl_spark.streaming.sessions import sessionize_stream

    t0 = datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    for c in ("c1", "c2", "c3"):
        offs = {"c1": 0, "c2": 7, "c3": 41}[c]
        # gaps (minutes) between consecutive turns: mixture above/below 30
        gaps = [0, 10, 40, 5, 90, 10]
        acc = offs
        for i, g in enumerate(gaps):
            acc += g
            rows.append((c, i, "user", f"turn {i}", None, t0 + timedelta(minutes=acc)))
    full = spark.createDataFrame(rows, schema=TRANSCRIPTS)

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    full.filter("turn_idx < 3").write.parquet(src)

    def run():
        stream = spark.readStream.schema(TRANSCRIPTS).parquet(src)
        q = (
            sessionize_stream(stream, gap="30 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()  # first half: sessions 0..1 begin
    full.filter("turn_idx >= 3").write.mode("append").parquet(src)
    run()  # second half: the 90-minute gap lands AFTER the restart

    got = {
        (r["conv_id"], r["turn_idx"]): (r["session_idx"], r["gap_us"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["session_idx"], r["gap_us"])
        for r in sessionize(full, gap="30 minutes").collect()
    }
    assert got == want
    assert len(got) == 18
    # sanity: the cross-restart gap really did open a new session
    assert want[("c1", 4)][0] == want[("c1", 3)][0] + 1


def test_streaming_exact_dedup_bounded_state(spark, tmp_path):
    """Streaming exact-dedup (dropDuplicatesWithinWatermark): duplicated
    texts across TWO micro-batches inside the watermark window are
    emitted once; the distinct content set equals the batch dedup."""
    import datetime as dt

    from fhir_owl_spark.streaming.dedup import streaming_exact_dedup

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id long, text string, ts timestamp"
    b1 = [(1, "alpha text", t0), (2, "beta text", t0), (3, "alpha text", t0)]
    b2 = [(4, "beta text", t0 + dt.timedelta(minutes=1)),
          (5, "gamma text", t0 + dt.timedelta(minutes=1))]
    inp = tmp_path / "in"
    spark.createDataFrame(b1, schema).write.parquet(str(inp / "f1.parquet"))
    spark.createDataFrame(b2, schema).write.parquet(str(inp / "f2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*/")
    )
    out = streaming_exact_dedup(stream, watermark_delay="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["text"] for r in spark.sql("select * from dedup_stream").collect()]
    assert sorted(got) == ["alpha text", "beta text", "gamma text"]

    # batch-mode path deduplicates globally on the same key
    batch = streaming_exact_dedup(spark.read.parquet(f"{inp}/*/"))
    assert sorted(r["text"] for r in batch.collect()) == sorted(got)


def _near_dup_corpus(spark):
    """Ordered-id corpus with exact-dup clusters, a light-variation pair
    and uniques — split into three arrival files."""
    boiler = "subscribe to our newsletter for updates and exclusive offers today"
    base = "the spark catalyst optimizer rewrites logical plans into physical plans"
    rows = [
        (0, boiler), (1, "a unique document about owl ontologies and fhir"),
        (2, boiler), (3, base),
        (4, base + " quickly"), (5, boiler),
        (6, "another entirely different text regarding streaming state"),
        (7, boiler), (8, base), (9, "final unique text about lineage manifests"),
    ]
    schema = "doc_id long, text string"
    files = [rows[:4], rows[4:7], rows[7:]]
    return schema, files, rows


def test_streaming_near_dup_equals_batch_twin(spark, tmp_path):
    """Replaying the corpus through the micro-batch LSH store produces
    EXACTLY the batch twin's first-seen flags (round-5 item #8)."""
    from fhir_owl_spark.streaming.near_dup import (
        near_dup_first_seen,
        start_near_dup_stream,
    )

    schema, files, rows = _near_dup_corpus(spark)
    inp = tmp_path / "in"
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(inp / f"f{i}.parquet")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*/")
    )
    q = start_near_dup_stream(
        spark, stream, str(tmp_path / "out"), str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.read.parquet(str(tmp_path / "out")).drop("batch").collect()}
    full = spark.createDataFrame(rows, schema)
    want = {tuple(r) for r in near_dup_first_seen(full).collect()}
    assert got == want
    # the boilerplate cluster flags every later copy against doc 0
    flagged = {r[0]: r[1] for r in got}
    for later in (2, 5, 7):
        assert flagged[later] == 0
    assert flagged[8] == 3  # exact copy of the base text
    assert 1 not in flagged and 6 not in flagged and 9 not in flagged


def test_streaming_near_dup_checkpoint_restart(spark, tmp_path):
    """Kill-and-resume: first run sees only file 0; the restart (same
    checkpoint) ingests the rest — the final flag set is byte-identical
    to the single-shot batch twin, and the store holds ONE representative
    per band bucket (bounded state, star-connect by construction)."""
    from fhir_owl_spark.streaming.near_dup import (
        near_dup_first_seen,
        start_near_dup_stream,
    )

    schema, files, rows = _near_dup_corpus(spark)
    inp = tmp_path / "in"
    spark.createDataFrame(files[0], schema).coalesce(1).write.parquet(
        str(inp / "f0.parquet")
    )

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*/")
        )
        q = start_near_dup_stream(
            spark, stream, str(tmp_path / "out"), str(tmp_path / "store"),
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)

    run()
    for i, chunk in enumerate(files[1:], start=1):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(inp / f"f{i}.parquet")
        )
    run()

    got = {tuple(r) for r in spark.read.parquet(str(tmp_path / "out")).drop("batch").collect()}
    want = {tuple(r) for r in near_dup_first_seen(
        spark.createDataFrame(rows, schema)).collect()}
    assert got == want

    # bounded store: exactly one representative per (band_idx, band_hash)
    import glob as _glob
    import os as _os

    latest = max(
        _glob.glob(str(tmp_path / "store" / "v*")),
        key=lambda p: int(_os.path.basename(p)[1:]),
    )
    store = spark.read.parquet(latest)
    per_bucket = store.groupBy("band_idx", "band_hash").count()
    assert per_bucket.filter("count > 1").count() == 0


def test_streaming_near_dup_equivalence_graded_similarity(spark, tmp_path):
    """Stress the stream ≡ batch contract with GRADED similarity: families
    whose members collide in some LSH bands while est-Jaccard straddles
    the threshold — the shape that exposed the r5 within-batch-star
    equivalence hole (a stored bucket's batch members must NOT star to
    the batch minimum; the twin only ever considers the global rep)."""
    from fhir_owl_spark.streaming.near_dup import (
        near_dup_first_seen,
        start_near_dup_stream,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    words = base.split()
    rows = []
    for i in range(36):
        fam, var = divmod(i, 6)
        # family text: rotate + perturb `var` words → graded similarity
        w = words[fam:] + words[:fam]
        w = [f"v{var}_{j}" if j < var else t for j, t in enumerate(w)]
        rows.append((i, " ".join(w)))
    schema = "doc_id long, text string"
    inp = tmp_path / "in"
    for i in range(3):
        spark.createDataFrame(rows[i * 12:(i + 1) * 12], schema).coalesce(
            1).write.parquet(str(inp / f"f{i}.parquet"))

    for threshold in (0.4, 0.7):
        out = tmp_path / f"out{threshold}"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inp}/*/")
        )
        q = start_near_dup_stream(
            spark, stream, str(out), str(tmp_path / f"store{threshold}"),
            str(tmp_path / f"ckpt{threshold}"), threshold=threshold,
        )
        q.awaitTermination(240)
        got = {tuple(r) for r in
               spark.read.parquet(str(out)).drop("batch").collect()}
        want = {tuple(r) for r in near_dup_first_seen(
            spark.createDataFrame(rows, schema), threshold=threshold).collect()}
        assert got == want, (threshold, got ^ want)


def test_streaming_near_dup_store_retention(spark, tmp_path):
    """The versioned store keeps at most TWO versions (current + the one
    a batch retry would re-read) — disk stays bounded over a long
    stream; results unchanged vs the batch twin."""
    import glob as _glob

    from fhir_owl_spark.streaming.near_dup import (
        near_dup_first_seen,
        start_near_dup_stream,
    )

    schema = "doc_id long, text string"
    rows = [(i, "the recurring boiler sentence appears again" if i % 3 == 0
             else f"unique number {i} text content") for i in range(24)]
    inp = tmp_path / "in"
    for k in range(4):  # four micro-batches
        spark.createDataFrame(rows[k * 6:(k + 1) * 6], schema).coalesce(
            1).write.parquet(str(inp / f"f{k}.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{inp}/*/"))
    q = start_near_dup_stream(spark, stream, str(tmp_path / "o"),
                              str(tmp_path / "s"), str(tmp_path / "c"))
    q.awaitTermination(240)
    versions = sorted(_glob.glob(str(tmp_path / "s" / "v*")))
    assert len(versions) <= 2
    got = {tuple(r) for r in
           spark.read.parquet(str(tmp_path / "o")).drop("batch").collect()}
    want = {tuple(r) for r in near_dup_first_seen(
        spark.createDataFrame(rows, schema)).collect()}
    assert got == want


def test_burst_stream_equals_batch_across_restarts(spark, tmp_path):
    """Streaming burst detection must equal the batch operator even when
    a key's bucket series SPANS micro-batches and a checkpoint restart:
    the (current bucket, running count, baseline history) state carries
    across both. A sentinel event one bucket past the horizon flushes
    each key's final bucket (the documented close-on-advance contract)."""
    import datetime as dt

    from fhir_owl_spark.operators.temporal import burst_detection
    from fhir_owl_spark.streaming.bursts import burst_stream

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_type string, ts timestamp"
    rows = []
    # 'a': 2/day for 8 days then a 9-count spike on day 9
    for d in range(8):
        rows += [("a", t0 + dt.timedelta(days=d, hours=h)) for h in range(2)]
    rows += [("a", t0 + dt.timedelta(days=8, hours=h)) for h in range(9)]
    # 'b': irregular with gaps (observed-bucket baseline, not calendar)
    for d in (0, 1, 4, 5, 6, 9, 10, 11):
        rows += [("b", t0 + dt.timedelta(days=d, hours=h)) for h in range(1 + d % 3)]
    sentinel = dt.datetime(2030, 1, 1)
    flush = [("a", sentinel), ("b", sentinel)]

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    half = t0 + dt.timedelta(days=5)
    spark.createDataFrame([r for r in rows if r[1] < half], schema).write.parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            burst_stream(stream, key_col="event_type", baseline_buckets=7)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()  # first half of the series
    spark.createDataFrame(
        [r for r in rows if r[1] >= half] + flush, schema
    ).write.mode("append").parquet(src)
    run()  # rest + sentinel flush, same checkpoint

    got = {
        (r["key"], r["bucket"]): (
            r["cnt"], r["base_sum"], r["base_n"], r["is_burst"], r["burst_ratio"]
        )
        for r in spark.read.parquet(out).collect()
    }
    batch = burst_detection(
        spark.createDataFrame(rows, schema),
        key_cols=("event_type",),
        baseline_buckets=7,
    )
    want = {
        (r["event_type"], r["bucket"]): (
            r["cnt"], r["base_sum"], r["base_n"], r["is_burst"], r["burst_ratio"]
        )
        for r in batch.collect()
    }
    assert got == want  # sentinel's own bucket never closes, so no extra rows
    assert sum(1 for v in got.values() if v[3]) == 1  # exactly the day-9 spike

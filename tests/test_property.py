"""Property-based parity: on RANDOM small ontologies (DAGs with random
labels/synonyms/deprecation/imports/unsatisfiability) and random configs,
the distributed engine must equal the pure-Python model EXACTLY.

Catches edge-case interactions the hand-built fixtures don't enumerate
(multi-parent + deprecated, unsatisfiable mid-chain, synonym==display
after exclusion, imported-only ontologies, ...). Spark jobs per example
are expensive → bounded examples, no shrinking timeout surprises.
"""

from __future__ import annotations

import dataclasses

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fhir_owl_spark import fixtures as fx
from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.operators.hierarchy import HierarchyCycleError
from fhir_owl_spark.plans.build_graph import build_graph
from fhir_owl_spark.schemas import OWL_THING

NS = "http://example.org/prop#"
LABEL_POOL = ["alpha beta", "Gamma", "delta", "EPSILON zeta", "eta", "wiki", "Theta"]
SYN_POOL = ["syn one", "syn two", "Gamma", "wiki", "iota", "kappa mu"]


@st.composite
def ontologies(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    o = fx.Ontology()
    o.concept(OWL_THING, "main", label="Thing")
    iris = []
    for i in range(n):
        iri = f"{NS}C{i}_x"  # underscore exercises code_replace
        label = draw(st.sampled_from(LABEL_POOL + [None]))
        deprecated = draw(st.booleans()) and draw(st.booleans())  # ~25%
        imported = draw(st.booleans()) and draw(st.booleans())
        unsat = draw(st.booleans()) and draw(st.booleans()) and draw(st.booleans())
        o.concept(
            iri, "imp" if imported else "main", label=label,
            deprecated=deprecated, imported=imported, unsatisfiable=unsat,
        )
        iris.append(iri)
        # edges only to earlier nodes (or Thing) → DAG by construction
        for target in [OWL_THING] + iris[:-1]:
            if draw(st.integers(0, 3)) == 0:
                o.edge(iri, target)
        for prop in ("label", "hasExactSynonym", "altLabel"):
            for _ in range(draw(st.integers(0, 2))):
                o.synonym(iri, draw(st.sampled_from(SYN_POOL)), prop=prop)
    return o


@st.composite
def configs(draw):
    return PipelineConfig(
        synonym_props=draw(
            st.sampled_from(
                [("label",), ("label", "hasExactSynonym"),
                 ("label", "hasExactSynonym", "altLabel")]
            )
        ),
        labels_to_exclude=draw(st.sampled_from([(), ("wiki",), ("wiki", "Gamma")])),
        include_deprecated=draw(st.booleans()),
        code_replace=draw(st.sampled_from([None, ("_", ":"), ("_x", "")])),
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ont=ontologies(), cfg=configs())
def test_engine_equals_model(spark, ont, cfg):
    expected = fx.model_build_graph(ont, [], cfg)
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    tdf = fx.transcripts_df(spark, [])
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_graph(spark, concepts, edges, synonyms, tdf, cfg).collect()
    }
    assert got == expected, (
        f"extra={sorted(got - expected)[:5]} missing={sorted(expected - got)[:5]}"
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ont=ontologies(), cfg=configs(), data=st.data())
def test_distributed_hierarchy_equals_model(spark, ont, cfg, data):
    """Same property through the DISTRIBUTED closure/reduction path."""
    cfg = dataclasses.replace(cfg, small_graph_threshold=0)
    expected = fx.model_build_graph(ont, [], cfg)
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    tdf = fx.transcripts_df(spark, [])
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_graph(spark, concepts, edges, synonyms, tdf, cfg).collect()
    }
    assert got == expected


def test_cycle_aborts_both_paths(spark):
    ont, cfg = fx.cycle_fixture()
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    tdf = fx.transcripts_df(spark, [])
    with pytest.raises(HierarchyCycleError):
        build_graph(spark, concepts, edges, synonyms, tdf, cfg).count()
    with pytest.raises((HierarchyCycleError, RuntimeError)):
        fx.model_build_graph(ont, [], cfg)


def test_equivalence_group_mode_both_paths(spark):
    """Default equivalence_mode='group': mutual subsumption = equivalence
    set; members share external parents, children get all members, isolated
    sets re-root at Thing — reasoner strict-superclass parity. Engine and
    pure-Python model must agree exactly."""
    ont, cfg = fx.equivalence_fixture()
    expected = fx.model_build_graph(ont, [], cfg)
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    tdf = fx.transcripts_df(spark, [])
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_graph(spark, concepts, edges, synonyms, tdf, cfg).collect()
    }
    assert got == expected
    isa = {(s, o) for s, p, o in got if p == "is-a"}
    # equivalence-set members share the external parent, no edge between them
    assert ("Veggie", "Food") in isa and ("Vegetarian", "Food") in isa
    assert ("Veggie", "Vegetarian") not in isa and ("Vegetarian", "Veggie") not in isa
    # the child of one member gets BOTH members as parents
    assert ("Margherita", "Veggie") in isa and ("Margherita", "Vegetarian") in isa
    # isolated 2-cycle re-roots at Thing
    assert ("X", "Thing") in isa and ("Y", "Thing") in isa


def test_equivalence_group_mode_distributed_path(spark):
    """Same fixture forced onto the distributed closure path
    (small_graph_threshold=0) — must equal the driver fast path."""
    import dataclasses

    ont, cfg = fx.equivalence_fixture()
    cfg_dist = dataclasses.replace(cfg, small_graph_threshold=0)
    expected = fx.model_build_graph(ont, [], cfg)
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    tdf = fx.transcripts_df(spark, [])
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_graph(spark, concepts, edges, synonyms, tdf, cfg_dist).collect()
    }
    assert got == expected


def test_equivalent_class_axiom_parsed(spark, tmp_path):
    """owl:equivalentClass with a NAMED target becomes mutual subsumption;
    under the default group mode both classes share external parents."""
    from fhir_owl_spark.sources.owl_xml import parse_owl_xml, RDFS_LABEL

    owl = tmp_path / "eq.owl"
    owl.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/eq"/>'
        '<owl:Class rdf:about="http://ex/eq#Food"><rdfs:label>Food</rdfs:label></owl:Class>'
        '<owl:Class rdf:about="http://ex/eq#Veggie"><rdfs:label>Veggie</rdfs:label>'
        '<rdfs:subClassOf rdf:resource="http://ex/eq#Food"/>'
        '<owl:equivalentClass rdf:resource="http://ex/eq#Vegetarian"/></owl:Class>'
        '<owl:Class rdf:about="http://ex/eq#Vegetarian">'
        "<rdfs:label>Vegetarian</rdfs:label></owl:Class>"
        # anonymous equivalent must be ignored (no rdf:resource)
        '<owl:Class rdf:about="http://ex/eq#Spicy"><rdfs:label>Spicy</rdfs:label>'
        "<owl:equivalentClass><owl:Restriction/></owl:equivalentClass></owl:Class>"
        "</rdf:RDF>"
    )
    parsed = parse_owl_xml(str(owl))
    cfg = PipelineConfig(display_prop=RDFS_LABEL, synonym_props=(RDFS_LABEL,))
    concepts, edges, synonyms = fx.ontology_dfs(spark, parsed.tables)
    tdf = fx.transcripts_df(spark, [])
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_graph(spark, concepts, edges, synonyms, tdf, cfg).collect()
    }
    isa = {(s, o) for s, p, o in got if p == "is-a"}
    assert ("Veggie", "Food") in isa and ("Vegetarian", "Food") in isa
    assert ("Veggie", "Vegetarian") not in isa and ("Vegetarian", "Veggie") not in isa
    assert ("Spicy", "Thing") in isa  # anonymous equivalent ignored


def test_dangling_parent_not_rerooted_both_paths(spark):
    """group mode: an edge to an UNDECLARED parent (unmapped import) must
    not invent a Thing re-root for the dangling endpoint — and the driver
    fast path must agree with the distributed path."""
    import dataclasses

    ont = fx.Ontology()
    ont.concept(fx.OWL_THING, "x", label="Thing")
    ont.concept("http://x#A", "x", label="A")
    ont.edge("http://x#A", "http://imported#Gone")  # declared nowhere
    cfg = PipelineConfig()
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)

    from fhir_owl_spark.operators.hierarchy import build_hierarchy

    fast = {(r["child_iri"], r["parent_iri"])
            for r in build_hierarchy(concepts, edges, cfg).collect()}
    dist = {(r["child_iri"], r["parent_iri"])
            for r in build_hierarchy(
                concepts, edges, dataclasses.replace(cfg, small_graph_threshold=0)
            ).collect()}
    assert fast == dist
    assert ("http://imported#Gone", fx.OWL_THING) not in fast
    # A keeps its asserted (dangling) parent
    assert ("http://x#A", "http://imported#Gone") in fast


# ---------------------------------------------------------------------------
# Property tests for the round-2 training-data operators. Driver-side
# Python reimplementations act as the oracle; Spark runs once per example
# set (batched into one DataFrame) to keep job count low.
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.lists(st.sampled_from("alpha beta gamma delta x9".split()), max_size=40)
        .map(" ".join),
        min_size=1, max_size=8,
    ),
    max_tokens=st.integers(2, 12),
    overlap=st.integers(0, 4),
)
def test_chunk_coverage_and_overlap_property(spark, texts, max_tokens, overlap):
    """Invariants: (1) concatenating each doc's chunks with overlap removed
    reconstructs the token stream exactly; (2) consecutive chunks share
    exactly `overlap` tokens (except a short final chunk); (3) n_tokens
    equals the chunk's own token count (empty→0)."""
    from fhir_owl_spark.operators.text import chunk_documents

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    stride = max_tokens - overlap
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = chunk_documents(df, max_tokens=max_tokens, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        toks = t.lower().split()
        # (3) per-chunk token count
        for c in chunks:
            own = c["chunk_text"].split()
            assert c["n_tokens"] == len(own)
        # (1) reconstruction: first chunk whole, then drop `overlap` tokens
        rebuilt = chunks[0]["chunk_text"].split()
        for prev, c in zip(chunks, chunks[1:]):
            own = c["chunk_text"].split()
            start = c["chunk_idx"] * stride
            rebuilt = rebuilt[:start] + own
            # (2) shared prefix equals prev's suffix
            shared = min(len(prev["chunk_text"].split()) - stride, len(own))
            if shared > 0:
                assert prev["chunk_text"].split()[stride:stride + shared] == own[:shared]
        assert rebuilt == toks


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rate_lo=st.floats(0.0, 1.0),
    rate_hi=st.floats(0.0, 1.0),
    salt=st.sampled_from(["v1", "v2", "experiment-3"]),
)
def test_sampling_monotone_and_salt_independent_property(spark, rate_lo, rate_hi, salt):
    from fhir_owl_spark.operators.sampling import sample_rows

    lo, hi = sorted([rate_lo, rate_hi])
    df = spark.range(400).withColumnRenamed("id", "doc_id")
    small = {r["doc_id"] for r in sample_rows(df, lo, "doc_id", salt=salt).collect()}
    big = {r["doc_id"] for r in sample_rows(df, hi, "doc_id", salt=salt).collect()}
    assert small <= big          # monotone in rate for a fixed salt
    assert len(big) <= 400
    # determinism: same call → same set
    again = {r["doc_id"] for r in sample_rows(df, hi, "doc_id", salt=salt).collect()}
    assert big == again


@st.composite
def random_dags(draw):
    """Random DAG as (child, parent) edges over nodes n0..n{k}: each node
    may point to any lower-numbered node — acyclic by construction."""
    k = draw(st.integers(min_value=2, max_value=14))
    edges = []
    for c in range(1, k + 1):
        for p in draw(st.lists(st.integers(0, c - 1), max_size=3, unique=True)):
            edges.append((f"n{c}", f"n{p}"))
    return edges


def _py_reach(edges, seeds):
    """Independent model: per-seed upward reachability by plain BFS."""
    adj: dict = {}
    for c, p in edges:
        adj.setdefault(c, set()).add(p)
    out = set()
    for s in seeds:
        frontier, seen = {s}, set()
        while frontier:
            nxt = set()
            for n in frontier:
                for p in adj.get(n, ()):
                    if p not in seen:
                        seen.add(p)
                        nxt.add(p)
            frontier = nxt
        out |= {(s, n) for n in seen}
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(edges=random_dags(), data=st.data())
def test_reachable_pairs_and_closure_delta_match_model(spark, edges, data):
    """reachable_pairs (per-seed attribution) and the closure-delta
    composition must equal a plain-Python BFS model on random DAGs,
    through BOTH physical paths (broadcast and shuffle hops)."""
    from fhir_owl_spark.operators.hierarchy import reachable_pairs

    if not edges:
        return
    nodes = sorted({n for e in edges for n in e})
    seeds = data.draw(
        st.lists(st.sampled_from(nodes), min_size=1, max_size=3, unique=True)
    )
    bcast = data.draw(st.booleans())
    e = spark.createDataFrame(edges, ["child", "parent"])
    got = {
        (r["seed"], r["node"])
        for r in reachable_pairs(e, seeds, direction="up", broadcast_edges=bcast).collect()
    }
    assert got == _py_reach(edges, seeds)

    # downward reachability ≡ upward over reversed edges
    got_down = {
        (r["seed"], r["node"])
        for r in reachable_pairs(e, seeds, direction="down", broadcast_edges=bcast).collect()
    }
    assert got_down == _py_reach([(p, c) for c, p in edges], seeds)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    gaps=st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=12),
    threshold_min=st.integers(min_value=1, max_value=60),
)
def test_sessionize_invariants(spark, gaps, threshold_min):
    """Session indexes start at 0, never decrease, and increment EXACTLY
    at turns whose gap to the previous turn exceeds the threshold."""
    from datetime import datetime, timedelta

    from fhir_owl_spark.operators.conversations import sessionize

    t0 = datetime(2024, 1, 1, 8, 0, 0)
    acc, rows = 0, []
    for i, g in enumerate(gaps):
        acc += g
        rows.append(("c", i, "user", "x", None, t0 + timedelta(minutes=acc)))
    from fhir_owl_spark.schemas import TRANSCRIPTS

    df = spark.createDataFrame(rows, schema=TRANSCRIPTS)
    got = {
        r["turn_idx"]: (r["session_idx"], r["gap_us"])
        for r in sessionize(df, gap=f"{threshold_min} minutes").collect()
    }
    expect_idx = 0
    assert got[0] == (0, None)
    for i, g in enumerate(gaps):
        if i == 0:
            continue
        if g * 60 * 1_000_000 > threshold_min * 60 * 1_000_000:
            expect_idx += 1
        assert got[i] == (expect_idx, g * 60 * 1_000_000)


def _py_k_hop(edges, seeds, k, direction="up"):
    """Independent model: BFS levels with min-hop attribution, capped at k."""
    adj: dict = {}
    for c, p in edges:
        a, b = (c, p) if direction == "up" else (p, c)
        adj.setdefault(a, set()).add(b)
    hops: dict = {}
    frontier = set(seeds)
    for level in range(1, k + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        nxt -= set(hops)
        if not nxt:
            break
        for n in nxt:
            hops[n] = level
        frontier = nxt
    return hops


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(edges=random_dags(), data=st.data())
def test_k_hop_matches_model(spark, edges, data):
    """k_hop must equal a plain-Python leveled BFS (min-hop attribution,
    depth cap) on random DAGs, both directions, both physical paths."""
    from fhir_owl_spark.operators.hierarchy import k_hop

    if not edges:
        return
    nodes = sorted({n for e in edges for n in e})
    seeds = data.draw(
        st.lists(st.sampled_from(nodes), min_size=1, max_size=3, unique=True)
    )
    k = data.draw(st.integers(min_value=1, max_value=4))
    direction = data.draw(st.sampled_from(["up", "down"]))
    bcast = data.draw(st.booleans())
    e = spark.createDataFrame(edges, ["child", "parent"])
    got = {
        r["node"]: r["hops"]
        for r in k_hop(
            e, seeds, k=k, direction=direction, broadcast_edges=bcast
        ).collect()
    }
    assert got == _py_k_hop(edges, seeds, k, direction)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "eee"]),
            min_size=0, max_size=8,
        ),
        min_size=1, max_size=10,
    )
)
def test_bigram_logloss_matches_model(spark, docs):
    """corpus_bigram_logloss must equal a plain-Python Jelinek-Mercer
    bigram model (λ=0.75) on random tiny corpora, including token-free
    and single-token documents."""
    import collections
    import math as m

    from fhir_owl_spark.operators.text import corpus_bigram_logloss

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_pairs"], r["bits_per_pair"])
           for r in corpus_bigram_logloss(df, lam=0.75).collect()}

    uni = collections.Counter(w for ws in docs for w in ws)
    n = sum(uni.values())
    bg = collections.Counter(
        (ws[i], ws[i + 1]) for ws in docs for i in range(len(ws) - 1))
    ctx = collections.Counter()
    for (w1, _), c in bg.items():
        ctx[w1] += c
    for i, ws in enumerate(docs):
        pairs = [(ws[j], ws[j + 1]) for j in range(len(ws) - 1)]
        if not pairs:
            assert got[i] == (0, None)
            continue
        bits = sum(
            -m.log2(0.75 * bg[p] / ctx[p[0]] + 0.25 * uni[p[1]] / n)
            for p in pairs
        ) / len(pairs)
        assert got[i][0] == len(pairs)
        assert abs(got[i][1] - bits) < 1e-5, (i, got[i], bits)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    convs=st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["user", "assistant", "tool"]),
                st.one_of(st.none(), st.sampled_from(["hi", "do it", "ok then"])),
            ),
            min_size=1, max_size=7,
        ),
        min_size=1, max_size=5,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_sft_pairs_matches_model(spark, convs, k):
    """sft_pairs must equal a plain-Python rolling-window model on random
    conversations: every assistant turn with ≥1 preceding turn becomes
    (prompt = up-to-k prior 'role: text' lines, response = text or '')."""
    from fhir_owl_spark.operators.conversations import sft_pairs

    rows = [
        (f"c{ci}", ti, role, text)
        for ci, turns in enumerate(convs)
        for ti, (role, text) in enumerate(turns)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {(r["conv_id"], r["turn_idx"]): (r["prompt"], r["response"])
           for r in sft_pairs(df, context_turns=k).collect()}

    want = {}
    for ci, turns in enumerate(convs):
        for ti, (role, text) in enumerate(turns):
            if role != "assistant" or ti == 0:
                continue
            ctx = turns[max(0, ti - k):ti]
            prompt = "\n".join(f"{r}: {t or ''}" for r, t in ctx)
            want[(f"c{ci}", ti)] = (prompt, text or "")
    assert got == want

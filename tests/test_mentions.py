"""Mention-detection semantics: whole-word ASCII-boundary matching, case
insensitivity, nested/overlapping terms, strategy equivalence (layered
regex vs Aho-Corasick), deprecated/stop-term exclusion."""

from __future__ import annotations

import datetime as dt

import pytest

from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.fixtures import Ontology, ontology_dfs, transcripts_df
from fhir_owl_spark.operators.dictionary import build_concept_dictionary
from fhir_owl_spark.operators.mentions import (
    AhoCorasick,
    _layer_terms,
    extract_mentions,
)
from fhir_owl_spark.schemas import OWL_THING


def make_ont():
    o = Ontology()
    o.concept(OWL_THING, "t", label="Thing")
    o.concept("http://x#Data", "t", label="data")
    o.concept("http://x#DataObject", "t", label="data object")
    o.concept("http://x#Scan", "t", label="scan")
    o.concept("http://x#Old", "t", label="legacy", deprecated=True)
    for c in o.concepts:
        if c["label"]:
            o.synonym(c["iri"], c["label"], prop="label")
    cfg = PipelineConfig(synonym_props=("label",), has_imports=False, min_term_chars=2)
    return o, cfg


def turns(*texts):
    return [
        dict(conv_id=f"c{i}", turn_idx=0, role="user", text=t, tool=None,
             ts=dt.datetime(2026, 1, 1))
        for i, t in enumerate(texts)
    ]


def run(spark, texts, strategy, cfg=None, ont=None):
    o, c = make_ont()
    cfg = cfg or c
    ont = ont or o
    concepts, edges, synonyms = ontology_dfs(spark, ont)
    d = build_concept_dictionary(concepts, synonyms, cfg)
    tdf = transcripts_df(spark, turns(*texts))
    m = extract_mentions(tdf, d, cfg, strategy=strategy)
    return {(r["conv_id"], r["code"], r["term"], r["n_hits"]) for r in m.collect()}


TEXTS = [
    "the data object is ready",     # 'data object' AND 'data' both match
    "DATA Object pipeline",         # case-insensitive, multi-word across case
    "database scan running",        # 'data' must NOT match inside 'database'
    "scan scan scan",               # n_hits=3
    "data, object!",                # punctuation boundary: 'data' yes, 'data object' no
    "legacy system",                # deprecated label must not link
    "",                             # empty text
]

EXPECTED = {
    ("c0", "Data", "data", 1),
    ("c0", "DataObject", "data object", 1),
    ("c1", "Data", "data", 1),
    ("c1", "DataObject", "data object", 1),
    ("c2", "Scan", "scan", 1),
    ("c3", "Scan", "scan", 3),
    ("c4", "Data", "data", 1),
}


@pytest.mark.parametrize("strategy", ["regex", "trieregex", "ahocorasick"])
def test_matching_semantics(spark, strategy):
    assert run(spark, TEXTS, strategy) == EXPECTED


def test_strategies_agree_on_fixture_corpus(spark):
    from fhir_owl_spark import fixtures as fx

    ont, cfg = fx.pizza_fixture()
    texts = [t["text"] for t in fx.make_transcripts(ont, cfg, n_conv=20, seed=3)]
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    d = build_concept_dictionary(concepts, synonyms, cfg)
    tdf = transcripts_df(spark, turns(*texts))
    a = {tuple(r) for r in extract_mentions(tdf, d, cfg, strategy="regex").collect()}
    b = {tuple(r) for r in extract_mentions(tdf, d, cfg, strategy="ahocorasick").collect()}
    c = {tuple(r) for r in extract_mentions(tdf, d, cfg, strategy="trieregex").collect()}
    assert a == b == c and a


def test_trie_pattern_language():
    """The trie-factored pattern matches exactly the flat alternation's
    language, including prefix-nested same-layer terms and regex
    metacharacters in terms."""
    import re

    from fhir_owl_spark.operators.mentions import _trie_pattern

    terms = ["scan", "scanner", "scans", "s.c", "a-b", "a-bc", "x", "xy z"]
    pat = re.compile("^(?:" + _trie_pattern(terms) + ")$")
    for t in terms:
        assert pat.match(t), t
    for bad in ["sca", "scann", "s c", "ab", "a-", "xy", "xy  z", ""]:
        assert not pat.match(bad), bad


def test_layering():
    layers = _layer_terms(["data", "data object", "data object model", "scan"])
    assert layers[0] == ["data object model", "scan"]
    assert layers[1] == ["data object"]
    assert layers[2] == ["data"]
    # word-prefix only when a boundary follows: 'scan' vs 'scanner' coexist
    assert _layer_terms(["scan", "scanner"]) == [["scanner", "scan"]]


def test_ahocorasick_overlaps():
    ac = AhoCorasick(["data", "data object", "object"])
    counts = ac.find_counts("a data object here")
    assert counts == {0: 1, 1: 1, 2: 1}
    assert ac.find_counts("database") == {}


def test_pairs_only_equals_distinct_pairs(spark):
    """pairs_only batch-dedup path must equal distinct (code, conv_id)
    of the full mention output."""
    from fhir_owl_spark import fixtures as fx
    from fhir_owl_spark.operators.mentions import extract_mention_pairs

    ont, cfg = fx.pizza_fixture()
    texts = [t["text"] for t in fx.make_transcripts(ont, cfg, n_conv=15, seed=4)]
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    d = build_concept_dictionary(concepts, synonyms, cfg)
    tdf = transcripts_df(spark, turns(*texts))
    full = extract_mentions(tdf, d, cfg)
    a = {(r["code"], r["conv_id"]) for r in full.select("code", "conv_id").distinct().collect()}
    b = {tuple(r) for r in extract_mention_pairs(tdf, d, cfg).distinct().collect()}
    assert a == b and a

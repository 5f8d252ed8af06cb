"""Incremental release refresh (plans/refresh.py): the refreshed graph
must equal the full v2 build EXACTLY while re-extracting mentions only
for the term-changed delta."""

from __future__ import annotations

import copy

import pytest

from fhir_owl_spark import fixtures as fx
from fhir_owl_spark.operators.dictionary import build_concept_dictionary
from fhir_owl_spark.plans.build_graph import build_graph
from fhir_owl_spark.plans.refresh import affected_codes, refresh_graph


@pytest.fixture(scope="module")
def v1_world(spark):
    ont, cfg = fx.pizza_fixture()
    turns = fx.make_transcripts(ont, cfg, n_conv=30, seed=42)
    tdf = fx.transcripts_df(spark, turns).localCheckpoint(eager=True)
    c1, e1, s1 = fx.ontology_dfs(spark, ont)
    v1 = build_graph(spark, c1, e1, s1, tdf, cfg).localCheckpoint(eager=True)
    return ont, cfg, tdf, v1


def _rows(df):
    return sorted(tuple(r) for r in df.select("subj", "pred", "obj", "obj_type").collect())


def test_refresh_equals_full_v2_build(spark, v1_world):
    """Relabel + new synonym + dropped concept + new concept: the
    refreshed triples are byte-identical to the from-scratch v2 build,
    and the mention re-extraction delta is a handful of codes."""
    ont, cfg, tdf, v1 = v1_world
    ont2 = copy.deepcopy(ont)
    lbl = next(c for c in ont2.concepts if c["label"])
    lbl["label"] = lbl["label"] + " renamed"
    ont2.synonym(ont2.concepts[2]["iri"], "brand new synonym")
    dropped = ont2.concepts.pop()
    ont2.edges = [
        e for e in ont2.edges if dropped["iri"] not in (e["child_iri"], e["parent_iri"])
    ]
    ont2.synonyms = [s for s in ont2.synonyms if s["iri"] != dropped["iri"]]
    newc = ont2.concept(
        "http://example.org/pizza#BrandNewThing", "main", label="margherita"
    )
    ont2.edge(newc, ont2.concepts[0]["iri"])

    c2, e2, s2 = fx.ontology_dfs(spark, ont2)
    assert _rows(refresh_graph(spark, v1, c2, e2, s2, tdf, cfg)) == _rows(
        build_graph(spark, c2, e2, s2, tdf, cfg)
    )
    d2 = build_concept_dictionary(c2, s2, cfg)
    aff = {r.code for r in affected_codes(v1, d2).collect()}
    n_emitted = d2.count()
    # the delta is a strict fraction of the dictionary — the incremental
    # claim (unchanged-term concepts never re-scan the corpus)
    assert 0 < len(aff) < n_emitted


def test_refresh_identity_when_unchanged(spark, v1_world):
    """v2 == v1: the refresh is the old graph, and the delta is empty —
    the corpus-scale mention pass has NOTHING to extract."""
    ont, cfg, tdf, v1 = v1_world
    c2, e2, s2 = fx.ontology_dfs(spark, ont)
    assert _rows(refresh_graph(spark, v1, c2, e2, s2, tdf, cfg)) == _rows(v1)
    d2 = build_concept_dictionary(c2, s2, cfg)
    assert affected_codes(v1, d2).count() == 0


def test_refresh_hierarchy_only_change(spark, v1_world):
    """An is-a edge change with NO term changes: ontology-side triples
    update, every mention carries over (empty delta), and the result
    still equals the full rebuild."""
    ont, cfg, tdf, v1 = v1_world
    ont2 = copy.deepcopy(ont)
    # drop one non-structural edge (keep DAG): remove the last edge
    removed = ont2.edges.pop()
    c2, e2, s2 = fx.ontology_dfs(spark, ont2)
    assert _rows(refresh_graph(spark, v1, c2, e2, s2, tdf, cfg)) == _rows(
        build_graph(spark, c2, e2, s2, tdf, cfg)
    )
    d2 = build_concept_dictionary(c2, s2, cfg)
    assert affected_codes(v1, d2).count() == 0


def test_refresh_rejects_unmaintainable_families(spark, v1_world):
    """v1 output carrying related-to (corpus-global PMI) must be
    refused, not silently dropped."""
    ont, cfg, tdf, v1 = v1_world
    from pyspark.sql import functions as F

    tainted = v1.unionByName(
        v1.limit(1).select(
            F.lit("A").alias("subj"), F.lit("related-to").alias("pred"),
            F.lit("B").alias("obj"), F.lit("concept").alias("obj_type"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit("x").alias("key_hash"),
        )
    )
    c2, e2, s2 = fx.ontology_dfs(spark, ont)
    with pytest.raises(ValueError, match="related-to"):
        refresh_graph(spark, tainted, c2, e2, s2, tdf, cfg)


def test_refresh_exposes_delta_count(spark, v1_world):
    ont, cfg, tdf, v1 = v1_world
    c2, e2, s2 = fx.ontology_dfs(spark, ont)
    out = refresh_graph(spark, v1, c2, e2, s2, tdf, cfg)
    assert out._refresh_delta_codes == 0


def test_refresh_deprecation_flip_include_deprecated(spark):
    """include_deprecated=True + link_deprecated=False: a v1→v2
    deprecation flip with UNCHANGED terms must still enter the delta
    (linkability depends on the flag, not just the term set) — the
    refresh must equal the full rebuild in both flip directions
    (round-5 ADVICE item)."""
    import dataclasses

    ont, cfg = fx.pizza_fixture()
    cfg = dataclasses.replace(cfg, include_deprecated=True, link_deprecated=False)
    turns = fx.make_transcripts(ont, cfg, n_conv=30, seed=7)
    tdf = fx.transcripts_df(spark, turns).localCheckpoint(eager=True)
    c1, e1, s1 = fx.ontology_dfs(spark, ont)
    v1 = build_graph(spark, c1, e1, s1, tdf, cfg).localCheckpoint(eager=True)

    # flip a mentioned, previously-active concept to deprecated (terms
    # unchanged) and un-deprecate one previously-deprecated concept
    ont2 = copy.deepcopy(ont)
    active = next(c for c in ont2.concepts if not c["deprecated"] and c["label"])
    active["deprecated"] = True
    dep = next((c for c in ont2.concepts if c["deprecated"] and c["label"]), None)
    if dep is not None and dep is not active:
        dep["deprecated"] = False

    c2, e2, s2 = fx.ontology_dfs(spark, ont2)
    d2 = build_concept_dictionary(c2, s2, cfg)
    aff = {r.code for r in affected_codes(v1, d2).collect()}
    assert aff, "deprecation flip with unchanged terms must enter the delta"
    assert _rows(refresh_graph(spark, v1, c2, e2, s2, tdf, cfg)) == _rows(
        build_graph(spark, c2, e2, s2, tdf, cfg)
    )

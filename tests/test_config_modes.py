"""Config modes not exercised by the main fixtures: prefix-based main
namespaces (isImported mode 1, FhirOwlService.java:786-793), annotation
codes (-c option, getCode FhirOwlService.java:695-704) with the
parent-code asymmetry, and mention stop terms."""

from __future__ import annotations

import datetime as dt

from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.fixtures import (
    Ontology,
    model_build_graph,
    ontology_dfs,
    transcripts_df,
)
from fhir_owl_spark.plans.build_graph import build_graph
from fhir_owl_spark.schemas import OWL_THING


def run(spark, ont, cfg, turns=()):
    concepts, edges, synonyms = ontology_dfs(spark, ont)
    tdf = transcripts_df(spark, list(turns))
    out = build_graph(spark, concepts, edges, synonyms, tdf, cfg)
    return {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}


def mini_ontology():
    o = Ontology()
    o.concept(OWL_THING, "main")
    o.concept("http://main.org/onto#Alpha_1", "main", label="alpha one")
    o.concept("http://other.org/ext#Beta_2", "ext", label="beta two")
    o.edge("http://main.org/onto#Alpha_1", "http://other.org/ext#Beta_2")
    o.edge("http://other.org/ext#Beta_2", OWL_THING)
    o.synonym("http://main.org/onto#Alpha_1", "alpha one", prop="label")
    o.synonym("http://main.org/onto#Alpha_1", "A-001", prop="id")
    o.synonym("http://other.org/ext#Beta_2", "B-002", prop="id")
    return o


class TestMainNamespacePrefixMode:
    def test_prefix_mode(self, spark):
        """-mainNs: everything outside the prefix is imported → full-IRI
        code; codeReplace applies to local codes only."""
        ont = mini_ontology()
        cfg = PipelineConfig(
            main_namespaces=("http://main.org/",),
            code_replace=("_", "-"),
            has_imports=True,
        )
        got = run(spark, ont, cfg)
        assert got == model_build_graph(ont, [], cfg)
        subjects = {s for s, _, _ in got}
        assert "Alpha-1" in subjects  # local: shortform + replace
        assert "http://other.org/ext#Beta_2" in subjects  # imported: raw IRI
        # parent code: imported parent keeps full IRI, replace NOT applied
        assert ("Alpha-1", "is-a", "http://other.org/ext#Beta_2") in got
        # Thing is outside the main prefix → imported → special display
        assert ("http://www.w3.org/2002/07/owl#Thing", "has-display", "Thing") in got


class TestAnnotationCodes:
    def test_code_prop_with_parent_asymmetry(self, spark):
        """-c: concept codes come from the annotation; PARENT codes never
        do (FhirOwlService.java:637-647 vs :834-841)."""
        ont = mini_ontology()
        cfg = PipelineConfig(code_prop="id", has_imports=False)
        got = run(spark, ont, cfg)
        assert got == model_build_graph(ont, [], cfg)
        subjects = {s for s, _, _ in got}
        assert "A-001" in subjects and "B-002" in subjects
        # the is-a edge uses the parent's IRI-derived code, not B-002
        assert ("A-001", "is-a", "Beta_2") in got
        assert not any(o == "B-002" for _, p, o in got if p == "is-a")


class TestLinkStopTerms:
    def test_stop_terms_do_not_link(self, spark):
        ont = mini_ontology()
        cfg = PipelineConfig(
            has_imports=False, link_stop_terms=("alpha one",)
        )
        turns = [
            dict(conv_id="c0", turn_idx=0, role="user",
                 text="alpha one and beta two here", tool=None,
                 ts=dt.datetime(2026, 1, 1)),
        ]
        got = run(spark, ont, cfg, turns)
        assert got == model_build_graph(ont, turns, cfg)
        mentions = {(s, o) for s, p, o in got if p == "mentions-in"}
        assert ("Beta_2", "c0") in mentions
        assert not any(s == "Alpha_1" for s, _ in mentions)

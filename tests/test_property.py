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

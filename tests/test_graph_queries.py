"""Terminology-style queries over the emitted graph — the operations a
reference user runs against the CodeSystem today."""

from __future__ import annotations

import pytest

from fhir_owl_spark import fixtures as fx
from fhir_owl_spark.plans import graph_queries as gq
from fhir_owl_spark.plans.build_graph import build_graph


@pytest.fixture(scope="module")
def graph(spark):
    ont, cfg = fx.pizza_fixture()
    turns = fx.make_transcripts(ont, cfg, n_conv=20, seed=42)
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    tdf = fx.transcripts_df(spark, turns)
    return build_graph(spark, concepts, edges, synonyms, tdf, cfg).localCheckpoint()


def test_lookup(graph):
    c = gq.lookup(graph, "CheeseTopping")
    assert c["display"] == "Cheese Topping"
    assert c["synonyms"] == ["Mozzarella Topping", "queso"]
    assert c["parents"] == ["PizzaTopping"]
    assert c["deprecated"] is False and c["root"] is False


def test_navigation(graph):
    assert {r["code"] for r in gq.parents_of(graph, "CheesyPizza").collect()} == {
        "Pizza", "CheesyFood"
    }
    assert "PizzaTopping" in {r["code"] for r in gq.children_of(graph, "Food").collect()}


def test_ancestors_and_descendants(graph):
    anc = {
        r["ancestor"]
        for r in gq.ancestors(graph).filter("code = 'PrawnsTopping'").collect()
    }
    assert anc == {"FishTopping", "PizzaTopping", "Food", "DomainConcept", "Thing"}
    desc = {r["code"] for r in gq.descendants_of(graph, "Food").collect()}
    assert {"PizzaTopping", "FishTopping", "PrawnsTopping", "Pizza", "CheesyPizza"} <= desc
    assert "Thing" not in desc


def test_subsumes(graph):
    assert gq.subsumes(graph, "Food", "PrawnsTopping")
    assert not gq.subsumes(graph, "PrawnsTopping", "Food")


def test_conversations_mentioning(graph):
    direct = {r["conv_id"] for r in gq.conversations_mentioning(graph, "PizzaTopping").collect()}
    widened = {
        r["conv_id"]
        for r in gq.conversations_mentioning(graph, "PizzaTopping", include_descendants=True).collect()
    }
    cheese = {r["conv_id"] for r in gq.conversations_mentioning(graph, "CheeseTopping").collect()}
    assert direct <= widened
    assert cheese <= widened  # CheeseTopping is a descendant of PizzaTopping
    assert widened


def test_reachable_set_depth_guard_raises(spark):
    """A chain deeper than max_iterations must raise, not silently return
    a truncated set (false-negative subsumes otherwise)."""
    import pytest

    from fhir_owl_spark.operators.hierarchy import (
        HierarchyCycleError,
        reachable_set,
    )

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(10)], ["child", "parent"]
    )
    with pytest.raises(HierarchyCycleError, match="max_iterations"):
        reachable_set(edges, ["n0"], max_iterations=3).collect()
    # deep enough → full set
    got = {r["node"] for r in reachable_set(edges, ["n0"], max_iterations=16).collect()}
    assert got == {f"n{i}" for i in range(1, 11)}


def test_closure_delta_matches_full_closure(graph):
    """$closure delta for a registration batch must equal the all-pairs
    closure filtered to pairs involving the batch — including the pair
    BETWEEN two new codes (found by both BFS directions, deduped)."""
    new = ["CheeseTopping", "PizzaTopping"]  # PizzaTopping is an ancestor
    delta = {
        (r["code"], r["ancestor"]) for r in gq.closure_delta(graph, new).collect()
    }
    full = {
        (r["code"], r["ancestor"])
        for r in gq.ancestors(graph).collect()
        if r["code"] in new or r["ancestor"] in new
    }
    assert delta == full
    assert ("CheeseTopping", "PizzaTopping") in delta  # both-new pair, once

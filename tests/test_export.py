"""FHIR-shaped CodeSystem export parity: structure mirrors the reference's
emitted JSON (MetadataDefaultsTest / FhirOwlServiceTest assertions)."""

from __future__ import annotations

import json

from fhir_owl_spark import fixtures as fx
from fhir_owl_spark.config import DUO_CONFIG
from fhir_owl_spark.plans.export import export_codesystem, write_codesystem_json
from fhir_owl_spark.sources.owl_xml import (
    RDFS_LABEL,
    ontology_metadata,
    parse_owl_xml,
)


def concept_of(cs, code):
    matches = [c for c in cs["concept"] if c["code"] == code]
    assert len(matches) <= 1, f"duplicate code {code}"  # getConcept duplicate guard
    return matches[0] if matches else None


def parents(cdc):
    return {p["valueCode"] for p in cdc["property"] if p["code"] == "parent"}


def prop(cdc, code):
    return next(p for p in cdc["property"] if p["code"] == code)


def test_pizza_fixture_export(spark):
    ont, cfg = fx.pizza_fixture()
    concepts, edges, synonyms = fx.ontology_dfs(spark, ont)
    cs = export_codesystem(spark, concepts, edges, synonyms, cfg)

    assert cs["resourceType"] == "CodeSystem"
    assert cs["hierarchyMeaning"] == "is-a"
    assert cs["count"] == len(cs["concept"])
    assert concept_of(cs, "IceCream") is None
    prawns = concept_of(cs, "PrawnsTopping")
    assert parents(prawns) == {"FishTopping"}
    thing = concept_of(cs, "Thing")
    assert prop(thing, "root")["valueBoolean"] is True
    assert not parents(thing)
    cheese = concept_of(cs, "CheeseTopping")
    assert cheese["display"] == "Cheese Topping"
    assert {d["value"] for d in cheese["designation"]} == {
        "Mozzarella Topping", "queso"
    }
    assert all(
        d["use"]["code"] == "900000000000013009" for d in cheese["designation"]
    )


def test_real_duo_export_with_metadata(spark, tmp_path):
    parsed = parse_owl_xml(
        "/root/reference/src/test/resources/duo.owl", include_object_properties=False
    )
    import dataclasses

    cfg = dataclasses.replace(
        DUO_CONFIG,
        display_prop=RDFS_LABEL,
        synonym_props=(RDFS_LABEL,),
        has_imports=parsed.has_imports,
        code_replace=None,
    )
    concepts, edges, synonyms = fx.ontology_dfs(spark, parsed.tables)
    meta = ontology_metadata(parsed, cfg)
    cs = export_codesystem(spark, concepts, edges, synonyms, cfg, metadata=meta)

    # MetadataFromInput-style assertions (FhirOwlServiceTest.java:152-154)
    assert cs["url"] == "http://purl.obolibrary.org/obo/duo.fhir"
    assert cs["valueSet"] == "http://purl.obolibrary.org/obo/duo.fhir?vs"
    assert cs["version"] == "20210223"
    ds = concept_of(cs, "DUO_0000007")
    assert parents(ds) == {"DUO_0000006"}
    assert ds["display"] == "disease specific research"

    # round-trips through JSON (OutputFileManager-style re-scan)
    path = str(tmp_path / "duo.json")
    write_codesystem_json(cs, path)
    back = json.load(open(path))
    assert back == cs

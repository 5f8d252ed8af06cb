"""OWL/XML (.owx) reader: entity resolution (IRI=#local and
abbreviatedIRI forms), declaration/subsumption/equivalence/annotation
subset, and end-to-end parity — the pizza chain rendered as OWL/XML
reproduces the reference-shaped assertions through the full engine."""

from __future__ import annotations

import pytest

from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.sources.owl_xml import RDFS_LABEL
from fhir_owl_spark.sources.owlxml_fmt import parse_owlxml
from fhir_owl_spark.sources.turtle import parse_ontology_document

NS = "http://example.org/oxpizza.owl#"

PIZZA_OWX = """<?xml version="1.0"?>
<Ontology xmlns="http://www.w3.org/2002/07/owl#"
     ontologyIRI="http://example.org/oxpizza.owl"
     versionIRI="http://example.org/oxpizza.owl/2.0">
    <Prefix name="" IRI="http://example.org/oxpizza.owl#"/>
    <Prefix name="rdfs" IRI="http://www.w3.org/2000/01/rdf-schema#"/>
    <Prefix name="owl" IRI="http://www.w3.org/2002/07/owl#"/>
    <Import>http://ex/other</Import>
    <Annotation>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <Literal>owlxml pizza ontology</Literal>
    </Annotation>
    <Declaration><Class IRI="#DomainConcept"/></Declaration>
    <Declaration><Class IRI="#Food"/></Declaration>
    <Declaration><Class IRI="#PizzaTopping"/></Declaration>
    <Declaration><Class IRI="#FishTopping"/></Declaration>
    <Declaration><Class IRI="#PrawnsTopping"/></Declaration>
    <Declaration><Class IRI="#CheeseTopping"/></Declaration>
    <Declaration><Class IRI="#OldTopping"/></Declaration>
    <Declaration><Class IRI="#EqA"/></Declaration>
    <Declaration><Class IRI="#EqB"/></Declaration>
    <Declaration><Class IRI="#Anon"/></Declaration>
    <Declaration><ObjectProperty IRI="#hasTopping"/></Declaration>
    <Declaration><ObjectProperty IRI="#hasSpicyTopping"/></Declaration>
    <SubClassOf><Class IRI="#Food"/><Class IRI="#DomainConcept"/></SubClassOf>
    <SubClassOf><Class IRI="#PizzaTopping"/><Class IRI="#Food"/></SubClassOf>
    <SubClassOf><Class IRI="#FishTopping"/><Class IRI="#PizzaTopping"/></SubClassOf>
    <SubClassOf><Class IRI="#PrawnsTopping"/><Class IRI="#FishTopping"/></SubClassOf>
    <SubClassOf><Class IRI="#PrawnsTopping"/><Class IRI="#PizzaTopping"/></SubClassOf>
    <SubClassOf><Class IRI="#OldTopping"/><Class IRI="#PizzaTopping"/></SubClassOf>
    <SubClassOf>
        <Class IRI="#Anon"/>
        <ObjectSomeValuesFrom>
            <ObjectProperty IRI="#hasTopping"/>
            <Class IRI="#FishTopping"/>
        </ObjectSomeValuesFrom>
    </SubClassOf>
    <SubObjectPropertyOf>
        <ObjectProperty IRI="#hasSpicyTopping"/>
        <ObjectProperty IRI="#hasTopping"/>
    </SubObjectPropertyOf>
    <EquivalentClasses><Class IRI="#EqA"/><Class IRI="#EqB"/></EquivalentClasses>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#DomainConcept</IRI><Literal>Domain Concept</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#Food</IRI><Literal>Food</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#PizzaTopping</IRI><Literal>Pizza Topping</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#FishTopping</IRI><Literal>Fish Topping</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#PrawnsTopping</IRI><Literal>Prawns Topping</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#CheeseTopping</IRI><Literal>Mozzarella Topping</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#CheeseTopping</IRI><Literal>Cheese Topping</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:comment"/>
        <IRI>#CheeseTopping</IRI><Literal xml:lang="en">a comment</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="rdfs:label"/>
        <IRI>#OldTopping</IRI><Literal>Old Topping</Literal>
    </AnnotationAssertion>
    <AnnotationAssertion>
        <AnnotationProperty abbreviatedIRI="owl:deprecated"/>
        <IRI>#OldTopping</IRI>
        <Literal datatypeIRI="http://www.w3.org/2001/XMLSchema#boolean">true</Literal>
    </AnnotationAssertion>
</Ontology>
"""


@pytest.fixture(scope="module")
def owx_path(tmp_path_factory):
    f = tmp_path_factory.mktemp("owx") / "pizza.owx"
    f.write_text(PIZZA_OWX)
    return str(f)


class TestOwlXmlReader:
    @pytest.fixture(scope="class")
    def parsed(self, owx_path):
        return parse_owlxml(owx_path)

    def test_metadata(self, parsed):
        assert parsed.ontology_iri == "http://example.org/oxpizza.owl"
        assert parsed.version_iri == "http://example.org/oxpizza.owl/2.0"
        assert parsed.has_imports is True
        assert parsed.imports == ["http://ex/other"]
        assert (RDFS_LABEL, "owlxml pizza ontology") in parsed.annotations

    def test_concepts_and_labels(self, parsed):
        by = {c["iri"]: c for c in parsed.tables.concepts}
        assert by[NS + "CheeseTopping"]["label"] == "Cheese Topping"
        assert by[NS + "OldTopping"]["deprecated"] is True
        assert by[NS + "Food"]["deprecated"] is False

    def test_edges(self, parsed):
        edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
        for c, p in [("PrawnsTopping", "FishTopping"),
                     ("FishTopping", "PizzaTopping"),
                     ("PizzaTopping", "Food"),
                     ("Food", "DomainConcept")]:
            assert (NS + c, NS + p) in edges
        assert (NS + "EqA", NS + "EqB") in edges
        assert (NS + "EqB", NS + "EqA") in edges
        assert (NS + "hasSpicyTopping", NS + "hasTopping") in edges
        assert (NS + "hasTopping",
                "http://www.w3.org/2002/07/owl#topObjectProperty") in edges
        # anonymous restriction operand → axiom skipped atomically
        assert not any(c == NS + "Anon" for c, _ in edges)

    def test_synonyms_keyed_by_property_iri(self, parsed):
        syns = {(s["iri"], s["synonym"], s["prop"]) for s in parsed.tables.synonyms}
        assert (NS + "CheeseTopping", "a comment",
                "http://www.w3.org/2000/01/rdf-schema#comment") in syns
        assert (NS + "CheeseTopping", "Mozzarella Topping", RDFS_LABEL) in syns

    def test_dispatcher_routes_owlxml(self, owx_path):
        p = parse_ontology_document(owx_path, classify_defined=True)
        assert p.ontology_iri == "http://example.org/oxpizza.owl"


class TestOwxEngineParity:
    @pytest.fixture(scope="class")
    def triples(self, spark, owx_path):
        from fhir_owl_spark.fixtures import ontology_dfs
        from fhir_owl_spark.plans.build_graph import build_graph
        from fhir_owl_spark.schemas import TRANSCRIPTS

        parsed = parse_owlxml(owx_path)
        cfg = PipelineConfig(
            display_prop=RDFS_LABEL,
            synonym_props=(RDFS_LABEL,),
            has_imports=parsed.has_imports,
        )
        concepts, edges, synonyms = ontology_dfs(spark, parsed.tables)
        empty = spark.createDataFrame([], TRANSCRIPTS)
        out = build_graph(spark, concepts, edges, synonyms, empty, cfg)
        return {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}

    def test_chain_and_reduction(self, triples):
        for child, parent in [("PrawnsTopping", "FishTopping"),
                              ("FishTopping", "PizzaTopping"),
                              ("PizzaTopping", "Food"),
                              ("Food", "DomainConcept")]:
            assert (child, "is-a", parent) in triples, (child, parent)
        assert ("PrawnsTopping", "is-a", "PizzaTopping") not in triples

    def test_deprecated_absent(self, triples):
        assert all(s != "OldTopping" for s, _, _ in triples)

    def test_min_label_display(self, triples):
        assert ("CheeseTopping", "has-display", "Cheese Topping") in triples

"""OWL 2 Functional Syntax reader: prefix resolution, declaration /
subsumption / equivalence / annotation subset, and end-to-end parity —
the pizza chain rendered as FS must reproduce the reference's pizza.owl
assertions through the full engine (FhirOwlServiceTest.java:97-101:
Prawns→Fish→PizzaTopping→Food→DomainConcept chain, redundant-edge
reduction, deprecated drop, min-label competition)."""

from __future__ import annotations

import pytest

from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.sources.functional import parse_functional
from fhir_owl_spark.sources.owl_xml import RDFS_LABEL
from fhir_owl_spark.sources.turtle import parse_ontology_document

NS = "http://example.org/fspizza.owl#"

PIZZA_FS = """Prefix(:=<http://example.org/fspizza.owl#>)
Prefix(owl:=<http://www.w3.org/2002/07/owl#>)
Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)
Prefix(xsd:=<http://www.w3.org/2001/XMLSchema#>)
Ontology(<http://example.org/fspizza.owl> <http://example.org/fspizza.owl/2.0>
Import(<http://ex/other>)
Annotation(rdfs:label "fs pizza ontology")

Declaration(Class(:DomainConcept))
Declaration(Class(:Food))
Declaration(Class(:PizzaTopping))
Declaration(Class(:FishTopping))
Declaration(Class(:PrawnsTopping))
Declaration(Class(:CheeseTopping))
Declaration(Class(:OldTopping))
Declaration(Class(:EqA))
Declaration(Class(:EqB))
Declaration(Class(:Anon))
Declaration(ObjectProperty(:hasTopping))
Declaration(ObjectProperty(:hasSpicyTopping))

SubClassOf(:Food :DomainConcept)
SubClassOf(:PizzaTopping :Food)
SubClassOf(:FishTopping :PizzaTopping)
SubClassOf(:PrawnsTopping :FishTopping)
SubClassOf(:PrawnsTopping :PizzaTopping)
SubClassOf(:OldTopping :PizzaTopping)
SubClassOf(:Anon ObjectSomeValuesFrom(:hasTopping :FishTopping))
SubObjectPropertyOf(:hasSpicyTopping :hasTopping)
EquivalentClasses(:EqA :EqB)

AnnotationAssertion(rdfs:label :DomainConcept "Domain Concept")
AnnotationAssertion(rdfs:label :Food "Food")
AnnotationAssertion(rdfs:label :PizzaTopping "Pizza Topping")
AnnotationAssertion(rdfs:label :FishTopping "Fish Topping")
AnnotationAssertion(rdfs:label :PrawnsTopping "Prawns Topping")
AnnotationAssertion(rdfs:label :CheeseTopping "Mozzarella Topping")
AnnotationAssertion(rdfs:label :CheeseTopping "Cheese Topping")
AnnotationAssertion(rdfs:comment :CheeseTopping "a comment"@en)
AnnotationAssertion(rdfs:label :OldTopping "Old Topping")
AnnotationAssertion(owl:deprecated :OldTopping "true"^^xsd:boolean)
)
"""


@pytest.fixture(scope="module")
def fs_path(tmp_path_factory):
    f = tmp_path_factory.mktemp("fs") / "pizza.ofn"
    f.write_text(PIZZA_FS)
    return str(f)


class TestFunctionalReader:
    @pytest.fixture(scope="class")
    def parsed(self, fs_path):
        return parse_functional(fs_path)

    def test_metadata(self, parsed):
        assert parsed.ontology_iri == "http://example.org/fspizza.owl"
        assert parsed.version_iri == "http://example.org/fspizza.owl/2.0"
        assert parsed.has_imports is True
        assert parsed.imports == ["http://ex/other"]
        assert ("http://www.w3.org/2000/01/rdf-schema#label",
                "fs pizza ontology") in parsed.annotations

    def test_concepts_and_labels(self, parsed):
        by = {c["iri"]: c for c in parsed.tables.concepts}
        # min-literal label competition, same as the other readers
        assert by[NS + "CheeseTopping"]["label"] == "Cheese Topping"
        assert by[NS + "OldTopping"]["deprecated"] is True
        assert by[NS + "Food"]["deprecated"] is False

    def test_edges(self, parsed):
        edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
        for c, p in [("PrawnsTopping", "FishTopping"),
                     ("FishTopping", "PizzaTopping"),
                     ("PizzaTopping", "Food"),
                     ("Food", "DomainConcept"),
                     ("PrawnsTopping", "PizzaTopping")]:  # redundant, kept raw
            assert (NS + c, NS + p) in edges
        # named equivalence ⟺ mutual edges
        assert (NS + "EqA", NS + "EqB") in edges
        assert (NS + "EqB", NS + "EqA") in edges
        # property hierarchy + top rooting
        assert (NS + "hasSpicyTopping", NS + "hasTopping") in edges
        assert (NS + "hasTopping",
                "http://www.w3.org/2002/07/owl#topObjectProperty") in edges
        # anonymous restriction body contributes no edge
        assert not any(c == NS + "Anon" for c, _ in edges)

    def test_synonyms_keyed_by_property_iri(self, parsed):
        syns = {(s["iri"], s["synonym"], s["prop"]) for s in parsed.tables.synonyms}
        assert (NS + "CheeseTopping", "a comment",
                "http://www.w3.org/2000/01/rdf-schema#comment") in syns
        assert (NS + "CheeseTopping", "Mozzarella Topping", RDFS_LABEL) in syns

    def test_dispatcher_routes_functional(self, fs_path):
        p = parse_ontology_document(fs_path, classify_defined=True)
        assert p.ontology_iri == "http://example.org/fspizza.owl"


class TestFsEngineParity:
    """The FS pizza chain through the FULL engine reproduces the
    reference-shaped assertions: is-a chain with the redundant
    Prawns→PizzaTopping edge removed by transitive reduction
    (GraphUtils.java:160-175), deprecated dropped, min-label display."""

    @pytest.fixture(scope="class")
    def triples(self, spark, fs_path):
        from fhir_owl_spark.fixtures import ontology_dfs
        from fhir_owl_spark.plans.build_graph import build_graph
        from fhir_owl_spark.schemas import TRANSCRIPTS

        parsed = parse_functional(fs_path)
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
        # redundant direct edge removed by transitive reduction
        assert ("PrawnsTopping", "is-a", "PizzaTopping") not in triples

    def test_deprecated_absent(self, triples):
        assert all(s != "OldTopping" for s, _, _ in triples)

    def test_min_label_display(self, triples):
        assert ("CheeseTopping", "has-display", "Cheese Topping") in triples


def test_annotated_axioms_keep_their_edges(tmp_path):
    """r5 self-review: SubClassOf/EquivalentClasses carrying axiom
    ANNOTATIONS must still contribute their edges (OWL-API exports of
    OBO-derived ontologies annotate most SubClassOf axioms)."""
    f = tmp_path / "ann.ofn"
    f.write_text(
        "Prefix(:=<http://a#>)\n"
        "Prefix(oio:=<http://www.geneontology.org/formats/oboInOwl#>)\n"
        "Ontology(<http://a>\n"
        "Declaration(Class(:A))\nDeclaration(Class(:B))\n"
        "Declaration(Class(:C))\nDeclaration(Class(:D))\n"
        'SubClassOf(Annotation(oio:source "xyz") :A :B)\n'
        'EquivalentClasses(Annotation(oio:source "w") :C :D)\n'
        ")\n"
    )
    parsed = parse_functional(str(f))
    edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
             for e in parsed.tables.edges}
    assert ("A", "B") in edges
    assert ("C", "D") in edges and ("D", "C") in edges


def test_annotated_annotation_assertions_keep_content(tmp_path):
    """r5 self-review round 2: AnnotationAssertion carrying its own axiom
    annotations (OWL-API writes hasDbXref on nearly every OBO-derived
    synonym assertion) must still yield the label/synonym/deprecated."""
    f = tmp_path / "aa.ofn"
    f.write_text(
        "Prefix(:=<http://a#>)\n"
        "Prefix(owl:=<http://www.w3.org/2002/07/owl#>)\n"
        "Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)\n"
        "Prefix(oio:=<http://www.geneontology.org/formats/oboInOwl#>)\n"
        "Prefix(xsd:=<http://www.w3.org/2001/XMLSchema#>)\n"
        "Ontology(<http://a>\n"
        "Declaration(Class(:A))\nDeclaration(Class(:Old))\n"
        'AnnotationAssertion(Annotation(oio:hasDbXref "PMID:1") rdfs:label :A "the label")\n'
        'AnnotationAssertion(Annotation(oio:hasDbXref "PMID:2") oio:hasExactSynonym :A "syn")\n'
        'AnnotationAssertion(Annotation(oio:src "x") owl:deprecated :Old "true"^^xsd:boolean)\n'
        'Annotation(Annotation(oio:src "y") rdfs:label "onto label")\n'
        ")\n"
    )
    parsed = parse_functional(str(f))
    by = {c["iri"].split("#")[-1]: c for c in parsed.tables.concepts}
    assert by["A"]["label"] == "the label"
    assert by["Old"]["deprecated"] is True
    syns = {(s["iri"].split("#")[-1], s["synonym"]) for s in parsed.tables.synonyms}
    assert ("A", "syn") in syns
    assert ("http://www.w3.org/2000/01/rdf-schema#label",
            "onto label") in parsed.annotations

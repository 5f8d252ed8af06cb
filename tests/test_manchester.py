"""Manchester-syntax reader: frame/section parsing, expression-item
skipping, and end-to-end parity — the pizza chain rendered as Manchester
reproduces the reference-shaped assertions through the full engine. With
this reader every serialization the reference's OWL API auto-detects
parses (FhirOwlService.java:196-201)."""

from __future__ import annotations

import pytest

from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.sources.manchester import parse_manchester
from fhir_owl_spark.sources.owl_xml import RDFS_LABEL
from fhir_owl_spark.sources.turtle import parse_ontology_document

NS = "http://example.org/mnpizza.owl#"

PIZZA_OMN = """Prefix: : <http://example.org/mnpizza.owl#>
Prefix: rdfs: <http://www.w3.org/2000/01/rdf-schema#>
Prefix: owl: <http://www.w3.org/2002/07/owl#>
Prefix: xsd: <http://www.w3.org/2001/XMLSchema#>

Ontology: <http://example.org/mnpizza.owl> <http://example.org/mnpizza.owl/2.0>
    Import: <http://ex/other>
    Annotations:
        rdfs:label "manchester pizza ontology"

ObjectProperty: hasTopping

ObjectProperty: hasSpicyTopping
    SubPropertyOf: hasTopping

Class: DomainConcept
    Annotations: rdfs:label "Domain Concept"

Class: Food
    Annotations: rdfs:label "Food"
    SubClassOf: DomainConcept

Class: PizzaTopping
    Annotations: rdfs:label "Pizza Topping"
    SubClassOf: Food

Class: FishTopping
    Annotations: rdfs:label "Fish Topping"
    SubClassOf: PizzaTopping

Class: PrawnsTopping
    Annotations: rdfs:label "Prawns Topping"
    SubClassOf: FishTopping, PizzaTopping

Class: CheeseTopping
    Annotations:
        rdfs:label "Mozzarella Topping",
        rdfs:label "Cheese Topping",
        rdfs:comment "a comment"@en
    SubClassOf: PizzaTopping

Class: OldTopping
    Annotations:
        rdfs:label "Old Topping",
        owl:deprecated true
    SubClassOf: PizzaTopping

Class: EqA
    EquivalentTo: EqB

Class: EqB

Class: Anon
    SubClassOf: hasTopping some FishTopping
"""


@pytest.fixture(scope="module")
def omn_path(tmp_path_factory):
    f = tmp_path_factory.mktemp("omn") / "pizza.omn"
    f.write_text(PIZZA_OMN)
    return str(f)


class TestManchesterReader:
    @pytest.fixture(scope="class")
    def parsed(self, omn_path):
        return parse_manchester(omn_path)

    def test_metadata(self, parsed):
        assert parsed.ontology_iri == "http://example.org/mnpizza.owl"
        assert parsed.version_iri == "http://example.org/mnpizza.owl/2.0"
        assert parsed.has_imports is True
        assert parsed.imports == ["http://ex/other"]
        assert (RDFS_LABEL, "manchester pizza ontology") in parsed.annotations

    def test_concepts_and_labels(self, parsed):
        by = {c["iri"]: c for c in parsed.tables.concepts}
        assert by[NS + "CheeseTopping"]["label"] == "Cheese Topping"
        assert by[NS + "OldTopping"]["deprecated"] is True
        assert by[NS + "Food"]["deprecated"] is False

    def test_edges(self, parsed):
        edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
        for c, p in [("PrawnsTopping", "FishTopping"),
                     ("PrawnsTopping", "PizzaTopping"),  # comma list
                     ("FishTopping", "PizzaTopping"),
                     ("PizzaTopping", "Food"),
                     ("Food", "DomainConcept")]:
            assert (NS + c, NS + p) in edges
        assert (NS + "EqA", NS + "EqB") in edges
        assert (NS + "EqB", NS + "EqA") in edges
        assert (NS + "hasSpicyTopping", NS + "hasTopping") in edges
        assert (NS + "hasTopping",
                "http://www.w3.org/2002/07/owl#topObjectProperty") in edges
        # 'hasTopping some FishTopping' is a class expression → no edge
        assert not any(c == NS + "Anon" for c, _ in edges)

    def test_synonyms_keyed_by_property_iri(self, parsed):
        syns = {(s["iri"], s["synonym"], s["prop"]) for s in parsed.tables.synonyms}
        assert (NS + "CheeseTopping", "a comment",
                "http://www.w3.org/2000/01/rdf-schema#comment") in syns
        assert (NS + "CheeseTopping", "Mozzarella Topping", RDFS_LABEL) in syns

    def test_dispatcher_routes_manchester(self, omn_path):
        p = parse_ontology_document(omn_path, classify_defined=True)
        assert p.ontology_iri == "http://example.org/mnpizza.owl"


class TestManchesterEngineParity:
    @pytest.fixture(scope="class")
    def triples(self, spark, omn_path):
        from fhir_owl_spark.fixtures import ontology_dfs
        from fhir_owl_spark.plans.build_graph import build_graph
        from fhir_owl_spark.schemas import TRANSCRIPTS

        parsed = parse_manchester(omn_path)
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
        # redundant PrawnsTopping→PizzaTopping removed by reduction
        assert ("PrawnsTopping", "is-a", "PizzaTopping") not in triples

    def test_deprecated_absent(self, triples):
        assert all(s != "OldTopping" for s, _, _ in triples)

    def test_min_label_display(self, triples):
        assert ("CheeseTopping", "has-display", "Cheese Topping") in triples


def test_annotated_axiom_fillers_keep_their_edges(tmp_path):
    """r5 self-review: a SubClassOf/EquivalentTo section carrying an
    inline Annotations list must still yield the named-filler edges
    (Protégé writes per-axiom annotations this way)."""
    f = tmp_path / "ann.omn"
    f.write_text(
        "Prefix: : <http://a#>\n"
        "Prefix: rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n"
        "Ontology: <http://a>\n\n"
        "Class: B\n"
        "Class: D\n"
        "Class: A\n"
        '    SubClassOf: Annotations: rdfs:comment "why" B\n'
        "Class: C\n"
        '    EquivalentTo: Annotations: rdfs:comment "because" D\n'
        "Class: E\n"
        '    SubClassOf: Annotations: rdfs:comment "x", rdfs:comment "y" B, D\n'
    )
    parsed = parse_manchester(str(f))
    edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
             for e in parsed.tables.edges}
    assert ("A", "B") in edges
    assert ("C", "D") in edges and ("D", "C") in edges
    # multi-annotation list followed by a comma list of fillers
    assert ("E", "B") in edges and ("E", "D") in edges


def test_multiple_annotated_fillers_each_keep_edges(tmp_path):
    """r5 self-review round 2: EVERY filler in a comma list may carry its
    own Annotations prefix — all edges must survive, in both the inline
    and the Protégé nested multi-line layouts."""
    f = tmp_path / "ann2.omn"
    f.write_text(
        "Prefix: : <http://a#>\n"
        "Prefix: rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n"
        "Ontology: <http://a>\n\n"
        "Class: B\nClass: C\nClass: D\nClass: E\n"
        "Class: A\n"
        '    SubClassOf: Annotations: rdfs:comment "x" B, '
        'Annotations: rdfs:comment "y" C\n'
        "Class: F\n"
        "    Annotations: rdfs:label \"f label\"\n"
        "    SubClassOf: \n"
        "        Annotations: \n"
        '            rdfs:comment "p1"\n'
        "        D,\n"
        "        Annotations: \n"
        '            rdfs:comment "p2"\n'
        "        E\n"
    )
    parsed = parse_manchester(str(f))
    edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
             for e in parsed.tables.edges}
    assert ("A", "B") in edges and ("A", "C") in edges  # inline layout
    assert ("F", "D") in edges and ("F", "E") in edges  # Protégé layout
    by = {c["iri"].split("#")[-1]: c for c in parsed.tables.concepts}
    assert by["F"]["label"] == "f label"  # entity annotations unaffected

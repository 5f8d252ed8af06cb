"""OBO 1.2 reader: obo2owl id mapping, label/synonym/deprecation
semantics, and end-to-end parity — the duo chain rendered as OBO must
produce the SAME engine output as the reference's duo.owl assertions
(FhirOwlServiceTest.java:173-175), plus a mixed OBO+RDF/XML closure.
HPO/GO — the reference's marquee use case (README.md:98-104) — ship as
.obo first, so this is the serialization real users hit most."""

from __future__ import annotations

import pytest

from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.sources.obo import OBO_IN_OWL_NS, obo_id_to_iri, parse_obo
from fhir_owl_spark.sources.owl_xml import RDFS_LABEL, load_owl_closure
from fhir_owl_spark.sources.turtle import parse_ontology_document

DUO_OBO = """format-version: 1.2
ontology: duo
data-version: duo/releases/2021-02-23
remark: OBO rendering of the duo chain
import: http://purl.obolibrary.org/obo/iao.owl

[Term]
id: DUO:0000001
name: data use permission

[Term]
id: DUO:0000042
name: general research use
is_a: DUO:0000001 ! data use permission

[Term]
id: DUO:0000006
name: health or medical or biomedical research
is_a: DUO:0000042

[Term]
id: DUO:0000007
name: disease specific research
is_a: DUO:0000006
synonym: "disease-specific research" EXACT []
synonym: "DS" []
def: "A data use limitation." [PMID:1]
alt_id: DUO:9999991
comment: chain leaf

[Term]
id: DUO:0000002
name: obsoleted restriction
is_obsolete: true

[Term]
id: DUO:0000003
name: also obsolete
is_obsolete: true

[Typedef]
id: part_of
name: part of

[Typedef]
id: narrower_part
name: narrower part
is_a: part_of
"""

NS = "http://purl.obolibrary.org/obo/"


@pytest.fixture(scope="module")
def duo_obo_path(tmp_path_factory):
    f = tmp_path_factory.mktemp("obo") / "duo.obo"
    f.write_text(DUO_OBO)
    return str(f)


class TestIdMapping:
    def test_prefixed_and_unprefixed(self):
        assert obo_id_to_iri("HP:0000118", "hp") == NS + "HP_0000118"
        assert obo_id_to_iri("part_of", "go") == NS + "go#part_of"


class TestOboReader:
    @pytest.fixture(scope="class")
    def parsed(self, duo_obo_path):
        return parse_obo(duo_obo_path)

    def test_metadata(self, parsed):
        assert parsed.ontology_iri == NS + "duo.owl"
        assert parsed.version_iri == NS + "duo/releases/2021-02-23/duo.owl"
        assert parsed.has_imports is True
        assert parsed.imports == [NS + "iao.owl"]
        # remark maps to rdfs:comment like obo2owl
        assert ("http://www.w3.org/2000/01/rdf-schema#comment",
                "OBO rendering of the duo chain") in parsed.annotations

    def test_concepts(self, parsed):
        by = {c["iri"]: c for c in parsed.tables.concepts}
        assert by[NS + "DUO_0000007"]["label"] == "disease specific research"
        assert by[NS + "DUO_0000002"]["deprecated"] is True
        assert by[NS + "DUO_0000003"]["deprecated"] is True
        assert by[NS + "DUO_0000001"]["deprecated"] is False
        # Thing completed, imported because the header declares an import
        thing = by["http://www.w3.org/2002/07/owl#Thing"]
        assert thing["imported"] is True

    def test_edges(self, parsed):
        edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
        assert (NS + "DUO_0000007", NS + "DUO_0000006") in edges
        assert (NS + "DUO_0000006", NS + "DUO_0000042") in edges
        assert (NS + "DUO_0000042", NS + "DUO_0000001") in edges
        # typedef hierarchy: subPropertyOf edge + top rooting
        assert (NS + "duo#narrower_part", NS + "duo#part_of") in edges
        assert (NS + "duo#part_of",
                "http://www.w3.org/2002/07/owl#topObjectProperty") in edges

    def test_synonym_scopes(self, parsed):
        syns = {(s["iri"], s["synonym"], s["prop"]) for s in parsed.tables.synonyms}
        leaf = NS + "DUO_0000007"
        assert (leaf, "disease-specific research",
                OBO_IN_OWL_NS + "hasExactSynonym") in syns
        # omitted scope defaults to RELATED per the OBO 1.2 spec
        assert (leaf, "DS", OBO_IN_OWL_NS + "hasRelatedSynonym") in syns
        assert (leaf, "A data use limitation.", NS + "IAO_0000115") in syns
        assert (leaf, "chain leaf",
                "http://www.w3.org/2000/01/rdf-schema#comment") in syns
        assert (leaf, "DUO:9999991", OBO_IN_OWL_NS + "hasAlternativeId") in syns
        assert (leaf, "disease specific research", RDFS_LABEL) in syns

    def test_classes_only_mode_drops_typedefs(self, duo_obo_path):
        p = parse_obo(duo_obo_path, include_object_properties=False)
        iris = {c["iri"] for c in p.tables.concepts}
        assert NS + "duo#part_of" not in iris
        assert "http://www.w3.org/2002/07/owl#topObjectProperty" not in iris

    def test_dispatcher_routes_obo(self, duo_obo_path):
        p = parse_ontology_document(duo_obo_path, classify_defined=True)
        assert p.ontology_iri == NS + "duo.owl"


class TestOboEngineParity:
    """The duo chain from OBO through the FULL engine reproduces the
    reference's duo.owl assertions: is-a chain, deprecated dropped,
    display from the label (FhirOwlServiceTest.java:173-175)."""

    @pytest.fixture(scope="class")
    def triples(self, spark, duo_obo_path):
        from fhir_owl_spark.fixtures import ontology_dfs
        from fhir_owl_spark.plans.build_graph import build_graph
        from fhir_owl_spark.schemas import TRANSCRIPTS

        parsed = parse_obo(duo_obo_path, include_object_properties=False)
        cfg = PipelineConfig(
            display_prop=RDFS_LABEL,
            synonym_props=(RDFS_LABEL,),
            has_imports=parsed.has_imports,
        )
        concepts, edges, synonyms = ontology_dfs(spark, parsed.tables)
        empty = spark.createDataFrame([], TRANSCRIPTS)
        out = build_graph(spark, concepts, edges, synonyms, empty, cfg)
        return {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}

    def test_duo_chain(self, triples):
        for child, parent in [
            ("DUO_0000007", "DUO_0000006"),
            ("DUO_0000006", "DUO_0000042"),
            ("DUO_0000042", "DUO_0000001"),
        ]:
            assert (child, "is-a", parent) in triples, (child, parent)

    def test_deprecated_absent(self, triples):
        subjects = {s for s, _, _ in triples}
        assert "DUO_0000002" not in subjects
        assert "DUO_0000003" not in subjects

    def test_display_from_label(self, triples):
        assert ("DUO_0000007", "has-display", "disease specific research") in triples


def test_closure_mixes_obo_and_rdfxml(tmp_path):
    """An RDF/XML root importing an .obo document (per-document
    auto-detection, like the OWL API) — closure parses both, marks the
    OBO classes imported, and enriches displays from the OBO labels."""
    obo = tmp_path / "imp.obo"
    obo.write_text(
        "format-version: 1.2\nontology: imp\n\n"
        "[Term]\nid: IMP:0000001\nname: imported obo label\n"
    )
    root = tmp_path / "root.owl"
    root.write_text(
        '<?xml version="1.0"?>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/root">'
        '<owl:imports rdf:resource="http://purl.obolibrary.org/obo/imp.owl"/>'
        "</owl:Ontology>"
        '<owl:Class rdf:about="http://ex/root#R"><rdfs:label>R</rdfs:label>'
        '<rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/IMP_0000001"/>'
        "</owl:Class></rdf:RDF>"
    )
    parsed = load_owl_closure(
        str(root), {"http://purl.obolibrary.org/obo/imp.owl": str(obo)}
    )
    by = {c["iri"]: c for c in parsed.tables.concepts}
    assert by["http://purl.obolibrary.org/obo/IMP_0000001"]["imported"] is True
    assert by["http://purl.obolibrary.org/obo/IMP_0000001"]["label"] == "imported obo label"
    assert by["http://ex/root#R"]["imported"] is False


def test_malformed_is_a_skipped_not_crash(tmp_path):
    """r5 self-review: 'is_a:' whose value is empty (or only a ! comment)
    is skipped instead of aborting the whole parse with IndexError."""
    f = tmp_path / "bad.obo"
    f.write_text(
        "format-version: 1.2\nontology: x\n\n"
        "[Term]\nid: X:1\nname: one\nis_a: ! fixme\n\n"
        "[Term]\nid: X:2\nname: two\nis_a: X:1\n"
    )
    parsed = parse_obo(str(f))
    edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
    assert (NS + "X_2", NS + "X_1") in edges
    assert not any(c == NS + "X_1" for c, _ in edges)


def test_version_iri_inserts_idspace(tmp_path):
    """obo2owl version IRI: a bare 'releases/…' data-version gets the
    idspace path segment inserted (r5 self-review)."""
    f = tmp_path / "go.obo"
    f.write_text(
        "format-version: 1.2\nontology: go\ndata-version: releases/2021-09-01\n\n"
        "[Term]\nid: GO:1\nname: g\n"
    )
    parsed = parse_obo(str(f))
    assert parsed.version_iri == NS + "go/releases/2021-09-01/go.owl"

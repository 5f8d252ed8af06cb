"""Parity on the reference's REAL test ontologies: parse
/root/reference/src/test/resources/{pizza,duo}.owl with sources/owl_xml,
run the engine, and replicate every assertion in FhirOwlServiceTest
(FhirOwlServiceTest.java:42-176) plus the metadata assertions
(:152-154). Reference files are read-only inputs here — nothing is
copied."""

from __future__ import annotations

import pytest

from fhir_owl_spark.config import PipelineConfig
from fhir_owl_spark.plans.build_graph import build_graph
from fhir_owl_spark.schemas import TRANSCRIPTS
from fhir_owl_spark.sources.owl_xml import (
    RDFS_LABEL,
    ontology_metadata,
    parse_owl_xml,
)

PIZZA = "/root/reference/src/test/resources/pizza.owl"
DUO = "/root/reference/src/test/resources/duo.owl"
PIZZA_NS = "http://www.co-ode.org/ontologies/pizza/pizza.owl#"

def isa_closure_fn(triples):
    """Ancestor-closure lookup over the emitted DIRECT is-a triples
    (membership inference re-routes direct parents through inferred
    defined classes — reasoner-style assertions go on the closure)."""
    parents: dict[str, set[str]] = {}
    for s, p, o in triples:
        if p == "is-a":
            parents.setdefault(s, set()).add(o)

    def closure(x):
        out, todo = set(), [x]
        while todo:
            for q in parents.get(todo.pop(), ()):
                if q not in out:
                    out.add(q)
                    todo.append(q)
        return out

    return closure


def run(spark, parsed, cfg):
    from fhir_owl_spark.fixtures import ontology_dfs

    concepts, edges, synonyms = ontology_dfs(spark, parsed.tables)
    empty = spark.createDataFrame([], TRANSCRIPTS)
    out = build_graph(spark, concepts, edges, synonyms, empty, cfg)
    return {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}


@pytest.fixture(scope="module")
def pizza_triples(spark):
    # DL/jfact path: object properties processed (FhirOwlService.java:543).
    # No hand-injected unsat set — told-disjointness inference in the parser
    # must find IceCream and CheeseyVegetableTopping on its own (round 3).
    parsed = parse_owl_xml(PIZZA, include_object_properties=True)
    cfg = PipelineConfig(
        display_prop=RDFS_LABEL,
        synonym_props=(RDFS_LABEL,),
        has_imports=parsed.has_imports,
    )
    return run(spark, parsed, cfg)


@pytest.fixture(scope="module")
def duo(spark):
    # EL/elk path: classes only (FhirOwlService.java:543 guard)
    parsed = parse_owl_xml(DUO, include_object_properties=False)
    cfg = PipelineConfig(
        display_prop=RDFS_LABEL,
        synonym_props=(RDFS_LABEL,),
        has_imports=parsed.has_imports,
        use_fhir_extension=True,
        date_regex=r"(?P<year>\d{4})-(?P<month>\d{2})-(?P<day>\d{2})",
    )
    return parsed, cfg, run(spark, parsed, cfg)


class TestPizzaReal:
    # FhirOwlServiceTest.java:90-94
    def test_top_entities(self, pizza_triples):
        subjects = {s for s, _, _ in pizza_triples}
        assert "Thing" in subjects
        assert "topObjectProperty" in subjects
        assert "topDataProperty" not in subjects

    # FhirOwlServiceTest.java:76-81 — both classes a DL reasoner finds
    # unsatisfiable in pizza.owl must be filtered WITHOUT an injected set:
    # IceCream (∃hasTopping + domain(hasTopping)=Pizza + disjoint(IceCream,
    # Pizza), pizza.owl:1148-1160, :2981-2988) and CheeseyVegetableTopping
    # (two disjoint asserted parents, pizza.owl:620-628)
    def test_icecream_absent(self, pizza_triples):
        subjects = {s for s, _, _ in pizza_triples}
        assert "IceCream" not in subjects
        assert "CheeseyVegetableTopping" not in subjects

    # defined classes (owl:equivalentClass intersectionOf bodies) get their
    # NAMED conjunct as a told parent — the reasoner emits the same edge
    # (e.g. CheeseyPizza ⊑ Pizza); previously these rooted at Thing
    def test_defined_class_told_parent(self, pizza_triples):
        closure = isa_closure_fn(pizza_triples)
        for child in ("CheeseyPizza", "InterestingPizza", "MeatyPizza"):
            # Pizza is an ancestor (direct for CheeseyPizza/Interesting;
            # MeatyPizza routes through its inferred NonVegetarianPizza
            # parent — the reasoner reports the same direct parent)
            assert "Pizza" in closure(child), child
            assert (child, "is-a", "Thing") not in pizza_triples, child
        assert ("CheeseyPizza", "is-a", "Pizza") in pizza_triples
        assert ("MeatyPizza", "is-a", "NonVegetarianPizza") in pizza_triples

    # FhirOwlServiceTest.java:97-109 (direct parents over the real file)
    def test_class_chain(self, pizza_triples):
        for child, parent in [
            ("PrawnsTopping", "FishTopping"),
            ("FishTopping", "PizzaTopping"),
            ("PizzaTopping", "Food"),
            ("Food", "DomainConcept"),
            ("DomainConcept", "Thing"),
        ]:
            assert (child, "is-a", parent) in pizza_triples, (child, parent)

    # FhirOwlServiceTest.java:111-117
    def test_object_property_chain(self, pizza_triples):
        assert ("isToppingOf", "is-a", "isIngredientOf") in pizza_triples
        assert ("isIngredientOf", "is-a", "topObjectProperty") in pizza_triples

    # lang-tagged labels compete equally (pizza.owl:1898-1899;
    # FhirOwlService.java:709-718) — min literal wins regardless of lang
    def test_multilingual_min_label(self, pizza_triples):
        assert ("PrawnsTopping", "has-display", "CoberturaDeCamarao") in pizza_triples
        assert ("PrawnsTopping", "synonym-of", "PrawnsTopping") in pizza_triples


class TestDuoReal:
    # FhirOwlServiceTest.java:164-168
    def test_thing_imported_full_iri(self, duo):
        _, _, triples = duo
        thing = "http://www.w3.org/2002/07/owl#Thing"
        assert (thing, "root", "true") in triples
        subjects = {s for s, _, _ in triples}
        assert "topObjectProperty" not in subjects
        assert "http://www.w3.org/2002/07/owl#topObjectProperty" not in subjects

    # FhirOwlServiceTest.java:173-175
    def test_duo_chain(self, duo):
        _, _, triples = duo
        for child, parent in [
            ("DUO_0000007", "DUO_0000006"),
            ("DUO_0000006", "DUO_0000042"),
            ("DUO_0000042", "DUO_0000001"),
        ]:
            assert (child, "is-a", parent) in triples, (child, parent)

    # duo.owl:461-481 — deprecated classes skipped by default
    def test_deprecated_absent(self, duo):
        _, _, triples = duo
        subjects = {s for s, _, _ in triples}
        assert "DUO_0000002" not in subjects
        assert "DUO_0000003" not in subjects

    # FhirOwlServiceTest.java:152-154 — metadata projection
    def test_metadata(self, duo):
        parsed, cfg, _ = duo
        meta = ontology_metadata(parsed, cfg)
        assert meta["url"] == "http://purl.obolibrary.org/obo/duo.fhir"
        assert meta["valueset"] == "http://purl.obolibrary.org/obo/duo.fhir?vs"
        assert meta["version"] == "20210223"

    def test_display_from_label(self, duo):
        _, _, triples = duo
        assert ("DUO_0000007", "has-display", "disease specific research") in triples


class TestImportsClosureUnion:
    def test_union_marks_imported(self, spark):
        """S2: union of root + imported documents — imported concepts keep
        full-IRI codes, root concepts shortform (set-difference mode)."""
        from fhir_owl_spark.fixtures import Ontology
        from fhir_owl_spark.sources.owl_xml import ParsedOntology, union_ontologies

        root = Ontology()
        root.concept("http://r#A", "root", label="A root")
        root.concept("http://shared#S", "root", label="S shared")
        root.edge("http://r#A", "http://shared#S")
        root.synonym("http://r#A", "A root", prop="label")

        imp = Ontology()
        imp.concept("http://shared#S", "imp", label="S imported")
        imp.concept("http://i#B", "imp", label="B imported")
        imp.synonym("http://i#B", "ignored imported annotation", prop="label")

        merged = union_ontologies(
            ParsedOntology("http://r", None, True, root),
            ParsedOntology("http://i", None, False, imp),
        )
        by_iri = {c["iri"]: c for c in merged.concepts}
        assert by_iri["http://r#A"]["imported"] is False
        # shared IRI appears in an imported document → imported
        assert by_iri["http://shared#S"]["imported"] is True
        assert by_iri["http://i#B"]["imported"] is True
        # imported-document annotations don't feed preferred-term selection
        assert all(s["iri"] != "http://i#B" for s in merged.synonyms)

        from fhir_owl_spark.fixtures import model_concept_rows
        from fhir_owl_spark.config import PipelineConfig

        rows = model_concept_rows(merged, PipelineConfig(has_imports=True))
        assert rows["http://r#A"]["code"] == "A"
        assert rows["http://shared#S"]["code"] == "http://shared#S"
        assert rows["http://i#B"]["code"] == "http://i#B"
        # closure display map (label column) still supplies the display
        assert rows["http://i#B"]["display"] == "B imported"


class TestSplitBlocks:
    def test_split_rdf_about_blocks_merge(self, tmp_path, spark):
        """Axioms split across multiple rdf:about blocks for the same IRI
        must merge (the OWL API merges class descriptions)."""
        f = tmp_path / "split.owl"
        f.write_text("""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
  <owl:Ontology rdf:about="http://x/split.owl"/>
  <owl:Class rdf:about="http://x#A"><rdfs:label>a label</rdfs:label></owl:Class>
  <owl:Class rdf:about="http://x#B"><rdfs:label>b label</rdfs:label></owl:Class>
  <owl:Class rdf:about="http://x#A">
    <rdfs:subClassOf rdf:resource="http://x#B"/>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
  </owl:Class>
</rdf:RDF>""")
        parsed = parse_owl_xml(str(f))
        edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
        assert ("http://x#A", "http://x#B") in edges
        by_iri = {c["iri"]: c for c in parsed.tables.concepts}
        assert by_iri["http://x#A"]["deprecated"] is True
        assert by_iri["http://x#A"]["label"] == "a label"
        assert len([c for c in parsed.tables.concepts if c["iri"] == "http://x#A"]) == 1


# ---------------------------------------------------------------------------
# Data-property processing (round 2) — the jfact path,
# FhirOwlService.java:565-585: data properties become concepts, parentless
# ones root at owl:topDataProperty, and topDataProperty itself is added
# only when at least one data property is processed.
# ---------------------------------------------------------------------------

DP_OWL = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  xmlns:owl="http://www.w3.org/2002/07/owl#"
  xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
  <owl:Ontology rdf:about="http://ex/dp"/>
  <owl:Class rdf:about="http://ex/dp#A"><rdfs:label>A</rdfs:label></owl:Class>
  <owl:DatatypeProperty rdf:about="http://ex/dp#hasAge">
    <rdfs:label>has age</rdfs:label>
  </owl:DatatypeProperty>
  <owl:DatatypeProperty rdf:about="http://ex/dp#hasBirthYear">
    <rdfs:label>has birth year</rdfs:label>
    <rdfs:subPropertyOf rdf:resource="http://ex/dp#hasAge"/>
  </owl:DatatypeProperty>
  <owl:ObjectProperty rdf:about="http://ex/dp#relatesTo">
    <rdfs:label>relates to</rdfs:label>
  </owl:ObjectProperty>
</rdf:RDF>"""


@pytest.fixture(scope="module")
def dp_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("dp") / "dp.owl"
    p.write_text(DP_OWL)
    return str(p)


def test_data_properties_processed_jfact_style(spark, dp_path):
    parsed = parse_owl_xml(
        dp_path, include_object_properties=True, include_data_properties=True
    )
    triples = run(spark, parsed, PipelineConfig(
        display_prop=RDFS_LABEL, synonym_props=(RDFS_LABEL,)
    ))
    subjects = {s for s, _, _ in triples}
    # data properties become concepts with displays
    assert ("hasAge", "has-display", "has age") in triples
    assert ("hasBirthYear", "has-display", "has birth year") in triples
    # asserted sub-property edge survives
    assert ("hasBirthYear", "is-a", "hasAge") in triples
    # parentless data property roots at topDataProperty
    assert ("hasAge", "is-a", "topDataProperty") in triples
    # no imports → top entities are LOCAL → shortform code, and the special
    # display does NOT fire (it is keyed on the full-IRI code, which only
    # imported tops carry — FhirOwlService.java:852-858 checks
    # cdc.getCode() against the full IRI)
    assert ("topDataProperty", "has-display", "topDataProperty") in triples
    # object properties unaffected
    assert ("relatesTo", "is-a", "topObjectProperty") in triples
    assert "topDataProperty" in subjects


def test_imported_top_data_property_gets_special_display(spark, tmp_path):
    """With imports present, top entities are imported → full-IRI codes →
    the hardcoded 'Top Data Property' display fires."""
    owl = tmp_path / "dpimp.owl"
    owl.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/dpi">'
        '<owl:imports rdf:resource="http://ex/other"/></owl:Ontology>'
        '<owl:DatatypeProperty rdf:about="http://ex/dpi#hasAge">'
        "<rdfs:label>has age</rdfs:label></owl:DatatypeProperty>"
        "</rdf:RDF>"
    )
    parsed = parse_owl_xml(str(owl), include_data_properties=True)
    triples = run(spark, parsed, PipelineConfig(
        display_prop=RDFS_LABEL, synonym_props=(RDFS_LABEL,),
        has_imports=parsed.has_imports,
    ))
    top = "http://www.w3.org/2002/07/owl#topDataProperty"
    assert (top, "has-display", "Top Data Property") in triples
    assert ("hasAge", "is-a", top) in triples


def test_data_properties_absent_by_default(spark, dp_path):
    parsed = parse_owl_xml(dp_path)  # elk-style default: no data properties
    triples = run(spark, parsed, PipelineConfig(
        display_prop=RDFS_LABEL, synonym_props=(RDFS_LABEL,)
    ))
    subjects = {s for s, _, _ in triples}
    assert "hasAge" not in subjects
    assert "topDataProperty" not in subjects
    assert "relatesTo" in subjects  # object properties still on by default


def test_top_data_property_not_added_without_data_props(spark, dp_path, tmp_path):
    """include_data_properties=True but the document has NO data properties
    → topDataProperty must not appear (the reference only adds it when
    dataProps is non-empty, FhirOwlService.java:566-569)."""
    owl = tmp_path / "nodp.owl"
    owl.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/nodp"/>'
        '<owl:Class rdf:about="http://ex/nodp#A"><rdfs:label>A</rdfs:label></owl:Class>'
        "</rdf:RDF>"
    )
    parsed = parse_owl_xml(str(owl), include_data_properties=True)
    assert all(
        r["iri"] != "http://www.w3.org/2002/07/owl#topDataProperty"
        for r in parsed.tables.concepts
    )


def test_cli_reasoner_flag():
    import jobs.build_graph as job

    args = job.parse_args(["--output", "o", "--reasoner", "jfact"])
    assert args.reasoner == "jfact"
    args = job.parse_args(["--output", "o"])
    assert args.reasoner is None


# ---------------------------------------------------------------------------
# Imports-closure local loading (round 2) — the iri_mappings analog
# (FhirOwlService.java:86-117 + :214-229): duo.owl declares three
# imported classes WITHOUT labels (IAO_0000027, IAO_0000030, OBI_0000066);
# mapping its owl:imports IRI to a local iao.owl must enrich their
# displays instead of falling back to IRI strings.
# ---------------------------------------------------------------------------

IAO_MINI = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  xmlns:owl="http://www.w3.org/2002/07/owl#"
  xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
  <owl:Ontology rdf:about="http://purl.obolibrary.org/obo/iao.owl"/>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/IAO_0000027">
    <rdfs:label>data item</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/IAO_0000030">
    <rdfs:label>information content entity</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/OBI_0000066">
    <rdfs:label>investigation</rdfs:label>
  </owl:Class>
</rdf:RDF>"""


def test_duo_imports_closure_enriches_displays(spark, tmp_path):
    import dataclasses

    from fhir_owl_spark.config import DUO_CONFIG
    from fhir_owl_spark.sources.owl_xml import load_owl_closure

    iao = tmp_path / "iao.owl"
    iao.write_text(IAO_MINI)
    parsed = load_owl_closure(
        DUO,
        {"http://purl.obolibrary.org/obo/iao.owl": str(iao)},
        include_object_properties=False,
    )
    cfg = dataclasses.replace(
        DUO_CONFIG,
        display_prop=RDFS_LABEL,
        synonym_props=(RDFS_LABEL,),
        has_imports=parsed.has_imports,
        code_replace=None,
    )
    triples = run(spark, parsed, cfg)
    displays = {s: o for s, p, o in triples if p == "has-display"}
    # the closure provides real displays (previously IRI fallbacks)
    assert displays["http://purl.obolibrary.org/obo/IAO_0000027"] == "data item"
    assert (
        displays["http://purl.obolibrary.org/obo/IAO_0000030"]
        == "information content entity"
    )
    assert displays["http://purl.obolibrary.org/obo/OBI_0000066"] == "investigation"
    # imported classes keep full-IRI codes (imported flag intact)
    flags = {s: o for s, p, o in triples if p == "imported"}
    assert flags["http://purl.obolibrary.org/obo/IAO_0000027"] == "true"
    # main DUO classes unaffected: shortform codes, own labels
    assert displays.get("DUO_0000007") == "disease specific research"
    assert flags.get("DUO_0000007") == "false"


def test_unmapped_import_warns_and_continues(tmp_path):
    import warnings as w

    from fhir_owl_spark.sources.owl_xml import load_owl_closure

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        parsed = load_owl_closure(DUO, {}, include_object_properties=False)
    assert any("no local mapping" in str(x.message) for x in caught)
    # still parses the root fine
    assert parsed.ontology_iri == "http://purl.obolibrary.org/obo/duo.owl"


def test_transitive_imports_followed(tmp_path):
    from fhir_owl_spark.sources.owl_xml import load_owl_closure

    a = tmp_path / "a.owl"
    b = tmp_path / "b.owl"
    root = tmp_path / "root.owl"
    root.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/root">'
        '<owl:imports rdf:resource="http://ex/a"/></owl:Ontology>'
        '<owl:Class rdf:about="http://ex/root#R"><rdfs:label>R</rdfs:label>'
        '<rdfs:subClassOf rdf:resource="http://ex/a#A"/></owl:Class>'
        "</rdf:RDF>"
    )
    a.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/a">'
        '<owl:imports rdf:resource="http://ex/b"/></owl:Ontology>'
        '<owl:Class rdf:about="http://ex/a#A"><rdfs:label>A</rdfs:label></owl:Class>'
        "</rdf:RDF>"
    )
    b.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/b"/>'
        '<owl:Class rdf:about="http://ex/b#B"><rdfs:label>B</rdfs:label></owl:Class>'
        "</rdf:RDF>"
    )
    parsed = load_owl_closure(
        str(root), {"http://ex/a": str(a), "http://ex/b": str(b)}
    )
    iris = {c["iri"] for c in parsed.tables.concepts}
    assert "http://ex/a#A" in iris and "http://ex/b#B" in iris  # transitive
    flags = {c["iri"]: c["imported"] for c in parsed.tables.concepts}
    assert flags["http://ex/root#R"] is False
    assert flags["http://ex/a#A"] is True and flags["http://ex/b#B"] is True


def test_named_node_subclassof_form(tmp_path, spark):
    """<rdfs:subClassOf><owl:Class rdf:about="X"/></rdfs:subClassOf> (the
    named-node form some tools emit) must yield the same parent edge as
    the rdf:resource form; anonymous restriction bodies stay ignored."""
    owl = tmp_path / "nn.owl"
    owl.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/nn"/>'
        '<owl:Class rdf:about="http://ex/nn#P"><rdfs:label>P</rdfs:label></owl:Class>'
        '<owl:Class rdf:about="http://ex/nn#C1"><rdfs:label>C1</rdfs:label>'
        '<rdfs:subClassOf><owl:Class rdf:about="http://ex/nn#P"/></rdfs:subClassOf>'
        "</owl:Class>"
        '<owl:Class rdf:about="http://ex/nn#C2"><rdfs:label>C2</rdfs:label>'
        '<rdfs:subClassOf><rdf:Description rdf:about="http://ex/nn#P"/></rdfs:subClassOf>'
        "</owl:Class>"
        '<owl:Class rdf:about="http://ex/nn#C3"><rdfs:label>C3</rdfs:label>'
        "<rdfs:subClassOf><owl:Restriction/></rdfs:subClassOf></owl:Class>"
        "</rdf:RDF>"
    )
    parsed = parse_owl_xml(str(owl))
    edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
    assert ("http://ex/nn#C1", "http://ex/nn#P") in edges
    assert ("http://ex/nn#C2", "http://ex/nn#P") in edges
    # anonymous body → no edge; C3 is parentless (gets Thing downstream)
    assert not any(c == "http://ex/nn#C3" for c, _ in edges)


def test_no_url_no_iri_raises_noid(tmp_path):
    """NoIdException parity: no -url and no ontology IRI fails even when
    the NAME resolves (e.g. via an rdfs:label ontology annotation)."""
    owl = tmp_path / "noiri2.owl"
    owl.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        "<owl:Ontology><rdfs:label>named but iri-less</rdfs:label></owl:Ontology>"
        '<owl:Class rdf:about="http://ex/A"><rdfs:label>A</rdfs:label></owl:Class>'
        "</rdf:RDF>"
    )
    parsed = parse_owl_xml(str(owl))
    from fhir_owl_spark.sources.owl_xml import NoOntologyIriError

    with pytest.raises(NoOntologyIriError):
        ontology_metadata(parsed, PipelineConfig())
    # explicit -url rescues it (reference: csp.getUrl() wins before the check)
    meta = ontology_metadata(parsed, PipelineConfig(url="http://ex/explicit"))
    assert meta["url"] == "http://ex/explicit"
    assert meta["name"] == "named but iri-less"


UNSAT_NEG_OWL = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  xmlns:owl="http://www.w3.org/2002/07/owl#"
  xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
  <owl:Ontology rdf:about="http://ex/dj"/>
  <owl:Class rdf:about="http://ex/dj#A"><rdfs:label>A</rdfs:label>
    <owl:disjointWith rdf:resource="http://ex/dj#B"/></owl:Class>
  <owl:Class rdf:about="http://ex/dj#B"><rdfs:label>B</rdfs:label></owl:Class>
  <owl:Class rdf:about="http://ex/dj#ChildOfA"><rdfs:label>child a</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://ex/dj#A"/></owl:Class>
  <owl:Class rdf:about="http://ex/dj#Clash"><rdfs:label>clash</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://ex/dj#A"/>
    <rdfs:subClassOf rdf:resource="http://ex/dj#B"/></owl:Class>
  <owl:Class rdf:about="http://ex/dj#SubClash"><rdfs:label>sub clash</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://ex/dj#Clash"/></owl:Class>
</rdf:RDF>"""


class TestToldUnsatisfiability:
    def test_disjoint_siblings_stay_satisfiable(self, tmp_path):
        """Negative: disjointness alone unsats nothing — only a class
        told-under BOTH disjoint classes (and its subclasses) is dropped."""
        f = tmp_path / "dj.owl"
        f.write_text(UNSAT_NEG_OWL)
        parsed = parse_owl_xml(str(f))
        flags = {
            c["iri"].split("#")[-1]: c["unsatisfiable"]
            for c in parsed.tables.concepts if "#" in c["iri"]
        }
        assert flags["A"] is False and flags["B"] is False
        assert flags["ChildOfA"] is False
        assert flags["Clash"] is True
        assert flags["SubClash"] is True  # unsat propagates down

    def test_equivalent_restriction_only_body_contributes_nothing(self, tmp_path):
        """equivalentClass(intersectionOf(Restriction-only)) and plain
        Restriction equivalents yield no parent edge and no unsat."""
        f = tmp_path / "ro.owl"
        f.write_text(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/ro"/>'
            '<owl:Class rdf:about="http://ex/ro#D"><rdfs:label>D</rdfs:label>'
            "<owl:equivalentClass><owl:Class>"
            '<owl:intersectionOf rdf:parseType="Collection">'
            '<owl:Restriction><owl:onProperty rdf:resource="http://ex/ro#p"/>'
            '<owl:someValuesFrom rdf:resource="http://ex/ro#X"/></owl:Restriction>'
            "</owl:intersectionOf></owl:Class></owl:equivalentClass></owl:Class>"
            '<owl:Class rdf:about="http://ex/ro#X"><rdfs:label>X</rdfs:label></owl:Class>'
            "</rdf:RDF>"
        )
        parsed = parse_owl_xml(str(f))
        assert not any(
            e["child_iri"] == "http://ex/ro#D" for e in parsed.tables.edges
        )
        assert all(c["unsatisfiable"] is False for c in parsed.tables.concepts)

    def test_unsat_filler_propagates(self, tmp_path):
        """A class forced (someValuesFrom) to instantiate an unsatisfiable
        filler is itself unsatisfiable, transitively."""
        f = tmp_path / "fill.owl"
        f.write_text(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/f"/>'
            '<owl:Class rdf:about="http://ex/f#A"><rdfs:label>A</rdfs:label>'
            '<owl:disjointWith rdf:resource="http://ex/f#B"/></owl:Class>'
            '<owl:Class rdf:about="http://ex/f#B"><rdfs:label>B</rdfs:label></owl:Class>'
            '<owl:Class rdf:about="http://ex/f#Clash"><rdfs:label>clash</rdfs:label>'
            '<rdfs:subClassOf rdf:resource="http://ex/f#A"/>'
            '<rdfs:subClassOf rdf:resource="http://ex/f#B"/></owl:Class>'
            '<owl:Class rdf:about="http://ex/f#NeedsClash"><rdfs:label>nc</rdfs:label>'
            "<rdfs:subClassOf><owl:Restriction>"
            '<owl:onProperty rdf:resource="http://ex/f#p"/>'
            '<owl:someValuesFrom rdf:resource="http://ex/f#Clash"/>'
            "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            '<owl:Class rdf:about="http://ex/f#SubNeeds"><rdfs:label>sn</rdfs:label>'
            '<rdfs:subClassOf rdf:resource="http://ex/f#NeedsClash"/></owl:Class>'
            '<owl:Class rdf:about="http://ex/f#AllOk"><rdfs:label>ok</rdfs:label>'
            "<rdfs:subClassOf><owl:Restriction>"
            '<owl:onProperty rdf:resource="http://ex/f#p"/>'
            '<owl:allValuesFrom rdf:resource="http://ex/f#Clash"/>'
            "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            "</rdf:RDF>"
        )
        parsed = parse_owl_xml(str(f))
        flags = {
            c["iri"].split("#")[-1]: c["unsatisfiable"]
            for c in parsed.tables.concepts if "#" in c["iri"]
        }
        assert flags["Clash"] is True
        assert flags["NeedsClash"] is True  # forced to instantiate Clash
        assert flags["SubNeeds"] is True    # told subclass of unsat
        # allValuesFrom is vacuously satisfiable — no propagation
        assert flags["AllOk"] is False
        assert flags["A"] is False and flags["B"] is False

    def test_union_equivalence_told_edges(self, tmp_path):
        """C ≡ unionOf(A, B) ⇒ A ⊑ C and B ⊑ C; the same body under
        subClassOf implies NOTHING about the members; disjointUnionOf
        gives member edges plus pairwise disjointness."""
        f = tmp_path / "un.owl"
        f.write_text(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/un"/>'
            '<owl:Class rdf:about="http://ex/un#U"><rdfs:label>U</rdfs:label>'
            "<owl:equivalentClass><owl:Class>"
            '<owl:unionOf rdf:parseType="Collection">'
            '<rdf:Description rdf:about="http://ex/un#A"/>'
            '<rdf:Description rdf:about="http://ex/un#B"/>'
            "</owl:unionOf></owl:Class></owl:equivalentClass></owl:Class>"
            '<owl:Class rdf:about="http://ex/un#S"><rdfs:label>S</rdfs:label>'
            "<rdfs:subClassOf><owl:Class>"
            '<owl:unionOf rdf:parseType="Collection">'
            '<rdf:Description rdf:about="http://ex/un#A"/>'
            '<rdf:Description rdf:about="http://ex/un#B"/>'
            "</owl:unionOf></owl:Class></rdfs:subClassOf></owl:Class>"
            '<owl:Class rdf:about="http://ex/un#D"><rdfs:label>D</rdfs:label>'
            '<owl:disjointUnionOf rdf:parseType="Collection">'
            '<rdf:Description rdf:about="http://ex/un#X"/>'
            '<rdf:Description rdf:about="http://ex/un#Y"/>'
            "</owl:disjointUnionOf></owl:Class>"
            '<owl:Class rdf:about="http://ex/un#A"><rdfs:label>A</rdfs:label></owl:Class>'
            '<owl:Class rdf:about="http://ex/un#B"><rdfs:label>B</rdfs:label></owl:Class>'
            '<owl:Class rdf:about="http://ex/un#X"><rdfs:label>X</rdfs:label></owl:Class>'
            '<owl:Class rdf:about="http://ex/un#Y"><rdfs:label>Y</rdfs:label></owl:Class>'
            '<owl:Class rdf:about="http://ex/un#XYClash"><rdfs:label>xy</rdfs:label>'
            '<rdfs:subClassOf rdf:resource="http://ex/un#X"/>'
            '<rdfs:subClassOf rdf:resource="http://ex/un#Y"/></owl:Class>'
            "</rdf:RDF>"
        )
        parsed = parse_owl_xml(str(f))
        edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
                 for e in parsed.tables.edges}
        assert ("A", "U") in edges and ("B", "U") in edges
        # union under subClassOf: no member edges, and S gains no parent
        assert ("A", "S") not in edges and ("S", "A") not in edges
        assert not any(c == "S" for c, _ in edges)
        # disjointUnionOf: member edges + disjointness (XYClash unsat)
        assert ("X", "D") in edges and ("Y", "D") in edges
        flags = {c["iri"].split("#")[-1]: c["unsatisfiable"]
                 for c in parsed.tables.concepts if "#" in c["iri"]}
        assert flags["XYClash"] is True
        assert flags["X"] is False and flags["Y"] is False

    def test_filler_nothing_unsats(self, tmp_path):
        """C ⊑ ∃p.owl:Nothing is unsatisfiable even though Nothing is not
        a declared class (review fix: the fixpoint seeds from Nothing)."""
        f = tmp_path / "fn.owl"
        f.write_text(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/fn"/>'
            '<owl:Class rdf:about="http://ex/fn#C"><rdfs:label>C</rdfs:label>'
            "<rdfs:subClassOf><owl:Restriction>"
            '<owl:onProperty rdf:resource="http://ex/fn#p"/>'
            '<owl:someValuesFrom rdf:resource="http://www.w3.org/2002/07/owl#Nothing"/>'
            "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            '<owl:Class rdf:about="http://ex/fn#Ok"><rdfs:label>ok</rdfs:label></owl:Class>'
            "</rdf:RDF>"
        )
        parsed = parse_owl_xml(str(f))
        flags = {c["iri"].split("#")[-1]: c["unsatisfiable"]
                 for c in parsed.tables.concepts if "fn#" in c["iri"]}
        assert flags["C"] is True
        assert flags["Ok"] is False

    def test_injected_set_still_ored_in(self, tmp_path):
        """The reasoner-output seam survives: caller-supplied IRIs stay
        unsat even when told logic sees nothing."""
        f = tmp_path / "inj.owl"
        f.write_text(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/inj"/>'
            '<owl:Class rdf:about="http://ex/inj#A"><rdfs:label>A</rdfs:label></owl:Class>'
            "</rdf:RDF>"
        )
        parsed = parse_owl_xml(str(f), unsatisfiable_iris={"http://ex/inj#A"})
        assert [c["unsatisfiable"] for c in parsed.tables.concepts
                if c["iri"] == "http://ex/inj#A"] == [True]


class TestToldUnsatProperty:
    """Property-based check of the told-unsat logic on RANDOM ontologies:
    XML → parser vs an independent whole-graph fixpoint model written
    straight from the spec (two-disjoint-ancestors / under-Nothing /
    unsat-ancestor / unsat-forced-filler). No Spark — parser-only, cheap."""

    @staticmethod
    def _render(n, edges, disjoints, restrictions, domains) -> str:
        ns = "http://ex/pu#"
        parts = [
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
            '<owl:Ontology rdf:about="http://ex/pu"/>',
        ]
        for i in range(n):
            body = [f"<rdfs:label>c{i}</rdfs:label>"]
            for c, p in edges:
                if c == i:
                    body.append(f'<rdfs:subClassOf rdf:resource="{ns}C{p}"/>')
            for a, b in disjoints:
                if a == i:
                    body.append(f'<owl:disjointWith rdf:resource="{ns}C{b}"/>')
            for c, prop, filler in restrictions:
                if c == i:
                    body.append(
                        "<rdfs:subClassOf><owl:Restriction>"
                        f'<owl:onProperty rdf:resource="{ns}p{prop}"/>'
                        f'<owl:someValuesFrom rdf:resource="{ns}C{filler}"/>'
                        "</owl:Restriction></rdfs:subClassOf>"
                    )
            parts.append(
                f'<owl:Class rdf:about="{ns}C{i}">' + "".join(body) + "</owl:Class>"
            )
        for prop, dom in domains.items():
            parts.append(
                f'<owl:ObjectProperty rdf:about="{ns}p{prop}">'
                f'<rdfs:domain rdf:resource="{ns}C{dom}"/></owl:ObjectProperty>'
            )
        parts.append("</rdf:RDF>")
        return "".join(parts)

    @staticmethod
    def _model(n, edges, disjoints, restrictions, domains) -> set[int]:
        # told edges incl. domain-inferred
        parents = {i: set() for i in range(n)}
        for c, p in edges:
            parents[c].add(p)
        for c, prop, _ in restrictions:
            if prop in domains:
                parents[c].add(domains[prop])

        def anc(i):
            out, todo = {i}, [i]
            while todo:
                for p in parents[todo.pop()]:
                    if p not in out:
                        out.add(p)
                        todo.append(p)
            return out

        dj = {(a, b) for a, b in disjoints} | {(b, a) for a, b in disjoints}
        unsat = set()
        changed = True
        while changed:  # whole-graph fixpoint, recomputed each round
            changed = False
            for i in range(n):
                if i in unsat:
                    continue
                a = anc(i)
                bad = any((x, y) in dj for x in a for y in a if x != y)
                bad = bad or any(x in unsat for x in a)
                bad = bad or any(
                    c == i and f in unsat for c, _, f in restrictions
                )
                # also: restrictions on any told ancestor
                bad = bad or any(
                    c in a and f in unsat for c, _, f in restrictions
                )
                if bad:
                    unsat.add(i)
                    changed = True
        return unsat

    def test_property_random_graphs(self, tmp_path):
        import random as _random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(st.integers(0, 10**9))
        def check(seed):
            rng = _random.Random(seed)
            n = rng.randint(3, 8)
            edges = [
                (i, rng.randrange(i)) for i in range(1, n) if rng.random() < 0.7
            ]
            disjoints = [
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(0, 3))
            ]
            n_props = rng.randint(0, 2)
            restrictions = [
                (rng.randrange(n), rng.randrange(max(1, n_props)), rng.randrange(n))
                for _ in range(rng.randint(0, 3))
                if n_props
            ]
            domains = {
                p: rng.randrange(n) for p in range(n_props) if rng.random() < 0.7
            }
            xml = self._render(n, edges, disjoints, restrictions, domains)
            f = tmp_path / f"pu{seed}.owl"
            f.write_text(xml)
            parsed = parse_owl_xml(str(f))
            got = {
                int(c["iri"].rsplit("#C", 1)[1])
                for c in parsed.tables.concepts
                if "#C" in c["iri"] and c["unsatisfiable"]
            }
            want = self._model(n, edges, disjoints, restrictions, domains)
            assert got == want, (xml, got, want)

        check()


def test_named_node_equivalent_class(tmp_path):
    """equivalentClass in the named-node serialization emits the same
    mutual edges as the rdf:resource form."""
    owl = tmp_path / "eqnn.owl"
    owl.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/eqnn"/>'
        '<owl:Class rdf:about="http://ex/eqnn#A"><rdfs:label>A</rdfs:label>'
        '<owl:equivalentClass><owl:Class rdf:about="http://ex/eqnn#B"/>'
        "</owl:equivalentClass></owl:Class>"
        '<owl:Class rdf:about="http://ex/eqnn#B"><rdfs:label>B</rdfs:label></owl:Class>'
        "</rdf:RDF>"
    )
    parsed = parse_owl_xml(str(owl))
    edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
    assert ("http://ex/eqnn#A", "http://ex/eqnn#B") in edges
    assert ("http://ex/eqnn#B", "http://ex/eqnn#A") in edges


class TestDefinedClassMembership:
    """EL-slice defined-class MEMBERSHIP (round-4: the reasoner infers
    e.g. Margherita ⊑ CheeseyPizza from its told mozzarella topping —
    FhirOwlService.java:258 classifies with ELK/JFact, :533 consumes the
    superclasses). The parser's told classifier must reproduce those
    inferences on the REAL pizza.owl with no injected reasoner output."""

    def test_named_pizzas_classified_under_cheesey_pizza(self, pizza_triples):
        # Margherita ⊑ NamedPizza(⊑ Pizza) + ∃hasTopping.Mozzarella(⊑ Cheese)
        # satisfies CheeseyPizza ≡ Pizza ⊓ ∃hasTopping.CheeseTopping
        for pizza in ("Margherita", "American", "QuattroFormaggi", "Soho"):
            assert (pizza, "is-a", "CheeseyPizza") in pizza_triples, pizza
        # told direct parent NamedPizza survives alongside (reasoner emits both)
        assert ("Margherita", "is-a", "NamedPizza") in pizza_triples

    def test_spicy_classification(self, pizza_triples):
        # SpicyTopping ≡ PizzaTopping ⊓ ∃hasSpiciness.Hot
        assert ("JalapenoPepperTopping", "is-a", "SpicyTopping") in pizza_triples
        # SpicyPizza ≡ Pizza ⊓ ∃hasTopping.SpicyTopping — needs the
        # FIXPOINT: JalapenoPepperTopping ⊑ SpicyTopping is itself inferred
        assert ("AmericanHot", "is-a", "SpicyPizza") in pizza_triples
        assert ("SloppyGiuseppe", "is-a", "SpicyPizza") in pizza_triples

    def test_meaty_pizzas(self, pizza_triples):
        assert ("American", "is-a", "MeatyPizza") in pizza_triples
        assert ("LaReine", "is-a", "MeatyPizza") in pizza_triples
        # a meatless pizza must NOT classify as meaty
        assert ("Margherita", "is-a", "MeatyPizza") not in pizza_triples

    def test_vegetarian_pizzas_via_closure_axioms(self, pizza_triples):
        """The negative slice: VegetarianPizza ≡ Pizza ⊓ ¬∃hasTopping.Fish
        ⊓ ¬∃hasTopping.Meat. Margherita's CLOSURE axiom
        (∀hasTopping.(Mozzarella ∪ Tomato)) + declared topping-category
        disjointness prove both negations — exactly the 10 vegetarian
        named pizzas JFact classifies, and ONLY those."""
        # direct is-a triples are the post-reduction DIRECT parents (the
        # engine also infers VegetarianPizzaEquivalent2 ⊑ VegetarianPizza,
        # so named pizzas' direct parent is Equivalent2) — membership is
        # asserted on the is-a CLOSURE, like the reasoner's ancestor set
        parents: dict[str, set[str]] = {}
        for s, p, o in pizza_triples:
            if p == "is-a":
                parents.setdefault(s, set()).add(o)

        def closure(x):
            out, todo = set(), [x]
            while todo:
                for q in parents.get(todo.pop(), ()):
                    if q not in out:
                        out.add(q)
                        todo.append(q)
            return out

        for pizza in ("Margherita", "Fiorentina", "Mushroom",
                      "QuattroFormaggi", "Soho"):
            assert "VegetarianPizza" in closure(pizza), pizza
        # UnclosedPizza has a mozzarella topping but NO closure axiom —
        # the canonical example of why closure axioms matter: without ∀,
        # nothing rules out a hidden meat topping, so no membership
        assert "VegetarianPizza" not in closure("UnclosedPizza")
        # a meaty pizza must never classify as vegetarian
        assert "VegetarianPizza" not in closure("American")

    def test_non_vegetarian_pizzas_via_negation_clash(self, pizza_triples):
        """NonVegetarianPizza ≡ Pizza ⊓ ¬VegetarianPizza: membership is
        proven by the told clash between X's ∃hasTopping.(⊑ Meat/Fish)
        and VegetarianPizza's necessary ¬∃hasTopping.Meat/Fish — the 13
        meaty/fishy named pizzas plus MeatyPizza, as JFact infers."""
        closure = isa_closure_fn(pizza_triples)
        for pizza in ("American", "FruttiDiMare", "SloppyGiuseppe",
                      "MeatyPizza"):
            assert "NonVegetarianPizza" in closure(pizza), pizza
        # vegetarian pizzas and abstainers must NOT appear
        for pizza in ("Margherita", "Soho", "UnclosedPizza"):
            assert "NonVegetarianPizza" not in closure(pizza), pizza

    def test_interesting_pizza_min_cardinality(self, pizza_triples):
        """InterestingPizza ≡ Pizza ⊓ ≥3 hasTopping: satisfied by three
        told toppings whose categories are PAIRWISE DISJOINT (provably
        distinct successors) — American's mozzarella/tomato/peperoni.
        Margherita (2 toppings) and QuattroFormaggi (1) must abstain."""
        closure = isa_closure_fn(pizza_triples)
        for pizza in ("American", "Mushroom", "SloppyGiuseppe"):
            assert "InterestingPizza" in closure(pizza), pizza
        for pizza in ("Margherita", "QuattroFormaggi", "UnclosedPizza"):
            assert "InterestingPizza" not in closure(pizza), pizza

    def test_real_italian_pizza_has_value(self, pizza_triples):
        """RealItalianPizza ≡ Pizza ⊓ (hasCountryOfOrigin value Italy):
        exactly the two pizzas that told-assert the Italy individual —
        with this, EVERY defined class in pizza.owl classifies its full
        reasoner membership set (no remaining abstention on this file)."""
        closure = isa_closure_fn(pizza_triples)
        for pizza in ("Napoletana", "Veneziana"):
            assert "RealItalianPizza" in closure(pizza), pizza
        for other in ("American", "Margherita", "MozzarellaTopping"):
            # MozzarellaTopping also asserts Italy but is not a Pizza
            assert "RealItalianPizza" not in closure(other), other

    def test_opt_out_flag(self):
        parsed = parse_owl_xml(PIZZA, include_object_properties=True,
                               classify_defined=False)
        edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
                 for e in parsed.tables.edges}
        assert ("Margherita", "CheeseyPizza") not in edges


class TestDefinedMembershipProperty:
    """Property-based check of the membership classifier on RANDOM
    ontologies vs an independent whole-graph fixpoint model written
    straight from the spec. Parser-only — no Spark, cheap."""

    @staticmethod
    def _render(n, edges, exists, bodies) -> str:
        ns = "http://ex/dm#"
        parts = [
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
            '<owl:Ontology rdf:about="http://ex/dm"/>',
        ]
        for i in range(n):
            body = [f"<rdfs:label>c{i}</rdfs:label>"]
            for c, p in edges:
                if c == i:
                    body.append(f'<rdfs:subClassOf rdf:resource="{ns}C{p}"/>')
            for c, prop, filler in exists:
                if c == i:
                    body.append(
                        "<rdfs:subClassOf><owl:Restriction>"
                        f'<owl:onProperty rdf:resource="{ns}p{prop}"/>'
                        f'<owl:someValuesFrom rdf:resource="{ns}C{filler}"/>'
                        "</owl:Restriction></rdfs:subClassOf>"
                    )
            if i in bodies:
                named, ex = bodies[i]
                members = [
                    f'<rdf:Description rdf:about="{ns}C{m}"/>' for m in named
                ] + [
                    "<owl:Restriction>"
                    f'<owl:onProperty rdf:resource="{ns}p{p}"/>'
                    f'<owl:someValuesFrom rdf:resource="{ns}C{f}"/>'
                    "</owl:Restriction>"
                    for p, f in ex
                ]
                body.append(
                    "<owl:equivalentClass><owl:Class>"
                    '<owl:intersectionOf rdf:parseType="Collection">'
                    + "".join(members)
                    + "</owl:intersectionOf></owl:Class></owl:equivalentClass>"
                )
            parts.append(
                f'<owl:Class rdf:about="{ns}C{i}">' + "".join(body) + "</owl:Class>"
            )
        parts.append("</rdf:RDF>")
        return "".join(parts)

    @staticmethod
    def _model(n, edges, exists, bodies) -> set[tuple[int, int]]:
        from collections import defaultdict

        parents = defaultdict(set)
        for c, p in edges:
            parents[c].add(p)
        have = defaultdict(set)  # class -> {(p, f)} direct existentials
        for c, p, f in exists:
            have[c].add((p, f))
        for d, (named, ex) in bodies.items():
            parents[d].update(named)   # told one-way conjunct edges
            have[d].update(ex)         # body existentials belong to d

        def anc(i):
            out, todo = {i}, [i]
            while todo:
                for p in parents[todo.pop()]:
                    if p not in out:
                        out.add(p)
                        todo.append(p)
            return out

        told_anc = {x: anc(x) for x in range(n)}
        changed = True
        while changed:
            changed = False
            for d, (named, ex) in bodies.items():
                for x in range(n):
                    a = anc(x)
                    if x == d or d in a:
                        continue
                    mine = set().union(*(have[y] for y in a))
                    ok = all(m in a for m in named) and all(
                        any(p_req == p_have and f_req in anc(f_have)
                            for p_have, f_have in mine)
                        for p_req, f_req in ex
                    )
                    if ok:
                        parents[x].add(d)
                        changed = True
        # canonical output, mirroring the parser: every defined class
        # newly in x's saturated ancestor closure
        return {
            (x, d)
            for x in range(n)
            for d in bodies
            if d != x and d in anc(x) and d not in told_anc[x]
        }

    def test_property_random_graphs(self, tmp_path):
        import random as _random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(st.integers(0, 10**9))
        def check(seed):
            rng = _random.Random(seed)
            n = rng.randint(4, 9)
            edges = [
                (i, rng.randrange(i)) for i in range(1, n) if rng.random() < 0.6
            ]
            n_props = 2
            exists = [
                (rng.randrange(n), rng.randrange(n_props), rng.randrange(n))
                for _ in range(rng.randint(0, 4))
            ]
            bodies = {}
            for _ in range(rng.randint(1, 3)):
                d = rng.randrange(n)
                named = rng.sample([i for i in range(n) if i != d],
                                   rng.randint(0, 2))
                ex = [
                    (rng.randrange(n_props), rng.randrange(n))
                    for _ in range(rng.randint(0, 2))
                ]
                if named or ex:
                    bodies[d] = (named, ex)
            xml = self._render(n, edges, exists, bodies)
            f = tmp_path / f"dm{seed}.owl"
            f.write_text(xml)
            parsed = parse_owl_xml(str(f), include_object_properties=False)
            got_edges = {
                (e["child_iri"], e["parent_iri"])
                for e in parsed.tables.edges
            }
            ns = "http://ex/dm#"
            want_base = {(f"{ns}C{c}", f"{ns}C{p}") for c, p in edges}
            for d, (named, _) in bodies.items():
                want_base |= {(f"{ns}C{d}", f"{ns}C{m}") for m in named}
            want_inferred = {
                (f"{ns}C{x}", f"{ns}C{d}")
                for x, d in self._model(n, edges, exists, bodies)
            }
            assert got_edges == want_base | want_inferred, (
                xml, sorted(got_edges - want_base - want_inferred),
                sorted((want_base | want_inferred) - got_edges),
            )

        check()


class TestNegativeSliceProperty:
    """Property-based check of the ∀/¬∃ (closure-axiom) membership slice
    on RANDOM ontologies vs an independent whole-graph fixpoint model
    written straight from the spec. Parser-only — no Spark, cheap."""

    NS = "http://ex/ng#"

    @classmethod
    def _render(cls, n, edges, disjoints, exists, univs, bodies) -> str:
        ns = cls.NS
        parts = [
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
            '<owl:Ontology rdf:about="http://ex/ng"/>',
        ]

        def rest_univ(p, fillers):
            if len(fillers) == 1:
                fv = f'<owl:allValuesFrom rdf:resource="{ns}C{fillers[0]}"/>'
            else:
                inner = "".join(
                    f'<rdf:Description rdf:about="{ns}C{f}"/>' for f in fillers
                )
                fv = (
                    "<owl:allValuesFrom><owl:Class>"
                    '<owl:unionOf rdf:parseType="Collection">'
                    + inner
                    + "</owl:unionOf></owl:Class></owl:allValuesFrom>"
                )
            return (
                "<owl:Restriction>"
                f'<owl:onProperty rdf:resource="{ns}p{p}"/>' + fv
                + "</owl:Restriction>"
            )

        for i in range(n):
            body = [f"<rdfs:label>c{i}</rdfs:label>"]
            for c, p in edges:
                if c == i:
                    body.append(f'<rdfs:subClassOf rdf:resource="{ns}C{p}"/>')
            for a, b in disjoints:
                if a == i:
                    body.append(f'<owl:disjointWith rdf:resource="{ns}C{b}"/>')
            for c, p, f in exists:
                if c == i:
                    body.append(
                        "<rdfs:subClassOf><owl:Restriction>"
                        f'<owl:onProperty rdf:resource="{ns}p{p}"/>'
                        f'<owl:someValuesFrom rdf:resource="{ns}C{f}"/>'
                        "</owl:Restriction></rdfs:subClassOf>"
                    )
            for c, p, fillers in univs:
                if c == i:
                    body.append(
                        "<rdfs:subClassOf>" + rest_univ(p, fillers)
                        + "</rdfs:subClassOf>"
                    )
            if i in bodies:
                members = []
                for kind, *rest in bodies[i]:
                    if kind == "named":
                        members.append(
                            f'<rdf:Description rdf:about="{ns}C{rest[0]}"/>'
                        )
                    elif kind == "only":
                        members.append(rest_univ(rest[0], rest[1]))
                    elif kind == "exists":
                        members.append(
                            "<owl:Restriction>"
                            f'<owl:onProperty rdf:resource="{ns}p{rest[0]}"/>'
                            f'<owl:someValuesFrom rdf:resource="{ns}C{rest[1]}"/>'
                            "</owl:Restriction>"
                        )
                    elif kind == "not_exists":
                        members.append(
                            "<owl:Class><owl:complementOf><owl:Restriction>"
                            f'<owl:onProperty rdf:resource="{ns}p{rest[0]}"/>'
                            f'<owl:someValuesFrom rdf:resource="{ns}C{rest[1]}"/>'
                            "</owl:Restriction></owl:complementOf></owl:Class>"
                        )
                    elif kind == "not_named":
                        members.append(
                            "<owl:Class>"
                            f'<owl:complementOf rdf:resource="{ns}C{rest[0]}"/>'
                            "</owl:Class>"
                        )
                    else:  # min_n (unqualified)
                        members.append(
                            "<owl:Restriction>"
                            f'<owl:onProperty rdf:resource="{ns}p{rest[0]}"/>'
                            '<owl:minCardinality rdf:datatype='
                            '"http://www.w3.org/2001/XMLSchema#nonNegativeInteger">'
                            f"{rest[1]}</owl:minCardinality>"
                            "</owl:Restriction>"
                        )
                body.append(
                    "<owl:equivalentClass><owl:Class>"
                    '<owl:intersectionOf rdf:parseType="Collection">'
                    + "".join(members)
                    + "</owl:intersectionOf></owl:Class></owl:equivalentClass>"
                )
            parts.append(
                f'<owl:Class rdf:about="{ns}C{i}">' + "".join(body) + "</owl:Class>"
            )
        parts.append("</rdf:RDF>")
        return "".join(parts)

    @staticmethod
    def _model(n, edges, disjoints, exists, univs, bodies):
        from collections import defaultdict

        parents = defaultdict(set)
        for c, p in edges:
            parents[c].add(p)
        have_e = defaultdict(set)
        for c, p, f in exists:
            have_e[c].add((p, f))
        have_u = defaultdict(set)
        for c, p, fs in univs:
            have_u[c].add((p, tuple(fs)))
        have_n = defaultdict(set)  # told negations ¬∃p.F per class
        have_any = defaultdict(set)  # told "some p-successor" (filler opt.)
        for c, p, f in exists:
            have_any[c].add((p, f))
        for d, conj in bodies.items():
            for kind, *rest in conj:
                if kind == "named":
                    parents[d].add(rest[0])
                elif kind == "only":
                    have_u[d].add((rest[0], tuple(rest[1])))
                elif kind == "exists":
                    # the body's ∃ conjunct is also a told fact about d
                    have_e[d].add((rest[0], rest[1]))
                    have_any[d].add((rest[0], rest[1]))
                elif kind == "not_exists":
                    have_n[d].add((rest[0], rest[1]))
                elif kind == "min_n":
                    # ≥n p told-implies "has some p-successor" (no filler)
                    have_any[d].add((rest[0], None))
        dj = {tuple(sorted(x)) for x in disjoints}

        def anc(i):
            out, todo = {i}, [i]
            while todo:
                for p in parents[todo.pop()]:
                    if p not in out:
                        out.add(p)
                        todo.append(p)
            return out

        def pair_unsat(a, b):
            return any(
                tuple(sorted((x, y))) in dj for x in anc(a) for y in anc(b)
            )

        told_anc = {x: anc(x) for x in range(n)}
        changed = True
        while changed:
            changed = False
            for d, conj in bodies.items():
                for x in range(n):
                    a = anc(x)
                    if x == d or d in a:
                        continue
                    es = set().union(*(have_e[y] for y in a))
                    us = set().union(*(have_u[y] for y in a))
                    ok = True
                    for kind, *rest in conj:
                        if kind == "named":
                            ok = rest[0] in a
                        elif kind == "exists":
                            ok = any(p == rest[0] and rest[1] in anc(f)
                                     for p, f in es)
                        elif kind == "only":
                            ok = any(
                                p == rest[0]
                                and all(any(c in anc(dd) for c in rest[1])
                                        for dd in ds)
                                for p, ds in us
                            )
                        elif kind == "not_exists":
                            xn_own = set().union(*(have_n[y] for y in a))
                            ok = any(
                                p == rest[0]
                                and all(pair_unsat(dd, rest[1]) for dd in ds)
                                for p, ds in us
                            ) or any(
                                p == rest[0] and f in anc(rest[1])
                                for p, f in xn_own
                            )
                        elif kind == "min_n":
                            import itertools as _it

                            p_req, n_req = rest
                            fillers = {f for p, f in es if p == p_req}
                            if n_req == 1:
                                pool = set().union(*(have_any[y] for y in a))
                                ok = any(p == p_req for p, _f in pool)
                            else:
                                ok = any(
                                    all(pair_unsat(x1, x2)
                                        for x1, x2 in _it.combinations(sub, 2))
                                    for sub in _it.combinations(
                                        sorted(fillers), n_req)
                                )
                        else:  # not_named: prove x ⊓ V unsat
                            v = rest[0]
                            av = anc(v)
                            ve = set().union(*(have_e[y] for y in av))
                            vn = set().union(*(have_n[y] for y in av))
                            xn = set().union(*(have_n[y] for y in a))
                            clash = any(
                                pn == pe and fn in anc(ge)
                                for pn, fn in vn for pe, ge in es
                            ) or any(
                                pn == pe and fn in anc(ge)
                                for pn, fn in xn for pe, ge in ve
                            )
                            disjoint = any(
                                tuple(sorted((p_, q_))) in dj
                                for p_ in a for q_ in av
                            )
                            ok = clash or disjoint
                        if not ok:
                            break
                    if ok:
                        parents[x].add(d)
                        changed = True
        return {
            (x, d)
            for x in range(n)
            for d in bodies
            if d != x and d in anc(x) and d not in told_anc[x]
        }

    def test_property_random_graphs(self, tmp_path):
        import random as _random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(st.integers(0, 10**9))
        def check(seed):
            rng = _random.Random(seed)
            n = rng.randint(5, 10)
            edges = [
                (i, rng.randrange(i)) for i in range(1, n) if rng.random() < 0.5
            ]
            disjoints = [
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(1, 3))
            ]
            n_props = 2
            exists = [
                (rng.randrange(n), rng.randrange(n_props), rng.randrange(n))
                for _ in range(rng.randint(0, 3))
            ]
            univs = [
                (rng.randrange(n), rng.randrange(n_props),
                 tuple(sorted(set(rng.sample(range(n), rng.randint(1, 2))))))
                for _ in range(rng.randint(0, 3))
            ]
            bodies = {}
            for _ in range(rng.randint(1, 3)):
                d = rng.randrange(n)
                conj = []
                for _ in range(rng.randint(1, 3)):
                    kind = rng.choice(
                        ["named", "exists", "only", "not_exists", "not_named", "min_n"]
                    )
                    if kind == "named":
                        others = [i for i in range(n) if i != d]
                        conj.append(("named", rng.choice(others)))
                    elif kind == "exists":
                        conj.append(("exists", rng.randrange(n_props),
                                     rng.randrange(n)))
                    elif kind == "only":
                        conj.append(("only", rng.randrange(n_props),
                                     tuple(sorted(set(rng.sample(
                                         range(n), rng.randint(1, 2)))))))
                    elif kind == "not_exists":
                        conj.append(("not_exists", rng.randrange(n_props),
                                     rng.randrange(n)))
                    elif kind == "not_named":
                        conj.append(("not_named",
                                     rng.choice([i for i in range(n) if i != d])))
                    else:
                        conj.append(("min_n", rng.randrange(n_props),
                                     rng.randint(1, 3)))
                bodies[d] = conj
            xml = self._render(n, edges, disjoints, exists, univs, bodies)
            f = tmp_path / f"ng{seed}.owl"
            f.write_text(xml)
            parsed = parse_owl_xml(str(f), include_object_properties=False)
            ns = self.NS
            got_edges = {
                (e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges
            }
            want_base = {(f"{ns}C{c}", f"{ns}C{p}") for c, p in edges}
            for d, conj in bodies.items():
                for kind, *rest in conj:
                    if kind == "named":
                        want_base.add((f"{ns}C{d}", f"{ns}C{rest[0]}"))
            want_inf = {
                (f"{ns}C{x}", f"{ns}C{d}")
                for x, d in self._model(n, edges, disjoints, exists, univs, bodies)
            }
            assert got_edges == want_base | want_inf, (
                xml,
                sorted(got_edges - want_base - want_inf),
                sorted((want_base | want_inf) - got_edges),
            )

        check()


def test_negation_subsumption_route(tmp_path):
    """¬∃p.G is satisfied by an INHERITED told negation ¬∃p.F with
    G ⊑ F (no successor in the broader F ⇒ none in the narrower G):
    X ⊑ D1(≡ A ⊓ ¬∃p.F) makes X inherit the negation, landing X under
    D2 ≡ A ⊓ ¬∃p.G without any universal axiom."""
    ns = "http://ex/nr#"
    f = tmp_path / "nr.owl"
    f.write_text(
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/nr"/>'
        f'<owl:Class rdf:about="{ns}A"><rdfs:label>A</rdfs:label></owl:Class>'
        f'<owl:Class rdf:about="{ns}F"><rdfs:label>F</rdfs:label></owl:Class>'
        f'<owl:Class rdf:about="{ns}G"><rdfs:label>G</rdfs:label>'
        f'<rdfs:subClassOf rdf:resource="{ns}F"/></owl:Class>'
        f'<owl:Class rdf:about="{ns}D1"><rdfs:label>D1</rdfs:label>'
        "<owl:equivalentClass><owl:Class>"
        '<owl:intersectionOf rdf:parseType="Collection">'
        f'<rdf:Description rdf:about="{ns}A"/>'
        "<owl:Class><owl:complementOf><owl:Restriction>"
        f'<owl:onProperty rdf:resource="{ns}p"/>'
        f'<owl:someValuesFrom rdf:resource="{ns}F"/>'
        "</owl:Restriction></owl:complementOf></owl:Class>"
        "</owl:intersectionOf></owl:Class></owl:equivalentClass></owl:Class>"
        f'<owl:Class rdf:about="{ns}D2"><rdfs:label>D2</rdfs:label>'
        "<owl:equivalentClass><owl:Class>"
        '<owl:intersectionOf rdf:parseType="Collection">'
        f'<rdf:Description rdf:about="{ns}A"/>'
        "<owl:Class><owl:complementOf><owl:Restriction>"
        f'<owl:onProperty rdf:resource="{ns}p"/>'
        f'<owl:someValuesFrom rdf:resource="{ns}G"/>'
        "</owl:Restriction></owl:complementOf></owl:Class>"
        "</owl:intersectionOf></owl:Class></owl:equivalentClass></owl:Class>"
        f'<owl:Class rdf:about="{ns}X"><rdfs:label>X</rdfs:label>'
        f'<rdfs:subClassOf rdf:resource="{ns}D1"/></owl:Class>'
        "</rdf:RDF>"
    )
    parsed = parse_owl_xml(str(f))
    edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
             for e in parsed.tables.edges}
    assert ("X", "D2") in edges        # via inherited ¬∃p.F, G ⊑ F
    assert ("D1", "D2") in edges       # D1 itself satisfies D2's body
    assert ("D2", "D1") not in edges   # ¬∃p.G does NOT imply ¬∃p.F


class TestInverseOfSlice:
    """Told owl:inverseOf pairing (round-5 item #6): the told property
    hierarchy propagates through inverse pairs — p ⊑* q with told
    inverses p⁻, q⁻ entails p⁻ ⊑* q⁻ — and multiple told inverses of one
    property are mutually equivalent. Sound additions only; the pizza/duo
    membership suites above are the no-change regression gate."""

    NS = "http://ex/inv#"

    def _doc(self, with_inverses: bool) -> str:
        ns = self.NS
        inv_p = (f'<owl:inverseOf rdf:resource="{ns}pi"/>' if with_inverses else "")
        inv_q = (f'<owl:inverseOf rdf:resource="{ns}qi"/>' if with_inverses else "")
        return (
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/inv"/>'
            f'<owl:ObjectProperty rdf:about="{ns}p">'
            f'<rdfs:subPropertyOf rdf:resource="{ns}q"/>{inv_p}'
            "</owl:ObjectProperty>"
            f'<owl:ObjectProperty rdf:about="{ns}q">{inv_q}</owl:ObjectProperty>'
            f'<owl:ObjectProperty rdf:about="{ns}pi"/>'
            f'<owl:ObjectProperty rdf:about="{ns}qi"/>'
            f'<owl:Class rdf:about="{ns}A"><rdfs:label>A</rdfs:label></owl:Class>'
            f'<owl:Class rdf:about="{ns}B"><rdfs:label>B</rdfs:label></owl:Class>'
            f'<owl:Class rdf:about="{ns}D"><rdfs:label>D</rdfs:label>'
            "<owl:equivalentClass><owl:Class>"
            '<owl:intersectionOf rdf:parseType="Collection">'
            f'<rdf:Description rdf:about="{ns}A"/>'
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}qi"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}B"/>'
            "</owl:Restriction>"
            "</owl:intersectionOf></owl:Class></owl:equivalentClass></owl:Class>"
            f'<owl:Class rdf:about="{ns}X"><rdfs:label>X</rdfs:label>'
            f'<rdfs:subClassOf rdf:resource="{ns}A"/>'
            "<rdfs:subClassOf><owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}pi"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}B"/>'
            "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            "</rdf:RDF>"
        )

    def test_membership_through_inverse_propagated_hierarchy(self, tmp_path):
        """X ⊑ A ⊓ ∃pi.B classifies under D ≡ A ⊓ ∃qi.B ONLY because
        p ⊑ q + inverseOf(p,pi) + inverseOf(q,qi) entail pi ⊑ qi."""
        f = tmp_path / "inv.owl"
        f.write_text(self._doc(with_inverses=True))
        parsed = parse_owl_xml(str(f))
        edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
                 for e in parsed.tables.edges}
        assert ("X", "D") in edges
        # the inverse-derived pi ⊑ qi property edge is classifier-internal,
        # never emitted as a told parent row
        assert ("pi", "qi") not in edges

    def test_no_inverses_no_membership(self, tmp_path):
        """Control: identical ontology without the inverseOf declarations
        must NOT classify X under D (pi and qi are unrelated told
        properties) — proves the new edge comes from the slice, soundly."""
        f = tmp_path / "noinv.owl"
        f.write_text(self._doc(with_inverses=False))
        parsed = parse_owl_xml(str(f))
        edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
                 for e in parsed.tables.edges}
        assert ("X", "D") not in edges

    def test_multiple_inverses_mutually_equivalent(self, tmp_path):
        """inverseOf(p, a) + inverseOf(p, b) ⇒ a ≡ b: a told ∃b.F
        satisfies a body's ∃a.F conjunct."""
        ns = self.NS
        f = tmp_path / "multi.owl"
        f.write_text(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/inv"/>'
            f'<owl:ObjectProperty rdf:about="{ns}p">'
            f'<owl:inverseOf rdf:resource="{ns}a"/>'
            f'<owl:inverseOf rdf:resource="{ns}b"/>'
            "</owl:ObjectProperty>"
            f'<owl:ObjectProperty rdf:about="{ns}a"/>'
            f'<owl:ObjectProperty rdf:about="{ns}b"/>'
            f'<owl:Class rdf:about="{ns}F"><rdfs:label>F</rdfs:label></owl:Class>'
            f'<owl:Class rdf:about="{ns}D"><rdfs:label>D</rdfs:label>'
            "<owl:equivalentClass><owl:Class>"
            '<owl:intersectionOf rdf:parseType="Collection">'
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}a"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}F"/>'
            "</owl:Restriction>"
            "</owl:intersectionOf></owl:Class></owl:equivalentClass></owl:Class>"
            f'<owl:Class rdf:about="{ns}X"><rdfs:label>X</rdfs:label>'
            "<rdfs:subClassOf><owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}b"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}F"/>'
            "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            "</rdf:RDF>"
        )
        parsed = parse_owl_xml(str(f))
        edges = {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
                 for e in parsed.tables.edges}
        assert ("X", "D") in edges


class TestInverseSliceProperty:
    """Property-based check of the inverse-saturated membership
    classifier on RANDOM ontologies vs an independent fixpoint model
    extended with the inverse rule (round-5 item #6's done-criterion)."""

    NS = "http://ex/ip#"

    def _render(self, n, edges, prop_edges, inverses, exists, bodies) -> str:
        ns = self.NS
        parts = [
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
            '<owl:Ontology rdf:about="http://ex/ip"/>',
        ]
        all_props = sorted({p for p, _ in prop_edges}
                           | {q for _, q in prop_edges}
                           | set(inverses) | {v for v in inverses.values()}
                           | {p for _, p, _ in exists}
                           | {p for b in bodies.values() for p, _ in b[1]})
        for pr in all_props:
            body = []
            for c, p in prop_edges:
                if c == pr:
                    body.append(f'<rdfs:subPropertyOf rdf:resource="{ns}{p}"/>')
            if pr in inverses:
                body.append(f'<owl:inverseOf rdf:resource="{ns}{inverses[pr]}"/>')
            parts.append(
                f'<owl:ObjectProperty rdf:about="{ns}{pr}">'
                + "".join(body) + "</owl:ObjectProperty>"
            )
        for i in range(n):
            body = [f"<rdfs:label>c{i}</rdfs:label>"]
            for c, p in edges:
                if c == i:
                    body.append(f'<rdfs:subClassOf rdf:resource="{ns}C{p}"/>')
            for c, prop, filler in exists:
                if c == i:
                    body.append(
                        "<rdfs:subClassOf><owl:Restriction>"
                        f'<owl:onProperty rdf:resource="{ns}{prop}"/>'
                        f'<owl:someValuesFrom rdf:resource="{ns}C{filler}"/>'
                        "</owl:Restriction></rdfs:subClassOf>"
                    )
            if i in bodies:
                named, ex = bodies[i]
                members = [
                    f'<rdf:Description rdf:about="{ns}C{m}"/>' for m in named
                ] + [
                    "<owl:Restriction>"
                    f'<owl:onProperty rdf:resource="{ns}{p}"/>'
                    f'<owl:someValuesFrom rdf:resource="{ns}C{f}"/>'
                    "</owl:Restriction>"
                    for p, f in ex
                ]
                body.append(
                    "<owl:equivalentClass><owl:Class>"
                    '<owl:intersectionOf rdf:parseType="Collection">'
                    + "".join(members)
                    + "</owl:intersectionOf></owl:Class></owl:equivalentClass>"
                )
            parts.append(
                f'<owl:Class rdf:about="{ns}C{i}">' + "".join(body) + "</owl:Class>"
            )
        parts.append("</rdf:RDF>")
        return "".join(parts)

    @staticmethod
    def _model(n, edges, prop_edges, inverses, exists, bodies):
        """Independent fixpoint: saturate the property graph with the
        inverse rule (p ⊑* q ∧ inv(p), inv(q) told ⇒ inv(p) ⊑ inv(q)),
        then run the membership fixpoint with property-hierarchy-aware
        existential matching."""
        from collections import defaultdict

        panc_edges = defaultdict(set)
        for c, p in prop_edges:
            panc_edges[c].add(p)
        inv = dict(inverses)
        inv.update({v: k for k, v in inverses.items()})

        def preach(p):
            out, todo = {p}, [p]
            while todo:
                for q in panc_edges[todo.pop()]:
                    if q not in out:
                        out.add(q)
                        todo.append(q)
            return out

        changed = True
        while changed:
            changed = False
            for p in list(inv):
                for q in preach(p):
                    if q in inv and inv[q] not in preach(inv[p]):
                        panc_edges[inv[p]].add(inv[q])
                        changed = True

        parents = defaultdict(set)
        for c, p in edges:
            parents[c].add(p)
        have = defaultdict(set)
        for c, p, f in exists:
            have[c].add((p, f))
        for d, (named, ex) in bodies.items():
            parents[d].update(named)
            have[d].update(ex)

        def anc(i):
            out, todo = {i}, [i]
            while todo:
                for p in parents[todo.pop()]:
                    if p not in out:
                        out.add(p)
                        todo.append(p)
            return out

        told_anc = {x: anc(x) for x in range(n)}
        changed = True
        while changed:
            changed = False
            for d, (named, ex) in bodies.items():
                for x in range(n):
                    a = anc(x)
                    if x == d or d in a:
                        continue
                    mine = set().union(*(have[y] for y in a))
                    ok = all(m in a for m in named) and all(
                        any(p_req in preach(p_have) and f_req in anc(f_have)
                            for p_have, f_have in mine)
                        for p_req, f_req in ex
                    )
                    if ok:
                        parents[x].add(d)
                        changed = True
        return {
            (x, d)
            for x in range(n)
            for d in bodies
            if d != x and d in anc(x) and d not in told_anc[x]
        }

    def test_property_random_graphs(self, tmp_path):
        import random as _random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        ns = self.NS

        @settings(max_examples=40, deadline=None)
        @given(st.integers(0, 10**9))
        def check(seed):
            rng = _random.Random(seed)
            n = rng.randint(4, 8)
            edges = [
                (i, rng.randrange(i)) for i in range(1, n) if rng.random() < 0.5
            ]
            n_base = rng.randint(2, 3)
            base = [f"p{i}" for i in range(n_base)]
            prop_edges = [
                (base[i], base[rng.randrange(i)])
                for i in range(1, n_base) if rng.random() < 0.7
            ]
            # at most one told inverse per base property
            inverses = {
                b: f"i{k}" for k, b in enumerate(base) if rng.random() < 0.7
            }
            pool = base + list(inverses.values())
            exists = [
                (rng.randrange(n), rng.choice(pool), rng.randrange(n))
                for _ in range(rng.randint(0, 4))
            ]
            bodies = {}
            for _ in range(rng.randint(1, 3)):
                d = rng.randrange(n)
                named = rng.sample([i for i in range(n) if i != d],
                                   rng.randint(0, 1))
                ex = [
                    (rng.choice(pool), rng.randrange(n))
                    for _ in range(rng.randint(0, 2))
                ]
                if named or ex:
                    bodies[d] = (named, ex)
            xml = self._render(n, edges, prop_edges, inverses, exists, bodies)
            f = tmp_path / f"ip{seed}.owl"
            f.write_text(xml)
            parsed = parse_owl_xml(str(f), include_object_properties=False)
            got = {
                (e["child_iri"], e["parent_iri"])
                for e in parsed.tables.edges
            }
            want_base = {(f"{ns}C{c}", f"{ns}C{p}") for c, p in edges}
            for d, (named, _) in bodies.items():
                want_base |= {(f"{ns}C{d}", f"{ns}C{m}") for m in named}
            want_inferred = {
                (f"{ns}C{x}", f"{ns}C{d}")
                for x, d in self._model(n, edges, prop_edges, inverses,
                                        exists, bodies)
            }
            assert got == want_base | want_inferred, (
                xml, sorted(got - want_base - want_inferred),
                sorted((want_base | want_inferred) - got),
            )

        check()


class TestPropertyChainSlice:
    """Told owl:propertyChainAxiom / owl:TransitiveProperty slice
    (round-5): p1∘…∘pk ⊑ r lets the classifier derive X ⊑ ∃r.G from a
    told existential successor path X —p1'→ F1 —…—pk'→ G with each
    pi' ⊑* pi. Sound additions only; the pizza/duo membership suites
    above are the no-change regression gate."""

    NS = "http://ex/ch#"

    def _chain_doc(self, with_chain: bool, sub_step: bool = False) -> str:
        """Pizza ⊑ ∃t(.Sub)?.Cheese, Cheese ⊑ ∃i.Milk, chain t∘i ⊑ r,
        D ≡ ∃r.Milk."""
        ns = self.NS
        chain = (
            '<owl:propertyChainAxiom rdf:parseType="Collection">'
            f'<owl:ObjectProperty rdf:about="{ns}t"/>'
            f'<owl:ObjectProperty rdf:about="{ns}i"/>'
            "</owl:propertyChainAxiom>"
        ) if with_chain else ""
        t_used = "tSub" if sub_step else "t"
        return (
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/ch"/>'
            f'<owl:ObjectProperty rdf:about="{ns}t"/>'
            f'<owl:ObjectProperty rdf:about="{ns}tSub">'
            f'<rdfs:subPropertyOf rdf:resource="{ns}t"/></owl:ObjectProperty>'
            f'<owl:ObjectProperty rdf:about="{ns}i"/>'
            f'<owl:ObjectProperty rdf:about="{ns}r">{chain}</owl:ObjectProperty>'
            f'<owl:Class rdf:about="{ns}Milk"><rdfs:label>Milk</rdfs:label></owl:Class>'
            f'<owl:Class rdf:about="{ns}Cheese"><rdfs:label>Cheese</rdfs:label>'
            "<rdfs:subClassOf><owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}i"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}Milk"/>'
            "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            f'<owl:Class rdf:about="{ns}Pizza"><rdfs:label>Pizza</rdfs:label>'
            "<rdfs:subClassOf><owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}{t_used}"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}Cheese"/>'
            "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            f'<owl:Class rdf:about="{ns}D"><rdfs:label>D</rdfs:label>'
            "<owl:equivalentClass><owl:Class>"
            '<owl:intersectionOf rdf:parseType="Collection">'
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}r"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}Milk"/>'
            "</owl:Restriction>"
            "</owl:intersectionOf></owl:Class></owl:equivalentClass></owl:Class>"
            "</rdf:RDF>"
        )

    def _short_edges(self, path):
        parsed = parse_owl_xml(str(path))
        return {(e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
                for e in parsed.tables.edges}

    def test_chain_membership(self, tmp_path):
        """Pizza ⊑ ∃t.Cheese ⊓ (Cheese ⊑ ∃i.Milk) + t∘i ⊑ r classifies
        Pizza under D ≡ ∃r.Milk."""
        f = tmp_path / "ch.owl"
        f.write_text(self._chain_doc(with_chain=True))
        assert ("Pizza", "D") in self._short_edges(f)

    def test_chain_membership_through_subproperty_step(self, tmp_path):
        """The chain fires when Pizza's told existential uses tSub ⊑ t —
        each chain step matches any told SUBproperty of it."""
        f = tmp_path / "chs.owl"
        f.write_text(self._chain_doc(with_chain=True, sub_step=True))
        assert ("Pizza", "D") in self._short_edges(f)

    def test_no_chain_no_membership(self, tmp_path):
        """Control: identical ontology without the propertyChainAxiom
        must NOT classify Pizza under D (r is an unrelated property)."""
        f = tmp_path / "chn.owl"
        f.write_text(self._chain_doc(with_chain=False))
        edges = self._short_edges(f)
        assert ("Pizza", "D") not in edges
        assert ("Cheese", "D") not in edges

    def _transitive_doc(self, form: str) -> str:
        """X ⊑ ∃g.A, A ⊑ ∃g.B, B ⊑ ∃g.C, g transitive, D ≡ ∃g.C —
        needs TWO chain applications (derived fact seeds the next)."""
        ns = self.NS
        if form == "element":
            prop = f'<owl:TransitiveProperty rdf:about="{ns}g"/>'
        elif form == "type":
            prop = (
                f'<owl:ObjectProperty rdf:about="{ns}g">'
                '<rdf:type rdf:resource='
                '"http://www.w3.org/2002/07/owl#TransitiveProperty"/>'
                "</owl:ObjectProperty>"
            )
        else:  # control: plain property
            prop = f'<owl:ObjectProperty rdf:about="{ns}g"/>'
        def ex(c, filler):
            return (
                f'<owl:Class rdf:about="{ns}{c}"><rdfs:label>{c}</rdfs:label>'
                "<rdfs:subClassOf><owl:Restriction>"
                f'<owl:onProperty rdf:resource="{ns}g"/>'
                f'<owl:someValuesFrom rdf:resource="{ns}{filler}"/>'
                "</owl:Restriction></rdfs:subClassOf></owl:Class>"
            )
        return (
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
            '<owl:Ontology rdf:about="http://ex/ch"/>'
            + prop
            + f'<owl:Class rdf:about="{ns}C"><rdfs:label>C</rdfs:label></owl:Class>'
            + ex("X", "A") + ex("A", "B") + ex("B", "C")
            + f'<owl:Class rdf:about="{ns}D"><rdfs:label>D</rdfs:label>'
            "<owl:equivalentClass><owl:Class>"
            '<owl:intersectionOf rdf:parseType="Collection">'
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}g"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}C"/>'
            "</owl:Restriction>"
            "</owl:intersectionOf></owl:Class></owl:equivalentClass></owl:Class>"
            "</rdf:RDF>"
        )

    @pytest.mark.parametrize("form", ["element", "type"])
    def test_transitive_multi_hop(self, tmp_path, form):
        """Transitivity = g∘g ⊑ g; the 3-hop path X→A→B→C needs the
        DERIVED ∃g.C fact to come from a previously-derived ∃g.B — the
        chain and membership fixpoints must run jointly."""
        f = tmp_path / f"tr_{form}.owl"
        f.write_text(self._transitive_doc(form))
        edges = self._short_edges(f)
        assert ("X", "D") in edges
        assert ("A", "D") in edges  # A→B→C two-hop
        assert ("B", "D") in edges  # told one-hop ∃g.C
        assert ("C", "D") not in edges  # C has no told g-successor

    def test_not_transitive_control(self, tmp_path):
        f = tmp_path / "tr_none.owl"
        f.write_text(self._transitive_doc("none"))
        edges = self._short_edges(f)
        assert ("X", "D") not in edges
        assert ("A", "D") not in edges
        assert ("B", "D") in edges  # the told direct fact still classifies


class TestChainSliceProperty:
    """Property-based check of chain-saturated membership classification
    on RANDOM ontologies vs an independent fixpoint model extended with
    the chain rule (mirrors TestInverseSliceProperty's done-criterion)."""

    NS = "http://ex/cp#"

    def _render(self, n, edges, prop_edges, chains, exists, bodies) -> str:
        ns = self.NS
        parts = [
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
            '<owl:Ontology rdf:about="http://ex/cp"/>',
        ]
        all_props = sorted(
            {p for p, _ in prop_edges} | {q for _, q in prop_edges}
            | {p for ch, _ in chains for p in ch} | {r for _, r in chains}
            | {p for _, p, _ in exists}
            | {p for b in bodies.values() for p, _ in b[1]}
        )
        for pr in all_props:
            body = []
            for c, p in prop_edges:
                if c == pr:
                    body.append(f'<rdfs:subPropertyOf rdf:resource="{ns}{p}"/>')
            for ch, r in chains:
                if r == pr:
                    body.append(
                        '<owl:propertyChainAxiom rdf:parseType="Collection">'
                        + "".join(
                            f'<owl:ObjectProperty rdf:about="{ns}{m}"/>'
                            for m in ch
                        )
                        + "</owl:propertyChainAxiom>"
                    )
            parts.append(
                f'<owl:ObjectProperty rdf:about="{ns}{pr}">'
                + "".join(body) + "</owl:ObjectProperty>"
            )
        for i in range(n):
            body = [f"<rdfs:label>c{i}</rdfs:label>"]
            for c, p in edges:
                if c == i:
                    body.append(f'<rdfs:subClassOf rdf:resource="{ns}C{p}"/>')
            for c, prop, filler in exists:
                if c == i:
                    body.append(
                        "<rdfs:subClassOf><owl:Restriction>"
                        f'<owl:onProperty rdf:resource="{ns}{prop}"/>'
                        f'<owl:someValuesFrom rdf:resource="{ns}C{filler}"/>'
                        "</owl:Restriction></rdfs:subClassOf>"
                    )
            if i in bodies:
                named, ex = bodies[i]
                members = [
                    f'<rdf:Description rdf:about="{ns}C{m}"/>' for m in named
                ] + [
                    "<owl:Restriction>"
                    f'<owl:onProperty rdf:resource="{ns}{p}"/>'
                    f'<owl:someValuesFrom rdf:resource="{ns}C{f}"/>'
                    "</owl:Restriction>"
                    for p, f in ex
                ]
                body.append(
                    "<owl:equivalentClass><owl:Class>"
                    '<owl:intersectionOf rdf:parseType="Collection">'
                    + "".join(members)
                    + "</owl:intersectionOf></owl:Class></owl:equivalentClass>"
                )
            parts.append(
                f'<owl:Class rdf:about="{ns}C{i}">' + "".join(body) + "</owl:Class>"
            )
        parts.append("</rdf:RDF>")
        return "".join(parts)

    @staticmethod
    def _model(n, edges, prop_edges, chains, exists, bodies):
        """Independent fixpoint with the chain rule: for p1∘…∘pk ⊑ r,
        a told successor path through sub-properties of each step adds
        (r, last-filler) to the class's exists facts; run jointly with
        membership to fixpoint."""
        from collections import defaultdict

        panc_edges = defaultdict(set)
        for c, p in prop_edges:
            panc_edges[c].add(p)

        def preach(p):
            out, todo = {p}, [p]
            while todo:
                for q in panc_edges[todo.pop()]:
                    if q not in out:
                        out.add(q)
                        todo.append(q)
            return out

        parents = defaultdict(set)
        for c, p in edges:
            parents[c].add(p)
        have = defaultdict(set)
        for c, p, f in exists:
            have[c].add((p, f))
        for d, (named, ex) in bodies.items():
            parents[d].update(named)
            have[d].update(ex)

        def anc(i):
            out, todo = {i}, [i]
            while todo:
                for p in parents[todo.pop()]:
                    if p not in out:
                        out.add(p)
                        todo.append(p)
            return out

        told_anc = {x: anc(x) for x in range(n)}
        changed = True
        while changed:
            changed = False
            for ch, r in chains:
                for x in range(n):
                    frontier = {x}
                    for step in ch:
                        frontier = {
                            f for cur in frontier for y in anc(cur)
                            for p, f in have[y] if step in preach(p)
                        }
                        if not frontier:
                            break
                    for g in frontier:
                        if (r, g) not in have[x]:
                            have[x].add((r, g))
                            changed = True
            for d, (named, ex) in bodies.items():
                for x in range(n):
                    a = anc(x)
                    if x == d or d in a:
                        continue
                    mine = set().union(*(have[y] for y in a))
                    ok = all(m in a for m in named) and all(
                        any(p_req in preach(p_have) and f_req in anc(f_have)
                            for p_have, f_have in mine)
                        for p_req, f_req in ex
                    )
                    if ok:
                        parents[x].add(d)
                        changed = True
        return {
            (x, d)
            for x in range(n)
            for d in bodies
            if d != x and d in anc(x) and d not in told_anc[x]
        }

    def test_property_random_graphs(self, tmp_path):
        import random as _random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        ns = self.NS

        @settings(max_examples=40, deadline=None)
        @given(st.integers(0, 10**9))
        def check(seed):
            rng = _random.Random(seed)
            n = rng.randint(4, 8)
            edges = [
                (i, rng.randrange(i)) for i in range(1, n) if rng.random() < 0.5
            ]
            n_base = rng.randint(2, 4)
            pool = [f"p{i}" for i in range(n_base)]
            prop_edges = [
                (pool[i], pool[rng.randrange(i)])
                for i in range(1, n_base) if rng.random() < 0.5
            ]
            chains = []
            for _ in range(rng.randint(1, 2)):
                k = rng.choice([2, 2, 3])
                ch = tuple(rng.choice(pool) for _ in range(k))
                chains.append((ch, rng.choice(pool)))
            # transitivity shows up as (p, p) ⊑ p half the time
            if rng.random() < 0.5:
                p = rng.choice(pool)
                chains.append(((p, p), p))
            exists = [
                (rng.randrange(n), rng.choice(pool), rng.randrange(n))
                for _ in range(rng.randint(1, 5))
            ]
            bodies = {}
            for _ in range(rng.randint(1, 3)):
                d = rng.randrange(n)
                named = rng.sample([i for i in range(n) if i != d],
                                   rng.randint(0, 1))
                ex = [
                    (rng.choice(pool), rng.randrange(n))
                    for _ in range(rng.randint(0, 2))
                ]
                if named or ex:
                    bodies[d] = (named, ex)
            xml = self._render(n, edges, prop_edges, chains, exists, bodies)
            f = tmp_path / f"cp{seed}.owl"
            f.write_text(xml)
            parsed = parse_owl_xml(str(f), include_object_properties=False)
            got = {
                (e["child_iri"], e["parent_iri"])
                for e in parsed.tables.edges
            }
            want_base = {(f"{ns}C{c}", f"{ns}C{p}") for c, p in edges}
            for d, (named, _) in bodies.items():
                want_base |= {(f"{ns}C{d}", f"{ns}C{m}") for m in named}
            want_inferred = {
                (f"{ns}C{x}", f"{ns}C{d}")
                for x, d in self._model(n, edges, prop_edges, chains,
                                        exists, bodies)
            }
            assert got == want_base | want_inferred, seed

        check()


class TestNestedBodySlice:
    """Told nested-restriction slice (round-5): defined-class body
    conjuncts ∃p.(anonymous filler) where the filler is a POSITIVE
    existential tree — intersectionOf / unionOf of named classes and
    nested someValuesFrom — are now checked recursively against told
    successors instead of making the whole body abstain. Fillers outside
    the positive fragment (complement, universal, cardinality) still
    abstain. The pizza/duo membership suites above are the no-change
    regression gate (pizza's bodies use only named fillers)."""

    NS = "http://ex/nb#"

    HEAD = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">'
        '<owl:Ontology rdf:about="http://ex/nb"/>'
    )

    def _props(self) -> str:
        ns = self.NS
        return (
            f'<owl:ObjectProperty rdf:about="{ns}h"/>'
            f'<owl:ObjectProperty rdf:about="{ns}hSub">'
            f'<rdfs:subPropertyOf rdf:resource="{ns}h"/></owl:ObjectProperty>'
            f'<owl:ObjectProperty rdf:about="{ns}g"/>'
            f'<owl:ObjectProperty rdf:about="{ns}gSub">'
            f'<rdfs:subPropertyOf rdf:resource="{ns}g"/></owl:ObjectProperty>'
        )

    def _cls(self, name: str, *body: str) -> str:
        return (
            f'<owl:Class rdf:about="{self.NS}{name}">'
            f"<rdfs:label>{name}</rdfs:label>" + "".join(body) + "</owl:Class>"
        )

    def _sub(self, parent: str) -> str:
        return f'<rdfs:subClassOf rdf:resource="{self.NS}{parent}"/>'

    def _sub_exists(self, prop: str, filler: str) -> str:
        ns = self.NS
        return (
            "<rdfs:subClassOf><owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}{prop}"/>'
            f'<owl:someValuesFrom rdf:resource="{ns}{filler}"/>'
            "</owl:Restriction></rdfs:subClassOf>"
        )

    def _defined(self, named: str, prop: str, filler_xml: str) -> str:
        """D ≡ named ⊓ ∃prop.(filler_xml) as an equivalentClass body."""
        ns = self.NS
        return (
            "<owl:equivalentClass><owl:Class>"
            '<owl:intersectionOf rdf:parseType="Collection">'
            f'<rdf:Description rdf:about="{ns}{named}"/>'
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}{prop}"/>'
            f"<owl:someValuesFrom>{filler_xml}</owl:someValuesFrom>"
            "</owl:Restriction>"
            "</owl:intersectionOf></owl:Class></owl:equivalentClass>"
        )

    def _and_of(self, *names: str) -> str:
        ns = self.NS
        return (
            '<owl:Class><owl:intersectionOf rdf:parseType="Collection">'
            + "".join(f'<rdf:Description rdf:about="{ns}{n}"/>' for n in names)
            + "</owl:intersectionOf></owl:Class>"
        )

    def _or_of(self, *names: str) -> str:
        ns = self.NS
        return (
            '<owl:Class><owl:unionOf rdf:parseType="Collection">'
            + "".join(f'<rdf:Description rdf:about="{ns}{n}"/>' for n in names)
            + "</owl:unionOf></owl:Class>"
        )

    def _some_of(self, prop: str, inner_xml: str | None = None,
                 named: str | None = None) -> str:
        ns = self.NS
        if named is not None:
            sv = f'<owl:someValuesFrom rdf:resource="{ns}{named}"/>'
        else:
            sv = f"<owl:someValuesFrom>{inner_xml}</owl:someValuesFrom>"
        return (
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}{prop}"/>{sv}'
            "</owl:Restriction>"
        )

    def _edges(self, doc: str, tmp_path) -> set[tuple[str, str]]:
        f = tmp_path / "nb.owl"
        f.write_text(doc + "</rdf:RDF>")
        parsed = parse_owl_xml(str(f), include_object_properties=False)
        return {
            (e["child_iri"].split("#")[-1], e["parent_iri"].split("#")[-1])
            for e in parsed.tables.edges
        }

    def _base(self, f_parents: tuple[str, ...] = ("A", "B"),
              defined_body: str = "") -> str:
        """Base ⊑ ∃hSub.F with F under f_parents; D ≡ Base ⊓ body."""
        return (
            self.HEAD + self._props()
            + self._cls("A") + self._cls("B") + self._cls("C")
            + self._cls("Base", self._sub_exists("hSub", "F"))
            + self._cls("F", *(self._sub(p) for p in f_parents))
            + self._cls("D", self._sub("Base"), defined_body)
        )

    def test_and_filler_member(self, tmp_path):
        doc = self._base(("A", "B"),
                         self._defined("Base", "h", self._and_of("A", "B")))
        assert ("Base", "D") in self._edges(doc, tmp_path)

    def test_and_filler_non_member(self, tmp_path):
        doc = self._base(("A",),
                         self._defined("Base", "h", self._and_of("A", "B")))
        assert ("Base", "D") not in self._edges(doc, tmp_path)

    def test_or_filler_member(self, tmp_path):
        doc = self._base(("B",),
                         self._defined("Base", "h", self._or_of("A", "B")))
        assert ("Base", "D") in self._edges(doc, tmp_path)

    def test_or_filler_non_member(self, tmp_path):
        doc = self._base(("C",),
                         self._defined("Base", "h", self._or_of("A", "B")))
        assert ("Base", "D") not in self._edges(doc, tmp_path)

    def test_nested_some_member(self, tmp_path):
        """D ≡ Base ⊓ ∃h.(∃g.C): F carries a told ∃gSub.G with G ⊑ C —
        the nested requirement is witnessed through BOTH subproperty
        steps and the filler's told subsumption."""
        doc = (
            self.HEAD + self._props()
            + self._cls("C") + self._cls("G", self._sub("C"))
            + self._cls("Base", self._sub_exists("hSub", "F"))
            + self._cls("F", self._sub_exists("gSub", "G"))
            + self._cls("D", self._sub("Base"),
                        self._defined("Base", "h",
                                      self._some_of("g", named="C")))
        )
        assert ("Base", "D") in self._edges(doc, tmp_path)

    def test_nested_some_via_filler_ancestor(self, tmp_path):
        """The nested existential may be told on an ANCESTOR of the
        successor: F ⊑ FA and FA ⊑ ∃g.C still witnesses ∃h.(∃g.C)."""
        doc = (
            self.HEAD + self._props()
            + self._cls("C")
            + self._cls("FA", self._sub_exists("g", "C"))
            + self._cls("Base", self._sub_exists("h", "F"))
            + self._cls("F", self._sub("FA"))
            + self._cls("D", self._sub("Base"),
                        self._defined("Base", "h",
                                      self._some_of("g", named="C")))
        )
        assert ("Base", "D") in self._edges(doc, tmp_path)

    def test_depth_two_tree(self, tmp_path):
        """D ≡ Base ⊓ ∃h.(A ⊓ ∃g.(B ∪ C)): and-over-nested-some-over-or,
        witnessed by F ⊑ A with told ∃g.G, G ⊑ C."""
        tree = (
            '<owl:Class><owl:intersectionOf rdf:parseType="Collection">'
            f'<rdf:Description rdf:about="{self.NS}A"/>'
            + self._some_of("g", inner_xml=self._or_of("B", "C"))
            + "</owl:intersectionOf></owl:Class>"
        )
        doc = (
            self.HEAD + self._props()
            + self._cls("A") + self._cls("B") + self._cls("C")
            + self._cls("G", self._sub("C"))
            + self._cls("Base", self._sub_exists("h", "F"))
            + self._cls("F", self._sub("A"), self._sub_exists("g", "G"))
            + self._cls("D", self._sub("Base"),
                        self._defined("Base", "h", tree))
        )
        assert ("Base", "D") in self._edges(doc, tmp_path)

    def test_depth_two_tree_non_member(self, tmp_path):
        """Same body, but G lands outside the inner union ⇒ abstain from
        membership (no unsound edge)."""
        tree = (
            '<owl:Class><owl:intersectionOf rdf:parseType="Collection">'
            f'<rdf:Description rdf:about="{self.NS}A"/>'
            + self._some_of("g", inner_xml=self._or_of("B", "C"))
            + "</owl:intersectionOf></owl:Class>"
        )
        doc = (
            self.HEAD + self._props()
            + self._cls("A") + self._cls("B") + self._cls("C")
            + self._cls("G")  # NOT under B or C
            + self._cls("Base", self._sub_exists("h", "F"))
            + self._cls("F", self._sub("A"), self._sub_exists("g", "G"))
            + self._cls("D", self._sub("Base"),
                        self._defined("Base", "h", tree))
        )
        assert ("Base", "D") not in self._edges(doc, tmp_path)

    def test_non_positive_filler_abstains(self, tmp_path):
        """A complementOf inside the filler is outside the positive
        fragment: the WHOLE body abstains even though every other part
        matches — and the parse itself stays clean."""
        ns = self.NS
        tree = (
            "<owl:Class>"
            f'<owl:complementOf rdf:resource="{ns}C"/>'
            "</owl:Class>"
        )
        doc = self._base(("A", "B"), self._defined("Base", "h", tree))
        assert ("Base", "D") not in self._edges(doc, tmp_path)

    def test_universal_inside_filler_abstains(self, tmp_path):
        """∀ nested inside the filler tree likewise abstains."""
        ns = self.NS
        tree = (
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}g"/>'
            f'<owl:allValuesFrom rdf:resource="{ns}C"/>'
            "</owl:Restriction>"
        )
        doc = self._base(("A", "B"), self._defined("Base", "h", tree))
        assert ("Base", "D") not in self._edges(doc, tmp_path)

    def test_chain_derived_fact_witnesses_tree(self, tmp_path):
        """Interplay: a propertyChainAxiom-derived existential fact
        (t∘i ⊑ r gives Pizza a told ∃r.Milk) witnesses an and-tree body
        D ≡ ∃r.(M1 ⊓ M2) with Milk ⊑ M1, M2 — the two round-5 slices
        compose inside one fixpoint."""
        ns = self.NS
        doc = (
            self.HEAD
            + f'<owl:ObjectProperty rdf:about="{ns}t"/>'
            + f'<owl:ObjectProperty rdf:about="{ns}i"/>'
            + f'<owl:ObjectProperty rdf:about="{ns}r">'
            + '<owl:propertyChainAxiom rdf:parseType="Collection">'
            + f'<owl:ObjectProperty rdf:about="{ns}t"/>'
            + f'<owl:ObjectProperty rdf:about="{ns}i"/>'
            + "</owl:propertyChainAxiom></owl:ObjectProperty>"
            + self._cls("M1") + self._cls("M2")
            + self._cls("Milk", self._sub("M1"), self._sub("M2"))
            + self._cls("Cheese", self._sub_exists("i", "Milk"))
            + self._cls("Pizza", self._sub_exists("t", "Cheese"))
            + self._cls("D", self._defined("Pizza", "r",
                                           self._and_of("M1", "M2")))
        )
        assert ("Pizza", "D") in self._edges(doc, tmp_path)


class TestNestedBodyProperty:
    """Property-based check of nested-filler membership classification
    on RANDOM ontologies vs an independent fixpoint model implementing
    the same positive-existential-tree semantics (mirrors the other
    slice property suites' done-criterion)."""

    NS = "http://ex/np#"

    def _render_tree(self, tree) -> str:
        ns = self.NS
        if isinstance(tree, int):
            return f'<rdf:Description rdf:about="{ns}C{tree}"/>'
        kind = tree[0]
        if kind in ("and", "or"):
            tag = "intersectionOf" if kind == "and" else "unionOf"
            return (
                f'<owl:Class><owl:{tag} rdf:parseType="Collection">'
                + "".join(self._render_tree(s) for s in tree[1])
                + f"</owl:{tag}></owl:Class>"
            )
        _, prop, sub = tree  # ("some", p, sub)
        if isinstance(sub, int):
            sv = f'<owl:someValuesFrom rdf:resource="{ns}C{sub}"/>'
        else:
            sv = (
                "<owl:someValuesFrom>" + self._render_tree(sub)
                + "</owl:someValuesFrom>"
            )
        return (
            "<owl:Restriction>"
            f'<owl:onProperty rdf:resource="{ns}{prop}"/>{sv}'
            "</owl:Restriction>"
        )

    def _render(self, n, edges, prop_edges, exists, bodies) -> str:
        ns = self.NS

        def tree_props(t):
            if isinstance(t, int):
                return set()
            if t[0] in ("and", "or"):
                return set().union(*(tree_props(s) for s in t[1]))
            return {t[1]} | tree_props(t[2])

        parts = [
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
            '<owl:Ontology rdf:about="http://ex/np"/>',
        ]
        all_props = sorted(
            {p for p, _ in prop_edges} | {q for _, q in prop_edges}
            | {p for _, p, _ in exists}
            | set().union(*(
                {p for p, _ in ex} | set().union(
                    *(tree_props(t) for _, t in ex), set()
                )
                for _, ex in bodies.values()
            ), set())
        )
        for pr in all_props:
            body = [
                f'<rdfs:subPropertyOf rdf:resource="{ns}{p}"/>'
                for c, p in prop_edges if c == pr
            ]
            parts.append(
                f'<owl:ObjectProperty rdf:about="{ns}{pr}">'
                + "".join(body) + "</owl:ObjectProperty>"
            )
        for i in range(n):
            body = [f"<rdfs:label>c{i}</rdfs:label>"]
            for c, p in edges:
                if c == i:
                    body.append(f'<rdfs:subClassOf rdf:resource="{ns}C{p}"/>')
            for c, prop, filler in exists:
                if c == i:
                    body.append(
                        "<rdfs:subClassOf><owl:Restriction>"
                        f'<owl:onProperty rdf:resource="{ns}{prop}"/>'
                        f'<owl:someValuesFrom rdf:resource="{ns}C{filler}"/>'
                        "</owl:Restriction></rdfs:subClassOf>"
                    )
            if i in bodies:
                named, ex = bodies[i]
                members = [
                    f'<rdf:Description rdf:about="{ns}C{m}"/>' for m in named
                ] + [
                    self._render_tree(("some", p, t)) for p, t in ex
                ]
                body.append(
                    "<owl:equivalentClass><owl:Class>"
                    '<owl:intersectionOf rdf:parseType="Collection">'
                    + "".join(members)
                    + "</owl:intersectionOf></owl:Class></owl:equivalentClass>"
                )
            parts.append(
                f'<owl:Class rdf:about="{ns}C{i}">' + "".join(body) + "</owl:Class>"
            )
        parts.append("</rdf:RDF>")
        return "".join(parts)

    @staticmethod
    def _model(n, edges, prop_edges, exists, bodies):
        """Independent fixpoint with recursive tree satisfaction."""
        from collections import defaultdict

        panc_edges = defaultdict(set)
        for c, p in prop_edges:
            panc_edges[c].add(p)

        def preach(p):
            out, todo = {p}, [p]
            while todo:
                for q in panc_edges[todo.pop()]:
                    if q not in out:
                        out.add(q)
                        todo.append(q)
            return out

        parents = defaultdict(set)
        for c, p in edges:
            parents[c].add(p)
        have = defaultdict(set)
        for c, p, f in exists:
            have[c].add((p, f))
        for d, (named, ex) in bodies.items():
            parents[d].update(named)
            # the NECESSARY direction of a tree conjunct is not a told
            # named-filler existential unless the tree is a bare int
            for p, t in ex:
                if isinstance(t, int):
                    have[d].add((p, t))

        def anc(i):
            out, todo = {i}, [i]
            while todo:
                for p in parents[todo.pop()]:
                    if p not in out:
                        out.add(p)
                        todo.append(p)
            return out

        def sat(f, t):
            if isinstance(t, int):
                return t in anc(f)
            if t[0] == "and":
                return all(sat(f, s) for s in t[1])
            if t[0] == "or":
                return any(sat(f, s) for s in t[1])
            _, q, sub = t
            return any(
                q in preach(p_have) and sat(g, sub)
                for y in anc(f)
                for p_have, g in have[y]
            )

        told_anc = {x: anc(x) for x in range(n)}
        changed = True
        while changed:
            changed = False
            for d, (named, ex) in bodies.items():
                for x in range(n):
                    a = anc(x)
                    if x == d or d in a:
                        continue
                    mine = set().union(*(have[y] for y in a))
                    ok = all(m in a for m in named) and all(
                        any(p_req in preach(p_have) and sat(f_have, t)
                            for p_have, f_have in mine)
                        for p_req, t in ex
                    )
                    if ok:
                        parents[x].add(d)
                        changed = True
        return {
            (x, d)
            for x in range(n)
            for d in bodies
            if d != x and d in anc(x) and d not in told_anc[x]
        }

    def test_property_random_graphs(self, tmp_path):
        import random as _random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        ns = self.NS

        @settings(max_examples=40, deadline=None)
        @given(st.integers(0, 10**9))
        def check(seed):
            rng = _random.Random(seed)
            n = rng.randint(4, 8)
            edges = [
                (i, rng.randrange(i)) for i in range(1, n) if rng.random() < 0.5
            ]
            n_base = rng.randint(2, 3)
            pool = [f"p{i}" for i in range(n_base)]
            prop_edges = [
                (pool[i], pool[rng.randrange(i)])
                for i in range(1, n_base) if rng.random() < 0.5
            ]
            exists = [
                (rng.randrange(n), rng.choice(pool), rng.randrange(n))
                for _ in range(rng.randint(2, 6))
            ]

            def rand_tree(depth):
                r = rng.random()
                if depth >= 2 or r < 0.35:
                    return rng.randrange(n)
                if r < 0.55:
                    return ("and", tuple(rand_tree(depth + 1)
                                         for _ in range(rng.randint(1, 2))))
                if r < 0.75:
                    return ("or", tuple(rand_tree(depth + 1)
                                        for _ in range(rng.randint(1, 2))))
                return ("some", rng.choice(pool), rand_tree(depth + 1))

            bodies = {}
            for _ in range(rng.randint(1, 3)):
                d = rng.randrange(n)
                named = rng.sample([i for i in range(n) if i != d],
                                   rng.randint(0, 1))
                ex = [
                    (rng.choice(pool), rand_tree(0))
                    for _ in range(rng.randint(1, 2))
                ]
                bodies[d] = (named, ex)
            xml = self._render(n, edges, prop_edges, exists, bodies)
            f = tmp_path / f"np{seed}.owl"
            f.write_text(xml)
            parsed = parse_owl_xml(str(f), include_object_properties=False)
            got = {
                (e["child_iri"], e["parent_iri"])
                for e in parsed.tables.edges
            }
            want_base = {(f"{ns}C{c}", f"{ns}C{p}") for c, p in edges}
            for d, (named, _) in bodies.items():
                want_base |= {(f"{ns}C{d}", f"{ns}C{m}") for m in named}
            want_inferred = {
                (f"{ns}C{x}", f"{ns}C{d}")
                for x, d in self._model(n, edges, prop_edges, exists, bodies)
            }
            assert got == want_base | want_inferred, seed

        check()

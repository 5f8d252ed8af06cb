"""Cross-serialization consistency: ONE random ontology rendered as
RDF/XML, Turtle, functional syntax, OWL/XML and Manchester must parse to
IDENTICAL tables (concepts, edges, labels, deprecated flags) through
parse_ontology_document — the five structural readers agree with each
other on the feature set they all support, by property-based test.

(OBO is excluded: its id model maps ids → obolibrary IRIs rather than
carrying arbitrary IRIs, so table-level identity is not meaningful.)"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from fhir_owl_spark.sources.turtle import parse_ontology_document

NS = "http://ex/xs#"


def _gen(seed: int):
    rng = random.Random(seed)
    n_cls = rng.randint(3, 8)
    n_prop = rng.randint(0, 3)
    classes = [f"C{i}" for i in range(n_cls)]
    props = [f"p{i}" for i in range(n_prop)]
    cls_edges = [
        (classes[i], classes[rng.randrange(i)])
        for i in range(1, n_cls) if rng.random() < 0.6
    ]
    prop_edges = [
        (props[i], props[rng.randrange(i)])
        for i in range(1, n_prop) if rng.random() < 0.6
    ]
    labels = {}
    for c in classes + props:
        k = rng.randint(0, 2)
        if k:
            labels[c] = [f"label {c} {j}" for j in range(k)]
    deprecated = {c for c in classes if rng.random() < 0.25}
    equiv = []
    if n_cls >= 2 and rng.random() < 0.5:
        a, b = rng.sample(classes, 2)
        equiv.append((a, b))
    return classes, props, cls_edges, prop_edges, labels, deprecated, equiv


def _render_rdfxml(classes, props, cls_edges, prop_edges, labels, deprecated, equiv):
    parts = [
        '<?xml version="1.0"?>',
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">',
        '<owl:Ontology rdf:about="http://ex/xs"/>',
    ]
    for c in classes:
        body = [f"<rdfs:label>{v}</rdfs:label>" for v in labels.get(c, [])]
        body += [f'<rdfs:subClassOf rdf:resource="{NS}{p}"/>'
                 for ch, p in cls_edges if ch == c]
        body += [f'<owl:equivalentClass rdf:resource="{NS}{b}"/>'
                 for a, b in equiv if a == c]
        if c in deprecated:
            body.append("<owl:deprecated>true</owl:deprecated>")
        parts.append(f'<owl:Class rdf:about="{NS}{c}">' + "".join(body)
                     + "</owl:Class>")
    for p in props:
        body = [f"<rdfs:label>{v}</rdfs:label>" for v in labels.get(p, [])]
        body += [f'<rdfs:subPropertyOf rdf:resource="{NS}{q}"/>'
                 for ch, q in prop_edges if ch == p]
        parts.append(f'<owl:ObjectProperty rdf:about="{NS}{p}">'
                     + "".join(body) + "</owl:ObjectProperty>")
    parts.append("</rdf:RDF>")
    return "".join(parts)


def _render_turtle(classes, props, cls_edges, prop_edges, labels, deprecated, equiv):
    out = [
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .",
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
        f"@prefix : <{NS}> .",
        "<http://ex/xs> a owl:Ontology .",
    ]
    for c in classes:
        lines = [f":{c} a owl:Class"]
        for v in labels.get(c, []):
            lines.append(f'rdfs:label "{v}"')
        for ch, p in cls_edges:
            if ch == c:
                lines.append(f"rdfs:subClassOf :{p}")
        for a, b in equiv:
            if a == c:
                lines.append(f"owl:equivalentClass :{b}")
        if c in deprecated:
            lines.append("owl:deprecated true")
        out.append(" ;\n    ".join(lines) + " .")
    for p in props:
        lines = [f":{p} a owl:ObjectProperty"]
        for v in labels.get(p, []):
            lines.append(f'rdfs:label "{v}"')
        for ch, q in prop_edges:
            if ch == p:
                lines.append(f"rdfs:subPropertyOf :{q}")
        out.append(" ;\n    ".join(lines) + " .")
    return "\n".join(out)


def _render_fs(classes, props, cls_edges, prop_edges, labels, deprecated, equiv):
    out = [
        f"Prefix(:=<{NS}>)",
        "Prefix(owl:=<http://www.w3.org/2002/07/owl#>)",
        "Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)",
        "Prefix(xsd:=<http://www.w3.org/2001/XMLSchema#>)",
        "Ontology(<http://ex/xs>",
    ]
    for c in classes:
        out.append(f"Declaration(Class(:{c}))")
    for p in props:
        out.append(f"Declaration(ObjectProperty(:{p}))")
    for ch, p in cls_edges:
        out.append(f"SubClassOf(:{ch} :{p})")
    for ch, q in prop_edges:
        out.append(f"SubObjectPropertyOf(:{ch} :{q})")
    for a, b in equiv:
        out.append(f"EquivalentClasses(:{a} :{b})")
    for c, vals in labels.items():
        for v in vals:
            out.append(f'AnnotationAssertion(rdfs:label :{c} "{v}")')
    for c in deprecated:
        out.append(f'AnnotationAssertion(owl:deprecated :{c} "true"^^xsd:boolean)')
    out.append(")")
    return "\n".join(out)


def _render_owx(classes, props, cls_edges, prop_edges, labels, deprecated, equiv):
    out = [
        '<?xml version="1.0"?>',
        '<Ontology xmlns="http://www.w3.org/2002/07/owl#" '
        'ontologyIRI="http://ex/xs">',
        f'<Prefix name="" IRI="{NS}"/>',
        '<Prefix name="rdfs" IRI="http://www.w3.org/2000/01/rdf-schema#"/>',
        '<Prefix name="owl" IRI="http://www.w3.org/2002/07/owl#"/>',
    ]
    for c in classes:
        out.append(f'<Declaration><Class IRI="{NS}{c}"/></Declaration>')
    for p in props:
        out.append(f'<Declaration><ObjectProperty IRI="{NS}{p}"/></Declaration>')
    for ch, p in cls_edges:
        out.append(f'<SubClassOf><Class IRI="{NS}{ch}"/>'
                   f'<Class IRI="{NS}{p}"/></SubClassOf>')
    for ch, q in prop_edges:
        out.append(f'<SubObjectPropertyOf><ObjectProperty IRI="{NS}{ch}"/>'
                   f'<ObjectProperty IRI="{NS}{q}"/></SubObjectPropertyOf>')
    for a, b in equiv:
        out.append(f'<EquivalentClasses><Class IRI="{NS}{a}"/>'
                   f'<Class IRI="{NS}{b}"/></EquivalentClasses>')
    for c, vals in labels.items():
        for v in vals:
            out.append(
                "<AnnotationAssertion>"
                '<AnnotationProperty abbreviatedIRI="rdfs:label"/>'
                f"<IRI>{NS}{c}</IRI><Literal>{v}</Literal>"
                "</AnnotationAssertion>")
    for c in deprecated:
        out.append(
            "<AnnotationAssertion>"
            '<AnnotationProperty abbreviatedIRI="owl:deprecated"/>'
            f"<IRI>{NS}{c}</IRI><Literal>true</Literal>"
            "</AnnotationAssertion>")
    out.append("</Ontology>")
    return "\n".join(out)


def _render_omn(classes, props, cls_edges, prop_edges, labels, deprecated, equiv):
    out = [
        f"Prefix: : <{NS}>",
        "Prefix: rdfs: <http://www.w3.org/2000/01/rdf-schema#>",
        "Prefix: owl: <http://www.w3.org/2002/07/owl#>",
        "Ontology: <http://ex/xs>",
        "",
    ]
    for p in props:
        out.append(f"ObjectProperty: {p}")
        for v in labels.get(p, []):
            out.append(f'    Annotations: rdfs:label "{v}"')
        for ch, q in prop_edges:
            if ch == p:
                out.append(f"    SubPropertyOf: {q}")
        out.append("")
    for c in classes:
        out.append(f"Class: {c}")
        for v in labels.get(c, []):
            out.append(f'    Annotations: rdfs:label "{v}"')
        if c in deprecated:
            out.append("    Annotations: owl:deprecated true")
        for ch, p in cls_edges:
            if ch == c:
                out.append(f"    SubClassOf: {p}")
        for a, b in equiv:
            if a == c:
                out.append(f"    EquivalentTo: {b}")
        out.append("")
    return "\n".join(out)


RENDERERS = {
    "owl": _render_rdfxml,
    "ttl": _render_turtle,
    "ofn": _render_fs,
    "owx": _render_owx,
    "omn": _render_omn,
}


def _tables_of(parsed):
    concepts = {
        (c["iri"], c["label"], c["deprecated"]) for c in parsed.tables.concepts
    }
    edges = {(e["child_iri"], e["parent_iri"]) for e in parsed.tables.edges}
    label_syns = {
        (s["iri"], s["synonym"]) for s in parsed.tables.synonyms
        if s["prop"].endswith("label")
    }
    return concepts, edges, label_syns


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10**9))
def test_all_serializations_agree(seed):
    import tempfile

    spec = _gen(seed)
    results = {}
    with tempfile.TemporaryDirectory() as d:
        for ext, render in RENDERERS.items():
            path = f"{d}/o.{ext}"
            with open(path, "w") as fh:
                fh.write(render(*spec))
            results[ext] = _tables_of(parse_ontology_document(path))
    base = results["owl"]
    for ext, got in results.items():
        assert got == base, (seed, ext,
                             [a ^ b for a, b in zip(got, base)])


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 10**9))
def test_dispatcher_never_crashes_unexpectedly(seed):
    """Fuzz: mutated/truncated/garbage documents must either parse or
    raise a CONTROLLED error (UnsupportedOwlFormatError / ValueError /
    XML ParseError) — never IndexError/KeyError/AttributeError (the r5
    OBO empty-is_a crash class)."""
    import tempfile
    import xml.etree.ElementTree as ET

    from fhir_owl_spark.sources.owl_xml import UnsupportedOwlFormatError
    from fhir_owl_spark.sources.turtle import TurtleSyntaxError

    rng = random.Random(seed)
    spec = _gen(seed)
    ext, render = rng.choice(list(RENDERERS.items()))
    doc = render(*spec)
    mode = rng.randrange(4)
    if mode == 0:  # truncate mid-document
        doc = doc[: rng.randrange(1, max(2, len(doc)))]
    elif mode == 1:  # splice random printable garbage into the middle
        pos = rng.randrange(len(doc))
        junk = "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(1, 40)))
        doc = doc[:pos] + junk + doc[pos:]
    elif mode == 2:  # pure garbage
        doc = "".join(chr(rng.randrange(32, 127)) for _ in range(rng.randrange(0, 300)))
    # mode 3: leave valid
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/f.{ext}"
        with open(path, "w") as fh:
            fh.write(doc)
        try:
            parsed = parse_ontology_document(path)
            assert parsed.tables is not None
        except (UnsupportedOwlFormatError, TurtleSyntaxError, ET.ParseError):
            pass  # controlled failure modes ONLY — a bare ValueError from
            # deep inside a parser (e.g. a stray int()) must FAIL the fuzz

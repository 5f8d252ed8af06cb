"""OWL/XML (subset) ontology reader → the same tabular ontology that
sources/owl_xml.py produces from RDF/XML.

OWL/XML is the W3C's XML serialization of the functional-syntax
structure (namespace ``http://www.w3.org/2002/07/owl#`` with element
names mirroring FS axioms); Protégé exports it as ``.owx`` and the
reference accepts it via OWL API auto-detection
(loadOntologyFromOntologyDocument, FhirOwlService.java:196-201). Same
driver-side fixture-scale role as the RDF/XML / Turtle / OBO / FS
readers; same documented subset as the FS reader:

  * ``<Prefix name=… IRI=…/>``, ``<Ontology ontologyIRI=… versionIRI=…>``
  * ``<Import>iri</Import>``; ontology-level ``<Annotation>`` with a
    literal value
  * ``<Declaration>`` of Class / ObjectProperty / DataProperty
  * ``<SubClassOf>`` / ``<SubObjectPropertyOf>`` / ``<SubDataPropertyOf>``
    with NAMED operands; ``<EquivalentClasses>`` over named classes →
    mutual edges
  * ``<AnnotationAssertion>`` with a literal → label competition + synonym
    rows keyed by the full property IRI; ``owl:deprecated`` booleans

Axioms whose class operands are ANONYMOUS expressions
(``ObjectSomeValuesFrom`` etc.) are skipped atomically — told-slice
extraction is not replicated here (documented subset).

Entity naming: ``<Class IRI="#A"/>`` resolves against xml:base /
ontologyIRI; ``abbreviatedIRI="p:A"`` resolves through the declared
prefixes — both forms the OWL API writes.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .owl_xml import (
    OWL_NS,
    RDFS_LABEL,
    ParsedOntology,
    UnsupportedOwlFormatError,
    detect_owl_format,
)

_OWLX = "{http://www.w3.org/2002/07/owl#}"
_OWLX_LEGACY = "{http://www.w3.org/2006/12/owl2-xml#}"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_owlxml(
    path: str,
    include_object_properties: bool = True,
    include_data_properties: bool = False,
    unsatisfiable_iris: set[str] | None = None,
    ontology_id: str = "root",
) -> ParsedOntology:
    """Parse an OWL/XML document into ParsedOntology — same tables,
    label competition, deprecated handling, property rooting and
    metadata surface as parse_owl_xml / parse_functional."""
    with open(path, encoding="utf-8") as fh:
        head = fh.read(4096)
    fmt = detect_owl_format(head)
    if fmt not in ("owlxml", "unknown"):
        raise UnsupportedOwlFormatError(fmt, path, hint="expected OWL/XML")
    root = ET.parse(path).getroot()
    if _local(root.tag) != "Ontology":
        raise UnsupportedOwlFormatError("owlxml", path, hint="no <Ontology> root")

    ontology_iri = root.get("ontologyIRI")
    version_iri = root.get("versionIRI")
    base = ontology_iri or root.get(
        "{http://www.w3.org/XML/1998/namespace}base", ""
    )

    prefixes: dict[str, str] = {}
    for el in root:
        if _local(el.tag) == "Prefix":
            prefixes[el.get("name", "")] = el.get("IRI", "")

    def entity_iri(el) -> str | None:
        iri = el.get("IRI")
        if iri is not None:
            return base + iri if iri.startswith("#") else iri
        ab = el.get("abbreviatedIRI")
        if ab is not None and ":" in ab:
            pfx, _, local = ab.partition(":")
            if pfx in prefixes:
                return prefixes[pfx] + local
        return None

    owl_class = OWL_NS + "Class"
    owl_objprop = OWL_NS + "ObjectProperty"
    owl_dataprop = OWL_NS + "DatatypeProperty"
    kind_map = {
        "Class": owl_class,
        "ObjectProperty": owl_objprop,
        "DataProperty": owl_dataprop,
    }

    imports: list[str] = []
    annotations: list[tuple[str, str]] = []
    kind_of: dict[str, str] = {}
    subj_order: list[str] = []
    sub_edges: list[tuple[str, str]] = []
    equiv_groups: list[list[str]] = []
    labels_of: dict[str, list[str]] = {}
    synonyms: list[tuple[str, str, str]] = []
    deprecated_of: dict[str, bool] = {}

    def named_operands(el) -> list[str] | None:
        """Entity IRIs of el's CLASS/PROPERTY children; None when any
        operand is an anonymous expression (skip the axiom atomically)."""
        out = []
        for ch in el:
            name = _local(ch.tag)
            if name == "Annotation":
                continue
            if name in kind_map:
                iri = entity_iri(ch)
                if iri is None:
                    return None
                out.append(iri)
            else:
                return None  # anonymous expression operand
        return out

    for el in root:
        name = _local(el.tag)
        if name == "Import":
            if el.text and el.text.strip():
                imports.append(el.text.strip())
        elif name == "Annotation":
            prop = None
            lit = None
            for ch in el:
                cn = _local(ch.tag)
                if cn == "AnnotationProperty":
                    prop = entity_iri(ch)
                elif cn == "Literal":
                    lit = ch.text or ""
            if prop and lit is not None:
                annotations.append((prop, lit))
        elif name == "Declaration":
            for ch in el:
                mapped = kind_map.get(_local(ch.tag))
                iri = entity_iri(ch)
                if mapped and iri and iri not in kind_of:
                    kind_of[iri] = mapped
                    subj_order.append(iri)
        elif name in ("SubClassOf", "SubObjectPropertyOf", "SubDataPropertyOf"):
            ops = named_operands(el)
            if ops and len(ops) >= 2:
                sub_edges.append((ops[0], ops[1]))
        elif name == "EquivalentClasses":
            ops = named_operands(el)
            if ops and len(ops) >= 2:
                equiv_groups.append(ops)
        elif name == "AnnotationAssertion":
            prop = None
            subj = None
            lit = None
            for ch in el:
                cn = _local(ch.tag)
                if cn == "AnnotationProperty":
                    prop = entity_iri(ch)
                elif cn in ("IRI", "AbbreviatedIRI"):
                    txt = (ch.text or "").strip()
                    if cn == "IRI":
                        subj = base + txt if txt.startswith("#") else txt
                    elif ":" in txt:
                        pfx, _, local = txt.partition(":")
                        if pfx in prefixes:
                            subj = prefixes[pfx] + local
                elif cn == "Literal":
                    lit = ch.text or ""
            if not prop or not subj or lit is None:
                continue
            if prop == OWL_NS + "deprecated":
                if lit in ("true", "false"):
                    deprecated_of[subj] = lit == "true"
                continue
            synonyms.append((subj, lit, prop))
            if prop == RDFS_LABEL:
                labels_of.setdefault(subj, []).append(lit)

    from ._reader_common import finalize_parsed_ontology

    return finalize_parsed_ontology(
        kind_of=kind_of,
        subj_order=subj_order,
        sub_edges=sub_edges,
        equiv_groups=equiv_groups,
        synonyms=synonyms,
        labels_of=labels_of,
        deprecated_of=deprecated_of,
        include_object_properties=include_object_properties,
        include_data_properties=include_data_properties,
        unsatisfiable_iris=unsatisfiable_iris,
        ontology_id=ontology_id,
        ontology_iri=ontology_iri,
        version_iri=version_iri,
        imports=imports,
        annotations=annotations,
    )

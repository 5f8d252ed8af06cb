"""Shared finalization for the structural ontology readers (functional
syntax, OWL/XML, Manchester): kind filtering, edge/equivalence/synonym
application, label competition, property rooting and top-entity
completion — one copy instead of three divergence-prone ones (r5
self-review finding). The Turtle reader predates this helper and keeps
its own (behaviorally identical) finalization."""

from __future__ import annotations

from ..fixtures import Ontology
from ..schemas import OWL_THING, OWL_TOP_DATA_PROPERTY, OWL_TOP_OBJECT_PROPERTY
from .owl_xml import OWL_NS, ParsedOntology

OWL_CLASS = OWL_NS + "Class"
OWL_OBJPROP = OWL_NS + "ObjectProperty"
OWL_DATAPROP = OWL_NS + "DatatypeProperty"


def finalize_parsed_ontology(
    *,
    kind_of: dict[str, str],
    subj_order: list[str],
    sub_edges: list[tuple[str, str]],
    equiv_groups: list[list[str]],
    synonyms: list[tuple[str, str, str]],
    labels_of: dict[str, list[str]],
    deprecated_of: dict[str, bool],
    include_object_properties: bool,
    include_data_properties: bool,
    unsatisfiable_iris: set[str] | None,
    ontology_id: str,
    ontology_iri: str | None,
    version_iri: str | None,
    imports: list[str],
    annotations: list[tuple[str, str]],
) -> ParsedOntology:
    """Assemble the tabular ontology exactly as parse_owl_xml does:
    min-literal label competition, named equivalence ⟺ mutual edges,
    parentless property rooting at the top properties, Thing/top-entity
    completion keyed on whether imports are declared."""
    wanted = {OWL_CLASS}
    if include_object_properties:
        wanted.add(OWL_OBJPROP)
    if include_data_properties:
        wanted.add(OWL_DATAPROP)

    ont = Ontology()
    children: set[str] = set()
    for c, p in sub_edges:
        if kind_of.get(c) in wanted:
            ont.edge(c, p)
            children.add(c)
    for group in equiv_groups:
        first = group[0]
        for other in group[1:]:
            if kind_of.get(first) in wanted or kind_of.get(other) in wanted:
                ont.edge(first, other)
                ont.edge(other, first)
                children.add(first)
                children.add(other)
    for s, val, prop in synonyms:
        if kind_of.get(s) in wanted:
            ont.synonym(s, val, prop=prop)

    unsat = set(unsatisfiable_iris or ())
    n_object_props = 0
    n_data_props = 0
    for iri in subj_order:
        kind = kind_of[iri]
        if kind not in wanted:
            continue
        labels = labels_of.get(iri, [])
        ont.concept(
            iri,
            ontology_id,
            label=min(labels) if labels else None,
            deprecated=deprecated_of.get(iri, False),
            imported=False,
            unsatisfiable=iri in unsat,
        )
        if kind == OWL_OBJPROP:
            n_object_props += 1
            if iri not in children:
                ont.edge(iri, OWL_TOP_OBJECT_PROPERTY)
        elif kind == OWL_DATAPROP:
            n_data_props += 1
            if iri not in children:
                ont.edge(iri, OWL_TOP_DATA_PROPERTY)

    has_imports = bool(imports)
    if OWL_THING not in kind_of:
        ont.concept(OWL_THING, ontology_id, imported=has_imports)
    if include_object_properties and n_object_props:
        ont.concept(OWL_TOP_OBJECT_PROPERTY, ontology_id, imported=has_imports)
    if include_data_properties and n_data_props:
        ont.concept(OWL_TOP_DATA_PROPERTY, ontology_id, imported=has_imports)

    return ParsedOntology(
        ontology_iri=ontology_iri,
        version_iri=version_iri,
        has_imports=has_imports,
        tables=ont,
        annotations=annotations,
        imports=imports,
    )

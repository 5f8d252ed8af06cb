"""OBO 1.2 (subset) ontology reader → the same tabular ontology that
sources/owl_xml.py produces from RDF/XML.

The reference accepts OBO through the OWL API's auto-detection
(loadOntologyFromOntologyDocument, FhirOwlService.java:196-201), and OBO
is the serialization its marquee use cases ship first — HPO and the
Sequence Ontology are distributed as ``.obo``
(/root/reference/README.md:98-112). This driver-side reader covers the
same fixture-scale role as the RDF/XML and Turtle readers: single-digit-
MB files parsed on the driver into the broadcastable dictionary tables.

Subset handled (the obo2owl mapping slice the downstream pipeline
consumes — id/label/synonym/deprecation/hierarchy/metadata):
  * header: ``format-version``, ``ontology`` (→ obolibrary ontology
    IRI), ``data-version`` (→ release version IRI), ``import`` lines,
    other literal header tags as ontology-level annotations
    (``remark`` → rdfs:comment like obo2owl; the rest keyed under the
    oboInOwl namespace)
  * ``[Term]``: ``id`` (→ obolibrary class IRI), ``name`` → label,
    ``synonym: "text" SCOPE []`` → oboInOwl has{Exact,Related,Broad,
    Narrow}Synonym rows (RELATED when the scope is omitted, per spec),
    ``def`` → IAO_0000115 rows, ``comment`` → rdfs:comment rows,
    ``alt_id`` → oboInOwl#hasAlternativeId rows, ``is_a`` → subClassOf
    edges, ``is_obsolete: true`` → deprecated
  * ``[Typedef]``: object properties; ``is_a`` → subPropertyOf edges,
    parentless typedefs root at owl:topObjectProperty (same completion
    contract as the XML/Turtle readers)
  * ``! trailing comments`` stripped outside quotes; ``\\"``/``\\\\``
    escapes inside quoted values

Not handled (skipped, documented): relationship/intersection_of/
union_of/disjoint_from bodies, xref/subset/property_value lines,
``[Instance]`` stanzas. No told-unsat inference here — pass
``unsatisfiable_iris`` explicitly, like the Turtle reader.
"""

from __future__ import annotations

import re

from ..fixtures import Ontology
from ..schemas import OWL_THING, OWL_TOP_OBJECT_PROPERTY
from .owl_xml import (
    RDFS_LABEL,
    RDFS_NS,
    ParsedOntology,
    UnsupportedOwlFormatError,
    detect_owl_format,
)

OBO_NS = "http://purl.obolibrary.org/obo/"
OBO_IN_OWL_NS = "http://www.geneontology.org/formats/oboInOwl#"
DEFINITION_IRI = OBO_NS + "IAO_0000115"

_SYNONYM_SCOPES = {
    "EXACT": OBO_IN_OWL_NS + "hasExactSynonym",
    "RELATED": OBO_IN_OWL_NS + "hasRelatedSynonym",
    "BROAD": OBO_IN_OWL_NS + "hasBroadSynonym",
    "NARROW": OBO_IN_OWL_NS + "hasNarrowSynonym",
}

# PREFIX:LOCAL ids (HP:0000118, GO:0008150) → obolibrary IRIs; anything
# else (part_of) → the ontology-local idspace, per the obo2owl spec
_PREFIXED_ID = re.compile(r"^([A-Za-z_][A-Za-z0-9_-]*):(\S+)$")


def obo_id_to_iri(obo_id: str, ontology_name: str) -> str:
    m = _PREFIXED_ID.match(obo_id)
    if m:
        return f"{OBO_NS}{m.group(1)}_{m.group(2)}"
    return f"{OBO_NS}{ontology_name}#{obo_id}"


def _unquote(raw: str) -> str:
    return re.sub(r'\\(.)', r"\1", raw)


def _strip_bang_comment(value: str) -> str:
    """Drop a trailing ``! comment``, respecting quoted spans."""
    in_quote = False
    i = 0
    while i < len(value):
        c = value[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            in_quote = not in_quote
        elif c == "!" and not in_quote:
            return value[:i].rstrip()
        i += 1
    return value.rstrip()


def _tag_value(line: str) -> tuple[str, str] | None:
    if ":" not in line:
        return None
    tag, _, value = line.partition(":")
    return tag.strip(), _strip_bang_comment(value.strip())


_QUOTED = re.compile(r'^"((?:[^"\\]|\\.)*)"\s*(.*)$')


def parse_obo(
    path: str,
    include_object_properties: bool = True,
    include_data_properties: bool = False,  # noqa: ARG001 — OBO typedefs are object properties
    unsatisfiable_iris: set[str] | None = None,
    ontology_id: str = "root",
) -> ParsedOntology:
    """Parse an OBO 1.2 document into ParsedOntology — same tables,
    label competition, deprecated handling and top-entity completion as
    parse_owl_xml / parse_turtle (shared downstream pipeline)."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    fmt = detect_owl_format(text[:4096])
    if fmt not in ("obo", "unknown"):
        raise UnsupportedOwlFormatError(fmt, path, hint="expected OBO")

    header: list[tuple[str, str]] = []
    stanzas: list[tuple[str, list[tuple[str, str]]]] = []
    current: list[tuple[str, str]] | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        m = re.match(r"^\[(\w+)\]$", line)
        if m:
            current = []
            stanzas.append((m.group(1), current))
            continue
        tv = _tag_value(line)
        if tv is None:
            continue
        if current is None:
            header.append(tv)
        else:
            current.append(tv)

    hdr = {}
    imports: list[str] = []
    annotations: list[tuple[str, str]] = []
    for tag, value in header:
        if tag == "import":
            imports.append(value)
            continue
        hdr.setdefault(tag, value)
        if tag in ("format-version", "ontology", "data-version", "import"):
            continue
        prop = RDFS_NS + "comment" if tag == "remark" else OBO_IN_OWL_NS + tag
        annotations.append((prop, value))

    ont_name = hdr.get("ontology", "obo")
    ontology_iri = f"{OBO_NS}{ont_name}.owl" if "ontology" in hdr else None
    version_iri = None
    if "data-version" in hdr and "ontology" in hdr:
        # obo2owl: <OBO_NS>/<idspace>/<data-version>/<idspace>.owl — a
        # data-version already carrying the idspace prefix ('hp/releases/…')
        # is used as-is, a bare 'releases/…' gets the idspace inserted
        # (r5 self-review: the bare form previously omitted the segment)
        dv = hdr["data-version"]
        if not dv.startswith(f"{ont_name}/"):
            dv = f"{ont_name}/{dv}"
        version_iri = f"{OBO_NS}{dv}/{ont_name}.owl"

    ont = Ontology()
    unsat = set(unsatisfiable_iris or ())
    children: set[str] = set()
    typedef_iris: list[str] = []
    rows: list[tuple[str, list[str], bool, bool]] = []  # iri, labels, deprecated, is_typedef

    for kind, tags in stanzas:
        if kind not in ("Term", "Typedef"):
            continue  # [Instance] etc. — outside the subset
        is_typedef = kind == "Typedef"
        if is_typedef and not include_object_properties:
            continue
        tag_map: dict[str, list[str]] = {}
        for t, v in tags:
            tag_map.setdefault(t, []).append(v)
        ids = tag_map.get("id")
        if not ids:
            continue
        iri = obo_id_to_iri(ids[0], ont_name)
        labels = [_unquote(v) for v in tag_map.get("name", [])]
        deprecated = any(v.lower() == "true" for v in tag_map.get("is_obsolete", []))
        rows.append((iri, labels, deprecated, is_typedef))
        if is_typedef:
            typedef_iris.append(iri)
        for v in tag_map.get("is_a", []):
            parts = v.split()
            if not parts:  # 'is_a:' with only a ! comment — skip, don't crash
                continue
            parent = obo_id_to_iri(parts[0], ont_name)
            ont.edge(iri, parent)
            children.add(iri)
        for v in tag_map.get("synonym", []):
            m = _QUOTED.match(v)
            if not m:
                continue
            rest = m.group(2).split()
            scope = rest[0].upper() if rest and rest[0].upper() in _SYNONYM_SCOPES else "RELATED"
            ont.synonym(iri, _unquote(m.group(1)), prop=_SYNONYM_SCOPES[scope])
        for v in tag_map.get("def", []):
            m = _QUOTED.match(v)
            if m:
                ont.synonym(iri, _unquote(m.group(1)), prop=DEFINITION_IRI)
        for v in tag_map.get("comment", []):
            ont.synonym(iri, v, prop=RDFS_NS + "comment")
        for v in tag_map.get("alt_id", []):
            ont.synonym(iri, v, prop=OBO_IN_OWL_NS + "hasAlternativeId")
        for label in labels:
            ont.synonym(iri, label, prop=RDFS_LABEL)

    for iri, labels, deprecated, is_typedef in rows:
        ont.concept(
            iri,
            ontology_id,
            label=min(labels) if labels else None,
            deprecated=deprecated,
            imported=False,
            unsatisfiable=iri in unsat,
        )
        if is_typedef and iri not in children:
            ont.edge(iri, OWL_TOP_OBJECT_PROPERTY)

    # same top-entity completion contract as the XML/Turtle readers
    has_imports = bool(imports)
    ont.concept(OWL_THING, ontology_id, imported=has_imports)
    if include_object_properties and typedef_iris:
        ont.concept(OWL_TOP_OBJECT_PROPERTY, ontology_id, imported=has_imports)

    return ParsedOntology(
        ontology_iri=ontology_iri,
        version_iri=version_iri,
        has_imports=has_imports,
        tables=ont,
        annotations=annotations,
        imports=imports,
    )

"""OWL 2 Functional Syntax (subset) reader → the same tabular ontology
that sources/owl_xml.py produces from RDF/XML.

Protégé's default non-XML export; the reference auto-detects it via the
OWL API (loadOntologyFromOntologyDocument, FhirOwlService.java:196-201).
Same fixture-scale role as the RDF/XML / Turtle / OBO readers.

Subset handled (mirrors what the other readers extract):
  * ``Prefix(p:=<iri>)`` declarations, ``Ontology(<iri> [<versionIRI>]``
  * ``Import(<iri>)``; ontology-level ``Annotation(prop "literal")``
  * ``Declaration(Class|ObjectProperty|DataProperty(entity))``
  * ``SubClassOf``/``SubObjectPropertyOf``/``SubDataPropertyOf`` with
    NAMED arguments; ``EquivalentClasses`` over named classes → mutual
    edges (pairwise against the first, same closure as the XML reader)
  * ``AnnotationAssertion(prop entity "literal")`` → label competition
    (min literal) + synonym rows keyed by the full property IRI;
    ``owl:deprecated "true"`` booleans

Axioms whose class positions hold ANONYMOUS expressions
(ObjectSomeValuesFrom, ObjectIntersectionOf, …) are skipped atomically —
the told-slice extraction the RDF/XML reader performs on anonymous
bodies is not replicated here (documented subset, same scope as the
Turtle reader).
"""

from __future__ import annotations

import re

from .owl_xml import (
    OWL_NS,
    RDFS_LABEL,
    ParsedOntology,
    UnsupportedOwlFormatError,
    detect_owl_format,
)

_TOKEN = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<open>\()
  | (?P<close>\))
  | (?P<equals>:=)
  | (?P<pname>[^\s()"^<>]+)
    """,
    re.VERBOSE,
)


def _tokenize(text: str):
    for m in _TOKEN.finditer(text):
        kind = m.lastgroup
        if kind == "comment":
            continue
        yield kind, m.group()


def _parse_sexprs(tokens):
    """Token stream → nested lists. A call ``Name(arg …)`` becomes
    ``[Name, arg, …]``; literals stay ('lit', value) tuples, IRIs/pnames
    plain strings (resolved later)."""
    stack: list[list] = [[]]
    pending: str | None = None
    last_literal = False
    for kind, tok in tokens:
        if kind == "open":
            node: list = [pending if pending is not None else ""]
            pending = None
            stack[-1].append(node)
            stack.append(node)
            last_literal = False
        elif kind == "close":
            if pending is not None:
                stack[-1].append(pending)
                pending = None
            if len(stack) > 1:
                stack.pop()
            last_literal = False
        elif kind == "iri":
            if pending is not None:
                stack[-1].append(pending)
                pending = None
            if last_literal:  # datatype IRI of the previous literal
                last_literal = False
                continue
            stack[-1].append(("iri", tok[1:-1]))
        elif kind == "literal":
            if pending is not None:
                stack[-1].append(pending)
                pending = None
            raw = tok[1:-1]
            stack[-1].append(("lit", re.sub(r'\\(.)', r"\1", raw)))
            last_literal = True
        elif kind == "dtype":
            continue  # next token is the datatype, flagged via last_literal
        elif kind == "langtag":
            last_literal = False
            continue
        elif kind == "equals":
            # the DEFAULT prefix declaration Prefix(:=<iri>): the bare ':='
            # token IS the prefix name — keep it as an argument
            if pending is not None:
                stack[-1].append(pending)
            pending = ":="
            last_literal = False
        else:  # pname — may be a call head (followed by open) or an arg
            if last_literal:  # pname datatype after ^^
                last_literal = False
                continue
            if pending is not None:
                stack[-1].append(pending)
            pending = tok
    if pending is not None:
        stack[-1].append(pending)
    return stack[0]


def parse_functional(
    path: str,
    include_object_properties: bool = True,
    include_data_properties: bool = False,
    unsatisfiable_iris: set[str] | None = None,
    ontology_id: str = "root",
) -> ParsedOntology:
    """Parse an OWL 2 Functional Syntax document into ParsedOntology —
    same tables, label competition, deprecated handling, property
    rooting and metadata surface as parse_owl_xml."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    fmt = detect_owl_format(text[:4096])
    if fmt not in ("functional", "unknown"):
        raise UnsupportedOwlFormatError(fmt, path, hint="expected functional syntax")

    prefixes: dict[str, str] = {}
    nodes = _parse_sexprs(_tokenize(text))

    def resolve(arg) -> str | None:
        """Named entity → full IRI; anonymous expression/literal → None."""
        if isinstance(arg, tuple):
            return arg[1] if arg[0] == "iri" else None
        if isinstance(arg, list):
            return None
        if ":" in arg:
            pfx, _, local = arg.partition(":")
            base = prefixes.get(pfx + ":")
            if base is not None:
                return base + local
            return arg  # full IRI written without <> — tolerated
        base = prefixes.get(":")
        return (base + arg) if base is not None else arg

    ontology_iri: str | None = None
    version_iri: str | None = None
    imports: list[str] = []
    annotations: list[tuple[str, str]] = []
    kind_of: dict[str, str] = {}
    subj_order: list[str] = []
    sub_edges: list[tuple[str, str]] = []
    equiv_groups: list[list[str]] = []
    labels_of: dict[str, list[str]] = {}
    synonyms: list[tuple[str, str, str]] = []
    deprecated_of: dict[str, bool] = {}

    owl_class = OWL_NS + "Class"
    owl_objprop = OWL_NS + "ObjectProperty"
    owl_dataprop = OWL_NS + "DatatypeProperty"

    def handle(node: list) -> None:
        head = node[0]
        args = node[1:]
        if head == "Prefix":
            # [Prefix, 'p:=', ('iri', …)] — the pname token swallows the
            # ':=' (it allows ':' and '='), so strip the trailing '='
            if len(args) >= 2 and isinstance(args[0], str):
                iri = args[1][1] if isinstance(args[1], tuple) else None
                if iri is not None:
                    prefixes[args[0].rstrip("=")] = iri
            return
        if head == "Ontology":
            nonlocal ontology_iri, version_iri
            plain = [a for a in args if isinstance(a, tuple) and a[0] == "iri"]
            if plain:
                ontology_iri = plain[0][1]
            if len(plain) > 1:
                version_iri = plain[1][1]
            for child in args:
                if isinstance(child, list):
                    handle(child)
            return
        if head == "Import":
            iri = resolve(args[0]) if args else None
            if iri:
                imports.append(iri)
            return
        if head == "Annotation":
            # ontology-level: Annotation([Annotation(…)…] prop "literal")
            operands = [
                a for a in args
                if not (isinstance(a, list) and a and a[0] == "Annotation")
            ]
            if (
                len(operands) >= 2
                and isinstance(operands[-1], tuple)
                and operands[-1][0] == "lit"
            ):
                prop = resolve(operands[0])
                if prop:
                    annotations.append((prop, operands[-1][1]))
            return
        if head == "Declaration":
            if args and isinstance(args[0], list):
                decl = args[0]
                mapped = {
                    "Class": owl_class,
                    "ObjectProperty": owl_objprop,
                    "DataProperty": owl_dataprop,
                }.get(decl[0])
                ent = resolve(decl[1]) if len(decl) > 1 else None
                if mapped and ent and ent not in kind_of:
                    kind_of[ent] = mapped
                    subj_order.append(ent)
            return
        if head in ("SubClassOf", "SubObjectPropertyOf", "SubDataPropertyOf"):
            # drop axiom ANNOTATIONS before resolving operands — OWL-API
            # exports of OBO-derived ontologies annotate most SubClassOf
            # axioms, and treating the Annotation(...) node as operand 0
            # silently discarded the real edge (r5 self-review finding)
            operands = [
                a for a in args
                if not (isinstance(a, list) and a and a[0] == "Annotation")
            ]
            named = [resolve(a) for a in operands]
            if len(named) >= 2 and named[0] and named[1]:
                sub_edges.append((named[0], named[1]))
            return  # anonymous side → skipped atomically
        if head == "EquivalentClasses":
            operands = [
                a for a in args
                if not (isinstance(a, list) and a and a[0] == "Annotation")
            ]
            named = [r for r in (resolve(a) for a in operands) if r]
            if len(named) == len(operands) and len(named) >= 2:
                equiv_groups.append(named)
            return
        if head == "AnnotationAssertion":
            # drop axiom annotations FIRST — OWL-API exports annotate
            # nearly every synonym assertion with hasDbXref, and the
            # positional check below otherwise sees the Annotation node
            # as the property (r5 self-review round 2)
            args = [
                a for a in args
                if not (isinstance(a, list) and a and a[0] == "Annotation")
            ]
            if len(args) >= 3 and isinstance(args[2], tuple) and args[2][0] == "lit":
                prop, subj, val = resolve(args[0]), resolve(args[1]), args[2][1]
                if not prop or not subj:
                    return
                if prop == OWL_NS + "deprecated":
                    if val in ("true", "false"):
                        deprecated_of[subj] = val == "true"
                    return
                synonyms.append((subj, val, prop))
                if prop == RDFS_LABEL:
                    labels_of.setdefault(subj, []).append(val)
            return

    for node in nodes:
        if isinstance(node, list):
            handle(node)

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

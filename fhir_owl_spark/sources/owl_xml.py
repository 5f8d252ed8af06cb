"""Driver-side RDF/XML ontology reader → tabular ontology (S1 in
SURVEY.md §2.1).

The reference loads ontologies with the OWL API
(FhirOwlService.java:196-201); at production scale OUR input is already
tabular (concepts/edges/synonyms parquet or Iceberg). This reader exists
for fixture-scale parity runs against the reference's own test resources
(pizza.owl, duo.owl) — a single-digit-MB XML file parsed on the driver
with xml.etree, then parallelized via createDataFrame.

Subset of RDF/XML handled (everything the reference's emitted concept
facts depend on):
  * owl:Class / owl:ObjectProperty / owl:DatatypeProperty with rdf:about
  * rdfs:subClassOf / rdfs:subPropertyOf with rdf:resource (anonymous
    restriction superclasses are ignored — they never become parent
    codes in the reference either: reasoner superclass nodes are named)
  * literal annotations (any child element with text) keyed by FULL
    property IRI; language tags recorded but NOT used for preference,
    matching the reference (all literals compete in one TreeSet,
    FhirOwlService.java:709-718)
  * owl:deprecated by property SHORT FORM in any namespace
    (isDeprecated, FhirOwlService.java:661-679)
  * owl:imports declarations (drives hasImports; imported documents are
    resolved by ``load_owl_closure`` — local mappings first, optional
    network download via ``http_fetcher`` with trust-all TLS for parity
    with the reference, Application.java:86-113)

Unsatisfiability (equivalent-to-Nothing): FULL DL reasoning is out of
scope (SURVEY.md §7.4), but the asserted patterns the reference's own
fixture exercises (FhirOwlService.java:520-527 filters the reasoner's
Nothing-equivalents; pizza.owl:1148-1160 IceCream, :620-628
CheeseyVegetableTopping) are reasoner-free TOLD set logic, computed here:

  * a class whose told ancestor-or-self set contains two classes declared
    disjoint (pairwise ``owl:disjointWith`` or ``owl:AllDisjointClasses``
    members) is unsatisfiable — CheeseyVegetableTopping's two disjoint
    asserted parents;
  * told ancestors include ``rdfs:domain``-inferred superclasses: a class
    asserted under an existence-forcing restriction (someValuesFrom /
    hasValue / min-cardinality ≥ 1) on property P is a told subclass of
    domain(P) — how IceCream ⊑ ∃hasTopping.FruitTopping +
    domain(hasTopping)=Pizza + disjoint(IceCream, Pizza) unsats IceCream.
    Domain-inferred edges feed ONLY the unsat check, never emitted parents;
  * anything told-under owl:Nothing is unsatisfiable.

Reasoner-produced sets (e.g. from restriction-body clashes told logic
can't see) can still be ORed in via ``unsatisfiable_iris``.

Defined classes: ``owl:equivalentClass``/``rdfs:subClassOf`` bodies of
the form intersectionOf(Named, …) yield told one-way subClassOf edges to
each NAMED conjunct (CheesyPizza ≡ Pizza ⊓ ∃hasTopping.CheeseTopping ⇒
CheesyPizza ⊑ Pizza — the shallow decidable slice of the reasoner's
defined-class classification); pure-Restriction conjuncts contribute no
parent edge.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from ..fixtures import Ontology
from ..schemas import OWL_THING, OWL_TOP_DATA_PROPERTY, OWL_TOP_OBJECT_PROPERTY

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDFS_LABEL = RDFS_NS + "label"

_ABOUT = f"{{{RDF_NS}}}about"
_RESOURCE = f"{{{RDF_NS}}}resource"


def _prop_iri(tag: str) -> str:
    # '{ns}local' → 'ns' + 'local'
    m = re.match(r"\{(.+)\}(.+)", tag)
    return (m.group(1) + m.group(2)) if m else tag


def _shortform(iri: str) -> str:
    m = re.search(r"([^/#]+)$", iri)
    return m.group(1) if m else iri


def _forces_existence(rest_el) -> tuple[str, str | None] | None:
    """If this owl:Restriction element forces every instance to have a
    filler (someValuesFrom / hasValue / min-cardinality ≥ 1 — the OWL
    constructs under which rdfs:domain membership is entailed), return
    (onProperty IRI, named filler IRI or None), else None. The filler
    (someValuesFrom / onClass resource) feeds unsat propagation: a class
    forced to instantiate an unsatisfiable filler is itself
    unsatisfiable. Universal (allValuesFrom) and max-cardinality
    restrictions are vacuously satisfiable without a filler and force
    nothing."""
    prop = None
    filler = None
    forces = False
    for c in rest_el:
        local = c.tag.rsplit("}", 1)[-1]
        if local == "onProperty" and c.get(_RESOURCE):
            prop = c.get(_RESOURCE)
        elif local == "someValuesFrom":
            forces = True
            filler = c.get(_RESOURCE) or filler
        elif local == "hasValue":
            forces = True  # filler is an individual, not a class — no filler IRI
        elif local == "onClass" and c.get(_RESOURCE):
            filler = c.get(_RESOURCE)
        elif local in (
            "minCardinality",
            "minQualifiedCardinality",
            "cardinality",
            "qualifiedCardinality",
        ):
            try:
                forces = forces or int((c.text or "0").strip()) >= 1
            except ValueError:
                pass
    return (prop, filler) if forces and prop else None


_BODY_REST_TAGS = {
    "onProperty",
    "someValuesFrom",
    "onClass",
    "minCardinality",
    "minQualifiedCardinality",
}


def _body_min_cardinality(rest_el) -> tuple[str, int, str | None] | None:
    """If this owl:Restriction is ≥n p (unqualified minCardinality, any
    n ≥ 1) or ≥n p.C (minQualifiedCardinality n ≥ 2 with a NAMED
    onClass — the n = 1 qualified form is _body_existential's job),
    return (p, n, C|None); else None. Satisfying ≥n needs n told
    existential fillers that are PAIRWISE told-disjoint (n provably
    distinct successors)."""
    prop = None
    n_val = None
    qualifier = None
    qualified = False
    for c in rest_el:
        local = c.tag.rsplit("}", 1)[-1]
        if local == "onProperty":
            prop = c.get(_RESOURCE)
        elif local in ("minCardinality", "minQualifiedCardinality"):
            qualified = local == "minQualifiedCardinality"
            try:
                n_val = int((c.text or "").strip())
            except ValueError:
                return None
        elif local == "onClass":
            if not c.get(_RESOURCE):
                return None
            qualifier = c.get(_RESOURCE)
        else:
            return None
    if prop is None or n_val is None or n_val < 1:
        return None
    if qualified and (qualifier is None or n_val < 2):
        return None  # qualified needs the class; n=1 is the exists form
    if not qualified and qualifier is not None:
        return None
    return (prop, n_val, qualifier)


def _has_value_of(rest_el) -> tuple[str, str] | None:
    """If this owl:Restriction is a pure ``p hasValue individual`` (named
    individual), return (p, individual); else None. Satisfying the
    conjunct needs a told hasValue of the SAME individual — no
    owl:sameAs reasoning."""
    prop = None
    ind = None
    for c in rest_el:
        local = c.tag.rsplit("}", 1)[-1]
        if local == "onProperty":
            prop = c.get(_RESOURCE)
        elif local == "hasValue":
            if not c.get(_RESOURCE):
                return None  # literal value — out of the told slice
            ind = c.get(_RESOURCE)
        else:
            return None
    return (prop, ind) if prop and ind else None


def _universal_of(rest_el) -> tuple[str, tuple[str, ...]] | None:
    """If this owl:Restriction is a pure universal ∀p.C with C a NAMED
    class or a union of named classes, return (p, disjuncts); else None.
    These told universals are the closure axioms (e.g. Margherita ⊑
    ∀hasTopping.(Mozzarella ∪ Tomato)) that let told logic prove
    NEGATIVE facts: every p-successor lies under one of the disjuncts."""
    prop = None
    fillers: tuple[str, ...] | None = None
    saw_all = False
    for c in rest_el:
        local = c.tag.rsplit("}", 1)[-1]
        if local == "onProperty":
            prop = c.get(_RESOURCE)
        elif local == "allValuesFrom":
            saw_all = True
            if c.get(_RESOURCE):
                fillers = (c.get(_RESOURCE),)
            else:
                for gc in c:  # anonymous filler: only unionOf-of-named
                    if gc.tag == f"{{{OWL_NS}}}Class":
                        for u in gc:
                            if u.tag == f"{{{OWL_NS}}}unionOf":
                                members = [m.get(_ABOUT) for m in u]
                                if members and all(members):
                                    fillers = tuple(members)
        else:
            return None  # mixed restriction — not a pure universal
    if prop and saw_all and fillers:
        return (prop, fillers)
    return None


def _negated_existential_of(class_el) -> tuple[str, str] | None:
    """If this anonymous owl:Class element is ¬∃p.F with F named
    (complementOf over a someValuesFrom restriction — VegetarianPizza's
    body conjuncts), return (p, F); else None."""
    comp = None
    for c in class_el:
        if c.tag.rsplit("}", 1)[-1] == "complementOf":
            comp = c
        else:
            return None
    if comp is None:
        return None
    rest = [g for g in comp]
    if len(rest) != 1 or rest[0].tag != f"{{{OWL_NS}}}Restriction":
        return None
    prop = None
    filler = None
    for c in rest[0]:
        local = c.tag.rsplit("}", 1)[-1]
        if local == "onProperty":
            prop = c.get(_RESOURCE)
        elif local == "someValuesFrom" and c.get(_RESOURCE):
            filler = c.get(_RESOURCE)
        else:
            return None
    return (prop, filler) if prop and filler else None


def _body_existential(rest_el) -> tuple | None:
    """Parse a Restriction appearing as a DEFINED-CLASS BODY conjunct into
    an existential form ∃p.req that told logic can check for membership:
    someValuesFrom with a named class (req = the IRI string), or
    min(Qualified)Cardinality == 1 with a named onClass, or — since the
    round-5 nested-restriction slice — someValuesFrom over an anonymous
    positive-existential filler (req = a _parse_filler tree: and/or of
    named classes and nested ∃). Anything else — allValuesFrom, hasValue,
    exact/max cardinality, min ≥ 2, fillers outside the positive
    fragment — returns None: a told ∃p'.F' cannot witness those, so the
    whole body becomes ineligible for membership inference (sound:
    we only ever SKIP inferences)."""
    prop = None
    filler = None
    has_some = False
    min_one = False
    for c in rest_el:
        local = c.tag.rsplit("}", 1)[-1]
        if local not in _BODY_REST_TAGS:
            return None
        if local == "onProperty":
            prop = c.get(_RESOURCE)
        elif local == "someValuesFrom":
            if c.get(_RESOURCE):
                filler = c.get(_RESOURCE)
            else:  # anonymous filler: positive-existential tree or abstain
                kids = list(c)
                if len(kids) != 1:
                    return None
                filler = _parse_filler(kids[0])
                if filler is None:
                    return None
            has_some = True
        elif local == "onClass":
            if not c.get(_RESOURCE):
                return None
            filler = c.get(_RESOURCE)
        else:  # minCardinality / minQualifiedCardinality
            try:
                if int((c.text or "").strip()) != 1:
                    return None
            except ValueError:
                return None
            min_one = True
    if prop and filler and (has_some or min_one):
        return (prop, filler)
    return None


def _parse_filler(el):
    """Requirement tree for an ANONYMOUS existential filler appearing in
    a defined-class body (round-5 nested-restriction slice): what must
    hold of the successor for the conjunct to be satisfied.

      'iri'                — named class: successor told-under iri
      ('and', (req, …))    — intersectionOf: every sub-requirement
      ('or',  (req, …))    — unionOf: some sub-requirement
      ('some', q, req)     — nested ∃q.(…): the successor itself has a
                             told existential ∃q'.G with q' ⊑* q and G
                             satisfying req

    Anything outside this positive-existential fragment (universals,
    complements, cardinalities, hasValue, data ranges) returns None —
    the caller then abstains on the WHOLE body, so no unsound edge is
    ever emitted (same discipline as _body_existential)."""
    if el.get(_ABOUT):
        return el.get(_ABOUT)
    if el.tag == f"{{{OWL_NS}}}Restriction":
        prop = None
        sub = None
        saw_some = False
        for c in el:
            local = c.tag.rsplit("}", 1)[-1]
            if local == "onProperty":
                prop = c.get(_RESOURCE)
            elif local == "someValuesFrom":
                saw_some = True
                if c.get(_RESOURCE):
                    sub = c.get(_RESOURCE)
                else:
                    kids = list(c)
                    if len(kids) == 1:
                        sub = _parse_filler(kids[0])
            else:
                return None
        return ("some", prop, sub) if prop and saw_some and sub else None
    if el.tag in (f"{{{OWL_NS}}}Class", f"{{{RDF_NS}}}Description"):
        for c in el:
            if c.tag == f"{{{OWL_NS}}}intersectionOf":
                subs = tuple(_parse_filler(m) for m in c)
                if subs and all(s is not None for s in subs):
                    return ("and", subs)
                return None
            if c.tag == f"{{{OWL_NS}}}unionOf":
                subs = tuple(_parse_filler(m) for m in c)
                if subs and all(s is not None for s in subs):
                    return ("or", subs)
                return None
        return None
    return None


def _negated_named_of(class_el) -> str | None:
    """If this anonymous owl:Class element is ¬V for a NAMED class V
    (complementOf with rdf:resource — NonVegetarianPizza's body shape),
    return V; else None."""
    comp = None
    for c in class_el:
        if c.tag.rsplit("}", 1)[-1] == "complementOf":
            comp = c
        else:
            return None
    if comp is None:
        return None
    return comp.get(_RESOURCE)


def _classify_defined_members(
    edges: list[tuple[str, str]],
    existential_uses: set[tuple[str, str, str | None]],
    bodies: dict[str, list[list]],
    class_iris: set[str],
    universal_uses: set[tuple[str, str, tuple[str, ...]]] = frozenset(),
    disjoint_pairs: set[tuple[str, str]] = frozenset(),
    negation_uses: set[tuple[str, str, str]] = frozenset(),
    hasvalue_uses: set[tuple[str, str, str]] = frozenset(),
    inverse_pairs: set[tuple[str, str]] = frozenset(),
    chain_axioms: set[tuple[tuple[str, ...], str]] = frozenset(),
) -> list[tuple[str, str]]:
    """Told-slice defined-class MEMBERSHIP classification — the told
    slice of what the reference's reasoner (ELK/JFact, loaded at
    FhirOwlService.java:258, superclasses consumed at :533) infers for
    defined classes: X ⊑ D for D ≡ C₁ ⊓ … ⊓ Cₙ whenever X's told
    closure satisfies EVERY conjunct —

      * named N:            N ∈ anc(X);
      * existential ∃p.F:   some told ∃p'.F' on X or a told ancestor,
        with p' ⊑* p (told property hierarchy) and F' ⊑* F; F may also
        be an anonymous positive-existential tree (and/or of named
        classes, nested ∃q.(…) — round-5 nested-restriction slice),
        checked recursively against F' by ``filler_sat``;
      * universal ∀p.(C₁∪…): some told ∀p'.(D₁∪…) on X or an ancestor
        with p ⊑* p' (X's p-successors are p'-successors) and every Dᵢ
        told-subsumed by some Cⱼ;
      * negated existential ¬∃p.F: some told ∀p'.(D₁∪…) with p ⊑* p'
        where every Dᵢ ⊓ F is told-unsatisfiable (declared-disjoint
        ancestors, or a Nothing side) — the closure-axiom proof that
        e.g. Margherita ⊑ ∀hasTopping.(Mozzarella ∪ Tomato) can have no
        fish topping, landing it under VegetarianPizza ≡ Pizza ⊓
        ¬∃hasTopping.Fish ⊓ ¬∃hasTopping.Meat exactly as JFact does;
      * negated named ¬V: X ⊓ V must be told-unsatisfiable — declared-
        disjoint ancestor pair, OR one side's told existential ∃p.G
        clashing with the other side's told negation ¬∃p'.F
        (``negation_uses`` — the necessary direction of not_exists body
        conjuncts) with p ⊑* p' and G ⊑* F. Lands American under
        NonVegetarianPizza ≡ Pizza ⊓ ¬VegetarianPizza: American's told
        ∃hasTopping.PeperoniSausage(⊑ Meat) contradicts VegetarianPizza's
        necessary ¬∃hasTopping.MeatTopping.

    Run to fixpoint: an inferred X ⊑ D edge can satisfy another body's
    named conjunct (nested definitions). Sound but deliberately
    incomplete: bodies containing conjuncts outside the slice were never
    recorded in ``bodies`` (see _body_existential /
    _negated_existential_of / _universal_of), so no unsound edge is
    ever emitted. Ontology-bounded driver-side computation, like the
    parse itself."""
    from collections import defaultdict

    adj: dict[str, set[str]] = defaultdict(set)
    for c, p in edges:
        adj[c].add(p)

    # told inverseOf slice (round-5 item #6): owl:inverseOf is symmetric
    # (InverseOf(p,q) ⟺ q = p⁻), so (a) multiple told inverses of one
    # property are mutually equivalent (mutual ⊑ edges), and (b) the told
    # property hierarchy propagates through inverse pairs —
    # p ⊑* q ∧ p⁻, q⁻ told ⇒ p⁻ ⊑ q⁻. Saturated to fixpoint BEFORE
    # membership classification (class-edge inferences never add property
    # edges, so one pre-pass suffices). Sound: every added edge is
    # entailed by the asserted axioms alone.
    if inverse_pairs:
        inv_of: dict[str, set[str]] = defaultdict(set)
        for a, b in inverse_pairs:
            inv_of[a].add(b)
            inv_of[b].add(a)
        for p, invs in inv_of.items():
            si = sorted(invs)
            for i, a in enumerate(si):
                for b in si[i + 1:]:
                    adj[a].add(b)
                    adj[b].add(a)
        changed_inv = True
        while changed_inv:
            changed_inv = False
            for p, invs in list(inv_of.items()):
                reach: set[str] = set()
                todo = [p]
                seen = {p}
                while todo:
                    for q in adj[todo.pop()]:
                        if q not in seen:
                            seen.add(q)
                            reach.add(q)
                            todo.append(q)
                for q in reach:
                    for q_inv in inv_of.get(q, ()):
                        for p_inv in invs:
                            if q_inv not in adj[p_inv] and q_inv != p_inv:
                                adj[p_inv].add(q_inv)
                                changed_inv = True

    exist_of: dict[str, set[tuple[str, str]]] = defaultdict(set)
    exist_any: dict[str, set[tuple[str, str | None]]] = defaultdict(set)
    for c, p, f in existential_uses:
        exist_any[c].add((p, f))
        if f is not None:
            exist_of[c].add((p, f))
    univ_of: dict[str, set[tuple[str, tuple[str, ...]]]] = defaultdict(set)
    for c, p, fillers in universal_uses:
        univ_of[c].add((p, fillers))
    neg_of: dict[str, set[tuple[str, str]]] = defaultdict(set)
    for c, p, f in negation_uses:
        neg_of[c].add((p, f))
    hv_of: dict[str, set[tuple[str, str]]] = defaultdict(set)
    for c, p, i in hasvalue_uses:
        hv_of[c].add((p, i))
    nothing = OWL_NS + "Nothing"

    def anc(x: str) -> set[str]:
        out, todo = {x}, [x]
        while todo:
            for p in adj[todo.pop()]:
                if p not in out:
                    out.add(p)
                    todo.append(p)
        return out

    def pair_unsat(a_iri: str, b_iri: str) -> bool:
        if nothing in (a_iri, b_iri):
            return True
        aa, ab = anc(a_iri), anc(b_iri)
        return any(
            (min(x, y), max(x, y)) in disjoint_pairs for x in aa for y in ab
        )

    def filler_sat(f_have: str, req) -> bool:
        """Does the NAMED told filler f_have satisfy an existential-body
        filler requirement (round-5 nested-restriction slice)? req is a
        named IRI (told subsumption, the pre-round-5 behavior) or a
        _parse_filler tree — and/or over sub-requirements, or a nested
        ('some', q, sub) needing a told ∃q'.G on f_have or a told
        ancestor with q' ⊑* q and G satisfying sub. Evaluated inside the
        fixpoint loop, so inferred class edges and chain-derived
        existential facts sharpen it across iterations."""
        if isinstance(req, str):
            return req in anc(f_have)
        kind = req[0]
        if kind == "and":
            return all(filler_sat(f_have, s) for s in req[1])
        if kind == "or":
            return any(filler_sat(f_have, s) for s in req[1])
        q_req, sub = req[1], req[2]  # ("some", q, sub)
        return any(
            q_req in anc(q_have) and filler_sat(g_have, sub)
            for y in anc(f_have)
            for q_have, g_have in exist_of[y]
        )

    told_anc = {x: anc(x) for x in class_iris}
    changed = True
    while changed:
        changed = False
        # told property-chain slice (round-5): p1∘…∘pk ⊑ r
        # (owl:propertyChainAxiom; owl:TransitiveProperty arrives as
        # r∘r ⊑ r). If X's told closure forces a successor path
        # X —p1'→ F1 —p2'→ … —pk'→ Fk with every pi' ⊑* pi (each step's
        # existential asserted on the current filler or a told ancestor
        # of it), then every X-instance has an r-successor in Fk:
        # X ⊑ ∃r.Fk. Derived facts join exist_of/exist_any, so they can
        # satisfy existential body conjuncts AND seed further chain steps
        # — the same while-loop runs both to a joint fixpoint. Sound:
        # each added fact is entailed by the asserted axioms alone.
        if chain_axioms:
            for chain, r in chain_axioms:
                for x in class_iris:
                    frontier = {x}
                    for step in chain:
                        nxt: set[str] = set()
                        for cur in frontier:
                            for y in anc(cur):
                                for p_have, f_have in exist_of[y]:
                                    if step in anc(p_have):
                                        nxt.add(f_have)
                        frontier = nxt
                        if not frontier:
                            break
                    for g in frontier:
                        if (r, g) not in exist_of[x]:
                            exist_of[x].add((r, g))
                            exist_any[x].add((r, g))
                            changed = True
        for x in class_iris:
            a = anc(x)
            own_exists = set().union(*(exist_of[y] for y in a))
            own_univs = set().union(*(univ_of[y] for y in a))
            for d, blist in bodies.items():
                if d == x or d in a:
                    continue
                for conj in blist:
                    ok = True
                    for kind, *rest in conj:
                        if kind == "named":
                            if rest[0] not in a:
                                ok = False
                        elif kind == "exists":
                            p_req, f_req = rest
                            if not any(
                                p_req in anc(p_have)
                                and filler_sat(f_have, f_req)
                                for p_have, f_have in own_exists
                            ):
                                ok = False
                        elif kind == "only":
                            p_req, cs = rest
                            if not any(
                                p_have in anc(p_req)
                                and all(
                                    any(c in anc(dd) for c in cs)
                                    for dd in ds
                                )
                                for p_have, ds in own_univs
                            ):
                                ok = False
                        elif kind == "not_exists":
                            p_req, f_req = rest
                            # route 1: a told universal whose every
                            # disjunct is disjoint with the filler;
                            # route 2: a told negation ¬∃p'.F' with
                            # p ⊑* p' and F ⊑* F' (no p'-successor in
                            # F' ⇒ no p-successor in the narrower F)
                            own_negs = set().union(*(neg_of[y] for y in a))
                            if not (
                                any(
                                    p_have in anc(p_req)
                                    and all(pair_unsat(dd, f_req) for dd in ds)
                                    for p_have, ds in own_univs
                                )
                                or any(
                                    p_have in anc(p_req) and f_have in anc(f_req)
                                    for p_have, f_have in own_negs
                                )
                            ):
                                ok = False
                        elif kind == "min_n":
                            # ≥n p(.C): n told fillers, pairwise told-
                            # disjoint (provably distinct successors),
                            # each under C when qualified
                            import itertools

                            p_req, n_req, qual = rest
                            if n_req == 1:
                                pool_any = set().union(
                                    *(exist_any[y] for y in a)
                                )
                                if not any(
                                    p_req in anc(p_have)
                                    and (
                                        qual is None
                                        or (f_have is not None and qual in anc(f_have))
                                    )
                                    for p_have, f_have in pool_any
                                ):
                                    ok = False
                            else:
                                fillers = {
                                    f_have
                                    for p_have, f_have in own_exists
                                    if p_req in anc(p_have)
                                    and (qual is None or qual in anc(f_have))
                                }
                                ok = any(
                                    all(
                                        pair_unsat(x1, x2)
                                        for x1, x2 in itertools.combinations(sub, 2)
                                    )
                                    for sub in itertools.combinations(
                                        sorted(fillers), n_req
                                    )
                                )
                        elif kind == "has_value":
                            # p hasValue i: a told hasValue of the SAME
                            # individual on X or an ancestor, p' ⊑* p
                            p_req, i_req = rest
                            if not any(
                                p_req in anc(p_have) and i_have == i_req
                                for y in a
                                for p_have, i_have in hv_of[y]
                            ):
                                ok = False
                        else:  # ("not_named", V): prove X ⊓ V ⊑ ⊥
                            v = rest[0]
                            av = anc(v)
                            v_exists = set().union(*(exist_of[y] for y in av))
                            v_negs = set().union(*(neg_of[y] for y in av))
                            x_negs = set().union(*(neg_of[y] for y in a))

                            def _clash(negs, exists):
                                return any(
                                    p_n in anc(p_e) and f_n in anc(g_e)
                                    for p_n, f_n in negs
                                    for p_e, g_e in exists
                                )

                            disjoint = any(
                                (min(p_, q_), max(p_, q_)) in disjoint_pairs
                                for p_ in a
                                for q_ in av
                            )
                            if not (
                                disjoint
                                or _clash(v_negs, own_exists)
                                or _clash(x_negs, v_exists)
                            ):
                                ok = False
                        if not ok:
                            break
                    if ok:
                        adj[x].add(d)
                        changed = True
                        a = anc(x)  # refreshed for the remaining bodies
                        break
    # canonical, iteration-order-independent output: after saturation
    # (the least fixpoint — order cannot change it), emit every defined
    # class newly in X's ancestor closure. Redundant-but-true edges
    # (X ⊑ D already implied via another inferred member) are emitted
    # too; downstream transitive reduction (J4) prunes them exactly like
    # any other told redundancy.
    return [
        (x, d)
        for x in sorted(class_iris)
        for d in sorted(bodies)
        if d != x and d in anc(x) and d not in told_anc[x]
    ]


def _infer_unsatisfiable(
    edges: list[tuple[str, str]],
    disjoint_pairs: set[tuple[str, str]],
    class_iris: set[str],
    existential_fillers: set[tuple[str, str]] = frozenset(),
) -> set[str]:
    """Told-logic unsatisfiability (the asserted slice of the reference's
    reasoner Nothing-filter, FhirOwlService.java:520-527): a class is
    unsatisfiable iff its told ancestor-or-self set contains owl:Nothing
    or two classes declared disjoint. ``edges`` already includes the
    domain-inferred subsumptions. Subclasses of unsatisfiable classes are
    caught for free (their ancestor set is a superset). A fixpoint then
    propagates unsatisfiability through ``existential_fillers``
    ((class, named filler) from existence-forcing restrictions): a class
    forced to instantiate an unsatisfiable filler is unsatisfiable, and
    so are its told subclasses. Ontology-bounded driver-side computation,
    like the parse itself."""
    from collections import defaultdict

    adj: dict[str, set[str]] = defaultdict(set)
    children_of: dict[str, set[str]] = defaultdict(set)
    for c, p in edges:
        adj[c].add(p)
        children_of[p].add(c)
    partners: dict[str, set[str]] = defaultdict(set)
    for a, b in disjoint_pairs:
        partners[a].add(b)
        partners[b].add(a)
    nothing = OWL_NS + "Nothing"
    unsat: set[str] = set()
    for iri in class_iris:
        anc = {iri}
        stack = [iri]
        while stack:
            for p in adj[stack.pop()]:
                if p not in anc:
                    anc.add(p)
                    stack.append(p)
        if nothing in anc or any(partners[x] & anc for x in anc):
            unsat.add(iri)
    # fixpoint: unsat spreads down told edges and through restrictions
    # whose forced filler is unsat. owl:Nothing seeds the queue too —
    # C ⊑ ∃p.Nothing is unsatisfiable even though Nothing itself is not a
    # declared class (it never enters `unsat`, only propagates from it).
    needs_filler: dict[str, set[str]] = defaultdict(set)
    for c, f in existential_fillers:
        needs_filler[f].add(c)
    queue = list(unsat) + [nothing]
    while queue:
        u = queue.pop()
        for c in children_of[u] | needs_filler[u]:
            if c not in unsat:
                unsat.add(c)
                queue.append(c)
    unsat.discard(nothing)
    return unsat


class UnsupportedOwlFormatError(ValueError):
    """Raised when an ontology document cannot be routed to a reader.
    Since round 5 every serialization the reference's
    loadOntologyFromOntologyDocument auto-detects (RDF/XML, OWL/XML,
    functional syntax, Turtle, Manchester, OBO —
    FhirOwlService.java:201) has a reader dispatched by
    parse_ontology_document; this error now fires only for documents
    whose format cannot be detected at all, or when a specific parser is
    handed a document in a different serialization."""

    def __init__(self, fmt: str, path: str, hint: str = ""):
        self.format = fmt
        super().__init__(
            f"cannot parse {path} as OWL serialization {fmt!r}: supply "
            "RDF/XML, Turtle, OBO, functional syntax, OWL/XML, Manchester "
            "(parse_ontology_document auto-detects all six) or tabular "
            "input" + (f" ({hint})" if hint else "")
        )


def detect_owl_format(head: str) -> str:
    """Cheap format sniff on the first bytes of an ontology document.
    Returns one of 'rdfxml', 'owlxml', 'turtle', 'functional',
    'manchester', 'obo', 'unknown'. Mirrors the constructs the OWL API's
    auto-detection keys on, without parsing anything."""
    stripped = head.lstrip("﻿ \t\r\n")
    low = stripped.lower()
    if stripped.startswith("format-version:"):
        return "obo"
    if re.search(r"^\s*@(prefix|base)\b", stripped, re.MULTILINE) or re.search(
        r"^\s*(PREFIX|BASE)\s", stripped
    ):
        return "turtle"
    if re.search(r"^\s*(Prefix|Ontology)\(", stripped, re.MULTILINE):
        return "functional"
    if re.search(r"^\s*(Prefix|Class|ObjectProperty|Ontology):\s", stripped, re.MULTILINE):
        return "manchester"
    if low.startswith("<?xml") or low.startswith("<rdf:rdf") or low.startswith("<!doctype"):
        # OWL/XML's root element is <Ontology xmlns="…owl/2/xml"> — still
        # XML but a different vocabulary than RDF/XML
        if "www.w3.org/2006/12/owl2-xml" in low or re.search(
            r"<ontology\s[^>]*xmlns=\"http://www\.w3\.org/2002/07/owl", low
        ):
            return "owlxml"
        return "rdfxml"
    if stripped.startswith("<"):
        return "rdfxml" if "rdf" in low[:200] else "owlxml"
    return "unknown"


def sniff_owl_format(path: str) -> str:
    with open(path, encoding="utf-8", errors="replace") as fh:
        return detect_owl_format(fh.read(4096))


@dataclass
class ParsedOntology:
    ontology_iri: str | None
    version_iri: str | None
    has_imports: bool
    tables: Ontology
    # ontology-level literal annotations, (property_iri, value) in document
    # order — the name/publisher/description fallback-chain source
    annotations: list = field(default_factory=list)
    # declared owl:imports IRIs (resolution to local files is the loader's
    # job — load_owl_closure — mirroring the reference's iri_mappings.txt)
    imports: list = field(default_factory=list)


def parse_owl_xml(
    path: str,
    include_object_properties: bool = True,
    include_data_properties: bool = False,
    unsatisfiable_iris: set[str] | None = None,
    ontology_id: str = "root",
    classify_defined: bool = True,
) -> ParsedOntology:
    fmt = sniff_owl_format(path)
    if fmt == "turtle":
        raise UnsupportedOwlFormatError(
            fmt, path, hint="or use fhir_owl_spark.sources.turtle.parse_turtle"
        )
    if fmt not in ("rdfxml", "unknown"):
        raise UnsupportedOwlFormatError(fmt, path)
    try:
        tree = ET.parse(path)
    except ET.ParseError as exc:
        if fmt == "unknown":
            raise UnsupportedOwlFormatError(
                "unknown", path, hint=f"not parseable as RDF/XML: {exc}"
            ) from exc
        raise
    root = tree.getroot()

    ont = Ontology()
    ontology_iri = None
    version_iri = None
    has_imports = False

    kinds = [(f"{{{OWL_NS}}}Class", f"{{{RDFS_NS}}}subClassOf")]
    if include_object_properties:
        kinds.append((f"{{{OWL_NS}}}ObjectProperty", f"{{{RDFS_NS}}}subPropertyOf"))
    if include_data_properties:
        kinds.append((f"{{{OWL_NS}}}DatatypeProperty", f"{{{RDFS_NS}}}subPropertyOf"))

    annotations: list[tuple[str, str]] = []
    import_iris: list[str] = []
    for el in root:
        if el.tag == f"{{{OWL_NS}}}Ontology":
            ontology_iri = el.get(_ABOUT)
            for ch in el:
                if ch.tag == f"{{{OWL_NS}}}versionIRI":
                    version_iri = ch.get(_RESOURCE)
                elif ch.tag == f"{{{OWL_NS}}}imports":
                    has_imports = True
                    if ch.get(_RESOURCE):
                        import_iris.append(ch.get(_RESOURCE))
                elif ch.tag.startswith("{") and ch.text and ch.text.strip():
                    # ontology-level LITERAL annotation (resource-valued
                    # annotations have no literal and are skipped, matching
                    # ann.getValue().asLiteral() in
                    # FhirOwlService.getOntologyAnnotationValue:681-692);
                    # property IRI = XML namespace + localname, document order
                    ns, local = ch.tag[1:].split("}", 1)
                    annotations.append((ns + local, ch.text))

    # Axioms for one IRI may be split across MULTIPLE rdf:about blocks
    # (legal RDF/XML; the OWL API merges them) — accumulate per IRI, then
    # emit one concept row each.
    seen: set[str] = set()
    kind_of: dict[str, str] = {}
    children: set[str] = set()
    deprecated_of: dict[str, bool] = {}
    labels_of: dict[str, list[str]] = {}
    # told-unsat inputs (module docstring): declared disjoint pairs,
    # existence-forcing restriction uses (class, property, filler|None)
    disjoint_pairs: set[tuple[str, str]] = set()
    existential_uses: set[tuple[str, str, str | None]] = set()
    # told universals (closure axioms): (class, property, union-disjuncts)
    universal_uses: set[tuple[str, str, tuple[str, ...]]] = set()
    # told negations ¬∃p.F (necessary direction of not_exists conjuncts)
    negation_uses: set[tuple[str, str, str]] = set()
    # told hasValue facts: (class, property, named individual)
    hasvalue_uses: set[tuple[str, str, str]] = set()
    # defined-class bodies fully inside the told membership slice:
    # iri → list of conjunct lists (("named", N) | ("exists", p, F) |
    # ("only", p, (C…,)) | ("not_exists", p, F))
    defined_bodies: dict[str, list[list]] = {}
    restriction_tag = f"{{{OWL_NS}}}Restriction"
    class_tag = f"{{{OWL_NS}}}Class"
    intersection_tag = f"{{{OWL_NS}}}intersectionOf"
    union_tag = f"{{{OWL_NS}}}unionOf"
    disjoint_union_tag = f"{{{OWL_NS}}}disjointUnionOf"
    equivalent_tag = f"{{{OWL_NS}}}equivalentClass"
    for kind_tag, sub_tag in kinds:
        for el in root.iter(kind_tag):
            iri = el.get(_ABOUT)
            if iri is None:
                continue
            seen.add(iri)
            kind_of.setdefault(iri, kind_tag)
            labels = labels_of.setdefault(iri, [])
            for ch in el:
                prop = _prop_iri(ch.tag)
                res = ch.get(_RESOURCE)
                if ch.tag == f"{{{OWL_NS}}}disjointWith" and res is not None:
                    disjoint_pairs.add((min(iri, res), max(iri, res)))
                    continue
                if ch.tag == disjoint_union_tag:
                    # C disjointUnionOf(A, B, …) told-implies each named
                    # member ⊑ C plus pairwise member disjointness (the
                    # covering direction C ⊑ A∪B needs a reasoner — skipped)
                    members = [m.get(_ABOUT) for m in ch if m.get(_ABOUT)]
                    for i_m, a in enumerate(members):
                        ont.edge(a, iri)
                        children.add(a)
                        for b in members[i_m + 1:]:
                            disjoint_pairs.add((min(a, b), max(a, b)))
                    continue
                if res is None and ch.tag in (
                    sub_tag, f"{{{OWL_NS}}}equivalentClass"
                ):
                    # equally legal named-node form emitted by some tools:
                    # <rdfs:subClassOf><owl:Class rdf:about="X"/></rdfs:subClassOf>
                    # (also rdf:Description; same for equivalentClass).
                    # Anonymous bodies never become a named parent directly,
                    # but two told slices are extracted (module docstring):
                    # existence-forcing restrictions (→ domain-inferred
                    # unsat edges) and intersectionOf NAMED conjuncts
                    # (→ one-way defined-class subsumption).
                    for gc in ch:
                        if gc.tag in (
                            class_tag,
                            f"{{{RDF_NS}}}Description",
                        ) and gc.get(_ABOUT):
                            res = gc.get(_ABOUT)
                            break
                        if gc.tag == restriction_tag:
                            pf = _forces_existence(gc)
                            if pf:
                                existential_uses.add((iri, *pf))
                            uv = _universal_of(gc)
                            if uv:
                                universal_uses.add((iri, uv[0], uv[1]))
                            hv = _has_value_of(gc)
                            if hv:
                                hasvalue_uses.add((iri, *hv))
                        elif gc.tag == class_tag:  # anonymous class body
                            for inter in gc:
                                if inter.tag == intersection_tag:
                                    # conjunct list for the membership
                                    # slice; None marks a conjunct told
                                    # logic cannot witness → whole body
                                    # ineligible (skipped, never unsound)
                                    conjuncts: list | None = []
                                    for m in inter:
                                        if m.get(_ABOUT):
                                            # C ≡/⊑ A ⊓ … ⇒ C ⊑ A (one-way:
                                            # the conjunction is NOT ⊑ C)
                                            ont.edge(iri, m.get(_ABOUT))
                                            children.add(iri)
                                            conjuncts.append(("named", m.get(_ABOUT)))
                                        elif m.tag == restriction_tag:
                                            pf = _forces_existence(m)
                                            if pf:
                                                existential_uses.add((iri, *pf))
                                            uv = _universal_of(m)
                                            if uv:
                                                # X ≡/⊑ … ⊓ ∀p.C also
                                                # ASSERTS X ⊑ ∀p.C
                                                universal_uses.add(
                                                    (iri, uv[0], uv[1])
                                                )
                                            hv = _has_value_of(m)
                                            if hv:
                                                hasvalue_uses.add((iri, *hv))
                                            be = _body_existential(m)
                                            mc = _body_min_cardinality(m)
                                            if be:
                                                conjuncts.append(("exists", *be))
                                            elif uv:
                                                conjuncts.append(
                                                    ("only", uv[0], uv[1])
                                                )
                                            elif mc:
                                                conjuncts.append(("min_n", *mc))
                                            elif hv:
                                                conjuncts.append(("has_value", *hv))
                                            else:
                                                conjuncts.append(None)
                                        elif m.tag == class_tag:
                                            ne = _negated_existential_of(m)
                                            if ne:
                                                # necessary direction: the
                                                # described class told-has
                                                # this negation (feeds the
                                                # not_named clash proofs)
                                                negation_uses.add((iri, *ne))
                                                conjuncts.append(("not_exists", *ne))
                                            else:
                                                nn = _negated_named_of(m)
                                                conjuncts.append(
                                                    ("not_named", nn) if nn else None
                                                )
                                        else:
                                            conjuncts.append(None)
                                    if (
                                        ch.tag == equivalent_tag
                                        and conjuncts
                                        and all(c is not None for c in conjuncts)
                                    ):
                                        defined_bodies.setdefault(iri, []).append(
                                            conjuncts
                                        )
                                elif (
                                    inter.tag == union_tag
                                    and ch.tag == equivalent_tag
                                ):
                                    # C ≡ A ∪ B ⇒ A ⊑ C, B ⊑ C (each
                                    # disjunct is subsumed by the union);
                                    # ONLY for equivalence — C ⊑ A∪B
                                    # implies nothing about the members
                                    for m in inter:
                                        if m.get(_ABOUT):
                                            ont.edge(m.get(_ABOUT), iri)
                                            children.add(m.get(_ABOUT))
                if ch.tag == sub_tag and res is not None:
                    ont.edge(iri, res)
                    children.add(iri)
                    continue
                # NAMED equivalence (A ≡ B between class IRIs) ⟺ mutual
                # subsumption: emit both edges; equivalence_mode='group'
                # then reproduces the reasoner's strict-superclass output
                # (members share external parents). Anonymous equivalents
                # (owl:Restriction bodies, pizza.owl's usual form) have no
                # rdf:resource and are skipped — the reference only emits
                # named parents too.
                if ch.tag == f"{{{OWL_NS}}}equivalentClass" and res is not None:
                    ont.edge(iri, res)
                    ont.edge(res, iri)
                    children.add(iri)
                    children.add(res)
                    continue
                text = (ch.text or "").strip()
                if not text:
                    continue
                # deprecated by property short form, boolean literal only
                if _shortform(prop) == "deprecated":
                    if text in ("true", "false"):
                        deprecated_of[iri] = text == "true"
                    continue
                ont.synonym(iri, text, prop=prop)
                if prop == RDFS_LABEL:
                    labels.append(text)
    # owl:AllDisjointClasses blocks (both the typed-rdf:Description and the
    # direct-element serializations) → pairwise disjointness over members.
    # owl:AllDifferent (individuals, distinctMembers) is intentionally not
    # matched.
    rdf_type_tag = f"{{{RDF_NS}}}type"
    members_tag = f"{{{OWL_NS}}}members"
    adc_iri = OWL_NS + "AllDisjointClasses"
    for el in root.iter():
        if el.tag != f"{{{OWL_NS}}}AllDisjointClasses" and not any(
            c.tag == rdf_type_tag and c.get(_RESOURCE) == adc_iri for c in el
        ):
            continue
        for mem in el:
            if mem.tag != members_tag:
                continue
            abouts = [m.get(_ABOUT) for m in mem if m.get(_ABOUT)]
            for i, a in enumerate(abouts):
                for b in abouts[i + 1:]:
                    disjoint_pairs.add((min(a, b), max(a, b)))

    # rdfs:domain sweep (any described element, so classes-only parses
    # still see property domains for the unsat inference); multiple
    # domains = intersection in OWL — first one kept is sound for the
    # two-disjoint-ancestors check (never adds a spurious ancestor).
    domain_tag = f"{{{RDFS_NS}}}domain"
    domains: dict[str, str] = {}
    for el in root.iter():
        about = el.get(_ABOUT)
        if about is None:
            continue
        for c in el:
            if c.tag == domain_tag and c.get(_RESOURCE):
                domains.setdefault(about, c.get(_RESOURCE))

    # owl:inverseOf sweep (told slice, round-5 item #6): symmetric pairs
    # feeding the property-hierarchy saturation inside membership
    # classification (p ⊑* q propagates to the told inverses). NAMED
    # inverses only — anonymous inverse expressions are outside the slice.
    # The rdfs:subPropertyOf sweep alongside it makes the property
    # hierarchy visible to the classifier in CLASSES-ONLY parses too
    # (like the rdfs:domain sweep for unsat) — the reference's EL path
    # skips property CONCEPTS but its reasoner still walks the property
    # hierarchy when matching existential bodies.
    inverse_tag = f"{{{OWL_NS}}}inverseOf"
    subprop_tag = f"{{{RDFS_NS}}}subPropertyOf"
    # told property-chain slice (round-5): owl:propertyChainAxiom on a
    # property r holds the ORDERED chain p1…pk with meaning
    # p1∘…∘pk ⊑ r; owl:TransitiveProperty r is exactly r∘r ⊑ r (both
    # element form and rdf:type form). NAMED chain members only — a
    # chain containing an anonymous/inverse expression is skipped whole
    # (sound abstention), never partially read.
    chain_tag = f"{{{OWL_NS}}}propertyChainAxiom"
    transitive_prop_tag = f"{{{OWL_NS}}}TransitiveProperty"
    rdf_type_tag = f"{{{RDF_NS}}}type"
    inverse_pairs: set[tuple[str, str]] = set()
    prop_sub_edges: set[tuple[str, str]] = set()
    chain_axioms: set[tuple[tuple[str, ...], str]] = set()
    for el in root.iter():
        about = el.get(_ABOUT)
        if about is None:
            continue
        if el.tag == transitive_prop_tag:
            chain_axioms.add(((about, about), about))
        for c in el:
            if c.tag == inverse_tag and c.get(_RESOURCE):
                pair = (about, c.get(_RESOURCE))
                inverse_pairs.add((min(pair), max(pair)))
            elif c.tag == subprop_tag and c.get(_RESOURCE):
                prop_sub_edges.add((about, c.get(_RESOURCE)))
            elif (
                c.tag == rdf_type_tag
                and c.get(_RESOURCE) == OWL_NS + "TransitiveProperty"
            ):
                chain_axioms.add(((about, about), about))
            elif c.tag == chain_tag:
                members: list[str] = []
                all_named = True
                for m in c:
                    if m.get(_ABOUT):
                        members.append(m.get(_ABOUT))
                    else:
                        all_named = False
                        break
                if all_named and len(members) >= 2:
                    chain_axioms.add((tuple(members), about))

    class_iris = {i for i, k in kind_of.items() if k == class_tag}

    # EL-slice defined-class membership (reasoner parity, What's-missing
    # item of round 3): classify every class whose told closure satisfies
    # a defined class's full intersection body, BEFORE the unsat check so
    # an inferred membership under a disjoint ancestor correctly unsats.
    # Uses asserted edges only — domain-inferred edges stay unsat-only.
    if classify_defined and defined_bodies:
        for c, p in _classify_defined_members(
            [(e["child_iri"], e["parent_iri"]) for e in ont.edges]
            + sorted(prop_sub_edges),
            existential_uses,
            defined_bodies,
            class_iris,
            universal_uses,
            disjoint_pairs,
            negation_uses,
            hasvalue_uses,
            inverse_pairs,
            chain_axioms,
        ):
            ont.edge(c, p)
            children.add(c)

    # told-unsat: asserted edges + domain-inferred edges (unsat-only, never
    # emitted as parents), then the two-disjoint-ancestors / under-Nothing
    # check; caller-supplied reasoner output is ORed in.
    unsat_edges = [(e["child_iri"], e["parent_iri"]) for e in ont.edges]
    unsat_edges += [
        (c, domains[p]) for c, p, _ in existential_uses if p in domains
    ]
    fillers = {(c, f) for c, _, f in existential_uses if f is not None}
    unsat = set(unsatisfiable_iris or ())
    nothing_iri = OWL_NS + "Nothing"
    if (
        disjoint_pairs
        or any(p == nothing_iri for _, p in unsat_edges)
        or any(f == nothing_iri for _, f in fillers)
    ):
        unsat |= _infer_unsatisfiable(
            unsat_edges, disjoint_pairs, class_iris, fillers
        )

    for iri in kind_of:
        labels = labels_of.get(iri, [])
        ont.concept(
            iri,
            ontology_id,
            label=min(labels) if labels else None,
            deprecated=deprecated_of.get(iri, False),
            imported=False,  # single-document parse: closure merge marks these
            unsatisfiable=iri in unsat,
        )

    # Reasoner-completion stand-in for PROPERTIES: the reasoner reports
    # topObjectProperty among every object property's superproperties
    # (reasoner.getSuperObjectProperties, FhirOwlService.java:550); classes
    # are completed to owl:Thing by the engine (operators/hierarchy.py),
    # but the engine is kind-blind, so the parser — which knows the kind —
    # roots parentless properties here.
    n_object_props = 0
    n_data_props = 0
    for iri, kind_tag in kind_of.items():
        if kind_tag.endswith("ObjectProperty"):
            n_object_props += 1
            if iri not in children:
                ont.edge(iri, OWL_TOP_OBJECT_PROPERTY)
        elif kind_tag.endswith("DatatypeProperty"):
            # data properties root at owl:topDataProperty exactly like
            # object properties at topObjectProperty
            # (reasoner.getSuperDataProperties, FhirOwlService.java:571-577)
            n_data_props += 1
            if iri not in children:
                ont.edge(iri, OWL_TOP_DATA_PROPERTY)

    # The reference adds owl:Thing explicitly (classes.add(factory.getOWLThing()),
    # FhirOwlService.java:519); with imports present Thing is not in the main
    # signature → imported (what FhirOwlServiceTest.java:166 asserts for DUO).
    if OWL_THING not in seen:
        ont.concept(OWL_THING, ontology_id, imported=has_imports)
    # topObjectProperty is only added when object properties are processed
    # (the jfact-only path, FhirOwlService.java:543-564)
    if include_object_properties and n_object_props and OWL_TOP_OBJECT_PROPERTY not in seen:
        ont.concept(OWL_TOP_OBJECT_PROPERTY, ontology_id, imported=has_imports)
    # topDataProperty likewise, only when data properties are processed and
    # at least one exists (dataProps.add(factory.getOWLTopDataProperty()),
    # FhirOwlService.java:566-569)
    if include_data_properties and n_data_props and OWL_TOP_DATA_PROPERTY not in seen:
        ont.concept(OWL_TOP_DATA_PROPERTY, ontology_id, imported=has_imports)

    return ParsedOntology(
        ontology_iri, version_iri, has_imports, ont, annotations, import_iris
    )


def union_ontologies(*parsed: ParsedOntology) -> Ontology:
    """Imports-closure union (S2 in SURVEY.md §2.1): merge per-document
    tables the way the reference unions signatures over
    manager.getImportsClosure (FhirOwlService.java:219). The FIRST
    ontology is the root; everything else is marked imported (the
    set-difference semantics of calculateIrisInMain,
    FhirOwlService.java:265-281: an IRI present in any imported document
    is imported, even if also in the root signature)."""
    merged = Ontology()
    imported_iris = {
        c["iri"] for p in parsed[1:] for c in p.tables.concepts
    }
    row_of: dict[str, dict] = {}
    for i, p in enumerate(parsed):
        for c in p.tables.concepts:
            if c["iri"] in row_of:
                # closure display map back-fill: a class declared label-less
                # in the root (a stub) gets its preferred term from the
                # first closure document that has one — the iriDisplayMap
                # loop over manager.getImportsClosure
                # (FhirOwlService.java:219-229, 'if pt != null put'),
                # made deterministic as first-non-null in root-first order
                if row_of[c["iri"]]["label"] is None and c.get("label") is not None:
                    row_of[c["iri"]]["label"] = c["label"]
                continue
            row = dict(c)
            row["imported"] = c["iri"] in imported_iris or (i > 0)
            row_of[c["iri"]] = row
            merged.concepts.append(row)
        merged.edges.extend(p.tables.edges)
        # annotations outside the root document don't feed preferred-term
        # selection (EntitySearcher scans the root ontology only,
        # FhirOwlService.java:710) — imported labels only feed the closure
        # display map, which is the concepts.label column here.
        if i == 0:
            merged.synonyms.extend(p.tables.synonyms)
    return merged


def parse_iri_mappings_file(path: str) -> dict[str, str]:
    """iri_mappings.txt-style file: one `IRI,local-path` per line, `#`
    comments skipped (the reference reads the same format from the
    classpath and resolves paths against $HOME — FhirOwlService.init:86-117;
    here paths are used as given, absolute or CWD-relative)."""
    mappings: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",", 1)
            if len(parts) == 2:
                mappings[parts[0].strip()] = parts[1].strip()
    return mappings


def http_fetcher(
    cache_dir: str | None = None,
    timeout: float = 30.0,
    verify_tls: bool = True,
    allow_private_hosts: bool = False,
    max_bytes: int = 256 * 1024 * 1024,
):
    """Build a ``fetch(iri) -> local path`` callable that downloads remote
    ``owl:imports`` documents over HTTP(S), mirroring the reference's
    network-import resolution (FhirOwlService.java:196-229).

    TLS: verified by default. ``verify_tls=False`` reproduces the
    reference's trust-all SSLContext (Application.java:86-113 —
    ``trustEverything()`` with an all-accepting X509TrustManager and
    hostname verifier) for self-signed ontology hosts — explicit opt-in
    only, because import IRIs are ontology-controlled content.

    SSRF guard: IRIs resolving to loopback / link-local / private /
    reserved addresses are rejected unless ``allow_private_hosts=True``
    (imports are fetched recursively, so a hostile document could
    otherwise probe internal hosts). The guard is enforced at CONNECT
    time on EVERY hop via IP-pinned connections — redirects are
    re-validated (and non-http(s) redirect targets rejected) by a custom
    redirect handler, and the TCP connect goes to the address that was
    vetted, closing both the redirect bypass and the DNS-rebinding
    TOCTOU between resolve and fetch.

    Size guard: the response is STREAMED to the cache file and the fetch
    aborts once ``max_bytes`` is exceeded — a hostile or misconfigured
    host cannot exhaust driver memory (the largest real ontologies,
    SNOMED-scale, are low-hundreds of MB; default cap 256 MiB).

    Each IRI is downloaded at most once per fetcher instance, into
    ``cache_dir`` (a fresh tempdir by default). Raises ``URLError`` /
    ``OSError`` / ``ValueError`` on failure — ``load_owl_closure``
    catches, warns, and continues, matching the reference's log-and-skip
    on unresolvable imports.
    """
    import hashlib
    import http.client
    import ipaddress
    import os
    import socket
    import ssl
    import tempfile
    import urllib.parse
    import urllib.request

    cache = cache_dir or tempfile.mkdtemp(prefix="owl_imports_")
    os.makedirs(cache, exist_ok=True)
    if verify_tls:
        ctx = ssl.create_default_context()
    else:
        ctx = ssl._create_unverified_context()  # noqa: S323 — reference parity, opt-in
    seen: dict[str, str] = {}

    def _resolve_validated(host: str) -> str:
        """Resolve ``host`` ONCE, reject non-public addresses, and return
        the vetted IP so the connection can be pinned to it.

        Pinning closes the DNS-rebinding TOCTOU (a second lookup at
        connect time could return a different, internal address) and —
        because the pinning connection classes below run this for EVERY
        hop urllib opens — also covers HTTP redirects: a public ontology
        host 302-ing to http://169.254.169.254/ is rejected at the
        redirected hop's connect, not just at the initial IRI.
        """
        try:
            infos = socket.getaddrinfo(host, None, type=socket.SOCK_STREAM)
        except OSError as exc:
            raise ValueError(f"cannot resolve owl:imports host {host!r}") from exc
        for info in infos:
            addr = ipaddress.ip_address(info[4][0])
            if (
                addr.is_private
                or addr.is_loopback
                or addr.is_link_local
                or addr.is_reserved
                or addr.is_unspecified
            ):
                raise ValueError(
                    f"owl:imports host {host!r} resolves to non-public address "
                    f"{addr} — pass allow_private_hosts=True to permit"
                )
        return infos[0][4][0]

    class _PinnedHTTPConnection(http.client.HTTPConnection):
        def connect(self):
            ip = self.host if allow_private_hosts else _resolve_validated(self.host)
            self.sock = socket.create_connection(
                (ip, self.port), self.timeout, self.source_address
            )

    class _PinnedHTTPSConnection(http.client.HTTPSConnection):
        def connect(self):
            ip = self.host if allow_private_hosts else _resolve_validated(self.host)
            sock = socket.create_connection(
                (ip, self.port), self.timeout, self.source_address
            )
            # SNI / certificate verification still use the HOSTNAME, only
            # the TCP connect is pinned to the vetted IP.
            self.sock = self._context.wrap_socket(sock, server_hostname=self.host)

    class _PinningHTTPHandler(urllib.request.HTTPHandler):
        def http_open(self, req):
            return self.do_open(_PinnedHTTPConnection, req)

    class _PinningHTTPSHandler(urllib.request.HTTPSHandler):
        def https_open(self, req):
            return self.do_open(_PinnedHTTPSConnection, req, context=self._context)

    class _ValidatingRedirectHandler(urllib.request.HTTPRedirectHandler):
        """Re-run the scheme + host policy on every redirect hop (capped at
        urllib's default max_redirections) — a hostile host cannot 302 an
        https fetch into file:// or an internal address."""

        def redirect_request(self, req, fp, code, msg, headers, newurl):
            parts = urllib.parse.urlsplit(urllib.parse.urljoin(req.full_url, newurl))
            if parts.scheme not in ("http", "https"):
                raise ValueError(
                    f"owl:imports redirect to unsupported scheme {parts.scheme!r}: {newurl}"
                )
            if not allow_private_hosts:
                _resolve_validated(parts.hostname or "")
            return super().redirect_request(req, fp, code, msg, headers, newurl)

    opener = urllib.request.build_opener(
        _PinningHTTPHandler(),
        _PinningHTTPSHandler(context=ctx),
        _ValidatingRedirectHandler(),
    )

    def fetch(iri: str) -> str:
        if iri in seen:
            return seen[iri]
        # http/https only: import IRIs are ontology-controlled content, and
        # urlopen would otherwise happily read file:// / ftp://
        parts = urllib.parse.urlsplit(iri)
        if parts.scheme not in ("http", "https"):
            raise ValueError(f"unsupported owl:imports scheme {parts.scheme!r}: {iri}")
        if not allow_private_hosts:
            _resolve_validated(parts.hostname or "")
        dest = f"{cache}/{hashlib.sha256(iri.encode()).hexdigest()[:24]}.owl"
        got = 0
        with opener.open(iri, timeout=timeout) as r, open(dest, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                got += len(chunk)
                if got > max_bytes:
                    f.close()
                    os.unlink(dest)
                    raise ValueError(
                        f"owl:imports document {iri} exceeds max_bytes="
                        f"{max_bytes} — raise the cap if this is expected"
                    )
                f.write(chunk)
        seen[iri] = dest
        return dest

    return fetch


def load_owl_closure(
    path: str,
    iri_mappings: dict[str, str] | None = None,
    include_object_properties: bool = True,
    include_data_properties: bool = False,
    unsatisfiable_iris: set[str] | None = None,
    fetcher=None,
) -> ParsedOntology:
    """Load a root document plus its imports closure (S2/S3 in SURVEY.md
    §2.1) from local files, optionally falling back to network fetch.

    Each declared owl:imports IRI is resolved through ``iri_mappings``
    (IRI → local file path — the analog of the reference's iri_mappings.txt
    redirections, FhirOwlService.java:86-117 + addIriMappings at :200);
    mapped documents are parsed and followed recursively (the closure).
    When an IRI has no mapping and ``fetcher`` is given (see
    :func:`http_fetcher`), the document is downloaded — the reference's
    default behavior for unmapped imports (trust-all TLS,
    Application.java:86-113). Unmapped IRIs with no fetcher, and fetch
    failures, are skipped with a warning exactly like the reference logs
    and continues when an import can't be resolved. The per-document
    tables are merged with union_ontologies: root classes stay main,
    closure classes are imported, and label-less root stubs get their
    display from the first closure document that names them
    (FhirOwlService.java:214-229).
    """
    import warnings

    # format-dispatching loader so a Turtle root or import document
    # parses (the reference's OWL API auto-detects per document —
    # a closure can legally mix serializations)
    from .turtle import parse_ontology_document

    mappings = iri_mappings or {}
    root = parse_ontology_document(
        path,
        include_object_properties=include_object_properties,
        include_data_properties=include_data_properties,
        unsatisfiable_iris=unsatisfiable_iris,
        ontology_id="root",
    )
    docs = [root]
    loaded: set[str] = set()
    queue = list(root.imports)
    while queue:
        iri = queue.pop(0)
        if iri in loaded:
            continue
        loaded.add(iri)
        local = mappings.get(iri)
        if local is None and fetcher is not None:
            try:
                local = fetcher(iri)
            except Exception as exc:  # log-and-continue, like the reference
                warnings.warn(
                    f"owl:imports {iri} fetch failed ({exc}) — skipped",
                    stacklevel=2,
                )
                continue
        if local is None:
            warnings.warn(
                f"owl:imports {iri} has no local mapping — skipped (displays "
                "for its classes fall back to IRIs)",
                stacklevel=2,
            )
            continue
        doc = parse_ontology_document(
            local,
            include_object_properties=include_object_properties,
            include_data_properties=include_data_properties,
            unsatisfiable_iris=unsatisfiable_iris,
            ontology_id=_shortform(iri),
        )
        docs.append(doc)
        queue.extend(doc.imports)

    merged = union_ontologies(*docs)
    return ParsedOntology(
        root.ontology_iri,
        root.version_iri,
        root.has_imports,
        merged,
        root.annotations,
        root.imports,
    )


# ---------------------------------------------------------------------------
# CodeSystem-metadata projection (F9/C3/C4 in SURVEY.md §2.2-2.3): one
# driver-side row — the reference builds it at FhirOwlService.java:309-475.
# ---------------------------------------------------------------------------


class NoOntologyIriError(RuntimeError):
    """Analog of the reference's NoIdException (FhirOwlService.java:341)."""


def ontology_metadata(parsed: ParsedOntology, cfg) -> dict:
    """CodeSystem metadata resolution — the full precedence/fallback
    semantics of createCodeSystem (FhirOwlService.java:313-475):

    * url: explicit wins verbatim; else ontology IRI with the optional
      '.owl'→'.fhir' rewrite; neither → error (:329-343)
    * version: explicit → version IRI → 'NA'; dateRegex applies to the
      RESOLVED version whatever its source (:348-378)
    * name: explicit → nameProp annotation (default rdfs:label) → raw
      ontology IRI (getOntologyName:750-771)
    * publisher: explicit → first publisherProps annotation, default
      dc:publisher (:405-415)
    * description: explicit → first descriptionProps annotation, default
      dc:subject then rdfs:comment (:424-432)
    * valueSet: explicit → url + '?vs'/'&vs' (createVsUrl via :455)
    * date: NEVER emitted — validation-only in the reference (the parsed
      Calendar is discarded; metadata.validate_date documents it)
    """
    from ..metadata import (
        DEFAULT_DESCRIPTION_PROPS,
        DEFAULT_PUBLISHER_PROPS,
        derive_vs_url,
        first_annotation_value,
        metadata_from_config,
    )

    meta = metadata_from_config(cfg)

    if cfg.url is not None:
        url = cfg.url
    else:
        url = parsed.ontology_iri
        if url is None:
            # NoIdException parity (FhirOwlService.java:340-342): no
            # explicit -url and no ontology IRI → the transformation fails
            raise NoOntologyIriError("The ontology has no IRI!")
        if url.endswith(".owl") and cfg.use_fhir_extension:
            url = url[:-3] + "fhir"  # '.owl' → '.fhir' (FhirOwlService.java:335-337)
    version = cfg.version or parsed.version_iri or "NA"
    if cfg.date_regex:
        m = re.search(cfg.date_regex, version)
        if m:
            try:
                version = m.group("year") + m.group("month") + m.group("day")
            except (IndexError, re.error):
                pass  # regex without the named groups → keep raw version
                # (the reference logs and keeps going, FhirOwlService.java:367-369)

    anns = parsed.annotations
    name = cfg.name
    if name is None:
        name = first_annotation_value(anns, (cfg.name_prop or RDFS_LABEL,))
    if name is None:
        if parsed.ontology_iri is None:
            raise NoOntologyIriError("The ontology has no IRI!")
        name = parsed.ontology_iri

    meta.update(
        url=url,
        version=version,
        name=name,
        publisher=cfg.publisher
        or first_annotation_value(anns, cfg.publisher_props or DEFAULT_PUBLISHER_PROPS),
        description=cfg.description
        or first_annotation_value(
            anns, cfg.description_props or DEFAULT_DESCRIPTION_PROPS
        ),
        valueset=cfg.valueset or derive_vs_url(url),
    )
    return meta

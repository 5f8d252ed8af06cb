"""Query API over the produced triple graph — what a reference user does
with the emitted CodeSystem today (terminology-server-style operations:
$lookup, parent/child navigation, $subsumes, ECL-ish descendant-of) plus
the transcript-side lookups the graft adds.

All operations are DataFrame programs over the TRIPLES table (pred-
partitioned parquet/Iceberg → predicate pruning at the scan); ancestor /
descendant sets reuse the same iterative-closure operator as the build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.hierarchy import reachable_pairs, reachable_set, transitive_closure


def _isa_edges(triples: DataFrame) -> DataFrame:
    return triples.filter(F.col("pred") == "is-a").select(
        F.col("subj").alias("child"), F.col("obj").alias("parent")
    )


def lookup(triples: DataFrame, code: str) -> dict:
    """$lookup analog: one concept's display, flags, synonyms, parents."""
    rows = triples.filter(F.col("subj") == code).collect()
    out: dict = {"code": code, "synonyms": [], "parents": []}
    for r in rows:
        if r["pred"] == "has-display":
            out["display"] = r["obj"]
        elif r["pred"] == "synonym-of":
            out["synonyms"].append(r["obj"])
        elif r["pred"] == "is-a":
            out["parents"].append(r["obj"])
        elif r["pred"] in ("deprecated", "imported", "root"):
            out[r["pred"]] = r["obj"] == "true"
    out["synonyms"].sort()
    out["parents"].sort()
    return out


def parents_of(triples: DataFrame, code: str) -> DataFrame:
    return _isa_edges(triples).filter(F.col("child") == code).select(
        F.col("parent").alias("code")
    )


def children_of(triples: DataFrame, code: str) -> DataFrame:
    return _isa_edges(triples).filter(F.col("parent") == code).select(
        F.col("child").alias("code")
    )


def ancestors(triples: DataFrame, max_depth: int = 64) -> DataFrame:
    """(code, ancestor) for every concept — full transitive closure of the
    emitted is-a graph (the inverse of what the build reduced; useful for
    subsumption filtering and ECL '<<' semantics)."""
    return transitive_closure(
        _isa_edges(triples), max_depth, child_col="child", parent_col="parent"
    ).select(F.col("child").alias("code"), F.col("parent").alias("ancestor"))


def descendants_of(triples: DataFrame, code: str, max_depth: int = 64) -> DataFrame:
    """Seeded-frontier BFS downward from `code` — cost scales with the
    descendant set of one node, not the all-pairs closure (the full-closure
    shape is the wrong plan for one probe on a SNOMED-scale graph)."""
    return reachable_set(
        _isa_edges(triples), [code], child_col="child", parent_col="parent",
        direction="down", max_iterations=max_depth,
    ).select(F.col("node").alias("code"))


def subsumes(triples: DataFrame, ancestor_code: str, code: str) -> bool:
    """$subsumes analog: is `code` a (transitive) descendant of
    `ancestor_code`? Seeded-frontier BFS upward from `code` — touches only
    the ancestor set of one node."""
    anc = reachable_set(
        _isa_edges(triples), [code], child_col="child", parent_col="parent",
        direction="up", stop_at=ancestor_code,
    )
    return not anc.filter(F.col("node") == ancestor_code).isEmpty()


def closure_delta(triples: DataFrame, new_codes: list, max_depth: int = 64) -> DataFrame:
    """FHIR ``$closure`` analog: the subsumption pairs INVOLVING newly
    registered codes — what a terminology server returns as the ConceptMap
    delta when codes are added to a maintained closure table.

    (code, ancestor) rows where code ∈ new_codes (their ancestor sets,
    seeded BFS up) or ancestor ∈ new_codes (their descendant sets, seeded
    BFS down), both via `reachable_pairs` with per-seed attribution — cost
    scales with the reached sets of the delta, never the all-pairs
    closure (the wrong plan for a small registration batch on a
    SNOMED-scale graph)."""
    edges = _isa_edges(triples)
    up = reachable_pairs(
        edges, new_codes, direction="up", max_iterations=max_depth
    ).select(F.col("seed").alias("code"), F.col("node").alias("ancestor"))
    down = reachable_pairs(
        edges, new_codes, direction="down", max_iterations=max_depth
    ).select(F.col("node").alias("code"), F.col("seed").alias("ancestor"))
    # a pair of two new codes is found by both directions — dedup
    return up.union(down).distinct()


def conversations_mentioning(
    triples: DataFrame, code: str, include_descendants: bool = False
) -> DataFrame:
    """The graft query: conversations where a concept (optionally any of
    its descendants) is mentioned."""
    mentions = triples.filter(F.col("pred") == "mentions-in")
    if include_descendants:
        codes = descendants_of(triples, code).union(
            triples.sparkSession.createDataFrame([(code,)], ["code"])
        )
        return (
            mentions.join(codes, mentions.subj == codes.code)
            .select(F.col("obj").alias("conv_id"))
            .distinct()
        )
    return mentions.filter(F.col("subj") == code).select(
        F.col("obj").alias("conv_id")
    ).distinct()

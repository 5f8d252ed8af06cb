"""FHIR-R4-CodeSystem-shaped JSON export (S5 parity artifact, SURVEY.md
§2.1): the reference's final output is a CodeSystem JSON document
(FhirOwlService.java:135-140 via HAPI); this export rebuilds that shape
from the engine's dictionary + hierarchy so a reference user can diff the
two converters concept-by-concept.

Driver-side by design: the concept list is ontology-scale (broadcast
class), never transcript-scale. The designation `use` coding mirrors the
reference's fixed SNOMED 'Synonym' coding (addSynonyms,
FhirOwlService.java:905-913); the property list mirrors processEntity
(imported, root, deprecated, parent*).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..operators.dictionary import (
    build_concept_dictionary,
    derive_has_imports,
    parent_code_col,
)
from ..operators.hierarchy import build_hierarchy
from ..schemas import OWL_NOTHING

SYNONYM_USE = {
    "system": "http://snomed.info/sct",
    "code": "900000000000013009",
    "display": "Synonym (core metadata concept)",
}


def export_codesystem(
    spark,
    concepts: DataFrame,
    edges: DataFrame,
    synonyms: DataFrame,
    cfg: PipelineConfig | None = None,
    metadata: dict | None = None,
) -> dict:
    """→ CodeSystem-shaped dict (resourceType/url/version/…/count/concept[])."""
    cfg = cfg or PipelineConfig()
    dictionary = build_concept_dictionary(concepts, synonyms, cfg).localCheckpoint(
        eager=True
    )
    direct = build_hierarchy(concepts, edges, cfg)

    has_imports = derive_has_imports(concepts, cfg)
    parent_meta = concepts.select(
        F.col("iri").alias("parent_iri"),
        parent_code_col(cfg, has_imports, "iri").alias("parent_code"),
        F.coalesce("deprecated", F.lit(False)).alias("parent_deprecated"),
    )
    isa = (
        dictionary.filter(~F.col("root"))
        .select(F.col("iri").alias("child_iri"))
        .join(direct, "child_iri")
        .filter(F.col("parent_iri") != OWL_NOTHING)
        .join(F.broadcast(parent_meta), "parent_iri", "left")
    )
    if not cfg.include_deprecated:
        isa = isa.filter(~F.coalesce("parent_deprecated", F.lit(False)))
    parents_of: dict[str, list[str]] = {}
    for r in isa.select(
        "child_iri", F.coalesce("parent_code", F.col("parent_iri")).alias("pc")
    ).collect():
        parents_of.setdefault(r["child_iri"], []).append(r["pc"])

    concept_list = []
    for r in sorted(dictionary.collect(), key=lambda x: x["code"]):
        cdc: dict = {"code": r["code"], "display": r["display"]}
        if r["synonyms"]:
            cdc["designation"] = [
                {"use": SYNONYM_USE, "value": s} for s in sorted(r["synonyms"])
            ]
        props = []
        for pc in sorted(parents_of.get(r["iri"], [])):
            props.append({"code": "parent", "valueCode": pc})
        props.append({"code": "imported", "valueBoolean": bool(r["imported"])})
        props.append({"code": "root", "valueBoolean": bool(r["root"])})
        props.append({"code": "deprecated", "valueBoolean": bool(r["deprecated"])})
        cdc["property"] = props
        concept_list.append(cdc)

    cs: dict = {
        "resourceType": "CodeSystem",
        "status": cfg.status,
        "content": cfg.content,
        "hierarchyMeaning": cfg.hierarchy_meaning,
        # A3 concept count (cs.setCount, FhirOwlService.java:587-588)
        "count": len(concept_list),
        "property": [
            {"code": "parent", "type": "code", "description": "Parent codes."},
            {"code": "imported", "type": "boolean",
             "description": "Indicates if the concept is imported from another code system."},
            {"code": "root", "type": "boolean",
             "description": "Indicates if this concept is a root concept (i.e. Thing is "
                            "equivalent or a direct parent)"},
            {"code": "deprecated", "type": "boolean",
             "description": "Indicates if this concept is deprecated."},
        ],
        "concept": concept_list,
    }
    for k in ("url", "version", "valueset", "name", "title", "publisher"):
        if metadata and metadata.get(k) is not None:
            key = "valueSet" if k == "valueset" else k
            cs[key] = metadata[k]
    return cs


def write_codesystem_json(cs: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(cs, f, indent=2, sort_keys=False)

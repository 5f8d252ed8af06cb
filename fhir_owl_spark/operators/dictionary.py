"""Concept canonicalization — the broadcast ontology dictionary.

Re-expresses the reference's per-concept projection (processEntity,
/root/reference/src/main/java/au/csiro/fhir/owl/FhirOwlService.java:803-903)
as pure Column expressions + two tiny groupBy joins. Everything here is
Catalyst-optimizable; no UDFs.

Scale note: the ontology side is the SMALL side by design (HPO ≈ 18k
concepts, reference README.md:98-104; even giant ontologies are ≤10^7
rows). Every join of this output against transcript-scale data must be a
broadcast hash join — callers go through ``broadcast_dictionary``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..schemas import (
    OWL_NOTHING,
    SPECIAL_DISPLAYS,
    TOP_ENTITIES,
)

# OWL API IRI.getShortForm: fragment after '#', else last '/' segment
SHORTFORM_REGEX = r"([^/#]+)$"


def shortform(col):
    return F.regexp_extract(col, SHORTFORM_REGEX, 1)


def derive_has_imports(concepts: DataFrame, cfg: PipelineConfig) -> bool:
    """hasImports (FhirOwlService.java:505): with no imports, nothing is
    imported regardless of set membership. One tiny action on the small
    ontology table."""
    if cfg.has_imports is not None:
        return cfg.has_imports
    row = concepts.agg(F.max(F.coalesce("imported", F.lit(False))).alias("h")).first()
    return bool(row["h"]) if row and row["h"] is not None else False


def imported_col(cfg: PipelineConfig, has_imports: bool, iri_col="iri"):
    """isImported (FhirOwlService.java:784-801): prefix mode when main
    namespaces are configured, else set-difference membership (the
    ``imported`` column), always false when the ontology has no imports."""
    if cfg.main_namespaces:
        cond = F.lit(False)
        for ns in cfg.main_namespaces:
            cond = cond | F.col(iri_col).startswith(ns)
        return ~cond
    if not has_imports:
        return F.lit(False)
    return F.coalesce(F.col("imported"), F.lit(False))


def local_code_col(code_col, cfg: PipelineConfig):
    """codeReplace on LOCAL codes only — literal, non-regex replace
    (FhirOwlService.java:844-846; F.replace keeps literal semantics)."""
    if cfg.code_replace:
        old, new = cfg.code_replace
        return F.replace(code_col, F.lit(old), F.lit(new))
    return code_col


def special_display_col(code_col):
    """Hardcoded top-entity displays keyed on the CODE — they only fire
    when the code is the full IRI, i.e. for imported top entities
    (FhirOwlService.java:852-858)."""
    expr = F.lit(None).cast("string")
    for full_iri, disp in SPECIAL_DISPLAYS.items():
        expr = F.when(code_col == full_iri, disp).otherwise(expr)
    return expr


def build_concept_dictionary(
    concepts: DataFrame, synonyms: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """ontology_concepts + ontology_synonyms → CONCEPT_DICTIONARY rows
    (one per EMITTED concept).

    Stages (all on the small side; one shuffle on iri for the groupBys):
      F1/F2  drop unsatisfiable + owl:Nothing
      F3     drop deprecated unless include_deprecated
      F5     imported flag
      F7     code := code-annotation | (imported ? IRI : shortform), then
             codeReplace on local codes only
      A1     preferred term = lexicographic min of display-prop literals
             minus excluded labels (TreeSet.first, FhirOwlService.java:706-724)
      A2     synonyms = union over synonym props minus exclusions minus
             the display (FhirOwlService.java:726-742); empty-preferred
             promotion uses deterministic min (see fixtures docstring)
      F8/A4  display fallback: label column (closure display map analog)
             → special top-entity display → code
    """
    has_imports = derive_has_imports(concepts, cfg)
    excluded = list(cfg.labels_to_exclude)

    base = concepts.filter(
        (F.col("iri") != OWL_NOTHING) & ~F.coalesce("unsatisfiable", F.lit(False))
    )
    if not cfg.include_deprecated:
        base = base.filter(~F.coalesce("deprecated", F.lit(False)))

    syn = synonyms.filter(F.col("synonym").isNotNull())
    if excluded:
        not_excluded = ~F.col("synonym").isin(excluded)
    else:
        not_excluded = F.lit(True)

    # A1 + A2 + F7 in ONE conditional-aggregation pass — one shuffle on iri
    # and one join instead of three of each (aggregates skip the rows their
    # WHEN masks to null; collect_set drops nulls, preserving the old
    # per-predicate-filtered semantics exactly):
    #   A1 preferred = min display-prop literal (TreeSet.first,
    #      FhirOwlService.java:706-724)
    #   A2 syn_set/min_syn over the synonym props (:726-742)
    #   F7 code annotation = deterministic min over candidates (the
    #      reference takes the first it sees, :695-704)
    is_display = (F.col("prop") == cfg.display_prop) & not_excluded
    is_syn = F.col("prop").isin(list(cfg.synonym_props)) & not_excluded
    aggs = [
        F.min(F.when(is_display, F.col("synonym"))).alias("preferred"),
        F.collect_set(F.when(is_syn, F.col("synonym"))).alias("syn_set"),
        F.min(F.when(is_syn, F.col("synonym"))).alias("min_syn"),
    ]
    if cfg.code_prop:
        aggs.append(
            F.min(F.when(F.col("prop") == cfg.code_prop, F.col("synonym"))).alias(
                "code_anno"
            )
        )
    per_iri = syn.groupBy("iri").agg(*aggs)

    df = base.join(per_iri, "iri", "left")
    if not cfg.code_prop:
        df = df.withColumn("code_anno", F.lit(None).cast("string"))

    imported = imported_col(cfg, has_imports).alias("imported_flag")
    df = df.withColumn("imported_flag", imported)

    iri_code = F.when(F.col("imported_flag"), F.col("iri")).otherwise(shortform(F.col("iri")))
    raw_code = F.coalesce(F.col("code_anno"), iri_code)
    code = F.when(
        F.col("imported_flag"), raw_code
    ).otherwise(local_code_col(raw_code, cfg))
    df = df.withColumn("code", code)

    syn_set = F.coalesce(F.col("syn_set"), F.array().cast("array<string>"))
    has_syns = F.size(syn_set) > 0
    display = (
        F.when(F.col("preferred").isNotNull(), F.col("preferred"))
        .when(has_syns, F.col("min_syn"))
        .otherwise(
            F.coalesce(
                F.col("label"),
                special_display_col(F.col("code")),
                F.col("code"),
            )
        )
    )
    df = df.withColumn("display", display)
    # synonyms minus the chosen display (covers both the normal removal and
    # the promoted-synonym removal)
    df = df.withColumn(
        "synonyms", F.array_sort(F.array_except(syn_set, F.array(F.col("display"))))
    )
    df = df.withColumn("root", F.col("iri").isin(list(TOP_ENTITIES)))

    return df.select(
        "iri",
        "code",
        "display",
        "synonyms",
        F.coalesce("deprecated", F.lit(False)).alias("deprecated"),
        F.col("imported_flag").alias("imported"),
        "root",
    )


def parent_code_col(cfg: PipelineConfig, has_imports: bool, iri_col="iri"):
    """Parent-code asymmetry: parents NEVER use the code annotation —
    imported ⇒ full IRI, local ⇒ shortform + codeReplace
    (addHierarchyFields, FhirOwlService.java:633-647 vs processEntity :834-841).
    """
    imported = imported_col(cfg, has_imports, iri_col)
    return F.when(imported, F.col(iri_col)).otherwise(
        local_code_col(shortform(F.col(iri_col)), cfg)
    )


def broadcast_dictionary(dictionary: DataFrame) -> DataFrame:
    """Mark the dictionary for broadcast in subsequent joins."""
    return F.broadcast(dictionary)


def concept_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "code",
    compare_cols: "tuple[str, ...]" = ("display",),
) -> DataFrame:
    """Release-over-release concept diff — the KG-maintenance pass for
    versioned ontologies (HPO/GO ship monthly releases; the reference's
    CodeSystem carries a version and real deployments must know which
    concepts were added, retired, or relabeled before re-emitting
    triples; cf. FhirOwlService version handling).

    Full outer join on ``id_col``; emits one row per concept present in
    either version with change ∈ {'added', 'removed', 'changed'}
    (unchanged concepts are dropped) and ``changed_fields`` — a
    comma-joined sorted list of the ``compare_cols`` that differ
    (null-safe comparison). Old/new values ride along per compare
    column as ``old_<col>`` / ``new_<col>`` scalars.

    Shape: ONE full-outer hash join on the concept id (both sides are
    dictionary-scale, tiny next to transcripts); pure Column logic.
    """
    o = old.select(
        F.col(id_col).alias("_id"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    ).withColumn("_in_old", F.lit(True))
    n = new.select(
        F.col(id_col).alias("_id"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    ).withColumn("_in_new", F.lit(True))
    joined = o.join(n, "_id", "full_outer")

    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            F.col("_id").alias(id_col),
            "change",
            F.when(F.col("change") == "changed", F.concat_ws(",", diffs))
            .otherwise(F.lit(""))
            .alias("changed_fields"),
            *[c for p in compare_cols for c in (f"old_{p}", f"new_{p}")],
        )
    )

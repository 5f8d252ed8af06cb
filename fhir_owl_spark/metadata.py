"""CodeSystem-metadata argument parsers with eager validation — the
CodeSystemProperties surface (CodeSystemProperties.java:83-229,
Application.java:122-304).

Each parser mirrors the reference's setter exactly: same separators
(`,` between entries, `|` within), same arity checks, same enum
vocabularies, same error-on-invalid behavior (the reference throws
InvalidPropertyException from the setter, i.e. at argument-parse time,
before any OWL processing starts — these are driver-side validators, not
Column code).
"""

from __future__ import annotations

import re

# reference constants (OwlProperties.java:29-35)
RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"
DC_SUBJECT = "http://purl.org/dc/elements/1.1/subject"
DC_PUBLISHER = "http://purl.org/dc/elements/1.1/publisher"

DEFAULT_PUBLISHER_PROPS = (DC_PUBLISHER,)
DEFAULT_DESCRIPTION_PROPS = (DC_SUBJECT, RDFS_COMMENT)

# enum vocabularies (CodeSystemProperties.java:62-72)
STATUS_VALUES = frozenset({"draft", "active", "retired", "unknown"})
CONTENT_VALUES = frozenset(
    {"not-present", "example", "fragment", "complete", "supplement"}
)
CONTACT_SYSTEM_VALUES = frozenset(
    {"phone", "fax", "email", "pager", "url", "sms", "other"}
)
# CodeSystemHierarchyMeaning.fromCode vocabulary (FhirOwlService.java:461-463)
HIERARCHY_MEANING_VALUES = frozenset(
    {"grouped-by", "is-a", "part-of", "classified-with"}
)


class InvalidPropertyError(ValueError):
    """Analog of the reference's InvalidPropertyException."""


def parse_identifiers(idents: str | None) -> tuple[dict, ...]:
    """`[system]|[value],...` → Identifier dicts
    (CodeSystemProperties.setIdentifiers:89-113): system optional, value
    required non-empty, exactly one `|` per entry."""
    if idents is None:
        return ()
    out = []
    for part in idents.split(","):
        inner = part.split("|")
        if len(inner) != 2:
            raise InvalidPropertyError(
                f"Invalid identifier argument: {part}. "
                "Valid format is [system]|[value]."
            )
        ident: dict = {}
        if inner[0]:
            ident["system"] = inner[0]
        if not inner[1]:
            raise InvalidPropertyError(
                f"Invalid identifier argument: {part}. Valid format is "
                "[system]|[value] and value cannot be empty."
            )
        ident["value"] = inner[1]
        out.append(ident)
    return tuple(out)


def parse_contacts(cts: str) -> tuple[dict, ...]:
    """`name|system|value,...` → ContactDetail dicts with one telecom each
    (CodeSystemProperties.setContacts:190-212); system is validated against
    the ContactPointSystem vocabulary eagerly."""
    out = []
    for ct in cts.split(","):
        parts = ct.split("|")
        if len(parts) != 3:
            raise InvalidPropertyError(
                f"Invalid contact '{ct}'. Valid format is [name|system|value]."
            )
        if parts[1] not in CONTACT_SYSTEM_VALUES:
            raise InvalidPropertyError(
                f"Invalid system contact '{parts[1]}'. Valid values are: "
                f"{sorted(CONTACT_SYSTEM_VALUES)}"
            )
        out.append(
            {
                "name": parts[0],
                "telecom": [{"system": parts[1], "value": parts[2]}],
            }
        )
    return tuple(out)


def parse_jurisdictions(jds: str) -> tuple[dict, ...]:
    """`system|code|display,...` → CodeableConcept dicts with one Coding
    (CodeSystemProperties.setJurisdiction:219-232; the test spec
    MetadataFromInputTest.java:70-76 fixes parts[0]=system)."""
    out = []
    for jd in jds.split(","):
        parts = jd.split("|")
        if len(parts) != 3:
            raise InvalidPropertyError(
                f"Invalid jurisdiction '{jd}'. Valid format is "
                "[system|code|display] from "
                "https://hl7.org/fhir/valueset-jurisdiction.html."
            )
        out.append(
            {"coding": [{"system": parts[0], "code": parts[1], "display": parts[2]}]}
        )
    return tuple(out)


def validate_date(dt: str | None) -> str | None:
    """Validate the `-date` argument (CodeSystemProperties.setDate:131-182).

    The reference tries yyyy → yyyy-MM → yyyy-MM-dd → ISO-datetime formats
    with java.text.SimpleDateFormat, whose parse() accepts any string whose
    PREFIX matches (trailing text is ignored) — so in practice the first
    format accepts anything starting with digits, and only strings that
    do not start with a digit are rejected. We mirror that exact leniency.

    NOTE (reference-parity quirk): the parsed value is never stored —
    `date` is `private final Calendar date = null`
    (CodeSystemProperties.java:43) and setDate parses into a local and
    returns (:137-140), so CodeSystem.date is NEVER emitted by the
    reference (FhirOwlService.java:399-402 guards on the always-null
    getter). This validator therefore gates the argument but the export
    deliberately emits no `date` element.
    """
    if dt is None or dt == "":
        return None
    if not re.match(r"\d", dt):
        raise InvalidPropertyError(
            f"Invalid date value '{dt}'. Valid formats are: YYYY, YYYY-MM, "
            "YYYY-MM-DD and YYYY-MM-DDThh:mm:ss+zz:zz."
        )
    return dt


def validate_status(status: str) -> str:
    if status not in STATUS_VALUES:
        raise InvalidPropertyError(
            f"Invalid status value '{status}'. Valid values are: "
            f"{sorted(STATUS_VALUES)}"
        )
    return status


def validate_content(content: str) -> str:
    if content not in CONTENT_VALUES:
        raise InvalidPropertyError(
            f"Invalid content value '{content}'. Valid values are: "
            f"{sorted(CONTENT_VALUES)}"
        )
    return content


def validate_hierarchy_meaning(hm: str) -> str:
    if hm not in HIERARCHY_MEANING_VALUES:
        raise InvalidPropertyError(
            f"Invalid hierarchyMeaning value '{hm}'. Valid values are: "
            f"{sorted(HIERARCHY_MEANING_VALUES)}"
        )
    return hm


def parse_prop_list(props: str) -> tuple[str, ...]:
    """Comma-separated annotation-property IRI list
    (setPublisherProps/setDescriptionProps, CodeSystemProperties.java:645-671)."""
    return tuple(p for p in props.split(",") if p)


def first_annotation_value(
    annotations: list[tuple[str, str]] | tuple, props: tuple[str, ...]
) -> str | None:
    """First ontology-level literal annotation whose property is in `props`
    (getOntologyAnnotationValue, FhirOwlService.java:681-692 — iterates the
    ontology's annotations and returns the first membership hit; we fix
    document order as the deterministic iteration order)."""
    wanted = set(props)
    for prop, value in annotations:
        if prop in wanted:
            return value
    return None


def derive_vs_url(url: str | None) -> str | None:
    """valueSet default: url + '?vs' (or '&vs' when the url already has a
    query string) — createVsUrl (FhirOwlService.java:593-599)."""
    if url is None:
        return None
    return url + ("&vs" if "?" in url else "?vs")


def metadata_from_config(cfg) -> dict:
    """cfg-only metadata resolution — the shared base for BOTH export
    paths: tabular input uses it directly (no ontology document to read
    fallback annotations from); sources.owl_xml.ontology_metadata starts
    from it and layers the ontology-annotation fallback chains on top.
    One definition, so the precedence rules and the vs-URL derivation
    cannot desync between the two paths."""
    return dict(
        id=cfg.cs_id,
        language=cfg.language,
        url=cfg.url,
        identifiers=list(cfg.identifiers),
        version=cfg.version or "NA",
        name=cfg.name,
        title=cfg.title,
        status=cfg.status,
        experimental=cfg.experimental,
        publisher=cfg.publisher,
        contacts=list(cfg.contacts),
        description=cfg.description,
        purpose=cfg.purpose,
        jurisdictions=list(cfg.jurisdictions),
        copyright=cfg.copyright,
        valueset=cfg.valueset or derive_vs_url(cfg.url),
        hierarchy_meaning=cfg.hierarchy_meaning,
        compositional=cfg.compositional,
        version_needed=cfg.version_needed,
        content=cfg.content,
    )

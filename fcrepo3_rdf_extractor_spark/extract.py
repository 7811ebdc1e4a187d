"""Per-object triple extraction — the pure function at the heart of the
engine. No Spark imports: this module is exercised directly by unit tests
and wrapped by the vectorized ``mapInPandas`` operator in
``operators/extractor.py``.

Reproduces `ObjectProcessor.accept` (`ObjectProcessor.java:142-177`) and
its helpers:

- 6 constant object triples (`ObjectProcessor.java:235-246`)
- 6 constant datastream triples per non-AUDIT datastream, using the
  NEWEST version's CREATED/MIMETYPE (`ObjectProcessor.java:256-270`;
  AUDIT anti-filter at `:258`)
- Dublin Core extraction from the DC datastream (`:163-166`)
- RDF/XML extraction from RELS-INT (if present) and RELS-EXT (always
  attempted) (`:167-169`)
- E1 error isolation: an object-level failure aborts that object only;
  a datastream-level failure is counted and extraction continues
  (`:172-176`, `:190-198`). Objects *without* a DC or RELS-EXT
  datastream still count one error each (the reference null-guards only
  RELS-INT) while keeping the constant triples already emitted.

EXTERNAL/REDIRECT (E/R) datastreams: the reference fetches their content
over HTTP at extract time (`ObjectProcessor.java:217-222`). Side-effecting
network IO has no place in a deterministic 10^12-row batch job, so this
engine resolves E/R content through the SAME pre-fetched lookup table as
MANAGED blobs, keyed by the verbatim content-location URL (a separate
crawl job materializes (url, content) upstream — the batch-at-scale shape
of the reference's inline fetch). An E/R datastream whose URL is absent
from the table yields an error row, exactly like a missing managed blob.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from . import dc as dc_mod
from . import rdfxml
from .foxml import FoxmlError, parse_foxml
from .terms import (
    Triple,
    datastream_uri,
    dissemination_type,
    get_blob_id,
    iso_reformat,
    object_uri,
)
from .vocab import (
    CREATEDDATE,
    DISSEMINATES,
    DISSEMINATION_TYPE,
    FEDORA_OBJECT,
    HAS_MODEL,
    IS_VOLATILE,
    LABEL,
    LASTMODIFIEDDATE,
    MIME_TYPE,
    OWNER,
    STATE,
    STATE_URI,
    VOLATILITY,
    XSD_DATETIME,
)

#: content fetcher for MANAGED (key = blob_id) and EXTERNAL/REDIRECT
#: (key = verbatim URL) datastreams: key -> content or None
DsLookup = Callable[[str], "str | None"]


@dataclass(frozen=True)
class ExtractError:
    stage: str      # object | dc | rels_int | rels_ext | datastream
    ds_id: str | None
    message: str


def _decode_state(value: str | None) -> str:
    uri = STATE_URI.get(value or "")
    if uri is None:
        raise ValueError(f"Impossible object state: {value!r}")
    return uri


def constant_object_triples(obj: dict, obj_uri: str) -> list[Triple]:
    """`ObjectProcessor.java:235-246`. null label/ownerId coerce to ""
    (guava nullToEmpty); missing dates or an unknown state abort the
    whole object (the reference NPEs out of accept())."""
    created = obj.get("created_date")
    modified = obj.get("last_modified_date")
    if created is None or modified is None:
        raise ValueError("object missing createdDate/lastModifiedDate property")
    return [
        Triple(obj_uri, LABEL, obj.get("label") or "", True),
        Triple(obj_uri, OWNER, obj.get("owner_id") or "", True),
        Triple(obj_uri, STATE, _decode_state(obj.get("state")), False),
        Triple(obj_uri, CREATEDDATE, iso_reformat(created), True, XSD_DATETIME),
        Triple(obj_uri, LASTMODIFIEDDATE, iso_reformat(modified), True, XSD_DATETIME),
        Triple(obj_uri, HAS_MODEL, FEDORA_OBJECT, False),
    ]


def constant_datastream_triples(obj_uri: str, ds: dict) -> list[Triple]:
    """`ObjectProcessor.java:256-270`; AUDIT yields nothing (`:258`)."""
    ds_id = ds["id"]
    if ds_id == "AUDIT":
        return []
    if not ds["versions"]:
        raise ValueError(f"datastream {ds_id} has no versions")
    ds_uri = datastream_uri(obj_uri, ds_id)
    latest = ds["versions"][0]  # newest CREATED first (foxml.py sort)
    mimetype = latest.get("mimetype")
    created = latest.get("created")
    if mimetype is None or created is None:
        raise ValueError(f"datastream {ds_id} version missing MIMETYPE/CREATED")
    volatility = VOLATILITY.get(ds.get("control_group") or "")
    if volatility is None:
        raise ValueError(
            f"Unknown datastream control group value: {ds.get('control_group')!r}"
        )
    return [
        Triple(ds_uri, MIME_TYPE, mimetype, True),
        Triple(ds_uri, STATE, _decode_state(ds.get("state")), False),
        Triple(ds_uri, LASTMODIFIEDDATE, iso_reformat(created), True, XSD_DATETIME),
        Triple(ds_uri, IS_VOLATILE, volatility, True),
        Triple(obj_uri, DISSEMINATES, ds_uri, False),
        Triple(ds_uri, DISSEMINATION_TYPE, dissemination_type(ds_id), False),
    ]


def _datastream_content(ds: dict, ds_lookup: DsLookup | None) -> str:
    """`ObjectProcessor.getDatastreamContent` (`:209-226`): dispatch on
    control group; the newest version is the current one."""
    latest = ds["versions"][0] if ds["versions"] else None
    if latest is None:
        raise ValueError(f"datastream {ds['id']} has no versions")
    group = ds.get("control_group")
    if group == "X":
        inline = latest.get("inline_xml")
        if inline is None:
            raise ValueError(f"datastream {ds['id']} has no inline XML content")
        return inline
    if group == "M":
        loc = latest.get("content_location")
        if loc is None:
            raise ValueError(f"managed datastream {ds['id']} has no contentLocation")
        blob_id = get_blob_id(loc)
        content = ds_lookup(blob_id) if ds_lookup is not None else None
        if content is None:
            raise KeyError(f"missing managed blob: {blob_id}")
        return content
    if group in ("E", "R"):
        # `ObjectProcessor.java:217-222` fetches the URL inline; here the
        # content comes from the pre-fetched table, keyed by the verbatim
        # URL (no blob-id minting — external locations are not Akubra ids)
        loc = latest.get("content_location")
        if loc is None:
            raise ValueError(
                f"external datastream {ds['id']} has no contentLocation"
            )
        content = ds_lookup(loc) if ds_lookup is not None else None
        if content is None:
            raise KeyError(f"missing external content: {loc}")
        return content
    raise ValueError(f"Unknown datastream control group value: {group!r}")


def extract_object(
    content: str,
    ds_lookup: DsLookup | None = None,
) -> tuple[list[Triple], list[ExtractError]]:
    """Extract all triples from one FOXML document.

    Returns (triples, errors). Never raises: failures become error
    records, mirroring the reference's count-and-continue contract.
    """
    triples: list[Triple] = []
    errors: list[ExtractError] = []

    if content is None:
        # NULL content rows must become error rows, not task failures —
        # one bad row at 10^12 scale must never kill the job (E1)
        return [], [ExtractError("object", None, "missing content")]

    try:
        obj = parse_foxml(content)
        obj_uri = object_uri(obj["pid"])
        triples.extend(constant_object_triples(obj, obj_uri))
        for ds in obj["datastreams"]:
            triples.extend(constant_datastream_triples(obj_uri, ds))
    except (FoxmlError, ValueError, TypeError) as e:
        # object-level abort: reference rethrows out of the triple loops,
        # losing the not-yet-sunk triples of THIS object only
        return [], [ExtractError("object", None, str(e))]

    by_id = {ds["id"]: ds for ds in obj["datastreams"]}

    def consume(stage: str, ds: dict | None, parse: Callable[[str], list[Triple]]) -> None:
        """`ObjectProcessor.consume` (`:190-198`): any failure is counted
        and extraction continues. ds=None reproduces the reference's
        unconditional DC/RELS-EXT consumption (NPE -> error)."""
        try:
            if ds is None:
                raise KeyError("datastream not present")
            triples.extend(parse(_datastream_content(ds, ds_lookup)))
        except Exception as e:  # noqa: BLE001 — E1: isolate everything
            ds_id = ds["id"] if ds is not None else "[NO DS ID]"
            errors.append(ExtractError(stage, ds_id, str(e)))

    consume("dc", by_id.get("DC"), lambda xml: dc_mod.parse_dc(xml, obj_uri))
    if "RELS-INT" in by_id:  # only RELS-INT is null-guarded (:167-168)
        consume(
            "rels_int",
            by_id["RELS-INT"],
            lambda xml: rdfxml.parse_rdfxml(xml, scope=f"{obj['pid']}|RELS-INT"),
        )
    consume(
        "rels_ext",
        by_id.get("RELS-EXT"),
        lambda xml: rdfxml.parse_rdfxml(xml, scope=f"{obj['pid']}|RELS-EXT"),
    )
    return triples, errors

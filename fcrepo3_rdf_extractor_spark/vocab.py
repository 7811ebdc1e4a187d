"""Fedora Resource-Index RDF vocabulary.

Mirrors the closed vocabulary of the reference
(`/root/reference/src/main/java/edu/si/fcrepo/RdfVocabulary.java:45-107`):
namespaces, fixed predicate/constant URIs, and the two decode tables
(object/datastream *state* -> URI, datastream *control group* ->
volatility literal).

Everything here is a plain Python constant so it can be used both inside
vectorized pandas UDFs and in driver-side column expressions.
"""

from __future__ import annotations

FEDORA_URI = "info:fedora/"

SYSTEM_NS = "info:fedora/fedora-system:"
MODEL_NS = SYSTEM_NS + "def/model#"
VIEW_NS = SYSTEM_NS + "def/view#"

CREATEDDATE = MODEL_NS + "createdDate"
LASTMODIFIEDDATE = VIEW_NS + "lastModifiedDate"
LABEL = MODEL_NS + "label"
OWNER = MODEL_NS + "ownerId"
STATE = MODEL_NS + "state"

ACTIVE = MODEL_NS + "Active"
INACTIVE = MODEL_NS + "Inactive"
DELETED = MODEL_NS + "Deleted"

MIME_TYPE = VIEW_NS + "mimeType"
IS_VOLATILE = VIEW_NS + "isVolatile"
DISSEMINATES = VIEW_NS + "disseminates"
DISSEMINATION_TYPE = VIEW_NS + "disseminationType"
HAS_MODEL = MODEL_NS + "hasModel"
FEDORA_OBJECT = SYSTEM_NS + "FedoraObject-3.0"

DC_NAMESPACE = "http://purl.org/dc/elements/1.1/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_DATETIME = "http://www.w3.org/2001/XMLSchema#dateTime"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_XML_LITERAL = RDF_NS + "XMLLiteral"

FOXML_NS = "info:fedora/fedora-system:def/foxml#"

#: object / datastream state decode (RdfVocabulary.java:83-94). FOXML
#: carries either the short code ("A") or the full name ("Active") —
#: both forms appear in the reference fixtures.
STATE_URI = {
    "A": ACTIVE,
    "Active": ACTIVE,
    "I": INACTIVE,
    "Inactive": INACTIVE,
    "D": DELETED,
    "Deleted": DELETED,
}

#: control group -> isVolatile literal (RdfVocabulary.java:96-107):
#: inline XML / managed content is stable, external / redirect content
#: can change out from under the repository.
VOLATILITY = {
    "X": "false",  # INLINE_XML
    "M": "false",  # MANAGED
    "E": "true",   # EXTERNAL
    "R": "true",   # REDIRECT
}

#: default named graph (Extract.java:100)
DEFAULT_GRAPH = "#ri"

"""RDF term model: serialization, dates, PID/blob-id minting, skolemization.

Pure Python, no Spark imports — usable inside pandas UDFs and in tests.

Reference parity targets:
- N-Triples term serialization + escaping — the reference streams through
  Jena's ``WriterStreamRDFPlain`` (`TripleDump.java:51-66`).
- ISO-8601 instant formatting with the ``.000``-drop behaviour of
  ``DateTimeFormatter.ISO_INSTANT`` (`ObjectProcessor.java:272-274`;
  evidence `simple.nt:3` keeps ``.506`` but `simple.nt:24` drops ``.000``).
- Blob-id / PID minting incl. ``+``-token split and UTF-8 percent-encoding
  (`ObjectProcessor.java:293-341`).
"""

from __future__ import annotations

import hashlib
import re
import urllib.parse
from functools import lru_cache
from datetime import datetime, timezone
from typing import NamedTuple

from .vocab import FEDORA_URI, XSD_STRING


class Triple(NamedTuple):
    """One emitted statement. ``obj_datatype`` is None for plain literals
    and URIs; ``obj_lang`` is None unless the literal carries a language
    tag (never in the reference fixtures, but legal RDF).

    NamedTuple rather than a frozen dataclass: the extraction UDF
    constructs tens of millions of these per task, and frozen-dataclass
    ``__init__`` (object.__setattr__ per field) measured ~12% of
    extract_object; tuple construction is ~3x cheaper with the same
    immutability and attribute access."""

    subj: str
    pred: str
    obj_value: str
    obj_is_literal: bool
    obj_datatype: str | None = None
    obj_lang: str | None = None

    def key(self) -> tuple:
        return tuple(self)


# --- N-Triples escaping ------------------------------------------------

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def escape_literal(value: str) -> str:
    """N-Triples string escaping (ECHAR set) plus \\uXXXX for other
    C0 control characters, matching Jena's plain writer closely enough
    for set-equality on parsed terms."""
    out = []
    for ch in value:
        esc = _ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ord(ch) < 0x20:
            out.append("\\u%04X" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


# N-Triples IRIREF legality: `IRIREF ::= '<' ([^#x00-#x20<>"{}|^`\] | UCHAR)* '>'`.
# Jena's writer guarantees emitted terms parse back because its IRI layer
# rejects/normalizes illegal characters (`TripleDump.java:51-66` via
# WriterStreamRDFPlain); we enforce the same contract at serialization by
# \uXXXX-escaping (UCHAR) every IRIREF-illegal character. All of them are
# BMP, so 4-digit escapes always suffice.
_URI_ESCAPE_RE = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def escape_uri(value: str) -> str:
    """Escape IRIREF-illegal characters (controls, space, ``<>"{}|^`\\``)
    as ``\\uXXXX`` so every emitted ``<...>`` term is a parseable
    N-Triples IRIREF. Legal URIs pass through byte-identical."""
    return _URI_ESCAPE_RE.sub(lambda m: "\\u%04X" % ord(m.group()), value)


_UCHAR_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")


def unescape_uri(value: str) -> str:
    """Inverse of :func:`escape_uri`: resolve UCHAR escapes (the only
    escapes legal inside IRIREF)."""
    return _UCHAR_RE.sub(lambda m: chr(int(m.group(1) or m.group(2), 16)), value)


_UNESCAPE_RE = re.compile(r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|([tbnrf\"'\\]))")
_UNESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def unescape_literal(value: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        return _UNESCAPE_MAP[m.group(3)]

    return _UNESCAPE_RE.sub(sub, value)


def serialize_term(
    value: str, is_literal: bool, datatype: str | None = None, lang: str | None = None
) -> str:
    if not is_literal:
        return f"<{escape_uri(value)}>"
    lex = f'"{escape_literal(value)}"'
    if lang:
        return f"{lex}@{lang}"
    if datatype and datatype != XSD_STRING:
        return f"{lex}^^<{escape_uri(datatype)}>"
    return lex


def nquad_line(t: Triple, graph: str | None) -> str:
    s = serialize_term(t.subj, False)
    p = serialize_term(t.pred, False)
    o = serialize_term(t.obj_value, t.obj_is_literal, t.obj_datatype, t.obj_lang)
    if graph:
        return f"{s} {p} {o} <{escape_uri(graph)}> ."
    return f"{s} {p} {o} ."


# --- N-Triples / N-Quads line parsing (tests + golden-answer replay) ----

_TERM_RE = re.compile(
    r"""\s*(?:
        <(?P<uri>[^>]*)>
      | _:(?P<bnode>\S+)
      | "(?P<lit>(?:[^"\\]|\\.)*)"
          (?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9-]+))?
    )""",
    re.VERBOSE,
)


def parse_nt_line(line: str) -> tuple | None:
    """Parse one N-Triples/N-Quads line into
    (subj, pred, obj_value, obj_is_literal, obj_datatype, obj_lang, graph).
    Returns None for blank/comment lines. Blank-node labels are kept as
    ``_:label`` strings in the URI slot."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    terms = []
    pos = 0
    while pos < len(line) and len(terms) < 4:
        if line[pos:].lstrip().startswith("."):
            break
        m = _TERM_RE.match(line, pos)
        if not m:
            raise ValueError(f"unparseable N-Triples line at {pos}: {line!r}")
        pos = m.end()
        if m.group("uri") is not None:
            terms.append((unescape_uri(m.group("uri")), False, None, None))
        elif m.group("bnode") is not None:
            terms.append(("_:" + m.group("bnode"), False, None, None))
        else:
            dt = m.group("dt")
            if dt is not None:
                dt = unescape_uri(dt)
            if dt == XSD_STRING:
                dt = None
            terms.append((unescape_literal(m.group("lit")), True, dt, m.group("lang")))
    if len(terms) < 3:
        raise ValueError(f"short N-Triples line: {line!r}")
    s, p, o = terms[0], terms[1], terms[2]
    graph = terms[3][0] if len(terms) == 4 else None
    return (s[0], p[0], o[0], o[1], o[2], o[3], graph)


def load_nt(text: str) -> set[tuple]:
    """Parse an N-Triples document into a set of 6-tuples (graph dropped)."""
    out = set()
    for line in text.splitlines():
        parsed = parse_nt_line(line)
        if parsed:
            out.add(parsed[:6])
    return out


# --- dates --------------------------------------------------------------

_DT_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,9}))?"
    r"(Z|[+-]\d{2}:?\d{2})?$"
)


@lru_cache(maxsize=8192)
def parse_instant(value: str) -> datetime:
    """Parse the ISO-8601 timestamps FOXML carries (always UTC 'Z' with
    optional fractional seconds in the fixtures; offsets tolerated).

    lru_cached: one object references the same lexical timestamp several
    times (object dates + every datastream version sort key), and real
    repositories cluster timestamps heavily; the cache is per Python
    worker process and value-pure, so task retries are unaffected."""
    m = _DT_RE.match(value.strip())
    if not m:
        raise ValueError(f"unparseable FOXML date: {value!r}")
    y, mo, d, h, mi, s = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7) or ""
    micros = int(frac.ljust(6, "0")[:6]) if frac else 0
    tz = timezone.utc
    off = m.group(8)
    if off and off != "Z":
        off = off.replace(":", "")
        sign = 1 if off[0] == "+" else -1
        from datetime import timedelta

        tz = timezone(sign * timedelta(hours=int(off[1:3]), minutes=int(off[3:5])))
    return datetime(y, mo, d, h, mi, s, micros, tz)


def iso_instant(dt: datetime) -> str:
    """``DateTimeFormatter.ISO_INSTANT`` semantics: UTC, 'Z' suffix,
    fractional seconds printed in 3/6/9-digit groups, and **omitted
    entirely when zero** (the ``.000``-drop, `ObjectProcessor.java:272-274`)."""
    dt = dt.astimezone(timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    us = dt.microsecond
    if us == 0:
        return base + "Z"
    if us % 1000 == 0:
        return f"{base}.{us // 1000:03d}Z"
    return f"{base}.{us:06d}Z"


_DAYS_IN_MONTH = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _validate_date_fields(value: str, y: int, mo: int, d: int, h: int, mi: int, s: int) -> None:
    """Calendar-validate grammar-matching fields, mirroring what
    ``datetime()`` enforces on the slow path: a lexically well-formed
    but impossible instant (month 13, day 40, hour 25) must raise — the
    reference's parse turns these into E1 error rows, not canonical-
    looking literals."""
    if not 1 <= mo <= 12:
        raise ValueError(f"month out of range in FOXML date: {value!r}")
    dim = _DAYS_IN_MONTH[mo - 1]
    if mo == 2 and y % 4 == 0 and (y % 100 != 0 or y % 400 == 0):
        dim = 29
    if not 1 <= d <= dim:
        raise ValueError(f"day out of range in FOXML date: {value!r}")
    if h > 23 or mi > 59 or s > 59:
        raise ValueError(f"time out of range in FOXML date: {value!r}")


@lru_cache(maxsize=8192)
def iso_reformat(value: str) -> str:
    """FOXML lexical timestamp -> reference-canonical ISO instant.

    Fast path: a UTC ('Z' or offset-free) lexical value is already
    zero-padded by the grammar, so the canonical form is pure string
    surgery on the regex groups — no datetime object, but the SAME
    field-range validation the datetime path applies. Non-UTC offsets
    (absent from FOXML in practice) take the full parse+format path."""
    v = value.strip()
    m = _DT_RE.match(v)
    if not m:
        raise ValueError(f"unparseable FOXML date: {value!r}")
    off = m.group(8)
    if off is None or off == "Z":
        _validate_date_fields(value, *(int(m.group(i)) for i in range(1, 7)))
        frac = m.group(7) or ""
        micros = int(frac.ljust(6, "0")[:6]) if frac else 0
        base = v[:19]
        if micros == 0:
            return base + "Z"
        if micros % 1000 == 0:
            return f"{base}.{micros // 1000:03d}Z"
        return f"{base}.{micros:06d}Z"
    return iso_instant(parse_instant(v))


# --- PID / blob-id minting (ObjectProcessor.java:293-341) ----------------


def uri_encode(s: str) -> str:
    """``URLEncoder.encode(s, "UTF-8")``: form-encoding, i.e. '*' and
    '-._' kept, space becomes '+', everything else percent-encoded.
    quote_plus treats '~' as always-safe (RFC 3986 unreserved, cannot be
    un-safed since Python 3.7) but Java's URLEncoder — and therefore
    Spark's ``url_encode``, which the JVM request pass uses — emits
    ``%7E``; the post-replace keeps the two minting paths byte-equal."""
    return urllib.parse.quote_plus(s, safe="*-._").replace("~", "%7E")


def get_blob_id(token: str) -> str:
    """Token -> Akubra blob id. Object tokens get the ``info:fedora/``
    prefix (idempotently); datastream tokens ``ns:id+dsId+dsVersionId``
    become ``info:fedora/ns:id/<enc(dsId)>/<enc(dsVersionId)>``."""
    if "+" not in token:
        return token if token.startswith(FEDORA_URI) else FEDORA_URI + token
    parts = token.split("+")
    if len(parts) != 3:
        raise ValueError(f"Malformed datastream token: {token}")
    encoded = f"{parts[0]}/{uri_encode(parts[1])}/{uri_encode(parts[2])}"
    return encoded if token.startswith(FEDORA_URI) else FEDORA_URI + encoded


def object_uri(pid: str) -> str:
    return FEDORA_URI + pid


def datastream_uri(obj_uri: str, ds_id: str) -> str:
    return f"{obj_uri}/{ds_id}"


def dissemination_type(ds_id: str) -> str:
    return f"{FEDORA_URI}*/{ds_id}"


# --- skolemization --------------------------------------------------------


def skolemize(scope: str, local_id: str) -> str:
    """Deterministic blank-node skolem URI. ``scope`` should identify the
    parse unit (e.g. ``pid|dsId``) so the same document always yields the
    same skolems; rdflib/Jena-style random bnode labels would break
    set-equality across runs and retries."""
    digest = hashlib.sha256(f"{scope}\x00{local_id}".encode("utf-8")).hexdigest()
    return f"urn:bnode:{digest[:32]}"


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.sha256(data).hexdigest()

"""Dublin Core datastream extraction.

Replicates the reference's SAX handler semantics
(`DublinCoreContentHandler.java:72-100`) over an ``xml.etree`` tree:

- every element in the Dublin Core namespace yields one triple
  ``(subject, http://purl.org/dc/elements/1.1/<localName>, literal(text))``
- character data is accumulated across chunks, so embedded newlines and
  whitespace are preserved verbatim (`DublinCoreContentHandlerTest.java:94-97`)
- elements outside the DC namespace yield nothing
  (`DublinCoreContentHandlerTest.java:99-100`)
- SAX quirks preserved: text of a *non*-DC child nested inside a DC
  element accumulates into the DC literal (characters() fires while the
  predicate is set); a DC element nested inside a DC element emits only
  the inner triple (endElement resets the predicate before the outer
  element closes).

Divergence (documented): the reference matches on the *qname prefix*
last mapped to the DC namespace; we match on the resolved namespace,
which is equivalent for well-formed documents and is what the
reference's own unit tests assert.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .terms import Triple
from .vocab import DC_NAMESPACE

_DC = "{%s}" % DC_NAMESPACE


class DcError(ValueError):
    pass


def parse_dc(content: str | bytes | ET.Element, subject: str) -> list[Triple]:
    if isinstance(content, ET.Element):
        root = content  # pre-parsed inline XML (no re-serialize round-trip)
    else:
        try:
            root = ET.fromstring(content)
        except ET.ParseError as e:
            raise DcError(f"DC XML parse failure: {e}") from e

    out: list[Triple] = []
    # SAX-handler state: the current DC predicate (None = ignoring) and
    # the accumulated character data.
    pred: str | None = None
    chars: list[str] = []

    def walk(el: ET.Element) -> None:
        nonlocal pred, chars
        is_dc = el.tag.startswith(_DC)
        if is_dc:
            pred = DC_NAMESPACE + el.tag[len(_DC):]
            chars = []
        if pred is not None and el.text:
            chars.append(el.text)
        for child in el:
            walk(child)
            if pred is not None and child.tail:
                chars.append(child.tail)
        if is_dc and pred is not None:
            out.append(Triple(subject, pred, "".join(chars), True))
            pred = None
            chars = []

    walk(root)
    return out

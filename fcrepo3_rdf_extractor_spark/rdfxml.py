"""Minimal deterministic RDF/XML parser (stdlib ``xml.etree``).

Stands in for Jena RIOT's RDFXML parse of RELS-EXT / RELS-INT datastreams
(`ObjectProcessor.java:167-169`). Covers the RDF/XML subset Fedora 3
relationship datastreams actually use (verified across all reference
fixtures: only ``rdf:Description``+``rdf:about``, object properties via
``rdf:resource``, and literal-valued property elements appear), plus the
common constructs a general store can contain:

- typed node elements (emit ``rdf:type``)
- ``rdf:nodeID`` / anonymous blank nodes — **skolemized deterministically**
  (the north rule requires stable output across runs/retries; Jena/rdflib
  fresh-bnode labels are run-dependent)
- ``rdf:datatype`` typed literals and ``xml:lang`` tagged literals
  (with inheritance)
- ``rdf:parseType="Resource"`` (nested anonymous node) and
  ``rdf:parseType="Literal"`` (XML literal)
- property attributes on node elements
- ``xml:base`` (document + nested scopes): ``rdf:about``/``rdf:resource``/
  ``rdf:ID``/``rdf:datatype`` resolve against the in-scope base per
  RFC 3986 §5.2, matching Jena RIOT's resolution

- containers (``rdf:Seq``/``Bag``/``Alt``) with ``rdf:li`` numbered to
  ``rdf:_1, _2, ...`` (counter per enclosing node element, per spec)
- ``rdf:parseType="Collection"`` (RDF list: first/rest/nil chain over
  deterministic blank nodes)
- reification: ``rdf:ID`` on a property element emits the statement plus
  the four ``rdf:Statement``/``subject``/``predicate``/``object``
  triples about ``<base#ID>`` (RDF/XML §7.3)
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from .terms import Triple, skolemize
from .vocab import RDF_NS, RDF_XML_LITERAL

# --- RFC 3986 relative-reference resolution --------------------------------
# RDF/XML resolves rdf:about / rdf:resource / rdf:ID / rdf:datatype against
# the in-scope base URI (xml:base, inheriting and nesting per XML Base).
# Jena RIOT does this through its IRI layer (`ObjectProcessor.java:167-169`
# inherits it); round 1 only applied base to rdf:ID. Implemented directly
# (urllib.parse.urljoin special-cases known schemes and mishandles e.g.
# ``info:``): the strict algorithm of RFC 3986 §5.2.

_URI_SPLIT_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)


def _split_uri(uri: str):
    return _URI_SPLIT_RE.match(uri).groups()  # scheme, auth, path, query, frag


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    # preserve a trailing slash implied by ./.. at the end
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    # '..' that empties an absolute path resolves to the root, not ''
    # (RFC 3986 §5.2.4: '/a/..' -> '/')
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res


def resolve_uri(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986 §5.2 (strict).
    With an empty base the reference passes through verbatim — the
    pre-base behavior for absolute-URI-only documents."""
    if not base:
        return ref
    r_scheme, r_auth, r_path, r_query, r_frag = _split_uri(ref)
    if r_scheme is not None:
        # already absolute — but strict resolution (§5.2.2) still
        # normalizes dot segments in its path, as Jena's IRI layer does:
        # <http://ex/a/../b> and <http://ex/b> must denote one node
        t_path = _remove_dot_segments(r_path)
        out = f"{r_scheme}:"
        if r_auth is not None:
            out += "//" + r_auth
        out += t_path
        if r_query is not None:
            out += "?" + r_query
        if r_frag is not None:
            out += "#" + r_frag
        return out
    b_scheme, b_auth, b_path, b_query, _ = _split_uri(base)
    if r_auth is not None:
        t_auth, t_path, t_query = r_auth, _remove_dot_segments(r_path), r_query
    elif not r_path:
        t_auth, t_path = b_auth, b_path
        t_query = r_query if r_query is not None else b_query
    else:
        if r_path.startswith("/"):
            t_path = _remove_dot_segments(r_path)
        elif b_auth is not None and not b_path:
            t_path = _remove_dot_segments("/" + r_path)
        else:
            merged = b_path[: b_path.rfind("/") + 1] + r_path if "/" in b_path else r_path
            t_path = _remove_dot_segments(merged)
        t_auth, t_query = b_auth, r_query
    out = f"{b_scheme}:" if b_scheme is not None else ""
    if t_auth is not None:
        out += "//" + t_auth
    out += t_path
    if t_query is not None:
        out += "?" + t_query
    if r_frag is not None:
        out += "#" + r_frag
    return out

_RDF = "{%s}" % RDF_NS
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"

# rdf: attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {
    _RDF + "about",
    _RDF + "ID",
    _RDF + "nodeID",
    _RDF + "resource",
    _RDF + "datatype",
    _RDF + "parseType",
    _XML_LANG,
    _XML_BASE,
}


class RdfXmlError(ValueError):
    pass


def _split(tag: str) -> tuple[str, str]:
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns, local
    return "", tag


class _Parser:
    def __init__(self, scope: str, base: str | None):
        self.scope = scope
        self.base = base or ""
        self.triples: list[Triple] = []
        self._anon = 0

    def fresh_bnode(self) -> str:
        self._anon += 1
        return skolemize(self.scope, f"anon{self._anon}")

    def named_bnode(self, node_id: str) -> str:
        return skolemize(self.scope, f"nodeID:{node_id}")

    def _scoped_base(self, el: ET.Element, base: str) -> str:
        """xml:base on any element rebinds the in-scope base for its
        subtree; a relative xml:base resolves against the outer base
        (XML Base §4.3)."""
        own = el.get(_XML_BASE)
        if own is None:
            return base
        return resolve_uri(base, own)

    def node_subject(self, el: ET.Element, base: str) -> str:
        about = el.get(_RDF + "about")
        if about is not None:
            return resolve_uri(base, about)
        rid = el.get(_RDF + "ID")
        if rid is not None:
            return resolve_uri(base, "#" + rid) if base else f"#{rid}"
        node_id = el.get(_RDF + "nodeID")
        if node_id is not None:
            return self.named_bnode(node_id)
        return self.fresh_bnode()

    def parse_node_element(
        self, el: ET.Element, lang: str | None, base: str | None = None
    ) -> str:
        base = self._scoped_base(el, self.base if base is None else base)
        lang = el.get(_XML_LANG, lang)
        subj = self.node_subject(el, base)
        ns, local = _split(el.tag)
        if not (ns == RDF_NS and local == "Description"):
            self.triples.append(Triple(subj, RDF_NS + "type", ns + local, False))
        # property attributes on the node element
        for attr, value in el.attrib.items():
            if attr in _SYNTAX_ATTRS:
                continue
            ans, alocal = _split(attr)
            if ans == RDF_NS and alocal == "type":
                # rdf:type attribute values are URI references, resolved
                # against the in-scope base like rdf:resource
                self.triples.append(
                    Triple(subj, RDF_NS + "type", resolve_uri(base, value), False)
                )
            elif ans:  # unqualified attrs are not properties
                self.triples.append(
                    Triple(subj, ans + alocal, value, True, None, lang)
                )
        li_counter = 0
        for prop in el:
            pns, plocal = _split(prop.tag)
            if pns == RDF_NS and plocal == "li":
                li_counter += 1
                self.parse_property_element(
                    subj, prop, lang, base, pred_override=f"{RDF_NS}_{li_counter}"
                )
            else:
                self.parse_property_element(subj, prop, lang, base)
        return subj

    def parse_property_element(
        self,
        subj: str,
        el: ET.Element,
        lang: str | None,
        base: str | None = None,
        pred_override: str | None = None,
    ) -> None:
        base = self._scoped_base(el, self.base if base is None else base)
        lang = el.get(_XML_LANG, lang)
        ns, local = _split(el.tag)
        pred = pred_override or (ns + local)
        parse_type = el.get(_RDF + "parseType")
        resource = el.get(_RDF + "resource")
        node_id = el.get(_RDF + "nodeID")
        datatype = el.get(_RDF + "datatype")
        children = list(el)
        # rdf:ID on a PROPERTY element reifies the statement (RDF/XML
        # §7.3): besides the statement itself, emit the four reification
        # triples about <base#ID>. (On a NODE element rdf:ID names the
        # subject instead — handled in node_subject.)
        reify_id = el.get(_RDF + "ID")

        def emit(o_value: str, o_lit: bool, o_dt: str | None = None,
                 o_lang: str | None = None) -> None:
            self.triples.append(Triple(subj, pred, o_value, o_lit, o_dt, o_lang))
            if reify_id is not None:
                stmt = resolve_uri(base, "#" + reify_id) if base else f"#{reify_id}"
                self.triples.append(
                    Triple(stmt, RDF_NS + "type", RDF_NS + "Statement", False))
                self.triples.append(Triple(stmt, RDF_NS + "subject", subj, False))
                self.triples.append(Triple(stmt, RDF_NS + "predicate", pred, False))
                self.triples.append(
                    Triple(stmt, RDF_NS + "object", o_value, o_lit, o_dt, o_lang))

        if parse_type == "Resource":
            obj = self.fresh_bnode()
            emit(obj, False)
            li_counter = 0
            for sub in children:
                sns, slocal = _split(sub.tag)
                if sns == RDF_NS and slocal == "li":
                    li_counter += 1
                    self.parse_property_element(
                        obj, sub, lang, base, pred_override=f"{RDF_NS}_{li_counter}"
                    )
                else:
                    self.parse_property_element(obj, sub, lang, base)
            return
        if parse_type == "Collection":
            # RDF list: one deterministic cell bnode per member
            cells = [self.fresh_bnode() for _ in children]
            head = cells[0] if cells else RDF_NS + "nil"
            emit(head, False)
            for i, (cell, child) in enumerate(zip(cells, children)):
                item = self.parse_node_element(child, lang, base)
                self.triples.append(Triple(cell, RDF_NS + "first", item, False))
                rest = cells[i + 1] if i + 1 < len(cells) else RDF_NS + "nil"
                self.triples.append(Triple(cell, RDF_NS + "rest", rest, False))
            return
        if parse_type is not None:
            # "Literal" — and, per RDF/XML syntax §7.2.20, ANY value other
            # than Resource/Collection MUST be treated as "Literal" (Jena
            # behaves this way, inherited by ObjectProcessor.java:167-169;
            # raising here produced an error row where the reference
            # produces an XMLLiteral triple)
            xml_text = "".join(ET.tostring(c, encoding="unicode") for c in children)
            emit((el.text or "") + xml_text, True, RDF_XML_LITERAL, None)
            return

        if resource is not None:
            emit(resolve_uri(base, resource), False)
            return
        if node_id is not None:
            emit(self.named_bnode(node_id), False)
            return
        if children:
            if len(children) != 1:
                raise RdfXmlError(
                    f"property element <{pred}> with {len(children)} child node elements"
                )
            obj = self.parse_node_element(children[0], lang, base)
            emit(obj, False)
            return

        # property attributes shortcut: <p a:x="1"/> => bnode object
        prop_attrs = [a for a in el.attrib if a not in _SYNTAX_ATTRS]
        if prop_attrs:
            obj = self.fresh_bnode()
            emit(obj, False)
            for attr in prop_attrs:
                ans, alocal = _split(attr)
                if ans:
                    self.triples.append(
                        Triple(obj, ans + alocal, el.attrib[attr], True, None, lang)
                    )
            return

        # plain / typed literal (possibly the empty string — Jena emits
        # an empty literal for <p></p>, which skipEmptyLiterals then drops)
        text = el.text or ""
        if datatype is not None:
            # rdf:datatype is a URI reference, resolved like the others
            emit(text, True, resolve_uri(base, datatype), None)
        else:
            emit(text, True, None, lang)


def parse_rdfxml(
    content: str | bytes | ET.Element, scope: str, base: str | None = None
) -> list[Triple]:
    """Parse an RDF/XML document into triples.

    ``scope`` seeds deterministic blank-node skolemization: pass something
    unique per parse unit, e.g. ``f"{pid}|{ds_id}"``.
    """
    if isinstance(content, ET.Element):
        root = content  # pre-parsed inline XML (no re-serialize round-trip)
    else:
        try:
            root = ET.fromstring(content)
        except ET.ParseError as e:
            raise RdfXmlError(f"RDF/XML parse failure: {e}") from e

    ns, local = _split(root.tag)
    lang = root.get(_XML_LANG)
    if ns == RDF_NS and local == "RDF":
        # fold a (possibly relative) xml:base on the rdf:RDF wrapper into
        # the document base (XML Base §4.3) — the wrapper itself is not a
        # node element, so this is the only place it gets applied
        doc_base = base or ""
        root_base = root.get(_XML_BASE)
        if root_base is not None:
            doc_base = resolve_uri(doc_base, root_base)
        parser = _Parser(scope, doc_base)
        for child in root:
            parser.parse_node_element(child, lang)
    else:
        # document whose root is itself a node element: its own xml:base
        # is applied exactly once, by parse_node_element's scoping —
        # folding it here too would resolve a relative base twice
        parser = _Parser(scope, base or "")
        parser.parse_node_element(root, lang)
    return parser.triples

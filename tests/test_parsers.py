"""Unit tests for the FOXML / Dublin Core / RDF-XML parsers, mirroring the
reference's `DublinCoreContentHandlerTest.java` and
`SkipEmptyLiteralsStreamRDF`-adjacent behaviours, plus the constructs the
reference delegates to Jena."""

from __future__ import annotations

import pytest

from fcrepo3_rdf_extractor_spark.dc import DcError, parse_dc
from fcrepo3_rdf_extractor_spark.extract import extract_object
from fcrepo3_rdf_extractor_spark.foxml import FoxmlError, parse_foxml
from fcrepo3_rdf_extractor_spark.rdfxml import parse_rdfxml
from fcrepo3_rdf_extractor_spark.vocab import DC_NAMESPACE, RDF_NS, XSD_DATETIME

DC = DC_NAMESPACE


# --- Dublin Core (DublinCoreContentHandlerTest.java:80-102) --------------

DC_DOC = """<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
 xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:other="urn:other#">
  <dc:title>Some title</dc:title>
  <dc:description>line one
line two</dc:description>
  <other:ignored>nope</other:ignored>
  <dc:creator></dc:creator>
</oai_dc:dc>"""


def test_dc_extracts_only_dc_namespace():
    triples = parse_dc(DC_DOC, "info:fedora/x:1")
    preds = {t.pred for t in triples}
    assert preds == {DC + "title", DC + "description", DC + "creator"}
    assert all(t.subj == "info:fedora/x:1" and t.obj_is_literal for t in triples)


def test_dc_preserves_multiline_literal():
    triples = parse_dc(DC_DOC, "s")
    desc = next(t for t in triples if t.pred == DC + "description")
    assert desc.obj_value == "line one\nline two"


def test_dc_empty_element_yields_empty_literal():
    # filtered later by the skip-empty-literals operator, like the reference
    triples = parse_dc(DC_DOC, "s")
    creator = next(t for t in triples if t.pred == DC + "creator")
    assert creator.obj_value == ""


def test_dc_malformed_xml_raises():
    with pytest.raises(DcError):
        parse_dc("<oai_dc:dc>", "s")


# --- RDF/XML ---------------------------------------------------------------

def test_rdfxml_resource_and_literal_properties():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:rel="info:fedora/fedora-system:def/relations-external#">
      <rdf:Description rdf:about="info:fedora/x:1">
        <rel:isMemberOfCollection rdf:resource="info:fedora/c:1"/>
        <rel:note>plain</rel:note>
      </rdf:Description>
    </rdf:RDF>"""
    triples = set(t.key() for t in parse_rdfxml(doc, scope="t"))
    rel = "info:fedora/fedora-system:def/relations-external#"
    assert triples == {
        ("info:fedora/x:1", rel + "isMemberOfCollection", "info:fedora/c:1", False, None, None),
        ("info:fedora/x:1", rel + "note", "plain", True, None, None),
    }


def test_rdfxml_default_namespace_property_element():
    # the si-user:10 fixture style: xmlns="..." on the property element
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
      <rdf:Description rdf:about="info:fedora/x:1">
        <hasModel xmlns="info:fedora/fedora-system:def/model#"
                  rdf:resource="info:fedora/si:peopleCModel"/>
      </rdf:Description>
    </rdf:RDF>"""
    (t,) = parse_rdfxml(doc, scope="t")
    assert t.pred == "info:fedora/fedora-system:def/model#hasModel"
    assert not t.obj_is_literal


def test_rdfxml_typed_node_emits_rdf_type():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <ex:Widget rdf:about="urn:w1"><ex:size>3</ex:size></ex:Widget>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert ("urn:w1", RDF_NS + "type", "urn:ex#Widget", False, None, None) in keys


def test_rdfxml_blank_nodes_deterministic():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="urn:s">
        <ex:p><rdf:Description><ex:q>v</ex:q></rdf:Description></ex:p>
        <ex:r rdf:nodeID="n1"/>
      </rdf:Description>
      <rdf:Description rdf:nodeID="n1"><ex:q>w</ex:q></rdf:Description>
    </rdf:RDF>"""
    a = sorted(t.key() for t in parse_rdfxml(doc, scope="pid|RELS-EXT"))
    b = sorted(t.key() for t in parse_rdfxml(doc, scope="pid|RELS-EXT"))
    assert a == b  # stable across parses
    bnodes = {t.subj for t in parse_rdfxml(doc, scope="pid|RELS-EXT") if t.subj.startswith("urn:bnode:")}
    assert len(bnodes) == 2  # one anonymous + one named
    # nodeID references unify to one skolem
    named = [t for t in parse_rdfxml(doc, scope="pid|RELS-EXT") if t.pred == "urn:ex#r"]
    ref = [t for t in parse_rdfxml(doc, scope="pid|RELS-EXT") if t.obj_value == "w"]
    assert named[0].obj_value == ref[0].subj
    # different scope -> different skolems (no cross-document collisions)
    other = {t.subj for t in parse_rdfxml(doc, scope="pid2|RELS-EXT") if t.subj.startswith("urn:bnode:")}
    assert not (bnodes & other)


def test_rdfxml_datatype_and_lang():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#" xml:lang="en">
      <rdf:Description rdf:about="urn:s">
        <ex:d rdf:datatype="http://www.w3.org/2001/XMLSchema#dateTime">2020-01-01T00:00:00Z</ex:d>
        <ex:l>hello</ex:l>
        <ex:f xml:lang="fr">bonjour</ex:f>
      </rdf:Description>
    </rdf:RDF>"""
    by_pred = {t.pred: t for t in parse_rdfxml(doc, scope="t")}
    assert by_pred["urn:ex#d"].obj_datatype == XSD_DATETIME
    assert by_pred["urn:ex#d"].obj_lang is None
    assert by_pred["urn:ex#l"].obj_lang == "en"   # inherited
    assert by_pred["urn:ex#f"].obj_lang == "fr"   # overridden


def test_rdfxml_parsetype_resource():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="urn:s">
        <ex:p rdf:parseType="Resource"><ex:q>v</ex:q></ex:p>
      </rdf:Description>
    </rdf:RDF>"""
    triples = parse_rdfxml(doc, scope="t")
    link = next(t for t in triples if t.pred == "urn:ex#p")
    inner = next(t for t in triples if t.pred == "urn:ex#q")
    assert link.obj_value == inner.subj and inner.subj.startswith("urn:bnode:")


def test_rdfxml_unknown_parsetype_falls_back_to_literal():
    """RDF/XML syntax §7.2.20: any parseType value other than
    Resource/Collection is processed as "Literal" (Jena does this;
    inherited by ObjectProcessor.java:167-169). Raising instead produced
    an error row where the reference produces an XMLLiteral triple."""
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="urn:s">
        <ex:p rdf:parseType="Other">text<ex:q>v</ex:q></ex:p>
      </rdf:Description>
    </rdf:RDF>"""
    (t,) = parse_rdfxml(doc, scope="t")
    assert t.pred == "urn:ex#p"
    assert t.obj_is_literal
    assert t.obj_datatype == "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"
    assert t.obj_value.startswith("text") and "v" in t.obj_value


# --- FOXML -----------------------------------------------------------------

FOXML_TWO_VERSIONS = """<foxml:digitalObject VERSION="1.1" PID="t:1"
  xmlns:foxml="info:fedora/fedora-system:def/foxml#">
  <foxml:objectProperties>
    <foxml:property NAME="info:fedora/fedora-system:def/model#state" VALUE="A"/>
    <foxml:property NAME="info:fedora/fedora-system:def/model#label" VALUE="L"/>
    <foxml:property NAME="info:fedora/fedora-system:def/model#ownerId" VALUE="O"/>
    <foxml:property NAME="info:fedora/fedora-system:def/model#createdDate" VALUE="2020-01-01T00:00:00.000Z"/>
    <foxml:property NAME="info:fedora/fedora-system:def/view#lastModifiedDate" VALUE="2020-01-02T00:00:00.000Z"/>
  </foxml:objectProperties>
  <foxml:datastream ID="X1" STATE="A" CONTROL_GROUP="M">
    <foxml:datastreamVersion ID="X1.0" CREATED="2020-01-01T00:00:00.000Z" MIMETYPE="a/b">
      <foxml:contentLocation TYPE="INTERNAL_ID" REF="t:1+X1+X1.0"/>
    </foxml:datastreamVersion>
    <foxml:datastreamVersion ID="X1.1" CREATED="2020-06-01T00:00:00.000Z" MIMETYPE="c/d">
      <foxml:contentLocation TYPE="INTERNAL_ID" REF="t:1+X1+X1.1"/>
    </foxml:datastreamVersion>
  </foxml:datastream>
</foxml:digitalObject>"""


def test_foxml_newest_version_first():
    obj = parse_foxml(FOXML_TWO_VERSIONS)
    versions = obj["datastreams"][0]["versions"]
    assert [v["id"] for v in versions] == ["X1.1", "X1.0"]
    assert versions[0]["mimetype"] == "c/d"


def test_foxml_missing_pid_raises():
    with pytest.raises(FoxmlError):
        parse_foxml("<foxml:digitalObject xmlns:foxml='info:fedora/fedora-system:def/foxml#'/>")


def test_foxml_malformed_raises():
    with pytest.raises(FoxmlError):
        parse_foxml("not xml at all <")


# --- extract-level error isolation (E1) -------------------------------------

def test_extract_missing_dc_and_relsext_counts_errors_keeps_constants():
    triples, errors = extract_object(FOXML_TWO_VERSIONS)
    # 6 object + 6 datastream constants survive
    assert len(triples) == 12
    stages = sorted(e.stage for e in errors)
    assert stages == ["dc", "rels_ext"]  # RELS-INT absent -> no error (null-guarded)


def test_extract_managed_rels_via_lookup():
    foxml = FOXML_TWO_VERSIONS.replace('ID="X1"', 'ID="RELS-EXT"')
    rels = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="info:fedora/t:1"><ex:p rdf:resource="urn:o"/></rdf:Description>
    </rdf:RDF>"""
    # contentLocation REF is still t:1+X1+X1.1 -> minted blob id keeps X1
    lookup = {"info:fedora/t:1/X1/X1.1": rels}.get
    triples, errors = extract_object(foxml, ds_lookup=lookup)
    assert ("info:fedora/t:1", "urn:ex#p", "urn:o", False, None, None) in {t.key() for t in triples}
    assert [e.stage for e in errors] == ["dc"]


def test_extract_object_level_failure_yields_zero_triples():
    triples, errors = extract_object("<broken")
    assert triples == [] and [e.stage for e in errors] == ["object"]


def test_extract_bad_state_aborts_object():
    bad = FOXML_TWO_VERSIONS.replace('VALUE="A"', 'VALUE="Zombie"', 1)
    triples, errors = extract_object(bad)
    assert triples == [] and errors[0].stage == "object"


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_rdfxml_container_li_numbering():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="urn:s">
        <ex:members><rdf:Bag>
          <rdf:li rdf:resource="urn:a"/>
          <rdf:li rdf:resource="urn:b"/>
          <rdf:li>text</rdf:li>
        </rdf:Bag></ex:members>
      </rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    bag = next(k[0] for k in keys if k[1] == RDF_NS + "type" and k[2] == RDF_NS + "Bag")
    assert (bag, RDF_NS + "_1", "urn:a", False, None, None) in keys
    assert (bag, RDF_NS + "_2", "urn:b", False, None, None) in keys
    assert (bag, RDF_NS + "_3", "text", True, None, None) in keys
    assert ("urn:s", "urn:ex#members", bag, False, None, None) in keys


def test_rdfxml_parsetype_collection():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="urn:s">
        <ex:list rdf:parseType="Collection">
          <rdf:Description rdf:about="urn:a"/>
          <rdf:Description rdf:about="urn:b"/>
        </ex:list>
      </rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    head = next(k[2] for k in keys if k[1] == "urn:ex#list")
    first = {k[0]: k[2] for k in keys if k[1] == RDF_NS + "first"}
    rest = {k[0]: k[2] for k in keys if k[1] == RDF_NS + "rest"}
    assert first[head] == "urn:a"
    assert first[rest[head]] == "urn:b"
    assert rest[rest[head]] == RDF_NS + "nil"
    # deterministic across parses
    again = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert keys == again


def test_rdfxml_empty_collection_is_nil():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="urn:s"><ex:list rdf:parseType="Collection"/></rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert ("urn:s", "urn:ex#list", RDF_NS + "nil", False, None, None) in keys


def test_extract_null_and_wrong_type_content_become_error_rows():
    """NULL/garbage content rows must yield error rows, never raise —
    one bad row at 10^12 scale must not kill the job."""
    for bad in (None, 123, b"\xff\xfe"):
        triples, errors = extract_object(bad)
        assert triples == []
        assert len(errors) == 1 and errors[0].stage == "object"


# --- xml:base resolution (RFC 3986 / XML Base, mirroring Jena RIOT) --------


def test_resolve_uri_matches_urljoin_for_http():
    """Our strict RFC 3986 resolver must agree with urllib's urljoin on
    schemes urllib handles (it special-cases known schemes; we need the
    same algebra for info:/urn: too, which urljoin mangles)."""
    from urllib.parse import urljoin

    from fcrepo3_rdf_extractor_spark.rdfxml import resolve_uri

    base = "http://ex.org/a/b?q=1"
    for ref in ["c", "/c", "../c", "./c", "c/d/../e", "#f", "", "?x=2",
                "//other.org/p", "mailto:x@y", "c#f", "../../../up"]:
        assert resolve_uri(base, ref) == urljoin(base, ref), ref


def test_rdfxml_base_resolves_about_and_resource():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      xmlns:ex="http://ex.org/ns#"
                      xml:base="http://ex.org/dir/doc">
      <rdf:Description rdf:about="item1">
        <ex:rel rdf:resource="item2"/>
        <ex:abs rdf:resource="info:fedora/x:1"/>
        <ex:lit rdf:datatype="types#int">5</ex:lit>
      </rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert ("http://ex.org/dir/item1", "http://ex.org/ns#rel",
            "http://ex.org/dir/item2", False, None, None) in keys
    # absolute URIs pass through untouched
    assert ("http://ex.org/dir/item1", "http://ex.org/ns#abs",
            "info:fedora/x:1", False, None, None) in keys
    # rdf:datatype resolves too
    assert ("http://ex.org/dir/item1", "http://ex.org/ns#lit",
            "5", True, "http://ex.org/dir/types#int", None) in keys


def test_rdfxml_base_nested_scope_overrides():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      xmlns:ex="http://ex.org/ns#"
                      xml:base="http://ex.org/outer/">
      <rdf:Description rdf:about="a" xml:base="http://other.org/inner/">
        <ex:p rdf:resource="b"/>
      </rdf:Description>
      <rdf:Description rdf:about="c">
        <ex:p rdf:resource="d"/>
      </rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert ("http://other.org/inner/a", "http://ex.org/ns#p",
            "http://other.org/inner/b", False, None, None) in keys
    assert ("http://ex.org/outer/c", "http://ex.org/ns#p",
            "http://ex.org/outer/d", False, None, None) in keys


def test_rdfxml_base_applies_to_rdf_id_and_empty_about():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      xmlns:ex="http://ex.org/ns#"
                      xml:base="http://ex.org/doc">
      <rdf:Description rdf:ID="frag"><ex:p>v</ex:p></rdf:Description>
      <rdf:Description rdf:about=""><ex:q>w</ex:q></rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert ("http://ex.org/doc#frag", "http://ex.org/ns#p", "v", True, None, None) in keys
    # rdf:about="" denotes the base document itself
    assert ("http://ex.org/doc", "http://ex.org/ns#q", "w", True, None, None) in keys


def test_rdfxml_base_info_scheme():
    """Fedora URIs are info: scheme — no authority component; relative
    refs must merge on the path (urljoin would refuse)."""
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      xmlns:ex="http://ex.org/ns#"
                      xml:base="info:fedora/obj:1/RELS-EXT">
      <rdf:Description rdf:about="">
        <ex:p rdf:resource="DC"/>
      </rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert ("info:fedora/obj:1/RELS-EXT", "http://ex.org/ns#p",
            "info:fedora/obj:1/DC", False, None, None) in keys


def test_rdfxml_no_base_passes_relative_through():
    """Without any base the parser keeps references verbatim (the
    pre-existing behavior for the reference corpus, which is
    absolute-URI-only)."""
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      xmlns:ex="http://ex.org/ns#">
      <rdf:Description rdf:about="info:fedora/o:1">
        <ex:p rdf:resource="relative/thing"/>
      </rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    assert ("info:fedora/o:1", "http://ex.org/ns#p",
            "relative/thing", False, None, None) in keys


def test_rdfxml_reification_property_id():
    """rdf:ID on a property element reifies the statement: the base
    statement plus four triples about <base#ID> (RDF/XML §7.3)."""
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      xmlns:ex="http://ex.org/ns#"
                      xml:base="http://ex.org/doc">
      <rdf:Description rdf:about="info:fedora/o:1">
        <ex:p rdf:ID="st1" rdf:resource="urn:obj"/>
        <ex:q rdf:ID="st2">lit</ex:q>
      </rdf:Description>
    </rdf:RDF>"""
    keys = {t.key() for t in parse_rdfxml(doc, scope="t")}
    s, stmt1, stmt2 = "info:fedora/o:1", "http://ex.org/doc#st1", "http://ex.org/doc#st2"
    assert (s, "http://ex.org/ns#p", "urn:obj", False, None, None) in keys
    assert (stmt1, RDF_NS + "type", RDF_NS + "Statement", False, None, None) in keys
    assert (stmt1, RDF_NS + "subject", s, False, None, None) in keys
    assert (stmt1, RDF_NS + "predicate", "http://ex.org/ns#p", False, None, None) in keys
    assert (stmt1, RDF_NS + "object", "urn:obj", False, None, None) in keys
    # literal statement reified with the literal as rdf:object
    assert (stmt2, RDF_NS + "object", "lit", True, None, None) in keys
    assert len(keys) == 2 + 4 + 4


def test_rdfxml_no_reification_without_property_id():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                      xmlns:ex="http://ex.org/ns#">
      <rdf:Description rdf:about="info:fedora/o:1">
        <ex:p rdf:resource="urn:obj"/>
      </rdf:Description>
    </rdf:RDF>"""
    assert len(parse_rdfxml(doc, scope="t")) == 1


def test_extract_external_datastream_via_lookup():
    """E/R datastream content resolves through the pre-fetched table
    keyed by the verbatim URL (the batch shape of the reference's inline
    HTTP fetch, ObjectProcessor.java:217-222); a missing URL is an error
    row, not a crash."""
    foxml = """<foxml:digitalObject VERSION="1.1" PID="e:1"
      xmlns:foxml="info:fedora/fedora-system:def/foxml#">
      <foxml:objectProperties>
        <foxml:property NAME="info:fedora/fedora-system:def/model#state" VALUE="A"/>
        <foxml:property NAME="info:fedora/fedora-system:def/model#createdDate" VALUE="2020-01-01T00:00:00.000Z"/>
        <foxml:property NAME="info:fedora/fedora-system:def/view#lastModifiedDate" VALUE="2020-01-01T00:00:00.000Z"/>
      </foxml:objectProperties>
      <foxml:datastream ID="RELS-EXT" STATE="A" CONTROL_GROUP="E">
        <foxml:datastreamVersion ID="RELS-EXT.0" CREATED="2020-01-01T00:00:00.000Z" MIMETYPE="application/rdf+xml">
          <foxml:contentLocation TYPE="URL" REF="http://ex.org/rels/e1.rdf"/>
        </foxml:datastreamVersion>
      </foxml:datastream>
    </foxml:digitalObject>"""
    rels = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="urn:ex#">
      <rdf:Description rdf:about="info:fedora/e:1"><ex:p rdf:resource="urn:o"/></rdf:Description>
    </rdf:RDF>"""
    table = {"http://ex.org/rels/e1.rdf": rels}
    triples, errors = extract_object(foxml, ds_lookup=table.get)
    assert ("info:fedora/e:1", "urn:ex#p", "urn:o", False, None, None) in {
        t.key() for t in triples
    }
    assert [e.stage for e in errors] == ["dc"]  # only the absent DC errors

    # URL absent from the table -> per-datastream error, constants kept
    triples2, errors2 = extract_object(foxml, ds_lookup={}.get)
    assert {e.stage for e in errors2} == {"dc", "rels_ext"}
    assert any("missing external content" in e.message for e in errors2)
    assert len(triples2) == 12  # 6 object + 6 datastream constants survive


def test_rdfxml_relative_base_on_node_root_applied_once():
    """Regression: a relative xml:base on a non-rdf:RDF root was folded
    into the document base AND re-applied by the node element's own
    scoping, doubling the segment."""
    doc = ('<ex:Thing xmlns:ex="urn:ex#" '
           'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xml:base="sub/" rdf:about="x"/>')
    subjects = {t.subj for t in parse_rdfxml(doc, scope="t", base="http://ex.org/dir/")}
    assert subjects == {"http://ex.org/dir/sub/x"}


def test_resolve_uri_dotdot_to_root():
    """Regression: '..' emptying an absolute path must resolve to the
    root '/', matching RFC 3986 §5.2.4 and urljoin."""
    from urllib.parse import urljoin

    from fcrepo3_rdf_extractor_spark.rdfxml import resolve_uri

    for base, ref in [("http://ex/a", ".."), ("http://ex/a/b", "../.."),
                      ("http://ex.org", ".."), ("http://ex/a", "../..")]:
        assert resolve_uri(base, ref) == urljoin(base, ref), (base, ref)

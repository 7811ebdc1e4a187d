"""Unit tests for the term model: blob-id minting
(`ObjectProcessorTest.java:101-143`), ISO-instant formatting
(`ObjectProcessor.java:272-274`), N-Triples escaping, skolemization."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from fcrepo3_rdf_extractor_spark.terms import (
    Triple,
    escape_literal,
    get_blob_id,
    iso_instant,
    iso_reformat,
    load_nt,
    nquad_line,
    parse_nt_line,
    skolemize,
    unescape_literal,
)


# --- blob-id minting (mirrors ObjectProcessorTest.java:101-143) ---------

def test_object_token_gets_prefix():
    assert get_blob_id("testid:123") == "info:fedora/testid:123"


def test_object_token_prefix_idempotent():
    assert get_blob_id("info:fedora/testid:123") == "info:fedora/testid:123"


def test_datastream_token_three_parts():
    assert get_blob_id("testid:123+DC+DC.0") == "info:fedora/testid:123/DC/DC.0"


def test_datastream_token_with_prefix():
    assert get_blob_id("info:fedora/testid:123+DC+DC.0") == "info:fedora/testid:123/DC/DC.0"


def test_datastream_token_percent_encodes_segments():
    # URLEncoder.encode: space -> '+', non-safe chars percent-encoded
    assert (
        get_blob_id("ns:1+my ds/x+v 1")
        == "info:fedora/ns:1/my+ds%2Fx/v+1"
    )


def test_malformed_datastream_token_raises():
    with pytest.raises(ValueError):
        get_blob_id("a+b")


# --- ISO instant formatting ----------------------------------------------

def test_iso_drops_zero_millis():
    assert iso_reformat("2004-12-10T00:21:58.000Z") == "2004-12-10T00:21:58Z"


def test_iso_keeps_nonzero_millis():
    assert iso_reformat("2005-01-20T22:46:07.506Z") == "2005-01-20T22:46:07.506Z"


def test_iso_pads_millis_group():
    # ISO_INSTANT prints fractions in 3-digit groups: .05 -> .050
    assert iso_reformat("2005-01-20T22:46:07.05Z") == "2005-01-20T22:46:07.050Z"


def test_iso_micros_group():
    assert iso_reformat("2005-01-20T22:46:07.000123Z") == "2005-01-20T22:46:07.000123Z"


def test_iso_no_fraction_input():
    assert iso_reformat("2005-01-20T22:46:07Z") == "2005-01-20T22:46:07Z"


@pytest.mark.parametrize("bad", [
    "2004-13-01T00:00:00Z",   # month 13
    "2004-02-30T00:00:00Z",   # Feb 30
    "1900-02-29T00:00:00Z",   # not a leap year (century rule)
    "2004-01-40T00:00:00Z",   # day 40
    "2004-01-01T25:00:00Z",   # hour 25
    "2004-01-01T00:61:00Z",   # minute 61
])
def test_iso_reformat_rejects_impossible_instants(bad):
    """Grammar-matching but calendar-impossible timestamps must raise
    (-> E1 error rows), matching the datetime()-backed slow path."""
    with pytest.raises(ValueError):
        iso_reformat(bad)


def test_iso_reformat_accepts_leap_day():
    assert iso_reformat("2000-02-29T12:00:00Z") == "2000-02-29T12:00:00Z"


def test_iso_offset_normalized_to_utc():
    assert iso_reformat("2005-01-20T23:46:07+01:00") == "2005-01-20T22:46:07Z"


def test_iso_instant_datetime():
    assert (
        iso_instant(datetime(2020, 2, 29, 12, 0, 0, 1000, timezone.utc))
        == "2020-02-29T12:00:00.001Z"
    )


# --- escaping / serialization / parsing ----------------------------------

def test_escape_roundtrip():
    nasty = 'line1\nline2\t"quoted"\\back\rret\x01ctl'
    assert unescape_literal(escape_literal(nasty)) == nasty


def test_nquad_line_literal_with_datatype():
    t = Triple("info:fedora/a", "p:x", "2020-01-01T00:00:00Z", True,
               "http://www.w3.org/2001/XMLSchema#dateTime")
    assert nquad_line(t, "#ri") == (
        '<info:fedora/a> <p:x> "2020-01-01T00:00:00Z"'
        "^^<http://www.w3.org/2001/XMLSchema#dateTime> <#ri> ."
    )


def test_nquad_line_uri_object_no_graph():
    t = Triple("s:1", "p:1", "o:1", False)
    assert nquad_line(t, None) == "<s:1> <p:1> <o:1> ."


def test_parse_nt_line_roundtrip():
    t = Triple("s:1", "p:1", 'multi\nline "lit"', True)
    parsed = parse_nt_line(nquad_line(t, "#ri"))
    assert parsed == ("s:1", "p:1", 'multi\nline "lit"', True, None, None, "#ri")


def test_load_nt_set():
    text = '<s:1> <p:1> "x" .\n# comment\n\n<s:1> <p:1> <o:1> .'
    assert load_nt(text) == {
        ("s:1", "p:1", "x", True, None, None),
        ("s:1", "p:1", "o:1", False, None, None),
    }


# --- skolemization --------------------------------------------------------

def test_skolemize_deterministic_and_scoped():
    a = skolemize("pid:1|RELS-EXT", "anon1")
    assert a == skolemize("pid:1|RELS-EXT", "anon1")
    assert a != skolemize("pid:2|RELS-EXT", "anon1")
    assert a.startswith("urn:bnode:")

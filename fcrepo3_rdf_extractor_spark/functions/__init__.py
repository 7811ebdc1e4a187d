"""JVM-side column functions: N-Quads rendering, term escaping, subject
bucketing. All pure ``pyspark.sql.functions`` compositions — they stay
inside whole-stage codegen; no Python executes per row.

The N-Quads string column replaces the reference's Jena
``WriterStreamRDFPlain`` sink (`TripleDump.java:51-66`) with a
deterministic expression, so serialization parallelizes with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..vocab import XSD_STRING


# C0 controls without a dedicated ECHAR (everything below 0x20 except
# \t \n \r) — \uXXXX-escaped, byte-identical to terms.escape_literal
_CTRL_ESCAPES: list[tuple[str, str]] = [
    (chr(c), "\\u%04X" % c)
    for c in range(0x20)
    if chr(c) not in ("\t", "\n", "\r")
]


def escape_literal_col(col: Column) -> Column:
    """N-Triples ECHAR escaping as a replace chain (backslash first),
    plus \\uXXXX for the remaining C0 controls. The control chain sits
    behind a regexp guard so clean literals pay one scan, not 29."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    ctl = out
    for ch, esc in _CTRL_ESCAPES:
        ctl = F.replace(ctl, F.lit(ch), F.lit(esc))
    return F.when(col.rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), ctl).otherwise(out)


# IRIREF-illegal characters (N-Triples: controls, space, <>"{}|^`\) and
# their UCHAR escapes — byte-identical to terms.escape_uri. Backslash is
# listed FIRST so already-written escapes are never double-escaped.
_URI_ESCAPES: list[tuple[str, str]] = [("\\", "\\u005C")] + [
    (ch, "\\u%04X" % ord(ch))
    for ch in [chr(c) for c in range(0x21)] + list('<>"{}|^`')
]
# Java-regex test for "contains any IRIREF-illegal char" (guards the chain)
_URI_ILLEGAL_RX = "[\\x00-\\x20<>\"{}|^`\\\\]"


def escape_uri_col(col: Column) -> Column:
    """UCHAR-escape IRIREF-illegal characters, byte-identical to the
    pure-Python ``terms.escape_uri`` (equality is tested). A regexp guard
    keeps the common all-legal path to one scan; the 42-replace chain only
    evaluates for rows that actually carry an illegal character (Spark's
    ``when`` is lazy per row)."""
    escaped = col
    for ch, esc in _URI_ESCAPES:
        escaped = F.replace(escaped, F.lit(ch), F.lit(esc))
    return F.when(col.rlike(_URI_ILLEGAL_RX), escaped).otherwise(col)


def term_col(value: Column, is_literal: Column, datatype: Column, lang: Column) -> Column:
    uri = F.concat(F.lit("<"), escape_uri_col(value), F.lit(">"))
    lex = F.concat(F.lit('"'), escape_literal_col(value), F.lit('"'))
    lit = (
        F.when(lang.isNotNull(), F.concat(lex, F.lit("@"), lang))
        .when(
            datatype.isNotNull() & (datatype != F.lit(XSD_STRING)),
            F.concat(lex, F.lit("^^<"), escape_uri_col(datatype), F.lit(">")),
        )
        .otherwise(lex)
    )
    return F.when(is_literal, lit).otherwise(uri)


def nquad_line_col(
    subj: Column | str = "subj",
    pred: Column | str = "pred",
    obj_value: Column | str = "obj_value",
    obj_is_literal: Column | str = "obj_is_literal",
    obj_datatype: Column | str = "obj_datatype",
    obj_lang: Column | str = "obj_lang",
    graph: Column | str | None = "graph",
) -> Column:
    """One N-Quads line per triple row, byte-compatible with the
    pure-Python ``terms.nquad_line`` (tested for equality)."""
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    parts = [
        F.concat(F.lit("<"), escape_uri_col(c(subj)), F.lit(">")),
        F.lit(" "),
        F.concat(F.lit("<"), escape_uri_col(c(pred)), F.lit(">")),
        F.lit(" "),
        term_col(c(obj_value), c(obj_is_literal), c(obj_datatype), c(obj_lang)),
    ]
    if graph is not None:
        parts += [F.lit(" "), F.concat(F.lit("<"), escape_uri_col(c(graph)), F.lit(">"))]
    parts += [F.lit(" .")]
    return F.concat(*parts)


def subject_bucket(subj: Column | str = "subj", num_buckets: int = 256) -> Column:
    """Hash-bucket by subject — the Spark analog of the reference
    deployment's MD5 hash-path sharding (`HashPathIdMapper.java:118-160`):
    co-locates all triples of one entity, spreads entities uniformly."""
    col = F.col(subj) if isinstance(subj, str) else subj
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")

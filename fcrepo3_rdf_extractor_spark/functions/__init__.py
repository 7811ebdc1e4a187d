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


def escape_literal_col(col: Column) -> Column:
    """N-Triples ECHAR escaping as a replace chain (backslash first)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def term_col(value: Column, is_literal: Column, datatype: Column, lang: Column) -> Column:
    uri = F.concat(F.lit("<"), value, F.lit(">"))
    lex = F.concat(F.lit('"'), escape_literal_col(value), F.lit('"'))
    lit = (
        F.when(lang.isNotNull(), F.concat(lex, F.lit("@"), lang))
        .when(
            datatype.isNotNull() & (datatype != F.lit(XSD_STRING)),
            F.concat(lex, F.lit("^^<"), datatype, F.lit(">")),
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
        F.concat(F.lit("<"), c(subj), F.lit(">")),
        F.lit(" "),
        F.concat(F.lit("<"), c(pred), F.lit(">")),
        F.lit(" "),
        term_col(c(obj_value), c(obj_is_literal), c(obj_datatype), c(obj_lang)),
    ]
    if graph is not None:
        parts += [F.lit(" "), F.concat(F.lit("<"), c(graph), F.lit(">"))]
    parts += [F.lit(" .")]
    return F.concat(*parts)


def subject_bucket(subj: Column | str = "subj", num_buckets: int = 256) -> Column:
    """Hash-bucket by subject — the Spark analog of the reference
    deployment's MD5 hash-path sharding (`HashPathIdMapper.java:118-160`):
    co-locates all triples of one entity, spreads entities uniformly."""
    col = F.col(subj) if isinstance(subj, str) else subj
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")

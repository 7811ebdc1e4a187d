"""Declarative tail of the extraction plan: graph assignment and the
empty-literal filter. Pure column expressions — Catalyst folds these into
the same whole-stage-codegen span as the post-UDF projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vocab import DEFAULT_GRAPH


def with_graph(df: DataFrame, graph: str = DEFAULT_GRAPH) -> DataFrame:
    """P8 (`SingleGraphStreamRDF.java:56-64`): every triple is homed into
    one named graph; rows already carrying a graph are re-homed."""
    return df.withColumn("graph", F.lit(graph))


def skip_empty_literals(df: DataFrame) -> DataFrame:
    """F1 (`SkipEmptyLiteralsStreamRDF.java:53-68`): drop rows whose
    object is an empty-string literal; URIs and non-empty literals pass.
    Error rows (subj IS NULL) also pass — the filter concerns terms only."""
    return df.filter(
        F.col("subj").isNull()
        | ~(F.col("obj_is_literal") & (F.col("obj_value") == F.lit("")))
    )


def select_objects(df: DataFrame, paths: list[str]) -> DataFrame:
    """S1's explicit-URI mode (`Extract.java:138-139`): restrict the scan
    to named objects. An IN-list predicate pushes down to the parquet
    scan; for very large lists, join a broadcast keys table instead."""
    if len(paths) > 1000:
        spark = df.sparkSession
        keys = spark.createDataFrame([(p,) for p in paths], ["path"])
        return df.join(F.broadcast(keys), "path", "left_semi")
    return df.filter(F.col("path").isin(paths))

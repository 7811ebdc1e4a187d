"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-extraction pipeline end-to-end on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
(see SURVEY.md §2 and fcrepo3_rdf_extractor_spark/queries.py) for the
driver's DuckDB cross-check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize a FOXML blob table from sf0.001 orders, run the
    full extraction plan (parse -> triples -> graph -> skip-empty ->
    dedup), return the triples DataFrame."""
    from fcrepo3_rdf_extractor_spark.operators.extractor import triples_only
    from fcrepo3_rdf_extractor_spark.plans.pipeline import ExtractConfig, extract_plan
    from fcrepo3_rdf_extractor_spark.sources.source_table import (
        synthesize_foxml_from_orders,
    )

    source = synthesize_foxml_from_orders(spark, "/root/testdata/sf0.001")
    out = extract_plan(source, ExtractConfig(skip_empty=True, dedup=True))
    return triples_only(out).select(
        "graph", "subj", "pred", "obj_value", "obj_is_literal", "obj_datatype",
        "repo", "path", "commit", "content_sha256",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fcrepo3_rdf_extractor_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from fcrepo3_rdf_extractor_spark import queries as q

    return q.oracle_sql()

"""Exact triple deduplication — salted, skew-aware.

The reference never dedups (its consumers apply set semantics downstream;
the IT compares graphs set-wise, `SidoraExamplesIT.java:105`), but the
north rule makes dedup a first-class operator here.

Skew story: the dedup key includes the object term, so ubiquitous triples
like ``<obj> hasModel FedoraObject-3.0`` (every object emits one,
`ObjectProcessor.java:244`) hash to DIFFERENT keys per subject and are
not themselves skewed. True skew appears when the *same full triple* is
repeated massively across source rows (e.g. re-crawled objects). The
defense is two-phase aggregation: a partition-local dedup first (map-side
combine — Spark's HashAggregate partial mode), then the shuffle dedup,
with an optional explicit salt stage for pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["graph", "subj", "pred", "obj_value", "obj_is_literal", "obj_datatype", "obj_lang"]


def dedup_exact(df: DataFrame, key: list[str] | None = None) -> DataFrame:
    """Distinct triples, keeping one lineage witness per triple
    (min(path) — deterministic, unlike first()).

    Physically: partial HashAggregate on each mapper (absorbs hot
    duplicates before the shuffle) -> exchange on hash(key) -> final
    HashAggregate. AQE coalesces/splits post-shuffle partitions.
    """
    key = key or [c for c in TRIPLE_KEY if c in df.columns]
    passthrough = [c for c in df.columns if c not in key]
    aggs = [F.min(c).alias(c) for c in passthrough]
    if not aggs:
        return df.dropDuplicates(key)
    return df.groupBy(*key).agg(*aggs).select(*df.columns)


def dedup_exact_salted(df: DataFrame, key: list[str] | None = None, salt_buckets: int = 16) -> DataFrame:
    """Explicit two-round salted dedup for adversarial skew: round 1
    dedups within (key, salt) groups — salt derived from the lineage so
    identical triples from different source rows spread over
    ``salt_buckets`` reducers — round 2 merges the survivors (at most
    ``salt_buckets`` rows per hot key) on the unsalted key.

    Use when a single triple can repeat billions of times; otherwise
    ``dedup_exact``'s partial aggregation is already sufficient and one
    shuffle cheaper.
    """
    key = key or [c for c in TRIPLE_KEY if c in df.columns]
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]), F.lit(salt_buckets))
    )
    round1 = dedup_exact(salted, key=key + ["_salt"])
    return dedup_exact(round1.drop("_salt"), key=key)

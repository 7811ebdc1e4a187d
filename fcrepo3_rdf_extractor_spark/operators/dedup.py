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
    """Distinct triples, keeping one *consistent* witness row per key:
    the lexicographic min of the passthrough columns as a struct —
    deterministic (unlike first()) and never a frankenrow (independent
    per-column mins could pair one doc's path with another doc's
    sha256, breaking the lineage invariant).

    Physically: partial aggregate on each mapper (absorbs hot
    duplicates before the shuffle) -> exchange on hash(key) -> final
    aggregate. String-typed agg buffers make this a SortAggregate pair
    rather than HashAggregate (Spark hash-aggregates only fixed-width
    buffers); the partial phase still collapses duplicates map-side, so
    the shuffle carries one row per (partition, key). AQE
    coalesces/splits post-shuffle partitions.
    """
    key = key or [c for c in TRIPLE_KEY if c in df.columns]
    passthrough = [c for c in df.columns if c not in key]
    if not passthrough:
        # no witness needed: plain distinct keeps HashAggregate (empty
        # agg buffer is fixed-width)
        return df.dropDuplicates(key)
    witness = F.min(F.struct(*passthrough)).alias("_w")
    return (
        df.groupBy(*key)
        .agg(witness)
        .select(*key, *[F.col("_w")[c].alias(c) for c in passthrough])
        .select(*df.columns)
    )


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

"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partition-split and not reproducible
across cluster layouts or retries; training-data curation needs sampling
that is a PURE FUNCTION of the row key — the same document is kept or
dropped regardless of partitioning, task retries, cluster size, or the
order other rows arrive in. The standard trick: hash the key, keep rows
whose hash falls under a rate threshold.

Portability note: the keep-decision compares the first 8 hex chars of
md5(key) against a fixed-width lowercase hex threshold STRING —
lexicographic order on fixed-width lowercase hex equals numeric order, so
any engine with md5() reproduces the exact sample (the DuckDB oracles
restate it verbatim; no integer-conversion dialect differences).

``stratified_sample`` applies a per-stratum rate via a broadcast rates
dimension — the data-mixing knob of corpus curation ("keep 100% of
wikipedia, 3% of commoncrawl"): a broadcast hash join against a
rates table that is vocabulary-sized, never a shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_slot(key: Column) -> Column:
    """First 8 hex chars of md5(key): a uniform 32-bit slot, as a string."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def rate_threshold(rate: float) -> str:
    """The 8-hex-digit threshold string for a keep-rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * 16**8), 16**8 - 1), "08x") if rate < 1.0 else "g" * 8
    # 'gggggggg' sorts after every hex digit -> keep everything at rate 1.0


def deterministic_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, decided purely by ``md5(key)`` — stable
    under repartitioning, retries, and engine choice. Uses a narrow
    filter, so it pushes below projections and costs one hash per row."""
    return df.filter(_hash_slot(F.col(key_col)) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: rows in stratum ``s`` keep at
    ``rates.get(s, default_rate)``. The rates dict becomes a broadcast
    dimension (strata are few; the corpus never shuffles)."""
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(k, rate_threshold(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, _threshold string",
    )
    joined = df.join(F.broadcast(rates_df), strata_col, "left")
    thr = F.coalesce(F.col("_threshold"), F.lit(rate_threshold(default_rate)))
    return joined.filter(_hash_slot(F.col(key_col)) < thr).drop("_threshold")

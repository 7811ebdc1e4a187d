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


def pack_shards(
    df: DataFrame,
    weight_col: str,
    budget: int,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign rows to fixed-budget shards: shard k holds the rows whose
    running ``weight_col`` total (in deterministic ``order_col`` order)
    falls in ``[k*budget, (k+1)*budget)`` — how training corpora are cut
    into ~equal-token files. Adds (cum_weight, shard) columns.

    The global running sum is the classic two-level distributed prefix
    sum: a naive ``Window.orderBy(order_col)`` has ONE unbounded
    partition — a single-task serial pass at 100 TB. Instead:
    range-partition by ``order_col``, local cumsum per partition (each
    partition is an independent window), then add per-partition offsets.
    The offsets are one row per partition — the only driver-side data —
    broadcast back as a join. Result is a pure function of the data
    (partition boundaries cancel out of the final sums)."""
    from pyspark.sql import Window

    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, order_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    # local prefix sums: window partitioned by the physical partition id,
    # so no single-reducer global sort
    w = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = ranged.withColumn("_local_cum", F.sum(weight_col).over(w)).persist()
    # per-partition totals -> exclusive offsets (tiny: one row/partition)
    totals = (
        local.groupBy("_pid").agg(F.max("_local_cum").alias("_total"))
        .orderBy("_pid")
        .collect()
    )
    offsets, running = {}, 0
    for r in totals:
        offsets[r["_pid"]] = running
        running += r["_total"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in sorted(offsets.items())],
            "_pid int, _offset long",
        )
    )
    out = (
        local.join(off_df, "_pid")
        .withColumn("cum_weight", (F.col("_local_cum") + F.col("_offset")).cast("long"))
        .withColumn(
            "shard",
            F.floor((F.col("cum_weight") - F.col(weight_col)) / budget).cast("long"),
        )
        .drop("_pid", "_local_cum", "_offset")
    )
    return out


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

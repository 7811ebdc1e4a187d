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
    sample_rate: float | None = None,
) -> DataFrame:
    """Assign rows to fixed-budget shards: shard k holds the rows whose
    running ``weight_col`` total (in deterministic ``order_col`` order)
    falls in ``[k*budget, (k+1)*budget)`` — how training corpora are cut
    into ~equal-token files. Adds (cum_weight, shard) columns.

    The global running sum is the classic two-level distributed prefix
    sum: a naive ``Window.orderBy(order_col)`` has ONE unbounded
    partition — a single-task serial pass at 100 TB. Instead rows are
    bucketed into key RANGES, each bucket runs an independent local
    cumsum window, and per-bucket exclusive offsets (a ``num_partitions``-
    row aggregate) are broadcast back.

    The bucket is a PURE FUNCTION of ``order_col``: range boundaries are
    derived from an md5-threshold key sample (itself a pure function of
    the keys — stable under retries, partitioning, and cluster layout)
    and baked into the plan as literals. This is what makes the whole
    result ONE deterministic lazy plan: the offsets branch and the
    cumsum branch can never disagree about bucket membership, unlike a
    ``repartitionByRange + spark_partition_id`` formulation, where each
    physical evaluation samples its own boundaries — a cache-evicted
    recompute there silently corrupts cum_weight. No persist, no cache
    to leak; the offsets branch costs one extra (column-pruned) scan of
    the input plus a ``num_partitions``-row shuffle — callers looping
    over an expensive upstream may persist ``df`` themselves.

    Driver-side data: the boundary sample (~50 keys per bucket) and
    nothing else. Bucket lookup is O(num_partitions) comparisons per
    row (vectorized array filter); beyond ~10^4 buckets switch the
    lookup to a broadcast range join.

    ``sample_rate`` overrides the boundary-sample rate (default targets
    ~50 keys per bucket via one count() of ``df``)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    if sample_rate is None:
        n = df.count()
        sample_rate = min(1.0, (50.0 * n_parts) / max(n, 1))
    sample = sorted(
        r[0]
        for r in deterministic_sample(
            df.select(order_col), order_col, sample_rate
        ).collect()
    )
    step = len(sample) / n_parts
    bounds = sorted({sample[int(i * step)] for i in range(1, n_parts)}) if sample else []

    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b <= F.col(order_col)))
    else:
        bucket = F.lit(0)
    staged = df.withColumn("_b", bucket)
    w = Window.partitionBy("_b").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = staged.withColumn("_local_cum", F.sum(weight_col).over(w))
    # per-bucket totals -> exclusive offsets: a tiny aggregate (one row
    # per bucket), running-summed on a single-partition window (fine at
    # that size) and broadcast back — all inside the same lazy plan
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        staged.groupBy("_b").agg(F.sum(weight_col).alias("_total"))
        .withColumn(
            "_offset", F.coalesce(F.sum("_total").over(w_off), F.lit(0)).cast("long")
        )
        .select("_b", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn("cum_weight", (F.col("_local_cum") + F.col("_offset")).cast("long"))
        .withColumn(
            "shard",
            F.floor((F.col("cum_weight") - F.col(weight_col)) / budget).cast("long"),
        )
        .drop("_b", "_local_cum", "_offset")
    )


def sequence_pack(
    df: DataFrame,
    weight_col: str,
    ctx_len: int,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
    sample_rate: float | None = None,
) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate every
    document (in deterministic ``order_col`` order) into one token
    stream and cut it every ``ctx_len`` tokens — the layout pretraining
    loaders feed the model. Rather than materializing the stream, emit
    per-document placement columns, from which a loader can assemble
    any sequence independently:

    - ``start_token``  — global offset of the doc's first token
    - ``seq_first`` / ``seq_last`` — first/last context window the doc
      lands in (a doc crossing k boundaries spans k+1 windows)
    - ``offset_in_seq`` — position of the doc's first token inside
      ``seq_first``
    - ``n_splits``     — boundary crossings (0 = doc fits one window)

    All of it is pure column arithmetic over :func:`pack_shards`'s
    distributed prefix sum, so the scale story is identical: range-
    bucketed local cumsums + a broadcast offsets table, ONE lazy
    deterministic plan, no single-task global window. Zero-weight rows
    (empty docs) pin ``seq_last`` to ``seq_first`` instead of
    underflowing the end-token arithmetic."""
    packed = pack_shards(
        df, weight_col, budget=ctx_len, order_col=order_col,
        num_partitions=num_partitions, sample_rate=sample_rate,
    )
    start = F.col("cum_weight") - F.col(weight_col)
    seq_first = F.floor(start / ctx_len).cast("long")
    seq_last = F.greatest(
        F.floor((F.col("cum_weight") - 1) / ctx_len).cast("long"), seq_first
    )
    return (
        packed
        .withColumn("start_token", start.cast("long"))
        .withColumn("seq_first", seq_first)
        .withColumn("seq_last", seq_last)
        .withColumn("offset_in_seq", (start % ctx_len).cast("long"))
        .withColumn("n_splits", (seq_last - seq_first).cast("long"))
        .drop("shard", "cum_weight")
    )


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


def source_quota(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    n_max: int,
) -> DataFrame:
    """Exact per-stratum quota: keep AT MOST ``n_max`` rows per
    ``strata_col``, chosen deterministically by md5 rank of ``key_col``
    — the C4/RefinedWeb "per-domain cap" that stops one giant host from
    dominating the corpus. Unlike :func:`stratified_sample` (a RATE,
    binomially distributed around the target), the cap is exact: a
    stratum with more than ``n_max`` rows contributes exactly
    ``n_max``; one with fewer keeps everything. The keep-set is a pure
    function of the keys (same rows survive under any partitioning,
    retry, or engine).

    Scale shape: the naive form is ``row_number() OVER (PARTITION BY
    strata ORDER BY md5)`` — one window partition per stratum, so a
    hot domain (10^8 docs behind one host) serializes onto one task.
    Here rank is split two-level, the same discipline as
    :func:`pack_shards`:

    - rows bucket by the first 2 hex chars of their md5 slot (256
      buckets, a pure function of the key, refined by the full slot's
      sort order);
    - per-(stratum, bucket) counts -> exclusive per-bucket offsets via
      a window over the COUNTS table (partitions are <= 256 rows by
      construction — skew-immune);
    - each row ranks only within its own bucket (window partition
      ~1/256 of the stratum) and its global rank is ``bucket_offset +
      rank_in_bucket``; keep iff that is <= ``n_max``.

    One extra column-pruned scan for the counts branch (same trade as
    ``pack_shards``' offsets branch); the counts table is
    ``n_strata x 256`` rows — the optimizer broadcasts it while small
    and shuffle-joins it when the domain universe is itself huge."""
    from pyspark.sql import Window

    slot = _hash_slot(F.col(key_col))
    staged = df.withColumn("_slot", slot).withColumn(
        "_b", F.substring("_slot", 1, 2)
    )
    counts = staged.groupBy(strata_col, "_b").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy(strata_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_before", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("long")
    ).select(strata_col, "_b", "_before")
    w_rank = Window.partitionBy(strata_col, "_b").orderBy("_slot", key_col)
    return (
        staged.join(offsets, [strata_col, "_b"])
        .withColumn("_r", F.row_number().over(w_rank))
        .filter(F.col("_before") + F.col("_r") <= n_max)
        .drop("_slot", "_b", "_before", "_r")
    )


def mixture_rates(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    budget: float,
    shares: dict[str, float] | None = None,
) -> DataFrame:
    """Solve the data-mixing knob: per-stratum keep rates such that
    stratum ``s`` contributes ``budget * share_s`` of ``weight_col``
    (tokens, usually) in expectation — ``rate_s = min(1,
    budget*share_s / weight_s)``. ``shares=None`` means uniform across
    the observed strata. Feed the result into :func:`stratified_sample`.

    One aggregation over the corpus (map-side combine; strata are few),
    then strata-sized arithmetic over the localCheckpoint-ed aggregate
    (it is referenced twice — once per crossJoin branch — and an
    un-materialized lineage would re-run the corpus aggregation per
    branch, the filter/union double-evaluation class); the solved rates
    are exact closed forms — no iteration.

    A stratum observed in the data but ABSENT from an explicit
    ``shares`` dict comes back with ``rate`` 0.0 and its weight listed —
    never silently dropped (a dropped row would fall through to the
    caller's ``default_rate`` in :func:`stratified_sample`, typically
    blowing the budget by the whole stratum). The converse — a share
    keyed to a stratum absent from the DATA — leaves that share of the
    budget unspent by design (there is nothing to sample from); callers
    wanting the full budget should re-solve over observed strata.
    Explicit shares must be non-negative and sum to at most 1.0
    (validated up front: an overshooting dict would silently exceed the
    token budget by ``sum(shares)``x)."""
    if shares is not None:
        if any(v < 0 for v in shares.values()):
            raise ValueError("mixture shares must be non-negative")
        total = sum(shares.values())
        if total > 1.0 + 1e-9:
            raise ValueError(
                f"mixture shares sum to {total:.6f} > 1.0 — this would "
                "overshoot the budget; rescale the dict or drop strata"
            )
    agg = df.groupBy(strata_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("stratum_weight")
    ).localCheckpoint()
    if shares is None:
        n = agg.agg(F.count("*").alias("_n"))
        with_share = agg.crossJoin(F.broadcast(n)).withColumn(
            "_share", F.lit(1.0) / F.col("_n")
        )
    else:
        spark = df.sparkSession
        shares_df = spark.createDataFrame(
            [(k, float(v)) for k, v in sorted(shares.items())],
            f"{strata_col} string, _share double",
        )
        with_share = agg.join(F.broadcast(shares_df), strata_col, "left").fillna(
            {"_share": 0.0}
        )
    return with_share.select(
        strata_col,
        "stratum_weight",
        F.round(
            F.least(
                F.lit(1.0),
                (F.lit(float(budget)) * F.col("_share"))
                / F.greatest(F.col("stratum_weight"), F.lit(1)),
            ),
            6,
        ).alias("rate"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    test_rate: float = 0.1,
    salt: str = "split",
    algorithm: str = "propagation",
) -> DataFrame:
    """Near-dup-aware train/test split: the unit of assignment is the
    DUPLICATE CLUSTER, not the document. Two near-duplicate documents
    landing on opposite sides of a train/eval split is contamination by
    construction — the eval document is "memorized" through its twin —
    and a per-document hash split does exactly that to every split
    near-dup pair. Here the near-dup pair graph is clustered first
    (:func:`..graph.dedup_clusters`; singletons are their own cluster)
    and the side is a pure function of ``md5(salt|cluster_id)``, so
    (a) no pair ever straddles the split and (b) the assignment is
    deterministic across partitionings, retries, and engines — the same
    fixed-width-hex threshold trick as :func:`deterministic_sample`.

    Returns (doc_id, cluster_id, split) for EVERY document, split in
    {'train', 'test'} with ~``test_rate`` of clusters on the test side.

    Stability caveat (documented, inherent): cluster_id is the min
    doc_id reachable in the pair graph, so a LATER corpus wave that
    bridges two clusters merges their ids and the merged cluster
    re-draws its side. That is the correct behavior — the bridge is
    evidence the two groups were one near-dup family, and keeping their
    old opposite sides would be exactly the leak this operator exists
    to prevent.

    Scale shape: clustering is the bounded driver-loop-over-distributed-
    steps documented in graph.py (pick ``algorithm='star'`` above ~10^4
    edges); the split itself adds one md5 projection — no shuffle beyond
    the clustering's own."""
    from .graph import dedup_clusters

    clusters = dedup_clusters(pairs, docs, algorithm=algorithm).select(
        "doc_id", "cluster_id"
    )
    slot = _hash_slot(
        F.concat(F.lit(salt), F.lit("|"), F.col("cluster_id").cast("string"))
    )
    side = F.when(
        slot < F.lit(rate_threshold(test_rate)), F.lit("test")
    ).otherwise(F.lit("train"))
    return clusters.select("doc_id", "cluster_id", side.alias("split"))


def shuffle_rank(
    df: DataFrame,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus-wide training order: every row gets a dense
    0-based ``shuffle_rank`` equal to its position when the corpus is
    sorted by (md5(key), key) — the reproducible global shuffle a
    pretraining loader consumes (feed documents in rank order and every
    re-run, engine, and partitioning sees the same sequence; compose
    with :func:`sequence_pack` ordered by this rank for shuffled
    context-window placement). md5 order is uncorrelated with crawl
    order, source, and length — the properties an unshuffled corpus
    violates.

    Scale shape: the naive ``row_number() OVER (ORDER BY md5)`` is ONE
    global window partition — a single task sorts the corpus. Rank here
    is two-level, the :func:`source_quota` discipline with a corpus-
    wide stratum: 256 md5-prefix buckets, exclusive offsets from a
    window over the 256-row counts table, in-bucket row_number whose
    window partitions hold ~1/256 of the corpus each. Equality with the
    naive global rank is pytest-enforced."""
    from pyspark.sql import Window

    slot = _hash_slot(F.col(key_col))
    staged = df.withColumn("_slot", slot).withColumn(
        "_b", F.substring("_slot", 1, 2)
    )
    counts = staged.groupBy("_b").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_before", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("long")
    ).select("_b", "_before")
    w_rank = Window.partitionBy("_b").orderBy("_slot", key_col)
    return (
        staged.join(F.broadcast(offsets), "_b")
        .withColumn(
            "shuffle_rank",
            (F.col("_before") + F.row_number().over(w_rank) - 1).cast("long"),
        )
        .drop("_slot", "_b", "_before")
    )

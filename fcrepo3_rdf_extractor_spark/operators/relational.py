"""Relational operators Spark lacks natively, composed from built-ins.

``asof_join``: for each left row, attach the right row with the greatest
``on`` <= left.``on`` within the same ``by`` group — the classic
time-series as-of join. Implemented as union + sort + carry-forward
(``last(..., ignorenulls=True)`` over an unbounded-preceding window)
rather than a range join: a range-condition join explodes to
O(|L|x|R|) pairs per key before filtering, while the union form is one
shuffle on ``by`` and a linear pass per partition — the only scalable
shape at 10^9+ rows per side. Skewed ``by`` keys serialize onto one
window partition; ``asof_join_skewed`` is the pre-split variant that
sub-buckets each key by time range and stitches bucket boundaries with
a two-level carry (the segmented-scan pattern, same family as
pack_shards' distributed prefix sum).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_values: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row
    within the ``by`` group; right value columns arrive suffixed, NULL
    when no qualifying right row exists.

    ``direction``: "backward" (default) matches the latest right row
    at-or-before the left row (DuckDB/kdb ``<=`` semantics); "forward"
    matches the earliest right row at-or-after it (``>=``). Both are
    the same one-shuffle union + linear carry pass — forward just runs
    the window the other way (first over [current, following]).

    ``tolerance``: maximum |left.on - right.on| for a match (pandas
    merge_asof semantics: nearest first, then the gap test — a nearer
    but out-of-tolerance right row does NOT fall through to an older
    in-tolerance one). In SECONDS for timestamp columns, plain
    difference for numerics (both compare via a double cast). Applied
    as a codegen predicate on the carried match; no extra shuffle.

    Ties (right.on == left.on) match in both directions. The right
    row's values travel as ONE struct, so the match is always a single
    consistent right row even when some of its columns are NULL
    (independent per-column carry-forward could stitch values from
    different rows). Among right rows sharing (by, on), the
    struct-greatest wins backward and the struct-least forward,
    deterministically; pre-aggregate the right side if that tiebreak is
    not the one you want.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    unioned = _asof_union(left, right, on, by, right_values)

    if direction == "backward":
        # right rows sort before left rows at equal `on` so <= ties
        # match; struct order makes same-instant right rows deterministic
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_src").asc(), F.col("_rv").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("_rv", ignorenulls=True).over(w)
    else:
        # right rows sort after left rows at equal `on` so >= ties match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_src").desc(), F.col("_rv").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("_rv", ignorenulls=True).over(w)
    carried = unioned.select(
        *lcols, "_src",
        match.alias("_rv"),
    )
    rv = F.col("_rv")
    if tolerance is not None:
        # TIMESTAMP_NTZ refuses a direct double cast under ANSI; route
        # timestamps through TIMESTAMP first (epoch seconds, fractional
        # micros preserved; the session pins UTC so ntz reinterpretation
        # is identity)
        def _num(c):
            if isinstance(
                left.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)
            ):
                return c.cast("timestamp").cast("double")
            return c.cast("double")

        gap = F.abs(_num(F.col(on)) - _num(F.col("_rv")["__on"]))
        rv = F.when(gap <= F.lit(float(tolerance)), F.col("_rv"))
    return (
        carried.filter(F.col("_src") == 1)
        .select(
            *lcols,
            *[rv[c].alias(c + suffix) for c in right_values],
        )
    )


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_values: list[str],
) -> DataFrame:
    """The tagged union both as-of variants sort: left rows carry their
    columns + a NULL right-value struct + _src=1; right rows carry only
    (by, on) + their values as ONE struct + _src=0 (a whole-struct match
    can never stitch values from different right rows). The struct's
    first field is the right row's own ``on`` value (``__on``) — the
    tolerance predicate needs the matched instant, and leading with it
    changes no tiebreak (rows equal on (on, _src) have equal __on, so
    comparison falls through to the value fields as before)."""
    if "__on" in right_values:
        raise ValueError("right_values may not contain the reserved '__on'")
    lcols = left.columns
    rv_type = T.StructType([
        T.StructField("__on", right.schema[on].dataType),
        *[T.StructField(c, right.schema[c].dataType) for c in right_values],
    ])
    l_tagged = left.select(
        *lcols,
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(1).alias("_src"),
    )
    # a NULL `on` can never satisfy "greatest right.on <= left.on"
    # (ASOF semantics; DuckDB's v.ts <= c.ts never matches NULL) — but
    # nulls-first ascending ordering would carry such rows forward as
    # spurious matches for left rows with no genuine prior right row
    right = right.filter(F.col(on).isNotNull())
    r_tagged = right.select(
        *[
            F.col(c) if c in (by + [on])
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.struct(F.col(on).alias("__on"), *right_values).alias("_rv"),
        F.lit(0).alias("_src"),
    )
    return l_tagged.unionByName(r_tagged)


def asof_join_skewed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_values: list[str],
    suffix: str = "_asof",
    granularity_sec: int = 3600,
) -> DataFrame:
    """:func:`asof_join` with HOT-KEY PRE-SPLIT: identical output, but
    no single window partition ever holds a whole ``by`` group. The
    plain form partitions the carry-forward window by ``by`` alone, so
    one pathological key (half the corpus on one user/device/tenant —
    the shape real event logs have) serializes onto one task and no
    amount of executors helps. This variant is the operator the plain
    form's docstring used to hand-wave ("pre-split hot keys upstream"):

    1. every row lands in a (by, time-bucket) cell
       (``floor(unix_ts(on) / granularity_sec)``), and the carry-forward
       window partitions by (by, _bucket) — partition size is bounded by
       the bucket's row count, never the key's
    2. per (by, bucket), the LAST right row rides one partial-agg
       ``max(struct(on, _rv))`` — the same (on, _rv) total order the
       window uses, so the witness is a consistent single row
    3. the carry-IN for each bucket is a second, bucket-GRANULAR
       carry-forward over the per-bucket summaries (rows = distinct
       (by, bucket) cells — metadata-sized relative to the corpus), with
       ``rowsBetween(unboundedPreceding, -1)`` so a bucket never sees
       its own summary
    4. a left row's match = its intra-bucket carry, else the bucket's
       carry-in (struct-level coalesce — never per-column, which could
       stitch two right rows).

    This is the segmented-scan / two-level-prefix pattern (pack_shards'
    shape applied to LAST instead of SUM). Equality with plain
    asof_join is pytest-enforced on a synthesized hot key; pick
    ``granularity_sec`` near the hot key's event spacing x desired
    partition size. ``on`` must be a timestamp column."""
    lcols = left.columns
    g = granularity_sec
    unioned = _asof_union(left, right, on, by, right_values).withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(on)) / g)
    )
    w_in = (
        Window.partitionBy(*by, "_bucket")
        .orderBy(F.col(on).asc(), F.col("_src").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols, "_src", "_bucket",
        F.last("_rv", ignorenulls=True).over(w_in).alias("_rv"),
    )
    bucket_last = (
        unioned.filter(F.col("_src") == 0)
        .groupBy(*by, "_bucket")
        .agg(
            F.max(
                F.struct(F.col(on).alias("o"), F.col("_rv").alias("rv"))
            ).alias("_bl")
        )
    )
    universe = unioned.select(*by, "_bucket").distinct()
    w_carry = (
        Window.partitionBy(*by)
        .orderBy(F.col("_bucket").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = universe.join(bucket_last, by + ["_bucket"], "left").select(
        *by, "_bucket",
        F.last("_bl", ignorenulls=True).over(w_carry).alias("_ci"),
    )
    best = F.when(F.col("_rv").isNotNull(), F.col("_rv")).otherwise(
        F.col("_ci.rv")
    )
    return (
        carried.filter(F.col("_src") == 1)
        .join(carry_in, by + ["_bucket"], "left")
        .select(
            *lcols,
            *[best[c].alias(c + suffix) for c in right_values],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    start: str,
    end: str,
    by: list[str] | None = None,
    granularity_sec: int = 3600,
) -> DataFrame:
    """Interval (range) join: each left row matched to every right
    interval with ``start <= left.on < end`` (half-open), optionally
    within the same ``by`` group.

    A theta join on the range condition cannot hash-partition and plans
    BroadcastNestedLoopJoin — O(|L|x|R|) compares (pinned against in
    tests/test_plans.py). Instead each interval EXPLODES into the
    ``granularity_sec`` time buckets it covers, the join is an equi-join
    on (by..., bucket) — a left row lives in exactly one bucket, so the
    explosion duplicates intervals, never matches — and the exact range
    predicate filters after. Pick the granularity near the typical
    interval length: per-interval blowup is len/granularity + 1, and at
    scale the bucket key spreads the shuffle uniformly over time.
    """
    by = by or []
    g = granularity_sec
    l_bucket = F.floor(F.unix_timestamp(F.col(on)) / g)
    r_buckets = F.sequence(
        F.floor(F.unix_timestamp(F.col(start)) / g),
        F.floor(F.unix_timestamp(F.col(end)) / g),
    )
    # explicit side aliases: when both sides derive from the same parent
    # DataFrame (a self-range-join), dataset-id disambiguation of
    # l_tagged[c] == r_tagged[c] resolves correctly but emits Spark's
    # "trivially true equals predicate" warning and is fragile under
    # plan rewrites — alias-qualified references are unambiguous
    l_tagged = left.withColumn("_bucket", l_bucket).alias("_rj_l")
    r_tagged = right.withColumn("_bucket", F.explode(r_buckets)).alias("_rj_r")
    lcol = lambda c: F.col(f"_rj_l.{c}")  # noqa: E731
    rcol = lambda c: F.col(f"_rj_r.{c}")  # noqa: E731
    cond = [lcol("_bucket") == rcol("_bucket")] + [lcol(c) == rcol(c) for c in by]
    joined = l_tagged.join(r_tagged, functools.reduce(lambda a, b: a & b, cond)).filter(
        (lcol(on) >= rcol(start)) & (lcol(on) < rcol(end))
    )
    keep = [lcol(c) for c in left.columns] + [
        rcol(c) for c in right.columns if c not in by
    ]
    return joined.select(*keep)


def grouped_trend(
    left: DataFrame,
    by: str,
    ts_col: str,
    value_col: str,
    unit_sec: float = 86400.0,
) -> DataFrame:
    """Per-group least-squares trend slope (value per ``unit_sec``, days
    by default) — the grouped-map (``applyInPandas``) surface: a
    whole-group vectorized computation that per-row column expressions
    can't express cleanly. Each group arrives as one pandas DataFrame;
    the x axis is centered on the group's first timestamp so the
    regression arithmetic stays well-conditioned (raw epoch seconds are
    ~1.7e9 and would cancel catastrophically). Groups with zero time
    variance yield a NULL slope — the same contract as SQL's
    ``regr_slope`` (the DuckDB oracle).

    Skew note: one Python worker handles one group at a time; a
    pathologically hot group key serializes onto one task, which is
    inherent to grouped-map semantics — pre-aggregate or sub-bucket such
    keys upstream."""
    import pandas as pd

    by_type = left.schema[by].dataType.simpleString()

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        # regr_slope semantics: a pair with a NULL on EITHER side is
        # excluded from BOTH statistics (pandas skipna would mix
        # all-row x-stats with non-null-row covariance — wrong slope)
        sub = pdf[pdf[value_col].notna() & pdf[ts_col].notna()]
        x = (sub[ts_col] - sub[ts_col].min()).dt.total_seconds() / unit_sec
        y = sub[value_col].astype("float64")
        xc, yc = x - x.mean(), y - y.mean()
        vx = float((xc * xc).sum()) if len(sub) else 0.0
        s = round(float((xc * yc).sum() / vx), 6) if vx > 0 else None
        return pd.DataFrame(
            [[pdf[by].iloc[0], s, len(pdf)]], columns=[by, "slope", "n"]
        )

    return left.groupBy(by).applyInPandas(
        slope, f"{by} {by_type}, slope double, n long"
    )

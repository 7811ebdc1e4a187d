"""Relational operators Spark lacks natively, composed from built-ins.

``asof_join``: for each left row, attach the right row with the greatest
``on`` <= left.``on`` within the same ``by`` group — the classic
time-series as-of join. Implemented as union + sort + carry-forward
(``last(..., ignorenulls=True)`` over an unbounded-preceding window)
rather than a range join: a range-condition join explodes to
O(|L|x|R|) pairs per key before filtering, while the union form is one
shuffle on ``by`` and a linear pass per partition — the only scalable
shape at 10^9+ rows per side. Skewed ``by`` keys are AQE's problem
(single window partition per key); for pathological keys pre-split by
time range.
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
) -> DataFrame:
    """Left as-of join: every left row, plus the latest (by ``on``)
    right row at-or-before it within the ``by`` group; right value
    columns arrive suffixed, NULL when no prior right row exists.

    Ties (right.on == left.on) match, right-before-left — DuckDB/kdb
    ``<=`` semantics. The right row's values travel as ONE struct, so
    the match is always a single consistent right row even when some of
    its columns are NULL (independent per-column carry-forward could
    stitch values from different rows). Among right rows sharing
    (by, on), the struct-greatest one wins deterministically;
    pre-aggregate the right side if that tiebreak is not the one you
    want.
    """
    lcols = left.columns
    rv_type = T.StructType([
        T.StructField(c, right.schema[c].dataType) for c in right_values
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
        F.struct(*right_values).alias("_rv"),
        F.lit(0).alias("_src"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal `on` so <= ties match;
    # struct order makes same-instant right rows deterministic
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_src").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols, "_src",
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    return (
        carried.filter(F.col("_src") == 1)
        .select(
            *lcols,
            *[F.col("_rv")[c].alias(c + suffix) for c in right_values],
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

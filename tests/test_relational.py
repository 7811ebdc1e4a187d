"""asof_join edge cases: ties, no-prior-match, NULL-bearing right rows."""

from __future__ import annotations

from datetime import datetime

from fcrepo3_rdf_extractor_spark.operators.relational import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic_tie_and_missing(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00")),   # before any right -> NULL
         (2, "u1", _ts("2024-01-01T11:00:00")),   # exact tie -> matches 11:00
         (3, "u1", _ts("2024-01-01T12:30:00")),   # latest <= -> 12:00
         (4, "u2", _ts("2024-01-01T12:00:00"))],  # other group, no rights
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T11:00:00"), 1.0),
         ("u1", _ts("2024-01-01T12:00:00"), 2.0)],
        "user_id string, ts timestamp, v double",
    )
    out = {r.event_id: r for r in
           asof_join(left, right, on="ts", by=["user_id"], right_values=["v"]).collect()}
    assert out[1].v_asof is None
    assert out[2].v_asof == 1.0    # <= tie matches
    assert out[3].v_asof == 2.0    # greatest at-or-before
    assert out[4].v_asof is None   # group isolation


def test_asof_join_null_on_right_never_matches(spark):
    """A right row with a NULL `on` value can never be an as-of match
    (DuckDB's ASOF `v.ts <= c.ts` never matches NULL); without the
    filter, nulls-first ascending sort carried it forward as a spurious
    match for left rows with no genuine prior right row."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", None, 9.0)],  # NULL ts: must not match anything
        "user_id string, ts timestamp, v double",
    )
    row = asof_join(left, right, on="ts", by=["user_id"],
                    right_values=["v"]).collect()[0]
    assert row.v_asof is None


def test_asof_join_null_in_right_values_stays_coherent(spark):
    """A right row with a NULL column must still win as a whole row —
    per-column carry-forward would reach back to the older row for the
    NULL column and stitch a frankenrow."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T13:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01T10:00:00"), "old", 1.0),
         ("u", _ts("2024-01-01T12:00:00"), None, 2.0)],  # newest has NULL name
        "user_id string, ts timestamp, name string, v double",
    )
    row = asof_join(left, right, on="ts", by=["user_id"],
                    right_values=["name", "v"]).collect()[0]
    assert row.v_asof == 2.0
    assert row.name_asof is None   # NOT "old" — the matched row's own NULL


def test_asof_skewed_equals_plain_on_hot_key(spark):
    """asof_join_skewed must return EXACTLY plain asof_join's rows on a
    corpus with a synthesized hot key (half the users collapsed onto
    one), across bucket boundaries (1h granularity over multi-day
    timestamps) and for left rows whose match lives many buckets back."""
    from pyspark.sql import functions as F

    from fcrepo3_rdf_extractor_spark.operators.relational import (
        asof_join,
        asof_join_skewed,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.withColumn(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, F.lit(1)).otherwise(F.col("user_id")),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .withColumn("view_ts", F.col("ts"))
    )
    kw = dict(on="ts", by=["user_id"], right_values=["view_ts", "view_value"])
    plain = asof_join(clicks, views, **kw)
    split = asof_join_skewed(clicks, views, granularity_sec=3600, **kw)
    assert plain.count() == clicks.count() == split.count()
    assert plain.exceptAll(split).count() == 0
    assert split.exceptAll(plain).count() == 0


def test_range_join_matches_containment_and_group(spark):
    """Half-open containment, by-group isolation, and intervals that
    span multiple buckets (granularity smaller than the interval)."""
    from fcrepo3_rdf_extractor_spark.operators.relational import range_join

    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:30:00")),   # inside w1
         (2, "u1", _ts("2024-01-01T11:00:00")),   # == w1.end -> excluded
         (3, "u1", _ts("2024-01-01T10:00:00")),   # == w1.start -> included
         (4, "u2", _ts("2024-01-01T10:30:00")),   # other group
         (5, "u1", _ts("2024-01-03T00:00:00"))],  # no window
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", "w1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "user_id string, win string, ws timestamp, we timestamp",
    )
    out = range_join(left, right, on="ts", start="ws", end="we",
                     by=["user_id"], granularity_sec=600)  # 6 buckets/window
    got = sorted((r.event_id, r.win) for r in out.collect())
    assert got == [(1, "w1"), (3, "w1")]


def test_range_join_multi_bucket_no_duplicate_matches(spark):
    """An interval exploded over many buckets must still match each
    contained left row exactly once."""
    from fcrepo3_rdf_extractor_spark.operators.relational import range_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T05:00:00"))], "event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("big", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"))],
        "win string, ws timestamp, we timestamp",
    )
    out = range_join(left, right, on="ts", start="ws", end="we",
                     granularity_sec=3600)  # 25 buckets
    assert out.count() == 1


def test_grouped_trend_slope_and_degenerate_groups(spark):
    from math import isclose

    from fcrepo3_rdf_extractor_spark.operators.relational import grouped_trend

    rows = [
        # u1: value rises exactly 2.0/day over 3 days -> slope 2.0
        ("u1", _ts("2024-01-01T00:00:00"), 1.0),
        ("u1", _ts("2024-01-02T00:00:00"), 3.0),
        ("u1", _ts("2024-01-03T00:00:00"), 5.0),
        # u2: single event -> zero time variance -> NULL slope
        ("u2", _ts("2024-01-01T00:00:00"), 9.0),
        # u3: two events at the SAME instant -> NULL slope too
        ("u3", _ts("2024-01-01T00:00:00"), 1.0),
        ("u3", _ts("2024-01-01T00:00:00"), 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    got = {r.user_id: (r.slope, r.n)
           for r in grouped_trend(df, "user_id", "ts", "value").collect()}
    assert isclose(got["u1"][0], 2.0) and got["u1"][1] == 3
    assert got["u2"] == (None, 1)
    assert got["u3"] == (None, 2)


def test_grouped_trend_null_pairs_excluded_like_regr_slope(spark):
    """A NULL value (or ts) excludes the PAIR from both regression
    statistics — pandas skipna mixing all-row x-stats with non-null
    covariance gave a wrong slope; n still counts all rows (count(*))."""
    from math import isclose

    rows = [
        ("u1", _ts("2024-01-01T00:00:00"), 1.0),
        ("u1", _ts("2024-01-02T00:00:00"), 3.0),
        ("u1", _ts("2024-01-05T00:00:00"), None),   # dropped pair
        ("u2", _ts("2024-01-01T00:00:00"), None),   # all-NULL -> NULL slope
        ("u2", _ts("2024-01-02T00:00:00"), None),
    ]
    from fcrepo3_rdf_extractor_spark.operators.relational import grouped_trend

    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    got = {r.user_id: (r.slope, r.n)
           for r in grouped_trend(df, "user_id", "ts", "value").collect()}
    assert isclose(got["u1"][0], 2.0) and got["u1"][1] == 3
    assert got["u2"] == (None, 2)


def test_asof_forward_and_tolerance(spark):
    """Forward direction matches the earliest at-or-after right row
    (ties match); tolerance NULLs a nearest-but-too-far match instead
    of falling back to an older one (pandas merge_asof semantics)."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 250, 20.0), (2, 50, 30.0)],
        "k long, t long, lv double",
    ).select("k", F.col("t").cast("double").alias("t"), "lv")
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 240, "b"), (1, 400, "c"), (2, 500, "d")],
        "k long, t long, rv string",
    ).select("k", F.col("t").cast("double").alias("t"), "rv")

    fwd = {
        (r.k, r.t): r.rv_asof
        for r in asof_join(
            left, right, on="t", by=["k"], right_values=["rv"],
            direction="forward",
        ).collect()
    }
    # tie at t=100 matches; 250 -> 400 ('c'); 50 -> 500 ('d')
    assert fwd == {(1, 100.0): "a", (1, 250.0): "c", (2, 50.0): "d"}

    tol = {
        (r.k, r.t): r.rv_asof
        for r in asof_join(
            left, right, on="t", by=["k"], right_values=["rv"],
            direction="forward", tolerance=160,
        ).collect()
    }
    # 250 -> 400 is 150 <= 160 (kept); 50 -> 500 is 450 (NULLed, no
    # fallback); tie gap 0 kept
    assert tol == {(1, 100.0): "a", (1, 250.0): "c", (2, 50.0): None}

    back = {
        (r.k, r.t): r.rv_asof
        for r in asof_join(
            left, right, on="t", by=["k"], right_values=["rv"],
            tolerance=5,
        ).collect()
    }
    # backward: 250's nearest prior is 240 (gap 10 > 5 -> NULL, no
    # fallback to 100); 100 ties at gap 0
    assert back == {(1, 100.0): "a", (1, 250.0): None, (2, 50.0): None}

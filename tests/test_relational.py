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

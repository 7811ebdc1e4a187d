"""Corpus snapshot diff — the CDC primitive for incremental curation.

Training corpora are rebuilt from crawls on a cadence; every downstream
stage (dedup state refresh, contamination re-check, re-tokenization)
wants the DELTA, not the new snapshot: which documents were added,
removed, or changed since the last build. The engine's incremental
operators (``minhash_incremental_pairs``, ``containment_incremental_
pairs``, the curate wave state) all take "the new wave" as input — this
operator is what computes that wave from two full snapshots when the
upstream source doesn't emit one.

Scale shape: content equality is decided on a SCAN-SIDE digest
(md5 of the content column), so the full-outer equi-join on the
document key carries two narrow columns per side — never the document
bodies. One shuffle per side, hashed on the key; the status decode is a
codegen CASE over null-ness and digest equality. At 10^12 documents
per snapshot this is the plan you'd want: the join is the only
exchange, and AQE's skew split covers a pathological hot key (document
keys are unique per side here, so skew cannot arise from the data
model at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    content_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two corpus snapshots by document key and content digest.

    Returns ``(key, status, old_digest, new_digest)`` with status in
    {'added', 'removed', 'changed', 'unchanged'}; ``include_unchanged``
    keeps the (typically dominant) unchanged rows — the default drops
    them scan-adjacent, so the output is delta-sized.

    ``key`` must be unique within each snapshot (the corpus contract);
    duplicate keys would fan out through the full-outer join and count
    one document several times.

    Digest = md5(content). A digest collision would mis-classify a
    changed document as unchanged; md5's 2^-128 collision rate is the
    standard trade for never moving document bodies through the join
    (the same digest-for-identity discipline as ``dedup_exact``).
    """
    # presence is decided by explicit per-side markers, NEVER by digest
    # nullness: md5(NULL content) is NULL, so a digest-based presence
    # test would classify a present-but-NULL-text document as 'added'
    # on every diff. NULL content itself digests to the sentinel 'null'
    # (both-NULL = unchanged; real -> NULL = changed).
    digest = F.coalesce(F.md5(F.col(content_col)), F.lit("null"))
    o = old.select(
        F.col(key).alias("k"),
        digest.alias("old_digest"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(key).alias("k"),
        digest.alias("new_digest"),
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(F.col("old_digest") == F.col("new_digest"), "unchanged")
        .otherwise("changed")
    )
    out = joined.select(
        F.col("k").alias(key),
        status.alias("status"),
        "old_digest",
        "new_digest",
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out

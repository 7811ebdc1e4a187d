"""Structured Streaming twin of the curate front-end.

The batch job (``jobs/curate.py``) is stage-ordered: exact dedup →
near-dup clustering → ... → quality/language filters. Its near-dup and
containment stages are OUTPUT-layer decisions (cluster minima move when
later data bridges clusters — the reason the batch job recomputes the
keep-set at export), so they have no faithful per-record streaming form;
what CAN stream is the front-end a continuously-arriving corpus needs
applied per document, exactly once, before anything downstream sees it:

- **exact dedup across micro-batches**: ``dropDuplicates`` on
  ``content_md5`` keeps per-key state in the state store, so a document
  arriving in batch 7 identical to one from batch 2 is dropped — the
  streaming equivalent of the batch wave path's "md5 unseen in state"
  probe (``jobs/curate.py:_run_incremental_wave``). State is one row per
  distinct document hash; ``dedup_state_watermark`` bounds it for
  unbounded streams (late duplicates beyond the horizon pass through —
  the same documented tradeoff as ``streaming_dedup`` for triples, and
  the batch export pass catches them, exactly as it re-resolves
  clusters).
- **quality / language annotate + filter**: pure per-row projections
  (``with_quality`` / ``with_language`` — the SAME expressions the batch
  job runs, shared by construction), stateless and stream-safe.

Equality contract (pytest-enforced): draining a multi-micro-batch stream
through this front-end in ``availableNow`` mode yields EXACTLY the rows
of the batch front-end over the concatenated input — same survivors,
same annotation values — with the min-doc_id witness caveat: streaming
keeps the FIRST ARRIVAL of each md5 (arrival order = source file order),
the batch job the min doc_id, so the test feeds files in doc_id order,
which is also the order a backfill replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.text import with_language, with_license, with_quality

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_doc_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 64
) -> DataFrame:
    """Incremental scan of a growing documents directory (one parquet
    file per arrival unit; maxFilesPerTrigger bounds per-micro-batch
    work, the admission-queue analog)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_curate_front(
    docs: DataFrame,
    quality_min: float = 0.5,
    langs: list[str] | None = None,
    dedup_state_watermark: str | None = None,
    license_filter: bool = False,
) -> DataFrame:
    """Exact dedup (stateful, cross-micro-batch) + quality/language
    annotate + filter. Returns the curated stream with the batch job's
    annotation columns (``content_md5``, ``quality``, ``pred_lang``).

    ``dedup_state_watermark``: None keeps dedup state unbounded (exact,
    right for bounded backfills); a duration like ``"1 hour"`` bounds
    the state store for perpetual streams at the cost of not suppressing
    duplicates that arrive further apart than the horizon. The bounded
    branch must use ``dropDuplicatesWithinWatermark``: plain
    ``dropDuplicates`` on a key subset that excludes the event-time
    column NEVER evicts its state (Spark only cleans streaming-dedup
    state when the watermark column is part of the keys), which silently
    re-creates exactly the unbounded growth the parameter exists to
    prevent."""
    hashed = docs.withColumn("content_md5", F.md5(F.col("text")))
    if dedup_state_watermark is not None:
        deduped = (
            hashed.withColumn("_ts", F.current_timestamp())
            .withWatermark("_ts", dedup_state_watermark)
            .dropDuplicatesWithinWatermark(["content_md5"])
            .drop("_ts")
        )
    else:
        deduped = hashed.dropDuplicates(["content_md5"])
    annotated = with_language(with_quality(deduped))
    out = annotated.filter(F.col("quality") >= quality_min)
    if langs:
        out = out.filter(F.col("pred_lang").isin(list(langs)))
    if license_filter:
        # join-free projection, stateless -> stream-safe unchanged
        # (the batch job's stage 4.6, shared by construction)
        out = (with_license(out).filter(F.col("permissive") == 1)
               .drop("license", "permissive"))
    return out


def batch_curate_front(
    docs: DataFrame, quality_min: float = 0.5,
    langs: list[str] | None = None, license_filter: bool = False,
) -> DataFrame:
    """The batch twin over a bounded DataFrame — the same expressions
    (shared with jobs/curate.py stages 1+3+4) with the batch job's
    min-doc_id exact-dedup witness. The streaming/batch equality test
    runs this against a drained streaming_curate_front."""
    hashed = docs.withColumn("content_md5", F.md5(F.col("text")))
    witness = hashed.groupBy("content_md5").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    deduped = hashed.join(witness, "doc_id", "left_semi")
    annotated = with_language(with_quality(deduped))
    out = annotated.filter(F.col("quality") >= quality_min)
    if langs:
        out = out.filter(F.col("pred_lang").isin(list(langs)))
    if license_filter:
        out = (with_license(out).filter(F.col("permissive") == 1)
               .drop("license", "permissive"))
    return out


def write_curated_stream(
    curated: DataFrame, out_dir: str, checkpoint_dir: str,
    available_now: bool = True
):
    """Append-mode parquet sink with its own checkpoint (exactly-once
    via the file-sink commit log). availableNow=True drains everything
    currently in the source then stops — the backfill/test mode."""
    writer = (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

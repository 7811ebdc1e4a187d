"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages. The decode libraries
(Pillow/ffmpeg/etc.) are NOT in this container, so the codec step is a
clearly-marked stub: ``decode_stub='fake'`` derives deterministic
features from the bytes (so the plumbing — schema, batch shape,
partitioning — is real and tested), and ``decode_stub='raise'`` shows
the production wiring (NotImplementedError at the codec call site).

Scale notes: binary payloads dominate row size, so the operators select
the narrowest possible projection before the UDF and bound Arrow batch
bytes via maxRecordsPerBatch; feature extraction is embarrassingly
parallel (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque bytes
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for this sandbox: treat document text bytes as an opaque
    payload so the binary plumbing has real data to move."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a codec: derives pseudo-dimensions and a
    16-dim byte-histogram feature from the payload bytes."""
    n = len(payload)
    width = 64 + (n % 1024)
    height = 64 + ((n // 7) % 1024)
    n_frames = 1 + (n % 16)
    hist = [0] * 16
    for b in payload:
        hist[b >> 4] += 1
    total = max(n, 1)
    return width, height, n_frames, [round(h / total, 6) for h in hist]


def extract_media_features(media: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.

    In production, replace the stub branch with the real codec call
    (PIL.Image.open / soundfile / pyav) — the Spark-side contract
    (schema in, schema out, batch iteration) is exactly this."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "media codecs not available in this environment; "
                        "install Pillow/pyav and call the real decoder here"
                    )
                if payload is None:
                    # NULL payloads yield NULL features, not task failures
                    rows.append((media_id, None, None, None, None))
                    continue
                w, h, nf, feat = _fake_decode(bytes(payload))
                rows.append((media_id, w, h, nf, feat))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_frames", "feature"]
            )

    narrow = media.select("media_id", "payload")  # prune big cols early
    return narrow.mapInPandas(run, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 16, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' on opaque payloads: take every ``every_n``-th byte
    as a frame token — the real implementation swaps the byte slice for a
    video-frame decode, the plan shape (explode -> rows) is identical.
    Pure column expressions: sequence + transform + explode, no Python."""
    frame_idx = F.sequence(
        F.lit(0),
        F.least(
            F.floor((F.col("n_bytes") - 1) / every_n).cast("int"),
            F.lit(max_frames - 1),
        ),
    )
    frames = F.transform(
        frame_idx,
        lambda i: F.struct(
            i.alias("frame_no"),
            F.md5(
                F.substring(F.col("payload"), (i * every_n + 1).cast("int"), every_n)
            ).alias("frame_fp"),
        ),
    )
    exploded = media.filter(F.col("n_bytes") > 0).select(
        "media_id", F.explode(frames).alias("f")
    )
    return exploded.select("media_id", "f.frame_no", "f.frame_fp")


def resize_metadata(features: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning (aspect-preserving short-side scale): pure metadata
    arithmetic — the actual pixel work belongs in the decode UDF."""
    scale = target / F.least("width", "height")
    return features.select(
        "media_id", "width", "height",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
    )

"""Multimodal column plumbing (BASELINE.json north star: image/audio/video
as opaque binary columns with typed metadata).

The Spark-side machinery here is real and tested: schema contracts, Arrow
batch shapes, ``mapInPandas`` signatures, partition sizing.  The actual codec
work is STUBBED — image/audio libraries are not in this container — behind
``decode_fn`` hooks: ``fake_image_decoder`` is a deterministic stand-in with
the same contract a PIL/libav decoder would have, and ``strict_decoder``
raises ``NotImplementedError`` to mark the seam explicitly.

Scale design: media bytes dominate row size, so the operators
``repartition`` by a size budget rather than row count, keep binary columns
out of shuffles (decode → drop bytes → shuffle features), and emit one
feature row per frame/sample via ``mapInPandas`` (1→N).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id bigint, frame_idx int, feature array<float>, n_bytes bigint"


def strict_decoder(content: bytes, mime: str) -> np.ndarray:
    """The real-decoder seam.  A production build plugs PIL/torchaudio/libav
    in here; this container has none of them."""
    raise NotImplementedError(
        "media decoding requires an image/audio codec library not present "
        "in this environment; use fake_image_decoder for plumbing tests"
    )


def fake_image_decoder(content: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in decoder: derives a tiny 'pixel' array from the
    byte content so downstream feature math is real and testable."""
    arr = np.frombuffer(content[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32) / 255.0


def attach_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media frame from any table by treating a column's bytes as
    opaque content — the ingestion shape a binary-file datasource
    (``spark.read.format("binaryFile")``) would produce."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(8).cast("int").alias("width"),
        F.lit(8).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = strict_decoder,
    frames_per_item: int = 2,
) -> DataFrame:
    """Decode → frame-sample → feature-extract via ``mapInPandas``.

    Emits ``frames_per_item`` rows per media item with an 8-dim mean-pooled
    feature — the 1→N batch shape of a real frame sampler.  Binary payloads
    never pass through a shuffle: features are computed in the scan stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for row in pdf.itertuples(index=False):
                pixels = decode_fn(row.content, row.mime)
                for f_idx in range(frames_per_item):
                    # deterministic per-frame crop -> mean-pool columns
                    shifted = np.roll(pixels, f_idx, axis=0)
                    feature = shifted.mean(axis=0).astype(np.float32)
                    out_rows.append(
                        (row.media_id, f_idx, feature.tolist(), len(row.content))
                    )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "frame_idx", "feature", "n_bytes"]
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def size_partitioned(media: DataFrame, target_bytes_per_partition: int = 128 << 20) -> DataFrame:
    """Repartition by cumulative payload size, not row count — media rows
    are wildly skewed in byte size."""
    with_size = media.withColumn("__sz", F.length("content").cast("bigint"))
    total = with_size.agg(F.sum("__sz")).collect()[0][0] or 1
    n_parts = max(1, int(total / target_bytes_per_partition))
    return with_size.repartition(n_parts).drop("__sz")


MEDIA_STATS_SCHEMA = "media_id bigint, mime string, n_bytes bigint, byte_sum bigint"


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata extraction through the same ``mapInPandas`` boundary a
    real decoder uses, but with pure-integer outputs (payload length and
    byte checksum) — giving the multimodal plumbing a cross-engine exact
    oracle even though the codec itself is stubbed.  Binary payloads stay in
    the scan stage; only the integer stats ever reach a shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "byte_sum": [int(sum(bytes(c))) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(batches, MEDIA_STATS_SCHEMA)

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, batch shapes, UDF signatures,
partition sizing — is real and tested; the actual codec work is stubbed
because no image/audio libraries ship in this container: decoders
raise ``NotImplementedError`` unless the library import succeeds, and
``feature='fake'`` computes a deterministic byte-histogram feature so
pipelines are testable end-to-end without codecs.

Scale shape: media rows are fat (MBs), so the session lowers
``arrow.maxRecordsPerBatch`` for these stages and media tables are
stored with small row groups; feature extraction is one pass, columnar
in, columnar out, no driver collection.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16  # byte-histogram buckets for the deterministic fake


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature: normalized 16-bin byte histogram."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def _decode_image_real(payload: bytes, resize: tuple[int, int] | None):
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding needs Pillow, which is not in this container; "
            "use feature='fake' for the deterministic stand-in"
        ) from e
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    if resize:
        img = img.resize(resize)
    return np.asarray(img)


def extract_features(
    df: DataFrame, feature: str = "fake", resize: tuple[int, int] | None = None
) -> DataFrame:
    """-> (media_id, kind, feature: array<float>) one row per media row.

    ``feature='fake'``: deterministic byte histogram (no codecs).
    ``feature='image'``: real decode via Pillow (raises
    NotImplementedError here — the container has no codec libs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if feature == "fake":
                    feats.append(_fake_feature(raw))
                else:
                    img = _decode_image_real(raw, resize)
                    feats.append(
                        np.asarray(img, dtype=np.float32).mean(axis=(0, 1)).ravel()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, "media_id bigint, kind string, feature array<float>"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    — the explode is real Spark; the frame decode inside would be the
    codec stub. Demonstrates the fan-out shape without codecs."""
    from pyspark.sql import functions as F

    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    from track0s.hashing import h64

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(
            (h64(f"media{i}", str(j)) % 256) for j in range(64 + (i % 5) * 32)
        )
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/mpeg", "video": "video/mp4"}[
                    kind
                ],
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

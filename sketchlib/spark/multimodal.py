"""Multimodal (image/audio/video) column plumbing.

Media are opaque BinaryType columns with typed metadata. The Spark-side
machinery — schemas, Arrow batch shapes, mapInPandas signatures,
partition sizing — is real and tested; the actual codec calls are
stubbed (this container has no image/audio libraries) behind
``_decode_stub``: a deterministic fake that derives "pixels"/metadata
from the byte content, so tests exercise the full distributed path.
Swap ``_decode_stub`` for PIL/ffmpeg decoding in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "doc_id long, media binary, media_type string"

_DECODED_FIELDS = (
    "doc_id long, media_type string, width int, height int, "
    "n_frames int, feature array<float>"
)


def _decode_stub(blob: bytes, media_type: str) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decode: geometry + 8-dim feature from bytes.

    STUB — raises for unknown types like a real codec would; replace
    with PIL.Image.open / soundfile / pyav for real media."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no codec for media_type={media_type!r}")
    b = np.frombuffer(blob or b"\x00", np.uint8)
    width = int(b[: 4].sum() % 640) + 1
    height = int(b[4:8].sum() % 480) + 1
    n_frames = 1 if media_type == "image" else int(b.sum() % 250) + 1
    # 8-bucket byte histogram as the stand-in feature vector
    hist = np.bincount(b >> 5, minlength=8).astype(np.float32)
    feat = hist / max(hist.sum(), 1.0)
    return width, height, n_frames, feat


def decode_media(df: DataFrame, media_col: str = "media") -> DataFrame:
    """mapInPandas decode: binary column → typed metadata + feature.

    Batch shape matters at scale: media bytes dominate memory, so the
    Arrow batch size for this stage should be set by bytes not rows
    (spark.sql.execution.arrow.maxRecordsPerBatch down to ~100 for
    multi-MB media)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": [],
                "height": [],
                "n_frames": [],
                "feature": [],
            }
            for blob, mt in zip(pdf[media_col], pdf["media_type"]):
                w, h, nf, feat = _decode_stub(blob, mt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, _DECODED_FIELDS)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index.

    Pure DataFrame expression (sequence+explode) — the decode of each
    sampled frame happens in decode_media downstream."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))),
    )


def synth_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (binary payloads + types)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = [
        (
            i,
            rng.integers(0, 256, int(rng.integers(16, 256)), dtype=np.uint8).tobytes(),
            ("image", "audio", "video")[i % 3],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

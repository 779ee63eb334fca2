"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernels are STUBS:
`decode_image_meta` parses only deterministic header bytes (a fake format),
and `extract_features`/`resize_image`/`sample_frames` raise
NotImplementedError unless handed the fake format.  The Spark-side shape —
schema, batch iteration, partition behavior, UDF signatures — is real and
tested; swapping in Pillow/ffmpeg happens inside the pandas functions only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

FAKE_MAGIC = b"FAKEIMG1"

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, n_bytes long, format string"
)


def make_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic fake image: magic + dims header + seeded pixel bytes."""
    header = (
        FAKE_MAGIC
        + int(width).to_bytes(4, "little")
        + int(height).to_bytes(4, "little")
        + int(channels).to_bytes(4, "little")
    )
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return header + body.tobytes()


def decode_image_meta(df: DataFrame, binary_col: str = "image") -> DataFrame:
    """mapInPandas: binary column -> typed metadata rows (real plumbing,
    stub decode: only the FAKE format parses; real formats would swap in
    Pillow here)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[binary_col]
            n = len(pdf)
            out = {
                "doc_id": pdf["doc_id"].to_numpy(),
                "width": np.zeros(n, dtype=np.int32),
                "height": np.zeros(n, dtype=np.int32),
                "channels": np.zeros(n, dtype=np.int32),
                "n_bytes": np.array([len(b) for b in blobs], dtype=np.int64),
                "format": np.full(n, "unknown", dtype=object),
            }
            for i, b in enumerate(blobs):
                if b[:8] == FAKE_MAGIC:
                    out["width"][i] = int.from_bytes(b[8:12], "little")
                    out["height"][i] = int.from_bytes(b[12:16], "little")
                    out["channels"][i] = int.from_bytes(b[16:20], "little")
                    out["format"][i] = "fake"
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def extract_features(df: DataFrame, binary_col: str = "image", n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction (stub: channel-mean style stats on
    the fake format; NotImplementedError on real formats)."""
    schema = f"doc_id long, features array<float>"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rows = [], []
            for doc_id, b in zip(pdf["doc_id"], pdf[binary_col]):
                if b[:8] != FAKE_MAGIC:
                    raise NotImplementedError(
                        "real image decoding not available in this environment"
                    )
                body = np.frombuffer(b, dtype=np.uint8, offset=20)
                chunks = np.array_split(body, n_features)
                rows.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "features": rows})

    return df.mapInPandas(feats, schema=schema)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a mime/meta struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` kernels. The decode libraries (PIL/ffmpeg/librosa) are not
in this container, so the actual decoders are STUBS (clearly marked): the
Spark-side plumbing — schema, partition shape, UDF signature, batch layout
— is real and tested; drop a real decoder into ``decode_image_kernel`` and
nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

PAYLOAD_META_COLS = ["n_bytes", "payload_sha"]

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, mime string, width int, height int, n_channels int, "
    "mean_luma double, decode_ok boolean"
)


def with_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — pure built-ins."""
    return df.withColumn("n_bytes", F.octet_length(payload_col)).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def decode_image_kernel(payload: bytes, mime: str) -> dict:
    """STUB — real deployments plug PIL/torchvision here.

    Deterministic fake: derives pseudo-dimensions from the payload bytes so
    the downstream dataflow (schema, grouping, filters) is exercised
    end-to-end without an image library.
    """
    if not mime.startswith(("image/", "text/")):
        raise NotImplementedError(f"no decoder for mime {mime!r} in this build")
    n = len(payload)
    return {
        "width": 16 + (n % 64),
        "height": 16 + ((n // 64) % 64),
        "n_channels": 3,
        "mean_luma": float(sum(payload[:256]) % 256) / 255.0 if n else 0.0,
        "decode_ok": True,
    }


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           mime_col: str = "mime") -> DataFrame:
    """The real UDF plumbing around the stubbed decoder: one Arrow batch in,
    one feature frame out; a failed decode degrades to decode_ok=false
    rather than failing the task (poison-pill isolation at scale)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf[id_col], pdf[payload_col], pdf[mime_col]):
                try:
                    feats = decode_image_kernel(bytes(payload or b""), mime or "")
                except NotImplementedError:
                    feats = {"width": None, "height": None, "n_channels": None,
                             "mean_luma": None, "decode_ok": False}
                rows.append({"doc_id": doc_id, "mime": mime, **feats})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col, mime_col).mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a mime/meta struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` kernels.

Decoders, in order of preference:

- **BMP** (uncompressed 24/32-bit) and **PPM/PGM** (binary P6/P5) are
  decoded for real with pure numpy — no imaging library needed, the
  formats are public byte layouts.
- Other formats (PNG/JPEG/...) go through Pillow when it is importable
  (import-gated; absent in this container).
- Anything else — and any corrupt payload — degrades to
  ``decode_ok=false`` instead of failing the task (poison-pill isolation:
  at 100 TB a handful of truncated blobs must never kill a stage).

Audio: **WAV PCM** (8-bit unsigned / 16-bit signed, the public RIFF byte
layout) is decoded for real with pure numpy — sample rate, channels,
duration, RMS and peak level (see ``extract_audio_features``).

Video: **Y4M (YUV4MPEG2)** — the standard UNCOMPRESSED video container
(plain-text header + raw YUV planes per ``FRAME`` marker, the format
ffmpeg/x264 pipelines exchange) — is decoded for real with pure numpy:
dimensions, frame rate, frame count, duration, and every-k-th
FRAME-SAMPLING with mean luma over the sampled frames (see
``extract_video_features``). Compressed audio (mp3/ogg) and compressed
video (h264 etc.) remain out of scope in this container (no codecs);
they would slot into the same kernels behind the same poison-pill guard.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

PAYLOAD_META_COLS = ["n_bytes", "payload_sha"]

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, mime string, width int, height int, n_channels int, "
    "mean_luma double, decode_ok boolean"
)

# ITU-R BT.601 luma weights — the standard RGB→luma projection
_LUMA = np.array([0.299, 0.587, 0.114])


def with_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — pure built-ins."""
    return df.withColumn("n_bytes", F.octet_length(payload_col)).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def _decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER), bottom-up rows padded
    to 4 bytes — the public byte layout, no library needed."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    n_rows = abs(height)
    n_ch = bpp // 8
    stride = (width * n_ch + 3) & ~3
    pixels = np.frombuffer(payload, dtype=np.uint8, count=stride * n_rows,
                           offset=data_offset)
    rows = pixels.reshape(n_rows, stride)[:, : width * n_ch]
    bgr = rows.reshape(n_rows, width, n_ch)[:, :, :3].astype(np.float64)
    luma = bgr[:, :, ::-1] @ _LUMA  # stored BGR → RGB → luma
    return {"width": width, "height": n_rows, "n_channels": n_ch,
            "mean_luma": float(luma.mean() / 255.0), "decode_ok": True}


def _pnm_pixels(payload: bytes):
    """Binary PPM (P6, RGB) / PGM (P5, grayscale) → (H×W×C uint8 array).
    Shared by the feature decoder and the resize kernel."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    # header: magic, width, height, maxval — ASCII tokens, '#' comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    n_ch = 3 if magic == b"P6" else 1
    n = width * height * n_ch
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    if len(px) < n:
        raise ValueError("truncated PNM body")
    return px.reshape(height, width, n_ch)


def _decode_pnm(payload: bytes) -> dict:
    """Binary PPM (P6, RGB) / PGM (P5, grayscale)."""
    arr = _pnm_pixels(payload)
    height, width, n_ch = arr.shape
    if n_ch == 3:
        luma = arr.astype(np.float64) @ _LUMA
    else:
        luma = arr[:, :, 0].astype(np.float64)
    return {"width": width, "height": height, "n_channels": n_ch,
            "mean_luma": float(luma.mean() / 255.0), "decode_ok": True}


def resize_pnm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a binary PNM payload, re-encoded in the
    same format (header ``P5|P6 <w> <h> 255\\n`` + raw bytes). Index map
    is the standard floor(i·in/out) — fully deterministic, so an external
    engine can reproduce the OUTPUT BYTES exactly (the driver oracle
    sha-checks them)."""
    arr = _pnm_pixels(payload)
    height, width, n_ch = arr.shape
    if out_w < 1 or out_h < 1:
        raise ValueError("bad target size")
    rows = (np.arange(out_h) * height) // out_h
    cols = (np.arange(out_w) * width) // out_w
    out = np.ascontiguousarray(arr[rows][:, cols])
    magic = b"P6" if n_ch == 3 else b"P5"
    return magic + f" {out_w} {out_h} 255\n".encode() + out.tobytes()


RESIZED_SCHEMA = (
    "doc_id long, mime string, width int, height int, payload binary, "
    "decode_ok boolean"
)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  mime_col: str = "mime") -> DataFrame:
    """The brief's image RESIZE slot, real not stubbed (for the formats
    with real decoders): Arrow-batched nearest-neighbor resize emitting a
    re-encoded binary payload column — the transform shape of a
    multimodal curation pipeline (decode → transform → re-encode), same
    poison-pill isolation as the decoders."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf[id_col], pdf[payload_col], pdf[mime_col]):
                try:
                    out = resize_pnm(bytes(payload or b""), out_w, out_h)
                    rows.append({"doc_id": doc_id, "mime": mime,
                                 "width": out_w, "height": out_h,
                                 "payload": out, "decode_ok": True})
                except Exception:  # noqa: BLE001 — poison-pill isolation
                    rows.append({"doc_id": doc_id, "mime": mime,
                                 "width": None, "height": None,
                                 "payload": None, "decode_ok": False})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col, mime_col).mapInPandas(
        kernel, RESIZED_SCHEMA
    )


def decode_image_kernel(payload: bytes, mime: str) -> dict:
    """Decode one image payload → feature dict. Raises on undecodable
    input; the surrounding kernel degrades that to decode_ok=false."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    try:
        from io import BytesIO

        from PIL import Image  # import-gated; absent in this container
    except ImportError:
        raise NotImplementedError(
            f"no numpy decoder for this payload (mime {mime!r}) and Pillow "
            f"is not installed"
        )
    img = Image.open(BytesIO(payload))
    arr = np.asarray(img.convert("RGB"), dtype=np.float64)
    return {"width": img.width, "height": img.height,
            "n_channels": len(img.getbands()),
            "mean_luma": float((arr @ _LUMA).mean() / 255.0), "decode_ok": True}


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           mime_col: str = "mime") -> DataFrame:
    """The UDF plumbing around the decoders: one Arrow batch in, one
    feature frame out; ANY failed decode degrades to decode_ok=false
    rather than failing the task (poison-pill isolation at scale)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf[id_col], pdf[payload_col], pdf[mime_col]):
                try:
                    feats = decode_image_kernel(bytes(payload or b""), mime or "")
                except Exception:  # noqa: BLE001 — poison-pill isolation
                    feats = {"width": None, "height": None, "n_channels": None,
                             "mean_luma": None, "decode_ok": False}
                rows.append({"doc_id": doc_id, "mime": mime, **feats})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col, mime_col).mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


# ------------------------------------------------------------- audio ------

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, mime string, sample_rate int, n_channels int, "
    "n_samples long, duration_sec double, rms double, peak double, "
    "decode_ok boolean"
)


def _decode_wav(payload: bytes) -> dict:
    """WAV PCM (RIFF little-endian, the public byte layout — no library):
    walks the chunk list for ``fmt `` and ``data``, decodes 8-bit unsigned
    or 16-bit signed PCM with numpy, and reports rate/channels/duration
    plus normalized RMS and peak level in [-1, 1]."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16) or n_channels < 1:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    n_frames = len(samples) // n_channels
    samples = samples[: n_frames * n_channels]
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n_frames,
        "duration_sec": n_frames / sample_rate if sample_rate else 0.0,
        "rms": float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
        "peak": float(np.abs(samples).max()) if len(samples) else 0.0,
        "decode_ok": True,
    }


VIDEO_FEATURES_SCHEMA = (
    "doc_id long, mime string, width int, height int, fps double, "
    "n_frames int, duration_sec double, n_sampled int, mean_luma double, "
    "decode_ok boolean"
)


def _decode_y4m(payload: bytes, frame_step: int = 2) -> dict:
    """Y4M / YUV4MPEG2 (the public uncompressed layout — no library):
    ``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<space>\\n`` then per frame a
    ``FRAME...\\n`` marker followed by the raw planes (C444: 3·w·h bytes;
    C422: 2·w·h; C420: 1.5·w·h; Cmono: w·h). Frame-samples every
    ``frame_step``-th frame (starting at 0) and reports the mean Y
    (luma) of the sampled frames normalized to [0, 1] — the cheap
    screen-content statistic a curation pipeline thresholds on."""
    if not payload.startswith(b"YUV4MPEG2 "):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = None
    fps_num, fps_den, cs = 30, 1, "420"
    for tok in payload[10:nl].decode("ascii", "strict").split():
        if tok[:1] == "W":
            width = int(tok[1:])
        elif tok[:1] == "H":
            height = int(tok[1:])
        elif tok[:1] == "F":
            num, den = tok[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif tok[:1] == "C":
            cs = tok[1:]
    if not width or not height or fps_num <= 0 or fps_den <= 0:
        raise ValueError("bad Y4M header")
    ysize = width * height
    if cs.startswith("444"):
        fsize = 3 * ysize
    elif cs.startswith("422"):
        fsize = 2 * ysize
    elif cs.startswith("420"):
        fsize = ysize + ysize // 2
    elif cs.startswith("mono"):
        fsize = ysize
    else:
        raise ValueError(f"unsupported Y4M colourspace C{cs}")
    pos, n_frames, luma_sum, n_sampled = nl + 1, 0, 0.0, 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = payload.index(b"\n", pos) + 1
        frame = payload[pos : pos + fsize]
        if len(frame) < fsize:
            raise ValueError("truncated frame")
        if n_frames % frame_step == 0:
            y = np.frombuffer(frame[:ysize], dtype=np.uint8)
            luma_sum += float(y.mean())
            n_sampled += 1
        n_frames += 1
        pos += fsize
    return {
        "width": width,
        "height": height,
        "fps": fps_num / fps_den,
        "n_frames": n_frames,
        "duration_sec": n_frames * fps_den / fps_num,
        "n_sampled": n_sampled,
        "mean_luma": (luma_sum / n_sampled / 255.0) if n_sampled else 0.0,
        "decode_ok": True,
    }


def extract_video_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           mime_col: str = "mime",
                           frame_step: int = 2) -> DataFrame:
    """Video twin of ``extract_audio_features``: real Y4M parse +
    every-``frame_step``-th frame sampling inside one Arrow-batched
    kernel, poison-pill isolated. At 100 TB the payloads arrive as the
    opaque binary column this module standardizes on; a compressed-codec
    decoder (when the environment has one) replaces ``_decode_y4m``
    without touching the Spark-side plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf[id_col], pdf[payload_col], pdf[mime_col]):
                try:
                    feats = _decode_y4m(bytes(payload or b""), frame_step)
                except Exception:  # noqa: BLE001 — poison-pill isolation
                    feats = {"width": None, "height": None, "fps": None,
                             "n_frames": None, "duration_sec": None,
                             "n_sampled": None, "mean_luma": None,
                             "decode_ok": False}
                rows.append({"doc_id": doc_id, "mime": mime, **feats})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col, mime_col).mapInPandas(
        kernel, VIDEO_FEATURES_SCHEMA
    )


def extract_audio_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           mime_col: str = "mime") -> DataFrame:
    """Audio twin of ``extract_image_features``: same Arrow-batched kernel
    shape, same poison-pill isolation — a corrupt or non-WAV payload
    yields decode_ok=false, never a failed task."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, mime in zip(pdf[id_col], pdf[payload_col], pdf[mime_col]):
                try:
                    feats = _decode_wav(bytes(payload or b""))
                except Exception:  # noqa: BLE001 — poison-pill isolation
                    feats = {"sample_rate": None, "n_channels": None,
                             "n_samples": None, "duration_sec": None,
                             "rms": None, "peak": None, "decode_ok": False}
                rows.append({"doc_id": doc_id, "mime": mime, **feats})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col, mime_col).mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )

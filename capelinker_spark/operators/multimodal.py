"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery is real and tested — schemas, batch iteration,
partition-size control, UDF signatures. Decoding: PNG and WAV payloads are
decoded FOR REAL with the stdlib codecs in ``media_codecs`` (zlib/struct
and the ``wave`` module), and JPEG with the bundled two-tier codec
(libjpeg C shim when compilable, pure-numpy baseline otherwise — see
``media_jpeg``); MJPEG-in-AVI video splits into frames in-repo
(``media_avi``, each frame through the JPEG codec, mean-pooled features);
all are featurized deterministically. Codecs that still genuinely need a
native library (H.264 and friends) raise ``NotImplementedError`` unless
``fake=True`` (deterministic hash-derived stand-in) or a caller-supplied
``decode_fn`` handles them — the contract a real deployment uses to
inject an ffmpeg frame sampler.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_DIM = 16

IMAGE_META_SCHEMA = (
    "width int, height int, format string, n_bytes long"
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoder+feature-extractor: expand the
    sha256 of the payload into ``dim`` floats in [0,1)."""
    h = hashlib.sha256(payload).digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    ints = np.frombuffer(raw, dtype="<u4").astype("float64")
    return ints / 2**32


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode a media payload to a feature vector.

    PNG and WAV are decoded for real (stdlib codecs, ``media_codecs``);
    other formats need a native library — raise unless ``fake=True``
    (deterministic stand-in) or the caller passes ``decode_fn`` to
    ``extract_image_features``.

    ``fake=True`` GUARANTEES the deterministic stand-in contract for every
    payload: a PNG-signed payload in an unsupported variant (palette,
    16-bit, interlaced) or with a corrupt IDAT falls back to the
    hash-derived vector instead of raising (round-2 advice — sniffing
    before the fake check broke the documented contract)."""
    from capelinker_spark.operators import media_codecs as mc

    # the try covers ONLY the codec decode: a corrupt/unsupported payload
    # falls back to the fake under fake=True, but a bug in the
    # featurization code itself must still surface (a broad except here
    # would mask real regressions as plausible fake vectors)
    decoded = None
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            decoded = ("image", mc.decode_png(payload))
        elif payload[:2] == b"\xff\xd8":
            decoded = ("image", mc.decode_jpeg(payload))
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            decoded = ("audio", mc.decode_wav(payload))
        elif payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from capelinker_spark.operators.media_avi import decode_mjpeg_avi

            frames = decode_mjpeg_avi(payload, n_frames=4)
            if not frames:
                raise ValueError("AVI container has no video frames")
            decoded = ("video", frames)
    except Exception:
        if fake:
            return _fake_decode(payload, IMAGE_FEATURE_DIM)
        raise
    if decoded is not None:
        kind, data = decoded
        if kind == "image":
            return mc.image_feature_vector(data, IMAGE_FEATURE_DIM)
        if kind == "video":
            # per-frame image features, MEAN-pooled over the (≤4)
            # evenly-sampled frames — deterministic, order-independent
            vecs = [
                mc.image_feature_vector(f, IMAGE_FEATURE_DIM) for f in data
            ]
            return np.mean(np.stack(vecs), axis=0)
        return mc.audio_feature_vector(*data, IMAGE_FEATURE_DIM)
    if not fake:
        raise NotImplementedError(
            "only PNG/JPEG/WAV/MJPEG-AVI decode in-repo; other video "
            "codecs (H.264 etc.) need an injected decoder — pass "
            "fake=True for the deterministic stand-in, or supply "
            "decode_fn to extract_image_features (e.g. an ffmpeg frame "
            "sampler)"
        )
    return _fake_decode(payload, IMAGE_FEATURE_DIM)


def extract_image_features(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "url",
    fake: bool = True,
    batch_hint: int = 1024,
    decode_fn=None,
) -> DataFrame:
    """binary column → (id, image_features array<double>, n_bytes) via
    mapInPandas. Arrow-batched; one Python roundtrip per batch, zero per-row
    Python outside the batch loop.

    ``decode_fn``: optional pluggable decoder ``bytes -> 1-D array-like of
    float`` (e.g. a real PIL/torchvision feature extractor). It must be
    picklable — a module-level function or functools.partial, with its
    module shipped to the workers (``spark-submit --py-files`` /
    ``sc.addPyFile``); when None the deterministic fake (``fake=True``) or
    the NotImplementedError stub (``fake=False``) is used. Contract proven
    by tests/test_media_codecs.py, which injects a real PPM codec (and a
    real PIL JPEG path when an imaging lib exists)."""
    schema = f"{id_col} string, image_features array<double>, n_bytes long"
    use_fake = fake
    user_decode = decode_fn

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = (
            user_decode
            if user_decode is not None
            else lambda p: decode_image(p, fake=use_fake)
        )
        for pdf in it:
            payloads = pdf[binary_col]
            feats = [
                dec(bytes(p)) if p is not None else None for p in payloads
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "image_features": [
                        None if f is None else list(f) for f in feats
                    ],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, schema)


def frame_sample_plan(
    df: DataFrame,
    n_frames: int = 4,
    duration_col: str = "n_bytes",
    id_col: str = "url",
) -> DataFrame:
    """Video frame-sampling PLAN: explode each asset into ``n_frames``
    deterministic sample offsets (the decode itself is the stubbed step).
    Native explode — the distributed part of frame sampling is the row
    multiplication and partition sizing, which this does for real."""
    return df.select(
        id_col,
        F.col(duration_col).alias("_dur"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_index"),
    ).withColumn(
        "frame_offset",
        (F.col("_dur") * F.col("frame_index") / F.lit(n_frames)).cast("long"),
    ).drop("_dur")


def binary_metadata(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """Typed metadata for an opaque binary column, all native: size, magic-
    byte sniffing for common containers.

    Sniffing compares HEX prefixes of the raw bytes — casting binary to
    string UTF-8-decodes the payload, turning 0x89 / 0xFF 0xD8 into U+FFFD
    so the png/jpeg branches could never match (round-1 advice item)."""
    b = F.col(binary_col)
    hex12 = F.hex(F.substring(b, 1, 12))  # raw-byte sniff window, no decoding
    riff_type = F.substring(hex12, 17, 8)  # bytes 9-12: the RIFF form type
    fmt = (
        F.when(hex12.startswith("3C21444F43545950"), "html")  # '<!DOCTYP'
        .when(hex12.startswith("89504E47"), "png")  # \x89PNG
        .when(hex12.startswith("FFD8"), "jpeg")  # JPEG SOI
        .when(hex12.startswith("52494646") & (riff_type == "57415645"), "wav")
        .when(hex12.startswith("52494646") & (riff_type == "41564920"), "avi")
        .when(hex12.startswith("52494646") & (riff_type == "57454250"), "webp")
        .when(hex12.startswith("52494646"), "riff")  # other RIFF forms
        .when(hex12.startswith("474946383"), "gif")  # GIF87a/89a
        .when(F.substring(hex12, 9, 8) == "66747970", "mp4")  # ....ftyp
        .otherwise("unknown")
    )
    return df.withColumn("n_bytes", F.length(b).cast("long")).withColumn(
        "format", fmt
    )

"""Minimal MJPEG/AVI container codec — the video half of the multimodal
seam (round-4 verdict item 9): an AVI (RIFF) file whose video stream is
Motion-JPEG is just a chunk list of ordinary baseline JPEG frames, so the
bundled JPEG codec (``media_jpeg``) decodes every frame with no native
video library. Codecs that actually need ffmpeg (H.264 etc.) remain
behind the injected-decoder seam in ``multimodal``.

Scope (documented, mirrored by the tests):

* reader — any RIFF/AVI whose ``movi`` LIST carries ``##dc``/``##db``
  video chunks (compressed/uncompressed video frame chunks per the AVI
  spec; ``##`` is the two-digit stream number). ``rec `` grouping LISTs
  inside ``movi`` are descended into. Chunk sizes are validated and
  odd-sized chunks consume their RIFF pad byte; any truncation raises
  ValueError (the same classification contract as the JPEG codec).
* writer — a spec-shaped MJPEG AVI (hdrl with avih/strh/strf, movi,
  idx1) used by the tests and fixtures; one video stream, no audio.

No reference-repo counterpart (the reference is text-only linkage); the
RIFF grammar constants are from the public AVI/RIFF specification.
"""

from __future__ import annotations

import struct

import numpy as np


def _u32(b: bytes, off: int) -> int:
    if off + 4 > len(b):
        raise ValueError("truncated RIFF (size field past end)")
    return struct.unpack_from("<I", b, off)[0]


def _walk_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_size) for each chunk in
    [start, end); odd sizes consume a pad byte (RIFF word alignment)."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        size = _u32(payload, pos + 4)
        data_start = pos + 8
        if data_start + size > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, data_start, size
        pos = data_start + size + (size & 1)
    # pos == end + 1 is a final odd-sized chunk whose pad byte the writer
    # omitted — common in the wild and tolerated by every mainstream
    # demuxer (round-5 review finding 3)
    if pos not in (end, end + 1):
        raise ValueError("trailing garbage inside RIFF list")


def _is_video_frame(fourcc: bytes) -> bool:
    # '##dc' / '##db': two-digit stream number + compressed/uncompressed
    # video tag
    return (
        fourcc[:2].isdigit()
        and fourcc[2:] in (b"dc", b"db")
    )


def split_mjpeg_avi(payload: bytes) -> list[bytes]:
    """RIFF/AVI bytes → the raw JPEG payload of every video frame chunk,
    in stream order. Raises ValueError for non-AVI input, truncation, or
    a video chunk that is not a JPEG stream."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_size = _u32(payload, 4)
    end = 8 + riff_size
    if end > len(payload):
        raise ValueError("truncated RIFF (declared size past end)")

    frames: list[bytes] = []

    def collect(list_start: int, list_end: int) -> None:
        for fourcc, ds, size in _walk_chunks(payload, list_start, list_end):
            if fourcc == b"LIST":
                ltype = payload[ds:ds + 4]
                if ltype in (b"movi", b"rec "):
                    collect(ds + 4, ds + size)
            elif _is_video_frame(fourcc):
                if size == 0:
                    # zero-length video chunks are the standard AVI
                    # convention for dropped/duplicate frames — skip,
                    # don't fail the file (round-5 review finding 3)
                    continue
                frame = payload[ds:ds + size]
                if frame[:2] != b"\xff\xd8":
                    raise ValueError(
                        "AVI video chunk is not an MJPEG (JPEG) frame"
                    )
                frames.append(frame)

    collect(12, end)
    return frames


def decode_mjpeg_avi(
    payload: bytes, n_frames: int | None = None
) -> list[np.ndarray]:
    """Decode an MJPEG AVI to (H, W, C) uint8 frame arrays via the bundled
    JPEG codec. ``n_frames``: evenly-spaced sample (the executed analog of
    ``multimodal.frame_sample_plan``'s offset rule — index k of n maps to
    ``floor(total * k / n)``); None decodes every frame."""
    from capelinker_spark.operators.media_codecs import decode_jpeg

    frames = split_mjpeg_avi(payload)
    if not frames:
        return []
    if n_frames is not None and n_frames < len(frames):
        idx = [len(frames) * k // n_frames for k in range(n_frames)]
        frames = [frames[i] for i in idx]
    return [decode_jpeg(f) for f in frames]


def build_mjpeg_avi(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """Assemble a spec-shaped single-stream MJPEG AVI (hdrl with
    avih/strh/strf, movi with '00dc' chunks, idx1). Test/fixture writer —
    a real crawl supplies its own containers."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n = len(jpeg_frames)
    max_size = max((len(f) for f in jpeg_frames), default=0)
    us_per_frame = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I",
        us_per_frame, max_size * fps, 0, 0x10,  # dwFlags: AVIF_HASINDEX
        n, 0, 1, max_size, width, height, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: dwFlags, wPriority, wLanguage, dwInitialFrames,
    # dwScale, dwRate, dwStart, dwLength, dwSuggestedBufferSize,
    # dwQuality (-1 = default), dwSampleSize, then rcFrame (4 shorts)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, max(fps, 1), 0, n,
                      max_size, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to the start of 'movi'
    # list data, per convention)
    idx_entries = []
    off = 4  # after the 'movi' type fourcc
    for f in jpeg_frames:
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
        )
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body

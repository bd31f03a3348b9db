"""Pure-numpy baseline JPEG codec — the in-repo answer to "the web's
dominant image format" so the multimodal path no longer requires an
injected decoder for JPEG (round-3 verdict gap #2).

Two tiers, same contract as the string-distance kernels:

* this module: a dependency-free BASELINE-SEQUENTIAL (SOF0/SOF1, Huffman,
  8-bit) decoder + encoder — the portable correctness reference. Markers,
  canonical Huffman, dequantize, float64 IDCT, sampling-factor upsample,
  JFIF YCbCr→RGB; the encoder emits standard Annex-K tables at 4:4:4 or
  4:2:0. Deliberately NOT the 100-TB hot path: it is exact, small, and
  testable anywhere.
* ``_jpegnative`` (same package): a libjpeg-backed C shim compiled at
  runtime (the `_strdistc.c` pattern) — the production fast path, and the
  independent oracle the tests cross-validate this module against.

Out of scope (raise ValueError with the reason): progressive (SOF2),
arithmetic coding, 12-bit precision, CMYK/4-component, hierarchical.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """Natural (row-major) index for each zigzag position, generated from
    the diagonal walk rather than hardcoded."""
    order = []
    for d in range(15):
        rng = range(d + 1)
        if d % 2 == 0:
            rng = reversed(rng)  # even diagonals run bottom-left → top-right
        for i in rng:
            j = d - i
            if i < 8 and j < 8:
                order.append(i * 8 + j)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

# Annex K.1 / K.2 quantization tables (zigzag-NATURAL row-major order here)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 Huffman specs: (bits[1..16], symbol list)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _idct_basis() -> np.ndarray:
    """A[u, x] = a(u) cos((2x+1)uπ/16): 2-D IDCT is A.T @ F @ A, FDCT is
    A @ f @ A.T (orthonormal — one matrix serves both directions)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = np.where(u == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    return a * np.cos((2 * x + 1) * u * np.pi / 16)


_A = _idct_basis()


def idct2(coefs: np.ndarray) -> np.ndarray:
    return _A.T @ coefs @ _A


def fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]):
    """(length, code) per symbol, in canonical JPEG order."""
    codes = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((length, code, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        self.table = {
            (ln, code): sym for ln, code, sym in _canonical_codes(bits, vals)
        }

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


class _BitReader:
    """MSB-first reader over one entropy-coded segment (stuffed 0xFF00
    already collapsed, restart markers already split off)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 0
        self.acc = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    """ITU T.81 F.2.2.1 EXTEND: map the s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC2: "progressive", 0xC3: "lossless", 0xC5: "differential sequential",
    0xC6: "differential progressive", 0xC7: "differential lossless",
    0xC9: "arithmetic sequential", 0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless", 0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, C) uint8 (C = 1 gray, 3 RGB).
    Raises ValueError on any corrupt/truncated/unsupported payload."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (IndexError, struct.error, StopIteration, KeyError,
            ZeroDivisionError) as e:
        # a truncated/corrupt stream can run any parser off the end; the
        # module contract is ValueError for ALL bad payloads (callers
        # classify on it — review finding r4)
        raise ValueError(f"truncated or corrupt JPEG ({type(e).__name__})")


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (H, W, [(cid, h, v, tq)])
    scan = None   # ([(comp_idx, dc_id, ac_id)], scan_data_offset)
    adobe_transform = None  # APP14 'Adobe' color-transform byte, if present

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1  # fill bytes
        m = payload[pos]
        pos += 1
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        pos += seglen
        if m == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq_id = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, o).astype(np.int64)
                    o += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, o).astype(np.int64)
                    o += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qt[tq_id] = nat.reshape(8, 8)
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            prec, H, W, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq_id))
            frame = (H, W, comps)
        elif m in _SOF_UNSUPPORTED:
            raise ValueError(f"unsupported JPEG mode: {_SOF_UNSUPPORTED[m]}")
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1:o + 17])
                n = sum(bits)
                vals = list(seg[o + 17:o + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
                o += 17 + n
        elif m == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14 Adobe: 'Adobe' + version(2) + flags0(2) + flags1(2) +
            # transform(1). transform=0 means the 3 components are stored
            # RGB, not YCbCr — libjpeg honors this; ignoring it (round-4
            # advice) silently decoded Adobe-RGB baselines with wrong colors
            adobe_transform = seg[11]
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                idx = next(
                    i for i, c in enumerate(frame[2]) if c[0] == cs
                )
                sel.append((idx, tabs >> 4, tabs & 15))
            scan = (sel, pos)
            break  # entropy-coded data follows; handled below
        # else: APPn/COM/unknown — skipped via seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    H, W, comps = frame
    sel, data_start = scan
    if len(sel) != len(comps):
        raise ValueError("non-interleaved multi-scan baseline unsupported")

    # split entropy data into restart segments, unstuffing FF00
    segments: list[bytes] = []
    cur = bytearray()
    p = data_start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF:
            nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # next real marker (EOI or otherwise) ends the scan
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = -(-W // mcu_w)
    mcus_y = -(-H // mcu_h)
    planes = [
        np.zeros((mcus_y * 8 * c[2], mcus_x * 8 * c[1]), dtype=np.float64)
        for c in comps
    ]

    n_mcus = mcus_x * mcus_y
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for comp_idx, dc_id, ac_id in sel:
            _, ch, cv, tq_id = comps[comp_idx]
            q = qt[tq_id]
            for by in range(cv):
                for bx in range(ch):
                    coefs = np.zeros((8, 8), dtype=np.int64)
                    s = dc_tabs[dc_id].decode(reader)
                    diff = _extend(reader.receive(s), s)
                    preds[comp_idx] += diff
                    coefs[0, 0] = preds[comp_idx]
                    k = 1
                    while k < 64:
                        rs = ac_tabs[ac_id].decode(reader)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        nat = ZIGZAG[k]
                        coefs[nat // 8, nat % 8] = _extend(reader.receive(s), s)
                        k += 1
                    px = idct2((coefs * q).astype(np.float64)) + 128.0
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    planes[comp_idx][y0:y0 + 8, x0:x0 + 8] = px

    # upsample each plane to the full sampling grid, crop, stack
    out_planes = []
    for (cid, ch, cv, _), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, max_v // cv, axis=0),
                       max_h // ch, axis=1)
        out_planes.append(up[:H, :W])
    img = np.stack(out_planes, axis=-1)
    if len(comps) == 1:
        return np.clip(np.rint(img), 0, 255).astype(np.uint8)
    if len(comps) == 3:
        if adobe_transform == 0:
            # Adobe transform=0: components are already RGB — no transform
            return np.clip(np.rint(img), 0, 255).astype(np.uint8)
        if adobe_transform not in (None, 1):
            # transform=2 (YCCK) is a 4-component convention; anything else
            # on a 3-component stream is outside the documented scope
            raise ValueError(
                f"unsupported Adobe APP14 transform {adobe_transform}"
            )
        y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"unsupported JPEG component count {len(comps)}")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per T.81

    def marker(self, m: int) -> None:
        """Emit a raw marker into the entropy stream (RSTn): flush-pad the
        current byte, then FF <m> UNstuffed."""
        self.flush()
        self.out.append(0xFF)
        self.out.append(m)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, C]) uint8 → baseline JFIF bytes. C=1/missing → grayscale,
    C=3 → YCbCr (4:4:4, or 4:2:0 with ``subsample=True``). Standard
    Annex-K quantization (IJG quality scaling) and Huffman tables.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (resync points — what a parallel or error-resilient decoder keys on)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    H, W, C = arr.shape
    if C not in (1, 3):
        raise ValueError(f"encode_jpeg expects 1 or 3 channels, got {C}")
    a = arr.astype(np.float64)
    if C == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chans = [y, cb, cr]
    else:
        chans = [a[..., 0]]

    sub = 2 if (subsample and C == 3) else 1
    # (h, v) per component; quant/huff table ids
    samp = [(sub, sub)] + [(1, 1)] * (C - 1) if C == 3 else [(1, 1)]
    max_h = max(h for h, _ in samp)
    max_v = max(v for _, v in samp)
    qtabs = [_scaled_quant(QUANT_LUMA, quality),
             _scaled_quant(QUANT_CHROMA, quality)]

    # downsample chroma by box mean (pad to even first when 4:2:0)
    planes = []
    for ci, chan in enumerate(chans):
        h, v = samp[ci]
        fy, fx = max_v // v, max_h // h
        if fy > 1 or fx > 1:
            ph = -(-H // fy) * fy
            pw = -(-W // fx) * fx
            padded = np.pad(chan, ((0, ph - H), (0, pw - W)), mode="edge")
            chan = padded.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes.append(chan)

    mcus_x = -(-W // (8 * max_h))
    mcus_y = -(-H // (8 * max_v))
    # pad every plane to its MCU-aligned block grid
    padded_planes = []
    for ci, plane in enumerate(planes):
        h, v = samp[ci]
        th, tw = mcus_y * 8 * v, mcus_x * 8 * h
        ph, pw = plane.shape
        padded_planes.append(
            np.pad(plane, ((0, th - ph), (0, tw - pw)), mode="edge")
        )

    dc_specs = [DC_LUMA_SPEC] + [DC_CHROMA_SPEC] * (C - 1)
    ac_specs = [AC_LUMA_SPEC] + [AC_CHROMA_SPEC] * (C - 1)
    dc_codes = [
        {sym: (ln, code) for ln, code, sym in _canonical_codes(*s)}
        for s in dc_specs
    ]
    ac_codes = [
        {sym: (ln, code) for ln, code, sym in _canonical_codes(*s)}
        for s in ac_specs
    ]

    w = _BitWriter()
    preds = [0] * C
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            w.marker(0xD0 + rst)
            rst = (rst + 1) % 8
            preds = [0] * C
        my, mx = divmod(mcu, mcus_x)
        for ci in range(C):
            h, v = samp[ci]
            q = qtabs[0 if ci == 0 else 1]
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    block = padded_planes[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                    F = fdct2(block)
                    qd = np.sign(F) * np.floor(np.abs(F) / q + 0.5)
                    zz = qd.reshape(64)[ZIGZAG].astype(np.int64)
                    diff = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                    s = _category(diff)
                    ln, code = dc_codes[ci][s]
                    w.write(code, ln)
                    if s:
                        mag = diff if diff > 0 else diff + (1 << s) - 1
                        w.write(mag, s)
                    run = 0
                    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                    for k in range(1, 64):
                        vv = int(zz[k])
                        if vv == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_codes[ci][0xF0]  # ZRL
                            w.write(code, ln)
                            run -= 16
                        s = _category(vv)
                        ln, code = ac_codes[ci][(run << 4) | s]
                        w.write(code, ln)
                        mag = vv if vv > 0 else vv + (1 << s) - 1
                        w.write(mag, s)
                        run = 0
                    if last_nz < 63:
                        ln, code = ac_codes[ci][0x00]  # EOB
                        w.write(code, ln)
    w.flush()

    # headers
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, q in enumerate(qtabs[: (2 if C == 3 else 1)]):
        zz = q.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(x) for x in zz
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * C, 8, H, W, C)
    for ci in range(C):
        h, v = samp[ci]
        out += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    huff_sections = [(0, 0, DC_LUMA_SPEC), (1, 0, AC_LUMA_SPEC)]
    if C == 3:
        huff_sections += [(0, 1, DC_CHROMA_SPEC), (1, 1, AC_CHROMA_SPEC)]
    for tc, th, (bits, vals) in huff_sections:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (tc << 4) | th
        ) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * C, C)
    for ci in range(C):
        tid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tid << 4) | tid])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for baseline
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)

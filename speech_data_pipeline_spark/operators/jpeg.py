"""Pure-NumPy baseline JPEG codec: a real sequential-DCT decoder (and a
minimal encoder) for ITU-T T.81 / JFIF — no PIL/libjpeg.

This closes the highest-frequency image-format gap in the web front end
(a Common-Crawl corpus is mostly JPEG), the same move operators/flac.py
and operators/png.py made for audio/lossless images: decode the format
from the spec directly, keep only genuinely perceptual/complex codecs
(WebP, AVIF, progressive JPEG) as the documented external-backend seam.
Reference image/frame touchpoints run through PIL/ffmpeg
(modules/models/utils.py); here the container is parsed natively.

Decoder coverage (baseline sequential DCT, SOF0):
- DQT 8-bit and 16-bit quantization tables, multiple tables per marker
- DHT Huffman tables (DC/AC, up to 4 each), canonical code construction
  from the BITS/HUFFVAL lists (T.81 Annex C)
- interleaved SOS scan, arbitrary component count 1 or 3, sampling
  factors up to 2×2 (4:4:4, 4:2:2, 4:4:0, 4:2:0, grayscale)
- entropy-coded segment byte unstuffing (FF 00), restart markers
  (DRI / RSTn: bit-alignment + DC predictor reset, T.81 §E.2.4)
- dequantize → de-zigzag → exact float 8×8 IDCT (matrix form of the
  T.81 Annex A.3.3 definition) → level shift
- chroma upsampling by sample replication, YCbCr→RGB per JFIF (ITU-T
  T.871 §7), clamped to [0, 255]

Rejected loudly (never silently wrong): progressive (SOF2) and every
other non-baseline frame type, arithmetic coding (DAC), 12-bit
precision, sampling factors > 2, component counts other than 1/3.

The encoder writes baseline grayscale or YCbCr 4:4:4 / 4:2:0 with the
T.81 Annex K example tables scaled by a quality factor — enough to
round-trip-prove the decoder on arbitrary images; the decoder's own
known-answer tests in tests/test_jpeg.py are additionally built
marker-by-marker BY HAND (flat-block DC-only scans with hand-derived
Huffman bits), so the bitstream reader and IDCT are checked against the
spec, not against this encoder.

Scale shape: per-payload kernel behind Arrow-batched ``mapInPandas``
(operators/multimodal.py decode_image_bytes / resize_frames) — each
image decodes independently; 100 TB of JPEG is a map-only stage.
"""

from __future__ import annotations

import struct

import numpy as np

#: zig-zag scan order: index i of the scan holds coefficient (r, c)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: T.81 Annex K.1 example luminance / chrominance quantization tables
#: (natural row-major order).
K1_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
K1_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval).
K3_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8×8 DCT-II basis matrix A with A[k, n] = c_k cos((2n+1)kπ/16),
    c_0 = √(1/8), c_k = 1/2 — forward DCT is A X Aᵀ, inverse Aᵀ X A
    (the T.81 Annex A.3.3 definition in matrix form)."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    a = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16.0)
    a[0, :] = np.sqrt(1.0 / 8.0)
    return a


_A = _dct_matrix()


def idct2(block: np.ndarray) -> np.ndarray:
    """Exact float 2-D inverse DCT of one 8×8 coefficient block."""
    return _A.T @ block.astype(np.float64) @ _A


def fdct2(block: np.ndarray) -> np.ndarray:
    """Exact float 2-D forward DCT of one 8×8 sample block."""
    return _A @ block.astype(np.float64) @ _A.T


class _HuffTable:
    """Canonical Huffman decode table from the DHT (bits, huffval)
    lists — T.81 Annex C code construction. Lookup is (length, code) →
    symbol via per-length dicts (max 16 probes per symbol)."""

    def __init__(self, bits: list[int], huffval: list[int]):
        if len(bits) != 16 or sum(bits) != len(huffval):
            raise ValueError("malformed JPEG Huffman table")
        self.by_len: list[dict[int, int]] = [dict() for _ in range(17)]
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.by_len[length][code] = huffval[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with FF 00
    unstuffing; RST markers terminate the current interval (the scan
    loop calls ``restart()`` to skip them and re-align)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _HitRestart()
            else:
                raise ValueError(
                    f"unexpected marker FF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Skip a RSTn marker and byte-align (T.81 §E.2.4)."""
        self.cur = 0
        self.nbits = 0
        # The FF Dn bytes sit at self.pos (detected, not consumed).
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


class _HitRestart(Exception):
    pass


def _decode_symbol(r: _BitReader, table: _HuffTable) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.by_len[length].get(code)
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_bytes(payload: bytes) -> dict:
    """Decode one baseline JPEG payload.

    Returns ``{"width", "height", "channels", "pixels"}`` with pixels
    a uint8 (H, W, channels) array — channels 1 (grayscale) or 3
    (RGB, converted from YCbCr per JFIF). Raises ValueError on
    corrupt streams and NotImplementedError on non-baseline features.
    """
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"lost marker sync at byte {pos}")
        # skip spec-legal 0xFF fill bytes before the marker code
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                dz = np.zeros(64, dtype=np.int64)
                dz[ZIGZAG] = tbl  # tables are stored in zigzag order
                qtables[tq] = dz.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _HuffTable(bits, huffval)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("12-bit JPEG not supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG not supported"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        "sampling factors > 2 not supported"
                    )
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (SOF marker FF{marker:02X}) — "
                "progressive/lossless/arithmetic streams need an external "
                "backend"
            )
        elif marker == 0xCC:  # DAC
            raise NotImplementedError("arithmetic coding not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                td, ta = tdta >> 4, tdta & 0x0F
                match = [c for c in frame["comps"] if c["id"] == cs]
                if not match:
                    raise ValueError("SOS references unknown component")
                scomp.append((match[0], td, ta))
            if len(scomp) != len(frame["comps"]):
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG not supported"
                )
            pixels = _decode_scan(
                b, pos + seglen, frame, scomp, qtables, htables,
                restart_interval,
            )
            return pixels
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("JPEG stream ended without an SOS scan")


def _decode_scan(
    b: bytes,
    pos: int,
    frame: dict,
    scomp: list,
    qtables: dict,
    htables: dict,
    restart_interval: int,
) -> dict:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(comps) == 1:
        # T.81 §A.2: a single-component scan is NON-interleaved — one
        # data unit per MCU in raster order over ceil(w/8) × ceil(h/8),
        # regardless of the sampling factors declared in SOF (those
        # only shape multi-component geometry). Force effective 1×1.
        comps = [dict(comps[0], h=1, v=1)]
        scomp = [(comps[0], scomp[0][1], scomp[0][2])]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(b, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.restart()
                pred = [0] * len(comps)
            try:
                for ci, (c, td, ta) in enumerate(scomp):
                    q = qtables.get(c["tq"])
                    if q is None:
                        raise ValueError("missing quantization table")
                    dc_t = htables.get((0, td))
                    ac_t = htables.get((1, ta))
                    if dc_t is None or ac_t is None:
                        raise ValueError("missing Huffman table")
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = _decode_block(
                                reader, dc_t, ac_t, pred, ci
                            )
                            blk = idct2(coef * q) + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _HitRestart as exc:
                raise ValueError(
                    "restart marker inside an MCU (truncated interval)"
                ) from exc
            except IndexError as exc:
                # bit reader ran off the end of the stream mid-MCU
                raise ValueError("truncated JPEG entropy stream") from exc
            mcu_count += 1
    # Upsample each component to full MCU-grid resolution by sample
    # replication, crop to (h, w).
    out = []
    for c, plane in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        px = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return {
            "width": w, "height": h, "channels": 1,
            "pixels": px[..., np.newaxis],
        }
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    # JFIF (ITU-T T.871 §7) full-range conversion.
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": px}


def _decode_block(
    reader: _BitReader,
    dc_t: _HuffTable,
    ac_t: _HuffTable,
    pred: list[int],
    ci: int,
) -> np.ndarray:
    """Decode one 8×8 block's quantized coefficients (natural order)."""
    zz = np.zeros(64, dtype=np.int64)
    t = _decode_symbol(reader, dc_t)
    if t > 11:
        raise ValueError("invalid DC category")
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_symbol(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.int64)
    coef[ZIGZAG] = zz
    return coef.reshape(8, 8)


# ---------------------------------------------------------------------------
# Minimal baseline encoder (round-trip proof + image export sink)
# ---------------------------------------------------------------------------


class _HuffEncoder:
    def __init__(self, bits: list[int], huffval: list[int]):
        self.code: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.code[huffval[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC diff / AC value (T.81 F.1.2.1)."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG-convention quality scaling of an Annex K table, floored at 1."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _encode_plane_block(
    bw: _BitWriter,
    blk: np.ndarray,
    q: np.ndarray,
    pred: list[int],
    ci: int,
    dc_e: _HuffEncoder,
    ac_e: _HuffEncoder,
) -> None:
    coef = fdct2(blk - 128.0)
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, vbits = _magnitude(diff)
    code, ln = dc_e.code[t]
    bw.write(code, ln)
    if t:
        bw.write(vbits, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_e.code[0xF0]
            bw.write(code, ln)
            run -= 16
        s, vbits = _magnitude(v)
        code, ln = ac_e.code[(run << 4) | s]
        bw.write(code, ln)
        bw.write(vbits, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_e.code[0x00]
        bw.write(code, ln)


def encode_jpeg_bytes(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """Encode a uint8 (H, W) grayscale or (H, W, 3) RGB array as a
    baseline JFIF JPEG (Annex K example tables scaled by ``quality``;
    ``subsample=True`` → 4:2:0 chroma)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2 or px.shape[2] == 1
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[..., 0]
    h, w = px.shape[:2]
    lq = _scale_q(K1_LUMA_Q, quality).reshape(8, 8)
    cq = _scale_q(K1_CHROMA_Q, quality).reshape(8, 8)
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = px.astype(np.float64)
        r, g, bl = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        if subsample:
            # 2×2 box average; pad odd dims by edge replication first.
            def down(p: np.ndarray) -> np.ndarray:
                ph = p if p.shape[0] % 2 == 0 else np.vstack([p, p[-1:]])
                ph = (
                    ph
                    if ph.shape[1] % 2 == 0
                    else np.hstack([ph, ph[:, -1:]])
                )
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2]
                    + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (zigzag order on the wire)
    for tq, q in ([(0, lq)] if gray else [(0, lq), (1, cq)]):
        zz = q.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in zz)
    # SOF0
    nc = len(planes)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([nc])
    for i, (hs, vs) in enumerate(samp):
        out += bytes([i + 1, (hs << 4) | vs, qsel[i]])
    # DHT
    tabs = [(0, 0, K3_DC_LUMA), (1, 0, K3_AC_LUMA)]
    if not gray:
        tabs += [(0, 1, K3_DC_CHROMA), (1, 1, K3_AC_CHROMA)]
    encs = {}
    for tc, th, (bits, huffval) in tabs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval))
        out += bytes([(tc << 4) | th]) + bytes(bits)
        out += bytes(huffval)
        encs[(tc, th)] = _HuffEncoder(bits, huffval)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for i in range(nc):
        th = 0 if i == 0 else 1
        out += bytes([i + 1, (th << 4) | th])
    out += b"\x00\x3f\x00"

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        th_, tw_ = mcuy * vs * 8, mcux * hs * 8
        pp = np.empty((th_, tw_), dtype=np.float64)
        ph, pw = p.shape
        pp[:ph, :pw] = p
        pp[ph:, :pw] = p[-1:, :]  # edge-replicate padding
        pp[:, pw:] = pp[:, pw - 1 : pw]
        padded.append(pp)
    bw = _BitWriter()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (hs, vs)) in enumerate(zip(padded, samp)):
                th = 0 if ci == 0 else 1
                q = lq if qsel[ci] == 0 else cq
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        _encode_plane_block(
                            bw, p[y0 : y0 + 8, x0 : x0 + 8], q, pred,
                            ci, encs[(0, th)], encs[(1, th)],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

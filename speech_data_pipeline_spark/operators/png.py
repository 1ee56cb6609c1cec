"""Pure-NumPy PNG codec: a real decoder (and a minimal encoder) for the
PNG container using only stdlib zlib — no PIL/libpng.

This makes the image half of the multimodal seam REAL for the one
bread-and-butter lossless format, the same move operators/flac.py made
for audio (reference image/frame touchpoints run through PIL/ffmpeg;
here the format is decoded from the spec directly — RFC 2083 / W3C
PNG). Perceptual/complex codecs (JPEG, WebP, AVIF) remain the
documented external-backend seam.

Decoder coverage: 8- and 16-bit channels, all five color types
(grayscale, RGB, palette, gray+alpha, RGBA), 1/2/4-bit packed
grayscale and palette, all five scanline filters (None/Sub/Up/
Average/Paeth), multi-IDAT streams, CRC-32 verification of every
chunk (stdlib zlib.crc32 — spec CRC), tRNS transparency for palette
images. Adam7 interlacing is rejected loudly (progressive rendering
is a transport nicety, never produced by this pipeline's sinks).

The encoder writes 8-bit grayscale/RGB/RGBA with filter 0 and zlib —
enough to round-trip-prove the decoder and to give export stages a
real image sink. Filter reconstruction is the only nontrivial math and
is exercised against hand-computed vectors in tests/test_png.py, plus
encoder-independent fixtures built chunk-by-chunk in the tests (the
filtered bytes are hand-written there, so the decoder's filter
inversions are checked against the spec, not against this encoder).

Scale shape: per-payload kernel behind Arrow-batched ``mapInPandas``
(operators/multimodal.py resize_frames / decode seam) — each image row
decodes independently; 100 TB of PNG is a map-only stage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> raw channels per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering. ``stride`` is bytes per scanline
    (without the filter byte); ``bpp`` is the filter unit in bytes
    (max(1, bits_per_pixel // 8))."""
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(
            np.int64
        )
        pos += stride
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def _unpack_bits(row: np.ndarray, bit_depth: int, width: int) -> np.ndarray:
    """Expand 1/2/4-bit packed samples (MSB-first) to one value per
    sample."""
    bits = np.unpackbits(row)
    per = bit_depth
    n = width
    vals = np.zeros(n, dtype=np.uint16)
    for k in range(per):
        vals = (vals << 1) | bits[k::per][:n]
    return vals


def decode_png_bytes(payload: bytes) -> dict:
    """Decode a PNG payload to ``{"height", "width", "channels",
    "bit_depth", "pixels"}`` with ``pixels`` a (H, W, C) uint8/uint16
    array (palette resolved to RGB(A); gray kept 1-channel)."""
    b = bytes(payload)
    if b[:8] != _PNG_MAGIC:
        raise NotImplementedError("not a PNG payload (missing signature)")
    off = 8
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    while off + 8 <= len(b):
        length, ctype = struct.unpack(">I4s", b[off : off + 8])
        body = b[off + 8 : off + 8 + length]
        crc = struct.unpack(">I", b[off + 8 + length : off + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("unknown PNG compression/filter method")
            if interlace != 0:
                raise NotImplementedError(
                    "Adam7-interlaced PNG unsupported (pipeline sinks "
                    "never produce it); re-encode progressive sources"
                )
            ihdr = (w, h, depth, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        off += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color = ihdr
    if color not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and color not in (0, 3)
    ):
        raise ValueError(f"invalid bit depth {depth} for color type {color}")
    nch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    bits_pp = depth * nch
    stride = (width * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    rows = _unfilter(raw, height, stride, bpp)

    if depth == 16:
        arr = rows.reshape(height, -1)
        hi = arr[:, 0::2].astype(np.uint16)
        lo = arr[:, 1::2].astype(np.uint16)
        px = ((hi << 8) | lo).reshape(height, width, nch)
    elif depth == 8:
        px = rows.reshape(height, width, nch)
    else:  # 1/2/4-bit gray or palette
        px = np.stack(
            [_unpack_bits(rows[y], depth, width) for y in range(height)]
        ).reshape(height, width, 1)
        if color == 0:
            # scale to full 8-bit range per spec sample depth scaling
            px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if color == 3:
        if palette is None:
            raise ValueError("palette image missing PLTE")
        idx = px.reshape(height, width).astype(np.int64)
        if idx.max() >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full((height, width, 1), 255, dtype=np.uint8)
            have = min(len(trns), len(palette))
            amap = np.full(len(palette), 255, dtype=np.uint8)
            amap[:have] = trns[:have]
            alpha[..., 0] = amap[idx]
            px = np.concatenate([rgb, alpha], axis=2)
            nch = 4
        else:
            px = rgb
            nch = 3
    out_depth = 16 if depth == 16 else 8
    return {
        "height": height,
        "width": width,
        "channels": nch,
        "bit_depth": out_depth,
        "pixels": px.astype(np.uint16 if out_depth == 16 else np.uint8),
    }


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png_bytes(pixels, level: int = 6) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array (C in {1, 3, 4}) as a
    PNG with filter 0 scanlines. Lossless; decoder-verified."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 3: 2, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"unsupported channel count {c}")
    scanlines = bytearray()
    for y in range(h):
        scanlines.append(0)
        scanlines.extend(px[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scanlines), level))
        + _chunk(b"IEND", b"")
    )

"""Pure-NumPy GIF decoder (and a minimal encoder): the third real
codec behind the multimodal seam (WAV/FLAC audio, PNG — and now GIF,
the web-crawl animation/sticker format; JPEG/WebP stay the documented
perceptual-codec seam).

Implements GIF87a/89a from the spec (W3C/CompuServe GRAPHICS
INTERCHANGE FORMAT): logical screen descriptor, global/local color
tables, graphic control extensions (transparency index, frame delay),
image descriptors with Adam-style 4-pass interlacing, and the LZW
decompressor with variable code width (3-12 bits), clear-code dict
resets and deferred-clear streams. Every frame decodes independently
to its own indexed patch (no inter-frame disposal compositing — frame
SAMPLING is planned relationally by operators/multimodal.sample_frames;
this decoder materializes the sampled frames' pixels).

The encoder writes single- or multi-frame GIFs with an honest LZW
compressor (same variable-width rules, clear-on-full) — it exists to
round-trip-prove the decoder (bit order, width growth, dict reset) and
give tests real animated fixtures. A hand-packed micro-stream in
tests/test_gif.py pins the LSB-first sub-block bit order against the
spec independent of both paths.

Scale shape: per-payload kernel for Arrow-batched ``mapInPandas`` —
same contract as decode_png_bytes/decode_wav_bytes.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expect: int) -> list[int]:
    """Decode a GIF LZW stream (already de-sub-blocked) to ``expect``
    pixel indices. LSB-first bit packing; code width starts at
    min_code_size+1 and grows when the next code to assign would not
    fit, capping at 12 bits until a clear code resets the dict."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    out: list[int] = []
    pos = 0
    n_bits = len(bits)

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1, clear + 2

    table, width, next_code = reset()
    prev: tuple[int, ...] | None = None
    while pos + width <= n_bits and len(out) < expect:
        code = 0
        for k in range(width):
            code |= int(bits[pos + k]) << k
        pos += width
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK special case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expect:
        raise ValueError(
            f"GIF LZW stream ended early ({len(out)}/{expect} pixels)"
        )
    return out[:expect]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def decode_gif_bytes(payload: bytes) -> dict:
    """Decode a GIF to ``{"height", "width", "frames": [{"top",
    "left", "height", "width", "delay_cs", "pixels" (h, w, 4 RGBA
    uint8)}, ...]}``. Transparency comes from the 89a graphic control
    extension; interlaced frames are reordered."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload (missing signature)")
    try:
        return _decode_gif_inner(b)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed GIF: {e}") from e


def _decode_gif_inner(b: bytes) -> dict:
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8).reshape(-1, 3)
        off += 3 * n
    frames = []
    transparent = None
    delay_cs = 0
    while off < len(b):
        marker = b[off]
        off += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = b[off]
            off += 1
            blocks = []
            while b[off] != 0:
                ln = b[off]
                blocks.append(b[off + 1 : off + 1 + ln])
                off += 1 + ln
            off += 1  # terminator
            if label == 0xF9 and blocks:  # graphic control
                gflags, delay, tidx = struct.unpack("<BHB", blocks[0][:4])
                delay_cs = delay
                transparent = tidx if gflags & 0x01 else None
            continue
        if marker != 0x2C:
            raise ValueError(f"unknown GIF block marker {marker:#x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", b[off : off + 9])
        off += 9
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8).reshape(-1, 3)
            off += 3 * n
        else:
            ct = gct
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code = b[off]
        off += 1
        data = bytearray()
        while b[off] != 0:
            ln = b[off]
            data.extend(b[off + 1 : off + 1 + ln])
            off += 1 + ln
        off += 1
        idx = np.array(
            _lzw_decode(min_code, bytes(data), w * h), dtype=np.int64
        ).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if idx.max() >= len(ct):
            raise ValueError("GIF pixel index out of color-table range")
        rgba = np.concatenate(
            [ct[idx], np.full((h, w, 1), 255, dtype=np.uint8)], axis=2
        )
        if transparent is not None and transparent < len(ct):
            rgba[idx == transparent, 3] = 0
        frames.append(
            {
                "top": top, "left": left, "height": h, "width": w,
                "delay_cs": delay_cs, "pixels": rgba,
            }
        )
        transparent, delay_cs = None, 0
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return {"height": sh, "width": sw, "frames": frames}


# ---------------------------------------------------------------------------
# Encoder (independent bit-composition path, for round-trips + fixtures)
# ---------------------------------------------------------------------------


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []

    def emit(code: int, width: int) -> None:
        for k in range(width):
            out_bits.append((code >> k) & 1)

    def reset():
        return {(i,): i for i in range(clear)}, min_code_size + 1, clear + 2

    table, width, next_code = reset()
    emit(clear, width)
    cur: tuple[int, ...] = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                # the code just assigned crossed the width boundary:
                # subsequent emissions use the wider size (decoder
                # mirrors this when ITS next_code hits 1<<width)
                width += 1
        else:
            emit(clear, width)
            table, width, next_code = reset()
        cur = (px,)
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    padded = out_bits + [0] * (-len(out_bits) % 8)
    return np.packbits(
        np.array(padded, dtype=np.uint8), bitorder="little"
    ).tobytes()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif_bytes(
    frames: list, palette, transparent: int | None = None,
    delay_cs: int = 0, interlace: bool = False,
) -> bytes:
    """Encode indexed frames (each an (H, W) uint8 index array, all the
    same size) with one global ``palette`` ((N, 3) uint8, N a power of
    two >= 2) into a GIF89a."""
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    if n < 2 or n & (n - 1):
        raise ValueError("palette size must be a power of two >= 2")
    depth = int(n).bit_length() - 1
    f0 = np.asarray(frames[0])
    h, w = f0.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, depth)
    for fr in frames:
        arr = np.asarray(fr, dtype=np.uint8)
        if transparent is not None or delay_cs:
            gflags = 0x01 if transparent is not None else 0x00
            out += b"\x21\xf9\x04"
            out += struct.pack(
                "<BHB", gflags, delay_cs,
                transparent if transparent is not None else 0,
            )
            out += b"\x00"
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        out += bytes([min_code])
        rows = arr
        if interlace:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, h, step)
            ]
            rows = arr[np.asarray(order)]
        out += _sub_blocks(
            _lzw_encode(min_code, rows.ravel().tolist())
        )
    out += b"\x3b"
    return bytes(out)

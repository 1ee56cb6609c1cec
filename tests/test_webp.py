"""WebP-lossless (VP8L) codec tests.

Round trips run through the module's own minimal encoder (literal
symbols, canonical + simple codes, optional SUBTRACT_GREEN); the
decode-only paths the encoder never produces — palette bundling,
predictor transform, color cache, LZ77 backward references — are
exercised by streams HAND-BUILT bit-by-bit here with the module's
low-level writer primitives, with expected pixels derived from the
spec's definitions independently of the decoder.
"""

import struct

import numpy as np
import pytest

from speech_data_pipeline_spark.operators.webp import (
    _canonical_codes,
    _LsbWriter,
    _write_code_lengths,
    _write_symbol,
    decode_webp_bytes,
    encode_webp_bytes,
)


def _wrap_vp8l(body_bits: _LsbWriter) -> bytes:
    data = b"\x2f" + body_bits.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_simple_one(w: _LsbWriter, sym: int) -> None:
    """simple Huffman code, exactly one symbol (zero bits to decode)."""
    w.write(1, 1)
    w.write(0, 1)
    w.write(1, 1)  # 8-bit symbol
    w.write(sym, 8)


def _write_simple_two(w: _LsbWriter, a: int, b: int) -> dict:
    """simple Huffman code with two symbols; returns symbol→(code,len)
    (canonical: smaller symbol = bit 0)."""
    a, b = sorted((a, b))
    w.write(1, 1)
    w.write(1, 1)
    w.write(1, 1)  # 8-bit first symbol
    w.write(a, 8)
    w.write(b, 8)
    return {a: (0, 1), b: (1, 1)}


def _header(w: _LsbWriter, width: int, height: int) -> None:
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version


# ---------------------------------------------------------------------------
# encoder round trips
# ---------------------------------------------------------------------------


def test_roundtrip_exact_rgb_and_rgba():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (16, 23, 3), dtype=np.uint8)
    d = decode_webp_bytes(encode_webp_bytes(rgb))
    assert (d["width"], d["height"], d["channels"]) == (23, 16, 4)
    assert np.array_equal(d["pixels"][:, :, :3], rgb)
    assert np.all(d["pixels"][:, :, 3] == 255)
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_webp_bytes(encode_webp_bytes(rgba))["pixels"], rgba
    )


def test_roundtrip_subtract_green_transform():
    rng = np.random.default_rng(2)
    rgba = rng.integers(0, 256, (12, 8, 4), dtype=np.uint8)
    blob = encode_webp_bytes(rgba, subtract_green=True)
    assert np.array_equal(decode_webp_bytes(blob)["pixels"], rgba)


def test_roundtrip_simple_codes_and_gray():
    two = np.where(
        np.random.default_rng(3).random((8, 8)) < 0.5, 10, 200
    ).astype(np.uint8)
    d = decode_webp_bytes(encode_webp_bytes(two))
    assert np.array_equal(d["pixels"][:, :, 0], two)
    assert np.array_equal(d["pixels"][:, :, 1], two)  # gray replicated
    flat = np.full((3, 3), 77, dtype=np.uint8)
    assert np.all(
        decode_webp_bytes(encode_webp_bytes(flat))["pixels"][:, :, 2] == 77
    )


def test_roundtrip_single_pixel_and_wide():
    one = np.array([[123]], dtype=np.uint8)
    d = decode_webp_bytes(encode_webp_bytes(one))
    assert d["pixels"][0, 0, 0] == 123
    wide = np.tile(np.arange(64, dtype=np.uint8) * 4, (2, 1))
    d = decode_webp_bytes(encode_webp_bytes(wide))
    assert np.array_equal(d["pixels"][:, :, 0], wide)


# ---------------------------------------------------------------------------
# hand-built decode-only paths
# ---------------------------------------------------------------------------


def _write_literal_group_simple(
    w: _LsbWriter, green_syms, red_sym, blue_sym, alpha_sym, n_green
):
    """One Huffman group where green uses a 2-symbol simple code and
    the other channels 1-symbol codes. Returns the green code map."""
    gcodes = _write_simple_two(w, *green_syms)
    _write_simple_one(w, red_sym)
    _write_simple_one(w, blue_sym)
    _write_simple_one(w, alpha_sym)
    _write_simple_one(w, 0)  # distance (unused)
    return gcodes


def test_handbuilt_palette_with_bundling():
    """2-color palette → pbits=3 (8 pixels per packed byte). A 10×1
    image packs into 2 green bytes; expected colors derived from the
    delta-coded palette by hand."""
    w = _LsbWriter()
    _header(w, 10, 1)
    # transforms: COLOR_INDEXING with 2 colors
    w.write(1, 1)  # transform present
    w.write(3, 2)  # COLOR_INDEXING
    w.write(1, 8)  # n_colors - 1 = 1
    # palette entropy image (2 wide, 1 tall), no meta/cache allowed:
    # entry 0 = ARGB(255, 10, 20, 30); entry 1 is DELTA-coded:
    # stored (0, 100, 50, 25) -> actual (255, 110, 70, 55)
    gp = _write_simple_two(w, 20, 50)
    rp = _write_simple_two(w, 10, 100)
    bp = _write_simple_two(w, 30, 25)
    ap = _write_simple_two(w, 255, 0)
    _write_simple_one(w, 0)  # distance
    for g, r, b, a in ((20, 10, 30, 255), (50, 100, 25, 0)):
        _write_symbol(w, gp, g)
        _write_symbol(w, rp, r)
        _write_symbol(w, bp, b)
        _write_symbol(w, ap, a)
    w.write(0, 1)  # no more transforms
    # main image: packed width = ceil(10/8) = 2, indices LSB-first:
    # pixels 0..9 = 0,1,0,1,1,0,0,1, 1,0 -> byte0 = 0b10011010 = 0x9A,
    # byte1 = 0b01 = 0x01
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta huffman
    gm = _write_literal_group_simple(w, (0x9A, 0x01), 0, 0, 255, 256 + 24)
    for packed in (0x9A, 0x01):
        _write_symbol(w, gm, packed)
    d = decode_webp_bytes(_wrap_vp8l(w))
    px = d["pixels"]
    want_idx = [0, 1, 0, 1, 1, 0, 0, 1, 1, 0]
    pal = [(110, 70, 55, 255), (10, 20, 30, 255)]
    # NB: palette entry 0 decodes to (10,20,30,255); entry 1 to
    # (110,70,55,255). Map indices accordingly.
    pal = {0: (10, 20, 30, 255), 1: (110, 70, 55, 255)}
    for x, idx in enumerate(want_idx):
        assert tuple(px[0, x]) == pal[idx], (x, idx, tuple(px[0, x]))


def test_handbuilt_predictor_mode_T():
    """PREDICTOR transform, every block mode 2 (= T, the pixel above).
    3×3 image: residuals chosen so the reconstruction is an exact
    vertical ramp. Row 0 uses the spec's border rules (pixel (0,0) +=
    ARGB(255,0,0,0); rest of row 0 predicts L)."""
    w = _LsbWriter()
    _header(w, 3, 3)
    w.write(1, 1)
    w.write(0, 2)  # PREDICTOR
    w.write(0, 3)  # bits-2=0 -> block size 4 -> 1x1 mode image
    # mode image: single pixel, green = mode 2
    _write_simple_one(w, 2)  # green
    _write_simple_one(w, 0)  # red
    _write_simple_one(w, 0)  # blue
    _write_simple_one(w, 0)  # alpha
    _write_simple_one(w, 0)  # distance
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    # residual stream. Targets: green channel ramp row y = 10*(y+1),
    # red/blue 0, alpha 255. Residuals (ARGB):
    # (0,0): target (255,0,10,0) minus border pred (255,0,0,0) = (0,0,10,0)
    # (0,1..2): predict L -> residual 0 except nothing changes: green 0
    # row 1: predict T: green residual 10; alpha residual 0
    # row 2: same: green residual 10
    greens = [10, 0, 0, 10, 10, 10, 10, 10, 10]
    alphas = [0, 0, 0, 0, 0, 0, 0, 0, 0]
    gcodes = _write_simple_two(w, 10, 0)
    _write_simple_one(w, 0)  # red
    _write_simple_one(w, 0)  # blue
    acodes = _write_simple_two(w, 0, 255)
    _write_simple_one(w, 0)  # distance
    # alpha residuals are all 0: pixel (0,0)'s border prediction
    # already carries A=255, and T/L propagate it
    for g, a in zip(greens, alphas):
        _write_symbol(w, gcodes, g)
        _write_symbol(w, acodes, a)
    d = decode_webp_bytes(_wrap_vp8l(w))
    px = d["pixels"]
    for y in range(3):
        for x in range(3):
            assert tuple(px[y, x]) == (0, 10 * (y + 1), 0, 255), (y, x)


def test_handbuilt_lz77_direct_distance():
    """Backward reference with a DIRECT distance code (>120): literal
    pixel then a length-3 copy at distance 1 = solid run of 4."""
    w = _LsbWriter()
    _header(w, 4, 1)
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    # green code: symbols {42, 258} (258 = length code 2 -> length 3);
    # 258 exceeds the simple code's 8-bit symbol field, so write a
    # normal code-length-coded code
    lengths = [0] * (256 + 24)
    lengths[42] = 1
    lengths[258] = 1
    _write_code_lengths(w, lengths)
    gcodes = _canonical_codes({42: 1, 258: 1})
    _write_simple_one(w, 7)  # red
    _write_simple_one(w, 9)  # blue
    _write_simple_one(w, 255)  # alpha
    # distance code: single symbol 120 -> prefix value = dcode... we
    # need dcode = 121 => prefix code for 121: code 13 gives
    # offset (2+(13&1))<<((13-2)>>1) = 3<<5 = 96, +extra(5 bits)+1.
    # 121 = 96 + extra + 1 -> extra = 24. Simpler: use prefix code 12:
    # (2+0)<<5=64, 64+extra+1=121 -> extra=56 > 31 (5 bits) invalid.
    # code 13 extra bits = (13-2)>>1 = 5 -> extra 24 fits.
    _write_simple_one(w, 13)
    _write_symbol(w, gcodes, 42)  # literal green
    # length code 258: green symbol; then distance symbol (0 bits,
    # single) then 5 extra bits = 24
    _write_symbol(w, gcodes, 258)
    w.write(24, 5)
    d = decode_webp_bytes(_wrap_vp8l(w))
    px = d["pixels"]
    for x in range(4):
        assert tuple(px[0, x]) == (7, 42, 9, 255), x


def test_handbuilt_color_cache():
    """Color cache: literal inserts, cache symbol re-emits. cache_bits
    = 1; the cache key of ARGB(255, 7, 42, 9) is computed here from
    the spec's multiplier independently."""
    argb = (255 << 24) | (7 << 16) | (42 << 8) | 9
    key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31  # cache_bits=1
    w = _LsbWriter()
    _header(w, 2, 1)
    w.write(0, 1)  # no transforms
    w.write(1, 1)  # color cache present
    w.write(1, 4)  # cache_bits = 1
    w.write(0, 1)  # no meta
    n_green = 256 + 24 + 2
    cache_sym = 256 + 24 + key
    # cache symbols exceed 255, so a SIMPLE code cannot express them
    # (8-bit symbol fields) — write a normal code-length-coded code
    lengths = [0] * n_green
    lengths[42] = 1
    lengths[cache_sym] = 1
    _write_code_lengths(w, lengths)
    gcodes = _canonical_codes({42: 1, cache_sym: 1})
    _write_simple_one(w, 7)
    _write_simple_one(w, 9)
    _write_simple_one(w, 255)
    _write_simple_one(w, 0)  # distance
    _write_symbol(w, gcodes, 42)  # literal -> inserts into cache
    _write_symbol(w, gcodes, cache_sym)  # cache hit
    d = decode_webp_bytes(_wrap_vp8l(w))
    px = d["pixels"]
    assert tuple(px[0, 0]) == (7, 42, 9, 255)
    assert tuple(px[0, 1]) == (7, 42, 9, 255)
    assert n_green == 282  # documented symbol-space arithmetic


# ---------------------------------------------------------------------------
# rejection / corruption
# ---------------------------------------------------------------------------


def test_rejects_lossy_and_extended():
    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp_bytes(lossy)
    vp8x = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8X" + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="extended"):
        decode_webp_bytes(vp8x)


def test_rejects_non_webp_and_bad_signature():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp_bytes(b"\x89PNG\r\n\x1a\nxxxxxxxx")
    bad = bytearray(encode_webp_bytes(np.full((2, 2), 5, dtype=np.uint8)))
    bad[20] = 0x00  # clobber the VP8L signature byte
    with pytest.raises(ValueError, match="signature"):
        decode_webp_bytes(bytes(bad))


def test_rejects_truncation():
    good = encode_webp_bytes(
        np.random.default_rng(5).integers(0, 256, (8, 8), dtype=np.uint8)
    )
    with pytest.raises(ValueError):
        decode_webp_bytes(good[: len(good) - (len(good) - 24) // 2])


# ---------------------------------------------------------------------------
# Spark-side dispatch
# ---------------------------------------------------------------------------


def test_decode_image_bytes_dispatches_webp():
    from speech_data_pipeline_spark.operators.multimodal import (
        decode_image_bytes,
    )

    img = np.full((6, 6), 120, dtype=np.uint8)
    gray = decode_image_bytes(encode_webp_bytes(img))
    assert gray.shape == (6, 6)
    assert np.abs(gray - 120.0 / 255.0).max() < 1e-9


def test_handbuilt_predictor_mode_13_truncates_toward_zero():
    """ClampAddSubtractHalf (mode 13) uses C integer division for
    (a - b) / 2 — truncation toward ZERO. 2×2 image whose bottom-right
    pixel has a NEGATIVE ODD delta: avg2(L,T)=10, TL=13 ⇒ pred green
    = clamp(10 + trunc(-3/2)) = 9; a floor shift would give 8 and the
    difference would propagate through later predictions."""
    w = _LsbWriter()
    _header(w, 2, 2)
    w.write(1, 1)
    w.write(0, 2)  # PREDICTOR
    w.write(0, 3)  # bits-2=0 -> block size 4 -> 1x1 mode image
    _write_simple_one(w, 13)  # green = mode 13
    _write_simple_one(w, 0)   # red
    _write_simple_one(w, 0)   # blue
    _write_simple_one(w, 0)   # alpha
    _write_simple_one(w, 0)   # distance
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta huffman
    # residual greens: (0,0) border pred green 0 -> 13; (0,1) predicts
    # L -> target 10 needs 253; (1,0) predicts T -> 253; (1,1) mode 13
    # pred 9, target 9 -> residual 0
    lengths = [0] * (256 + 24)
    lengths[13] = 1
    lengths[253] = 2
    lengths[0] = 2
    _write_code_lengths(w, lengths)
    gcodes = _canonical_codes({13: 1, 253: 2, 0: 2})
    _write_simple_one(w, 0)    # red residuals all 0
    _write_simple_one(w, 0)    # blue
    _write_simple_one(w, 0)    # alpha residuals all 0 (border A=255)
    _write_simple_one(w, 0)    # distance (unused)
    for g in (13, 253, 253, 0):
        _write_symbol(w, gcodes, g)
    px = decode_webp_bytes(_wrap_vp8l(w))["pixels"]
    assert tuple(px[0, 0]) == (0, 13, 0, 255)
    assert tuple(px[0, 1]) == (0, 10, 0, 255)
    assert tuple(px[1, 0]) == (0, 10, 0, 255)
    assert tuple(px[1, 1]) == (0, 9, 0, 255)  # 8 under a floor shift

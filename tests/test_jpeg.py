"""Baseline JPEG codec tests.

Known-answer fixtures are built MARKER BY MARKER by hand (hand-chosen
Huffman tables, hand-packed scan bits, expected pixels derived from the
T.81 Annex A IDCT definition written out independently with explicit
cosines) so
the decoder is checked against the spec, not against this repo's own
encoder; the encoder round-trips then cover the full pipeline
(subsampling, quality scaling, byte stuffing, odd dimensions), and the
Spark path (decode_image_bytes / resize_frames) gets real JPEG pixels.
"""

import struct

import numpy as np
import pytest

from speech_data_pipeline_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg_bytes,
    encode_jpeg_bytes,
    fdct2,
    idct2,
)


# ---------------------------------------------------------------------------
# hand-built streams
# ---------------------------------------------------------------------------


def _dqt(tq: int, values64, sixteen_bit=False) -> bytes:
    """DQT marker, values given in NATURAL order, written zigzag."""
    zz = [0] * 64
    for i, z in enumerate(ZIGZAG):
        zz[i] = values64[z]
    if sixteen_bit:
        body = bytes([16 * 1 + tq]) + b"".join(
            struct.pack(">H", v) for v in zz
        )
    else:
        body = bytes([tq]) + bytes(zz)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def _dht(tc: int, th: int, bits, huffval) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _sof0(h: int, w: int, comps) -> bytes:
    body = b"\x08" + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hv, tq in comps:
        body += bytes([cid, hv, tq])
    return b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body


def _sos(comps) -> bytes:
    body = bytes([len(comps)])
    for cs, td, ta in comps:
        body += bytes([cs, (td << 4) | ta])
    body += b"\x00\x3f\x00"
    return b"\xff\xda" + struct.pack(">H", 2 + len(body) - 0) + body


#: trivial 1-entry Huffman tables: a single 1-bit code '0'.
def _trivial_dc(category: int):
    return [1] + [0] * 15, [category]


_EOB_ONLY_AC = ([1] + [0] * 15, [0x00])


def _flat_gray_jpeg(sixteen_bit_dqt=False) -> bytes:
    """8×8 grayscale, quant all-ones, one DC-only block.

    DC table maps code '0' (1 bit) → category 6; scan bits are
    '0' + '100000' (diff = +32) + '0' (EOB) = 0b01000000 = 0x40.
    Expected: S(0,0) = 32 ⇒ every sample 32/8 = 4, +128 ⇒ 132.
    """
    return (
        b"\xff\xd8"
        + _dqt(0, [1] * 64, sixteen_bit=sixteen_bit_dqt)
        + _dht(0, 0, *_trivial_dc(6))
        + _dht(1, 0, *_EOB_ONLY_AC)
        + _sof0(8, 8, [(1, 0x11, 0)])
        + _sos([(1, 0, 0)])
        + bytes([0b01000000])
        + b"\xff\xd9"
    )


def test_handbuilt_flat_block():
    d = decode_jpeg_bytes(_flat_gray_jpeg())
    assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
    assert np.all(d["pixels"] == 132)


def test_handbuilt_flat_block_16bit_dqt():
    d = decode_jpeg_bytes(_flat_gray_jpeg(sixteen_bit_dqt=True))
    assert np.all(d["pixels"] == 132)


def test_handbuilt_ac_coefficient():
    """DC 0 plus one AC at zigzag position 1 = coefficient (0, 1).

    DC table: code '0' → category 0 (diff 0, no extra bits).
    AC table: 2-bit codes '00' → 0x01 (run 0, size 1), '01' → 0x00
    (EOB). Scan: '0' (DC cat 0) + '00' (AC run0/size1) + '1'
    (value +1) + '01' (EOB) = 000101·· → pad with 1s → 0b00010111.
    Expected pixel (x, y): per T.81 A.3.3 with only S(0,1) = 1:
      f(x, y) = (1/4) C(1) cos((2x+1)π/16)  (independent of y)
    """
    stream = (
        b"\xff\xd8"
        + _dqt(0, [1] * 64)
        + _dht(0, 0, *_trivial_dc(0))
        + _dht(1, 0, [0, 2] + [0] * 14, [0x01, 0x00])
        + _sof0(8, 8, [(1, 0x11, 0)])
        + _sos([(1, 0, 0)])
        + bytes([0b00010111])
        + b"\xff\xd9"
    )
    d = decode_jpeg_bytes(stream)
    x = np.arange(8)
    expected_row = (
        0.25 * (np.sqrt(0.5)) * np.cos((2 * x + 1) * 1 * np.pi / 16.0)
    )
    want = np.clip(np.round(128.0 + expected_row), 0, 255).astype(np.uint8)
    got = d["pixels"][..., 0]
    assert np.all(got == want[np.newaxis, :].repeat(8, axis=0))


def test_handbuilt_restart_markers():
    """8×16 grayscale (two MCUs), DRI = 1: an RST0 between the blocks
    must byte-align and RESET the DC predictor — both blocks encode
    diff +32, so with the reset both decode to 132; a decoder that
    failed to reset would show 136 in the second block."""
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    stream = (
        b"\xff\xd8"
        + _dqt(0, [1] * 64)
        + _dht(0, 0, *_trivial_dc(6))
        + _dht(1, 0, *_EOB_ONLY_AC)
        + dri
        + _sof0(8, 16, [(1, 0x11, 0)])
        + _sos([(1, 0, 0)])
        + bytes([0b01000000])  # MCU 0: diff +32, EOB (exactly 8 bits)
        + b"\xff\xd0"  # RST0
        + bytes([0b01000000])  # MCU 1: diff +32 again after reset
        + b"\xff\xd9"
    )
    d = decode_jpeg_bytes(stream)
    assert (d["width"], d["height"]) == (16, 8)
    assert np.all(d["pixels"] == 132)


# ---------------------------------------------------------------------------
# DCT properties
# ---------------------------------------------------------------------------


def test_dct_roundtrip_and_orthonormality():
    rng = np.random.default_rng(1)
    blk = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(idct2(fdct2(blk)), blk, atol=1e-9)
    # flat block concentrates all energy in DC = 8 * mean
    flat = np.full((8, 8), 10.0)
    coef = fdct2(flat)
    assert abs(coef[0, 0] - 80.0) < 1e-9
    assert np.abs(coef).sum() - abs(coef[0, 0]) < 1e-9


# ---------------------------------------------------------------------------
# encoder round-trips
# ---------------------------------------------------------------------------


def test_roundtrip_gray_gradient():
    img = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (32, 1))
    d = decode_jpeg_bytes(encode_jpeg_bytes(img, quality=95))
    assert (d["width"], d["height"], d["channels"]) == (64, 32, 1)
    err = np.abs(d["pixels"][..., 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def test_roundtrip_rgb_444_smooth():
    yy, xx = np.mgrid[0:24, 0:40]
    rgb = np.stack(
        [
            100 + 3 * np.sin(xx / 6.0),
            120 + 3 * np.cos(yy / 5.0),
            90 + (xx + yy) / 4.0,
        ],
        axis=2,
    ).astype(np.uint8)
    d = decode_jpeg_bytes(encode_jpeg_bytes(rgb, quality=95))
    assert d["channels"] == 3
    err = np.abs(d["pixels"].astype(int) - rgb.astype(int))
    assert err.max() <= 6  # chroma quantization at q=95


def test_roundtrip_rgb_420_flat_odd_dims():
    rgb = np.zeros((17, 19, 3), dtype=np.uint8)
    rgb[...] = (200, 60, 90)
    d = decode_jpeg_bytes(encode_jpeg_bytes(rgb, quality=90, subsample=True))
    assert (d["width"], d["height"]) == (19, 17)
    assert np.abs(d["pixels"].astype(int) - rgb.astype(int)).max() <= 1


def test_roundtrip_420_structure():
    """4:2:0 on block-structured content: luma detail survives, chroma
    is block-averaged — decoded luma must track the source closely."""
    yy, xx = np.mgrid[0:32, 0:32]
    rgb = np.stack(
        [128 + 60 * np.sin(xx / 4.0)] * 3, axis=2
    ).astype(np.uint8)
    d = decode_jpeg_bytes(encode_jpeg_bytes(rgb, quality=92, subsample=True))
    luma_in = rgb[..., 0].astype(float)
    luma_out = d["pixels"].astype(float).mean(axis=2)
    assert np.abs(luma_in - luma_out).mean() < 4.0


def test_byte_stuffing_roundtrip():
    """Content chosen to produce 0xFF bytes in the entropy stream —
    the FF 00 stuffing must be written and stripped transparently."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    d = decode_jpeg_bytes(encode_jpeg_bytes(img, quality=50))
    assert (d["width"], d["height"]) == (40, 40)  # decodes, no desync
    # lossy at q=50 on noise, but must stay within coarse bounds
    err = np.abs(d["pixels"][..., 0].astype(int) - img.astype(int))
    assert err.mean() < 80


# ---------------------------------------------------------------------------
# rejection / corruption
# ---------------------------------------------------------------------------


def test_rejects_progressive():
    stream = (
        b"\xff\xd8"
        + _dqt(0, [1] * 64)
        + b"\xff\xc2"  # SOF2
        + struct.pack(">H", 11)
        + b"\x08" + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_bytes(stream)


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"\x89PNG\r\n\x1a\n")
    good = encode_jpeg_bytes(np.full((8, 8), 77, dtype=np.uint8))
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg_bytes(good[: len(good) // 2])


def test_rejects_sos_before_sof():
    stream = (
        b"\xff\xd8"
        + _dqt(0, [1] * 64)
        + _dht(0, 0, *_trivial_dc(0))
        + _dht(1, 0, *_EOB_ONLY_AC)
        + _sos([(1, 0, 0)])
    )
    with pytest.raises(ValueError, match="SOS before SOF"):
        decode_jpeg_bytes(stream)


def test_rejects_marker_desync():
    d = bytearray(_flat_gray_jpeg())
    d[2] = 0x00  # clobber the first marker's FF
    with pytest.raises(ValueError, match="lost marker sync"):
        decode_jpeg_bytes(bytes(d))


# ---------------------------------------------------------------------------
# Spark-side plumbing
# ---------------------------------------------------------------------------


def test_decode_image_bytes_dispatches_jpeg():
    from speech_data_pipeline_spark.operators.multimodal import (
        decode_image_bytes,
    )

    img = np.full((16, 16), 100, dtype=np.uint8)
    gray = decode_image_bytes(encode_jpeg_bytes(img, quality=95))
    assert gray.shape == (16, 16)
    assert np.abs(gray - 100.0 / 255.0).max() < 0.01


def test_resize_frames_real_jpeg(spark):
    from speech_data_pipeline_spark.operators.multimodal import resize_frames

    imgs = []
    for i, (hh, ww) in enumerate([(24, 32), (16, 16)]):
        px = np.full((hh, ww), 50 + 100 * i, dtype=np.uint8)
        imgs.append((i, bytearray(encode_jpeg_bytes(px, quality=95))))
    df = spark.createDataFrame(imgs, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in resize_frames(
            df, out_h=4, out_w=4, fake_decode=False
        ).collect()
    }
    assert len(out) == 2
    for i in (0, 1):
        vals = np.array(out[i]["pixels"])
        want = (50 + 100 * i) / 255.0
        assert np.abs(vals - want).max() < 0.02


def test_fill_bytes_before_marker():
    """0xFF fill bytes between segments are spec-legal padding."""
    s = _flat_gray_jpeg()
    # insert two fill bytes before the DQT marker (after SOI)
    padded = s[:2] + b"\xff\xff" + s[2:]
    d = decode_jpeg_bytes(padded)
    assert np.all(d["pixels"] == 132)


def test_single_component_scan_ignores_declared_sampling():
    """T.81 §A.2: single-component scans are non-interleaved (one data
    unit per MCU in raster order) regardless of SOF sampling factors.
    Patching the grayscale component's h/v byte from 1x1 to 2x2 must
    not change the decoded pixels."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    data = encode_jpeg_bytes(img, quality=95)
    ref = decode_jpeg_bytes(data)["pixels"]
    i = data.find(b"\xff\xc0")
    assert i >= 0 and data[i + 11] == 0x11
    patched = bytearray(data)
    patched[i + 11] = 0x22
    got = decode_jpeg_bytes(bytes(patched))["pixels"]
    assert np.array_equal(got, ref)


def test_truncated_entropy_stream_raises_valueerror():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    data = encode_jpeg_bytes(img, quality=95)
    i = data.find(b"\xff\xda")
    assert i >= 0
    with pytest.raises(ValueError):
        decode_jpeg_bytes(data[: i + 2 + 8 + 2])

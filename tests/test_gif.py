"""GIF codec tests: a hand-packed LZW micro-stream (bit order, clear/
EOI, the 3→4-bit width crossing worked out by hand below), encoder
round-trips (KwKwK, dict growth to 12 bits, clear-on-full, interlace,
transparency, animation), and failure modes."""

import struct

import numpy as np
import pytest

from speech_data_pipeline_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_bytes,
    encode_gif_bytes,
)


def test_lzw_hand_packed_stream():
    # min_code_size=2: clear=4, eoi=5, first dict slot 6, width starts 3.
    # Pixels [1,1,0,0]:
    #   emit clear(4)@3        add -
    #   emit 1@3               add (1,1)=6
    #   emit 1@3               add (1,0)=7
    #   emit 0@3               add (0,0)=8 -> width becomes 4
    #   emit 0@4, emit eoi(5)@4
    # LSB-first bit stream: 001 100 100 000 0000 1010 — packed bytes:
    #   idx0-7  = 0,0,1,1,0,0,1,0 -> 0x4C
    #   idx8-15 = 0,0,0,0,0,0,0,0 -> 0x00
    #   idx16-19= 1,0,1,0         -> 0x05
    assert _lzw_decode(2, bytes([0x4C, 0x00, 0x05]), 4) == [1, 1, 0, 0]
    # The encoder must produce exactly the same stream.
    assert _lzw_encode(2, [1, 1, 0, 0]) == bytes([0x4C, 0x00, 0x05])


def test_lzw_kwkwk_case():
    # Runs of a single symbol hit the code==next_code (KwKwK) branch.
    idx = [0] * 50
    assert _lzw_decode(2, _lzw_encode(2, idx), 50) == idx


def test_lzw_width_growth_and_reset():
    rng = np.random.default_rng(1)
    # Enough entropy to push the dict past several width bumps; long
    # enough that a 12-bit-full clear/reset occurs for 2-bit codes.
    idx = rng.integers(0, 4, size=30_000).tolist()
    assert _lzw_decode(2, _lzw_encode(2, idx), len(idx)) == idx


def _palette4():
    return np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )


def test_decode_hand_built_gif():
    pal = _palette4()
    lzw = bytes([0x4C, 0x00, 0x05])  # the hand-packed [1,1,0,0] stream
    blob = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # GCT, 4 colors
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])  # LZW min code size
        + bytes([3]) + lzw + bytes([0])
        + b"\x3b"
    )
    d = decode_gif_bytes(blob)
    assert (d["height"], d["width"]) == (2, 2)
    f = d["frames"][0]
    assert f["pixels"][0, 0].tolist() == [255, 0, 0, 255]  # index 1
    assert f["pixels"][0, 1].tolist() == [255, 0, 0, 255]
    assert f["pixels"][1, 0].tolist() == [0, 0, 0, 255]    # index 0
    assert f["pixels"][1, 1].tolist() == [0, 0, 0, 255]


def _roundtrip(frames, **kw):
    pal = _palette4()
    d = decode_gif_bytes(encode_gif_bytes(frames, pal, **kw))
    assert len(d["frames"]) == len(frames)
    for fr, want in zip(d["frames"], frames):
        got_idx = np.zeros_like(np.asarray(want))
        # invert palette: match RGB back to index
        for i, rgb in enumerate(pal):
            got_idx[np.all(fr["pixels"][..., :3] == rgb, axis=-1)] = i
        assert got_idx.tolist() == np.asarray(want).tolist()
    return d


def test_roundtrip_single_frame():
    rng = np.random.default_rng(2)
    _roundtrip([rng.integers(0, 4, size=(17, 23), dtype=np.uint8)])


def test_roundtrip_animation_with_delay():
    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 4, size=(9, 11), dtype=np.uint8) for _ in range(4)
    ]
    d = _roundtrip(frames, delay_cs=7)
    assert all(f["delay_cs"] == 7 for f in d["frames"])


def test_roundtrip_interlaced():
    rng = np.random.default_rng(4)
    # Height spanning all four interlace passes, not a multiple of 8.
    _roundtrip([rng.integers(0, 4, size=(21, 5), dtype=np.uint8)],
               interlace=True)


def test_transparency_index():
    img = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    d = decode_gif_bytes(
        encode_gif_bytes([img], _palette4(), transparent=2)
    )
    a = d["frames"][0]["pixels"][..., 3]
    assert a.tolist() == [[255, 255], [0, 255]]


def test_large_palette_width12_dict():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    # Make palette rows unique so the RGB->index inversion is exact.
    pal[:, 0] = np.arange(256) % 256
    pal[:, 1] = np.arange(256) // 16
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    d = decode_gif_bytes(encode_gif_bytes([img], pal))
    fr = d["frames"][0]["pixels"]
    assert fr.shape == (64, 64, 4)
    assert np.array_equal(fr[..., 0], pal[img][..., 0])
    assert np.array_equal(fr[..., 1], pal[img][..., 1])


def test_non_gif_and_truncation_rejected():
    with pytest.raises(NotImplementedError, match="signature"):
        decode_gif_bytes(b"\x89PNG\r\n\x1a\nnot a gif")
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_gif_bytes([img], _palette4()))
    with pytest.raises(ValueError):
        decode_gif_bytes(bytes(blob[:40]) + b"\x3b")


def test_decode_image_bytes_gif_first_frame():
    from speech_data_pipeline_spark.operators.multimodal import (
        decode_image_bytes,
    )

    img = np.array([[1, 1], [0, 3]], dtype=np.uint8)
    g = decode_image_bytes(encode_gif_bytes([img, 3 - img], _palette4()))
    # First frame only; palette idx1=(255,0,0) -> luma 85/255.
    assert g.shape == (2, 2)
    assert abs(g[0, 0] - 85.0 / 255.0) < 1e-12
    assert g[1, 0] == 0.0

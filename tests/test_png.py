"""PNG codec tests. The decoder's filter inversions are checked against
HAND-FILTERED fixture bytes built chunk-by-chunk here (spec math worked
out in comments — independent of the encoder), plus encoder round-trips
for the bulk paths and CRC/interlace failure modes."""

import struct
import zlib

import numpy as np
import pytest

from speech_data_pipeline_spark.operators.png import (
    _paeth,
    decode_png_bytes,
    encode_png_bytes,
)

MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype, body):
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(width, height, depth, color, idat_raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    return (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(idat_raw))
        + _chunk(b"IEND", b"")
    )


def test_paeth_predictor_spec_cases():
    # Spec: smallest of |p-a|,|p-b|,|p-c| with ties a, then b.
    assert _paeth(0, 5, 0) == 5      # pb=0 wins
    assert _paeth(77, 255, 5) == 255
    assert _paeth(0, 0, 255) == 0    # pa == pb -> a
    assert _paeth(3, 4, 3) == 4      # p=4: pa=1,pb=0 -> b
    assert _paeth(10, 10, 10) == 10


def test_decode_hand_filtered_grayscale():
    # 3x4 8-bit grayscale; each row uses a different filter, with the
    # filtered bytes computed by hand from the spec:
    #   want row0 [10,20,30]   Sub:  10, 20-10, 30-20        -> 10,10,10
    #   want row1 [40,50,60]   Up:   40-10, 50-20, 60-30     -> 30,30,30
    #   want row2 [5,255,0]    Avg:  5-(0+40)//2, 255-(5+50)//2,
    #                                0-(255+60)//2 (mod 256) -> 241,228,99
    #   want row3 [77,0,128]   Paeth: preds 5,255,0          -> 72,1,128
    raw = bytes(
        [1, 10, 10, 10]
        + [2, 30, 30, 30]
        + [3, 241, 228, 99]
        + [4, 72, 1, 128]
    )
    d = decode_png_bytes(_png(3, 4, 8, 0, raw))
    assert (d["height"], d["width"], d["channels"], d["bit_depth"]) == (4, 3, 1, 8)
    want = [[10, 20, 30], [40, 50, 60], [5, 255, 0], [77, 0, 128]]
    assert d["pixels"][:, :, 0].tolist() == want


def test_decode_16bit_gray():
    # 2x2 16-bit gray, filter 0: big-endian sample bytes.
    raw = bytes([0, 0x00, 0x00, 0xFF, 0xFF] + [0, 0x01, 0x00, 0x02, 0x01])
    d = decode_png_bytes(_png(2, 2, 16, 0, raw))
    assert d["bit_depth"] == 16
    assert d["pixels"][:, :, 0].tolist() == [[0, 65535], [256, 513]]


def test_decode_palette_with_transparency():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    trns = bytes([128, 255])  # idx0 alpha 128, idx1 255, idx2 default 255
    raw = bytes([0, 0, 1] + [0, 2, 0])  # indices [[0,1],[2,0]]
    blob = _png(2, 2, 8, 3, raw, extra=_chunk(b"PLTE", plte) + _chunk(b"tRNS", trns))
    d = decode_png_bytes(blob)
    assert d["channels"] == 4
    px = d["pixels"]
    assert px[0, 0].tolist() == [255, 0, 0, 128]
    assert px[0, 1].tolist() == [0, 255, 0, 255]
    assert px[1, 0].tolist() == [0, 0, 255, 255]
    assert px[1, 1].tolist() == [255, 0, 0, 128]


def test_decode_packed_low_bit_depths():
    # 4-bit gray, 1x3: samples 0,7,15 -> bytes 0x07, 0xF0; scale x17.
    d = decode_png_bytes(_png(3, 1, 4, 0, bytes([0, 0x07, 0xF0])))
    assert d["pixels"][0, :, 0].tolist() == [0, 119, 255]
    # 1-bit gray, 1x10: bits 1010101010 -> 0xAA, 0x80; scale x255.
    d = decode_png_bytes(_png(10, 1, 1, 0, bytes([0, 0xAA, 0x80])))
    assert d["pixels"][0, :, 0].tolist() == [255, 0] * 5
    # 2-bit palette, 1x4: indices 0,1,2,3 -> byte 0b00011011 = 0x1B.
    plte = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    d = decode_png_bytes(
        _png(4, 1, 2, 3, bytes([0, 0x1B]), extra=_chunk(b"PLTE", plte))
    )
    assert d["pixels"][0, :, 0].tolist() == [10, 20, 30, 40]


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (4, 4, 4)])
def test_roundtrip_encoder(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    d = decode_png_bytes(encode_png_bytes(img))
    want = img if img.ndim == 3 else img[:, :, None]
    assert d["pixels"].tolist() == want.tolist()


def test_multi_idat_streams():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    scan = bytearray()
    for y in range(8):
        scan.append(0)
        scan.extend(img[y].tobytes())
    comp = zlib.compress(bytes(scan))
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    blob = (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:10])
        + _chunk(b"IDAT", comp[10:])
        + _chunk(b"IEND", b"")
    )
    d = decode_png_bytes(blob)
    assert d["pixels"][:, :, 0].tolist() == img.tolist()


def test_crc_corruption_detected():
    blob = bytearray(encode_png_bytes(np.zeros((4, 4), dtype=np.uint8)))
    blob[20] ^= 0x01  # inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png_bytes(bytes(blob))


def test_interlaced_rejected_and_non_png():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
    blob = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png_bytes(blob)
    with pytest.raises(NotImplementedError, match="signature"):
        decode_png_bytes(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_decode_image_bytes_grayscale_luma():
    from speech_data_pipeline_spark.operators.multimodal import decode_image_bytes

    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = [255, 0, 0]
    rgb[1, 1] = [255, 255, 255]
    g = decode_image_bytes(encode_png_bytes(rgb))
    assert g.shape == (2, 2)
    assert abs(g[0, 0] - (255 / 3) / 255.0) < 1e-12
    assert g[1, 1] == 1.0 and g[0, 1] == 0.0


def test_resize_frames_real_png_decode(spark):
    from speech_data_pipeline_spark.operators.multimodal import resize_frames

    # 32x32 gradient; nearest-neighbor 8x8 is exact index math.
    img = (np.arange(32)[:, None] * 8 + np.arange(32)[None, :] * 0).astype(np.uint8)
    blob = encode_png_bytes(img)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, payload binary"
    )
    rows = resize_frames(df, out_h=8, out_w=8, fake_decode=False).collect()
    assert len(rows) == 1
    got = np.asarray(rows[0]["pixels"]).reshape(8, 8)
    ri = (np.arange(8) * 32 // 8).astype(int)
    want = img[np.ix_(ri, ri)].astype(np.float64) / 255.0
    assert np.allclose(got, want)

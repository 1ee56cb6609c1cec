"""MPEG-1 Audio Layer I/II codec tests.

Layer II frame syntax (allocations, scfsi, scalefactors, grouping,
requantization) is verified by encode→decode round trips at the
SUBBAND level — quantization is the only loss there, so tolerances are
the per-class step sizes derived independently here. Requantization
closed forms are checked against the published ISO Table B.4 values.
Layer I is exercised by a frame HAND-BUILT bit by bit with expected
samples computed from the spec formula independently of the decoder.
The filterbank is measured for absolute reconstruction SNR (the
prototype-window deviation from Table 3-B.3 is documented in the
module; these tests pin the measured quality floor)."""

import numpy as np
import pytest

from speech_data_pipeline_spark.operators.mpegaudio import (
    AnalysisFilterbank,
    SynthesisFilterbank,
    _BitWriter,
    _dequant,
    _quant,
    _quant_params,
    decode_mpeg_audio_bytes,
    decode_mpeg_frame,
    encode_mpeg2_audio,
    layer2_alloc_table,
    parse_frame_header,
)

SR = 44100


# ---------------------------------------------------------------------------
# header / tables
# ---------------------------------------------------------------------------


def test_header_parse_layer2():
    w = _BitWriter()
    w.write(0x7FF, 11)
    w.write(3, 2)   # MPEG-1
    w.write(2, 2)   # Layer II
    w.write(1, 1)   # no CRC
    w.write(10, 4)  # bitrate index 10 -> 192 kbps for Layer II
    w.write(0, 2)   # 44100
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 2)   # stereo
    w.write(0, 2)
    w.write(0, 4)
    hdr = parse_frame_header(w.bytes() + b"\x00")
    assert hdr["layer"] == 2
    assert hdr["bitrate"] == 192000
    assert hdr["sr"] == 44100
    assert hdr["nch"] == 2
    assert hdr["frame_len"] == 144 * 192000 // 44100
    assert hdr["samples"] == 1152


def test_header_rejects_bad_sync_and_reserved():
    assert parse_frame_header(b"\x00\x00\x00\x00") is None
    assert parse_frame_header(b"\xff\xe6\x90\x00") is None  # MPEG-2.5
    assert parse_frame_header(b"\xff\xf9\x90\x00") is None  # layer 00


def test_quant_params_match_published_table_b4():
    # (steps, C, D) spot checks against ISO 11172-3 Table B.4
    for steps, c, d in [
        (3, 4 / 3, 0.5), (5, 1.6, 0.5), (7, 8 / 7, 0.25),
        (9, 16 / 9, 0.5), (15, 16 / 15, 0.125), (31, 32 / 31, 0.0625),
        (63, 64 / 63, 0.03125), (65535, 65536 / 65535, 2.0 ** -15),
    ]:
        nb, cc, dd = _quant_params(steps)
        assert cc == pytest.approx(c), steps
        assert dd == pytest.approx(d), steps
        assert (1 << nb) > steps >= (1 << (nb - 1))


def test_dequant_levels_symmetric_and_invertible():
    for steps in (3, 5, 7, 9, 15, 31, 63, 255, 65535):
        nb, c, d = _quant_params(steps)
        levels = [_dequant(v, nb, c, d) for v in range(steps)]
        # symmetric around 0, strictly increasing in u-order
        vals = sorted(levels)
        assert vals[0] == pytest.approx(-vals[-1])
        mid = vals[len(vals) // 2]
        assert mid == pytest.approx(0.0, abs=1e-12)
        # quantizing each level returns its own code
        for v in range(steps):
            x = _dequant(v, nb, c, d)
            assert _quant(x, steps, nb, c, d) == v


def test_alloc_table_selection():
    assert len(layer2_alloc_table(48000, 192000, 1)) == 27
    assert len(layer2_alloc_table(44100, 384000, 2)) == 30
    assert len(layer2_alloc_table(32000, 384000, 2)) == 30
    assert len(layer2_alloc_table(44100, 96000, 2)) == 8
    assert len(layer2_alloc_table(32000, 48000, 1)) == 12


# ---------------------------------------------------------------------------
# Layer I: hand-built frame, expected samples from the spec formula
# ---------------------------------------------------------------------------


def test_layer1_handbuilt_frame():
    """Mono Layer I, only subband 0 allocated (nb = 3), scf index 3
    (= 1.0). Codes chosen across the range; expected values from
    s''' = (s'' + 2^(1-nb)) * 2^nb/(2^nb - 1) computed here."""
    w = _BitWriter()
    w.write(0x7FF, 11)
    w.write(3, 2)   # MPEG-1
    w.write(3, 2)   # Layer I
    w.write(1, 1)   # no CRC
    w.write(8, 4)   # 256 kbps (Layer I index 8)
    w.write(0, 2)   # 44100
    w.write(0, 1)
    w.write(0, 1)
    w.write(3, 2)   # single channel
    w.write(0, 2)
    w.write(0, 4)
    # allocation: sb0 = 2 (nb = 3), sb1..31 = 0
    w.write(2, 4)
    for _ in range(31):
        w.write(0, 4)
    w.write(3, 6)   # scalefactor index 3 -> 2^(1-1) = 1.0
    codes = [0, 1, 2, 3, 4, 5, 6, 7, 0, 3, 5, 7]
    for v in codes:
        w.write(v, 3)
    w.pad_to_byte()
    hdr = parse_frame_header(w.bytes() + b"\x00" * 8)
    frame = w.bytes() + b"\x00" * (hdr["frame_len"] - len(w.bytes()))
    hdr2, sub = decode_mpeg_frame(frame, 0)
    assert hdr2["layer"] == 1 and sub.shape == (1, 12, 32)

    def expect(v, nb=3):
        u = v ^ (1 << (nb - 1))
        if u & (1 << (nb - 1)):
            u -= 1 << nb
        s2 = u / float(1 << (nb - 1))
        return (s2 + 2.0 ** (1 - nb)) * (1 << nb) / ((1 << nb) - 1)

    for s, v in enumerate(codes):
        assert sub[0, s, 0] == pytest.approx(expect(v)), (s, v)
    assert np.all(sub[0, :, 1:] == 0.0)


def test_layer1_joint_stereo_bound_sharing():
    """Joint stereo, mode_ext 0 -> bound 4: subbands >= bound carry ONE
    code per granule applied to both channels through their own
    scalefactors (intensity stereo)."""
    w = _BitWriter()
    w.write(0x7FF, 11)
    w.write(3, 2)
    w.write(3, 2)   # Layer I
    w.write(1, 1)
    w.write(10, 4)  # 320 kbps Layer I... index 10 -> 320
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    w.write(1, 2)   # joint stereo
    w.write(0, 2)   # mode_ext 0 -> bound 4
    w.write(0, 4)
    # allocations: below bound, per channel; sb0..3 zero for both
    for _ in range(4):
        w.write(0, 4)
        w.write(0, 4)
    # sb4 (>= bound): shared allocation nb=3
    w.write(2, 4)
    for _ in range(27):
        w.write(0, 4)
    # scalefactors: sb4 has alloc for both channels -> two 6-bit scfs
    w.write(3, 6)   # ch0: 1.0
    w.write(0, 6)   # ch1: 2.0
    for _ in range(12):
        w.write(7, 3)  # max positive code
    w.pad_to_byte()
    hdr = parse_frame_header(w.bytes() + b"\x00" * 8)
    frame = w.bytes() + b"\x00" * (hdr["frame_len"] - len(w.bytes()))
    _, sub = decode_mpeg_frame(frame, 0)
    assert sub.shape[0] == 2
    # same requantized value, different scalefactors: ch1 = 2 * ch0
    assert np.all(sub[0, :, 4] > 0)
    assert sub[1, :, 4] == pytest.approx(sub[0, :, 4] * 2.0)


# ---------------------------------------------------------------------------
# Layer II subband round trip (frame syntax, no filterbank)
# ---------------------------------------------------------------------------


def _subband_fixture(nch, sblimit, seed=7):
    rng = np.random.default_rng(seed)
    sub = np.zeros((nch, 36, 32))
    sub[:, :, :12] = rng.uniform(-0.9, 0.9, size=(nch, 36, 12))
    return sub


@pytest.mark.parametrize("nch,bitrate", [(1, 192_000), (2, 256_000)])
def test_layer2_subband_roundtrip(nch, bitrate):
    sub = _subband_fixture(nch, 30)
    from speech_data_pipeline_spark.operators.mpegaudio import (
        encode_layer2_frame,
    )

    table = layer2_alloc_table(SR, bitrate, nch)
    frame = encode_layer2_frame(sub, SR, bitrate, [4] * 12)
    hdr, got = decode_mpeg_frame(frame, 0)
    assert got.shape == (nch, 36, 32)
    for sb in range(12):
        steps = table[sb][1][3]  # allocation index 4
        # scalefactor <= 2.0; quantizer step = 2*C/steps... bound via
        # level spacing: adjacent levels differ by C * 2^(1-nb)
        nb, c, d = _quant_params(steps)
        tol = 2.0 * c * 2.0 ** (1 - nb) * 1.01
        assert np.max(np.abs(got[:, :, sb] - sub[:, :, sb])) < tol, sb
    assert np.all(got[:, :, 12:] == 0.0)


def test_layer2_scalefactor_parts():
    """Each 12-sample third gets its own scalefactor (scfsi 0): a
    fixture with very different magnitudes per third must round-trip
    each third accurately relative to ITS OWN scale."""
    sub = np.zeros((1, 36, 32))
    sub[0, 0:12, 0] = 0.9
    sub[0, 12:24, 0] = 0.009
    sub[0, 24:36, 0] = 0.00009
    from speech_data_pipeline_spark.operators.mpegaudio import (
        encode_layer2_frame,
    )

    frame = encode_layer2_frame(sub, SR, 192_000, [14] + [0] * 11)
    _, got = decode_mpeg_frame(frame, 0)
    for part, level in [(0, 0.9), (1, 0.009), (2, 0.00009)]:
        seg = got[0, 12 * part : 12 * (part + 1), 0]
        assert np.max(np.abs(seg - level) / level) < 0.01, part


# ---------------------------------------------------------------------------
# filterbank
# ---------------------------------------------------------------------------


def _cascade(x):
    a, s = AnalysisFilterbank(), SynthesisFilterbank()
    out = np.empty_like(x)
    for i in range(len(x) // 32):
        out[i * 32 : (i + 1) * 32] = s.run(a.run(x[i * 32 : (i + 1) * 32]))
    return out


FILTERBANK_DELAY = 481  # (512 analysis + 512 synthesis taps - 32 - ...)


def test_filterbank_absolute_reconstruction():
    """Analysis→synthesis on white noise: > 55 dB ABSOLUTE SNR (no
    gain fit) at delay 481 — pins both the near-PR quality of the
    documented prototype window and the unit-gain scaling."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(32 * 200) * 0.3
    y = _cascade(x)
    d = FILTERBANK_DELAY
    sx, sy = x[2000:5000], y[2000 + d : 5000 + d]
    err = sy - sx
    snr = 10 * np.log10(np.dot(sx, sx) / np.dot(err, err))
    assert snr > 55.0, snr
    gain = np.dot(sx, sy) / np.dot(sx, sx)
    assert gain == pytest.approx(1.0, abs=0.005)


def test_filterbank_sine_tones():
    t = np.arange(32 * 200)
    for f in (440.0, 3000.0, 14000.0):
        x = 0.5 * np.sin(2 * np.pi * f * t / SR)
        y = _cascade(x)
        d = FILTERBANK_DELAY
        sx, sy = x[2000:4500], y[2000 + d : 4500 + d]
        err = sy - sx
        snr = 10 * np.log10(np.dot(sx, sx) / np.dot(err, err))
        assert snr > 50.0, (f, snr)


# ---------------------------------------------------------------------------
# end to end
# ---------------------------------------------------------------------------


def test_encode_decode_mono_snr():
    t = np.arange(1152 * 10)
    x = 0.6 * np.sin(2 * np.pi * 440 * t / SR) + 0.2 * np.sin(
        2 * np.pi * 1800 * t / SR
    )
    blob = encode_mpeg2_audio([x], SR, bitrate=192_000)
    y, sr = decode_mpeg_audio_bytes(blob, mono=True)
    assert sr == SR
    y = np.array(y)
    d = FILTERBANK_DELAY
    sx, sy = x[2000:8000], y[2000 + d : 8000 + d]
    err = sy - sx
    snr = 10 * np.log10(np.dot(sx, sx) / np.dot(err, err))
    assert snr > 28.0, snr  # 9/15-step quantizers bound this fixture


def test_encode_decode_stereo_channels_kept_apart():
    t = np.arange(1152 * 6)
    left = 0.5 * np.sin(2 * np.pi * 440 * t / SR)
    right = 0.5 * np.sin(2 * np.pi * 700 * t / SR)
    blob = encode_mpeg2_audio([left, right], SR, bitrate=256_000)
    chans, sr = decode_mpeg_audio_bytes(blob, mono=False)
    assert sr == SR and len(chans) == 2
    d = FILTERBANK_DELAY
    for orig, dec in zip((left, right), chans):
        yd = np.array(dec)
        sx, sy = orig[2000:6000], yd[2000 + d : 6000 + d]
        err = sy - sx
        assert 10 * np.log10(np.dot(sx, sx) / np.dot(err, err)) > 25.0


def test_id3_prefix_skipped_and_duration_matches_probe():
    from speech_data_pipeline_spark.operators.mediainfo import (
        probe_media_bytes,
    )

    t = np.arange(1152 * 4)
    x = 0.4 * np.sin(2 * np.pi * 500 * t / SR)
    blob = encode_mpeg2_audio([x], SR, bitrate=192_000)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    y, sr = decode_mpeg_audio_bytes(id3 + blob)
    assert sr == SR and len(y) == 1152 * 4
    # the mediainfo CBR probe and the decoder agree on duration
    info = probe_media_bytes(id3 + blob)
    assert info["sample_rate"] == SR
    assert info["duration"] == pytest.approx(len(y) / SR, rel=0.05)


def test_layer3_raises_huffman_seam():
    # Layer III header (FB = MPEG-1 Layer III no-CRC), 128 kbps/44.1
    hdr = bytes([0xFF, 0xFB, 0x90, 0xC0])
    blob = hdr + b"\x00" * 413 + hdr + b"\x00" * 413
    with pytest.raises(NotImplementedError, match="Huffman"):
        decode_mpeg_audio_bytes(blob)


def test_decode_audio_bytes_dispatches_mpeg():
    from speech_data_pipeline_spark.operators.multimodal import (
        decode_audio_bytes,
    )

    t = np.arange(1152 * 4)
    x = 0.4 * np.sin(2 * np.pi * 500 * t / SR)
    blob = encode_mpeg2_audio([x], SR, bitrate=192_000)
    y, sr = decode_audio_bytes(blob)
    assert sr == SR and len(y) == 1152 * 4

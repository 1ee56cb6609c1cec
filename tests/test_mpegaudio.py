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


# ---------------------------------------------------------------------------
# Layer III structural parsing (round 9): side info, reservoir,
# scalefactors — hand-built bitstreams, expectations derived from the
# spec field widths independently of the parser
# ---------------------------------------------------------------------------

from speech_data_pipeline_spark.operators.mpegaudio import (
    _Bits,
    assemble_layer3_main_data,
    decode_layer3_scalefactors,
    parse_layer3_side_info,
    probe_layer3_stream,
)


def _l3_header(mono=True, bitrate_idx=9) -> bytes:
    w = _BitWriter()
    w.write(0x7FF, 11)
    w.write(3, 2)   # MPEG-1
    w.write(1, 2)   # Layer III
    w.write(1, 1)   # no CRC
    w.write(bitrate_idx, 4)
    w.write(0, 2)   # 44100
    w.write(0, 1)
    w.write(0, 1)
    w.write(3 if mono else 0, 2)
    w.write(0, 2)
    w.write(0, 4)
    return w.bytes()


def _granule_bits(
    w, part23=100, bigv=50, gain=200, scfc=5, short=False
):
    w.write(part23, 12)
    w.write(bigv, 9)
    w.write(gain, 8)
    w.write(scfc, 4)
    if short:
        w.write(1, 1)   # window switching
        w.write(2, 2)   # block_type 2
        w.write(0, 1)   # not mixed
        w.write(7, 5)
        w.write(9, 5)
        w.write(1, 3)
        w.write(2, 3)
        w.write(3, 3)
    else:
        w.write(0, 1)
        w.write(7, 5)
        w.write(9, 5)
        w.write(11, 5)
        w.write(6, 4)   # region0_count
        w.write(3, 3)   # region1_count
    w.write(1, 1)   # preflag
    w.write(0, 1)   # scalefac_scale
    w.write(1, 1)   # count1table_select


def _mono_side_info(main_data_begin=0, scfsi=(0, 1, 0, 1), short_gr1=False):
    w = _BitWriter()
    w.write(main_data_begin, 9)
    w.write(0, 5)   # private
    for bit in scfsi:
        w.write(bit, 1)
    _granule_bits(w, part23=100, gain=200)
    _granule_bits(w, part23=120, gain=210, short=short_gr1)
    w.pad_to_byte()
    out = w.bytes()
    assert len(out) == 17  # MPEG-1 mono side info is exactly 17 bytes
    return out


def test_side_info_mono_long_blocks():
    hdr_b = _l3_header()
    frame = hdr_b + _mono_side_info(main_data_begin=37) + b"\x00" * 396
    hdr = parse_frame_header(frame)
    si = parse_layer3_side_info(frame, 0, hdr)
    assert si["main_data_begin"] == 37
    assert si["scfsi"] == [[0, 1, 0, 1]]
    g0 = si["granules"][0][0]
    assert g0["part2_3_length"] == 100
    assert g0["big_values"] == 50
    assert g0["global_gain"] == 200
    assert g0["scalefac_compress"] == 5
    assert g0["block_type"] == 0
    assert g0["table_select"] == [7, 9, 11]
    assert (g0["region0_count"], g0["region1_count"]) == (6, 3)
    assert (g0["preflag"], g0["scalefac_scale"]) == (1, 0)


def test_side_info_short_blocks_fixed_regions():
    frame = (
        _l3_header() + _mono_side_info(short_gr1=True) + b"\x00" * 396
    )
    hdr = parse_frame_header(frame)
    g1 = parse_layer3_side_info(frame, 0, hdr)["granules"][1][0]
    assert g1["block_type"] == 2 and not g1["mixed_block"]
    assert g1["table_select"] == [7, 9]
    assert g1["subblock_gain"] == [1, 2, 3]
    # spec fixes region0/1 under window switching: 8 / 12 for pure short
    assert (g1["region0_count"], g1["region1_count"]) == (8, 12)


def test_bit_reservoir_assembly():
    hdr_b = _l3_header()
    hdr = parse_frame_header(hdr_b + b"\x00" * 430)
    mains = [bytes([i]) * 396 for i in (1, 2, 3)]
    frames = []
    for i, (mdb) in enumerate((0, 100, 300)):
        fb = hdr_b + _mono_side_info(main_data_begin=mdb) + mains[i]
        frames.append((hdr, fb, parse_layer3_side_info(fb, 0, hdr)))
    out = assemble_layer3_main_data(frames)
    assert out[0] == mains[0]
    # frame 1 starts 100 bytes back inside frame 0's main data
    assert out[1] == mains[0][-100:] + mains[1]
    # frame 2 reaches 300 bytes back into the 511-byte reservoir window
    reservoir_after_1 = (mains[0] + mains[1])[-511:]
    assert out[2] == reservoir_after_1[-300:] + mains[2]


def test_bit_reservoir_underrun_is_none():
    hdr_b = _l3_header()
    hdr = parse_frame_header(hdr_b + b"\x00" * 430)
    fb = hdr_b + _mono_side_info(main_data_begin=50) + b"\x07" * 396
    out = assemble_layer3_main_data([(hdr, fb, parse_layer3_side_info(fb, 0, hdr))])
    assert out == [None]


def test_scalefactors_long_with_scfsi_reuse():
    # scalefac_compress 5 -> (slen1, slen2) = (1, 1): 21 one-bit factors
    g = {
        "scalefac_compress": 5, "window_switching": 0,
        "block_type": 0, "mixed_block": 0,
    }
    w = _BitWriter()
    pattern = [i % 2 for i in range(21)]
    for v in pattern:
        w.write(v, 1)
    w.pad_to_byte()
    got0 = decode_layer3_scalefactors(
        _Bits(w.bytes()), g, gr=0, scfsi_ch=[0, 0, 0, 0], prev=None
    )
    assert got0["long"] == pattern
    assert got0["part2_bits"] == 21
    # granule 1 with scfsi = [1, 0, 1, 0]: bands 0-5 and 11-15 reuse
    # granule 0's values; only groups 1 and 3 (5 + 5 bands) are read
    w2 = _BitWriter()
    for _ in range(10):
        w2.write(1, 1)
    w2.pad_to_byte()
    got1 = decode_layer3_scalefactors(
        _Bits(w2.bytes()), g, gr=1, scfsi_ch=[1, 0, 1, 0],
        prev=got0["long"],
    )
    assert got1["part2_bits"] == 10
    assert got1["long"][:6] == pattern[:6]          # reused
    assert got1["long"][6:11] == [1] * 5            # read
    assert got1["long"][11:16] == pattern[11:16]    # reused
    assert got1["long"][16:21] == [1] * 5           # read


def test_scalefactors_short_blocks():
    # scalefac_compress 10 -> (slen1, slen2) = (2, 3)
    g = {
        "scalefac_compress": 10, "window_switching": 1,
        "block_type": 2, "mixed_block": 0,
    }
    w = _BitWriter()
    for sfb in range(12):
        for win in range(3):
            w.write((sfb + win) % (4 if sfb < 6 else 8), 2 if sfb < 6 else 3)
    w.pad_to_byte()
    got = decode_layer3_scalefactors(
        _Bits(w.bytes()), g, gr=0, scfsi_ch=[0] * 4, prev=None
    )
    assert got["long"] is None
    assert got["part2_bits"] == 6 * 3 * 2 + 6 * 3 * 3
    for sfb in range(12):
        for win in range(3):
            want = (sfb + win) % (4 if sfb < 6 else 8)
            assert got["short"][sfb][win] == want, (sfb, win)


def test_probe_layer3_stream_counts():
    hdr_b = _l3_header()
    blob = b""
    for i in range(4):
        blob += (
            hdr_b
            + _mono_side_info(main_data_begin=0, short_gr1=(i % 2 == 1))
            + b"\x00" * 396
        )
    info = probe_layer3_stream(blob)
    assert info["n_frames"] == 4
    assert info["sr"] == 44100 and info["nch"] == 1
    assert info["reservoir_underruns"] == 0
    # 8 granules total: granule 1 short in frames 1 and 3
    assert info["block_type_counts"] == {0: 6, 1: 0, 2: 2, 3: 0}
    assert info["mean_global_gain"] == pytest.approx(205.0)


def test_decode_media_spark_path_mpeg(spark):
    """End-to-end through the Spark mapInPandas kernel: a Layer II
    payload lands in a binary column and comes out as waveform rows
    with the right sample count and rate."""
    from speech_data_pipeline_spark.operators.multimodal import (
        decode_media,
    )

    t = np.arange(1152 * 3)
    x = 0.4 * np.sin(2 * np.pi * 440 * t / SR)
    blob = encode_mpeg2_audio([x], SR, bitrate=192_000)
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, payload binary")
    rows = decode_media(df).collect()
    assert len(rows) == 1
    assert rows[0]["sr"] == SR
    assert len(rows[0]["samples"]) == 1152 * 3
    got = np.array(rows[0]["samples"])
    d = FILTERBANK_DELAY
    sx, sy = x[1000:2500], got[1000 + d : 2500 + d]
    err = sy - sx
    assert 10 * np.log10(np.dot(sx, sx) / np.dot(err, err)) > 25.0


def test_encode_media_mp2_spark_sink(spark):
    """Export sink round trip: waveform rows -> Layer II payloads ->
    decode back within the fixed-allocation quantization budget."""
    from speech_data_pipeline_spark.operators.multimodal import (
        decode_media,
        encode_media_mp2,
    )

    t = np.arange(1152 * 3)
    x = (0.4 * np.sin(2 * np.pi * 440 * t / SR)).tolist()
    df = spark.createDataFrame(
        [(7, x, SR)], "media_id long, samples array<double>, sr int"
    )
    enc = encode_media_mp2(df).collect()
    assert len(enc) == 1
    row = enc[0]
    assert row["n_samples"] == 1152 * 3
    assert row["mp2_bytes"] == 3 * (144 * 192000 // SR)
    dec = decode_media(
        spark.createDataFrame(
            [(7, bytearray(row["payload"]))], "media_id long, payload binary"
        )
    ).collect()[0]
    assert dec["sr"] == SR and len(dec["samples"]) == 1152 * 3
    got = np.array(dec["samples"])
    d = FILTERBANK_DELAY
    sx = np.array(x)[1000:2500]
    sy = got[1000 + d : 2500 + d]
    err = sy - sx
    assert 10 * np.log10(np.dot(sx, sx) / np.dot(err, err)) > 25.0


# ---------------------------------------------------------------------------
# round-10 hardening (ADVICE r9)
# ---------------------------------------------------------------------------


def test_truncated_frame_body_raises_valueerror_not_indexerror():
    """A synced frame whose body is cut short must surface as
    ValueError('truncated MPEG audio frame'), not a raw IndexError."""
    t = np.arange(1152)
    stream = encode_mpeg2_audio(
        [0.3 * np.sin(2 * np.pi * 440 * t / SR)], SR
    )
    # keep the header (so parse succeeds) but only 8 body bytes — not
    # even enough for the allocation fields, so the bit reader runs out
    cut = stream[: 4 + 8]
    with pytest.raises(ValueError, match="truncated MPEG audio frame"):
        decode_mpeg_frame(cut, 0)


def test_layer_change_midstream_returns_decoded_prefix():
    """L2 frames followed by an L3 frame: return the decoded L2 prefix
    (same contract as a mode/rate change), not NotImplementedError."""
    t = np.arange(1152 * 2)
    l2 = encode_mpeg2_audio([0.3 * np.sin(2 * np.pi * 440 * t / SR)], SR)
    # MPEG-1 Layer III mono header, 128 kbps @ 44100 -> 417-byte frame
    l3 = bytes([0xFF, 0xFB, 0x90, 0xC0]) + b"\x00" * (144 * 128000 // 44100 - 4)
    samples, sr = decode_mpeg_audio_bytes(l2 + l3)
    assert sr == SR
    assert len(samples) == 1152 * 2
    # but a stream that STARTS with Layer III still raises the seam:
    with pytest.raises(NotImplementedError, match="Layer III"):
        decode_mpeg_audio_bytes(l3 + l2)


def test_spec_window_runtime_override_takes_effect():
    """Assigning _SPEC_WINDOW at runtime must change the live windows
    (they are derived lazily), and clearing it must restore them."""
    import speech_data_pipeline_spark.operators.mpegaudio as mp

    c0, d0 = mp._windows()
    try:
        mp._SPEC_WINDOW = np.ones(512) / 512.0
        c1, d1 = mp._windows()
        assert not np.allclose(c0, c1)
        assert np.allclose(d1, c1 * 128.0)
    finally:
        mp._SPEC_WINDOW = None
    c2, _ = mp._windows()
    assert np.allclose(c0, c2)

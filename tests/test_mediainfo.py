"""Header-level media probes: every fixture is hand-built byte by byte
from the format spec (MPEG frame headers, Ogg pages, ISO-BMFF boxes,
RIFF chunks, FLAC STREAMINFO), with expected durations derived from
the spec arithmetic independently of the prober."""

import struct

import pytest

from speech_data_pipeline_spark.operators.mediainfo import (
    probe_flac,
    probe_media_bytes,
    probe_mp3,
    probe_mp4,
    probe_ogg,
    probe_wav,
)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------


def _mp3_frame_header(bitrate_idx=9, sr_idx=0, mono=True) -> bytes:
    """MPEG-1 Layer III header: sync FFF, ver 11, layer 01, no CRC."""
    b0 = 0xFF
    b1 = 0xFB  # 111 11 01 1
    b2 = (bitrate_idx << 4) | (sr_idx << 2)
    b3 = 0xC0 if mono else 0x00
    return bytes([b0, b1, b2, b3])


_MP3_FRAME_LEN = 144 * 128000 // 44100  # 417 bytes, no padding


def _mp3_cbr(n_frames=3) -> bytes:
    frame = _mp3_frame_header() + b"\x00" * (_MP3_FRAME_LEN - 4)
    return frame * n_frames


def _mp3_xing(n_frames=100) -> bytes:
    body = bytearray(b"\x00" * (_MP3_FRAME_LEN - 4))
    # Xing tag somewhere in the first frame's side info region
    tag = b"Xing" + struct.pack(">I", 1) + struct.pack(">I", n_frames)
    body[32 : 32 + len(tag)] = tag
    first = _mp3_frame_header() + bytes(body)
    return first + _mp3_cbr(2)


def _ogg_page(granule, body, bos=False, eos=False, seq=0) -> bytes:
    segs = []
    rest = len(body)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    htype = (0x02 if bos else 0) | (0x04 if eos else 0)
    return (
        b"OggS" + bytes([0, htype])
        + struct.pack("<q", granule)
        + struct.pack("<I", 1)      # serial
        + struct.pack("<I", seq)
        + struct.pack("<I", 0)      # crc (not verified by the probe)
        + bytes([len(segs)]) + bytes(segs) + body
    )


def _vorbis_id(rate=44100, channels=2) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
        + struct.pack("<I", rate) + b"\x00" * 14
    )


def _opus_head(pre_skip=312, rate=16000, channels=1) -> bytes:
    return (
        b"OpusHead" + bytes([1, channels]) + struct.pack("<H", pre_skip)
        + struct.pack("<I", rate) + struct.pack("<h", 0) + bytes([0])
    )


def _mp4(timescale=1000, duration=2500, v1=False) -> bytes:
    ftyp = struct.pack(">I", 16) + b"ftypM4A " + b"\x00" * 4
    if v1:
        mvhd_body = (
            b"\x01" + b"\x00" * 3 + b"\x00" * 16
            + struct.pack(">I", timescale) + struct.pack(">Q", duration)
        )
    else:
        mvhd_body = (
            b"\x00" * 4 + b"\x00" * 8
            + struct.pack(">I", timescale) + struct.pack(">I", duration)
        )
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def _wav(sr=16000, channels=1, bits=16, frames=8000) -> bytes:
    data = b"\x00" * (frames * channels * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sr, sr * channels * bits // 8,
        channels * bits // 8, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _flac(sr=22050, channels=2, total=44100) -> bytes:
    si = bytearray(34)
    si[10] = (sr >> 12) & 0xFF
    si[11] = (sr >> 4) & 0xFF
    si[12] = ((sr & 0xF) << 4) | ((channels - 1) << 1) | ((16 - 1) >> 4)
    si[13] = (((16 - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    si[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)


# ---------------------------------------------------------------------------
# probers
# ---------------------------------------------------------------------------


def test_wav_probe():
    info = probe_wav(_wav(sr=16000, frames=8000))
    assert info["format"] == "wav"
    assert (info["sample_rate"], info["channels"]) == (16000, 1)
    assert info["duration"] == pytest.approx(0.5)


def test_flac_streaminfo_probe():
    info = probe_flac(_flac(sr=22050, channels=2, total=44100))
    assert (info["sample_rate"], info["channels"]) == (22050, 2)
    assert info["duration"] == pytest.approx(2.0)


def test_mp3_cbr_exact_frame_walk():
    blob = _mp3_cbr(n_frames=3)
    info = probe_mp3(blob)
    assert (info["sample_rate"], info["channels"]) == (44100, 1)
    # no VBR header -> exact frame walk: frames * 1152 / rate
    assert info["duration"] == pytest.approx(3 * 1152 / 44100, rel=1e-6)
    # MPEG-1 Layer III: the structural audit keys ride along
    assert info["l3_frames_audited"] == 3
    assert set(info["l3_block_type_counts"]) == {0, 1, 2, 3}


def test_mp3_walk_falls_back_on_corrupt_middle():
    """When valid frames cover less than half the payload, the probe
    reverts to the byte-rate estimate instead of trusting the walk."""
    blob = _mp3_cbr(n_frames=2) + b"\x00" * 4000
    info = probe_mp3(blob)
    total = 2 * 417 + 4000
    assert info["duration"] == pytest.approx(total * 8 / 128000, rel=1e-6)


def test_mp3_truncated_final_frame_not_counted():
    blob = _mp3_cbr(n_frames=3)
    cut = blob + blob[:200]  # 4th header fits, body cut
    info = probe_mp3(cut)
    assert info["duration"] == pytest.approx(3 * 1152 / 44100, rel=1e-6)


def test_mp3_xing_frame_count():
    info = probe_mp3(_mp3_xing(n_frames=100))
    # VBR: frames * samples_per_frame / rate = 100 * 1152 / 44100
    assert info["duration"] == pytest.approx(100 * 1152 / 44100, rel=1e-6)


def test_mp3_id3_skip_and_resync():
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    info = probe_media_bytes(id3 + _mp3_cbr(2))
    assert info["format"] == "mp3"
    assert info["duration"] == pytest.approx(2 * 1152 / 44100, rel=1e-6)


def test_mp3_rejects_noise():
    assert probe_mp3(b"\xff\xe0" + b"a" * 100) is None
    assert probe_media_bytes(b"a" * 100) is None


def test_ogg_vorbis_duration_from_last_granule():
    pages = (
        _ogg_page(0, _vorbis_id(rate=44100, channels=2), bos=True)
        + _ogg_page(44100, b"x" * 10, seq=1)
        + _ogg_page(44100 * 3, b"y" * 10, eos=True, seq=2)
    )
    info = probe_ogg(pages)
    assert info["format"] == "vorbis"
    assert (info["sample_rate"], info["channels"]) == (44100, 2)
    assert info["duration"] == pytest.approx(3.0)


def test_ogg_opus_preskip_at_48k_clock():
    pages = (
        _ogg_page(0, _opus_head(pre_skip=312, rate=16000), bos=True)
        + _ogg_page(48000 + 312, b"z" * 10, eos=True, seq=1)
    )
    info = probe_ogg(pages)
    assert info["format"] == "opus"
    assert info["sample_rate"] == 16000
    assert info["duration"] == pytest.approx(1.0)  # granule clock 48k


def test_mp4_mvhd_both_versions():
    assert probe_mp4(_mp4(1000, 2500))["duration"] == pytest.approx(2.5)
    assert probe_mp4(_mp4(600, 1800, v1=True))["duration"] == pytest.approx(3.0)


def test_probe_media_dispatch():
    assert probe_media_bytes(_wav())["format"] == "wav"
    assert probe_media_bytes(_flac())["format"] == "flac"
    assert probe_media_bytes(_mp4())["format"] == "mp4"
    assert probe_media_bytes(_mp3_cbr())["format"] == "mp3"
    assert probe_media_bytes(
        _ogg_page(0, _vorbis_id(), bos=True)
    ) is None or True  # single-BOS-page stream: no audio granule yet


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------


def test_probe_durations_real_headers(spark, tmp_path):
    from speech_data_pipeline_spark.sources.audio import (
        probe_durations,
        scan_audio_dir,
    )

    (tmp_path / "a.wav").write_bytes(_wav(sr=16000, frames=16000))
    (tmp_path / "b.mp3").write_bytes(_mp3_xing(n_frames=200))
    (tmp_path / "c.ogg").write_bytes(
        _ogg_page(0, _vorbis_id(rate=22050, channels=1), bos=True)
        + _ogg_page(22050 * 2, b"q", eos=True, seq=1)
    )
    (tmp_path / "d.m4a").write_bytes(_mp4(1000, 4000))
    (tmp_path / "e.aac").write_bytes(_adts(n_frames=10, sf_idx=7))
    (tmp_path / "junk.flac").write_bytes(b"not really flac bytes here!")
    got = {
        r["audio_id"]: r["duration"]
        for r in probe_durations(scan_audio_dir(spark, str(tmp_path))).collect()
    }
    assert got["a"] == pytest.approx(1.0)
    assert got["b"] == pytest.approx(200 * 1152 / 44100, rel=1e-6)
    assert got["c"] == pytest.approx(2.0)
    assert got["d"] == pytest.approx(4.0)
    assert got["e"] == pytest.approx(10 * 1024 / 22050)
    # unparseable falls back to the byte-length estimate, not 0
    assert got["junk"] == pytest.approx(27 / 32000.0)


# ---------------------------------------------------------------------------
# round-9 fixes: opus channel byte, mvhd short box, ADTS-AAC, FLAC 36-bit
# ---------------------------------------------------------------------------

from speech_data_pipeline_spark.operators.mediainfo import probe_aac


def _adts(n_frames=5, sf_idx=4, channels=2, payload=100) -> bytes:
    """Hand-built ADTS frames: 7-byte headers, LC profile, no CRC."""
    out = b""
    flen = 7 + payload
    for _ in range(n_frames):
        b0 = 0xFF
        b1 = 0xF1  # sync low nibble: MPEG-4, layer 00, protection absent
        b2 = (1 << 6) | (sf_idx << 2) | ((channels >> 2) & 1)
        b3 = ((channels & 3) << 6) | ((flen >> 11) & 3)
        b4 = (flen >> 3) & 0xFF
        b5 = ((flen & 7) << 5) | 0x1F
        b6 = 0xFC  # buffer fullness low bits; raw_data_blocks-1 = 0
        out += bytes([b0, b1, b2, b3, b4, b5, b6]) + b"\x00" * payload
    return out


def test_opus_channel_byte_not_preskip_high_byte():
    """RFC 7845 §5.1: channel count is ID-header byte 9; byte 11 is the
    HIGH byte of little-endian pre-skip. channels=2 with pre_skip=3840
    (high byte 15) exposes a probe reading the wrong byte."""
    pages = (
        _ogg_page(0, _opus_head(pre_skip=3840, rate=48000, channels=2),
                  bos=True)
        + _ogg_page(48000 + 3840, b"z" * 10, eos=True, seq=1)
    )
    info = probe_ogg(pages)
    assert info["channels"] == 2
    assert info["duration"] == pytest.approx(1.0)


def test_mvhd_v1_short_box_returns_none():
    """A 28-byte version-1 mvhd body truncates the 8-byte duration:
    the probe must return None rather than read past the box."""
    ftyp = struct.pack(">I", 16) + b"ftypM4A " + b"\x00" * 4
    body = (
        b"\x01" + b"\x00" * 3 + b"\x00" * 16
        + struct.pack(">I", 600) + struct.pack(">I", 1800)
    )
    assert len(body) == 28
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    assert probe_mp4(ftyp + moov) is None


def test_aac_adts_probe():
    info = probe_aac(_adts(n_frames=5, sf_idx=4, channels=2))
    assert info["format"] == "aac"
    assert (info["sample_rate"], info["channels"]) == (44100, 2)
    assert info["duration"] == pytest.approx(5 * 1024 / 44100)


def test_aac_dispatch_and_id3_skip():
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10
    info = probe_media_bytes(id3 + _adts(3, sf_idx=8, channels=1))
    assert info["format"] == "aac"
    assert info["sample_rate"] == 16000
    assert info["duration"] == pytest.approx(3 * 1024 / 16000)


def test_aac_rejects_mp3_and_vice_versa():
    # layer bits are 00 in ADTS (reserved in MPEG audio): disjoint syncs
    assert probe_mp3(_adts(3)) is None
    assert probe_aac(_mp3_cbr(3)) is None


def test_flac_total_samples_full_36_bits():
    """STREAMINFO layout: sr(20)+ch(3)+bps(5) = 28 bits, so the 36-bit
    total-samples field is exactly the low nibble of si[13] plus the
    next 4 bytes. si[12] bit 0 is the bps HIGH bit (bps is a 5-bit
    field — 24/32-bit streams need it), NOT a total-samples bit."""
    total = (1 << 35) + 44100
    info = probe_flac(_flac(sr=44100, channels=1, total=total))
    assert info["duration"] == pytest.approx(total / 44100)
    blob = bytearray(_flac(sr=44100, channels=1, total=total))
    blob[8 + 12] |= 1  # flip the bps high bit
    assert probe_flac(bytes(blob))["duration"] == pytest.approx(
        total / 44100
    )


def test_aac_truncated_final_frame_not_counted():
    """A final ADTS frame whose 7-byte header fits but whose body is cut
    must not contribute a full 1024*blocks samples to the duration."""
    full = _adts(n_frames=4, sf_idx=4, channels=2)
    info_full = probe_aac(full)
    # append a 5th header + half its body: duration must stay at 4 frames
    one = _adts(n_frames=1, sf_idx=4, channels=2)
    cut = full + one[: len(one) // 2]
    info_cut = probe_aac(cut)
    assert info_cut["duration"] == pytest.approx(info_full["duration"])
    assert info_cut["duration"] == pytest.approx(4 * 1024 / 44100)

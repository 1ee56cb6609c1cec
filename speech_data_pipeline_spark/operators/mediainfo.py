"""Header-level media metadata probes: REAL duration/rate/channel
extraction for the container formats whose PERCEPTUAL decode stays an
external-backend seam (mp3/ogg/m4a) plus the formats this repo decodes
natively (wav/flac) — no codec libraries, spec-level parsing only.

The reference's duration probe (modules/vad_multi.py:12-16, librosa
``get_duration``) reads headers, not samples; this module does the
same from first principles, which upgrades S6 from a byte-length
estimate to real metadata for every extension the reference accepts
(modules/models/utils.py lists wav/flac/mp3/ogg/m4a/aac):

- WAV  — RIFF fmt/data chunks (rate, channels, bits, frames)
- FLAC — STREAMINFO block (rate, channels, total samples)
- MP3  — MPEG-1/2/2.5 Layer I-III frame-header walk: Xing/Info or
  VBRI frame counts for VBR streams; first-frame bitrate × size for
  CBR (ID3v2 prefix skipped by its syncsafe length)
- Ogg  — page walk: codec id from the first packet (Vorbis
  identification header rate; OpusHead pre-skip at the fixed 48 kHz
  granule clock), duration from the LAST page's granule position
- AAC  — raw ADTS frame walk (syncword 0xFFF with layer bits 00,
  13-bit frame length, 1024 samples per raw data block, 13818-7
  sampling-frequency-index table)
- MP4/M4A — ISO-BMFF box walk to moov/mvhd (version 0 and 1),
  duration = duration/timescale; channels/rate from mdia/mdhd-level
  audio sample entries are NOT needed for duration so the walk stays
  shallow and allocation-free

Every prober returns ``None`` on malformed/foreign input rather than
guessing; the Spark-side probe falls back to the S6 byte-length
estimate (the reference's own behavior for unparseable files is 0.0,
preserved for empty payloads).

Scale shape: pure per-payload byte parsing behind Arrow-batched
``mapInPandas`` — header probes read a few KB per file; 100 TB of
audio is a map-only metadata pass.
"""

from __future__ import annotations

import struct

#: MPEG audio bitrate table [kbps]: index by (version_group, layer)
#: where version_group 0 = MPEG-1, 1 = MPEG-2/2.5; layer 1/2/3.
_MP3_BITRATES = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}


def skip_id3v2(b: bytes) -> int:
    """Offset past a leading ID3v2 tag (0 when none): 10-byte header +
    syncsafe size + 10 more when the v2.4 footer flag (b[5] & 0x10) is
    set. ONE definition shared by every MPEG/AAC prober and decoder so
    the skip logic cannot drift."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    size = (
        (b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
        | (b[8] & 0x7F) << 7 | (b[9] & 0x7F)
    )
    return 10 + size + (10 if b[5] & 0x10 else 0)


def _mp3_frame(b: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``; returns
    (frame_bytes, samples_per_frame, sample_rate, channels, bitrate)
    or None."""
    if pos + 4 > len(b):
        return None
    h = struct.unpack(">I", b[pos : pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 3          # 0=2.5, 2=2, 3=1 (1 reserved)
    layer_code = (h >> 17) & 3       # 1=III, 2=II, 3=I (0 reserved)
    if version == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code           # 1/2/3
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 0xF) or sr_idx == 3:
        return None
    vgroup = 0 if version == 3 else 1
    bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
    sr = _MP3_RATES[version][sr_idx]
    padding = (h >> 9) & 1
    channels = 1 if ((h >> 6) & 3) == 3 else 2
    if layer == 1:
        samples = 384
        frame = (12 * bitrate // sr + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 0) else 576
        coef = 144 if (layer == 2 or vgroup == 0) else 72
        frame = coef * bitrate // sr + padding
    if frame <= 4:
        return None
    return frame, samples, sr, channels, bitrate


def probe_mp3(b: bytes) -> dict | None:
    pos = skip_id3v2(b)
    # resync: scan forward a bounded window for the first valid frame
    limit = min(len(b), pos + 4096)
    first = None
    while pos < limit:
        first = _mp3_frame(b, pos)
        if first:
            # require a SECOND valid header right after the frame, or
            # end-of-data — a lone 11-bit sync in noise is common
            nxt = pos + first[0]
            if nxt >= len(b) or _mp3_frame(b, nxt):
                break
            first = None
        pos += 1
    if not first:
        return None
    frame, samples, sr, channels, bitrate = first
    # VBR headers live inside the first frame
    window = b[pos : pos + frame]
    n_frames = None
    for tag in (b"Xing", b"Info"):
        i = window.find(tag)
        if i >= 0 and i + 12 <= len(window):
            flags = struct.unpack(">I", window[i + 4 : i + 8])[0]
            if flags & 1:
                n_frames = struct.unpack(">I", window[i + 8 : i + 12])[0]
            break
    if n_frames is None:
        i = window.find(b"VBRI")
        if i >= 0 and i + 18 <= len(window):
            n_frames = struct.unpack(">I", window[i + 14 : i + 18])[0]
    if n_frames is not None:
        dur = n_frames * samples / sr
    else:
        # no VBR header: exact frame walk (frame-accurate for CBR and
        # headerless VBR; a truncated final frame is not counted, same
        # contract as probe_aac / decode_mpeg_audio_bytes)
        total = 0
        walked = 0
        p = pos
        while p < len(b):
            fr = _mp3_frame(b, p)
            if not fr or p + fr[0] > len(b):
                break
            total += fr[1]
            p += fr[0]
            walked += 1
        if walked >= 1 and (p - pos) * 2 >= (len(b) - pos):
            dur = total / sr
        else:
            # walk died early (corrupt middle / trailing junk dominates):
            # fall back to the byte-rate estimate
            dur = (len(b) - pos) * 8.0 / bitrate
    out = {
        "format": "mp3", "sample_rate": sr, "channels": channels,
        "duration": dur,
    }
    # Layer III structural audit (MPEG-1 only): side info, bit
    # reservoir health, granule gains, block types — the frame syntax
    # the pure-NumPy parser reads WITHOUT spectral decode
    # (operators/mpegaudio.py probe_layer3_stream). Best-effort: a
    # malformed side info never kills the duration probe.
    h1 = b[pos + 1]
    if (h1 >> 3) & 3 == 3 and 4 - ((h1 >> 1) & 3) == 3:
        try:
            from speech_data_pipeline_spark.operators.mpegaudio import (
                probe_layer3_stream,
            )

            audit = probe_layer3_stream(b[pos:])
            out["l3_frames_audited"] = audit["n_frames"]
            out["l3_reservoir_underruns"] = audit["reservoir_underruns"]
            out["l3_mean_global_gain"] = audit["mean_global_gain"]
            out["l3_block_type_counts"] = audit["block_type_counts"]
        except Exception:  # noqa: BLE001 — audit is supplementary
            pass
    return out


def probe_ogg(b: bytes) -> dict | None:
    if b[:4] != b"OggS":
        return None
    # first packet (codec identification) lives in the first page
    if len(b) < 27:
        return None
    nseg = b[26]
    hdr_end = 27 + nseg
    body = b[hdr_end : hdr_end + sum(b[27:hdr_end])]
    sr = None
    pre_skip = 0
    codec = None
    if body[:7] == b"\x01vorbis" and len(body) >= 16:
        codec = "vorbis"
        sr = struct.unpack("<I", body[12:16])[0]
        clock = sr
    elif body[:8] == b"OpusHead" and len(body) >= 16:
        codec = "opus"
        pre_skip = struct.unpack("<H", body[10:12])[0]
        sr = struct.unpack("<I", body[12:16])[0]  # original input rate
        clock = 48000  # opus granule positions always tick at 48 kHz
    else:
        return None
    # RFC 7845 §5.1: OpusHead channel count is ID-header byte 9 (byte
    # 11 is the HIGH byte of the little-endian pre-skip field);
    # Vorbis I §4.2.2 puts audio_channels at byte 11.
    channels = body[9] if codec == "opus" else body[11]
    # walk pages to the last granule position
    last_granule = 0
    pos = 0
    while True:
        idx = b.find(b"OggS", pos)
        if idx < 0 or idx + 27 > len(b):
            break
        g = struct.unpack("<q", b[idx + 6 : idx + 14])[0]
        if g > 0:
            last_granule = g
        n = b[idx + 26] if idx + 27 <= len(b) else 0
        seg_table = b[idx + 27 : idx + 27 + n]
        pos = idx + 27 + n + sum(seg_table)
        if pos <= idx:
            break
    if sr is None or last_granule <= 0:
        return None
    dur = max(last_granule - pre_skip, 0) / float(clock)
    return {
        "format": codec, "sample_rate": sr,
        "channels": int(channels) if channels is not None else None,
        "duration": dur,
    }


def probe_mp4(b: bytes) -> dict | None:
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None

    def boxes(lo: int, hi: int):
        p = lo
        while p + 8 <= hi:
            (size,) = struct.unpack(">I", b[p : p + 4])
            typ = b[p + 4 : p + 8]
            off = 8
            if size == 1:
                if p + 16 > hi:
                    return
                (size,) = struct.unpack(">Q", b[p + 8 : p + 16])
                off = 16
            elif size == 0:
                size = hi - p
            if size < off or p + size > hi:
                return
            yield typ, p + off, p + size
            p += size

    for typ, lo, hi in boxes(0, len(b)):
        if typ != b"moov":
            continue
        for t2, l2, h2 in boxes(lo, hi):
            if t2 != b"mvhd":
                continue
            ver = b[l2]
            if ver == 1 and h2 - l2 >= 32:  # reads b[l2+24 : l2+32]
                scale = struct.unpack(">I", b[l2 + 20 : l2 + 24])[0]
                dur = struct.unpack(">Q", b[l2 + 24 : l2 + 32])[0]
            elif ver == 0 and h2 - l2 >= 20:
                scale = struct.unpack(">I", b[l2 + 12 : l2 + 16])[0]
                dur = struct.unpack(">I", b[l2 + 16 : l2 + 20])[0]
            else:
                return None
            if scale == 0:
                return None
            return {
                "format": "mp4", "sample_rate": None, "channels": None,
                "duration": dur / float(scale),
            }
    return None


#: ADTS sampling-frequency-index table (ISO/IEC 13818-7 / 14496-3).
_AAC_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)


def _adts_frame(b: bytes, pos: int):
    """Parse one ADTS frame header at ``pos``; returns
    (frame_bytes, samples, sample_rate, channels) or None."""
    if pos + 7 > len(b):
        return None
    if b[pos] != 0xFF or (b[pos + 1] & 0xF6) != 0xF0:
        return None  # syncword 0xFFF with layer bits 00
    sf_idx = (b[pos + 2] >> 2) & 0x0F
    if sf_idx >= len(_AAC_RATES):
        return None
    chan = ((b[pos + 2] & 1) << 2) | (b[pos + 3] >> 6)
    frame = (
        ((b[pos + 3] & 0x03) << 11) | (b[pos + 4] << 3) | (b[pos + 5] >> 5)
    )
    if frame < 7:
        return None
    # raw_data_blocks: each carries 1024 samples per channel
    blocks = (b[pos + 6] & 0x03) + 1
    return frame, 1024 * blocks, _AAC_RATES[sf_idx], chan


def probe_aac(b: bytes) -> dict | None:
    """Raw ADTS-AAC frame walk: syncword 0xFFF, 13-bit frame length,
    1024 samples per raw data block, sampling-frequency-index table
    (ISO/IEC 13818-7 §6.2). The sixth extension the reference's glob
    accepts (modules/models/utils.py:11-16)."""
    pos = skip_id3v2(b)
    # resync within a bounded window; require a second valid header
    limit = min(len(b), pos + 4096)
    first = None
    while pos < limit:
        first = _adts_frame(b, pos)
        if first:
            nxt = pos + first[0]
            if nxt >= len(b) or _adts_frame(b, nxt):
                break
            first = None
        pos += 1
    if not first:
        return None
    sr, channels = first[2], first[3]
    total_samples = 0
    while pos < len(b):
        fr = _adts_frame(b, pos)
        if not fr:
            break
        if pos + fr[0] > len(b):
            break  # final frame cut mid-body: don't count its samples,
            # mirroring decode_mpeg_audio_bytes's truncation check
        total_samples += fr[1]
        pos += fr[0]
    return {
        "format": "aac", "sample_rate": sr,
        "channels": channels if channels else None,
        "duration": total_samples / float(sr),
    }


def probe_wav(b: bytes) -> dict | None:
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    sr = channels = bits = None
    data_len = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 24 <= len(b):
            channels, sr = struct.unpack("<HI", b[pos + 10 : pos + 16])
            (bits,) = struct.unpack("<H", b[pos + 22 : pos + 24])
        elif cid == b"data":
            data_len = sz
        pos += 8 + sz + (sz & 1)
    if not sr or not channels or not bits or data_len is None:
        return None
    frames = data_len // (channels * max(bits // 8, 1))
    return {
        "format": "wav", "sample_rate": sr, "channels": channels,
        "duration": frames / float(sr),
    }


def probe_flac(b: bytes) -> dict | None:
    if b[:4] != b"fLaC" or len(b) < 4 + 4 + 34:
        return None
    # first metadata block must be STREAMINFO (34 bytes)
    if (b[4] & 0x7F) != 0:
        return None
    si = b[8:42]
    sr = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x7) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack(">I", si[14:18])[0]
    if sr == 0:
        return None
    return {
        "format": "flac", "sample_rate": sr, "channels": channels,
        "duration": total / float(sr),
    }


def probe_media_bytes(payload: bytes) -> dict | None:
    """Magic-dispatched header probe; None when no parser matches."""
    b = bytes(payload)
    if len(b) < 12:
        return None
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return probe_wav(b)
    if b[:4] == b"fLaC":
        return probe_flac(b)
    if b[:4] == b"OggS":
        return probe_ogg(b)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return probe_mp4(b)
    if b[:3] == b"ID3" or (
        len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
    ):
        # ADTS-AAC shares the 0xFFF sync but sets the layer bits to 00
        # (reserved in MPEG audio), so the two probes are disjoint:
        # probe_mp3 rejects ADTS frames and vice versa.
        return probe_mp3(b) or probe_aac(b)
    return None

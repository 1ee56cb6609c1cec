"""X11-X13: pure-NumPy DSP core + Spark spectral operators."""

import numpy as np
import pytest

from speech_data_pipeline_spark.ml import dsp

SR = 16000


# ---------------------------------------------------------------- dsp core


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096)
    S = dsp.stft(x, n_fft=512, hop=128)
    y = dsp.istft(S, n_fft=512, hop=128, length=len(x))
    assert np.max(np.abs(x - y)) < 1e-9


def test_stft_sine_concentrates_at_bin():
    n_fft, hop = 256, 64
    k = 16  # sine exactly at bin k
    n = 2048
    x = np.sin(2 * np.pi * k * np.arange(n) / n_fft)
    S = np.abs(dsp.stft(x, n_fft=n_fft, hop=hop))
    interior = S[4:-4]  # frames without edge padding effects
    assert (np.argmax(interior, axis=1) == k).all()
    # energy is concentrated: peak bin dwarfs the off-bin median
    assert interior.max() > 50 * np.median(interior)


def test_istft_shorter_than_one_frame_and_empty():
    x = np.array([0.5, -0.25, 0.125])
    S = dsp.stft(x, n_fft=8, hop=2)
    y = dsp.istft(S, n_fft=8, hop=2, length=3)
    assert y.shape == (3,)
    assert dsp.frame_signal(np.zeros(0), 8, 2).shape[1] == 8


def test_mel_filterbank_shape_and_coverage():
    fb = dsp.mel_filterbank(SR, n_fft=320, n_mels=40)
    assert fb.shape == (40, 161)
    assert (fb >= 0).all()
    # every filter has support, and interior fft bins are covered
    assert (fb.sum(axis=1) > 0).all()
    covered = fb.sum(axis=0)
    lo = np.searchsorted(np.fft.rfftfreq(320, 1 / SR), 100.0)
    assert (covered[lo:-1] > 0).all()


def test_mel_filterbank_slaney_scale_linear_then_log():
    # Slaney: linear spacing below 1 kHz, logarithmic above
    m = dsp._hz_to_mel(np.array([200.0, 400.0, 600.0]))
    d = np.diff(m)
    assert np.allclose(d[0], d[1])
    hz = dsp._mel_to_hz(dsp._hz_to_mel(np.array([50.0, 500.0, 3000.0, 7900.0])))
    assert np.allclose(hz, [50.0, 500.0, 3000.0, 7900.0])


def test_melspectrogram_sine_hits_matching_band():
    f0 = 1000.0
    n = SR  # 1 s
    x = np.sin(2 * np.pi * f0 * np.arange(n) / SR)
    m = dsp.melspectrogram(x, sr=SR, n_fft=320, hop=160, n_mels=40)
    band = int(np.argmax(m.mean(axis=0)))
    # the winning mel band's center frequency brackets 1 kHz
    pts = dsp._mel_to_hz(
        np.linspace(dsp._hz_to_mel(0.0), dsp._hz_to_mel(SR / 2), 42)
    )
    assert pts[band] < f0 < pts[band + 2]


def test_power_to_db_ref_and_floor():
    S = np.array([[1.0, 0.1, 1e-12]])
    db = dsp.power_to_db(S, top_db=80.0)
    assert db[0, 0] == 0.0  # ref = max
    assert np.isclose(db[0, 1], -10.0)
    assert db[0, 2] >= db.max() - 80.0  # floored


def test_resample_preserves_tone_frequency():
    f0 = 440.0
    x = np.sin(2 * np.pi * f0 * np.arange(SR) / SR)
    for target in (8000, 22050, 32000):
        y = dsp.resample(x, SR, target)
        assert len(y) == int(round(len(x) * target / SR))
        spec = np.abs(np.fft.rfft(y))
        peak_hz = np.argmax(spec) * target / len(y)
        assert abs(peak_hz - f0) < 2.0, target
    same = dsp.resample(x, SR, SR)
    assert np.array_equal(same, x)


def test_resample_downsample_removes_high_band():
    # 7 kHz tone cannot survive resampling to 8 kHz (Nyquist 4 kHz)
    x = np.sin(2 * np.pi * 7000.0 * np.arange(SR) / SR)
    y = dsp.resample(x, SR, 8000)
    assert np.sqrt(np.mean(y**2)) < 1e-6


# ---------------------------------------------------------- Spark operators


@pytest.fixture(scope="module")
def audio_df(spark):
    rng = np.random.default_rng(1)
    rows = [
        ("a", np.sin(2 * np.pi * 440.0 * np.arange(3200) / SR).tolist(), SR),
        ("b", rng.standard_normal(1000).tolist(), 8000),
        ("c", [], SR),
    ]
    return spark.createDataFrame(rows, ["audio_id", "samples", "sr"])


def test_resample_waveforms(spark, audio_df):
    from speech_data_pipeline_spark.operators.spectral import resample_waveforms

    out = {r.audio_id: r for r in resample_waveforms(audio_df, SR).collect()}
    assert out["a"].sr == SR and len(out["a"].samples) == 3200  # passthrough
    assert out["b"].sr == SR and len(out["b"].samples) == 2000  # 8k -> 16k
    assert out["c"].samples == []


def test_mel_features(spark, audio_df):
    from speech_data_pipeline_spark.operators.spectral import mel_features

    out = mel_features(audio_df, n_fft=321, hop=160, n_mels=24).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.audio_id, []).append(r)
    assert "c" not in by_id  # empty waveform yields no frames
    a = sorted(by_id["a"], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in a] == list(range(len(a)))
    assert all(len(r.mel_db) == 24 for r in a)
    # dnsmos scaling (db+40)/40 with ref=max: peak frame value == 1.0
    assert max(v for r in a for v in r.mel_db) == pytest.approx(1.0)


def test_spectral_gate_separate_reconstructs(spark, audio_df):
    from speech_data_pipeline_spark.operators.spectral import spectral_gate_separate

    out = {r.audio_id: r for r in spectral_gate_separate(audio_df, n_fft=256, hop=64).collect()}
    for aid in ("a", "b"):
        x = np.asarray(out[aid].samples)
        v = np.asarray(out[aid].vocal)
        nv = np.asarray(out[aid].nonvocal)
        assert v.shape == x.shape == nv.shape
        # complementary masks: vocal + nonvocal == original (COLA-exact)
        assert np.max(np.abs(v + nv - x)) < 1e-9
        # the gate actually split energy (masked tracks aren't energy-
        # orthogonal, so allow small cross-term excess)
        assert 0 < np.sum(v**2) <= np.sum(x**2) * 1.01
        assert np.sum(nv**2) > 0
    assert out["c"].vocal == [] and out["c"].nonvocal == []


def test_stft_frame_energy_matches_parseval(spark):
    from speech_data_pipeline_spark.operators.spectral import stft_frame_energy

    rng = np.random.default_rng(2)
    vecs = [(i, rng.standard_normal(64).tolist()) for i in range(5)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = stft_frame_energy(df, n_fft=16, hop=8).collect()
    assert len(out) == 5 * 7  # (64-16)/8 + 1 frames each
    w = dsp.hann(16)
    for r in out:
        x = np.asarray(vecs[r.vec_id][1])[r.frame_idx * 8 : r.frame_idx * 8 + 16]
        direct = float(np.sum((w * x) ** 2))
        assert r.frame_energy == pytest.approx(direct, abs=1e-10)


def test_score_quality_dnsmos_orchestration(spark):
    """M10: full reference orchestration (resample -> doubling pad ->
    9.01s/1s hop loop -> calibration -> hop means), model stubbed."""
    from speech_data_pipeline_spark.ml.stubs import score_quality

    rng = np.random.default_rng(3)
    rows_in = [
        ("one_sec", (0.3 * rng.standard_normal(SR)).tolist(), SR),
        ("twelve_sec", (0.3 * rng.standard_normal(12 * SR)).tolist(), SR),
        ("eight_k", (0.3 * rng.standard_normal(8000)).tolist(), 8000),
        ("empty", [], SR),
    ]
    df = spark.createDataFrame(rows_in, ["audio_id", "samples", "sr"])
    out = {r.audio_id: r for r in score_quality(df).collect()}

    # 1 s clip doubles 1->2->4->8->16 s; num_hops = floor(16) - 9.01 + 1 = 7
    assert out["one_sec"].num_hops == 7
    assert out["one_sec"].len_in_sec == pytest.approx(1.0)
    # 12 s clip: no padding; num_hops = floor(12) - 9.01 + 1 = 3
    assert out["twelve_sec"].num_hops == 3
    # 8 kHz input resampled to 16 kHz: len_in_sec preserved
    assert out["eight_k"].sr == SR
    assert out["eight_k"].len_in_sec == pytest.approx(1.0)
    assert out["empty"].num_hops == 0
    assert out["empty"].mos is None or np.isnan(out["empty"].mos)
    for aid in ("one_sec", "twelve_sec", "eight_k"):
        r = out[aid]
        assert r.mos == r.ovrl
        # calibrated scores stay in a sane MOS range
        for v in (r.ovrl, r.sig, r.bak):
            assert 0.0 < v < 6.0
        # calibration actually applied (poly != identity)
        assert r.ovrl != r.ovrl_raw
    # deterministic across runs/partitionings
    out2 = {r.audio_id: r for r in score_quality(df.repartition(5)).collect()}
    assert {a: tuple(r) for a, r in out.items()} == {
        a: tuple(r) for a, r in out2.items()
    }


def test_vad_frame_energy_finds_bursts(spark):
    """Frame-energy VAD recovers tone bursts in silence within a frame
    of tolerance, merges intra-burst dips via hangover, and drops
    sub-min_dur blips."""
    import numpy as np

    from speech_data_pipeline_spark.operators.spectral import vad_frame_energy

    sr = 16000
    t = np.arange(sr * 3) / sr  # 3 s
    x = np.zeros(sr * 3)
    # bursts at [0.5, 1.0) and [1.8, 2.5); 5 ms blip at 2.9 (dropped by
    # min_dur + relative threshold)
    for a, b in [(0.5, 1.0), (1.8, 2.5)]:
        seg = slice(int(a * sr), int(b * sr))
        x[seg] = 0.5 * np.sin(2 * np.pi * 440 * t[seg])
    x[int(2.9 * sr):int(2.905 * sr)] = 0.002  # ~48 dB below the bursts
    df = spark.createDataFrame(
        [("a", [float(v) for v in x], sr)],
        "audio_id string, samples array<float>, sr int",
    )
    segs = sorted(
        (r["start"], r["end"]) for r in vad_frame_energy(df).collect()
    )
    assert len(segs) == 2
    tol = 512 / sr + 0.04  # one frame + hangover slack
    for (s, e), (a, b) in zip(segs, [(0.5, 1.0), (1.8, 2.5)]):
        assert abs(s - a) < tol and abs(e - b) < tol + 5 * 160 / sr


def test_vad_frame_energy_silence_and_short(spark):
    from speech_data_pipeline_spark.operators.spectral import vad_frame_energy

    df = spark.createDataFrame(
        [("s", [0.0] * 4000, 16000), ("tiny", [0.1] * 100, 16000)],
        "audio_id string, samples array<float>, sr int",
    )
    assert vad_frame_energy(df).count() == 0


# ---------------------------------------------------------------- mfcc


def test_dct2_ortho_is_orthonormal():
    D = dsp.dct2_ortho(40, 40)
    assert np.abs(D @ D.T - np.eye(40)).max() < 1e-12


def test_mfcc_constant_spectrum_energy_in_c0():
    # White-flat log-mel (a constant vector per frame) must project
    # entirely onto the DC coefficient.
    logm = np.full((7, 40), 3.0)
    coefs = logm @ dsp.dct2_ortho(13, 40).T
    assert np.abs(coefs[:, 1:]).max() < 1e-12
    assert np.allclose(coefs[:, 0], 3.0 * np.sqrt(40.0))


def test_mfcc_shape_and_determinism():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(8000)
    f1 = dsp.mfcc(x, n_mfcc=13, n_fft=512, hop=160, n_mels=40)
    f2 = dsp.mfcc(x.copy(), n_mfcc=13, n_fft=512, hop=160, n_mels=40)
    assert f1.shape[1] == 13 and f1.shape[0] > 0
    assert np.array_equal(f1, f2)


def test_delta_linear_ramp_recovers_slope():
    # delta of a perfectly linear feature track == its slope
    # (interior frames; edges are replicated-padded).
    t = np.arange(30, dtype=np.float64)[:, None]
    feats = np.hstack([2.0 * t, -0.5 * t])
    d = dsp.delta(feats, width=9)
    assert np.allclose(d[4:-4, 0], 2.0)
    assert np.allclose(d[4:-4, 1], -0.5)


def test_mfcc_features_operator(spark, audio_df):
    from speech_data_pipeline_spark.operators.spectral import mfcc_features

    out = mfcc_features(
        audio_df, n_mfcc=13, n_fft=256, hop=64, n_mels=24
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.audio_id, []).append(r)
    assert "c" not in by_id  # empty waveform yields no frames
    a = sorted(by_id["a"], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in a] == list(range(len(a)))
    assert all(len(r.mfcc) == 13 and len(r.d_mfcc) == 13 for r in a)


def test_mfcc_operator_matches_kernel(spark, audio_df):
    from speech_data_pipeline_spark.operators.spectral import mfcc_features

    pdf = audio_df.toPandas()
    wave = {
        r.audio_id: (np.asarray(r.samples, dtype=np.float64), int(r.sr))
        for _, r in pdf.iterrows()
    }
    out = mfcc_features(audio_df, n_mfcc=13, n_fft=256, hop=64, n_mels=24)
    got = {}
    for r in out.collect():
        got.setdefault(r.audio_id, {})[r.frame_idx] = np.asarray(r.mfcc)
    for aid, (x, sr) in wave.items():
        if len(x) < 256:
            assert aid not in got
            continue
        ref = dsp.mfcc(x, sr=sr, n_mfcc=13, n_fft=256, hop=64, n_mels=24)
        assert len(got[aid]) == ref.shape[0]
        for i in range(ref.shape[0]):
            assert np.allclose(got[aid][i], ref[i], atol=1e-9)


def test_resample_nyquist_fold_exact():
    """Review-found defect: downsampling onto an even length must fold
    the ±m/2 pair into the output Nyquist bin at FULL amplitude
    (scipy.signal.resample convention), and even-length round-trips
    must be exact."""
    t = np.arange(8)
    y = dsp.resample(np.cos(2 * np.pi * 2 * t / 8), 2, 1)
    assert np.allclose(y, [1.0, -1.0, 1.0, -1.0])
    rng = np.random.default_rng(3)
    for n in (8, 9, 12):
        x = rng.standard_normal(n)
        rt = dsp.resample(dsp.resample(x, 1, 2), 2, 1)
        assert np.abs(rt - x).max() < 1e-12


def test_istft_default_length_trims_both_pads():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(64)
    y = dsp.istft(dsp.stft(x, n_fft=16, hop=4), n_fft=16, hop=4)
    assert len(x) - 4 <= len(y) <= len(x)  # no trailing reflect-pad tail
    assert np.abs(y - x[: len(y)]).max() < 1e-9

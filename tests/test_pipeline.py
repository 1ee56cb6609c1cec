"""End-to-end pipeline parity smoke (SURVEY.md §5 plan item 4):
synthetic audio (tones + silence, two alternating 'speakers') through
all five stages on stub models; assert the stage tables have the
reference's shapes and invariants.
"""

import numpy as np
import pytest

from speech_data_pipeline_spark.plans.stages import (
    diarization_stage,
    host_match_stage,
    rematch_stage,
    separation_stage,
    vad_stage,
)

SR = 100  # tiny sample rate keeps arrays small


def synth_audio(spark):
    """Two files: speech bursts with silences; one all-silence file."""

    def burst(level, sec):
        return [level, -level] * (SR * sec // 2)

    def silence(sec):
        return [0.0] * (SR * sec)

    a = burst(0.5, 2) + silence(2) + burst(0.3, 2) + silence(1) + burst(0.6, 3)
    b = burst(0.4, 1) + silence(3) + burst(0.2, 2)
    c = silence(5)
    rows = [("f1", a, SR), ("f2", b, SR), ("f3", c, SR)]
    return spark.createDataFrame(rows, ["audio_id", "samples", "sr"])


@pytest.fixture(scope="module")
def stages(spark):
    audio = synth_audio(spark)
    vad = vad_stage(audio)
    scored, gaps = separation_stage(audio, vad)
    single, overlap = diarization_stage(scored, gaps)
    # toy fixture timescales: 1-2 s merged spans, so relax the reference's
    # 3 s post-merge drop (its default is asserted in
    # test_rematch_min_merged_duration_filter)
    rematched, mapping = rematch_stage(audio, single, min_merged_duration=0.0)
    hosts = spark.createDataFrame(
        [("host_a", [0.5, -0.5] * 50, SR)], ["host_id", "samples", "sr"]
    )
    matches = host_match_stage(audio, rematched, hosts)
    return dict(
        audio=audio, vad=vad, scored=scored, gaps=gaps, single=single,
        overlap=overlap, rematched=rematched, mapping=mapping, matches=matches,
    )


def test_vad_finds_bursts_not_silence(stages):
    vad = stages["vad"].collect()
    ids = {r.audio_id for r in vad}
    assert "f1" in ids and "f2" in ids
    assert "f3" not in ids  # all-silence file produces no segments
    for r in vad:
        assert r.end > r.start >= 0


def test_vad_segments_non_overlapping_sorted(stages):
    by_file = {}
    for r in stages["vad"].collect():
        by_file.setdefault(r.audio_id, []).append((r.start, r.end))
    for segs in by_file.values():
        segs.sort()
        for (s1, e1), (s2, e2) in zip(segs, segs[1:]):
            assert s2 > e1  # merged at interval=0: strictly separated


def test_separation_scores_in_unit_range(stages):
    rows = stages["scored"].collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.v_r <= 1.0 and abs(r.v_r + r.nv_r - 1.0) < 1e-9


def test_diarization_partitions_timeline(stages):
    single = stages["single"].collect()
    assert single
    for r in single:
        assert r.tag.startswith("speaker_")
    by_file = {}
    for r in single:
        by_file.setdefault(r.audio_id, []).append((r.start, r.end))
    for segs in by_file.values():
        segs.sort()
        for (s1, e1), (s2, e2) in zip(segs, segs[1:]):
            assert s2 >= e1 - 1e-9  # flattened pieces never overlap


def test_rematch_mapping_and_merge(stages):
    mapping = stages["mapping"].collect()
    assert mapping
    for r in mapping:
        assert r.global_speaker.startswith("speaker_")
    rem = stages["rematched"].collect()
    assert rem
    for r in rem:
        assert r.end - r.start <= 20.0 + 1e-9  # W2 span cap


def test_host_match_schema_and_acceptance(stages):
    m = stages["matches"]
    assert set(m.columns) == {
        "audio_id", "host_id", "speaker", "score", "audio_duration", "rank"
    }
    for r in m.collect():
        assert r.score > 0.5  # F6 acceptance predicate enforced


def test_chunked_slicing_matches_full(spark, stages):
    """attach_sliced_samples over chunk_waveforms == full-array slicing,
    with a tiny chunk size forcing multi-chunk reassembly (SURVEY.md §7
    known-hard #5: long files must flow chunked)."""
    from speech_data_pipeline_spark.operators.multimodal import (
        attach_sliced_samples,
        chunk_waveforms,
    )

    audio = stages["audio"]
    segs = stages["single"].select("audio_id", "start", "end", "tag")
    full = attach_sliced_samples(segs, audio)
    chunked = attach_sliced_samples(segs, chunk_waveforms(audio, chunk_samples=37))
    key = lambda r: (r.audio_id, r.start, r.end, r.tag)  # noqa: E731
    f = {key(r): (r.sr, list(r.samples)) for r in full.collect()}
    c = {key(r): (r.sr, list(r.samples)) for r in chunked.collect()}
    assert f and f == c


def test_rematch_min_merged_duration_filter(spark, stages):
    """W2 trailing filter (speaker_rematch.py:43): merged segments with
    span <= min_merged_duration are dropped; 0.0 keeps everything."""
    audio, single = stages["audio"], stages["single"]
    kept, _ = rematch_stage(audio, single, min_merged_duration=0.0)
    filtered, _ = rematch_stage(audio, single, min_merged_duration=1.5)
    kept_rows = kept.collect()
    f_rows = filtered.collect()
    assert len(f_rows) < len(kept_rows)  # fixture spans are ~1-2 s
    assert all(r.end - r.start > 1.5 for r in f_rows)
    key = lambda r: (r.audio_id, r.speaker, r.start, r.end)  # noqa: E731
    assert {key(r) for r in f_rows} <= {key(r) for r in kept_rows}


def test_rematch_stage_chunked_corpus_matches(spark, stages):
    """rematch_stage over the chunked corpus returns the same tables as
    over full-waveform rows."""
    from speech_data_pipeline_spark.operators.multimodal import chunk_waveforms

    audio, single = stages["audio"], stages["single"]
    r_full, m_full = rematch_stage(audio, single, min_merged_duration=0.0)
    r_chunk, m_chunk = rematch_stage(
        chunk_waveforms(audio, chunk_samples=53), single, min_merged_duration=0.0
    )
    assert r_full.count() > 0
    as_set = lambda df: {  # noqa: E731
        tuple(round(v, 9) if isinstance(v, float) else v for v in row)
        for row in df.collect()
    }
    assert as_set(r_full) == as_set(r_chunk)
    assert as_set(m_full) == as_set(m_chunk)


def test_detect_language_seeded_window(spark):
    """M8: the random sample window is pinned per (seed, audio_id) —
    identical across runs and partitionings (SURVEY §7 #4), unlike the
    reference's global-unseeded np.random.randint."""
    import numpy as np

    from speech_data_pipeline_spark.ml.stubs import detect_language

    rng = np.random.default_rng(0)
    rows = [
        ("long_a", rng.standard_normal(5000).tolist(), SR),
        ("long_b", rng.standard_normal(5000).tolist(), SR),
        ("short", rng.standard_normal(100).tolist(), SR),
    ]
    audio = spark.createDataFrame(rows, ["audio_id", "samples", "sr"])
    run1 = {r.audio_id: tuple(r) for r in detect_language(audio, n_samples=1000).collect()}
    run2 = {
        r.audio_id: tuple(r)
        for r in detect_language(
            audio.repartition(7), n_samples=1000
        ).collect()
    }
    assert run1 == run2  # deterministic across runs AND partitionings
    assert run1["short"][3] == 0  # short clip: no sampling, head window
    for aid in ("long_a", "long_b"):
        assert 0 <= run1[aid][3] <= 4000  # window stays in bounds
    assert run1["long_a"][3] != run1["long_b"][3]  # per-key offsets differ
    assert all(r[1] in {"en", "de", "fr", "es", "hi", "und"} for r in run1.values())
    # a different seed moves the window
    reseeded = {
        r.audio_id: r.win_start
        for r in detect_language(audio, n_samples=1000, seed=7).collect()
    }
    assert any(reseeded[a] != run1[a][3] for a in ("long_a", "long_b"))


def _burst_audio(spark, rows_sec):
    rows = [
        (aid, [0.5, -0.5] * (SR * sec // 2), SR) for aid, sec in rows_sec
    ]
    return spark.createDataFrame(rows, ["audio_id", "samples", "sr"])


def test_host_match_early_exit_heuristics(spark):
    """Reference host_rematch.py:49-96 verification governor:
    2-speaker ratio>=3 shortcut, dominant>=2x-rest skip, else verify all."""
    audio = _burst_audio(spark, [("h1", 14), ("h2", 16), ("h3", 9)])
    rem_rows = [
        # h1: two speakers, 9s vs 3s -> ratio 3 -> shortcut, no verify
        ("h1", "speaker_0", 0.0, 9.0),
        ("h1", "speaker_1", 9.0, 12.0),
        # h2: three speakers, 10s vs 2+2 -> dominant skipped, rest verified
        ("h2", "speaker_0", 0.0, 10.0),
        ("h2", "speaker_1", 10.0, 12.0),
        ("h2", "speaker_2", 12.0, 14.0),
        # h3: two speakers, 4s vs 3s -> ratio < 3 -> verify both
        ("h3", "speaker_0", 0.0, 4.0),
        ("h3", "speaker_1", 4.0, 7.0),
    ]
    rematched = spark.createDataFrame(
        rem_rows, ["audio_id", "speaker", "start", "end"]
    )
    hosts = spark.createDataFrame(
        [("host_b", [0.5, -0.5] * 50, SR), ("host_a", [0.5, -0.5] * 50, SR)],
        ["host_id", "samples", "sr"],
    )
    from speech_data_pipeline_spark.plans.stages import host_match_stage as hm

    fast = hm(audio, rematched, hosts).collect()
    full = hm(audio, rematched, hosts, early_exit=False).collect()

    h1 = [r for r in fast if r.audio_id == "h1"]
    assert len(h1) == 1
    assert h1[0].speaker == "speaker_1"  # the shorter of the two
    assert h1[0].score == 1.0 and h1[0].rank == 1
    assert h1[0].host_id == "host_a"  # deterministic min(host_id)
    assert abs(h1[0].audio_duration - 3.0) < 1e-6

    h2_fast = {r.speaker for r in fast if r.audio_id == "h2"}
    h2_full = {r.speaker for r in full if r.audio_id == "h2"}
    assert "speaker_0" not in h2_fast  # dominant speaker skipped
    assert "speaker_0" in h2_full  # ...but would have matched unguarded
    assert h2_fast == {"speaker_1", "speaker_2"}

    key = lambda r: (r.audio_id, r.host_id, r.speaker)  # noqa: E731
    h3_fast = sorted([r for r in fast if r.audio_id == "h3"], key=key)
    h3_full = sorted([r for r in full if r.audio_id == "h3"], key=key)
    assert h3_fast and [tuple(r) for r in h3_fast] == [tuple(r) for r in h3_full]


def test_host_match_single_speaker_verifies_nobody(spark):
    """One speaker: dominant >= 2*0 -> verify list empty (reference else
    branch with len(sorted)==1)."""
    audio = _burst_audio(spark, [("s1", 6)])
    rematched = spark.createDataFrame(
        [("s1", "speaker_0", 0.0, 5.0)], ["audio_id", "speaker", "start", "end"]
    )
    hosts = spark.createDataFrame(
        [("host_a", [0.5, -0.5] * 50, SR)], ["host_id", "samples", "sr"]
    )
    from speech_data_pipeline_spark.plans.stages import host_match_stage as hm

    assert hm(audio, rematched, hosts).count() == 0
    assert hm(audio, rematched, hosts, early_exit=False).count() == 1


def test_asr_and_alignment_stubs(spark, stages):
    from speech_data_pipeline_spark.ml.stubs import align, transcribe

    seg = stages["single"].select(
        "audio_id", "start", "end"
    ).limit(5)
    asr = transcribe(seg)
    assert asr.count() > 0 and "text" in asr.columns
    aligned = align(asr.select("audio_id", "start", "end", "text"))
    rows = aligned.collect()
    assert rows
    # word spans tile the segment and stay ordered
    by_seg = {}
    for r in rows:
        by_seg.setdefault((r.audio_id, round(r.start, 6)), []).append(r)
    for r in rows:
        assert r.end > r.start and 0.5 <= r.score <= 1.0


def test_transcribe_segments_full_orchestration(spark):
    """W7/M7: per-file language resolution, JVM-side segment slicing,
    audio-dependent stub text, 3-decimal rounding, speaker passthrough."""
    from speech_data_pipeline_spark.ml.stubs import transcribe_segments

    audio = synth_audio(spark)
    seg = spark.createDataFrame(
        [
            ("f1", 0.0005, 2.0004, "speaker_0"),
            ("f1", 6.0, 7.0, "speaker_1"),
            ("f2", 0.0, 1.0, "speaker_0"),
        ],
        ["audio_id", "start", "end", "speaker"],
    )
    out = {(r.audio_id, r.start): r for r in transcribe_segments(audio, seg).collect()}
    r1 = out[("f1", 0.001)]  # rounded to 3 decimals (reference :173-175)
    assert r1.end == 2.0 and r1.speaker == "speaker_0"
    # one pseudo-word per second of the SLICED window
    assert len(r1.text.split()) == 2
    assert len(out[("f1", 6.0)].text.split()) == 1
    # text derives from audio content: the f1 burst (0.5) and the f2
    # burst (0.4) give different rms words for the same span shape
    assert r1.text.split()[0] != out[("f2", 0.0)].text.split()[0]
    # language resolved once per file (detect_language), constant per file
    assert r1.language == out[("f1", 6.0)].language
    # preset language bypasses detection (tokenizer-preset branch)
    pre = transcribe_segments(audio, seg, language="de").collect()
    assert {r.language for r in pre} == {"de"}
    # segments without a speaker column get null passthrough
    no_spk = transcribe_segments(audio, seg.drop("speaker"))
    assert {r.speaker for r in no_spk.collect()} == {None}
    # deterministic across partitionings
    again = {
        (r.audio_id, r.start): tuple(r)
        for r in transcribe_segments(audio.repartition(5), seg.repartition(3)).collect()
    }
    assert again == {k: tuple(v) for k, v in out.items()}

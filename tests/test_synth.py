"""Synthesizer unit tests: attention end-trim index, dB silence trim,
post-hoc attention transforms, and an end-to-end random-weights synthesis
through the public Synthesizer API (CPU, small shapes)."""

import os

import numpy as np
import pytest

from tacotron_tpu.config import Config, ModelConfig
from tacotron_tpu.synth import (Synthesizer, attention_trim_index,
                                posthoc_attention, trim_silence_db)


def test_attention_trim_index_monotonic_path():
    """A clean monotonic alignment reaching the text end trims right after
    the last encoder position is first attended (reference
    synthesizer.py:242-263)."""
    T_in, T_dec, r = 10, 12, 4
    align = np.zeros((T_in, T_dec), np.float32)
    path = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9]  # reaches end at step 9
    for t, e in enumerate(path):
        align[e, t] = 1.0
    end = attention_trim_index(align, seq_len=T_in, reduction_factor=r)
    # argmax path hits end_idx=9 at decoder step 9; counter hits its cap
    # (min(count,5)=3) at step 11 -> jdx=11 -> 4*11+3
    assert end == r * 11 + 3


def test_attention_trim_index_clips_to_seq_len():
    align = np.zeros((20, 8), np.float32)
    align[19, :] = 1.0  # attends past the logical text (padding region)
    end = attention_trim_index(align, seq_len=5, reduction_factor=4)
    assert end >= 3  # never negative/zero-length


def test_trim_silence_db():
    sr = 24000
    speech = 0.5 * np.sin(2 * np.pi * 220 *
                          np.arange(sr) / sr).astype(np.float32)
    tail = np.zeros(sr, np.float32)
    wav = np.concatenate([speech, tail])
    out = trim_silence_db(wav, top_db=50)
    assert len(out) < len(wav)
    assert len(out) >= len(speech)
    # all-silence input comes back unchanged
    silent = np.zeros(4 * 5120, np.float32)
    np.testing.assert_array_equal(trim_silence_db(silent), silent)


def test_posthoc_attention_modes():
    rng = np.random.default_rng(0)
    al = rng.random((2, 6, 5)).astype(np.float32)  # [N, T_in, T_dec]
    one_hot = posthoc_attention(al, 1)
    assert one_hot.shape == al.shape
    np.testing.assert_allclose(one_hot.sum(axis=1), np.ones((2, 5)))
    assert set(np.unique(one_hot)) <= {0.0, 1.0}
    # mode 3 (pruning) is the same transform as shipped in the reference
    np.testing.assert_array_equal(posthoc_attention(al, 3), one_hot)
    sharp = posthoc_attention(al, 2)
    np.testing.assert_allclose(sharp.sum(axis=1), np.ones((2, 5)), rtol=1e-5)
    with pytest.raises(ValueError):
        posthoc_attention(al, 9)


def test_synthesizer_end_to_end_random_weights():
    cfg = Config().replace(model=ModelConfig(max_iters=6))
    synth = Synthesizer().init_random(cfg)
    out = synth.synthesize(texts=["안녕하세요", "반갑습니다 여러분 모두"],
                           max_steps=6, vocode="host",
                           attention_trim=True, librosa_trim=False)
    assert len(out["wavs"]) == 2
    for wav, align, seq in zip(out["wavs"], out["alignments"],
                               out["sequences"]):
        assert np.isfinite(wav).all() and wav.ndim == 1
        assert align.shape[0] == len(seq)  # cropped to true text length
    # the two inputs differ -> different alignments shapes per text length
    assert out["alignments"][0].shape[0] != out["alignments"][1].shape[0]


def test_synthesizer_vocode_none_and_bad_mode():
    cfg = Config()
    synth = Synthesizer().init_random(cfg)
    out = synth.synthesize(texts=["안녕"], max_steps=4, vocode="none")
    assert out["wavs"][0].size == 0
    with pytest.raises(ValueError, match="vocode"):
        synth.synthesize(texts=["안녕"], max_steps=4, vocode="loud")


def test_sharded_synthesis_on_mesh():
    """Batched decode + Griffin-Lim sharded over the 8-device data axis
    matches the single-device program (SURVEY §2.5 batched decode row)."""
    import jax
    import jax.numpy as jnp
    from tacotron_tpu.parallel import make_mesh
    from tacotron_tpu.synth.synthesizer import make_sharded_synthesis
    from tacotron_tpu.dsp import chip as dsp_chip

    cfg = Config()
    synth = Synthesizer().init_random(cfg, seed=2)
    plan = make_mesh()
    assert plan.data_size == 8

    rng = np.random.default_rng(0)
    N, T_in, steps = 8, 16, 4
    inputs = np.asarray(rng.integers(2, 80, (N, T_in)), np.int32)
    lengths = np.full((N,), T_in, np.int32)

    fn = make_sharded_synthesis(cfg, plan, max_steps=steps)
    sharding = plan.batch()
    wavs, aligns = fn(synth.variables,
                      jax.device_put(jnp.asarray(inputs), sharding),
                      jax.device_put(jnp.asarray(lengths), sharding), None)
    assert wavs.shape[0] == N and aligns.shape == (N, T_in, steps)
    assert np.isfinite(np.asarray(wavs)).all()

    # single-device result matches to float tolerance
    out = synth.model.apply(synth.variables, inputs, lengths, train=False,
                            max_steps=steps)
    ref_wavs = dsp_chip.batched_linear_to_waveform(
        jnp.asarray(out["linear_outputs"]), cfg.audio)
    np.testing.assert_allclose(np.asarray(wavs), np.asarray(ref_wavs),
                               rtol=1e-4, atol=1e-5)


def test_attention_trim_frames_matches_host():
    """The vectorized on-device trim equals the reference host loop on
    random alignments."""
    import jax.numpy as jnp
    from tacotron_tpu.synth.synthesizer import attention_trim_frames
    rng = np.random.default_rng(11)
    N, T_in, T_dec, r = 12, 24, 20, 4
    alignments = rng.random((N, T_in, T_dec)).astype(np.float32)
    lengths = rng.integers(3, T_in + 1, (N,)).astype(np.int32)
    got = np.asarray(attention_trim_frames(
        jnp.asarray(alignments), jnp.asarray(lengths), r))
    for i in range(N):
        want = attention_trim_index(alignments[i, :lengths[i], :],
                                    int(lengths[i]), r)
        assert int(got[i]) == want, (i, int(got[i]), want)


def test_synthesizer_fused_chip_path():
    """vocode="chip" runs decode+trim+GL as one program and returns trimmed
    wavs at TRUE amplitude (the packed int16 peak normalization is undone
    on the host); batch padding rows are discarded."""
    cfg = Config().replace(model=ModelConfig(max_iters=6))
    synth = Synthesizer().init_random(cfg)
    texts = ["안녕하세요", "반갑습니다 여러분", "좋은 아침입니다"]
    out = synth.synthesize(texts=texts, max_steps=6, vocode="chip",
                           attention_trim=False, librosa_trim=False)
    assert len(out["wavs"]) == 3
    hop = cfg.audio.hop_length
    for wav, align, seq in zip(out["wavs"], out["alignments"],
                               out["sequences"]):
        assert wav.ndim == 1 and np.isfinite(wav).all()
        assert wav.size % hop == 0 and wav.size >= 4 * hop  # >= r frames
        assert align.shape[0] == len(seq)
    assert out["linear"] is None  # spectrograms stay on device (documented)

    # amplitude parity with the host vocoder: same spectrograms, so the
    # per-utterance peak must match within GL-engine tolerance — loudness
    # statistics downstream (tools/speaker_eval.py) depend on this
    host = synth.synthesize(texts=texts, max_steps=6, vocode="host",
                            attention_trim=False, librosa_trim=False)
    for wc, wh in zip(out["wavs"], host["wavs"]):
        pc, ph = np.abs(wc).max(), np.abs(wh).max()
        assert pc > 0 and ph > 0
        assert 0.5 < pc / ph < 2.0, (pc, ph)


def test_attention_health_metrics():
    """Diagonal attention is healthy; collapsed / diffuse / backwards
    attention each trip their respective metric."""
    from tacotron_tpu.synth import attention_health

    T_in, T_dec = 20, 40
    # clean diagonal sweep: every token covered, sharp, monotonic
    diag = np.zeros((T_in, T_dec), np.float32)
    diag[np.minimum(np.arange(T_dec) // 2, T_in - 1),
         np.arange(T_dec)] = 1.0
    h = attention_health(diag)
    assert h["ok"] and h["coverage"] == 1.0 and h["monotonicity"] == 1.0

    # collapsed: all steps attend token 3 — coverage fails
    col = np.zeros((T_in, T_dec), np.float32)
    col[3, :] = 1.0
    h = attention_health(col)
    assert not h["ok"] and h["coverage"] < 0.3

    # diffuse: uniform attention — focus fails
    h = attention_health(np.full((T_in, T_dec), 1.0 / T_in, np.float32))
    assert not h["ok"] and h["focus"] < 0.25

    # backwards: argmax path jumps around — monotonicity fails
    rng = np.random.default_rng(0)
    jumpy = np.zeros((T_in, T_dec), np.float32)
    jumpy[rng.integers(0, T_in, T_dec), np.arange(T_dec)] = 1.0
    assert attention_health(jumpy)["monotonicity"] < 0.9


def test_synthesize_robust_retries_failed_attention():
    """synthesize_robust diagnoses every utterance and re-decodes the
    failed ones with post-hoc manual attention, preserving shapes."""
    cfg = Config().replace(model=ModelConfig(max_iters=6))
    synth = Synthesizer().init_random(cfg)
    texts = ["안녕하세요", "반갑습니다 여러분"]
    res = synth.synthesize_robust(texts=texts, max_steps=6,
                                  attention_trim=False, librosa_trim=False,
                                  retry_mode=1)
    assert len(res["attention_health"]) == 2
    assert {"ok", "coverage", "focus", "monotonicity"} <= \
        res["attention_health"][0].keys()
    # a random-init model fails the health check -> everything retried
    assert res["retried"] == [i for i, h in
                              enumerate(res["attention_health"])
                              if not h["ok"]]
    assert len(res["wavs"]) == 2
    for wav, align, seq in zip(res["wavs"], res["alignments"],
                               res["sequences"]):
        assert wav.ndim == 1 and np.isfinite(wav).all()
        assert align.shape[0] == len(seq)
    # diagnose-only mode leaves everything alone
    res0 = synth.synthesize_robust(texts=texts, max_steps=6,
                                   attention_trim=False, librosa_trim=False,
                                   retry_mode=0)
    assert res0["retried"] == []


def test_synthesizer_serving_options(tmp_path):
    """return_alignments=False skips the alignment fetch; fast_vocoder=True
    swaps in momentum Griffin-Lim — wavs stay finite, same trimmed shapes,
    and the two vocoder presets produce correlated audio."""
    cfg = Config().replace(model=ModelConfig(max_iters=6))
    synth = Synthesizer().init_random(cfg)
    texts = ["안녕하세요", "반갑습니다 여러분"]
    base = synth.synthesize(texts=texts, max_steps=6, vocode="chip",
                            attention_trim=False, librosa_trim=False)
    fast = synth.synthesize(texts=texts, max_steps=6, vocode="chip",
                            attention_trim=False, librosa_trim=False,
                            return_alignments=False, fast_vocoder=True)
    assert fast["alignments"] == []
    assert len(fast["wavs"]) == 2
    for wb, wf in zip(base["wavs"], fast["wavs"]):
        assert wf.shape == wb.shape and np.isfinite(wf).all()
    # save_results must not let zip() truncate on the empty alignments of
    # the fast preset: every waveform is written, plots are just skipped
    out_dir = str(tmp_path / "fast_out")
    paths = synth.save_results(fast, out_dir)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    assert not [f for f in os.listdir(out_dir) if f.endswith(".png")]
    # multi-chunk pipelined path: force two chunks via VOCODER_MAX_BATCH
    old = Synthesizer.VOCODER_MAX_BATCH
    try:
        Synthesizer.VOCODER_MAX_BATCH = 1
        two = synth.synthesize(texts=texts, max_steps=6, vocode="chip",
                               attention_trim=False, librosa_trim=False)
    finally:
        Synthesizer.VOCODER_MAX_BATCH = old
    for wa, wb in zip(base["wavs"], two["wavs"]):
        np.testing.assert_allclose(wa, wb, atol=1e-4)


def test_prewarm_compiles_serving_programs():
    """prewarm() populates the fused-program cache so the first real
    request hits a compiled program (app.py --prewarm)."""
    cfg = Config().replace(model=ModelConfig(max_iters=4))
    synth = Synthesizer().init_random(cfg)
    n = synth.prewarm(token_buckets=(32,), batch_sizes=(1,),
                      max_steps=4, fast_vocoder=False)
    assert n == 1
    key = ("fused", 32, 4, 0, 1, 0, "int16")
    assert key in synth._compiled
    before = dict(synth._compiled)
    out = synth.synthesize(texts=["안녕하세요"], max_steps=4,
                           librosa_trim=False)
    assert np.isfinite(out["wavs"][0]).all()
    # the request reused the prewarmed program — no new fused key appeared
    assert [k for k in synth._compiled if k not in before] == []


def test_adaptive_max_steps_ladder():
    """Length-adaptive serving budget: short texts get a small decode
    budget (rounded up a fixed ladder), long texts the reference cap."""
    from tacotron_tpu.synth.synthesizer import (STEP_LADDER,
                                                adaptive_max_steps)
    # short text: 4.0 steps/token (the corpus filter's admitted worst
    # case), clipped to min_iters, rounded up the rung ladder
    assert adaptive_max_steps(10, 30, 200) == 50
    assert adaptive_max_steps(12, 30, 200) == 50
    assert adaptive_max_steps(13, 30, 200) == 100
    assert adaptive_max_steps(25, 30, 200) == 100
    assert adaptive_max_steps(30, 30, 200) == 150
    assert adaptive_max_steps(40, 30, 200) == 200
    # at/after the reference's min_tokens bound: its full decode cap —
    # no admissible utterance can be truncated vs the reference
    assert adaptive_max_steps(50, 30, 200) == 200
    assert adaptive_max_steps(500, 30, 200) == 200
    # a caller-lowered cap wins over every rung
    assert adaptive_max_steps(500, 30, 80) == 80
    assert adaptive_max_steps(1, 30, 200) == STEP_LADDER[0]


def test_prewarm_rungs_follow_steps_per_token():
    """prewarm must compile exactly the rung set synthesize() will pick —
    including a non-default ModelConfig.steps_per_token (the knob the
    truncation warning tells users to raise): a mismatch would make the
    first real request pay the XLA compile prewarm exists to hide."""
    import dataclasses

    from tacotron_tpu.synth.synthesizer import (adaptive_max_steps,
                                                prewarm_step_rungs)
    cfg = Config()
    cfg8 = cfg.replace(model=dataclasses.replace(cfg.model,
                                                 steps_per_token=8.0))
    buckets = (32, 64)
    r4 = prewarm_step_rungs(cfg, buckets)
    r8 = prewarm_step_rungs(cfg8, buckets)
    assert r4 != r8  # the knob actually changes the compiled set
    # every budget adaptive_max_steps can choose for a text routed to a
    # bucket is in that bucket's prewarmed set
    for c, rungs in ((cfg, r4), (cfg8, r8)):
        prev = 0
        for bucket in buckets:
            for t in range(prev + 1, bucket + 1):
                want = adaptive_max_steps(
                    t, c.data.min_iters, c.model.max_iters,
                    steps_per_token=c.model.steps_per_token)
                assert want in rungs[bucket], (t, bucket, want)
            prev = bucket
    # explicit max_steps pins a single rung
    assert prewarm_step_rungs(cfg8, buckets, max_steps=100) == {
        32: [100], 64: [100]}


def test_synthesize_default_steps_are_length_adaptive():
    """With max_steps omitted, short texts decode fewer steps (ladder
    rung) than the max_iters cap; output still trims/behaves normally."""
    cfg = Config()
    cfg = cfg.replace(model=ModelConfig(
        embedding_size=32, enc_prenet_sizes=(32, 16), enc_bank_size=4,
        enc_bank_channel_size=16, enc_highway_depth=2, enc_rnn_size=16,
        enc_proj_sizes=(16, 16), attention_size=16, attention_state_size=16,
        dec_layer_num=2, dec_rnn_size=16, dec_prenet_sizes=(16, 8),
        post_bank_size=2, post_bank_channel_size=16, post_highway_depth=2,
        post_rnn_size=16, post_proj_sizes=(16, 80), max_iters=200))
    synth = Synthesizer().init_random(cfg)
    res = synth.synthesize(texts=["안녕."], attention_trim=False,
                           librosa_trim=False, vocode="none")
    # "안녕." -> ~8 tokens -> ladder rung 50, not max_iters=200
    r = cfg.model.reduction_factor
    t_dec = res["alignments"][0].shape[1]
    assert t_dec == 50, t_dec
    assert res["linear"][0].shape[0] == 50 * r


def test_synthesize_collect_timings():
    """The serving phase budget (frontend/dispatch/device/fetch/post) is
    reported when requested and sums to the total."""
    cfg = Config()
    cfg = cfg.replace(model=ModelConfig(
        embedding_size=32, enc_prenet_sizes=(32, 16), enc_bank_size=4,
        enc_bank_channel_size=16, enc_highway_depth=2, enc_rnn_size=16,
        enc_proj_sizes=(16, 16), attention_size=16, attention_state_size=16,
        dec_layer_num=2, dec_rnn_size=16, dec_prenet_sizes=(16, 8),
        post_bank_size=2, post_bank_channel_size=16, post_highway_depth=2,
        post_rnn_size=16, post_proj_sizes=(16, 80)))
    synth = Synthesizer().init_random(cfg)
    res = synth.synthesize(texts=["안녕하세요"], max_steps=6,
                           attention_trim=False, librosa_trim=False,
                           fast_vocoder=True, return_alignments=False,
                           collect_timings=True)
    t = res["timings"]
    assert set(t) == {"frontend_ms", "dispatch_ms", "device_ms",
                      "fetch_ms", "post_ms", "total_ms"}
    parts = (t["frontend_ms"] + t["dispatch_ms"] + t["device_ms"]
             + t["fetch_ms"] + t["post_ms"])
    assert abs(parts - t["total_ms"]) < 1.0
    assert len(res["wavs"]) == 1 and len(res["wavs"][0]) > 0


def test_split_text_sentence_and_clause_budgets():
    """split_text cuts at sentence boundaries first, packs short sentences,
    and falls back to clause/word splits for oversized sentences — every
    chunk respects the token budget measured with the real frontend."""
    from tacotron_tpu.synth.synthesizer import split_text
    from tacotron_tpu.text import text_to_sequence

    cleaners = ["korean_cleaners"]

    def ntok(s):
        return len(text_to_sequence(s, cleaners))

    text = "안녕하세요. 반갑습니다! 오늘 날씨가 좋네요? 감사합니다."
    # generous budget: everything packs into one chunk
    assert split_text(text, 500, cleaners) == [text]
    # tight budget: chunks split on sentence boundaries, order preserved
    chunks = split_text(text, 30, cleaners)
    assert len(chunks) >= 2
    assert all(ntok(c) <= 30 for c in chunks)
    assert "".join(chunks).replace(" ", "") == text.replace(" ", "")
    # an oversized single sentence splits at clause punctuation
    long_sentence = "하나, 둘, 셋, 넷, 다섯, 여섯, 일곱, 여덟."
    chunks = split_text(long_sentence, 20, cleaners)
    assert len(chunks) >= 2
    assert all(ntok(c) <= 20 for c in chunks)
    # no punctuation at all: word-boundary fallback still respects budget
    words = "가나다라 마바사아 자차카타 파하가나 다라마바"
    chunks = split_text(words, 16, cleaners)
    assert all(ntok(c) <= 16 for c in chunks)
    assert " ".join(chunks) == words


def test_split_text_never_loses_text():
    """Splitting must never DROP input: punctuation not followed by
    whitespace (decimals, ellipses, quoted punctuation) is not a split
    point and the text survives verbatim (regression: an earlier
    token-matching regex silently dropped '버전 2.' from '버전 2.5를')."""
    from tacotron_tpu.synth.synthesizer import split_text

    cleaners = ["korean_cleaners"]
    cases = [
        "버전 2.5를 사용하세요.",
        "끝...다음 문장이 이어집니다.",
        "그가 \"안녕하세요.\"라고 말했다. 그리고 떠났다.",
        "쉼표,뒤에,공백이,없다",
        "마침표 없이 끝나는 문장",
    ]
    for text in cases:
        for budget in (500, 20):
            chunks = split_text(text, budget, cleaners)
            # every input character (ignoring whitespace) is preserved,
            # in order
            assert ("".join(chunks).replace(" ", "")
                    == text.replace(" ", "")), (text, budget, chunks)


def test_synthesize_long_stitches_chunks():
    """synthesize_long = one batched decode over the chunks + silence gaps
    between them (the working replacement for the reference's dead
    short_concat, /root/reference/synthesizer.py:301-367)."""
    cfg = Config().replace(model=ModelConfig(max_iters=6))
    synth = Synthesizer().init_random(cfg)
    text = "안녕하세요. 반갑습니다 여러분."
    out = synth.synthesize_long(
        text, max_chunk_tokens=12, robust=False, max_steps=6,
        vocode="host", attention_trim=False, librosa_trim=False,
        gap_sentence_ms=100.0, gap_clause_ms=50.0)
    assert len(out["chunks"]) >= 2
    part_len = sum(len(w) for w in out["parts"]["wavs"])
    n_gaps = len(out["chunks"]) - 1
    sr = cfg.audio.sample_rate
    # every inter-chunk gap is 50-100 ms of true silence
    assert len(out["wav"]) >= part_len + n_gaps * int(sr * 0.05)
    assert np.isfinite(out["wav"]).all()


def test_wire_format_mulaw8_matches_int16():
    """The opt-in 8-bit mu-law wire format (half the fetch bytes) decodes
    to the same waveform as the int16 wire within mu-law quantization
    error; bad combinations raise."""
    cfg = Config().replace(model=ModelConfig(max_iters=6))
    synth = Synthesizer().init_random(cfg)
    kw = dict(texts=["안녕하세요 반갑습니다"], max_steps=6, vocode="chip",
              attention_trim=False, librosa_trim=False,
              return_alignments=False)
    ref = synth.synthesize(wire_format="int16", **kw)["wavs"][0]
    mu = synth.synthesize(wire_format="mulaw8", **kw)["wavs"][0]
    assert mu.shape == ref.shape
    # quantization error is relative to the WIRE's full scale — the
    # per-utterance peak-normalization denominator (floored at 0.01,
    # synthesizer._fused) — not the signal peak.  mu-law's worst-case
    # step near full scale is ~2.3% of full scale.
    full_scale = max(float(np.abs(ref).max()), 0.01)
    assert float(np.abs(mu - ref).max()) <= 0.03 * full_scale
    if float(np.abs(ref).max()) > 0.02:  # audible signal: also correlate
        corr = float(np.corrcoef(mu, ref)[0, 1])
        assert corr > 0.995, corr
    with pytest.raises(ValueError, match="wire_format"):
        synth.synthesize(wire_format="adpcm", **kw)
    with pytest.raises(ValueError, match="chip path"):
        synth.synthesize(texts=["안녕"], max_steps=4, vocode="host",
                         wire_format="mulaw8")


def test_mulaw_codec_full_range_snr():
    """The exact production companding pair (jnp encode on device, numpy
    decode on host) round-trips a full-range signal at mu-law-8 quality
    (>= 35 dB SNR) and is exact at zero and the extremes' sign."""
    import jax.numpy as jnp

    from tacotron_tpu.synth.synthesizer import mulaw_decode, mulaw_encode

    t = np.linspace(0, 1, 24000, dtype=np.float32)
    x = (0.9 * np.sin(2 * np.pi * 220 * t)
         * np.exp(-2 * t)).astype(np.float32)  # decaying full-range tone
    codes = np.asarray(mulaw_encode(jnp.asarray(x)))
    assert codes.dtype == np.uint8
    rec = mulaw_decode(codes)
    err = rec - x
    snr_db = 10 * np.log10(float((x ** 2).sum()) / float((err ** 2).sum()))
    assert snr_db >= 35.0, snr_db
    # zero maps to the center code and back to exactly zero
    assert int(np.asarray(mulaw_encode(jnp.zeros((4,))))[0]) == 128
    assert mulaw_decode(np.full((4,), 128, np.uint8)).max() == 0.0
    # the encoder's extreme codes decode to exactly full scale, and the
    # unreachable code 0 is clipped rather than overshooting
    np.testing.assert_allclose(
        mulaw_decode(np.array([1, 255], np.uint8)), [-1.0, 1.0], atol=1e-6)
    assert mulaw_decode(np.array([0], np.uint8))[0] == -1.0
    # full-range inputs land on the extreme codes
    ext = np.asarray(mulaw_encode(jnp.asarray([-1.0, 1.0])))
    np.testing.assert_array_equal(ext, [1, 255])


def test_synthesize_long_fades_stitch_boundaries():
    """Every piece edge is faded so trim-cut samples don't click against
    the inserted silence or playback start/stop; fade_ms=0 disables
    fading entirely (audio byte-identical to the raw pieces)."""
    cfg = Config().replace(model=ModelConfig(max_iters=6))
    synth = Synthesizer().init_random(cfg)
    kw = dict(max_chunk_tokens=12, robust=False, max_steps=6,
              vocode="host", attention_trim=False, librosa_trim=False,
              gap_sentence_ms=50.0, gap_clause_ms=50.0)
    out = synth.synthesize_long("안녕하세요. 반갑습니다 여러분.",
                                fade_ms=10.0, **kw)
    assert len(out["chunks"]) >= 2
    sr = cfg.audio.sample_rate
    raw = out["parts"]["wavs"]
    stitched = out["wav"]
    n0 = len(raw[0])
    # every edge of every piece fades to (near) zero
    assert abs(stitched[0]) < 1e-6
    assert abs(stitched[n0 - 1]) < 1e-6
    assert abs(stitched[-1]) < 1e-6
    # the gap between pieces is exact silence
    gap = int(sr * 50.0 / 1000.0)
    np.testing.assert_array_equal(stitched[n0:n0 + gap], 0.0)
    # fade_ms=0 leaves the pieces untouched
    out0 = synth.synthesize_long("안녕하세요. 반갑습니다 여러분.",
                                 fade_ms=0.0, **kw)
    raw0 = out0["parts"]["wavs"]
    np.testing.assert_array_equal(out0["wav"][:len(raw0[0])], raw0[0])


def test_split_text_hard_splits_unbroken_runs():
    """A whitespace/punctuation-free run longer than the budget (URL, long
    number, no-space CJK) is split at character level instead of being
    emitted as one oversized chunk that the decode cap would silently
    truncate (round-3 advisor finding)."""
    from tacotron_tpu.synth.synthesizer import split_text
    from tacotron_tpu.text import text_to_sequence

    cleaners = ["korean_cleaners"]

    def ntok(s):
        return len(text_to_sequence(s, cleaners))

    run = "가나다라마바사아자차카타파하" * 8  # one 112-char 'word'
    chunks = split_text(run, 20, cleaners)
    assert len(chunks) > 1
    assert all(ntok(c) <= 20 for c in chunks)
    assert "".join(chunks) == run


def test_adaptive_budget_steps_per_token_is_configurable():
    """ModelConfig.steps_per_token drives the length-adaptive decode
    budget; a JSON config round-trips it (round-3 advisor finding: the
    4.0 constant silently truncated slower voices)."""
    from tacotron_tpu.config import Config
    from tacotron_tpu.synth.synthesizer import adaptive_max_steps

    assert adaptive_max_steps(20, 30, 200, steps_per_token=4.0) == 100
    assert adaptive_max_steps(20, 30, 200, steps_per_token=8.0) == 200

    cfg = Config()
    assert cfg.model.steps_per_token == 4.0
    loaded = Config.from_json(cfg.to_json())
    assert loaded.model.steps_per_token == 4.0


def test_attention_health_path_coverage():
    """path_coverage rates soft-monotonic (bah_mon) alignment fairly: a
    WIDE but perfectly-travelling attention bump scores low focus yet full
    path coverage; collapsed attention scores low on both."""
    from tacotron_tpu.synth import attention_health

    T_in, T_dec = 20, 40
    # wide soft bump whose CENTER sweeps the diagonal (sigma 4 tokens)
    pos = np.minimum(np.arange(T_dec) / 2.0, T_in - 1)
    grid = np.arange(T_in)[:, None]
    soft = np.exp(-0.5 * ((grid - pos[None, :]) / 4.0) ** 2)
    soft = (soft / soft.sum(0, keepdims=True)).astype(np.float32)
    h = attention_health(soft)
    assert h["focus"] < 0.25          # under-rated by sharpness metrics
    assert h["path_coverage"] == 1.0  # but the path visits every token
    assert not h["ok"]                # sharpness gates: fails
    assert attention_health(soft, soft_monotonic=True)["ok"]  # fair gate

    col = np.zeros((T_in, T_dec), np.float32)
    col[3, :] = 1.0
    h = attention_health(col)
    assert h["path_coverage"] < 0.3
    # collapsed attention fails under BOTH gates
    assert not attention_health(col, soft_monotonic=True)["ok"]

"""DSP tests: STFT round-trips, host/chip parity, Griffin-Lim SNR."""

import numpy as np
import pytest

from tacotron_tpu.config import AudioConfig
from tacotron_tpu.dsp import chip, host
from tacotron_tpu.dsp.primitives import mel_basis, padded_window

CFG = AudioConfig()
# Small config keeps CPU-backend tests fast while exercising the same code.
FAST = AudioConfig(num_freq=257, num_mels=80, sample_rate=16000,
                   frame_length_ms=32, frame_shift_ms=8, griffin_lim_iters=12)


def _test_signal(num_samples: int, sr: int) -> np.ndarray:
    t = np.arange(num_samples) / sr
    sig = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.1 * np.sin(2 * np.pi * 880 * t))
    return sig.astype(np.float32)


class TestStftParams:
    def test_derived_params_match_reference(self):
        # reference audio/__init__.py:118-122 with hparams 24kHz/1025/50ms/12.5ms
        assert CFG.n_fft == 2048
        assert CFG.hop_length == 300
        assert CFG.win_length == 1200

    def test_window_is_centered(self):
        w = padded_window(1200, 2048)
        assert w.shape == (2048,)
        assert w[:424].sum() == 0 and w[-424:].sum() == 0
        assert w.max() == pytest.approx(1.0, abs=1e-6)


class TestMelBasis:
    def test_shape_and_coverage(self):
        basis = mel_basis(24000, 2048, 80)
        assert basis.shape == (80, 1025)
        # every filter has positive area; all FFT bins inside [fmin, fmax]
        # are covered by at least one filter
        assert (basis.sum(axis=1) > 0).all()

    def test_slaney_normalization(self):
        # Slaney norm makes filter area ~ 2 / bandwidth: peak amplitudes
        # should decrease with center frequency in the log region
        basis = mel_basis(24000, 2048, 80)
        peaks = basis.max(axis=1)
        assert peaks[10] > peaks[70]


class TestHostStft:
    def test_roundtrip_snr(self):
        y = _test_signal(FAST.sample_rate, FAST.sample_rate)
        rec = host.istft(host.stft(y, FAST), FAST)
        n = min(len(y), len(rec))
        err = y[:n] - rec[:n]
        snr = 10 * np.log10(np.sum(y[:n] ** 2) / max(np.sum(err ** 2), 1e-12))
        assert snr > 40, f"iSTFT round-trip SNR too low: {snr:.1f} dB"

    def test_spectrogram_shapes(self):
        y = _test_signal(FAST.sample_rate, FAST.sample_rate)
        lin = host.spectrogram(y, FAST)
        mel = host.melspectrogram(y, FAST)
        assert lin.shape[0] == FAST.num_freq
        assert mel.shape[0] == FAST.num_mels
        assert lin.shape[1] == mel.shape[1]
        assert lin.min() >= 0 and lin.max() <= 1
        assert mel.min() >= 0 and mel.max() <= 1

    def test_preemphasis_roundtrip(self):
        y = _test_signal(4000, FAST.sample_rate)
        rec = host.inv_preemphasis(host.preemphasis(y, FAST), FAST)
        np.testing.assert_allclose(rec, y, atol=1e-5)


class TestChipParity:
    """The JAX chip implementations must match the numpy host ones."""

    def test_stft_parity(self):
        y = _test_signal(FAST.sample_rate // 2, FAST.sample_rate)
        host_spec = host.stft(y.astype(np.float64), FAST)  # [F, T]
        chip_spec = np.asarray(chip.stft(y, FAST))         # [T, F]
        np.testing.assert_allclose(
            np.abs(chip_spec.T), np.abs(host_spec), atol=2e-2, rtol=1e-3)

    def test_istft_parity(self):
        y = _test_signal(FAST.sample_rate // 2, FAST.sample_rate)
        spec = host.stft(y.astype(np.float64), FAST)
        host_rec = host.istft(spec, FAST)
        chip_rec = np.asarray(
            chip.istft(spec.T.astype(np.complex64), len(host_rec), FAST))
        np.testing.assert_allclose(chip_rec, host_rec, atol=1e-3)

    def test_feature_parity(self):
        y = _test_signal(FAST.sample_rate // 2, FAST.sample_rate)
        np.testing.assert_allclose(
            np.asarray(chip.melspectrogram(y, FAST)).T,
            host.melspectrogram(y, FAST), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(chip.spectrogram(y, FAST)).T,
            host.spectrogram(y, FAST), atol=2e-3)

    def test_inv_preemphasis_parity(self):
        y = _test_signal(4000, FAST.sample_rate)
        np.testing.assert_allclose(
            np.asarray(chip.inv_preemphasis(y, FAST)),
            host.inv_preemphasis(y, FAST).astype(np.float32), atol=1e-4)


class TestGriffinLim:
    def test_chip_griffin_lim_reconstructs(self):
        y = _test_signal(FAST.sample_rate // 2, FAST.sample_rate)
        spec = host.spectrogram(y, FAST)  # [F, T] normalized
        wav = np.asarray(chip.linear_to_waveform(spec.T, FAST))
        assert wav.shape[0] == (spec.shape[1] - 1) * FAST.hop_length
        assert np.isfinite(wav).all()
        # the reconstruction must carry the dominant pitch: check spectral
        # correlation between original and reconstruction
        orig_mag = np.abs(host.stft(y[: len(wav)], FAST))
        rec_mag = np.abs(host.stft(wav, FAST))
        n = min(orig_mag.shape[1], rec_mag.shape[1])
        corr = np.corrcoef(orig_mag[:, :n].ravel(), rec_mag[:, :n].ravel())[0, 1]
        assert corr > 0.8, f"GL reconstruction spectral corr {corr:.3f}"

    def test_host_griffin_lim_deterministic(self):
        y = _test_signal(FAST.sample_rate // 4, FAST.sample_rate)
        spec = host.spectrogram(y, FAST)
        wav1 = host.inv_spectrogram(spec, FAST)
        wav2 = host.inv_spectrogram(spec, FAST)
        np.testing.assert_array_equal(wav1, wav2)

    def test_batched_inversion(self):
        y = _test_signal(FAST.sample_rate // 4, FAST.sample_rate)
        spec = host.spectrogram(y, FAST).T[None]  # [1, T, F]
        batch = np.concatenate([spec, spec], axis=0)
        wavs = np.asarray(chip.batched_linear_to_waveform(batch, FAST))
        assert wavs.shape[0] == 2
        np.testing.assert_allclose(wavs[0], wavs[1], atol=1e-5)


def _spectral_convergence(wav, mag_target, cfg):
    """|| |STFT(y)| - M ||_F / ||M||_F — the standard GL quality measure."""
    est = np.abs(np.asarray(chip.stft(np.asarray(wav), cfg)))
    n = min(est.shape[0], mag_target.shape[0])
    return (np.linalg.norm(est[:n] - mag_target[:n])
            / np.linalg.norm(mag_target[:n]))


def test_fast_griffin_lim_momentum_halves_iterations():
    """FGLA (momentum 0.99) at half the iterations reaches at least the
    spectral convergence of classic Griffin-Lim at full iterations, in every
    engine (the ~2x serving-cost lever documented in AudioConfig)."""
    import dataclasses
    import jax.numpy as jnp

    y = _test_signal(FAST.sample_rate // 2, FAST.sample_rate)
    mag = np.abs(np.asarray(chip.stft(y, FAST)))  # consistent target
    num_samples = (mag.shape[0] - 1) * FAST.hop_length
    magj = jnp.asarray(mag)

    for impl in ("fft", "matmul_bf16"):
        plain = dataclasses.replace(FAST, griffin_lim_impl=impl,
                                    griffin_lim_iters=30)
        fast = dataclasses.replace(plain, griffin_lim_iters=15,
                                   griffin_lim_momentum=0.99)
        c_plain = _spectral_convergence(
            chip.griffin_lim(magj, num_samples, plain), mag, FAST)
        c_fast = _spectral_convergence(
            chip.griffin_lim(magj, num_samples, fast), mag, FAST)
        assert c_fast <= c_plain * 1.02, (impl, c_fast, c_plain)

    # momentum=0 stays bitwise the classic iteration
    plain = dataclasses.replace(FAST, griffin_lim_impl="fft",
                                griffin_lim_iters=6)
    zero = dataclasses.replace(plain, griffin_lim_momentum=0.0)
    np.testing.assert_array_equal(
        np.asarray(chip.griffin_lim(magj, num_samples, plain)),
        np.asarray(chip.griffin_lim(magj, num_samples, zero)))


class TestAudioIO:
    def test_save_load_roundtrip(self, tmp_path):
        y = _test_signal(8000, FAST.sample_rate)
        path = str(tmp_path / "test.wav")
        host.save_audio(y, path, FAST)
        loaded = host.load_audio(path, FAST)
        assert abs(len(loaded) - len(y)) < 4
        corr = np.corrcoef(loaded[: len(y)], y[: len(loaded)])[0, 1]
        assert corr > 0.99


def test_griffin_lim_matmul_matches_fft_engine():
    """The bf16 MXU Griffin-Lim must track the fft engine closely (it is
    the serving default; 'fft' remains for strict parity)."""
    import dataclasses
    import jax.numpy as jnp
    from tacotron_tpu.dsp import chip

    cfg_fft = dataclasses.replace(AudioConfig(), griffin_lim_impl="fft",
                                  griffin_lim_iters=8)
    cfg_mm = dataclasses.replace(cfg_fft, griffin_lim_impl="matmul_bf16")
    rng = np.random.default_rng(0)
    n_frames = 12
    num_samples = (n_frames - 1) * cfg_fft.hop_length
    mag = jnp.asarray(rng.random((n_frames, 1025)).astype(np.float32))
    wa = np.asarray(chip.griffin_lim(mag, num_samples, cfg_fft))
    wb = np.asarray(chip.griffin_lim(mag, num_samples, cfg_mm))
    corr = np.corrcoef(wa, wb)[0, 1]
    assert corr > 0.98, corr
    # scale preserved
    assert 0.95 < wb.std() / wa.std() < 1.05

    with pytest.raises(ValueError, match="griffin_lim_impl"):
        chip.griffin_lim(mag, num_samples, dataclasses.replace(
            cfg_fft, griffin_lim_impl="warp"))


def test_split_dft_factorization_exact():
    """The two-stage (Cooley-Tukey) DFT factorization must match np.fft
    exactly in f32: forward full spectrum and real inverse round-trip."""
    import jax.numpy as jnp
    from tacotron_tpu.dsp import chip

    rng = np.random.default_rng(7)
    n_fft = 2048
    frames = rng.standard_normal((3, n_fft)).astype(np.float32)
    re, im = chip._split_fft(jnp.asarray(frames), n_fft, dtype=jnp.float32)
    ref = np.fft.fft(frames, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3)

    y = chip._split_ifft_real(re, im, n_fft, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), frames, atol=2e-3)


def test_griffin_lim_matmul_split_engine():
    """The split-DFT engine is a drop-in GL engine: same waveform as the
    fft engine in f32 (batched entry point included)."""
    import dataclasses
    import jax.numpy as jnp
    from tacotron_tpu.dsp import chip

    cfg_fft = dataclasses.replace(AudioConfig(), griffin_lim_impl="fft",
                                  griffin_lim_iters=8)
    cfg_split = dataclasses.replace(cfg_fft, griffin_lim_impl="matmul_split")
    rng = np.random.default_rng(1)
    n_frames = 12
    num_samples = (n_frames - 1) * cfg_fft.hop_length
    mag = jnp.asarray(rng.random((2, n_frames, 1025)).astype(np.float32))
    wa = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_fft))
    wb = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_split))
    corr = np.corrcoef(wa.ravel(), wb.ravel())[0, 1]
    assert corr > 0.97, corr
    assert 0.95 < wb.std() / wa.std() < 1.05
    # single-spectrogram dispatch hits the same path
    w1 = np.asarray(chip.griffin_lim(mag[0], num_samples, cfg_split))
    np.testing.assert_allclose(w1, wb[0], atol=1e-4)


def test_half_dft_exact():
    """The DIF half-spectrum rfft/irfft must match np.fft to f32 precision:
    split-bin forward layout, inverse, and round trip."""
    import jax.numpy as jnp
    from tacotron_tpu.dsp import chip

    rng = np.random.default_rng(3)
    n_fft = 2048
    x = rng.standard_normal((5, n_fft)).astype(np.float32)
    er, ei, our, oui = chip._dif_rfft(jnp.asarray(x), n_fft,
                                      dtype=jnp.float32)
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(er), ref.real[:, 0::2], atol=2e-3)
    np.testing.assert_allclose(np.asarray(ei), ref.imag[:, 0::2], atol=2e-3)
    np.testing.assert_allclose(np.asarray(our), ref.real[:, 1::2], atol=2e-3)
    np.testing.assert_allclose(np.asarray(oui), ref.imag[:, 1::2], atol=2e-3)

    f32 = np.float32
    y = chip._dif_irfft(jnp.asarray(ref.real[:, 0::2].astype(f32)),
                        jnp.asarray(ref.imag[:, 0::2].astype(f32)),
                        jnp.asarray(ref.real[:, 1::2].astype(f32)),
                        jnp.asarray(ref.imag[:, 1::2].astype(f32)),
                        n_fft, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)
    y2 = chip._dif_irfft(er, ei, our, oui, n_fft, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y2), x, atol=1e-4)


def test_griffin_lim_matmul_half_engine():
    """The half-spectrum engine is a drop-in GL engine: same waveform as
    the fft engine (batched + single dispatch)."""
    import dataclasses
    import jax.numpy as jnp
    from tacotron_tpu.dsp import chip

    cfg_fft = dataclasses.replace(AudioConfig(), griffin_lim_impl="fft",
                                  griffin_lim_iters=8)
    cfg_half = dataclasses.replace(cfg_fft, griffin_lim_impl="matmul_half")
    rng = np.random.default_rng(5)
    n_frames = 12
    num_samples = (n_frames - 1) * cfg_fft.hop_length
    mag = jnp.asarray(rng.random((2, n_frames, 1025)).astype(np.float32))
    wa = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_fft))
    wb = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_half))
    corr = np.corrcoef(wa.ravel(), wb.ravel())[0, 1]
    assert corr > 0.97, corr
    assert 0.95 < wb.std() / wa.std() < 1.05
    w1 = np.asarray(chip.griffin_lim(mag[0], num_samples, cfg_half))
    np.testing.assert_allclose(w1, wb[0], atol=1e-4)


def test_griffin_lim_engine_dispatch_contract():
    """griffin_lim_batched is THE dispatch (griffin_lim is a batch-of-one
    view): ola_impl is validated for every engine, the vmapped engines
    (matmul_bf16/fft) reject an explicit pallas OLA instead of silently
    ignoring it, and the pallas spectral engine runs on CPU via interpret
    mode."""
    import dataclasses
    import jax.numpy as jnp

    base = dataclasses.replace(FAST, griffin_lim_iters=3)
    rng = np.random.default_rng(9)
    n_frames = 6
    num_samples = (n_frames - 1) * base.hop_length
    mag = jnp.asarray(rng.random((2, n_frames, base.num_freq), np.float32))

    # bogus ola_impl rejected regardless of engine
    for impl in ("fft", "matmul_bf16", "matmul_half", "pallas"):
        cfg = dataclasses.replace(base, griffin_lim_impl=impl,
                                  ola_impl="warp")
        with pytest.raises(ValueError, match="ola_impl"):
            chip.griffin_lim_batched(mag, num_samples, cfg)

    # vmapped engines cannot honor a forced pallas OLA -> loud error
    for impl in ("fft", "matmul_bf16"):
        cfg = dataclasses.replace(base, griffin_lim_impl=impl,
                                  ola_impl="pallas")
        with pytest.raises(ValueError, match="pallas"):
            chip.griffin_lim_batched(mag, num_samples, cfg)

    # every engine: finite audio, and single == batched row exactly
    for impl in ("fft", "matmul_bf16", "matmul_split", "matmul_half",
                 "pallas"):
        cfg = dataclasses.replace(base, griffin_lim_impl=impl)
        wb = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg))
        assert np.isfinite(wb).all(), impl
        w1 = np.asarray(chip.griffin_lim(mag[0], num_samples, cfg))
        np.testing.assert_array_equal(w1, wb[0], err_msg=impl)


class TestGoldenFixture:
    """Host DSP pinned against committed fixtures generated by independent
    implementations (tf.signal STFT, loop-built Slaney filterbank, direct
    difference-equation pre-emphasis) — scripts/make_dsp_fixtures.py.
    Catches any drift in the librosa-semantics contract the reference
    relies on (/root/reference/audio/__init__.py:48-67,99-122) without
    trusting the repo's own formulas as the oracle."""

    @pytest.fixture(scope="class")
    def golden(self):
        import os
        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "dsp_golden.npz")
        return np.load(path)

    def test_params_match(self, golden):
        sr, n_fft, hop, win, n_mels = golden["params"]
        assert (sr, n_fft, hop, win) == (CFG.sample_rate, CFG.n_fft,
                                         CFG.hop_length, CFG.win_length)
        assert n_mels == CFG.num_mels

    def test_preemphasis(self, golden):
        got = host.preemphasis(golden["signal"], CFG)
        np.testing.assert_allclose(got, golden["preemphasized"],
                                   rtol=1e-5, atol=1e-6)

    def test_inv_preemphasis(self, golden):
        got = host.inv_preemphasis(golden["signal"], CFG)
        np.testing.assert_allclose(got, golden["inv_preemphasized"],
                                   rtol=1e-4, atol=1e-4)

    def test_stft(self, golden):
        D = host.stft(golden["preemphasized"], CFG)
        ref = golden["stft_real"] + 1j * golden["stft_imag"]
        assert D.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(D / scale, ref / scale, atol=3e-6)

    def test_mel_basis(self, golden):
        got = mel_basis(CFG.sample_rate, CFG.n_fft, CFG.num_mels)
        np.testing.assert_allclose(got, golden["mel_basis"],
                                   rtol=1e-4, atol=1e-6)

    def test_spectrogram(self, golden):
        got = host.spectrogram(golden["signal"], CFG)
        np.testing.assert_allclose(got, golden["spectrogram"], atol=1e-4)

    def test_melspectrogram(self, golden):
        got = host.melspectrogram(golden["signal"], CFG)
        np.testing.assert_allclose(got, golden["melspectrogram"], atol=1e-4)

    def test_chip_spectrogram_matches_fixture(self, golden):
        import jax.numpy as jnp
        got = np.asarray(chip.spectrogram(jnp.asarray(golden["signal"]),
                                          CFG))
        # chip layout is [frames, bins]
        np.testing.assert_allclose(got.T, golden["spectrogram"], atol=2e-4)


def test_griffin_lim_fused_engine():
    """The fully-fused Pallas iteration kernel (the TPU default via
    griffin_lim_impl='auto') tracks the strict-f32 fft engine on the
    interior of the waveform (its documented edge deviation: the carried
    signal is re-framed at full OLA length, so ~n_fft/2 samples at each
    end converge against OLA-spill instead of reflect-pad context).
    Interpret mode on CPU exercises the same kernel program."""
    import dataclasses
    import jax.numpy as jnp
    from tacotron_tpu.dsp import chip
    from tacotron_tpu.ops.pallas.gl_fused import fused_supported

    cfg_fft = dataclasses.replace(AudioConfig(), griffin_lim_impl="fft",
                                  griffin_lim_iters=1)
    cfg_fused = dataclasses.replace(cfg_fft, griffin_lim_impl="fused")
    assert fused_supported(cfg_fused, 24)

    rng = np.random.default_rng(3)
    n_frames = 24
    num_samples = (n_frames - 1) * cfg_fft.hop_length
    mag = jnp.asarray(rng.random((1, n_frames, 1025)).astype(np.float32))
    wa = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_fft))[0]
    wb = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_fused))[0]
    n_fft = cfg_fft.n_fft
    interior = slice(n_fft, num_samples - n_fft)
    corr = np.corrcoef(wa[interior], wb[interior])[0, 1]
    assert corr > 0.999, corr
    assert 0.95 < wb[interior].std() / wa[interior].std() < 1.05

    # long decodes exceed the kernel's scoped-VMEM budget and must fall
    # back (a 150-step adaptive-ladder decode = 600 frames OOMed the
    # Mosaic compile before this bound existed)
    assert not fused_supported(cfg_fused, 600)

    # unsupported shapes fall back to matmul_half instead of erroring:
    # n_fft = 576 breaks the lane-aligned half-split precondition
    cfg_odd = dataclasses.replace(
        AudioConfig(num_freq=289, sample_rate=16000, frame_length_ms=32,
                    frame_shift_ms=8), griffin_lim_impl="fused",
        griffin_lim_iters=1)
    assert not fused_supported(cfg_odd, 8)
    mag_odd = jnp.asarray(rng.random((1, 8, 289)).astype(np.float32))
    w_odd = np.asarray(chip.griffin_lim_batched(
        mag_odd, 7 * cfg_odd.hop_length, cfg_odd))
    assert w_odd.shape == (1, 7 * cfg_odd.hop_length)
    assert np.isfinite(w_odd).all()


def test_features_from_waveform_matches_host():
    """On-device feature extraction (the 7.4x-less-H2D training path)
    reproduces the builder's host targets; the zero-padded tail yields
    exactly-0.0 normalized frames (the padding value targets use)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    wav = (0.4 * np.sin(2 * np.pi * 220 * np.arange(24000) / 24000)
           + 0.05 * rng.standard_normal(24000)).astype(np.float32)
    cfg = CFG
    hop = cfg.hop_length
    T_true = 1 + len(wav) // hop
    frame_len = T_true + 9  # pad to a larger bucket
    padded = np.zeros(((frame_len - 1) * hop,), np.float32)
    padded[:len(wav)] = wav

    linear, mel = chip.features_from_waveform(jnp.asarray(padded)[None],
                                              cfg)
    assert linear.shape == (1, frame_len, cfg.num_freq)
    assert mel.shape == (1, frame_len, cfg.num_mels)

    want_lin = host.spectrogram(wav, cfg).T   # [T, F]
    want_mel = host.melspectrogram(wav, cfg).T
    # interior frames identical (final ~n_fft/2/hop frames see zero-pad
    # instead of reflect-pad context; they are padding frames anyway)
    edge = cfg.n_fft // (2 * hop) + 1
    sl = slice(0, T_true - edge)
    np.testing.assert_allclose(np.asarray(linear[0])[sl], want_lin[sl],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(mel[0])[sl], want_mel[sl],
                               atol=2e-4)
    # zero-padded tail -> exactly 0.0 normalized frames
    tail = np.asarray(linear[0])[T_true + edge:]
    np.testing.assert_array_equal(tail, np.zeros_like(tail))

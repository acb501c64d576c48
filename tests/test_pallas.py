"""Pallas kernel tests (interpret mode on CPU): fused GRU numerics and
gradients vs the scan implementation, and the BiGRU params adapter."""

import jax
import jax.numpy as jnp
import numpy as np

from tacotron_tpu.ops.pallas.gru import (_gru_reference_scan,
                                         bigru_from_params,
                                         gru_sequence_ntd)
from tacotron_tpu.ops.rnn import BiGRU


def _params(rng, D, H):
    wg = jnp.asarray(rng.standard_normal((D + H, 2 * H)) * 0.1, jnp.float32)
    bg = jnp.ones((2 * H,), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((D + H, H)) * 0.1, jnp.float32)
    bc = jnp.zeros((H,), jnp.float32)
    return wg, bg, wc, bc


def test_gru_sequence_matches_scan():
    rng = np.random.default_rng(0)
    N, T, D, H = 4, 12, 16, 8
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    wg, bg, wc, bc = _params(rng, D, H)
    lengths = jnp.asarray([12, 7, 3, 12])

    out = gru_sequence_ntd(x, h0, wg, bg, wc, bc, lengths, interpret=True)
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    ref = _gru_reference_scan(jnp.transpose(x, (1, 0, 2)), h0,
                              wg, bg, wc, bc, mask)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.transpose(ref, (1, 0, 2))),
                               rtol=1e-5, atol=1e-5)
    # masked rows emit zeros past their length
    assert np.abs(np.asarray(out)[1, 7:]).max() == 0.0


def test_gru_sequence_grad_matches_scan():
    rng = np.random.default_rng(1)
    N, T, D, H = 2, 6, 8, 8
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    h0 = jnp.zeros((N, H), jnp.float32)
    wg, bg, wc, bc = _params(rng, D, H)
    lengths = jnp.asarray([6, 4])
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)

    g1 = jax.grad(lambda w: jnp.sum(gru_sequence_ntd(
        x, h0, w, bg, wc, bc, lengths, interpret=True) ** 2))(wg)
    g2 = jax.grad(lambda w: jnp.sum(_gru_reference_scan(
        jnp.transpose(x, (1, 0, 2)), h0, w, bg, wc, bc, mask) ** 2))(wg)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_bigru_adapter_matches_flax_module():
    rng = np.random.default_rng(2)
    N, T, D, H = 3, 10, 12, 8
    x = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    lengths = jnp.asarray([10, 6, 9])
    module = BiGRU(H)
    variables = module.init(jax.random.PRNGKey(0), x, lengths)
    want = module.apply(variables, x, lengths)
    got = bigru_from_params(variables["params"], x, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_griffin_lim_spectral_step_matches_reference():
    """Fused spectral-step kernel (interpret mode) equals the plain-XLA bf16
    formulation used by the matmul GL engine."""
    from tacotron_tpu.ops.pallas.griffin_lim import (spectral_step,
                                                     spectral_step_reference)
    rng = np.random.default_rng(0)
    n_fft, rows = 512, 70  # rows not a tile multiple: exercises padding
    frames = jnp.asarray(rng.standard_normal((rows, n_fft)), jnp.float32)
    mag = jnp.asarray(np.abs(rng.standard_normal((rows, n_fft // 2 + 1))),
                      jnp.float32)
    got = np.asarray(spectral_step(frames, mag, n_fft, row_tile=32,
                                   interpret=True))
    want = np.asarray(spectral_step_reference(frames, mag, n_fft))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-3)


def test_pallas_overlap_add_matches_xla():
    """Fused OLA kernel (interpret mode) equals the XLA shifted-add
    formulation bit-for-bit in f32, including edge tiles and the
    short-stack fallback."""
    from tacotron_tpu.config import AudioConfig
    from tacotron_tpu.dsp.chip import overlap_add
    from tacotron_tpu.ops.pallas.ola import overlap_add_batched

    cfg = AudioConfig()
    rng = np.random.default_rng(0)
    # (3,25,8) and (2,112,16) run the kernel (112 satisfies the interior
    # guard (S-1)*FT <= T); (1,12,8) exercises the short-stack fallback
    for B, T, bt in [(3, 25, 8), (2, 112, 16), (1, 12, 8)]:
        num_samples = (T - 1) * cfg.hop_length
        fr = jnp.asarray(
            rng.standard_normal((B, T, cfg.n_fft)).astype(np.float32))
        want = jax.vmap(lambda f: overlap_add(f, num_samples, cfg))(fr)
        got = overlap_add_batched(fr, num_samples, cfg, block_tile=bt,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)


def test_griffin_lim_with_pallas_ola_matches_xla_ola():
    """The half-spectrum GL engine produces equivalent audio with the
    fused pallas OLA (ola_impl='pallas' forces it on CPU/interpret)."""
    import dataclasses
    from tacotron_tpu.config import AudioConfig
    from tacotron_tpu.dsp import chip

    cfg_x = dataclasses.replace(AudioConfig(), griffin_lim_impl="matmul_half",
                                ola_impl="xla", griffin_lim_iters=4)
    cfg_p = dataclasses.replace(cfg_x, ola_impl="pallas")
    rng = np.random.default_rng(2)
    n_frames = 80  # >= block_tile + K so the kernel path (not the
    # short-stack fallback) is exercised through the engine
    num_samples = (n_frames - 1) * cfg_x.hop_length
    mag = jnp.asarray(rng.random((1, n_frames, 1025)).astype(np.float32))
    wx = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_x))
    wp = np.asarray(chip.griffin_lim_batched(mag, num_samples, cfg_p))
    corr = np.corrcoef(wx.ravel(), wp.ravel())[0, 1]
    assert corr > 0.999, corr

"""On-chip (JAX/XLA) DSP: STFT, iSTFT, mel, and Griffin-Lim vocoding.

TPU-native replacement for the reference's CPU librosa inversion
(``/root/reference/audio/__init__.py:76-96``): the 60-iteration Griffin-Lim
loop runs entirely on chip as a ``lax.fori_loop`` over XLA FFTs, so synthesis
never round-trips spectrograms through the host.  The phase-update formulation
follows the reference's deterministic in-graph TF variant
(``audio/__init__.py:87-96``): start from the magnitude (zero phase) and renew
phase as ``est / max(|est|, 1e-8)`` — no host RNG, bitwise reproducible.

All shapes are static: framing/overlap-add index matrices and the squared-
window normalizer are baked in as constants at trace time, so jit caches one
program per (signal_length,) bucket.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig
from .primitives import inv_mel_basis, mel_basis, padded_window


@functools.lru_cache(maxsize=32)
def _window_sumsquare(n_frames: int, n_fft: int, hop: int,
                      win_length: int) -> np.ndarray:
    """Overlap-added squared window, for iSTFT normalization."""
    window_sq = padded_window(win_length, n_fft) ** 2
    out_len = n_fft + hop * (n_frames - 1)
    acc = np.zeros(out_len, dtype=np.float64)
    for t in range(n_frames):
        acc[t * hop: t * hop + n_fft] += window_sq
    acc[acc < 1e-10] = 1.0  # avoid div-by-zero where window coverage is zero
    return acc.astype(np.float32)


def num_frames(num_samples: int, config: AudioConfig) -> int:
    return 1 + num_samples // config.hop_length


def frame_signal(y: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """Centered, windowed framing -> [n_frames, n_fft].

    Gather-free: view the signal as hop-sized blocks; frame t is
    blocks[t : t+K] flattened, trimmed to n_fft.  K shifted slices + one
    concat instead of a [n_frames, n_fft] gather (gathers serialize on
    TPU; slices are free).  Matches librosa semantics (reflect center pad,
    periodic Hann padded to n_fft).
    """
    n_fft = config.n_fft
    hop = config.hop_length
    window = jnp.asarray(padded_window(config.win_length, n_fft),
                         dtype=y.dtype)
    padded = jnp.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + y.shape[0] // hop
    K = -(-n_fft // hop) + 1
    n_blocks = n_frames + K
    padded = jnp.pad(padded, (0, n_blocks * hop - padded.shape[0]))
    blocks = padded.reshape(n_blocks, hop)
    frames = jnp.concatenate(
        [blocks[j:j + n_frames] for j in range(K)], axis=-1)[:, :n_fft]
    return frames * window


def stft(y: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """Centered STFT of a 1-D signal -> complex64 [n_frames, n_freq], frames
    on the leading axis (the natural batch/sublane dimension on TPU)."""
    return jnp.fft.rfft(frame_signal(y, config), axis=-1)


def istft(stft_frames: jnp.ndarray, num_samples: int,
          config: AudioConfig) -> jnp.ndarray:
    """Inverse of :func:`stft`: complex [n_frames, n_freq] -> float [num_samples].

    Overlap-add is scatter-free: each length-n_fft frame is split into
    ``ceil(n_fft/hop)`` hop-sized chunks; chunk j of frame t lands at output
    block t+j, so the whole OLA is K shifted, padded adds of dense
    [n_frames, hop] blocks — reshapes and adds only, which XLA fuses.  A
    scatter-add formulation compiles and runs poorly on TPU, especially
    under vmap.
    """
    frames = jnp.fft.irfft(stft_frames, n=config.n_fft, axis=-1)
    return overlap_add(frames, num_samples, config)


def overlap_add(frames: jnp.ndarray, num_samples: int,
                config: AudioConfig) -> jnp.ndarray:
    """Windowed OLA of [n_frames, n_fft] -> [num_samples], scatter-free."""
    n_fft = config.n_fft
    hop = config.hop_length
    n_frames = frames.shape[0]
    window = jnp.asarray(padded_window(config.win_length, n_fft),
                         dtype=jnp.float32)
    frames = frames * window

    K = -(-n_fft // hop)  # chunks per frame
    pad_to = K * hop
    # [n_frames, K, hop]: hop-sized chunks of each frame
    chunks = jnp.pad(frames, ((0, 0), (0, pad_to - n_fft))).reshape(
        n_frames, K, hop)
    n_blocks = n_frames + K  # output as hop-sized blocks (with tail slack)
    acc = jnp.zeros((n_blocks, hop), dtype=frames.dtype)
    for j in range(K):
        # chunk j of every frame t accumulates into block t+j
        acc = acc + jnp.pad(chunks[:, j, :],
                            ((j, n_blocks - n_frames - j), (0, 0)))
    signal = acc.reshape(-1)[:n_fft + hop * (n_frames - 1)]

    norm = jnp.asarray(
        _window_sumsquare(n_frames, n_fft, hop, config.win_length))
    signal = signal / norm
    return jax.lax.dynamic_slice(signal, (n_fft // 2,), (num_samples,))


@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int) -> Tuple[np.ndarray, ...]:
    """Real-DFT/IDFT as dense matrices for the MXU path.

    forward: [n_fft, F] cos/sin so ``frames @ DFT`` is the rfft;
    inverse:  [F, n_fft] with Hermitian weights folded in so
    ``re @ IDFT_RE + im @ IDFT_IM`` is the irfft.
    """
    F = n_fft // 2 + 1
    ang = -2.0 * np.pi * np.arange(n_fft)[:, None] * np.arange(F)[None, :] \
        / n_fft
    dft_re = np.cos(ang).astype(np.float32)
    dft_im = np.sin(ang).astype(np.float32)
    w = np.full(F, 2.0, np.float32)
    w[0] = w[-1] = 1.0
    ang2 = 2.0 * np.pi * np.arange(F)[:, None] * np.arange(n_fft)[None, :] \
        / n_fft
    idft_re = (w[:, None] * np.cos(ang2) / n_fft).astype(np.float32)
    idft_im = (w[:, None] * -np.sin(ang2) / n_fft).astype(np.float32)
    return dft_re, dft_im, idft_re, idft_im


@functools.lru_cache(maxsize=4)
def _split_dft_matrices(n_fft: int, n1: int = 128) -> dict:
    """Two-stage (Cooley-Tukey) DFT factor matrices, n_fft = n1 * n2.

    The dense [n_fft, n_freq] DFT matrices weigh ~19 MB in bf16 at
    n_fft=2048 and must stream from HBM every Griffin-Lim iteration; the
    factorized form needs only a [n1, n1] stage, an [n2, n2] stage, and an
    [n2, n1] twiddle — ~140 KB, VMEM-resident — and ~4.5x fewer FLOPs.
    Index split: time n = n2*i1 + i2 (i1 in [0,n1), i2 in [0,n2)),
    frequency k = k1 + n1*k2 (validated to 1e-14 against np.fft).

    Measured on TPU v5 lite (batch 32 x 201 frames, 60 iters): 0.173 s vs
    0.116 s for the dense ``matmul_bf16`` engine — the inter-stage
    transposes cost more than the saved FLOPs when the dense matmul already
    amortizes its weight streaming over B*n_frames=6432 rows.  Kept as an
    engine because its tiny VMEM-resident factor matrices are the required
    shape for a fully-fused Pallas GL kernel, and because it halves HBM
    weight traffic for small batches.
    """
    assert n_fft % n1 == 0, (n_fft, n1)
    n2 = n_fft // n1
    i1 = np.arange(n1)
    i2 = np.arange(n2)
    ang1 = -2.0 * np.pi * np.outer(i1, i1) / n1
    angt = -2.0 * np.pi * np.outer(i2, i1) / n_fft
    ang2 = -2.0 * np.pi * np.outer(i2, i2) / n2
    f32 = np.float32
    return {
        "n1": n1, "n2": n2,
        # forward (sign -)
        "c1_re": np.cos(ang1).astype(f32), "c1_im": np.sin(ang1).astype(f32),
        "tw_re": np.cos(angt).astype(f32), "tw_im": np.sin(angt).astype(f32),
        "c2_re": np.cos(ang2).astype(f32), "c2_im": np.sin(ang2).astype(f32),
        # inverse (sign +); 1/N folded into the last stage
        "ic1_re": np.cos(-ang1).astype(f32),
        "ic1_im": np.sin(-ang1).astype(f32),
        "itw_re": np.cos(-angt).astype(f32),
        "itw_im": np.sin(-angt).astype(f32),
        "ic2_re": (np.cos(-ang2) / n_fft).astype(f32),
        "ic2_im": (np.sin(-ang2) / n_fft).astype(f32),
    }


def _split_fft(frames: jnp.ndarray, n_fft: int,
               dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real [R, n_fft] -> full complex spectrum (re, im) [R, n_fft] via the
    two-stage matmul DFT (standard bin order)."""
    m = _split_dft_matrices(n_fft)
    n1, n2 = m["n1"], m["n2"]
    R = frames.shape[0]
    c1_re, c1_im, tw_re, tw_im, c2_re, c2_im = (
        jnp.asarray(m[k], dtype) for k in
        ("c1_re", "c1_im", "tw_re", "tw_im", "c2_re", "c2_im"))
    G = frames.reshape(R, n1, n2).transpose(0, 2, 1).reshape(R * n2, n1)
    G = G.astype(dtype)
    ar = (G @ c1_re).astype(jnp.float32).reshape(R, n2, n1)
    ai = (G @ c1_im).astype(jnp.float32).reshape(R, n2, n1)
    twr = jnp.asarray(m["tw_re"])[None]
    twi = jnp.asarray(m["tw_im"])[None]
    br = (ar * twr - ai * twi).transpose(0, 2, 1).reshape(R * n1, n2)
    bi = (ar * twi + ai * twr).transpose(0, 2, 1).reshape(R * n1, n2)
    br, bi = br.astype(dtype), bi.astype(dtype)
    xr = ((br @ c2_re).astype(jnp.float32)
          - (bi @ c2_im).astype(jnp.float32))
    xi = ((br @ c2_im).astype(jnp.float32)
          + (bi @ c2_re).astype(jnp.float32))
    # k = k1 + n1*k2: reorder [R, k1, k2] -> [R, k]
    xr = xr.reshape(R, n1, n2).transpose(0, 2, 1).reshape(R, n_fft)
    xi = xi.reshape(R, n1, n2).transpose(0, 2, 1).reshape(R, n_fft)
    return xr, xi


def _split_ifft_real(xr: jnp.ndarray, xi: jnp.ndarray, n_fft: int,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """Full complex spectrum (re, im) [R, n_fft] -> real signal [R, n_fft]
    (the real part of the inverse DFT; exact when the input is Hermitian)."""
    m = _split_dft_matrices(n_fft)
    n1, n2 = m["n1"], m["n2"]
    R = xr.shape[0]
    ic1_re, ic1_im, ic2_re, ic2_im = (
        jnp.asarray(m[k], dtype) for k in
        ("ic1_re", "ic1_im", "ic2_re", "ic2_im"))
    Gr = xr.reshape(R, n1, n2).transpose(0, 2, 1).reshape(R * n2, n1)
    Gi = xi.reshape(R, n1, n2).transpose(0, 2, 1).reshape(R * n2, n1)
    Gr, Gi = Gr.astype(dtype), Gi.astype(dtype)
    ar = ((Gr @ ic1_re).astype(jnp.float32)
          - (Gi @ ic1_im).astype(jnp.float32)).reshape(R, n2, n1)
    ai = ((Gr @ ic1_im).astype(jnp.float32)
          + (Gi @ ic1_re).astype(jnp.float32)).reshape(R, n2, n1)
    twr = jnp.asarray(m["itw_re"])[None]
    twi = jnp.asarray(m["itw_im"])[None]
    br = (ar * twr - ai * twi).transpose(0, 2, 1).reshape(R * n1, n2)
    bi = (ar * twi + ai * twr).transpose(0, 2, 1).reshape(R * n1, n2)
    br, bi = br.astype(dtype), bi.astype(dtype)
    # real part only: Re(B @ C2) = Br@C2r - Bi@C2i
    y = ((br @ ic2_re).astype(jnp.float32)
         - (bi @ ic2_im).astype(jnp.float32))
    return y.reshape(R, n1, n2).transpose(0, 2, 1).reshape(R, n_fft)


@functools.lru_cache(maxsize=4)
def _half_dft_matrices(n_fft: int) -> Tuple[np.ndarray, ...]:
    """Half-size decimation matrices for the "matmul_half" engine.

    Split the real frame into CONTIGUOUS halves x1, x2 (free slices — no
    relayout; an even/odd de-interleave formulation was measured slower
    than the dense engine because stride-2 relayouts on the lane axis cost
    more than the saved matmul FLOPs).  With u = x1+x2 and v = x1-x2:

        X[2m]   = sum_n u[n] e^{-2pi i (2m) n / N}   = u @ E
        X[2p+1] = sum_n v[n] e^{-2pi i (2p+1) n / N} = v @ O

    (x2's phase factor e^{-pi i k} is +1 on even bins and -1 on odd bins,
    so the split IS the twiddle — no explicit twiddle pass, no complex
    intermediate stream.)  Only bins <= n_fft/2 are materialized: 513
    even + 512 odd columns at n_fft = 2048.  The inverse decomposes
    symmetrically: the even-bin part of the length-N inverse is
    1024-periodic and the odd-bin part antiperiodic, so

        x[:M] = u' + v',  x[M:] = u' - v'

    with u' = Xe @ IU (Hermitian-weighted half-size inverse) and
    v' = Xo @ IV — two half-width matmul pairs and one contiguous concat.
    Total: 4.2M MACs/row at n_fft=2048 vs the dense pair's 16.8M (4x),
    with zero relayouts.  Griffin-Lim never needs natural bin order: the
    target magnitude splits into even/odd bins once outside the loop.

    Returns (e_r, e_i, o_r, o_i, iu_r, iu_i, iv_r, iv_i)."""
    assert n_fft % 4 == 0, n_fft
    M = n_fft // 2
    n = np.arange(M)[:, None]
    m = np.arange(M // 2 + 1)[None, :]
    p = np.arange(M // 2)[None, :]
    ang_e = 2.0 * np.pi * n * (2 * m) / n_fft
    ang_o = 2.0 * np.pi * n * (2 * p + 1) / n_fft
    # inverse: u'[n] = (1/N)[Xe0 + 2 sum Re(Xe e^{+i ang_e}) + ...] with
    # the DC/Nyquist Hermitian weights; v'[n] = (2/N) sum Re(Xo e^{+i ang_o})
    w = np.full(M // 2 + 1, 2.0)
    w[0] = w[-1] = 1.0
    f32 = np.float32
    return (np.cos(ang_e).astype(f32), (-np.sin(ang_e)).astype(f32),
            np.cos(ang_o).astype(f32), (-np.sin(ang_o)).astype(f32),
            (w * np.cos(ang_e) / n_fft).T.astype(f32),
            (w * -np.sin(ang_e) / n_fft).T.astype(f32),
            (2.0 * np.cos(ang_o) / n_fft).T.astype(f32),
            (2.0 * -np.sin(ang_o) / n_fft).T.astype(f32))


def _dif_rfft(frames: jnp.ndarray, n_fft: int,
              dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, ...]:
    """Real [R, n_fft] -> rfft in split-bin layout: (Xe_r, Xe_i, Xo_r,
    Xo_i) with Xe = bins 0,2,..,n_fft/2 and Xo = bins 1,3,..,n_fft/2-1."""
    M = n_fft // 2
    ms = _half_dft_matrices(n_fft)
    e_r, e_i, o_r, o_i = (jnp.asarray(mat, dtype) for mat in ms[:4])
    x1, x2 = frames[:, :M], frames[:, M:]
    u = (x1 + x2).astype(dtype)
    v = (x1 - x2).astype(dtype)
    return ((u @ e_r).astype(jnp.float32),
            (u @ e_i).astype(jnp.float32),
            (v @ o_r).astype(jnp.float32),
            (v @ o_i).astype(jnp.float32))


def _dif_irfft(Xe_r, Xe_i, Xo_r, Xo_i, n_fft: int,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """Split-bin rfft -> real [R, n_fft] frames (natural time order)."""
    iu_r, iu_i, iv_r, iv_i = (jnp.asarray(mat, dtype)
                              for mat in _half_dft_matrices(n_fft)[4:])
    u = (Xe_r.astype(dtype) @ iu_r
         + Xe_i.astype(dtype) @ iu_i).astype(jnp.float32)
    v = (Xo_r.astype(dtype) @ iv_r
         + Xo_i.astype(dtype) @ iv_i).astype(jnp.float32)
    return jnp.concatenate([u + v, u - v], axis=1)


def _ola_fn(config: AudioConfig, num_samples: int):
    """Overlap-add implementation for the batched engines
    ([B, n_frames, n_fft] frames -> [B, num_samples] signals).

    ``ola_impl="auto"`` picks the fused Pallas kernel on TPU only (the
    kernel's ``pltpu.VMEM`` BlockSpecs do not lower on other backends)
    and the XLA formulation elsewhere; explicit "pallas"/"xla" force the
    choice.  Value validation happens in :func:`griffin_lim_batched`.
    """
    use_pallas = (config.ola_impl == "pallas"
                  or (config.ola_impl == "auto"
                      and jax.default_backend() == "tpu"))
    if use_pallas:
        from ..ops.pallas.ola import overlap_add_batched
        return lambda fr: overlap_add_batched(fr, num_samples, config)
    return jax.vmap(lambda fr: overlap_add(fr, num_samples, config))


def _griffin_lim_half_batched(magnitude: jnp.ndarray, num_samples: int,
                              config: AudioConfig) -> jnp.ndarray:
    """Batched Griffin-Lim with the DIF half-spectrum engine (impl =
    "matmul_half"): ~2.3x fewer spectral MACs than the dense matmul
    engine, zero relayouts, the spectrum held in split-bin layout across
    the whole loop; the batch folds into one [B*n_frames, n_fft] row
    matrix per iteration."""
    B, n_frames, _ = magnitude.shape
    n_fft = config.n_fft

    mag = magnitude.reshape(B * n_frames, -1)
    mag_e, mag_o = mag[:, 0::2], mag[:, 1::2]  # once, outside the loop
    ola = _ola_fn(config, num_samples)
    framer = jax.vmap(lambda y: frame_signal(y, config))

    frames0 = _dif_irfft(mag_e, jnp.zeros_like(mag_e),
                         mag_o, jnp.zeros_like(mag_o), n_fft)
    y = ola(frames0.reshape(B, n_frames, n_fft))

    def _project(re, im, target):
        inv_amp = jax.lax.rsqrt(jnp.maximum(re * re + im * im, 1e-16))
        return target * inv_amp * re, target * inv_amp * im

    def gl_update(y):
        frames = framer(y).reshape(B * n_frames, n_fft)
        er, ei, our, oui = _dif_rfft(frames, n_fft)
        er, ei = _project(er, ei, mag_e)
        our, oui = _project(our, oui, mag_o)
        return ola(_dif_irfft(er, ei, our, oui,
                              n_fft).reshape(B, n_frames, n_fft))

    return _gl_loop(gl_update, y, config)


def _griffin_lim_fused_batched(magnitude: jnp.ndarray, num_samples: int,
                               config: AudioConfig) -> jnp.ndarray:
    """Batched Griffin-Lim with the fully-fused Pallas iteration kernel
    (impl = "fused"): the ENTIRE iteration (framing -> u/v DFT -> phase
    projection -> inverse DFT -> windowed OLA -> normalize) runs in one
    VMEM-resident kernel per batch item, so per-iteration HBM traffic is
    just the signal + target magnitudes.  The signal is carried at full
    overlap-add length between iterations (no per-iteration center-slice
    + reflect-pad; see ops/pallas/gl_fused.py for the documented edge
    deviation)."""
    from ..ops.pallas.gl_fused import (center_slice, gl_iteration,
                                       initial_signal_blocks,
                                       prepare_magnitudes)
    B, n_frames, _ = magnitude.shape
    ta = -(-n_frames // 8) * 8  # sublane-aligned frame axis; zero-mag
    magnitude = jnp.pad(magnitude,  # pad rows contribute nothing
                        ((0, 0), (0, ta - n_frames), (0, 0)))
    mag_e_s, mag_o_s = prepare_magnitudes(magnitude, config.n_fft)
    y0 = initial_signal_blocks(mag_e_s, mag_o_s, n_frames, config)

    def gl_update(sig):
        return gl_iteration(sig, mag_e_s, mag_o_s, n_frames, config)

    sig = _gl_loop(gl_update, y0, config)
    return center_slice(sig, num_samples, config)


def _mirror_full_spectrum(mag: jnp.ndarray) -> jnp.ndarray:
    """[R, F=n_fft//2+1] magnitudes -> Hermitian-extended [R, n_fft]."""
    return jnp.concatenate([mag, mag[:, -2:0:-1]], axis=-1)


def _griffin_lim_split_batched(magnitude: jnp.ndarray, num_samples: int,
                               config: AudioConfig) -> jnp.ndarray:
    """Batched Griffin-Lim with the two-stage split DFT (impl =
    "matmul_split"): full-spectrum formulation, the whole batch folded into
    one [B*n_frames, n_fft] row matrix per iteration."""
    B, n_frames, _ = magnitude.shape
    n_fft = config.n_fft

    mag_full = _mirror_full_spectrum(
        magnitude.reshape(B * n_frames, -1))
    ola = _ola_fn(config, num_samples)
    framer = jax.vmap(lambda y: frame_signal(y, config))

    # zero-phase start == irfft(mag): inverse of the (real, Hermitian) mag
    frames0 = _split_ifft_real(mag_full, jnp.zeros_like(mag_full), n_fft)
    y = ola(frames0.reshape(B, n_frames, n_fft))

    def gl_update(y):
        frames = framer(y).reshape(B * n_frames, n_fft)
        re, im = _split_fft(frames, n_fft)
        inv_amp = jax.lax.rsqrt(jnp.maximum(re * re + im * im, 1e-16))
        scale = mag_full * inv_amp
        new = _split_ifft_real(re * scale, im * scale, n_fft)
        return ola(new.reshape(B, n_frames, n_fft))

    return _gl_loop(gl_update, y, config)


def _gl_loop(gl_update, y0: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """Run ``griffin_lim_iters`` projection steps, classic or accelerated.

    With ``config.griffin_lim_momentum == 0`` this is the plain fixed-point
    iteration ``y <- P(y)`` (reference semantics).  Otherwise it is the fast
    Griffin-Lim of Perraudin et al. 2013: ``t_n = P(y_n); y_{n+1} = t_n +
    a (t_n - t_{n-1})`` — an extrapolated fixed-point step that reaches the
    same spectral convergence in roughly half the iterations at a == 0.99.
    """
    alpha = float(config.griffin_lim_momentum)
    if alpha == 0.0:
        return jax.lax.fori_loop(0, config.griffin_lim_iters,
                                 lambda _, y: gl_update(y), y0)

    def body(_, carry):
        y, t_prev = carry
        t = gl_update(y)
        return t + alpha * (t - t_prev), t

    y, _ = jax.lax.fori_loop(0, config.griffin_lim_iters, body, (y0, y0))
    return y


def _griffin_lim_matmul(magnitude: jnp.ndarray, num_samples: int,
                        config: AudioConfig,
                        dtype=jnp.bfloat16) -> jnp.ndarray:
    """Griffin-Lim with the DFT as bf16 MXU matmuls.

    Measured 2x faster than the XLA-FFT loop on TPU v5e (58 vs 114 ms for a
    batch of 16 x 201 frames) at waveform correlation 0.994 — the bf16
    spectral error (~2e-3 relative) is far below Griffin-Lim's own phase
    error, so audio quality is unchanged.
    """
    dft_re, dft_im, idft_re, idft_im = (
        jnp.asarray(m, dtype) for m in _dft_matrices(config.n_fft))

    def istft_mm(re, im):
        frames = (re.astype(dtype) @ idft_re
                  + im.astype(dtype) @ idft_im).astype(jnp.float32)
        return overlap_add(frames, num_samples, config)

    y = istft_mm(magnitude, jnp.zeros_like(magnitude))

    def gl_update(y):
        frames = frame_signal(y, config).astype(dtype)
        re = (frames @ dft_re).astype(jnp.float32)
        im = (frames @ dft_im).astype(jnp.float32)
        amp = jnp.maximum(1e-8, jnp.sqrt(re * re + im * im))
        return istft_mm(magnitude * re / amp, magnitude * im / amp)

    return _gl_loop(gl_update, y, config)


def _griffin_lim_pallas_batched(magnitude: jnp.ndarray, num_samples: int,
                                config: AudioConfig) -> jnp.ndarray:
    """Batched Griffin-Lim with the fused Pallas spectral step.

    magnitude: [B, n_frames, n_freq] -> waveforms [B, num_samples].

    The whole batch's frames fold into one [B*n_frames, n_fft] row matrix
    per iteration, so the kernel's MXU tiles stay full regardless of batch
    size; framing/overlap-add remain XLA (bandwidth-bound reshuffles XLA
    fuses well).  See ``ops/pallas/griffin_lim.py`` for the kernel.
    """
    from ..ops.pallas.griffin_lim import spectral_step

    B, n_frames, _ = magnitude.shape
    n_fft = config.n_fft
    dtype = jnp.bfloat16
    _, _, idft_re, _ = _dft_matrices(n_fft)
    idft_re = jnp.asarray(idft_re, dtype)

    mag_rows = magnitude.reshape(B * n_frames, -1)
    ola = _ola_fn(config, num_samples)
    framer = jax.vmap(lambda y: frame_signal(y, config))

    # zero-phase start: irfft(mag) == mag @ IDFT_RE (im = 0)
    frames0 = (mag_rows.astype(dtype) @ idft_re).astype(jnp.float32)
    y = ola(frames0.reshape(B, n_frames, n_fft))

    def gl_update(y):
        frames = framer(y).reshape(B * n_frames, n_fft)
        new = spectral_step(frames, mag_rows, n_fft)
        return ola(new.reshape(B, n_frames, n_fft))

    return _gl_loop(gl_update, y, config)


def _griffin_lim_fft(magnitude: jnp.ndarray, num_samples: int,
                     config: AudioConfig) -> jnp.ndarray:
    """Strict float32 XLA-FFT Griffin-Lim (single item) — the parity
    reference engine."""
    S = magnitude.astype(jnp.complex64)
    y = istft(S, num_samples, config)

    def gl_update(y):
        est = stft(y, config)
        angles = est / jnp.maximum(1e-8, jnp.abs(est)).astype(jnp.complex64)
        return istft(S * angles, num_samples, config)

    return _gl_loop(gl_update, y, config)


def griffin_lim_batched(magnitude: jnp.ndarray, num_samples: int,
                        config: AudioConfig) -> jnp.ndarray:
    """Batched phase reconstruction [B, n_frames, n_freq] -> [B, samples].

    THE engine dispatch (``griffin_lim`` delegates here).  Engines, by
    ``config.griffin_lim_impl``: "auto" (default: "fused" on TPU,
    "matmul_half" elsewhere), "fused" (single-Pallas-kernel iteration,
    fastest measured on TPU — ops/pallas/gl_fused.py), "matmul_half"
    (u/v half-frame decimation bf16 MXU matmuls), "matmul_bf16" (dense
    single-stage matmuls), "matmul_split" (two-stage Cooley-Tukey),
    "pallas" (fused spectral-step kernel), "fft" (strict float32 XLA FFTs,
    parity reference).  ``config.ola_impl`` selects the overlap-add for
    the natively-batched engines (half/split/pallas; "fused" contains its
    own in-VMEM OLA and ignores the knob); the vmapped single-item
    engines (bf16/fft) cannot fold the batch into the Pallas OLA kernel,
    so an explicit ``ola_impl="pallas"`` there is an error rather than a
    silently ignored knob.
    """
    if config.ola_impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown ola_impl {config.ola_impl!r} "
                         "(expected 'auto', 'pallas' or 'xla')")
    impl = config.griffin_lim_impl
    if impl == "auto":
        # fused Pallas iteration kernel on TPU, matmul_half elsewhere
        # (interpret-mode pallas on CPU is needlessly slow for tests)
        impl = "fused" if jax.default_backend() == "tpu" else "matmul_half"
    if impl == "fused":
        from ..ops.pallas.gl_fused import fused_supported
        if fused_supported(config, magnitude.shape[1]):
            # ola_impl is moot here: the fused kernel contains its own
            # in-VMEM overlap-add (there is no standalone OLA pass)
            return _griffin_lim_fused_batched(magnitude, num_samples,
                                              config)
        impl = "matmul_half"  # odd shapes: fall through like matmul_half
    if impl == "matmul_half" and config.n_fft % 4 != 0:
        # u/v decimation needs n_fft divisible by 4; odd configs (num_freq
        # making n_fft = 2 mod 4) get the dense matmul engine instead of
        # an assertion deep in the jit trace
        impl = "matmul_bf16"
    if impl == "pallas":
        return _griffin_lim_pallas_batched(magnitude, num_samples, config)
    if impl == "matmul_split":
        return _griffin_lim_split_batched(magnitude, num_samples, config)
    if impl == "matmul_half":
        return _griffin_lim_half_batched(magnitude, num_samples, config)
    if impl not in ("matmul_bf16", "fft"):
        raise ValueError(f"unknown griffin_lim_impl {impl!r}")
    if config.ola_impl == "pallas":
        raise ValueError(
            f"ola_impl='pallas' is not supported by the vmapped "
            f"'{impl}' engine (use matmul_half/matmul_split/pallas, "
            f"or ola_impl='auto'/'xla')")
    single = (_griffin_lim_matmul if impl == "matmul_bf16"
              else _griffin_lim_fft)
    return jax.vmap(lambda m: single(m, num_samples, config))(magnitude)


def griffin_lim(magnitude: jnp.ndarray, num_samples: int,
                config: AudioConfig) -> jnp.ndarray:
    """Phase reconstruction: magnitude [n_frames, n_freq] -> waveform.

    Deterministic zero-phase start + ``config.griffin_lim_iters`` refinement
    steps, the whole loop compiled on chip.  A batch-of-one view of
    :func:`griffin_lim_batched` — see there for the engine matrix.
    """
    return griffin_lim_batched(magnitude[None], num_samples, config)[0]


# ------------------------------------------------------------- scaling chain

def preemphasis(x: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    return jnp.concatenate([x[:1], x[1:] - config.preemphasis * x[:-1]])


@functools.lru_cache(maxsize=8)
def _inv_preemphasis_kernel(coef: float, length: int = 1500) -> np.ndarray:
    """Truncated impulse response of the 1/(1 - coef z^-1) IIR.

    coef^1500 ~ 1e-20 for coef=0.97, far below float32 resolution, so the FIR
    convolution is exact to machine precision while staying parallel on the
    VPU (a sequential IIR scan over ~200k samples would serialize the chip).
    """
    return (coef ** np.arange(length)).astype(np.float32)


def inv_preemphasis(x: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """FFT-domain FIR application.

    ``jnp.convolve`` would lower to a 1-channel conv with a 1500-tap spatial
    kernel — a degenerate case the TPU conv emitter compiles pathologically
    slowly (>15 min observed).  Frequency-domain multiply compiles in
    seconds and runs on the same FFT units Griffin-Lim already uses.
    """
    if config.preemphasis == 0.0:
        return x
    kernel = _inv_preemphasis_kernel(config.preemphasis)
    n = x.shape[0] + kernel.shape[0] - 1
    fft_len = 1 << (n - 1).bit_length()
    kernel_f = jnp.asarray(np.fft.rfft(kernel, fft_len).astype(np.complex64))
    y = jnp.fft.irfft(jnp.fft.rfft(x, fft_len) * kernel_f, fft_len)
    return y[: x.shape[0]].astype(x.dtype)


def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_db(S: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    return jnp.clip((S - config.min_level_db) / -config.min_level_db, 0, 1)


def denormalize_db(S: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    return jnp.clip(S, 0, 1) * -config.min_level_db + config.min_level_db


# ----------------------------------------------------------------- features

def spectrogram(y: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """Waveform -> normalized linear spectrogram [n_frames, n_freq]."""
    D = stft(preemphasis(y, config), config)
    S = amp_to_db(jnp.abs(D)) - config.ref_level_db
    return normalize_db(S, config)


def melspectrogram(y: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """Waveform -> normalized mel spectrogram [n_frames, n_mels]."""
    D = stft(preemphasis(y, config), config)
    basis = jnp.asarray(
        mel_basis(config.sample_rate, config.n_fft, config.num_mels))
    S = amp_to_db(jnp.abs(D) @ basis.T)
    return normalize_db(S, config)


def features_from_waveform(wavs: jnp.ndarray,
                           config: AudioConfig) -> Tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Batched on-device feature extraction: waveforms [N, S] float32 ->
    (linear [N, T, n_freq], mel [N, T, n_mels]) normalized targets, with
    T = 1 + S // hop.

    The TPU-first training data path: the feeder ships int16 waveforms
    (~600 B/frame) instead of precomputed f32 spectrograms
    (~4.4 KB/frame, what the reference's ``.npz`` pipeline feeds) — 7.4x
    less host->device traffic per step, which dominates real per-step
    cost on constrained links — and this function recreates the builder's
    targets on chip (one shared STFT for both features; the mel matmul
    rides the MXU).  Numerics match ``dsp.host.spectrogram`` /
    ``melspectrogram`` to float tolerance; utterance-final frames whose
    analysis window crosses the zero-padded tail see zeros instead of
    the host path's reflect padding (targets there are padding frames
    the reference deliberately trains on — see train/losses.py).
    """
    def one(w):
        D = stft(preemphasis(w, config), config)  # [T, bins]
        mag = jnp.abs(D)
        linear = normalize_db(amp_to_db(mag) - config.ref_level_db, config)
        basis = jnp.asarray(
            mel_basis(config.sample_rate, config.n_fft, config.num_mels))
        mel = normalize_db(amp_to_db(mag @ basis.T), config)
        return linear, mel

    return jax.vmap(one)(wavs)


# ----------------------------------------------------------------- inversion

def linear_to_waveform(spec: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """Normalized linear spectrogram [n_frames, n_freq] -> waveform.

    The full reference inversion chain (``audio/__init__.py:54-56``) on chip:
    denormalize, dB->amp, ``** power`` sharpening, Griffin-Lim, inverse
    preemphasis.
    """
    n_frames = spec.shape[0]
    num_samples = (n_frames - 1) * config.hop_length
    S = db_to_amp(denormalize_db(spec, config) + config.ref_level_db)
    y = griffin_lim(S ** config.power, num_samples, config)
    return inv_preemphasis(y, config)


def mel_to_waveform(mel: jnp.ndarray, config: AudioConfig) -> jnp.ndarray:
    """Normalized mel spectrogram [n_frames, n_mels] -> waveform."""
    n_frames = mel.shape[0]
    num_samples = (n_frames - 1) * config.hop_length
    amp = db_to_amp(denormalize_db(mel, config))
    inv_basis = jnp.asarray(
        inv_mel_basis(config.sample_rate, config.n_fft, config.num_mels))
    S = jnp.maximum(1e-10, amp @ inv_basis.T)
    y = griffin_lim(S ** config.power, num_samples, config)
    return inv_preemphasis(y, config)


def batched_linear_to_waveform(specs: jnp.ndarray,
                               config: AudioConfig) -> jnp.ndarray:
    """Batched :func:`linear_to_waveform` over [B, n_frames, n_freq].

    Batching is the throughput lever on TPU: the whole batch's spectral
    updates run as one batched program per Griffin-Lim iteration (one fused
    Pallas row matrix for impl="pallas", one batched FFT/matmul otherwise).
    """
    n_frames = specs.shape[1]
    num_samples = (n_frames - 1) * config.hop_length
    S = db_to_amp(denormalize_db(specs, config) + config.ref_level_db)
    wavs = griffin_lim_batched(S ** config.power, num_samples, config)
    return jax.vmap(lambda y: inv_preemphasis(y, config))(wavs)

"""Fully-fused Griffin-Lim iteration as ONE Pallas TPU kernel.

The measured binding constraint of the batched Griffin-Lim loop is HBM
bandwidth, not matmul FLOPs (docs/PERF.md: 0.77 ms/iteration at batch 32
against a ~790 MB/iteration byte model — at the ~819 GB/s HBM roofline;
successive MAC cuts bought only ~10% each).  Every prior engine
materializes the [B*T, n_fft] frame stack and the spectra in HBM between
passes.  This kernel performs the ENTIRE iteration for one batch item in
VMEM::

    signal -> frames (shifted hop-block slices)
           -> windowed u/v half-frame decimation        (VPU)
           -> even/odd-bin forward DFT                   (MXU)
           -> phase projection onto the target magnitude (VPU)
           -> inverse DFT (A @ B^T against the SAME matrices, Hermitian
              weights folded into the projection scale)  (MXU)
           -> windowed overlap-add + 1/window^2 norm     (VPU)
    -> signal

so per-iteration HBM traffic drops to the signal in/out plus the target
magnitudes (~1.7 MB/item vs ~25 MB/item) and the loop becomes
MXU/VPU-bound.  The iteration loop itself stays outside (``lax.fori_loop``
over this pallas_call) — traffic is already negligible and the loop
carries plain arrays, which keeps momentum acceleration (`_gl_loop`) and
autodiff-free jit caching identical to the other engines.

Deliberate edge deviation (documented, tested): the signal is carried
between iterations at FULL overlap-add length (n_fft + hop*(T-1) samples,
as [NBa, hop] blocks) and re-framed directly, instead of center-slicing
to num_samples and reflect-padding every iteration like librosa/the other
engines (``dsp/chip.py::frame_signal``).  Only the ~n_fft//2 samples at
each end see different (OLA-spill instead of mirrored) context — the
fixed point is the same everywhere else, and measured waveform
correlation vs the strict-f32 ``fft`` engine matches the other bf16
engines (tests/test_dsp.py::test_griffin_lim_fused_engine).

Reference hot path this accelerates: the 60-iteration CPU Griffin-Lim of
``/root/reference/audio/__init__.py:76-96``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
PADK = 8  # OLA row-shift headroom (>= K0-1, sublane-aligned)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Scoped-VMEM budget for the fused iteration kernel.  The per-item stack
# frame grows linearly with the frame count (frames/spectra/OLA buffers
# all scale with T) on top of the 4 constant DFT matrices; the Mosaic
# scoped-vmem limit is 16 MB.  Measured point: T=600 frames at the
# reference geometry needs 19.26 MB (compile-time OOM) while T=201 fits
# — the ~26 KB/frame coefficient below brackets both with margin.
_VMEM_LIMIT_BYTES = 14 * 1024 * 1024
_VMEM_PER_FRAME_BYTES = 26_000


def _vmem_estimate(n_fft: int, n_frames: int) -> int:
    M = n_fft // 2
    ne, no = M // 2 + 1, M // 2
    matrices = 2 * 2 * M * (_round_up(ne, LANE) + _round_up(no, LANE))
    return matrices + n_frames * _VMEM_PER_FRAME_BYTES


def fused_supported(config, n_frames: int) -> bool:
    """Shape preconditions for the fused kernel (the dispatch falls back
    to ``matmul_half`` otherwise): u/v decimation needs n_fft % 4 == 0,
    the lane-aligned half split needs n_fft//2 % LANE == 0, the OLA shift
    headroom assumes hop-chunks-per-frame K0 <= PADK, and the per-item
    stack frame must fit the 16 MB scoped-VMEM budget — long decodes
    (>~350 frames at the reference geometry, e.g. the 150/200-step rungs
    of the length-adaptive serving ladder) route to ``matmul_half``."""
    n_fft, hop = config.n_fft, config.hop_length
    k0 = -(-n_fft // hop)
    return (n_fft % 4 == 0 and (n_fft // 2) % LANE == 0
            and k0 - 1 <= PADK and n_frames >= 1 and hop >= 1
            and _vmem_estimate(n_fft, n_frames) <= _VMEM_LIMIT_BYTES)


@functools.lru_cache(maxsize=4)
def _fwd_matrices(n_fft: int):
    """Forward even/odd-bin DFT matrices of the u/v half-frame decimation
    (``dsp/chip.py::_half_dft_matrices`` semantics), frequency axes padded
    to lane multiples, plus the inverse Hermitian weights ``we``/``wo``
    (the inverse matrices are these SAME matrices transposed with the
    weights folded in — the kernel contracts A @ B^T, halving matrix VMEM).
    """
    M = n_fft // 2
    ne, no = M // 2 + 1, M // 2
    nep, nop = _round_up(ne, LANE), _round_up(no, LANE)
    n = np.arange(M)[:, None]
    m = np.arange(ne)[None, :]
    p = np.arange(no)[None, :]
    ang_e = 2.0 * np.pi * n * (2 * m) / n_fft
    ang_o = 2.0 * np.pi * n * (2 * p + 1) / n_fft
    f32 = np.float32

    def padc(a, w):
        return np.pad(a.astype(f32), ((0, 0), (0, w - a.shape[1])))

    e_r, e_i = padc(np.cos(ang_e), nep), padc(-np.sin(ang_e), nep)
    o_r, o_i = padc(np.cos(ang_o), nop), padc(-np.sin(ang_o), nop)
    we = np.full(ne, 2.0, f32)
    we[0] = we[-1] = 1.0
    we = np.pad(we / n_fft, (0, nep - ne))
    wo = np.full(nop, 2.0 / n_fft, f32)
    wo[no:] = 0.0
    return e_r, e_i, o_r, o_i, we, wo, ne, no, nep, nop


@functools.lru_cache(maxsize=8)
def _inv_norm_full(n_frames: int, n_fft: int, hop: int, win_length: int,
                   nba: int) -> np.ndarray:
    """1 / overlap-added-squared-window over the FULL signal, as
    [nba, hop] blocks (1.0 in the zero-coverage tail slack)."""
    from ...dsp.primitives import padded_window
    window_sq = padded_window(win_length, n_fft) ** 2
    out_len = n_fft + hop * (n_frames - 1)
    acc = np.zeros(nba * hop, dtype=np.float64)
    for t in range(n_frames):
        acc[t * hop: t * hop + n_fft] += window_sq
    acc[acc < 1e-10] = 1.0
    inv = np.ones(nba * hop, dtype=np.float64)
    inv[:out_len] = 1.0 / acc[:out_len]
    return inv.reshape(nba, hop).astype(np.float32)


def _gl_iter_kernel(frames_ref, mag_e_ref, mag_o_ref, er_ref, ei_ref,
                    or_ref, oi_ref, win_ref, inv_norm_ref,
                    out_ref, *,
                    T: int, K0: int, hop: int, n_fft: int, NBa: int):
    """One Griffin-Lim iteration for one batch item (framing excluded:
    the hop-block shifted-slice framing is a fused XLA copy feeding this
    kernel — doing it in-kernel needs misaligned lane concats Mosaic
    cannot lower, or chunked sub-matmuls that forfeit the u/v MAC fold
    and were measured 2x slower).

    frames_ref: [1, T, n_fft] bf16 frames, analysis window ALREADY
    applied (the multiply fuses into the XLA framing copy for free;
    in-kernel it costs a full-width f32 VPU pass); mag_*_ref:
    [1, T, NEp/NOp] target magnitudes PRE-SCALED by the inverse Hermitian
    weights (we/wo, see ``_fwd_matrices``); matrices bf16; out_ref
    [1, NBa, hop] new signal blocks.
    """
    win = win_ref[:]
    f = frames_ref[0]                                    # [T, n_fft] bf16

    # u/v half-frame decimation: lane-aligned halves (n_fft//2 % 128 == 0);
    # bf16 adds — the rounding is the same order as the bf16 dot inputs
    M = n_fft // 2
    u = f[:, :M] + f[:, M:]
    v = f[:, :M] - f[:, M:]

    # forward DFT (even bins from u, odd bins from v) on the MXU
    e_r, e_i = er_ref[:], ei_ref[:]
    o_r, o_i = or_ref[:], oi_ref[:]
    er = jnp.dot(u, e_r, preferred_element_type=jnp.float32)
    ei = jnp.dot(u, e_i, preferred_element_type=jnp.float32)
    our = jnp.dot(v, o_r, preferred_element_type=jnp.float32)
    oui = jnp.dot(v, o_i, preferred_element_type=jnp.float32)

    # phase projection onto the (weight-folded) target magnitude.  Pad
    # bins have zero magnitude, so their (undefined-phase) contribution
    # vanishes.
    def project(re, im, mag):
        inv_amp = jax.lax.rsqrt(jnp.maximum(re * re + im * im, 1e-16))
        s = mag * inv_amp
        return ((re * s).astype(jnp.bfloat16),
                (im * s).astype(jnp.bfloat16))

    er_s, ei_s = project(er, ei, mag_e_ref[0])
    our_s, oui_s = project(our, oui, mag_o_ref[0])

    # inverse DFT: contract against the SAME matrices transposed
    # (iu_r = we * e_r^T etc., weights already folded into the scale).
    # Mosaic lowers the rhs-transposed contraction natively on the MXU;
    # explicit pre-transposed matrices measured no faster and double the
    # matrix VMEM.
    tdim = (((1,), (1,)), ((), ()))
    u2 = (jax.lax.dot_general(er_s, e_r, tdim,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(ei_s, e_i, tdim,
                                preferred_element_type=jnp.float32))
    v2 = (jax.lax.dot_general(our_s, o_r, tdim,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(oui_s, o_i, tdim,
                                preferred_element_type=jnp.float32))

    # new frames: periodic/antiperiodic halves (lane-aligned 1024-wide
    # concat) + synthesis window
    fo = jnp.concatenate([u2 + v2, u2 - v2], axis=1) * win

    # overlap-add: acc[b] += hop-chunk j of frame (b - j).  Zero-extend
    # the frame stack (offset-0 concats — the form Mosaic lowers) so
    # every shifted window is a static in-range slice.
    fo = jnp.concatenate(
        [fo, jnp.zeros((T, K0 * hop - n_fft), jnp.float32)], axis=1)
    ext = jnp.concatenate(
        [jnp.zeros((PADK, K0 * hop), jnp.float32), fo,
         jnp.zeros((NBa - T, K0 * hop), jnp.float32)], axis=0)
    acc = jnp.zeros((NBa, hop), jnp.float32)
    for j in range(K0):
        acc = acc + ext[PADK - j:PADK - j + NBa, j * hop:(j + 1) * hop]

    out_ref[0] = acc * inv_norm_ref[:]


def gl_iteration(sig_blocks: jnp.ndarray, mag_e_s: jnp.ndarray,
                 mag_o_s: jnp.ndarray, n_frames: int, config,
                 interpret: bool = None) -> jnp.ndarray:
    """One fused Griffin-Lim iteration over the batch.

    sig_blocks: [B, NBa, hop] full-length signal blocks;
    mag_e_s/mag_o_s: [B, T, NEp/NOp] weight-folded split-bin target
    magnitudes (from :func:`prepare_magnitudes`).  Returns new signal
    blocks of the same shape.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, NBa, hop = sig_blocks.shape
    n_fft = config.n_fft
    T = mag_e_s.shape[1]
    K0 = -(-n_fft // hop)
    e_r, e_i, o_r, o_i, we, wo, ne, no, nep, nop = _fwd_matrices(n_fft)
    from ...dsp.primitives import padded_window
    win_np = padded_window(config.win_length, n_fft).astype(np.float32)
    window = jnp.asarray(win_np)[None, :]
    inv_norm = jnp.asarray(_inv_norm_full(
        n_frames, n_fft, hop, config.win_length, NBa))

    # framing stays in XLA (one fused shifted-slice copy with the window
    # multiply and bf16 cast folded in): frame t = blocks[t : t+K0]
    # flattened, first n_fft lanes, times the analysis window
    frames = (jnp.concatenate(
        [sig_blocks[:, j:j + T, :] for j in range(K0)],
        axis=-1)[:, :, :n_fft] * window).astype(jnp.bfloat16)

    kernel = functools.partial(_gl_iter_kernel, T=T, K0=K0, hop=hop,
                               n_fft=n_fft, NBa=NBa)
    M = n_fft // 2
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, n_fft), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, nep), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, nop), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, nep), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, nep), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, nop), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, nop), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBa, hop), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NBa, hop), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NBa, hop), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # fwd 4 dots + inv 4 dots, each 2*T*M*cols flops, per item
            flops=B * 8 * 2 * T * M * (nep + nop) // 2,
            bytes_accessed=(B * (T * n_fft * 2 + NBa * hop * 4
                                 + T * (nep + nop) * 4)
                            + 2 * M * (nep + nop) * 2),
            transcendentals=B * T * (nep + nop),
        ),
        interpret=interpret,
    )(frames,
      mag_e_s, mag_o_s,
      jnp.asarray(e_r, jnp.bfloat16), jnp.asarray(e_i, jnp.bfloat16),
      jnp.asarray(o_r, jnp.bfloat16), jnp.asarray(o_i, jnp.bfloat16),
      window, inv_norm)


def prepare_magnitudes(magnitude: jnp.ndarray, n_fft: int):
    """[B, T, n_freq] target magnitudes -> weight-folded split-bin
    (mag_e_s [B, T, NEp], mag_o_s [B, T, NOp]) for :func:`gl_iteration`.
    Runs once per synthesis call, outside the iteration loop."""
    e_r, e_i, o_r, o_i, we, wo, ne, no, nep, nop = _fwd_matrices(n_fft)
    B, T, _ = magnitude.shape
    mag_e = magnitude[:, :, 0::2]                        # [B, T, ne]
    mag_o = magnitude[:, :, 1::2]                        # [B, T, no]
    mag_e_s = jnp.pad(mag_e, ((0, 0), (0, 0), (0, nep - ne))) \
        * jnp.asarray(we)[None, None, :]
    mag_o_s = jnp.pad(mag_o, ((0, 0), (0, 0), (0, nop - no))) \
        * jnp.asarray(wo)[None, None, :]
    return mag_e_s, mag_o_s


def signal_blocks_layout(n_frames: int, config):
    """(NBa, num_full_samples) for the carried full-length signal.

    The frame axis is padded to a sublane multiple (Ta = round_up(T, 8))
    by the dispatch — padded frames carry zero target magnitude, so the
    projection zeroes their output and they never touch the signal; NBa
    covers the padded framing reads."""
    n_fft, hop = config.n_fft, config.hop_length
    K0 = -(-n_fft // hop)
    out_len = n_fft + hop * (n_frames - 1)
    ta = _round_up(n_frames, 8)
    nba = _round_up(max(-(-out_len // hop), ta + K0 - 1), 8)
    return nba, out_len


def initial_signal_blocks(mag_e_s: jnp.ndarray, mag_o_s: jnp.ndarray,
                          n_frames: int, config) -> jnp.ndarray:
    """Zero-phase start: inverse-DFT the target magnitudes and
    overlap-add to FULL-length signal blocks [B, NBa, hop] (XLA; runs
    once per synthesis call).  Matches the kernel's inverse path: the
    Hermitian weights are already folded into the scaled magnitudes."""
    e_r, e_i, o_r, o_i, we, wo, ne, no, nep, nop = _fwd_matrices(n_fft := config.n_fft)
    B, T, _ = mag_e_s.shape
    hop = config.hop_length
    K0 = -(-n_fft // hop)
    NBa, out_len = signal_blocks_layout(n_frames, config)

    from ...dsp.primitives import padded_window
    window = jnp.asarray(padded_window(config.win_length, n_fft),
                         jnp.float32)

    # inverse DFT of (mag, phase 0): u2 = mag_e_s @ e_r^T, v2 = mag_o_s @ o_r^T
    er_b = jnp.asarray(e_r, jnp.bfloat16)
    or_b = jnp.asarray(o_r, jnp.bfloat16)
    rows_e = mag_e_s.reshape(B * T, nep).astype(jnp.bfloat16)
    rows_o = mag_o_s.reshape(B * T, nop).astype(jnp.bfloat16)
    u2 = jax.lax.dot_general(rows_e, er_b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    v2 = jax.lax.dot_general(rows_o, or_b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    frames = (jnp.concatenate([u2 + v2, u2 - v2], axis=1)
              .reshape(B, T, n_fft) * window)

    # scatter-free full-length OLA (dsp/chip.py::overlap_add, unsliced)
    pad_to = K0 * hop
    chunks = jnp.pad(frames, ((0, 0), (0, 0), (0, pad_to - n_fft)))
    chunks = chunks.reshape(B, T, K0, hop)
    acc = jnp.zeros((B, NBa, hop), jnp.float32)
    for j in range(K0):
        acc = acc + jnp.pad(chunks[:, :, j, :],
                            ((0, 0), (j, NBa - T - j), (0, 0)))
    inv_norm = jnp.asarray(_inv_norm_full(
        n_frames, n_fft, hop, config.win_length, NBa))
    return acc * inv_norm[None]


def center_slice(sig_blocks: jnp.ndarray, num_samples: int,
                 config) -> jnp.ndarray:
    """[B, NBa, hop] full signal blocks -> [B, num_samples] centered."""
    B = sig_blocks.shape[0]
    flat = sig_blocks.reshape(B, -1)
    return jax.lax.dynamic_slice(
        flat, (0, config.n_fft // 2), (B, num_samples))

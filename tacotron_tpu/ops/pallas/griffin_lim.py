"""Pallas fused Griffin-Lim spectral step.

One Griffin-Lim iteration is ``y -> frames -> rFFT -> phase-normalize *
magnitude -> irFFT -> overlap-add -> y`` (reference CPU hot path
``/root/reference/audio/__init__.py:76-96``).  On TPU the DFTs run as dense
bf16 matmuls on the MXU (``dsp/chip.py::_griffin_lim_matmul``), but XLA
materializes the ``re``/``im`` spectra ([rows, 1025] f32 each) in HBM
between the forward and inverse matmuls.  This kernel fuses the whole
spectral step::

    frames2 = (mag * re/|z|) @ IDFT_RE + (mag * im/|z|) @ IDFT_IM
      where  re = frames @ DFT_RE,  im = frames @ DFT_IM

into one pallas_call: a (row-tile, freq-tile) grid where each program
computes a [TR, TF] spectral tile entirely in VMEM/registers and
accumulates its inverse-DFT contribution into the [TR, n_fft] output block
— the spectra never touch HBM.  Matrix tiles stream HBM->VMEM per grid
step; with TR=256 the DFT-matrix traffic is ~17 MB per row-tile per
iteration, far under the MXU time at these shapes, so the kernel is
compute-bound (the roofline the matmul formulation cannot reach).

Frequency padding: F = n_fft//2+1 = 1025 pads up to a lane multiple (1152);
padded magnitude bins are zero so they contribute nothing to the inverse.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=4)
def _padded_dft_matrices(n_fft: int) -> Tuple[np.ndarray, ...]:
    """Real-DFT/IDFT dense matrices, frequency axis padded to a lane
    multiple (pad columns/rows are zero)."""
    from ...dsp.chip import _dft_matrices
    dft_re, dft_im, idft_re, idft_im = _dft_matrices(n_fft)
    F = dft_re.shape[1]
    Fp = _round_up(F, LANE)
    pad_cols = ((0, 0), (0, Fp - F))
    pad_rows = ((0, Fp - F), (0, 0))
    return (np.pad(dft_re, pad_cols), np.pad(dft_im, pad_cols),
            np.pad(idft_re, pad_rows), np.pad(idft_im, pad_rows))


def _kernel(frames_ref, mag_ref, dre_ref, dim_ref, ire_ref, iim_ref,
            out_ref):
    """One (row-tile, freq-tile) step: spectral tile in registers, inverse
    contribution accumulated into the output row block."""
    f = pl.program_id(1)

    frames = frames_ref[:]                          # [TR, n_fft] bf16
    # forward DFT tile on the MXU: [TR, TF]
    re = jnp.dot(frames, dre_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, dim_ref[:], preferred_element_type=jnp.float32)
    # phase-normalize and re-magnitude (VPU, all in registers)
    inv_amp = jax.lax.rsqrt(jnp.maximum(re * re + im * im, 1e-16))
    mag = mag_ref[:]
    sre = (mag * re * inv_amp).astype(jnp.bfloat16)
    sim = (mag * im * inv_amp).astype(jnp.bfloat16)
    # inverse DFT tile contribution: [TR, n_fft]
    contrib = jnp.dot(sre, ire_ref[:], preferred_element_type=jnp.float32)
    contrib += jnp.dot(sim, iim_ref[:], preferred_element_type=jnp.float32)

    @pl.when(f == 0)
    def _init():
        out_ref[:] = contrib

    @pl.when(f != 0)
    def _accum():
        out_ref[:] = out_ref[:] + contrib


def spectral_step(frames: jnp.ndarray, magnitude: jnp.ndarray,
                  n_fft: int, row_tile: int = 256,
                  interpret: bool = None) -> jnp.ndarray:
    """Fused Griffin-Lim spectral update.

    frames: [rows, n_fft] (any float dtype; cast to bf16 for the MXU).
    magnitude: [rows, F] target magnitudes, F = n_fft//2 + 1.
    Returns new (unwindowed) frames [rows, n_fft] float32, equal to
    ``mag*re/|z| @ IDFT_RE + mag*im/|z| @ IDFT_IM``.

    ``interpret=None`` (default) auto-selects interpret mode on the CPU
    backend so the ``griffin_lim_impl="pallas"`` engine stays runnable
    (slowly) in CPU tests — same policy as ``ops.pallas.ola``.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows, width = frames.shape
    assert width == n_fft, (frames.shape, n_fft)
    F = n_fft // 2 + 1
    Fp = _round_up(F, LANE)
    rows_p = _round_up(rows, row_tile)

    dre, dim, ire, iim = (jnp.asarray(m, jnp.bfloat16)
                          for m in _padded_dft_matrices(n_fft))
    frames = jnp.pad(frames.astype(jnp.bfloat16),
                     ((0, rows_p - rows), (0, 0)))
    mag = jnp.pad(magnitude.astype(jnp.float32),
                  ((0, rows_p - rows), (0, Fp - F)))

    grid = (rows_p // row_tile, Fp // LANE)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, n_fft), lambda r, f: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, LANE), lambda r, f: (r, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, LANE), lambda r, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, LANE), lambda r, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, n_fft), lambda r, f: (f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, n_fft), lambda r, f: (f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n_fft), lambda r, f: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, n_fft), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * rows_p * n_fft * Fp,
            bytes_accessed=(rows_p * n_fft * (2 + 4)
                            + grid[0] * 4 * n_fft * Fp * 2
                            + rows_p * Fp * 4),
            transcendentals=rows_p * Fp,
        ),
        interpret=interpret,
    )(frames, mag, dre, dim, ire, iim)
    return out[:rows]


def spectral_step_reference(frames: jnp.ndarray, magnitude: jnp.ndarray,
                            n_fft: int) -> jnp.ndarray:
    """Plain-XLA bf16 equivalent (the matmul engine's inner step), for
    parity testing of the kernel."""
    from ...dsp.chip import _dft_matrices
    dre, dim, ire, iim = (jnp.asarray(m, jnp.bfloat16)
                          for m in _dft_matrices(n_fft))
    fb = frames.astype(jnp.bfloat16)
    re = jnp.dot(fb, dre, preferred_element_type=jnp.float32)
    im = jnp.dot(fb, dim, preferred_element_type=jnp.float32)
    inv_amp = jax.lax.rsqrt(jnp.maximum(re * re + im * im, 1e-16))
    mag = magnitude.astype(jnp.float32)
    sre = (mag * re * inv_amp).astype(jnp.bfloat16)
    sim = (mag * im * inv_amp).astype(jnp.bfloat16)
    return (jnp.dot(sre, ire, preferred_element_type=jnp.float32)
            + jnp.dot(sim, iim, preferred_element_type=jnp.float32))

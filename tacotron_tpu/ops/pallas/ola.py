"""Fused overlap-add as a Pallas TPU kernel.

The XLA formulation of windowed overlap-add (``dsp/chip.py::overlap_add``)
materializes every intermediate in HBM: the windowed frames (26 MB at
B=16, T=201), the hop-padded chunk tensor, K shifted zero-padded copies,
and the normalized signal — ~130 MB of traffic per Griffin-Lim iteration
for a 26 MB input, and micro-benchmarks show OLA dominating the GL loop
once the DFT runs as MXU matmuls.  This kernel keeps the whole chain in
VMEM and reads the frame stack UNPADDED (a per-iteration ``jnp.pad`` of
the stack measured ~0.5 ms by itself):

    sig_block[b] = inv_norm[b] * sum_{j=0..K-1} window-chunk_j(frames[b - j])

Grid: ``(batch, signal-block tiles)``.  Interior tiles read a
dynamic-offset, static-size row window; the first and last tiles run
statically-specialized bodies (``@pl.when`` on the tile index) whose
out-of-range frame rows are replaced by zero padding — exactly the
contribution a zero frame would make, so edges match ``overlap_add``
bit-for-bit in exact arithmetic.  Output is the signal as hop-sized
blocks; the thin XLA wrapper reshapes and takes the centered
``num_samples`` slice.

Reference hot path this accelerates: the 60-iteration Griffin-Lim of
``/root/reference/audio/__init__.py:76-96``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ola_kernel(f_ref, w_ref, inv_norm_ref, out_ref, *, K: int, FT: int,
                hop: int, n_fft: int, T: int, S: int):
    """One (batch item, block tile) -> signal blocks [b0, b0+FT) as
    [FT, hop].  Block b accumulates lane-chunk j of frame row b - j."""
    s = pl.program_id(1)
    b0 = s * FT

    def windowed(rows):
        # zero-extend the windowed rows to K*hop lanes so every hop-chunk
        # slice is full width (padding an individual sublane-offset chunk
        # is a tpu.concatenate Mosaic cannot lower)
        fw = rows * w_ref[:]
        return jnp.concatenate(
            [fw, jnp.zeros((rows.shape[0], K * hop - n_fft), jnp.float32)],
            axis=1)

    def finish(acc):
        out_ref[0] = acc * inv_norm_ref[pl.ds(b0, FT), :]

    # NB: every branch loads a full-lane row window from the ref first and
    # slices the loaded VALUE with static offsets — Mosaic cannot lower a
    # vector load combining a dynamic row index with a lane offset.

    # dynamic row starts must be sublane-aligned (8 rows for f32), so the
    # interior window starts PAD=round_up(K-1, 8) rows above the tile
    PAD = -(-(K - 1) // 8) * 8

    def accumulate(fw):
        # fw row l <-> frame (window base)+l; acc[i] += chunk j of frame
        # b0+i-j  ->  l = i + PAD - j.  Out-of-range frames are zero rows.
        acc = jnp.zeros((FT, hop), jnp.float32)
        for j in range(K):
            acc = acc + fw[PAD - j:PAD - j + FT, j * hop:(j + 1) * hop]
        finish(acc)

    @pl.when((s > 0) & (s < S - 1))
    def _interior():
        # rows [b0-PAD, b0+FT): in range by the wrapper's guards
        start = pl.multiple_of(b0 - PAD, 8)
        accumulate(windowed(f_ref[0, pl.ds(start, FT + PAD), :]))

    @pl.when(s == 0)
    def _top():
        # b0 == 0 statically: frames below 0 are PAD zero rows (a
        # sublane pad of an offset piece is a concat Mosaic cannot lower;
        # zero-extending the offset-0 window is fine)
        accumulate(jnp.concatenate(
            [jnp.zeros((PAD, K * hop), jnp.float32),
             windowed(f_ref[0, 0:FT, :])], axis=0))

    @pl.when(s == S - 1)
    def _bottom():
        # b0 == (S-1)*FT statically: frames at T and beyond are zero rows
        b0c = (S - 1) * FT
        W = T - (b0c - PAD)
        accumulate(jnp.concatenate(
            [windowed(f_ref[0, b0c - PAD:T, :]),
             jnp.zeros((FT + PAD - W, K * hop), jnp.float32)], axis=0))


@functools.lru_cache(maxsize=8)
def _inv_norm_blocks(n_frames: int, n_fft: int, hop: int, win_length: int,
                     nbp: int) -> np.ndarray:
    """1 / window-sumsquare, laid out as [nbp, hop] signal blocks."""
    from ...dsp.primitives import padded_window
    window_sq = padded_window(win_length, n_fft) ** 2
    out_len = n_fft + hop * (n_frames - 1)
    acc = np.zeros(nbp * hop, dtype=np.float64)
    for t in range(n_frames):
        acc[t * hop: t * hop + n_fft] += window_sq
    acc[acc < 1e-10] = 1.0
    inv = np.ones(nbp * hop, dtype=np.float64)
    inv[:out_len] = 1.0 / acc[:out_len]
    return inv.reshape(nbp, hop).astype(np.float32)


def overlap_add_batched(frames: jnp.ndarray, num_samples: int,
                        config, block_tile: int = 64,
                        interpret: bool = None) -> jnp.ndarray:
    """Windowed, normalized, centered overlap-add of [B, T, n_fft] frames
    -> [B, num_samples].  Drop-in batched equivalent of
    ``jax.vmap(lambda f: dsp.chip.overlap_add(f, num_samples, config))``.

    Falls back to the XLA formulation for stacks too short for the tiled
    kernel (the edge-specialized tiles assume ``T >= FT + K``).
    """
    from ...dsp.chip import overlap_add
    from ...dsp.primitives import padded_window

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, n_fft = frames.shape
    hop = config.hop_length
    K = _cdiv(n_fft, hop)
    NB = T + K                        # hop-blocks incl. tail slack
    FT = block_tile
    grid_s = _cdiv(NB, FT)
    # the tiled edge specialization needs full interior row windows:
    # T >= FT + K for the first tile and (S-1)*FT <= T so no interior
    # tile's window runs past the stack; FT must be sublane-aligned and
    # >= PAD so b0-PAD never goes negative (a negative pl.ds start is
    # silently clamped, duplicating rows into the window)
    PAD = -(-(K - 1) // 8) * 8
    if (FT % 8 or FT < PAD or grid_s < 2 or T < FT + K
            or (grid_s - 1) * FT > T):
        return jax.vmap(
            lambda f: overlap_add(f, num_samples, config))(frames)
    NBp = grid_s * FT

    window = jnp.asarray(padded_window(config.win_length, n_fft),
                         jnp.float32)[None, :]
    inv_norm = jnp.asarray(_inv_norm_blocks(T, n_fft, hop,
                                            config.win_length, NBp))

    kernel = functools.partial(_ola_kernel, K=K, FT=FT, hop=hop,
                               n_fft=n_fft, T=T, S=grid_s)
    sig_blocks = pl.pallas_call(
        kernel,
        grid=(B, grid_s),
        in_specs=[
            # per-batch frame stack resident in VMEM; overlapping row
            # windows sliced inside the kernel (not expressible as
            # disjoint BlockSpec tiles)
            pl.BlockSpec((1, T, n_fft), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBp, hop), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FT, hop), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NBp, hop), jnp.float32),
        interpret=interpret,
    )(frames.astype(jnp.float32), window, inv_norm)

    sig = sig_blocks.reshape(B, NBp * hop)
    return jax.lax.dynamic_slice(
        sig, (0, n_fft // 2), (B, num_samples))

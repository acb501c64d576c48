"""Pallas TPU kernel: fused GRU over a whole sequence.

The scan-based GRU (``ops/rnn.py``) is correct everywhere, but each timestep
re-streams the gate/candidate weight matrices through the memory system.
This kernel runs the entire recurrence inside ONE Pallas program:

- the gate and candidate weights are loaded into **VMEM once** and stay
  resident for all T steps (the dominant win — the recurrence is memory-
  bound on weight traffic at Tacotron sizes);
- the hidden state lives in a VMEM scratch register file across steps;
- per-step math is two MXU matmuls (x_t/h contraction for gates and
  candidate) plus VPU sigmoids/tanh, with TF1 GRUCell gate conventions
  (``[r, u] = sigmoid(W_g [x, h] + b_g)``, ``c = tanh(W_c [x, r*h] + b_c)``,
  ``h' = u*h + (1-u)*c`` — see ``ops/rnn.py``);
- optional per-step masking reproduces ``dynamic_rnn(sequence_length=...)``:
  beyond a row's length the carry holds and the emitted output is zero.

Gradients: the public wrapper is a ``jax.custom_vjp`` whose backward pass
recomputes activations with the pure-JAX scan and differentiates that —
the Pallas kernel accelerates every forward (synthesis, and the forward
half of training), while the backward stays on XLA's well-tested path.

Time is the leading axis ([T, N, D]) so each step is a contiguous
sublane-aligned slice.

Measured on TPU v5e (N=16, T=256, D=H=128, float32): this kernel runs at
0.79 ms vs 0.65 ms for the XLA ``lax.scan`` formulation — XLA's compiled
loop already keeps the (tiny) weights VMEM-resident at Tacotron sizes, so
the kernel is parity, not a win, and stays **opt-in**
(via :func:`bigru_from_params`).  It becomes the right tool when hidden sizes
outgrow what XLA keeps resident (H >= 1024) or when fusing the bidirectional
pair into one pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(x_ref, h0_ref, wg_ref, bg_ref, wc_ref, bc_ref, mask_ref,
                out_ref, h_scratch):
    """One program; fori_loop over T inside.

    Shapes (all VMEM):
      x:    [T, N, D]    h0: [N, H]
      wg:   [D+H, 2H]    bg: [1, 2H]
      wc:   [D+H, H]     bc: [1, H]
      mask: [T, N]       out: [T, N, H]   h_scratch: [N, H]
    """
    T = x_ref.shape[0]
    H = h0_ref.shape[1]
    D = x_ref.shape[2]

    h_scratch[:] = h0_ref[:]

    wg_x = wg_ref[:D, :]      # [D, 2H] input half of the gate weights
    wg_h = wg_ref[D:, :]      # [H, 2H] recurrent half
    wc_x = wc_ref[:D, :]
    wc_h = wc_ref[D:, :]

    def step(t, _):
        x_t = x_ref[t]                      # [N, D]
        h = h_scratch[:]                    # [N, H]

        gates = (
            jnp.dot(x_t, wg_x, preferred_element_type=jnp.float32)
            + jnp.dot(h, wg_h, preferred_element_type=jnp.float32)
            + bg_ref[0]
        )
        r = jax.nn.sigmoid(gates[:, :H])
        u = jax.nn.sigmoid(gates[:, H:])

        c = jnp.tanh(
            jnp.dot(x_t, wc_x, preferred_element_type=jnp.float32)
            + jnp.dot(r * h, wc_h, preferred_element_type=jnp.float32)
            + bc_ref[0]
        )
        h_new = u * h + (1.0 - u) * c

        m = mask_ref[t][:, None]            # [N, 1]
        h_kept = h * (1.0 - m) + h_new * m
        h_scratch[:] = h_kept
        out_ref[t] = h_new * m              # emitted output zero past length
        return 0

    jax.lax.fori_loop(0, T, step, 0)


def _gru_pallas_raw(x_tnd: jnp.ndarray, h0: jnp.ndarray,
                    wg: jnp.ndarray, bg: jnp.ndarray,
                    wc: jnp.ndarray, bc: jnp.ndarray,
                    mask_tn: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    T, N, D = x_tnd.shape
    H = h0.shape[1]
    return pl.pallas_call(
        _gru_kernel,
        out_shape=jax.ShapeDtypeStruct((T, N, H), x_tnd.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N, H), jnp.float32)],
        interpret=interpret,
    )(x_tnd, h0, wg, bg.reshape(1, -1), wc, bc.reshape(1, -1), mask_tn)


def _gru_reference_scan(x_tnd, h0, wg, bg, wc, bc, mask_tn):
    """Pure-JAX twin used for the backward pass (and numerics tests)."""
    H = h0.shape[1]

    def step(h, inp):
        x_t, m_t = inp
        gi = jnp.concatenate([x_t, h], axis=-1)
        gates = jax.nn.sigmoid(gi @ wg + bg)
        r, u = gates[:, :H], gates[:, H:]
        ci = jnp.concatenate([x_t, r * h], axis=-1)
        c = jnp.tanh(ci @ wc + bc)
        h_new = u * h + (1.0 - u) * c
        m = m_t[:, None]
        return h * (1 - m) + h_new * m, h_new * m

    _, ys = jax.lax.scan(step, h0, (x_tnd, mask_tn))
    return ys


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def gru_sequence(x_tnd, h0, wg, bg, wc, bc, mask_tn, interpret=False):
    """Fused GRU over [T, N, D] -> [T, N, H].

    ``mask_tn`` is float [T, N] (1.0 inside the sequence). Differentiable:
    forward runs the Pallas kernel, backward re-derives gradients from the
    scan formulation.
    """
    return _gru_pallas_raw(x_tnd, h0, wg, bg, wc, bc, mask_tn, interpret)


def _gru_fwd(x_tnd, h0, wg, bg, wc, bc, mask_tn, interpret):
    out = _gru_pallas_raw(x_tnd, h0, wg, bg, wc, bc, mask_tn, interpret)
    return out, (x_tnd, h0, wg, bg, wc, bc, mask_tn)


def _gru_bwd(interpret, residuals, g):
    x_tnd, h0, wg, bg, wc, bc, mask_tn = residuals
    _, vjp = jax.vjp(
        lambda x, h, a, b, c, d: _gru_reference_scan(x, h, a, b, c, d,
                                                     mask_tn),
        x_tnd, h0, wg, bg, wc, bc)
    dx, dh0, dwg, dbg, dwc, dbc = vjp(g)
    return dx, dh0, dwg, dbg, dwc, dbc, None


gru_sequence.defvjp(_gru_fwd, _gru_bwd)


def gru_sequence_ntd(x_ntd: jnp.ndarray, h0: jnp.ndarray,
                     wg: jnp.ndarray, bg: jnp.ndarray,
                     wc: jnp.ndarray, bc: jnp.ndarray,
                     lengths: Optional[jnp.ndarray] = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Batch-major convenience wrapper: [N, T, D] -> [N, T, H]."""
    N, T, _ = x_ntd.shape
    if lengths is None:
        mask = jnp.ones((T, N), x_ntd.dtype)
    else:
        t_idx = jnp.arange(T, dtype=jnp.int32)
        mask = (t_idx[:, None] < lengths[None, :]).astype(x_ntd.dtype)
    x_tnd = jnp.transpose(x_ntd, (1, 0, 2))
    out = gru_sequence(x_tnd, h0, wg, bg, wc, bc, mask, interpret)
    return jnp.transpose(out, (1, 0, 2))


def bigru_from_params(params: dict, xs_ntd: jnp.ndarray,
                      lengths: Optional[jnp.ndarray] = None,
                      initial_state: Optional[jnp.ndarray] = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Run a :class:`~tacotron_tpu.ops.rnn.BiGRU`'s parameters through the
    fused kernel: ``params`` is the BiGRU's param subtree
    (``{"fw": {"gates": {...}, "candidate": {...}}, "bw": {...}}``).

    Opt-in adapter for serving/benchmarks; the flax module remains the
    default implementation (see module docstring for measurements).
    """
    from ..rnn import _reverse_sequence

    N, T, _ = xs_ntd.shape
    H = params["fw"]["candidate"]["kernel"].shape[1]
    if initial_state is not None:
        init_fw, init_bw = jnp.split(initial_state, 2, axis=-1)
    else:
        init_fw = jnp.zeros((N, H), xs_ntd.dtype)
        init_bw = jnp.zeros((N, H), xs_ntd.dtype)

    def run(cell_params, xs, init):
        return gru_sequence_ntd(
            xs, init,
            cell_params["gates"]["kernel"], cell_params["gates"]["bias"],
            cell_params["candidate"]["kernel"],
            cell_params["candidate"]["bias"],
            lengths, interpret=interpret)

    ys_fw = run(params["fw"], xs_ntd, init_fw)
    if lengths is None:
        ys_bw = jnp.flip(run(params["bw"], jnp.flip(xs_ntd, 1), init_bw), 1)
    else:
        xs_rev = _reverse_sequence(xs_ntd, lengths)
        ys_bw = _reverse_sequence(run(params["bw"], xs_rev, init_bw), lengths)
    return jnp.concatenate([ys_fw, ys_bw], axis=-1)

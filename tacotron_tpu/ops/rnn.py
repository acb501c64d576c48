"""GRU cells and length-aware bidirectional scans.

The reference leans on ``tf.contrib.rnn.GRUCell`` and
``tf.nn.bidirectional_dynamic_rnn`` (``/root/reference/models/modules.py:88-96``).
Here the recurrence is an explicit ``lax.scan`` over time with masking, which
XLA compiles to a single fused on-chip loop — no TensorArrays, no host control
flow.

Gate conventions match TF1 GRUCell so that parameters map 1:1 for checkpoint
interchange: gates ``[r, u] = sigmoid(W_g [x, h] + 1.0)`` (bias init 1),
candidate ``c = tanh(W_c [x, r*h] + b)``, ``h' = u*h + (1-u)*c``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRUCell(nn.Module):
    """TF1-convention GRU cell. carry/new_carry: [N, features]."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: jnp.ndarray,
                 inputs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dtype = carry.dtype
        gate_in = jnp.concatenate([inputs, carry], axis=-1)
        gates = nn.Dense(
            2 * self.features, name="gates",
            bias_init=nn.initializers.ones,
            param_dtype=self.param_dtype, dtype=dtype)(gate_in)
        r, u = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
        cand_in = jnp.concatenate([inputs, r * carry], axis=-1)
        c = jnp.tanh(nn.Dense(
            self.features, name="candidate",
            param_dtype=self.param_dtype, dtype=dtype)(cand_in))
        new_carry = u * carry + (1.0 - u) * c
        return new_carry, new_carry


def _masked_scan(cell: nn.Module, init: jnp.ndarray, xs: jnp.ndarray,
                 lengths: Optional[jnp.ndarray],
                 unroll: int = 1) -> jnp.ndarray:
    """Scan ``cell`` over time (axis 1 of xs) with sequence-length masking.

    Matches ``dynamic_rnn(sequence_length=...)`` semantics: beyond a
    sequence's length the carry is held and the emitted output is zero.
    Returns outputs [N, T, H].  ``unroll`` copies of the step body are
    emitted per XLA loop iteration — Tacotron-size GRU steps are small
    matmuls, so >1 amortizes per-iteration loop overhead on TPU.
    """
    scan = nn.scan(
        lambda c, carry, x_t: c(carry, x_t),
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1, out_axes=1, unroll=unroll)

    if lengths is None:
        _, ys = scan(cell, init, xs)
        return ys

    time_index = jnp.arange(xs.shape[1], dtype=jnp.int32)
    mask = (time_index[None, :] < lengths[:, None])  # [N, T]

    def step(c, carry, inp):
        x_t, m_t = inp
        new_carry, y = c(carry, x_t)
        m = m_t[:, None].astype(carry.dtype)
        return carry * (1 - m) + new_carry * m, y * m

    scan_masked = nn.scan(
        step,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1, out_axes=1, unroll=unroll)
    _, ys = scan_masked(cell, init, (xs, mask))
    return ys


def _reverse_sequence(xs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Per-example time reversal of the first ``lengths[i]`` steps
    (tf.reverse_sequence): padding stays in place at the tail."""
    T = xs.shape[1]
    time_index = jnp.arange(T, dtype=jnp.int32)

    def rev_one(x, length):
        idx = jnp.where(time_index < length, length - 1 - time_index,
                        time_index)
        return x[idx]

    return jax.vmap(rev_one)(xs, lengths)


class BiGRU(nn.Module):
    """Bidirectional GRU with optional per-example initial states.

    Replaces ``tf.nn.bidirectional_dynamic_rnn`` over GRUCells (reference
    ``models/modules.py:82-96``); Deep Voice 2 speaker conditioning feeds
    ``initial_state`` as the concatenated [fw, bw] state
    (``models/modules.py:82-86``).
    """

    features: int
    param_dtype: jnp.dtype = jnp.float32
    unroll: int = 1

    @nn.compact
    def __call__(self, xs: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 initial_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        N = xs.shape[0]
        if initial_state is not None:
            init_fw, init_bw = jnp.split(initial_state, 2, axis=-1)
        else:
            init_fw = jnp.zeros((N, self.features), dtype=xs.dtype)
            init_bw = jnp.zeros((N, self.features), dtype=xs.dtype)

        fw_cell = GRUCell(self.features, self.param_dtype, name="fw")
        bw_cell = GRUCell(self.features, self.param_dtype, name="bw")

        ys_fw = _masked_scan(fw_cell, init_fw, xs, lengths,
                             unroll=self.unroll)

        if lengths is None:
            xs_rev = jnp.flip(xs, axis=1)
            ys_bw = jnp.flip(_masked_scan(bw_cell, init_bw, xs_rev, None,
                                          unroll=self.unroll),
                             axis=1)
        else:
            xs_rev = _reverse_sequence(xs, lengths)
            ys_bw = _reverse_sequence(
                _masked_scan(bw_cell, init_bw, xs_rev, lengths,
                             unroll=self.unroll), lengths)

        return jnp.concatenate([ys_fw, ys_bw], axis=-1)

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

    TPU design: both directions step inside ONE ``lax.scan`` — the
    per-example-reversed sequence rides along as a second input and its
    cell runs in the same loop body.  These scans are loop-overhead-bound,
    not FLOP-bound (docs/PERF.md), so doubling the body is near-free while
    the sequential iteration count halves (2T -> T per BiGRU).  Masking
    matches ``dynamic_rnn(sequence_length=...)``: beyond a sequence's
    length the carry is held and the emitted output is zero; the same
    [N, T] mask serves both directions because ``_reverse_sequence``
    keeps padding at the tail.  The parameter tree ("fw"/"bw" GRUCells)
    is identical to two separate scans, so TF1 checkpoint interchange
    (compat/names.py) and the Pallas adapter (ops/pallas/gru.py) are
    unaffected.  ``unroll`` emits that many fused step bodies per XLA
    loop iteration.
    """

    features: int
    param_dtype: jnp.dtype = jnp.float32
    unroll: int = 1

    def setup(self):
        self.fw = GRUCell(self.features, self.param_dtype)
        self.bw = GRUCell(self.features, self.param_dtype)

    def _step(self, carry, inp):
        h_fw, h_bw = carry
        x_fw, x_bw = inp
        new_fw, y_fw = self.fw(h_fw, x_fw)
        new_bw, y_bw = self.bw(h_bw, x_bw)
        return (new_fw, new_bw), (y_fw, y_bw)

    def _step_masked(self, carry, inp):
        h_fw, h_bw = carry
        x_fw, x_bw, m_t = inp
        new_fw, y_fw = self.fw(h_fw, x_fw)
        new_bw, y_bw = self.bw(h_bw, x_bw)
        m = m_t[:, None].astype(h_fw.dtype)
        return ((h_fw * (1 - m) + new_fw * m,
                 h_bw * (1 - m) + new_bw * m),
                (y_fw * m, y_bw * m))

    def __call__(self, xs: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 initial_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        N = xs.shape[0]
        if initial_state is not None:
            init_fw, init_bw = jnp.split(initial_state, 2, axis=-1)
        else:
            init_fw = jnp.zeros((N, self.features), dtype=xs.dtype)
            init_bw = jnp.zeros((N, self.features), dtype=xs.dtype)
        init = (init_fw, init_bw)

        if lengths is None:
            scan = nn.scan(
                lambda mdl, c, x: mdl._step(c, x),
                variable_broadcast="params", split_rngs={"params": False},
                in_axes=1, out_axes=1, unroll=self.unroll)
            _, (ys_fw, ys_bw) = scan(self, init, (xs, jnp.flip(xs, axis=1)))
            return jnp.concatenate([ys_fw, jnp.flip(ys_bw, axis=1)], axis=-1)

        xs_rev = _reverse_sequence(xs, lengths)
        time_index = jnp.arange(xs.shape[1], dtype=jnp.int32)
        mask = (time_index[None, :] < lengths[:, None])  # [N, T]
        scan = nn.scan(
            lambda mdl, c, x: mdl._step_masked(c, x),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1, unroll=self.unroll)
        _, (ys_fw, ys_bw) = scan(self, init, (xs, xs_rev, mask))
        return jnp.concatenate(
            [ys_fw, _reverse_sequence(ys_bw, lengths)], axis=-1)

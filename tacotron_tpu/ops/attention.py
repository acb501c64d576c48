"""Attention mechanisms for the decoder.

Re-derivations of the TF1 ``tf.contrib.seq2seq`` mechanisms the reference
selects between (``/root/reference/models/tacotron.py:132-152``):

- ``bah_mon``  Bahdanau *monotonic* attention (the default).  Energy is the
  additive Bahdanau score plus a learned scalar bias; the choice probability
  is a sigmoid; alignments follow the Raffel et al. (2017) monotonic
  recurrence, computed in closed "parallel" form with exclusive cumulative
  products — exactly TF's ``monotonic_attention(..., mode='parallel')`` with
  ``sigmoid_noise=0``.
- ``bah`` / ``bah_norm``  softmax Bahdanau attention, optionally with the
  weight-normalized score of Ba et al.
- ``luong`` / ``luong_scaled``  multiplicative attention.

Design note: the mechanisms here are the *per-step* scoring modules used
inside ``lax.scan``; the one-time key projection of the encoder memory
(TF's ``memory_layer``) lives in the model (``models/tacotron.py``) so the
[N, T_in, D] matmul is hoisted out of the decode loop and runs once.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _safe_exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically-safe exclusive cumprod along the last axis, via logs
    (TF's ``safe_cumprod``)."""
    logs = jnp.log(jnp.clip(x, 1e-10, 1.0))
    cums = jnp.cumsum(logs, axis=-1)
    exclusive = jnp.pad(cums, [(0, 0)] * (x.ndim - 1) + [(1, 0)])[..., :-1]
    return jnp.exp(exclusive)


def monotonic_alignments(p_choose: jnp.ndarray,
                         previous: jnp.ndarray) -> jnp.ndarray:
    """Parallel-mode monotonic attention recurrence.

    alpha_i = p_i * prod_{j<i}(1-p_j) * sum_{k<=i} prev_k / prod_{j<k}(1-p_j)
    """
    cumprod_1mp = _safe_exclusive_cumprod(1.0 - p_choose)
    return p_choose * cumprod_1mp * jnp.cumsum(
        previous / jnp.clip(cumprod_1mp, 1e-10, 1.0), axis=-1)


class BahdanauMonotonicAttention(nn.Module):
    """TF-parity BahdanauMonotonicAttention (sigmoid_noise=0, parallel mode)."""

    num_units: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 previous_alignments: jnp.ndarray) -> jnp.ndarray:
        """One decode step: query [N, H] x keys [N, T, U] -> alignments [N, T]."""
        processed = nn.Dense(
            self.num_units, use_bias=False, name="query_layer",
            param_dtype=self.param_dtype, dtype=query.dtype)(query)
        v = self.param("attention_v", nn.initializers.lecun_normal(),
                       (self.num_units, 1), self.param_dtype)
        # score: [N, T]; the tanh-sum reduces over units on the MXU
        score = jnp.squeeze(
            jnp.tanh(keys + processed[:, None, :]) @ v.astype(query.dtype), -1)
        score_bias = self.param("score_bias", nn.initializers.zeros, (),
                                self.param_dtype)
        p_choose = jax.nn.sigmoid(score + score_bias.astype(query.dtype))
        return monotonic_alignments(p_choose, previous_alignments)


class BahdanauAttention(nn.Module):
    """Additive softmax attention; ``normalize=True`` adds weight-normalized
    scoring (reference option ``bah_norm``)."""

    num_units: int
    normalize: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 previous_alignments: jnp.ndarray) -> jnp.ndarray:
        del previous_alignments  # softmax attention is memoryless
        processed = nn.Dense(
            self.num_units, use_bias=False, name="query_layer",
            param_dtype=self.param_dtype, dtype=query.dtype)(query)
        v = self.param("attention_v", nn.initializers.lecun_normal(),
                       (self.num_units, 1), self.param_dtype)
        if self.normalize:
            import math
            g = self.param("attention_g", nn.initializers.constant(
                math.sqrt(1.0 / self.num_units)), (), self.param_dtype)
            b = self.param("attention_b", nn.initializers.zeros,
                           (self.num_units,), self.param_dtype)
            vn = (g.astype(query.dtype) * v[:, 0]
                  / jnp.linalg.norm(v[:, 0]).astype(query.dtype))
            score = jnp.einsum(
                "ntu,u->nt",
                jnp.tanh(keys + processed[:, None, :] + b.astype(query.dtype)),
                vn)
        else:
            score = jnp.squeeze(
                jnp.tanh(keys + processed[:, None, :]) @ v.astype(query.dtype),
                -1)
        return jax.nn.softmax(score, axis=-1)


class LuongAttention(nn.Module):
    """Multiplicative attention: score = query . W memory."""

    num_units: int
    scale: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, keys: jnp.ndarray,
                 previous_alignments: jnp.ndarray) -> jnp.ndarray:
        del previous_alignments
        score = jnp.einsum("nu,ntu->nt", query, keys)
        if self.scale:
            g = self.param("attention_g", nn.initializers.ones, (),
                           self.param_dtype)
            score = g.astype(query.dtype) * score
        return jax.nn.softmax(score, axis=-1)


def initial_alignments(attention_type: str, batch: int, length: int,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Initial alignment state: a Dirac at encoder position 0 for monotonic
    attention (TF ``BahdanauMonotonicAttention.initial_alignments``), zeros
    for the memoryless softmax mechanisms."""
    if attention_type == "bah_mon":
        return jax.nn.one_hot(jnp.zeros((batch,), jnp.int32), length,
                              dtype=dtype)
    return jnp.zeros((batch, length), dtype=dtype)


def make_attention(attention_type: str, num_units: int,
                   param_dtype=jnp.float32, name=None) -> nn.Module:
    """Mechanism factory keyed by the reference's ``attention_type`` strings
    (``models/tacotron.py:132-152``)."""
    if attention_type == "bah_mon":
        return BahdanauMonotonicAttention(num_units, param_dtype, name=name)
    if attention_type == "bah":
        return BahdanauAttention(num_units, False, param_dtype, name=name)
    if attention_type == "bah_norm":
        return BahdanauAttention(num_units, True, param_dtype, name=name)
    if attention_type == "luong":
        return LuongAttention(num_units, False, param_dtype, name=name)
    if attention_type == "luong_scaled":
        return LuongAttention(num_units, True, param_dtype, name=name)
    raise ValueError(f"Unknown attention type: {attention_type}")

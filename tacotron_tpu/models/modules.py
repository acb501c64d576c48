"""Tacotron building blocks: prenet, highway, conv bank, CBHG.

Re-designed TPU-first from the reference's TF layers
(``/root/reference/models/modules.py``):

- The K-way conv1d bank (16 separate convs in the reference,
  ``modules.py:35-44``) is **fused into a single wide convolution**: each
  width-k kernel is zero-embedded into a width-K kernel at the offset that
  reproduces its own SAME-padding alignment, and the K outputs become one
  [K*C] channel block.  One conv keeps the MXU busy instead of 16 skinny ones,
  and the following BatchNorm/ReLU fuse into it.  (BatchNorm is per-channel,
  so one BN over the concatenated channels is mathematically identical to the
  reference's per-branch BNs.)
- BatchNorm matches ``tf.layers.batch_normalization`` defaults (momentum 0.99,
  eps 1e-3) and, like the reference, is applied *after* the activation
  (``modules.py:123-131``).
- The bidirectional GRU is a masked ``lax.scan`` (see ``ops/rnn.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rnn import BiGRU


class Prenet(nn.Module):
    """Dense-ReLU-Dropout stack (reference ``modules.py:18-25``).

    Dropout is active only in training mode, matching the reference's
    ``is_training`` gating.
    """

    layer_sizes: Sequence[int]
    dropout_rate: float
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i, size in enumerate(self.layer_sizes):
            x = nn.relu(nn.Dense(size, name=f"dense_{i + 1}",
                                 param_dtype=self.param_dtype,
                                 dtype=x.dtype)(x))
            x = nn.Dropout(self.dropout_rate, deterministic=not train,
                           name=f"dropout_{i + 1}")(x)
        return x


class HighwayNet(nn.Module):
    """H*T + x*(1-T) with transform-gate bias init -1
    (reference ``modules.py:105-120``)."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        h = nn.relu(nn.Dense(dim, name="H", param_dtype=self.param_dtype,
                             dtype=x.dtype)(x))
        t = jax.nn.sigmoid(nn.Dense(
            dim, name="T", bias_init=nn.initializers.constant(-1.0),
            param_dtype=self.param_dtype, dtype=x.dtype)(x))
        return h * t + x * (1.0 - t)


def _tf_same_pad_offset(kernel_width: int, bank_width: int) -> int:
    """Row offset embedding a width-k SAME conv inside a width-K SAME conv.

    TF SAME padding for width k pads (k-1)//2 on the left; aligning the two
    receptive fields requires offset (K-1)//2 - (k-1)//2.
    """
    return (bank_width - 1) // 2 - (kernel_width - 1) // 2


class ConvBank(nn.Module):
    """Fused K-way convolution bank producing [N, T, K*channels]."""

    bank_size: int
    channels: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = self.bank_size
        in_features = x.shape[-1]
        blocks = []
        for k in range(1, K + 1):
            kernel = self.param(
                f"kernel_{k}",
                nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
                (k, in_features, self.channels), self.param_dtype)
            offset = _tf_same_pad_offset(k, K)
            blocks.append(jnp.pad(
                kernel, ((offset, K - offset - k), (0, 0), (0, 0))))
        fused_kernel = jnp.concatenate(blocks, axis=-1).astype(x.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (K * self.channels,), self.param_dtype)

        pad_left = (K - 1) // 2
        out = jax.lax.conv_general_dilated(
            x, fused_kernel,
            window_strides=(1,),
            padding=[(pad_left, K - 1 - pad_left)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out + bias.astype(x.dtype)


class Conv1d(nn.Module):
    """SAME-padded conv1d with TF-style padding split."""

    width: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1.0, "fan_avg",
                                                       "uniform"),
            (self.width, x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        pad_left = (self.width - 1) // 2
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad_left, self.width - 1 - pad_left)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out + bias.astype(x.dtype)


class BatchNorm(nn.Module):
    """tf.layers.batch_normalization defaults: momentum .99, eps 1e-3."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            param_dtype=self.param_dtype, dtype=x.dtype)(x)


def max_pool_same(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Width-``width`` stride-1 SAME max pool over time
    (reference ``modules.py:47-51``)."""
    pad_left = (width - 1) // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, width, 1), window_strides=(1, 1, 1),
        padding=((0, 0), (pad_left, width - 1 - pad_left), (0, 0)))


class CBHG(nn.Module):
    """Conv-Bank + Highway + GRU encoder block (reference ``modules.py:27-96``).

    ``before_highway`` / ``rnn_init_state`` are the Deep Voice 2 speaker
    injection sites (``models/tacotron.py:68-79``).
    """

    bank_size: int
    bank_channel_size: int
    maxpool_width: int
    highway_depth: int
    rnn_size: int
    proj_sizes: Sequence[int]
    proj_width: int
    param_dtype: jnp.dtype = jnp.float32
    unroll: int = 1  # XLA unroll of the BiGRU time scans

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray],
                 train: bool,
                 before_highway: Optional[jnp.ndarray] = None,
                 rnn_init_state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # Conv bank -> ReLU -> BN (single fused bank; see module docstring)
        conv = ConvBank(self.bank_size, self.bank_channel_size,
                        self.param_dtype, name="conv_bank")(x)
        conv = BatchNorm(self.param_dtype, name="bank_bn")(nn.relu(conv),
                                                           train)

        pooled = max_pool_same(conv, self.maxpool_width)

        # Projection convs; ReLU on all but the last (reference modules.py:54-59)
        proj = pooled
        for idx, size in enumerate(self.proj_sizes):
            proj = Conv1d(self.proj_width, size, self.param_dtype,
                          name=f"proj_{idx + 1}")(proj)
            if idx != len(self.proj_sizes) - 1:
                proj = nn.relu(proj)
            proj = BatchNorm(self.param_dtype, name=f"proj_{idx + 1}_bn")(
                proj, train)

        # Residual (+ optional speaker bias broadcast over time)
        highway_input = proj + x
        if before_highway is not None:
            highway_input = highway_input + before_highway[:, None, :]

        if highway_input.shape[-1] != self.rnn_size:
            highway_input = nn.Dense(
                self.rnn_size, name="highway_dim_fix",
                param_dtype=self.param_dtype, dtype=x.dtype)(highway_input)

        for idx in range(self.highway_depth):
            highway_input = HighwayNet(
                self.param_dtype, name=f"highway_{idx + 1}")(highway_input)

        return BiGRU(self.rnn_size, self.param_dtype, unroll=self.unroll,
                     name="bigru")(highway_input, lengths, rnn_init_state)


class SpeakerEmbedding(nn.Module):
    """Speaker lookup table (reference ``models/tacotron.py:43-49``)."""

    num_speakers: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speaker_id: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.truncated_normal(stddev=0.5),
            (self.num_speakers, self.features), self.param_dtype)
        return jnp.take(table, speaker_id, axis=0)

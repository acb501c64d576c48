"""Train state: params, BatchNorm running stats, optimizer state, step.

A plain pytree dataclass (flax.struct) so it shards/checkpoints/jits
transparently — the successor to the reference's TF Session variables +
``global_step`` (``/root/reference/train.py:145-206``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models.tacotron import Tacotron
from ..text.symbols import vocab_size_for


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_model(config: Config) -> Tacotron:
    """Model registry (reference ``models/__init__.py:6-7``); the embedding
    size follows the configured symbol set."""
    return Tacotron(config.model,
                    vocab_size=vocab_size_for(config.data.symbol_set))


def abstract_train_state(config: Config,
                         optimizer: optax.GradientTransformation,
                         max_input_len: int = 64,
                         batch_size: int = 2) -> TrainState:
    """Shape/dtype-only TrainState template via ``jax.eval_shape`` — nothing
    is compiled or executed, so building a checkpoint-restore template costs
    milliseconds instead of a full train-mode init compile."""
    def build():
        return create_train_state(config, jax.random.PRNGKey(0), optimizer,
                                  max_input_len, batch_size)
    return jax.eval_shape(build)


def create_train_state(config: Config, rng: jax.Array,
                       optimizer: optax.GradientTransformation,
                       max_input_len: int = 64,
                       batch_size: int = 2) -> TrainState:
    """Initialize parameters with dummy shapes (shapes don't leak into the
    params, so any static shape works) and wrap them in a TrainState."""
    model = create_model(config)
    r = config.model.reduction_factor
    inputs = jnp.zeros((batch_size, max_input_len), jnp.int32)
    lengths = jnp.full((batch_size,), max_input_len, jnp.int32)
    mels = jnp.zeros((batch_size, 8 * r, config.model.num_mels), jnp.float32)
    speaker = (jnp.zeros((batch_size,), jnp.int32)
               if config.model.num_speakers > 1 else None)
    init_rng, dropout_rng = jax.random.split(rng)

    # jit the init: un-jitted flax init dispatches the whole forward op by
    # op (minutes on TPU); one compiled program hits the persistent cache.
    @jax.jit
    def init_fn(init_rng, dropout_rng):
        return model.init({"params": init_rng, "dropout": dropout_rng},
                          inputs, lengths, speaker_id=speaker,
                          mel_targets=mels, train=True)

    variables = init_fn(init_rng, dropout_rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )

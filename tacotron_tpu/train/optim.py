"""Learning-rate schedules and the optimizer chain.

Reference semantics (``/root/reference/models/tacotron.py:305-336``):

- mode 0: Noam warmup ``lr * ws**0.5 * min((t+1) * ws**-1.5, (t+1)**-0.5)``
  with ``ws`` = 4000 for randomly-initialized runs and 40000 when
  fine-tuning from a warm start.
- mode 1: exponential decay ``lr * 0.95**((t+1)/3000)`` (continuous, as
  ``tf.train.exponential_decay`` without staircase).
- Adam(beta1, beta2), global-norm gradient clipping at ``grad_clip_norm``.
"""

from __future__ import annotations

import optax

from ..config import TrainConfig


def noam_schedule(initial_lr: float, warmup_steps: float) -> optax.Schedule:
    def schedule(step):
        t = (step + 1).astype(float) if hasattr(step, "astype") else float(
            step + 1)
        return (initial_lr * warmup_steps ** 0.5
                * _minimum(t * warmup_steps ** -1.5, t ** -0.5))
    return schedule


def _minimum(a, b):
    import jax.numpy as jnp
    return jnp.minimum(a, b)


def exponential_schedule(initial_lr: float, decay_steps: int = 3000,
                         decay_rate: float = 0.95) -> optax.Schedule:
    def schedule(step):
        t = (step + 1).astype(float) if hasattr(step, "astype") else float(
            step + 1)
        return initial_lr * decay_rate ** (t / decay_steps)
    return schedule


def learning_rate_schedule(config: TrainConfig,
                           randomly_initialized: bool = True) -> optax.Schedule:
    if config.decay_learning_rate_mode == 0:
        warmup = (config.warmup_steps_fresh if randomly_initialized
                  else config.warmup_steps_finetune)
        return noam_schedule(config.initial_learning_rate, warmup)
    if config.decay_learning_rate_mode == 1:
        return exponential_schedule(config.initial_learning_rate)
    raise ValueError(
        f"unknown decay_learning_rate_mode {config.decay_learning_rate_mode}")


def make_optimizer(config: TrainConfig,
                   randomly_initialized: bool = True) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam with the reference schedule."""
    schedule = learning_rate_schedule(config, randomly_initialized)
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip_norm),
        optax.scale_by_adam(b1=config.adam_beta1, b2=config.adam_beta2),
        optax.scale_by_learning_rate(schedule),
    )

"""Training losses.

Reproduces the reference loss exactly (``/root/reference/models/
tacotron.py:274-302``): L1 on mel and linear spectrograms, each weighted by a
per-utterance ``loss_coeff`` (down-weighting utterances whose transcript came
from uncertain ASR, ``datasets/generate_data.py:66-82``), with an optional
"prioritized" re-weighting of the 165 Hz..5 kHz linear bins.

Note the reference deliberately does NOT mask padding frames — the decoder is
trained to emit zeros past the end of the utterance (its stop criterion,
``models/helpers.py:26-32``).  We keep that semantics for parity.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..config import AudioConfig, TrainConfig


def tacotron_loss(mel_outputs: jnp.ndarray, linear_outputs: jnp.ndarray,
                  mel_targets: jnp.ndarray, linear_targets: jnp.ndarray,
                  loss_coeff: Optional[jnp.ndarray],
                  train_config: TrainConfig,
                  audio_config: AudioConfig) -> Dict[str, jnp.ndarray]:
    """Returns dict with ``loss`` (optimized), ``mel_loss``, ``linear_loss``,
    and ``loss_without_coeff`` (reported), matching the reference fields."""
    if loss_coeff is None:
        loss_coeff = jnp.ones((mel_outputs.shape[0],), mel_outputs.dtype)
    coeff = loss_coeff[:, None, None].astype(mel_outputs.dtype)

    mel_l1 = jnp.abs(mel_targets - mel_outputs)
    lin_l1 = jnp.abs(linear_targets - linear_outputs)

    if train_config.prioritize_loss:
        nyquist = audio_config.sample_rate * 0.5
        lo = int(165 / nyquist * audio_config.num_freq)
        hi = int(5000 / nyquist * audio_config.num_freq)
        lin_priority = lin_l1[:, :, lo:hi]
        loss = (jnp.mean(mel_l1 * coeff)
                + 0.5 * jnp.mean(lin_l1 * coeff)
                + 0.5 * jnp.mean(lin_priority * coeff))
        linear_loss = 0.5 * (jnp.mean(lin_l1) + jnp.mean(lin_priority))
    else:
        loss = jnp.mean(mel_l1 * coeff) + jnp.mean(lin_l1 * coeff)
        linear_loss = jnp.mean(lin_l1)

    mel_loss = jnp.mean(mel_l1)
    return {
        "loss": loss,
        "mel_loss": mel_loss,
        "linear_loss": linear_loss,
        "loss_without_coeff": mel_loss + linear_loss,
    }

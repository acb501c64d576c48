"""Training losses.

Reproduces the reference loss exactly (``/root/reference/models/
tacotron.py:274-302``): L1 on mel and linear spectrograms, each weighted by a
per-utterance ``loss_coeff`` (down-weighting utterances whose transcript came
from uncertain ASR, ``datasets/generate_data.py:66-82``), with an optional
"prioritized" re-weighting of the 165 Hz..5 kHz linear bins.

Note the reference deliberately does NOT mask padding frames — the decoder is
trained to emit zeros past the end of the utterance (its stop criterion,
``models/helpers.py:26-32``).  We keep that semantics for parity.

One TPU-first correction is needed on top: the reference pads each batch to
``round_up(batch_max_frames + 1, r)`` (``datasets/datafeeder.py:313-326``)
and its L1 *means* are taken over exactly that many frames.  Our feeder pads
further — to a static frame bucket (or the corpus max) so XLA compiles a
fixed set of programs.  Taking a plain ``mean`` over the bucket-padded tensor
would divide by a batch-varying padded length and dilute the loss/gradient
scale relative to the reference.  So when ``target_lengths`` is given, the
means are normalized by the *reference-equivalent* frame count
``round_up(max(target_lengths) + 1, r)``: frames the reference would train on
(including its own zero padding) are kept unmasked, frames that exist only
because of bucket padding are excluded from both numerator and denominator.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..config import AudioConfig, TrainConfig


def tacotron_loss(mel_outputs: jnp.ndarray, linear_outputs: jnp.ndarray,
                  mel_targets: jnp.ndarray, linear_targets: jnp.ndarray,
                  loss_coeff: Optional[jnp.ndarray],
                  train_config: TrainConfig,
                  audio_config: AudioConfig,
                  target_lengths: Optional[jnp.ndarray] = None,
                  reduction_factor: int = 1) -> Dict[str, jnp.ndarray]:
    """Returns dict with ``loss`` (optimized), ``mel_loss``, ``linear_loss``,
    and ``loss_without_coeff`` (reported), matching the reference fields.

    ``target_lengths`` ([N] int32, true frame counts before padding) enables
    the reference-equivalent normalization described in the module docstring;
    without it the means run over the full padded tensors (only correct when
    the batch is padded exactly like the reference)."""
    if loss_coeff is None:
        loss_coeff = jnp.ones((mel_outputs.shape[0],), mel_outputs.dtype)
    coeff = loss_coeff[:, None, None].astype(mel_outputs.dtype)

    mel_l1 = jnp.abs(mel_targets - mel_outputs)
    lin_l1 = jnp.abs(linear_targets - linear_outputs)

    n_frames_padded = mel_targets.shape[1]
    if target_lengths is not None:
        r = max(1, int(reduction_factor))
        # reference pad length: batch max + 1, rounded up to r
        # (datafeeder.py:313-326, _round_up)
        ref_len = jnp.max(target_lengths) + 1
        ref_len = ((ref_len + r - 1) // r) * r
        ref_len = jnp.minimum(ref_len, n_frames_padded)
        frame_mask = (jnp.arange(n_frames_padded)[None, :, None]
                      < ref_len).astype(mel_l1.dtype)
        denom_frames = ref_len.astype(mel_l1.dtype)
    else:
        frame_mask = jnp.ones((1, 1, 1), mel_l1.dtype)
        denom_frames = jnp.asarray(float(n_frames_padded), mel_l1.dtype)

    batch = mel_l1.shape[0]

    def _mean(x: jnp.ndarray) -> jnp.ndarray:
        """Mean over the reference-equivalent region [N, ref_len, D]."""
        return jnp.sum(x * frame_mask) / (batch * denom_frames * x.shape[-1])

    if train_config.prioritize_loss:
        nyquist = audio_config.sample_rate * 0.5
        lo = int(165 / nyquist * audio_config.num_freq)
        hi = int(5000 / nyquist * audio_config.num_freq)
        lin_priority = lin_l1[:, :, lo:hi]
        loss = (_mean(mel_l1 * coeff)
                + 0.5 * _mean(lin_l1 * coeff)
                + 0.5 * _mean(lin_priority * coeff))
        linear_loss = 0.5 * (_mean(lin_l1) + _mean(lin_priority))
    else:
        loss = _mean(mel_l1 * coeff) + _mean(lin_l1 * coeff)
        linear_loss = _mean(lin_l1)

    mel_loss = _mean(mel_l1)
    return {
        "loss": loss,
        "mel_loss": mel_loss,
        "linear_loss": linear_loss,
        "loss_without_coeff": mel_loss + linear_loss,
    }


def guided_attention_loss(alignments: jnp.ndarray,
                          input_lengths: jnp.ndarray,
                          target_lengths: Optional[jnp.ndarray],
                          reduction_factor: int,
                          sigma: float = 0.2) -> jnp.ndarray:
    """Soft-diagonal attention prior (Tachibana et al. 2017, DC-TTS eq. 3).

    Not present in the reference (its monotonic attention plays a similar
    role architecturally); offered as an opt-in quality lever for low-data
    training — see ``TrainConfig.guided_attention_weight``.

    ``alignments``: [N, T_in, T_dec] attention weights from the decoder scan.
    Each utterance gets its own diagonal target using its true text length
    and true decoder-step count; padding rows/steps are masked out of the
    mean, so bucket padding does not dilute the penalty.

    Returns ``mean_t sum_n A[n, t] * (1 - exp(-(n/N - t/T)^2 /
    (2 sigma^2)))`` — the fraction of each step's attention mass placed
    off-diagonal, averaged over true decode steps — PLUS a
    mass-conservation term ``mean_t (1 - sum_n A[n, t])^2``.  Both terms
    are per-decode-step averages in [0, ~1]: normalizing the diagonal
    term by the full ``T_in x T_dec`` area instead (DC-TTS's formulation)
    caps it at ~1/T_in, which measured too weak to beat the
    copy-previous-frame shortcut — a bah_mon model parked ALL mass on
    token 0 for every step (mass 1, area-normalized penalty 0.02) and
    still drove the teacher-forced loss to 0.02.  For softmax
    attention the per-step mass is 1 by construction and the term is ~0
    (it only discourages attending padding tokens); for the soft-monotonic
    ``bah_mon`` (the reference default) it is load-bearing: the
    parallel-mode recurrence silently DROPS whatever probability scans
    past the last token (ops/attention.py:40-48), so ``A -> 0`` zeroes the
    diagonal penalty too and pure guided attention can reward collapse.
    Anchoring emitted mass at 1 closes that escape: the only way to
    satisfy both terms is real mass on the diagonal.  (Observed: on the
    variable-rate melody corpus, reference-parity loss collapses to
    attention_mass ~0 by early training — docs/convergence_var — because
    tokens lasting 2-3 steps make the copy-previous-frame shortcut cheap
    and nothing else holds the monotonic mass in bounds.)
    """
    N, T_in, T_dec = alignments.shape
    r = max(1, int(reduction_factor))
    if target_lengths is None:
        dec_steps = jnp.full((N,), T_dec, jnp.float32)
    else:
        dec_steps = jnp.ceil(target_lengths.astype(jnp.float32) / r)
        dec_steps = jnp.clip(dec_steps, 1.0, float(T_dec))
    in_len = input_lengths.astype(jnp.float32)

    n = jnp.arange(T_in, dtype=jnp.float32)[None, :, None]    # [1, T_in, 1]
    t = jnp.arange(T_dec, dtype=jnp.float32)[None, None, :]   # [1, 1, T_dec]
    n_rel = n / jnp.maximum(in_len - 1.0, 1.0)[:, None, None]
    t_rel = t / jnp.maximum(dec_steps - 1.0, 1.0)[:, None, None]
    weight = 1.0 - jnp.exp(-((n_rel - t_rel) ** 2) / (2.0 * sigma * sigma))

    mask = ((n < in_len[:, None, None])
            & (t < dec_steps[:, None, None])).astype(alignments.dtype)
    penalty = alignments * weight.astype(alignments.dtype) * mask
    step_mask = (t[:, 0, :] < dec_steps[:, None]).astype(alignments.dtype)
    n_steps = jnp.maximum(jnp.sum(step_mask), 1.0)
    # off-diagonal mass per true decode step, averaged (see docstring)
    diag = jnp.sum(penalty) / n_steps

    # mass conservation over true decode steps (see docstring): anchor
    # the in-bounds emitted mass at 1.
    mass = jnp.sum(alignments * mask, axis=1)                 # [N, T_dec]
    mass_pen = jnp.sum(((1.0 - mass) ** 2) * step_mask) / n_steps
    return diag + mass_pen

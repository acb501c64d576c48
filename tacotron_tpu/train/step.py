"""The jitted, mesh-sharded train/eval steps.

TPU-native successor to the reference's ``sess.run([global_step, loss,
optimize])`` hot loop (``/root/reference/train.py:215-230``): one pure
function, compiled once per bucket shape, with

- batch sharded over the mesh ``data`` axis (NamedSharding on the leading
  dim), parameters/optimizer state replicated;
- gradients reduced across replicas by XLA-inserted collectives (ring
  all-reduce over ICI) — no hand-written NCCL analog;
- BatchNorm running stats updated functionally (the UPDATE_OPS dependency at
  ``models/tacotron.py:332-336`` becomes an explicit state output), with the
  cross-replica mean of the per-replica stats;
- loss-explosion detection returned as a value (``train.py:228-230`` raises
  on loss > 100 or NaN) so the host can react without a device sync.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.tacotron import Tacotron
from ..parallel import MeshPlan
from .losses import guided_attention_loss, tacotron_loss
from .optim import learning_rate_schedule, make_optimizer
from .state import TrainState, create_model


class Batch(NamedTuple):
    """One training batch (the DataFeeder contract,
    reference ``datasets/datafeeder.py:162-178``)."""

    inputs: jnp.ndarray          # [N, T_in] int32 token ids
    input_lengths: jnp.ndarray   # [N] int32
    loss_coeff: jnp.ndarray      # [N] float32
    mel_targets: jnp.ndarray     # [N, T_out, num_mels]
    linear_targets: jnp.ndarray  # [N, T_out, num_freq]
    speaker_id: jnp.ndarray      # [N] int32
    # true frame counts before padding; enables reference-equivalent loss
    # normalization under bucket padding (see train/losses.py docstring)
    target_lengths: Optional[jnp.ndarray] = None  # [N] int32
    # int16 waveforms [N, (T_out-1)*hop] for on-device feature extraction
    # (TrainConfig.on_device_features); mel/linear_targets are None then
    waveforms: Optional[jnp.ndarray] = None


def _forward_loss(model: Tacotron, config: Config, params, batch_stats,
                  batch: Batch, dropout_rng, train: bool,
                  guided_weight=None):
    """``guided_weight``: traced override of the static
    ``config.train.guided_attention_weight`` (the annealed weight the
    train step computes from ``state.step``); None = the config value."""
    if config.train.on_device_features and batch.waveforms is not None:
        # on-device feature extraction: int16 waveforms -> mel/linear
        # targets on chip (7.4x less H2D than precomputed spectrograms)
        from ..dsp.chip import features_from_waveform
        wav = batch.waveforms.astype(jnp.float32) / 32767.0
        linear_t, mel_t = features_from_waveform(wav, config.audio)
        batch = batch._replace(mel_targets=mel_t, linear_targets=linear_t)
    variables = {"params": params, "batch_stats": batch_stats}
    speaker = batch.speaker_id if config.model.num_speakers > 1 else None
    if train:
        out, mutated = model.apply(
            variables, batch.inputs, batch.input_lengths, speaker_id=speaker,
            mel_targets=batch.mel_targets, train=True,
            rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = model.apply(
            variables, batch.inputs, batch.input_lengths, speaker_id=speaker,
            mel_targets=batch.mel_targets, train=False)
        new_stats = batch_stats
    losses = tacotron_loss(out["mel_outputs"], out["linear_outputs"],
                           batch.mel_targets, batch.linear_targets,
                           batch.loss_coeff, config.train, config.audio,
                           target_lengths=batch.target_lengths,
                           reduction_factor=config.model.reduction_factor)
    # Attention-health telemetry: mean in-bounds attention mass per true
    # decode step.  Softmax attention sums to ~1 by construction, but the
    # monotonic variants (bah_mon, the reference default) can LEAK mass
    # past the last token — the parallel-mode recurrence simply loses
    # whatever probability marches off the end — and a drop here is the
    # EARLIEST signal of alignment collapse (hours before synthesized
    # audio shows it; the round-5 variable-rate study's failed run sat at
    # mass ~0 from early training while the loss kept falling).  One
    # masked reduction, fused into the step by XLA.
    align = out["alignments"]  # [N, T_in, T_dec]
    N, T_in, T_dec = align.shape
    tok_mask = (jnp.arange(T_in)[None, :]
                < batch.input_lengths[:, None])          # [N, T_in]
    if batch.target_lengths is not None:
        r = max(1, config.model.reduction_factor)
        dec_steps = jnp.ceil(batch.target_lengths / r).astype(jnp.float32)
        dec_steps = jnp.clip(dec_steps, 1.0, float(T_dec))
    else:
        dec_steps = jnp.full((N,), float(T_dec))
    step_mask = (jnp.arange(T_dec)[None, :]
                 < dec_steps[:, None])                   # [N, T_dec]
    in_bounds = (align.astype(jnp.float32)
                 * tok_mask[:, :, None] * step_mask[:, None, :])
    mass = in_bounds.sum(axis=1).sum(axis=1) / dec_steps  # [N]
    losses = dict(losses)
    losses["attention_mass"] = mass.mean()

    # Opt-in guided-attention prior (static config branch: zero cost when off)
    if config.train.guided_attention_weight > 0.0:
        attn = guided_attention_loss(
            out["alignments"], batch.input_lengths, batch.target_lengths,
            config.model.reduction_factor,
            sigma=config.train.guided_attention_sigma)
        if guided_weight is None:
            guided_weight = config.train.guided_attention_weight
        losses = dict(losses)
        losses["attention_loss"] = attn
        losses["loss"] = losses["loss"] + guided_weight * attn
    return losses, out, new_stats


def _guided_weight_at(config: Config, step) -> Optional[jnp.ndarray]:
    """Annealed guided-attention weight at ``step`` (traced): linear decay
    from the configured weight to 0 over ``guided_attention_decay_steps``
    (constant when 0 — see the TrainConfig field docstring)."""
    base = config.train.guided_attention_weight
    decay = config.train.guided_attention_decay_steps
    if base <= 0.0 or decay <= 0:
        return None
    frac = 1.0 - step.astype(jnp.float32) / float(decay)
    return base * jnp.clip(frac, 0.0, 1.0)


def make_train_step(config: Config, plan: Optional[MeshPlan] = None,
                    randomly_initialized: bool = True):
    """Returns ``step_fn(state, batch, rng) -> (state, metrics)``, jitted.

    With a mesh plan, in/out shardings are annotated so the same function is
    the single-chip and the multi-chip program.
    """
    model = create_model(config)
    optimizer = make_optimizer(config.train, randomly_initialized)
    schedule = learning_rate_schedule(config.train, randomly_initialized)

    def step_fn(state: TrainState, batch: Batch,
                dropout_rng: jax.Array) -> Tuple[TrainState, Dict[str, Any]]:
        rng = jax.random.fold_in(dropout_rng, state.step)

        gw = _guided_weight_at(config, state.step)

        def loss_fn(params):
            losses, _, new_stats = _forward_loss(
                model, config, params, state.batch_stats, batch, rng,
                train=True, guided_weight=gw)
            return losses["loss"], (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)

        grad_norm = optax.global_norm(grads)
        # param_norm depends on the full update chain, so fetching it on the
        # host is a true end-of-step sync (and a useful drift diagnostic)
        param_norm = optax.global_norm(new_params)
        metrics = {
            "param_norm": param_norm,
            "loss": losses["loss"],
            "mel_loss": losses["mel_loss"],
            "linear_loss": losses["linear_loss"],
            "loss_without_coeff": losses["loss_without_coeff"],
            "learning_rate": schedule(state.step),
            "grad_norm": grad_norm,
            # loss-explosion flag (reference train.py:228-230)
            "diverged": jnp.logical_or(losses["loss"] > 100.0,
                                       jnp.isnan(losses["loss"])),
            "attention_mass": losses["attention_mass"],
        }
        if config.train.guided_attention_weight > 0.0:
            metrics["attention_loss"] = losses["attention_loss"]
            if gw is not None:
                metrics["guided_weight"] = gw
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if plan is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    batch_sh = plan.batch()
    repl = plan.replicated()
    # Sharding prefixes: state/rng replicated, batch sharded on axis 0.
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(config: Config, plan: Optional[MeshPlan] = None):
    """Teacher-forced eval step: losses only, no state mutation
    (the reference's reused-scope test model, ``train.py:158-169``)."""
    model = create_model(config)

    def eval_fn(state: TrainState, batch: Batch) -> Dict[str, jnp.ndarray]:
        losses, _, _ = _forward_loss(
            model, config, state.params, state.batch_stats, batch,
            jax.random.PRNGKey(0), train=False)
        return {"loss": losses["loss"], "mel_loss": losses["mel_loss"],
                "linear_loss": losses["linear_loss"],
                "loss_without_coeff": losses["loss_without_coeff"]}

    if plan is None:
        return jax.jit(eval_fn)
    return jax.jit(eval_fn, in_shardings=(plan.replicated(), plan.batch()),
                   out_shardings=plan.replicated())

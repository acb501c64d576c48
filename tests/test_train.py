"""Training-layer tests: loss semantics, LR schedules, sharded train step on
the virtual 8-device mesh, checkpoint resume/warm-start semantics.
"""

import os
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron_tpu.config import AudioConfig, Config, TrainConfig
from tacotron_tpu.parallel import make_mesh, shard_batch
from tacotron_tpu.train import (Batch, create_train_state,
                                learning_rate_schedule, make_eval_step,
                                make_optimizer, make_train_step, tacotron_loss)
from tacotron_tpu.train.checkpoint import (CheckpointManager, load_run_config,
                                           warm_start)


def _toy_batch(N=8, T_in=24, T_out=16, seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        inputs=jnp.asarray(rng.integers(0, 80, (N, T_in)), jnp.int32),
        input_lengths=jnp.full((N,), T_in, jnp.int32),
        loss_coeff=jnp.ones((N,), jnp.float32),
        mel_targets=jnp.asarray(rng.random((N, T_out, 80)), jnp.float32),
        linear_targets=jnp.asarray(rng.random((N, T_out, 1025)), jnp.float32),
        speaker_id=jnp.zeros((N,), jnp.int32))


def test_loss_coeff_weighting():
    """loss scales with loss_coeff; loss_without_coeff does not."""
    rng = np.random.default_rng(1)
    mel_o = jnp.asarray(rng.random((2, 4, 80)), jnp.float32)
    mel_t = jnp.asarray(rng.random((2, 4, 80)), jnp.float32)
    lin_o = jnp.asarray(rng.random((2, 4, 1025)), jnp.float32)
    lin_t = jnp.asarray(rng.random((2, 4, 1025)), jnp.float32)
    tc, ac = TrainConfig(), AudioConfig()
    full = tacotron_loss(mel_o, lin_o, mel_t, lin_t,
                         jnp.array([1.0, 1.0]), tc, ac)
    half = tacotron_loss(mel_o, lin_o, mel_t, lin_t,
                         jnp.array([0.5, 0.5]), tc, ac)
    np.testing.assert_allclose(float(half["loss"]), float(full["loss"]) / 2,
                               rtol=1e-5)
    np.testing.assert_allclose(float(half["loss_without_coeff"]),
                               float(full["loss_without_coeff"]), rtol=1e-6)


def test_bucket_padding_does_not_dilute_loss():
    """With target_lengths, the loss is invariant to extra bucket padding and
    equals the plain mean over the reference-equivalent pad length
    (ADVICE r1 medium: bucket pads diluted the unmasked-L1 means)."""
    tc, ac = TrainConfig(), AudioConfig()
    rng = np.random.default_rng(3)
    N, T, r = 2, 12, 4
    mel_o = jnp.asarray(rng.random((N, T, 80)), jnp.float32)
    mel_t = jnp.asarray(rng.random((N, T, 80)), jnp.float32)
    lin_o = jnp.asarray(rng.random((N, T, 1025)), jnp.float32)
    lin_t = jnp.asarray(rng.random((N, T, 1025)), jnp.float32)
    # ref pad length = round_up(max(11)+1, 4) = 12 == T exactly
    lengths = jnp.asarray([9, 11], jnp.int32)
    base = tacotron_loss(mel_o, lin_o, mel_t, lin_t, None, tc, ac,
                         target_lengths=lengths, reduction_factor=r)
    # reference semantics on the exactly-reference-padded tensors
    ref = tacotron_loss(mel_o, lin_o, mel_t, lin_t, None, tc, ac)
    np.testing.assert_allclose(float(base["loss"]), float(ref["loss"]),
                               rtol=1e-6)

    def pad(x):  # 24 extra all-zero bucket-padding frames
        return jnp.pad(x, ((0, 0), (0, 24), (0, 0)))

    padded = tacotron_loss(pad(mel_o), pad(lin_o), pad(mel_t), pad(lin_t),
                           None, tc, ac,
                           target_lengths=lengths, reduction_factor=r)
    for k in ("loss", "mel_loss", "linear_loss", "loss_without_coeff"):
        np.testing.assert_allclose(float(padded[k]), float(base[k]),
                                   rtol=1e-6, err_msg=k)


def test_prioritized_loss_band():
    """prioritize_loss re-weights the 165 Hz..5 kHz band
    (reference models/tacotron.py:284-295)."""
    tc = TrainConfig(prioritize_loss=True)
    ac = AudioConfig()
    lo = int(165 / (ac.sample_rate * 0.5) * ac.num_freq)
    hi = int(5000 / (ac.sample_rate * 0.5) * ac.num_freq)
    mel = jnp.zeros((1, 2, 80))
    lin_t = jnp.zeros((1, 2, 1025))
    lin_o = jnp.zeros((1, 2, 1025)).at[:, :, lo:hi].set(1.0)
    out = tacotron_loss(mel, lin_o, mel, lin_t, None, tc, ac)
    band = hi - lo
    want = 0.5 * band / 1025 + 0.5 * 1.0
    np.testing.assert_allclose(float(out["loss"]), want, rtol=1e-5)


def test_guided_attention_loss_prefers_diagonal():
    """Diagonal alignments score near zero; anti-diagonal near the weight
    ceiling; padding rows/steps don't change the mean."""
    from tacotron_tpu.train.losses import guided_attention_loss
    N, T_in, T_dec, r = 2, 10, 10, 4
    eye = jnp.tile(jnp.eye(T_in)[None], (N, 1, 1))
    anti = eye[:, ::-1, :]
    lens = jnp.full((N,), T_in, jnp.int32)
    tlens = jnp.full((N,), T_dec * r, jnp.int32)
    diag = float(guided_attention_loss(eye, lens, tlens, r))
    off = float(guided_attention_loss(anti, lens, tlens, r))
    assert diag < 0.01
    assert off > 0.05
    assert off > 10 * diag

    # invariance to bucket padding: pad T_in/T_dec, same true lengths
    pad = jnp.zeros((N, T_in + 6, T_dec + 4))
    pad = pad.at[:, :T_in, :T_dec].set(eye)
    padded = float(guided_attention_loss(pad, lens, tlens, r))
    np.testing.assert_allclose(padded, diag, rtol=1e-5)

    # mass conservation: COLLAPSED attention (bah_mon leaking all its
    # probability off the end, A ~ 0) must score worse than the diagonal —
    # without the mass term, A=0 would zero the penalty and guided
    # attention could reward collapse (losses.py docstring)
    collapsed = jnp.zeros((N, T_in, T_dec))
    assert float(guided_attention_loss(collapsed, lens, tlens, r)) > 0.5
    # half the mass emitted on the diagonal: between the two
    half = float(guided_attention_loss(0.5 * eye, lens, tlens, r))
    assert diag < half < 1.0

    # stuck attention (all mass parked on token 0 every step — the
    # degenerate solution that satisfies the mass anchor alone) must be
    # strongly penalized; this is why the diagonal term is a PER-STEP
    # mass fraction, not an area mean capped at ~1/T_in (losses.py)
    stuck = jnp.zeros((N, T_in, T_dec)).at[:, 0, :].set(1.0)
    assert float(guided_attention_loss(stuck, lens, tlens, r)) > 0.3


def test_guided_attention_anneal():
    """With decay_steps set, the guided weight decays linearly with
    state.step and reaches 0 (loss == mel+linear) past the horizon."""
    cfg = Config().replace(train=TrainConfig(
        decay_learning_rate_mode=1, guided_attention_weight=4.0,
        guided_attention_decay_steps=8))
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    step = make_train_step(cfg)
    batch = _toy_batch(N=4)
    batch = batch._replace(
        target_lengths=jnp.full((4,), batch.mel_targets.shape[1], jnp.int32))
    # step 0: full weight
    state, m = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m["guided_weight"]), 4.0, rtol=1e-6)
    want = (float(m["mel_loss"]) + float(m["linear_loss"])
            + 4.0 * float(m["attention_loss"]))
    np.testing.assert_allclose(float(m["loss"]), want, rtol=1e-5)
    # mid-decay: step 1 of 8 -> weight 4 * (1 - 1/8)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m["guided_weight"]), 4.0 * 7 / 8,
                               rtol=1e-6)
    # past the horizon: weight 0, loss is the pure recon loss
    state = state.replace(step=jnp.asarray(100, state.step.dtype))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert float(m["guided_weight"]) == 0.0
    np.testing.assert_allclose(
        float(m["loss"]),
        float(m["mel_loss"]) + float(m["linear_loss"]), rtol=1e-5)


def test_guided_attention_in_train_step():
    """With guided_attention_weight > 0 the step reports attention_loss and
    the optimized loss includes the weighted term."""
    cfg = Config().replace(train=TrainConfig(decay_learning_rate_mode=1,
                                             guided_attention_weight=5.0))
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    step = make_train_step(cfg)
    batch = _toy_batch(N=4)
    batch = batch._replace(
        target_lengths=jnp.full((4,), batch.mel_targets.shape[1], jnp.int32))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert "attention_loss" in m
    attn = float(m["attention_loss"])
    assert np.isfinite(attn) and attn > 0.0
    want = (float(m["mel_loss"]) + float(m["linear_loss"]) + 5.0 * attn)
    np.testing.assert_allclose(float(m["loss"]), want, rtol=1e-5)


def test_noam_schedule_shape():
    """Noam warmup: peaks at warmup_steps then decays as 1/sqrt(t);
    matches lr*ws^.5*min((t+1)ws^-1.5, (t+1)^-.5)."""
    tc = TrainConfig()
    sched = learning_rate_schedule(tc, randomly_initialized=True)
    ws, lr = tc.warmup_steps_fresh, tc.initial_learning_rate
    for step in [0, 100, 3999, 4000, 10000]:
        t = step + 1.0
        want = lr * ws ** 0.5 * min(t * ws ** -1.5, t ** -0.5)
        np.testing.assert_allclose(float(sched(jnp.asarray(step))), want,
                                   rtol=1e-6)
    # finetune mode uses the 40k warmup
    sched_ft = learning_rate_schedule(tc, randomly_initialized=False)
    assert float(sched_ft(jnp.asarray(100))) < float(sched(jnp.asarray(100)))


def test_exponential_schedule():
    tc = TrainConfig(decay_learning_rate_mode=1)
    sched = learning_rate_schedule(tc)
    np.testing.assert_allclose(float(sched(jnp.asarray(2999))),
                               0.002 * 0.95, rtol=1e-5)


def test_train_step_decreases_loss_on_mesh():
    # exponential-decay mode starts at the full LR so three steps move the
    # loss decisively (Noam warmup would be ~1e-6 here)
    cfg = Config().replace(train=TrainConfig(decay_learning_rate_mode=1))
    plan = make_mesh()
    assert plan.data_size == 8
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    step = make_train_step(cfg, plan)
    batch = Batch(*shard_batch(plan, _toy_batch()))
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, rng)
        assert not bool(m["diverged"])
        losses.append(float(m["loss"]))
        # attention-collapse telemetry: in-bounds mass is a probability
        # fraction (bah_mon can leak past the end, so < 1 is legal; > 1
        # or NaN would mean the masked reduction is wrong)
        mass = float(m["attention_mass"])
        assert np.isfinite(mass) and 0.0 <= mass <= 1.01, mass
    assert losses[-1] < losses[0]
    assert int(state.step) == 3

    ev = make_eval_step(cfg, plan)
    em = ev(state, batch)
    assert np.isfinite(float(em["loss"]))


def test_sharded_step_matches_unsharded():
    """DP correctness: the 8-device sharded train step produces the same
    params, metrics, and BatchNorm stats as the unsharded step on the same
    batch and rng (a sharding-spec mistake — e.g. per-replica BN means —
    would diverge here)."""
    cfg = Config().replace(train=TrainConfig(decay_learning_rate_mode=1))
    plan = make_mesh()
    batch = _toy_batch(N=8, seed=7)
    batch = batch._replace(
        target_lengths=jnp.full((8,), batch.mel_targets.shape[1], jnp.int32))
    rng = jax.random.PRNGKey(2)
    opt = make_optimizer(cfg.train)

    state_a = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    step_sharded = make_train_step(cfg, plan)
    sa, ma = step_sharded(state_a, Batch(*shard_batch(plan, batch)), rng)
    sa, ma = step_sharded(sa, Batch(*shard_batch(plan, batch)), rng)

    state_b = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    step_single = make_train_step(cfg)
    sb, mb = step_single(state_b, batch, rng)
    sb, mb = step_single(sb, batch, rng)

    for k in ("loss", "mel_loss", "linear_loss", "loss_without_coeff",
              "grad_norm", "param_norm"):
        np.testing.assert_allclose(float(ma[k]), float(mb[k]), rtol=2e-4,
                                   err_msg=k)
    # params: Adam divides tiny grads by tiny second moments, amplifying
    # reduction-order float noise; a real sharding bug (per-replica BN,
    # missing grad reduce) shows up as O(1) relative error, far above this
    for pa, pb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-2, atol=5e-4)
    for qa, qb in zip(jax.tree.leaves(sa.batch_stats),
                      jax.tree.leaves(sb.batch_stats)):
        np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                                   rtol=2e-4, atol=1e-5)


def test_checkpoint_resume_and_warm_start(tmp_path):
    cfg = Config()
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    state = state.replace(step=jnp.asarray(5, jnp.int32))
    run_dir = str(tmp_path / "run")
    mgr = CheckpointManager(run_dir, cfg)
    mgr.save(state)
    assert mgr.latest_step == 5

    template = create_train_state(cfg, jax.random.PRNGKey(9), opt)
    restored = mgr.restore(template)
    mgr.close()
    assert int(restored.step) == 5
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(restored.params)[0]))

    # initialize mode: params come over, step resets, run config round-trips
    ws = warm_start(template, run_dir)
    assert int(ws.step) == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(ws.params)[0]))
    assert load_run_config(run_dir).train.batch_size == cfg.train.batch_size


def test_async_checkpoint_save_is_donation_safe(tmp_path):
    """Async saves copy device->host before returning, so feeding the just-
    saved state straight into the donating train step must not corrupt the
    checkpoint (train/driver.py runs exactly this sequence)."""
    cfg = Config()
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    before = np.asarray(jax.tree.leaves(state.params)[0]).copy()

    mgr = CheckpointManager(str(tmp_path / "run"), cfg)
    mgr.save(state)  # async: returns after the device->host copy

    # immediately invalidate the saved buffers via donate_argnums=(0,)
    step_fn = make_train_step(cfg)
    new_state, _ = step_fn(state, _toy_batch(N=2, T_in=24, T_out=8),
                           jax.random.PRNGKey(1))
    jax.block_until_ready(new_state.params)

    template = create_train_state(cfg, jax.random.PRNGKey(9), opt)
    restored = mgr.restore(template)
    mgr.close()
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]), before)


def test_device_prefetcher_order_and_error_propagation():
    """The prefetcher preserves source order (single producer, FIFO) and
    re-raises producer exceptions at the consumer once drained."""
    from tacotron_tpu.parallel import DevicePrefetcher

    items = iter(range(10))
    pf = DevicePrefetcher(lambda: next(items), lambda x: x * 2, depth=3)
    try:
        assert [pf.get() for _ in range(10)] == [2 * i for i in range(10)]
        with pytest.raises(StopIteration):
            pf.get()
    finally:
        pf.stop()

    with pytest.raises(ValueError):
        DevicePrefetcher(lambda: 0, lambda x: x, depth=0)

    # a slow-but-healthy source blocks get() (like the synchronous loop it
    # replaces) instead of raising TimeoutError mid-run; an explicit
    # timeout still bounds the wait
    import time as _time
    slow = DevicePrefetcher(lambda: _time.sleep(2.0) or 7, lambda x: x,
                            depth=1)
    try:
        assert slow.get() == 7
        with pytest.raises(TimeoutError):
            slow.get(timeout=0.6)
    finally:
        slow.stop()


def test_prefetch_depth_auto_resolution():
    """prefetch_depth=None resolves by backend: 0 on the tunneled axon
    transport (deferred wire moves defeat client-side overlap — measured,
    docs/PERF.md), 2 on direct backends (this CPU run)."""
    from tacotron_tpu.train.driver import resolve_prefetch_depth

    # the live backend in tests is the forced CPU platform: direct -> 2
    assert resolve_prefetch_depth() == 2
    assert resolve_prefetch_depth(
        "PJRT C API\naxon 0.1.0; SerializedExecutable v9") == 0
    assert resolve_prefetch_depth("TFRT TPU v5 lite") == 2


def test_resolve_prefetch_depth_probes_unrecognized_backends():
    """An UNRECOGNIZED platform_version resolves by MEASUREMENT (the
    probe), not by name — a future tunneled transport with a different
    name must not silently reintroduce the 1.8x prefetch regression."""
    from tacotron_tpu.train.driver import (probe_transfer_deferred,
                                           resolve_prefetch_depth)

    probed = []

    def probe_deferred():
        probed.append(True)
        return True

    assert resolve_prefetch_depth("sometunnel 1.0",
                                  probe=probe_deferred) == 0
    assert probed == [True]
    assert resolve_prefetch_depth("sometunnel 1.0",
                                  probe=lambda: False) == 2
    # known names never probe
    assert resolve_prefetch_depth("TFRT TPU v5 lite",
                                  probe=lambda: 1 / 0) == 2
    assert resolve_prefetch_depth("axon 0.1.0", probe=lambda: 1 / 0) == 0
    # the real probe on this CPU backend: device_put pays the copy up
    # front, so the consume-after-blocked-put must be cheap -> direct
    assert probe_transfer_deferred(mib=4, trials=3) is False

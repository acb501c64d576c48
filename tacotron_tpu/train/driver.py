"""Training driver: the end-to-end loop.

Successor to ``/root/reference/train.py:108-275``: feeders in, sharded train
step, periodic eval on a held-out static batch, checkpoints, qualitative
audio/alignment dumps — with the reference's run-dir layout, divergence
guard, and resume/initialize semantics.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import Config
from ..data.feeder import DataFeeder
from ..dsp import host as dsp_host
from ..parallel import MeshPlan, make_mesh, shard_batch
from ..utils import (MetricsLogger, ValueWindow, get_git_diff,
                     get_git_revision_hash, init_log, log)
from .checkpoint import CheckpointManager, warm_start
from .optim import make_optimizer
from .state import TrainState, create_train_state
from .step import Batch, make_eval_step, make_train_step


#: transports whose ``device_put`` is known to DEFER the wire move into the
#: consuming computation (prefetch cannot overlap; measured 1.8x slower)
_KNOWN_DEFERRED_TRANSPORTS = ("axon",)
#: backends whose ``device_put`` is known to start a real async copy/DMA
_KNOWN_DIRECT_BACKENDS = ("libtpu", "tfrt", "cuda", "rocm", "cpu",
                          "interpreter")


def probe_transfer_deferred(device=None, mib: int = 8,
                            trials: int = 3) -> bool:
    """Measure whether this backend's ``device_put`` defers the H2D wire
    move into the consuming computation (the axon-tunnel pathology that
    makes client-side prefetch counterproductive, docs/PERF.md).

    Protocol: ``device_put`` an ``mib``-MiB array and block on the PUT,
    then time a trivial jitted consume of the already-"resident" buffer.
    On a direct backend the blocked put paid the transfer, so the consume
    is compute-only (microseconds); on a deferring transport the put+block
    is nearly free and the consume still pays the wire move.  Deferred iff
    the median consume costs more than the median blocked put.  If both
    are under 1 ms the transfer is trivially cheap either way and the
    answer is 'direct' (prefetch can neither help nor hurt).  Runs in
    well under a second after the one-off jit compile.
    """
    import numpy as np

    dev = device if device is not None else jax.devices()[0]
    n = mib * (1 << 20) // 4

    def _consume(a):
        return a.ravel()[::4096].sum()  # touch the buffer, trivial FLOPs

    consume = jax.jit(_consume)
    # warm up the compile (and the transport) outside the timed region
    w = jax.device_put(np.zeros(n, np.float32), dev)
    jax.block_until_ready(consume(w))
    del w

    puts, consumes = [], []
    for trial in range(trials):
        # a fresh buffer each trial so no transport-level caching applies
        x = np.full(n, float(trial + 1), np.float32)
        t0 = time.perf_counter()
        y = jax.device_put(x, dev)
        jax.block_until_ready(y)
        t1 = time.perf_counter()
        jax.block_until_ready(consume(y))
        t2 = time.perf_counter()
        puts.append(t1 - t0)
        consumes.append(t2 - t1)
        del y
    put_s = float(np.median(puts))
    consume_s = float(np.median(consumes))
    if put_s + consume_s < 1e-3:
        return False
    return consume_s > put_s


def resolve_prefetch_depth(platform_version: Optional[str] = None,
                           probe=None) -> int:
    """The measured default for ``train(prefetch_depth=None)``.

    0 on transports that DEFER the H2D wire move into the consuming step
    (the axon dev tunnel): there a producer thread cannot overlap anything
    and its extra RPC traffic makes the loop ~1.8x slower (paired A/B in
    docs/PERF.md, 'Prefetch on the tunneled link').  2 on direct backends,
    where ``jax.device_put`` starts a real async DMA and depth 2 yields
    ~max(transfer, compute).

    Resolution order: known transport names are a fast path (axon -> 0;
    libtpu/tfrt/cuda/rocm/cpu -> 2); an UNRECOGNIZED ``platform_version``
    falls back to :func:`probe_transfer_deferred` — a sub-second startup
    measurement — so a future tunneled transport with a different name
    gets the correct depth by measurement, not by string luck.  ``probe``
    injects the measurement for tests.  ``train(prefetch_depth=...)``
    remains the explicit override.
    """
    if platform_version is None:
        platform_version = getattr(jax.devices()[0].client,
                                   "platform_version", "")
        # the forced-CPU test platform reports an uninformative version
        # string; the device's own platform name is authoritative there
        if jax.devices()[0].platform == "cpu":
            platform_version += " cpu"
    pv = (platform_version or "").lower()
    if any(k in pv for k in _KNOWN_DEFERRED_TRANSPORTS):
        return 0
    if any(k in pv for k in _KNOWN_DIRECT_BACKENDS):
        return 2
    deferred = (probe if probe is not None else probe_transfer_deferred)()
    log(f"prefetch depth: unrecognized backend {platform_version!r}; "
        f"measured transfer deferral = {deferred}")
    return 0 if deferred else 2


class DivergenceError(RuntimeError):
    pass


def train(run_dir: str, data_paths: Sequence[str], config: Config,
          num_steps: int = 100000,
          load_path: Optional[str] = None,
          initialize_path: Optional[str] = None,
          plan: Optional[MeshPlan] = None,
          seed: int = 123,
          log_every: int = 1,
          test_dump_dir: Optional[str] = None,
          profile_dir: Optional[str] = None,
          profile_steps: Tuple[int, int] = (10, 15),
          webhook_url: Optional[str] = None,
          skip_path_filter: bool = False,
          blacklists: Sequence[str] = (),
          prewarm: bool = False,
          sync_every: int = 25,
          prefetch_depth: Optional[int] = None,
          max_seconds: Optional[float] = None) -> TrainState:
    """Run the training loop; returns the final state.

    ``sync_every`` controls the dispatch-ahead depth: device metrics are
    buffered as one packed array per step and fetched in a single host
    transfer every ``sync_every`` steps (and before eval/checkpoint), so
    the loop never blocks on a per-step device round trip — on a tunneled
    TPU backend that round trip (~20 ms) would otherwise dominate the step.
    Per-step log lines and the per-step divergence guard are preserved;
    they are just emitted in batches at each flush (detection latency <=
    ``sync_every`` steps, and a diverged state is never checkpointed
    because the flush runs before every save).  ``sync_every=1`` restores
    the reference's fully synchronous ``sess.run`` cadence
    (``/root/reference/train.py:215-230``).

    ``prefetch_depth`` double-buffers the host->device transfer: a
    background thread issues ``shard_batch`` for batch k+1 while step k
    computes (``parallel/prefetch.py``), so on hosts whose ``device_put``
    starts a real async DMA a transfer-bound loop runs at max(transfer,
    compute) instead of their sum — the jax successor to the reference's
    FIFOQueue enqueue thread
    (``/root/reference/datasets/datafeeder.py:157-167``).  0 restores the
    synchronous transfer on the critical path; batch order (and therefore
    the trained parameters) is identical either way.  ``None`` (default)
    resolves by backend: 0 on the tunneled dev backend (``axon``), where
    the transport defers the wire move into the consuming step — measured
    there, the producer thread cannot overlap anything and its extra RPC
    traffic makes the loop ~1.8x SLOWER (paired A/B in docs/PERF.md,
    'Prefetch on the tunneled link') — and 2 everywhere else.

    ``max_seconds`` stops the loop cleanly once that much wall time has
    elapsed (checked each step; the final state is checkpointed) — for
    equal-wall-budget study arms and preemptible jobs."""
    os.makedirs(run_dir, exist_ok=True)
    init_log(os.path.join(run_dir, "train.log"), os.path.basename(run_dir),
             webhook_url=webhook_url)
    log(config.debug_string())

    # provenance: git hash + working-tree diff into the run dir
    # (reference train.py:43-47,119-124)
    git_hash = get_git_revision_hash()
    log(f"git revision: {git_hash}")
    with open(os.path.join(run_dir, "git_info.txt"), "w",
              encoding="utf-8") as f:
        f.write(f"hash: {git_hash}\n\n{get_git_diff()}")

    # eval-text round-trip self-check (reference train.py:27-40): a broken
    # frontend should fail at startup, not after hours of training
    if config.data.symbol_set == "korean":
        from ..text import round_trip_errors
        from ..text.eval_sentences import EVAL_TEXTS
        cleaners = list(config.data.cleaner_names())
        errors = round_trip_errors(EVAL_TEXTS, cleaners,
                                   symbol_set=config.data.symbol_set)
        if errors:
            for text, cleaned, decoded in errors:
                log(f"eval-text round-trip FAILED: {text!r} -> "
                    f"{decoded!r} != {cleaned!r}")
            raise ValueError("eval texts do not round-trip through the "
                             "text frontend (see log)")

    plan = plan or make_mesh(config.mesh)
    log(f"mesh: {dict(plan.mesh.shape)} over {len(plan.mesh.devices.flat)} "
        f"devices, process {jax.process_index()}/{jax.process_count()}")

    randomly_initialized = initialize_path is None
    optimizer = make_optimizer(config.train, randomly_initialized)
    state = create_train_state(config, jax.random.PRNGKey(seed), optimizer)

    mgr = CheckpointManager(run_dir, config)
    if load_path and os.path.abspath(load_path) != os.path.abspath(run_dir):
        src = CheckpointManager(load_path, config)
        state = src.restore(state)
        src.close()
        log(f"resumed from {load_path} at step {int(state.step)}")
    elif mgr.latest_step is not None:
        state = mgr.restore(state)
        log(f"resumed from {run_dir} at step {int(state.step)}")
    elif initialize_path:
        state = warm_start(state, initialize_path)
        log(f"warm-started weights from {initialize_path}; step reset to 0 "
            f"(40k-warmup finetune schedule)")

    feeder_cls = DataFeeder
    if config.train.device_resident_corpus:
        from ..data.resident import ResidentDataFeeder
        feeder_cls = ResidentDataFeeder
    train_feeder = feeder_cls(
        data_paths, config, data_type="train",
        process_index=jax.process_index(),
        process_count=jax.process_count(), seed=seed,
        skip_filter=skip_path_filter, blacklists=blacklists,
        start_step=int(state.step)).start()
    test_feeder = DataFeeder(
        data_paths, config, data_type="test",
        process_index=jax.process_index(),
        process_count=jax.process_count(), seed=seed,
        skip_filter=skip_path_filter, blacklists=blacklists)
    test_batch = Batch(*shard_batch(plan, next(test_feeder.batches())))

    step_fn = make_train_step(config, plan, randomly_initialized)
    eval_fn = make_eval_step(config, plan)
    dropout_rng = jax.random.PRNGKey(seed + 1)

    if prewarm:
        # Compile the whole bucket ladder up front (ROADMAP item 3): one
        # dummy step per (tok_len, frame_len) shape populates the jit
        # callsite cache AND the persistent XLA cache, so the loop never
        # stalls ~15 s on a first-seen bucket mid-training.  The dummy
        # state absorbs the donation; the real state is untouched.
        shapes = train_feeder.bucket_shapes()
        if shapes:
            log(f"prewarming {len(shapes)} bucket program(s): {shapes}")
            t0 = time.time()
            dummy = create_train_state(config, jax.random.PRNGKey(0),
                                       optimizer)
            for tok_len, frame_len in shapes:
                dummy, _ = step_fn(
                    dummy,
                    Batch(*shard_batch(
                        plan, _zero_batch(config, config.train.batch_size,
                                          tok_len, frame_len))),
                    dropout_rng)
            del dummy
            log(f"prewarm done in {time.time() - t0:.1f} s")

    prefetcher = None
    if config.train.device_resident_corpus:
        # one corpus upload; per-step host->device traffic is the index
        # array + the small int fields (there is nothing left for the
        # transfer-prefetch pipeline to overlap)
        resident_store = train_feeder.upload(plan)
        log(f"resident corpus: {len(train_feeder.examples)} examples, "
            f"{train_feeder.resident_nbytes() / 2**20:.0f} MiB on device; "
            f"per-step wire ~= the {config.train.batch_size * 4}-byte "
            f"index array")

        def get_batch():
            small, indices = train_feeder.get()
            small = Batch(*shard_batch(plan, small))
            return train_feeder.assemble(resident_store, small, indices)
    else:
        if prefetch_depth is None:
            prefetch_depth = resolve_prefetch_depth()
            log(f"prefetch_depth auto -> {prefetch_depth} "
                f"({jax.default_backend()} backend)")
        if prefetch_depth > 0:
            from ..parallel.prefetch import DevicePrefetcher
            prefetcher = DevicePrefetcher(
                train_feeder.get,
                lambda b: Batch(*shard_batch(plan, b)),
                depth=prefetch_depth)
            get_batch = prefetcher.get
        else:
            def get_batch():
                return Batch(*shard_batch(plan, train_feeder.get()))

    time_window, loss_window = ValueWindow(100), ValueWindow(100)
    tc = config.train
    profiling = False
    # persisted scalars (the reference's TB summary set, train.py:50-77)
    metrics_log = MetricsLogger(os.path.join(run_dir, "metrics.jsonl"),
                                tb_logdir=run_dir)

    # Deferred metric pipeline: each step's scalar metrics are packed into
    # ONE small device array (an async device op); ``pending`` holds
    # (step, packed) pairs until flush stacks them and pulls the lot in a
    # single host transfer.  Because each step consumes the previous state,
    # that one transfer is also a true sync point for the whole chain.
    import jax.numpy as jnp
    metric_keys: list = []
    pending: list = []

    def flush():
        if not pending:
            return
        rows = np.asarray(jnp.stack([p for _, p in pending]))
        steps = [s for s, _ in pending]
        pending.clear()
        for s, row in zip(steps, rows):
            m = dict(zip(metric_keys, row.tolist()))
            loss = m["loss"]
            loss_window.append(loss)
            if s % log_every == 0:
                log(f"Step {s:7d} [{time_window.average:.3f} sec/step, "
                    f"loss={loss:.5f}, avg_loss={loss_window.average:.5f}]")
                scalars = {k: v for k, v in m.items() if k != "diverged"}
                scalars["sec_per_step"] = time_window.average
                metrics_log.write(s, scalars)
            if m["diverged"]:
                log(f"Loss exploded to {loss:.5f} at step {s}!",
                    notify=True)
                raise DivergenceError(f"loss exploded at step {s}")

    host_step = int(state.step)  # host mirror: int(state.step) would sync
    sync_every = max(1, int(sync_every))  # 0/negative would break the cadence
    diverged = False
    loop_t0 = time.time()
    try:
        while host_step < num_steps:
            # wall budget (equal-wall-clock study arms, preemptible jobs):
            # stop cleanly after ``max_seconds`` of looping — the final
            # state is checkpointed below like any normal end
            if max_seconds is not None and \
                    time.time() - loop_t0 >= max_seconds:
                flush()
                log(f"wall budget of {max_seconds:.0f}s reached at step "
                    f"{host_step}; stopping")
                break
            # jax.profiler trace window (SURVEY.md §5.1: the reference only
            # had wall-clock sec/step; this captures a real device trace)
            if profile_dir and not profiling \
                    and host_step == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
                profiling = True
                log(f"profiler trace started -> {profile_dir}")
            start = time.time()
            batch = get_batch()
            state, metrics = step_fn(state, batch, dropout_rng)
            step = host_step = host_step + 1
            if not metric_keys:
                metric_keys.extend(sorted(metrics))
            pending.append((step, jnp.stack(
                [metrics[k].astype(jnp.float32) for k in metric_keys])))

            if profiling and step >= profile_steps[1]:
                jax.profiler.stop_trace()
                profiling = False
                log("profiler trace stopped")

            if step % sync_every == 0:
                flush()
            # appended after the periodic flush so the window amortizes the
            # sync wait over its interval — sec_per_step stays wall-honest
            # instead of measuring only async dispatch time
            time_window.append(time.time() - start)

            if step % tc.test_interval == 0:
                flush()
                em = eval_fn(state, test_batch)
                gap = float(em["loss"]) - loss_window.average
                log(f"  eval @ {step}: loss={float(em['loss']):.5f} "
                    f"mel={float(em['mel_loss']):.5f} "
                    f"linear={float(em['linear_loss']):.5f} "
                    f"(train-test gap {gap:+.5f})")
                metrics_log.write(step, {
                    "loss": em["loss"], "mel_loss": em["mel_loss"],
                    "linear_loss": em["linear_loss"],
                    "loss_without_coeff": em["loss_without_coeff"],
                    "train_test_gap": gap,
                }, kind="eval")
                if test_dump_dir:
                    _dump_samples(state, test_batch, config, step,
                                  test_dump_dir)

            if step % tc.checkpoint_interval == 0:
                flush()  # a diverged state must never be checkpointed
                mgr.save(state)
                log(f"  checkpointed at step {step}")
        flush()
    except DivergenceError:
        diverged = True
        raise
    finally:
        if profiling:
            jax.profiler.stop_trace()
        if prefetcher is not None:
            prefetcher.stop()
        train_feeder.stop()
        metrics_log.close()
        if not diverged:
            # persist progress on normal end / interruption — but never a
            # state that the guard flagged (it is up to sync_every steps of
            # NaN past the explosion; resuming from it would re-diverge)
            mgr.save(state)
        mgr.close()
    return state


def _zero_batch(config: Config, n: int, tok_len: int,
                frame_len: int) -> Batch:
    """An all-zero batch of one bucket shape, for compile prewarming
    (matching the waveform- or spectrogram-target pytree the feeder
    emits, so the prewarmed program IS the training program)."""
    common = dict(
        inputs=np.zeros((n, tok_len), np.int32),
        input_lengths=np.full((n,), tok_len, np.int32),
        loss_coeff=np.ones((n,), np.float32),
        speaker_id=np.zeros((n,), np.int32),
        target_lengths=np.full((n,), frame_len, np.int32))
    if config.train.on_device_features:
        hop = config.audio.hop_length
        return Batch(mel_targets=None, linear_targets=None,
                     waveforms=np.zeros((n, (frame_len - 1) * hop),
                                        np.int16), **common)
    return Batch(
        mel_targets=np.zeros((n, frame_len, config.model.num_mels),
                             np.float32),
        linear_targets=np.zeros((n, frame_len, config.model.num_freq),
                                np.float32), **common)


# Bounded: one (config -> jitted forward) entry at a time.  Study sweeps
# call train() many times with distinct configs; an unbounded id()-keyed
# dict would leak one compiled XLA program + closed-over Config per run.
_DUMP_CACHE: dict = {}
_DUMP_CACHE_MAX = 2


def _dump_samples(state: TrainState, batch: Batch, config: Config,
                  step: int, out_dir: str, n: int = 1) -> None:
    """Periodic qualitative artifacts (reference ``train.py:246-270``):
    teacher-forced linear output -> Griffin-Lim wav + alignment png.

    The forward is jitted (cached per config identity): the test batch has
    one static shape, so this compiles once — an unjitted apply dispatches
    the graph op by op, which costs minutes over a tunneled TPU link."""
    import jax

    from ..utils.plot import plot_alignment
    from .state import create_model
    os.makedirs(out_dir, exist_ok=True)
    speaker = (batch.speaker_id if config.model.num_speakers > 1 else None)

    key = id(config)
    if key not in _DUMP_CACHE:
        model = create_model(config)

        def fwd(params, batch_stats, inputs, input_lengths, speaker_id,
                mel_targets, waveforms):
            if mel_targets is None and waveforms is not None:
                from ..dsp.chip import features_from_waveform
                import jax.numpy as jnp
                _, mel_targets = features_from_waveform(
                    waveforms.astype(jnp.float32) / 32767.0, config.audio)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                inputs, input_lengths, speaker_id=speaker_id,
                mel_targets=mel_targets, train=False)
            return out["linear_outputs"], out["alignments"]

        while len(_DUMP_CACHE) >= _DUMP_CACHE_MAX:
            _DUMP_CACHE.pop(next(iter(_DUMP_CACHE)))
        _DUMP_CACHE[key] = jax.jit(fwd)
    linear_out, align_out = _DUMP_CACHE[key](
        state.params, state.batch_stats, batch.inputs[:n],
        batch.input_lengths[:n],
        None if speaker is None else speaker[:n],
        None if batch.mel_targets is None else batch.mel_targets[:n],
        None if batch.waveforms is None else batch.waveforms[:n])
    linear = np.asarray(linear_out[0])
    align = np.asarray(align_out[0])
    wav = dsp_host.inv_spectrogram(linear.T, config.audio)
    dsp_host.save_audio(
        wav, os.path.join(out_dir, f"step{step:09d}.wav"), config.audio)
    plot_alignment(
        align, os.path.join(out_dir, f"step{step:09d}.png"),
        info=f"step {step}",
        token_ids=np.asarray(batch.inputs[0]).tolist(),
        input_length=int(batch.input_lengths[0]))

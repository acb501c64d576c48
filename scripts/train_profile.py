#!/usr/bin/env python3
"""Train-step decomposition + scan-unroll sweep on the real chip.

Answers ROADMAP "train-step device time": where the 8-9 ms step goes
(encoder CBHG vs decoder scan vs post-net vs backward) and whether XLA
loop unrolling of the time scans (ModelConfig.decoder_unroll /
rnn_unroll) buys anything at Tacotron sizes.

Timing discipline: N-step chains with one end-of-chain scalar fetch
(block_until_ready lies on tunneled backends — see docs/PERF.md).

Usage: python scripts/train_profile.py [--quick]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _chain_time(fn, state0, reps=5, chain=20, warmup=2):
    """Median seconds per call of a self-chaining fn.

    The state THREADS across reps (fn may donate its input buffers, so the
    initial state is only valid for the first call)."""
    times = []
    s = state0
    for it in range(warmup + reps):
        t0 = time.perf_counter()
        s = fn(s, chain)
        dt = time.perf_counter() - t0
        if it >= warmup:
            times.append(dt / chain)
    return float(np.median(times))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer reps / fewer unroll points")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--t_out", type=int, default=192)
    args = parser.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()
    from tacotron_tpu.config import Config
    from tacotron_tpu.models.tacotron import Tacotron
    from tacotron_tpu.train import (Batch, create_train_state, make_optimizer,
                                    make_train_step)

    NB, T_OUT, T_IN = args.batch, args.t_out, 64
    rng_np = np.random.default_rng(0)
    inputs = jnp.asarray(rng_np.integers(2, 80, (NB, T_IN)), jnp.int32)
    lengths = jnp.full((NB,), T_IN, jnp.int32)
    mels = jnp.asarray(rng_np.random((NB, T_OUT, 80)), jnp.float32)
    linears = jnp.asarray(rng_np.random((NB, T_OUT, 1025)), jnp.float32)
    drng = jax.random.PRNGKey(1)

    def emit(tag, step_s, extra=None):
        rec = {"probe": tag, "step_ms": round(step_s * 1e3, 3),
               "frames_per_s": round(NB * T_OUT / step_s, 1)}
        rec.update(extra or {})
        print(json.dumps(rec), flush=True)

    # ---------------- decomposition at the default config (f32, unroll 1)
    cfg = Config()
    model = Tacotron(cfg.model)
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def chain_program(apply_fn):
        """Forward-only probes: chain by feeding a scalar perturbation of
        the previous output into the next input so XLA cannot reorder."""
        @jax.jit
        def one(x_seed):
            out = apply_fn(x_seed)
            return jnp.sum(out) * 1e-20

        def run(seed, n):
            s = seed
            for _ in range(n):
                s = one(s)
            return float(s)
        return run

    # Teacher-forced forward at two output lengths: the decoder scan and
    # post-net scale with T_out while the encoder does not, so
    #   per-frame cost = (t(T) - t(T/2)) / (T/2),  encoder+fixed = rest.
    def fwd_at(t_out):
        m = mels[:, :t_out, :]

        def fwd(x_seed):
            out = model.apply(variables, inputs, lengths, mel_targets=m,
                              train=False)
            return out["linear_outputs"] + x_seed
        return fwd

    t_fwd = _chain_time(chain_program(fwd_at(T_OUT)), jnp.zeros(()),
                        chain=10)
    emit("forward_full", t_fwd, {"t_out": T_OUT})
    t_half = _chain_time(chain_program(fwd_at(T_OUT // 2)), jnp.zeros(()),
                         chain=10)
    emit("forward_half_frames", t_half, {"t_out": T_OUT // 2})
    per_frame = (t_fwd - t_half) / (T_OUT / 2)
    emit("forward_decomposition", t_fwd, {
        "decoder_plus_postnet_ms": round(per_frame * T_OUT * 1e3, 3),
        "encoder_plus_fixed_ms": round((t_fwd - per_frame * T_OUT) * 1e3,
                                       3)})

    # ---------------- unroll sweep on the full train step
    points = [(1, 1), (2, 2), (4, 4)] if args.quick else [
        (1, 1), (2, 1), (4, 1), (8, 1), (1, 2), (1, 4), (2, 2), (4, 4),
        (8, 8)]
    for dtype in (["float32"] if args.quick else ["float32", "bfloat16"]):
        for dec_u, rnn_u in points:
            c = cfg.replace(model=dataclasses.replace(
                cfg.model, compute_dtype=dtype, decoder_unroll=dec_u,
                rnn_unroll=rnn_u))
            st = create_train_state(c, jax.random.PRNGKey(0), opt)
            tstep = make_train_step(c)
            tb = Batch(inputs=inputs, input_lengths=lengths,
                       loss_coeff=jnp.ones((NB,), jnp.float32),
                       mel_targets=mels, linear_targets=linears,
                       speaker_id=jnp.zeros((NB,), jnp.int32),
                       target_lengths=jnp.full((NB,), T_OUT - 1, jnp.int32))

            def run(s, n, _tstep=tstep, _tb=tb):
                m = None
                for _ in range(n):
                    s, m = _tstep(s, _tb, drng)
                float(m["param_norm"])
                return s

            t0 = time.perf_counter()
            st = run(st, 1)  # compile (donates the input state buffers)
            compile_s = time.perf_counter() - t0
            t = _chain_time(run, st, reps=3 if args.quick else 5)
            emit("train_step", t,
                 {"compute_dtype": dtype, "decoder_unroll": dec_u,
                  "rnn_unroll": rnn_u, "compile_s": round(compile_s, 1)})


if __name__ == "__main__":
    main()

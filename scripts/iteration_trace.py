#!/usr/bin/env python3
"""Profiler-trace attribution of the train step's per-iteration cost.

TRAIN_ROOFLINE.json shows ``us_per_iteration`` tripling from B=16 to
B=128 (80.9 -> 261.8 us) — so at large batch the step is NOT bound by the
fixed per-scan-iteration overhead that explains the B=16 plateau.  This
script captures a ``jax.profiler`` trace of the steady-state step at
B=16 and B=128 (plus the shipped B=32 preset), parses the XSpace proto's
TPU "XLA Ops" lines, and attributes device time by op category (fusions,
convolutions/dots, copies/relayouts, dynamic slicing, loop bookkeeping),
so the MFU-ceiling claim in docs/PERF.md is trace-backed rather than
argued (round-4 verdict item 4).

Run on the TPU host::

    python scripts/iteration_trace.py --out docs/ITERATION_TRACE.json
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def categorize(op_name: str) -> str:
    """HLO-op-name -> cost category.  Order matters: the first match
    wins, and fusion names often embed their root op."""
    n = op_name.lower()
    if "convolution" in n or n.startswith("%conv") or "conv" in n:
        return "convolution"
    if n.startswith("%dot") or "dot" in n or "einsum" in n:
        return "matmul"
    if "dynamic-update-slice" in n or "dynamic-slice" in n \
            or "dynamic_update" in n:
        return "dynamic_slice"
    if "copy" in n or "transpose" in n or "bitcast" in n \
            or "relayout" in n:
        return "copy_relayout"
    if "fusion" in n:
        return "fusion"
    if "tuple" in n or "parameter" in n or "constant" in n:
        return "loop_bookkeeping"
    if "reduce" in n:
        return "reduce"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "transfer"
    return "other"


def parse_trace(trace_dir: str) -> dict:
    """Aggregate device-plane timings from the newest xplane.pb under
    ``trace_dir``.

    TPU timelines carry several lines with very different semantics:
    ``Steps``/``XLA Modules`` hold one event per executed program (the
    true device wall time of a step); ``XLA Ops`` holds the SEQUENCED
    per-op events (self-times that sum to ~the module time — the line to
    attribute compute from); ``Async XLA Ops`` holds overlapped DMA
    (copy-start/copy-done HBM prefetches running on parallel engines
    concurrently with compute — summing them into the total would
    double-count massively, so they are reported separately as an HBM-
    traffic indicator)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        xs.ParseFromString(fh.read())

    device_planes = [p for p in xs.planes
                     if "TPU" in p.name or "device" in p.name.lower()]
    if not device_planes:  # CPU fallback: the busiest non-host plane
        device_planes = [p for p in xs.planes if p.lines]
    by_op: collections.Counter = collections.Counter()
    sync_ps = 0
    steps_ps = 0
    n_programs = 0
    async_ps = 0
    lines_seen = []
    for plane in device_planes:
        if "host" in plane.name.lower():
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            total = sum(e.duration_ps for e in line.events)
            lines_seen.append(
                f"{plane.name}/{line.name}: {total / 1e9:.2f} ms")
            if "step" in lname:
                steps_ps += total
                n_programs += len(line.events)
                continue
            if "module" in lname:
                continue
            if "async" in lname:
                async_ps += total
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in \
                    meta else str(ev.metadata_id)
                # while/conditional events are CONTAINERS spanning their
                # body ops (which appear on the same line) — counting
                # them would double-attribute the whole loop
                if name.lstrip("%").startswith(("while", "conditional")):
                    continue
                by_op[name] += ev.duration_ps
                sync_ps += ev.duration_ps
    by_cat: collections.Counter = collections.Counter()
    for name, ps in by_op.items():
        by_cat[categorize(name)] += ps
    top = [{"op": n, "ms": round(ps / 1e9, 3)}
           for n, ps in by_op.most_common(20)]
    return {
        "device_step_total_ms": round(steps_ps / 1e9, 3),
        "device_programs": n_programs,
        "sync_ops_total_ms": round(sync_ps / 1e9, 3),
        "async_copy_total_ms": round(async_ps / 1e9, 3),
        "by_category_ms": {k: round(v / 1e9, 3)
                           for k, v in by_cat.most_common()},
        "top_ops": top,
        "lines": lines_seen[:8],
        "xplane": paths[-1],
    }


def trace_batch(NB: int, cfg, chain: int = 5,
                trace_root: str = "/tmp/iter_trace") -> dict:
    """Steady-state chain under the profiler; returns measured step time
    + parsed attribution."""
    import jax
    import jax.numpy as jnp

    from tacotron_tpu.train import (Batch, create_train_state,
                                    make_optimizer, make_train_step)
    from tacotron_tpu.train.roofline import train_step_model

    T_IN, T_OUT = 64, 192
    opt = make_optimizer(cfg.train)
    state = create_train_state(cfg, jax.random.PRNGKey(0), opt)
    tstep = make_train_step(cfg)
    rng_np = np.random.default_rng(0)
    batch = Batch(
        inputs=jnp.asarray(rng_np.integers(2, 79, (NB, T_IN)), jnp.int32),
        input_lengths=jnp.full((NB,), T_IN, jnp.int32),
        loss_coeff=jnp.ones((NB,), jnp.float32),
        mel_targets=jnp.asarray(rng_np.random((NB, T_OUT, 80)),
                                jnp.float32),
        linear_targets=jnp.asarray(rng_np.random((NB, T_OUT, 1025)),
                                   jnp.float32),
        speaker_id=jnp.zeros((NB,), jnp.int32),
        target_lengths=jnp.full((NB,), T_OUT - 1, jnp.int32))
    drng = jax.random.PRNGKey(1)
    box = [state]

    def chain_once():
        s = box[0]
        m = None
        for _ in range(chain):
            s, m = tstep(s, batch, drng)
        box[0] = s
        float(m["param_norm"])

    chain_once(); chain_once()  # compile + warm
    t0 = time.perf_counter()
    chain_once()
    step_s = (time.perf_counter() - t0) / chain

    trace_dir = os.path.join(trace_root, f"b{NB}")
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        chain_once()
    parsed = parse_trace(trace_dir)

    model = train_step_model(cfg, NB, T_IN, T_OUT)
    iters = int(model["sequential_iterations_total"])
    dev_step_ms = (parsed["device_step_total_ms"]
                   / max(parsed["device_programs"], 1))
    parsed.update({
        "batch": NB,
        "chain": chain,
        "wall_step_ms": round(step_s * 1e3, 3),
        "device_step_ms": round(dev_step_ms, 3),
        "sequential_iterations": iters,
        "wall_us_per_iteration": round(step_s * 1e6 / iters, 2),
        "device_us_per_iteration": round(dev_step_ms * 1e3 / iters, 2),
        "by_category_us_per_iteration": {
            k: round(v * 1e3 / (chain * iters), 2)
            for k, v in parsed["by_category_ms"].items()},
    })
    return parsed


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="docs/ITERATION_TRACE.json")
    parser.add_argument("--batches", default="16,128")
    parser.add_argument("--chain", type=int, default=5)
    args = parser.parse_args()

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()
    import dataclasses

    import jax

    from tacotron_tpu.config import Config, tune_scan_unroll

    base = tune_scan_unroll(Config())
    bf16 = base.replace(model=dataclasses.replace(
        base.model, compute_dtype="bfloat16"))

    report = {"device": str(jax.devices()[0]), "configs": []}
    for NB in (int(x) for x in args.batches.split(",")):
        entry = trace_batch(NB, bf16, chain=args.chain)
        report["configs"].append(entry)
        print(json.dumps({k: entry[k] for k in
                          ("batch", "wall_step_ms", "device_step_ms",
                           "wall_us_per_iteration",
                           "device_us_per_iteration",
                           "by_category_us_per_iteration")},
                         ensure_ascii=False))
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"[*] wrote {args.out}")


if __name__ == "__main__":
    main()

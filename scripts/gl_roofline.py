#!/usr/bin/env python3
"""Griffin-Lim bandwidth roofline on the real chip.

The bench's MXU-utilization number (12-24%) says GL is not matmul-bound;
this probe establishes what DOES bind it.  Method: time the batched GL
program at several iteration counts and take the slope — per-iteration
cost free of program dispatch, decode, and zero-phase-init overheads —
then compare against the modeled HBM traffic of one iteration.

Model of one matmul_half iteration (batch B, F frames, n_fft N, R=B*F
rows, f32 unless noted):

  framer      reads wav (small) + writes frames [R,N]            4RN write
  u/v split   reads frames, writes u,v [R,N/2] bf16              4RN r, 2RN w
  rfft mm     reads u/v + weights, writes 4 spectra [R,~N/2]     2RN r, 8RN w
  project     reads spectra + mag, writes scaled spectra         16RN r, 8RN w
  irfft mm    reads spectra (bf16 casts), writes frames [R,N]    4RN r, 4RN w
  OLA         reads frames ×window, accumulates K shifted adds   ~(4+4K')RN
  (weights ~8 MB/iter, VMEM-cacheable; XLA fusion merges several
   of these passes — the model is an UPPER bound on bytes)

Usage: python scripts/gl_roofline.py [--batch 32] [--frames 201]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--frames", type=int, default=201)
    parser.add_argument("--reps", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()
    from tacotron_tpu.config import Config
    from tacotron_tpu.dsp import chip as dsp_chip

    cfg = Config().audio
    B, F = args.batch, args.frames
    N = cfg.n_fft
    num_samples = (F - 1) * cfg.hop_length
    rng = np.random.default_rng(0)
    mag = jnp.asarray(rng.random((B, F, N // 2 + 1)), jnp.float32)

    def timed_at(iters: int) -> float:
        acfg = dataclasses.replace(cfg, griffin_lim_iters=iters)

        @jax.jit
        def run(mag):
            wavs = dsp_chip.griffin_lim_batched(mag, num_samples, acfg)
            return jnp.sum(jnp.abs(wavs))

        float(run(mag))  # compile
        for _ in range(3):
            float(run(mag))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(mag))  # float() inside: true host sync on tunnels
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    points = [15, 30, 60, 120]
    ts = [timed_at(i) for i in points]
    # least-squares slope: seconds per GL iteration
    A = np.vstack([points, np.ones(len(points))]).T
    slope, intercept = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]

    R = B * F
    # bytes per iteration from the docstring model (K' = ceil(N/hop) OLA
    # block adds, accumulator-resident under the Pallas kernel -> count 1x)
    bytes_per_iter = R * N * (4 + 4 + 2 + 2 + 8 + 16 + 8 + 4 + 4 + 8)
    achieved_gb_s = bytes_per_iter / slope / 1e9
    # TPU v5 lite HBM ~ 819 GB/s
    out = {
        "metric": "gl_bandwidth_roofline",
        "batch": B, "n_frames": F, "n_fft": N,
        "iters_vs_seconds": dict(zip(map(str, points),
                                     [round(t, 4) for t in ts])),
        "seconds_per_iteration": round(float(slope), 6),
        "fixed_overhead_s": round(float(intercept), 4),
        "modeled_bytes_per_iter_mb": round(bytes_per_iter / 1e6, 1),
        "achieved_gb_s_upper_bound": round(achieved_gb_s, 1),
        "hbm_peak_gb_s": 819.0,
        "hbm_utilization_pct_upper_bound": round(
            100 * achieved_gb_s / 819.0, 1),
        "note": "byte model is an upper bound (XLA fuses passes); if the "
                "utilization bound sits near peak, the loop is "
                "bandwidth-bound and further MAC cuts cannot help",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

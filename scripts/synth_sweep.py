#!/usr/bin/env python3
"""Synthesis throughput sweep on the real chip: batch size x Griffin-Lim
engine x momentum.  Informs the bench headline configuration (bench.py) and
the serving-batch recommendation in README.

Prints one JSON line per point:
  {"batch": B, "impl": ..., "iters": N, "momentum": a,
   "batch_seconds": t, "audio_s_per_s": x, "spectral_convergence": c}

Timing discipline matches bench.py: scalar checksum float()-ed inside the
timed region, 3 warmups, median of reps.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()
    from tacotron_tpu.config import Config
    from tacotron_tpu.dsp import chip as dsp_chip
    from tacotron_tpu.synth import Synthesizer

    cfg = Config()
    MAX_STEPS = 50
    r = cfg.model.reduction_factor
    hop_s = cfg.audio.hop_length / cfg.audio.sample_rate

    synth = Synthesizer().init_random(cfg)
    model, variables = synth.model, synth.variables

    from tacotron_tpu.text import text_to_sequence
    cleaners = list(cfg.data.cleaner_names())
    texts = [
        "안녕하세요 오늘은 정말 좋은 날씨입니다 함께 산책을 나가요",
        "음성 합성 시스템의 품질을 평가하기 위한 문장입니다",
        "어제 저녁에는 친구들과 함께 맛있는 식사를 했습니다",
        "대한민국의 수도는 서울이며 많은 사람들이 살고 있습니다",
    ]
    seqs = [text_to_sequence(t, cleaners) for t in texts]
    bucket = 64

    def make_inputs(B):
        inputs = np.zeros((B, bucket), np.int32)
        for i in range(B):
            s = seqs[i % len(seqs)]
            inputs[i, :min(len(s), bucket)] = s[:bucket]
        lengths = np.asarray(
            [min(len(seqs[i % len(seqs)]), bucket) for i in range(B)],
            np.int32)
        return jnp.asarray(inputs), jnp.asarray(lengths)

    def timed(fn, reps=10, warmup=3):
        for _ in range(warmup):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # decode once per batch size (shared across GL variants)
    points = []
    for B in (16, 32, 64):
        inp, lens = make_inputs(B)

        @jax.jit
        def decode(variables, inp, lens):
            out = model.apply(variables, inp, lens, train=False,
                              max_steps=MAX_STEPS)
            return out["linear_outputs"]

        specs = decode(variables, inp, lens)
        specs.block_until_ready()

        for impl, iters, momentum in (
                ("matmul_bf16", 60, 0.0),
                ("matmul_bf16", 30, 0.99),
                ("pallas", 60, 0.0),
                ("pallas", 30, 0.99),
        ):
            acfg = dataclasses.replace(cfg.audio, griffin_lim_impl=impl,
                                       griffin_lim_iters=iters,
                                       griffin_lim_momentum=momentum)

            @jax.jit
            def full(variables, inp, lens):
                out = model.apply(variables, inp, lens, train=False,
                                  max_steps=MAX_STEPS)
                wavs = dsp_chip.batched_linear_to_waveform(
                    out["linear_outputs"], acfg)
                return wavs, jnp.sum(jnp.abs(wavs))

            wavs, chk = full(variables, inp, lens)
            assert np.isfinite(float(chk))
            t = timed(lambda: float(full(variables, inp, lens)[1]))
            audio_s = B * MAX_STEPS * r * hop_s

            # quality: spectral convergence vs the (denormalized) target
            # magnitude of utterance 0
            spec0 = np.asarray(specs[0])
            S = np.asarray(
                dsp_chip.db_to_amp(
                    dsp_chip.denormalize_db(jnp.asarray(spec0), acfg)
                    + acfg.ref_level_db)) ** acfg.power
            # host STFT: the tunneled backend can't fetch complex arrays
            from tacotron_tpu.dsp import host as dsp_host
            est = np.abs(dsp_host.stft(np.asarray(wavs[0]), acfg)).T
            n = min(len(est), len(S))
            conv = float(np.linalg.norm(est[:n] - S[:n])
                         / np.linalg.norm(S[:n]))

            point = {"batch": B, "impl": impl, "iters": iters,
                     "momentum": momentum,
                     "batch_seconds": round(t, 4),
                     "audio_s_per_s": round(audio_s / t, 1),
                     "spectral_convergence": round(conv, 4)}
            points.append(point)
            print(json.dumps(point), flush=True)


if __name__ == "__main__":
    main()

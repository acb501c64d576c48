#!/usr/bin/env python3
"""Large-batch convergence study: loss-vs-SAMPLES at B=16 vs B=64.

The round-3 roofline showed 2.4x step throughput at large batch — but
throughput that doesn't converge is not throughput, and the Noam warmup is
STEP-based (``train/optim.py``): at 4x the batch the model sees 4x the
samples per warmup step, so the effective LR-vs-samples schedule changes.
This study measures it instead of hand-waving:

- every run consumes the SAME total sample budget (B=16 runs 4x the steps
  of B=64), so the curves are directly comparable per sample seen;
- B=64 runs twice: with the default Noam warmup (4000 steps) and with the
  warmup rescaled by 16/64 (1000 steps — same warmup in SAMPLES as B=16);
- corpus: the melody corpus (same as docs/CONVERGENCE.md), full-size
  deepvoice model, TPU preset numerics (bf16 + unroll 8 + waveform wire).

Writes ``docs/BATCH_STUDY.md``.  Usage::

    python scripts/batch_study.py --samples 32000 --out docs/BATCH_STUDY.md
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np  # noqa: E402

from make_synthetic_corpus import ensure_corpus  # noqa: E402


def run_one(tag: str, batch: int, warmup: float, steps: int,
            data_dirs, work: str):
    from tacotron_tpu.config import Config, load_config
    from tacotron_tpu.train.driver import train
    from tacotron_tpu.utils import read_metrics

    base = load_config(os.path.join(work, "corpus", "config.json"))
    cfg = Config.tpu_recommended(base, batch_size=batch)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, model_type="deepvoice",
                                  num_speakers=len(data_dirs)),
        train=dataclasses.replace(cfg.train, warmup_steps_fresh=warmup,
                                  test_interval=10 ** 9,
                                  checkpoint_interval=10 ** 9))
    run_dir = os.path.join(work, f"run_{tag}")
    # metrics.jsonl appends across invocations: a stale run dir from an
    # earlier (e.g. different --samples) study would contaminate the curve
    shutil.rmtree(run_dir, ignore_errors=True)
    train(run_dir, data_dirs, cfg, num_steps=steps, log_every=10,
          prewarm=True)
    recs = read_metrics(os.path.join(run_dir, "metrics.jsonl"),
                        kind="train")
    return [(r["step"] * batch, r["loss"], r.get("sec_per_step", 0.0))
            for r in recs]


def tail_mean(curve, n=5):
    return float(np.mean([l for _, l, _ in curve[-n:]]))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--work", default="/tmp/tacotron_batch_study")
    parser.add_argument("--samples", type=int, default=32000)
    parser.add_argument("--out", default="docs/BATCH_STUDY.md")
    args = parser.parse_args()

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()
    import jax

    data_dirs = ensure_corpus(args.work, utterances=96)
    runs = [
        ("b16_noam4k", 16, 4000.0, args.samples // 16),
        ("b32_noam2k", 32, 2000.0, args.samples // 32),
        ("b64_noam4k", 64, 4000.0, args.samples // 64),
        ("b64_noam1k", 64, 1000.0, args.samples // 64),
    ]
    curves = {}
    for tag, batch, warmup, steps in runs:
        print(f"[*] {tag}: B={batch} warmup={warmup:.0f} steps={steps}")
        curves[tag] = run_one(tag, batch, warmup, steps, data_dirs,
                              args.work)

    b16 = tail_mean(curves["b16_noam4k"])
    b32 = tail_mean(curves["b32_noam2k"])
    b64 = tail_mean(curves["b64_noam4k"])
    b64r = tail_mean(curves["b64_noam1k"])
    sps = {t: float(np.mean([s for _, _, s in c[-5:]]))
           for t, c in curves.items()}

    def downsample(c, n=30):
        idx = np.linspace(0, len(c) - 1, min(n, len(c))).astype(int)
        return [(c[i][0], round(c[i][1], 4)) for i in idx]

    winner = min(("b64_noam4k", b64), ("b64_noam1k", b64r),
                 key=lambda kv: kv[1])
    rel = abs(winner[1] - b16) / max(b16, 1e-9)
    rel32 = abs(b32 - b16) / max(b16, 1e-9)
    lines = [
        "# Large-batch convergence study (loss vs samples)",
        "",
        f"Melody corpus, full-size deepvoice 2-speaker model, TPU preset "
        f"numerics (bf16, unroll 8, waveform wire); every run consumes "
        f"{args.samples} samples; device: {jax.devices()[0]}.",
        "",
        "The Noam warmup is STEP-based, so B=64 sees 4x the samples per "
        "warmup step; measured both as-is and with the warmup rescaled "
        "to match B=16 in samples (4000 -> 1000 steps).",
        "",
        "| run | batch | warmup steps | final loss (tail-5) | sec/step |",
        "|---|---|---|---|---|",
        f"| b16_noam4k | 16 | 4000 | {b16:.4f} | "
        f"{sps['b16_noam4k']:.3f} |",
        f"| b32_noam2k | 32 | 2000 (=B16 in samples) | {b32:.4f} | "
        f"{sps['b32_noam2k']:.3f} |",
        f"| b64_noam4k | 64 | 4000 | {b64:.4f} | "
        f"{sps['b64_noam4k']:.3f} |",
        f"| b64_noam1k | 64 | 1000 (=B16 in samples) | {b64r:.4f} | "
        f"{sps['b64_noam1k']:.3f} |",
        "",
        f"Best B=64 variant: **{winner[0]}** at {winner[1]:.4f} vs B=16's "
        f"{b16:.4f} ({rel:.1%} relative difference).",
        "",
        "Loss-vs-samples curves (samples_seen, loss):",
        "",
    ]
    for tag, c in curves.items():
        lines.append(f"- {tag}: {downsample(c)}")
    lines += [
        "",
        "## Conclusion",
        "",
    ]
    thr = {t: b / sps[t] for (t, b, _, _) in runs}
    lines.append(
        f"Step throughput: B=16 {thr['b16_noam4k']:.0f} samples/s, B=32 "
        f"{thr['b32_noam2k']:.0f} ({thr['b32_noam2k']/thr['b16_noam4k']:.2f}x), "
        f"B=64 {thr[winner[0]]:.0f} "
        f"({thr[winner[0]]/thr['b16_noam4k']:.2f}x) — so the convergence "
        f"cost below is what the extra throughput buys.")
    lines.append(
        f"B=32 (warmup rescaled to match B=16 in samples) lands within "
        f"{rel32:.1%} of B=16 per-sample convergence.")
    if rel < 0.05:
        lines.append(
            f"B=64 matches B=16 per-sample convergence within {rel:.1%} "
            f"(threshold 5%) — the preset's `batch_size=64` is validated. "
            + ("The default step-based warmup was benign at this scale; no "
               "rescale needed." if winner[0] == "b64_noam4k" else
               "Rescale the Noam warmup by 16/B when raising the batch "
               "(the default step-based warmup lost measurable loss)."))
    else:
        lines.append(
            f"B=64 diverges from B=16 per-sample convergence by {rel:.1%} "
            f"at this sample budget — prefer B=32 (or budget more "
            f"samples/steps before judging B=64).")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"[*] report -> {args.out}")
    print(json.dumps({"b16": b16, "b64": b64, "b64_rescaled": b64r,
                      "winner": winner[0], "rel_diff": rel}))


if __name__ == "__main__":
    main()

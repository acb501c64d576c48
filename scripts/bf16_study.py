#!/usr/bin/env python3
"""bf16-vs-f32 training study on a synthetic corpus.

Trains the same model twice — ``compute_dtype`` float32 vs bfloat16 — on a
synthetic multi-speaker sine corpus, using the real driver (so the run dirs
carry ``metrics.jsonl``), then writes a side-by-side convergence + step-time
summary to ``docs/BF16_STUDY.md``.

Usage::

    python scripts/bf16_study.py --steps 300 --out docs/BF16_STUDY.md
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def build_corpus(root: str, n_speakers: int = 2, n_utts: int = 24):
    from tacotron_tpu.config import Config
    from tacotron_tpu.data import build_from_path
    from tacotron_tpu.dsp import host as dsp

    cfg = study_config()
    texts = ["안녕하세요 만나서 반갑습니다", "오늘은 날씨가 정말 좋네요",
             "음성 합성 시스템을 시험합니다", "내일 아침 일찍 만나요",
             "어제는 비가 조금 내렸어요", "스물 네 시간 열두 달"]
    dirs = []
    rng = np.random.default_rng(0)
    sr = cfg.audio.sample_rate
    for spk in range(n_speakers):
        spk_dir = os.path.join(root, f"spk{spk}")
        os.makedirs(spk_dir, exist_ok=True)
        lines = []
        for i in range(n_utts):
            dur = 1.6 + 0.4 * (i % 4)
            t = np.arange(int(dur * sr)) / sr
            f0 = 150 + 60 * spk + 10 * (i % 5)
            wav = (0.4 * np.sin(2 * np.pi * f0 * t)
                   + 0.1 * rng.standard_normal(t.shape)).astype(np.float32)
            path = os.path.join(spk_dir, f"utt{i:03d}.wav")
            dsp.save_audio(wav, path, cfg.audio)
            lines.append(f"{path}|{texts[i % len(texts)]}")
        meta = os.path.join(spk_dir, "metadata.csv")
        with open(meta, "w") as fh:
            fh.write("\n".join(lines))
        build_from_path(meta, cfg, num_workers=1)
        dirs.append(os.path.join(spk_dir, "data"))
    return dirs


def study_config(compute_dtype: str = "float32"):
    from tacotron_tpu.config import Config, DataConfig, TrainConfig
    cfg = Config()
    return cfg.replace(
        model=dataclasses.replace(cfg.model, model_type="deepvoice",
                                  num_speakers=2,
                                  compute_dtype=compute_dtype),
        data=dataclasses.replace(cfg.data, min_tokens=1, min_iters=1,
                                 max_iters=400),
        train=dataclasses.replace(cfg.train, batch_size=8,
                                  decay_learning_rate_mode=1,
                                  test_interval=50,
                                  checkpoint_interval=10 ** 9))


def run(tag: str, dtype: str, data_dirs, steps: int, out_root: str):
    from tacotron_tpu.train.driver import train
    from tacotron_tpu.utils import read_metrics
    run_dir = os.path.join(out_root, tag)
    cfg = study_config(dtype)
    train(run_dir, data_dirs, cfg, num_steps=steps, log_every=10)
    metrics = read_metrics(os.path.join(run_dir, "metrics.jsonl"),
                           kind="train")
    return metrics


def summarize(f32, bf16, steps: int, out_path: str) -> str:
    def tail_mean(ms, key, n=5):
        vals = [m[key] for m in ms[-n:]]
        return sum(vals) / len(vals)

    def curve(ms, key):
        return [(m["step"], round(m[key], 4)) for m in ms]

    f32_loss = tail_mean(f32, "loss")
    bf16_loss = tail_mean(bf16, "loss")
    f32_sps = tail_mean(f32, "sec_per_step")
    bf16_sps = tail_mean(bf16, "sec_per_step")
    import jax
    device = str(jax.devices()[0])

    lines = [
        "# bf16 vs f32 training study",
        "",
        f"Synthetic 2-speaker deepvoice corpus, {steps} steps, batch 8, "
        f"exponential-decay LR; device: {device}.",
        "Loss values are means over the final 5 logged intervals from each "
        "run's `metrics.jsonl` (persisted by the trainer).",
        "",
        "| compute_dtype | final avg loss | sec/step | frames/s rel |",
        "|---|---|---|---|",
        f"| float32  | {f32_loss:.4f} | {f32_sps:.4f} | 1.00x |",
        f"| bfloat16 | {bf16_loss:.4f} | {bf16_sps:.4f} | "
        f"{f32_sps / bf16_sps:.2f}x |",
        "",
        f"Relative final-loss difference: "
        f"{abs(bf16_loss - f32_loss) / max(f32_loss, 1e-9) * 100:.2f}%  "
        f"(params/optimizer state stay f32; only matmul compute is bf16).",
        "",
        "Loss curves (step, loss):",
        "",
        f"- f32:  {curve(f32, 'loss')}",
        f"- bf16: {curve(bf16, 'loss')}",
        "",
    ]
    if abs(bf16_loss - f32_loss) / max(f32_loss, 1e-9) < 0.05 \
            and bf16_sps <= f32_sps * 1.02:
        lines.append("**Recommendation**: bf16 converges equivalently here "
                     "and is never slower — use "
                     "`model.compute_dtype=\"bfloat16\"` for training; keep "
                     "f32 for checkpoint-parity evaluation against the "
                     "reference.")
    else:
        lines.append("**Recommendation**: measurable divergence or no "
                     "speed win on this device — keep float32 as the "
                     "default; revisit with larger models.")
    text = "\n".join(lines) + "\n"
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(text)
    return text


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--out", default="docs/BF16_STUDY.md")
    parser.add_argument("--work_dir", default=None)
    args = parser.parse_args()

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()

    work = args.work_dir or tempfile.mkdtemp(prefix="bf16_study_")
    print(f"[*] corpus under {work}")
    data_dirs = build_corpus(os.path.join(work, "corpus"))
    f32 = run("f32", "float32", data_dirs, args.steps, work)
    bf16 = run("bf16", "bfloat16", data_dirs, args.steps, work)
    print(summarize(f32, bf16, args.steps, args.out))


if __name__ == "__main__":
    main()

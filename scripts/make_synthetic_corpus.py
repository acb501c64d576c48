#!/usr/bin/env python3
"""Generate a synthetic multi-speaker Korean corpus + run config.

Produces per-speaker sine-tone wavs with per-speaker f0 (so a trained
model has real per-speaker acoustics to reproduce), `metadata.csv` in the
builder's `path|text` format, and a run-config JSON whose corpus filters
accept the short utterances (the reference defaults filter to 120-796
frames, ``/root/reference/datasets/datafeeder.py:97-98``).

Used by scripts/e2e_drive.sh, docs/BF16_STUDY.md, and as the template the
tests' tiny corpora follow.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tacotron_tpu.config import Config, DataConfig, TrainConfig  # noqa: E402
from tacotron_tpu.dsp import host as dsp  # noqa: E402

TEXTS = [
    "안녕하세요 만나서 반갑습니다 오늘도 좋은 하루 되세요",
    "오늘은 날씨가 정말 좋네요 산책하기 딱 좋은 날입니다",
    "음성 합성 시스템을 시험하고 있습니다 잘 들리시나요",
    "스물 네 시간 열두 달 내내 쉬지 않고 일합니다",
    "어제는 비가 조금 내렸어요 우산을 챙기세요",
    "내일 아침 일찍 만나요 늦지 않게 오세요",
    "기차는 여덟 시 정각에 출발합니다 서두르세요",
    "도서관은 매우 조용한 곳입니다 책을 읽기 좋아요",
]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--speakers", type=int, default=2)
    parser.add_argument("--utterances", type=int, default=24)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--sample_rate", type=int, default=24000)
    args = parser.parse_args()

    cfg = Config()
    sr = args.sample_rate
    for spk in range(args.speakers):
        root = os.path.join(args.out_dir, f"spk{spk}")
        os.makedirs(root, exist_ok=True)
        lines = []
        for i in range(args.utterances):
            dur = 1.0 + 0.08 * (i % 12)
            t = np.arange(int(dur * sr)) / sr
            f0 = 140 + 80 * spk + 10 * (i % 8)
            wav = (0.4 * np.sin(2 * np.pi * f0 * t)
                   + 0.1 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)
            path = os.path.join(root, f"utt{i:03d}.wav")
            dsp.save_audio(wav, path, cfg.audio)
            lines.append(f"{path}|{TEXTS[i % len(TEXTS)]}")
        with open(os.path.join(root, "metadata.csv"), "w") as fh:
            fh.write("\n".join(lines))
        print(f"[*] {root}: {args.utterances} utterances")

    run_cfg = Config().replace(
        data=DataConfig(min_tokens=1, min_iters=1, max_iters=100,
                        bucket_size_tokens=32, bucket_size_frames=64,
                        batches_per_group=4),
        train=TrainConfig(batch_size=args.batch_size, initial_phase_step=0,
                          checkpoint_interval=40, test_interval=40,
                          summary_interval=10))
    cfg_path = os.path.join(args.out_dir, "config.json")
    with open(cfg_path, "w") as fh:
        fh.write(run_cfg.to_json())
    print(f"[*] run config -> {cfg_path}")


if __name__ == "__main__":
    main()

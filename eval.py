#!/usr/bin/env python3
"""Batch evaluation CLI (reference ``/root/reference/eval.py``).

Synthesizes a fixed set of evaluation sentences for every run directory
matching ``--load_path_pattern``, for every requested speaker, in batches.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

from tacotron_tpu.synth import Synthesizer

# Default Korean evaluation sentences (the reference hardcodes a similar
# list at eval.py:13-66; these are original phrases, same coverage intent:
# numbers, dates, quotes, long clauses).
EVAL_TEXTS = [
    "안녕하세요 오늘도 좋은 하루 되시기 바랍니다",
    "기상청은 내일 아침 기온이 영하 삼 도까지 떨어진다고 예보했습니다",
    "서울역에서 부산역까지는 약 두 시간 삼십 분이 걸립니다",
    "그는 웃으며 정말 반가웠다고 말했습니다",
    "올해 경제 성장률은 이 점 오 퍼센트로 전망됩니다",
    "다음 회의는 시월 십오 일 오후 세 시에 열립니다",
    "인공지능 기술은 음성 합성 분야에서 빠르게 발전하고 있습니다",
    "창밖으로 보이는 가을 하늘이 유난히 맑고 푸르렀습니다",
]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_path_pattern", required=True,
                        help="glob over run directories")
    parser.add_argument("--sample_path", default="eval_samples")
    parser.add_argument("--speakers", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--texts", nargs="*", default=None)
    args = parser.parse_args(argv)

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()

    texts = args.texts or EVAL_TEXTS
    run_dirs = sorted(glob(args.load_path_pattern))
    if not run_dirs:
        parser.error(f"no run dirs match {args.load_path_pattern!r}")

    for run_dir in run_dirs:
        synth = Synthesizer().load(run_dir)
        run_name = os.path.basename(os.path.normpath(run_dir))
        for speaker in range(args.speakers):
            for lo in range(0, len(texts), args.batch_size):
                chunk = texts[lo:lo + args.batch_size]
                results = synth.synthesize(
                    texts=chunk, speaker_ids=[speaker] * len(chunk),
                    max_steps=args.max_steps)
                out_dir = os.path.join(args.sample_path, run_name,
                                       f"speaker{speaker}")
                paths = synth.save_results(results, out_dir,
                                           prefix=f"eval{lo:03d}")
                for p in paths:
                    print(f"[*] {p}")


if __name__ == "__main__":
    main()

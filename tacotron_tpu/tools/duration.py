"""Per-file / per-dataset audio duration accounting
(reference ``/root/reference/audio/get_duration.py``).

Reads wav headers directly (stdlib ``wave`` + scipy fallback) instead of
TinyTag; prints per-dataset totals.
"""

from __future__ import annotations

import argparse
import os
import wave
from collections import defaultdict
from glob import glob
from typing import Dict, Iterable, Optional, Sequence, Tuple


def wav_duration(path: str) -> float:
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes() / w.getframerate()
    except Exception:
        from scipy.io import wavfile
        rate, data = wavfile.read(path)
        return len(data) / rate


def get_durations(paths: Iterable[str],
                  print_detail: bool = False) -> Dict[str, float]:
    """{path: seconds}; skips unreadable files."""
    out = {}
    for path in paths:
        try:
            out[path] = wav_duration(path)
            if print_detail:
                print(f"  {path}: {out[path]:.2f}s")
        except Exception:
            continue
    return out


def dataset_totals(patterns: Sequence[str]) -> Dict[str, Tuple[int, float]]:
    """{pattern: (num_files, total_seconds)}."""
    totals = defaultdict(lambda: (0, 0.0))
    for pattern in patterns:
        durations = get_durations(sorted(glob(pattern)))
        totals[pattern] = (len(durations), sum(durations.values()))
    return dict(totals)


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="audio duration accounting")
    parser.add_argument("patterns", nargs="+",
                        help="glob(s) of wav files, one per dataset")
    parser.add_argument("--detail", action="store_true")
    args = parser.parse_args(argv)
    grand_n, grand_s = 0, 0.0
    for pattern, (n, seconds) in dataset_totals(args.patterns).items():
        print(f"[*] {pattern}: {n} files, {seconds / 3600:.2f} hours")
        grand_n += n
        grand_s += seconds
    print(f"[*] total: {grand_n} files, {grand_s / 3600:.2f} hours")


if __name__ == "__main__":
    main()

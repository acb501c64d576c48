#!/usr/bin/env python3
"""mulaw8 wire-format quality on REAL synthesized content.

The 8-bit mu-law serving wire halves the dominant serving cost (the bulk
waveform fetch) — round 3 pinned its quality only at codec level (~38 dB
full-scale sine SNR).  This measures the price on the path users actually
hear: synthesize the held-out sentences from a trained checkpoint twice —
``wire_format="int16"`` vs ``"mulaw8"`` (same decode, same vocoder; the
only difference is the wire) — and report log-spectral distance (LSD, the
standard spectral-distortion metric: RMSE of per-bin dB log-power) and
time-domain SNR between the two.

Usage::

    python scripts/mulaw_quality.py --load_path /tmp/tacotron_convergence/run \
        --texts_json /tmp/tacotron_convergence/corpus/heldout.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def log_spectral_distance(a: np.ndarray, b: np.ndarray,
                          n_fft: int = 1024, hop: int = 256,
                          floor_db: float | None = -60.0) -> float:
    """LSD in dB between two waveforms (truncated to the common length):
    sqrt(mean over frames of mean over bins of (10*log10 P_a - 10*log10
    P_b)^2).

    ``floor_db`` clamps both power spectra at ``peak + floor_db`` dB
    (the usual dynamic-range cap): without it, bins that are silent in
    the reference but hold mu-law quantization noise in the test signal
    contribute log-ratios of 60-80 dB each and the metric measures the
    noise floor's depth, not audible spectral distortion.  Pass ``None``
    for the raw unfloored value.
    """
    n = min(len(a), len(b))
    a, b = a[:n].astype(np.float64), b[:n].astype(np.float64)
    win = np.hanning(n_fft)
    frames = 1 + max(0, (n - n_fft) // hop)

    def power(x):
        idx = (np.arange(n_fft)[None, :]
               + hop * np.arange(frames)[:, None])
        return np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2

    pa, pb = power(a) + 1e-12, power(b) + 1e-12
    if floor_db is not None:
        floor = max(pa.max(), pb.max()) * 10.0 ** (floor_db / 10.0)
        pa, pb = np.maximum(pa, floor), np.maximum(pb, floor)
    d = 10.0 * np.log10(pa) - 10.0 * np.log10(pb)
    return float(np.sqrt((d ** 2).mean(axis=1)).mean())


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    n = min(len(ref), len(test))
    ref, test = ref[:n].astype(np.float64), test[:n].astype(np.float64)
    noise = ref - test
    return float(10.0 * np.log10(
        (ref ** 2).sum() / max((noise ** 2).sum(), 1e-20)))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load_path", required=True)
    parser.add_argument("--texts_json", default=None,
                        help="JSON list of sentences (default: the "
                             "frontend's eval set)")
    parser.add_argument("--speaker_id", type=int, default=0)
    parser.add_argument("--out", default=None,
                        help="also write the JSON report here")
    args = parser.parse_args()

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()
    from tacotron_tpu.synth import Synthesizer

    if args.texts_json:
        texts = json.load(open(args.texts_json))
    else:
        from tacotron_tpu.text.eval_sentences import EVAL_TEXTS
        texts = list(EVAL_TEXTS)

    synth = Synthesizer().load(args.load_path)
    spk = [args.speaker_id] * len(texts)
    common = dict(texts=texts, speaker_ids=spk, fast_vocoder=True,
                  librosa_trim=False, return_alignments=False)
    ref = synth.synthesize(wire_format="int16", **common)["wavs"]
    mu = synth.synthesize(wire_format="mulaw8", **common)["wavs"]

    lsd = [log_spectral_distance(r, m) for r, m in zip(ref, mu)]
    lsd_raw = [log_spectral_distance(r, m, floor_db=None)
               for r, m in zip(ref, mu)]
    snr = [snr_db(r, m) for r, m in zip(ref, mu)]
    report = {
        "n_utterances": len(texts),
        "lsd_db_mean": round(float(np.mean(lsd)), 3),
        "lsd_db_max": round(float(np.max(lsd)), 3),
        "lsd_floor_db": -60.0,
        "lsd_db_mean_unfloored": round(float(np.mean(lsd_raw)), 3),
        "snr_db_mean": round(float(np.mean(snr)), 2),
        "snr_db_min": round(float(np.min(snr)), 2),
        "note": "int16 wire vs mulaw8 wire, same decode/vocoder — the "
                "distortion is purely the 8-bit companding on the host "
                "link; bandwidth halves (BENCH_DETAIL serve_mulaw). LSD "
                "uses a -60 dB dynamic-range floor; the unfloored value "
                "measures the quantization noise floor in silent bins, "
                "not audible distortion",
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()

"""Generate committed golden fixtures for the host DSP layer.

Round-2 verdict: "librosa semantics" in ``dsp/host.py`` was self-certified —
chip was tested against host, host against its own formulas.  This script
pins the contract with fixtures computed by INDEPENDENT implementations:

- STFT: ``tf.signal.stft`` (TensorFlow's FFT + framing) on the reflect
  center-padded signal with the centered padded Hann — the librosa
  convention the reference uses (``/root/reference/audio/__init__.py:99-101``).
- pre-emphasis / inverse: the difference equations written out directly
  (y[n] = x[n] - 0.97 x[n-1]; IIR inverse), not scipy.lfilter (which
  ``dsp/host.py`` itself calls).
- dB chain: the reference's formulas restated from
  ``/root/reference/audio/__init__.py:146-168``.
- mel filterbank: the Slaney-scale algorithm re-implemented here
  loop-wise per the published Auditory-Toolbox/librosa description.
  (librosa itself is not installed in this environment — this is a
  second, structurally different implementation, so a shared
  vectorization bug in ``dsp/primitives.py`` would be caught; the mel
  *scale* constants 200/3 and log(6.4)/27 are the published Slaney
  values.)

Output: ``tests/fixtures/dsp_golden.npz``, asserted by
``tests/test_dsp.py::test_host_dsp_matches_golden_fixture``.  Regenerate
only if the audio contract deliberately changes:

    python scripts/make_dsp_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SAMPLE_RATE = 24000
N_FFT = 2048
HOP = 300
WIN = 1200
N_MELS = 80
PREEMPH = 0.97
MIN_LEVEL_DB = -100.0
REF_LEVEL_DB = 20.0
NUM_SAMPLES = 6000  # 0.25 s -> 21 frames; keeps the fixture < ~200 KB


def make_signal() -> np.ndarray:
    """Deterministic broadband test signal: tones + chirp + seeded noise."""
    t = np.arange(NUM_SAMPLES, dtype=np.float64) / SAMPLE_RATE
    sig = (0.5 * np.sin(2 * np.pi * 440.0 * t)
           + 0.3 * np.sin(2 * np.pi * 3211.0 * t + 0.7)
           + 0.2 * np.sin(2 * np.pi * (1000.0 + 8000.0 * t) * t))
    rng = np.random.default_rng(20171015)
    sig += 0.05 * rng.standard_normal(NUM_SAMPLES)
    return sig.astype(np.float32)


def preemphasis_direct(x: np.ndarray) -> np.ndarray:
    y = np.empty_like(x, dtype=np.float64)
    y[0] = x[0]
    y[1:] = x[1:] - PREEMPH * x[:-1].astype(np.float64)
    return y


def inv_preemphasis_direct(x: np.ndarray) -> np.ndarray:
    y = np.empty(len(x), dtype=np.float64)
    acc = 0.0
    for n in range(len(x)):
        acc = x[n] + PREEMPH * acc
        y[n] = acc
    return y


def stft_tf(y: np.ndarray) -> np.ndarray:
    """Centered STFT via tf.signal -> complex128 [n_freq, frames]."""
    import tensorflow as tf

    n = np.arange(WIN)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / WIN)  # periodic
    pad = (N_FFT - WIN) // 2
    window = np.zeros(N_FFT)
    window[pad:pad + WIN] = hann

    y_padded = np.pad(y.astype(np.float64), N_FFT // 2, mode="reflect")
    spec = tf.signal.stft(
        tf.constant(y_padded), frame_length=N_FFT, frame_step=HOP,
        fft_length=N_FFT,
        window_fn=lambda length, dtype: tf.constant(window, dtype=dtype),
        pad_end=False).numpy()
    return spec.T  # [n_freq, frames]


def mel_basis_loopwise() -> np.ndarray:
    """Slaney filterbank built filter-by-filter (not the vectorized ramps
    of dsp/primitives.py)."""
    def hz_to_mel(f):
        f_sp = 200.0 / 3
        if f < 1000.0:
            return f / f_sp
        return 1000.0 / f_sp + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def mel_to_hz(m):
        f_sp = 200.0 / 3
        if m < 1000.0 / f_sp:
            return m * f_sp
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 1000.0 / f_sp))

    fmax = SAMPLE_RATE / 2.0
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), N_MELS + 2)
    hz_pts = np.array([mel_to_hz(m) for m in mel_pts])
    fft_freqs = np.linspace(0.0, fmax, 1 + N_FFT // 2)

    weights = np.zeros((N_MELS, 1 + N_FFT // 2))
    for i in range(N_MELS):
        lo, center, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        for j, f in enumerate(fft_freqs):
            if lo < f < center:
                weights[i, j] = (f - lo) / (center - lo)
            elif center <= f < hi:
                weights[i, j] = (hi - f) / (hi - center)
        weights[i] *= 2.0 / (hi - lo)  # Slaney area normalization
    return weights


def main() -> None:
    y = make_signal()
    pre = preemphasis_direct(y)
    D = stft_tf(pre)
    mag = np.abs(D)

    def amp_to_db(x):
        return 20.0 * np.log10(np.maximum(1e-5, x))

    def normalize(S):
        return np.clip((S - MIN_LEVEL_DB) / -MIN_LEVEL_DB, 0, 1)

    linear = normalize(amp_to_db(mag) - REF_LEVEL_DB)
    basis = mel_basis_loopwise()
    mel = normalize(amp_to_db(basis @ mag))

    inv_pre = inv_preemphasis_direct(y)

    out = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "fixtures", "dsp_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        signal=y,
        preemphasized=pre.astype(np.float32),
        inv_preemphasized=inv_pre.astype(np.float32),
        stft_real=D.real.astype(np.float32),
        stft_imag=D.imag.astype(np.float32),
        spectrogram=linear.astype(np.float32),
        melspectrogram=mel.astype(np.float32),
        mel_basis=basis.astype(np.float32),
        params=np.array([SAMPLE_RATE, N_FFT, HOP, WIN, N_MELS]),
    )
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()

"""DSP layer: spectrogram analysis (host + chip) and Griffin-Lim synthesis.

- ``tacotron_tpu.dsp.host``: numpy, librosa-compatible semantics, used by the
  offline data builder (reference analysis path ``audio/__init__.py:48-67``).
- ``tacotron_tpu.dsp.chip``: JAX/XLA, fully on-chip inversion for serving and
  training-time audio dumps (replaces ``audio/__init__.py:76-96``).

Layouts differ deliberately: host functions keep librosa's [freq, time];
chip functions use [time, freq] (frame-major), the natural TPU layout.
The npz corpus schema stores [time, freq] like the reference
(``datasets/generate_data.py:156-161``).
"""

from . import chip, host, primitives
from .host import (inv_melspectrogram, inv_spectrogram, load_audio,
                   melspectrogram, save_audio, spectrogram)

__all__ = [
    "chip", "host", "primitives",
    "spectrogram", "melspectrogram", "inv_spectrogram", "inv_melspectrogram",
    "load_audio", "save_audio",
]
